"""Passthrough (store) codec: raw Arrow IPC bytes, lossless for any type.

The size-guard fallback when no lightweight codec wins (e.g. the
incompressible `html` tag soup) — the engine's analogue of the
reference's rule that invalid inputs must still round-trip exactly.
"""

from __future__ import annotations

import pyarrow as pa

from .base import Codec, EncodedColumn, register
from .dictionary import ipc_deserialize_array, ipc_serialize_array


class PassthroughCodec(Codec):
    name = "store"

    def can_encode(self, dtype: pa.DataType, stats: dict | None = None) -> bool:
        return True

    def encode(self, arr: pa.Array) -> EncodedColumn:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        return EncodedColumn(
            codec=self.name, n_values=len(arr), params={},
            buffers={"payload": ipc_serialize_array(arr)})

    def decode(self, enc: EncodedColumn) -> pa.Array:
        return ipc_deserialize_array(enc.buffers["payload"])


register(PassthroughCodec())

"""Run-length codec over dictionary codes.

Works on any non-nested type: dictionary-encode first (nulls become code
-1, shifted to 0), then store (run_value_codes, run_lengths), both
bit-packed with :mod:`.bitpack`.  Vectorized run detection via numpy
diff — no Python loop over rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .base import (Codec, EncodedColumn, register, str_to_type, type_to_str)
from .bitpack import bits_needed, pack, unpack
from .dictionary import (dict_encode_indices, ipc_deserialize_array,
                         ipc_serialize_array)


class RleCodec(Codec):
    name = "rle"

    def can_encode(self, dtype: pa.DataType, stats: dict | None = None) -> bool:
        return not (pa.types.is_nested(dtype) or pa.types.is_null(dtype))

    def encode(self, arr: pa.Array) -> EncodedColumn:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        n = len(arr)
        # nulls are first-class run values: code -1, shifted +1 below
        idx, dictionary = dict_encode_indices(arr)
        if arr.null_count:
            valid = arr.is_valid().to_numpy(zero_copy_only=False)
            idx = np.where(valid, idx, -1)
        shifted = idx + 1  # 0 == null
        if n == 0:
            run_vals = np.empty(0, dtype=np.int64)
            run_lens = np.empty(0, dtype=np.int64)
        else:
            change = np.flatnonzero(shifted[1:] != shifted[:-1])
            starts = np.concatenate([[0], change + 1])
            ends = np.concatenate([change + 1, [n]])
            run_vals = shifted[starts]
            run_lens = ends - starts
        vw = bits_needed(int(run_vals.max()) if len(run_vals) else 0)
        lw = bits_needed(int(run_lens.max()) if len(run_lens) else 0)
        return EncodedColumn(
            codec=self.name,
            n_values=n,
            params={"n_runs": int(len(run_vals)), "val_width": vw,
                    "len_width": lw, "dtype": type_to_str(arr.type)},
            buffers={"payload": pack(run_vals.view(np.uint64), vw).tobytes(),
                     "lens": pack(run_lens.view(np.uint64), lw).tobytes(),
                     "aux": ipc_serialize_array(dictionary)},
        )

    def decode(self, enc: EncodedColumn) -> pa.Array:
        n, p = enc.n_values, enc.params
        nr = p["n_runs"]
        run_vals = unpack(np.frombuffer(enc.buffers["payload"], dtype=np.uint64),
                          p["val_width"], nr).view(np.int64)
        run_lens = unpack(np.frombuffer(enc.buffers["lens"], dtype=np.uint64),
                          p["len_width"], nr).view(np.int64)
        idx = np.repeat(run_vals, run_lens) - 1  # -1 == null
        dictionary = ipc_deserialize_array(enc.buffers["aux"])
        take_idx = pa.array(idx, mask=(idx < 0))
        out = dictionary.take(take_idx)
        return out.cast(str_to_type(p["dtype"]))


register(RleCodec())

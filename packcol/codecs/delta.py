"""Delta codec: successive differences, zigzag-mapped, bit-packed.

For clustered / mostly-monotone integer columns (crawl timestamps), the
successive deltas span a far smaller range than max-min, so
``bits(max |delta|)+1`` beats FOR's ``bits(max-min)``.  Zigzag maps
signed deltas to unsigned ((v<<1)^(v>>63)) so occasional back-jumps
(the webtext `warc_ts` model) stay cheap.  Same word-aligned packed
layout as every other codec (/root/reference/src/kmer.rs:67-69 sizing).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .base import (Codec, EncodedColumn, register, str_to_type, type_to_str,
                   validity_from_bytes, validity_to_bytes)
from .bitpack import bits_needed, pack, unpack
from .forpack import from_int64_numpy, is_int_like, to_int64_numpy


def zigzag(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int64, copy=False)
    with np.errstate(over="ignore"):
        return ((v << 1) ^ (v >> 63)).view(np.uint64)


def unzigzag(u: np.ndarray) -> np.ndarray:
    u = u.astype(np.uint64, copy=False)
    return ((u >> np.uint64(1)) ^ (np.uint64(0) - (u & np.uint64(1)))) \
        .view(np.int64)


class DeltaCodec(Codec):
    name = "delta"

    def can_encode(self, dtype: pa.DataType, stats: dict | None = None) -> bool:
        return is_int_like(dtype)

    def encode(self, arr: pa.Array) -> EncodedColumn:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        n = len(arr)
        validity = validity_to_bytes(arr)
        v = to_int64_numpy(arr)
        if arr.null_count:
            valid = arr.is_valid().to_numpy(zero_copy_only=False)
            # nulls repeat the previous value → delta 0 (cheap, exact:
            # the validity bitmap restores them on decode)
            idx = np.where(valid, np.arange(n), 0)
            np.maximum.accumulate(idx, out=idx)
            v = v[idx]
        first = int(v[0]) if n else 0
        dv = np.diff(v.view(np.uint64)).view(np.int64)  # mod-2^64 safe
        zz = zigzag(dv)
        width = bits_needed(int(zz.max())) if len(zz) else 0
        return EncodedColumn(
            codec=self.name, n_values=n,
            params={"first": first, "width": width,
                    "dtype": type_to_str(arr.type)},
            buffers={"payload": pack(zz, width).tobytes(),
                     "validity": validity})

    def decode(self, enc: EncodedColumn) -> pa.Array:
        n, p = enc.n_values, enc.params
        dtype = str_to_type(p["dtype"])
        if n == 0:
            return pa.array([], type=dtype)
        words = np.frombuffer(enc.buffers["payload"], dtype=np.uint64)
        zz = unpack(words, p["width"], n - 1)
        dv = unzigzag(zz)
        v = np.empty(n, dtype=np.uint64)
        v[0] = np.int64(p["first"]).astype(np.uint64)
        if n > 1:
            np.cumsum(dv.view(np.uint64), out=v[1:])
            v[1:] += v[0]
        vi = v.view(np.int64)
        valid = validity_from_bytes(enc.buffers.get("validity", b""), n)
        if valid is not None:
            arr = pa.array(vi, type=pa.int64(), mask=~valid)
            if pa.types.is_date32(dtype) or pa.types.is_time32(dtype):
                return arr.cast(pa.int32()).cast(dtype)
            if pa.types.is_boolean(dtype):
                return arr.cast(pa.int8()).cast(dtype)
            if pa.types.is_uint64(dtype):  # mod-2^64 reinterpret back
                import pyarrow.compute as pc
                return pc.cast(arr, dtype, safe=False)
            return arr.cast(dtype)
        return from_int64_numpy(vi, dtype)


register(DeltaCodec())

"""Frame-of-reference + bit-pack codec for integer-like columns.

Subtract the per-block minimum (the "frame"), bit-pack the non-negative
deltas at ⌈log2(max_delta+1)⌉ bits — the direct generalization of the
reference's fixed-width packing to data-dependent widths
(/root/reference/src/encoding/naive.rs:116-124 + cardinality math
/root/reference/src/utils.rs:27-38).  Handles int8..64, uint8..64,
timestamps, dates, durations; preserves nulls via the validity bitmap.
Arithmetic is mod-2^64 via uint64 views, so full-range int64 columns are
safe.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .base import (Codec, EncodedColumn, register, str_to_type, type_to_str,
                   validity_from_bytes, validity_to_bytes)
from .bitpack import bits_needed, pack, unpack

_INT_LIKE = (
    pa.types.is_integer, pa.types.is_timestamp, pa.types.is_date,
    pa.types.is_duration, pa.types.is_time, pa.types.is_boolean,
)


def is_int_like(dtype: pa.DataType) -> bool:
    return any(p(dtype) for p in _INT_LIKE)


def to_int64_numpy(arr: pa.Array) -> np.ndarray:
    """Physical int64 view of an int-like array; nulls → 0."""
    t = arr.type
    if pa.types.is_timestamp(t) or pa.types.is_duration(t):
        phys = arr.cast(pa.int64())
    elif pa.types.is_date32(t) or pa.types.is_time32(t):
        phys = arr.cast(pa.int32()).cast(pa.int64())
    elif pa.types.is_date64(t) or pa.types.is_time64(t):
        phys = arr.cast(pa.int64())
    elif pa.types.is_boolean(t):
        phys = arr.cast(pa.int8()).cast(pa.int64())
    elif pa.types.is_uint64(t):
        # values >= 2^63 don't fit int64: reinterpret mod 2^64 (safe
        # cast would raise) — FOR/delta arithmetic is mod-2^64 anyway
        import pyarrow.compute as pc
        phys = pc.cast(arr, pa.int64(), safe=False)
    else:
        phys = arr.cast(pa.int64())
    if phys.null_count:
        import pyarrow.compute as pc
        phys = pc.fill_null(phys, 0)
    return phys.to_numpy(zero_copy_only=False).astype(np.int64)


def from_int64_numpy(v: np.ndarray, dtype: pa.DataType) -> pa.Array:
    t = dtype
    arr = pa.array(v, type=pa.int64())
    if pa.types.is_date32(t) or pa.types.is_time32(t):
        return arr.cast(pa.int32()).cast(t)
    if pa.types.is_boolean(t):
        return arr.cast(pa.int8()).cast(t)
    if pa.types.is_uint64(t):  # inverse of the mod-2^64 reinterpret
        import pyarrow.compute as pc
        return pc.cast(arr, t, safe=False)
    return arr.cast(t)


class ForCodec(Codec):
    name = "for"

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
            vv = v[valid]
            base = int(vv.min()) if len(vv) else 0
            v = np.where(valid, v, base)  # nulls carry the base → delta 0
        else:
            base = int(v.min()) if n else 0
        base_u = np.int64(base).astype(np.uint64)
        deltas = v.view(np.uint64) - base_u  # mod 2^64, always correct
        width = bits_needed(int(deltas.max())) if n else 0
        return EncodedColumn(
            codec=self.name,
            n_values=n,
            params={"base": base, "width": width,
                    "dtype": type_to_str(arr.type)},
            buffers={"payload": pack(deltas, width).tobytes(),
                     "validity": validity},
        )

    def decode(self, enc: EncodedColumn) -> pa.Array:
        n, p = enc.n_values, enc.params
        words = np.frombuffer(enc.buffers["payload"], dtype=np.uint64)
        deltas = unpack(words, p["width"], n)
        base_u = np.int64(p["base"]).astype(np.uint64)
        v = (deltas + base_u).view(np.int64)
        dtype = str_to_type(p["dtype"])
        valid = validity_from_bytes(enc.buffers.get("validity", b""), n)
        if valid is not None:
            return pa.array(
                from_int64_numpy(v, dtype).to_numpy(zero_copy_only=False),
                type=dtype, mask=~valid) if pa.types.is_integer(dtype) else \
                _masked_cast(v, dtype, valid)
        return from_int64_numpy(v, dtype)


class BitpackCodec(ForCodec):
    """Plain fixed-point bit-packing: width-⌈log2(max+1)⌉ codes packed
    into u64 words with NO frame subtraction — the unmodified analogue
    of the reference's 2-bit packing (naive.rs:116-124) for
    non-negative integer columns (ids, counts, enum codes).  Encoded
    form = FOR with base pinned to 0, so O(1) point access and the
    filter pushdown work unchanged."""

    name = "bitpack"

    def can_encode(self, dtype: pa.DataType, stats: dict | None = None) -> bool:
        if not is_int_like(dtype):
            return False
        if stats is not None and "min" in stats:
            return int(stats["min"]) >= 0
        return True

    def encode(self, arr: pa.Array) -> EncodedColumn:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        n = len(arr)
        validity = validity_to_bytes(arr)
        v = to_int64_numpy(arr)
        if arr.null_count:
            valid = arr.is_valid().to_numpy(zero_copy_only=False)
            v = np.where(valid, v, 0)
        if n and int(v.min()) < 0:
            raise ValueError("bitpack requires non-negative values; "
                             "use 'for'")
        width = bits_needed(int(v.max())) if n else 0
        return EncodedColumn(
            codec=self.name, n_values=n,
            params={"base": 0, "width": width,
                    "dtype": type_to_str(arr.type)},
            buffers={"payload": pack(v.view(np.uint64), width).tobytes(),
                     "validity": validity})


def _masked_cast(v: np.ndarray, dtype: pa.DataType, valid: np.ndarray) -> pa.Array:
    arr = pa.array(v, type=pa.int64(), mask=~valid)
    if pa.types.is_date32(dtype) or pa.types.is_time32(dtype):
        return arr.cast(pa.int32()).cast(dtype)
    if pa.types.is_boolean(dtype):
        return arr.cast(pa.int8()).cast(dtype)
    return arr.cast(dtype)


register(ForCodec())
register(BitpackCodec())

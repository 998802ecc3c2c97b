"""Decimal-float codec: doubles that are exact k-decimal literals
(prices, rates) become scaled integers + frame-of-reference bit-pack.

``round(v * 10^k) / 10^k == v`` is checked for every value (vectorized);
IEEE-754 guarantees the division reproduces the original double for
values parsed from k-decimal text, so the roundtrip is bit-exact for
such columns and the codec refuses anything else (selection falls back).
8-byte doubles typically become 1-3 byte deltas.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .base import (Codec, EncodedColumn, register, str_to_type, type_to_str,
                   validity_from_bytes, validity_to_bytes)
from .bitpack import bits_needed, pack, unpack

_MAX_DECIMALS = 4


def detect_scale(v: np.ndarray) -> int | None:
    """Smallest k ≤ 4 with round(v*10^k)/10^k == v bit-exactly for all
    finite values; None if none fits (or non-finite values present)."""
    if len(v) == 0:
        return 0
    if not np.isfinite(v).all():
        return None
    if (np.signbit(v) & (v == 0)).any():
        # -0.0 survives the float-path bit check below but the integer
        # encode maps it to +0.0 — not bit-exact, so refuse the codec
        return None
    for k in range(_MAX_DECIMALS + 1):
        s = 10.0 ** k
        scaled = np.round(v * s)
        if np.abs(scaled).max() >= 2**53:
            return None
        if np.array_equal(scaled / s, v):   # bitwise-equal incl. -0.0? see below
            # np.array_equal treats -0.0 == 0.0; enforce bit equality:
            if (scaled / s).tobytes() == v.tobytes():
                return k
    return None


class DecimalFloatCodec(Codec):
    name = "decfloat"

    def can_encode(self, dtype: pa.DataType, stats: dict | None = None) -> bool:
        return pa.types.is_float64(dtype) or pa.types.is_float32(dtype)

    def encode(self, arr: pa.Array) -> EncodedColumn:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        n = len(arr)
        validity = validity_to_bytes(arr)
        v = arr.to_numpy(zero_copy_only=False).astype(np.float64)
        if arr.null_count:
            valid = arr.is_valid().to_numpy(zero_copy_only=False)
            v = np.where(valid, v, 0.0)
        k = detect_scale(v)
        if k is None:
            raise ValueError("column is not exact k-decimal; "
                             "selection should fall back")
        ints = np.round(v * 10.0 ** k).astype(np.int64)
        base = int(ints.min()) if n else 0
        base_u = np.int64(base).astype(np.uint64)
        deltas = ints.view(np.uint64) - base_u
        width = bits_needed(int(deltas.max())) if n else 0
        return EncodedColumn(
            codec=self.name, n_values=n,
            params={"scale": k, "base": base, "width": width,
                    "dtype": type_to_str(arr.type)},
            buffers={"payload": pack(deltas, width).tobytes(),
                     "validity": validity})

    def decode(self, enc: EncodedColumn) -> pa.Array:
        n, p = enc.n_values, enc.params
        dtype = str_to_type(p["dtype"])
        words = np.frombuffer(enc.buffers["payload"], dtype=np.uint64)
        deltas = unpack(words, p["width"], n)
        base_u = np.int64(p["base"]).astype(np.uint64)
        ints = (deltas + base_u).view(np.int64)
        v = ints / (10.0 ** p["scale"])
        valid = validity_from_bytes(enc.buffers.get("validity", b""), n)
        if pa.types.is_float32(dtype):
            v = v.astype(np.float32)
        if valid is not None:
            return pa.array(v, type=dtype, mask=~valid)
        return pa.array(v, type=dtype)


register(DecimalFloatCodec())

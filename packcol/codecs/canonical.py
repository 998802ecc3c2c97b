"""Canonical-form normalization with exact reconstruction.

Generalizes the reference's canonical k-mer idea
(/root/reference/src/naive_impl/kmer.rs:55-74: canonical = min(value,
involution(value)), keep a 1-bit orientation flag to reconstruct the
original exactly) to arbitrary string/binary columns.  The default
involution is byte-reversal; DNA reverse-complement lives in
functions/dna.py for packed words.

Why it helps compression: values that are each other's mirror image
collapse onto one canonical form, raising duplicate density before
dictionary/FSST encoding — the same reason the reference stores only
canonical k-mers.

Invariants (mirrors quickcheck at src/naive_impl/kmer.rs:280-290):
  canonicalize(canonicalize(x).canonical) is a fixpoint
  reconstruct(canonical, orientation) == x   (bit-identical)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .fsst import _is_stringy, buffer_view


def reverse_strings(arr: pa.Array) -> pa.Array:
    """Vectorized per-row reversal: codepoint-wise for UTF-8 strings
    (valid involution on text), byte-wise for binary."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    dtype = arr.type
    if pa.types.is_string(dtype) or pa.types.is_large_string(dtype):
        return pc.utf8_reverse(arr)
    filled = arr
    if arr.null_count:
        fill = "" if (pa.types.is_string(dtype)
                      or pa.types.is_large_string(dtype)) else b""
        filled = pc.fill_null(arr, fill)
    d, offs = buffer_view(filled)
    if len(d) == 0:
        return arr
    lens = np.diff(offs)
    # index of reversed byte j of row i: offs[i] + (len_i - 1 - (j - offs[i]))
    ends = np.repeat(offs[1:] - 1, lens)
    pos = np.arange(len(d), dtype=np.int64) - np.repeat(offs[:-1], lens)
    rev = d[ends - pos]
    large = (pa.types.is_large_string(dtype) or
             pa.types.is_large_binary(dtype))
    off = offs.astype(np.int64 if large else np.int32)
    out = pa.Array.from_buffers(
        dtype, len(arr),
        [None, pa.py_buffer(np.ascontiguousarray(off)),
         pa.py_buffer(np.ascontiguousarray(rev))])
    if arr.null_count:
        out = pc.if_else(arr.is_valid(), out, pa.nulls(len(arr), type=dtype))
    return out


def canonicalize(arr: pa.Array, involution=reverse_strings
                 ) -> tuple[pa.Array, pa.Array]:
    """(canonical, orientation): canonical = min(x, involution(x)) under
    Arrow value order; orientation True ⇔ x was already canonical
    (IsCanonical, src/naive_impl/kmer.rs:18-22)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not _is_stringy(arr.type):
        raise TypeError(f"canonicalize expects a string-ish column, "
                        f"got {arr.type}")
    mirrored = involution(arr)
    is_fw = pc.less_equal(arr, mirrored)
    canonical = pc.if_else(is_fw, arr, mirrored)
    return canonical, is_fw


def reconstruct(canonical: pa.Array, orientation: pa.Array,
                involution=reverse_strings) -> pa.Array:
    """Exact inverse of :func:`canonicalize`."""
    if isinstance(canonical, pa.ChunkedArray):
        canonical = canonical.combine_chunks()
    mirrored = involution(canonical)
    return pc.if_else(orientation, canonical, mirrored)


class CanonicalizeBatch:
    """map_batches stage: adds ``<col>_canonical`` + ``<col>_orientation``
    columns (or replaces in place with replace=True)."""

    def __init__(self, column: str, replace: bool = False):
        self.column = column
        self.replace = replace

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        canonical, is_fw = canonicalize(col)
        if self.replace:
            i = batch.column_names.index(self.column)
            batch = batch.set_column(i, self.column, canonical)
        else:
            batch = batch.append_column(f"{self.column}_canonical", canonical)
        return batch.append_column(f"{self.column}_orientation", is_fw)

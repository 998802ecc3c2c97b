"""Token-dictionary codec: dictionary encoding lifted to whitespace
tokens.

Natural text is a sequence of words from a modest vocabulary; encoding
whole tokens as ⌈log2(vocab)⌉-bit codes beats byte-level schemes by a
wide margin (a 7-byte word + separator becomes ~13 bits).  This is the
reference's symbol→code idea (/root/reference/src/encoding/naive.rs:49-74)
applied at token granularity, with the same word-aligned bit-packed
payload.

Losslessness guard: the codec is exact only for text that is literally
``" ".join(tokens)`` with single spaces and no leading/trailing spaces.
``can_encode_exact`` checks that structurally (vectorized); the
selection layer falls back to FSST otherwise.  Nulls ride the validity
bitmap; empty strings encode as zero tokens.

Layout:
  aux      Arrow IPC token dictionary (sorted → order-preserving codes)
  payload  bit-packed token codes, all rows concatenated
  lens     bit-packed tokens-per-row
  validity null bitmap
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .base import (Codec, EncodedColumn, register, str_to_type, type_to_str,
                   validity_from_bytes, validity_to_bytes)
from .bitpack import bits_needed, pack, unpack
from .dictionary import ipc_deserialize_array, ipc_serialize_array
from .fsst import buffer_view


def _is_plain_string(t: pa.DataType) -> bool:
    return pa.types.is_string(t) or pa.types.is_large_string(t)


def structurally_joinable(arr: pa.Array) -> bool:
    """True iff every non-null row reconstructs as ' '.join(split(' ')):
    no double/leading/trailing spaces (vectorized byte scan)."""
    if arr.null_count:
        arr = pc.fill_null(arr, "")
    d, offs = buffer_view(arr)
    if len(d) == 0:
        return True
    sp = d == 32
    # double spaces
    if (sp[:-1] & sp[1:]).any():
        return False
    starts = offs[:-1][np.diff(offs) > 0]
    ends = offs[1:][np.diff(offs) > 0] - 1
    if sp[starts].any() or sp[ends].any():
        return False
    return True


class TokenDictCodec(Codec):
    name = "tokdict"

    def can_encode(self, dtype: pa.DataType, stats: dict | None = None) -> bool:
        return _is_plain_string(dtype)

    def encode(self, arr: pa.Array) -> EncodedColumn:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        n = len(arr)
        dtype = arr.type
        validity = validity_to_bytes(arr)
        filled = pc.fill_null(arr, "") if arr.null_count else arr
        if not structurally_joinable(filled):
            raise ValueError("column is not single-space token-joinable; "
                             "use can_encode_exact / selection fallback")
        tokens = pc.split_pattern(filled, " ")
        flat = pc.list_flatten(tokens)
        counts = pc.list_value_length(tokens).to_numpy(zero_copy_only=False)
        counts = counts.astype(np.int64)
        # "" splits to [""]: record true token count 0 for empty rows
        lens_bytes = np.diff(buffer_view(filled)[1])
        counts = np.where(lens_bytes == 0, 0, counts)
        from .dictionary import dict_encode_indices
        idx, dictionary = dict_encode_indices(flat)  # sorted = order-
        # preserving codes (same kernel as DictionaryCodec)
        # drop the placeholder token of empty rows from the code stream
        if (counts == 0).any():
            keep = np.repeat(counts > 0, np.maximum(counts, 1))
            idx = idx[keep]
        cw = bits_needed(max(len(dictionary) - 1, 0))
        lw = bits_needed(int(counts.max()) if n else 0)
        return EncodedColumn(
            codec=self.name, n_values=n,
            params={"code_width": cw, "len_width": lw,
                    "n_tokens": int(counts.sum()),
                    "n_dict": len(dictionary), "dtype": type_to_str(dtype)},
            buffers={"payload": pack(idx.view(np.uint64), cw).tobytes(),
                     "lens": pack(counts.view(np.uint64), lw).tobytes(),
                     "aux": ipc_serialize_array(dictionary),
                     "validity": validity})

    def decode(self, enc: EncodedColumn) -> pa.Array:
        n, p = enc.n_values, enc.params
        dtype = str_to_type(p["dtype"])
        dictionary = ipc_deserialize_array(enc.buffers["aux"])
        nt = p["n_tokens"]
        idx = unpack(np.frombuffer(enc.buffers["payload"], dtype=np.uint64),
                     p["code_width"], nt).view(np.int64)
        counts = unpack(np.frombuffer(enc.buffers["lens"], dtype=np.uint64),
                        p["len_width"], n).view(np.int64)
        # one C++ take over a DOUBLED vocabulary: entries 0..nd-1 are the
        # plain tokens, nd..2nd-1 the same token with a trailing space —
        # so code' = code + nd·(token is not row-last) turns the whole
        # "join tokens with spaces" into a single concatenated gather
        # (codecs/gather.py::take_concat; the old 2·nt interleaved numpy
        # gather cost 4-8 index bytes per output byte)
        dd, doffs = buffer_view(dictionary.cast(pa.large_string())) \
            if len(dictionary) else (np.empty(0, np.uint8),
                                     np.zeros(1, np.int64))
        nd = len(dictionary)
        # spaced copy of the vocab bytes: token i occupies
        # [o2[i], o2[i+1]) with a space in the last slot
        o2 = doffs + np.arange(nd + 1, dtype=np.int64)
        dd2 = np.empty(len(dd) + nd, dtype=np.uint8)
        tok_mask = np.ones(len(dd2), dtype=bool)
        tok_mask[o2[1:] - 1] = False
        dd2[o2[1:] - 1] = 32
        dd2[tok_mask] = dd
        vocab2 = pa.Array.from_buffers(
            pa.large_binary(), 2 * nd,
            [None,
             pa.py_buffer(np.concatenate([doffs[:-1], len(dd) + o2])),
             pa.py_buffer(np.concatenate([dd, dd2]))])
        sep = np.ones(nt, dtype=np.int64)
        ends = np.cumsum(counts)
        if nt:
            sep[ends[counts > 0] - 1] = 0  # no space after row-last token
        from .gather import take_concat
        out, cs2 = take_concat(vocab2, idx + nd * sep)
        tok_row_offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=tok_row_offs[1:])
        row_offs = cs2[tok_row_offs]
        large = pa.types.is_large_string(dtype)
        off_arr = row_offs.astype(np.int64 if large else np.int32)
        arr = pa.Array.from_buffers(
            dtype, n,
            [None, pa.py_buffer(np.ascontiguousarray(off_arr)),
             pa.py_buffer(np.ascontiguousarray(out))])
        valid = validity_from_bytes(enc.buffers.get("validity", b""), n)
        if valid is not None:
            arr = pc.if_else(pa.array(valid), arr, pa.nulls(n, type=dtype))
        return arr


register(TokenDictCodec())

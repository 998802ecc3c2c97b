"""Token+separator dictionary codec ("toksep") — dictionary encoding
lifted to *general* text tokens, lossless for ANY string/binary column.

A token is a maximal run of word bytes ([0-9A-Za-z] plus every byte
≥ 0x80, so multi-byte UTF-8 sequences never split) together with its
trailing run of separator bytes: ``"<a href=x>hi "`` tokenizes as
``"<" "a " "href=" "x>" "hi "``.  Web text — markup, URLs, prose — is
highly repetitive at this granularity, so a ⌈log2(vocab)⌉-bit code per
token beats byte-level schemes while the whole encode rides Arrow's C++
``dictionary_encode`` hash table.

This generalizes the single-space :mod:`.tokdict` codec (which it
subsumes for codec *selection* purposes on non-joinable columns) and,
like every codec here, the reference's symbol→code idea
(/root/reference/src/encoding/naive.rs:49-74) with the same word-aligned
bit-packed payload (/root/reference/src/naive_impl/seq_vector.rs:141-161).
Tokens never cross row boundaries, mirroring the reference's
SeqVecKmerIterator contract (windows never cross record bounds,
/root/reference/src/naive_impl/seq_vector.rs:183-205).

Layout:
  aux      Arrow IPC token dictionary (sorted → deterministic codes)
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
from .fsst import _is_stringy, buffer_view


def word_class(d: np.ndarray) -> np.ndarray:
    """Bool mask: byte is a word byte ([0-9A-Za-z] or ≥0x80).  Branch-free
    comparisons (cheaper than a 256-entry gather on this data shape)."""
    low = d | np.uint8(32)          # fold A-Z onto a-z
    return (((d >= 48) & (d <= 57))
            | ((low >= 97) & (low <= 122))
            | (d >= 128))


def tokenize_offsets(d: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """Token boundary offsets (includes 0 and len(d)); int32 when the
    data fits (halves the sort/merge traffic), else int64.

    A token starts where a word byte follows a non-word byte, and at
    every row start.  Both boundary sets are sorted; merge + dedupe.
    """
    idt = np.int32 if len(d) < (1 << 31) else np.int64
    if len(d) == 0:
        return np.zeros(1, dtype=idt)
    wc = word_class(d)
    cand = np.flatnonzero(wc[1:] & ~wc[:-1]).astype(idt)
    cand += 1
    merged = np.concatenate([cand, offs.astype(idt, copy=False)])
    merged.sort(kind="stable")
    keep = np.empty(len(merged), dtype=bool)
    keep[0] = True
    np.not_equal(merged[1:], merged[:-1], out=keep[1:])
    return merged[keep]


class TokSepCodec(Codec):
    name = "toksep"

    def can_encode(self, dtype: pa.DataType, stats: dict | None = None) -> bool:
        return _is_stringy(dtype)

    def encode(self, arr: pa.Array) -> EncodedColumn:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        n = len(arr)
        dtype = arr.type
        validity = validity_to_bytes(arr)
        if arr.null_count:
            fill = b"" if (pa.types.is_binary(dtype)
                           or pa.types.is_large_binary(dtype)) else ""
            arr = pc.fill_null(arr, fill)
        d, offs = buffer_view(arr)
        tok_offs = tokenize_offsets(d, offs)
        ntok = len(tok_offs) - 1
        counts = np.diff(np.searchsorted(
            tok_offs, offs.astype(tok_offs.dtype, copy=False)))
        # zero-copy token array over the existing data buffer
        tok_type = pa.binary() if tok_offs.dtype == np.int32 \
            else pa.large_binary()
        toks = pa.Array.from_buffers(
            tok_type, ntok,
            [None, pa.py_buffer(np.ascontiguousarray(tok_offs)),
             pa.py_buffer(np.ascontiguousarray(d))])
        from .dictionary import dict_encode_indices
        idx, dictionary = dict_encode_indices(toks)
        nd = len(dictionary)
        # reorder codes by descending frequency (stable → deterministic):
        # hot tokens get the small codes the escape-byte scheme rewards,
        # mirroring the reference's "frequent symbols get short codes"
        # permutation choice (/root/reference/src/encoding/naive.rs:49-74)
        if nd > 1 and ntok:
            freq = np.bincount(idx, minlength=nd)
            order = np.argsort(-freq, kind="stable")
            rank = np.empty(nd, dtype=np.int64)
            rank[order] = np.arange(nd, dtype=np.int64)
            idx = rank[idx]
            dictionary = dictionary.take(pa.array(order))
        lw = bits_needed(int(counts.max()) if n else 0)
        from .codestream import encode_code_stream
        cs_params, buffers = encode_code_stream(idx, nd)
        params = {"len_width": lw, "n_tokens": ntok, "n_dict": nd,
                  "dtype": type_to_str(dtype), **cs_params}
        buffers.update(lens=pack(counts.view(np.uint64), lw).tobytes(),
                       aux=ipc_serialize_array(dictionary),
                       validity=validity)
        return EncodedColumn(codec=self.name, n_values=n,
                             params=params, buffers=buffers)

    def decode(self, enc: EncodedColumn) -> pa.Array:
        n, p = enc.n_values, enc.params
        dtype = str_to_type(p["dtype"])
        nt = p["n_tokens"]
        from .codestream import decode_code_stream
        idx = decode_code_stream(p, enc.buffers, nt)
        counts = unpack(np.frombuffer(enc.buffers["lens"], dtype=np.uint64),
                        p["len_width"], n).view(np.int64)
        dictionary = ipc_deserialize_array(enc.buffers["aux"])
        if "shared_ref" in p:
            # shared-vocab block (stages/toksep_actor.py): dictionary =
            # sidecar vocabulary ⊕ per-block OOV patch
            if enc.base_dir is None:
                raise ValueError(
                    "shared-vocab toksep block: decode needs base_dir "
                    "(the encoded part's directory) to resolve "
                    f"{p['shared_ref']!r}")
            from ..stages.toksep_actor import load_shared_vocab
            shared = load_shared_vocab(enc.base_dir, p["shared_ref"])
            dictionary = pa.concat_arrays(
                [shared.cast(pa.large_binary()),
                 dictionary.cast(pa.large_binary())]) \
                if len(dictionary) else shared
        # gather token bytes via Arrow take: the take result's data
        # buffer IS the concatenation and its offsets the cumulative
        # lengths, all in C++ (codecs/gather.py::take_concat)
        from .gather import take_concat
        out, cs = take_concat(dictionary, idx)
        # row offsets: token-level cumsum sliced at row boundaries
        tok_row_offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=tok_row_offs[1:])
        row_offs = cs[tok_row_offs]
        large = (pa.types.is_large_string(dtype)
                 or pa.types.is_large_binary(dtype))
        off_arr = row_offs if large else row_offs.astype(np.int32)
        arr = pa.Array.from_buffers(
            dtype, n,
            [None, pa.py_buffer(np.ascontiguousarray(off_arr)),
             pa.py_buffer(np.ascontiguousarray(out))])
        valid = validity_from_bytes(enc.buffers.get("validity", b""), n)
        if valid is not None:
            arr = pc.if_else(pa.array(valid), arr, pa.nulls(n, type=dtype))
        return arr


register(TokSepCodec())

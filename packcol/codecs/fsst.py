"""FSST-lite: sampled-symbol-table string compression, fully vectorized.

A from-scratch lightweight string codec in the spirit of FSST
(Boncz/Neumann/Leis, VLDB'19 — public paper): build a small symbol table
from a sample, replace frequent substrings with 1-byte codes.  Our
simplification keeps every kernel numpy-vectorizable (no per-byte Python
loop, mirroring the branch-free spirit of the reference's
``(c>>1)&3`` inner loop, /root/reference/src/encoding/naive.rs:14-16):

* symbols are **digrams** (2-byte substrings), applied in up to 3
  recursive rounds (round r pairs round r-1's symbols), so one code can
  stand for up to 8 original bytes;
* code bytes are byte values **unused in the block's data**, so literals
  never need escaping and decode is a single table lookup;
* greedy left-to-right longest-match selection is computed in closed
  form: within each maximal run of consecutive match positions, every
  other position is chosen (run-parity), which equals the sequential
  greedy scan for 2-byte symbols;
* the symbol table is built from a strided sample of the block
  (generalizing the reference's minimizer *sampling* idea,
  /root/reference/src/naive_impl/seq_vector/minimizers.rs:38-142), and
  travels in the block header (self-describing, like SeqVector's serde
  form /root/reference/src/naive_impl/seq_vector.rs:18-22).

String offsets are themselves delta+bit-packed via :mod:`.bitpack`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .base import (Codec, EncodedColumn, register, str_to_type, type_to_str,
                   validity_from_bytes, validity_to_bytes)
from .bitpack import bits_needed, pack, unpack

_SAMPLE_MAX = 1 << 20   # bytes of data sampled for digram counting
_MIN_COUNT = 8          # a digram must appear ≥ this often in the sample
_MAX_SYMS = 160


def _is_stringy(t: pa.DataType) -> bool:
    return (pa.types.is_string(t) or pa.types.is_large_string(t)
            or pa.types.is_binary(t) or pa.types.is_large_binary(t))


def buffer_view(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(data:uint8, offsets:int64 rebased to 0) for a string-ish array."""
    t = arr.type
    off_dtype = np.int64 if (pa.types.is_large_string(t)
                             or pa.types.is_large_binary(t)) else np.int32
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=off_dtype)[
        arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
    if bufs[2] is not None and len(bufs[2]) > 0:
        data = np.frombuffer(bufs[2], dtype=np.uint8)
    else:
        data = np.empty(0, dtype=np.uint8)
    start, end = (offs[0], offs[-1]) if len(offs) else (0, 0)
    return np.ascontiguousarray(data[start:end]), offs - start


def build_symbol_table(d: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(code_bytes, digrams) — code_bytes[i] encodes digram digrams[i]."""
    n = len(d)
    if n < 16:
        return np.empty(0, np.uint8), np.empty(0, np.int32)
    present = np.bincount(d, minlength=256) > 0
    unused = np.flatnonzero(~present)
    if len(unused) == 0:
        return np.empty(0, np.uint8), np.empty(0, np.int32)
    if n > _SAMPLE_MAX:
        # strided contiguous slices → representative digram counts
        n_slices = 64
        sl = _SAMPLE_MAX // n_slices
        starts = (np.arange(n_slices) * ((n - sl) // max(n_slices - 1, 1)))
        sample = np.concatenate([d[s:s + sl] for s in starts])
    else:
        sample = d
    d16 = sample[:-1].astype(np.uint16)
    d16 <<= 8
    d16 |= sample[1:]
    counts = np.bincount(d16, minlength=65536)
    k = min(len(unused), _MAX_SYMS)
    # top-k via argpartition (65536-entry full argsort is ~10x the cost)
    top = np.argpartition(counts, -k)[-k:]
    top = top[np.argsort(counts[top])[::-1]]
    top = top[counts[top] >= _MIN_COUNT]
    code_bytes = unused[:len(top)].astype(np.uint8)
    return code_bytes, top.astype(np.int32)


_MAX_ROUNDS = 3
_MIN_ROUND_GAIN = 0.05


class FsstCodec(Codec):
    """Multi-round digram coding: round r pairs symbols of round r-1, so
    after 3 rounds a single code byte can stand for up to 8 original
    bytes (BPE-style recursive pairing, each round fully vectorized).
    Rounds stop when the marginal gain drops below 5%."""

    name = "fsst"

    def can_encode(self, dtype: pa.DataType, stats: dict | None = None) -> bool:
        return _is_stringy(dtype)

    def encode(self, arr: pa.Array) -> EncodedColumn:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        n = len(arr)
        dtype = arr.type
        validity = validity_to_bytes(arr)
        if arr.null_count:
            fill = "" if (pa.types.is_string(dtype)
                          or pa.types.is_large_string(dtype)) else b""
            arr = pc.fill_null(arr, fill)
        d, offs = buffer_view(arr)
        rounds = []
        for _ in range(_MAX_ROUNDS):
            code_bytes, digrams = build_symbol_table(d)
            if len(code_bytes) == 0:
                break
            out, enc_offs = fsst_compress(d, offs, code_bytes, digrams)
            if len(out) > len(d) * (1 - _MIN_ROUND_GAIN):
                break
            rounds.append([code_bytes.tolist(), digrams.tolist()])
            d, offs = out, enc_offs
        lens = np.diff(offs)
        lw = bits_needed(int(lens.max()) if len(lens) else 0)
        return EncodedColumn(
            codec=self.name, n_values=n,
            params={"rounds": rounds, "len_width": lw,
                    "dtype": type_to_str(dtype)},
            buffers={"payload": d.tobytes(),
                     "lens": pack(lens.view(np.uint64), lw).tobytes(),
                     "validity": validity},
        )

    def decode(self, enc: EncodedColumn) -> pa.Array:
        n, p = enc.n_values, enc.params
        e = np.frombuffer(enc.buffers["payload"], dtype=np.uint8)
        lens = unpack(np.frombuffer(enc.buffers["lens"], dtype=np.uint64),
                      p["len_width"], n).view(np.int64)
        enc_offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=enc_offs[1:])
        if "rounds" in p:
            rounds = p["rounds"]
        else:  # legacy single-round blocks
            rounds = [[p["codes"], p["digrams"]]] if p.get("codes") else []
        out, out_offs = fsst_expand_fused(e, enc_offs, rounds)
        dtype = str_to_type(p["dtype"])
        arr = _array_from_parts(out, out_offs, n, dtype)
        valid = validity_from_bytes(enc.buffers.get("validity", b""), n)
        if valid is not None:
            arr = pc.if_else(pa.array(valid), arr, pa.nulls(n, type=dtype))
        return arr


_CHUNK_BYTES = 2 << 20


def fsst_compress(d: np.ndarray, offs: np.ndarray, code_bytes: np.ndarray,
                  digrams: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Replace table digrams with code bytes; returns (enc_data, enc_offsets).

    Cache-resident chunking: the data is processed in ~2 MB slices split
    at string boundaries (exact — matches never cross strings), so the
    kernel's multi-pass temporaries stay in LLC instead of streaming
    DRAM.  Measured ~2x on multi-worker aggregate throughput."""
    if len(d) <= _CHUNK_BYTES or len(offs) <= 2:
        return _fsst_compress_chunk(d, offs, code_bytes, digrams)
    # split rows so each slice covers ≈ _CHUNK_BYTES of data
    cut_bytes = np.arange(_CHUNK_BYTES, len(d), _CHUNK_BYTES, dtype=np.int64)
    cut_rows = np.unique(np.searchsorted(offs, cut_bytes, side="left"))
    cut_rows = cut_rows[(cut_rows > 0) & (cut_rows < len(offs) - 1)]
    bounds = [0, *cut_rows.tolist(), len(offs) - 1]
    outs, offs_parts = [], [np.zeros(1, dtype=np.int64)]
    base = np.int64(0)
    for a, b in zip(bounds[:-1], bounds[1:]):
        lo, hi = offs[a], offs[b]
        o, eo = _fsst_compress_chunk(
            np.ascontiguousarray(d[lo:hi]), offs[a:b + 1] - lo,
            code_bytes, digrams)
        outs.append(o)
        offs_parts.append(eo[1:] + base)
        base += eo[-1]
    return np.concatenate(outs), np.concatenate(offs_parts)


def _fsst_compress_chunk(d: np.ndarray, offs: np.ndarray,
                         code_bytes: np.ndarray,
                         digrams: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """One chunk: greedy non-overlapping left-to-right selection,
    closed-form via run-parity (see module docstring).  Never matches
    across string boundaries."""
    nb = len(d)
    if nb < 2 or len(code_bytes) == 0:
        return d.copy(), offs.copy()
    # memory-traffic-lean layout: uint16 digram keys, bool match table,
    # and NO prefix-sum over the data — output positions follow from rank
    # arithmetic (dropped positions are exactly chosen+1, so the j-th
    # chosen match lands at output index chosen[j]-j, and encoded offsets
    # are offs[i] - #chosen_before(offs[i]) via searchsorted).
    match_tbl = np.zeros(65536, dtype=bool)
    match_tbl[digrams] = True
    code_tbl = np.zeros(65536, dtype=np.uint8)
    code_tbl[digrams] = code_bytes
    d16 = d[:-1].astype(np.uint16)
    d16 <<= 8
    d16 |= d[1:]
    m = match_tbl.take(d16)
    # a digram may not span two strings: kill matches starting at (boundary-1)
    b = offs[1:-1]
    b = b[(b > 0) & (b <= nb - 1)]
    m[b - 1] = False

    # greedy = every other position within each maximal run of matches
    # (positions at even distance from the run start).  Two closed forms,
    # picked by match density (A/B-measured crossover ~0.3):
    n_match = int(np.count_nonzero(m))
    if n_match == 0:
        return d.copy(), offs.copy()
    if n_match > 0.3 * nb:
        # dense: rel = distance to last non-match, int32 temporaries
        pos = np.arange(nb - 1, dtype=np.int32)
        lf = np.where(m, np.int32(-1), pos)
        np.maximum.accumulate(lf, out=lf)
        pos -= lf                     # 1 for the first match of a run
        cm = m & (pos & 1).astype(bool)
        chosen = np.flatnonzero(cm)
    else:
        # sparse: run-parity over the match list only
        m_idx = np.flatnonzero(m)
        first = np.empty(len(m_idx), dtype=bool)
        first[0] = True
        np.not_equal(np.diff(m_idx), 1, out=first[1:])
        run_id = np.cumsum(first)
        run_id -= 1
        rel = m_idx - m_idx[first][run_id]
        chosen = m_idx[(rel & 1) == 0]
    if len(chosen) == 0:
        return d.copy(), offs.copy()

    keep = np.ones(nb, dtype=bool)
    keep[chosen + 1] = False
    out = d[keep]
    out[chosen - np.arange(len(chosen), dtype=np.int64)] = \
        code_tbl.take(d16[chosen])
    enc_offs = offs - np.searchsorted(chosen, offs - 1, side="left")
    return out, enc_offs


def build_expansion_table(rounds: list) -> tuple[np.ndarray, np.ndarray]:
    """Fuse all rounds into (exp_bytes[256, L], exp_len[256]): the full
    final expansion of every byte value.  Round r codes expand through
    the earlier rounds recursively; plain bytes expand to themselves."""
    exp = {b: bytes([b]) for b in range(256)}
    for codes, digrams in rounds:  # apply in encode order; later rounds
        # reference earlier codes, so expansions compose left to right
        for c, dg in zip(codes, digrams):
            exp[int(c)] = exp[dg >> 8] + exp[dg & 255]
    max_len = max(len(v) for v in exp.values())
    table = np.zeros((256, max_len), dtype=np.uint8)
    lens = np.zeros(256, dtype=np.int64)
    for b, v in exp.items():
        table[b, :len(v)] = np.frombuffer(v, dtype=np.uint8)
        lens[b] = len(v)
    return table, lens


def fsst_expand_fused(e: np.ndarray, enc_offs: np.ndarray,
                      rounds: list) -> tuple[np.ndarray, np.ndarray]:
    """One-pass decode of multi-round FSST: each encoded byte expands to
    its fused final byte-string via max_len vectorized scatter steps
    (instead of one full pass per round)."""
    if not rounds:
        return e.copy(), enc_offs.copy()
    table, lens = build_expansion_table(rounds)
    ne = len(e)
    if ne == 0:
        return e.copy(), enc_offs.copy()
    el = lens.take(e)
    starts = np.zeros(ne, dtype=np.int64)
    np.cumsum(el[:-1], out=starts[1:])
    total = int(starts[-1] + el[-1])
    out = np.empty(total, dtype=np.uint8)
    max_len = table.shape[1]
    for j in range(max_len):  # ≤ 2^rounds (8): bounded, vectorized steps
        m = el > j
        if j == 0:
            out[starts] = table[e, 0]
        elif m.any():
            out[starts[m] + j] = table[e[m], j]
    full = np.zeros(ne + 1, dtype=np.int64)
    full[1:ne] = starts[1:]
    full[ne] = total
    return out, full[enc_offs]


def fsst_decompress(e: np.ndarray, enc_offs: np.ndarray,
                    code_bytes: np.ndarray, digrams: np.ndarray
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Chunked at string boundaries like fsst_compress (cache-resident
    temporaries)."""
    if len(e) <= _CHUNK_BYTES or len(enc_offs) <= 2:
        return _fsst_decompress_chunk(e, enc_offs, code_bytes, digrams)
    cut_bytes = np.arange(_CHUNK_BYTES, len(e), _CHUNK_BYTES, dtype=np.int64)
    cut_rows = np.unique(np.searchsorted(enc_offs, cut_bytes, side="left"))
    cut_rows = cut_rows[(cut_rows > 0) & (cut_rows < len(enc_offs) - 1)]
    bounds = [0, *cut_rows.tolist(), len(enc_offs) - 1]
    outs, offs_parts = [], [np.zeros(1, dtype=np.int64)]
    base = np.int64(0)
    for a, b in zip(bounds[:-1], bounds[1:]):
        lo, hi = enc_offs[a], enc_offs[b]
        o, oo = _fsst_decompress_chunk(
            np.ascontiguousarray(e[lo:hi]), enc_offs[a:b + 1] - lo,
            code_bytes, digrams)
        outs.append(o)
        offs_parts.append(oo[1:] + base)
        base += oo[-1]
    return np.concatenate(outs), np.concatenate(offs_parts)


def _fsst_decompress_chunk(e: np.ndarray, enc_offs: np.ndarray,
                           code_bytes: np.ndarray, digrams: np.ndarray
                           ) -> tuple[np.ndarray, np.ndarray]:
    ne = len(e)
    if ne == 0 or len(code_bytes) == 0:
        return e.copy(), enc_offs.copy()
    is_code_tbl = np.zeros(256, dtype=bool)
    is_code_tbl[code_bytes.astype(np.int64)] = True
    hi_tbl = np.zeros(256, dtype=np.uint8)
    lo_tbl = np.zeros(256, dtype=np.uint8)
    hi_tbl[code_bytes.astype(np.int64)] = (digrams >> 8).astype(np.uint8)
    lo_tbl[code_bytes.astype(np.int64)] = (digrams & 255).astype(np.uint8)
    is_code = is_code_tbl.take(e)
    # start[i] = i + #codes before i  (each code adds one extra out byte)
    extra = np.cumsum(is_code, dtype=np.int64)
    starts = np.arange(ne, dtype=np.int64)
    starts += extra
    starts -= is_code          # shift: codes count from their own position
    total = ne + int(extra[-1])
    out = np.empty(total, dtype=np.uint8)
    lit = ~is_code
    out[starts[lit]] = e[lit]
    ecodes = e[is_code]
    cs = starts[is_code]
    out[cs] = hi_tbl.take(ecodes)
    out[cs + 1] = lo_tbl.take(ecodes)
    full = np.zeros(ne + 1, dtype=np.int64)
    full[1:] = starts + 1
    full[1:][is_code] += 1
    return out, full[enc_offs]


def _array_from_parts(data: np.ndarray, offsets: np.ndarray, n: int,
                      dtype: pa.DataType) -> pa.Array:
    large = pa.types.is_large_string(dtype) or pa.types.is_large_binary(dtype)
    off = offsets.astype(np.int64 if large else np.int32)
    return pa.Array.from_buffers(
        dtype, n,
        [None, pa.py_buffer(np.ascontiguousarray(off)),
         pa.py_buffer(np.ascontiguousarray(data))])


register(FsstCodec())

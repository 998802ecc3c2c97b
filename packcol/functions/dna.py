"""DNA k-mer kernels — direct parity with the reference implementation.

This module reproduces the reference's observable behavior exactly
(golden tests in tests/test_dna.py mirror
/root/reference/src/encoding/naive.rs:296-445 and
/root/reference/src/naive_impl/kmer.rs), re-expressed as vectorized
numpy kernels over batches of sequences instead of per-value Rust:

* 2-bit encode/decode under the ACGT table (E2/E3,
  /root/reference/src/encoding/naive.rs:116-136), low-order-first words
* branch-free reverse-complement bit-swizzle (N1/N2,
  /root/reference/src/naive_impl/kmer.rs:124-147)
* canonical form = min(fw, revcomp) + orientation (N3,
  /root/reference/src/naive_impl/kmer.rs:55-74)
* sliding k-window scan with invalid-symbol skipping (S1,
  /root/reference/src/naive_impl/canonical_kmer_iterator.rs:32-116)
* minimizers (S2/S3, /root/reference/src/naive_impl/kmer.rs:164-192)
* kmer_space / canonical_space cardinality math (C1/C2,
  /root/reference/src/utils.rs:27-38 — including the reference's pinned
  even-k formula)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..codecs.bitpack import pack, unpack

# ACGT table: A=0, C=1, G=2, T=3 (the reference's `Naive::ACGT` member
# and naive_impl's encode_binary, src/naive_impl/mod.rs:20-24)
ENC_TABLE = np.full(256, 255, dtype=np.uint8)
for i, c in enumerate(b"ACGT"):
    ENC_TABLE[c] = i
    ENC_TABLE[c + 32] = i  # lowercase (case-insensitive, kmer.rs:469-474)
DEC_TABLE = np.frombuffer(b"ACGT", dtype=np.uint8)

INVALID = 255  # sentinel, analogue of u64::MAX in encode_binary_u8
K_MAX = 32     # one u64 word (src/naive_impl/kmer.rs:211-213)

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def seq_to_codes(seq: str | bytes) -> np.ndarray:
    """ASCII → 2-bit codes; invalid symbols become the 255 sentinel
    (encode_binary_u8 policy, src/naive_impl/mod.rs:40-50)."""
    if isinstance(seq, str):
        seq = seq.encode()
    return ENC_TABLE.take(np.frombuffer(seq, dtype=np.uint8))


def codes_to_seq(codes: np.ndarray) -> bytes:
    return DEC_TABLE.take(codes).tobytes()


def encode_kmer(seq: str | bytes) -> int:
    """Pack one ≤32-symbol sequence into a u64, low-order-first (the
    layout proven by the reference's golden words: "TAAGGATTCTAATCA" →
    u8 view [131,242,13,7])."""
    codes = seq_to_codes(seq)
    if len(codes) > K_MAX:
        raise ValueError(f"k must be <= {K_MAX}")
    if (codes == INVALID).any():
        raise ValueError("invalid nucleotide")
    words = pack(codes.astype(np.uint64), 2)
    return int(words[0]) if len(words) else 0


def decode_kmer(word: int, k: int) -> str:
    codes = unpack(np.array([word], dtype=np.uint64), 2, k).astype(np.uint8)
    return codes_to_seq(codes).decode()


def mask_kmer(words: np.ndarray, k: int) -> np.ndarray:
    """Clear bits above 2k — MASK_TABLE semantics
    (src/naive_impl/kmer.rs:584-618): from_u64 masks stray high bits."""
    if k >= 32:
        return words
    return words & np.uint64((1 << (2 * k)) - 1)


def revcomp_words(words: np.ndarray, k: int) -> np.ndarray:
    """Vectorized branch-free reverse-complement of packed u64 k-mers —
    the 5-step swizzle of src/naive_impl/kmer.rs:138-147:
    complement (~x), swap adjacent 2-bit pairs, nibbles, bytes, u16s,
    u32s, then shift down by 2*(32-k)."""
    x = ~np.asarray(words, dtype=np.uint64)
    x = ((x >> np.uint64(2)) & np.uint64(0x3333333333333333)) | \
        ((x & np.uint64(0x3333333333333333)) << np.uint64(2))
    x = ((x >> np.uint64(4)) & np.uint64(0x0F0F0F0F0F0F0F0F)) | \
        ((x & np.uint64(0x0F0F0F0F0F0F0F0F)) << np.uint64(4))
    x = ((x >> np.uint64(8)) & np.uint64(0x00FF00FF00FF00FF)) | \
        ((x & np.uint64(0x00FF00FF00FF00FF)) << np.uint64(8))
    x = ((x >> np.uint64(16)) & np.uint64(0x0000FFFF0000FFFF)) | \
        ((x & np.uint64(0x0000FFFF0000FFFF)) << np.uint64(16))
    x = (x >> np.uint64(32)) | (x << np.uint64(32))
    return x >> np.uint64(2 * (32 - k))


def canonicalize_words(words: np.ndarray, k: int
                       ) -> tuple[np.ndarray, np.ndarray]:
    """(canonical, is_fw_canonical): canonical = min(fw, rc) under word
    order (src/naive_impl/kmer.rs:55-74; Ord on the packed word, H4)."""
    fw = mask_kmer(np.asarray(words, dtype=np.uint64), k)
    rc = revcomp_words(fw, k)
    is_fw = fw <= rc
    return np.where(is_fw, fw, rc), is_fw


def kmer_windows(seq: str | bytes, k: int,
                 enc_table: np.ndarray | None = None
                 ) -> tuple[np.ndarray, np.ndarray]:
    """All k-windows of a sequence as packed u64s + start positions,
    SKIPPING windows containing invalid symbols — the
    CanonicalKmerIterator `last_invalid` watermark semantics
    (src/naive_impl/canonical_kmer_iterator.rs:52-66), vectorized.
    `enc_table` swaps in an alternate 256->code table (one of the 24
    Naive permutations / xor10, see functions/dna_encodings.py)."""
    if not 1 <= k <= K_MAX:
        raise ValueError(
            f"k={k} exceeds the single-word cap {K_MAX}; use the "
            "*_multi variants (silent truncation would alias k-mers)")
    if enc_table is None:
        codes = seq_to_codes(seq)
    else:
        if isinstance(seq, str):
            seq = seq.encode()
        codes = enc_table.take(np.frombuffer(seq, dtype=np.uint8))
    n = len(codes)
    if n < k:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    valid = codes != INVALID
    # window valid ⇔ no invalid symbol inside: windowed sum of invalids == 0
    cs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(~valid, out=cs[1:])
    ok = (cs[k:] - cs[:-k]) == 0
    safe = np.where(valid, codes, 0).astype(np.uint64)
    # SeqVector-style extraction (src/naive_impl/seq_vector.rs:96-99):
    # pack the whole sequence once, then read every 2k-bit window out of
    # the packed words with two shifts — O(1) per window, fully
    # vectorized, ~6x less memory traffic than k shifted ORs.
    packed = pack(safe, 2)
    packed = np.concatenate([packed, np.zeros(1, dtype=np.uint64)])
    nw = n - k + 1
    i = np.arange(nw, dtype=np.int64)
    wi = i >> 5
    sh = ((i & 31) << 1).astype(np.uint64)
    lo = packed[wi] >> sh
    hi_shift = (np.uint64(64) - sh) & np.uint64(63)  # sh==0 → no hi part
    hi = np.where(sh > 0, packed[wi + 1] << hi_shift, np.uint64(0))
    mask = np.uint64((1 << (2 * k)) - 1) if k < 32 else \
        np.uint64(0xFFFFFFFFFFFFFFFF)
    w = (lo | hi) & mask
    pos = np.flatnonzero(ok)
    return w[pos], pos


def canonical_kmer_scan(seq: str | bytes, k: int, encoding=None
                        ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(canonical kmers, positions, is_fw) for every valid window — EP2,
    the reference's canonical k-mer iterator as one vectorized pass.
    `encoding` (a name or SymbolEncoding, dna_encodings.get_encoding)
    selects one of the reference's user-facing symbol->code tables; the
    default is the fast ACGT path."""
    enc = _resolve_encoding(encoding)
    if enc is None:
        w, pos = kmer_windows(seq, k)
        canon, is_fw = canonicalize_words(w, k)
    else:
        w, pos = kmer_windows(seq, k, enc_table=enc.enc_table)
        canon, is_fw = enc.canonicalize_words(w, k)
    return canon, pos, is_fw


def _resolve_encoding(encoding):
    """None/'ACGT' -> None (the built-in fast path); otherwise a
    SymbolEncoding from functions/dna_encodings.py."""
    if encoding is None:
        return None
    if isinstance(encoding, str):
        if encoding.upper() == "ACGT":
            return None
        from .dna_encodings import get_encoding
        return get_encoding(encoding)
    return encoding


def decode_kmer_batch(words: np.ndarray, k: int,
                      dec_table: np.ndarray | None = None) -> pa.Array:
    """Vectorized packed-word → ACGT-string decode for a whole array
    (no per-value Python), used when materializing k-mer count results.
    `dec_table` swaps in an alternate code→ASCII table."""
    n = len(words)
    if n == 0:
        return pa.array([], type=pa.string())
    w = np.asarray(words, dtype=np.uint64)
    shifts = np.arange(k, dtype=np.uint64) * np.uint64(2)
    codes = ((w[:, None] >> shifts) & np.uint64(3)).astype(np.uint8)
    chars = (DEC_TABLE if dec_table is None else dec_table).take(codes)
    if (n + 1) * k >= 2**31:  # int32 offsets would wrap — large_string
        offs64 = np.arange(n + 1, dtype=np.int64) * k
        return pa.Array.from_buffers(
            pa.large_string(), n,
            [None, pa.py_buffer(offs64.tobytes()),
             pa.py_buffer(np.ascontiguousarray(chars).tobytes())])
    offs = np.arange(n + 1, dtype=np.int32) * k
    return pa.Array.from_buffers(
        pa.string(), n,
        [None, pa.py_buffer(offs.tobytes()),
         pa.py_buffer(np.ascontiguousarray(chars).tobytes())])


_SCAN_CHUNK_BYTES = 2 << 20


def canonical_kmer_scan_batch(seqs: pa.Array, k: int, encoding=None
                              ) -> tuple[np.ndarray, np.ndarray,
                                         np.ndarray, np.ndarray]:
    """(row_ids, in_row_positions, canonical_words, is_fw) for every valid
    window of every row.

    Cache-resident chunking (same rationale as codecs/fsst.py): the scan
    allocates ~10 window-sized temporaries, so one pass over a many-MB
    column would stream them all through DRAM — and on first touch that
    cost is paid under this sandbox's *global* page-fault wall by every
    concurrent worker.  Slicing the column into ~2 MB row groups keeps
    the temporaries allocator-warm; outputs are concatenated once."""
    if isinstance(seqs, pa.ChunkedArray):
        seqs = seqs.combine_chunks()
    nbytes = (seqs.nbytes if len(seqs) else 0)
    if nbytes <= _SCAN_CHUNK_BYTES or len(seqs) < 2:
        return _canonical_kmer_scan_batch_chunk(seqs, k, encoding)
    n = len(seqs)
    step = max(int(n * _SCAN_CHUNK_BYTES / nbytes), 1)
    rows, in_rows, canons, fws = [], [], [], []
    for lo in range(0, n, step):
        sl = seqs.slice(lo, step)
        r, ir, c, f = _canonical_kmer_scan_batch_chunk(sl, k, encoding)
        if len(r):
            rows.append(r + lo)
            in_rows.append(ir)
            canons.append(c)
            fws.append(f)
    if not rows:
        z = np.empty(0, np.int64)
        return z, z, np.empty(0, np.uint64), np.empty(0, bool)
    return (np.concatenate(rows), np.concatenate(in_rows),
            np.concatenate(canons), np.concatenate(fws))


def _canonical_kmer_scan_batch_chunk(seqs: pa.Array, k: int, encoding=None
                                     ) -> tuple[np.ndarray, np.ndarray,
                                                np.ndarray, np.ndarray]:
    """One chunk of the batch scan — rows joined with an invalid
    separator byte, so the reference's invalid-window skip
    (canonical_kmer_iterator.rs:52-66) doubles as the row-boundary
    guard: windows can never span two sequences."""
    import pyarrow.compute as pc
    from ..codecs.fsst import buffer_view
    if not 1 <= k <= K_MAX:
        raise ValueError(
            f"k={k} exceeds the single-word cap {K_MAX}; use "
            "canonical_kmer_scan_batch_multi (silent truncation would "
            "alias k-mers)")
    if isinstance(seqs, pa.ChunkedArray):
        seqs = seqs.combine_chunks()
    if seqs.null_count:
        seqs = pc.fill_null(seqs, "")
    d, offs = buffer_view(seqs)
    n_rows = len(seqs)
    if len(d) == 0:
        z = np.empty(0, np.int64)
        return z, z, np.empty(0, np.uint64), np.empty(0, bool)
    # interleave a separator byte (invalid symbol) between rows
    lens = np.diff(offs)
    sep_d = np.zeros(len(d) + n_rows, dtype=np.uint8)  # 0 = invalid code
    new_starts = offs[:-1] + np.arange(n_rows)
    pos_map = np.arange(len(d), dtype=np.int64) + \
        np.repeat(np.arange(n_rows, dtype=np.int64), lens)
    sep_d[pos_map] = d
    joined = sep_d.tobytes()
    enc = _resolve_encoding(encoding)
    # separator byte 0 is an invalid symbol under EVERY table (no table
    # maps NUL), so the row-boundary guard holds for alternate encodings
    w, p = kmer_windows(joined, k,
                        enc_table=None if enc is None else enc.enc_table)
    row = np.searchsorted(new_starts, p, side="right") - 1
    in_row = p - new_starts[row]
    if enc is None:
        canon, is_fw = canonicalize_words(w, k)
    else:
        canon, is_fw = enc.canonicalize_words(w, k)
    return row.astype(np.int64), in_row, canon, is_fw


# --- multi-word k-mers (k > 32): generic Kmer<P,K,B> parity ----------------
#
# The reference's generic kmer packs K 2-bit symbols low-order-first
# across an array of B words (src/kmer.rs:12-14, word_for_k at :67-69;
# golden vectors for k=45 on [u64;2] and k=65 on u128 at
# src/encoding/naive.rs:388-436 — reproduced in tests/test_bitpack.py).
# Here a column of multi-word k-mers is an (n, B) uint64 ndarray
# (little-endian word order), and every kernel below is vectorized
# across n.  Canonical order for k>32 compares the multi-word value as
# one big unsigned integer (most-significant word first) — the natural
# generalization of naive_impl's Ord-on-u64 canonical choice
# (src/naive_impl/kmer.rs:55-74).

K_MAX_MULTI = 512  # sanity cap: 32 u64 words per k-mer


def n_words_for_k(k: int) -> int:
    """word_for_k::<u64, K>() (src/kmer.rs:67-69)."""
    return (2 * k + 63) // 64


def _rev2_word(x: np.ndarray) -> np.ndarray:
    """Reverse the 32 2-bit groups of each u64 (the 5-step swizzle of
    src/naive_impl/kmer.rs:138-147, without the final down-shift)."""
    x = ((x >> np.uint64(2)) & np.uint64(0x3333333333333333)) | \
        ((x & np.uint64(0x3333333333333333)) << np.uint64(2))
    x = ((x >> np.uint64(4)) & np.uint64(0x0F0F0F0F0F0F0F0F)) | \
        ((x & np.uint64(0x0F0F0F0F0F0F0F0F)) << np.uint64(4))
    x = ((x >> np.uint64(8)) & np.uint64(0x00FF00FF00FF00FF)) | \
        ((x & np.uint64(0x00FF00FF00FF00FF)) << np.uint64(8))
    x = ((x >> np.uint64(16)) & np.uint64(0x0000FFFF0000FFFF)) | \
        ((x & np.uint64(0x0000FFFF0000FFFF)) << np.uint64(16))
    return (x >> np.uint64(32)) | (x << np.uint64(32))


def _shr_multi(words: np.ndarray, s: int) -> np.ndarray:
    """Logical right shift of (n, B) little-endian u64 arrays by s bits."""
    n, B = words.shape
    ws, bs = divmod(s, 64)
    ext = np.concatenate(
        [words, np.zeros((n, ws + 1), dtype=np.uint64)], axis=1)
    lo = ext[:, ws:ws + B]
    if bs == 0:
        return lo.copy()
    return (lo >> np.uint64(bs)) | \
        (ext[:, ws + 1:ws + 1 + B] << np.uint64(64 - bs))


def mask_kmer_multi(words: np.ndarray, k: int) -> np.ndarray:
    """Clear bits above 2k across the word array (MASK_TABLE semantics)."""
    B = words.shape[1]
    out = words.copy()
    top_bits = 2 * k - 64 * (B - 1)
    if top_bits < 64:
        out[:, B - 1] &= np.uint64((1 << top_bits) - 1)
    return out


def revcomp_words_multi(words: np.ndarray, k: int) -> np.ndarray:
    """Vectorized reverse-complement of (n, B) packed k-mers — the
    generic two-pointer rev_comp (src/encoding/naive.rs:138-154)
    expressed as: complement, reverse 2-bit groups within each word,
    reverse word order, shift down by 2*(32*B - k)."""
    words = np.asarray(words, dtype=np.uint64)
    x = _rev2_word(~words)[:, ::-1]
    return _shr_multi(np.ascontiguousarray(x), 2 * (32 * words.shape[1] - k))


def _lex_le_multi(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """a <= b comparing (n, B) little-endian multi-word unsigned ints."""
    n, B = a.shape
    result = np.ones(n, dtype=bool)
    decided = np.zeros(n, dtype=bool)
    for j in range(B - 1, -1, -1):  # most-significant word first
        lt = ~decided & (a[:, j] < b[:, j])
        gt = ~decided & (a[:, j] > b[:, j])
        result[gt] = False
        decided |= lt | gt
    return result


def canonicalize_words_multi(words: np.ndarray, k: int
                             ) -> tuple[np.ndarray, np.ndarray]:
    """(canonical (n,B), is_fw): canonical = min(fw, rc) under multi-word
    integer order."""
    fw = mask_kmer_multi(np.asarray(words, dtype=np.uint64), k)
    rc = revcomp_words_multi(fw, k)
    is_fw = _lex_le_multi(fw, rc)
    return np.where(is_fw[:, None], fw, rc), is_fw


def kmer_windows_multi(seq: str | bytes, k: int
                       ) -> tuple[np.ndarray, np.ndarray]:
    """All k-windows as (n_win, B) packed words + positions, skipping
    invalid-symbol windows — kmer_windows generalized past one word."""
    B = n_words_for_k(k)
    codes = seq_to_codes(seq)
    n = len(codes)
    if n < k:
        return np.empty((0, B), np.uint64), np.empty(0, np.int64)
    valid = codes != INVALID
    cs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(~valid, out=cs[1:])
    ok = (cs[k:] - cs[:-k]) == 0
    safe = np.where(valid, codes, 0).astype(np.uint64)
    packed = pack(safe, 2)
    packed = np.concatenate([packed, np.zeros(B + 1, dtype=np.uint64)])
    nw = n - k + 1
    i = np.arange(nw, dtype=np.int64)
    wi = i >> 5
    sh = ((i & 31) << 1).astype(np.uint64)
    hi_shift = (np.uint64(64) - sh) & np.uint64(63)
    out = np.empty((nw, B), dtype=np.uint64)
    nonzero_sh = sh > 0
    for j in range(B):
        lo = packed[wi + j] >> sh
        hi = np.where(nonzero_sh, packed[wi + j + 1] << hi_shift,
                      np.uint64(0))
        out[:, j] = lo | hi
    out = mask_kmer_multi(out, k)
    pos = np.flatnonzero(ok)
    return out[pos], pos


def canonical_kmer_scan_multi(seq: str | bytes, k: int
                              ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(canonical (n,B), positions, is_fw) for every valid window, k>32."""
    w, pos = kmer_windows_multi(seq, k)
    canon, is_fw = canonicalize_words_multi(w, k)
    return canon, pos, is_fw


def decode_kmer_multi(words: np.ndarray, k: int) -> str:
    """One (B,) word array → ACGT string."""
    codes = unpack(np.asarray(words, dtype=np.uint64).ravel(), 2, k)
    return codes_to_seq(codes.astype(np.uint8)).decode()


def decode_kmer_batch_multi(words: np.ndarray, k: int) -> pa.Array:
    """Vectorized (n, B) packed-word → ACGT-string decode."""
    n, B = words.shape
    if n == 0:
        return pa.array([], type=pa.string())
    w = np.ascontiguousarray(words, dtype=np.uint64)
    # per-symbol extraction across words: symbol i lives in word i//32
    sym = np.arange(k, dtype=np.int64)
    wi, sh = sym >> 5, ((sym & 31) << 1).astype(np.uint64)
    codes = ((w[:, wi] >> sh) & np.uint64(3)).astype(np.uint8)
    chars = DEC_TABLE.take(codes)
    if (n + 1) * k >= 2**31:  # int32 offsets would wrap — large_string
        offs64 = np.arange(n + 1, dtype=np.int64) * k
        return pa.Array.from_buffers(
            pa.large_string(), n,
            [None, pa.py_buffer(offs64.tobytes()),
             pa.py_buffer(np.ascontiguousarray(chars).tobytes())])
    offs = np.arange(n + 1, dtype=np.int32) * k
    return pa.Array.from_buffers(
        pa.string(), n,
        [None, pa.py_buffer(offs.tobytes()),
         pa.py_buffer(np.ascontiguousarray(chars).tobytes())])


def canonical_kmer_scan_batch_multi(seqs: pa.Array, k: int
                                    ) -> tuple[np.ndarray, np.ndarray,
                                               np.ndarray, np.ndarray]:
    """(row_ids, in_row_positions, canonical (n,B), is_fw) over a whole
    string column — canonical_kmer_scan_batch for k > 32, with the same
    cache-resident ~2 MB row-group chunking."""
    if isinstance(seqs, pa.ChunkedArray):
        seqs = seqs.combine_chunks()
    nbytes = (seqs.nbytes if len(seqs) else 0)
    if nbytes <= _SCAN_CHUNK_BYTES or len(seqs) < 2:
        return _canonical_kmer_scan_batch_multi_chunk(seqs, k)
    n = len(seqs)
    step = max(int(n * _SCAN_CHUNK_BYTES / nbytes), 1)
    B = n_words_for_k(k)
    rows, in_rows, canons, fws = [], [], [], []
    for lo in range(0, n, step):
        r, ir, c, f = _canonical_kmer_scan_batch_multi_chunk(
            seqs.slice(lo, step), k)
        if len(r):
            rows.append(r + lo)
            in_rows.append(ir)
            canons.append(c)
            fws.append(f)
    if not rows:
        z = np.empty(0, np.int64)
        return z, z, np.empty((0, B), np.uint64), np.empty(0, bool)
    return (np.concatenate(rows), np.concatenate(in_rows),
            np.concatenate(canons), np.concatenate(fws))


def _canonical_kmer_scan_batch_multi_chunk(seqs: pa.Array, k: int
                                           ) -> tuple[np.ndarray, np.ndarray,
                                                      np.ndarray, np.ndarray]:
    """One chunk (separator-byte row-boundary guard, same as the k≤32
    path)."""
    import pyarrow.compute as pc
    from ..codecs.fsst import buffer_view
    if k <= K_MAX:
        raise ValueError("use canonical_kmer_scan_batch for k <= 32")
    if k > K_MAX_MULTI:
        raise ValueError(f"k must be <= {K_MAX_MULTI}")
    B = n_words_for_k(k)
    if isinstance(seqs, pa.ChunkedArray):
        seqs = seqs.combine_chunks()
    if seqs.null_count:
        seqs = pc.fill_null(seqs, "")
    d, offs = buffer_view(seqs)
    n_rows = len(seqs)
    if len(d) == 0:
        z = np.empty(0, np.int64)
        return z, z, np.empty((0, B), np.uint64), np.empty(0, bool)
    lens = np.diff(offs)
    sep_d = np.zeros(len(d) + n_rows, dtype=np.uint8)
    new_starts = offs[:-1] + np.arange(n_rows)
    pos_map = np.arange(len(d), dtype=np.int64) + \
        np.repeat(np.arange(n_rows, dtype=np.int64), lens)
    sep_d[pos_map] = d
    w, p = kmer_windows_multi(sep_d.tobytes(), k)
    row = np.searchsorted(new_starts, p, side="right") - 1
    in_row = p - new_starts[row]
    canon, is_fw = canonicalize_words_multi(w, k)
    return row.astype(np.int64), in_row, canon, is_fw


# --- equivalency (N5) ------------------------------------------------------

NO_MATCH, IDENTITY_MATCH, TWIN_MATCH = 0, 1, 2


def word_equivalency(a: np.ndarray, b: np.ndarray, k: int) -> np.ndarray:
    """3-way match category per pair — MatchType semantics
    (src/naive_impl/canonical_kmer.rs:142-161)."""
    a = mask_kmer(np.asarray(a, dtype=np.uint64), k)
    b = mask_kmer(np.asarray(b, dtype=np.uint64), k)
    rc = revcomp_words(a, k)
    out = np.full(len(a), NO_MATCH, dtype=np.int8)
    out[b == rc] = TWIN_MATCH
    out[b == a] = IDENTITY_MATCH  # identity wins (checked first in ref)
    return out


# --- streaming rolling updates (kmer.rs:76-102, canonical_kmer.rs:20-141) --
#
# The incremental path for data that arrives one symbol at a time and
# cannot be re-batched: O(1) append/prepend on a dual-tracked (fw, rc)
# pair, exactly the reference's CanonicalKmer.  The batch pipelines use
# the vectorized scans above; these classes exist for true streams and
# as executable documentation of the rolling semantics.

class CanonicalKmerStream:
    """Dual-track rolling canonical k-mer: fw and rc are kept in sync so
    append/prepend are O(1) and the canonical word is min(fw, rc) at
    any instant (canonical_kmer.rs:20-141)."""

    __slots__ = ("k", "fw", "rc", "_mask", "_top")

    def __init__(self, k: int):
        if not 1 <= k <= K_MAX:
            raise ValueError(f"k must be in 1..{K_MAX}")
        self.k = k
        self._mask = (1 << (2 * k)) - 1
        self._top = 2 * k - 2
        # blank_of_size: fw=0, rc=all-ones (canonical_kmer.rs:22-29)
        self.fw = 0
        self.rc = ((1 << 64) - 1) & self._mask

    @classmethod
    def from_word(cls, w: int, k: int) -> "CanonicalKmerStream":
        self = cls(k)
        self.fw = w & self._mask_of(k)
        self.rc = int(revcomp_words(
            np.array([self.fw], dtype=np.uint64), k)[0])
        return self

    @classmethod
    def from_seq(cls, seq: str | bytes, k: int) -> "CanonicalKmerStream":
        return cls.from_word(encode_kmer(seq), k)

    @staticmethod
    def _mask_of(k: int) -> int:
        return (1 << (2 * k)) - 1

    def append_base(self, b: int) -> int:
        """Push symbol b at the end; returns the dropped first symbol
        (fw append + rc prepend of the complement, O(1))."""
        r = self.fw & 3
        self.fw = (self.fw >> 2) | (b << self._top)
        self.rc = self._mask & ((self.rc << 2) | (3 - b))
        return r

    def prepend_base(self, b: int) -> int:
        r = (self.fw >> self._top) & 3
        self.fw = self._mask & ((self.fw << 2) | b)
        self.rc = (self.rc >> 2) | ((3 - b) << self._top)
        return r

    def append_char(self, c: str | int) -> int:
        b = int(ENC_TABLE[ord(c) if isinstance(c, str) else c])
        if b == INVALID:
            raise ValueError(f"invalid nucleotide {c!r}")
        return self.append_base(b)

    def swap(self) -> None:
        self.fw, self.rc = self.rc, self.fw

    def is_fw_canonical(self) -> bool:
        return self.fw < self.rc

    def get_canonical_word(self) -> int:
        return self.fw if self.fw < self.rc else self.rc

    def get_fw_word(self) -> int:
        return self.fw

    def get_rc_word(self) -> int:
        return self.rc

    def get_word_equivalency(self, other: int) -> int:
        if self.fw == other:
            return IDENTITY_MATCH
        if self.rc == other:
            return TWIN_MATCH
        return NO_MATCH


class CanonicalKmerIteratorStream:
    """Streaming CanonicalKmerIterator
    (canonical_kmer_iterator.rs:32-116): rolling append one base per
    step, skipping windows containing invalid symbols via the
    last_invalid watermark.  API parity: exhausted / inc / inc_by /
    get() → (stream, pos)."""

    def __init__(self, seq: str | bytes, k: int):
        self.seq = seq.encode() if isinstance(seq, str) else bytes(seq)
        self.k = k
        self.km = CanonicalKmerStream(k)
        self.pos = 0
        self.invalid = False
        self.last_invalid = -1
        self._find_next(-1, -1)

    def _find_next(self, ii: int, jj: int) -> None:
        i = ii + 1
        for l in range(jj + 1, len(self.seq)):
            b = int(ENC_TABLE[self.seq[l]])
            if b != INVALID:
                self.km.append_base(b)
                if l - self.last_invalid >= self.k:
                    self.pos = i
                    return
            else:
                self.last_invalid = l
                i = l + 1
        self.invalid = True

    def exhausted(self) -> bool:
        return self.invalid

    def inc(self) -> bool:
        lpos = self.pos + self.k
        self.invalid = self.invalid or lpos >= len(self.seq)
        if not self.invalid:
            self._find_next(self.pos, lpos - 1)
        return not self.invalid

    def inc_by(self, count: int) -> bool:
        v = not self.invalid
        while count > 0 and v:
            v = self.inc()
            count -= 1
        return v

    def get(self) -> tuple["CanonicalKmerStream", int]:
        return self.km, self.pos


# --- minimizers (S2) -------------------------------------------------------

def minimizer(word: int, k: int, w: int, hasher=None) -> tuple[int, int]:
    """(minimizer word, position): min over all w-windows of the k-mer,
    brute force like Kmer::minimizer (src/naive_impl/kmer.rs:164-192).
    Default hash = identity on the packed word (LexHasher-like order)."""
    words = unpack(np.array([word], dtype=np.uint64), 2, k)
    codes = words.astype(np.uint8)
    n_win = k - w + 1
    vals = np.zeros(n_win, dtype=np.uint64)
    for j in range(w):
        vals |= codes[j:j + n_win].astype(np.uint64) << np.uint64(2 * j)
    keys = hasher(vals) if hasher else vals
    i = int(np.argmin(keys))
    return int(vals[i]), i


# --- cardinality math (C1/C2) ----------------------------------------------

def kmer_space(k: int) -> int:
    """4^k (src/utils.rs:27-29)."""
    return 4 ** k


def canonical_space(k: int) -> int:
    """The reference's implemented formula (src/utils.rs:32-38) — odd k:
    4^k/2; even k: 4^k/2 - 2k.  The reference's tests pin these values
    (src/utils.rs:61-73), so we reproduce them verbatim."""
    if k % 2 == 1:
        return kmer_space(k) // 2
    return kmer_space(k) // 2 - 2 * k


# --- batch API over Arrow columns ------------------------------------------

def canonical_kmer_counts(seqs: pa.Array, k: int) -> dict[int, int]:
    """Canonical k-mer multiset of a string column (test/demo helper)."""
    out: dict[int, int] = {}
    for s in seqs.to_pylist():
        if not s:
            continue
        canon, _, _ = canonical_kmer_scan(s, k)
        for v in canon.tolist():
            out[v] = out.get(v, 0) + 1
    return out

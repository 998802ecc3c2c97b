"""Sliding-window minimizers — the reference's monotone-deque scan
(/root/reference/src/naive_impl/seq_vector/minimizers.rs:38-142)
re-expressed two ways:

* :class:`MinimizerDeque` / :func:`minimizer_scan_deque` — the exact
  streaming deque algorithm (state-parity with the reference's
  enqueue_dqmer unit trace at minimizers.rs:172-218); O(1) amortized per
  k-mer, the incremental path for data that arrives row-at-a-time.
* :func:`minimizer_scan` — the batch form: one vectorized O(n) pass
  using the prefix/suffix block-min trick (no Python loop over
  positions), for `map_batches` hot paths.

Semantics (both): for k-mer window i the minimizer is the w-mer at the
LEFTMOST position p in [i, i+k-w] minimizing hash(w-mer).  The default
hasher is the reference's order-preserving LexHasher
(/root/reference/src/naive_impl/hash.rs:22-72): bit-reverse the packed
word so hash order == lexicographic symbol order.

Beyond parity, :func:`canonical_superkmers` uses strand-canonical
minimizers to cut sequences into super-k-mers — the shuffle-reduction
key for open-keyspace distributed k-mer counting (each canonical k-mer
maps to exactly one minimizer bucket, so per-bucket counts are final
with no second shuffle)."""

from __future__ import annotations

from collections import deque

import numpy as np

from ..codecs.bitpack import pack
from .dna import INVALID, seq_to_codes

_U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def lex_hash(words: np.ndarray, w: int) -> np.ndarray:
    """Order-preserving LexHasher (hash.rs:58-71): reverse 2-bit groups
    of the packed w-mer, shift down — hash order == lex symbol order."""
    x = np.asarray(words, dtype=np.uint64)
    x = ((x >> np.uint64(2)) & np.uint64(0x3333333333333333)) | \
        ((x & np.uint64(0x3333333333333333)) << np.uint64(2))
    x = ((x >> np.uint64(4)) & np.uint64(0x0F0F0F0F0F0F0F0F)) | \
        ((x & np.uint64(0x0F0F0F0F0F0F0F0F)) << np.uint64(4))
    x = ((x >> np.uint64(8)) & np.uint64(0x00FF00FF00FF00FF)) | \
        ((x & np.uint64(0x00FF00FF00FF00FF)) << np.uint64(8))
    x = ((x >> np.uint64(16)) & np.uint64(0x0000FFFF0000FFFF)) | \
        ((x & np.uint64(0x0000FFFF0000FFFF)) << np.uint64(16))
    x = (x >> np.uint64(32)) | (x << np.uint64(32))
    return x >> np.uint64(2 * (32 - w))


def wmer_words(seq: str | bytes, w: int) -> np.ndarray:
    """Packed w-mer per position (low-order-first, SeqVector layout).
    Sequence must be valid ACGT (invalid symbols raise)."""
    codes = seq_to_codes(seq)
    if (codes == INVALID).any():
        raise ValueError("invalid nucleotide in minimizer scan")
    n = len(codes)
    if n < w:
        return np.empty(0, np.uint64)
    packed = np.concatenate([pack(codes.astype(np.uint64), 2),
                             np.zeros(1, dtype=np.uint64)])
    i = np.arange(n - w + 1, dtype=np.int64)
    wi = i >> 5
    sh = ((i & 31) << 1).astype(np.uint64)
    lo = packed[wi] >> sh
    hi = np.where(sh > 0, packed[wi + 1] << ((np.uint64(64) - sh)
                                             & np.uint64(63)), np.uint64(0))
    mask = np.uint64((1 << (2 * w)) - 1) if w < 32 else _U64_MAX
    return (lo | hi) & mask


class MinimizerDeque:
    """The reference's monotone deque, state-for-state
    (minimizers.rs:60-81).  Entries are (lmer, pos, hash); the invariant
    is hashes non-decreasing front→back, and the front is the current
    k-mer's minimizer once the window is full."""

    def __init__(self, k: int, w: int):
        self.k, self.w = k, w
        self.dq: deque = deque()
        self.curr_km_i = 0

    def enqueue(self, lmer: int, pos: int, h: int) -> None:
        # front falls out of the window (pos < curr_km_i) — at most one,
        # since one l-mer enters per step (reference comment :62-64)
        if self.dq and self.dq[0][1] < self.curr_km_i:
            self.dq.popleft()
        # pop strictly-larger hashes from the back: ties are kept, so
        # the front stays the LEFTMOST minimal l-mer
        while self.dq and self.dq[-1][2] > h:
            self.dq.pop()
        self.dq.append((lmer, pos, h))

    def hashes(self) -> list[int]:
        return [e[2] for e in self.dq]


def minimizer_scan_deque(seq: str | bytes, k: int, w: int,
                         hasher=lex_hash) -> tuple[np.ndarray, np.ndarray]:
    """(minimizer words, positions), one per k-mer window — the exact
    iterator semantics of SeqVecMinimizerIter (minimizers.rs:97-142)."""
    vals = wmer_words(seq, w)
    n_pos = len(vals)
    n_kmers = n_pos - (k - w)
    if n_kmers <= 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    hs = hasher(vals, w)
    dq = MinimizerDeque(k, w)
    # prefix: l-mers of the (k-1)-prefix (reference new(), :111-118)
    for i in range(k - w):
        dq.enqueue(int(vals[i]), i, int(hs[i]))
    words = np.empty(n_kmers, dtype=np.uint64)
    poss = np.empty(n_kmers, dtype=np.int64)
    for i in range(n_kmers):
        p = i + k - w
        dq.enqueue(int(vals[p]), p, int(hs[p]))
        lmer, pos, _ = dq.dq[0]
        words[i], poss[i] = lmer, pos
        dq.curr_km_i += 1
    return words, poss


def _sliding_argmin(keys: np.ndarray, L: int) -> np.ndarray:
    """Index of the min (leftmost on ties) of every length-L window —
    O(n) vectorized via block prefix/suffix minima.  `keys` must be
    uint64 with room to append position bits for tie-breaking."""
    n = len(keys)
    nw = n - L + 1
    # combined key: (hash, position) lexicographic → leftmost tie-break
    pos_bits = max(int(n - 1).bit_length(), 1)
    if int(keys.max(initial=0)) >> (64 - pos_bits):
        # not enough headroom for exact (hash, pos) packing: truncate
        # the hash (monotone, preserves order except ties among hashes
        # equal in the top 64-pos_bits bits, which then break leftmost
        # — fine for bucketing; the parity hasher (lex, 2w≤42 bits)
        # never takes this path on realistic sequence lengths)
        keys = keys >> np.uint64(pos_bits)
    ck = (keys << np.uint64(pos_bits)) | np.arange(n, dtype=np.uint64)
    nb = -(-n // L)
    padded = np.full(nb * L, _U64_MAX, dtype=np.uint64)
    padded[:n] = ck
    a = padded.reshape(nb, L)
    pre = np.minimum.accumulate(a, axis=1).ravel()
    suf = np.minimum.accumulate(a[:, ::-1], axis=1)[:, ::-1].ravel()
    win = np.minimum(suf[:nw], pre[L - 1:L - 1 + nw])
    return (win & np.uint64((1 << pos_bits) - 1)).astype(np.int64)


def _sliding_min(keys: np.ndarray, L: int) -> np.ndarray:
    """Exact min VALUE of every length-L window (no position packing,
    full 64-bit precision) — same O(n) block prefix/suffix scheme as
    _sliding_argmin.  Used for bucket keys: the min value is invariant
    to which tied position gets picked, so a canonical k-mer maps to
    the same bucket from either strand even when _sliding_argmin's
    truncated tie-break chooses different positions."""
    n = len(keys)
    nw = n - L + 1
    nb = -(-n // L)
    padded = np.full(nb * L, _U64_MAX, dtype=np.uint64)
    padded[:n] = keys
    a = padded.reshape(nb, L)
    pre = np.minimum.accumulate(a, axis=1).ravel()
    suf = np.minimum.accumulate(a[:, ::-1], axis=1)[:, ::-1].ravel()
    return np.minimum(suf[:nw], pre[L - 1:L - 1 + nw])


def minimizer_scan(seq: str | bytes, k: int, w: int,
                   hasher=lex_hash) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized equivalent of :func:`minimizer_scan_deque` (same
    output arrays), for batch hot paths."""
    vals = wmer_words(seq, w)
    n_pos = len(vals)
    if n_pos - (k - w) <= 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    hs = hasher(vals, w)
    pos = _sliding_argmin(hs, k - w + 1)
    return vals[pos], pos


def _wmer_words_from_codes(codes: np.ndarray, w: int) -> np.ndarray:
    """Packed w-mer per position from a 2-bit code array (invalid codes
    must already be replaced; callers drop windows containing them)."""
    n = len(codes)
    if n < w:
        return np.empty(0, np.uint64)
    packed = np.concatenate([pack(codes.astype(np.uint64), 2),
                             np.zeros(1, dtype=np.uint64)])
    i = np.arange(n - w + 1, dtype=np.int64)
    wi = i >> 5
    sh = ((i & 31) << 1).astype(np.uint64)
    lo = packed[wi] >> sh
    hi = np.where(sh > 0, packed[wi + 1] << ((np.uint64(64) - sh)
                                             & np.uint64(63)), np.uint64(0))
    mask = np.uint64((1 << (2 * w)) - 1) if w < 32 else _U64_MAX
    return (lo | hi) & mask


def _join_with_separators(seqs) -> tuple[np.ndarray, np.ndarray, int]:
    """(joined 2-bit codes with INVALID separators, row start offsets,
    n_rows) — the row-boundary guard of canonical_kmer_scan_batch."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ..codecs.fsst import buffer_view
    if isinstance(seqs, pa.ChunkedArray):
        seqs = seqs.combine_chunks()
    if seqs.null_count:
        seqs = pc.fill_null(seqs, "")
    d, offs = buffer_view(seqs)
    n_rows = len(seqs)
    lens = np.diff(offs)
    sep_d = np.zeros(len(d) + n_rows, dtype=np.uint8)
    new_starts = offs[:-1] + np.arange(n_rows)
    pos_map = np.arange(len(d), dtype=np.int64) + \
        np.repeat(np.arange(n_rows, dtype=np.int64), lens)
    sep_d[pos_map] = d
    from .dna import ENC_TABLE
    return ENC_TABLE.take(sep_d), new_starts, n_rows


def minimizer_scan_batch(seqs, k: int, w: int
                         ) -> tuple[np.ndarray, np.ndarray,
                                    np.ndarray, np.ndarray]:
    """(row_ids, kmer_pos_in_row, minimizer_word, minimizer_pos_in_row)
    for every valid k-mer window of every row of a string column — one
    vectorized pass (separator-byte row guard; windows containing
    invalid symbols or spanning rows are skipped, iterator semantics of
    canonical_kmer_iterator.rs:52-66 applied to the minimizer scan)."""
    z = np.empty(0, np.int64)
    codes, new_starts, n_rows = _join_with_separators(seqs)
    n = len(codes)
    if n < k or n_rows == 0:
        return z, z, np.empty(0, np.uint64), z
    valid = codes != INVALID
    cs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(~valid, out=cs[1:])
    ok = (cs[k:] - cs[:-k]) == 0
    safe = np.where(valid, codes, 0)
    vals = _wmer_words_from_codes(safe, w)
    hs = lex_hash(vals, w)
    pos = _sliding_argmin(hs, k - w + 1)
    win = np.flatnonzero(ok)               # global kmer start positions
    if len(win) == 0:
        return z, z, np.empty(0, np.uint64), z
    mpos = pos[win]                        # global minimizer positions
    row = np.searchsorted(new_starts, win, side="right") - 1
    return (row.astype(np.int64), win - new_starts[row],
            vals[mpos], mpos - new_starts[row])


def canonical_superkmer_spans_batch(seqs, k: int, w: int
                                    ) -> tuple[np.ndarray, np.ndarray,
                                               np.ndarray, np.ndarray]:
    """(bucket_key, row_id, span_start, span_end) super-k-mer spans for
    every row of a string column, strand-canonical minimizer keys —
    vectorized across the whole batch (no per-row Python loop).  Spans
    are maximal runs of consecutive valid k-mers in one row sharing one
    minimizer value; span [start, end) covers k-mers start..end-k."""
    from .dna import revcomp_words
    z = np.empty(0, np.int64)
    codes, new_starts, n_rows = _join_with_separators(seqs)
    n = len(codes)
    if n < k or n_rows == 0:
        return np.empty(0, np.uint64), z, z, z
    valid = codes != INVALID
    cs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(~valid, out=cs[1:])
    ok = (cs[k:] - cs[:-k]) == 0
    safe = np.where(valid, codes, 0)
    vals = _wmer_words_from_codes(safe, w)
    canon_vals = np.minimum(lex_hash(vals, w),
                            lex_hash(revcomp_words(vals, w), w))
    win = np.flatnonzero(ok)
    if len(win) == 0:
        return np.empty(0, np.uint64), z, z, z
    # bucket key = exact windowed MIN VALUE, not canon_vals[argmin]:
    # under _sliding_argmin's truncated tie-break (large w, long joined
    # batches) the chosen POSITION can differ between a read and its
    # reverse complement, but the min value cannot — and spans break on
    # KEY change so every k-mer's bucket is its own window min
    key = _sliding_min(canon_vals, k - w + 1)[win]
    row = np.searchsorted(new_starts, win, side="right") - 1
    # break runs on: minimizer value change, row change, or a gap in
    # consecutive kmer indices (invalid window in between)
    brk = (key[1:] != key[:-1]) | (row[1:] != row[:-1]) | \
        (win[1:] != win[:-1] + 1)
    starts_i = np.concatenate([[0], np.flatnonzero(brk) + 1])
    ends_i = np.concatenate([np.flatnonzero(brk), [len(win) - 1]])
    return (key[starts_i], row[starts_i],
            (win[starts_i] - new_starts[row[starts_i]]).astype(np.int64),
            (win[ends_i] - new_starts[row[ends_i]] + k).astype(np.int64))


def canonical_superkmers(seq: str | bytes, k: int, w: int
                         ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(minimizer_bucket_key, start, end) super-k-mer spans: maximal runs
    of consecutive k-mers sharing one STRAND-CANONICAL minimizer
    (min over fw and rc w-mer hashes), so a canonical k-mer always lands
    in the same bucket whichever strand it was read from.  end is
    exclusive over sequence positions (span covers kmers start..end-k)."""
    from .dna import revcomp_words
    vals = wmer_words(seq, w)
    n_pos = len(vals)
    n_kmers = n_pos - (k - w)
    if n_kmers <= 0:
        e = np.empty(0, np.int64)
        return np.empty(0, np.uint64), e, e
    rc = revcomp_words(vals, w)
    canon_vals = np.minimum(lex_hash(vals, w), lex_hash(rc, w))
    # key = exact window MIN VALUE; spans break on key change (see
    # canonical_superkmer_spans_batch for why argmin-position keying
    # is strand-dependent under truncated tie-breaks)
    key = _sliding_min(canon_vals, k - w + 1)
    brk = np.flatnonzero(key[1:] != key[:-1]) + 1
    starts = np.concatenate([[0], brk])
    ends_k = np.concatenate([brk, [n_kmers]])  # exclusive kmer index
    return key[starts], starts.astype(np.int64), \
        (ends_k - 1 + k).astype(np.int64)

"""MinHash / SimHash sketches over token streams — fully vectorized.

Used by the dedup pipelines: sketches are computed per batch inside
``map_batches`` and are mergeable, so the wide step only ever shuffles
small (band_hash, doc_id) rows, never documents.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .text import _splitmix64, token_hashes


def shingle_hashes(text: pa.Array, k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Hashes of k-token shingles per row → (hashes, row_ids).

    The sliding k-window over a token stream is the direct analogue of
    the reference's k-mer window scan
    (/root/reference/src/naive_impl/canonical_kmer_iterator.rs:32-116);
    windows never cross row boundaries (the iterator's invalid-skip
    generalized)."""
    th, rows = token_hashes(text)
    n = len(th)
    if n < k:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    h = np.zeros(n - k + 1, dtype=np.uint64)
    mul = np.uint64(0x9DDFEA08EB382D69)
    for j in range(k):  # k is tiny (3): constant-bounded loop, vectorized body
        h = (h ^ th[j:n - k + 1 + j]) * mul
    ok = rows[:n - k + 1] == rows[k - 1:]
    return _splitmix64(h[ok]), rows[:n - k + 1][ok]


def minhash_signatures(text: pa.Array, num_perm: int = 64,
                       shingle_k: int = 3, seed: int = 7) -> np.ndarray:
    """(n_rows, num_perm) uint64 MinHash signature matrix.

    Rows with < shingle_k tokens (no shingles) get a signature derived
    from the FULL-TEXT fingerprint: byte-identical short texts still
    collide in every band (they ARE duplicates), while distinct short
    texts match nothing.  (An all-max constant here would make every
    short document a false near-duplicate of every other.)
    Permutations are h*a+b over the shingle hash — num_perm vectorized
    reduceat passes, no Python loop over rows."""
    from .text import fingerprints
    n = len(text)
    sh, rows = shingle_hashes(text, shingle_k)
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**63, size=num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 2**63, size=num_perm, dtype=np.uint64)
    fp = fingerprints(text)
    with np.errstate(over="ignore"):
        sig = fp[:, None] * a[None, :] + b[None, :]  # shingle-less rows
    if len(sh) == 0:
        return sig
    order = np.argsort(rows, kind="stable")
    sh, rows = sh[order], rows[order]
    present, starts = np.unique(rows, return_index=True)
    with np.errstate(over="ignore"):
        for p in range(num_perm):
            hp = sh * a[p] + b[p]
            sig[present, p] = np.minimum.reduceat(hp, starts)
    return sig


def band_hashes(sig: np.ndarray, n_bands: int) -> np.ndarray:
    """(n_rows, n_bands) uint64: hash of each signature band (LSH keys)."""
    n, num_perm = sig.shape
    rows_per = num_perm // n_bands
    if rows_per == 0 or num_perm % n_bands:
        raise ValueError(
            f"n_bands={n_bands} must divide num_perm={num_perm}; "
            "rows_per_band == 0 would hash every row identically")
    bands = sig[:, :n_bands * rows_per].reshape(n, n_bands, rows_per)
    mul = np.uint64(0xC2B2AE3D27D4EB4F)
    h = np.zeros((n, n_bands), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(rows_per):
            h = (h ^ bands[:, :, j]) * mul
        # mix in the band index so identical bands in different slots differ
        h = _splitmix64(h + np.arange(n_bands, dtype=np.uint64))
    return h


def simhash(text: pa.Array, nbits: int = 64) -> np.ndarray:
    """64-bit SimHash per row over token hashes (vectorized bit-count)."""
    th, rows = token_hashes(text)
    n = len(text)
    out = np.zeros(n, dtype=np.uint64)
    if len(th) == 0:
        return out
    # accumulate +1 per set bit, then compare against tokens/2
    counts = np.zeros((n, nbits), dtype=np.int64)
    bits = ((th[:, None] >> np.arange(nbits, dtype=np.uint64)) &
            np.uint64(1)).astype(np.int64)
    np.add.at(counts, rows, bits)
    totals = np.bincount(rows, minlength=n)[:, None]
    sh_bits = (counts * 2 > totals).astype(np.uint64)
    return (sh_bits << np.arange(nbits, dtype=np.uint64)).sum(
        axis=1, dtype=np.uint64)


def hamming_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = a ^ b
    # SWAR popcount on uint64
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + \
        ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    with np.errstate(over="ignore"):
        return (x * np.uint64(0x0101010101010101)) >> np.uint64(56)


def pairwise_jaccard(sh: np.ndarray, rows: np.ndarray,
                     ia: np.ndarray, ib: np.ndarray) -> np.ndarray:
    """Exact shingle-set Jaccard for MANY (row_a, row_b) pairs in one
    vectorized pass — the batch form of :func:`ngram_jaccard` (no
    Python loop over pairs).

    ``sh``/``rows``: shingle hashes and their aligned row ids (as from
    :func:`shingle_hashes`).  ``ia``/``ib``: per-pair row indices.
    Plan: build per-row sorted-unique sets once (lexsort + dedupe),
    ragged-gather both sides of every pair tagged by pair id, sort by
    (pair, value) and count equal-adjacent values — each value is
    unique within a side, so a duplicate within a pair IS an
    intersection element.  O(total gathered · log) with no per-pair
    work; memory is bounded by the candidate pairs, not the corpus."""
    ia = np.asarray(ia, dtype=np.int64)
    ib = np.asarray(ib, dtype=np.int64)
    n_pairs = len(ia)
    if n_pairs == 0:
        return np.zeros(0, dtype=np.float64)
    n_rows = int(max(rows.max(initial=-1), ia.max(), ib.max())) + 1
    order = np.lexsort((sh, rows))
    s, r = sh[order], rows[order]
    if len(s):
        keep = np.ones(len(s), dtype=bool)
        keep[1:] = (s[1:] != s[:-1]) | (r[1:] != r[:-1])
        s, r = s[keep], r[keep]
    counts = np.bincount(r, minlength=n_rows)
    offs = np.concatenate([[0], np.cumsum(counts)])

    def gather(idx: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        lens = counts[idx]
        total = int(lens.sum())
        pos = (np.arange(total, dtype=np.int64)
               - np.repeat(np.cumsum(lens) - lens, lens)
               + np.repeat(offs[idx], lens))
        pid = np.repeat(np.arange(len(idx), dtype=np.int64), lens)
        return s[pos], pid

    va, pa_ = gather(ia)
    vb, pb_ = gather(ib)
    v = np.concatenate([va, vb])
    p = np.concatenate([pa_, pb_])
    o2 = np.lexsort((v, p))
    v, p = v[o2], p[o2]
    dup = np.zeros(max(len(v) - 1, 0), dtype=bool)
    if len(v) > 1:
        dup = (v[1:] == v[:-1]) & (p[1:] == p[:-1])
    inter = np.bincount(p[1:][dup], minlength=n_pairs) if len(v) > 1 \
        else np.zeros(n_pairs, dtype=np.int64)
    union = counts[ia] + counts[ib] - inter
    out = np.zeros(n_pairs, dtype=np.float64)
    nz = union > 0
    out[nz] = inter[nz] / union[nz]
    return out  # both-empty pairs → 0.0, same as ngram_jaccard


def ngram_jaccard(a_sh: np.ndarray, b_sh: np.ndarray) -> float:
    """Exact Jaccard of two shingle-hash sets (verify step for candidate
    pairs)."""
    sa, sb = np.unique(a_sh), np.unique(b_sh)
    if len(sa) == 0 and len(sb) == 0:
        # two empty shingle sets say nothing about the texts (any two
        # short docs hit this); verify on raw content, don't confirm
        return 0.0
    inter = len(np.intersect1d(sa, sb, assume_unique=True))
    return inter / (len(sa) + len(sb) - inter)

"""Minimizer scan — parity with the reference's monotone-deque iterator
(/root/reference/src/naive_impl/seq_vector/minimizers.rs), including its
deque-state unit trace, plus deque/vectorized/brute agreement."""

import numpy as np
import pyarrow as pa
import pytest

from packcol.functions.minimizers import (MinimizerDeque, canonical_superkmers,
                                          lex_hash, minimizer_scan,
                                          minimizer_scan_deque, wmer_words)


def test_enqueue_dqmer_trace():
    """Verbatim deque-state trace of minimizers.rs:172-218 (k=4, w=2,
    hashes [2,1,0,0,3,4,2])."""
    dq = MinimizerDeque(4, 2)
    hashes = [2, 1, 0, 0, 3, 4, 2]
    expected = [[2], [1], [0], [0, 0], [0, 0, 3], [0, 3, 4], [2]]
    curr = [0, 0, 0, 1, 2, 3, 4]  # curr_km_i before each enqueue
    for i, (h, exp, c) in enumerate(zip(hashes, expected, curr)):
        dq.curr_km_i = c
        dq.enqueue(0, i, h)
        assert dq.hashes() == exp, f"step {i}"


def test_leftmost_mmer():
    """minimizers.rs:220-235: all-A (all hashes equal) → leftmost w-mer
    in each window: positions 0,1,2."""
    words, pos = minimizer_scan_deque("AAAAAAA", 5, 3)
    assert words.tolist() == [0, 0, 0]
    assert pos.tolist() == [0, 1, 2]


def test_mmers0():
    """minimizers.rs:237-248: AAACAAA, k=6, w=3 → (0,0), (0,4)."""
    words, pos = minimizer_scan_deque("AAACAAA", 6, 3)
    assert words.tolist() == [0, 0]
    assert pos.tolist() == [0, 4]


def test_mmers1():
    """minimizers.rs:250-268: AACCAAA, k=5, w=3 → AAC@0, ACC@1, AAA@4."""
    words, pos = minimizer_scan_deque("AACCAAA", 5, 3)
    assert words.tolist() == [0b010000, 0b010100, 0b000000]
    assert pos.tolist() == [0, 1, 4]


def test_mmers2():
    """minimizers.rs:270-290: CACACACCAC, k=7, w=3 → ACA@1,1,3,3."""
    words, pos = minimizer_scan_deque("CACACACCAC", 7, 3)
    aca = 0b000100
    assert words.tolist() == [aca, aca, aca, aca]
    assert pos.tolist() == [1, 1, 3, 3]


@pytest.mark.parametrize("k,w", [(5, 3), (7, 3), (31, 11), (31, 15), (9, 9)])
def test_vectorized_matches_deque_and_brute(k, w):
    rng = np.random.default_rng(41)
    for _ in range(20):
        n = int(rng.integers(k, 200))
        seq = "".join("ACGT"[c] for c in rng.integers(0, 4, n))
        wd, pd = minimizer_scan_deque(seq, k, w)
        wv, pv = minimizer_scan(seq, k, w)
        np.testing.assert_array_equal(wd, wv)
        np.testing.assert_array_equal(pd, pv)
        # brute force: leftmost lex-min w-mer per window
        vals = wmer_words(seq, w)
        hs = lex_hash(vals, w)
        for i in range(len(seq) - k + 1):
            window = hs[i:i + k - w + 1]
            j = int(np.argmin(window))  # argmin = leftmost on ties
            assert pd[i] == i + j
            assert wd[i] == vals[i + j]


def test_superkmers_cover_and_bucket_consistency():
    """Spans tile the k-mer index space; a k-mer and its revcomp get
    the same bucket key (strand-canonical minimizer)."""
    rng = np.random.default_rng(43)
    k, w = 21, 11
    comp = str.maketrans("ACGT", "TGCA")
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 300))
    keys, starts, ends = canonical_superkmers(seq, k, w)
    # spans cover every kmer exactly once
    n_kmers = len(seq) - k + 1
    covered = []
    for s, e in zip(starts, ends):
        covered.extend(range(s, e - k + 1))
    assert covered == list(range(n_kmers))
    # strand symmetry: scanning the revcomp yields the same multiset of
    # bucket keys (per-kmer canonical minimizer is strand-invariant)
    rcseq = seq.translate(comp)[::-1]
    k2, s2, e2 = canonical_superkmers(rcseq, k, w)
    def per_kmer_keys(keys, starts, ends):
        out = []
        for key, s, e in zip(keys, starts, ends):
            out.extend([int(key)] * (e - k + 1 - s))
        return out
    a = per_kmer_keys(keys, starts, ends)
    b = per_kmer_keys(k2, s2, e2)
    assert sorted(a) == sorted(b)
    assert a == b[::-1]  # kmer i ↔ reverse-strand kmer n-1-i

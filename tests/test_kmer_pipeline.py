"""Distributed canonical k-mer counting: strategies agree, counts exact."""

import numpy as np
import pyarrow as pa
import pytest


def test_strategies_agree_and_match_naive(ray_session):
    import ray.data as rd
    from packcol.pipelines.kmers import count_canonical_kmers
    rng = np.random.default_rng(6)
    seqs = ["".join("ACGT"[c] for c in rng.integers(0, 4, 60))
            for _ in range(50)] + ["ACGTNACGT", "", "acgtacgt"]
    ds = rd.from_arrow(pa.table({"seq": pa.array(seqs)}))
    k = 5
    tree = count_canonical_kmers(ds, "seq", k, strategy="tree") \
        .to_pandas().set_index("kmer")["n"].to_dict()
    grp = count_canonical_kmers(ds, "seq", k, strategy="groupby") \
        .to_pandas().set_index("kmer")["n"].to_dict()
    assert tree == grp

    # naive python oracle
    from collections import Counter
    comp = str.maketrans("ACGT", "TGCA")
    naive = Counter()
    for s in seqs:
        s = s.upper()
        for i in range(max(len(s) - k + 1, 0)):
            w = s[i:i + k]
            if set(w) <= set("ACGT"):
                rc = w.translate(comp)[::-1]
                naive[min(w, rc)] += 1
    assert tree == dict(naive)


def test_k45_multiword_strategies_agree_and_match_naive(ray_session):
    """k>32 counting through the multi-word kernels (Kmer<P,K,B> path)."""
    import ray.data as rd
    from packcol.pipelines.kmers import count_canonical_kmers
    rng = np.random.default_rng(8)
    seqs = ["".join("ACGT"[c] for c in rng.integers(0, 4, 90))
            for _ in range(30)] + ["ACGT" * 11, "", "N" * 50]
    ds = rd.from_arrow(pa.table({"seq": pa.array(seqs)}))
    k = 45
    tree = count_canonical_kmers(ds, "seq", k, strategy="tree") \
        .to_pandas().set_index("kmer")["n"].to_dict()
    grp = count_canonical_kmers(ds, "seq", k, strategy="groupby") \
        .to_pandas().set_index("kmer")["n"].to_dict()
    assert tree == grp

    from collections import Counter
    comp = str.maketrans("ACGT", "TGCA")
    naive = Counter()
    for s in seqs:
        s = s.upper()
        for i in range(max(len(s) - k + 1, 0)):
            w = s[i:i + k]
            if set(w) <= set("ACGT"):
                naive[min(w, w.translate(comp)[::-1])] += 1
    assert tree == dict(naive)


def test_minimizer_strategy_matches_tree(ray_session):
    """Super-k-mer bucketed counting == direct counting (exact)."""
    import ray.data as rd
    from packcol.pipelines.kmers import count_canonical_kmers
    rng = np.random.default_rng(9)
    seqs = ["".join("ACGT"[c] for c in rng.integers(0, 4, 150))
            for _ in range(40)] + ["ACGTNACGTACGTACGTACGTACGTACGTACGT",
                                   "", None, "acgt" * 10]
    ds = rd.from_arrow(pa.table({"seq": pa.array(seqs)}))
    for k in (21, 31, 45):
        tree = count_canonical_kmers(ds, "seq", k, strategy="tree") \
            .to_pandas().set_index("kmer")["n"].to_dict()
        mini = count_canonical_kmers(ds, "seq", k, strategy="minimizer") \
            .to_pandas().set_index("kmer")["n"].to_dict()
        assert mini == tree, k


def test_tree_single_block_collapses_duplicates(ray_session):
    """Regression: with one leaf block holding several per-batch unique
    tables, tree strategy emitted duplicate kmer rows with split
    counts."""
    import pyarrow as pa
    import ray.data as rd
    from packcol.pipelines.kmers import count_canonical_kmers
    seqs = ["ACGTACGTACG"] * 300  # same kmers in every row
    ds = rd.from_arrow(pa.table({"seq": pa.array(seqs)}))  # ONE block
    out = count_canonical_kmers(ds, "seq", 5, strategy="tree",
                                partial_batch_size=64).to_pandas()
    assert out["kmer"].is_unique
    gb = count_canonical_kmers(ds, "seq", 5, strategy="groupby") \
        .to_pandas().set_index("kmer")["n"]
    assert out.set_index("kmer")["n"].sort_index().equals(gb.sort_index())


class TestAutoStrategy:
    def test_small_keyspace_picks_tree(self, ray_session):
        import ray.data as rd
        from packcol.pipelines.kmers import choose_kmer_strategy
        ds = rd.from_items([{"text": "ACGT" * 100}] * 10)
        assert choose_kmer_strategy(ds, 5) == "tree"

    def test_large_input_open_keyspace_picks_minimizer(self, ray_session):
        import ray.data as rd
        from packcol.pipelines.kmers import choose_kmer_strategy

        class FakeBig:
            def size_bytes(self):
                return 50 << 30
        assert choose_kmer_strategy(FakeBig(), 31) == "minimizer"
        # alternate encoding forbids the minimizer path -> groupby
        from packcol.functions.dna import _resolve_encoding
        enc = _resolve_encoding("xor10")
        assert choose_kmer_strategy(FakeBig(), 31,
                                    encoding=enc) == "groupby"

    def test_unknown_size_uses_keyspace_bound(self):
        from packcol.pipelines.kmers import choose_kmer_strategy

        class NoSize:
            def size_bytes(self):
                raise RuntimeError("not executed")
        assert choose_kmer_strategy(NoSize(), 5) == "tree"
        assert choose_kmer_strategy(NoSize(), 31) == "minimizer"

    def test_auto_matches_tree_result(self, ray_session):
        import ray.data as rd
        from packcol.pipelines.kmers import count_canonical_kmers
        seqs = [{"text": "ACGTACGTGGTACC"}, {"text": "TTGACNACGT"}]
        ds = rd.from_items(seqs)
        a = count_canonical_kmers(ds, k=5, strategy="auto").to_pandas() \
            .sort_values("kmer").reset_index(drop=True)
        t = count_canonical_kmers(ds, k=5, strategy="tree").to_pandas() \
            .sort_values("kmer").reset_index(drop=True)
        assert a.equals(t)

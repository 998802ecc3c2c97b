"""Dedup pipelines over a synthetic corpus with planted duplicates."""

import numpy as np
import pyarrow as pa
import pytest


def planted_docs():
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(300)]
    base_docs = [" ".join(rng.choice(vocab, 60)) for _ in range(40)]
    rows = []
    doc_id = 0
    groups = {}
    for gi, b in enumerate(base_docs):
        group = [b]
        if gi < 10:  # first 10 docs get near-dups (1 word changed)
            words = b.split()
            words[5] = "CHANGED"
            group.append(" ".join(words))
            group.append(b)  # and one exact dup
        for g in group:
            rows.append({"doc_id": doc_id, "text": g})
            groups.setdefault(gi, []).append(doc_id)
            doc_id += 1
    return pa.Table.from_pylist(rows), groups


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd
    t, groups = planted_docs()
    return rd.from_arrow(t), groups


def test_exact_dedup_planted(docs_ds):
    from packcol.pipelines.dedup import dedup_exact
    ds, groups = docs_ds
    keep = set(dedup_exact(ds).to_pandas()["doc_id"])
    # every exact-dup pair keeps only the min id
    n_docs = sum(len(v) for v in groups.values())
    n_exact_dups = 10  # one per first-10 group
    assert len(keep) == n_docs - n_exact_dups


def test_minhash_finds_planted_neardups(docs_ds):
    from packcol.pipelines.dedup import minhash_lsh_pairs
    ds, groups = docs_ds
    pairs = minhash_lsh_pairs(ds, threshold=0.5).to_pandas()
    found = {tuple(sorted(p)) for p in zip(pairs["id_a"], pairs["id_b"])}
    hits = 0
    for gi in range(10):
        ids = groups[gi]
        planted = {tuple(sorted((ids[0], ids[1]))),
                   tuple(sorted((ids[0], ids[2])))}
        hits += len(planted & found)
    assert hits >= 15  # ≥75% of planted near/exact pairs surfaced


def test_clusters_from_pairs(docs_ds, ray_session):
    import ray.data as rd
    from packcol.pipelines.dedup import minhash_lsh_pairs, pairs_to_clusters
    ds, groups = docs_ds
    pairs = minhash_lsh_pairs(ds, threshold=0.5)
    clusters = pairs_to_clusters(pairs)
    by_id = dict(zip(clusters["id"], clusters["cluster"]))
    # exact dup triplets of a group should share a cluster label
    ok = 0
    for gi in range(10):
        a, b, c = groups[gi]
        labels = {by_id.get(x) for x in (a, b, c)} - {None}
        if len(labels) == 1:
            ok += 1
    assert ok >= 8


def test_distributed_propagation_matches_union_find(docs_ds, ray_session):
    import ray.data as rd
    import pandas as pd
    from packcol.pipelines.dedup import pairs_to_clusters
    # chain 0-1, 1-2, 2-3 plus separate 10-11
    pairs_t = pa.table({"id_a": pa.array([0, 1, 2, 10], type=pa.int64()),
                        "id_b": pa.array([1, 2, 3, 11], type=pa.int64())})
    pairs = rd.from_arrow(pairs_t)
    small = pairs_to_clusters(pairs)
    big = pairs_to_clusters(rd.from_arrow(pairs_t), small_threshold=0)
    exp = {0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 10}
    assert dict(zip(small["id"], small["cluster"])) == exp
    assert dict(zip(big["id"], big["cluster"])) == exp


def test_distributed_propagation_deep_chain(ray_session):
    """Diameter-60 path: pointer doubling must converge in far fewer
    rounds than the diameter (was: silent split after max_iters)."""
    import ray.data as rd
    n = 61
    pairs_t = pa.table({
        "id_a": pa.array(list(range(n - 1)), type=pa.int64()),
        "id_b": pa.array(list(range(1, n)), type=pa.int64())})
    out = pairs_to_clusters_import()(rd.from_arrow(pairs_t),
                                     small_threshold=0, max_iters=8)
    assert set(out["cluster"]) == {0}
    assert len(out) == n


def pairs_to_clusters_import():
    from packcol.pipelines.dedup import pairs_to_clusters
    return pairs_to_clusters


def test_minhash_scale_mode(docs_ds):
    """carry_signatures=False (24 B band rows) still surfaces planted
    dups; exact dups get est_jaccard 1.0 (all bands hit)."""
    from packcol.pipelines.dedup import minhash_lsh_pairs
    ds, groups = docs_ds
    pairs = minhash_lsh_pairs(ds, threshold=0.5,
                              carry_signatures=False).to_pandas()
    found = {tuple(sorted(p)) for p in zip(pairs["id_a"], pairs["id_b"])}
    exact_hits = 0
    for gi in range(10):
        ids = groups[gi]
        if tuple(sorted((ids[0], ids[2]))) in found:   # exact dup pair
            exact_hits += 1
    assert exact_hits >= 9
    ex = pairs.set_index(["id_a", "id_b"])["est_jaccard"]
    a, b = sorted((groups[0][0], groups[0][2]))
    assert ex.loc[(a, b)] == 1.0


def test_mass_duplicate_no_quadratic_blowup(ray_session):
    """A 10k-copy document must not turn bucket pairing into an O(m²)
    job: collapse_exact removes the clones before banding (their pairs
    are exact-dedup's output), and the non-clone near-dup pairs are
    unchanged."""
    import time
    import ray.data as rd
    from packcol.pipelines.dedup import minhash_lsh_pairs
    rng = np.random.default_rng(51)
    vocab = [f"w{i}" for i in range(300)]
    base = [" ".join(rng.choice(vocab, 60)) for _ in range(10)]
    rows = [{"doc_id": i, "text": b} for i, b in enumerate(base)]
    # a near-dup pair among the normal docs
    words = base[0].split(); words[5] = "CHANGED"
    rows.append({"doc_id": 100, "text": " ".join(words)})
    clean = pa.Table.from_pylist(rows)
    clone_rows = [{"doc_id": 1000 + i, "text": base[1]}
                  for i in range(10_000)]
    big = pa.Table.from_pylist(rows + clone_rows)

    t0 = time.perf_counter()
    pairs_big = minhash_lsh_pairs(
        rd.from_arrow(big).repartition(8), threshold=0.5,
        collapse_exact=True).to_pandas()
    elapsed = time.perf_counter() - t0
    assert elapsed < 60  # clones collapsed → no quadratic bucket work
    pairs_clean = minhash_lsh_pairs(
        rd.from_arrow(clean), threshold=0.5).to_pandas()
    norm = lambda df: {tuple(sorted(p)) for p in
                       zip(df["id_a"], df["id_b"])}
    # same non-clone pairs (doc_id 1 survives as the clone keeper)
    assert norm(pairs_clean) <= norm(pairs_big) | {(0, 100)}
    assert (0, 100) in norm(pairs_big)
    # no clone-id pairs remain
    assert not any(a >= 1000 or b >= 1000 for a, b in norm(pairs_big))


def test_bucket_cap_bounds_group(ray_session):
    """Without collapse, the max_bucket cap bounds pairing work."""
    import ray.data as rd
    from packcol.pipelines.dedup import minhash_lsh_pairs
    rows = [{"doc_id": i, "text": "same text for everyone here today"}
            for i in range(500)]
    pairs = minhash_lsh_pairs(rd.from_arrow(pa.Table.from_pylist(rows)),
                              threshold=0.5, max_bucket=50).to_pandas()
    # capped at 50 rows → at most C(50,2) distinct pairs
    assert 0 < len(pairs) <= 50 * 49 // 2


def test_verify_pairs_fp_compare_is_int_exact(ray_session):
    """Regression: with a candidate id missing from the corpus, pandas
    map coerced fingerprints to float64 and two fps differing only
    below bit 53 compared equal."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from packcol.pipelines.dedup import verify_pairs_identical
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["aaa", "bbb", "ccc"]}))  # all texts DIFFERENT
    pairs = pd.DataFrame({"id_a": [1, 1], "id_b": [2, 99]})  # 99 absent
    out = verify_pairs_identical(ds, pairs)
    assert len(out) == 0  # nothing is identical; nothing survives
    # identical texts still verify
    ds2 = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": ["same", "same"]}))
    out2 = verify_pairs_identical(
        ds2, pd.DataFrame({"id_a": [1], "id_b": [2]}))
    assert out2[["id_a", "id_b"]].values.tolist() == [[1, 2]]


def test_dedup_exact_distributed_fallback_matches(docs_ds, monkeypatch):
    """Forcing the driver-merge cap to 0 exercises the groupby(fp)
    fallback; keeper sets must be identical."""
    import packcol.pipelines.dedup as dd
    ds, _ = docs_ds
    fast = set(dd.dedup_exact(ds).to_pandas()["doc_id"])
    monkeypatch.setattr(dd, "_MAX_DRIVER_MERGE_ROWS", 0)
    slow = set(dd.dedup_exact(ds).to_pandas()["doc_id"])
    assert fast == slow and len(fast) > 0


def test_minhash_driver_pair_path_matches_groupby(docs_ds, monkeypatch):
    """The bounded driver-side pair generation must produce the same
    distinct pairs + estimates as the distributed groupby path."""
    import pandas as pd
    import packcol.pipelines.dedup as dd
    ds, _ = docs_ds

    def run():
        out = dd.minhash_lsh_pairs(ds, threshold=0.5).to_pandas()
        return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)

    fast = run()
    monkeypatch.setattr(dd, "_MAX_DRIVER_PAIR_ROWS", -1)
    slow = run()
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)
    assert len(fast) > 0

    # band-hit estimate mode too
    def run_est():
        out = dd.minhash_lsh_pairs(ds, threshold=0.5,
                                   carry_signatures=False).to_pandas()
        return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)

    monkeypatch.undo()
    fast_e = run_est()
    monkeypatch.setattr(dd, "_MAX_DRIVER_PAIR_ROWS", -1)
    slow_e = run_est()
    pd.testing.assert_frame_equal(fast_e, slow_e, check_dtype=False)


def test_minhash_distributed_prefilter_matches(docs_ds, monkeypatch):
    """Forcing the driver-merge cap to 0 exercises the groupby-Count
    collision prefilter + dataset pair path; results must be identical
    to the fused driver path."""
    import pandas as pd
    import packcol.pipelines.dedup as dd
    ds, _ = docs_ds

    def run():
        out = dd.minhash_lsh_pairs(ds, threshold=0.5).to_pandas()
        return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)

    fast = run()
    monkeypatch.setattr(dd, "_MAX_DRIVER_MERGE_ROWS", 0)
    slow = run()
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)
    assert len(fast) > 0


def test_minhash_sig_broadcast_demote_matches(docs_ds, monkeypatch):
    """Survivor sets above _BCAST_SIG_IDS demote the fused driver path
    to the dataset path (signature shuffle join); same pairs out."""
    import pandas as pd
    import packcol.pipelines.dedup as dd
    ds, _ = docs_ds

    def run():
        out = dd.minhash_lsh_pairs(ds, threshold=0.5).to_pandas()
        return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)

    fast = run()
    monkeypatch.setattr(dd, "_BCAST_SIG_IDS", 0)
    slow = run()
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)
    assert len(fast) > 0


def test_minhash_distributed_pairgen_many_blocks(ray_session, monkeypatch):
    """The sort-based distributed pair generation (interior vectorized
    segments + straddling-bucket sliver groupby) must match the driver
    path when buckets straddle many tiny sorted blocks."""
    import pandas as pd
    import ray.data as rd
    import packcol.pipelines.dedup as dd
    t, _ = planted_docs()
    # replicate the corpus 4x with distinct ids so buckets hold more
    # rows and the 24-block sort forces straddles
    reps = []
    base = t.to_pandas()
    for r in range(4):
        c = base.copy()
        c["doc_id"] = c["doc_id"] + 10000 * r
        reps.append(c)
    big = pd.concat(reps, ignore_index=True)
    ds = rd.from_pandas(big).repartition(24)

    def run():
        out = dd.minhash_lsh_pairs(ds, threshold=0.5).to_pandas()
        return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)

    fast = run()
    monkeypatch.setattr(dd, "_MAX_DRIVER_PAIR_ROWS", -1)
    monkeypatch.setattr(dd, "_MAX_DRIVER_MERGE_ROWS", 0)
    slow = run()
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)
    assert len(fast) > 0

"""ANN pipelines: brute-force exact, LSH, IVF (recall vs exact)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

EMB = "/root/testdata/sf0.01/embeddings.parquet"


def _query():
    t = pq.read_table(EMB, columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    row = int(np.flatnonzero(ids == 0)[0])
    return np.asarray(t.column("embedding")[row].as_py(), dtype=np.float64)


def _exact_top10(ray_session):
    import ray.data as rd
    from packcol.pipelines.ann import ann_brute_topk
    return ann_brute_topk(rd.read_parquet(EMB), _query(), k=10)


def test_brute_matches_numpy(ray_session):
    got = set(_exact_top10(ray_session)["vec_id"])
    t = pq.read_table(EMB)
    X = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    ids = t["vec_id"].to_numpy()
    q = _query()
    s = (X / np.linalg.norm(X, axis=1, keepdims=True)) @ (q / np.linalg.norm(q))
    exp = set(ids[np.argsort(-s)[:10]].tolist())
    assert got == exp


@pytest.mark.parametrize("variant", ["lsh", "ivf"])
def test_approx_recall(ray_session, variant):
    import ray.data as rd
    from packcol.pipelines.ann import ann_ivf_topk, ann_lsh_topk
    exact = set(_exact_top10(ray_session)["vec_id"])
    ds = rd.read_parquet(EMB)
    if variant == "lsh":
        # random embeddings: "neighbors" are barely closer than chance,
        # so use shallow buckets + many tables
        got = ann_lsh_topk(ds, _query(), k=10, n_planes=4, n_tables=16)
    else:
        got = ann_ivf_topk(ds, _query(), k=10, n_lists=8, n_probe=4)
    recall = len(set(got["vec_id"]) & exact) / 10
    assert recall >= 0.4, (variant, recall)


def test_embedding_near_dup(ray_session):
    import ray.data as rd
    from packcol.pipelines.ann import embedding_near_dup_pairs
    pairs = embedding_near_dup_pairs(rd.read_parquet(EMB), threshold=0.45) \
        .to_pandas()
    assert (pairs["id_a"] < pairs["id_b"]).all()
    assert len(pairs) >= 1


def test_lsh_near_dup_pairs_recall(ray_session):
    """Bucketed near-dup path: planted high-cosine pairs are recovered
    exactly (verified in-bucket), with no corpus broadcast."""
    import ray.data as rd
    from packcol.pipelines.ann import (embedding_near_dup_pairs,
                                       embedding_near_dup_pairs_lsh)
    rng = np.random.default_rng(71)
    dim, n = 16, 300
    X = rng.standard_normal((n, dim))
    # plant 20 near-dup pairs: id n+i is a tiny perturbation of id i
    planted = []
    rows = [{"vec_id": i, "embedding": X[i].tolist()} for i in range(n)]
    for i in range(20):
        v = X[i] + 0.02 * rng.standard_normal(dim)
        rows.append({"vec_id": n + i, "embedding": v.tolist()})
        planted.append((i, n + i))
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
    lsh = embedding_near_dup_pairs_lsh(ds, threshold=0.95).to_pandas()
    got = {tuple(sorted(p)) for p in zip(lsh["id_a"], lsh["id_b"])}
    hits = sum(1 for p in planted if p in got)
    assert hits >= 19  # miss prob < 1e-3 per pair at these settings
    # agreement with the exact broadcast path
    exact = embedding_near_dup_pairs(
        rd.from_arrow(pa.Table.from_pylist(rows)), threshold=0.95) \
        .to_pandas()
    exact_pairs = {tuple(sorted(p))
                   for p in zip(exact["id_a"], exact["id_b"])}
    assert got <= exact_pairs  # LSH never invents pairs (exact verify)


def test_kmeans_fit_recovers_planted_clusters(ray_session):
    """Distributed Lloyd over the full corpus finds planted cluster
    centers; per-iteration traffic is (k x n_batches) partial rows."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from packcol.pipelines.ann import kmeans_fit
    rng = np.random.default_rng(7)
    centers = np.array([[5.0, 0, 0, 0], [0, 5.0, 0, 0], [0, 0, 5.0, 0]])
    X = np.concatenate([c + rng.normal(0, 0.1, (400, 4))
                        for c in centers])
    order = rng.permutation(len(X))
    df = pd.DataFrame({"embedding": list(X[order]),
                       "vec_id": np.arange(len(X))})
    ds = rd.from_pandas(df).repartition(8)
    C = kmeans_fit(ds, 3, iters=10, sample_rows=50)
    # every planted center has a learned centroid within 3 sigma
    for c in centers:
        d = np.linalg.norm(C - c, axis=1).min()
        assert d < 0.3, (c, C)


def test_ann_ivf_full_training_recall(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from packcol.pipelines.ann import ann_brute_topk, ann_ivf_topk
    rng = np.random.default_rng(9)
    X = rng.normal(size=(2000, 16))
    df = pd.DataFrame({"embedding": list(X),
                       "vec_id": np.arange(2000, dtype=np.int64)})
    ds = rd.from_pandas(df).repartition(8)
    q = X[:4] + rng.normal(0, 0.01, (4, 16))
    exact = ann_brute_topk(ds, q, k=5)
    approx = ann_ivf_topk(ds, q, k=5, n_lists=8, n_probe=4,
                          train="full")
    ex = exact.groupby("qid")["vec_id"].apply(set)
    ap = approx.groupby("qid")["vec_id"].apply(set)
    recall = np.mean([len(ex[i] & ap[i]) / 5 for i in ex.index])
    assert recall >= 0.6, recall


def test_embedding_matrix_rejects_nulls(ray_session):
    import pyarrow as pa
    from packcol.pipelines.ann import embedding_matrix
    t = pa.table({"embedding": pa.array([[1.0, 2.0], None, [3.0, 4.0]],
                                        pa.list_(pa.float32()))})
    import pytest as _pt
    with _pt.raises(ValueError, match="null vectors"):
        embedding_matrix(t)


class TestUniformSampleVectors:
    def test_unbiased_on_sorted_input(self, ray_session):
        # input sorted so cluster A occupies the head: limit(n) would
        # sample only A; the bottom-k sample must hit both clusters
        import ray.data as rd
        from packcol.pipelines.ann import uniform_sample_vectors
        rng = np.random.default_rng(3)
        a = rng.normal(0, 0.1, (2000, 4))
        b = rng.normal(5, 0.1, (2000, 4))
        X = np.concatenate([a, b])
        ds = rd.from_arrow(pa.table({
            "embedding": pa.array(list(X),
                                  type=pa.large_list(pa.float64()))})) \
            .repartition(8)
        s = uniform_sample_vectors(ds, 200, seed=7)
        assert s.shape == (200, 4)
        frac_b = (s.mean(axis=1) > 2.5).mean()
        assert 0.3 < frac_b < 0.7

    def test_deterministic(self, ray_session):
        import ray.data as rd
        from packcol.pipelines.ann import uniform_sample_vectors
        rng = np.random.default_rng(5)
        X = rng.normal(size=(500, 3))
        ds = rd.from_arrow(pa.table({
            "embedding": pa.array(list(X),
                                  type=pa.large_list(pa.float64()))}))
        s1 = uniform_sample_vectors(ds, 50, seed=1)
        s2 = uniform_sample_vectors(ds, 50, seed=1)
        np.testing.assert_array_equal(s1, s2)

    def test_n_larger_than_input(self, ray_session):
        import ray.data as rd
        from packcol.pipelines.ann import uniform_sample_vectors
        X = np.arange(12, dtype=np.float64).reshape(4, 3)
        ds = rd.from_arrow(pa.table({
            "embedding": pa.array(list(X),
                                  type=pa.large_list(pa.float64()))}))
        s = uniform_sample_vectors(ds, 100)
        assert s.shape == (4, 3)


class TestPQ:
    def _data(self, n=3000, dim=16, seed=7):
        rng = np.random.default_rng(seed)
        centers = rng.standard_normal((20, dim)) * 3
        X = centers[rng.integers(0, 20, n)] + rng.standard_normal(
            (n, dim)) * 0.4
        return pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                             "embedding": list(X)})

    def test_pq_exact_config_matches_brute(self, ray_session):
        """rerank_k >= batch rows forces per-batch exact scoring: the
        result must equal brute-force cosine top-k bit-for-bit."""
        import ray.data as rd
        from packcol.pipelines.ann import ann_brute_topk, ann_pq_topk
        df = self._data()
        ds = rd.from_pandas(df).repartition(4)
        q = np.asarray(df["embedding"][3], dtype=np.float64)
        brute = ann_brute_topk(ds, q, k=10)
        pqr = ann_pq_topk(ds, q, k=10, m=4, nbits=4,
                          rerank_k=10**9, sample_rows=512)
        assert list(pqr["vec_id"]) == list(brute["vec_id"])
        np.testing.assert_allclose(pqr["cos"], brute["cos"])

    def test_pq_recall_and_honest_scores(self, ray_session):
        """Real PQ config: recall@10 vs brute is high on clustered
        data, and every returned cos is the TRUE cosine."""
        import ray.data as rd
        from packcol.pipelines.ann import ann_brute_topk, ann_pq_topk
        df = self._data(seed=9)
        ds = rd.from_pandas(df).repartition(4)
        q = np.asarray(df["embedding"][42], dtype=np.float64)
        brute = ann_brute_topk(ds, q, k=10)
        pqr = ann_pq_topk(ds, q, k=10, m=4, nbits=6, rerank_k=64,
                          sample_rows=1024)
        recall = len(set(pqr["vec_id"]) & set(brute["vec_id"])) / 10
        assert recall >= 0.7, recall
        # honest scores: recompute cosines directly
        X = np.stack(df["embedding"].to_numpy())
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        qn = q / np.linalg.norm(q)
        for vid, cos in zip(pqr["vec_id"], pqr["cos"]):
            assert abs(Xn[int(vid)] @ qn - cos) < 1e-9

    def test_pq_codes_compress(self, ray_session):
        """The code layout is m small ints per vector — the 384x memory
        claim for 768-d float32 at m=8; check the kernel shape here."""
        from packcol.pipelines.ann import _pq_encode_block, pq_train
        import ray.data as rd
        df = self._data(n=800, dim=32)
        books = pq_train(rd.from_pandas(df), m=8, nbits=8,
                         sample_rows=512)
        assert books.shape == (8, 256, 4)
        X = np.stack(df["embedding"].to_numpy())
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        codes = _pq_encode_block(Xn, books)
        assert codes.shape == (800, 8) and codes.dtype == np.uint8
        assert codes.nbytes == 800 * 8  # vs 800 x 32 x 8 raw

    def test_pq_dim_guard(self, ray_session):
        import ray.data as rd
        from packcol.pipelines.ann import pq_train
        df = self._data(n=200, dim=10)
        with pytest.raises(ValueError, match="not divisible"):
            pq_train(rd.from_pandas(df), m=4, sample_rows=128)

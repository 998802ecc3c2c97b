"""KLL quantile sketch: exactness, error bounds, mergeability,
weight preservation, and the distributed pipeline."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from packcol.stages.sketch import KLLSketch, kll_quantiles

QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def exact_disc(values, qs):
    v = np.sort(np.asarray(values, dtype=np.float64))
    n = len(v)
    ranks = np.maximum(np.ceil(np.asarray(qs) * n).astype(np.int64), 1)
    return v[ranks - 1]


def rank_of(values, x):
    v = np.asarray(values, dtype=np.float64)
    return float((v <= x).sum()) / len(v)


class TestKLLSketch:
    def test_exact_when_k_exceeds_n(self):
        rng = np.random.default_rng(7)
        v = rng.normal(size=500)
        sk = KLLSketch(k=1024)
        sk.add(v)
        assert sk.n == 500
        np.testing.assert_array_equal(sk.quantiles(QS), exact_disc(v, QS))

    def test_weight_preserved_under_compaction(self):
        rng = np.random.default_rng(1)
        sk = KLLSketch(k=64)
        total = 0
        for _ in range(20):
            v = rng.normal(size=1000)
            sk.add(v)
            total += 1000
            w = sum(int(a.size) << i for i, a in enumerate(sk.levels))
            assert w == total == sk.n

    def test_rank_error_bound(self):
        # KLL rank error ~ O(1/k); assert a loose 4/k bound on uniform
        rng = np.random.default_rng(3)
        v = rng.uniform(size=200_000)
        sk = KLLSketch(k=256)
        sk.add(v)
        est = sk.quantiles(QS)
        for q, e in zip(QS, est):
            assert abs(rank_of(v, e) - q) < 4.0 / 256 + 1e-9, (q, e)

    def test_memory_bounded(self):
        sk = KLLSketch(k=128)
        rng = np.random.default_rng(5)
        for _ in range(50):
            sk.add(rng.normal(size=10_000))
        retained = sum(a.size for a in sk.levels)
        # O(k) per level x O(log n) levels, with geometric decay -> ~3k
        assert retained < 6 * 128

    def test_merge_equals_single_stream_error(self):
        rng = np.random.default_rng(11)
        a, b = rng.normal(size=50_000), rng.normal(size=50_000) + 0.5
        s1, s2 = KLLSketch(k=256, seed=1), KLLSketch(k=256, seed=2)
        s1.add(a)
        s2.add(b)
        s1.merge(s2)
        assert s1.n == 100_000
        allv = np.concatenate([a, b])
        for q, e in zip(QS, s1.quantiles(QS)):
            assert abs(rank_of(allv, e) - q) < 6.0 / 256

    def test_rows_roundtrip(self):
        rng = np.random.default_rng(13)
        sk = KLLSketch(k=64)
        sk.add(rng.normal(size=5000))
        t = sk.to_rows()
        back = KLLSketch.from_rows(t.column("level").to_numpy(),
                                   t.column("value").to_numpy(), k=64)
        assert back.n == sk.n
        np.testing.assert_array_equal(back.quantiles(QS), sk.quantiles(QS))

    def test_nan_and_empty(self):
        sk = KLLSketch(k=32)
        sk.add(np.array([np.nan, np.nan]))
        assert sk.n == 0
        assert np.all(np.isnan(sk.quantiles([0.5])))
        sk.add(np.array([1.0, np.nan, 3.0]))
        assert sk.n == 2
        np.testing.assert_array_equal(sk.quantiles([0.5, 1.0]), [1.0, 3.0])

    def test_deterministic_for_seed(self):
        rng = np.random.default_rng(17)
        v = rng.normal(size=30_000)
        r = []
        for _ in range(2):
            sk = KLLSketch(k=64, seed=9)
            sk.add(v)
            r.append(sk.quantiles(QS))
        np.testing.assert_array_equal(r[0], r[1])


class TestKLLPipeline:
    def test_exactcap_matches_exact(self, ray_session):
        import ray.data as rd
        rng = np.random.default_rng(23)
        v = rng.integers(0, 5000, size=8000).astype(np.float64)
        ds = rd.from_arrow(pa.table({"x": v})).repartition(8)
        out = kll_quantiles(ds, "x", QS, k=65536)
        np.testing.assert_array_equal(out["value"].to_numpy(),
                                      exact_disc(v, QS))

    def test_sketched_within_bound(self, ray_session):
        import ray.data as rd
        rng = np.random.default_rng(29)
        v = rng.exponential(size=60_000)
        ds = rd.from_arrow(pa.table({"x": v})).repartition(12)
        out = kll_quantiles(ds, "x", QS, k=256, fanin=4)
        for q, e in zip(QS, out["value"].to_numpy()):
            assert abs(rank_of(v, e) - q) < 8.0 / 256, (q, e)

    def test_nulls_ignored(self, ray_session):
        import ray.data as rd
        t = pa.table({"x": pa.array([1.0, None, 2.0, None, 3.0])})
        out = kll_quantiles(rd.from_arrow(t), "x", [0.5], k=64)
        assert out["value"].iloc[0] == 2.0

    def test_empty_dataset(self, ray_session):
        import ray.data as rd
        t = pa.table({"x": pa.array([], pa.float64())})
        out = kll_quantiles(rd.from_arrow(t), "x", [0.5], k=64)
        assert len(out) == 1 and pd.isna(out["value"].iloc[0])


class TestKLLGrouped:
    def test_exactcap_matches_exact_per_group(self, ray_session):
        import ray.data as rd
        from packcol.stages.sketch import kll_quantiles_by
        rng = np.random.default_rng(31)
        g = rng.choice(["a", "b", "c"], size=6000)
        v = rng.integers(0, 300, size=6000).astype(np.float64)
        ds = rd.from_arrow(pa.table({"g": g, "x": v})).repartition(6)
        out = kll_quantiles_by(ds, "g", "x", [0.5, 0.9], k=65536)
        for grp in ["a", "b", "c"]:
            sub = out[out["g"] == grp].sort_values("q")
            exp = exact_disc(v[g == grp], [0.5, 0.9])
            np.testing.assert_array_equal(sub["value"].to_numpy(), exp)

    def test_sketched_within_bound_per_group(self, ray_session):
        import ray.data as rd
        from packcol.stages.sketch import kll_quantiles_by
        rng = np.random.default_rng(37)
        g = rng.choice(["x", "y"], size=40_000)
        v = rng.normal(size=40_000)
        ds = rd.from_arrow(pa.table({"g": g, "x": v})).repartition(10)
        out = kll_quantiles_by(ds, "g", "x", QS, k=256)
        for grp in ["x", "y"]:
            sub = out[out["g"] == grp].sort_values("q")
            for q, e in zip(QS, sub["value"].to_numpy()):
                assert abs(rank_of(v[g == grp], e) - q) < 8.0 / 256

    def test_empty(self, ray_session):
        import ray.data as rd
        from packcol.stages.sketch import kll_quantiles_by
        t = pa.table({"g": pa.array([], pa.string()),
                      "x": pa.array([], pa.float64())})
        out = kll_quantiles_by(rd.from_arrow(t), "g", "x", [0.5])
        assert len(out) == 0


class TestHeavyHitters:
    def test_exact_when_distinct_fits(self, ray_session):
        import ray.data as rd
        from packcol.stages.sketch import heavy_hitters
        rng = np.random.default_rng(41)
        v = rng.choice([f"t{i}" for i in range(20)], size=5000,
                       p=np.r_[0.5, np.full(19, 0.5 / 19)])
        ds = rd.from_arrow(pa.table({"tok": v})).repartition(8)
        out = heavy_hitters(ds, "tok", k=64)
        assert out.attrs["err_ub"] == 0
        exact = {t: int((v == t).sum()) for t in set(v)}
        got = dict(zip(out["tok"], out["count_lo"]))
        assert got == {t: c for t, c in exact.items()
                       if t in got}
        assert out["count_lo"].iloc[0] == exact["t0"]

    def test_bounds_contain_truth_when_pruned(self, ray_session):
        import ray.data as rd
        from packcol.stages.sketch import heavy_hitters
        rng = np.random.default_rng(43)
        # zipf-ish: few heavy tokens over a wide tail
        heavy = np.repeat([f"h{i}" for i in range(5)], 3000)
        tail = np.array([f"x{i}" for i in
                         rng.integers(0, 50_000, 60_000)])
        v = rng.permutation(np.concatenate([heavy, tail]))
        n = len(v)
        ds = rd.from_arrow(pa.table({"tok": v})).repartition(12)
        k = 50
        out = heavy_hitters(ds, "tok", k=k)
        assert 0 < out.attrs["err_ub"] <= n // (k + 1) + 1
        got = dict(zip(out["tok"], zip(out["count_lo"],
                                       out["count_ub"])))
        for i in range(5):  # every heavy token caught, bounds valid
            lo, ub = got[f"h{i}"]
            assert lo <= 3000 <= ub

    def test_empty_and_nulls(self, ray_session):
        import ray.data as rd
        from packcol.stages.sketch import heavy_hitters
        t = pa.table({"tok": pa.array([None, "a", None, "a", "b"],
                                      pa.string())})
        out = heavy_hitters(rd.from_arrow(t), "tok", k=8)
        assert dict(zip(out["tok"], out["count_lo"])) == \
            {"a": 2, "b": 1}
        e = pa.table({"tok": pa.array([], pa.string())})
        out = heavy_hitters(rd.from_arrow(e), "tok", k=8)
        assert len(out) == 0

"""KMV sketch + distributed column profile tests."""

import numpy as np
import pandas as pd
import pyarrow as pa

from packcol.stages.profile import (column_profile, kmv_estimate, kmv_merge,
                                    kmv_sketch, profile_batch, value_hashes)


def test_kmv_exact_below_k():
    h = value_hashes(pa.array([f"v{i % 100}" for i in range(5000)]))
    sk = kmv_sketch(h)
    assert kmv_estimate(sk) == 100


def test_kmv_merge_exact():
    a = value_hashes(pa.array([f"a{i}" for i in range(50)]))
    b = value_hashes(pa.array([f"a{i}" for i in range(30, 80)]))
    merged = kmv_merge([kmv_sketch(a), kmv_sketch(b)])
    assert kmv_estimate(merged) == 80


def test_kmv_estimate_large():
    # 200k distinct values → uniform 64-bit hashes via value_hashes
    h = value_hashes(pa.array(np.arange(200_000), type=pa.int64()))
    est = kmv_estimate(kmv_sketch(h))
    assert abs(est - 200_000) / 200_000 < 0.05


def test_profile_batch_minmax():
    t = pa.table({"x": pa.array([5, 1, None, 9], type=pa.int64()),
                  "s": pa.array(["a", "b", "a", None])})
    p = profile_batch(t)
    row = {c: p.column(c)[0].as_py() for c in p.column_names}
    assert row["column"] == "x" and row["min_i"] == 1 and row["max_i"] == 9
    assert p.column("n_nulls").to_pylist() == [1, 1]


def test_column_profile_pipeline(ray_session):
    import ray.data as rd
    ds = rd.read_parquet("/root/testdata/sf0.01/events.parquet",
                         columns=["user_id", "event_type"])
    pdf = column_profile(ds).to_pandas().set_index("column")
    assert pdf.loc["user_id", "n"] == 10000
    assert pdf.loc["user_id", "n_distinct"] == 150
    assert pdf.loc["event_type", "n_distinct"] == 5


def test_exact_quantiles_matches_duckdb(ray_session):
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from packcol.stages.profile import exact_quantiles
    rng = np.random.default_rng(5)
    vals = rng.integers(0, 300, 5000).astype("int64")
    vals[::7] = rng.integers(0, 5, len(vals[::7]))  # skew
    df = pd.DataFrame({"v": vals})
    df.loc[::11, "v"] = None
    ds = rd.from_pandas(df).repartition(8)
    qs = [0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]
    got = exact_quantiles(ds, "v", qs)
    con = duckdb.connect()
    con.register("t", df)
    for q, v in zip(got["q"], got["value"]):
        exp = con.execute(
            f"SELECT quantile_disc(v, {q}) FROM t").fetchone()[0]
        assert v == exp, (q, v, exp)


def test_exact_quantiles_empty_and_tiny(ray_session):
    import pandas as pd
    import ray.data as rd
    from packcol.stages.profile import exact_quantiles
    empty = rd.from_pandas(pd.DataFrame({"v": pd.Series([], dtype="int64")}))
    out = exact_quantiles(empty, "v", [0.5])
    assert out["value"].isna().all()
    one = rd.from_pandas(pd.DataFrame({"v": [42]}))
    assert exact_quantiles(one, "v", [0.0, 0.5, 1.0])["value"].tolist() \
        == [42, 42, 42]


def test_exact_quantiles_by_group(ray_session):
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from packcol.stages.profile import exact_quantiles_by
    rng = np.random.default_rng(23)
    df = pd.DataFrame({
        "g": rng.choice(["x", "y", "z"], 4000),
        "v": rng.integers(0, 500, 4000).astype("int64")})
    got = exact_quantiles_by(rd.from_pandas(df).repartition(7),
                             "g", "v", [0.25, 0.5, 0.95])
    con = duckdb.connect()
    con.register("t", df)
    for _, row in got.iterrows():
        exp = con.execute(
            f"SELECT quantile_disc(v, {row['q']}) FROM t "
            f"WHERE g = '{row['g']}'").fetchone()[0]
        assert row["value"] == exp, (row["g"], row["q"])


def test_approx_quantiles_within_rank_tolerance(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from packcol.stages.profile import approx_quantiles
    rng = np.random.default_rng(31)
    v = rng.lognormal(0, 1.0, 200_000)  # continuous, heavy-tailed
    ds = rd.from_pandas(pd.DataFrame({"v": v})).repartition(16)
    qs = [0.1, 0.5, 0.9, 0.99]
    got = approx_quantiles(ds, "v", qs, k=16384)
    vs = np.sort(v)
    for q, est in zip(got["q"], got["value"]):
        # rank of the estimate must be within 2% of the target rank
        rank = np.searchsorted(vs, est) / len(vs)
        assert abs(rank - q) < 0.02, (q, rank)
    # deterministic for a fixed partitioning
    got2 = approx_quantiles(ds, "v", qs, k=16384)
    pd.testing.assert_frame_equal(got, got2)


def test_column_profile_handles_nested_and_decimal(ray_session):
    """Regression: list columns silently hashed to all-zeros
    (n_distinct=1) and decimal columns crashed profile_batch."""
    import decimal
    import pyarrow as pa
    import ray.data as rd
    from packcol.stages.profile import column_profile, value_hashes
    import numpy as np
    lists = pa.array([[1, 2], [3], [1, 2], [4, 5, 6]],
                     pa.list_(pa.int64()))
    h = value_hashes(lists)
    assert len(np.unique(h)) == 3  # [1,2] repeats; others distinct
    t = pa.table({
        "lst": lists,
        "dec": pa.array([decimal.Decimal("1.25")] * 2
                        + [decimal.Decimal("2.50")] * 2,
                        pa.decimal128(5, 2))})
    prof = column_profile(rd.from_arrow(t)).to_pandas() \
        .set_index("column")
    assert prof.loc["lst", "n_distinct"] == 3
    assert prof.loc["dec", "n_distinct"] == 2


class TestPearsonCorr:
    def test_matches_numpy_grouped_and_global(self, ray_session):
        import ray.data as rd
        from packcol.stages.profile import pearson_corr
        rng = np.random.default_rng(7)
        n = 6000
        x = rng.standard_normal(n)
        df = pd.DataFrame({
            "g": rng.choice(["a", "b"], n),
            "x": x,
            "y": 0.6 * x + 0.4 * rng.standard_normal(n)})
        ds = rd.from_pandas(df).repartition(6)
        g = pearson_corr(ds, "x", "y").iloc[0]
        assert g["n"] == n
        np.testing.assert_allclose(
            g["corr"], np.corrcoef(df.x, df.y)[0, 1], rtol=1e-9)
        byg = pearson_corr(ds, "x", "y", by="g") \
            .sort_values("g").reset_index(drop=True)
        for i, gv in enumerate(["a", "b"]):
            sub = df[df.g == gv]
            np.testing.assert_allclose(
                byg["corr"][i], np.corrcoef(sub.x, sub.y)[0, 1],
                rtol=1e-9)
            assert byg["n"][i] == len(sub)

    def test_nulls_pairwise_excluded_and_degenerate(self, ray_session):
        import ray.data as rd
        from packcol.stages.profile import pearson_corr
        df = pd.DataFrame({
            "x": [1.0, 2.0, None, 4.0, 5.0, 6.0],
            "y": [2.0, None, 3.0, 8.0, 10.0, 12.0]})
        r = pearson_corr(rd.from_pandas(df), "x", "y").iloc[0]
        ok = df.dropna()
        assert r["n"] == len(ok)
        np.testing.assert_allclose(
            r["corr"], np.corrcoef(ok.x, ok.y)[0, 1], rtol=1e-9)
        const = pd.DataFrame({"x": [3.0] * 10,
                              "y": np.arange(10, dtype=float)})
        rc = pearson_corr(rd.from_pandas(const), "x", "y").iloc[0]
        assert np.isnan(rc["corr"])

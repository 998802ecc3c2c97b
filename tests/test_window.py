"""As-of join and running aggregates vs pandas merge_asof / expanding
ground truth."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from packcol.pipelines.window import asof_join, running_aggregate


def _ds(df, blocks=6):
    import ray.data as rd
    return rd.from_pandas(df).repartition(blocks)


@pytest.fixture()
def quotes_trades():
    rng = np.random.default_rng(11)
    n_q, n_t = 400, 900
    quotes = pd.DataFrame({
        "sym": rng.integers(0, 8, n_q),
        "qt": rng.choice(np.arange(0, 100000, 7), n_q, replace=False)
        .astype("int64"),
        "px": rng.normal(100, 5, n_q).round(2)})
    trades = pd.DataFrame({
        "sym": rng.integers(0, 8, n_t),
        "qt": rng.choice(np.arange(3, 100003, 5), n_t, replace=False)
        .astype("int64"),
        "qty": rng.integers(1, 50, n_t)})
    return quotes, trades


def test_asof_join_matches_pandas(ray_session, quotes_trades):
    quotes, trades = quotes_trades
    got = asof_join(_ds(trades), _ds(quotes, blocks=3), by="sym",
                    on="qt", strict=False).to_pandas() \
        .sort_values(["sym", "qt"]).reset_index(drop=True)
    exp = pd.merge_asof(
        trades.sort_values("qt"), quotes.sort_values("qt"),
        on="qt", by="sym", direction="backward", allow_exact_matches=True
    ).sort_values(["sym", "qt"]).reset_index(drop=True)
    assert len(got) == len(trades)
    pd.testing.assert_frame_equal(got[exp.columns], exp,
                                  check_dtype=False)


def test_asof_join_strict_excludes_equal(ray_session):
    left = pd.DataFrame({"k": [1, 1, 1], "t": [10, 20, 30],
                         "x": [1, 2, 3]})
    right = pd.DataFrame({"k": [1, 1], "t": [10, 25],
                          "y": [100, 200]})
    strict = asof_join(_ds(left, 2), _ds(right, 1), by="k", on="t",
                       strict=True).to_pandas().sort_values("t")
    assert pd.isna(strict["y"].iloc[0])  # t=10: no right row with t<10
    assert strict["y"].tolist()[1:] == [100, 200]
    loose = asof_join(_ds(left, 2), _ds(right, 1), by="k", on="t",
                      strict=False).to_pandas().sort_values("t")
    assert loose["y"].tolist() == [100, 100, 200]


def test_asof_join_timestamp_on(ray_session):
    ts = pd.to_datetime(["2024-01-01", "2024-01-05", "2024-01-09"])
    left = pd.DataFrame({"k": [0, 0, 0], "t": ts, "x": [1, 2, 3]})
    right = pd.DataFrame({"k": [0], "t": pd.to_datetime(["2024-01-03"]),
                          "p": [7]})
    got = asof_join(_ds(left, 1), _ds(right, 1), by="k", on="t") \
        .to_pandas().sort_values("t")
    assert got["p"].tolist()[1:] == [7, 7] and pd.isna(got["p"].iloc[0])


def test_asof_join_column_clash_raises(ray_session):
    df = pd.DataFrame({"k": [1], "t": [1], "v": [1]})
    with pytest.raises(ValueError, match="collision"):
        asof_join(_ds(df, 1), _ds(df, 1), by="k", on="t")


def test_running_aggregate(ray_session):
    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "u": rng.integers(0, 10, 500),
        "t": rng.permutation(500).astype("int64"),
        "v": rng.integers(-5, 50, 500).astype("int64")})
    for agg, pdf_fn in [("sum", lambda s: s.cumsum()),
                        ("max", lambda s: s.cummax()),
                        ("count", lambda s: s.expanding().count()
                         .astype("int64"))]:
        got = running_aggregate(_ds(df), "u", "t", "v", agg=agg) \
            .to_pandas().sort_values(["u", "t"]).reset_index(drop=True)
        exp = df.sort_values(["u", "t"]).reset_index(drop=True)
        exp[f"run_{agg}"] = exp.groupby("u")["v"].transform(pdf_fn)
        pd.testing.assert_frame_equal(got, exp[got.columns],
                                      check_dtype=False)


def test_running_aggregate_tiebreak(ray_session):
    df = pd.DataFrame({"u": [1, 1, 1], "t": [5, 5, 6],
                       "id": [2, 1, 3], "v": [10, 20, 30]})
    got = running_aggregate(_ds(df, 1), "u", "t", "v", agg="sum",
                            tiebreak="id").to_pandas()
    by_id = got.set_index("id")["run_sum"].to_dict()
    assert by_id == {1: 20, 2: 30, 3: 60}


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    left_rows=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 1000)),
                       min_size=1, max_size=60, unique=True),
    right_rows=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 1000)),
                        min_size=1, max_size=60, unique=True),
)
def test_asof_join_property_vs_merge_asof(ray_session, left_rows,
                                          right_rows):
    left = pd.DataFrame(left_rows, columns=["k", "t"])
    left["x"] = np.arange(len(left))
    right = pd.DataFrame(right_rows, columns=["k", "t"])
    right["y"] = np.arange(len(right)) * 10
    got = asof_join(_ds(left, 3), _ds(right, 2), by="k", on="t",
                    strict=False).to_pandas() \
        .sort_values(["k", "t"]).reset_index(drop=True)
    exp = pd.merge_asof(left.sort_values("t"), right.sort_values("t"),
                        on="t", by="k", direction="backward") \
        .sort_values(["k", "t"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns], exp,
                                  check_dtype=False)


def test_top_n_per_group(ray_session):
    rng = np.random.default_rng(5)
    df = pd.DataFrame({"g": rng.integers(0, 6, 300),
                       "v": rng.permutation(300).astype("int64")})
    from packcol.pipelines.window import top_n_per_group
    got = top_n_per_group(_ds(df), "g", "v", 3).to_pandas()
    exp = df.sort_values("v").groupby("g").head(3)
    assert len(got) == len(exp)
    for g, sub in got.groupby("g"):
        assert sorted(sub["v"]) == sorted(
            exp[exp["g"] == g]["v"].tolist())
    desc = top_n_per_group(_ds(df), "g", "v", 2, descending=True) \
        .to_pandas()
    for g, sub in desc.groupby("g"):
        assert set(sub["v"]) == set(
            df[df["g"] == g]["v"].nlargest(2))


def test_top_n_per_group_unsigned_and_string_order(ray_session):
    """Regression: descending once negated the order column, which
    wrap-mis-sorted unsigned ints and crashed on strings."""
    from packcol.pipelines.window import top_n_per_group
    df = pd.DataFrame({"g": [1, 1, 1], "v": pd.array(
        [0, 5, 3], dtype="UInt64").astype("uint64")})
    got = top_n_per_group(_ds(df, 1), "g", "v", 1, descending=True) \
        .to_pandas()
    assert got["v"].tolist() == [5]
    sdf = pd.DataFrame({"g": [0, 0, 0], "s": ["b", "z", "a"],
                        "x": [1, 2, 3]})
    top = top_n_per_group(_ds(sdf, 1), "g", "s", 1, descending=True) \
        .to_pandas()
    assert top["s"].tolist() == ["z"]


def test_asof_join_null_on_values(ray_session):
    """Regression: null 'on' values matched the LATEST right row via
    NaN ordering; they must stay unmatched / be excluded."""
    left = pd.DataFrame({"k": [1, 1, 1],
                         "t": pd.array([10, None, 30], dtype="Int64"),
                         "x": [1, 2, 3]})
    right = pd.DataFrame({"k": [1, 1],
                          "t": pd.array([5, None], dtype="Int64"),
                          "y": [100, 999]})
    got = asof_join(_ds(left, 1), _ds(right, 1), by="k", on="t",
                    strict=False).to_pandas().sort_values(
        "x").reset_index(drop=True)
    assert got["y"].tolist()[0] == 100        # t=10 matches t=5
    assert pd.isna(got["y"].iloc[1])          # null-on left: unmatched
    assert got["y"].tolist()[2] == 100        # null-on right excluded


def test_interval_count_join_matches_bruteforce(ray_session):
    from packcol.pipelines.window import interval_count_join
    rng = np.random.default_rng(41)
    left = pd.DataFrame({
        "id": np.arange(300, dtype=np.int64),
        "k": rng.integers(0, 5, 300),
        "t": rng.integers(0, 100_000, 300).astype("int64")})
    right = pd.DataFrame({
        "k": rng.integers(0, 5, 800),
        "t": rng.integers(0, 100_000, 800).astype("int64")})
    gap = 700
    got = interval_count_join(_ds(left), _ds(right, 4), by="k", on="t",
                              gap=gap, left_id="id",
                              num_partitions=2).to_pandas() \
        .set_index("id")["n_in_range"]
    for _, row in left.sample(60, random_state=0).iterrows():
        exp = ((right["k"] == row["k"]) &
               (np.abs(right["t"] - row["t"]) <= gap)).sum()
        assert got[row["id"]] == exp, row["id"]
    assert len(got) == len(left)  # zero-match rows present with 0


def test_top_n_per_group_combiner_matches_pandas(ray_session):
    from packcol.pipelines.window import top_n_per_group
    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "k": rng.integers(0, 12, 2000),
        "v": rng.integers(0, 40, 2000),        # many ties
        "tb": np.arange(2000, dtype=np.int64),
        "payload": rng.normal(size=2000).round(3)})
    for desc in (False, True):
        got = top_n_per_group(_ds(df, 7), "k", "v", 3,
                              descending=desc, tiebreak="tb") \
            .to_pandas().sort_values(["k", "tb"]).reset_index(drop=True)
        exp = (df.sort_values(["v", "tb"], ascending=[not desc, True])
               .groupby("k", as_index=False).head(3)
               .sort_values(["k", "tb"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp,
                                      check_dtype=False)


def test_top_n_per_group_string_order_desc(ray_session):
    from packcol.pipelines.window import top_n_per_group
    df = pd.DataFrame({"k": [0, 0, 0, 1, 1],
                       "s": ["b", "aa", "z", "m", "c"],
                       "tb": [1, 2, 3, 4, 5]})
    got = top_n_per_group(_ds(df, 2), "k", "s", 1, descending=True,
                          tiebreak="tb").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert got["s"].tolist() == ["z", "m"]


def test_sessionize_matches_pandas(ray_session):
    from packcol.pipelines.window import sessionize
    rng = np.random.default_rng(23)
    n = 3000
    df = pd.DataFrame({
        "u": rng.integers(0, 40, n),
        "t": np.sort(rng.integers(0, 500_000, n)).astype("int64")})
    df = df.sample(frac=1.0, random_state=3).reset_index(drop=True)
    gap = 900
    got = sessionize(_ds(df, 9), by="u", on="t", gap=gap,
                     out_col="n_sessions").to_pandas() \
        .sort_values("u").reset_index(drop=True)

    def ref(g):
        ts = np.sort(g["t"].to_numpy())
        return int((np.diff(ts) > gap).sum()) + 1
    exp = df.groupby("u").apply(ref, include_groups=False) \
        .rename("n_sessions").reset_index()
    pd.testing.assert_frame_equal(
        got, exp.rename(columns={"u": "u"}), check_dtype=False)


def test_sessionize_single_event_users(ray_session):
    from packcol.pipelines.window import sessionize
    df = pd.DataFrame({"u": [1, 2, 3], "t": [5, 100, 7]})
    got = sessionize(_ds(df, 3), by="u", on="t", gap=10).to_pandas()
    assert sorted(got["n_sessions"].tolist()) == [1, 1, 1]


def test_sessionize_timestamp_column(ray_session):
    from packcol.pipelines.window import sessionize
    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "u": [1, 1, 1, 1],
        "ts": [base, base + pd.Timedelta(minutes=5),
               base + pd.Timedelta(hours=2),
               base + pd.Timedelta(hours=2, minutes=10)]})
    got = sessionize(_ds(df, 2), by="u", on="ts",
                     gap=1800 * 1_000_000).to_pandas()
    assert got["n_sessions"].tolist() == [2]


# --- cross-block carry paths: one dominant key spanning MANY blocks ------
# (the sort-based operators resolve cross-block state via broadcast
# carries; these force block counts far above the key count)


def test_asof_join_single_key_many_blocks(ray_session):
    rng = np.random.default_rng(7)
    left = pd.DataFrame({"k": 0, "t": np.sort(rng.choice(
        np.arange(1, 100000, 3), 400, replace=False)).astype("int64")})
    left["x"] = np.arange(len(left))
    # sparse right side: most left rows must match a carry from far back
    right = pd.DataFrame({"k": 0, "t": np.array(
        [5, 30000, 70000], dtype="int64")})
    right["y"] = np.array([100, 200, 300])
    from packcol.pipelines.window import asof_join
    got = asof_join(_ds(left, 24), _ds(right, 2), by="k", on="t",
                    strict=True).to_pandas() \
        .sort_values("t").reset_index(drop=True)
    exp = pd.merge_asof(left.sort_values("t"), right.sort_values("t"),
                        on="t", by="k", direction="backward",
                        allow_exact_matches=False) \
        .sort_values("t").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns], exp,
                                  check_dtype=False)


def test_running_aggregate_single_key_many_blocks(ray_session):
    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "u": 1, "t": rng.permutation(600).astype("int64"),
        "v": rng.integers(-4, 9, 600).astype("int64")})
    got = running_aggregate(_ds(df, 24), "u", "t", "v", agg="sum") \
        .to_pandas().sort_values("t").reset_index(drop=True)
    exp = df.sort_values("t").reset_index(drop=True)
    exp["run_sum"] = exp["v"].cumsum()
    pd.testing.assert_frame_equal(got, exp[got.columns],
                                  check_dtype=False)
    got_mx = running_aggregate(_ds(df, 24), "u", "t", "v", agg="max") \
        .to_pandas().sort_values("t").reset_index(drop=True)
    exp["run_max"] = exp["v"].cummax()
    pd.testing.assert_frame_equal(got_mx, exp[got_mx.columns],
                                  check_dtype=False)


def test_top_n_per_group_single_group_many_blocks(ray_session):
    from packcol.pipelines.window import top_n_per_group
    rng = np.random.default_rng(13)
    df = pd.DataFrame({"g": 0,
                       "v": rng.permutation(500).astype("int64")})
    got = top_n_per_group(_ds(df, 24), "g", "v", 7, descending=True) \
        .to_pandas().sort_values("v", ascending=False) \
        .reset_index(drop=True)
    exp = df.nlargest(7, "v").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["g", "v"]], exp[["g", "v"]],
                                  check_dtype=False)
    # ascending too
    got2 = top_n_per_group(_ds(df, 24), "g", "v", 7, descending=False) \
        .to_pandas().sort_values("v").reset_index(drop=True)
    exp2 = df.nsmallest(7, "v").reset_index(drop=True)
    pd.testing.assert_frame_equal(got2[["g", "v"]], exp2[["g", "v"]],
                                  check_dtype=False)


def test_sessionize_single_key_many_blocks(ray_session):
    from packcol.pipelines.window import sessionize
    # events 0..599 spaced 10 apart, with wide gaps injected at known
    # spots (some will straddle sorted-block boundaries at 24 blocks)
    t = np.arange(600, dtype="int64") * 10
    t[200:] += 5000
    t[401:] += 7000
    df = pd.DataFrame({"u": "only", "t": np.random.default_rng(3)
                       .permutation(t)})
    got = sessionize(_ds(df, 24), by="u", on="t", gap=100) \
        .to_pandas()
    assert got["n_sessions"].tolist() == [3]


def test_asof_join_multikey_many_blocks_both_modes(ray_session):
    rng = np.random.default_rng(21)
    nl, nr = 1200, 300
    left = pd.DataFrame({
        "k": rng.integers(0, 5, nl),
        "t": rng.choice(np.arange(0, 50000), nl, replace=False)
        .astype("int64")})
    left["x"] = np.arange(nl)
    right = pd.DataFrame({
        "k": rng.integers(0, 5, nr),
        "t": rng.choice(np.arange(0, 50000), nr, replace=False)
        .astype("int64")})
    right["y"] = np.arange(nr) * 3
    from packcol.pipelines.window import asof_join
    for strict in (True, False):
        got = asof_join(_ds(left, 24), _ds(right, 16), by="k", on="t",
                        strict=strict).to_pandas() \
            .sort_values(["k", "t"]).reset_index(drop=True)
        exp = pd.merge_asof(left.sort_values("t"),
                            right.sort_values("t"), on="t", by="k",
                            direction="backward",
                            allow_exact_matches=not strict) \
            .sort_values(["k", "t"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got[exp.columns], exp,
                                      check_dtype=False)


def test_running_aggregate_multikey_many_blocks_all_aggs(ray_session):
    rng = np.random.default_rng(23)
    n = 1500
    df = pd.DataFrame({
        "u": rng.integers(0, 4, n),
        "t": rng.permutation(n).astype("int64"),
        "v": rng.integers(-20, 20, n).astype("int64")})
    for agg, fn in [("sum", lambda s: s.cumsum()),
                    ("min", lambda s: s.cummin()),
                    ("max", lambda s: s.cummax()),
                    ("count", lambda s: s.expanding().count()
                     .astype("int64"))]:
        got = running_aggregate(_ds(df, 24), "u", "t", "v", agg=agg) \
            .to_pandas().sort_values(["u", "t"]).reset_index(drop=True)
        exp = df.sort_values(["u", "t"]).reset_index(drop=True)
        exp[f"run_{agg}"] = exp.groupby("u")["v"].transform(fn)
        pd.testing.assert_frame_equal(got, exp[got.columns],
                                      check_dtype=False)


def test_top_n_per_group_multikey_many_blocks(ray_session):
    from packcol.pipelines.window import top_n_per_group
    rng = np.random.default_rng(29)
    n = 2000
    df = pd.DataFrame({
        "g": rng.integers(0, 6, n),
        "v": rng.permutation(n).astype("int64"),
        "id": np.arange(n, dtype="int64")})
    got = top_n_per_group(_ds(df, 24), "g", "v", 9, descending=True,
                          tiebreak="id").to_pandas()
    exp = df.sort_values(["g", "v"], ascending=[True, False]) \
        .groupby("g").head(9)
    got = got.sort_values(["g", "v"]).reset_index(drop=True)
    exp = exp.sort_values(["g", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns], exp,
                                  check_dtype=False)


def test_sessionize_multikey_many_blocks_vs_pandas(ray_session):
    from packcol.pipelines.window import sessionize
    rng = np.random.default_rng(31)
    n = 1600
    df = pd.DataFrame({
        "u": rng.integers(0, 7, n),
        "t": rng.choice(np.arange(0, 40000), n, replace=False)
        .astype("int64")})
    gap = 120
    got = sessionize(_ds(df, 24), by="u", on="t", gap=gap) \
        .to_pandas().sort_values("u").reset_index(drop=True)

    def n_sessions(s):
        t = np.sort(s.to_numpy())
        return int((np.diff(t) > gap).sum()) + 1
    exp = df.groupby("u")["t"].apply(n_sessions).rename("n_sessions") \
        .reset_index().sort_values("u").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["u", "n_sessions"]], exp,
                                  check_dtype=False)


def test_asof_join_null_keys_and_null_on_many_blocks(ray_session):
    rng = np.random.default_rng(37)
    n = 400
    left = pd.DataFrame({
        "k": pd.array([None if i % 7 == 0 else int(i % 3)
                       for i in range(n)], dtype="Int64"),
        "t": rng.choice(np.arange(20000), n, replace=False)
        .astype("int64")})
    left["x"] = np.arange(n)
    # null-on left rows must come out unmatched
    left.loc[left.index[:5], "t"] = None
    left["t"] = left["t"].astype("Int64")
    right = pd.DataFrame({
        "k": pd.array([None if i % 5 == 0 else int(i % 3)
                       for i in range(120)], dtype="Int64"),
        "t": rng.choice(np.arange(20000), 120, replace=False)
        .astype("int64")})
    right["y"] = np.arange(120) * 2
    from packcol.pipelines.window import asof_join
    got = asof_join(_ds(left, 16), _ds(right, 8), by="k", on="t",
                    strict=True).to_pandas()
    # ground truth row-by-row (pandas merge_asof can't do null keys)
    exp_y = {}
    for _, r in left.iterrows():
        key = r["k"]
        t = r["t"]
        if pd.isna(t):
            exp_y[r["x"]] = None
            continue
        same = right[right["k"].isna()] if pd.isna(key) else \
            right[right["k"] == key]
        prior = same[same["t"] < t]
        exp_y[r["x"]] = None if prior.empty else \
            int(prior.loc[prior["t"].idxmax(), "y"])
    got_y = {r["x"]: (None if pd.isna(r["y"]) else int(r["y"]))
             for _, r in got.iterrows()}
    assert got_y == exp_y
    assert len(got) == n


def test_running_aggregate_null_key_group(ray_session):
    df = pd.DataFrame({
        "u": pd.array([1, None, 1, None, 2, None] * 50, dtype="Int64"),
        "t": np.arange(300, dtype="int64"),
        "v": np.ones(300, dtype="int64")})
    got = running_aggregate(_ds(df, 12), "u", "t", "v", agg="sum") \
        .to_pandas()
    nullg = got[got["u"].isna()].sort_values("t")
    assert nullg["run_sum"].tolist() == list(range(1, 151))


def test_sessionize_and_topn_null_keys(ray_session):
    from packcol.pipelines.window import sessionize, top_n_per_group
    rng = np.random.default_rng(41)
    df = pd.DataFrame({
        "u": pd.array([None, 1, None, 2] * 100, dtype="Int64"),
        "t": rng.choice(np.arange(40000), 400, replace=False)
        .astype("int64"),
        "v": np.arange(400, dtype="int64")})
    got = sessionize(_ds(df, 16), by="u", on="t", gap=50).to_pandas()
    assert len(got) == 3           # null group counted as ONE key
    nullrow = got[got["u"].isna()]
    assert len(nullrow) == 1 and nullrow["n_sessions"].iloc[0] >= 1

    topn = top_n_per_group(_ds(df, 16), "u", "v", 5,
                           descending=True).to_pandas()
    nulltop = topn[topn["u"].isna()].sort_values("v", ascending=False)
    exp = df[df["u"].isna()].nlargest(5, "v")["v"].tolist()
    assert nulltop["v"].tolist() == exp
    assert len(topn) == 15


def test_interval_count_join_sparse_partitions(ray_session):
    """num_partitions far above the match count: Ray's hash-shuffle
    aggregate emits zero-column blocks for empty partitions, which used
    to crash the left-outer completion join (Acero FieldRef).  The
    repartition scrub keeps the plan alive and exact."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from packcol.pipelines.window import interval_count_join
    rng = np.random.default_rng(3)
    n = 60
    left = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "k": rng.integers(0, 5, n),
        "t": rng.integers(0, 10_000, n).astype(np.int64)})
    right = pd.DataFrame({
        "k": rng.integers(0, 5, 40),
        "t": rng.integers(0, 10_000, 40).astype(np.int64)})
    got = interval_count_join(
        rd.from_arrow(pa.Table.from_pandas(left, preserve_index=False)),
        rd.from_arrow(pa.Table.from_pandas(right, preserve_index=False)),
        by="k", on="t", gap=50, left_id="id", out_col="n",
        num_partitions=32).to_pandas().sort_values("id")
    m = left.merge(right, on="k")
    m = m[(m["t_x"] - m["t_y"]).abs() <= 50]
    want = m.groupby("id").size().reindex(left["id"], fill_value=0)
    assert got["n"].tolist() == want.tolist()


class TestHoppingWindow:
    def _events(self, n=4000, seed=5):
        rng = np.random.default_rng(seed)
        ts = pd.to_datetime("2024-03-01") + pd.to_timedelta(
            rng.integers(0, 48 * 3600, n), unit="s")
        return pd.DataFrame({
            "ts": ts,
            "kind": rng.choice(["a", "b"], n),
            "v": rng.integers(0, 100, n).astype("float64")})

    def _oracle(self, df, size_s, hop_s, by=None):
        m = size_s // hop_s
        sec = df["ts"].astype("int64") // 10**9
        base = sec // hop_s * hop_s
        rows = []
        for i in range(m):
            d = df.copy()
            d["win_start_s"] = base - i * hop_s
            rows.append(d)
        full = pd.concat(rows)
        keys = ["win_start_s"] + ([by] if by else [])
        g = full.groupby(keys, as_index=False).agg(
            n=("v", "size"), sv=("v", "sum"), mx=("v", "max"))
        return g.sort_values(keys).reset_index(drop=True)

    def test_matches_pandas_oracle(self, ray_session):
        import ray.data as rd
        from packcol.pipelines.window import hopping_window_aggregate
        df = self._events()
        got = hopping_window_aggregate(
            rd.from_pandas(df).repartition(8), "ts",
            size_s=7200, hop_s=3600,
            aggs={"n": ("count",), "sv": ("sum", "v"),
                  "mx": ("max", "v")},
            by="kind").to_pandas() \
            .sort_values(["win_start_s", "kind"]).reset_index(drop=True)
        want = self._oracle(df, 7200, 3600, by="kind")
        assert list(got["n"].astype(int)) == list(want["n"].astype(int))
        np.testing.assert_allclose(got["sv"], want["sv"])
        np.testing.assert_allclose(got["mx"], want["mx"])

    def test_tumbling_degenerate_and_null_ts(self, ray_session):
        import ray.data as rd
        from packcol.pipelines.window import hopping_window_aggregate
        df = self._events(n=1000, seed=9)
        df.loc[df.index[:30], "ts"] = pd.NaT  # dropped, not crashed
        got = hopping_window_aggregate(
            rd.from_pandas(df).repartition(4), "ts",
            size_s=3600, hop_s=3600, aggs={"n": ("count",)}) \
            .to_pandas()
        valid = df.dropna(subset=["ts"])
        want = self._oracle(valid, 3600, 3600)
        assert int(got["n"].sum()) == len(valid)
        assert len(got) == len(want)

    def test_bad_params_raise(self, ray_session):
        import ray.data as rd
        from packcol.pipelines.window import hopping_window_aggregate
        ds = rd.from_pandas(self._events(n=10))
        with pytest.raises(ValueError, match="multiple"):
            hopping_window_aggregate(ds, "ts", size_s=5000, hop_s=3600,
                                     aggs={"n": ("count",)})
        with pytest.raises(ValueError, match="unsupported"):
            hopping_window_aggregate(ds, "ts", size_s=3600, hop_s=3600,
                                     aggs={"n": ("median", "v")})


class TestStratifiedSample:
    def _df(self, seed=3):
        rng = np.random.default_rng(seed)
        return pd.DataFrame({
            "g": rng.choice(["a", "b", "c"], 5000, p=[.80, .18, .02]),
            "x": np.arange(5000, dtype=np.int64)})

    def test_exact_n_per_group_and_reproducible(self, ray_session):
        import ray.data as rd
        from packcol.pipelines.window import stratified_sample
        df = self._df()
        s1 = stratified_sample(rd.from_pandas(df).repartition(8),
                               "g", 40).to_pandas()
        counts = s1.groupby("g").size()
        for g in "abc":
            assert counts[g] == min(40, (df.g == g).sum())
        # reproducible under a different partitioning
        s2 = stratified_sample(rd.from_pandas(df).repartition(3),
                               "g", 40).to_pandas()
        assert set(map(tuple, s1.values)) == set(map(tuple, s2.values))
        # a different seed gives a different sample
        s3 = stratified_sample(rd.from_pandas(df), "g", 40,
                               seed=99).to_pandas()
        assert set(map(tuple, s1.values)) != set(map(tuple, s3.values))

    def test_uniformity(self, ray_session):
        """Each row of a group is equally likely: sampling n=200 of
        1000 sequential x values should cover the range evenly."""
        import ray.data as rd
        from packcol.pipelines.window import stratified_sample
        df = pd.DataFrame({"g": ["z"] * 1000,
                           "x": np.arange(1000, dtype=np.int64)})
        s = stratified_sample(rd.from_pandas(df), "g", 200,
                              seed=5).to_pandas()
        assert len(s) == 200
        # mean of a uniform 200-sample of 0..999 concentrates near 500
        assert 400 < s["x"].mean() < 600


class TestLagLead:
    def test_matches_pandas_shift(self, ray_session):
        import ray.data as rd
        from packcol.pipelines.window import lag_column
        rng = np.random.default_rng(2)
        df = pd.DataFrame({
            "k": rng.choice(["a", "b", "c"], 3000),
            "t": rng.permutation(3000).astype(np.int64),
            "v": rng.integers(0, 100, 3000).astype(np.int64)})
        for n, lead in ((1, False), (3, False), (2, True)):
            got = lag_column(rd.from_pandas(df).repartition(5),
                             "k", "t", "v", n=n, lead=lead) \
                .to_pandas().sort_values(["k", "t"]) \
                .reset_index(drop=True)
            want = df.sort_values(["k", "t"]).reset_index(drop=True)
            exp = want.groupby("k")["v"].shift(n if not lead else -n)
            colname = f"{'lead' if lead else 'lag'}_v"
            g = got[colname].to_numpy(dtype=float)
            e = exp.to_numpy(dtype=float)
            assert ((g == e) | (np.isnan(g) & np.isnan(e))).all(), \
                (n, lead)

    def test_bad_n(self, ray_session):
        import ray.data as rd
        from packcol.pipelines.window import lag_column
        with pytest.raises(ValueError, match="n must be"):
            lag_column(rd.from_items([{"k": 1, "t": 1, "v": 1}]),
                       "k", "t", "v", n=0)

"""Zone-aligned merge join over two clustered stores
(pipelines/join.py::merge_join_clustered).

The join the reference never needed but a 100 TB store engine does:
large ⋈ large with NO shuffle, planned purely from manifest zone
overlap.  Oracled against DuckDB on the same decoded rows.
"""
import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from packcol.pipelines.cluster import cluster_store
from packcol.pipelines.encode_pipeline import encode_files
from packcol.pipelines.join import (merge_join_clustered, merge_join_plan,
                                    shuffle_join)


def _mk_store(tmp, name, df, cluster_key=None, target_bytes=1 << 12):
    raw = os.path.join(tmp, f"{name}.parquet")
    pa.parquet.write_table(pa.Table.from_pandas(df, preserve_index=False),
                           raw)
    enc = os.path.join(tmp, f"{name}_enc")
    encode_files([raw], enc, target_bytes=target_bytes)
    if cluster_key is None:
        return enc
    clu = os.path.join(tmp, f"{name}_clu")
    cluster_store(enc, clu, cluster_key, target_bytes=target_bytes)
    return clu


@pytest.fixture(scope="module")
def stores(ray_session, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("mjoin"))
    rng = np.random.default_rng(7)
    n_fact, n_dim = 4000, 600
    fact = pd.DataFrame({
        "k": rng.integers(0, 800, n_fact),
        "v": rng.integers(0, 10_000, n_fact),
        "tag": rng.choice(list("abcd"), n_fact),
    })
    # some null keys on both sides: SQL semantics (never match)
    fact.loc[fact.index[:25], "k"] = pd.array([None] * 25, dtype="Int64")
    dim = pd.DataFrame({
        "k": rng.choice(800, n_dim, replace=False),
        "w": rng.integers(0, 100, n_dim),
    })
    dim.loc[dim.index[:5], "k"] = pd.array([None] * 5, dtype="Int64")
    left = _mk_store(tmp, "fact", fact, cluster_key="k")
    right = _mk_store(tmp, "dim", dim, cluster_key="k")
    con = duckdb.connect()
    con.register("fact", fact)
    con.register("dim", dim)
    return left, right, con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            continue
        df[c] = pd.to_numeric(df[c], errors="ignore")
    return (df.astype({c: "float64" for c in df.columns
                       if pd.api.types.is_numeric_dtype(df[c])})
            .sort_values(list(df.columns)).reset_index(drop=True))


def test_plan_fanout_is_bounded(stores):
    left, right, _ = stores
    plan = merge_join_plan(left, right, "k")
    assert plan["left_parts"] > 4 and plan["right_parts"] > 1
    # clustered stores: average fanout stays O(1), far from all-pairs
    assert plan["pairs"] < plan["left_parts"] * plan["right_parts"] / 2
    assert plan["max_fanout"] <= 4
    assert plan["unzoned_left"] == 0 and plan["unzoned_right"] == 0


@pytest.mark.parametrize("jt,sql", [
    ("inner", "SELECT f.k, f.v, f.tag, d.w FROM fact f "
              "JOIN dim d USING (k)"),
    ("left outer", "SELECT f.k, f.v, f.tag, d.w FROM fact f "
                   "LEFT JOIN dim d USING (k)"),
    ("left semi", "SELECT f.k, f.v, f.tag FROM fact f "
                  "WHERE f.k IN (SELECT k FROM dim WHERE k IS NOT NULL)"),
    ("left anti", "SELECT f.k, f.v, f.tag FROM fact f WHERE f.k IS NULL "
                  "OR f.k NOT IN (SELECT k FROM dim WHERE k IS NOT NULL)"),
])
def test_merge_join_matches_duckdb(stores, jt, sql):
    left, right, con = stores
    got = merge_join_clustered(
        left, right, "k", join_type=jt,
        left_columns=["k", "v", "tag"],
        right_columns=None if "semi" in jt or "anti" in jt else ["w"],
    ).to_pandas()
    want = con.execute(sql).df()
    pd.testing.assert_frame_equal(_canon(got), _canon(want))


def test_matches_shuffle_join(stores):
    """Physical-strategy equivalence: same rows as the hash join."""
    left, right, con = stores
    from packcol.sources.encoded import read_encoded
    got = merge_join_clustered(left, right, "k",
                               left_columns=["k", "v"],
                               right_columns=["w"]).to_pandas()
    ref = shuffle_join(read_encoded(left, columns=["k", "v"]),
                       read_encoded(right, columns=["k", "w"]),
                       "k").to_pandas()
    pd.testing.assert_frame_equal(_canon(got), _canon(ref[got.columns]))


def test_unclustered_store_refuses_then_conservative(stores, tmp_path):
    """An unclustered (random-order) left store blows the fanout cap —
    the guard refuses; raising the cap still yields exact results."""
    left, right, con = stores
    rng = np.random.default_rng(3)
    fact = pd.DataFrame({"k": rng.integers(0, 800, 3000),
                         "v": rng.integers(0, 100, 3000)})
    messy = _mk_store(str(tmp_path), "messy", fact, cluster_key=None)
    plan = merge_join_plan(messy, right, "k")
    # random-order parts span the whole key domain: every left part
    # overlaps EVERY right part — the all-pairs degeneration the cap
    # is there to catch
    assert plan["max_fanout"] == plan["right_parts"] > 1
    with pytest.raises(ValueError, match="fanout"):
        merge_join_clustered(messy, right, "k",
                             max_fanout=plan["max_fanout"] - 1)
    got = merge_join_clustered(messy, right, "k",
                               max_fanout=plan["max_fanout"],
                               right_columns=["w"]).to_pandas()
    con.register("messy", fact)
    want = con.execute(
        "SELECT m.k, m.v, d.w FROM messy m JOIN dim d USING (k)").df()
    pd.testing.assert_frame_equal(_canon(got), _canon(want))


def test_string_key_and_empty_result(stores, tmp_path):
    tmp = str(tmp_path)
    l = pd.DataFrame({"s": [f"u{i:03d}" for i in range(300)],
                      "x": np.arange(300)})
    r = pd.DataFrame({"s": [f"u{i:03d}" for i in range(0, 300, 3)],
                      "y": np.arange(100)})
    ls = _mk_store(tmp, "ls", l, cluster_key="s")
    rs = _mk_store(tmp, "rs", r, cluster_key="s")
    got = merge_join_clustered(ls, rs, "s").to_pandas()
    want = l.merge(r, on="s")
    pd.testing.assert_frame_equal(_canon(got), _canon(want))
    # disjoint key domains: typed empty result with the joined schema
    r2 = pd.DataFrame({"s": [f"z{i}" for i in range(50)],
                       "y": np.arange(50)})
    rs2 = _mk_store(tmp, "rs2", r2, cluster_key="s")
    empty = merge_join_clustered(ls, rs2, "s")
    # the Dataset keeps the joined schema even when every task emits a
    # typed empty block (Ray's to_pandas drops columns on all-empty
    # datasets — read the schema from the Dataset, not the frame)
    assert sorted(empty.schema().names) == ["s", "x", "y"]
    assert len(empty.to_pandas()) == 0

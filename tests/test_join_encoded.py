"""Store-native join (pipelines/join.py::join_encoded): both sides via
the encoded-store source, dim-key sideways pushdown into the fact read,
outer-join safety, empty-dim schema preservation."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from packcol.pipelines.join import join_encoded


@pytest.fixture(scope="module")
def stores(tmp_path_factory, ray_session):
    from packcol.pipelines.encode_pipeline import encode_files
    rng = np.random.default_rng(41)
    base = tmp_path_factory.mktemp("join_enc")
    fact = pd.DataFrame({
        "o_id": np.arange(4000, dtype=np.int64),
        "cust": rng.integers(0, 120, 4000),
        "amount": rng.integers(1, 1000, 4000).astype(np.int64)})
    dim = pd.DataFrame({
        "c_id": np.arange(0, 100, dtype=np.int64),   # 100..119 unmatched
        "seg": [["gold", "silver", "bronze"][i % 3] for i in range(100)],
        "c_name": [f"cust{i}" for i in range(100)]})
    fp, dp = str(base / "fact.parquet"), str(base / "dim.parquet")
    pq.write_table(pa.Table.from_pandas(fact), fp, row_group_size=500)
    pq.write_table(pa.Table.from_pandas(dim), dp)
    fs, ds_ = str(base / "fact_store"), str(base / "dim_store")
    encode_files([fp], fs, target_bytes=1 << 16)
    encode_files([dp], ds_)
    return fact, dim, fs, ds_


def test_inner_with_dim_filter_matches_pandas(stores, ray_session):
    fact, dim, fs, ds_ = stores
    got = join_encoded(fs, ds_, on="cust", right_on="c_id",
                       dim_filter=("seg", "==", "gold"),
                       fact_columns=["o_id", "amount"],
                       dim_columns=["seg"]).to_pandas()
    exp = fact.merge(dim[dim.seg == "gold"][["c_id", "seg"]],
                     left_on="cust", right_on="c_id")
    assert len(got) == len(exp)
    # pyarrow inner join coalesces the right key: c_id not re-emitted
    assert set(got.columns) == {"o_id", "amount", "cust", "seg"}
    assert sorted(got["o_id"]) == sorted(exp["o_id"])
    assert (got["seg"] == "gold").all()


def test_key_pushdown_reads_only_matching_fact_rows(stores, ray_session):
    # tiny dim key set -> IN-list pushed into the fact read; verify by
    # joining against a 3-key dim slice and checking output keys
    fact, dim, fs, ds_ = stores
    got = join_encoded(fs, ds_, on="cust", right_on="c_id",
                       dim_filter=("c_id", "in", [5, 17, 40]),
                       key_pushdown_limit=10).to_pandas()
    exp = fact[fact.cust.isin([5, 17, 40])]
    assert sorted(got["o_id"]) == sorted(exp["o_id"])


def test_fact_filter_conjoins_with_pushdown(stores, ray_session):
    fact, dim, fs, ds_ = stores
    got = join_encoded(fs, ds_, on="cust", right_on="c_id",
                       fact_filter=("amount", "between", 500, 1000),
                       dim_filter=("seg", "==", "silver")).to_pandas()
    exp = fact[fact.amount.between(500, 1000)].merge(
        dim[dim.seg == "silver"], left_on="cust", right_on="c_id")
    assert sorted(got["o_id"]) == sorted(exp["o_id"])


def test_left_outer_keeps_unmatched_and_skips_pushdown(stores,
                                                       ray_session):
    fact, dim, fs, ds_ = stores
    got = join_encoded(fs, ds_, on="cust", right_on="c_id",
                       join_type="left outer",
                       key_pushdown_limit=1_000_000).to_pandas()
    assert len(got) == len(fact)           # rows with cust >= 100 kept
    unmatched = got[got.cust >= 100]
    assert len(unmatched) > 0 and unmatched["c_name"].isna().all()


def test_semi_join(stores, ray_session):
    fact, dim, fs, ds_ = stores
    got = join_encoded(fs, ds_, on="cust", right_on="c_id",
                       join_type="left semi",
                       dim_filter=("seg", "==", "bronze")).to_pandas()
    keys = set(dim[dim.seg == "bronze"].c_id)
    exp = fact[fact.cust.isin(keys)]
    assert sorted(got["o_id"]) == sorted(exp["o_id"])
    assert "seg" not in got.columns


def test_empty_dim_yields_empty_with_joined_schema(stores, ray_session):
    _, _, fs, ds_ = stores
    got = join_encoded(fs, ds_, on="cust", right_on="c_id",
                       dim_filter=("seg", "==", "nosuch"))
    assert got.count() == 0
    # Ray's to_pandas drops columns on all-empty datasets; the Dataset
    # schema itself is what downstream unification sees
    assert {"o_id", "amount", "c_name", "seg"} <= set(got.schema().names)

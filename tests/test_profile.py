"""KMV sketch + distributed column profile tests."""

import numpy as np
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

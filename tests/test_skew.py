"""Oversized-row chunking / reassembly tests (SURVEY §4 skew handling)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from packcol.stages.skew import RowChunker, chunk_rows, reassemble_rows


def make_batch():
    rng = np.random.default_rng(3)
    cells = [b"small", b"x" * 2500, b"", rng.bytes(9999), b"y" * 1000]
    return pa.table({
        "id": pa.array(range(len(cells)), type=pa.int64()),
        "html": pa.array(cells, type=pa.large_binary()),
    })


def test_chunk_sizes():
    t = make_batch()
    out = chunk_rows(t, "html", max_cell_bytes=1000)
    lens = [len(x) for x in out.column("html").to_pylist()]
    assert max(lens) <= 1000
    assert out.column("__n_segs").to_pylist() == \
        [1, 3, 3, 3, 1, 10] + [10] * 9 + [1]
    # 2500 → 3 segs; 9999 → 10 segs


def test_roundtrip():
    t = make_batch()
    out = chunk_rows(t, "html", max_cell_bytes=1000)
    back = reassemble_rows(out, "html")
    got = dict(zip(back.column("id").to_pylist(),
                   back.column("html").to_pylist()))
    exp = dict(zip(t.column("id").to_pylist(),
                   t.column("html").to_pylist()))
    assert got == exp


def test_row_chunker_stage():
    t = make_batch()
    out = RowChunker("html", max_cell_bytes=512)(t)
    assert out.num_rows > t.num_rows
    back = reassemble_rows(out, "html")
    assert sorted(back.column("id").to_pylist()) == [0, 1, 2, 3, 4]


@settings(max_examples=40, deadline=None)
@given(st.lists(st.binary(max_size=5000), min_size=1, max_size=30),
       st.integers(min_value=1, max_value=2048))
def test_property_roundtrip(cells, maxb):
    t = pa.table({"id": pa.array(range(len(cells)), type=pa.int64()),
                  "html": pa.array(cells, type=pa.large_binary())})
    out = chunk_rows(t, "html", max_cell_bytes=maxb)
    assert all(len(x) <= maxb for x in out.column("html").to_pylist())
    back = reassemble_rows(out, "html")
    got = dict(zip(back.column("id").to_pylist(),
                   back.column("html").to_pylist()))
    exp = dict(zip(t.column("id").to_pylist(), t.column("html").to_pylist()))
    assert got == exp


def test_chunked_rows_through_encode_decode():
    """Segmentation composes with the codec path: chunk → encode →
    decode → reassemble == original."""
    from packcol.stages.encode import decode_rows, encode_table
    t = make_batch()
    chunked = chunk_rows(t, "html", max_cell_bytes=800)
    enc = encode_table(chunked)
    dec = decode_rows(enc)
    back = reassemble_rows(dec, "html")
    got = dict(zip(back.column("id").to_pylist(),
                   back.column("html").to_pylist()))
    exp = dict(zip(t.column("id").to_pylist(),
                   t.column("html").to_pylist()))
    assert got == exp


def test_salted_aggregate_matches_plain_groupby(ray_session):
    """Salted two-round aggregation == direct groupby, including on a
    pathologically hot key (90% of rows)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Min, Sum
    from packcol.stages.skew import salted_aggregate
    rng = np.random.default_rng(13)
    n = 20000
    keys = np.where(rng.random(n) < 0.9, 7, rng.integers(0, 50, n))
    df = pd.DataFrame({"k": keys.astype("int64"),
                       "v": rng.integers(-100, 100, n).astype("int64")})
    ds = rd.from_pandas(df).repartition(8)
    got = salted_aggregate(
        ds, "k", [("v", "sum", "s"), ("v", "min", "lo"),
                  ("v", "max", "hi"), ("v", "count", "n")],
        n_salt=8).to_pandas().sort_values("k").reset_index(drop=True)
    exp = ds.groupby("k").aggregate(
        Sum("v", alias_name="s"), Min("v", alias_name="lo"),
        Max("v", alias_name="hi"), Count(alias_name="n")) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns], exp,
                                  check_dtype=False)


def test_pivot_count_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from packcol.stages.skew import pivot_count
    rng = np.random.default_rng(17)
    df = pd.DataFrame({
        "u": rng.integers(0, 30, 3000).astype("int64"),
        "t": rng.choice(["a", "b", "c", "other"], 3000)})
    got = pivot_count(rd.from_pandas(df).repartition(6), "u", "t",
                      ["a", "b"], out_prefix="n_").to_pandas() \
        .sort_values("u").reset_index(drop=True)
    exp = df.assign(n_a=(df["t"] == "a").astype(int),
                    n_b=(df["t"] == "b").astype(int)) \
        .groupby("u", as_index=False)[["n_a", "n_b"]].sum() \
        .sort_values("u").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns], exp,
                                  check_dtype=False)


def test_chunk_reassemble_preserves_nulls(ray_session):
    """Regression: nulls came back as empty strings after a
    chunk/reassemble cycle."""
    import pyarrow as pa
    from packcol.stages.skew import chunk_rows, reassemble_rows
    t = pa.table({
        "id": pa.array([0, 1, 2, 3], pa.int64()),
        "html": pa.array([None, "x" * 5000, "", "small"],
                         pa.large_string())})
    chunked = chunk_rows(t, "html", max_cell_bytes=1024)
    back = reassemble_rows(chunked, "html")
    back = back.sort_by("id")
    assert back.column("html").null_count == 1
    assert back.column("html")[0].as_py() is None
    assert back.column("html")[2].as_py() == ""
    assert back.column("html")[1].as_py() == "x" * 5000


def test_reassemble_missing_segments_raises(ray_session):
    import pyarrow as pa
    import pytest as _pt
    from packcol.stages.skew import chunk_rows, reassemble_rows
    t = pa.table({"id": pa.array([0], pa.int64()),
                  "html": pa.array(["y" * 5000], pa.large_string())})
    chunked = chunk_rows(t, "html", max_cell_bytes=1024)
    broken = chunked.slice(1)  # drop segment 0
    with _pt.raises(ValueError, match="missing segments"):
        reassemble_rows(broken, "html")
    broken2 = chunked.slice(0, chunked.num_rows - 1)  # drop last seg
    with _pt.raises(ValueError, match="missing segments"):
        reassemble_rows(broken2, "html")

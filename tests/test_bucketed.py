"""sorted_bucket_apply: vectorized interior segments + per-group edge
sliver must together process every bucket exactly once."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _mk(n_rows: int, n_buckets: int, blocks: int):
    import ray.data as rd
    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "b": rng.integers(0, n_buckets, n_rows).astype("int64"),
        "v": np.arange(n_rows, dtype="int64")})
    return rd.from_pandas(df).repartition(blocks), df


def test_sorted_bucket_apply_equals_groupby(ray_session):
    from packcol.stages.bucketed import sorted_bucket_apply
    ds, df = _mk(3000, 400, 20)
    empty = pa.table({"b": pa.array([], pa.int64()),
                      "s": pa.array([], pa.int64()),
                      "c": pa.array([], pa.int64())})

    def per_group(g: pa.Table) -> pa.Table:
        b = g.column("b").to_numpy(zero_copy_only=False)
        v = g.column("v").to_numpy(zero_copy_only=False)
        if len(b) == 0:
            return empty
        return pa.table({"b": b[:1], "s": [int(v.sum())],
                         "c": [len(v)]})

    def interior(batch: pa.Table, ss: np.ndarray) -> pa.Table:
        parts = [per_group(batch.slice(int(a), int(e - a)))
                 for a, e in zip(ss[:-1], ss[1:])]
        return pa.concat_tables(parts) if parts else empty

    got = sorted_bucket_apply(ds, ["b"], interior, per_group, empty) \
        .to_pandas().sort_values("b").reset_index(drop=True)
    exp = df.groupby("b")["v"].agg(["sum", "count"]).reset_index() \
        .rename(columns={"sum": "s", "count": "c"}) \
        .sort_values("b").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp[got.columns],
                                  check_dtype=False)
    # every bucket exactly once
    assert got["b"].is_unique

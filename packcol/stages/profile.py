"""Distributed column profiling: mergeable per-batch stats → one shuffle.

The scale shape the north star names ("groupby-shuffle of per-codec
stats"): every batch emits ONE small stats row per column — counts,
min/max, and a KMV (k-minimum-values) distinct sketch, all mergeable —
then a tiny ``groupby("column")`` merges them.  Documents never shuffle;
only sketch rows do.

KMV: keep the k smallest 64-bit value hashes; estimate
``n_distinct ≈ (k-1) * 2^64 / kth_min`` — and when fewer than k distinct
hashes exist the sketch is EXACT (it holds them all).  Mergeable by
union+truncate.  (Public technique: Bar-Yossef et al., "Counting
distinct elements in a data stream".)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..codecs.forpack import is_int_like, to_int64_numpy

KMV_K = 4096


def value_hashes(arr: pa.Array) -> np.ndarray:
    """64-bit hashes of non-null values (vectorized per type family)."""
    from ..functions.text import _splitmix64, fingerprints
    if arr.null_count:
        arr = arr.drop_null()
    if len(arr) == 0:
        return np.empty(0, dtype=np.uint64)
    if is_int_like(arr.type):
        return _splitmix64(to_int64_numpy(arr).view(np.uint64))
    if pa.types.is_floating(arr.type):
        v = arr.to_numpy(zero_copy_only=False).astype(np.float64)
        return _splitmix64(v.view(np.uint64))
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type) \
            or pa.types.is_binary(arr.type) \
            or pa.types.is_large_binary(arr.type):
        # string-ish: rolling-hash fingerprint per row
        return fingerprints(arr)
    # decimal / nested / other: no vectorized kernel — hash the string
    # form per row (slow path, correct; previously nested columns got
    # silently identical all-zero hashes and decimals crashed)
    try:
        s = arr.cast(pa.string())
    except (pa.ArrowNotImplementedError, pa.ArrowInvalid):
        s = pa.array([str(x) for x in arr.to_pylist()], pa.string())
    return fingerprints(s)


def kmv_sketch(hashes: np.ndarray, k: int = KMV_K) -> np.ndarray:
    u = np.unique(hashes)
    return u[:k]


def kmv_merge(sketches: list[np.ndarray], k: int = KMV_K) -> np.ndarray:
    return np.unique(np.concatenate(sketches))[:k] if sketches else \
        np.empty(0, dtype=np.uint64)


def kmv_estimate(sketch: np.ndarray, k: int = KMV_K) -> int:
    m = len(sketch)
    if m < k:
        return m  # exact: we saw every distinct hash
    kth = float(sketch[-1]) + 1.0
    return int(round((k - 1) * (2.0 ** 64) / kth))


def profile_batch(batch: pa.Table) -> pa.Table:
    """One mergeable stats row per column."""
    rows = {"column": [], "n": [], "n_nulls": [], "raw_bytes": [],
            "min_i": [], "max_i": [], "has_minmax": [], "sketch": []}
    for name in batch.column_names:
        col = batch.column(name)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        rows["column"].append(name)
        rows["n"].append(len(col))
        rows["n_nulls"].append(col.null_count)
        rows["raw_bytes"].append(col.nbytes)
        if is_int_like(col.type) and len(col) > col.null_count:
            v = to_int64_numpy(col)
            if col.null_count:
                v = v[col.is_valid().to_numpy(zero_copy_only=False)]
            rows["min_i"].append(int(v.min()))
            rows["max_i"].append(int(v.max()))
            rows["has_minmax"].append(True)
        else:
            rows["min_i"].append(0)
            rows["max_i"].append(0)
            rows["has_minmax"].append(False)
        rows["sketch"].append(kmv_sketch(value_hashes(col)).tobytes())
    return pa.table({
        "column": pa.array(rows["column"]),
        "n": pa.array(rows["n"], type=pa.int64()),
        "n_nulls": pa.array(rows["n_nulls"], type=pa.int64()),
        "raw_bytes": pa.array(rows["raw_bytes"], type=pa.int64()),
        "min_i": pa.array(rows["min_i"], type=pa.int64()),
        "max_i": pa.array(rows["max_i"], type=pa.int64()),
        "has_minmax": pa.array(rows["has_minmax"]),
        "sketch": pa.array(rows["sketch"], type=pa.large_binary()),
    })


def merge_profiles(group: pa.Table) -> pa.Table:
    sketches = [np.frombuffer(b, dtype=np.uint64)
                for b in group.column("sketch").to_pylist()]
    merged = kmv_merge(sketches)
    has_mm = any(group.column("has_minmax").to_pylist())
    mins = [m for m, h in zip(group.column("min_i").to_pylist(),
                              group.column("has_minmax").to_pylist()) if h]
    maxs = [m for m, h in zip(group.column("max_i").to_pylist(),
                              group.column("has_minmax").to_pylist()) if h]
    return pa.table({
        "column": [group.column("column")[0].as_py()],
        "n": [sum(group.column("n").to_pylist())],
        "n_nulls": [sum(group.column("n_nulls").to_pylist())],
        "raw_bytes": [sum(group.column("raw_bytes").to_pylist())],
        "n_distinct": [kmv_estimate(merged)],
        "min_i": [min(mins) if has_mm else None],
        "max_i": [max(maxs) if has_mm else None],
    })


def column_profile(ds) -> "object":
    """Dataset pipeline: per-batch profile rows → groupby(column) merge.
    Returns a Dataset with one row per column."""
    partials = ds.map_batches(profile_batch, batch_format="pyarrow",
                              zero_copy_batch=True)
    return partials.groupby("column").map_groups(
        merge_profiles, batch_format="pyarrow")


def exact_quantiles(ds, col: str, qs: list[float]):
    """EXACT discrete quantiles (SQL ``quantile_disc`` semantics: the
    element at index ceil(q*n)-1 of the sorted column, nulls ignored)
    without sorting the data.

    Shape: per-batch value-counts combiner (``np.unique``) → one
    groupby on the value → tiny (value, count) table to the driver →
    cumulative-count searchsorted.  Driver memory is O(distinct
    values), NOT O(rows) — right for measure-like columns (lengths,
    scores, ids-per-day); for open/continuous domains at 100 TB use a
    sketch instead (this operator is the exact companion to the KMV
    profile).  Returns a pandas DataFrame (q, value)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        arr = batch.column(col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if arr.null_count:
            arr = arr.drop_null()
        v = arr.to_numpy(zero_copy_only=False)
        vals, cnt = np.unique(v, return_counts=True)
        return pa.table({col: pa.array(vals, type=arr.type),
                         "c": cnt.astype(np.int64)})

    vc = ds.map_batches(partial, batch_format="pyarrow",
                        zero_copy_batch=True) \
        .groupby(col).aggregate(Sum("c", alias_name="c")) \
        .to_pandas()
    # Ray's to_pandas on all-empty pyarrow blocks loses the schema
    if len(vc) == 0 or col not in vc.columns:
        return pd.DataFrame({"q": qs, "value": [None] * len(qs)})
    vc = vc.sort_values(col).reset_index(drop=True)
    cum = vc["c"].to_numpy().cumsum()
    n = int(cum[-1])
    ranks = np.maximum(np.ceil(np.asarray(qs, dtype=np.float64) * n)
                       .astype(np.int64), 1)
    pos = np.searchsorted(cum, ranks, side="left")
    return pd.DataFrame({"q": qs, "value": vc[col].to_numpy()[pos]})


def exact_quantiles_by(ds, by: str, col: str, qs: list[float]):
    """Per-group exact_quantiles: value counts keyed (by, value) — one
    combiner pass + one shuffle of (group, value, count) rows — then
    quantiles per group from the tiny count table.  Driver memory is
    O(groups × distinct values), same bound as a grouped histogram.
    Returns pandas (by, q, value)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([by, col]).drop_null()
        vc = t.group_by([by, col]).aggregate([([], "count_all")])
        return vc.rename_columns([by, col, "c"])

    vc = ds.map_batches(partial, batch_format="pyarrow",
                        zero_copy_batch=True) \
        .groupby([by, col]).aggregate(Sum("c", alias_name="c")) \
        .to_pandas()
    if len(vc) == 0 or col not in vc.columns:
        return pd.DataFrame({by: [], "q": [], "value": []})
    out = []
    for g, sub in vc.groupby(by, sort=True):
        sub = sub.sort_values(col)
        cum = sub["c"].to_numpy().cumsum()
        n = int(cum[-1])
        ranks = np.maximum(np.ceil(np.asarray(qs) * n).astype(np.int64), 1)
        pos = np.searchsorted(cum, ranks, side="left")
        vals = sub[col].to_numpy()[pos]
        out.append(pd.DataFrame({by: g, "q": qs, "value": vals}))
    return pd.concat(out, ignore_index=True)


def approx_quantiles(ds, col: str, qs: list[float], k: int = 16384):
    """Approximate quantiles for OPEN/continuous domains where
    exact_quantiles' O(distinct) driver bound doesn't hold: a
    bottom-k uniform row sample (each row gets a deterministic
    pseudo-random 64-bit key from splitmix64(row-content hash ⊕
    in-batch position); the k smallest keys across the dataset are a
    uniform sample, mergeable by union+truncate — same principle as
    the KMV sketch above).  Error is O(1/sqrt(k)) in rank; k=16384
    gives ~1% rank error.  Deterministic for a fixed dataset
    partitioning.  Returns pandas (q, value)."""
    import pandas as pd
    from ..functions.text import _splitmix64

    def partial(batch: pa.Table) -> pa.Table:
        arr = batch.column(col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if arr.null_count:
            arr = arr.drop_null()
        v = arr.to_numpy(zero_copy_only=False).astype(np.float64)
        if len(v) == 0:
            return pa.table({"key": pa.array([], pa.int64()),
                             "value": pa.array([], pa.float64())})
        pos = np.arange(len(v), dtype=np.uint64)
        key = _splitmix64(_splitmix64(v.view(np.uint64)) ^
                          _splitmix64(pos + np.uint64(0x9E37)))
        if len(key) > k:  # per-batch pre-truncate: only k rows leave
            idx = np.argpartition(key, k)[:k]
            key, v = key[idx], v[idx]
        return pa.table({"key": key.view(np.int64),
                         "value": v})

    sample = ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True).to_pandas()
    if len(sample) == 0 or "value" not in sample.columns:
        return pd.DataFrame({"q": qs, "value": [None] * len(qs)})
    keys = sample["key"].to_numpy().view(np.uint64)
    vals = sample["value"].to_numpy()
    if len(keys) > k:  # final truncate to the k globally-smallest keys
        idx = np.argpartition(keys, k)[:k]
        vals = vals[idx]
    vals = np.sort(vals)
    ranks = np.clip((np.ceil(np.asarray(qs) * len(vals)) - 1)
                    .astype(np.int64), 0, len(vals) - 1)
    return pd.DataFrame({"q": qs, "value": vals[ranks]})


def pearson_corr(ds, x: str, y: str, by: str | None = None):
    """Distributed Pearson correlation from mergeable moment partials:
    each batch emits one row of (n, Σx, Σy, Σxx, Σyy, Σxy) per group —
    six numbers, never data — and one (tiny) groupby merges them; the
    final ratio computes on the driver from the merged moments.

    With integer inputs the moments are EXACT int64 sums, so the final
    double arithmetic is bit-reproducible against any system that
    evaluates the same closed form on the same integer moments (the
    driver-oracle trick: scale fixed-point floats to ints first).
    Rows where either column is null are excluded (SQL corr
    semantics).  Returns pandas ([by,] n, corr); corr is NaN for
    degenerate (constant) columns, like SQL NULL."""
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        xs, ys = batch.column(x), batch.column(y)
        if isinstance(xs, pa.ChunkedArray):
            xs = xs.combine_chunks()
        if isinstance(ys, pa.ChunkedArray):
            ys = ys.combine_chunks()
        ok = pc.and_(pc.is_valid(xs), pc.is_valid(ys))
        if by is not None:
            tbl = batch.filter(ok)
            xs, ys = tbl.column(x), tbl.column(y)
            g = tbl.column(by)
        else:
            xs, ys = xs.filter(ok), ys.filter(ok)
            g = None
        xv = xs.to_numpy(zero_copy_only=False)
        yv = ys.to_numpy(zero_copy_only=False)
        cols = {"__x": xv, "__y": yv, "__xx": xv * xv,
                "__yy": yv * yv, "__xy": xv * yv,
                "__n": np.ones(len(xv), dtype=np.int64)}
        if g is None:
            return pa.table({k: pa.array([v.sum()])
                             for k, v in cols.items()})
        t = pa.table({by: g, **{k: pa.array(v)
                                for k, v in cols.items()}})
        return t.group_by(by).aggregate(
            [(c, "sum") for c in cols])

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    names = ["__x", "__y", "__xx", "__yy", "__xy", "__n"]
    if by is None:
        pdf = parts.to_pandas().sum()
        rows = [{**({} if by is None else {}),
                 **{k: pdf[k] for k in names}}]
        out = pd.DataFrame(rows)
    else:
        aggs = [Sum(on=f"{c}_sum", alias_name=c) for c in names]
        out = parts.groupby(by).aggregate(*aggs).to_pandas()

    def _corr(r):
        n = float(r["__n"])
        sx, sy = float(r["__x"]), float(r["__y"])
        sxx, syy, sxy = (float(r["__xx"]), float(r["__yy"]),
                         float(r["__xy"]))
        den = np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy)
        return (n * sxy - sx * sy) / den if den > 0 else float("nan")

    out["corr"] = out.apply(_corr, axis=1)
    out["n"] = out["__n"].astype(np.int64)
    keep = ([by] if by else []) + ["n", "corr"]
    return out[keep].reset_index(drop=True)

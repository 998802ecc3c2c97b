"""Mergeable KLL quantile sketch + distributed quantile pipeline.

Completes the profile surface next to the KMV distinct sketch
(stages/profile.py): `exact_quantiles` is O(distinct values) on the
driver — the right tool for measure-like integer columns, the wrong
tool for open/continuous domains.  `approx_quantiles` (bottom-k row
sample) has O(1/sqrt(k)) rank error; KLL gives the asymptotically
optimal O(1/k) rank error at the same retained size and, unlike the
row sample, is a *weighted* summary so its error bound is
deterministic-in-shape (randomness only in compaction offsets).

Sketch (Karnin–Lang–Liberty, FOCS'16 — public algorithm):
* levels of value buffers; an item at level i carries weight 2^i
* level capacities shrink geometrically (c = 2/3) from the top; when a
  level overflows it is sorted and every other item (random offset) is
  promoted with doubled weight — an odd straggler stays put, so TOTAL
  WEIGHT IS EXACTLY PRESERVED: sum(2^level) == n always (we exploit
  this to recover n after a merge from the rows alone)
* compaction offsets come from splitmix64 of a per-sketch counter, so
  a given (seed, insertion order) is fully deterministic
* merge = pour the other sketch's levels in, then compress — the
  associative/commutative combine that makes the distributed pipeline
  a tree reduce instead of a driver concat

With k >= n no compaction ever fires, level 0 holds every value with
weight 1 and `quantiles()` is EXACT with the same discrete semantics
as profile.exact_quantiles (element at rank max(ceil(q*n), 1)) — the
exactness-forcing configuration the driver correctness query uses to
oracle the machinery against DuckDB quantile_disc.

Reference parity note: the reference engine (a value-encoding library)
has no analytics surface at all; this is SURVEY.md §2.8 "new engine"
profile machinery.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_C = 2.0 / 3.0  # geometric level-capacity decay


def _splitmix64_scalar(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


class KLLSketch:
    """float64 KLL sketch.  add() is vectorized (one append + amortized
    sort-halve per overflow); memory is O(k) regardless of n."""

    __slots__ = ("k", "levels", "n", "_coin")

    def __init__(self, k: int = 200, seed: int = 0):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self._coin = int(seed)

    # -- capacities ------------------------------------------------------
    def _cap(self, level: int) -> int:
        # top level holds k items; each level below holds k * c^depth
        depth = len(self.levels) - 1 - level
        return max(2, int(np.ceil(self.k * (_C ** depth))))

    # -- construction ----------------------------------------------------
    def add(self, values) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        self.levels[0] = np.concatenate([self.levels[0], v])
        self.n += int(v.size)
        self._compress()

    def merge(self, other: "KLLSketch") -> None:
        for lvl, arr in enumerate(other.levels):
            if arr.size == 0:
                continue
            while len(self.levels) <= lvl:
                self.levels.append(np.empty(0, dtype=np.float64))
            self.levels[lvl] = np.concatenate([self.levels[lvl], arr])
        self.n += other.n
        self._compress()

    def _compress(self) -> None:
        # compact the lowest overflowing level until all fit
        changed = True
        while changed:
            changed = False
            for lvl in range(len(self.levels)):
                buf = self.levels[lvl]
                if buf.size <= self._cap(lvl):
                    continue
                buf = np.sort(buf)
                self._coin += 1
                off = _splitmix64_scalar(self._coin) & 1
                if buf.size & 1:  # odd straggler keeps its weight/level
                    keep, buf = buf[-1:], buf[:-1]
                else:
                    keep = buf[:0]
                promoted = buf[off::2]
                self.levels[lvl] = keep
                if len(self.levels) == lvl + 1:
                    self.levels.append(np.empty(0, dtype=np.float64))
                self.levels[lvl + 1] = np.concatenate(
                    [self.levels[lvl + 1], promoted])
                changed = True
                break  # capacities depend on height; re-evaluate

    # -- queries ---------------------------------------------------------
    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals = [a for a in self.levels if a.size]
        wts = [np.full(a.size, 1 << i, dtype=np.int64)
               for i, a in enumerate(self.levels) if a.size]
        if not vals:
            return (np.empty(0, dtype=np.float64),
                    np.empty(0, dtype=np.int64))
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantiles(self, qs) -> np.ndarray:
        """Discrete-quantile semantics matching profile.exact_quantiles:
        the value at rank max(ceil(q*n), 1) of the (weighted) sorted
        stream.  Exact when no compaction has fired (k >= n)."""
        v, w = self._weighted()
        if v.size == 0:
            return np.full(len(qs), np.nan)
        cum = w.cumsum()
        n = int(cum[-1])
        ranks = np.maximum(
            np.ceil(np.asarray(qs, dtype=np.float64) * n).astype(np.int64),
            1)
        pos = np.searchsorted(cum, ranks, side="left")
        return v[np.minimum(pos, v.size - 1)]

    def rank(self, value: float) -> float:
        """Estimated fraction of items <= value."""
        v, w = self._weighted()
        if v.size == 0:
            return float("nan")
        cum = w.cumsum()
        pos = np.searchsorted(v, value, side="right")
        total = int(cum[-1])
        return (int(cum[pos - 1]) if pos else 0) / total

    # -- (level, value) row codec for the Dataset pipeline ----------------
    def to_rows(self) -> pa.Table:
        lvl = [np.full(a.size, i, dtype=np.int32)
               for i, a in enumerate(self.levels) if a.size]
        val = [a for a in self.levels if a.size]
        if not lvl:
            return pa.table({"level": pa.array([], pa.int32()),
                             "value": pa.array([], pa.float64())})
        return pa.table({"level": np.concatenate(lvl),
                         "value": np.concatenate(val)})

    @classmethod
    def from_rows(cls, levels: np.ndarray, values: np.ndarray,
                  k: int, seed: int = 0) -> "KLLSketch":
        sk = cls(k=k, seed=seed)
        if len(levels) == 0:
            return sk
        levels = np.asarray(levels, dtype=np.int64)
        values = np.asarray(values, dtype=np.float64)
        top = int(levels.max())
        sk.levels = [values[levels == i] for i in range(top + 1)]
        # total weight is exactly n (weight-preserving compaction)
        sk.n = int((np.int64(1) << levels).sum())
        sk._compress()
        return sk


def kll_quantiles(ds, col: str, qs: list[float], k: int = 200,
                  fanin: int = 32, seed: int = 0):
    """Distributed quantiles via per-batch KLL sketches and a tree
    merge.  Shape: map_batches partial (one sketch per batch, emitted
    as O(k) (level, value) rows) → repartition(fanin) → per-block merge
    (again O(k) rows out) → driver merge of <= fanin sketches.  Nothing
    proportional to the data ever reaches the driver; at 100 TB the
    intermediate rows are k × num_batches, re-reduced to k × fanin
    before the driver sees them.  Deterministic for a fixed
    partitioning.  Returns pandas (q, value)."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        arr = batch.column(col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if arr.null_count:
            arr = arr.drop_null()
        sk = KLLSketch(k=k, seed=seed)
        sk.add(arr.to_numpy(zero_copy_only=False))
        return sk.to_rows()

    def merge_block(batch: pa.Table) -> pa.Table:
        sk = KLLSketch.from_rows(
            batch.column("level").to_numpy(zero_copy_only=False),
            batch.column("value").to_numpy(zero_copy_only=False),
            k=k, seed=seed + 1)
        return sk.to_rows()

    rows = (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
              .repartition(fanin)
              .map_batches(merge_block, batch_format="pyarrow",
                           batch_size=None)
              .to_pandas())
    if len(rows) == 0 or "value" not in rows.columns:
        return pd.DataFrame({"q": qs, "value": [None] * len(qs)})
    final = KLLSketch.from_rows(rows["level"].to_numpy(),
                                rows["value"].to_numpy(),
                                k=k, seed=seed + 2)
    return pd.DataFrame({"q": qs, "value": final.quantiles(qs)})


def kll_quantiles_by(ds, by: str, col: str, qs: list[float],
                     k: int = 200, seed: int = 0):
    """Per-group KLL quantiles: one partial sketch per (batch, group)
    emitted as (by, level, value) rows — O(k) per group per batch —
    then ONE groupby shuffle merges each group's rows into its final
    sketch.  Driver receives only the (group, q, value) answers, so
    the memory bound is O(groups × k) spread across reducers, never
    O(rows): the sketch companion to profile.exact_quantiles_by for
    continuous/open value domains.  Returns pandas (by, q, value)."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([by, col]).drop_null()
        if t.num_rows == 0:
            return pa.table({by: pa.array([], batch.column(by).type),
                             "level": pa.array([], pa.int32()),
                             "value": pa.array([], pa.float64())})
        g = t.column(by).to_numpy(zero_copy_only=False)
        v = t.column(col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        order = np.argsort(g, kind="stable")
        g, v = g[order], v[order]
        starts = np.flatnonzero(
            np.r_[True, g[1:] != g[:-1]]).tolist() + [len(g)]
        keys, lvls, vals = [], [], []
        for s, e_ in zip(starts[:-1], starts[1:]):
            sk = KLLSketch(k=k, seed=seed)
            sk.add(v[s:e_])
            rows = sk.to_rows()
            m = rows.num_rows
            keys.extend([g[s]] * m)
            lvls.append(rows.column("level").to_numpy())
            vals.append(rows.column("value").to_numpy())
        return pa.table({
            by: pa.array(keys, type=batch.column(by).type),
            "level": np.concatenate(lvls) if lvls else
            np.array([], np.int32),
            "value": np.concatenate(vals) if vals else
            np.array([], np.float64)})

    def finish(group: pa.Table) -> pa.Table:
        sk = KLLSketch.from_rows(
            group.column("level").to_numpy(zero_copy_only=False),
            group.column("value").to_numpy(zero_copy_only=False),
            k=k, seed=seed + 1)
        gval = group.column(by)[0]
        return pa.table({
            by: pa.array([gval.as_py()] * len(qs),
                         type=group.column(by).type),
            "q": pa.array(qs, pa.float64()),
            "value": pa.array(sk.quantiles(qs), pa.float64())})

    out = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
             .groupby(by).map_groups(finish, batch_format="pyarrow")
             .to_pandas())
    if len(out) == 0 or "value" not in out.columns:
        return pd.DataFrame({by: [], "q": [], "value": []})
    return out.sort_values([by, "q"]).reset_index(drop=True)


def heavy_hitters(ds, col: str, k: int = 100):
    """Misra–Gries heavy hitters with DETERMINISTIC error bounds — the
    rigorous companion to the bounded top-k combiner
    (pipelines/window.py::global_top_k / token_histogram, which keep
    exact counts only for values that stay in every batch's local
    top-k).  Mergeable-summaries form (Agarwal et al., PODS'12 —
    public algorithm): each batch reduces to exact value counts
    (np.unique), pruned to k counters by subtracting the (k+1)-th
    largest count; the subtracted amount is the batch's error bound,
    carried as an is_err-flagged row (placeholder key: Ray's
    sort-based groupby rejects null string keys).  One groupby merges
    counters (<= k x batches distinct keys, distributed) and one tiny
    aggregate sums the error rows; the driver sees only the pruned
    top-k plus one number.

    Guarantees (from summing per-batch MG bounds):
      * count_lo <= true count <= count_lo + err_ub for every value
      * err_ub <= n / (k+1)
      * every value with true count > err_ub appears in the summary
        (so any value with frequency > 1/(k+1) is guaranteed caught)

    Returns pandas (value, count_lo, count_ub) sorted by count_lo
    desc, with .attrs["err_ub"] the global error bound."""
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
        cnt = cnt.astype(np.int64)
        err = 0
        if len(vals) > k:
            thresh = np.partition(cnt, len(cnt) - (k + 1))[
                len(cnt) - (k + 1)]
            keep = cnt > thresh
            vals, cnt = vals[keep], cnt[keep] - thresh
            err = int(thresh)
        flags = np.zeros(len(vals), dtype=bool)
        if err:
            # placeholder key (first survivor), filtered out pre-groupby
            vals = np.concatenate([vals, vals[:1]])
            cnt = np.concatenate([cnt, [err]])
            flags = np.concatenate([flags, [True]])
        return pa.table({col: pa.array(vals, type=arr.type),
                         "c": cnt, "is_err": flags})

    import pyarrow.compute as pc
    # bounded: <= (k+1) rows per batch; materialize once, consume twice
    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    err_ub = 0
    for b in partials.map_batches(
            lambda t: t.filter(pc.field("is_err")).select(["c"]),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        err_ub += int(pc.sum(b.column("c")).as_py() or 0)
    merged = (partials.map_batches(
        lambda t: t.filter(pc.invert(pc.field("is_err")))
        .select([col, "c"]), batch_format="pyarrow")
        .groupby(col).aggregate(Sum("c", alias_name="c")))
    # bounded: <= k rows survive global_top_k's per-batch partials
    from ..pipelines.window import global_top_k
    top = global_top_k(merged, ["c", col], [False, True], k)
    if len(top) == 0 or col not in top.columns:
        out = pd.DataFrame({col: [], "count_lo": [], "count_ub": []})
        out.attrs["err_ub"] = err_ub
        return out
    top = top.head(k)
    out = pd.DataFrame({
        col: top[col].to_numpy(),
        "count_lo": top["c"].to_numpy().astype(np.int64),
        "count_ub": top["c"].to_numpy().astype(np.int64) + err_ub})
    out.attrs["err_ub"] = err_ub
    return out.reset_index(drop=True)

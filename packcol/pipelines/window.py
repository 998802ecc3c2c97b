"""Temporal / order-dependent operators Ray Data lacks natively:
as-of join, running (windowed) aggregates, top-n per group, and
sessionization.

All four share one physical pattern (SURVEY §2.8 / engine design):
ONE global sort on (key, order[, tiebreak]) — the only shuffle — then
vectorized per-block kernels, with cross-block state resolved through
O(blocks)-sized "carry" summaries collected to the driver and
broadcast via ``ray.put``.  The correctness argument is shared: after
a global sort, each key occupies a CONTIGUOUS run of the stream, so
only a block's first segment can continue a previous block's key, and
only its final segment can continue into later blocks; each operator's
carry is whatever that final segment must hand forward (latest right
row, segment aggregate, row count, last run's end time).  No per-key
``map_groups`` anywhere — per-group Python is the slow path at
millions of keys.  Deterministic results need a unique
(order[, tiebreak]) per key; with duplicates the order itself is
ambiguous, and cross-block ties resolve per sort layout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _t64(col) -> np.ndarray:
    """Order-preserving int64 view of a sort/time column (temporal →
    epoch int64 in the column's own unit)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_temporal(col.type):
        col = col.cast(pa.int64())
    return col.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)


def _pa_type(t) -> pa.DataType:
    """Arrow type from a Ray schema entry: arrow type for arrow-backed
    datasets, numpy dtype for pandas-backed ones, the storage dtype for
    pandas extension dtypes (Int64Dtype etc.).  ``pa.null()`` means
    "unknown — leave the column as-is" (see ``_conform``)."""
    if isinstance(t, pa.DataType):
        return t
    if t is None:       # Ray returns None for unconvertible pandas dtypes
        return pa.null()
    try:
        return pa.from_numpy_dtype(t)
    except (pa.ArrowNotImplementedError, TypeError):
        base = getattr(t, "numpy_dtype", None)  # pandas ExtensionDtype
        if base is not None:
            try:
                return pa.from_numpy_dtype(base)
            except (pa.ArrowNotImplementedError, TypeError):
                pass
        return pa.null()


def _conform(tbl: pa.Table, want: dict) -> pa.Table:
    """Cast a block to the expected column types.  Blocks that detour
    through pandas (Ray's sort emits pandas blocks when any input block
    is pandas-backed) come back with int columns promoted to float64
    and padded nulls turned into NaN — undo both (NaN → null only when
    the target type is non-float, i.e. the NaN is a pandas null
    marker, never a data value)."""
    cols = {}
    n = tbl.num_rows
    for name, typ in want.items():
        c = tbl.column(name)
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        if c.type != typ and not pa.types.is_null(typ):
            if pa.types.is_null(c.type):
                c = pa.nulls(n, typ)
            else:
                if pa.types.is_floating(c.type) and \
                        not pa.types.is_floating(typ):
                    c = pc.if_else(pc.is_nan(c), pa.scalar(None, c.type),
                                   c)
                c = c.cast(typ)
        cols[name] = c
    return pa.table(cols)


def _ordv(col) -> np.ndarray:
    """Comparable numpy view of a sort column: temporal → epoch int64,
    numerics zero-copy, strings as object (python-compare)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_temporal(col.type):
        col = col.cast(pa.int64())
    return col.to_numpy(zero_copy_only=False)


def _key_change(batch: pa.Table, by: list[str], m: int) -> np.ndarray:
    """bool[m-1]: any by-column differs between adjacent rows
    (null == null counts as same key, matching groupby semantics)."""
    neq = np.zeros(max(m - 1, 0), dtype=bool)
    for name in by:
        c = batch.column(name)
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        a, b = c.slice(0, m - 1), c.slice(1)
        eqv = pc.fill_null(pc.equal(b, a), False) \
            .to_numpy(zero_copy_only=False).astype(bool)
        if c.null_count:
            av = a.is_valid().to_numpy(zero_copy_only=False)
            bv = b.is_valid().to_numpy(zero_copy_only=False)
            eqv |= ~av & ~bv
        neq |= ~eqv
    return neq



def _zero_scalar(typ: pa.DataType):
    """Some valid scalar of ``typ`` (value irrelevant — used only as a
    sort surrogate for null keys, whose real value is restored from the
    flag column afterwards)."""
    for cand in (0, "", b"", False):
        try:
            return pa.scalar(cand, typ)
        except (pa.ArrowInvalid, pa.ArrowTypeError, pa.ArrowNotImplementedError,
                OverflowError, TypeError):
            continue
    return None


def _flag_names(by: list[str]) -> list[str]:
    return [f"__nk{i}" for i in range(len(by))]


def _sort_by_ext(by: list[str]) -> list[str]:
    """Interleaved (flag, key) sort columns: lexicographic order with
    null keys LAST within each prefix, totally ordered (the filled key
    is never null, so Ray's range partitioner — which cannot place
    null sort keys consistently across blocks — never sees one)."""
    out = []
    for i, name in enumerate(by):
        out += [f"__nk{i}", name]
    return out


def _add_key_flags(batch: pa.Table, by: list[str]) -> pa.Table:
    """Append per-key is-null int8 flags and fill nulls in the key
    columns themselves.  Ray's sample-based sort CANNOT totally order
    rows whose sort key is null (observed: null-key rows land in
    multiple blocks with overlapping secondary-key ranges), which
    breaks the sorted-contiguity invariant every sort+carry operator
    relies on — so null keys are ordered via (flag, filled-key)
    surrogates instead and restored from the flag on output."""
    n = batch.num_rows
    cols = {name: batch.column(name) for name in batch.schema.names}
    for i, name in enumerate(by):
        c = cols[name]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        if c.null_count:
            flag = c.is_null().cast(pa.int8())
            z = _zero_scalar(c.type)
            if z is not None:
                c = pc.fill_null(c, z)
        else:
            flag = pa.array(np.zeros(n, dtype=np.int8))
        cols[name] = c
        cols[f"__nk{i}"] = flag
    return pa.table(cols)


def _restore_null_keys(tbl: pa.Table, by: list[str]) -> pa.Table:
    """Undo ``_add_key_flags``: null out flagged key values, drop the
    flag columns."""
    flags = set(_flag_names(by))
    names = [n for n in tbl.schema.names if n not in flags]
    cols = {}
    for n in names:
        c = tbl.column(n)
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        cols[n] = c
    for i, name in enumerate(by):
        f = tbl.column(f"__nk{i}")
        if isinstance(f, pa.ChunkedArray):
            f = f.combine_chunks()
        if pc.max(f).as_py():
            cols[name] = pc.if_else(
                pc.equal(f, 1), pa.scalar(None, cols[name].type),
                cols[name])
    return pa.table(cols)


def _pad_union(left, right, by: list[str], on: str):
    """Union two datasets for a co-partitioned groupby: each side keeps
    (by, on, own columns), gains the other side's columns as nulls and
    a __side tag.  Column name collisions outside (by, on) must be
    resolved by the caller (rename beforehand)."""
    ls = left.schema()
    rs = right.schema()
    lcols = {n: _pa_type(t) for n, t in zip(ls.names, ls.types)}
    rcols = {n: _pa_type(t) for n, t in zip(rs.names, rs.types)}
    shared = set(by) | {on}
    clash = (set(lcols) & set(rcols)) - shared
    if clash:
        raise ValueError(f"column collision outside keys: {sorted(clash)}"
                         " — rename before asof_join")
    all_cols = {**lcols, **rcols}

    def pad(side: int, have: dict):
        def f(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {}
            for name, typ in all_cols.items():
                cols[name] = (batch.column(name) if name in have
                              else pa.nulls(n, typ))
            cols["__side"] = pa.array(np.full(n, side, dtype=np.int8))
            return _add_key_flags(pa.table(cols), by)
        return f

    ds = left.map_batches(pad(0, lcols), batch_format="pyarrow").union(
        right.map_batches(pad(1, rcols), batch_format="pyarrow"))
    return ds, all_cols


def asof_join(left, right, by, on: str, strict: bool = True):
    """For every left row, attach the single right row with the largest
    ``on`` value that is < (strict) or <= (not strict) the left row's
    ``on``, within the same ``by`` key — backward as-of, left outer
    (unmatched left rows keep nulls in right columns).

    Physical plan (sort-based, ONE shuffle, no per-key UDF): tag +
    union + one global sort on (by, on, side) — side ordered so that
    equal-timestamp right rows land before (non-strict) or after
    (strict) the left rows they may match.  Then two map passes over
    the sorted blocks:

    1. carry extraction — each block emits ≤1 row: its last valid
       right row IF it lies in the block's final key segment (the only
       key a later block can continue).  O(blocks) rows total are
       collected to the driver and broadcast via ``ray.put``.
    2. resolve — a vectorized kernel matches every left row against
       the in-block right rows (segmented running-max of right
       positions, all keys at once); left rows in a block's FIRST key
       segment with no in-block match fall back to a searchsorted
       against the broadcast carries (all carries of a key appear in
       global sort order, so the latest qualifying carry IS the
       global as-of match).  Everything else is provably unmatched.

    Correctness of the carry set: keys occupy contiguous runs of the
    sorted stream, so if blocks j < i both contain key K, K is block
    j's final segment — hence block j's latest K right row is exactly
    its carry row.  The driver-side carry table is O(blocks), not
    O(rows); at 16–128 MB blocks that is ~1 row per block — safe at
    any input size."""
    by = [by] if isinstance(by, str) else list(by)
    rnames = [n for n in right.schema().names
              if n not in set(by) | {on}]
    both, union_cols = _pad_union(left, right, by, on)
    lnames = [n for n in left.schema().names]

    # side order at equal (key, on): strict ⇒ left first (an equal-time
    # right row must NOT match), non-strict ⇒ right first (it must)
    left_ord, right_ord = (0, 1) if strict else (1, 0)

    def add_ord(batch: pa.Table) -> pa.Table:
        side = batch.column("__side").to_numpy(zero_copy_only=False)
        ordv = np.where(side == 0, left_ord, right_ord).astype(np.int8)
        return batch.append_column("__ord", pa.array(ordv))

    by_sort = _sort_by_ext(by)
    carry_names = by_sort + [on] + rnames
    want_union = {**union_cols,
                  **{f: pa.int8() for f in _flag_names(by)},
                  "__side": pa.int8(), "__ord": pa.int8()}

    def extract_carry(batch: pa.Table) -> pa.Table:
        batch = _conform(batch, want_union)
        m = batch.num_rows
        none = batch.select(carry_names).slice(0, 0)
        if m == 0:
            return none
        side = batch.column("__side").to_numpy(zero_copy_only=False)
        t = batch.column(on)
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        valid = np.ones(m, dtype=bool) if t.null_count == 0 else \
            t.is_valid().to_numpy(zero_copy_only=False)
        ri = np.flatnonzero((side == 1) & valid)
        if len(ri) == 0:
            return none
        neq = _key_change(batch, by_sort, m)
        chg = np.flatnonzero(neq)
        last_seg_start = int(chg[-1]) + 1 if len(chg) else 0
        if int(ri[-1]) < last_seg_start:
            return none
        return batch.take(pa.array([int(ri[-1])])).select(carry_names)

    sorted_ds = both.map_batches(add_ord, batch_format="pyarrow") \
        .sort(by_sort + [on, "__ord"]).materialize()
    # carries arrive in block order == global sort order (so per key
    # they are already time-ascending, with later blocks winning ties)
    import ray
    carry_parts = ray.get(
        sorted_ds.map_batches(extract_carry, batch_format="pyarrow",
                              batch_size=None, zero_copy_batch=True)
        .to_arrow_refs())
    nonempty = [p for p in carry_parts
                if isinstance(p, pa.Table) and p.num_rows]
    if nonempty:
        carry_tbl = pa.concat_tables(nonempty)
    else:
        carry_tbl = None
    carry_ref = ray.put(carry_tbl)

    def _carry_col(tbl: pa.Table, name: str) -> pa.Array:
        c = tbl.column(name)
        return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

    def resolve(batch: pa.Table) -> pa.Table:
        batch = _conform(batch, want_union)
        m = batch.num_rows
        if m == 0:
            return batch.select(lnames + rnames)
        carry = ray.get(carry_ref)
        side = batch.column("__side").to_numpy(zero_copy_only=False)
        t = batch.column(on)
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        valid = np.ones(m, dtype=bool) if t.null_count == 0 else \
            t.is_valid().to_numpy(zero_copy_only=False)
        neq = _key_change(batch, by_sort, m)
        starts = np.concatenate([[0], np.flatnonzero(neq) + 1])
        seg_of = np.cumsum(np.concatenate([[0], neq]))
        seg_start = starts[seg_of]
        # segmented running max of right-row positions = in-block match
        ridx = np.where((side == 1) & valid,
                        np.arange(m, dtype=np.int64), np.int64(-1))
        cand = np.maximum.accumulate(ridx)
        li = np.flatnonzero(side == 0)
        nli = len(li)
        inb = (cand[li] >= seg_start[li]) & valid[li]
        # pending: valid-time lefts in the FIRST key segment with no
        # in-block match — the only rows whose match can live in an
        # earlier block.  All pending rows share the block's first key.
        pend = ~inb & valid[li] & (seg_of[li] == 0)
        car_match = np.zeros(nli, dtype=bool)
        car_src = np.zeros(nli, dtype=np.int64)
        if pend.any() and carry is not None and carry.num_rows:
            cmask = np.ones(carry.num_rows, dtype=bool)
            for name in by_sort:
                kc = batch.column(name)
                if isinstance(kc, pa.ChunkedArray):
                    kc = kc.combine_chunks()
                kv = kc[0]
                cc = _carry_col(carry, name)
                if not kv.is_valid:
                    eq = cc.is_null()
                else:
                    eq = pc.fill_null(pc.equal(cc, kv), False)
                cmask &= eq.to_numpy(zero_copy_only=False).astype(bool)
            cidx = np.flatnonzero(cmask)
            if len(cidx):
                ct = _t64(_carry_col(carry, on).take(pa.array(cidx)))
                lt = _t64(t)[li[pend]]
                pos = np.searchsorted(
                    ct, lt, side="left" if strict else "right") - 1
                ok = pos >= 0
                pi = np.flatnonzero(pend)
                car_match[pi[ok]] = True
                car_src[pi[ok]] = cidx[pos[ok]]
        gl = batch.take(pa.array(li))
        in_take = pc.if_else(
            pa.array(inb),
            pa.array(np.where(inb, cand[li], 0), pa.int64()),
            pa.nulls(nli, pa.int64()))
        car_take = pc.if_else(
            pa.array(car_match),
            pa.array(car_src, pa.int64()),
            pa.nulls(nli, pa.int64()))
        cols = {name: gl.column(name)
                for name in lnames + _flag_names(by)}
        inb_arr = pa.array(inb)
        for name in rnames:
            c = batch.column(name)
            if isinstance(c, pa.ChunkedArray):
                c = c.combine_chunks()
            alt = _carry_col(carry, name).take(car_take) \
                if carry is not None else pa.nulls(nli, c.type)
            cols[name] = pc.if_else(inb_arr, c.take(in_take), alt)
        return _restore_null_keys(pa.table(cols), by) \
            .select(lnames + rnames)

    return sorted_ds.map_batches(resolve, batch_format="pyarrow",
                                 batch_size=None, zero_copy_batch=True)


_CUM_FUNCS = {
    "sum": np.cumsum,
    "max": np.maximum.accumulate,
    "min": np.minimum.accumulate,
    "count": lambda v: np.arange(1, len(v) + 1, dtype=np.int64),
}


def running_aggregate(ds, by, on, col: str, agg: str = "sum",
                      out_col: str | None = None, tiebreak: str | None = None):
    """Per-key running aggregate ordered by ``on`` (SQL:
    ``agg(col) OVER (PARTITION BY by ORDER BY on)``).  agg: sum / max /
    min / count.  ``tiebreak`` adds a secondary sort column for
    deterministic order when ``on`` has duplicates (recommended —
    cross-block carries assume (on[, tiebreak]) is unique per key; with
    duplicates the order, and hence the running values, are ambiguous).

    Physical plan (sort-based, ONE shuffle, no per-key UDF): global
    sort on (by, on[, tiebreak]); per block a segmented C-speed prefix
    (pandas groupby-cum{sum,max,min,count} over in-block key
    segments); cross-block continuation via a carry pass — each block
    emits ≤1 summary row (its final key segment's aggregate), the
    O(blocks) summaries are prefix-combined per key on the driver in
    global sort order and broadcast, and each block's FIRST segment
    adds the latest carry that sorts strictly before it (two scalar
    searchsorteds).  Same carry argument as ``asof_join``: keys occupy
    contiguous runs of the sorted stream, so only a block's final
    segment can continue into later blocks."""
    if agg not in _CUM_FUNCS:
        raise ValueError(f"unsupported agg {agg!r}")
    by = [by] if isinstance(by, str) else list(by)
    out_col = out_col or f"run_{agg}"
    by_sort = _sort_by_ext(by)
    sort_keys = by_sort + [on] + ([tiebreak] if tiebreak else [])
    want = {n: _pa_type(t) for n, t in zip(ds.schema().names,
                                           ds.schema().types)}
    want = {**want, **{f: pa.int8() for f in _flag_names(by)}}

    import ray
    sds = ds.map_batches(lambda b: _add_key_flags(
        _conform(b, {n: t for n, t in want.items()
                     if n not in set(_flag_names(by))}), by),
        batch_format="pyarrow", zero_copy_batch=True) \
        .sort(sort_keys).materialize()

    def _seg_agg(v: np.ndarray) -> np.ndarray:
        if agg == "sum":
            return v.sum()
        if agg == "max":
            return v.max()
        if agg == "min":
            return v.min()
        return np.int64(len(v))

    sum_names = by_sort + ["__t", "__tb", "__val"]

    def summarize(batch: pa.Table) -> pa.Table:
        batch = _conform(batch, want)
        m = batch.num_rows
        if m == 0:
            return pa.table({
                **{n: batch.column(n) for n in by_sort},
                "__t": pa.array([], pa.int64()),
                "__tb": pa.array([], pa.int64()),
                "__val": pa.array([], pa.float64())})
        neq = _key_change(batch, by_sort, m)
        chg = np.flatnonzero(neq)
        ls = int(chg[-1]) + 1 if len(chg) else 0
        v = batch.column(col).to_numpy(zero_copy_only=False)
        t = _ordv(batch.column(on))
        tb = _ordv(batch.column(tiebreak)) if tiebreak else \
            np.zeros(m, dtype=np.int64)
        return pa.table({
            **{n: (batch.column(n).combine_chunks()
                   if isinstance(batch.column(n), pa.ChunkedArray)
                   else batch.column(n)).take(pa.array([ls]))
               for n in by_sort},
            "__t": pa.array([t[ls]]).cast(pa.int64())
            if np.issubdtype(np.asarray(t[ls:ls + 1]).dtype, np.number)
            else pa.array([t[ls]]),
            "__tb": pa.array([tb[ls]]).cast(pa.int64())
            if np.issubdtype(np.asarray(tb[ls:ls + 1]).dtype, np.number)
            else pa.array([tb[ls]]),
            "__val": pa.array([_seg_agg(v[ls:])])})

    parts = ray.get(sds.map_batches(summarize, batch_format="pyarrow",
                                    batch_size=None, zero_copy_batch=True)
                    .to_arrow_refs())
    rows = [p for p in parts if isinstance(p, pa.Table) and p.num_rows]
    if rows:
        summ = pa.concat_tables(rows, promote_options="permissive")
        # inclusive per-key prefix-combine in block (= global sort) order
        vals = summ.column("__val").to_numpy(zero_copy_only=False)
        kt = summ.select(by_sort)
        # to_pylist: None-safe key tuples (NaN float keys would break
        # the dict — NaN != NaN, so null groups would reset per block)
        keys = list(zip(*[kt.column(n).to_pylist() for n in by_sort]))
        acc: dict = {}
        pref = np.empty(len(vals), dtype=vals.dtype)
        for i, k in enumerate(keys):
            if k in acc:
                a = acc[k]
                nv = a + vals[i] if agg in ("sum", "count") else (
                    max(a, vals[i]) if agg == "max" else min(a, vals[i]))
            else:
                nv = vals[i]
            acc[k] = nv
            pref[i] = nv
        carry = {"keys": kt,
                 "t": summ.column("__t").to_numpy(zero_copy_only=False),
                 "tb": summ.column("__tb").to_numpy(zero_copy_only=False),
                 "pref": pref}
    else:
        carry = None
    carry_ref = ray.put(carry)

    def resolve(batch: pa.Table) -> pa.Table:
        batch = _conform(batch, want)
        m = batch.num_rows
        v = batch.column(col).to_numpy(zero_copy_only=False)
        if m == 0:
            return _restore_null_keys(
                batch.append_column(out_col, pa.array(v)), by)
        neq = _key_change(batch, by_sort, m)
        seg_of = np.cumsum(np.concatenate([[0], neq]))
        import pandas as pd
        g = pd.Series(v).groupby(seg_of)
        if agg == "sum":
            run = g.cumsum().to_numpy()
        elif agg == "max":
            run = g.cummax().to_numpy()
        elif agg == "min":
            run = g.cummin().to_numpy()
        else:
            run = (g.cumcount() + 1).to_numpy().astype(np.int64)
        cy = ray.get(carry_ref)
        if cy is not None:
            # latest carry of this block's first key strictly before
            # the block's first row: prior segments of a continuing run
            cmask = np.ones(len(cy["pref"]), dtype=bool)
            for name in by_sort:
                kc = batch.column(name)
                if isinstance(kc, pa.ChunkedArray):
                    kc = kc.combine_chunks()
                kv = kc[0]
                cc = cy["keys"].column(name)
                if isinstance(cc, pa.ChunkedArray):
                    cc = cc.combine_chunks()
                if not kv.is_valid:
                    eq = cc.is_null()
                else:
                    eq = pc.fill_null(pc.equal(cc, kv), False)
                cmask &= eq.to_numpy(zero_copy_only=False).astype(bool)
            cidx = np.flatnonzero(cmask)
            if len(cidx):
                my_t = _ordv(batch.column(on))[0]
                my_tb = _ordv(batch.column(tiebreak))[0] if tiebreak \
                    else np.int64(0)
                ct, ctb = cy["t"][cidx], cy["tb"][cidx]
                a = np.searchsorted(ct, my_t, side="left")
                b = np.searchsorted(ct, my_t, side="right")
                j = a + np.searchsorted(ctb[a:b], my_tb, side="left")
                if j > 0:
                    cval = cy["pref"][cidx[j - 1]]
                    first = seg_of == 0
                    if agg in ("sum", "count"):
                        run[first] = run[first] + cval
                    elif agg == "max":
                        run[first] = np.maximum(run[first], cval)
                    else:
                        run[first] = np.minimum(run[first], cval)
        if agg == "count":
            out = pa.array(run.astype(np.int64))
        else:
            out = pa.array(run.astype(v.dtype, copy=False))
        return _restore_null_keys(batch.append_column(out_col, out), by)

    return sds.map_batches(resolve, batch_format="pyarrow",
                           batch_size=None, zero_copy_batch=True)


def _group_codes(tbl: pa.Table, by: list[str]) -> np.ndarray:
    """Dense int codes identifying each row's group within one table —
    works for any key type via per-column factorization."""
    codes_list = []
    for name in by:
        c = tbl.column(name)
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        enc = pc.dictionary_encode(c)
        # null keys -> their own group code (-1), matching groupby
        idx = pc.fill_null(enc.indices.cast(pa.int64()), -1)
        codes_list.append(idx.to_numpy(zero_copy_only=False))
    if len(codes_list) == 1:
        return codes_list[0]
    _, inv = np.unique(np.stack(codes_list, axis=1), axis=0,
                       return_inverse=True)
    return inv.astype(np.int64)


def _order_rank(tbl: pa.Table, col: str, descending: bool) -> np.ndarray:
    """Sortable int64 rank of a column (descending via negated rank) —
    generic over strings/floats/ints, NaN-free."""
    c = tbl.column(col)
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    v = c.to_numpy(zero_copy_only=False)
    _, inv = np.unique(v, return_inverse=True)
    r = inv.astype(np.int64)
    return -r if descending else r


def _topn_block(tbl: pa.Table, by: list[str], order_col: str, n: int,
                descending: bool, tiebreak: str | None) -> pa.Table:
    """Vectorized top-n per group over ALL groups in one table: one
    lexsort + run detection, no per-group Python."""
    m = tbl.num_rows
    if m == 0:
        return tbl
    codes = _group_codes(tbl, by)
    keys = [_order_rank(tbl, order_col, descending), codes]
    if tiebreak is not None:
        keys.insert(0, _order_rank(tbl, tiebreak, False))
    order = np.lexsort(keys)          # last key primary: group, then rank
    cs = codes[order]
    run_start = np.zeros(m, dtype=bool)
    run_start[0] = True
    run_start[1:] = cs[1:] != cs[:-1]
    # position within the run = index - index-of-run-start
    starts = np.flatnonzero(run_start)
    pos = np.arange(m, dtype=np.int64) - np.repeat(
        starts, np.diff(np.append(starts, m)))
    keep = order[pos < n]
    return tbl.take(pa.array(np.ascontiguousarray(keep)))


def top_n_per_group(ds, by, order_col: str, n: int,
                    descending: bool = False, tiebreak: str | None = None):
    """First n rows of each group under a total order — the
    stratified-sample / per-key-top-k shape (SQL ROW_NUMBER() OVER
    (PARTITION BY by ORDER BY order_col[, tiebreak]) <= n).

    Physical plan (combiner form, no per-group UDF): a vectorized
    per-batch pre-reduce keeps at most n rows per group per batch —
    top-n is decomposable, so the global answer is inside the union of
    batch-local answers — then ONE sort of the PARTIALS (≤ n × groups
    × batches rows, not the dataset) on (by, order[, tiebreak]) and a
    vectorized per-block position filter: a row survives iff its global
    rank within its key is < n, where cross-block rank offsets come
    from a broadcast of per-block final-segment row counts
    (prefix-summed per key on the driver in block order — the same
    carry argument as ``asof_join``).  Exact when (order[, tiebreak])
    is unique per key; ties straddling a block boundary resolve per
    sort layout, as before.  Ties beyond ``tiebreak`` resolve
    deterministically per partition layout."""
    by = [by] if isinstance(by, str) else list(by)
    by_sort = _sort_by_ext(by)

    def partial(batch: pa.Table) -> pa.Table:
        return _add_key_flags(
            _topn_block(batch, by, order_col, n, descending, tiebreak),
            by)

    import ray
    desc = [False] * len(by_sort) + [descending] + \
        ([False] if tiebreak is not None else [])
    skeys = by_sort + [order_col] + \
        ([tiebreak] if tiebreak is not None else [])
    sp = ds.map_batches(partial, batch_format="pyarrow",
                        zero_copy_batch=True) \
        .sort(skeys, descending=desc).materialize()

    def _sig(batch: pa.Table, i: int):
        o = _ordv(batch.column(order_col))[i]
        tb = _ordv(batch.column(tiebreak))[i] if tiebreak is not None \
            else 0
        return o, tb

    def carry_of(batch: pa.Table) -> pa.Table:
        m = batch.num_rows
        none = batch.select(skeys).slice(0, 0) \
            .append_column("__cnt", pa.array([], pa.int64()))
        if m == 0:
            return none
        neq = _key_change(batch, by_sort, m)
        chg = np.flatnonzero(neq)
        ls = int(chg[-1]) + 1 if len(chg) else 0
        return batch.take(pa.array([ls])).select(skeys) \
            .append_column("__cnt", pa.array([m - ls], pa.int64()))

    cparts = ray.get(sp.map_batches(carry_of, batch_format="pyarrow",
                                    batch_size=None, zero_copy_batch=True)
                     .to_arrow_refs())
    cparts = [p for p in cparts if isinstance(p, pa.Table) and p.num_rows]
    if cparts:
        ct = pa.concat_tables(cparts, promote_options="permissive")
        cnt = ct.column("__cnt").to_numpy(zero_copy_only=False)
        # inclusive per-key prefix counts in block (= sort) order
        # (to_pylist for None-safe key tuples — see running_aggregate)
        kt = ct.select(by_sort)
        keys = list(zip(*[kt.column(nm).to_pylist() for nm in by_sort]))
        acc: dict = {}
        pref = np.empty(len(cnt), dtype=np.int64)
        for i, k in enumerate(keys):
            acc[k] = acc.get(k, 0) + int(cnt[i])
            pref[i] = acc[k]
        o = _ordv(ct.column(order_col))
        tb = _ordv(ct.column(tiebreak)) if tiebreak is not None else \
            np.zeros(len(cnt), dtype=np.int64)
        carry = {"keys": kt, "o": o, "tb": tb, "pref": pref}
    else:
        carry = None
    carry_ref = ray.put(carry)

    def keep_topn(batch: pa.Table) -> pa.Table:
        m = batch.num_rows
        if m == 0:
            return _restore_null_keys(batch, by)
        neq = _key_change(batch, by_sort, m)
        starts = np.concatenate([[0], np.flatnonzero(neq) + 1])
        seg_of = np.cumsum(np.concatenate([[0], neq]))
        pos = np.arange(m, dtype=np.int64) - starts[seg_of]
        cy = ray.get(carry_ref)
        if cy is not None:
            cmask = np.ones(len(cy["pref"]), dtype=bool)
            for nm in by_sort:
                kc = batch.column(nm)
                if isinstance(kc, pa.ChunkedArray):
                    kc = kc.combine_chunks()
                kv = kc[0]
                cc = cy["keys"].column(nm)
                if isinstance(cc, pa.ChunkedArray):
                    cc = cc.combine_chunks()
                eq = cc.is_null() if not kv.is_valid else \
                    pc.fill_null(pc.equal(cc, kv), False)
                cmask &= eq.to_numpy(zero_copy_only=False).astype(bool)
            cidx = np.flatnonzero(cmask)
            if len(cidx):
                # rank offset for the FIRST segment = inclusive prefix
                # count of the latest carry sorting strictly before this
                # block's first row.  Earlier blocks' carries sort
                # strictly before it (their rows all precede ours); this
                # block's own and later blocks' carries sort at-or-after
                # — so the strictly-before carries form a prefix of the
                # block-ordered carry list, countable with elementwise
                # comparisons (generic over types and sort direction).
                my_o, my_tb = _sig(batch, 0)
                co, ctb = cy["o"][cidx], cy["tb"][cidx]
                o_before = (co > my_o) if descending else (co < my_o)
                before = o_before | ((co == my_o) & (ctb < my_tb))
                j = int(before.sum())
                if j > 0:
                    first = seg_of == 0
                    pos = pos.copy()
                    pos[first] += int(cy["pref"][cidx[j - 1]])
        keep = pos < n
        return _restore_null_keys(batch.filter(pa.array(keep)), by)

    return sp.map_batches(keep_topn, batch_format="pyarrow",
                          batch_size=None, zero_copy_batch=True)


def sessionize(ds, by, on: str, gap: int, out_col: str = "n_sessions"):
    """Per-key session count: a new session starts whenever the time
    between consecutive events of the key (ordered by ``on``) exceeds
    ``gap`` (same units as ``on``; timestamp columns are normalized to
    epoch MICROSECONDS regardless of their storage precision, so gap is
    always in µs for them).

    Physical plan (no per-group UDF over the events): one global sort
    on (by, on) → one vectorized ``map_batches`` emitting per-key-run
    partials (first/last ``on``, within-run gap count) — sorted block
    boundaries cut each key's ordered sequence into time-contiguous
    runs — then a tiny per-key merge over ≤ runs-per-key rows adds the
    boundary gaps.  The events cross the cluster once (the sort); the
    merge input is O(keys + blocks), so the slow per-group path only
    ever sees partials."""
    by_one = by if isinstance(by, str) else None
    if by_one is None:
        raise ValueError("sessionize: single key column required")
    gap = np.int64(gap)

    def _t64(col):
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_timestamp(col.type):
            col = col.cast(pa.timestamp("us", tz=col.type.tz))
        if pa.types.is_temporal(col.type):
            return col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        return col.to_numpy(zero_copy_only=False).astype(np.int64)

    kf = _flag_names([by_one])[0]

    def partial(batch: pa.Table) -> pa.Table:
        m = batch.num_rows
        k = batch.column(by_one)
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        if m == 0:
            return pa.table({by_one: k.slice(0, 0),
                             kf: pa.array([], pa.int8()),
                             "__first": pa.array([], pa.int64()),
                             "__last": pa.array([], pa.int64()),
                             "__gaps": pa.array([], pa.int64())})
        t = _t64(batch.column(on))
        neq = _key_change(batch, [kf, by_one], m)
        starts = np.concatenate([[0], np.flatnonzero(neq) + 1])
        ends = np.concatenate([starts[1:], [m]])          # exclusive
        gap_flags = np.zeros(max(m - 1, 0), dtype=np.int64)
        if m > 1:
            gap_flags[(t[1:] - t[:-1] > gap) & ~neq] = 1
        cs = np.concatenate([[0], np.cumsum(gap_flags)])
        gaps = cs[ends - 1] - cs[starts]
        f = batch.column(kf)
        if isinstance(f, pa.ChunkedArray):
            f = f.combine_chunks()
        return pa.table({
            by_one: k.take(pa.array(starts)),
            kf: f.take(pa.array(starts)),
            "__first": pa.array(t[starts]),
            "__last": pa.array(t[ends - 1]),
            "__gaps": pa.array(gaps)})

    # Merge WITHOUT a per-key UDF: sort the partials (O(keys + blocks)
    # rows), add each run's boundary-with-previous-run flag vectorized
    # (in-block pairs directly; each block's first run resolves against
    # a broadcast of per-block last-run carries, as in asof_join), then
    # one native hash aggregate sums gaps+boundaries per key and a map
    # adds the final +1.  Scales to any number of keys — the only
    # per-key state is inside Ray's vectorized aggregate.
    import ray

    parts = ds.map_batches(lambda b: _add_key_flags(b, [by_one]),
                           batch_format="pyarrow",
                           zero_copy_batch=True) \
        .sort([kf, by_one, on]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    sp = parts.sort([kf, by_one, "__first", "__last"]).materialize()

    def carry_of(batch: pa.Table) -> pa.Table:
        m = batch.num_rows
        if m == 0:
            return batch.select([kf, by_one, "__first", "__last"])
        return batch.take(pa.array([m - 1])) \
            .select([kf, by_one, "__first", "__last"])

    cparts = ray.get(sp.map_batches(carry_of, batch_format="pyarrow",
                                    batch_size=None, zero_copy_batch=True)
                     .to_arrow_refs())
    cparts = [p for p in cparts if isinstance(p, pa.Table) and p.num_rows]
    if cparts:
        ct = pa.concat_tables(cparts, promote_options="permissive")
        carry = {"keys": ct.select([kf, by_one]),
                 "f": ct.column("__first").to_numpy(zero_copy_only=False),
                 "l": ct.column("__last").to_numpy(zero_copy_only=False)}
    else:
        carry = None
    carry_ref = ray.put(carry)

    def contrib(batch: pa.Table) -> pa.Table:
        m = batch.num_rows
        if m == 0:
            return pa.table({by_one: batch.column(by_one),
                             kf: batch.column(kf),
                             "__c": pa.array([], pa.int64())})
        f = batch.column("__first").to_numpy(zero_copy_only=False)
        last = batch.column("__last").to_numpy(zero_copy_only=False)
        gp = batch.column("__gaps").to_numpy(zero_copy_only=False)
        neq = _key_change(batch, [kf, by_one], m)
        c = gp.astype(np.int64, copy=True)
        if m > 1:
            c[1:] += ((f[1:] - last[:-1] > gap) & ~neq).astype(np.int64)
        cy = ray.get(carry_ref)
        if cy is not None:
            cmask = np.ones(len(cy["f"]), dtype=bool)
            for nm in (kf, by_one):
                kc = batch.column(nm)
                if isinstance(kc, pa.ChunkedArray):
                    kc = kc.combine_chunks()
                kv = kc[0]
                cc = cy["keys"].column(nm)
                if isinstance(cc, pa.ChunkedArray):
                    cc = cc.combine_chunks()
                eq = cc.is_null() if not kv.is_valid else \
                    pc.fill_null(pc.equal(cc, kv), False)
                cmask &= eq.to_numpy(zero_copy_only=False).astype(bool)
            cidx = np.flatnonzero(cmask)
            if len(cidx):
                cf, cl = cy["f"][cidx], cy["l"][cidx]
                a = np.searchsorted(cf, f[0], side="left")
                b = np.searchsorted(cf, f[0], side="right")
                j = a + np.searchsorted(cl[a:b], last[0], side="left")
                if j > 0:
                    c[0] += int(f[0] - cl[j - 1] > gap)
        return pa.table({by_one: batch.column(by_one),
                         kf: batch.column(kf),
                         "__c": pa.array(c)})

    from ray.data.aggregate import Sum
    agg = sp.map_batches(contrib, batch_format="pyarrow",
                         batch_size=None, zero_copy_batch=True) \
        .groupby([kf, by_one]).aggregate(Sum("__c", alias_name=out_col))

    def plus_one(batch: pa.Table) -> pa.Table:
        out = batch.set_column(
            batch.schema.get_field_index(out_col), out_col,
            pc.add(batch.column(out_col).cast(pa.int64()), 1))
        return _restore_null_keys(out, [by_one])

    return agg.map_batches(plus_one, batch_format="pyarrow")


def interval_count_join(left, right, by, on: str, gap: int,
                        left_id: str, out_col: str = "n_in_range",
                        num_partitions: int = 8):
    """Range join, count form: for every left row, the number of right
    rows with the same ``by`` key and |right.on - left.on| <= gap
    (gap in the physical units of ``on``; temporal columns compare as
    epoch int64).

    Physical plan (the banding trick that keeps a range join out of
    O(n*m) territory): bucket ``on`` into gap-sized bins, replicate the
    RIGHT side into bins b-1/b/b+1, equi-join on (by, bin) — any pair
    within gap must land in adjacent bins — then filter the exact
    distance and count per left row.  Left-outer completion keeps
    zero-match rows at 0."""
    by = [by] if isinstance(by, str) else list(by)
    gap_u = np.int64(gap)

    def _ts64(col):
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_temporal(col.type):
            return col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        return col.to_numpy(zero_copy_only=False).astype(np.int64)

    def bin_left(batch: pa.Table) -> pa.Table:
        t = _ts64(batch.column(on))
        cols = {k: batch.column(k) for k in by}
        cols[left_id] = batch.column(left_id)
        cols["__t"] = t
        cols["__bin"] = t // gap_u
        return pa.table(cols)

    def bin_right(batch: pa.Table) -> pa.Table:
        t = _ts64(batch.column(on))
        n = len(t)
        cols = {}
        for k in by:
            c = batch.column(k)
            if isinstance(c, pa.ChunkedArray):
                c = c.combine_chunks()
            cols[k] = c.take(pa.array(np.repeat(
                np.arange(n, dtype=np.int64), 3)))
        base_bin = t // gap_u
        cols["__bin"] = (np.repeat(base_bin, 3)
                         + np.tile(np.array([-1, 0, 1], np.int64), n))
        cols["__rt"] = np.repeat(t, 3)
        return pa.table(cols)

    from .join import shuffle_join
    lb = left.map_batches(bin_left, batch_format="pyarrow",
                          zero_copy_batch=True)
    rb = right.map_batches(bin_right, batch_format="pyarrow",
                           zero_copy_batch=True)
    joined = shuffle_join(lb, rb, on=tuple(by) + ("__bin",),
                          num_partitions=num_partitions)

    def exact(batch: pa.Table) -> pa.Table:
        dt = np.abs(batch.column("__t").to_numpy(zero_copy_only=False)
                    - batch.column("__rt").to_numpy(zero_copy_only=False))
        return pa.table({left_id: batch.column(left_id)}) \
            .filter(pa.array(dt <= gap_u))

    from ray.data.aggregate import Count
    counts = joined.map_batches(exact, batch_format="pyarrow") \
        .groupby(left_id).aggregate(Count(alias_name=out_col))
    # Ray's hash-shuffle aggregate emits ZERO-COLUMN blocks for empty
    # output partitions (observed ray 2.49 at small inputs: 13 of 16
    # blocks had no schema at all); feeding such a block into a join
    # side makes Acero's FieldRef resolution fail with "no match or
    # multiple matches".  map_batches can't scrub them (a zero-row
    # block yields no batches, so a normalizing UDF never fires) —
    # a row-based repartition rebuilds blocks from row ranges and
    # drops the schema-less empties.  O(counts) extra exchange, which
    # the join was about to pay anyway.
    counts = counts.repartition(num_partitions)
    # left-outer completion: rows with zero matches keep 0
    from .join import shuffle_aggregator_args
    out = left.join(counts, join_type="left_outer",
                    num_partitions=num_partitions,
                    on=(left_id,),
                    aggregator_ray_remote_args=shuffle_aggregator_args(
                        num_partitions))

    def fill0(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2
        c = pc2.fill_null(batch.column(out_col), 0)
        return batch.set_column(batch.column_names.index(out_col),
                                out_col, c)
    return out.map_batches(fill0, batch_format="pyarrow")


def global_top_k(ds, sort_cols, ascending, k: int):
    """Global top-k rows under a lexicographic order, combiner form.

    Top-k is decomposable: the global answer is contained in the union
    of block-local answers, so each batch keeps only its local top-k
    (zero-copy Arrow ``sort_by`` + slice inside ``map_batches``) and
    the driver merges O(k x batches) partial rows — never the full
    dataset.  Replaces the full-aggregate ``.to_pandas()`` pattern that
    is unbounded in #distinct keys at web scale (VERDICT r3 items 1-2).

    Returns a pandas DataFrame of exactly ``min(k, total_rows)`` rows,
    sorted by ``sort_cols`` / ``ascending``.
    """
    sort_cols = list(sort_cols)
    ascending = list(ascending)
    order = [(c, "ascending" if a else "descending")
             for c, a in zip(sort_cols, ascending)]

    def partial(batch: pa.Table) -> pa.Table:
        return batch.sort_by(order).slice(0, k)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    if len(parts) == 0 and not set(sort_cols) <= set(parts.columns):
        # Ray's to_pandas drops columns on all-empty datasets
        import pandas as pd
        return pd.DataFrame({c: [] for c in sort_cols})
    return parts.sort_values(sort_cols, ascending=ascending,
                             kind="mergesort").head(k) \
        .reset_index(drop=True)


def hopping_window_aggregate(ds: "rd.Dataset", ts_col: str, *,
                             size_s: int, hop_s: int, aggs: dict,
                             by=None, win_col: str = "win_start_s"):
    """Hopping (sliding) window aggregate: every event joins ALL the
    ``size_s``-second windows that contain it, windows starting every
    ``hop_s`` seconds (``size_s % hop_s == 0``; ``size_s == hop_s``
    degrades to the tumbling case).  The streaming-analytics shape
    (overlapping dashboards, trailing-window rates) the reference never
    needed but an events pipeline does.

    Fan-out is VIRTUAL: each batch derives its events' m = size/hop
    window starts vectorized (np.repeat/np.tile — no per-row Python)
    and immediately pre-aggregates per (window[, by]) INSIDE the
    batch, so the one distributed groupby shuffles
    O(windows x groups x batches) partial rows, never the
    m-times-replicated events.  At 100 TB with hour windows the
    shuffle input is a few thousand rows per task regardless of event
    count.

    ``aggs`` maps output name → ``("count",)`` or
    ``("sum"|"min"|"max", col)``.  Rows with a null timestamp belong
    to no window and drop (SQL: a null epoch groups into a null
    window — filter upstream if those rows matter).  Window starts
    emit as int64 epoch seconds in ``win_col``."""
    import numpy as np
    from ray.data.aggregate import Max, Min, Sum

    if size_s <= 0 or hop_s <= 0 or size_s % hop_s:
        raise ValueError(
            f"size_s ({size_s}) must be a positive multiple of "
            f"hop_s ({hop_s})")
    m = size_s // hop_s
    by = [by] if isinstance(by, str) else list(by or [])
    for out, spec in aggs.items():
        if spec[0] not in ("count", "sum", "min", "max"):
            raise ValueError(f"unsupported aggregate {spec[0]!r}")
        if spec[0] != "count" and len(spec) != 2:
            raise ValueError(f"{out}: {spec[0]} needs a column")
    val_cols = sorted({s[1] for s in aggs.values() if len(s) > 1})

    # deduped pyarrow partial specs + the source column of each output
    specs, src = [], {}
    for out, spec in aggs.items():
        if spec[0] == "count":
            s, name = ([], "count_all"), "count_all"
        else:
            fn, col = spec
            s, name = (col, fn), f"{col}_{fn}"
        if s not in specs:
            specs.append(s)
        src[out] = name

    keys = [win_col] + by

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        ts = batch.column(ts_col)
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        if ts.null_count:
            keep = pc.is_valid(ts)
            batch = batch.filter(keep)
            ts = batch.column(ts_col)
            if isinstance(ts, pa.ChunkedArray):
                ts = ts.combine_chunks()
        n = len(ts)
        if n == 0:
            return pa.table(
                {win_col: pa.array([], pa.int64()),
                 **{c: pa.array([], batch.schema.field(c).type)
                    for c in by},
                 **{f"__p__{out}": pa.array(
                     [], pa.int64() if aggs[out][0] == "count"
                     else batch.schema.field(aggs[out][1]).type)
                    for out in aggs}})
        sec = ts.cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False) // 1_000_000
        base = sec // hop_s * hop_s
        # m window starts per event: base, base-hop, ..., base-(m-1)hop
        starts = np.repeat(base, m) - np.tile(
            np.arange(m, dtype=np.int64) * hop_s, n)
        row_idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), m))
        cols = {win_col: pa.array(starts)}
        for c in by:
            col = batch.column(c)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            cols[c] = col.take(row_idx)
        for c in val_cols:
            col = batch.column(c)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            cols[c] = col.take(row_idx)
        part = pa.table(cols).group_by(keys).aggregate(specs)
        out_cols = {k: part.column(k) for k in keys}
        for out, name in src.items():
            out_cols[f"__p__{out}"] = part.column(name)
        return pa.table(out_cols)

    merge = {"count": Sum, "sum": Sum, "min": Min, "max": Max}
    ray_aggs = [merge[spec[0]](on=f"__p__{out}", alias_name=out)
                for out, spec in aggs.items()]
    return ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby(keys).aggregate(*ray_aggs) \
        .select_columns([*keys, *aggs.keys()])


def stratified_sample(ds: "rd.Dataset", by, n: int, *,
                      seed: int = 13, key_cols: list[str] | None = None,
                      drop_key: bool = True):
    """Deterministic UNIFORM sample of exactly min(n, group size) rows
    PER GROUP — the class-balanced subset every training-data pipeline
    needs (a global Bernoulli sample starves rare groups).

    Bottom-n hashing: every row gets a pseudo-random 64-bit key
    (splitmix64 over the row's content-hash ⊕ seed); the n smallest
    keys per group are a uniform without-replacement sample, and
    top-n-per-group's combiner plan computes them without any
    per-group UDF — each batch forwards ≤ n rows per group, one sort
    of partials, vectorized rank filter.  Reproducible across runs,
    cluster sizes and input order (the key depends only on row CONTENT
    and seed).  ``key_cols`` limits the content hash to a stable id
    subset (rows differing elsewhere still sample consistently)."""
    import numpy as np
    from ..functions.text import _splitmix64
    from .content_hash import batch_row_hashes

    def add_key(batch: pa.Table) -> pa.Table:
        sub = batch.select(key_cols) if key_cols else batch
        h = batch_row_hashes(sub)
        key = _splitmix64(h ^ np.uint64(seed * 0x9E3779B97F4A7C15
                                        % (1 << 64)))
        return batch.append_column("__sk", pa.array(key.view(np.int64)))

    keyed = ds.map_batches(add_key, batch_format="pyarrow",
                           zero_copy_batch=True)
    out = top_n_per_group(keyed, by, "__sk", n, descending=False)
    if drop_key:
        out = out.map_batches(
            lambda b: b.drop_columns(["__sk"]),
            batch_format="pyarrow", zero_copy_batch=True)
    return out


def lag_column(ds: "rd.Dataset", by, on: str, col: str, n: int = 1, *,
               out_col: str | None = None, tiebreak: str | None = None,
               lead: bool = False):
    """SQL LAG/LEAD(col, n) OVER (PARTITION BY by ORDER BY on
    [, tiebreak]) — by composition of two exact primitives:

    1. per-key rank = ``running_aggregate(count)`` (ONE global sort,
       C-speed per-block prefix, broadcast carries);
    2. an equi-join of the ranked stream with its own (key, rank ∓ n)
       projection (Ray's native hash join) — row r picks up the value
       of the row n positions before (after, for ``lead=True``) it in
       its partition, NULL where none exists.

    Two exchanges total (the sort and the join), no per-key UDF, and
    every step is an already-tested operator.  (on[, tiebreak]) should
    be unique per key — the same determinism caveat as
    running_aggregate."""
    from .join import shuffle_join
    by = [by] if isinstance(by, str) else list(by)
    out_col = out_col or (f"lead_{col}" if lead else f"lag_{col}")
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    ranked = running_aggregate(ds, by, on, col=on, agg="count",
                               out_col="__rank", tiebreak=tiebreak)

    def shifted(batch: pa.Table) -> pa.Table:
        r = batch.column("__rank")
        if isinstance(r, pa.ChunkedArray):
            r = r.combine_chunks()
        rv = r.to_numpy(zero_copy_only=False).astype(np.int64)
        tgt = rv + n if not lead else rv - n
        cols = {nm: batch.column(nm) for nm in by}
        cols["__rank"] = pa.array(tgt)
        cols[out_col] = batch.column(col)
        return pa.table(cols)

    proj = ranked.map_batches(shifted, batch_format="pyarrow",
                              zero_copy_batch=True)
    joined = shuffle_join(ranked, proj, on=by + ["__rank"],
                          join_type="left_outer")
    return joined.drop_columns(["__rank"])

"""Skew handling: oversized-row chunking and size-balanced batching.

Ray Data's block splitter cannot split a single giant row (SURVEY.md §4):
a multi-MB ``html`` cell makes its batch arbitrarily large.  The explicit
fix is row segmentation BEFORE encode: split any string/binary cell
larger than ``max_cell_bytes`` into ``(row, seg_no)`` segments, process
segments as ordinary rows, and reassemble exactly on decode.

``chunk_rows`` / ``reassemble_rows`` are inverse map_batches stages:
    chunked  = ds.map_batches(RowChunker("html", max_cell_bytes=1<<20))
    restored = chunked_ds.groupby("__row_id").map_groups(...)  # or
               reassemble within partition when order is preserved.

The segment id columns (``__row_id``, ``__seg_no``, ``__n_segs``) ride
along as ordinary columns; reassembly needs all segments of a row in one
group — guaranteed within a partition because chunking never crosses
partitions (documented partitioning assumption).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..codecs.fsst import _is_stringy, buffer_view


def chunk_rows(batch: pa.Table, column: str, max_cell_bytes: int,
               row_id_base: str = "") -> pa.Table:
    """Split rows whose `column` cell exceeds max_cell_bytes into
    multiple segment rows.  Other columns are repeated on each segment.
    Adds __row_id (stable within batch), __seg_no, __n_segs."""
    col = batch.column(column)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not _is_stringy(col.type):
        raise TypeError(f"cannot chunk non-binary column {column}")
    import pyarrow.compute as pc
    filled = col
    if col.null_count:
        fill = (b"" if pa.types.is_binary(col.type)
                or pa.types.is_large_binary(col.type) else "")
        filled = pc.fill_null(col, fill)
    d, offs = buffer_view(filled)
    lens = np.diff(offs)
    n_segs = np.maximum(-(-lens // max_cell_bytes), 1).astype(np.int64)
    total_segs = int(n_segs.sum())
    # segment boundaries: row i split at offs[i] + j*max_cell_bytes
    row_of_seg = np.repeat(np.arange(len(lens), dtype=np.int64), n_segs)
    seg_no = np.arange(total_segs, dtype=np.int64) - \
        np.repeat(np.cumsum(n_segs) - n_segs, n_segs)
    seg_start = offs[:-1][row_of_seg] + seg_no * max_cell_bytes
    seg_end = np.minimum(seg_start + max_cell_bytes, offs[1:][row_of_seg])
    # data buffer is unchanged — only offsets change — when each row's
    # segments are contiguous (they are); so the segment column reuses d
    large = (pa.types.is_large_string(col.type)
             or pa.types.is_large_binary(col.type))
    off_np = np.concatenate([seg_start, seg_end[-1:]]) \
        if total_segs else np.zeros(1, dtype=np.int64)
    # offsets must be monotone; segments are in order and contiguous per
    # row, and rows are in order → seg_start is monotone with
    # seg_end[k] == seg_start[k+1] within a row; across rows
    # seg_start[k+1] == offs of next row == seg_end[k].  So valid.
    off_arr = off_np.astype(np.int64 if large else np.int32)
    seg_col = pa.Array.from_buffers(
        col.type, total_segs,
        [None, pa.py_buffer(off_arr.tobytes()),
         pa.py_buffer(d.tobytes())])
    take = pa.array(row_of_seg)
    cols = {}
    for name in batch.column_names:
        if name == column:
            cols[name] = seg_col
        else:
            c = batch.column(name)
            if isinstance(c, pa.ChunkedArray):
                c = c.combine_chunks()
            cols[name] = c.take(take)
    cols["__row_id"] = pa.array(
        [f"{row_id_base}{i}" for i in row_of_seg], type=pa.string())
    cols["__seg_no"] = pa.array(seg_no)
    cols["__n_segs"] = pa.array(n_segs[row_of_seg])
    # preserve null vs empty: fill_null above erased the distinction,
    # so carry the original validity for exact reassembly
    if col.null_count:
        was_null = ~col.is_valid().to_numpy(zero_copy_only=False)
        cols["__was_null"] = pa.array(was_null[row_of_seg])
    else:
        cols["__was_null"] = pa.array(
            np.zeros(total_segs, dtype=bool))
    return pa.table(cols)


def reassemble_rows(batch: pa.Table, column: str) -> pa.Table:
    """Inverse of chunk_rows: concatenates segments back into whole rows.
    Requires all segments of each row present (same partition) —
    segments may arrive in any order; sorted by (__row_id, __seg_no)."""
    import pyarrow.compute as pc
    idx = pc.sort_indices(batch, sort_keys=[("__row_id", "ascending"),
                                            ("__seg_no", "ascending")])
    t = batch.take(idx)
    col = t.column(column)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    d, offs = buffer_view(col)
    n_segs = t.column("__n_segs").to_numpy(zero_copy_only=False)
    seg_no = t.column("__seg_no").to_numpy(zero_copy_only=False)
    first = seg_no == 0
    firsts = np.flatnonzero(first)
    n_rows = len(firsts)
    counts = n_segs[firsts]
    # completeness check: a repartition that split a row's segments
    # across partitions would silently merge/truncate cells otherwise
    seg_lens = np.diff(offs)
    row_ids = np.cumsum(first) - 1
    if len(t) and (row_ids[0] < 0 or not np.array_equal(
            np.bincount(row_ids[row_ids >= 0], minlength=n_rows),
            counts)):
        raise ValueError(
            "reassemble_rows: missing segments — all segments of a row "
            "must be in one partition (documented assumption)")
    row_lens = np.bincount(row_ids, weights=seg_lens,
                           minlength=n_rows).astype(np.int64)
    new_offs = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(row_lens, out=new_offs[1:])
    large = (pa.types.is_large_string(col.type)
             or pa.types.is_large_binary(col.type))
    off_arr = new_offs.astype(np.int64 if large else np.int32)
    joined = pa.Array.from_buffers(
        col.type, n_rows,
        [None, pa.py_buffer(off_arr.tobytes()), pa.py_buffer(d.tobytes())])
    if "__was_null" in t.column_names:  # restore null vs empty exactly
        wn = t.column("__was_null").to_numpy(zero_copy_only=False)[firsts]
        if wn.any():
            validity = np.packbits(~wn, bitorder="little")
            joined = pa.Array.from_buffers(
                col.type, n_rows,
                [pa.py_buffer(validity.tobytes()),
                 pa.py_buffer(off_arr.tobytes()),
                 pa.py_buffer(d.tobytes())],
                null_count=int(wn.sum()))
    take = pa.array(firsts)
    cols = {}
    for name in t.column_names:
        if name in ("__row_id", "__seg_no", "__n_segs", "__was_null"):
            continue
        if name == column:
            cols[name] = joined
        else:
            c = t.column(name)
            if isinstance(c, pa.ChunkedArray):
                c = c.combine_chunks()
            cols[name] = c.take(take)
    return pa.table(cols)


class RowChunker:
    """map_batches stage wrapping chunk_rows with a per-batch-unique
    row-id base (content hash) so ids never collide across batches."""

    def __init__(self, column: str, max_cell_bytes: int = 1 << 20):
        self.column = column
        self.max_cell_bytes = max_cell_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.encode import content_part_id
        base = content_part_id(batch) + ":"
        return chunk_rows(batch, self.column, self.max_cell_bytes, base)


# ---------------------------------------------------------------------------
# Hot-key salting for skewed aggregations
# ---------------------------------------------------------------------------

_SALT_COL = "__salt"


def salted_aggregate(ds, key, aggs: list[tuple[str, str, str]],
                     n_salt: int = 16):
    """Two-round aggregation for skewed keys: ``groupby(key)`` sends
    EVERY row of a hot key to one reducer; salting splits each key into
    ``n_salt`` subkeys (round 1: ``groupby(key, salt)`` partials, load
    spread across reducers), then merges the tiny partials (round 2:
    ``groupby(key)``, at most n_salt rows per key).

    aggs: list of (in_col, op, out_col) with op in sum/count/min/max —
    the decomposable aggregates (count re-aggregates as sum).
    The salt is derived from row position (cheap, uniform); correctness
    never depends on its distribution."""
    from ray.data.aggregate import Count, Max, Min, Sum
    key = [key] if isinstance(key, str) else list(key)
    _OPS = {"sum": Sum, "min": Min, "max": Max}

    def add_salt(batch: pa.Table) -> pa.Table:
        salt = np.arange(batch.num_rows, dtype=np.int64) % n_salt
        return batch.append_column(_SALT_COL, pa.array(salt))

    round1 = [(Count(alias_name=out) if op == "count"
               else _OPS[op](col, alias_name=out))
              for col, op, out in aggs]
    partial = ds.map_batches(add_salt, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .groupby(key + [_SALT_COL]).aggregate(*round1)
    # merge partials: count partials re-aggregate as sums, min/max as
    # themselves
    round2 = [(Sum(out, alias_name=out) if op in ("count", "sum")
               else _OPS[op](out, alias_name=out))
              for _, op, out in aggs]
    merged = partial.groupby(key).aggregate(*round2)
    return merged.drop_columns([_SALT_COL]) \
        if _SALT_COL in merged.schema().names else merged


def pivot_count(ds, index, cat_col: str, categories: list[str],
                out_prefix: str = ""):
    """Pivot a categorical column into per-category COUNT columns:
    one vectorized map_batches derives 0/1 indicator columns (known
    category list — at 100 TB the category set must be bounded/known,
    exactly like a SQL CASE pivot), then one groupby(index) Sum.
    No extra shuffle beyond the final aggregate."""
    from ray.data.aggregate import Sum
    index = [index] if isinstance(index, str) else list(index)
    outs = [f"{out_prefix}{c}" for c in categories]

    def indicators(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        cols = {k: batch.column(k) for k in index}
        cat = batch.column(cat_col)
        for c, out in zip(categories, outs):
            cols[out] = pc.cast(pc.equal(cat, c), pa.int64()) \
                .fill_null(0)
        return pa.table(cols)

    return ds.map_batches(indicators, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby(index).aggregate(
            *[Sum(out, alias_name=out) for out in outs])

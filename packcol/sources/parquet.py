"""Parquet source helpers.

``read_parquet_clean`` reads with an explicit metadata-free schema:
pyarrow Schemas carrying metadata (e.g. the pandas block written by the
data generator) are UNHASHABLE (``hash(schema)`` raises ``unhashable
type: 'dict'``), and Ray Data hashes schemas for deduplication both
inside the ReadParquet task (fragment concat) and in every shuffle
(``transform_pyarrow.unify_schemas``) — spamming "Failed to hash the
schemas" warnings over such data.  Passing the stripped schema to the
reader kills the warning at the source and costs nothing.
"""

from __future__ import annotations

import os

import pyarrow as pa


def strip_schema_metadata(batch: pa.Table) -> pa.Table:
    """Zero-copy schema-metadata strip (map_batches fallback for
    datasets not born from read_parquet_clean)."""
    if batch.schema.metadata is None:
        return batch
    return batch.replace_schema_metadata(None)


def _file_list(paths) -> list[str]:
    out = []
    for p in paths if isinstance(paths, (list, tuple)) else [paths]:
        if os.path.isdir(p):
            out.extend(os.path.join(p, f) for f in sorted(os.listdir(p))
                       if f.endswith(".parquet"))
        else:
            out.append(p)
    return out


def _clean_schema(paths, columns) -> pa.Schema | None:
    import pyarrow.parquet as pq
    try:
        files = _file_list(paths)
        if not files:
            return None
        sch = pq.read_schema(files[0]).remove_metadata()
        if columns is not None:
            sch = pa.schema([sch.field(c) for c in columns])
        return sch
    except (OSError, KeyError, pa.ArrowInvalid):
        return None


_BLOCK_TARGET_BYTES = 16 << 20   # scale path: ~16 MB read blocks
_MIN_ROWS_PER_BLOCK = 3000       # overhead floor: never sub-3k-row blocks


def _auto_num_blocks(paths) -> int | None:
    """Size-aware read parallelism.  Ray's default splits a file into
    ~2×CPU blocks regardless of size; on small single-row-group files
    every task re-decodes the whole row group, so a 2 MB read costs
    64 × (open + full decode) ≈ seconds.  Target instead:
    ``min(ceil(rows/3k), max(ceil(bytes/16MB), cluster_cpus))`` — full
    CPU fan-out whenever the row count supports it, blocks ≥3k rows,
    and ~16 MB blocks once bytes dominate."""
    import math
    try:
        import pyarrow.parquet as pq
        files = _file_list(paths)
        if not files:
            return None
        rows = bytes_ = 0
        for f in files:
            rows += pq.ParquetFile(f).metadata.num_rows
            bytes_ += os.path.getsize(f)
        try:
            import ray
            ncpu = int(ray.cluster_resources().get("CPU", 0)) or \
                (os.cpu_count() or 8)
        except Exception:
            ncpu = os.cpu_count() or 8
        nb = min(max(1, math.ceil(rows / _MIN_ROWS_PER_BLOCK)),
                 max(math.ceil(bytes_ / _BLOCK_TARGET_BYTES), ncpu))
        return max(1, nb)
    except (OSError, KeyError, pa.ArrowInvalid):
        return None


def read_parquet_clean(paths, *, columns=None, **kwargs):
    """``ray.data.read_parquet`` with a metadata-free explicit schema
    (see module docstring).  Accepts the same kwargs (``filter=``,
    etc.); falls back to a per-block strip stage when the schema can't
    be derived up front."""
    import ray.data as rd
    # NB with filter=: the scanner binds the predicate against the
    # provided schema, so every filter-referenced column must be in
    # `columns` (the scan reads them anyway to evaluate the predicate;
    # project them away afterwards)
    if "override_num_blocks" not in kwargs and "parallelism" not in kwargs:
        nb = _auto_num_blocks(paths)
        if nb is not None:
            kwargs["override_num_blocks"] = nb
    schema = _clean_schema(paths, columns)
    if schema is not None:
        return rd.read_parquet(paths, columns=columns, schema=schema,
                               **kwargs)
    ds = rd.read_parquet(paths, columns=columns, **kwargs)
    return ds.map_batches(strip_schema_metadata, batch_format="pyarrow",
                          zero_copy_batch=True)

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


def _clean_schema(paths, columns) -> pa.Schema | None:
    import pyarrow.parquet as pq
    p = paths[0] if isinstance(paths, (list, tuple)) else paths
    try:
        if os.path.isdir(p):
            files = sorted(f for f in os.listdir(p)
                           if f.endswith(".parquet"))
            if not files:
                return None
            p = os.path.join(p, files[0])
        sch = pq.read_schema(p).remove_metadata()
        if columns is not None:
            sch = pa.schema([sch.field(c) for c in columns])
        return sch
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
    schema = _clean_schema(paths, columns)
    if schema is not None:
        return rd.read_parquet(paths, columns=columns, schema=schema,
                               **kwargs)
    ds = rd.read_parquet(paths, columns=columns, **kwargs)
    return ds.map_batches(strip_schema_metadata, batch_format="pyarrow",
                          zero_copy_batch=True)

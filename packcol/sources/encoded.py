"""The packcol encoded store as a first-class Ray Data source.

:func:`read_encoded` makes a store directory written by
``pipelines.encode_pipeline.encode_files`` readable like a table format
rather than a sink: it returns a ``ray.data.Dataset`` of DECODED rows
with

* **lazy streaming decode** — one read task per part file, no shuffle,
  nothing materialized beyond the blocks in flight;
* **column projection at the encoded-block level** — unrequested
  columns' payloads are filtered out of the part file read and never
  decoded (``DecodePartFile``);
* **zone-map pruning** — with a predicate, whole parts whose lineage
  manifest proves no matching rows are dropped driver-side from tiny
  JSON, before any data read (``_surviving_parts``);
* **predicate pushdown into the encoded domain** — eq / range
  predicates evaluate on packed codes / FOR deltas / order-preserving
  dictionary codes (``codecs/access.py``) and only the matching rows of
  the projected columns decode.

This is the read half of the store contract the north rule's
encode → compact → decode-verify pipeline writes (the reference's
decode side: /root/reference/src/encoding/mod.rs:16-19 — every decoded
column bit-identical); the pruning metadata is the same per-partition
lineage manifest that makes encodes resumable.

Predicate syntax (kept deliberately tiny — the two shapes the encoded
domain can evaluate without decoding):

    read_encoded(store)                                   # full scan
    read_encoded(store, columns=["url", "lang"])          # projection
    read_encoded(store, columns=[...],
                 filter=("lang", "==", "de"))             # point
    read_encoded(store, columns=[...],
                 filter=("ts", "between", lo, hi))        # inclusive
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd


def _part_files(store_dir: str) -> list[str]:
    return [os.path.join(store_dir, f)
            for f in sorted(os.listdir(store_dir))
            if f.endswith(".parquet")]


def encoded_schema(store_dir: str) -> pa.Schema:
    """Logical schema of the decoded table, read from the stored
    per-block params (metadata-only columns of one or more part files;
    payloads are never touched)."""
    from ..codecs.base import str_to_type
    fields: dict[str, pa.DataType] = {}
    for path in _part_files(store_dir):
        meta = pq.read_table(path, columns=["column", "params"])
        for name, params in zip(meta.column("column").to_pylist(),
                                meta.column("params").to_pylist()):
            if name not in fields:
                dt = json.loads(params).get("dtype")
                if dt is not None:
                    fields[name] = str_to_type(dt)
        # a complete part names every column; heterogeneous stores
        # (mixed tables) keep scanning until no new names appear
        if meta.num_rows and len(fields) >= meta.num_rows:
            break
    return pa.schema(sorted(fields.items()))


def read_encoded(store_dir: str, *, columns: list[str] | None = None,
                 filter: tuple | None = None,
                 concurrency: int | None = None,
                 cpus_per_task: float = 1) -> "rd.Dataset":
    """Dataset of decoded rows from an encoded store — the generic
    source form of ``decode_files`` / ``filter_encoded*``.

    ``filter`` is ``(column, "==", value)`` or
    ``(column, "between", lo, hi)`` (inclusive).  The filter column
    need not be in ``columns``."""
    from ..pipelines.encode_pipeline import (decode_files, filter_encoded,
                                             filter_encoded_range)
    if filter is None:
        return decode_files(store_dir, columns=columns,
                            concurrency=concurrency,
                            cpus_per_task=cpus_per_task)
    out_columns = columns if columns is not None else \
        encoded_schema(store_dir).names
    if not out_columns:
        raise ValueError(f"no encoded parts found in {store_dir}")
    col, op, *vals = filter
    if op in ("==", "eq") and len(vals) == 1:
        return filter_encoded(store_dir, col, vals[0], list(out_columns))
    if op in ("between", "range") and len(vals) == 2:
        return filter_encoded_range(store_dir, col, vals[0], vals[1],
                                    list(out_columns))
    raise ValueError(
        f"unsupported filter {filter!r}: expected (col, '==', v) or "
        "(col, 'between', lo, hi)")


def read_encoded_blocks(store_dir: str) -> "rd.Dataset":
    """Raw encoded-block rows (part_id/column/codec/params/payload) —
    the physical view, for compaction / stats tooling."""
    return rd.read_parquet(_part_files(store_dir))

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
    read_encoded(store, columns=[...],
                 filter=("url", "in", [u1, u2]))          # IN-list
    read_encoded(store, columns=[...],
                 filter=[("lang", "==", "de"),
                         ("user_id", "between", 3, 9)])   # conjunction

Point predicates (eq / in) additionally prune via the per-part bloom
sidecars (state/bloom.py) — the path that makes a ``url == x`` lookup
on an arrival-ordered store O(matching parts), since url zones don't
exist (long-string columns are not zone-mapped).
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


def _norm_pred(f) -> tuple:
    """User predicate → normalized (col, op, lo, hi):
    ``(col, "==", v)`` → eq, ``(col, "between", lo, hi)`` → range,
    ``(col, "in", values)`` → in (lo = value tuple, hi = None)."""
    col, op, *vals = f
    if op in ("==", "eq") and len(vals) == 1:
        return (col, "eq", vals[0], vals[0])
    if op in ("between", "range") and len(vals) == 2:
        return (col, "range", vals[0], vals[1])
    if op == "in" and len(vals) == 1 and \
            isinstance(vals[0], (list, tuple, set, frozenset)):
        return (col, "in", tuple(vals[0]), None)
    raise ValueError(
        f"unsupported filter {f!r}: expected (col, '==', v), "
        "(col, 'between', lo, hi) or (col, 'in', [v, ...])")


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
                p = json.loads(params)
                dt = p.get("dtype")
                if dt is not None:
                    try:
                        fields[name] = str_to_type(dt)
                    except ValueError:  # pre-r4 store-codec blocks
                        pass
                elif p.get("dtype_ipc"):  # nested logical types
                    sch = pa.ipc.read_schema(pa.BufferReader(
                        bytes.fromhex(p["dtype_ipc"])))
                    fields[name] = sch.field(0).type
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

    ``filter`` is ``(column, "==", value)``,
    ``(column, "between", lo, hi)`` (inclusive) or
    ``(column, "in", [v, ...])``, or a LIST of those for a conjunction
    (every predicate must hold).  Filter columns need not be in
    ``columns``."""
    from ..pipelines.encode_pipeline import (decode_files, filter_encoded,
                                             filter_encoded_multi,
                                             filter_encoded_range)
    if filter is None:
        return decode_files(store_dir, columns=columns,
                            concurrency=concurrency,
                            cpus_per_task=cpus_per_task)
    out_columns = columns if columns is not None else \
        encoded_schema(store_dir).names
    if not out_columns:
        raise ValueError(f"no encoded parts found in {store_dir}")

    preds = [_norm_pred(f) for f in filter] if isinstance(filter, list) \
        else [_norm_pred(filter)]
    if len(preds) > 1 or preds[0][1] == "in":
        return filter_encoded_multi(store_dir, preds, list(out_columns))
    col, op, lo, hi = preds[0]
    if op == "eq":
        return filter_encoded(store_dir, col, lo, list(out_columns))
    return filter_encoded_range(store_dir, col, lo, hi,
                                list(out_columns))


def read_encoded_blocks(store_dir: str) -> "rd.Dataset":
    """Raw encoded-block rows (part_id/column/codec/params/payload) —
    the physical view, for compaction / stats tooling."""
    return rd.read_parquet(_part_files(store_dir))


def store_stats(store_dir: str) -> dict:
    """Metadata-only store summary from the per-partition lineage
    manifests — zero payload bytes read, O(parts) tiny JSON.  This is
    the 100 TB answer to "how big / what codecs / what ranges": the
    same manifests that make encodes resumable double as the store's
    statistics catalog (rows, logical/encoded bytes, per-column codec
    histogram, global zone spans)."""
    from ..state.manifest import Manifest
    mans = Manifest(store_dir).load_all()
    codec_hist: dict[str, dict[str, int]] = {}
    zones: dict[str, dict] = {}
    bloom_parts: dict[str, int] = {}
    rows = orig = enc = 0
    for m in mans:
        rows += m.get("rows", 0)
        orig += m.get("orig_bytes", 0)
        enc += m.get("enc_bytes", 0)
        for col, codec in m.get("codecs", {}).items():
            codec_hist.setdefault(col, {})
            codec_hist[col][codec] = codec_hist[col].get(codec, 0) + 1
        for col in m.get("blooms") or ():
            bloom_parts[col] = bloom_parts.get(col, 0) + 1
        for col, z in (m.get("zones") or {}).items():
            cur = zones.get(col)
            if cur is None:
                zones[col] = dict(z)
            elif cur.get("kind") == z.get("kind"):
                cur["min"] = min(cur["min"], z["min"])
                cur["max"] = max(cur["max"], z["max"])
    disk = sum(os.path.getsize(p) for p in _part_files(store_dir))
    return {"parts": len(mans), "rows": rows, "orig_bytes": orig,
            "enc_bytes": enc, "disk_bytes": disk,
            "ratio": round(orig / enc, 4) if enc else None,
            "codecs": codec_hist, "zones": zones,
            "blooms": bloom_parts}


class _CountPart:
    """Task: matching-row COUNT of one encoded part — evaluates the
    predicate conjunction on packed codes (codecs/access.py) and never
    decodes any values.  Selective counts at open scale read only the
    filter columns' blocks of the zone-surviving parts."""

    def __init__(self, preds: list[tuple]):
        self.preds = preds  # [(col, "eq"|"range", lo, hi)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..codecs import EncodedColumn
        from ..codecs.access import filter_eq, filter_in, filter_range
        from ..pipelines.encode_pipeline import _bloom_disproves
        cols = sorted({c for c, *_ in self.preds})
        n = 0
        for p in batch.column("path").to_pylist():
            if _bloom_disproves(p, self.preds):
                continue  # sidecar-only read, provably zero matches
            # per-block row-group layout: only the filter columns'
            # payload pages are read
            enc_rows = pq.read_table(
                p, filters=[("column", "in", cols)])
            names = enc_rows.column("column").to_pylist()
            if any(c not in names for c in cols):
                continue  # heterogeneous store: part holds another table
            enc_of = {}
            for c in cols:
                i = names.index(c)
                enc = EncodedColumn.from_row(
                    {k: enc_rows.column(k)[i].as_py() for k in
                     ("codec", "n_values", "params", "payload")})
                enc.base_dir = os.path.dirname(p)
                enc_of[c] = enc
            mask = None
            for col, op, lo, hi in self.preds:
                if op == "eq":
                    m = filter_eq(enc_of[col], lo)
                elif op == "in":
                    m = filter_in(enc_of[col], lo)
                else:
                    m = filter_range(enc_of[col], lo, hi)
                mask = m if mask is None else (mask & m)
                if not mask.any():
                    break
            n += int(mask.sum())
        return pa.table({"n": pa.array([n], pa.int64())})


def count_encoded(store_dir: str, filter: tuple | None = None) -> int:
    """COUNT over the encoded store.

    Without a filter this is pure metadata (sum of manifest row
    counts; parts missing a manifest fall back to one n_values
    metadata read — the payload parquet column is never touched).
    With a filter, manifest zone maps prune parts driver-side and the
    residual parts mask-sum on packed codes without decoding."""
    from ..state.manifest import Manifest
    if filter is None:
        man = Manifest(store_dir)
        done = man.done_parts()
        total = sum(man.load(p).get("rows", 0) for p in sorted(done))
        for path in _part_files(store_dir):
            f = os.path.basename(path)
            part_id = f[len("part-"):-len(".parquet")] \
                if f.startswith("part-") else None
            if part_id in done:
                continue
            t = pq.read_table(path, columns=["column", "n_values"])
            if t.num_rows:  # rows of the part = n_values of any block
                total += int(t.column("n_values")[0].as_py())
        return total
    from ..pipelines.encode_pipeline import _bloom_prune, _pred_survivors

    preds = [_norm_pred(f) for f in filter] if isinstance(filter, list) \
        else [_norm_pred(filter)]
    paths = None
    for pred in preds:
        surv = {f["path"] for f in _pred_survivors(store_dir, pred)}
        paths = surv if paths is None else (paths & surv)
    files = _bloom_prune(store_dir,
                         [{"path": p} for p in sorted(paths or ())], preds)
    if not files:
        return 0
    ds = rd.from_items(files, override_num_blocks=len(files))
    out = ds.map_batches(_CountPart(preds), batch_size=None,
                         batch_format="pyarrow")
    return int(out.sum("n") or 0)

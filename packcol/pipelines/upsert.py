"""Key-scoped upsert (MERGE) over the encoded store.

``upsert_encoded(store, ds, key)`` gives the store the last missing
mutation: *replace-or-insert by key*.  Every store row whose ``key``
appears in ``ds`` is deleted (the same zone-map + bloom pruning as
reads selects only the affected parts) and every row of ``ds`` is
appended as new content-addressed parts — so a point update rewrites
O(1) parts at 100 TB, and the new rows immediately carry the full
query-layer metadata (manifests, zone maps, bloom sidecars).

Ordering is chosen for crash-safety, not elegance:

1. **stage** — ``ds`` streams once through ``write_encoded`` into a
   private ``<store>/_upsert-<token>/`` staging store (invisible to
   readers: they list only top-level ``*.parquet``);
2. **publish** — each staged part's manifest, bloom sidecar and part
   file rename into the store (same filesystem, atomic per file);
3. **retire** — the replaced keys are deleted in bounded driver chunks
   (``_KEY_CHUNK`` distinct values per pass, each pass zone/bloom
   pruned), with the freshly published part ids EXCLUDED so the delete
   can never eat the new rows;
4. the staging dir is removed.

A crash anywhere leaves the store readable; re-running the SAME upsert
converges: staging re-produces byte-identical content-addressed part
ids (publish overwrites the same files) and the retire pass is
idempotent.  The transient anomaly between 2 and 3 is duplicate keys
(old + new row both visible) — upsert is eventually-exact per call,
not snapshot-isolated.

Rows of ``ds`` with a NULL key are plain inserts (SQL semantics: NULL
matches no existing key).  ``ds`` holding several rows per key inserts
them all — deduplicate upstream if the key must stay unique.
"""

from __future__ import annotations

import os
import shutil
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

from ..state.bloom import _path as bloom_path
from ..state.manifest import Manifest

# Distinct key values per retire pass (bounds driver memory only).
# ONE pass is deliberately preferred over bloom-sized chunks: a bloom
# with ~1% per-value false positives saturates (P(any of N hits) ≈ 1)
# long before even 4k probe values, so chunking to "let blooms prune"
# was measured SLOWER on a 4 GB / 512-part soak (5 passes scanned
# 2059 parts / 23.1 s vs one pass 512 / 17.9 s) — the single pass does
# one vectorized membership scan per part, the honest cost on an
# unzoned key.  Large IN-lists skip bloom probing entirely
# (encode_pipeline._BLOOM_PROBE_VALUE_CAP); zone envelopes still prune
# when the key is zoned/clustered.
_KEY_CHUNK = 1_000_000


class _KeyColDistinct:
    """Task: per-part distinct non-null values of ONE column, decoded
    from the encoded blocks — the retire pass's key source.  Emits
    O(distinct per part) rows; the driver holds ≤ _KEY_CHUNK at once."""

    def __init__(self, col: str):
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        from ..codecs import EncodedColumn, decode_any
        outs = []
        for p in batch.column("path").to_pylist():
            enc_rows = pq.read_table(
                p, filters=[("column", "in", [self.col])])
            if enc_rows.num_rows == 0:
                continue
            enc = EncodedColumn.from_row(
                {k: enc_rows.column(k)[0].as_py() for k in
                 ("codec", "n_values", "params", "payload")})
            enc.base_dir = os.path.dirname(p)
            vals = decode_any(enc)
            if isinstance(vals, pa.ChunkedArray):
                vals = vals.combine_chunks()
            outs.append(pa.table({self.col: pc.unique(vals).drop_null()}))
        if not outs:
            return pa.table({self.col: pa.array([], type=pa.string())})
        return pa.concat_tables(outs, promote_options="permissive")


def upsert_encoded(store_dir: str, ds, key: str, *,
                   rows_per_part: int | None = None,
                   codec_overrides: dict | None = None,
                   bloom_columns="auto") -> dict:
    """MERGE ``ds`` into the store on ``key``; see module doc.

    Returns {rows_inserted, parts_inserted, rows_deleted,
    parts_rewritten, parts_removed, parts_scanned}."""
    from .delete import delete_where
    from .encode_pipeline import _part_scan_seed, write_encoded
    if not isinstance(key, str):
        raise ValueError(
            "upsert key must be a single column name (composite keys "
            "would need tuple-IN deletes, which the predicate algebra "
            "does not express)")
    if key not in ds.schema().names:
        raise ValueError(f"key column {key!r} not in dataset schema "
                         f"{ds.schema().names}")
    staging = os.path.join(store_dir, f"_upsert-{uuid.uuid4().hex[:12]}")
    try:
        w = write_encoded(ds, staging, codec_overrides=codec_overrides,
                          bloom_columns=bloom_columns,
                          rows_per_part=rows_per_part)
        # publish: manifest + bloom before the part file, so a part is
        # never visible without its pruning metadata (a missing
        # manifest only degrades to "cannot prune" anyway)
        man_src, man_dst = Manifest(staging), Manifest(store_dir)
        os.makedirs(man_dst.dir, exist_ok=True)
        new_ids = []
        for f in sorted(os.listdir(staging)):
            if not f.endswith(".parquet"):
                continue
            pid = f[len("part-"):-len(".parquet")]
            new_ids.append(pid)
            if os.path.exists(man_src._path(pid)):
                os.replace(man_src._path(pid), man_dst._path(pid))
            b = bloom_path(staging, pid)
            if os.path.exists(b):
                dst_b = bloom_path(store_dir, pid)
                os.makedirs(os.path.dirname(dst_b), exist_ok=True)
                os.replace(b, dst_b)
            os.replace(os.path.join(staging, f),
                       os.path.join(store_dir, f))
        # retire: replaced keys come from the just-published parts'
        # decoded key column (ds itself ran exactly once, above);
        # chunked so the driver never holds more than _KEY_CHUNK values
        stats = {"rows_deleted": 0, "parts_rewritten": 0,
                 "parts_removed": 0, "parts_scanned": 0}
        exclude = set(new_ids)
        if new_ids:
            pending: set = set()

            def flush():
                if not pending:
                    return
                r = delete_where(store_dir, (key, "in", sorted(pending)),
                                 exclude_parts=exclude)
                for kk in stats:
                    stats[kk] += r.get(kk, 0)
                pending.clear()

            files = [{"path": os.path.join(store_dir,
                                           f"part-{pid}.parquet")}
                     for pid in new_ids]
            key_ds = _part_scan_seed(files).map_batches(
                _KeyColDistinct(key), batch_size=None,
                batch_format="pyarrow")
            for b in key_ds.iter_batches(batch_format="pyarrow",
                                         batch_size=None):
                for v in b.column(key).to_pylist():
                    pending.add(v)
                    if len(pending) >= _KEY_CHUNK:
                        flush()
            flush()
        return {"rows_inserted": w["rows"], "parts_inserted": w["parts"],
                **stats}
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def attach_store(src_dir: str, dst_dir: str, *,
                 move: bool = True) -> dict:
    """Merge every part of ``src_dir`` into ``dst_dir`` — the publish
    half of an upsert, standalone: per-part atomic renames (or copies
    with ``move=False``), manifest and bloom sidecars first, payload
    file last.  The shard-combining shape at 100 TB: attaching a
    1000-part shard to a million-part corpus is O(shard parts)
    metadata, zero decode, zero shuffle.

    A part id present in BOTH stores coalesces when the files are
    byte-identical (counted in ``parts_deduped``; the source copy is
    left in place) and raises otherwise — ids from ``encode_files``
    derive from input NAME + slice, so two different shards built from
    same-named inputs can collide, and overwriting would silently drop
    the destination's rows.  Shared-vocab stores are refused: their
    blocks reference a ``_shared/`` sidecar that is only valid under
    the source root (recompact to self-describing parts first).

    Returns {parts_attached, parts_deduped, rows_attached}."""
    import filecmp
    if os.path.isdir(os.path.join(src_dir, "_shared")):
        raise ValueError(
            f"{src_dir} uses a shared-vocab sidecar; recompact it to "
            "self-describing parts before attaching")
    os.makedirs(dst_dir, exist_ok=True)
    man_src, man_dst = Manifest(src_dir), Manifest(dst_dir)
    os.makedirs(man_dst.dir, exist_ok=True)
    attached = deduped = rows = 0
    for f in sorted(os.listdir(src_dir)):
        if not f.endswith(".parquet"):
            continue
        pid = f[len("part-"):-len(".parquet")] \
            if f.startswith("part-") else f
        src_f = os.path.join(src_dir, f)
        dest = os.path.join(dst_dir, f)
        if os.path.exists(dest):
            if not filecmp.cmp(src_f, dest, shallow=False):
                raise ValueError(
                    f"part id collision on {f}: source and destination "
                    "differ byte-wise — shards built from same-named "
                    "inputs with different content cannot attach")
            deduped += 1
            continue  # byte-identical: keep dst's copy + sidecars
        attached += 1
        if os.path.exists(man_src._path(pid)):
            try:
                rows += int(man_src.load(pid).get("rows") or 0)
            except FileNotFoundError:
                pass
        _transfer = os.replace if move else shutil.copy2
        if os.path.exists(man_src._path(pid)):
            _transfer(man_src._path(pid), man_dst._path(pid))
        b = bloom_path(src_dir, pid)
        if os.path.exists(b):
            dst_b = bloom_path(dst_dir, pid)
            os.makedirs(os.path.dirname(dst_b), exist_ok=True)
            _transfer(b, dst_b)
        _transfer(src_f, dest)
    return {"parts_attached": attached, "parts_deduped": deduped,
            "rows_attached": rows}

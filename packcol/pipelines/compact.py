"""Compaction of encoded blocks.

Two forms (SURVEY.md §2.8):

* :func:`compact_columns` — layout compaction: regroup encoded-block rows
  into one file per column (shuffle key = ``column``), so a reader of a
  single column touches one file instead of every part.  Payloads are
  not touched — each row stays a self-describing block.
* :func:`recompact` — size compaction: decode runs of small adjacent
  partitions and re-encode them as bigger ones (no shuffle — parts are
  grouped by contiguous ranges on the driver, each group is one task).
  Bigger blocks amortize per-block dictionaries/symbol tables, improving
  the compression ratio.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from ..stages.encode import decode_rows, encode_table
from ..state.manifest import Manifest, params_hash


def compact_columns(enc_dir: str, dest_dir: str) -> dict:
    """Regroup encoded rows column-major: dest/<column>.parquet.

    The shuffle moves only encoded payloads (already compressed), and
    one groupby key per column keeps the exchange tiny."""
    import shutil
    os.makedirs(dest_dir, exist_ok=True)
    # carry the shared-vocabulary sidecar along: shared-ref toksep
    # blocks resolve params["shared_ref"] relative to the store dir,
    # so a compacted store must contain the same _shared/ files
    shared_src = os.path.join(enc_dir, "_shared")
    if os.path.isdir(shared_src):
        shutil.copytree(shared_src, os.path.join(dest_dir, "_shared"),
                        dirs_exist_ok=True)
    files = [os.path.join(enc_dir, f) for f in sorted(os.listdir(enc_dir))
             if f.endswith(".parquet")]
    ds = rd.read_parquet(files)

    def write_group(group: pa.Table) -> pa.Table:
        col = group.column("column")[0].as_py()
        dest = os.path.join(dest_dir, f"{col}.parquet")
        idx = pa.compute.sort_indices(group.column("part_id"))
        pq.write_table(group.take(idx), dest + ".tmp",
                       compression="zstd", compression_level=3)
        os.replace(dest + ".tmp", dest)
        return pa.table({"column": [col], "n_blocks": [group.num_rows],
                         "bytes": [os.path.getsize(dest)]})

    out = ds.groupby("column").map_groups(
        write_group, batch_format="pyarrow").to_pandas()
    return {r["column"]: {"n_blocks": int(r["n_blocks"]),
                          "bytes": int(r["bytes"])}
            for _, r in out.iterrows()}


class RecompactGroup:
    """Task: a group of small encoded part files → decode → one bigger
    re-encoded part (deterministic: new part_id = joined old ids)."""

    def __init__(self, dest_dir: str):
        self.dest_dir = dest_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"part_id": [], "rows": [], "orig_bytes": [], "enc_bytes": []}
        for row in batch.to_pylist():
            paths = row["paths"]
            tables = [decode_rows(pq.read_table(p),
                                  base_dir=os.path.dirname(p))
                      for p in paths]
            merged = pa.concat_tables(tables).combine_chunks()
            part_id = row["new_part_id"]
            enc = encode_table(merged, part_id=part_id)
            dest = os.path.join(self.dest_dir, f"part-{part_id}.parquet")
            # per-block row groups, same rationale as the encode writer
            pq.write_table(enc, dest + ".tmp", compression="zstd",
                           compression_level=3, row_group_size=1,
                           use_dictionary=False,
                           write_statistics=["column"])
            os.replace(dest + ".tmp", dest)
            orig = sum(enc.column("orig_bytes").to_pylist())
            encb = sum(enc.column("enc_bytes").to_pylist())
            # merged parts keep the full query layer: zone maps (part
            # pruning + metadata MIN/MAX) and bloom sidecars (point
            # lookups) are rebuilt from the decoded table in hand —
            # without them a recompacted store silently degrades to
            # full scans
            from ..state.manifest import compute_zones, null_counts_of
            from .encode_pipeline import build_part_blooms
            zones = compute_zones(merged)
            blooms = build_part_blooms(merged, zones, self.dest_dir,
                                       part_id, "auto")
            Manifest(self.dest_dir).record(part_id, {
                "inputs": [os.path.basename(p) for p in paths],
                "rows": merged.num_rows, "orig_bytes": orig,
                "enc_bytes": encb, "zones": zones, "blooms": blooms,
                "nulls": null_counts_of(merged),
                "params_hash": params_hash(enc)})
            out["part_id"].append(part_id)
            out["rows"].append(merged.num_rows)
            out["orig_bytes"].append(orig)
            out["enc_bytes"].append(encb)
        return pa.table(out)


def read_column(dest_dir: str, column: str):
    """Decode one column from a column-major compacted layout — reads a
    single file, never touches other columns' payloads.  Returns a
    Dataset of single-column blocks."""
    path = os.path.join(dest_dir, f"{column}.parquet")

    def decode_file(batch: pa.Table) -> pa.Table:
        from ..codecs import EncodedColumn, decode_any
        from ..codecs.base import str_to_type
        import json as _json
        fpath = batch.column("path")[0].as_py()
        # shared-ref blocks resolve their vocabulary sidecar relative
        # to the store directory (the _shared/ copy made by
        # compact_columns)
        base_dir = os.path.dirname(fpath)
        enc_rows = pq.read_table(fpath)
        arrays, dtype = [], None
        for i in range(enc_rows.num_rows):
            row = {k: enc_rows.column(k)[i].as_py() for k in
                   ("codec", "n_values", "params", "payload")}
            enc = EncodedColumn.from_row(row)
            enc.base_dir = base_dir
            a = decode_any(enc)
            dtype = a.type
            arrays.append(a)
        if not arrays:
            # typed empty (a bare [] would yield a null-typed column
            # that breaks unions with real blocks)
            for p in enc_rows.column("params").to_pylist() \
                    if enc_rows.num_rows else []:
                dt = _json.loads(p).get("dtype")
                if dt:
                    dtype = str_to_type(dt)
                    break
            return pa.table({column: pa.array(
                [], dtype if dtype is not None else pa.string())})
        return pa.table({column: pa.concat_arrays(
            [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
             for a in arrays])})

    ds = rd.from_items([{"path": path}], override_num_blocks=1)
    return ds.map_batches(decode_file, batch_size=1, batch_format="pyarrow")


def recompact(enc_dir: str, dest_dir: str, merge_factor: int = 4,
              cpus_per_task: float = 1) -> dict:
    """Merge every `merge_factor` adjacent parts into one larger part."""
    os.makedirs(dest_dir, exist_ok=True)
    files = [os.path.join(enc_dir, f) for f in sorted(os.listdir(enc_dir))
             if f.endswith(".parquet")]
    groups = [files[i:i + merge_factor]
              for i in range(0, len(files), merge_factor)]
    items = [{"paths": g, "new_part_id": f"c{i:05d}x{len(g)}"}
             for i, g in enumerate(groups)]
    ds = rd.from_items(items, override_num_blocks=max(len(items), 1))
    res = ds.map_batches(RecompactGroup(dest_dir), batch_size=1,
                         batch_format="pyarrow",
                         num_cpus=cpus_per_task).to_pandas()
    orig, enc = int(res["orig_bytes"].sum()), int(res["enc_bytes"].sum())
    return {"parts": len(res), "rows": int(res["rows"].sum()),
            "orig_bytes": orig, "enc_bytes": enc,
            "ratio": round(orig / enc, 4) if enc else 0.0}

"""Per-partition lineage manifest → checkpoint/resume.

One JSON file per completed partition under ``<out_dir>/_manifest/``
(concurrent-writer-safe: no shared append), written atomically
(tmp+rename) AFTER the partition's encoded parquet lands.  A re-run
diffs the manifest against the input descriptors and skips completed
partitions; the codec decision is a deterministic function of partition
stats (stages/select.py), so re-encoding a partition reproduces
byte-identical output (`params_hash` pins this).
"""

from __future__ import annotations

import hashlib
import json
import os


class Manifest:
    def __init__(self, out_dir: str):
        self.dir = os.path.join(out_dir, "_manifest")
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, part_id: str) -> str:
        return os.path.join(self.dir, f"{part_id}.json")

    def done_parts(self) -> set[str]:
        return {f[:-5] for f in os.listdir(self.dir) if f.endswith(".json")}

    def record(self, part_id: str, meta: dict) -> None:
        p = self._path(part_id)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"part_id": part_id, **meta}, f, sort_keys=True)
        os.replace(tmp, p)

    def load(self, part_id: str) -> dict:
        with open(self._path(part_id)) as f:
            return json.load(f)

    def load_all(self) -> list[dict]:
        return [self.load(p) for p in sorted(self.done_parts())]


def params_hash(enc_rows_table) -> str:
    """Hash of the per-column codec decisions + params of one partition."""
    h = hashlib.sha1()
    for col, codec, params in zip(
            enc_rows_table.column("column").to_pylist(),
            enc_rows_table.column("codec").to_pylist(),
            enc_rows_table.column("params").to_pylist()):
        h.update(f"{col}|{codec}|{params}\n".encode())
    return h.hexdigest()[:16]

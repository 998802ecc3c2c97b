"""Per-partition lineage manifest → checkpoint/resume.

One JSON file per completed partition under ``<out_dir>/_manifest/``
(concurrent-writer-safe: no shared append), written atomically
(tmp+rename) AFTER the partition's encoded parquet lands.  A re-run
diffs the manifest against the input descriptors and skips completed
partitions; the codec decision is a deterministic function of partition
stats (stages/select.py), so re-encoding a partition reproduces
byte-identical output (`params_hash` pins this).

CAVEAT: resume identity is the part_id string.  If the id scheme
changes between engine versions, resuming an old store re-encodes
everything under the new ids BESIDE the old parts — duplicated rows.
Don't resume a store written by a different scheme version; start a
fresh output dir (or wipe) on upgrade.
"""

from __future__ import annotations

import hashlib
import json
import os


def file_digest64(path: str) -> str:
    """Fast 64-bit content digest of one part file: position-salted
    splitmix over the bytes as uint64 words, vectorized numpy (multi-
    GB/s — the read-back is page-cache-hot right after the write).
    Not cryptographic; 64 bits is the standard fingerprint trade for
    change DETECTION (collision P ≈ n²/2⁶⁵ across compared parts)."""
    import numpy as np
    from ..functions.text import _splitmix64
    with open(path, "rb") as f:
        data = f.read()
    n = len(data)
    pad = (-n) % 8
    if pad:
        data = data + b"\0" * pad
    words = np.frombuffer(data, dtype=np.uint64)
    with np.errstate(over="ignore"):
        idx = np.arange(len(words), dtype=np.uint64) + \
            np.uint64(0x9E3779B97F4A7C15)
        h = _splitmix64(words ^ _splitmix64(idx))
        s = np.uint64(h.sum(dtype=np.uint64)) ^ np.uint64(n)
        return "%016x" % int(_splitmix64(
            np.array([s], dtype=np.uint64))[0])


class Manifest:
    def __init__(self, out_dir: str):
        self.dir = os.path.join(out_dir, "_manifest")
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, part_id: str) -> str:
        return os.path.join(self.dir, f"{part_id}.json")

    def done_parts(self) -> set[str]:
        return {f[:-5] for f in os.listdir(self.dir) if f.endswith(".json")}

    def record(self, part_id: str, meta: dict) -> None:
        # every writer records AFTER its part file lands, so this is
        # the one chokepoint where a payload content digest is always
        # fresh; any stale digest in a re-recorded manifest dict is
        # overwritten.  The digest makes part identity CONTENT-based
        # (rows/enc_bytes/params_hash alone can't see a value shift
        # that keeps the same bit width) — the basis of snapshot diffs
        # (pipelines/diff.py) and deep fsck.
        part = os.path.join(os.path.dirname(self.dir),
                            f"part-{part_id}.parquet")
        if os.path.exists(part):
            meta = {**meta, "payload_digest": file_digest64(part)}
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


_ZONE_STR_MAX = 256  # don't zone-map long strings / binary payloads


def null_counts_of(t) -> dict:
    """{column: null_count} for the columns of one partition that have
    any nulls.  Stored under the manifest key "nulls"; an EMPTY dict
    still means "counted — zero nulls everywhere", which is what lets
    IS [NOT] NULL pushdown prune parts, while a manifest missing the
    key entirely (pre-null-aware store) prunes nothing."""
    return {name: int(t.column(name).null_count)
            for name in t.column_names if t.column(name).null_count}


def compute_zones(t) -> dict:
    """Per-column min/max zone map of one partition, JSON-safe.

    Kinds: "i64" (ints / timestamps / dates / bools, physical int64),
    "f64", "str" (only when max length <= _ZONE_STR_MAX — a truncated
    max would be an incorrect upper bound, so long columns are simply
    not mapped).  Null-only and unsupported columns are omitted; a
    missing entry means "cannot prune"."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ..codecs.forpack import is_int_like
    zones: dict = {}
    for name in t.column_names:
        col = t.column(name)
        if col.null_count == len(col) or len(col) == 0:
            continue
        typ = col.type
        try:
            if pa.types.is_uint64(typ):
                # stored as a mod-2^64 reinterpret: values >= 2^63 map
                # negative, so the int64 zone order is NOT value order
                # — no zone (never pruned)
                continue
            if is_int_like(typ):
                mm = pc.min_max(col)
                lo, hi = mm["min"], mm["max"]
                phys = pa.array([lo, hi], type=typ)
                from ..codecs.forpack import to_int64_numpy
                v = to_int64_numpy(phys.combine_chunks()
                                   if isinstance(phys, pa.ChunkedArray)
                                   else phys)
                # "dt" records the logical type so predicate bounds are
                # converted in the COLUMN's physical unit (a timestamp
                # predicate against a timestamp[ns] zone must scale to
                # ns, not a guessed us)
                zones[name] = {"kind": "i64", "min": int(v[0]),
                               "max": int(v[1]), "dt": str(typ)}
            elif pa.types.is_floating(typ):
                mm = pc.min_max(col)
                lo, hi = mm["min"].as_py(), mm["max"].as_py()
                if lo is None or lo != lo or hi != hi:  # NaN-poisoned
                    continue
                zones[name] = {"kind": "f64", "min": float(lo),
                               "max": float(hi)}
            elif pa.types.is_string(typ) or pa.types.is_large_string(typ):
                if pc.max(pc.binary_length(col)).as_py() > _ZONE_STR_MAX:
                    continue
                mm = pc.min_max(col)
                zones[name] = {"kind": "str", "min": mm["min"].as_py(),
                               "max": mm["max"].as_py()}
        except pa.ArrowNotImplementedError:
            continue
    return zones


def zone_may_match(zone: dict | None, lo, hi) -> bool:
    """Could any value in [zone.min, zone.max] fall inside [lo, hi]?
    Conservative: unknown zone → True.  lo/hi must already be in the
    zone's physical domain (int for "i64", etc.)."""
    if zone is None:
        return True
    return not (hi < zone["min"] or lo > zone["max"])


def params_hash(enc_rows_table) -> str:
    """Hash of the per-column codec decisions + params of one partition."""
    h = hashlib.sha1()
    for col, codec, params in zip(
            enc_rows_table.column("column").to_pylist(),
            enc_rows_table.column("codec").to_pylist(),
            enc_rows_table.column("params").to_pylist()):
        h.update(f"{col}|{codec}|{params}\n".encode())
    return h.hexdigest()[:16]

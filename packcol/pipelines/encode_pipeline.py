"""End-to-end encode → compact → decode-verify pipelines (Ray Data).

Two encode paths:

* :func:`encode_dataset` — generic streaming form over any
  ``ray.data.Dataset``: stateless ``map_batches`` encode, zero-copy Arrow
  in/out.  Content-addressed part ids; no checkpointing.
* :func:`encode_files` — the flagship checkpointed form: partition
  descriptors are planned from Parquet row-group metadata (explicit
  byte-size balancing → skew handling), completed partitions are skipped
  via the lineage manifest, each task reads its own slice, encodes,
  writes ``part-<id>.parquet`` atomically, and records lineage.  This is
  the "resumable output" layout: one file per partition, never one giant
  file.

Scale notes (100 TB design): the descriptor dataset is tiny (one row per
~64 MB of input) and fans out to stateless tasks — no shuffle anywhere
in encode.  Decode-verify is per-partition (no shuffle).  The only wide
op is the final metrics aggregate (global sum, bytes-sized).
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from ..stages.encode import (ENC_SCHEMA, DecodeBatch, EncodeBatch,
                             RoundtripVerify, decode_rows, encode_table)
from ..state.manifest import (Manifest, compute_zones,
                              null_counts_of, params_hash,
                              zone_may_match)

_DEFAULT_TARGET_BYTES = 64 << 20


# ---------------------------------------------------------------------------
# partition planning (skew-aware, metadata-only)
# ---------------------------------------------------------------------------

def plan_partitions(paths: list[str],
                    target_bytes: int = _DEFAULT_TARGET_BYTES) -> list[dict]:
    """Descriptors {part_id, path, rg_start, rg_end, bytes} from Parquet
    row-group metadata.  Greedy byte-packing of row groups so every
    partition is ≈ target_bytes regardless of row-size skew; an oversized
    single row group becomes its own partition (can't split finer without
    reading it)."""
    import hashlib
    parts: list[dict] = []
    for path in sorted(paths):
        md = pq.ParquetFile(path).metadata
        sizes = [md.row_group(i).total_byte_size
                 for i in range(md.num_row_groups)]
        # the id must identify the SOURCE uniquely: basename alone
        # collides across directories (dir1/part-0 vs dir2/part-0) and a
        # manifest hit would silently skip the second file — so include
        # a short hash of the absolute path
        tag = hashlib.sha1(os.path.abspath(path).encode()) \
            .hexdigest()[:8]
        start, acc = 0, 0
        for i, sz in enumerate(sizes):
            acc += sz
            last = i == len(sizes) - 1
            if acc >= target_bytes or last:
                parts.append({
                    "part_id": f"{os.path.basename(path)}-{tag}"
                               f"-rg{start}-{i}",
                    "path": path, "rg_start": start, "rg_end": i,
                    "bytes": acc,
                    "input_bytes": os.path.getsize(path)})
                start, acc = i + 1, 0
    return parts


def _cluster_cpus() -> int:
    import ray
    try:
        return int(ray.cluster_resources().get("CPU", 0)) or \
            (os.cpu_count() or 8)
    except Exception:
        return os.cpu_count() or 8


def _seed_bins(parts: list[dict], waves: int = 4) -> list[dict]:
    """LPT bin-pack partition descriptors into O(cluster CPUs) seed
    items, each carrying a byte-balanced list under ``descs``.

    Two reasons over one-item-per-part (profiled r4, BASELINE.md):
    (1) `from_items` block-creation cost scales with BLOCK count, not
    item count (206 blocks cost ~0.45 s of serial driver prologue at
    32 CPUs — 15% of the encode wall; 64 bins cost ~0.1 s), and at
    100 TB the plan is ~10^6 descriptors — per-part blocks would be a
    driver metadata explosion.  (2) fewer tasks amortize dispatch.
    ``waves`` bins per CPU keeps late-straggler loss bounded at ~1/waves
    of one task even with byte skew (LPT guarantees bins within ~max
    part of each other)."""
    import heapq
    k = min(len(parts), max(waves * _cluster_cpus(), 16))
    if k >= len(parts):
        return [{"descs": [p]} for p in parts]
    heap = [(0, i) for i in range(k)]
    heapq.heapify(heap)
    bins: list[list[dict]] = [[] for _ in range(k)]
    for p in sorted(parts, key=lambda p: -p.get("bytes", 0)):
        sz, i = heapq.heappop(heap)
        bins[i].append(p)
        heapq.heappush(heap, (sz + p.get("bytes", 0), i))
    return [{"descs": b} for b in bins if b]


# ---------------------------------------------------------------------------
# checkpointed flagship
# ---------------------------------------------------------------------------

class EncodePartitionWriter:
    """Stateless task: descriptor row → read slice → encode → atomic write
    + manifest record → metrics row.  Idempotent (pure function of the
    descriptor + deterministic codec selection), hence retry-safe."""

    def __init__(self, out_dir: str, codec_overrides: dict | None = None,
                 columns: list[str] | None = None,
                 shared_vocab_columns: list[str] | None = None,
                 bloom_columns: list[str] | str | None = "auto"):
        self.out_dir = out_dir
        self.codec_overrides = codec_overrides
        self.columns = columns
        self.shared_vocab_columns = shared_vocab_columns
        self.bloom_columns = bloom_columns
        self._shared = None  # lazy: one sidecar load per worker process

    def _column_encoders(self) -> dict | None:
        if not self.shared_vocab_columns:
            return None
        if self._shared is None:
            from ..stages.toksep_actor import TokSepSharedEncoder
            self._shared = TokSepSharedEncoder(
                self.out_dir, self.shared_vocab_columns)
        return {c: self._shared.encode_column
                for c in self.shared_vocab_columns}

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"part_id": [], "rows": [], "orig_bytes": [], "enc_bytes": [],
               "wall_s": []}
        # seed rows are either bare descriptors or LPT bins of them
        # ({"descs": [...]}, see _seed_bins)
        for row in batch.to_pylist():
            descs = row["descs"] if "descs" in row else [row]
            for d in descs:
                self._encode_one(d, out)
        return pa.table(out)

    def _encode_one(self, d: dict, out: dict) -> None:
        t0 = time.perf_counter()
        pf = pq.ParquetFile(d["path"])
        t = pf.read_row_groups(
            list(range(d["rg_start"], d["rg_end"] + 1)),
            columns=self.columns)
        enc = encode_table(t, part_id=d["part_id"],
                           codec_overrides=self.codec_overrides,
                           column_encoders=self._column_encoders())
        dest = os.path.join(self.out_dir, f"part-{d['part_id']}.parquet")
        # one row group PER BLOCK (row): projection / predicate readers
        # pass parquet filters on `column` and the pruned row groups'
        # payload pages never leave storage — the part file behaves like
        # a column store internally.  Stats kept only for the pruning
        # key; ~0.1% size overhead at 64 MB parts (measured r4)
        pq.write_table(enc, dest + ".tmp", compression="zstd",
                       compression_level=3, row_group_size=1,
                       use_dictionary=False, write_statistics=["column"])
        os.replace(dest + ".tmp", dest)
        orig = sum(enc.column("orig_bytes").to_pylist())
        encb = sum(enc.column("enc_bytes").to_pylist())
        zones = compute_zones(t)
        blooms = self._build_blooms(t, zones, d["part_id"])
        Manifest(self.out_dir).record(d["part_id"], {
            "input": d["path"], "rg_start": d["rg_start"],
            "rg_end": d["rg_end"], "rows": t.num_rows,
            "input_bytes": d.get("input_bytes"),
            "part_input_bytes": d.get("bytes"),
            "orig_bytes": orig, "enc_bytes": encb,
            "blooms": blooms,
            "zones": zones, "nulls": null_counts_of(t),
            "codecs": dict(zip(enc.column("column").to_pylist(),
                               enc.column("codec").to_pylist())),
            "params_hash": params_hash(enc),
            "wall_s": round(time.perf_counter() - t0, 4)})
        out["part_id"].append(d["part_id"])
        out["rows"].append(t.num_rows)
        out["orig_bytes"].append(orig)
        out["enc_bytes"].append(encb)
        out["wall_s"].append(time.perf_counter() - t0)

    def _build_blooms(self, t: pa.Table, zones: dict,
                      part_id: str) -> list[str]:
        return build_part_blooms(t, zones, self.out_dir, part_id,
                                 self.bloom_columns)


def build_part_blooms(t: pa.Table, zones: dict, out_dir: str,
                      part_id: str,
                      bloom_columns: list[str] | str | None) -> list[str]:
    """Point-lookup bloom sidecar for one part (state/bloom.py):
    "auto" = unzoned key-shaped string columns (url-ish); an explicit
    list covers any hashable column.  Returns the covered column names
    (recorded in the manifest for store_stats)."""
    from ..state.bloom import (auto_bloom_columns, build_bloom,
                               _hash_kind, save_blooms)
    if bloom_columns is None:
        return []
    cols = auto_bloom_columns(t, zones) \
        if bloom_columns == "auto" else [
            c for c in bloom_columns if c in t.column_names]
    blooms = {}
    for c in cols:
        kind = _hash_kind(t.column(c).type)
        if kind is None:
            continue
        b = build_bloom(t.column(c), kind)
        if b is not None:
            blooms[c] = b
    save_blooms(out_dir, part_id, blooms)
    return sorted(blooms)


def store_selection(out_dir: str, paths: list[str],
                    sample_rows: int = 4096, max_files: int = 2) -> dict:
    """Codec selection ONCE per STORE from a bounded deterministic
    sample of the sorted input files, persisted as a
    ``_selection/codecs.json`` sidecar — the same sample-once /
    sidecar / reuse-on-resume design as the shared vocabulary
    (stages/toksep_actor.py) and the reference's sample-don't-scan
    table build (/root/reference/src/naive_impl/seq_vector/
    minimizers.rs:38-142).

    Amortization: the per-part stats sampler trial-encodes three string
    codecs per column, re-deriving the SAME decision for every part of
    a homogeneous corpus — ~48% of per-part encode wall at 4 MB parts
    (profiled r4).  With the store-level decision passed as
    codec_overrides, sibling parts skip that pass entirely; a part
    where the reused codec fails (true drift) falls back to full
    per-part selection inside encode_with_guard, and the store-vs-raw
    size guard still applies per part."""
    import json as _json
    spath = os.path.join(out_dir, "_selection", "codecs.json")
    if os.path.exists(spath):
        with open(spath) as f:
            return _json.load(f)["codecs"]
    from ..stages.select import choose_codec
    from ..stages.stats import column_stats
    tabs = []
    for p in sorted(paths)[:max_files]:
        pf = pq.ParquetFile(p)
        if pf.metadata.num_row_groups:
            tabs.append(pf.read_row_groups([0]).slice(0, sample_rows))
    if not tabs:
        return {}
    if len({str(t.schema) for t in tabs}) > 1:
        # heterogeneous input (mixed tables into one store): there is
        # no single store-level decision — keep per-part selection
        return {}
    t = pa.concat_tables(tabs).combine_chunks()
    if t.num_rows < 64:  # degenerate sample: keep per-part selection
        return {}
    sel = {name: choose_codec(t.column(name).type,
                              column_stats(t.column(name).combine_chunks()))
           for name in t.column_names}
    os.makedirs(os.path.dirname(spath), exist_ok=True)
    tmp = f"{spath}.tmp{os.getpid()}"
    with open(tmp, "w") as f:
        _json.dump({"codecs": sel}, f)
    os.replace(tmp, spath)  # concurrent writers produce identical content
    return sel


def encode_files(paths: list[str], out_dir: str, resume: bool = True,
                 target_bytes: int = _DEFAULT_TARGET_BYTES,
                 codec_overrides: dict | None = None,
                 concurrency: int | None = None,
                 cpus_per_task: float = 1,
                 shared_vocab_columns: list[str] | None = None,
                 bloom_columns: list[str] | str | None = "auto") -> dict:
    """Checkpointed encode of parquet files → encoded parts + manifest.

    Returns aggregate metrics {parts, rows, orig_bytes, enc_bytes, ratio,
    skipped_parts}."""
    os.makedirs(out_dir, exist_ok=True)
    if shared_vocab_columns:
        # build + write the shared vocabulary sidecars ONCE; on resume an
        # existing sidecar is REUSED, never rebuilt — already-encoded
        # parts reference it by name, so rebuilding from drifted inputs
        # would silently change their decode
        from ..stages.toksep_actor import (SHARED_DIR, build_shared_vocab,
                                           write_shared_vocab)
        missing = [c for c in shared_vocab_columns if not os.path.exists(
            os.path.join(out_dir, SHARED_DIR, f"toksep_{c}.ipc"))]
        if missing:
            write_shared_vocab(out_dir,
                               build_shared_vocab(sorted(paths), missing))
    # store-level codec selection sidecar (sample once, reuse per part;
    # explicit user overrides win)
    sel = store_selection(out_dir, paths)
    if sel:
        codec_overrides = {**sel, **(codec_overrides or {})}
    parts = plan_partitions(paths, target_bytes)
    man = Manifest(out_dir)
    done = man.done_parts() if resume else set()

    def _unchanged(p: dict) -> bool:
        """Skip only when the recorded input still matches the file on
        disk — an in-place rewritten input (same path, same row-group
        layout) must re-encode, not silently serve stale parts.  Two
        guards: whole-file size AND this partition's row-group byte
        sum (a same-size rewrite still perturbs compressed row-group
        sizes); both None-tolerant for pre-guard manifests."""
        if p["part_id"] not in done:
            return False
        m = man.load(p["part_id"])
        rec = m.get("input_bytes")
        if rec is not None and rec != p["input_bytes"]:
            return False
        rgb = m.get("part_input_bytes")
        return rgb is None or rgb == p["bytes"]

    todo = [p for p in parts if not _unchanged(p)]
    skipped = len(parts) - len(todo)
    if todo:
        # byte-balanced seed bins, O(cluster CPUs) blocks (see _seed_bins)
        seeds = _seed_bins(todo)
        ds = rd.from_items(seeds, override_num_blocks=len(seeds))
        metrics = ds.map_batches(
            EncodePartitionWriter(out_dir, codec_overrides,
                                  shared_vocab_columns=shared_vocab_columns,
                                  bloom_columns=bloom_columns),
            batch_size=1, batch_format="pyarrow", num_cpus=cpus_per_task,
            **({"concurrency": concurrency} if concurrency else {}))
        mt = metrics.to_pandas()  # tiny: one row per partition
    else:
        import pandas as pd
        mt = pd.DataFrame({"rows": [], "orig_bytes": [], "enc_bytes": []})
    entries = Manifest(out_dir).load_all()
    orig = sum(m["orig_bytes"] for m in entries)
    enc = sum(m["enc_bytes"] for m in entries)
    return {"parts": len(entries),
            "rows": int(sum(m["rows"] for m in entries)),
            "orig_bytes": int(orig), "enc_bytes": int(enc),
            "ratio": round(orig / enc, 4) if enc else 0.0,
            "skipped_parts": skipped,
            "encoded_rows_this_run": int(mt["rows"].sum())}


# the generic read side of the store lives in sources/encoded.py:
# read_encoded(store, columns=..., filter=...) — projection + zone-map
# pruning + encoded-domain predicates over the decode paths below


class DecodePartFile:
    """Task: one encoded part file path → decoded original table.
    With `columns`, only those encoded-block rows are read and decoded —
    column pruning without touching other payloads."""

    def __init__(self, columns: list[str] | None = None):
        self.columns = columns

    def __call__(self, batch: pa.Table) -> pa.Table:
        tables = []
        for p in batch.column("path").to_pylist():
            if self.columns is not None:
                # parquet-level filter: with the per-block row-group
                # layout, unrequested blocks' payload pages are pruned
                # by the column statistics and never read; on older
                # single-group stores this degrades to a row filter
                enc = pq.read_table(
                    p, filters=[("column", "in", list(self.columns))])
            else:
                enc = pq.read_table(p)
            tables.append(decode_rows(
                enc, expect_complete=self.columns is None,
                base_dir=os.path.dirname(p)))
        return pa.concat_tables(tables)


def _part_scan_seed(files: list[dict]) -> "rd.Dataset":
    """Seed a per-part scan with O(cluster CPUs) blocks, not one block
    per part — the same driver-prologue bound as _seed_bins (a 10^6-part
    store must not create 10^6 driver-side blocks); every scan task
    loops the paths in its batch, so fewer/larger blocks are free."""
    nb = min(max(len(files), 1), max(4 * _cluster_cpus(), 16))
    return rd.from_items(files, override_num_blocks=nb)


def decode_files(out_dir: str, concurrency: int | None = None,
                 cpus_per_task: float = 1,
                 columns: list[str] | None = None,
                 limit: int | None = None) -> "rd.Dataset":
    """Streaming decode of an encoded directory → Dataset of original
    blocks (one task per part file; no shuffle).  Pass `columns` to
    decode a projection only (pruning at the encoded-block level).
    With ``limit``, only the minimal prefix of parts whose manifest
    row counts guarantee ≥limit rows is even planned (parts without a
    recorded count are kept conservatively) — the caller still applies
    ``Dataset.limit`` for the exact cut; this prunes the plan so a
    head-style read of a 10^6-part store schedules O(1) tasks."""
    files = [{"path": os.path.join(out_dir, f)}
             for f in sorted(os.listdir(out_dir)) if f.endswith(".parquet")]
    if limit is not None and limit >= 0:
        rows_of: dict[str, int] = {}
        man_dir = os.path.join(out_dir, "_manifest")
        if os.path.isdir(man_dir):
            for m in Manifest(out_dir).load_all():
                if m.get("rows") is not None:
                    rows_of[m["part_id"]] = int(m["rows"])
        pruned, got = [], 0
        for f in files:
            pruned.append(f)
            base = os.path.basename(f["path"])
            pid = base[len("part-"):-len(".parquet")] \
                if base.startswith("part-") else None
            got += rows_of.get(pid, 0)
            if got >= limit:
                break
        files = pruned
    # O(cluster CPUs) seed blocks: parts are byte-balanced by plan, so a
    # contiguous even-count split stays balanced; per-file blocks cost a
    # serial driver prologue at high part counts (see _seed_bins)
    nb = min(max(len(files), 1), max(4 * _cluster_cpus(), 16))
    ds = rd.from_items(files, override_num_blocks=nb)
    return ds.map_batches(DecodePartFile(columns), batch_size=None,
                          batch_format="pyarrow", num_cpus=cpus_per_task,
                          **({"concurrency": concurrency} if concurrency
                             else {}))


# ---------------------------------------------------------------------------
# generic streaming forms
# ---------------------------------------------------------------------------

def encode_dataset(ds: "rd.Dataset",
                   codec_overrides: dict | None = None) -> "rd.Dataset":
    return ds.map_batches(EncodeBatch(codec_overrides),
                          batch_format="pyarrow", zero_copy_batch=True)


class DatasetPartWriter:
    """Stateless task: one batch of DECODED rows → encoded part +
    manifest + bloom sidecar — the generic Dataset-sink counterpart of
    EncodePartitionWriter (which reads parquet slices itself).
    Retry-safe: the part id is a pure function of the batch content and
    the write is an atomic rename (same contract as ClusterPartWriter,
    pipelines/cluster.py)."""

    def __init__(self, out_dir: str, codec_overrides: dict | None = None,
                 bloom_columns: list[str] | str | None = "auto"):
        self.out_dir = out_dir
        self.codec_overrides = codec_overrides
        self.bloom_columns = bloom_columns

    def __call__(self, batch: pa.Table) -> pa.Table:
        import uuid

        from ..stages.encode import content_part_id
        t0 = time.perf_counter()
        part_id = "w-" + content_part_id(batch)
        enc = encode_table(batch, part_id=part_id,
                           codec_overrides=self.codec_overrides)
        dest = os.path.join(self.out_dir, f"part-{part_id}.parquet")
        # writer-unique tmp name: two byte-identical blocks map to the
        # SAME part id (content-addressed ⇒ set semantics for exact
        # duplicate blocks); a shared tmp path would let their writes
        # interleave, so each writer stages privately and the atomic
        # rename makes last-one-wins safe (identical content either way)
        tmp = dest + f".tmp-{uuid.uuid4().hex[:8]}"
        pq.write_table(enc, tmp, compression="zstd",
                       compression_level=3, row_group_size=1,
                       use_dictionary=False, write_statistics=["column"])
        os.replace(tmp, dest)
        orig = sum(enc.column("orig_bytes").to_pylist())
        encb = sum(enc.column("enc_bytes").to_pylist())
        zones = compute_zones(batch)
        blooms = build_part_blooms(batch, zones, self.out_dir, part_id,
                                   self.bloom_columns)
        Manifest(self.out_dir).record(part_id, {
            "rows": batch.num_rows, "orig_bytes": orig,
            "enc_bytes": encb, "zones": zones, "blooms": blooms,
            "nulls": null_counts_of(batch),
            "codecs": dict(zip(enc.column("column").to_pylist(),
                               enc.column("codec").to_pylist())),
            "params_hash": params_hash(enc),
            "wall_s": round(time.perf_counter() - t0, 4)})
        return pa.table({"part_id": [part_id],
                         "rows": [batch.num_rows],
                         "orig_bytes": [orig], "enc_bytes": [encb]})


def write_encoded(ds: "rd.Dataset", out_dir: str, *,
                  codec_overrides: dict | None = None,
                  bloom_columns: list[str] | str | None = "auto",
                  rows_per_part: int | None = None) -> dict:
    """Sink: stream ANY ``ray.data.Dataset`` into an encoded store
    directory — parts + lineage manifests + zone maps + bloom sidecars,
    fully readable by ``read_encoded`` / ``agg_encoded`` /
    ``count_encoded`` / ``cluster_store``.  This closes the loop:
    pipeline output (a curated corpus, a join result) lands in the
    same store format the file-based ``encode_files`` writes.

    Content-addressed part ids make task retries idempotent (a re-run
    of the same block overwrites the same part).  Corollary: two
    byte-IDENTICAL input blocks coalesce into one part — set semantics
    for exact duplicate blocks (practically impossible at real block
    sizes unless the pipeline duplicates data wholesale).  Unlike
    ``encode_files`` there is no resume-skip — the source is a live
    Dataset, not an immutable file set; for checkpointed ingest of
    files, use ``encode_files``.

    Returns aggregate metrics {parts, rows, orig_bytes, enc_bytes,
    ratio} for the rows written THIS call."""
    os.makedirs(out_dir, exist_ok=True)
    w = DatasetPartWriter(out_dir, codec_overrides, bloom_columns)
    mt = ds.map_batches(
        w, batch_size=rows_per_part, batch_format="pyarrow") \
        .to_pandas()  # tiny: one row per written part
    orig = int(mt["orig_bytes"].sum())
    enc = int(mt["enc_bytes"].sum())
    return {"parts": len(mt), "rows": int(mt["rows"].sum()),
            "orig_bytes": orig, "enc_bytes": enc,
            "ratio": round(orig / enc, 4) if enc else 0.0}


def decode_dataset(enc_ds: "rd.Dataset",
                   whole_blocks: bool | None = None) -> "rd.Dataset":
    """Decode encoded rows → original blocks.

    Default (whole_blocks=None/False): ALWAYS-correct grouped path —
    ``groupby("part_id").map_groups`` reassembles each partition's rows
    first, so arbitrarily re-split/re-shuffled encoded rows decode
    byte-identically (one shuffle of the encoded rows).

    whole_blocks=True: fast shuffle-free path for blocks known to hold
    whole partitions (anything straight out of encode_dataset).  The
    assumption is CHECKED, not trusted: each partition records its
    column count (n_cols), and a block holding a partial partition
    raises instead of silently mis-decoding."""
    if whole_blocks:
        return enc_ds.map_batches(DecodeBatch(), batch_format="pyarrow",
                                  zero_copy_batch=True)
    return enc_ds.groupby("part_id").map_groups(
        lambda g: decode_rows(g), batch_format="pyarrow")


def verify_dataset(ds: "rd.Dataset",
                   codec_overrides: dict | None = None) -> dict:
    """In-task encode→decode→compare over a Dataset; returns summary."""
    verdicts = ds.map_batches(RoundtripVerify(codec_overrides),
                              batch_format="pyarrow", zero_copy_batch=True)
    pdf = verdicts.to_pandas()  # one row per (part, column) — small
    return {
        "n_checks": len(pdf),
        "n_failed": int((~pdf["ok"]).sum()),
        "orig_bytes": int(pdf["orig_bytes"].sum()),
        "enc_bytes": int(pdf["enc_bytes"].sum()),
        "ratio": round(pdf["orig_bytes"].sum() /
                       max(pdf["enc_bytes"].sum(), 1), 4),
        "by_codec": pdf.groupby("codec")["enc_bytes"].sum().to_dict(),
    }


class DecodeVerifyPart:
    """Fused task: encoded part file → decode → extract_text check →
    (rows, mismatches) counts only.  Nothing big ever enters the object
    store — the 100 TB-scale shape for a full-corpus verify."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        from ..sources.webtext import extract_text_batch
        n = bad = 0
        for p in batch.column("path").to_pylist():
            t = decode_rows(pq.read_table(p),
                            base_dir=os.path.dirname(p))
            if {"html", "text"} <= set(t.column_names):
                html = t.column("html").combine_chunks()
                text = t.column("text").combine_chunks()
                got = extract_text_batch(html)
                eq = pc.equal(got.cast(pa.large_string()),
                              text.cast(pa.large_string()))
                n += len(eq)
                bad += len(eq) - int(
                    pc.sum(pc.cast(eq, pa.int64())).as_py() or 0)
            else:
                # generic schema: decode success + row count only
                n += t.num_rows
        return pa.table({"n": [n], "n_bad": [bad]})


def verify_files(out_dir: str, cpus_per_task: float = 1) -> dict:
    """Decode every encoded part and check extract_text(html)==text, fused
    in one task per part; returns {rows, mismatches}."""
    files = [{"path": os.path.join(out_dir, f)}
             for f in sorted(os.listdir(out_dir)) if f.endswith(".parquet")]
    nb = min(max(len(files), 1), max(4 * _cluster_cpus(), 16))
    ds = rd.from_items(files, override_num_blocks=nb)
    res = ds.map_batches(DecodeVerifyPart(), batch_size=None,
                         batch_format="pyarrow",
                         num_cpus=cpus_per_task).to_pandas()
    return {"rows": int(res["n"].sum()), "mismatches": int(res["n_bad"].sum())}


class EncodedFilterPart:
    """Task: evaluate an equality predicate on one encoded part WITHOUT
    decoding the filtered column's values (codecs/access.py pushdown),
    then decode only the requested output columns at the matching rows.
    The 100 TB shape for selective point queries over the encoded store."""

    def __init__(self, column: str, value, out_columns: list[str],
                 op: str = "eq", value2=None,
                 preds: list[tuple] | None = None, mode: str = "and"):
        # preds: normalized [(col, "eq", v, v) | (col, "range", lo, hi)]
        # combined per `mode` ("and" conjunction / "or" disjunction);
        # the single (column, op, value[, value2]) form is kept as the
        # common one-predicate spelling
        if preds is None:
            preds = [(column, op, value,
                      value if op == "eq" else value2)]
        assert mode in ("and", "or"), mode
        self.preds = preds
        self.out_columns = out_columns
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc
        from ..codecs import EncodedColumn, decode_any
        from ..codecs.base import str_to_type
        from ..codecs.access import eval_pred
        outs, out_types = [], {}
        pred_cols = {c for c, *_ in self.preds}
        needed = sorted(pred_cols | set(self.out_columns))
        for p in batch.column("path").to_pylist():
            if self.mode == "and":
                skip = _bloom_disproves(p, self.preds)
            else:
                # OR: skippable only when EVERY disjunct is bloomable
                # and each is individually disproven
                skip = all(op in ("eq", "in")
                           for _, op, *_ in self.preds) and \
                    all(_bloom_disproves(p, [pr]) for pr in self.preds)
            if skip:
                continue  # ~KB sidecar read; part parquet never touched
            # row-group pruning on the per-block layout: only the
            # filter + output columns' payload pages are read
            enc_rows = pq.read_table(p, filters=[("column", "in", needed)])
            names = enc_rows.column("column").to_pylist()
            enc_of = {}
            for i, name in enumerate(names):
                if name in pred_cols or name in self.out_columns:
                    enc_of[name] = EncodedColumn.from_row(
                        {k: enc_rows.column(k)[i].as_py() for k in
                         ("codec", "n_values", "params", "payload")})
                    enc_of[name].base_dir = os.path.dirname(p)
            if any(n not in enc_of for n in self.out_columns):
                continue  # heterogeneous store: part holds another table
            missing_pred = [c for c in pred_cols if c not in enc_of]
            if missing_pred and (self.mode == "and" or
                                 len(missing_pred) == len(pred_cols)):
                # AND: a conjunct on an absent column can never hold.
                # OR: skip only when NO disjunct column is present —
                # otherwise the part must still return rows matching
                # the disjuncts on columns it DOES have (heterogeneous
                # stores would silently lose matches).
                continue
            for name in self.out_columns:  # remember types for empty blocks
                dt = enc_of[name].params.get("dtype")
                if dt is not None:
                    out_types[name] = str_to_type(dt)
            mask = None
            for pred in self.preds:
                if pred[0] not in enc_of:
                    continue  # OR: absent-column disjunct is all-false
                m = eval_pred(enc_of[pred[0]], pred)
                if mask is None:
                    mask = m
                elif self.mode == "and":
                    mask = mask & m
                else:
                    mask = mask | m
                if self.mode == "and" and not mask.any():
                    break  # conjunction already provably empty
                if self.mode == "or" and mask.all():
                    break  # disjunction already provably full
            if not mask.any():
                continue
            sel = pa.array(np.flatnonzero(mask))
            cols = {}
            for name in self.out_columns:
                cols[name] = decode_any(enc_of[name]).take(sel)
            outs.append(pa.table(cols))
        if not outs:
            # typed empty block: derive each column's type from the
            # encoded params so schemas unify across tasks (no pa.string()
            # fallback for non-string columns)
            return pa.table(
                {n: pa.array([], type=out_types.get(n, pa.string()))
                 for n in self.out_columns})
        return pa.concat_tables(outs)


def _zone_bounds(column: str, lo, hi, zone: dict):
    """Predicate bounds in a zone's physical domain, or None if the
    value type doesn't map onto the zone kind (→ cannot prune)."""
    import datetime
    zone_kind = zone["kind"]
    if zone_kind == "i64":
        if isinstance(lo, (datetime.datetime, datetime.date)):
            # convert in the COLUMN's recorded logical type — guessing a
            # unit (us) against e.g. a timestamp[ns] zone would compare
            # microseconds to nanoseconds and prune matching parts.
            # Zones from older stores lack "dt": don't prune.
            dt = zone.get("dt")
            if dt is None:
                return None
            from ..codecs.access import _predicate_int
            try:
                return (_predicate_int(lo, dt), _predicate_int(hi, dt))
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError,
                    ValueError):
                return None
        if isinstance(lo, (int, np.integer)):
            return (int(lo), int(hi))
        return None
    if zone_kind == "f64":
        try:
            return (float(lo), float(hi))
        except (TypeError, ValueError):
            return None
    if zone_kind == "str":
        return (lo, hi) if isinstance(lo, str) else None
    return None


def _surviving_parts(out_dir: str, column: str, lo, hi) -> list[dict]:
    """Part files whose manifest zone map intersects [lo, hi].  Parts
    without a manifest entry or zone (older stores, long/binary columns)
    are kept — pruning is best-effort, never lossy."""
    zones = {}
    man_dir = os.path.join(out_dir, "_manifest")
    if os.path.isdir(man_dir):
        for m in Manifest(out_dir).load_all():
            zones[m["part_id"]] = m.get("zones", {}).get(column)
    files = []
    for f in sorted(os.listdir(out_dir)):
        if not f.endswith(".parquet"):
            continue
        part_id = f[len("part-"):-len(".parquet")] \
            if f.startswith("part-") else None
        zone = zones.get(part_id)
        if zone is not None:
            bounds = _zone_bounds(column, lo, hi, zone)
            if bounds is not None and not zone_may_match(zone, *bounds):
                continue  # provably no rows in range → never read
        files.append({"path": os.path.join(out_dir, f)})
    return files


def _all_parts(out_dir: str) -> list[dict]:
    return [{"path": os.path.join(out_dir, f)}
            for f in sorted(os.listdir(out_dir))
            if f.endswith(".parquet")]


def _prefix_upper(prefix: str) -> str | None:
    """Smallest string greater than every string with ``prefix``: the
    prefix with its last incrementable code point bumped.  None when no
    code point can be bumped (all U+10FFFF — cannot prune)."""
    for i in range(len(prefix) - 1, -1, -1):
        c = ord(prefix[i])
        if c < 0x10FFFF:
            return prefix[:i] + chr(c + 1)
    return None


def _null_survivors(out_dir: str, column: str, op: str) -> list[dict]:
    """Parts a null test may match, from manifest null counts: an
    ``isnull`` prunes parts recorded with zero nulls in the column, a
    ``notnull`` prunes parts that are entirely null.  Manifests without
    the "nulls" key (pre-null-aware stores) keep every part."""
    man_dir = os.path.join(out_dir, "_manifest")
    meta: dict[str, dict | None] = {}
    if os.path.isdir(man_dir):
        for m in Manifest(out_dir).load_all():
            meta[m["part_id"]] = m
    files = []
    for f in sorted(os.listdir(out_dir)):
        if not f.endswith(".parquet"):
            continue
        part_id = f[len("part-"):-len(".parquet")] \
            if f.startswith("part-") else None
        m = meta.get(part_id)
        if m is not None and "nulls" in m:
            nn = m["nulls"].get(column, 0)
            if op == "isnull" and nn == 0:
                continue  # provably no nulls in this part
            if op == "notnull" and nn >= m.get("rows", -1) >= 0:
                continue  # provably all-null in this part
        files.append({"path": os.path.join(out_dir, f)})
    return files


_IN_ZONE_CAP = 1024  # per-value zone tests beyond this → envelope


def _in_survivors(out_dir: str, column: str, values) -> list[dict]:
    """Parts whose zone may contain ANY of the IN-list values —
    per-value tests, not the [min, max] envelope, so a scattered value
    set (e.g. IVF probe lists {3, 47}) prunes the parts BETWEEN its
    values instead of keeping everything in the span.  One manifest
    pass regardless of len(values)."""
    zones: dict = {}
    man_dir = os.path.join(out_dir, "_manifest")
    if os.path.isdir(man_dir):
        for m in Manifest(out_dir).load_all():
            zones[m["part_id"]] = m.get("zones", {}).get(column)
    files = []
    for f in sorted(os.listdir(out_dir)):
        if not f.endswith(".parquet"):
            continue
        part_id = f[len("part-"):-len(".parquet")] \
            if f.startswith("part-") else None
        zone = zones.get(part_id)
        if zone is not None:
            hit = False
            for v in values:
                b = _zone_bounds(column, v, v, zone)
                if b is None or zone_may_match(zone, *b):
                    hit = True
                    break
            if not hit:
                continue  # every value provably outside this part
        files.append({"path": os.path.join(out_dir, f)})
    return files


def _pred_survivors(out_dir: str, pred: tuple) -> list[dict]:
    """Zone-surviving parts for one normalized predicate
    ``(col, op, lo, hi)``.  IN-lists prune per value (envelope beyond
    _IN_ZONE_CAP values); prefixes prune on the
    [prefix, successor(prefix)] string interval; null tests prune on
    manifest null counts; anything unprovable keeps every part (never
    lossy)."""
    col, op, lo, hi = pred
    if op == "in":
        if len(lo) <= _IN_ZONE_CAP:
            return _in_survivors(out_dir, col, lo)
        try:
            lo, hi = min(lo), max(lo)
        except (TypeError, ValueError):
            return _all_parts(out_dir)
    elif op == "prefix":
        hi = _prefix_upper(lo)
        if hi is None:
            return _all_parts(out_dir)
    elif op in ("isnull", "notnull"):
        return _null_survivors(out_dir, col, op)
    return _surviving_parts(out_dir, col, lo, hi)


_BLOOM_DRIVER_CAP = 4096


_BLOOM_PROBE_VALUE_CAP = 4096


def _bloom_probe_sets(preds: list[tuple]) -> list[tuple]:
    """(col, values-as-Arrow) for the bloomable predicates (eq / in).
    IN-lists beyond _BLOOM_PROBE_VALUE_CAP values are skipped: at ~1%
    per-value false-positive rate, P(any of N values hits) saturates
    toward 1 long before that, so the probe can no longer disprove
    anything and is pure driver/task overhead (measured: a 19k-key
    upsert retire probed 512 sidecars for zero prunes)."""
    out = []
    for col, op, lo, hi in preds:
        if op not in ("eq", "in"):
            continue
        vals = list(lo) if op == "in" else [lo]
        if len(vals) > _BLOOM_PROBE_VALUE_CAP:
            continue
        try:
            out.append((col, pa.array(vals)))
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError, TypeError):
            continue  # unhashable predicate type: bloom never prunes
    return out


def _bloom_disproves(path: str, preds: list[tuple]) -> bool:
    """Task-side bloom check for one part file: True when some eq/IN
    predicate provably has no match (sidecar read only, ~KB; the part's
    parquet is never opened).  Missing sidecar → False (scan)."""
    from ..state.bloom import bloom_may_contain
    base = os.path.basename(path)
    if not base.startswith("part-"):
        return False
    part_id = base[len("part-"):-len(".parquet")]
    store_dir = os.path.dirname(path)
    return any(not bloom_may_contain(store_dir, part_id, col, vals)
               for col, vals in _bloom_probe_sets(preds))


def _bloom_prune(out_dir: str, files: list[dict],
                 preds: list[tuple]) -> list[dict]:
    """Driver-side bloom probe over the zone-surviving part set
    (state/bloom.py sidecars): drops parts an eq/IN predicate provably
    misses BEFORE any task is scheduled.  Bounded at _BLOOM_DRIVER_CAP
    parts — beyond that the same probe runs distributed inside the scan
    tasks (_bloom_disproves), so the driver never reads O(parts)
    sidecars at open scale."""
    probe = _bloom_probe_sets(preds)
    if not probe or len(files) > _BLOOM_DRIVER_CAP:
        return files
    from ..state.bloom import bloom_may_contain

    def keep(f: dict) -> bool:
        base = os.path.basename(f["path"])
        if not base.startswith("part-"):
            return True
        part_id = base[len("part-"):-len(".parquet")]
        return not any(not bloom_may_contain(out_dir, part_id, col, vals)
                       for col, vals in probe)

    # sequential on purpose: ~0.5-1 ms/sidecar is Python-level zipfile
    # parsing (GIL-bound — a 16-thread pool measured 5x SLOWER), so the
    # worst case at _BLOOM_DRIVER_CAP is ~2-4 s and the cap is the
    # real bound; beyond it the probe is distributed in the scan tasks
    return [f for f in files if keep(f)]


def _typed_empty(out_dir: str, out_columns: list[str]) -> pa.Table:
    """Empty result with the SAME schema the unpruned path would
    produce: column dtypes come from any part's stored params (one
    small metadata read), falling back to string only when the store
    has no parts at all."""
    from ..codecs.base import str_to_type
    types: dict = {}
    for f in sorted(os.listdir(out_dir)):
        if not f.endswith(".parquet"):
            continue
        enc_rows = pq.read_table(os.path.join(out_dir, f),
                                 columns=["column", "params"])
        import json as _json
        for name, params in zip(enc_rows.column("column").to_pylist(),
                                enc_rows.column("params").to_pylist()):
            if name in out_columns and name not in types:
                dt = _json.loads(params).get("dtype") \
                    if isinstance(params, (str, bytes)) else None
                if dt is not None:
                    types[name] = str_to_type(dt)
        if len(types) == len(out_columns):
            break
    return pa.table({n: pa.array([], types.get(n, pa.string()))
                     for n in out_columns})


def filter_encoded(out_dir: str, column: str, value,
                   out_columns: list[str]) -> "rd.Dataset":
    """Equality predicate pushed into the encoded store: manifest zone
    maps + bloom sidecars prune whole parts driver-side (tiny JSON /
    ~KB bit arrays, no data reads), then the filter runs on packed
    codes; only matching rows of `out_columns` are decoded."""
    files = _bloom_prune(out_dir, _surviving_parts(
        out_dir, column, value, value), [(column, "eq", value, value)])
    if not files:  # every part pruned — provably empty result
        return rd.from_arrow(_typed_empty(out_dir, out_columns))
    ds = _part_scan_seed(files)
    return ds.map_batches(EncodedFilterPart(column, value, out_columns),
                          batch_size=None, batch_format="pyarrow")


def filter_encoded_multi(out_dir: str, preds: list[tuple],
                         out_columns: list[str]) -> "rd.Dataset":
    """Conjunction (AND) of eq/range predicates pushed into the encoded
    store: zone maps prune a part when ANY predicate's zone disproves
    it (intersection of per-predicate survivor sets) and bloom sidecars
    disprove eq/IN point sets, then per-part masks AND on packed codes
    and only the surviving rows of `out_columns` decode.  preds:
    normalized ``[(col, "eq", v, v) | (col, "range", lo, hi) |
    (col, "in", values, None)]``."""
    paths = None
    for pred in preds:
        surv = {f["path"] for f in _pred_survivors(out_dir, pred)}
        paths = surv if paths is None else (paths & surv)
    files = _bloom_prune(out_dir,
                         [{"path": p} for p in sorted(paths or ())], preds)
    if not files:  # every part pruned — provably empty result
        return rd.from_arrow(_typed_empty(out_dir, out_columns))
    ds = _part_scan_seed(files)
    return ds.map_batches(
        EncodedFilterPart(None, None, out_columns, preds=preds),
        batch_size=None, batch_format="pyarrow")


def filter_encoded_any(out_dir: str, preds: list[tuple],
                       out_columns: list[str]) -> "rd.Dataset":
    """Disjunction (OR) of eq/range/IN predicates pushed into the
    encoded store.  A part survives when ANY disjunct's evidence allows
    it — the survivor set is the UNION over predicates of (zone
    survivors ∩ bloom-kept) — and per-part masks OR on packed codes;
    only rows matching some disjunct decode.  preds: normalized as in
    :func:`filter_encoded_multi`."""
    keep: set[str] = set()
    for pred in preds:
        surv = _bloom_prune(out_dir, _pred_survivors(out_dir, pred),
                            [pred])
        keep |= {f["path"] for f in surv}
    if not keep:  # every disjunct disproven on every part
        return rd.from_arrow(_typed_empty(out_dir, out_columns))
    files = [{"path": p} for p in sorted(keep)]
    ds = _part_scan_seed(files)
    return ds.map_batches(
        EncodedFilterPart(None, None, out_columns, preds=preds,
                          mode="or"),
        batch_size=None, batch_format="pyarrow")


def filter_encoded_range(out_dir: str, column: str, lo, hi,
                         out_columns: list[str]) -> "rd.Dataset":
    """Range predicate (lo <= col <= hi) pushed into the encoded store:
    manifest zone maps prune whole parts first; order-preserving dict
    codes / FOR deltas make the residual a code-interval test
    (codecs/access.py::filter_range) — only matching rows decode."""
    files = _surviving_parts(out_dir, column, lo, hi)
    if not files:  # every part pruned — provably empty result
        return rd.from_arrow(_typed_empty(out_dir, out_columns))
    ds = _part_scan_seed(files)
    return ds.map_batches(
        EncodedFilterPart(column, lo, out_columns, op="range", value2=hi),
        batch_size=None, batch_format="pyarrow")


class SpotCheckPart:
    """Task: sample k rows of one encoded part, read each via O(1) point
    access (codecs/access.py) and compare against the original cells
    re-read from the manifested input slice — verification that never
    decodes whole blocks (SeqVector::get-style sampling)."""

    def __init__(self, out_dir: str, k: int = 8):
        self.out_dir = out_dir
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        from ..codecs import EncodedColumn
        from ..codecs.access import get_value
        n_checked = n_bad = 0
        man = Manifest(self.out_dir)
        for part_id in batch.column("part_id").to_pylist():
            meta = man.load(part_id)
            if not meta.get("input"):
                # no input lineage to compare against: parts written by
                # the Dataset sink / cluster writers, or rewritten by
                # delete_where (rows diverged from the source slice)
                continue
            pf = pq.ParquetFile(meta["input"])
            orig = pf.read_row_groups(
                list(range(meta["rg_start"], meta["rg_end"] + 1)))
            enc_rows = pq.read_table(
                os.path.join(self.out_dir, f"part-{part_id}.parquet"))
            if orig.num_rows == 0:
                continue  # nothing to sample in an empty partition
            # stable digest seed: hash(str) is salted per process
            # (PYTHONHASHSEED), which would sample different rows on
            # every worker/run — not reproducible verification
            import hashlib as _hl
            seed = int.from_bytes(
                _hl.sha1(part_id.encode()).digest()[:4], "little")
            rng = np.random.default_rng(seed)
            rows = rng.integers(0, orig.num_rows,
                                size=min(self.k, orig.num_rows))
            for i in range(enc_rows.num_rows):
                name = enc_rows.column("column")[i].as_py()
                enc = EncodedColumn.from_row(
                    {k: enc_rows.column(k)[i].as_py() for k in
                     ("codec", "n_values", "params", "payload")})
                col = orig.column(name)
                for r in rows:
                    n_checked += 1
                    if get_value(enc, int(r)) != col[int(r)].as_py():
                        n_bad += 1
        return pa.table({"n": [n_checked], "n_bad": [n_bad]})


def spot_check_files(out_dir: str, k: int = 8) -> dict:
    """Sampled point-access verification across all encoded parts."""
    parts = [{"part_id": p} for p in sorted(Manifest(out_dir).done_parts())]
    ds = rd.from_items(parts, override_num_blocks=max(len(parts), 1))
    res = ds.map_batches(SpotCheckPart(out_dir, k), batch_size=1,
                         batch_format="pyarrow").to_pandas()
    return {"checked": int(res["n"].sum()),
            "mismatches": int(res["n_bad"].sum())}


def verify_url_text_invariant(decoded: "rd.Dataset") -> dict:
    """The reference-parity invariant: extract_text(html) == text,
    byte-identical, per url (BASELINE.json input_hint).  Vectorized
    per-batch; global result is a cheap aggregate of counts."""
    from ..sources.webtext import extract_text_batch

    def check(batch: pa.Table) -> pa.Table:
        html = batch.column("html")
        if isinstance(html, pa.ChunkedArray):
            html = html.combine_chunks()
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        got = extract_text_batch(html)
        import pyarrow.compute as pc
        eq = pc.equal(got.cast(pa.large_string()),
                      text.cast(pa.large_string()))
        n_bad = len(eq) - int(pc.sum(pc.cast(eq, pa.int64())).as_py() or 0)
        return pa.table({"n": [len(eq)], "n_bad": [n_bad]})

    res = decoded.map_batches(check, batch_format="pyarrow").to_pandas()
    return {"rows": int(res["n"].sum()), "mismatches": int(res["n_bad"].sum())}

#!/usr/bin/env python
"""Genomics k-mer counting benchmark (the reference's own domain).

Deterministic workload: sample READ_LEN-bp reads from a GENOME_MBP
synthetic genome, count canonical k-mers at k=31 with each strategy,
assert all strategies recover the same distinct-k-mer count, print one
JSON line per strategy.

    python scripts/bench_genomics.py [--reads 1360000] [--strategies tree minimizer]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

GENOME_MBP = 5
READ_LEN = 150


def make_reads_parquet(out_dir: str, n_reads: int, n_parts: int = 32,
                       seed: int = 7) -> list[str]:
    import pyarrow as pa
    import pyarrow.parquet as pq
    os.makedirs(out_dir, exist_ok=True)
    genome = np.random.default_rng(seed).integers(
        0, 4, GENOME_MBP * 1_000_000, dtype=np.uint8)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    paths = []
    per = n_reads // n_parts
    for p in range(n_parts):
        path = os.path.join(out_dir, f"reads-{p:03d}.parquet")
        paths.append(path)
        if os.path.exists(path):
            continue
        # per-part child seed: a shared stream would make a partially
        # cached directory regenerate DIFFERENT (and duplicated) reads
        rng = np.random.default_rng((seed, p))
        starts = rng.integers(0, len(genome) - READ_LEN, per)
        idx = starts[:, None] + np.arange(READ_LEN)[None, :]
        chars = lut[genome[idx]]
        offs = np.arange(per + 1, dtype=np.int32) * READ_LEN
        seqs = pa.Array.from_buffers(
            pa.string(), per,
            [None, pa.py_buffer(offs.tobytes()),
             pa.py_buffer(np.ascontiguousarray(chars).tobytes())])
        pq.write_table(pa.table({"seq": seqs}), path)
    return paths


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=1_360_000)
    ap.add_argument("--k", type=int, default=31)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--strategies", nargs="+",
                    default=["tree", "minimizer"])
    args = ap.parse_args()

    os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")
    import ray
    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, logging_level="ERROR",
             object_store_memory=4 << 30,
             runtime_env={"env_vars": {
                 "ARROW_DEFAULT_MEMORY_POOL": "system"}})
    import ray.data as rd
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from packcol.pipelines.kmers import count_canonical_kmers
    n_parts = 32
    paths = make_reads_parquet(f"/tmp/packcol_genomics_v2_{args.reads}",
                               args.reads, n_parts=n_parts)
    n_written = (args.reads // n_parts) * n_parts  # actual corpus size
    raw = sum(os.path.getsize(p) for p in paths)

    distinct = {}
    for strat in args.strategies:
        ds = rd.read_parquet(paths)
        t0 = time.perf_counter()
        out = count_canonical_kmers(ds, "seq", args.k, strategy=strat)
        n_distinct = out.count()
        dt = time.perf_counter() - t0
        distinct[strat] = n_distinct
        windows = n_written * (READ_LEN - args.k + 1)
        print(json.dumps({
            "strategy": strat, "sec": round(dt, 2),
            "n_distinct": n_distinct, "reads": n_written,
            "raw_mb": raw >> 20, "k": args.k,
            "mwindows_per_s": round(windows / dt / 1e6, 2),
            "num_cpus": args.num_cpus}))
    assert len(set(distinct.values())) == 1, distinct
    ray.shutdown()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Shared-vocab soak: 1 GB webtext through the FULL checkpointed
pipeline with shared_vocab_columns=["html", "text"] — encode,
decode-verify, kill-resume (sidecar must be reused, not rebuilt), and
recompaction.  Prints one JSON line for BASELINE.md (VERDICT r3 item 4).

Usage: python scripts/soak_shared_vocab.py [--rows 480000] [--cpus 32]
"""
from __future__ import annotations

import argparse
import json
import os
import random
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return round(time.perf_counter() - t0, 3), out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=480_000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level="ERROR",
                 object_store_memory=4 << 30)
    import logging
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from packcol.pipelines.compact import recompact
    from packcol.pipelines.encode_pipeline import (decode_files,
                                                   encode_files,
                                                   verify_files)
    from packcol.pipelines.encode_pipeline import verify_url_text_invariant
    from packcol.sources.webtext import write_webtext
    from packcol.stages.toksep_actor import SHARED_DIR

    wt_dir = f"/tmp/packcol_soak/webtext_{args.rows}"
    enc_dir = "/dev/shm/packcol_soak/encoded_sv"
    rc_dir = "/dev/shm/packcol_soak/recompacted_sv"
    out: dict = {"rows": args.rows, "num_cpus": args.cpus}

    paths = write_webtext(wt_dir, n_rows=args.rows,
                          n_parts=max(args.rows // 3750, 4),
                          seed=42, use_ray=True)
    shutil.rmtree(enc_dir, ignore_errors=True)

    # --- encode with shared vocabulary -----------------------------------
    t, m = timed(lambda: encode_files(
        paths, enc_dir, resume=True, target_bytes=4 << 20,
        shared_vocab_columns=["html", "text"]))
    out.update(encode_s=t, parts=m["parts"],
               logical_bytes=m["orig_bytes"], enc_bytes=m["enc_bytes"],
               ratio=m["ratio"],
               encode_GBps=round(m["orig_bytes"] / t / 1e9, 3))

    # --- decode-verify ----------------------------------------------------
    t, inv = timed(lambda: verify_files(enc_dir))
    assert inv["mismatches"] == 0, inv
    out.update(verify_s=t, verify_rows=inv["rows"], mismatches=0,
               decode_GBps=round(m["orig_bytes"] / t / 1e9, 3))

    # --- kill-resume: delete random parts + manifest records --------------
    files = [f for f in os.listdir(enc_dir) if f.endswith(".parquet")]
    rng = random.Random(7)
    killed = rng.sample(files, min(35, len(files) // 2))
    for f in killed:
        os.remove(os.path.join(enc_dir, f))
        pid = f[len("part-"):-len(".parquet")]
        mp = os.path.join(enc_dir, "_manifest", f"{pid}.json")
        if os.path.exists(mp):
            os.remove(mp)
    vocab_dir = os.path.join(enc_dir, SHARED_DIR)
    vocab_stat = {f: os.stat(os.path.join(vocab_dir, f)).st_mtime_ns
                  for f in os.listdir(vocab_dir)}
    t, m2 = timed(lambda: encode_files(
        paths, enc_dir, resume=True, target_bytes=4 << 20,
        shared_vocab_columns=["html", "text"]))
    # exactly the killed parts re-encoded; sidecar reused byte-for-byte
    assert m2["skipped_parts"] == m["parts"] - len(killed), m2
    assert m2["parts"] == m["parts"], m2
    vocab_stat2 = {f: os.stat(os.path.join(vocab_dir, f)).st_mtime_ns
                   for f in os.listdir(vocab_dir)}
    assert vocab_stat == vocab_stat2, "vocabulary sidecar was rebuilt"
    t2v, inv2 = timed(lambda: verify_files(enc_dir))
    assert inv2["mismatches"] == 0, inv2
    out.update(resume_s=t, resume_reencoded_parts=len(killed),
               resume_skipped_parts=m2["skipped_parts"],
               resume_verify_s=t2v, sidecar_reused=True)

    # --- recompaction (merged parts become self-describing) ---------------
    shutil.rmtree(rc_dir, ignore_errors=True)
    os.makedirs(rc_dir, exist_ok=True)
    t, rc = timed(lambda: recompact(enc_dir, rc_dir, merge_factor=4))
    out.update(recompact_s=t, recompact_parts=rc["parts"],
               recompact_ratio=rc["ratio"])
    t, inv3 = timed(lambda: verify_url_text_invariant(
        decode_files(rc_dir)))
    assert inv3["mismatches"] == 0, inv3
    out.update(recompact_verify_s=t)

    ray.shutdown()
    shutil.rmtree(enc_dir, ignore_errors=True)
    shutil.rmtree(rc_dir, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

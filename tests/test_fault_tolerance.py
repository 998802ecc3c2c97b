"""Worker-crash retry: encode tasks are idempotent pure functions of the
descriptor, so Ray's task retry recovers a killed worker transparently
and the output is byte-identical to an undisturbed run."""

import os

import pyarrow as pa
import pytest

from packcol.sources.webtext import write_webtext
from packcol.stages._testing import CrashingWriter


def test_encode_survives_worker_crash(ray_session, tmp_path):
    import ray.data as rd
    from packcol.pipelines.encode_pipeline import (plan_partitions,
                                                   verify_files)
    wt = str(tmp_path / "wt")
    paths = write_webtext(wt, n_rows=3000, n_parts=3, seed=42)
    out = str(tmp_path / "enc")
    os.makedirs(out, exist_ok=True)
    parts = plan_partitions(paths, 1 << 20)
    victim = parts[len(parts) // 2]["part_id"]
    flag = str(tmp_path / "crashed.flag")

    ds = rd.from_items(parts, override_num_blocks=len(parts))
    metrics = ds.map_batches(
        CrashingWriter(out, flag, victim), batch_size=1,
        batch_format="pyarrow").to_pandas()
    assert os.path.exists(flag), "crash did not trigger"
    assert set(metrics["part_id"]) == {p["part_id"] for p in parts}
    assert verify_files(out) == {"rows": 3000, "mismatches": 0}

    # and byte-identical to an undisturbed encode of the same partitions
    from packcol.pipelines.encode_pipeline import encode_files
    out2 = str(tmp_path / "enc2")
    encode_files(paths, out2, target_bytes=1 << 20)
    a = open(os.path.join(out, f"part-{victim}.parquet"), "rb").read()
    b = open(os.path.join(out2, f"part-{victim}.parquet"), "rb").read()
    assert a == b

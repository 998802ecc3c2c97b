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

    # and byte-identical to an undisturbed run of the same writer
    # (encode_files additionally applies the store-level selection
    # sidecar as overrides, so the apples-to-apples comparison for
    # retry idempotence is the raw writer path)
    from packcol.pipelines.encode_pipeline import EncodePartitionWriter
    out2 = str(tmp_path / "enc2")
    os.makedirs(out2, exist_ok=True)
    rd.from_items(parts, override_num_blocks=len(parts)).map_batches(
        EncodePartitionWriter(out2), batch_size=1,
        batch_format="pyarrow").to_pandas()
    a = open(os.path.join(out, f"part-{victim}.parquet"), "rb").read()
    b = open(os.path.join(out2, f"part-{victim}.parquet"), "rb").read()
    assert a == b


def test_encode_files_deterministic_with_selection_sidecar(ray_session,
                                                           tmp_path):
    """Two independent encode_files runs (each building its own
    store-level selection sidecar from the same inputs) produce
    byte-identical parts — selection is a pure function of the sample,
    so resume after losing BOTH a part and the sidecar still re-encodes
    identically."""
    from packcol.pipelines.encode_pipeline import encode_files
    wt = str(tmp_path / "wt")
    paths = write_webtext(wt, n_rows=3000, n_parts=3, seed=42)
    out1, out2 = str(tmp_path / "e1"), str(tmp_path / "e2")
    encode_files(paths, out1, target_bytes=1 << 20)
    encode_files(paths, out2, target_bytes=1 << 20)
    sel1 = open(os.path.join(out1, "_selection", "codecs.json")).read()
    sel2 = open(os.path.join(out2, "_selection", "codecs.json")).read()
    assert sel1 == sel2
    parts1 = sorted(f for f in os.listdir(out1) if f.endswith(".parquet"))
    assert parts1 == sorted(
        f for f in os.listdir(out2) if f.endswith(".parquet"))
    for f in parts1:
        assert open(os.path.join(out1, f), "rb").read() == \
            open(os.path.join(out2, f), "rb").read(), f
    # kill a part AND the selection sidecar: resume re-derives both
    victim = parts1[1]
    os.remove(os.path.join(out1, victim))
    pid = victim[len("part-"):-len(".parquet")]
    os.remove(os.path.join(out1, "_manifest", f"{pid}.json"))
    os.remove(os.path.join(out1, "_selection", "codecs.json"))
    m = encode_files(paths, out1, target_bytes=1 << 20, resume=True)
    assert m["encoded_rows_this_run"] > 0
    assert open(os.path.join(out1, victim), "rb").read() == \
        open(os.path.join(out2, victim), "rb").read()

"""Test-support stages (importable by Ray workers)."""

import os

import pyarrow as pa


class CrashingWriter:
    """EncodePartitionWriter wrapper that kills its worker process the
    first time it sees the marked partition (flag file = die-once
    latch).  Used by the fault-tolerance test."""

    def __init__(self, out_dir, flag_path, victim_part):
        from ..pipelines.encode_pipeline import EncodePartitionWriter
        self.inner = EncodePartitionWriter(out_dir)
        self.flag_path = flag_path
        self.victim = victim_part

    def __call__(self, batch: pa.Table) -> pa.Table:
        pids = batch.column("part_id").to_pylist()
        if self.victim in pids and not os.path.exists(self.flag_path):
            open(self.flag_path, "w").close()
            os._exit(1)  # simulate worker death mid-task
        return self.inner(batch)

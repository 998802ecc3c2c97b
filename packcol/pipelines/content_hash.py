"""Order-insensitive dataset equality without any shuffle.

``dataset_content_hash`` reduces a Dataset to one 64-bit value: the
mod-2^64 sum of per-row hashes (row hash = mix of all column value
hashes).  Sums commute, so the result is independent of row order and
partitioning — two datasets holding the same multiset of rows hash
equal no matter how they are partitioned.  This is the cross-partition
decode-verify the survey calls for ("cross-check via groupby(url) when
partitions differ") with an O(1) result and zero data movement: each
batch contributes one partial sum.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..stages.profile import value_hashes
from ..functions.text import _splitmix64


def batch_row_hashes(batch: pa.Table) -> np.ndarray:
    """64-bit hash per row combining every column (null-aware).

    Column hashes are chained NON-commutatively per row
    (acc = splitmix64(acc * P + cell_hash) over sorted column names) so
    the row hash depends on which value sits in which column of the
    same row — a permutation of values within a column changes the
    dataset hash even though the per-column multisets are unchanged."""
    n = batch.num_rows
    P = np.uint64(0x100000001B3)  # FNV-ish odd multiplier
    acc = np.full(n, 0x243F6A8885A308D3, dtype=np.uint64)  # pi seed
    for name in sorted(batch.column_names):
        col = batch.column(name)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        h = np.zeros(n, dtype=np.uint64)
        if col.null_count < n:
            valid = col.is_valid().to_numpy(zero_copy_only=False) \
                if col.null_count else np.ones(n, dtype=bool)
            h[valid] = value_hashes(col)
        # null slots keep 0; mix with a per-column salt so column
        # identity matters
        salt = _splitmix64(np.frombuffer(
            name.encode().ljust(8, b"\0")[:8], dtype=np.uint64))
        with np.errstate(over="ignore"):
            acc = _splitmix64(acc * P + (h ^ salt))
    return acc


def dataset_content_hash(ds) -> int:
    """One u64 for the whole Dataset; equal ⇔ same multiset of rows."""

    def partial(batch: pa.Table) -> pa.Table:
        with np.errstate(over="ignore"):
            s = np.uint64(batch_row_hashes(batch).sum(dtype=np.uint64))
        return pa.table({"h": np.array([s], dtype=np.uint64).view(np.int64),
                         "n": pa.array([batch.num_rows], type=pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    total = np.uint64(0)
    with np.errstate(over="ignore"):
        for v in parts["h"].to_numpy().view(np.uint64):
            total += v
    return int(total), int(parts["n"].sum())


def datasets_equal(a, b) -> bool:
    ha, na = dataset_content_hash(a)
    hb, nb = dataset_content_hash(b)
    return ha == hb and na == nb

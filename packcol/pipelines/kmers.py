"""Distributed canonical k-mer counting — the reference library's core
use-case expressed Ray-Data-first.

The reference provides the per-value kernels (scan, canonicalize, pack:
/root/reference/src/naive_impl/canonical_kmer_iterator.rs,
kmer.rs:55-74) and leaves scaling to the caller (SURVEY §4).  Here the
caller is a Dataset pipeline with the combiner pattern: each batch
reduces its sequences to (canonical kmer, partial count) rows via the
vectorized column scan, and only those tiny partials shuffle through
``groupby(kmer)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.dna import canonical_kmer_scan_batch, decode_kmer


def count_canonical_kmers(ds, seq_col: str = "text", k: int = 31):
    """Dataset of (kmer:string, n:int64): counts of canonical k-mers over
    all ACGT-alphabet windows of `seq_col` (invalid symbols skipped,
    case-insensitive — reference iterator semantics)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column(seq_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        _, _, canon, _ = canonical_kmer_scan_batch(col, k)
        if len(canon) == 0:
            return pa.table({"kmer": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        vals, counts = np.unique(canon, return_counts=True)
        return pa.table({
            "kmer": pa.array([decode_kmer(int(w), k) for w in vals]),
            "n": counts.astype(np.int64)})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return partials.groupby("kmer").aggregate(Sum("n", alias_name="n"))

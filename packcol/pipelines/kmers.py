"""Distributed canonical k-mer counting — the reference library's core
use-case expressed Ray-Data-first.

The reference provides the per-value kernels (scan, canonicalize, pack:
/root/reference/src/naive_impl/canonical_kmer_iterator.rs,
kmer.rs:55-74) and leaves scaling to the caller (SURVEY §4).  Here the
caller is a Dataset pipeline with the combiner pattern: each batch
reduces its sequences to (canonical word, partial count) rows via the
vectorized column scan; partials are merged either by a log2(P)
tree of pairwise vectorized merges (default — mergeable partials, no
shuffle) or by ``groupby`` (open-ended key spaces).  K-mer strings are
materialized vectorized only in the final projection.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.dna import canonical_kmer_scan_batch, decode_kmer_batch


def _merge_counts(a: "pa.Table", b: "pa.Table") -> "pa.Table":
    """Merge two (w, n) partial count tables, vectorized."""
    w = np.concatenate([a.column("w").to_numpy(zero_copy_only=False),
                        b.column("w").to_numpy(zero_copy_only=False)])
    n = np.concatenate([a.column("n").to_numpy(zero_copy_only=False),
                        b.column("n").to_numpy(zero_copy_only=False)])
    order = np.argsort(w, kind="stable")
    w, n = w[order], n[order]
    first = np.ones(len(w), dtype=bool)
    first[1:] = w[1:] != w[:-1]
    starts = np.flatnonzero(first)
    sums = np.add.reduceat(n, starts) if len(starts) else n[:0]
    return pa.table({"w": w[starts], "n": sums.astype(np.int64)})


def count_canonical_kmers(ds, seq_col: str = "text", k: int = 31,
                          strategy: str = "tree",
                          partial_batch_size: int = 131072):
    """Dataset of (kmer:string, n:int64): counts of canonical k-mers over
    all ACGT-alphabet windows of `seq_col` (invalid symbols skipped,
    case-insensitive — reference iterator semantics).

    strategy="tree" (default): partial tables are mergeable, so a
    log2(P) tree of pairwise vectorized merges through the object store
    replaces the groupby shuffle; appropriate while the merged result
    fits one node (bounded key sets — small k or genome-bounded).
    strategy="groupby": all-to-all shuffle on the 8-byte packed word;
    scales to open-ended key spaces (result stays distributed)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column(seq_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        _, _, canon, _ = canonical_kmer_scan_batch(col, k)
        if len(canon) == 0:
            return pa.table({"w": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        vals, counts = np.unique(canon, return_counts=True)
        return pa.table({"w": vals.view(np.int64),
                         "n": counts.astype(np.int64)})

    # large batches: the bigger the batch, the more duplicate k-mers
    # collapse in the partial (combiner) stage before anything moves
    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=partial_batch_size,
                              zero_copy_batch=True)

    def to_strings(batch: pa.Table) -> pa.Table:
        w = batch.column("w").to_numpy(zero_copy_only=False).view(np.uint64)
        return pa.table({"kmer": decode_kmer_batch(w, k),
                         "n": batch.column("n")})

    if strategy == "groupby":
        agg = partials.groupby("w").aggregate(Sum("n", alias_name="n"))
        return agg.map_batches(to_strings, batch_format="pyarrow")

    # tree path: raw Ray tasks, because the Dataset API cannot express a
    # tree-reduce over mergeable partial tables
    import ray
    import ray.data as rd

    @ray.remote
    def merge2(a, b):
        return _merge_counts(a, b)

    refs = []
    for b in partials.iter_batches(batch_size=None, batch_format="pyarrow"):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        refs.append(ray.put(t))
    if not refs:
        return rd.from_arrow(pa.table({"kmer": pa.array([], pa.string()),
                                       "n": pa.array([], pa.int64())}))
    while len(refs) > 1:
        nxt = [merge2.remote(refs[i], refs[i + 1])
               for i in range(0, len(refs) - 1, 2)]
        if len(refs) % 2:
            nxt.append(refs[-1])
        refs = nxt
    merged = refs[0]
    if not isinstance(merged, pa.Table):
        merged = ray.get(merged)
    return rd.from_arrow(to_strings(merged))

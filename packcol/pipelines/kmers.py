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

from ..functions.dna import (K_MAX, canonical_kmer_scan_batch,
                             canonical_kmer_scan_batch_multi,
                             canonical_space, decode_kmer_batch,
                             decode_kmer_batch_multi, n_words_for_k)


def _wcols(B: int) -> list[str]:
    return [f"w{j}" for j in range(B)]


def _merge_counts(a: "pa.Table", b: "pa.Table") -> "pa.Table":
    """Merge two (w..., n) partial count tables, vectorized.  Key is one
    column ("w") for k≤32 or B word columns ("w0".."w{B-1}") for k>32."""
    keys = [c for c in a.column_names if c != "n"]
    cols = [np.concatenate([a.column(c).to_numpy(zero_copy_only=False),
                            b.column(c).to_numpy(zero_copy_only=False)])
            for c in keys]
    n = np.concatenate([a.column("n").to_numpy(zero_copy_only=False),
                        b.column("n").to_numpy(zero_copy_only=False)])
    order = np.lexsort(cols[::-1]) if len(cols) > 1 else \
        np.argsort(cols[0], kind="stable")
    cols = [c[order] for c in cols]
    n = n[order]
    first = np.ones(len(n), dtype=bool)
    if len(n) > 1:
        diff = np.zeros(len(n) - 1, dtype=bool)
        for c in cols:
            diff |= c[1:] != c[:-1]
        first[1:] = diff
    starts = np.flatnonzero(first)
    sums = np.add.reduceat(n, starts) if len(starts) else n[:0]
    out = {c: col[starts] for c, col in zip(keys, cols)}
    out["n"] = sums.astype(np.int64)
    return pa.table(out)


def choose_kmer_strategy(ds, k: int, *, encoding=None,
                         tree_key_cap: int = 4_000_000) -> str:
    """Cardinality-estimated strategy selection (removes the "caller
    must know to switch at scale" trap): the distinct-key count is
    bounded above by BOTH canonical_space(k) (the C1/C2 key-space math,
    reference src/utils.rs semantics) and the input byte size (every
    k-mer window starts at a distinct byte, so #windows < #bytes).

    * bound <= tree_key_cap (merged result provably fits one node:
      ~16 B/key for k<=32) -> "tree" (no shuffle at all);
    * else "minimizer" (substrings shuffle, one bucket per canonical
      k-mer) unless an alternate symbol encoding is in play (the
      minimizer path is 2-bit-canonical only) -> "groupby".

    ``ds.size_bytes()`` is metadata-free for plain file reads; for
    derived datasets it may be unknown (None) — then only the key-space
    bound applies (conservative: unknown-size inputs with open key
    spaces go to the shuffle paths, whose failure mode is slowness,
    not a driver OOM)."""
    space = canonical_space(k)
    bound = space
    try:
        est = ds.size_bytes()
    except Exception:  # noqa: BLE001 — unknown size: key-space bound only
        est = None
    if est:
        bound = min(bound, est)
    if bound <= tree_key_cap:
        return "tree"
    return "groupby" if encoding is not None else "minimizer"


def count_canonical_kmers(ds, seq_col: str = "text", k: int = 31,
                          strategy: str = "auto",
                          partial_batch_size: int = 49152,
                          encoding=None):
    """Dataset of (kmer:string, n:int64): counts of canonical k-mers over
    all ACGT-alphabet windows of `seq_col` (invalid symbols skipped,
    case-insensitive — reference iterator semantics).

    strategy="auto" (default): pick via choose_kmer_strategy —
    cardinality-bounded inputs go "tree", open key spaces go
    "minimizer"/"groupby".

    strategy="tree": partial tables are mergeable, so a
    log2(P) tree of pairwise vectorized merges through the object store
    replaces the groupby shuffle; appropriate while the merged result
    fits one node (bounded key sets — small k or genome-bounded).
    strategy="groupby": all-to-all shuffle on the 8-byte packed word;
    scales to open-ended key spaces (result stays distributed).

    strategy="minimizer" (any k; w ≤ 31): the at-scale shuffle-reduction path —
    sequences are cut into super-k-mers keyed by the strand-canonical
    minimizer (functions/minimizers.py, generalizing the reference's
    SeqVecMinimizerIter S3), so what shuffles is substrings (~1-4 B per
    k-mer amortized) instead of per-k-mer rows, and each canonical
    k-mer lands in exactly ONE bucket — per-bucket counts are final,
    no second shuffle.

    k > 32 uses the multi-word kernels (generic Kmer<P,K,B> parity,
    src/kmer.rs:12-14): keys become B int64 word columns w0..w{B-1}.

    `encoding` selects one of the reference's user-facing symbol->code
    tables (the 24 Naive permutations / "xor10",
    functions/dna_encodings.py); supported on the k<=32 scan path."""
    from ray.data.aggregate import Sum
    from ..functions.dna import _resolve_encoding

    enc = _resolve_encoding(encoding)
    if strategy == "auto":
        strategy = choose_kmer_strategy(ds, k, encoding=enc)
    if enc is not None and (k > K_MAX or strategy == "minimizer"):
        raise ValueError(
            "alternate encodings are supported for k <= 32 on the "
            "tree/groupby strategies")

    if strategy == "minimizer":
        return _count_via_minimizer_buckets(ds, seq_col, k,
                                            partial_batch_size)

    B = n_words_for_k(k)
    multi = k > K_MAX
    wcols = _wcols(B) if multi else ["w"]

    def _empty() -> pa.Table:
        t = {c: pa.array([], pa.int64()) for c in wcols}
        t["n"] = pa.array([], pa.int64())
        return pa.table(t)

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column(seq_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if multi:
            _, _, canon, _ = canonical_kmer_scan_batch_multi(col, k)
            if len(canon) == 0:
                return _empty()
            vals, counts = np.unique(canon, axis=0, return_counts=True)
            out = {c: vals[:, j].view(np.int64)
                   for j, c in enumerate(wcols)}
            out["n"] = counts.astype(np.int64)
            return pa.table(out)
        _, _, canon, _ = canonical_kmer_scan_batch(col, k, encoding=enc)
        if len(canon) == 0:
            return _empty()
        vals, counts = np.unique(canon, return_counts=True)
        return pa.table({"w": vals.view(np.int64),
                         "n": counts.astype(np.int64)})

    # large batches: the bigger the batch, the more duplicate k-mers
    # collapse in the partial (combiner) stage before anything moves
    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=partial_batch_size,
                              zero_copy_batch=True)

    def to_strings(batch: pa.Table) -> pa.Table:
        if multi:
            w = np.stack([batch.column(c).to_numpy(zero_copy_only=False)
                          .view(np.uint64) for c in wcols], axis=1) \
                if batch.num_rows else np.empty((0, B), np.uint64)
            return pa.table({"kmer": decode_kmer_batch_multi(w, k),
                             "n": batch.column("n")})
        w = batch.column("w").to_numpy(zero_copy_only=False).view(np.uint64)
        dec = None if enc is None else enc.dec_table
        return pa.table({"kmer": decode_kmer_batch(w, k, dec_table=dec),
                         "n": batch.column("n")})

    if strategy == "groupby":
        agg = partials.groupby(wcols).aggregate(Sum("n", alias_name="n"))
        return agg.map_batches(to_strings, batch_format="pyarrow")

    # tree path: raw Ray tasks, because the Dataset API cannot express a
    # tree-reduce over mergeable partial tables.  Leaves are the
    # Dataset's own object-store block refs — partials never pass
    # through the driver (no iter_batches + re-put funnel).
    import ray
    import ray.data as rd

    @ray.remote
    def merge2(a, b):
        return _merge_counts(a, b)

    refs = list(partials.to_arrow_refs())
    if not refs:
        return rd.from_arrow(pa.table({"kmer": pa.array([], pa.string()),
                                       "n": pa.array([], pa.int64())}))
    while len(refs) > 1:
        nxt = [merge2.remote(refs[i], refs[i + 1])
               for i in range(0, len(refs) - 1, 2)]
        if len(refs) % 2:
            nxt.append(refs[-1])
        refs = nxt
    single_leaf = len(refs) == 1  # merge loop never ran
    merged = refs[0]
    if not isinstance(merged, pa.Table):
        merged = ray.get(merged)
    if single_leaf:
        # one block can still hold duplicate keys: Ray may coalesce
        # several per-batch unique tables into a single output block —
        # self-collapse so counts aren't split across duplicate rows
        merged = _merge_counts(merged, _empty())
    # decode packed words → k-mer strings DISTRIBUTED: a 5M-row result
    # is ~15 s of string building on one core — slice the merged table
    # and fan the decode out instead of running it on the driver
    n_rows = merged.num_rows
    if n_rows < 65536:
        return rd.from_arrow(to_strings(merged))
    n_slices = 32
    step = -(-n_rows // n_slices)
    slices = [merged.slice(i * step, step)
              for i in range(n_slices) if i * step < n_rows]
    return rd.from_arrow_refs([ray.put(s) for s in slices]) \
        .map_batches(to_strings, batch_format="pyarrow",
                     zero_copy_batch=True)


def _count_via_minimizer_buckets(ds, seq_col: str, k: int,
                                 partial_batch_size: int,
                                 w: int | None = None,
                                 n_buckets: int = 256):
    """Super-k-mer counting: map_batches cuts each sequence into spans
    keyed by strand-canonical minimizer → groupby(bucket) shuffles the
    spans (substrings, not per-kmer rows) → per-bucket scan + count is
    FINAL (each canonical k-mer maps to exactly one minimizer value,
    hence one bucket)."""
    from ..codecs.fsst import buffer_view
    from ..functions.minimizers import canonical_superkmer_spans_batch

    multi = k > K_MAX
    w = w or max(min(k // 2, 31), min(11, k))

    def spans(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        col = batch.column(seq_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if col.null_count:  # fill BEFORE buffer_view so offsets align
            col = pc.fill_null(col, "")
        key, row, start, end = canonical_superkmer_spans_batch(col, k, w)
        if len(key) == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "sk": pa.array([], pa.large_string())})
        d, offs = buffer_view(col)
        # ONE row per (task, bucket): all of a bucket's spans concatenated
        # with a NUL separator (invalid symbol in every table, so the
        # scan's invalid-window skip doubles as the span boundary — same
        # guard canonical_kmer_scan_batch uses between rows).  The
        # groupby below then shuffles ~tasks*n_buckets fat rows instead
        # of millions of span rows: identical bytes, but the sort-based
        # shuffle cost stops being per-span (~130k rows/s wall).
        bucket = (key % np.uint64(n_buckets)).astype(np.int64)
        order = np.argsort(bucket, kind="stable")
        bucket_s = bucket[order]
        lens = (end - start).astype(np.int64)[order]
        abs_start = (offs[row] + start)[order]
        nsp = len(order)
        csum = np.zeros(nsp + 1, dtype=np.int64)
        np.cumsum(lens, out=csum[1:])
        src = np.arange(csum[-1], dtype=np.int64) \
            - np.repeat(csum[:-1], lens) + np.repeat(abs_start, lens)
        blob = np.zeros(csum[-1] + nsp, dtype=np.uint8)  # 0 = separator
        dst = np.arange(csum[-1], dtype=np.int64) \
            + np.repeat(np.arange(nsp, dtype=np.int64), lens)
        blob[dst] = d[src]
        ub, first = np.unique(bucket_s, return_index=True)
        row_offs = np.concatenate([csum[first] + first,
                                   [csum[-1] + nsp]]).astype(np.int64)
        sk = pa.Array.from_buffers(
            pa.large_string(), len(ub),
            [None, pa.py_buffer(row_offs.tobytes()),
             pa.py_buffer(blob.tobytes())])
        return pa.table({"bucket": ub, "sk": sk})

    def count_group(group: pa.Table) -> pa.Table:
        col = group.column("sk")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        empty = pa.table({"kmer": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if multi:  # k > 32: multi-word scan/decode inside the bucket
            _, _, canon, _ = canonical_kmer_scan_batch_multi(col, k)
            if len(canon) == 0:
                return empty
            vals, counts = np.unique(canon, axis=0, return_counts=True)
            return pa.table({"kmer": decode_kmer_batch_multi(vals, k),
                             "n": counts.astype(np.int64)})
        _, _, canon, _ = canonical_kmer_scan_batch(col, k)
        if len(canon) == 0:
            return empty
        vals, counts = np.unique(canon, return_counts=True)
        return pa.table({"kmer": decode_kmer_batch(vals, k),
                         "n": counts.astype(np.int64)})

    # Small batches here, deliberately NOT partial_batch_size: the span
    # scan allocates ~10 temporaries per window, so a 49k-row batch blows
    # the cache (measured 65 us/row vs 21 us/row at 3k rows on this box)
    # AND collapses the stage to 2-3 tasks.  Per-bucket concatenation
    # means shuffle row count stays tiny regardless (tasks * n_buckets).
    sk_rows = ds.map_batches(spans, batch_format="pyarrow",
                             batch_size=min(partial_batch_size, 4096),
                             zero_copy_batch=True)
    return sk_rows.groupby("bucket").map_groups(
        count_group, batch_format="pyarrow")

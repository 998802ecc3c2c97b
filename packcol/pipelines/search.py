"""BM25 keyword retrieval over a text column — Ray-Data-first.

The classic two-pass plan, both passes streaming:

1. **Corpus statistics, query-scoped**: one `map_batches` pass emits a
   single tiny partial row per batch — document count, token-length
   sum, and the per-QUERY-TERM document frequencies (a vector of
   len(query) ints, not a vocabulary histogram).  DF for anything but
   the query terms is never computed, so the pass shuffles nothing and
   the driver reduces O(batches) rows of a few dozen bytes.
2. **Score + bounded top-k**: a second pass computes per-document BM25
   against the broadcast stats (vectorized hashed-token matching — the
   same 64-bit token hash space as minhash/simhash), keeps each
   batch's local top-k, and the O(k x batches) partials merge through
   ``global_top_k``.

At 100 TB nothing proportional to the corpus ever leaves the tasks:
pass 1 moves one stats row per batch, pass 2 moves k rows per batch.

Tokenization matches the engine's whitespace contract
(functions/text.py::token_hashes); terms are matched exactly (no
stemming), case-sensitive, in hash space (64-bit collisions are the
standard fingerprint trade).

No reference analogue (SURVEY §2.7: the reference is a value-encoding
library); this is LLM-corpus tooling the task brief's text-analysis
family calls for.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def _query_hashes(terms: list[str]) -> np.ndarray:
    from ..functions.text import _hash_words
    if not terms:
        raise ValueError("empty query")
    return np.unique(_hash_words(list(terms)))


def bm25_topk(ds, text_col: str, terms: list[str], k: int = 10, *,
              k1: float = 1.2, b: float = 0.75,
              keep_cols: list[str] | None = None):
    """Top-k documents by BM25 for a bag-of-terms query.  Returns a
    pandas frame of ``keep_cols`` + ``score`` (descending), ties broken
    by the first keep column for determinism."""
    import pandas as pd
    from ..functions.text import token_counts, token_hashes
    from .window import global_top_k

    qh = _query_hashes(terms)
    nq = len(qh)
    keep_cols = list(keep_cols or [])

    def stats_partial(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        hashes, rows = token_hashes(col)
        dl = token_counts(col)
        sel = np.flatnonzero(np.isin(hashes, qh))
        term = np.searchsorted(qh, hashes[sel])
        # document frequency: distinct (row, term) pairs
        pair = np.unique(rows[sel] * nq + term)
        df = np.bincount(pair % nq, minlength=nq)
        return pa.table({
            "n_docs": pa.array([len(col)], pa.int64()),
            "dl_sum": pa.array([int(dl.sum())], pa.int64()),
            **{f"df_{j}": pa.array([int(df[j])], pa.int64())
               for j in range(nq)}})

    stats = ds.map_batches(stats_partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    n_total = int(stats["n_docs"].sum())
    if n_total == 0:
        return pd.DataFrame({c: [] for c in keep_cols + ["score"]})
    avgdl = max(stats["dl_sum"].sum() / n_total, 1e-9)
    df = np.array([int(stats[f"df_{j}"].sum()) for j in range(nq)],
                  dtype=np.float64)
    idf = np.log(1.0 + (n_total - df + 0.5) / (df + 0.5))

    def score_partial(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        hashes, rows = token_hashes(col)
        dl = token_counts(col).astype(np.float64)
        sel = np.flatnonzero(np.isin(hashes, qh))
        if len(sel) == 0:
            return pa.table(
                {**{c: pa.array([], batch.schema.field(c).type)
                    for c in keep_cols},
                 "score": pa.array([], pa.float64())})
        term = np.searchsorted(qh, hashes[sel])
        tf = np.zeros(n * nq, dtype=np.float64)
        np.add.at(tf, rows[sel] * nq + term, 1.0)
        tf = tf.reshape(n, nq)
        norm = k1 * (1.0 - b + b * dl / avgdl)
        score = (idf * tf * (k1 + 1.0) / (tf + norm[:, None])).sum(
            axis=1)
        hit = np.flatnonzero(score > 0)
        top = hit[np.argsort(score[hit])[::-1][:k]]
        take = pa.array(top)
        return pa.table(
            {**{c: (batch.column(c).combine_chunks()
                    if isinstance(batch.column(c), pa.ChunkedArray)
                    else batch.column(c)).take(take)
                for c in keep_cols},
             "score": pa.array(score[top])})

    parts = ds.map_batches(score_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    out = global_top_k(parts, ["score"] + keep_cols[:1],
                       [False] + [True] * len(keep_cols[:1]), k)
    for c in keep_cols:  # stable column contract incl. the empty case
        if c not in out.columns:
            out[c] = []
    return out[keep_cols + ["score"]].reset_index(drop=True)

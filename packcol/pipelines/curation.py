"""End-to-end training-data curation: the composed pipeline a webtext
user actually runs, built entirely from this engine's stages.

    read → quality features → filter → exact dedup (fingerprint) →
    near-dup removal (MinHash LSH pairs → clusters → drop non-minimum
    members) → encode survivors (checkpointed)

Scale shape: documents stream through stateless map_batches filters;
only fingerprints and sketch rows shuffle; the final encode is the
checkpointed partition writer.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.text import fingerprints, quality_features


def quality_filter(ds, text_col: str = "text", min_tokens: int = 5,
                   max_tokens: int = 100_000, min_alpha_ratio: float = 0.5,
                   min_lexical_diversity: float = 0.1):
    """Vectorized per-batch quality gate (length / alpha / diversity)."""

    def f(batch: pa.Table) -> pa.Table:
        feats = quality_features(batch.column(text_col))
        keep = ((feats["n_tokens"] >= min_tokens) &
                (feats["n_tokens"] <= max_tokens) &
                (feats["alpha_ratio"] >= min_alpha_ratio) &
                (feats["lexical_diversity"] >= min_lexical_diversity))
        return batch.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def drop_exact_dups(ds, text_col: str = "text", id_col: str = "url"):
    """Keep one row per distinct text (min id), via broadcast of the
    keeper-id set computed from fingerprint partials."""
    import ray
    from ray.data.aggregate import Min

    def partial(batch: pa.Table) -> pa.Table:
        fp = fingerprints(batch.column(text_col)).view(np.int64)
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        order = np.lexsort((np.asarray(ids.to_pandas()), fp))
        first = np.ones(len(fp), dtype=bool)
        f_sorted = fp[order]
        first[1:] = f_sorted[1:] != f_sorted[:-1]
        sel = order[first]
        return pa.table({"fp": f_sorted[first],
                         id_col: ids.take(pa.array(sel))})

    keepers = ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .groupby("fp").aggregate(Min(id_col, alias_name=id_col))
    keep_arr = keepers.to_pandas()[id_col].to_numpy()
    ref = ray.put(keep_arr)

    def filt(batch: pa.Table) -> pa.Table:
        import ray as _ray
        import pyarrow.compute as pc
        ks = _ray.get(ref)
        mask = pc.is_in(batch.column(id_col), value_set=pa.array(ks))
        return batch.filter(mask)

    return ds.map_batches(filt, batch_format="pyarrow")


def drop_near_dups(ds, text_col: str = "text", id_col: str = "url",
                   threshold: float = 0.85):
    """Remove non-representative members of near-dup clusters."""
    import ray
    from .dedup import minhash_lsh_pairs, pairs_to_clusters
    from ..stages.profile import value_hashes

    def _nid(col):
        c = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        return value_hashes(c).view(np.int64)

    with_ids = ds.map_batches(
        lambda t: t.append_column("__nid", pa.array(_nid(t.column(id_col)))),
        batch_format="pyarrow")
    pairs = minhash_lsh_pairs(with_ids, text_col=text_col, id_col="__nid",
                              threshold=threshold)
    clusters = pairs_to_clusters(pairs)
    drop = set(clusters.loc[clusters["id"] != clusters["cluster"], "id"])
    ref = ray.put(drop)

    def filt(batch: pa.Table) -> pa.Table:
        import ray as _ray
        dd = _ray.get(ref)
        nid = _nid(batch.column(id_col))
        keep = ~np.isin(nid, np.fromiter(dd, dtype=np.int64,
                                         count=len(dd))) if dd else \
            np.ones(len(nid), dtype=bool)
        return batch.filter(pa.array(keep))

    return ds.map_batches(filt, batch_format="pyarrow")


def curate(ds, text_col: str = "text", id_col: str = "url",
           min_tokens: int = 5) -> "object":
    """The composed pipeline; returns the curated Dataset (lazy)."""
    ds = quality_filter(ds, text_col=text_col, min_tokens=min_tokens)
    ds = drop_exact_dups(ds, text_col=text_col, id_col=id_col)
    ds = drop_near_dups(ds, text_col=text_col, id_col=id_col)
    return ds

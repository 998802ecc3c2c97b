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


def drop_exact_dups(ds, text_col: str = "text", id_col: str = "url",
                    _broadcast_stats: dict | None = None):
    """Keep one row per distinct text (min id).

    Scale shape: only the DROP set is ever broadcast — its size is the
    number of duplicate documents, not the corpus.  Three bounded steps:

    1. map_batches combiner: batch-local duplicates drop immediately
       (their ids go straight to the drop side); one (fp, min_id) row
       per distinct fingerprint per batch continues.
    2. groupby(fp) → (min_id, count): only fingerprints with count > 1
       collide ACROSS batches; that small (fp → global min) table is
       broadcast (size = #duplicated fingerprints).
    3. a second pass over the pinned partials emits ids that lost to
       the global min → cross-batch drop ids.

    The final filter broadcasts sorted 8-byte id-hashes of the drop set
    (same hash-collision trade as fingerprint dedup itself).

    `_broadcast_stats` (tests): filled with the byte sizes of every
    broadcast structure, to assert nothing O(corpus) ships."""
    import ray
    from ray.data.aggregate import Count, Min
    from ..stages.profile import value_hashes

    def _idh(col) -> tuple[np.ndarray, np.ndarray | None]:
        """Row-aligned id hashes + validity mask (None when no nulls).
        value_hashes drops nulls, so its output must be re-expanded or
        every downstream filter mask has the wrong length."""
        c = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if c.null_count == 0:
            return value_hashes(c).view(np.int64), None
        valid = c.is_valid().to_numpy(zero_copy_only=False)
        h = np.zeros(len(c), dtype=np.int64)
        h[valid] = value_hashes(c).view(np.int64)
        return h, valid

    def partial(batch: pa.Table) -> pa.Table:
        fp = fingerprints(batch.column(text_col)).view(np.int64)
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if ids.null_count:  # null-id rows never join dup sketches
            valid = ids.is_valid().to_numpy(zero_copy_only=False)
            fp = fp[valid]
            ids = ids.drop_null()
        order = np.lexsort((np.asarray(ids.to_pandas()), fp))
        f_sorted = fp[order]
        first = np.ones(len(fp), dtype=bool)
        first[1:] = f_sorted[1:] != f_sorted[:-1]
        # batch-local non-min duplicates are dropped regardless of other
        # batches → flag them now (no second look needed)
        return pa.table({"fp": f_sorted,
                         "id": ids.take(pa.array(order)),
                         "local_dup": ~first})

    # pinned: consumed twice (global-min aggregate + loser scan); rows
    # are small (fp, id, flag) sketches, not documents
    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    def only_firsts(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.compute.invert(batch.column("local_dup"))) \
            .select(["fp", "id"])

    agg = partials.map_batches(only_firsts, batch_format="pyarrow") \
        .groupby("fp").aggregate(Min("id", alias_name="gmin"),
                                 Count(alias_name="c"))

    def only_collided(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.filter(pc.greater(batch.column("c"), 1)) \
            .select(["fp", "gmin"])

    # only fingerprints duplicated ACROSS batches reach the driver —
    # size = #duplicated fingerprints, not the corpus
    coll = agg.map_batches(only_collided, batch_format="pyarrow") \
        .to_pandas()
    order = np.argsort(coll["fp"].to_numpy()) if len(coll) else []
    coll_fp = coll["fp"].to_numpy()[order] if len(coll) else \
        np.empty(0, np.int64)
    coll_min = coll["gmin"].to_numpy()[order] if len(coll) else \
        np.empty(0, object)
    cref = ray.put((coll_fp, coll_min))

    def losers(batch: pa.Table) -> pa.Table:
        import ray as _ray
        cfp, cmin = _ray.get(cref)
        fp = batch.column("fp").to_numpy(zero_copy_only=False)
        ids = np.asarray(batch.column("id").to_pandas())
        dup = batch.column("local_dup").to_numpy(zero_copy_only=False)
        drop = dup.copy()
        if len(cfp):
            pos = np.searchsorted(cfp, fp)
            safe = np.minimum(pos, len(cfp) - 1)
            hit = (cfp[safe] == fp) & ~dup
            # batch-first rows that lost to the global min id
            drop |= hit & (ids != cmin[safe])
        sel = pa.array(drop)
        return pa.table({"id": batch.column("id").filter(sel)})

    drop_pdf = partials.map_batches(
        losers, batch_format="pyarrow").to_pandas()
    drop_ids = drop_pdf["id"] if "id" in drop_pdf.columns else []
    drop_hashes = np.sort(value_hashes(pa.array(drop_ids)).view(np.int64)) \
        if len(drop_ids) else np.empty(0, np.int64)
    dref = ray.put(drop_hashes)
    if _broadcast_stats is not None:
        _broadcast_stats["collided_fp_bytes"] = int(
            coll_fp.nbytes + sum(len(str(s)) for s in coll_min))
        _broadcast_stats["drop_set_bytes"] = int(drop_hashes.nbytes)
        _broadcast_stats["n_dropped"] = int(len(drop_hashes))

    def filt(batch: pa.Table) -> pa.Table:
        import ray as _ray
        dh = _ray.get(dref)
        if len(dh) == 0:
            return batch
        idh, valid = _idh(batch.column(id_col))
        pos = np.searchsorted(dh, idh)
        safe = np.minimum(pos, len(dh) - 1)
        keep = dh[safe] != idh
        if valid is not None:
            keep |= ~valid  # null-id rows are never dropped
        return batch.filter(pa.array(keep))

    return ds.map_batches(filt, batch_format="pyarrow")


def drop_near_dups(ds, text_col: str = "text", id_col: str = "url",
                   threshold: float = 0.85,
                   verify_identical: bool = False):
    """Remove non-representative members of near-dup clusters.

    ``verify_identical=True`` passes the sketch candidates through
    exact fingerprint verification before clustering, so only
    byte-identical pairs form clusters — the SQL-checkable contract
    (min-id per identical-text group) that drives the full
    sketch→verify→cluster→drop composition end-to-end."""
    import ray
    from .dedup import (minhash_lsh_pairs, pairs_to_clusters,
                        verify_pairs_identical)
    from ..stages.profile import value_hashes

    from ..codecs.forpack import is_int_like, to_int64_numpy

    def _nid(col) -> tuple[np.ndarray, np.ndarray | None]:
        """Node id per row: integer id columns pass through RAW, so the
        cluster representative (min node id) is the min ORIGINAL id —
        the SQL-checkable keeper rule.  Non-integer ids fall back to
        64-bit value hashes (representative = min hash: deterministic
        but arbitrary)."""
        c = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        valid = None
        if c.null_count:
            valid = c.is_valid().to_numpy(zero_copy_only=False)
        if is_int_like(c.type):
            v = to_int64_numpy(c)
            if valid is not None:
                v = np.where(valid, v, 0)
            return v, valid
        if valid is None:
            return value_hashes(c).view(np.int64), None
        h = np.zeros(len(c), dtype=np.int64)
        h[valid] = value_hashes(c).view(np.int64)
        return h, valid

    def add_nid(t: pa.Table) -> pa.Table:
        h, valid = _nid(t.column(id_col))
        t = t.append_column("__nid", pa.array(h))
        if valid is not None:  # null-id rows can't join near-dup pairs
            t = t.filter(pa.array(valid))
        return t

    with_ids = ds.map_batches(add_nid, batch_format="pyarrow")
    pairs = minhash_lsh_pairs(with_ids, text_col=text_col, id_col="__nid",
                              threshold=threshold)
    if verify_identical:
        pairs = verify_pairs_identical(with_ids, pairs,
                                       text_col=text_col, id_col="__nid")
    clusters = pairs_to_clusters(pairs)
    drop = set(clusters.loc[clusters["id"] != clusters["cluster"], "id"])
    ref = ray.put(drop)

    def filt(batch: pa.Table) -> pa.Table:
        import ray as _ray
        dd = _ray.get(ref)
        nid, valid = _nid(batch.column(id_col))
        keep = ~np.isin(nid, np.fromiter(dd, dtype=np.int64,
                                         count=len(dd))) if dd else \
            np.ones(len(nid), dtype=bool)
        if valid is not None:
            keep |= ~valid  # null-id rows are never dropped
        return batch.filter(pa.array(keep))

    return ds.map_batches(filt, batch_format="pyarrow")


def curate(ds, text_col: str = "text", id_col: str = "url",
           min_tokens: int = 5, near_dup: bool = True) -> "object":
    """The composed pipeline; returns the curated Dataset (lazy).
    near_dup=False runs the SQL-checkable subset (quality gate + exact
    dedup); True adds MinHash near-dup cluster removal."""
    ds = quality_filter(ds, text_col=text_col, min_tokens=min_tokens)
    ds = drop_exact_dups(ds, text_col=text_col, id_col=id_col)
    if near_dup:
        ds = drop_near_dups(ds, text_col=text_col, id_col=id_col)
    return ds

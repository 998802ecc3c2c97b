"""Similarity search over an embedding column (list<float>).

Brute-force cosine top-k as the exact baseline: the query matrix is
broadcast once (``ray.put``) and every batch does one numpy matmul —
no shuffle; per-batch top-k candidates (k rows per query per batch) are
merged in a final tiny step.  The LSH-bucketed variant
(:func:`ann_lsh_topk`) is the scale path: random-hyperplane bucketing
turns the scan into a groupby over matching buckets only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def embedding_matrix(batch: pa.Table, vec_col: str = "embedding"
                     ) -> np.ndarray:
    """Zero-copy-ish (flat values buffer) list<float> → (n, dim) float64."""
    emb = batch.column(vec_col)
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    n = len(emb)
    if n == 0:
        return np.empty((0, 0))
    if emb.null_count:
        # flatten() would drop the null rows' values and silently
        # misalign every vector against its id — refuse instead
        raise ValueError(
            f"{vec_col} contains {emb.null_count} null vectors; filter "
            "null embeddings before ANN/centroid stages")
    t = emb.type
    if not (pa.types.is_list(t) or pa.types.is_large_list(t)
            or pa.types.is_fixed_size_list(t)):
        # Ray's Arrow tensor extension (from_pandas of ndarray cells)
        return np.asarray(emb.to_numpy(zero_copy_only=False),
                          dtype=np.float64).reshape(n, -1)
    flat = emb.flatten().to_numpy(zero_copy_only=False)
    dim = len(flat) // n
    return flat.reshape(n, dim).astype(np.float64)


def uniform_sample_vectors(ds, n: int, vec_col: str = "embedding",
                           seed: int = 13) -> np.ndarray:
    """Deterministic UNIFORM n-row vector sample via bottom-k hashing
    (the approx_quantiles/KMV principle): each row gets a pseudo-random
    64-bit key from splitmix64 of its vector-content fold ⊕ the seed;
    each batch forwards only its n smallest keys, so the driver sees
    O(n × batches) candidate rows and keeps the n globally smallest —
    a uniform sample regardless of input ordering or clustering
    (``ds.limit(n)`` would take the FIRST rows: biased on
    sorted/clustered inputs).  The key depends on row CONTENT only, so
    the SAMPLE CONTENT is identical across runs, partitionings and
    batch splits (a positional salt would wobble with Ray's dynamic
    batch boundaries — observed as run-to-run IVF recall variance);
    byte-identical duplicate vectors share a key and collapse to one
    representative, which changes nothing downstream (k-means/PQ
    training sees the same point set)."""
    from ..functions.text import _splitmix64

    def partial(batch: pa.Table) -> pa.Table:
        X = embedding_matrix(batch, vec_col)
        if X.shape[0] == 0:
            return pa.table({"key": pa.array([], pa.int64()),
                             "vec": pa.array([], pa.large_list(
                                 pa.float64()))})
        bits = np.ascontiguousarray(X).view(np.uint64)
        fold = np.bitwise_xor.reduce(_splitmix64(bits), axis=1)
        with np.errstate(over="ignore"):
            salt = _splitmix64(np.array(
                [seed + 0x9E3779B97F4A7C15], dtype=np.uint64))[0]
        key = _splitmix64(fold ^ salt)
        if len(key) > n:
            idx = np.argpartition(key, n)[:n]
            key, X = key[idx], X[idx]
        return pa.table({
            "key": pa.array(key.view(np.int64)),
            "vec": pa.array(list(X), type=pa.large_list(pa.float64()))})

    cand = ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas()
    if len(cand) == 0:
        raise ValueError("no vectors to sample")
    keys = cand["key"].to_numpy().view(np.uint64)
    order = np.argsort(keys)[:n]
    return np.stack([np.asarray(v, dtype=np.float64)
                     for v in cand["vec"].to_numpy()[order]])


def ann_brute_topk(ds, query: np.ndarray, k: int = 10,
                   vec_col: str = "embedding", id_col: str = "vec_id"):
    """Exact cosine top-k of each query row against the dataset.

    Returns a Dataset of (qid, vec_id, cos) — k rows per query."""
    q = np.atleast_2d(np.asarray(query, dtype=np.float64))
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    qref = ray.put(qn)

    def stage(batch: pa.Table) -> pa.Table:
        qm = ray.get(qref)
        X = embedding_matrix(batch, vec_col)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table({"qid": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
        S = Xn @ qm.T                      # (n, n_q)
        kk = min(k, S.shape[0])
        top = np.argpartition(-S, kk - 1, axis=0)[:kk]  # (kk, n_q)
        n_q = S.shape[1]
        qid = np.repeat(np.arange(n_q, dtype=np.int64), kk)
        vid = ids[top.T.ravel()]
        cos = S[top.T.ravel(), qid]
        return pa.table({"qid": qid, id_col: vid, "cos": cos})

    cands = ds.map_batches(stage, batch_format="pyarrow",
                           zero_copy_batch=True)

    # final merge: candidates are tiny (k × n_batches × n_q)
    def final(df):
        df = df.sort_values(["qid", "cos", id_col],
                            ascending=[True, False, True])
        return df.groupby("qid", as_index=False).head(k)

    import pandas as pd
    pdf = cands.to_pandas()
    return final(pdf).reset_index(drop=True)


def embedding_near_dup_pairs(ds, threshold: float = 0.9,
                             vec_col: str = "embedding",
                             id_col: str = "vec_id"):
    """All pairs with cosine ≥ threshold — embedding near-dup detection.

    Exact path: L2-normalize, broadcast the corpus matrix once
    (compact float32 numpy built from per-batch blocks — never a
    driver-side pandas materialization of the Dataset), each batch does
    one matmul against it and emits its (id_a < id_b) pairs.  Valid
    while the matrix fits a broadcast (≤ ~1M × dim fp32 ≈ 0.5 GB);
    beyond that use :func:`embedding_near_dup_pairs_lsh` (bucketed
    groupby, exact verify inside buckets — no broadcast at all)."""
    # compact collection: one (ids-blob, fp32-matrix-blob) row per batch
    def pack(batch: pa.Table) -> pa.Table:
        X = embedding_matrix(batch, vec_col).astype(np.float32)
        ids = batch.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({
            "ids": pa.array([ids.tobytes()], pa.large_binary()),
            "v": pa.array([X.tobytes()], pa.large_binary())})

    id_parts, vec_parts = [], []
    for b in ds.map_batches(pack, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        for ib, vb in zip(b.column("ids").to_pylist(),
                          b.column("v").to_pylist()):
            id_parts.append(np.frombuffer(ib, dtype=np.int64))
            vec_parts.append(np.frombuffer(vb, dtype=np.float32))
    ids_all = np.concatenate(id_parts) if id_parts else \
        np.empty(0, np.int64)
    import ray
    if len(ids_all) == 0:
        ref = ray.put((ids_all, np.empty((0, 0), np.float32)))
    else:
        # broadcast stays float32 — the documented ~0.5 GB/1M×128 bound;
        # upcasting to float64 here would silently double it
        X = np.concatenate(vec_parts).reshape(len(ids_all), -1)
        Xn = (X / np.maximum(
            np.linalg.norm(X.astype(np.float64), axis=1,
                           keepdims=True), 1e-30)).astype(np.float32)
        ref = ray.put((ids_all, Xn))

    def stage(batch: pa.Table) -> pa.Table:
        ids_b = batch.column(id_col).to_numpy(zero_copy_only=False)
        Xb = embedding_matrix(batch, vec_col)
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64())})
        if len(ids_b) == 0:
            return empty
        ids_g, G = ray.get(ref)
        Bn = Xb / np.maximum(np.linalg.norm(Xb, axis=1, keepdims=True),
                             1e-30)
        S = Bn @ G.T
        bi, gi = np.nonzero(S >= threshold)
        a, b = ids_b[bi], ids_g[gi]
        keep = a < b  # dedupe mirrored + self pairs
        if not keep.any():
            return empty
        return pa.table({"id_a": a[keep].astype(np.int64),
                         "id_b": b[keep].astype(np.int64)})

    return ds.map_batches(stage, batch_format="pyarrow",
                          zero_copy_batch=True)


def embedding_near_dup_pairs_lsh(ds, threshold: float = 0.9,
                                 n_planes: int = 10, n_tables: int = 8,
                                 vec_col: str = "embedding",
                                 id_col: str = "vec_id", seed: int = 19,
                                 max_bucket: int = 4096):
    """Near-dup pairs beyond broadcast scale: random-hyperplane buckets
    (n_tables independent tables) → groupby(table, bucket) → EXACT
    cosine verification inside each bucket → distinct pairs.

    Nothing is broadcast and nothing materializes the corpus: only
    (table, bucket, id, fp32 vector) rows shuffle — the replication
    factor is n_tables, the per-bucket work is capped (logged) at
    max_bucket rows.  Recall for a pair at cosine s is
    1 - (1 - p^n_planes)^n_tables with p = 1 - arccos(s)/π; at the
    defaults and s ≥ 0.9, miss probability < 10^-3."""
    import ray
    from ray.data.aggregate import Max
    from .dedup import _cap_group

    first = ds.take(1)
    if not first:
        import ray.data as rd
        # same shape as the non-empty path (a Dataset), not a DataFrame
        return rd.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "cos": pa.array([], pa.float64())}))
    dim = len(first[0][vec_col])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))
    weights = (1 << np.arange(n_planes, dtype=np.int64))
    pref = ray.put(planes)

    def stage(batch: pa.Table) -> pa.Table:
        pl = ray.get(pref)
        X = embedding_matrix(batch, vec_col)
        ids = batch.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n = len(ids)
        if n == 0:
            return pa.table({"table": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "vec": pa.array([], pa.large_binary())})
        Xn = (X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True),
                             1e-30)).astype(np.float32)
        vec = pa.array([Xn[i].tobytes() for i in range(n)],
                       type=pa.large_binary())
        tabs, bks = [], []
        for t in range(pl.shape[0]):
            tabs.append(np.full(n, t, dtype=np.int64))
            bks.append(((X @ pl[t].T) > 0) @ weights)
        rep = pl.shape[0]
        return pa.table({
            "table": np.concatenate(tabs),
            "bucket": np.concatenate(bks),
            id_col: np.tile(ids, rep),
            "vec": pa.concat_arrays([vec] * rep)})

    def pairs(group: pa.Table) -> pa.Table:
        group = _cap_group(group, id_col, max_bucket, "embedding-lsh")
        m = group.num_rows
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64()),
                          "cos": pa.array([], pa.float64())})
        if m < 2:
            return empty
        from .dedup import _fixed_blobs
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        V = _fixed_blobs(group.column("vec"), np.float32) \
            .astype(np.float64)
        S = V @ V.T
        ia, ib = np.nonzero(np.triu(S >= threshold, k=1))
        if len(ia) == 0:
            return empty
        a, b = ids[ia], ids[ib]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table({"id_a": lo, "id_b": hi, "cos": S[ia, ib]})

    # Sorted-bucket application (stages/bucketed.py): in-block
    # segments run in-process (the per-segment matmul is the real
    # work; the Python loop over segments costs ~µs each vs Ray's
    # per-group machinery); straddling edge segments go per-group.
    from ..stages.bucketed import sorted_bucket_apply

    _EMPTY = pa.table({"id_a": pa.array([], pa.int64()),
                       "id_b": pa.array([], pa.int64()),
                       "cos": pa.array([], pa.float64())})

    def interior(batch: pa.Table, ss: np.ndarray) -> pa.Table:
        parts = [pairs(batch.slice(int(a), int(b - a)))
                 for a, b in zip(ss[:-1], ss[1:])]
        return pa.concat_tables(parts) if parts else _EMPTY

    cand = sorted_bucket_apply(
        ds.map_batches(stage, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["table", "bucket"], interior, pairs, _EMPTY)
    return cand.groupby(["id_a", "id_b"]).aggregate(
        Max("cos", alias_name="cos"))


def _sq_dists(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """(n, k) squared distances via ||x||^2 + ||c||^2 - 2 x·c — O(n*k)
    memory; the broadcast (n, k, dim) tensor form is ~dim× larger and
    OOMs workers on wide embeddings."""
    return (np.einsum("ij,ij->i", X, X)[:, None]
            + np.einsum("ij,ij->i", C, C)[None, :]
            - 2.0 * (X @ C.T))


def _kmeans(X: np.ndarray, n_lists: int, iters: int = 8,
            seed: int = 13) -> np.ndarray:
    """Small deterministic k-means on a sample (driver-side, numpy)."""
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(n_lists, len(X)), replace=False)]
    for _ in range(iters):
        a = _sq_dists(X, C).argmin(axis=1)
        for j in range(len(C)):
            m = a == j
            if m.any():
                C[j] = X[m].mean(axis=0)
    return C


def ann_ivf_topk(ds, query: np.ndarray, k: int = 10, n_lists: int = 16,
                 n_probe: int = 4, sample_rows: int = 2000,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 seed: int = 13, train: str = "sample"):
    """IVF approximate top-k: k-means centroids (train="sample": one
    bounded driver-side pass; train="full": distributed Lloyd over the
    whole corpus via kmeans_fit), then each batch scores only vectors
    whose nearest centroid is among the query's n_probe closest lists.

    Scale shape: centroids broadcast once; candidate fraction ≈
    n_probe / n_lists of the corpus; no shuffle."""
    q = np.atleast_2d(np.asarray(query, dtype=np.float64))
    if train == "full":
        C = kmeans_fit(ds, n_lists, vec_col=vec_col,
                       sample_rows=sample_rows, seed=seed)
    else:
        Xs = uniform_sample_vectors(ds, sample_rows, vec_col=vec_col,
                                    seed=seed)
        C = _kmeans(Xs, n_lists, seed=seed)
    qd = _sq_dists(q, C)
    probe = np.argsort(qd, axis=1)[:, :n_probe]           # (n_q, n_probe)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    ctx = ray.put((qn, C, probe))

    def stage(batch: pa.Table) -> pa.Table:
        qm, cents, pr = ray.get(ctx)
        X = embedding_matrix(batch, vec_col)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        empty = pa.table({"qid": pa.array([], pa.int64()),
                          id_col: pa.array([], pa.int64()),
                          "cos": pa.array([], pa.float64())})
        if len(ids) == 0:
            return empty
        assign = _sq_dists(X, cents).argmin(axis=1)
        out_q, out_v, out_c = [], [], []
        for qi in range(qm.shape[0]):
            m = np.isin(assign, pr[qi])
            if not m.any():
                continue
            Xn = X[m] / np.maximum(
                np.linalg.norm(X[m], axis=1, keepdims=True), 1e-30)
            s = Xn @ qm[qi]
            kk = min(k, len(s))
            top = np.argpartition(-s, kk - 1)[:kk]
            out_q.append(np.full(kk, qi, dtype=np.int64))
            out_v.append(ids[m][top])
            out_c.append(s[top])
        if not out_q:
            return empty
        return pa.table({"qid": np.concatenate(out_q),
                         id_col: np.concatenate(out_v),
                         "cos": np.concatenate(out_c)})

    cands = ds.map_batches(stage, batch_format="pyarrow",
                           zero_copy_batch=True)
    pdf = cands.to_pandas()
    pdf = pdf.sort_values(["qid", "cos", id_col],
                          ascending=[True, False, True])
    return pdf.groupby("qid", as_index=False).head(k).reset_index(drop=True)


def ann_lsh_topk(ds, query: np.ndarray, k: int = 10, n_planes: int = 12,
                 n_tables: int = 4, vec_col: str = "embedding",
                 id_col: str = "vec_id", seed: int = 11):
    """Approximate top-k: random-hyperplane LSH restricts the scan to
    vectors sharing a bucket with the query in any of n_tables tables.
    At 100 TB this replaces the full matmul scan with a bucket-key
    filter pushed into the batch kernel (candidates ≈ n / 2^n_planes per
    table)."""
    q = np.atleast_2d(np.asarray(query, dtype=np.float64))
    dim = q.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))
    weights = (1 << np.arange(n_planes, dtype=np.int64))
    q_buckets = np.stack([((q @ planes[t].T) > 0) @ weights
                          for t in range(n_tables)], axis=1)  # (n_q, n_tables)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    ctx = ray.put((qn, planes, q_buckets))

    def stage(batch: pa.Table) -> pa.Table:
        qm, pl, qb = ray.get(ctx)
        X = embedding_matrix(batch, vec_col)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        empty = pa.table({"qid": pa.array([], pa.int64()),
                          id_col: pa.array([], pa.int64()),
                          "cos": pa.array([], pa.float64())})
        if len(ids) == 0:
            return empty
        Xb = np.stack([((X @ pl[t].T) > 0) @ weights
                       for t in range(pl.shape[0])], axis=1)  # (n, n_tables)
        # candidate mask: shares any table bucket with any query
        cand = np.zeros(len(ids), dtype=bool)
        hit_q = []
        for qi in range(qb.shape[0]):
            m = (Xb == qb[qi]).any(axis=1)
            hit_q.append(m)
            cand |= m
        if not cand.any():
            return empty
        Xn = X[cand] / np.maximum(
            np.linalg.norm(X[cand], axis=1, keepdims=True), 1e-30)
        out_q, out_v, out_c = [], [], []
        for qi, m in enumerate(hit_q):
            mm = m[cand]
            if not mm.any():
                continue
            s = Xn[mm] @ qm[qi]
            kk = min(k, len(s))
            top = np.argpartition(-s, kk - 1)[:kk]
            out_q.append(np.full(kk, qi, dtype=np.int64))
            out_v.append(ids[cand][mm][top])
            out_c.append(s[top])
        if not out_q:
            return empty
        return pa.table({"qid": np.concatenate(out_q),
                         id_col: np.concatenate(out_v),
                         "cos": np.concatenate(out_c)})

    cands = ds.map_batches(stage, batch_format="pyarrow",
                           zero_copy_batch=True)
    pdf = cands.to_pandas()
    pdf = pdf.sort_values(["qid", "cos", id_col],
                          ascending=[True, False, True])
    return pdf.groupby("qid", as_index=False).head(k).reset_index(drop=True)


def kmeans_fit(ds, n_clusters: int, iters: int = 8,
               vec_col: str = "embedding", sample_rows: int = 2000,
               seed: int = 13) -> np.ndarray:
    """DISTRIBUTED Lloyd k-means over the full corpus: each iteration
    broadcasts the centroids, every batch emits per-cluster partial
    (sum, count) rows — k × n_batches tiny rows, never vectors — and
    the driver merges k × dim floats.  Init from the DETERMINISTIC
    uniform sample (bottom-k content hashing — ``ds.limit`` would take
    whichever blocks finish first, making centroids, IVF list
    assignments, and therefore recall run-dependent).  The honest
    full-data path behind IVF list training (vs the sample-only
    _kmeans)."""
    Xs = uniform_sample_vectors(ds, sample_rows, vec_col, seed=seed)
    C = _kmeans(Xs, n_clusters, iters=2, seed=seed)  # cheap warm start
    k, dim = C.shape
    for _ in range(iters):
        cref = ray.put(C)

        def partial(batch: pa.Table) -> pa.Table:
            cents = ray.get(cref)
            X = embedding_matrix(batch, vec_col)
            if len(X) == 0:
                return pa.table({"cid": pa.array([], pa.int64()),
                                 "s": pa.array([], pa.large_binary()),
                                 "n": pa.array([], pa.int64())})
            a = _sq_dists(X, cents).argmin(axis=1)
            cids = np.unique(a)
            sums = np.stack([X[a == j].sum(axis=0) for j in cids])
            cnts = np.array([(a == j).sum() for j in cids],
                            dtype=np.int64)
            return pa.table({
                "cid": cids.astype(np.int64),
                "s": pa.array([sums[i].tobytes()
                               for i in range(len(cids))],
                              type=pa.large_binary()),
                "n": cnts})

        parts = ds.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
        if len(parts) == 0:
            break
        newC = C.copy()
        for j in range(k):
            sub = parts[parts["cid"] == j]
            if len(sub) == 0:
                continue
            tot = np.sum([np.frombuffer(b, dtype=np.float64)
                          for b in sub["s"]], axis=0)
            newC[j] = tot / sub["n"].sum()
        if np.allclose(newC, C, atol=1e-12):
            C = newC
            break
        C = newC
    return C


# ---------------------------------------------------------------------------
# Product quantization (PQ): memory-compressed ANN
# ---------------------------------------------------------------------------

def pq_train(ds, m: int = 8, nbits: int = 8,
             vec_col: str = "embedding", sample_rows: int = 4096,
             seed: int = 13) -> np.ndarray:
    """Train an (m, 2^nbits, dim/m) product-quantization codebook on a
    deterministic UNIFORM sample (bottom-k hashing — no first-rows
    bias): the vector space splits into m subspaces, each clustered
    independently with k-means.  Vectors are L2-normalized before
    training because the scorer uses inner-product ADC ≡ cosine on
    normalized inputs.  One bounded sample pass; the codebook is
    m × 2^nbits × dim/m floats — broadcastable."""
    X = uniform_sample_vectors(ds, sample_rows, vec_col, seed=seed)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub, ksub = dim // m, 1 << nbits
    books = []
    for j in range(m):
        sub = X[:, j * dsub:(j + 1) * dsub]
        books.append(_kmeans(sub, min(ksub, len(sub)), iters=8,
                             seed=seed + 101 * j))
    # ragged guard: _kmeans returns <=ksub centroids on tiny samples —
    # pad by repeating the first so the codebook is rectangular
    kmax = max(len(b) for b in books)
    books = [np.vstack([b, np.repeat(b[:1], kmax - len(b), axis=0)])
             if len(b) < kmax else b for b in books]
    return np.stack(books)  # (m, ksub, dsub)


def _pq_encode_block(Xn: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, dim) normalized → (n, m) uint8/uint16 codes: per-subspace
    nearest centroid, vectorized (one cdist per subspace)."""
    m, ksub, dsub = books.shape
    n = Xn.shape[0]
    codes = np.empty((n, m), dtype=np.uint16 if ksub > 256 else np.uint8)
    for j in range(m):
        codes[:, j] = _sq_dists(Xn[:, j * dsub:(j + 1) * dsub],
                                books[j]).argmin(axis=1)
    return codes


def ann_pq_topk(ds, query: np.ndarray, k: int = 10, *, m: int = 8,
                nbits: int = 8, rerank_k: int | None = None,
                codebooks: np.ndarray | None = None,
                vec_col: str = "embedding", id_col: str = "vec_id",
                sample_rows: int = 4096, seed: int = 13):
    """PQ-accelerated cosine top-k: asymmetric distance computation
    (ADC) over m-byte codes shortlists ``rerank_k`` candidates per
    batch, which re-rank EXACTLY against the raw batch vectors before
    anything leaves the task — the driver merges O(k × batches × n_q)
    scored rows, and no vector ever ships.

    The 100 TB shape: a 768-d float32 vector is 3 KB; its PQ code is m
    bytes (8 → 384× less), so the scan's memory traffic drops by the
    same factor while the in-batch exact re-rank keeps the returned
    scores honest (``cos`` is always the TRUE cosine; PQ only decides
    which candidates get it).  ``rerank_k >= batch rows`` degrades to
    exact brute force — the exactness-forcing driver config
    (``ann_pq_exact``), same oracle trick as ann_ivf_exact.

    Returns pandas (qid, vec_id, cos), k rows per query."""
    import pandas as pd
    q = np.atleast_2d(np.asarray(query, dtype=np.float64))
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    if codebooks is None:
        codebooks = pq_train(ds, m=m, nbits=nbits, vec_col=vec_col,
                             sample_rows=sample_rows, seed=seed)
    rr = rerank_k if rerank_k is not None else max(4 * k, 32)
    bref = ray.put((codebooks, qn))

    def stage(batch: pa.Table) -> pa.Table:
        books, qm = ray.get(bref)
        X = embedding_matrix(batch, vec_col)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table({"qid": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True),
                            1e-30)
        codes = _pq_encode_block(Xn, books)
        mm, ksub, dsub = books.shape
        n_q = qm.shape[0]
        # ADC tables: per (query, subspace) inner products vs centroids
        T = np.einsum("qjd,jkd->qjk", qm.reshape(n_q, mm, dsub),
                      books)  # (n_q, m, ksub)
        # approx[iq, i] = sum_j T[iq, j, codes[i, j]]
        approx = np.stack(
            [T[iq][np.arange(mm)[None, :], codes].sum(axis=1)
             for iq in range(n_q)])  # (n_q, n)
        out_q, out_i, out_c = [], [], []
        kk = min(rr, approx.shape[1])
        for iq in range(n_q):
            cand = np.argpartition(-approx[iq], kk - 1)[:kk]
            exact = Xn[cand] @ qm[iq]
            keep = cand[np.argsort(-exact)[:min(k, kk)]]
            out_q.append(np.full(len(keep), iq, dtype=np.int64))
            out_i.append(ids[keep])
            out_c.append(Xn[keep] @ qm[iq])
        return pa.table({"qid": np.concatenate(out_q),
                         id_col: np.concatenate(out_i),
                         "cos": np.concatenate(out_c)})

    pdf = ds.map_batches(stage, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    pdf = pdf.sort_values(["qid", "cos", id_col],
                          ascending=[True, False, True])
    return pdf.groupby("qid", as_index=False).head(k) \
        .reset_index(drop=True)

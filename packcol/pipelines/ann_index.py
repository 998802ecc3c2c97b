"""Persisted IVF index = a clustered encoded store + a centroid sidecar.

Design (the 100 TB shape): ``build_ivf_store`` trains n_lists k-means
centroids with the distributed Lloyd pass (``ann.kmeans_fit`` — vectors
never leave workers, only (sum, count) partials move), tags every row
with its nearest-list id, sorts ONCE on that id (the only all-to-all),
and sinks through the standard store writer.  Each part therefore
covers a contiguous list-id range, and the manifest zone maps turn the
IVF probe into the store's EXISTING IN-list pushdown — a query reads
only the parts whose zones intersect its probed lists (per-value zone
tests, `encode_pipeline._in_survivors`).  Centroids land in a tiny
``_ivf/`` sidecar (n_lists × dim floats).

No bespoke index format and no bespoke reader: the index IS a plain
queryable store (readable by ``read_encoded`` / ``agg_encoded`` /
``count_encoded``), the probe IS a predicate, and recall/latency trade
with ``n_probe`` exactly as in classical IVF (n_probe = n_lists scans
everything and is provably exact — the driver oracle anchor).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

import ray

from .ann import _sq_dists, ann_brute_topk, embedding_matrix, kmeans_fit

LIST_COL = "__ivf_list"
_IVF_DIR = "_ivf"


def _sidecar_path(store_dir: str) -> str:
    return os.path.join(store_dir, _IVF_DIR, "centroids.npz")


def build_ivf_store(ds, out_dir: str, *, n_lists: int = 64,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    iters: int = 8, rows_per_part: int | None = None,
                    seed: int = 13) -> dict:
    """Train centroids, tag rows with ``__ivf_list``, sort on it, sink
    into ``out_dir`` as a standard encoded store, and write the
    centroid sidecar.  Returns the sink metrics + index metadata."""
    from .encode_pipeline import write_encoded
    C = kmeans_fit(ds, n_lists, iters=iters, vec_col=vec_col, seed=seed)
    cref = ray.put(C)

    def assign(batch: pa.Table) -> pa.Table:
        X = embedding_matrix(batch, vec_col)
        if len(X) == 0:
            return batch.append_column(
                LIST_COL, pa.array([], type=pa.int64()))
        vcol = batch.column(vec_col)
        vt = vcol.type if not isinstance(vcol, pa.ChunkedArray) \
            else vcol.chunk(0).type if vcol.num_chunks else None
        if isinstance(vt, pa.ExtensionType):
            # Ray's Arrow tensor extension (ndarray cells) has no
            # encode kernels; rebuild as fixed_size_list<double> from
            # the matrix already in hand — the storable twin
            fl = pa.FixedSizeListArray.from_arrays(
                pa.array(X.ravel(), type=pa.float64()), X.shape[1])
            batch = batch.set_column(
                batch.column_names.index(vec_col), vec_col, fl)
        a = _sq_dists(X, ray.get(cref)).argmin(axis=1)
        return batch.append_column(
            LIST_COL, pa.array(a.astype(np.int64)))

    tagged = ds.map_batches(assign, batch_format="pyarrow",
                            zero_copy_batch=True)
    metrics = write_encoded(tagged.sort(LIST_COL), out_dir,
                            rows_per_part=rows_per_part)
    os.makedirs(os.path.join(out_dir, _IVF_DIR), exist_ok=True)
    # np.savez appends .npz to names that lack it: tmp must keep it
    tmp = _sidecar_path(out_dir)[:-len(".npz")] + ".tmp.npz"
    np.savez(tmp, centroids=C,
             meta=json.dumps({"n_lists": int(n_lists),
                              "vec_col": vec_col, "id_col": id_col,
                              "metric": "l2-assign/cosine-rank"}))
    os.replace(tmp, _sidecar_path(out_dir))
    return {**metrics, "n_lists": int(n_lists), "dim": int(C.shape[1])}


def load_ivf_sidecar(store_dir: str) -> tuple[np.ndarray, dict]:
    p = _sidecar_path(store_dir)
    if not os.path.exists(p):
        raise FileNotFoundError(
            f"{store_dir} has no IVF sidecar ({_IVF_DIR}/centroids.npz);"
            " build one with build_ivf_store")
    with np.load(p, allow_pickle=False) as z:
        return z["centroids"], json.loads(str(z["meta"]))


def ivf_query_store(store_dir: str, query: np.ndarray, k: int = 10,
                    n_probe: int = 4):
    """ANN top-k against a ``build_ivf_store`` index: rank lists per
    query against the sidecar centroids (driver-side, n_lists × dim —
    tiny), then scan ONLY the union of probed lists via the store's
    IN-list pushdown and brute-force the survivors.  The union can only
    ADD candidates beyond each query's own probes, so recall is ≥
    classical per-query IVF at the same n_probe; n_probe = n_lists is
    provably exact.  Returns (qid, id, cos) — k rows per query."""
    from ..sources.encoded import read_encoded
    C, meta = load_ivf_sidecar(store_dir)
    q = np.atleast_2d(np.asarray(query, dtype=np.float64))
    n_probe = max(1, min(int(n_probe), len(C)))
    d = _sq_dists(q, C)                      # (n_q, n_lists)
    probe = np.argpartition(d, n_probe - 1, axis=1)[:, :n_probe]
    lists = sorted({int(v) for v in probe.ravel()})
    cand = read_encoded(
        store_dir, columns=[meta["id_col"], meta["vec_col"]],
        filter=(LIST_COL, "in", lists))
    return ann_brute_topk(cand, q, k=k, vec_col=meta["vec_col"],
                          id_col=meta["id_col"])


def ivf_probe_stats(store_dir: str, query: np.ndarray,
                    n_probe: int = 4) -> dict:
    """How selective a probe is: parts scanned vs total — the pruning
    evidence (zone maps on the sorted list id), metadata-only."""
    from .encode_pipeline import _all_parts, _pred_survivors
    C, _ = load_ivf_sidecar(store_dir)
    q = np.atleast_2d(np.asarray(query, dtype=np.float64))
    n_probe = max(1, min(int(n_probe), len(C)))
    d = _sq_dists(q, C)
    probe = np.argpartition(d, n_probe - 1, axis=1)[:, :n_probe]
    lists = sorted({int(v) for v in probe.ravel()})
    surv = _pred_survivors(store_dir, (LIST_COL, "in", tuple(lists),
                                       None))
    return {"parts_total": len(_all_parts(store_dir)),
            "parts_scanned": len(surv), "lists_probed": len(lists)}

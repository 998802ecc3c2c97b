"""BM25 retrieval (pipelines/search.py) vs a direct numpy oracle."""
import numpy as np
import pandas as pd
import pytest

from packcol.pipelines.search import bm25_topk


def _corpus(n=600, seed=3):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(60)] + ["quantum", "compression",
                                            "ray", "columnar"]
    docs = [" ".join(rng.choice(vocab, rng.integers(5, 40)))
            for _ in range(n)]
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": docs})


def _bm25_oracle(df, terms, k, k1=1.2, b=0.75):
    toks = df["text"].str.split(" ")
    dl = toks.apply(len).to_numpy(dtype=np.float64)
    n = len(df)
    avgdl = dl.sum() / n
    scores = np.zeros(n)
    for t in set(terms):
        tf = toks.apply(lambda ws: ws.count(t)).to_numpy(np.float64)
        dfq = float((tf > 0).sum())
        idf = np.log(1.0 + (n - dfq + 0.5) / (dfq + 0.5))
        scores += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl
                                                    / avgdl))
    out = df.assign(score=scores)
    out = out[out.score > 0].sort_values(
        ["score", "doc_id"], ascending=[False, True]).head(k)
    return out.reset_index(drop=True)


def test_bm25_matches_oracle(ray_session):
    import ray.data as rd
    df = _corpus()
    terms = ["quantum", "compression"]
    got = bm25_topk(rd.from_pandas(df).repartition(6), "text", terms,
                    k=15, keep_cols=["doc_id"])
    want = _bm25_oracle(df, terms, 15)
    assert len(got) == len(want)
    np.testing.assert_allclose(got["score"].to_numpy(),
                               want["score"].to_numpy(), rtol=1e-9)
    # ordering may tie-break differently only on exactly-equal scores
    same = got["score"].round(9).to_numpy() == \
        want["score"].round(9).to_numpy()
    assert same.all()


def test_bm25_no_hits_and_empty_query(ray_session):
    import ray.data as rd
    df = _corpus(n=50, seed=9)
    got = bm25_topk(rd.from_pandas(df), "text", ["zzznope"], k=5,
                    keep_cols=["doc_id"])
    assert len(got) == 0
    assert list(got.columns) == ["doc_id", "score"]
    with pytest.raises(ValueError, match="empty query"):
        bm25_topk(rd.from_pandas(df), "text", [], k=5)


def test_bm25_repeated_query_terms_dedupe(ray_session):
    import ray.data as rd
    df = _corpus(n=200, seed=11)
    a = bm25_topk(rd.from_pandas(df), "text", ["ray"], k=8,
                  keep_cols=["doc_id"])
    bqt = bm25_topk(rd.from_pandas(df), "text", ["ray", "ray"], k=8,
                    keep_cols=["doc_id"])
    np.testing.assert_allclose(a["score"], bqt["score"])

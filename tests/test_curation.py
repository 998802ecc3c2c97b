"""Composed curation pipeline on webtext with planted junk + dups."""

import numpy as np
import pyarrow as pa
import pytest


def corpus():
    rng = np.random.default_rng(21)
    vocab = [f"word{i}" for i in range(200)]
    rows = []
    for i in range(60):
        text = " ".join(rng.choice(vocab, 40))
        rows.append({"url": f"https://ok/{i}", "text": text})
    # junk: too short / low diversity
    rows.append({"url": "https://junk/short", "text": "tiny text"})
    rows.append({"url": "https://junk/repeat", "text": "spam " * 200})
    # exact dups of doc 0
    base = rows[0]["text"]
    rows.append({"url": "https://dup/exact1", "text": base})
    rows.append({"url": "https://dup/exact2", "text": base})
    # near dup of doc 1
    words = rows[1]["text"].split()
    words[3] = "changed"
    rows.append({"url": "https://dup/near1", "text": " ".join(words)})
    return pa.Table.from_pylist(rows)


def test_curate(ray_session):
    import ray.data as rd
    from packcol.pipelines.curation import curate
    t = corpus()
    out = curate(rd.from_arrow(t), min_tokens=5).to_pandas()
    urls = set(out["url"])
    # junk removed
    assert "https://junk/short" not in urls
    assert "https://junk/repeat" not in urls
    # exactly one survivor among the exact-dup triplet
    assert len(urls & {"https://ok/0", "https://dup/exact1",
                       "https://dup/exact2"}) == 1
    # near-dup pair collapsed to one
    assert len(urls & {"https://ok/1", "https://dup/near1"}) == 1
    # the 58 other clean docs survive
    assert sum(1 for u in urls if u.startswith("https://ok/")) >= 57

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


def test_drop_exact_dups_broadcast_is_dup_bounded(ray_session):
    """Scale invariant: broadcast structures are O(#duplicates), never
    O(corpus); min-ID keeper semantics; multi-block input."""
    import ray.data as rd
    from packcol.pipelines.curation import drop_exact_dups
    rng = np.random.default_rng(33)
    vocab = [f"w{i}" for i in range(100)]
    n_unique, n_dup_groups = 400, 7
    rows = []
    for i in range(n_unique):
        rows.append({"url": f"https://u/{i:04d}",
                     "text": " ".join(rng.choice(vocab, 30))})
    # each dup group: 3 extra copies of one text, spread across blocks
    for g in range(n_dup_groups):
        for c in range(3):
            rows.append({"url": f"https://zdup/{g}/{c}",
                         "text": rows[g]["text"]})
    t = pa.Table.from_pylist(rows)
    ds = rd.from_arrow(t).repartition(8)
    stats = {}
    out = drop_exact_dups(ds, _broadcast_stats=stats).to_pandas()
    n_dropped_expected = n_dup_groups * 3
    assert stats["n_dropped"] == n_dropped_expected
    assert stats["drop_set_bytes"] == n_dropped_expected * 8
    # collided-fp broadcast bounded by dup groups (≪ corpus)
    assert stats["collided_fp_bytes"] <= n_dup_groups * (8 + 64)
    # min-id keeper: the original url survives, copies don't
    urls = set(out["url"])
    for g in range(n_dup_groups):
        assert f"https://u/{g:04d}" in urls
        assert not any(f"https://zdup/{g}/" in u for u in urls)
    assert len(out) == n_unique


def test_curation_handles_null_ids(ray_session):
    """Regression: one null id crashed drop_exact_dups (lexsort on
    None) and broke filter-mask lengths; null-id rows pass through."""
    import pyarrow as pa
    import ray.data as rd
    from packcol.pipelines.curation import drop_exact_dups
    t = pa.table({
        "url": pa.array(["a", None, "b", "c", None], pa.string()),
        "text": ["dup", "x", "dup", "unique", "y"]})
    out = drop_exact_dups(rd.from_arrow(t).repartition(2),
                          text_col="text", id_col="url").to_pandas()
    # exactly one of the "dup" rows dropped; both null-id rows kept
    assert len(out) == 4
    assert out["url"].isna().sum() == 2
    assert (out["text"] == "dup").sum() == 1

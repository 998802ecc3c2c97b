"""Unit tests for text-analysis and sketch kernels (vs. naive Python)."""

import numpy as np
import pyarrow as pa

from packcol.functions.hashing import (band_hashes, hamming_distance,
                                       minhash_signatures, ngram_jaccard,
                                       shingle_hashes, simhash)
from packcol.functions.text import (fingerprints, lang_id, quality_features,
                                    token_counts, token_hashes,
                                    unique_token_counts)

TEXTS = ["the quick brown fox", "", "single", "a a a a", "x y", None,
         "the quick brown fox", "hello world hello world hello"]
ARR = pa.array(TEXTS, type=pa.string())


def py_tokens(s):
    return s.split(" ") if s else []


def test_token_counts():
    got = token_counts(ARR).tolist()
    exp = [len(py_tokens(t or "")) for t in TEXTS]
    assert got == exp


def test_unique_token_counts():
    got = unique_token_counts(ARR).tolist()
    exp = [len(set(py_tokens(t or ""))) for t in TEXTS]
    assert got == exp


def test_token_hashes_consistent():
    h, rows = token_hashes(ARR)
    assert len(h) == sum(len(py_tokens(t or "")) for t in TEXTS)
    # same token ⇒ same hash, different token ⇒ different hash (here)
    by_tok = {}
    flat = [tok for t in TEXTS for tok in py_tokens(t or "")]
    for tok, hv in zip(flat, h.tolist()):
        by_tok.setdefault(tok, set()).add(hv)
    assert all(len(v) == 1 for v in by_tok.values())
    all_h = {next(iter(v)) for v in by_tok.values()}
    assert len(all_h) == len(by_tok)


def test_fingerprints_identity_and_difference():
    fp = fingerprints(ARR)
    assert fp[0] == fp[6]          # identical texts
    uniq_texts = {t or "" for t in TEXTS}
    assert len(set(fp.tolist())) == len(uniq_texts)
    # deterministic
    np.testing.assert_array_equal(fp, fingerprints(ARR))


def test_quality_features():
    q = quality_features(ARR)
    assert q["n_chars"].tolist() == [len(t or "") for t in TEXTS]
    assert q["n_tokens"].tolist() == [len(py_tokens(t or "")) for t in TEXTS]
    assert abs(q["lexical_diversity"][3] - 0.25) < 1e-9   # "a a a a"


def test_lang_id():
    arr = pa.array(["the cat and the dog is here with us",
                    "der hund und die katze ist nicht da",
                    "le chat et la maison est dans les arbres",
                    "zzz qqq www"])
    got = lang_id(arr).to_pylist()
    assert got[0] == "en" and got[1] == "de" and got[2] == "fr"
    assert got[3] == "und"


def test_shingles_do_not_cross_rows():
    a = pa.array(["a b c", "d e f"])
    b = pa.array(["a b c d e f"])
    ha, _ = shingle_hashes(a, 3)
    hb, _ = shingle_hashes(b, 3)
    assert len(ha) == 2      # one shingle per row
    assert len(hb) == 4      # crossing shingles exist only in the joined row
    assert set(ha.tolist()) < set(hb.tolist())


def test_minhash_similarity():
    words = [f"w{i}" for i in range(60)]
    base = " ".join(words)
    near = " ".join(words[:-1] + ["changed"])        # Jaccard ≈ 0.9
    far = " ".join(f"z{i}" for i in range(60))
    arr = pa.array([base, near, far, base])
    sig = minhash_signatures(arr, num_perm=128)
    est_near = (sig[0] == sig[1]).mean()
    est_far = (sig[0] == sig[2]).mean()
    assert est_near > 0.6 > est_far
    np.testing.assert_array_equal(sig[0], sig[3])
    bh = band_hashes(sig, 16)
    assert (bh[0] == bh[3]).all()
    assert (bh[0] == bh[1]).any()      # near-dup shares ≥1 band
    assert not (bh[0] == bh[2]).any()


def test_simhash_and_hamming():
    base = "the quick brown fox jumps over the lazy dog " * 5
    near = base.replace("lazy", "sleepy")
    far = "totally different vocabulary set with other tokens " * 5
    arr = pa.array([base.strip(), near.strip(), far.strip()])
    sh = simhash(arr)
    d_near = hamming_distance(sh[:1], sh[1:2])[0]
    d_far = hamming_distance(sh[:1], sh[2:3])[0]
    assert d_near < d_far
    assert hamming_distance(sh[:1], sh[:1])[0] == 0


def test_ngram_jaccard():
    a, _ = shingle_hashes(pa.array(["a b c d e"]), 3)
    b, _ = shingle_hashes(pa.array(["a b c d x"]), 3)
    j = ngram_jaccard(a, b)
    assert 0 < j < 1
    assert ngram_jaccard(a, a) == 1.0


def test_empty_input_edges():
    """Every kernel handles zero-row columns."""
    empty = pa.array([], type=pa.string())
    assert token_counts(empty).tolist() == []
    h, _ = token_hashes(empty)
    assert len(h) == 0
    assert unique_token_counts(empty).tolist() == []
    assert lang_id(empty).to_pylist() == []
    assert fingerprints(empty).tolist() == []
    assert minhash_signatures(empty).shape[0] == 0
    assert simhash(empty).tolist() == []


def test_minhash_short_docs_not_false_duplicates():
    """Regression: rows with < shingle_k tokens got identical all-max
    signatures and were reported as near-dups of each other."""
    import numpy as np
    import pyarrow as pa
    from packcol.functions.hashing import band_hashes, minhash_signatures
    t = pa.array(["hello world", "goodbye now", "hello world", "hi"])
    sig = minhash_signatures(t, num_perm=16)
    # distinct short texts: different signatures
    assert not np.array_equal(sig[0], sig[1])
    # identical short texts: identical signatures (they ARE duplicates)
    np.testing.assert_array_equal(sig[0], sig[2])
    bh = band_hashes(sig, 4)
    assert not np.array_equal(bh[0], bh[1])
    np.testing.assert_array_equal(bh[0], bh[2])


def test_band_hashes_rejects_bad_band_count():
    import numpy as np
    import pytest as _pt
    from packcol.functions.hashing import band_hashes
    sig = np.arange(12, dtype=np.uint64).reshape(3, 4)
    with _pt.raises(ValueError, match="divide"):
        band_hashes(sig, 8)
    with _pt.raises(ValueError, match="divide"):
        band_hashes(sig, 3)


def test_ngram_jaccard_empty_sets_do_not_confirm():
    import numpy as np
    from packcol.functions.hashing import ngram_jaccard
    empty = np.empty(0, dtype=np.uint64)
    assert ngram_jaccard(empty, empty) == 0.0


def test_pairwise_jaccard_matches_scalar():
    import numpy as np
    import pyarrow as pa
    from packcol.functions.hashing import (ngram_jaccard,
                                           pairwise_jaccard,
                                           shingle_hashes)
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, rng.integers(0, 25)))
             for _ in range(40)]
    texts[7] = texts[3]                      # exact dup pair
    texts[9] = ""                            # empty doc
    sh, rows = shingle_hashes(pa.array(texts), 3)
    ia = rng.integers(0, 40, 60)
    ib = rng.integers(0, 40, 60)
    got = pairwise_jaccard(sh, rows, ia, ib)
    for k in range(60):
        exp = ngram_jaccard(sh[rows == ia[k]], sh[rows == ib[k]])
        assert abs(got[k] - exp) < 1e-12, (k, ia[k], ib[k])
    # identical texts → exactly 1.0 (unless both shingle-less)
    got_dup = pairwise_jaccard(sh, rows, np.array([3]), np.array([7]))
    assert got_dup[0] == 1.0

"""Canonical-form normalization tests (N1-N4 generalization)."""

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from packcol.codecs.canonical import (CanonicalizeBatch, canonicalize,
                                      reconstruct, reverse_strings)


def test_reverse_strings():
    arr = pa.array(["abc", "", "x", None, "hello"])
    got = reverse_strings(arr).to_pylist()
    assert got == ["cba", "", "x", None, "olleh"]


def test_canonicalize_reconstruct():
    arr = pa.array(["ba", "ab", "aa", "zyx", "xyz", ""])
    canonical, is_fw = canonicalize(arr)
    assert canonical.to_pylist() == ["ab", "ab", "aa", "xyz", "xyz", ""]
    assert is_fw.to_pylist() == [False, True, True, False, True, True]
    back = reconstruct(canonical, is_fw)
    assert back.to_pylist() == arr.to_pylist()


def test_idempotent():
    arr = pa.array(["ba", "ab", "mnop"])
    c1, _ = canonicalize(arr)
    c2, is_fw = canonicalize(c1)
    assert c1.to_pylist() == c2.to_pylist()
    assert all(is_fw.to_pylist())


def test_batch_stage():
    t = pa.table({"s": ["ba", "ab"], "i": [1, 2]})
    out = CanonicalizeBatch("s")(t)
    assert out.column("s_canonical").to_pylist() == ["ab", "ab"]
    assert out.column("s_orientation").to_pylist() == [False, True]
    out2 = CanonicalizeBatch("s", replace=True)(t)
    assert out2.column("s").to_pylist() == ["ab", "ab"]


def test_binary_type():
    arr = pa.array([b"\x01\x02", b"\x02\x01"], type=pa.large_binary())
    canonical, is_fw = canonicalize(arr)
    assert canonical.to_pylist() == [b"\x01\x02", b"\x01\x02"]
    back = reconstruct(canonical, is_fw)
    assert back.to_pylist() == arr.to_pylist()


def test_rejects_non_string():
    with pytest.raises(TypeError):
        canonicalize(pa.array([1, 2, 3]))


@settings(max_examples=50, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=40)), max_size=60))
def test_property_roundtrip(xs):
    arr = pa.array(xs, type=pa.string())
    canonical, is_fw = canonicalize(arr)
    back = reconstruct(canonical, is_fw)
    assert back.to_pylist() == arr.to_pylist()
    # idempotence on non-null values
    c2, _ = canonicalize(canonical)
    assert c2.to_pylist() == canonical.to_pylist()


def test_canonicalize_improves_compression():
    """The reference's motivation for canonical forms: mirrored values
    collapse, halving dictionary cardinality before encoding; the
    orientation bit (cheap boolean column) restores originals exactly."""
    import numpy as np
    from packcol.codecs import get_codec
    rng = np.random.default_rng(5)
    base = ["".join(chr(97 + c) for c in rng.integers(0, 26, 12))
            for _ in range(64)]
    vals = []
    for _ in range(4000):
        s = base[rng.integers(0, 64)]
        vals.append(s if rng.random() < 0.5 else s[::-1])
    arr = pa.array(vals)
    canonical, is_fw = canonicalize(arr)

    d = get_codec("dict")
    plain = d.encode(arr)
    canon = d.encode(canonical)
    orient = get_codec("for").encode(is_fw)   # random bits → 1-bit pack
    assert canon.params["n_dict"] <= 64 < plain.params["n_dict"]
    assert canon.enc_bytes + orient.enc_bytes < plain.enc_bytes
    # exact reconstruction from the encoded pair
    back = reconstruct(get_codec("dict").decode(canon),
                       get_codec("for").decode(orient))
    assert back.to_pylist() == vals

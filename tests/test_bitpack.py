"""Golden + property tests for the bit-pack kernel.

Golden vectors come verbatim from the reference's inline tests
(/root/reference/src/encoding/naive.rs:296-445): the ACGT-table 2-bit
packing of known strings must reproduce the exact words.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from packcol.codecs.bitpack import bits_needed, pack, packed_words_for, unpack

ACGT = {"A": 0, "C": 1, "G": 2, "T": 3}


def codes(s: str) -> np.ndarray:
    return np.array([ACGT[c] for c in s], dtype=np.uint64)


class TestGoldenKmers:
    """Reference parity: src/encoding/naive.rs:296-330 (k15pu8 / k15pu32)."""

    def test_k15_u8_words(self):
        # "TAAGGATTCTAATCA" → u8 words [131, 242, 13, 7]
        words = pack(codes("TAAGGATTCTAATCA"), 2)
        as_u8 = words.view(np.uint8)[:4]
        assert as_u8.tolist() == [131, 242, 13, 7]

    def test_k15_u32_word(self):
        words = pack(codes("TAAGGATTCTAATCA"), 2)
        as_u32 = words.view(np.uint32)[:1]
        assert as_u32.tolist() == [118354563]

    def test_k30_roundtrip_exact(self):
        s = "TAAGGATTCTAATCATAAGGATTCTAATCA"
        c = codes(s)
        assert unpack(pack(c, 2), 2, len(c)).tolist() == c.tolist()

    def test_low_order_first_layout(self):
        # src/naive_impl/kmer.rs golden: "aaa"→0, "aac"→0b010000,
        # "acc"→0b010100, "ccc"→0b010101 (first symbol in lowest bits)
        def word(s):
            w = pack(codes(s.upper()), 2)
            return int(w[0]) if len(w) else 0
        assert word("aaa") == 0b000000
        assert word("aac") == 0b010000
        assert word("acc") == 0b010100
        assert word("ccc") == 0b010101

    def test_word_sizing(self):
        # word_for_k analogue: k=15 @2bit → 1 u64 word; k=65 @2bit → 3 words
        assert packed_words_for(15, 2) == 1
        assert packed_words_for(32, 2) == 1
        assert packed_words_for(33, 2) == 2
        assert packed_words_for(65, 2) == 3


class TestBitsNeeded:
    def test_values(self):
        assert bits_needed(0) == 0
        assert bits_needed(1) == 1
        assert bits_needed(3) == 2
        assert bits_needed(4) == 3
        assert bits_needed(255) == 8
        assert bits_needed(256) == 9
        assert bits_needed(2**63) == 64


@settings(max_examples=60, deadline=None)
@given(
    width=st.integers(min_value=1, max_value=64),
    n=st.integers(min_value=0, max_value=500),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_roundtrip_property(width, n, seed):
    rng = np.random.default_rng(seed)
    hi = (1 << width) - 1
    vals = rng.integers(0, hi, size=n, endpoint=True, dtype=np.uint64)
    words = pack(vals, width)
    assert len(words) == packed_words_for(n, width)
    out = unpack(words, width, n)
    np.testing.assert_array_equal(out, vals)


@pytest.mark.parametrize("width", [1, 2, 3, 4, 5, 7, 8, 11, 13, 16, 17, 24,
                                   31, 32, 33, 48, 63, 64])
def test_roundtrip_all_widths(width):
    rng = np.random.default_rng(42 + width)
    hi = (1 << width) - 1
    vals = rng.integers(0, hi, size=1000, endpoint=True, dtype=np.uint64)
    np.testing.assert_array_equal(unpack(pack(vals, width), width, 1000), vals)


def test_width_zero():
    assert pack(np.zeros(10, dtype=np.uint64), 0).size == 0
    np.testing.assert_array_equal(unpack(np.empty(0, np.uint64), 0, 5),
                                  np.zeros(5, dtype=np.uint64))


class TestGoldenMultiWord:
    """Reference parity for multi-word packing (naive.rs:388-436)."""

    def test_k45_u64_words(self):
        s = "TAAGGATTCTAATCA" * 3
        words = pack(codes(s), 2)
        assert words.tolist() == [3585846758293238403, 7397160]
        # per-symbol extraction table
        got = unpack(words, 2, 45).tolist()
        assert got == [3, 0, 0, 2, 2, 0, 3, 3, 1, 3, 0, 0, 3, 1, 0] * 3

    def test_k65_u128_words(self):
        s = "TAAGGATTCTAATCA" * 4 + "GGGGG"
        words = pack(codes(s), 2)
        # the reference's u128 pair [226...995, 2] viewed as 4 LE u64s
        as_u128_lo = int(words[0]) | (int(words[1]) << 64)
        as_u128_hi = int(words[2]) if len(words) > 2 else 0
        assert as_u128_lo == 226115275135941975929349834069397860995
        assert as_u128_hi == 2
        got = unpack(words, 2, 65).tolist()
        assert got == [3, 0, 0, 2, 2, 0, 3, 3, 1, 3, 0, 0, 3, 1, 0] * 4 + \
            [2, 2, 2, 2, 2]

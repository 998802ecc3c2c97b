"""Reference-parity golden tests for the DNA kernels (FIXTURES.md F2).

Every golden value below is verbatim from the reference's inline tests:
/root/reference/src/encoding/naive.rs:296-445,
/root/reference/src/naive_impl/kmer.rs:280-485,
/root/reference/src/naive_impl/canonical_kmer_iterator.rs:118-206,
/root/reference/src/utils.rs:40-73.
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from packcol.functions.dna import (IDENTITY_MATCH, NO_MATCH, TWIN_MATCH,
                                   canonical_kmer_scan, canonical_space,
                                   canonicalize_words, codes_to_seq,
                                   decode_kmer, encode_kmer, kmer_space,
                                   kmer_windows, mask_kmer, minimizer,
                                   revcomp_words, seq_to_codes,
                                   word_equivalency)

READ = ("TTTTGGCCATTTTTCCTGTTCTTCAAGAAAACAGGAGATAACTAGAAGGACTAGAGAATGGGG"
        "CTGCCAGAACTAGTGGGAAGCTCCCTAGAAATGGTGACATCGCCCACCAAACAGACC")


def canon_str(s: str) -> str:
    w = encode_kmer(s)
    c, _ = canonicalize_words(np.array([w], dtype=np.uint64), len(s))
    return decode_kmer(int(c[0]), len(s)).lower()


class TestGoldenEncode:
    def test_k15_words(self):
        w = encode_kmer("TAAGGATTCTAATCA")
        as_u8 = np.array([w], dtype=np.uint64).view(np.uint8)[:4]
        assert as_u8.tolist() == [131, 242, 13, 7]
        assert np.array([w], dtype=np.uint64).view(np.uint32)[0] == 118354563

    def test_bin_repr(self):
        # kmer.rs bin_repr: low-order-first layout
        assert encode_kmer("aaa") == 0b000000
        assert encode_kmer("aac") == 0b010000
        assert encode_kmer("acc") == 0b010100
        assert encode_kmer("ccc") == 0b010101

    def test_str_roundtrip(self):
        # kmer.rs str_repr
        assert decode_kmer(encode_kmer("catagatacat"), 11) == "CATAGATACAT"

    def test_case_insensitive(self):
        assert encode_kmer("acgt") == encode_kmer("ACGT")

    def test_ord(self):
        # kmer.rs test_ord: packed-word order
        assert encode_kmer("tcc") < encode_kmer("cct")


class TestCanonical:
    def test_into_canon(self):
        # kmer.rs test_into_canon
        assert canon_str("taa") == "taa"
        assert canon_str("tta") == "taa"
        assert canon_str("atc") == "atc"
        assert canon_str("gat") == "atc"
        # 15-mer: already canonical
        assert canon_str("agatacataggatgg") == "agatacataggatgg"

    def test_is_canon(self):
        w = np.array([encode_kmer("agatacataggatgg")], dtype=np.uint64)
        _, is_fw = canonicalize_words(w, 15)
        assert bool(is_fw[0])
        w = np.array([encode_kmer("gatacataggatgg")], dtype=np.uint64)
        _, is_fw = canonicalize_words(w, 14)
        assert not bool(is_fw[0])

    def test_revcomp_matches_string_revcomp(self):
        comp = {"a": "t", "c": "g", "g": "c", "t": "a"}
        for s in ["gatacataggatgg", "acgt", "tttt", "ctgcca"]:
            rc_str = "".join(comp[c] for c in reversed(s))
            w = np.array([encode_kmer(s)], dtype=np.uint64)
            rc = revcomp_words(w, len(s))
            assert decode_kmer(int(rc[0]), len(s)).lower() == rc_str

    def test_rc_identity_property(self):
        # quickcheck rc_identity (kmer.rs:280-285)
        rng = np.random.default_rng(7)
        w = rng.integers(0, 2**62, 500, dtype=np.uint64)
        w = mask_kmer(w, 31)
        np.testing.assert_array_equal(
            revcomp_words(revcomp_words(w, 31), 31), w)

    def test_to_canonical_is_canonical_property(self):
        # quickcheck to_canonical_is_canonical (kmer.rs:287-290)
        rng = np.random.default_rng(8)
        w = mask_kmer(rng.integers(0, 2**62, 500, dtype=np.uint64), 31)
        c, _ = canonicalize_words(w, 31)
        c2, is_fw = canonicalize_words(c, 31)
        np.testing.assert_array_equal(c, c2)
        assert is_fw.all()


class TestEquivalency:
    def test_matches(self):
        a = np.array([encode_kmer("taa")] * 3, dtype=np.uint64)
        b = np.array([encode_kmer("taa"), encode_kmer("tta"),
                      encode_kmer("ccc")], dtype=np.uint64)
        got = word_equivalency(a, b, 3)
        assert got.tolist() == [IDENTITY_MATCH, TWIN_MATCH, NO_MATCH]


class TestIterator:
    """CanonicalKmerIterator parity (canonical_kmer_iterator.rs:118-206).
    Our scan is vectorized; positions/values must match the reference's
    rolling iterator including invalid-skip."""

    def test_positions_valid_read(self):
        canon, pos, _ = canonical_kmer_scan(READ, 31)
        assert pos[0] == 0 and pos[1] == 1 and pos[10] == 10
        assert len(pos) == len(READ) - 31 + 1

    def test_first_kmer_value(self):
        canon, pos, _ = canonical_kmer_scan(READ, 31)
        w = encode_kmer(READ[0:31])
        c, _ = canonicalize_words(np.array([w], dtype=np.uint64), 31)
        assert canon[0] == c[0]

    def test_invalid_skip_init(self):
        # test_iter_init_invalid: N at index 4 → first window at pos 5
        r = "TTTT" + "N" + READ[4:]
        canon, pos, _ = canonical_kmer_scan(r, 31)
        assert pos[0] == 5
        w = encode_kmer(r[5:36])
        c, _ = canonicalize_words(np.array([w], dtype=np.uint64), 31)
        assert canon[0] == c[0]

    def test_invalid_skip_mid(self):
        # test_iter_inc_by_invalid: N at 35 → next window after 5 is 36
        r = READ[:35] + "N" + READ[35:]
        canon, pos, _ = canonical_kmer_scan(r, 31)
        after = pos[pos > 5]
        assert after[0] == 36
        w = encode_kmer(r[36:67])
        c, _ = canonicalize_words(np.array([w], dtype=np.uint64), 31)
        assert canon[pos.tolist().index(36)] == c[0]


class TestMinimizer:
    def test_brute_force_cross_check(self):
        # kmer.rs:561-579 style: minimizer == min over explicit windows
        s = "CTGCCAGAACTAGTGGGAAGCTCCCTAGAAA"[:21]
        k, w = len(s), 7
        word = encode_kmer(s)
        mval, mpos = minimizer(word, k, w)
        wins = [encode_kmer(s[i:i + w]) for i in range(k - w + 1)]
        assert mval == min(wins)
        assert wins[mpos] == mval


class TestSpace:
    def test_kmer_space(self):
        for k, v in enumerate([4, 16, 64, 256, 1024, 4096, 16384, 65536,
                               262144, 1048576], start=1):
            assert kmer_space(k) == v

    def test_canonical_space_pinned(self):
        # utils.rs:61-73 — the implemented (pinned) values, verbatim
        expected = [0, 2, 4, 32, 120, 512, 2036, 8192, 32752, 131072, 524268]
        for k, v in enumerate(expected):
            assert canonical_space(k) == v, k


@settings(max_examples=50, deadline=None)
@given(st.text(alphabet="ACGTacgt", min_size=1, max_size=32))
def test_encode_decode_roundtrip_property(s):
    assert decode_kmer(encode_kmer(s), len(s)) == s.upper()


@settings(max_examples=30, deadline=None)
@given(st.text(alphabet="ACGTN", min_size=0, max_size=100),
       st.integers(min_value=2, max_value=8))
def test_scan_matches_naive(s, k):
    canon, pos, _ = canonical_kmer_scan(s, k)
    naive = [(i, s[i:i + k]) for i in range(max(len(s) - k + 1, 0))
             if "N" not in s[i:i + k]]
    assert pos.tolist() == [i for i, _ in naive]
    for (i, sub), c in zip(naive, canon.tolist()):
        w = encode_kmer(sub)
        cc, _ = canonicalize_words(np.array([w], dtype=np.uint64), k)
        assert c == cc[0]


def test_batch_scan_matches_per_row():
    from packcol.functions.dna import canonical_kmer_scan_batch
    seqs = pa.array([READ[:50], "ACGTN" + READ[5:40], "", "ACG", None,
                     READ[10:90]])
    rows, pos, canon, is_fw = canonical_kmer_scan_batch(seqs, 31)
    # reconstruct per row and compare with the scalar scan
    for i, s in enumerate(seqs.to_pylist()):
        m = rows == i
        c_exp, p_exp, f_exp = canonical_kmer_scan(s or "", 31)
        np.testing.assert_array_equal(pos[m], p_exp)
        np.testing.assert_array_equal(canon[m], c_exp)
        np.testing.assert_array_equal(is_fw[m], f_exp)


def test_canonical_choice_order_equivalence():
    """min(s, revcomp(s)) is the same under string-lex order and
    packed-word order: if i is the first differing position between s
    and rc(s), then k+1-i is the last, and the comparisons are
    complements — so both orders pick the same canonical strand.  (This
    is why the SQL oracle's least() matches our packed-word min.)"""
    rng = np.random.default_rng(3)
    comp = str.maketrans("ACGT", "TGCA")
    for _ in range(300):
        k = int(rng.integers(1, 16))
        s = "".join("ACGT"[c] for c in rng.integers(0, 4, k))
        rc = s.translate(comp)[::-1]
        lex_min = min(s, rc)
        w = encode_kmer(s)
        c, _ = canonicalize_words(np.array([w], dtype=np.uint64), k)
        assert decode_kmer(int(c[0]), k) == lex_min


class TestMultiWord:
    """k > 32 multi-word kernels — generic Kmer<P,K,B> parity
    (/root/reference/src/encoding/naive.rs:388-436, src/kmer.rs:12-14)."""

    def test_k45_golden_revcomp(self):
        from packcol.codecs.bitpack import pack
        from packcol.functions.dna import (decode_kmer_multi,
                                           revcomp_words_multi, seq_to_codes)
        s = "TAAGGATTCTAATCA" * 3
        w = pack(seq_to_codes(s).astype(np.uint64), 2)
        assert w.tolist() == [3585846758293238403, 7397160]
        rc = revcomp_words_multi(w[None, :], 45)
        assert decode_kmer_multi(rc[0], 45) == "TGATTAGAATCCTTA" * 3

    def test_k65_golden_revcomp(self):
        from packcol.codecs.bitpack import pack
        from packcol.functions.dna import (decode_kmer_multi,
                                           revcomp_words_multi, seq_to_codes)
        s = "TAAGGATTCTAATCA" * 4 + "GGGGG"
        w = pack(seq_to_codes(s).astype(np.uint64), 2)
        rc = revcomp_words_multi(w[None, :], 65)
        assert decode_kmer_multi(rc[0], 65) == "CCCCC" + "TGATTAGAATCCTTA" * 4

    def test_revcomp_involution_and_canonical_idempotence(self):
        from packcol.codecs.bitpack import pack
        from packcol.functions.dna import (canonicalize_words_multi,
                                           n_words_for_k,
                                           revcomp_words_multi, seq_to_codes)
        rng = np.random.default_rng(17)
        for k in (33, 45, 63, 64, 65, 96, 127, 128):
            B = n_words_for_k(k)
            seq = "".join("ACGT"[c] for c in rng.integers(0, 4, k))
            w = pack(seq_to_codes(seq).astype(np.uint64), 2)
            if len(w) < B:
                w = np.concatenate([w, np.zeros(B - len(w), np.uint64)])
            w = w[None, :]
            assert np.array_equal(
                revcomp_words_multi(revcomp_words_multi(w, k), k), w), k
            c, _ = canonicalize_words_multi(w, k)
            c2, _ = canonicalize_words_multi(c, k)
            assert np.array_equal(c, c2), k

    def test_windows_skip_invalid_and_match_slices(self):
        from packcol.functions.dna import decode_kmer_multi, kmer_windows_multi
        rng = np.random.default_rng(23)
        seq = ("".join("ACGT"[c] for c in rng.integers(0, 4, 120)) + "N"
               + "".join("ACGT"[c] for c in rng.integers(0, 4, 70)))
        k = 45
        wins, pos = kmer_windows_multi(seq, k)
        exp = [i for i in range(len(seq) - k + 1)
               if "N" not in seq[i:i + k]]
        assert pos.tolist() == exp
        for t in range(0, len(pos), 17):
            assert decode_kmer_multi(wins[t], k) == seq[pos[t]:pos[t] + k]

    def test_batch_scan_matches_per_row_multi(self):
        from packcol.functions.dna import (canonical_kmer_scan_batch_multi,
                                           canonical_kmer_scan_multi)
        rng = np.random.default_rng(29)
        mk = lambda n: "".join("ACGT"[c] for c in rng.integers(0, 4, n))
        seqs = pa.array([mk(100), "", mk(44), None, mk(50) + "N" + mk(60)])
        k = 45
        rows, pos, canon, is_fw = canonical_kmer_scan_batch_multi(seqs, k)
        off = 0
        for i, s in enumerate(seqs.to_pylist()):
            m = rows == i
            c_exp, p_exp, f_exp = canonical_kmer_scan_multi(s or "", k)
            np.testing.assert_array_equal(pos[m], p_exp)
            np.testing.assert_array_equal(canon[m], c_exp)
            np.testing.assert_array_equal(is_fw[m], f_exp)

    def test_canonical_choice_order_equivalence_multi(self):
        """least(s, rc) string order == multi-word packed min for k>32
        (the SQL-oracle equivalence, extended past one word)."""
        from packcol.codecs.bitpack import pack
        from packcol.functions.dna import (canonicalize_words_multi,
                                           decode_kmer_multi, n_words_for_k,
                                           seq_to_codes)
        rng = np.random.default_rng(31)
        comp = str.maketrans("ACGT", "TGCA")
        for _ in range(100):
            k = int(rng.integers(33, 80))
            B = n_words_for_k(k)
            s = "".join("ACGT"[c] for c in rng.integers(0, 4, k))
            rc = s.translate(comp)[::-1]
            w = pack(seq_to_codes(s).astype(np.uint64), 2)
            if len(w) < B:
                w = np.concatenate([w, np.zeros(B - len(w), np.uint64)])
            c, _ = canonicalize_words_multi(w[None, :], k)
            assert decode_kmer_multi(c[0], k) == min(s, rc)


class TestStreaming:
    """Rolling O(1) append/prepend + streaming iterator — parity with
    canonical_kmer.rs:20-141 and canonical_kmer_iterator.rs:123-206
    (all five reference iterator tests reproduced verbatim)."""

    READ31 = ("TTTTGGCCATTTTTCCTGTTCTTCAAGAAAACAGGAGATAACTAGAAGGACT"
              "AGAGAATGGGGCTGCCAGAACTAGTGGGAAGCTCCCTAGAAATGGTGACATC"
              "GCCCACCAAACAGACC")

    def _canon_at(self, seq, i, k=31):
        from packcol.functions.dna import canonicalize_words, encode_kmer
        w = encode_kmer(seq[i:i + k])
        c, _ = canonicalize_words(np.array([w], dtype=np.uint64), k)
        return int(c[0])

    def test_iter_init(self):
        from packcol.functions.dna import CanonicalKmerIteratorStream
        it = CanonicalKmerIteratorStream(self.READ31, 31)
        km, pos = it.get()
        assert pos == 0
        assert km.get_canonical_word() == self._canon_at(self.READ31, 0)

    def test_iter_inc(self):
        from packcol.functions.dna import CanonicalKmerIteratorStream
        it = CanonicalKmerIteratorStream(self.READ31, 31)
        it.inc()
        km, pos = it.get()
        assert pos == 1
        assert km.get_canonical_word() == self._canon_at(self.READ31, 1)

    def test_iter_inc_by(self):
        from packcol.functions.dna import CanonicalKmerIteratorStream
        it = CanonicalKmerIteratorStream(self.READ31, 31)
        it.inc_by(10)
        km, pos = it.get()
        assert pos == 10
        assert km.get_canonical_word() == self._canon_at(self.READ31, 10)

    def test_iter_init_invalid(self):
        from packcol.functions.dna import CanonicalKmerIteratorStream
        r = self.READ31[:4] + "N" + self.READ31[4:]
        it = CanonicalKmerIteratorStream(r, 31)
        km, pos = it.get()
        assert pos == 5
        assert km.get_canonical_word() == self._canon_at(r, 5)

    def test_iter_inc_by_invalid(self):
        from packcol.functions.dna import CanonicalKmerIteratorStream
        r = self.READ31[:35] + "N" + self.READ31[35:]
        it = CanonicalKmerIteratorStream(r, 31)
        it.inc_by(5)
        km, pos = it.get()
        assert pos == 36
        assert km.get_canonical_word() == self._canon_at(r, 36)

    def test_exhausted_works(self):
        from packcol.functions.dna import CanonicalKmerIteratorStream
        it = CanonicalKmerIteratorStream(self.READ31, 31)
        it.inc_by(20)
        assert not it.exhausted()
        it.inc_by(len(self.READ31) - 20)
        assert it.exhausted()
        it.inc()
        assert it.exhausted()

    def test_stream_matches_batch_scan(self):
        """Every (canonical word, pos) from the streaming iterator
        equals the vectorized scan output — incl. invalid skipping."""
        from packcol.functions.dna import (CanonicalKmerIteratorStream,
                                           canonical_kmer_scan)
        rng = np.random.default_rng(77)
        for _ in range(10):
            n = int(rng.integers(35, 200))
            chars = rng.choice(list("ACGTN"), n, p=[.24, .24, .24, .24, .04])
            seq = "".join(chars)
            k = int(rng.integers(3, 32))
            canon, pos, _ = canonical_kmer_scan(seq, k)
            it = CanonicalKmerIteratorStream(seq, k)
            got = []
            while not it.exhausted():
                km, p = it.get()
                got.append((km.get_canonical_word(), p))
                it.inc()
            assert got == list(zip(canon.tolist(), pos.tolist()))

    def test_swap_identity_and_equivalency(self):
        """Property parity with canonical_kmer.rs:216-241."""
        from packcol.functions.dna import (IDENTITY_MATCH, TWIN_MATCH,
                                           CanonicalKmerStream)
        rng = np.random.default_rng(79)
        for _ in range(50):
            k = int(rng.integers(1, 33))
            w = int(rng.integers(0, 1 << min(2 * k, 63)))
            km = CanonicalKmerStream.from_word(w, k)
            fw, rc = km.get_fw_word(), km.get_rc_word()
            km.swap()
            km.swap()
            assert (km.get_fw_word(), km.get_rc_word()) == (fw, rc)
            assert km.get_word_equivalency(fw) == IDENTITY_MATCH
            assert km.get_word_equivalency(rc) == (
                TWIN_MATCH if rc != fw else IDENTITY_MATCH)

    def test_rolling_append_matches_reencode(self):
        from packcol.functions.dna import (CanonicalKmerStream, encode_kmer)
        rng = np.random.default_rng(83)
        seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 60))
        k = 13
        km = CanonicalKmerStream.from_seq(seq[:k], k)
        for i in range(k, len(seq)):
            km.append_char(seq[i])
            win = seq[i - k + 1:i + 1]
            assert km.get_fw_word() == encode_kmer(win), i


def test_scan_rejects_k_over_cap():
    """Regression: k>32 silently truncated to 32 symbols (aliased
    k-mers) instead of raising toward the _multi variants."""
    import pyarrow as pa
    import pytest as _pt
    from packcol.functions.dna import (canonical_kmer_scan_batch,
                                       kmer_windows)
    with _pt.raises(ValueError, match="single-word cap"):
        kmer_windows("ACGT" * 20, 33)
    with _pt.raises(ValueError, match="single-word cap"):
        canonical_kmer_scan_batch(pa.array(["ACGT" * 20]), 40)

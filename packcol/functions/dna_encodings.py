"""User-facing 2-bit symbol->code assignments + the order-preserving hash.

Parity targets (cited as specification, re-expressed as vectorized numpy
kernels over batches of packed u64 words):

* the 24-permutation ``Naive`` enum
  (/root/reference/src/encoding/naive.rs:49-74): the name "XYZW" assigns
  code 0b00 to X, 0b01 to Y, 0b10 to Z, 0b11 to W; the enum's *value*
  byte packs, per nucleotide in internal (A,C,T,G) order, that
  nucleotide's 2-bit code (naive.rs:77-85 ``nuc2bits``).
* ``Xor10`` (/root/reference/src/encoding/xor10.rs:12-41): code =
  (ascii >> 1) & 0b11 (A=0, C=1, T=2, G=3) so encode is branch-free on
  the ASCII byte, and complement is ``code ^ 0b10``.  NOTE: the
  reference's single-word ``rev_comp`` fast path (xor10.rs:74-88)
  computes ``8*size_of::<P>() - 2*kmer`` after the swizzle, which is not
  a reverse-complement, and its golden tests are commented out
  (xor10.rs:108 on); we implement the semantically correct revcomp
  (complement each group, reverse groups, shift) and pin it with tests.
* ``LexHasher`` (/root/reference/src/naive_impl/hash.rs:39-72): reverse
  the 2-bit groups of the packed word and shift down by ``(32-k)*2`` —
  a 64-bit hash that preserves lexicographic sequence order (the
  reference pins h("aaa")=0, h("aac")=1, h("caa")=0b010000 at k=3;
  reproduced in tests/test_dna_encodings.py).

Any per-2-bit-group bijection is applied branch-free via its algebraic
normal form: f(g) = c0 ^ (b0?c1:0) ^ (b1?c2:0) ^ (b0&b1?c3:0) expands to
four XOR/AND mask ops over all 32 groups of a u64 at once, so every one
of the 24 complements costs the same ~6 ops/word as the reference's
special-cased Xor10 path.
"""

from __future__ import annotations

from itertools import permutations

import numpy as np

from .dna import _rev2_word, mask_kmer

_U64 = np.uint64
_LOW = _U64(0x5555555555555555)
_HIGH = _U64(0xAAAAAAAAAAAAAAAA)

#: The 24 permutation names, in the reference's declaration order
#: (naive.rs:49-74).
NAIVE_NAMES = tuple(
    "".join(p) for p in permutations("ACTG")
)


def naive_value(name: str) -> int:
    """The ``Naive`` enum discriminant for a permutation name — per
    internal slot (A, C, T, G — naive.rs:14-16 ``nuc2internal``), the
    2-bit code assigned by the name, packed high-slot-first
    (naive.rs:43-48: first nucleotide of the name gets 00, ...)."""
    if sorted(name) != sorted("ACGT"):
        raise ValueError(f"not a permutation of ACGT: {name!r}")
    v = 0
    for slot, nuc in enumerate("ACTG"):
        v |= name.index(nuc) << (6 - 2 * slot)
    return v


def rev_naive_value(v: int) -> int:
    """Inverse code table — ``rev_encoding`` parity (naive.rs:29-39):
    slot c of the result holds the *internal* index whose code is c."""
    rev = 0
    for slot in range(4):
        code = (v >> (6 - 2 * slot)) & 0b11
        rev |= slot << (6 - 2 * code)
    return rev


def _lut_masks(lut) -> tuple:
    """ANF XOR-mask quadruple for a 4->4 code mapping (see module doc)."""
    f0, f1, f2, f3 = (int(x) & 3 for x in lut)
    c = (f0, f1 ^ f0, f2 ^ f0, f3 ^ f2 ^ f1 ^ f0)
    return tuple(_U64(ci) * _LOW for ci in c)


def apply_2bit_lut(x: np.ndarray, masks: tuple) -> np.ndarray:
    """Apply a per-2-bit-group mapping to every group of each u64,
    branch-free (masks from :func:`_lut_masks`)."""
    x = np.asarray(x, dtype=_U64)
    lo = x & _LOW
    lo = lo | (lo << _U64(1))          # low bit of each group, spread
    hi = x & _HIGH
    hi = hi | (hi >> _U64(1))          # high bit of each group, spread
    m0, m1, m2, m3 = masks
    return m0 ^ (lo & m1) ^ (hi & m2) ^ (lo & hi & m3)


class SymbolEncoding:
    """One symbol->code assignment: vectorized encode/decode/complement/
    revcomp over packed u64 words (the reference's ``Encoding`` trait,
    /root/reference/src/encoding/mod.rs:14-23, minus per-value Rust)."""

    __slots__ = ("name", "enc_table", "dec_table", "comp_table",
                 "_comp_masks")

    def __init__(self, name: str, code_of: dict[str, int]):
        self.name = name
        self.enc_table = np.full(256, 255, dtype=np.uint8)
        self.dec_table = np.zeros(4, dtype=np.uint8)
        for nuc, code in code_of.items():
            self.enc_table[ord(nuc)] = code
            self.enc_table[ord(nuc.lower())] = code
            self.dec_table[code] = ord(nuc)
        comp = {"A": "T", "T": "A", "C": "G", "G": "C"}
        self.comp_table = np.array(
            [code_of[comp[chr(self.dec_table[c])]] for c in range(4)],
            dtype=np.uint8)
        self._comp_masks = _lut_masks(self.comp_table)

    # -- string <-> codes ---------------------------------------------------

    def codes(self, seq: str | bytes) -> np.ndarray:
        """ASCII -> 2-bit codes under this table; invalid symbols -> 255."""
        if isinstance(seq, str):
            seq = seq.encode()
        return self.enc_table.take(np.frombuffer(seq, dtype=np.uint8))

    def decode_codes(self, codes: np.ndarray) -> bytes:
        return self.dec_table.take(np.asarray(codes, np.uint8)).tobytes()

    # -- packed words -------------------------------------------------------

    def encode_words(self, seq: str | bytes) -> np.ndarray:
        """Pack a sequence low-order-first into u64 words (the layout of
        ``Encoding::encode``, naive.rs:116-128: symbol i at bits 2i)."""
        from ..codecs.bitpack import pack
        c = self.codes(seq)
        if (c == 255).any():
            raise ValueError("invalid nucleotide")
        return pack(c.astype(_U64), 2)

    def decode_words(self, words: np.ndarray, n_symbols: int) -> str:
        from ..codecs.bitpack import unpack
        c = unpack(np.asarray(words, _U64).ravel(), 2, n_symbols)
        return self.decode_codes(c).decode()

    # -- branch-free group kernels -----------------------------------------

    def complement_words(self, words: np.ndarray) -> np.ndarray:
        """Complement every 2-bit group (``Naive::complement``,
        naive.rs:98-109 / ``Xor10::complement``, xor10.rs:33-40) — same
        cost for every table via the ANF masks."""
        return apply_2bit_lut(words, self._comp_masks)

    def revcomp_words(self, words: np.ndarray, k: int) -> np.ndarray:
        """Reverse-complement packed <=32-mers: complement groups,
        reverse group order, shift down (the generic ``rev_comp`` of
        naive.rs:138-154, vectorized)."""
        w = np.asarray(words, dtype=_U64)
        if k < 32:
            w = w & _U64((1 << (2 * k)) - 1)
        x = _rev2_word(self.complement_words(w))
        return x >> _U64(2 * (32 - k))

    def revcomp_words_multi(self, words: np.ndarray, k: int) -> np.ndarray:
        """(n, B) little-endian multi-word revcomp, k > 32."""
        from .dna import _shr_multi, mask_kmer_multi
        w = mask_kmer_multi(np.asarray(words, dtype=_U64), k)
        x = _rev2_word(self.complement_words(w))[:, ::-1]
        return _shr_multi(np.ascontiguousarray(x),
                          2 * (32 * w.shape[1] - k))

    def canonicalize_words(self, words: np.ndarray, k: int
                           ) -> tuple[np.ndarray, np.ndarray]:
        """(canonical, is_fw): min(fw, rc) under this encoding's packed
        word order (naive_impl kmer.rs:55-74 generalized to any table)."""
        fw = mask_kmer(np.asarray(words, dtype=_U64), k)
        rc = self.revcomp_words(fw, k)
        is_fw = fw <= rc
        return np.where(is_fw, fw, rc), is_fw

    def __repr__(self) -> str:  # pragma: no cover
        return f"SymbolEncoding({self.name})"


def _naive(name: str) -> SymbolEncoding:
    return SymbolEncoding(name, {nuc: name.index(nuc) for nuc in "ACGT"})


_CACHE: dict[str, SymbolEncoding] = {}


def get_encoding(name: str) -> SymbolEncoding:
    """Resolve a user-facing encoding choice: any of the 24 permutation
    names ("ACGT", "TGCA", ...) or "xor10" (== "ACTG" table with the
    branch-free ASCII derivation — xor10.rs:15-22)."""
    key = name.lower()
    if key not in _CACHE:
        if key == "xor10":
            # (ascii >> 1) & 3: A=0, C=1, T=2, G=3 — the ACTG permutation
            _CACHE[key] = _naive("ACTG")
        else:
            _CACHE[key] = _naive(name.upper())
    return _CACHE[key]


# --- order-preserving hash (LexHasher) -------------------------------------

def lex_hash(words: np.ndarray, k: int) -> np.ndarray:
    """Bit-reverse order-preserving hash of packed <=32-mers
    (/root/reference/src/naive_impl/hash.rs:60-72): reverse the 2-bit
    groups and shift down by (32-k)*2.  With low-order-first packing the
    result is the k-mer packed first-symbol-most-significant, i.e. an
    integer whose order IS the lexicographic order of the sequence under
    the A<C<G<T code table (H3)."""
    if not 1 <= k <= 32:
        raise ValueError("lex_hash is defined for 1 <= k <= 32")
    w = mask_kmer(np.asarray(words, dtype=_U64), k)
    return _rev2_word(w) >> _U64(2 * (32 - k))


def lex_hasher(k: int):
    """A hasher callable for :func:`packcol.functions.dna.minimizer` /
    minimizer scans: LexHasherState::new(k) parity (hash.rs:24-36)."""
    def h(vals: np.ndarray) -> np.ndarray:
        return lex_hash(vals, k)
    return h

"""Vectorized bit-packing of unsigned ints into word-aligned u64 buffers.

Generalizes the reference's fixed 2-bit packing
(/root/reference/src/encoding/naive.rs:116-124 — ``w <<= 2; w |= code``)
to any width 0..64, with the same low-order-first layout: value ``i``
occupies bits ``[i*w, (i+1)*w)`` of a little-endian bitstream, so the
reference's golden vectors (``"TAAGGATTCTAATCA"`` with the ACGT table →
u8 words ``[131,242,13,7]``, u32 word ``[118354563]``;
/root/reference/src/encoding/naive.rs:296-313) fall out of this kernel
byte-for-byte.  Buffer sizing mirrors ``word_for_k``
(/root/reference/src/kmer.rs:67-69): ``ceil(n*w/64)`` u64 words.
"""

from __future__ import annotations

import numpy as np


def bits_needed(max_value: int) -> int:
    """⌈log2(max_value+1)⌉ — generalizes kmer_space cardinality math
    (/root/reference/src/utils.rs:27-29)."""
    if max_value <= 0:
        return 0
    return int(max_value).bit_length()


_PACK_CHUNK = 1 << 18   # values per internal chunk (multiple of 64)


def pack(values: np.ndarray, width: int) -> np.ndarray:
    """Pack n unsigned values of `width` bits into a uint64 word array.

    Low-order-first: values[0] lands in the lowest bits of word 0.
    width == 0 → empty buffer (all values are 0).
    """
    n = len(values)
    if width == 0 or n == 0:
        return np.empty(0, dtype=np.uint64)
    if not (0 < width <= 64):
        raise ValueError(f"width must be in 1..64, got {width}")
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if n > _PACK_CHUNK:
        # chunk at multiples of 2^18 values (divisible by 64, so every
        # chunk is word-aligned for any width → concatenation is exact);
        # keeps temporaries cache-resident instead of O(part) sized
        return np.concatenate([
            pack(v[a:a + _PACK_CHUNK], width)
            for a in range(0, n, _PACK_CHUNK)])

    if 64 % width == 0:
        # fast path: whole number of values per word (widths 1,2,4,8,16,32,64)
        per = 64 // width
        n_words = -(-n // per)
        padded = np.zeros(n_words * per, dtype=np.uint64)
        padded[:n] = v
        padded = padded.reshape(n_words, per)
        shifts = (np.arange(per, dtype=np.uint64) * np.uint64(width))
        return np.bitwise_or.reduce(padded << shifts, axis=1)

    if width in (24, 48):
        # byte-aligned widths: pack via byte view
        nb = width // 8
        as_bytes = v.view(np.uint8).reshape(n, 8)[:, :nb].ravel()
        return _bytes_to_words(as_bytes)

    # general path: each value splits into a low part (shifted into its
    # start word) and an optional high part (spilling into the next
    # word); per-word OR via bitwise_or.reduceat with CLOSED-FORM slice
    # starts (first value starting in word w is ceil(w*64/width)).
    # O(n) uint64 traffic — no bit matrix, no searchsorted.
    n_words = packed_words_for(n, width)
    bit0 = np.arange(n, dtype=np.int64) * width
    lo_shift = (bit0 & np.int64(63)).astype(np.uint64)
    lo = np.empty(n + 1, dtype=np.uint64)
    lo[:n] = v << lo_shift
    lo[n] = 0                                   # pad: empty-slice target
    wb = np.arange(n_words, dtype=np.int64) * 64
    lstarts = np.minimum(-(-wb // width), n)
    out = np.bitwise_or.reduceat(lo, lstarts)
    lempty = np.append(lstarts[1:], n) == lstarts
    out[lempty] = 0
    if n_words > 1:
        nz = lo_shift != 0
        hi = np.zeros(n + 1, dtype=np.uint64)
        np.right_shift(v, np.uint64(64) - lo_shift, out=hi[:n], where=nz)
        # hi of value i lands in word (i*width)//64 + 1
        hstarts = np.minimum(-(-(wb[1:] - 64) // width), n)
        hred = np.bitwise_or.reduceat(hi, hstarts)
        hred[np.append(hstarts[1:], n) == hstarts] = 0
        out[1:] |= hred
    return out


def unpack(words: np.ndarray, width: int, n: int) -> np.ndarray:
    """Inverse of :func:`pack` → uint64 array of length n."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    w = np.ascontiguousarray(words, dtype=np.uint64)
    if n > _PACK_CHUNK:
        return np.concatenate([
            unpack(w[a * width // 64:], width, min(_PACK_CHUNK, n - a))
            for a in range(0, n, _PACK_CHUNK)])

    if 64 % width == 0:
        per = 64 // width
        shifts = (np.arange(per, dtype=np.uint64) * np.uint64(width))
        mask = np.uint64(2**width - 1) if width < 64 else np.uint64(0xFFFFFFFFFFFFFFFF)
        out = ((w[:, None] >> shifts) & mask).ravel()
        return out[:n]

    if width in (24, 48):
        nb = width // 8
        as_bytes = w.view(np.uint8)[: n * nb].reshape(n, nb)
        out = np.zeros((n, 8), dtype=np.uint8)
        out[:, :nb] = as_bytes
        return out.view(np.uint64).ravel()

    # general path: value i = bits [i*width, i*width+width) → two word
    # gathers + shifts (no per-bit expansion)
    bit0 = np.arange(n, dtype=np.int64) * width
    wi = bit0 >> 6
    bo = (bit0 & 63).astype(np.uint64)
    wpad = np.concatenate([w, np.zeros(1, dtype=np.uint64)])
    lo = wpad[wi] >> bo
    hi_shift = np.uint64(64) - bo
    # bo == 0 → shift by 64 is undefined; those rows take no hi bits
    hi = np.where(bo == 0, np.uint64(0),
                  wpad[wi + 1] << np.where(bo == 0, np.uint64(0), hi_shift))
    mask = np.uint64((1 << width) - 1)
    return (lo | hi) & mask


def _bits_to_words(bits: np.ndarray) -> np.ndarray:
    """LSB-first bit array → little-endian u64 word array (zero padded)."""
    packed = np.packbits(bits, bitorder="little")
    pad = (-len(packed)) % 8
    if pad:
        packed = np.concatenate([packed, np.zeros(pad, dtype=np.uint8)])
    return packed.view(np.uint64)


def _bytes_to_words(b: np.ndarray) -> np.ndarray:
    pad = (-len(b)) % 8
    if pad:
        b = np.concatenate([b, np.zeros(pad, dtype=np.uint8)])
    return np.ascontiguousarray(b).view(np.uint64)


def packed_words_for(n: int, width: int) -> int:
    """ceil(n*width/64) — buffer sizing, = word_for_k generalized
    (/root/reference/src/kmer.rs:67-69)."""
    return -(-(n * width) // 64)

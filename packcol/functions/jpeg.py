"""Pure-numpy baseline JPEG codec (decoder + encoder).

The container has no PIL/libjpeg, but baseline sequential JPEG
(SOF0/SOF1) is implementable with stdlib + numpy: marker walk, canonical
Huffman entropy coding, dequantize, batched 8×8 IDCT (one einsum over
all blocks per component), chroma upsample, YCbCr→RGB.  Together with
functions/png.py this makes the multimodal image stages REAL for the
two dominant web-crawl formats (the reference engine has no I/O at all;
this is §2.8 "new engine" surface — see SURVEY.md §2.8).

Decoder coverage:
* baseline + extended sequential DCT, Huffman (SOF0/SOF1); progressive
  (SOF2) and arithmetic coding are rejected with a clear error
* grayscale (1 component) and YCbCr (3 components), any sampling
  factors up to 4 (4:4:4, 4:2:2, 4:2:0, ... handled generically)
* restart markers (DRI/RSTn) with DC-predictor reset
* quant/Huffman tables read from the stream (DQT/DHT), so files from
  any baseline encoder decode — correctness does not depend on this
  module's own table constants

Decode hot path: entropy decoding is per-symbol Python (the known
pure-python floor for Huffman), but everything after it — dequantize,
inverse zigzag, IDCT, level shift, upsample, color convert — is one
batched numpy pass per component.

Encoder: quality-scaled Annex-K quantization, standard Annex-K Huffman
tables (written into DHT, so decoder/encoder agreement is by
construction), 4:4:4 or 4:2:0 chroma subsampling, grayscale or RGB.
JPEG is lossy: roundtrip tests assert PSNR bounds, not equality.
"""

from __future__ import annotations

import struct

import numpy as np


class JpegError(ValueError):
    pass


# ---------------------------------------------------------------------------
# constants
# ---------------------------------------------------------------------------

# zigzag scan: ZIGZAG[i] = natural (row-major) index of the i-th
# zigzag-ordered coefficient
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# Annex K base quantization tables (natural order)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.float64)

_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.float64)

# Annex K Huffman table specs: (bits[1..16], values)
_HUFF_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                 list(range(12)))
_HUFF_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                   list(range(12)))
_HUFF_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA])
_HUFF_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA])

# orthonormal DCT-II matrix: forward F = C @ B @ C.T, inverse B = C.T @ F @ C
_x = np.arange(8)
_DCT = np.cos((2 * _x[None, :] + 1) * _x[:, None] * np.pi / 16) / 2.0
_DCT[0, :] = 1.0 / np.sqrt(8.0)
del _x


# ---------------------------------------------------------------------------
# Huffman tables
# ---------------------------------------------------------------------------


def _canonical_codes(bits, values):
    """(bits[1..16], values) → {symbol: (code, length)} (encoder side)."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffDecoder:
    """Canonical Huffman decoder (mincode/maxcode/valptr, ISO 10918-1
    F.2.2.3)."""

    def __init__(self, bits, values):
        self.values = values
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code, k = 0, 0
        for length in range(1, 17):
            n = bits[length - 1]
            if n:
                self.valptr[length] = k
                self.mincode[length] = code
                code += n
                k += n
                self.maxcode[length] = code - 1
            code <<= 1

    def decode(self, reader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.read_bit()
            if self.maxcode[length] >= code >= self.mincode[length]:
                return self.values[self.valptr[length]
                                   + code - self.mincode[length]]
        raise JpegError("invalid Huffman code in entropy stream")


# ---------------------------------------------------------------------------
# bit I/O
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first reader over an unstuffed entropy segment (one numpy
    unpackbits per segment; per-bit reads are plain list indexing)."""

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(
            np.frombuffer(data, dtype=np.uint8)).tolist()
        self.pos = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.bits):
            raise JpegError("entropy stream exhausted")
        b = self.bits[self.pos]
        self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(bits: int, s: int) -> int:
    """Magnitude-category decode (spec EXTEND)."""
    if s == 0:
        return 0
    if bits < (1 << (s - 1)):
        return bits - (1 << s) + 1
    return bits


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int):
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1s per spec


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def _parse_segments(buf: bytes):
    """Marker walk; yields (marker, payload) and finally
    ('SOS', header, entropy_segments) where entropy_segments is the
    RST-split, unstuffed entropy data."""
    if buf[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG (missing SOI)")
    pos = 2
    while pos < len(buf):
        if buf[pos] != 0xFF:
            raise JpegError(f"expected marker at offset {pos}")
        while pos < len(buf) and buf[pos] == 0xFF:
            pos += 1  # fill bytes
        marker = buf[pos]
        pos += 1
        if marker == 0xD9:  # EOI
            return
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            continue  # stray RST / TEM: no payload
        length = struct.unpack_from(">H", buf, pos)[0]
        payload = buf[pos + 2:pos + length]
        pos += length
        if marker == 0xDA:  # SOS: entropy data follows
            segs, cur = [], bytearray()
            while pos < len(buf):
                b = buf[pos]
                if b != 0xFF:
                    cur.append(b)
                    pos += 1
                    continue
                nxt = buf[pos + 1] if pos + 1 < len(buf) else 0xD9
                if nxt == 0x00:
                    cur.append(0xFF)
                    pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # RSTn: segment boundary
                    segs.append(bytes(cur))
                    cur = bytearray()
                    pos += 2
                else:  # next real marker — entropy data ends
                    break
            segs.append(bytes(cur))
            yield 0xDA, payload, segs
            continue
        yield marker, payload, None


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (h, w) uint8 gray or (h, w, 3) uint8 RGB."""
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    sof = None
    restart_interval = 0
    scan = None
    for marker, payload, segs in _parse_segments(buf):
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                p += 1
                if pq:
                    qt = np.frombuffer(payload, dtype=">u2", count=64,
                                       offset=p).astype(np.int32)
                    p += 128
                else:
                    qt = np.frombuffer(payload, dtype=np.uint8, count=64,
                                       offset=p).astype(np.int32)
                    p += 64
                qtables[tq] = qt  # zigzag order, as stored
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1
            prec, h, w, ncomp = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8:
                raise JpegError(f"{prec}-bit precision not supported")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = struct.unpack_from(
                    ">BBB", payload, 6 + 3 * i)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            sof = (h, w, comps)
        elif marker == 0xC2:
            raise JpegError("progressive JPEG (SOF2) not supported — "
                            "baseline sequential only")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise JpegError(f"SOF marker 0x{marker:02x} not supported")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1:p + 17])
                nvals = sum(bits)
                values = list(payload[p + 17:p + 17 + nvals])
                huff[(tc, th)] = _HuffDecoder(bits, values)
                p += 17 + nvals
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", payload, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = payload[0]
            sel = []
            for i in range(ns):
                cs, tda = payload[1 + 2 * i], payload[2 + 2 * i]
                sel.append((cs, tda >> 4, tda & 0xF))
            scan = (sel, segs)
            break  # single-scan baseline: decode after the walk

    if sof is None or scan is None:
        raise JpegError("missing SOF/SOS")
    h, w, comps = sof
    sel, segs = scan
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    order = []  # (comp, dc_decoder, ac_decoder) in scan order
    for cs, td, ta in sel:
        c = by_id[cs]
        order.append((c, huff[(0, td)], huff[(1, ta)]))

    # coefficient stores: (blocks_y, blocks_x, 64) zigzag-order int32
    for c in comps:
        c["coef"] = np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64),
                             dtype=np.int32)

    n_mcus = mcus_x * mcus_y
    mcu = 0
    seg_iter = iter(segs)
    reader = _BitReader(next(seg_iter))
    pred = {c["id"]: 0 for c in comps}
    while mcu < n_mcus:
        if restart_interval and mcu and mcu % restart_interval == 0:
            reader = _BitReader(next(seg_iter))  # RST: byte-aligned
            pred = {c["id"]: 0 for c in comps}
        my, mx = divmod(mcu, mcus_x)
        for c, dc_t, ac_t in order:
            for v in range(c["v"]):
                for hh in range(c["h"]):
                    blk = c["coef"][my * c["v"] + v, mx * c["h"] + hh]
                    s = dc_t.decode(reader)
                    pred[c["id"]] += _extend(reader.read_bits(s), s)
                    blk[0] = pred[c["id"]]
                    k = 1
                    while k < 64:
                        rs = ac_t.decode(reader)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise JpegError("AC run past block end")
                        blk[k] = _extend(reader.read_bits(s), s)
                        k += 1
        mcu += 1

    # batched reconstruction per component
    inv_zz = np.empty(64, dtype=np.int64)
    inv_zz[ZIGZAG] = np.arange(64)
    planes = []
    for c in comps:
        qt = qtables[c["tq"]]
        zz = c["coef"].reshape(-1, 64) * qt  # dequantize (zigzag order)
        nat = zz[:, inv_zz].reshape(-1, 8, 8).astype(np.float64)
        pix = np.einsum("ux,nuv,vy->nxy", _DCT, nat, _DCT,
                        optimize=True) + 128.0
        by, bx = c["coef"].shape[:2]
        plane = pix.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(by * 8, bx * 8)
        # upsample to full resolution by pixel replication
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1 or fx > 1:
            plane = np.repeat(np.repeat(plane, fy, axis=0), fx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def _quality_table(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling (natural order, int32 in [1, 255])."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _pad_to(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _fdct_quant(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """(H, W) float plane (H, W multiples of 8) → (by, bx, 64)
    quantized zigzag-order int32 coefficients — one einsum for every
    block in the plane."""
    hh, ww = plane.shape
    by, bx = hh // 8, ww // 8
    blocks = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3) \
        .reshape(-1, 8, 8) - 128.0
    coef = np.einsum("ux,nxy,vy->nuv", _DCT, blocks, _DCT,
                     optimize=True)
    q = np.round(coef.reshape(-1, 64) / qt[None, :]).astype(np.int32)
    return q[:, ZIGZAG].reshape(by, bx, 64)


def _encode_block(wr: _BitWriter, zz: np.ndarray, pred: int,
                  dc_codes, ac_codes) -> int:
    diff = int(zz[0]) - pred
    s = int(abs(diff)).bit_length()
    code, n = dc_codes[s]
    wr.write(code, n)
    if s:
        wr.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    nz = np.nonzero(zz[1:])[0]
    prev = 0
    for idx in nz:
        k = int(idx) + 1
        run = k - prev - 1
        while run >= 16:
            code, n = ac_codes[0xF0]
            wr.write(code, n)
            run -= 16
        v = int(zz[k])
        s = abs(v).bit_length()
        code, n = ac_codes[(run << 4) | s]
        wr.write(code, n)
        wr.write(v if v > 0 else v + (1 << s) - 1, s)
        prev = k
    if prev != 63:
        code, n = ac_codes[0x00]  # EOB
        wr.write(code, n)
    return int(zz[0])


def _dht_segment(tc: int, th: int, spec) -> bytes:
    bits, values = spec
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


def _dqt_segment(tq: int, qt_nat: np.ndarray) -> bytes:
    body = bytes([tq]) + bytes(qt_nat[ZIGZAG].astype(np.uint8))
    return b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """numpy uint8 image → baseline JFIF JPEG bytes.

    (h, w) → grayscale; (h, w, 3) → YCbCr color, 4:4:4 by default or
    4:2:0 with subsample=True.  restart_interval > 0 writes DRI and a
    byte-aligned RSTn every that-many MCUs (resumable scans; also
    exercises the decoder's restart path).  Lossy — roundtrips are
    PSNR-close, not exact."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise JpegError("encoder takes uint8 images")
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[:, :, 0]
    if img.ndim not in (2, 3) or (img.ndim == 3 and img.shape[2] != 3):
        raise JpegError("encoder takes (h, w) gray or (h, w, 3) RGB")
    h, w = img.shape[:2]
    gray = img.ndim == 2
    qt_l = _quality_table(_QT_LUMA, quality)
    qt_c = _quality_table(_QT_CHROMA, quality)

    if gray:
        planes = [img.astype(np.float64)]
        samps = [(1, 1)]
        qts = [qt_l]
    else:
        f = img.astype(np.float64)
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:  # 4:2:0 — 2×2 mean over an edge-padded plane
            cbp = _pad_to(cb, 2)
            crp = _pad_to(cr, 2)
            cb = cbp.reshape(cbp.shape[0] // 2, 2, -1, 2).mean((1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2, -1, 2).mean((1, 3))
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            samps = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qts = [qt_l, qt_c, qt_c]

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    coefs = []
    for plane, (sh, sv), qt in zip(planes, samps, qts):
        # pad so every component covers the same whole-MCU grid
        mx = -(-w // (8 * hmax)) * sh
        my = -(-h // (8 * vmax)) * sv
        p = _pad_to(plane, 8)
        p = np.pad(p, ((0, my * 8 - p.shape[0]), (0, mx * 8 - p.shape[1])),
                   mode="edge") if (p.shape[0] < my * 8
                                    or p.shape[1] < mx * 8) else p
        coefs.append(_fdct_quant(p[:my * 8, :mx * 8], qt))

    dc_l = _canonical_codes(*_HUFF_DC_LUMA)
    ac_l = _canonical_codes(*_HUFF_AC_LUMA)
    dc_c = _canonical_codes(*_HUFF_DC_CHROMA)
    ac_c = _canonical_codes(*_HUFF_AC_CHROMA)
    tables = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (len(planes) - 1)

    wr = _BitWriter()
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    pred = [0] * len(planes)
    rst = 0
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            wr.flush()
            wr.out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) & 7
            pred = [0] * len(planes)
        my, mx = divmod(mcu, mcus_x)
        for ci, ((sh, sv), (dc_codes, ac_codes)) in \
                enumerate(zip(samps, tables)):
            for v in range(sv):
                for hh in range(sh):
                    zz = coefs[ci][my * sv + v, mx * sh + hh]
                    pred[ci] = _encode_block(wr, zz, pred[ci],
                                             dc_codes, ac_codes)
    wr.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1)
            + bytes([0, 0]))  # APP0
    out += _dqt_segment(0, qt_l)
    if not gray:
        out += _dqt_segment(1, qt_c)
    ncomp = len(planes)
    sof = bytes([8]) + struct.pack(">HHB", h, w, ncomp)
    for ci, (sh, sv) in enumerate(samps):
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    out += _dht_segment(0, 0, _HUFF_DC_LUMA)
    out += _dht_segment(1, 0, _HUFF_AC_LUMA)
    if not gray:
        out += _dht_segment(0, 1, _HUFF_DC_CHROMA)
        out += _dht_segment(1, 1, _HUFF_AC_CHROMA)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += wr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)

"""Pure-numpy PNG codec (decoder + fixture encoder).

The container has no PIL/libpng, but PNG's container is just zlib
(stdlib) + per-scanline delta filters, so a complete baseline decoder
is feasible with numpy alone.  This makes the multimodal image stages
REAL for the most common lossless web format (the reference engine has
no I/O at all; this is part of the §2.8 "new engine" surface — see
SURVEY.md §2.8 and the multimodal stage docs).

Decoder coverage (PNG 1.2 core):
* chunk walk with CRC verification (IHDR / PLTE / tRNS / IDAT+ / IEND)
* color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA)
* bit depths 1 / 2 / 4 / 8 / 16 (sub-byte depths unpacked and scaled,
  16-bit returned as uint16 big-endian-decoded)
* all five scanline filters (None / Sub / Up / Average / Paeth)
* interlace 0 (sequential) and 1 (Adam7)

Vectorization: None/Sub/Up filters are fully vectorized (Sub via
per-lane modular cumsum); Average/Paeth depend nonlinearly on the
previous reconstructed pixel so they loop over PIXELS per scanline
with numpy ops across the bpp lanes — O(w) python steps per row, which
is the known pure-python floor for those filters.

Encoder (fixture writer, also a legitimate sink): gray8 / gray16 /
RGB8 / RGBA8 / gray+alpha, selectable filter type 0-4 per image and
optional Adam7 interlace, so tests can exercise every decode path
without any external image library.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# channels per color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 pass offsets/strides: (x0, y0, dx, dy)
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


class PngError(ValueError):
    pass


# ---------------------------------------------------------------------------
# chunk layer
# ---------------------------------------------------------------------------


def _iter_chunks(buf: bytes):
    if buf[:8] != _SIG:
        raise PngError("not a PNG (bad signature)")
    pos = 8
    while pos + 8 <= len(buf):
        length = struct.unpack_from(">I", buf, pos)[0]
        ctype = buf[pos + 4:pos + 8]
        body = buf[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise PngError(f"truncated chunk {ctype!r}")
        crc = struct.unpack_from(">I", buf, pos + 8 + length)[0]
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise PngError(f"CRC mismatch in chunk {ctype!r}")
        yield ctype, body
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise PngError("missing IEND")


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))


# ---------------------------------------------------------------------------
# filters
# ---------------------------------------------------------------------------


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse per-scanline filtering.  raw is h*(1+stride) bytes;
    returns (h, stride) uint8 of reconstructed scanlines."""
    rawm = raw.reshape(h, 1 + stride)
    ftype = rawm[:, 0]
    lines = rawm[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    npix = stride // bpp
    for y in range(h):
        f = int(ftype[y])
        line = lines[y].astype(np.int32)
        if f == 0:
            rec = line
        elif f == 1:  # Sub: modular per-lane cumsum
            rec = np.empty(stride, dtype=np.int32)
            lanes = line.reshape(npix, bpp)
            rec.reshape(npix, bpp)[:] = \
                np.cumsum(lanes.astype(np.int64), axis=0) & 0xFF
        elif f == 2:  # Up
            rec = (line + prev) & 0xFF
        elif f == 3:  # Average
            rec = np.empty(stride, dtype=np.int32)
            lanes = line.reshape(npix, bpp)
            pv = prev.reshape(npix, bpp)
            left = np.zeros(bpp, dtype=np.int32)
            rl = rec.reshape(npix, bpp)
            for x in range(npix):
                left = (lanes[x] + ((left + pv[x]) >> 1)) & 0xFF
                rl[x] = left
        elif f == 4:  # Paeth
            rec = np.empty(stride, dtype=np.int32)
            lanes = line.reshape(npix, bpp)
            pv = prev.reshape(npix, bpp)
            rl = rec.reshape(npix, bpp)
            left = np.zeros(bpp, dtype=np.int32)
            upleft = np.zeros(bpp, dtype=np.int32)
            for x in range(npix):
                up = pv[x]
                p = left + up - upleft
                pa_ = np.abs(p - left)
                pb = np.abs(p - up)
                pc = np.abs(p - upleft)
                pred = np.where((pa_ <= pb) & (pa_ <= pc), left,
                                np.where(pb <= pc, up, upleft))
                left = (lanes[x] + pred) & 0xFF
                rl[x] = left
                upleft = up
        else:
            raise PngError(f"unknown filter type {f}")
        out[y] = rec
        prev = rec
    return out


def _filter_line(line: np.ndarray, prev: np.ndarray, bpp: int,
                 ftype: int) -> np.ndarray:
    """Forward filter one scanline (encoder side).  line/prev int32."""
    if ftype == 0:
        return line & 0xFF
    left = np.zeros_like(line)
    left[bpp:] = line[:-bpp]
    if ftype == 1:
        return (line - left) & 0xFF
    if ftype == 2:
        return (line - prev) & 0xFF
    if ftype == 3:
        return (line - ((left + prev) >> 1)) & 0xFF
    if ftype == 4:
        upleft = np.zeros_like(prev)
        upleft[bpp:] = prev[:-bpp]
        p = left + prev - upleft
        pa_ = np.abs(p - left)
        pb = np.abs(p - prev)
        pc = np.abs(p - upleft)
        pred = np.where((pa_ <= pb) & (pa_ <= pc), left,
                        np.where(pb <= pc, prev, upleft))
        return (line - pred) & 0xFF
    raise PngError(f"unknown filter type {ftype}")


# ---------------------------------------------------------------------------
# sample (de)serialization
# ---------------------------------------------------------------------------


def _scanlines_to_samples(rows: np.ndarray, w: int, channels: int,
                          depth: int) -> np.ndarray:
    """(h, stride) uint8 scanline bytes → (h, w*channels) sample array
    (uint8 for depth<=8 — sub-byte depths left as raw small ints —
    uint16 for depth 16)."""
    h = rows.shape[0]
    if depth == 8:
        return rows[:, :w * channels]
    if depth == 16:
        be = rows[:, :w * channels * 2].reshape(h, w * channels, 2)
        return (be[:, :, 0].astype(np.uint16) << 8) | be[:, :, 1]
    # sub-byte gray/palette: unpack MSB-first fields
    bits = np.unpackbits(rows, axis=1)
    vals = bits.reshape(h, -1, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    samples = (vals * weights).sum(axis=2).astype(np.uint8)
    return samples[:, :w * channels]


def _samples_to_scanlines(img: np.ndarray, depth: int) -> np.ndarray:
    """(h, w*channels) samples → (h, stride) uint8 scanline bytes."""
    h = img.shape[0]
    if depth == 8:
        return img.astype(np.uint8)
    if depth == 16:
        v = img.astype(np.uint16)
        out = np.empty((h, img.shape[1] * 2), dtype=np.uint8)
        out[:, 0::2] = v >> 8
        out[:, 1::2] = v & 0xFF
        return out
    raise PngError("encoder supports depth 8/16 only")


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def _decode_pass(data: np.ndarray, w: int, h: int, channels: int,
                 depth: int) -> tuple[np.ndarray, int]:
    """Unfilter+desample one (sub)image of w×h; returns (samples
    (h, w*channels), bytes consumed)."""
    if w == 0 or h == 0:
        return np.zeros((h, w * channels), dtype=np.uint8), 0
    stride = (w * channels * depth + 7) // 8
    bpp = max((channels * depth + 7) // 8, 1)
    need = h * (1 + stride)
    if len(data) < need:
        raise PngError("IDAT too short")
    rows = _unfilter(data[:need], h, stride, bpp)
    return _scanlines_to_samples(rows, w, channels, depth), need


def decode_png(buf: bytes, expand_palette: bool = True):
    """PNG bytes → numpy image.

    Returns (h, w) for 1-channel, (h, w, ch) otherwise; dtype uint8
    for depth<=8 (sub-byte gray scaled to the full 0-255 range),
    uint16 for depth 16.  Palette images are expanded to RGB (or RGBA
    when a tRNS chunk is present) unless expand_palette=False, which
    returns the raw index plane."""
    ihdr = None
    palette = None
    trns = None
    idat = []
    for ctype, body in _iter_chunks(buf):
        if ctype == b"IHDR":
            w, h, depth, ctyp, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if comp != 0 or filt != 0:
                raise PngError("unsupported compression/filter method")
            if ctyp not in _CHANNELS:
                raise PngError(f"unknown color type {ctyp}")
            if depth not in (1, 2, 4, 8, 16):
                raise PngError(f"bad bit depth {depth}")
            ihdr = (w, h, depth, ctyp, interlace)
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(body, dtype=np.uint8)
        elif ctype == b"IDAT":
            idat.append(body)
    if ihdr is None:
        raise PngError("missing IHDR")
    w, h, depth, ctyp, interlace = ihdr
    channels = _CHANNELS[ctyp]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)

    if interlace == 0:
        samples, _ = _decode_pass(raw, w, h, channels, depth)
    elif interlace == 1:
        full_dtype = np.uint16 if depth == 16 else np.uint8
        samples = np.zeros((h, w * channels), dtype=full_dtype)
        pos = 0
        for (x0, y0, dx, dy) in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            sub, used = _decode_pass(raw[pos:], pw, ph, channels, depth)
            pos += used
            if pw and ph:
                view = samples.reshape(h, w, channels)
                view[y0::dy, x0::dx, :] = sub.reshape(ph, pw, channels)
    else:
        raise PngError(f"unknown interlace method {interlace}")

    img = samples.reshape(h, w, channels)
    if ctyp == 3:  # palette
        if expand_palette:
            if palette is None:
                raise PngError("palette image missing PLTE")
            idx = img[:, :, 0]
            rgb = palette[idx]
            if trns is not None:
                alpha = np.full(len(palette), 255, dtype=np.uint8)
                alpha[:len(trns)] = trns
                return np.dstack([rgb, alpha[idx]])
            return rgb
        return img[:, :, 0]
    if depth < 8:  # scale sub-byte gray to 0..255
        img = (img.astype(np.uint16) * 255 // ((1 << depth) - 1)) \
            .astype(np.uint8)
    if channels == 1:
        return img[:, :, 0]
    return img


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def encode_png(img: np.ndarray, filter_type: int = 0,
               interlace: bool = False, level: int = 6) -> bytes:
    """numpy image → PNG bytes.

    dtype uint8 → depth 8; uint16 → depth 16.  Shape (h, w) → gray,
    (h, w, 2) → gray+alpha, (h, w, 3) → RGB, (h, w, 4) → RGBA.
    filter_type 0-4 applies that filter to every scanline (exercises
    each decoder filter path); interlace=True writes Adam7."""
    img = np.asarray(img)
    if img.dtype == np.uint8:
        depth = 8
    elif img.dtype == np.uint16:
        depth = 16
    else:
        raise PngError("encoder takes uint8 or uint16 images")
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, channels = img.shape
    ctyp = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    bpp = channels * depth // 8

    def _pass_bytes(sub: np.ndarray) -> bytes:
        ph, pw = sub.shape[:2]
        if ph == 0 or pw == 0:
            return b""
        lines = _samples_to_scanlines(sub.reshape(ph, pw * channels),
                                      depth)
        stride = lines.shape[1]
        out = np.empty((ph, 1 + stride), dtype=np.uint8)
        out[:, 0] = filter_type
        prev = np.zeros(stride, dtype=np.int32)
        for y in range(ph):
            line = lines[y].astype(np.int32)
            out[y, 1:] = _filter_line(line, prev, bpp, filter_type)
            prev = line
        return out.tobytes()

    if interlace:
        body = b"".join(_pass_bytes(img[y0::dy, x0::dx])
                        for (x0, y0, dx, dy) in _ADAM7)
    else:
        body = _pass_bytes(img)

    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctyp, 0, 0,
                       1 if interlace else 0)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(body, level))
            + _chunk(b"IEND", b""))


def encode_png_palette(img: np.ndarray, level: int = 6) -> bytes:
    """RGB uint8 image with ≤256 distinct colors → palette (color type
    3) PNG, for decoder PLTE-path fixtures."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise PngError("palette encoder takes (h, w, 3) uint8")
    h, w, _ = img.shape
    flat = img.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise PngError(f"{len(colors)} colors > 256")
    idx = inverse.astype(np.uint8).reshape(h, w)
    out = np.empty((h, 1 + w), dtype=np.uint8)
    out[:, 0] = 0
    out[:, 1:] = idx
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"PLTE", colors.astype(np.uint8).tobytes())
            + _chunk(b"IDAT", zlib.compress(out.tobytes(), level))
            + _chunk(b"IEND", b""))

"""Pure-stdlib+numpy GIF codec (GIF87a/GIF89a).

The third real web-crawl image format next to functions/png.py and
functions/jpeg.py (the container has no PIL).  Covers the full static
and animated baseline: global/local color tables, LZW with growing
code widths (12-bit cap, deferred-clear streams), interlace, frame
compositing with transparency and disposal methods 0/1/2.

Reference parity note: the reference repo (COMBINE-lab/kmers) is a
value-encoding library with no image I/O; this module exists for the
engine's multimodal pipeline (stages/multimodal.py), not for parity.

Scope: decodes to RGB uint8 (palette-applied).  Plain-text extensions
and unknown app extensions are skipped per spec.
"""
from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------

def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW → uint8 index array of exactly n_pixels.

    Sequential by nature (each code may reference the previous one);
    the loop is over CODES, not pixels, and emitted sequences append
    as slices.  Tolerates streams that end early (pads with 0, as
    browsers do) or run long (truncates)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = np.zeros(n_pixels, dtype=np.uint8)
    pos = 0

    # dictionary as a list of bytes
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    prev: bytes | None = None

    acc = 0          # bit accumulator (LSB-first per spec)
    nbits = 0
    i = 0
    n = len(data)
    while i < n or nbits >= code_size:
        while nbits < code_size and i < n:
            acc |= data[i] << nbits
            nbits += 8
            i += 1
        if nbits < code_size:
            break
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            seq = table[code]
        elif code < len(table):
            seq = table[code]
            table.append(prev + seq[:1])
        elif code == len(table):  # the KwKwK case
            seq = prev + prev[:1]
            table.append(seq)
        else:
            raise ValueError(f"corrupt LZW stream: code {code} beyond "
                             f"table of {len(table)}")
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
        take = min(len(seq), n_pixels - pos)
        if take > 0:
            out[pos:pos + take] = np.frombuffer(seq[:take], np.uint8)
            pos += take
        if pos >= n_pixels:
            break
        prev = seq
    return out


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-variant LZW encoder (for tests / the multimodal fixtures)."""
    clear = 1 << min_code_size
    end = clear + 1
    codes: list[int] = [clear]
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code_size + 1
    sizes: list[int] = []

    def emit(c: int) -> None:
        codes.append(c)
        sizes.append(code_size)

    sizes.append(code_size)  # the initial clear
    buf = b""
    for b in indices.astype(np.uint8).tobytes():
        nxt = buf + bytes([b])
        if nxt in table:
            buf = nxt
            continue
        emit(table[buf])
        table[nxt] = next_code
        next_code += 1
        # the decoder appends each entry one code LATER than we do (it
        # learns the entry from the next code), so its width grows one
        # append after ours would: grow at 2^cs + 1, not 2^cs
        if next_code == (1 << code_size) + 1 and code_size < 12:
            code_size += 1
        if next_code >= (1 << 12):
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        buf = bytes([b])
    if buf:
        emit(table[buf])
    codes.append(end)
    sizes.append(code_size)

    acc = nbits = 0
    out = bytearray()
    for c, s in zip(codes, sizes):
        acc |= c << nbits
        nbits += s
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container walk
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray, w: int, h: int) -> np.ndarray:
    rows = idx.reshape(h, w)
    out = np.empty_like(rows)
    r = 0
    for start, step in _INTERLACE_PASSES:
        n = len(range(start, h, step))
        out[start::step] = rows[r:r + n]
        r += n
    return out


def _sub_blocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate GIF data sub-blocks starting at pos; returns
    (data, position after the 0 terminator)."""
    parts = []
    while True:
        n = buf[pos]
        pos += 1
        if n == 0:
            break
        parts.append(buf[pos:pos + n])
        pos += n
    return b"".join(parts), pos


def decode_gif_frames(buf: bytes) -> list[np.ndarray]:
    """All frames of a GIF as (h, w, 3) uint8 RGB arrays, composited
    onto the logical screen with transparency and disposal methods
    0/1 (leave) and 2 (restore to background) applied."""
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError(f"not a GIF: magic {buf[:6]!r}")
    sw, sh, packed, bg_idx, _ = struct.unpack_from("<HHBBB", buf, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(buf, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n

    canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
    if gct is not None and bg_idx < len(gct):
        canvas[:] = gct[bg_idx]
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    while pos < len(buf):
        block = buf[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = buf[pos]
            pos += 1
            data, pos = _sub_blocks(buf, pos)
            if label == 0xF9 and len(data) >= 4:  # graphic control
                flags = data[0]
                disposal = (flags >> 2) & 0x07
                transparent = data[3] if flags & 1 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", buf, pos)
        pos += 9
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            ct = np.frombuffer(buf, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF frame with no color table")
        min_code = buf[pos]
        pos += 1
        data, pos = _sub_blocks(buf, pos)
        idx = _lzw_decode(data, min_code, w * h)
        rows = _deinterlace(idx, w, h) if ipacked & 0x40 \
            else idx.reshape(h, w)
        rgb = ct[np.minimum(rows, len(ct) - 1)]
        region = canvas[top:top + h, left:left + w]
        if transparent is not None:
            opaque = rows != transparent
            region[opaque] = rgb[opaque]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        if disposal == 2:  # restore region to background
            region[:] = gct[bg_idx] if gct is not None and \
                bg_idx < len(gct) else 0
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF with no image data")
    return frames


def decode_gif(buf: bytes) -> np.ndarray:
    """First frame as (h, w, 3) uint8 RGB."""
    return decode_gif_frames(buf)[0]


def encode_gif(img: np.ndarray, palette: np.ndarray | None = None) -> bytes:
    """Encode one (h, w) palette-index / grayscale or (h, w, 3) RGB
    uint8 image as a static GIF89a.  RGB input must use at most 256
    distinct colors (GIF is palette-based — quantization is the
    caller's concern); grayscale gets the identity 256-gray palette."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2 and palette is None:
        palette = np.repeat(np.arange(256, dtype=np.uint8), 3) \
            .reshape(256, 3)
        idx = img
    elif img.ndim == 2:
        idx = img
    else:
        flat = img.reshape(-1, 3)
        palette, inv = np.unique(flat, axis=0, return_inverse=True)
        if len(palette) > 256:
            raise ValueError(f"{len(palette)} distinct colors; GIF "
                             "needs <= 256 (quantize first)")
        idx = inv.astype(np.uint8).reshape(img.shape[:2])
    n = max(2, int(np.ceil(np.log2(max(len(palette), 2)))))
    table = np.zeros((1 << n, 3), dtype=np.uint8)
    table[:len(palette)] = palette
    h, w = idx.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (n - 1), 0, 0)
    out += table.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    min_code = max(2, n)
    out.append(min_code)
    data = _lzw_encode(idx.ravel(), min_code)
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    out.append(0x3B)
    return bytes(out)

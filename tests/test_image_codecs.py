"""Pure-numpy PNG (functions/png.py) and baseline JPEG
(functions/jpeg.py) codecs, plus the sniff/dispatch layer
(functions/media.py::decode_image) and the multi-format multimodal
stages.  No external image library exists in this container, so every
decode path is exercised by this repo's own encoders — the PNG paths
roundtrip exactly; JPEG is lossy and asserts PSNR bounds."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from packcol.functions.jpeg import JpegError, decode_jpeg, encode_jpeg
from packcol.functions.media import (decode_image, encode_pnm,
                                     sniff_image_format)
from packcol.functions.png import (PngError, decode_png, encode_png,
                                   encode_png_palette)


def _img(h=32, w=48, seed=0, channels=3, dtype=np.uint8):
    rng = np.random.default_rng(seed)
    hi = 65536 if dtype == np.uint16 else 256
    shape = (h, w) if channels == 1 else (h, w, channels)
    return rng.integers(0, hi, shape, dtype=dtype)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))


class TestPng:
    @pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
    @pytest.mark.parametrize("channels", [1, 2, 3, 4])
    def test_roundtrip_all_filters_and_colortypes(self, filter_type,
                                                  channels):
        img = _img(13, 17, seed=filter_type * 7 + channels,
                   channels=channels)
        out = decode_png(encode_png(img, filter_type=filter_type))
        np.testing.assert_array_equal(out, img)

    @pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
    def test_roundtrip_gray16(self, filter_type):
        img = _img(9, 11, seed=3, channels=1, dtype=np.uint16)
        out = decode_png(encode_png(img, filter_type=filter_type))
        assert out.dtype == np.uint16
        np.testing.assert_array_equal(out, img)

    @pytest.mark.parametrize("channels", [1, 3, 4])
    def test_roundtrip_adam7_interlace(self, channels):
        # sizes that are NOT multiples of 8 stress the pass geometry
        for h, w in [(1, 1), (3, 5), (8, 8), (13, 21)]:
            img = _img(h, w, seed=h * w, channels=channels)
            out = decode_png(encode_png(img, filter_type=4,
                                        interlace=True))
            np.testing.assert_array_equal(out, img)

    def test_palette_roundtrip_and_raw_indices(self):
        rng = np.random.default_rng(5)
        colors = rng.integers(0, 256, (7, 3), dtype=np.uint8)
        idx = rng.integers(0, 7, (10, 12))
        img = colors[idx]
        buf = encode_png_palette(img)
        np.testing.assert_array_equal(decode_png(buf), img)
        raw = decode_png(buf, expand_palette=False)
        assert raw.shape == (10, 12)  # index plane, not expanded

    def test_sub_byte_gray_decode(self):
        # hand-built depth-4 gray PNG (our encoder is 8/16-bit only):
        # 2x3 image, samples packed MSB-first two per byte
        samples = np.array([[0, 5, 15], [8, 1, 12]], dtype=np.uint8)
        rows = []
        for r in samples:
            packed = bytes([(r[0] << 4) | r[1], r[2] << 4])
            rows.append(b"\x00" + packed)  # filter 0
        idat = zlib.compress(b"".join(rows))

        def chunk(ctype, body):
            return (struct.pack(">I", len(body)) + ctype + body
                    + struct.pack(">I",
                                  zlib.crc32(ctype + body) & 0xFFFFFFFF))

        buf = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 4, 0,
                                            0, 0, 0))
               + chunk(b"IDAT", idat) + chunk(b"IEND", b""))
        out = decode_png(buf)
        # depth-4 samples scale to full range: v * 255 // 15
        np.testing.assert_array_equal(out,
                                      samples.astype(int) * 255 // 15)

    def test_crc_corruption_detected(self):
        buf = bytearray(encode_png(_img(4, 4)))
        buf[40] ^= 0xFF  # flip a byte inside IDAT
        with pytest.raises(PngError, match="CRC"):
            decode_png(bytes(buf))

    def test_not_a_png(self):
        with pytest.raises(PngError):
            decode_png(b"JFIF not a png")


class TestJpeg:
    def test_color_444_psnr(self):
        # smooth gradients compress near-losslessly at high quality
        xx, yy = np.meshgrid(np.arange(64), np.arange(48))
        img = np.stack([(xx * 3) % 256, (yy * 4) % 256,
                        ((xx + yy) * 2) % 256], axis=-1).astype(np.uint8)
        dec = decode_jpeg(encode_jpeg(img, quality=95))
        assert dec.shape == img.shape and dec.dtype == np.uint8
        assert _psnr(img, dec) > 45

    def test_gray_psnr_and_shape(self):
        img = _img(33, 41, seed=2, channels=1)
        dec = decode_jpeg(encode_jpeg(img, quality=95))
        assert dec.shape == (33, 41)
        assert _psnr(img, dec) > 30  # noise image: lossy floor

    def test_subsample_420_luma_preserved(self):
        xx, yy = np.meshgrid(np.arange(40), np.arange(24))
        img = np.stack([(xx * 5) % 256] * 3, axis=-1).astype(np.uint8)
        dec = decode_jpeg(encode_jpeg(img, quality=90, subsample=True))
        assert dec.shape == img.shape
        assert _psnr(img, dec) > 35

    @pytest.mark.parametrize("subsample", [False, True])
    def test_restart_markers_decode_identically(self, subsample):
        img = _img(19, 21, seed=6)
        base = decode_jpeg(encode_jpeg(img, quality=85,
                                       subsample=subsample))
        for ri in (1, 2, 5):
            dec = decode_jpeg(encode_jpeg(img, quality=85,
                                          subsample=subsample,
                                          restart_interval=ri))
            np.testing.assert_array_equal(dec, base)

    def test_quality_monotone_in_size(self):
        img = _img(32, 32, seed=8)
        sizes = [len(encode_jpeg(img, quality=q)) for q in (30, 70, 95)]
        assert sizes[0] < sizes[1] < sizes[2]

    def test_progressive_rejected(self):
        buf = bytearray(encode_jpeg(_img(8, 8), quality=90))
        i = bytes(buf).find(b"\xff\xc0")
        buf[i + 1] = 0xC2  # rewrite SOF0 → SOF2
        with pytest.raises(JpegError, match="progressive"):
            decode_jpeg(bytes(buf))

    def test_not_a_jpeg(self):
        with pytest.raises(JpegError):
            decode_jpeg(b"\x89PNG\r\n\x1a\n")


class TestDispatch:
    def test_sniff(self):
        img = _img(8, 8)
        assert sniff_image_format(encode_pnm(img)) == "pnm"
        assert sniff_image_format(encode_png(img)) == "png"
        assert sniff_image_format(encode_jpeg(img)) == "jpeg"
        assert sniff_image_format(b"GIF89a...") == "gif"  # real since functions/gif.py
        assert sniff_image_format(b"BM......") is None

    def test_decode_image_all_formats(self):
        img = _img(12, 16, seed=9)
        np.testing.assert_array_equal(decode_image(encode_pnm(img)), img)
        np.testing.assert_array_equal(decode_image(encode_png(img)), img)
        dec = decode_image(encode_jpeg(img, quality=95))
        assert dec.shape == img.shape and _psnr(img, dec) > 25

    def test_decode_image_png16_downshifts(self):
        img16 = _img(6, 7, seed=1, channels=1, dtype=np.uint16)
        out = decode_image(encode_png(img16))
        assert out.dtype == np.uint8
        np.testing.assert_array_equal(out, (img16 >> 8).astype(np.uint8))

    def test_unknown_magic_raises(self):
        with pytest.raises(ValueError, match="magic"):
            decode_image(b"BM....not really a bmp")


class TestStagesMultiFormat:
    def test_feature_stage_mixed_formats(self, ray_session):
        import ray.data as rd
        from packcol.stages.multimodal import ImageFeatureStage
        from packcol.functions.media import image_phash
        img = _img(16, 20, seed=4)
        payloads = [encode_pnm(img), encode_png(img, filter_type=4),
                    encode_jpeg(img, quality=95)]
        t = pa.table({"id": pa.array(range(3), pa.int64()),
                      "image": pa.array(payloads, pa.large_binary())})
        out = rd.from_arrow(t).map_batches(
            ImageFeatureStage(), batch_format="pyarrow",
            batch_size=2).to_pandas().sort_values("id")
        assert out["width"].tolist() == [20, 20, 20]
        assert out["height"].tolist() == [16, 16, 16]
        # PNM and PNG decode identically ⇒ identical phash; JPEG is
        # lossy but phash (8x8 mean-threshold) should survive q95
        ph = out["phash"].tolist()
        assert ph[0] == ph[1]
        exp = int(image_phash(img))
        jpeg_ph = int(ph[2]) & 0xFFFFFFFFFFFFFFFF
        assert bin(jpeg_ph ^ exp).count("1") <= 4

    def test_resize_stage_preserves_format(self, ray_session):
        import ray.data as rd
        from packcol.stages.multimodal import ImageResizeStage
        img = _img(40, 60, seed=11)
        payloads = [encode_pnm(img), encode_png(img),
                    encode_jpeg(img, quality=90)]
        t = pa.table({"id": pa.array(range(3), pa.int64()),
                      "image": pa.array(payloads, pa.large_binary())})
        out = rd.from_arrow(t).map_batches(
            ImageResizeStage(10, 15), batch_format="pyarrow",
            batch_size=3).to_pandas().sort_values("id")
        fmts = [sniff_image_format(bytes(b)) for b in out["image"]]
        assert fmts == ["pnm", "png", "jpeg"]
        for b in out["image"]:
            assert decode_image(bytes(b)).shape[:2] == (10, 15)

"""GIF codec (functions/gif.py): LZW, palettes, interlace, animation
compositing — all pure stdlib+numpy, no PIL in the container."""
import struct

import numpy as np
import pytest

from packcol.functions.gif import (_lzw_decode, _lzw_encode, decode_gif,
                                   decode_gif_frames, encode_gif)
from packcol.functions.media import decode_image, sniff_image_format


class TestLZW:
    @pytest.mark.parametrize("seed", range(4))
    def test_roundtrip_shapes(self, seed):
        rng = np.random.default_rng(seed)
        for mx in (2, 4, 16, 256):
            mcs = max(2, int(np.ceil(np.log2(mx))))
            for arr in (
                rng.integers(0, mx, int(rng.integers(1, 9000)))
                    .astype(np.uint8),
                np.repeat(rng.integers(0, mx, 200), 37).astype(np.uint8),
                (np.arange(5000) % mx).astype(np.uint8),
            ):
                dec = _lzw_decode(_lzw_encode(arr, mcs), mcs, len(arr))
                assert (dec == arr).all()

    def test_dictionary_reset_beyond_12_bits(self):
        """>4096 dictionary entries force an encoder clear; the decoder
        must follow the reset mid-stream."""
        rng = np.random.default_rng(99)
        arr = rng.integers(0, 256, 120_000).astype(np.uint8)
        dec = _lzw_decode(_lzw_encode(arr, 8), 8, len(arr))
        assert (dec == arr).all()

    def test_truncated_stream_pads(self):
        arr = (np.arange(400) % 16).astype(np.uint8)
        enc = _lzw_encode(arr, 4)
        dec = _lzw_decode(enc[: len(enc) // 2], 4, 400)
        assert len(dec) == 400  # short stream pads with 0, no crash


class TestStaticGif:
    def test_gray_roundtrip(self):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (41, 67)).astype(np.uint8)
        buf = encode_gif(img)
        assert sniff_image_format(buf) == "gif"
        out = decode_gif(buf)
        assert out.shape == (41, 67, 3)
        for c in range(3):  # identity gray palette
            assert (out[..., c] == img).all()

    def test_rgb_palette_roundtrip(self):
        img = np.zeros((24, 32, 3), np.uint8)
        img[3:9, 4:12] = [250, 10, 10]
        img[12:, 20:] = [10, 30, 200]
        img[0] = [7, 99, 7]
        assert (decode_gif(encode_gif(img)) == img).all()

    def test_too_many_colors_refused(self):
        rng = np.random.default_rng(2)
        img = rng.integers(0, 256, (40, 40, 3)).astype(np.uint8)
        with pytest.raises(ValueError, match="distinct colors"):
            encode_gif(img)

    def test_decode_image_dispatch(self):
        img = np.full((10, 10), 77, np.uint8)
        out = decode_image(encode_gif(img))
        assert out.shape == (10, 10, 3) and (out == 77).all()

    def test_bad_magic(self):
        with pytest.raises(ValueError, match="not a GIF"):
            decode_gif(b"NOTAGIF" + b"\x00" * 40)


def _raw_gif(w, h, palette, frames, loop_gce=True):
    """Hand-rolled GIF89a writer with full control of flags: frames is
    a list of (left, top, fw, fh, indices, interlace, transparent_idx,
    disposal)."""
    n = max(2, int(np.ceil(np.log2(max(len(palette), 2)))))
    table = np.zeros((1 << n, 3), dtype=np.uint8)
    table[: len(palette)] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (n - 1), 0, 0)
    out += table.tobytes()
    for left, top, fw, fh, idx, interlace, transp, disposal in frames:
        if loop_gce:
            flags = (disposal & 7) << 2 | (1 if transp is not None else 0)
            out += bytes([0x21, 0xF9, 4, flags, 0, 0,
                          transp if transp is not None else 0, 0])
        rows = np.asarray(idx, np.uint8).reshape(fh, fw)
        if interlace:
            order = [r for s, st in ((0, 8), (4, 8), (2, 4), (1, 2))
                     for r in range(s, fh, st)]
            rows = rows[order]
        out += struct.pack("<BHHHHB", 0x2C, left, top, fw, fh,
                           0x40 if interlace else 0)
        mcs = max(2, n)
        out.append(mcs)
        data = _lzw_encode(rows.ravel(), mcs)
        for i in range(0, len(data), 255):
            chunk = data[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


class TestGifFeatures:
    PAL = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]],
                   np.uint8)

    def test_interlaced_matches_progressive(self):
        rng = np.random.default_rng(3)
        idx = rng.integers(0, 4, (13, 9)).astype(np.uint8)
        plain = _raw_gif(9, 13, self.PAL,
                         [(0, 0, 9, 13, idx, False, None, 0)])
        inter = _raw_gif(9, 13, self.PAL,
                         [(0, 0, 9, 13, idx, True, None, 0)])
        assert (decode_gif(plain) == decode_gif(inter)).all()
        assert (decode_gif(plain) == self.PAL[idx]).all()

    def test_animation_transparency_and_disposal(self):
        """Frame 2 paints a sub-rectangle with a transparent index:
        transparent pixels must show frame 1 beneath (disposal 1)."""
        base = np.ones((8, 8), np.uint8)          # all red
        patch = np.full((4, 4), 2, np.uint8)      # green patch
        patch[0, 0] = 3                            # transparent marker
        frames = decode_gif_frames(_raw_gif(
            8, 8, self.PAL,
            [(0, 0, 8, 8, base, False, None, 1),
             (2, 2, 4, 4, patch, False, 3, 1)]))
        assert len(frames) == 2
        assert (frames[0] == [255, 0, 0]).all()
        f2 = frames[1]
        assert (f2[2, 2] == [255, 0, 0]).all()     # transparent → under
        assert (f2[3, 3] == [0, 255, 0]).all()     # painted
        assert (f2[0, 0] == [255, 0, 0]).all()     # outside patch

    def test_disposal_background_restore(self):
        """Disposal 2 clears the frame region to background before the
        next frame composites."""
        sq = np.full((4, 4), 1, np.uint8)
        nxt = np.full((2, 2), 2, np.uint8)
        frames = decode_gif_frames(_raw_gif(
            8, 8, self.PAL,
            [(0, 0, 4, 4, sq, False, None, 2),
             (6, 6, 2, 2, nxt, False, None, 0)]))
        assert (frames[0][0, 0] == [255, 0, 0]).all()
        assert (frames[1][0, 0] == [0, 0, 0]).all()  # restored to bg
        assert (frames[1][6, 6] == [0, 255, 0]).all()

    def test_local_color_table_and_subrect(self):
        """A frame-local palette overrides the global one."""
        idx = np.zeros((4, 4), np.uint8)
        buf = bytearray(_raw_gif(4, 4, self.PAL, []))
        # append one image block with a local table mapping 0 → white
        buf = buf[:-1]  # drop trailer
        buf += struct.pack("<BHHHHB", 0x2C, 0, 0, 4, 4, 0x80 | 1)
        buf += bytes([255, 255, 255]) + b"\x00" * 9  # 4-entry LCT
        buf.append(2)
        data = _lzw_encode(idx.ravel(), 2)
        buf.append(len(data))
        buf += data
        buf += bytes([0, 0x3B])
        out = decode_gif(bytes(buf))
        assert (out == 255).all()


class TestGifStages:
    def test_feature_and_resize_stage_roundtrip(self, ray_session):
        """The multimodal actor stages decode + re-encode GIF payloads
        for real (format-preserving resize)."""
        import ray.data as rd
        from packcol.functions.media import sniff_image_format
        from packcol.stages.multimodal import (ImageFeatureStage,
                                               ImageResizeStage)
        rng = np.random.default_rng(5)
        rows = [{"img_id": i,
                 "image": encode_gif(
                     rng.integers(0, 256, (16 + i, 20)).astype(np.uint8))}
                for i in range(6)]
        ds = rd.from_items(rows)
        feat = ds.map_batches(ImageFeatureStage(),
                              batch_format="pyarrow").to_pandas() \
            .sort_values("img_id").reset_index(drop=True)
        assert list(feat["width"]) == [20] * 6
        assert list(feat["height"]) == [16 + i for i in range(6)]
        res = ds.map_batches(ImageResizeStage(out_h=8, out_w=8),
                             batch_format="pyarrow").to_pandas()
        for buf in res["image"]:
            assert sniff_image_format(bytes(buf)) == "gif"
            assert decode_gif(bytes(buf)).shape == (8, 8, 3)


class TestLZWProperties:
    """Hypothesis: LZW roundtrips for arbitrary index streams."""

    def test_roundtrip_property(self):
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=60, deadline=None)
        @given(st.integers(2, 8), st.binary(min_size=0, max_size=3000))
        def check(mcs, raw):
            arr = (np.frombuffer(raw, np.uint8) % (1 << mcs)) \
                .astype(np.uint8)
            if len(arr) == 0:
                return
            dec = _lzw_decode(_lzw_encode(arr, mcs), mcs, len(arr))
            assert (dec == arr).all()

        check()

    def test_gif_roundtrip_property(self):
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=25, deadline=None)
        @given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 9))
        def check(h, w, seed):
            rng = np.random.default_rng(seed)
            img = rng.integers(0, 256, (h, w)).astype(np.uint8)
            out = decode_gif(encode_gif(img))
            assert out.shape == (h, w, 3)
            assert (out[..., 0] == img).all()

        check()

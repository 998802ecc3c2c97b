"""Pure-numpy media codecs (functions/media.py) and the real-decode
paths of the multimodal stages."""

import numpy as np
import pyarrow as pa
import pytest

from packcol.functions.media import (audio_frame_features, decode_pnm,
                                     decode_pnm_stream, decode_wav,
                                     encode_pnm, encode_wav, image_phash,
                                     image_thumb_features, resize_nearest,
                                     rgb_to_gray)


def _img(h=32, w=48, seed=0, gray=False):
    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    return rng.integers(0, 256, shape, dtype=np.uint8)


class TestPnm:
    def test_roundtrip_rgb_and_gray(self):
        for gray in (False, True):
            img = _img(gray=gray)
            np.testing.assert_array_equal(decode_pnm(encode_pnm(img)),
                                          img)

    def test_header_with_comment_and_multiline(self):
        img = _img(4, 5)
        raw = b"P6\n# a comment\n5 4\n# more\n255\n" + img.tobytes()
        np.testing.assert_array_equal(decode_pnm(raw), img)

    def test_rejects_non_pnm(self):
        with pytest.raises(ValueError):
            decode_pnm(b"\x89PNG\r\n\x1a\n....")

    def test_stream_decode(self):
        frames = [_img(8, 8, seed=i) for i in range(5)]
        buf = b"".join(encode_pnm(f) for f in frames)
        got = decode_pnm_stream(buf)
        assert len(got) == 5
        for a, b in zip(got, frames):
            np.testing.assert_array_equal(a, b)


class TestImageKernels:
    def test_resize_nearest_identity_and_shape(self):
        img = _img(16, 16)
        np.testing.assert_array_equal(resize_nearest(img, 16, 16), img)
        assert resize_nearest(img, 7, 31).shape == (7, 31, 3)
        # upscale repeats pixels exactly
        up = resize_nearest(img, 32, 32)
        np.testing.assert_array_equal(up[::2, ::2], img)

    def test_gray_weights(self):
        white = np.full((2, 2, 3), 255, np.uint8)
        np.testing.assert_allclose(rgb_to_gray(white), 255.0, atol=0.1)

    def test_thumb_features_dim_and_determinism(self):
        img = _img()
        f = image_thumb_features(img)
        assert f.shape == (64,) and f.dtype == np.float32
        np.testing.assert_array_equal(f, image_thumb_features(img))

    def test_phash_near_dup_property(self):
        img = _img(64, 64)
        h0 = image_phash(img)
        # tiny noise → small Hamming distance; unrelated image → large
        noisy = img.astype(np.int16) + np.random.default_rng(1) \
            .integers(-4, 5, img.shape)
        h1 = image_phash(noisy.clip(0, 255).astype(np.uint8))
        other = image_phash(_img(64, 64, seed=9))
        d_near = bin(int(h0) ^ int(h1)).count("1")
        d_far = bin(int(h0) ^ int(other)).count("1")
        assert d_near < 12 < d_far


class TestWav:
    def test_roundtrip_pcm16(self):
        rng = np.random.default_rng(0)
        s = rng.uniform(-0.9, 0.9, (4000, 2)).astype(np.float32)
        dec, rate = decode_wav(encode_wav(s, 16000))
        assert rate == 16000 and dec.shape == (4000, 2)
        np.testing.assert_allclose(dec, s, atol=1 / 32768)

    def test_extra_chunks_skipped(self):
        s = np.zeros(100, dtype=np.float32)
        raw = encode_wav(s, 8000)
        # splice a LIST chunk between fmt and data
        head, rest = raw[:36], raw[36:]
        spliced = head + b"LIST\x04\x00\x00\x00INFO" + rest
        spliced = spliced[:4] + \
            (len(spliced) - 8).to_bytes(4, "little") + spliced[8:]
        dec, rate = decode_wav(spliced)
        assert rate == 8000 and len(dec) == 100

    def test_rejects_non_wav(self):
        with pytest.raises(ValueError):
            decode_wav(b"OggS" + b"\0" * 64)

    def test_frame_features_shape_and_tone(self):
        rate, n = 8000, 8192
        t = np.arange(n) / rate
        low = np.sin(2 * np.pi * 200 * t).astype(np.float32)
        high = np.sin(2 * np.pi * 3000 * t).astype(np.float32)
        fl = audio_frame_features(low, rate, frame_len=2048)
        fh = audio_frame_features(high, rate, frame_len=2048)
        assert fl.shape == (4, 16)
        # spectral centroid separates the tones; rms comparable
        assert (fh[:, 2] > fl[:, 2]).all()
        np.testing.assert_allclose(fl[:, 0], fh[:, 0], atol=0.05)


class TestStagesRealDecode:
    def test_image_stage_decodes_pnm(self, ray_session):
        import ray.data as rd
        from packcol.stages.multimodal import ImageFeatureStage
        imgs = [_img(h, w, seed=i) for i, (h, w) in
                enumerate([(16, 20), (32, 8), (9, 9)])]
        t = pa.table({
            "id": pa.array(range(3), pa.int64()),
            "image": pa.array([encode_pnm(im) for im in imgs],
                              pa.large_binary())})
        out = rd.from_arrow(t).map_batches(
            ImageFeatureStage(), batch_format="pyarrow",
            batch_size=2).to_pandas().sort_values("id")
        assert out["width"].tolist() == [20, 8, 9]
        assert out["height"].tolist() == [16, 32, 9]
        # identical image content ⇒ identical phash (dedup key)
        assert out["phash"].iloc[0] == int(np.int64(np.uint64(
            image_phash(imgs[0])).view(np.int64)))

    def test_image_resize_stage(self, ray_session):
        import ray.data as rd
        from packcol.stages.multimodal import ImageResizeStage
        img = _img(40, 60)
        t = pa.table({"id": [1], "image": pa.array([encode_pnm(img)],
                                                   pa.large_binary())})
        out = rd.from_arrow(t).map_batches(
            ImageResizeStage(10, 15), batch_format="pyarrow",
            batch_size=1).to_pandas()
        dec = decode_pnm(out["image"].iloc[0])
        assert dec.shape == (10, 15, 3)
        np.testing.assert_array_equal(dec, resize_nearest(img, 10, 15))

    def test_audio_stage_decodes_wav(self, ray_session):
        import ray.data as rd
        from packcol.stages.multimodal import (AUDIO_FRAME_FEATURES,
                                               AudioFrameSampleStage)
        rng = np.random.default_rng(4)
        clips = [rng.uniform(-0.5, 0.5, rng.integers(3000, 9000))
                 .astype(np.float32) for _ in range(4)]
        t = pa.table({
            "id": pa.array(range(4), pa.int64()),
            "audio": pa.array([encode_wav(c, 16000) for c in clips],
                              pa.large_binary())})
        out = rd.from_arrow(t).map_batches(
            AudioFrameSampleStage(frame_len=2048), batch_format="pyarrow",
            batch_size=2).to_pandas().sort_values("id")
        assert (out["sample_rate"] == 16000).all()
        for clip, frames in zip(clips, out["frames"]):
            assert len(frames) == max(len(clip) // 2048, 1)
            assert all(len(f) == AUDIO_FRAME_FEATURES for f in frames)

    def test_video_stage_samples_frames(self, ray_session):
        import ray.data as rd
        from packcol.stages.multimodal import VideoFrameSampleStage
        vids = []
        for n in (6, 3):
            vids.append(b"".join(encode_pnm(_img(8, 8, seed=j))
                                 for j in range(n)))
        t = pa.table({"id": pa.array(range(2), pa.int64()),
                      "video": pa.array(vids, pa.large_binary())})
        out = rd.from_arrow(t).map_batches(
            VideoFrameSampleStage(every=2), batch_format="pyarrow",
            batch_size=1).to_pandas().sort_values("id")
        assert out["n_frames"].tolist() == [6, 3]
        assert [len(f) for f in out["frame_features"]] == [3, 2]


def test_image_near_dup_pipeline(ray_session):
    """Planted image near-dups: identical + lightly-noised copies pair
    up; unrelated images don't.  Only (id, phash) rows shuffle."""
    import ray.data as rd
    from packcol.pipelines.dedup import image_near_dup_pairs
    rng = np.random.default_rng(21)
    base = _img(32, 32, seed=1)
    noisy = (base.astype(np.int16)
             + rng.integers(-3, 4, base.shape)).clip(0, 255) \
        .astype(np.uint8)
    imgs = [base, noisy, base.copy(), _img(32, 32, seed=5),
            _img(32, 32, seed=6)]
    t = pa.table({
        "id": pa.array(range(5), pa.int64()),
        "image": pa.array([encode_pnm(im) for im in imgs],
                          pa.large_binary())})
    pairs = image_near_dup_pairs(
        rd.from_arrow(t).repartition(3), id_col="id",
        max_dist=3).to_pandas()
    got = {tuple(p) for p in pairs[["id_a", "id_b"]].to_numpy()}
    assert (0, 2) in got          # exact copy
    assert (0, 1) in got and (1, 2) in got  # noised copy
    assert not any(3 in p or 4 in p for p in got)  # unrelated
    exact = pairs.set_index(["id_a", "id_b"])["hamming"]
    assert exact[(0, 2)] == 0


def test_media_fixture_formulas_and_determinism(ray_session):
    """The synthetic fixture's checked properties follow the closed-form
    formulas the driver oracles recompute in SQL, and payloads are
    byte-stable across calls (exact-duplicate planting holds)."""
    from packcol.sources.media_fixture import (audio_table, image_dims,
                                               images_table, make_audio,
                                               make_image)
    t1, t2 = images_table(12, 5), images_table(12, 5)
    assert t1.equals(t2)
    imgs = t1.column("image").to_pylist()
    assert imgs[0] == imgs[5] == imgs[10]  # planted duplicates
    assert imgs[0] != imgs[1]
    for g in range(5):
        h, w = image_dims(g)
        assert h == 16 + (g * 5) % 32 and w == 16 + (g * 7) % 40
        head = imgs[g][:2]
        assert head == (b"P6" if g % 3 == 0 else b"P5")
    a1, a2 = audio_table(6), audio_table(6)
    assert a1.equals(a2)
    assert make_audio(3)[:4] == b"RIFF"
    assert make_image(1) == make_image(1, seed=0)
    assert make_image(1) != make_image(1, seed=9)


def test_video_fixture_frame_counts(ray_session):
    import ray.data as rd
    import pyarrow.compute as pc
    from packcol.sources.media_fixture import videos_table
    from packcol.stages.multimodal import VideoFrameSampleStage
    out = rd.from_arrow(videos_table(n_rows=16)).map_batches(
        VideoFrameSampleStage(every=2, max_frames=8),
        batch_format="pyarrow", batch_size=8).to_pandas()
    assert len(out) == 16
    for _, row in out.iterrows():
        n = 2 + row["vid_id"] % 5
        assert row["n_frames"] == n
        assert len(row["frame_features"]) == min(-(-n // 2), 8)

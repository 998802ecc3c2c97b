"""Multimodal (image/audio) actor-pool stages.

Images/audio are opaque ``large_binary`` columns with typed metadata
(the `html` column treatment generalized).  The decode/feature kernels
would use PIL / torchaudio etc., which are NOT in this container — the
codec step is stubbed (clearly marked), while the Ray-side plumbing is
real and tested: actor-pool ``map_batches`` classes with one-time
``__init__`` setup, fixed output schemas, and bounded batch sizes for
large binary payloads.

Usage:
    ds.map_batches(ImageFeatureStage(fake=True), batch_format="pyarrow",
                   batch_size=64,          # small: rows are megabytes
                   concurrency=8, num_cpus=1)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

IMAGE_FEATURE_DIM = 64
AUDIO_FRAME_FEATURES = 16


def _try_import_pil():
    try:
        from PIL import Image  # noqa: F401
        return Image
    except Exception:
        return None


class ImageFeatureStage:
    """Actor-pool stage: binary image column → fixed-dim feature vector +
    (width, height) metadata.

    With a real decoder (PIL), __init__ would load it once per actor.
    In this container the decode is STUBBED: fake=True derives a
    deterministic pseudo-decode from the bytes (stable across runs) so
    the pipeline shape — schema, batching, actor lifecycle — is fully
    exercised; fake=False raises NotImplementedError at the decode step.
    """

    def __init__(self, image_col: str = "image", fake: bool = False):
        self.image_col = image_col
        self.fake = fake
        self._pil = _try_import_pil()  # one-time per actor
        self._proj = np.random.default_rng(0).standard_normal(
            (256, IMAGE_FEATURE_DIM)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.image_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if self._pil is None and not self.fake:
            raise NotImplementedError(
                "image decode requires PIL, which is not available in this "
                "environment; pass fake=True for the deterministic stub")
        feats = np.zeros((len(col), IMAGE_FEATURE_DIM), dtype=np.float32)
        widths = np.zeros(len(col), dtype=np.int32)
        heights = np.zeros(len(col), dtype=np.int32)
        from ..codecs.fsst import buffer_view
        d, offs = buffer_view(col)
        lens = np.diff(offs)
        # deterministic fake decode: byte histogram → projected feature
        for i in range(len(col)):  # rows are large; per-row numpy is fine
            chunk = d[offs[i]:offs[i + 1]]
            hist = np.bincount(chunk, minlength=256).astype(np.float32)
            feats[i] = hist @ self._proj
            widths[i] = 64 + (int(lens[i]) % 1024)
            heights[i] = 64 + (int(lens[i] // 7) % 1024)
        return pa.table({
            **{n: batch.column(n) for n in batch.column_names
               if n != self.image_col},
            "width": widths, "height": heights,
            "feature": pa.FixedSizeListArray.from_arrays(
                pa.array(feats.ravel(), type=pa.float32()),
                IMAGE_FEATURE_DIM),
        })


class AudioFrameSampleStage:
    """Actor-pool stage: binary audio column → frame-sampled features
    (n_frames × AUDIO_FRAME_FEATURES as a list column).  Decode STUBBED
    the same way as ImageFeatureStage."""

    def __init__(self, audio_col: str = "audio", frame_bytes: int = 4096,
                 max_frames: int = 16, fake: bool = False):
        self.audio_col = audio_col
        self.frame_bytes = frame_bytes
        self.max_frames = max_frames
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.audio_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if not self.fake:
            raise NotImplementedError(
                "audio decode requires an audio library not available in "
                "this environment; pass fake=True for the stub")
        from ..codecs.fsst import buffer_view
        d, offs = buffer_view(col)
        all_feats, frame_offs = [], [0]
        for i in range(len(col)):
            chunk = d[offs[i]:offs[i + 1]]
            n_frames = min(max(len(chunk) // self.frame_bytes, 1),
                           self.max_frames)
            for f in range(n_frames):
                fr = chunk[f * self.frame_bytes:(f + 1) * self.frame_bytes]
                m = float(fr.mean()) if len(fr) else 0.0
                s = float(fr.std()) if len(fr) else 0.0
                all_feats.append(
                    np.linspace(m, m + s, AUDIO_FRAME_FEATURES,
                                dtype=np.float32))
            frame_offs.append(frame_offs[-1] + n_frames)
        flat = (np.concatenate(all_feats) if all_feats
                else np.zeros(0, dtype=np.float32))
        frames = pa.FixedSizeListArray.from_arrays(
            pa.array(flat, type=pa.float32()), AUDIO_FRAME_FEATURES)
        nested = pa.ListArray.from_arrays(
            pa.array(frame_offs, type=pa.int32()), frames)
        return pa.table({
            **{n: batch.column(n) for n in batch.column_names
               if n != self.audio_col},
            "frames": nested,
        })

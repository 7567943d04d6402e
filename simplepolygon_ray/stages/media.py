"""Multimodal column stages: decode / resize / feature-extract /
frame-sample as actor-pool ``map_batches`` stages.

Images/audio/video travel as opaque ``binary`` columns with typed
metadata (w, h, fmt, ...). The engine's own raw/q6 image codec is real
(images.codec); external codecs (JPEG/PNG, audio, video) are STUBS in
this environment — the container has no PIL/ffmpeg (SURVEY.md §0) —
but the Ray-side plumbing (schemas, actor signatures, batch layout,
backpressure-friendly batch sizes) is real and tested. A stub either
raises ``NotImplementedError`` (strict mode) or produces a
deterministic fake payload (test mode), clearly marked.

These are CALLABLE-CLASS stages on purpose: a real decoder loads
codec tables / models once per actor in ``__init__`` and streams
batches through ``__call__``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..images.codec import decode, encode, phash64

__all__ = [
    "ImageDecodeActor",
    "ImageResizeActor",
    "AudioFeatureActor",
    "VideoFrameSampleActor",
    "decode_and_featurize",
    "resize_images",
]

_SUPPORTED_FMTS = {"raw", "q6"}


def _resize_nearest(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    h, w = px.shape[:2]
    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return px[yi][:, xi]


class ImageDecodeActor:
    """bytes → decoded stats + phash (decode tables built per actor)."""

    def __init__(self, strict: bool = True):
        self.strict = strict

    def _decode(self, payload, w, h, fmt):
        if fmt in _SUPPORTED_FMTS:
            return decode(payload, w, h, fmt)
        # external codec (jpeg/png/...) — STUB: not available in-sandbox
        if self.strict:
            raise NotImplementedError(
                f"fmt={fmt!r} needs an external codec (PIL) not present here"
            )
        rng = (len(payload) * 2654435761) & 0xFF
        return np.full((h, w, 3), rng, np.uint8)  # deterministic fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        phashes, means = [], []
        for payload, w, h, fmt in zip(
            batch["bytes"].to_pylist(),
            batch["w"].to_pylist(),
            batch["h"].to_pylist(),
            batch["fmt"].to_pylist(),
        ):
            px = self._decode(payload, w, h, fmt)
            phashes.append(int(np.uint64(phash64(px)).astype(np.int64)))
            means.append(float(px.mean()))
        cols = {
            "image_id": batch["image_id"],
            "phash_recomputed": pa.array(phashes, type=pa.int64()),
            "mean_luma": pa.array(means, type=pa.float64()),
        }
        # metadata passthrough: downstream invariant checks (stored
        # phash equality, mean→sum reconstruction) need these without
        # a join back to the table
        for name in ("phash", "w", "h", "fmt"):
            if name in batch.column_names:
                cols[name] = batch[name]
        return pa.table(cols)


class ImageResizeActor:
    """bytes → resized re-encoded bytes (thumbnailing stage)."""

    def __init__(self, out_w: int = 16, out_h: int = 16):
        self.out_w = out_w
        self.out_h = out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_payloads = []
        for payload, w, h, fmt in zip(
            batch["bytes"].to_pylist(),
            batch["w"].to_pylist(),
            batch["h"].to_pylist(),
            batch["fmt"].to_pylist(),
        ):
            px = decode(payload, w, h, fmt)
            small = _resize_nearest(px, self.out_w, self.out_h)
            out_payloads.append(encode(small, "raw"))
        n = len(batch)
        return pa.table(
            {
                "image_id": batch["image_id"],
                "bytes": pa.array(out_payloads, type=pa.binary()),
                "w": pa.array(np.full(n, self.out_w, np.int32)),
                "h": pa.array(np.full(n, self.out_h, np.int32)),
                "fmt": pa.array(["raw"] * n),
            }
        )


class AudioFeatureActor:
    """STUB audio feature extraction (no audio codec in-sandbox).

    Real deployment: load the decoder in ``__init__``, emit e.g.
    log-mel frames per batch. Here: deterministic per-payload energy
    proxy so the pipeline shape is testable end-to-end.
    """

    def __init__(self, n_features: int = 8):
        self.n_features = n_features

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch["bytes"].to_pylist():
            arr = np.frombuffer(payload, np.uint8).astype(np.float64)
            if len(arr) == 0:
                arr = np.zeros(1)
            chunks = np.array_split(arr, self.n_features)
            feats.append([float(c.mean()) for c in chunks])
        return pa.table(
            {
                "image_id": batch["image_id"],
                "features": pa.array(feats, type=pa.list_(pa.float64())),
            }
        )


class VideoFrameSampleActor:
    """STUB video frame sampling: treats the payload as concatenated
    raw frames and emits every ``stride``-th frame's bytes. A real
    implementation swaps the slicer for a demuxer; the explode-to-rows
    layout (one row per sampled frame) is the part that matters."""

    def __init__(self, frame_bytes: int = 768, stride: int = 4):
        self.frame_bytes = frame_bytes
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_no, frames = [], [], []
        for vid, payload in zip(
            batch["image_id"].to_pylist(), batch["bytes"].to_pylist()
        ):
            n_frames = max(len(payload) // self.frame_bytes, 0)
            for k in range(0, n_frames, self.stride):
                ids.append(vid)
                frame_no.append(k)
                frames.append(payload[k * self.frame_bytes : (k + 1) * self.frame_bytes])
        return pa.table(
            {
                "image_id": pa.array(ids, type=pa.string()),
                "frame_no": pa.array(frame_no, type=pa.int32()),
                "frame": pa.array(frames, type=pa.binary()),
            }
        )


def decode_and_featurize(images, *, concurrency=(1, 4), batch_size: int = 1024):
    """Actor-pool decode stage; small batches — rows carry pixel bytes."""
    return images.map_batches(
        ImageDecodeActor,
        fn_constructor_kwargs={"strict": True},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def resize_images(images, *, out_w=16, out_h=16, concurrency=(1, 4), batch_size=1024):
    return images.map_batches(
        ImageResizeActor,
        fn_constructor_kwargs={"out_w": out_w, "out_h": out_h},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

"""From-scratch image codec + metrics (no PIL in this environment —
SURVEY.md §0; the production target would swap these kernels for a real
decoder behind the same batch signatures).

Formats (fmt column of the image table, FIXTURES.md §3):

- ``raw``: w*h*3 uint8 RGB, row-major — lossless.
- ``q6``: per-channel 6-bit quantization (value >> 2), same layout —
  lossy; decode reconstructs the bin midpoint (q << 2 | 2), worst-case
  error 2/255 → PSNR ≈ 42-48 dB ≥ 40 dB (the input_hint invariant).

All kernels are vectorized numpy over whole batches of byte payloads.
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode", "decode", "psnr", "phash64"]


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    """(h, w, 3) uint8 → payload bytes."""
    if fmt == "raw":
        return pixels.tobytes()
    if fmt == "q6":
        return (pixels >> 2).astype(np.uint8).tobytes()
    raise ValueError(f"unknown fmt {fmt!r}")


def decode(payload: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """payload bytes → (h, w, 3) uint8."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if len(arr) != w * h * 3:
        raise ValueError(f"payload size {len(arr)} != {w}x{h}x3")
    arr = arr.reshape(h, w, 3)
    if fmt == "raw":
        return arr
    if fmt == "q6":
        return ((arr << 2) | 2).astype(np.uint8)
    raise ValueError(f"unknown fmt {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)


def phash64(pixels: np.ndarray) -> int:
    """64-bit perceptual hash: grayscale → 8×8 block means → median
    threshold. Deterministic, pure numpy."""
    g = pixels.astype(np.float64).mean(axis=2)
    h, w = g.shape
    # integral-image block means over an 8x8 grid (handles non-multiples)
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    ii = np.zeros((h + 1, w + 1))
    ii[1:, 1:] = g.cumsum(0).cumsum(1)
    blocks = np.empty((8, 8))
    for r in range(8):
        for c in range(8):
            y0, y1, x0, x1 = ys[r], ys[r + 1], xs[c], xs[c + 1]
            area = max((y1 - y0) * (x1 - x0), 1)
            blocks[r, c] = (ii[y1, x1] - ii[y0, x1] - ii[y1, x0] + ii[y0, x0]) / area
    med = np.median(blocks)
    bits = (blocks.ravel() > med).astype(np.uint64)
    return int((bits << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))

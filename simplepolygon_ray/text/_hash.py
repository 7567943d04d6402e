"""Vectorized FNV-1a hashing shared by the text operators.

The per-character FNV chain is sequential, so vectorization runs over
STRINGS: all inputs are padded into one (N, L) byte matrix and the
chain iterates over character POSITIONS with full-width numpy ops —
L iterations of O(N) vector work instead of N·L Python bytecodes.
Outputs are bit-identical to the scalar FNV-1a loop (padding is
masked out, uint64 arithmetic wraps mod 2^64 exactly like the
``& 0xFFFFFFFFFFFFFFFF`` scalar form).
"""

from __future__ import annotations

import numpy as np

FNV_OFFSET = np.uint64(0xCBF29CE484222325)
FNV_PRIME = np.uint64(0x100000001B3)

__all__ = ["FNV_OFFSET", "FNV_PRIME", "fnv64_batch", "byte_matrix"]


def byte_matrix(strs: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """Pad byte strings into a (N, L) uint8 matrix + validity mask."""
    n = len(strs)
    lens = np.fromiter((len(s) for s in strs), np.int64, n)
    L = int(lens.max()) if n and lens.max() > 0 else 0
    mask = np.arange(L)[None, :] < lens[:, None]
    mat = np.zeros((n, L), np.uint8)
    if L:
        mat[mask] = np.frombuffer(b"".join(strs), np.uint8)
    return mat, mask


def fnv64_batch(strs: list[bytes]) -> np.ndarray:
    """FNV-1a 64-bit of each byte string (empty string → offset basis)."""
    if not strs:
        return np.empty(0, np.uint64)
    mat, mask = byte_matrix(strs)
    h = np.full(len(strs), FNV_OFFSET, np.uint64)
    for pos in range(mat.shape[1]):
        nh = (h ^ mat[:, pos].astype(np.uint64)) * FNV_PRIME
        h = np.where(mask[:, pos], nh, h)
    return h

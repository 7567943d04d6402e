"""Mergeable sketches for approximate aggregates at 100 TB scale.

HyperLogLog (Flajolet et al. 2007, standard bias-corrected variant):
one sketch per batch inside ``map_batches``, merged in a tiny second
stage — the shuffle carries 2^p-byte registers per block instead of
every distinct value.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["HyperLogLog", "approx_distinct"]


def _hash64(values: np.ndarray) -> np.ndarray:
    """splitmix64 over an int64/uint64 key column (strings: hash first)."""
    x = values.astype(np.uint64, copy=True)
    x += np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


class HyperLogLog:
    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, np.uint8)

    def add_hashed(self, h: np.ndarray) -> None:
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64(1 << (self.p - 1))
        # rank = leading zeros of remaining bits + 1, vectorized
        lz = np.zeros(len(h), np.uint8)
        cur = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = cur < (np.uint64(1) << np.uint64(64 - shift))
            lz[mask] += shift
            cur[mask] <<= np.uint64(shift)
        rank = lz + 1
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        out = HyperLogLog(self.p)
        out.registers = np.maximum(self.registers, other.registers)
        return out

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        e = alpha * m * m / np.sum(2.0 ** (-self.registers.astype(np.float64)))
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # small-range correction
        return float(e)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, p: int = 12) -> "HyperLogLog":
        h = cls(p)
        h.registers = np.frombuffer(b, np.uint8).copy()
        return h


def approx_distinct(ds, col: str, *, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT col) over an int64 column: one HLL
    per batch, merged on the driver (sketches are tiny)."""

    def sketch(batch: pd.DataFrame) -> pd.DataFrame:
        h = HyperLogLog(p)
        h.add_hashed(_hash64(batch[col].to_numpy(np.int64)))
        return pd.DataFrame({"sketch": [h.to_bytes()]})

    parts = ds.map_batches(sketch, batch_format="pandas").to_pandas()
    acc = HyperLogLog(p)
    for b in parts["sketch"]:
        acc = acc.merge(HyperLogLog.from_bytes(b, p))
    return acc.estimate()

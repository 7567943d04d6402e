"""Distributed join strategies for Ray Data.

Two shapes, chosen by side size (SURVEY.md §2.3 "Joins / lookups"):

- ``broadcast_join``: the small side is materialized ONCE on the
  driver, put in the object store with ``ray.put``, and every map task
  reads the same immutable copy (plasma-cached per node, zero-copy for
  Arrow/numpy payloads). No shuffle; the probe side streams. This is
  the 100 TB-safe pattern for dimension tables / compiled indexes —
  the broadcast ships once per node, not per batch.

- ``hash_join``: both sides large → Ray's native hash-partitioned
  ``Dataset.join`` (one all-to-all exchange per side). ``num_partitions``
  sizes the exchange; skewed keys should be salted by the caller
  (append a salt column to the hot side and explode the other).
"""

from __future__ import annotations

import pandas as pd
import ray

__all__ = ["broadcast_join", "hash_join"]


def broadcast_join(
    probe: "ray.data.Dataset",
    small_df: pd.DataFrame,
    on,
    how: str = "inner",
    batch_size: int | None = None,
):
    """Join a streaming Dataset against a small pandas dimension table.

    ``small_df`` goes to the object store once; each worker process
    deserializes it once (cached) and runs a vectorized ``pd.merge``
    per batch.
    """
    from ..stages.pip_join import _cached_get

    ref = ray.put(small_df)

    def _merge(batch: pd.DataFrame) -> pd.DataFrame:
        small = _cached_get(ref)
        return batch.merge(small, on=on, how=how)

    return probe.map_batches(_merge, batch_format="pandas", batch_size=batch_size)


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str | tuple,
    num_partitions: int = 32,
    join_type: str = "inner",
):
    """Hash-partitioned join of two large Datasets (Ray native)."""
    key = (on,) if isinstance(on, str) else tuple(on)
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=key,
    )

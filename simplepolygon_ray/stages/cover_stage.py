"""Cell-covering and point-indexing stages (stateless map_batches).

- ``cover_batch``: simple-ring rows → (geom_id, ring_seq, cell_id)
  explosion at a fixed level (the join key space);
- ``index_points_batch``: image rows → + ``cell_id`` column (vectorized
  bit-twiddling, no Python per row).

``cell_id`` is emitted as int64 (the uint64 bit pattern viewed signed)
so it shuffles/joins through Arrow and parquet natively.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..cells.grid import cover_ring, point_to_cell

__all__ = ["cover_batch", "index_points_batch", "DEFAULT_LEVEL", "cover_rings_dataset"]

DEFAULT_LEVEL = 8


def cover_batch(batch: pa.Table, *, level: int = DEFAULT_LEVEL) -> pa.Table:
    gids = batch["geom_id"].to_pylist()
    idxs = batch["ring_seq"].to_pylist()
    rings = batch["ring"].to_pylist()
    out_g, out_i, out_c = [], [], []
    for gid, ri, ring in zip(gids, idxs, rings):
        cells = cover_ring(np.asarray(ring, np.float64), level)
        out_g.extend([gid] * len(cells))
        out_i.extend([ri] * len(cells))
        out_c.append(cells.astype(np.int64))
    cell_col = (
        np.concatenate(out_c) if out_c else np.empty(0, np.int64)
    )
    return pa.table(
        {
            "geom_id": pa.array(out_g, type=pa.string()),
            "ring_seq": pa.array(out_i, type=pa.int32()),
            "cell_id": pa.array(cell_col),
        }
    )


def cover_rings_dataset(simple_rings, *, level: int = DEFAULT_LEVEL):
    import functools

    return simple_rings.map_batches(
        functools.partial(cover_batch, level=level), batch_format="pyarrow"
    )


def index_points_batch(
    batch: pa.Table,
    *,
    level: int = DEFAULT_LEVEL,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> pa.Table:
    lon = batch[lon_col].to_numpy(zero_copy_only=False)
    lat = batch[lat_col].to_numpy(zero_copy_only=False)
    cells = point_to_cell(lon, lat, level).astype(np.int64)
    return batch.append_column("cell_id", pa.array(cells))

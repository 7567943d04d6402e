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

from ..cells.grid import cover_rings_flat, point_to_cell

__all__ = ["cover_batch", "index_points_batch", "DEFAULT_LEVEL", "cover_rings_dataset"]

DEFAULT_LEVEL = 8


def cover_batch(batch: pa.Table, *, level: int = DEFAULT_LEVEL) -> pa.Table:
    """Batched covering: one vectorized pass over every ring in the
    block (``cover_rings_flat``); ring coords are zero-copy Arrow
    buffer views and output columns are Arrow takes — no to_pylist."""
    if batch.num_columns == 0 or batch.num_rows == 0:
        return pa.table(
            {
                "geom_id": pa.array([], type=pa.string()),
                "ring_seq": pa.array([], type=pa.int32()),
                "cell_id": pa.array([], type=pa.int64()),
            }
        )
    col = batch["ring"].combine_chunks()
    offs = np.asarray(col.offsets).astype(np.int64)
    coords = np.asarray(col.values.values, dtype=np.float64).reshape(-1, 2)
    ring_row, cells = cover_rings_flat(coords, offs, level)
    take = pa.array(ring_row)
    return pa.table(
        {
            "geom_id": batch["geom_id"].take(take),
            "ring_seq": batch["ring_seq"].take(take),
            "cell_id": pa.array(cells.astype(np.int64)),
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

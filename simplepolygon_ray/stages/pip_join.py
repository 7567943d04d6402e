"""Point-in-polygon join of streaming points against decomposed rings.

Two strategies (SURVEY.md §2.3, §3.4 step 6):

- **Broadcast** (default; ring side ≪ point side, the 100 TB shape):
  the compiled ring index — per-cell candidate lists + ring coordinate
  arrays — is built ONCE on the driver, ``ray.put`` into the object
  store, and each actor of the ``map_batches`` pool deserializes it
  ONCE in ``__init__``. Probe batches stream through with zero
  shuffles; each point is assigned its single containing cell, so a
  (point, ring) pair can only be emitted once — no dedup pass needed.

- **Shuffle** (both sides huge): both sides keyed by ``cell_id``, Ray
  native hash join on the cell key, then exact PIP refinement per
  matched pair. Skew from dense cells is defused by salting the point
  side and replicating ring cover rows across salts
  (``salt_factor``).

The per-ring membership test is the engine's own even-odd kernel
(boundary = outside), vectorized over all points that share a cell.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..cells.grid import point_to_cell
from ..geom.kernels import points_in_ring
from .cover_stage import DEFAULT_LEVEL, cover_batch

__all__ = ["CompiledRingIndex", "PipJoinActor", "pip_join_broadcast", "pip_join_shuffle"]


class CompiledRingIndex:
    """cell_id → candidate ring list, plus ring coordinate arrays."""

    def __init__(self, ring_rows: pa.Table, level: int = DEFAULT_LEVEL):
        self.level = level
        self.rings: list[np.ndarray] = [
            np.asarray(r, np.float64) for r in ring_rows["ring"].to_pylist()
        ]
        self.geom_ids = ring_rows["geom_id"].to_pylist()
        self.ring_seqs = ring_rows["ring_seq"].to_pylist()
        cover = cover_batch(ring_rows, level=level)
        self.cell_to_rings: dict[int, list[int]] = {}
        # cover_batch preserves input row order within its explosion
        row_of = {}
        for k, (g, i) in enumerate(zip(self.geom_ids, self.ring_seqs)):
            row_of[(g, i)] = k
        for g, i, c in zip(
            cover["geom_id"].to_pylist(),
            cover["ring_seq"].to_pylist(),
            cover["cell_id"].to_numpy(zero_copy_only=False),
        ):
            self.cell_to_rings.setdefault(int(c), []).append(row_of[(g, i)])

    def probe(self, ids, lon: np.ndarray, lat: np.ndarray):
        """Vectorized membership probe. Returns (point_pos, ring_row)."""
        cells = point_to_cell(lon, lat, self.level).astype(np.int64)
        order = np.argsort(cells, kind="stable")
        out_pts, out_rings = [], []
        start = 0
        sorted_cells = cells[order]
        while start < len(order):
            end = start
            c = sorted_cells[start]
            while end < len(order) and sorted_cells[end] == c:
                end += 1
            cand = self.cell_to_rings.get(int(c))
            if cand:
                pos = order[start:end]
                plon, plat = lon[pos], lat[pos]
                for rrow in cand:
                    hit = points_in_ring(plon, plat, self.rings[rrow])
                    if hit.any():
                        out_pts.append(pos[hit])
                        out_rings.append(np.full(int(hit.sum()), rrow, np.int64))
            start = end
        if not out_pts:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return np.concatenate(out_pts), np.concatenate(out_rings)


class PipJoinActor:
    """Actor-pool stage: compiled index fetched once per actor."""

    def __init__(self, index_ref, id_col: str = "image_id"):
        self.index: CompiledRingIndex = ray.get(index_ref)
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        pts, rrows = self.index.probe(None, lon, lat)
        ids = batch[self.id_col].take(pa.array(pts))
        return pa.table(
            {
                self.id_col: ids,
                "geom_id": pa.array([self.index.geom_ids[r] for r in rrows], type=pa.string()),
                "ring_seq": pa.array(
                    [self.index.ring_seqs[r] for r in rrows], type=pa.int32()
                ),
                "lon": pa.array(lon[pts]),
                "lat": pa.array(lat[pts]),
            }
        )


def pip_join_broadcast(
    points,
    ring_rows: pa.Table,
    *,
    level: int = DEFAULT_LEVEL,
    id_col: str = "image_id",
    concurrency: int | tuple = 4,
    batch_size: int = 8192,
):
    """points Dataset (id, lon, lat, ...) ⋈ rings → membership rows."""
    index_ref = ray.put(CompiledRingIndex(ring_rows, level=level))
    import functools

    return points.map_batches(
        PipJoinActor,
        fn_constructor_args=(index_ref, id_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def pip_join_shuffle(
    points,
    simple_rings,
    *,
    level: int = DEFAULT_LEVEL,
    id_col: str = "image_id",
    num_partitions: int = 32,
    salt_factor: int = 1,
):
    """Shuffle variant for huge ring sets: co-locate by (cell_id, salt),
    Ray native hash join, then exact PIP refinement per matched pair.

    ``salt_factor`` S splits each dense cell's points across S
    sub-partitions; ring cover rows are replicated S× so every salt
    sees every candidate ring (skew defusal, SURVEY.md §4.3).
    """
    from .cover_stage import cover_rings_dataset, index_points_batch
    import functools

    cover = cover_rings_dataset(simple_rings, level=level)
    rings_keyed = simple_rings.map_batches(
        lambda t: t.select(["geom_id", "ring_seq", "ring"]), batch_format="pyarrow"
    )

    if salt_factor > 1:

        def add_salts(t: pa.Table) -> pa.Table:
            n = len(t)
            rep = pa.concat_tables([t] * salt_factor)
            salts = np.repeat(np.arange(salt_factor, dtype=np.int64), n)
            return rep.append_column("salt", pa.array(salts))

        cover = cover.map_batches(add_salts, batch_format="pyarrow")

    def point_salt(t: pa.Table) -> pa.Table:
        t = index_points_batch(t, level=level)
        if salt_factor > 1:
            h = np.abs(
                np.frombuffer(
                    np.ascontiguousarray(t["lon"].to_numpy(zero_copy_only=False)).tobytes(),
                    dtype=np.int64,
                )
            )
            t = t.append_column("salt", pa.array(h % salt_factor))
        return t.select(
            [id_col, "lon", "lat", "cell_id"] + (["salt"] if salt_factor > 1 else [])
        )

    pts = points.map_batches(point_salt, batch_format="pyarrow")
    keys = ("cell_id", "salt") if salt_factor > 1 else ("cell_id",)
    matched = pts.join(
        cover, join_type="inner", num_partitions=num_partitions, on=keys
    )

    # refinement needs ring coords: broadcast the slim id→coords map once
    rk = rings_keyed.to_pandas()
    ring_map = {
        (g, int(i)): np.asarray([list(p) for p in r], np.float64)
        for g, i, r in zip(rk["geom_id"], rk["ring_seq"], rk["ring"])
    }
    ring_ref = ray.put(ring_map)

    def refine(t: pa.Table) -> pa.Table:
        rings = ray.get(ring_ref)
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        gids = t["geom_id"].to_pylist()
        ridx = t["ring_seq"].to_numpy(zero_copy_only=False)
        keep = np.zeros(len(t), bool)
        # vectorize per candidate ring: all rows sharing a ring test at once
        import collections

        groups = collections.defaultdict(list)
        for k in range(len(t)):
            groups[(gids[k], int(ridx[k]))].append(k)
        for key, rows in groups.items():
            rows = np.asarray(rows)
            keep[rows] = points_in_ring(lon[rows], lat[rows], rings[key])
        t = t.filter(pa.array(keep))
        return t.select([id_col, "geom_id", "ring_seq", "lon", "lat"])

    return matched.map_batches(refine, batch_format="pyarrow")

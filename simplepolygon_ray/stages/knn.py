"""kNN via cell-neighbor expansion (SURVEY.md §2.3 "Joins / lookups").

Sites (lon/lat + id) are compiled into a cell→points index, broadcast
once, and held per actor; probes stream through ``map_batches``. Each
probe expands its k-ring of cells until it holds ≥ k candidates AND the
k-th best haversine distance is ≤ the minimum possible distance of any
unexplored cell (a correct lower bound from the equirectangular cell
geometry), so results equal the exhaustive scan.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..cells.grid import point_to_cell
from .cover_stage import DEFAULT_LEVEL

__all__ = ["haversine_km", "CellPointIndex", "KnnActor", "knn_join"]

_EARTH_R = 6371.0088


def haversine_km(lon1, lat1, lon2, lat2):
    """Vectorized haversine distance in km."""
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dp = p2 - p1
    dl = np.radians(lon2) - np.radians(lon1)
    a = np.sin(dp / 2.0) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2.0) ** 2
    return 2.0 * _EARTH_R * np.arcsin(np.sqrt(a))


class CellPointIndex:
    """cell_id → (ids, lon, lat) arrays of the site set."""

    def __init__(self, ids, lon, lat, level: int = DEFAULT_LEVEL):
        self.level = level
        lon = np.asarray(lon, np.float64)
        lat = np.asarray(lat, np.float64)
        ids = np.asarray(ids)
        cells = point_to_cell(lon, lat, level).astype(np.int64)
        order = np.argsort(cells, kind="stable")
        self.cells_sorted = cells[order]
        self.ids = ids[order]
        self.lon = lon[order]
        self.lat = lat[order]
        uniq, starts = np.unique(self.cells_sorted, return_index=True)
        self.cell_start = dict(zip(uniq.tolist(), starts.tolist()))
        self.cell_end = dict(
            zip(uniq.tolist(), np.append(starts[1:], len(cells)).tolist())
        )
        self.n_cells = 1 << level
        # smallest lon extent of a cell in km (worst case at max |lat|)
        self.cell_lat_km = 180.0 / self.n_cells * 111.19492664455873
        max_abs_lat = float(np.max(np.abs(lat))) if len(lat) else 0.0
        self.cos_floor = np.cos(np.radians(min(max_abs_lat + 180.0 / self.n_cells, 90.0)))

    def cell_range(self, c: int):
        s = self.cell_start.get(c)
        if s is None:
            return None
        return s, self.cell_end[c]

    def knn(self, qlon: float, qlat: float, k: int):
        """Exact k nearest sites to one probe point."""
        lvl = self.level
        qcell = int(point_to_cell(np.array([qlon]), np.array([qlat]), lvl)[0])
        qi = (qcell >> 29) & ((1 << 29) - 1)
        qj = qcell & ((1 << 29) - 1)
        n = self.n_cells
        got_idx: list[np.ndarray] = []
        r = 0
        while True:
            # ring of cells at Chebyshev radius r
            ring_cells = []
            if r == 0:
                ring_cells.append((qi, qj))
            else:
                for di in range(-r, r + 1):
                    for dj in (-r, r):
                        jj = qj + dj
                        if 0 <= jj < n:
                            ring_cells.append(((qi + di) % n, jj))
                for dj in range(-r + 1, r):
                    for di in (-r, r):
                        jj = qj + dj
                        if 0 <= jj < n:
                            ring_cells.append(((qi + di) % n, jj))
            for ci, cj in ring_cells:
                rng = self.cell_range((lvl << 58) | (ci << 29) | cj)
                if rng:
                    got_idx.append(np.arange(rng[0], rng[1]))
            total = sum(len(a) for a in got_idx)
            # lower bound on distance to any cell beyond radius r
            lon_km_per_cell = 360.0 / n * 111.19492664455873 * self.cos_floor
            bound_km = r * min(self.cell_lat_km, lon_km_per_cell)
            if total >= k:
                idx = np.concatenate(got_idx)
                d = haversine_km(qlon, qlat, self.lon[idx], self.lat[idx])
                top = np.argsort(d, kind="stable")[:k]
                if d[top[-1]] <= bound_km or r >= n:
                    return idx[top], d[top]
            elif r >= n:
                if total == 0:
                    return np.empty(0, np.int64), np.empty(0)
                idx = np.concatenate(got_idx)
                d = haversine_km(qlon, qlat, self.lon[idx], self.lat[idx])
                top = np.argsort(d, kind="stable")[: min(k, total)]
                return idx[top], d[top]
            r += 1


class KnnActor:
    """Actor-pool stage: site index fetched once per actor."""

    def __init__(self, index_ref, k: int, id_col: str):
        self.index: CellPointIndex = ray.get(index_ref)
        self.k = k
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        pids = batch[self.id_col].to_pylist()
        out_p, out_n, out_rank, out_d = [], [], [], []
        for m in range(len(lon)):
            idx, d = self.index.knn(float(lon[m]), float(lat[m]), self.k)
            for rank, (i, dist) in enumerate(zip(idx, d)):
                out_p.append(pids[m])
                out_n.append(self.index.ids[i])
                out_rank.append(rank)
                out_d.append(float(dist))
        return pa.table(
            {
                self.id_col: pa.array(out_p),
                "neighbor_id": pa.array(out_n),
                "rank": pa.array(out_rank, type=pa.int32()),
                "dist_km": pa.array(out_d, type=pa.float64()),
            }
        )


def knn_join(
    probes,
    site_ids,
    site_lon,
    site_lat,
    *,
    k: int = 5,
    level: int = DEFAULT_LEVEL,
    id_col: str = "image_id",
    concurrency: int | tuple = 4,
    batch_size: int = 4096,
):
    """probes Dataset (id, lon, lat) × site arrays → kNN rows."""
    index_ref = ray.put(CellPointIndex(site_ids, site_lon, site_lat, level=level))
    return probes.map_batches(
        KnnActor,
        fn_constructor_args=(index_ref, k, id_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

"""Raster tile ↔ vector ring stages: tile assignment + clipping.

Tiles are the slippy-map-style addressing of the engine's quad grid:
``tile_x = i``, ``tile_y = (2^z - 1) - j`` (y grows southward). A
ring's tile assignment reuses the exact cell covering; the clipped
geometry per tile is the Sutherland–Hodgman intersection of the ring
with the tile's bbox (convex clip window ⇒ S–H is exact for our simple
rings).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..cells.grid import cell_bounds, cell_ij, cover_ring_with_boundary

__all__ = ["sutherland_hodgman_bbox", "tile_clip_batch", "tile_assign_dataset"]

_RING_T = pa.list_(pa.list_(pa.float64()))


def sutherland_hodgman_bbox(ring: np.ndarray, lon0, lat0, lon1, lat1) -> np.ndarray:
    """Clip a closed ring against an axis-aligned bbox. Returns the
    clipped closed ring ((m,2), m>=4) or an empty array."""
    pts = ring[:-1] if (ring[0] == ring[-1]).all() else ring
    poly = [tuple(p) for p in pts]

    def clip_edge(poly, inside, intersect):
        out = []
        n = len(poly)
        for i in range(n):
            cur, prev = poly[i], poly[i - 1]
            cin, pin = inside(cur), inside(prev)
            if cin:
                if not pin:
                    out.append(intersect(prev, cur))
                out.append(cur)
            elif pin:
                out.append(intersect(prev, cur))
        return out

    def ix_v(x):
        def f(a, b):
            t = (x - a[0]) / (b[0] - a[0])
            return (x, a[1] + t * (b[1] - a[1]))

        return f

    def ix_h(y):
        def f(a, b):
            t = (y - a[1]) / (b[1] - a[1])
            return (a[0] + t * (b[0] - a[0]), y)

        return f

    for inside, ix in (
        (lambda p: p[0] >= lon0, ix_v(lon0)),
        (lambda p: p[0] <= lon1, ix_v(lon1)),
        (lambda p: p[1] >= lat0, ix_h(lat0)),
        (lambda p: p[1] <= lat1, ix_h(lat1)),
    ):
        poly = clip_edge(poly, inside, ix)
        if not poly:
            return np.empty((0, 2))
    out = np.asarray(poly + [poly[0]], np.float64)
    return out


def tile_clip_batch(batch: pa.Table, *, zoom: int = 8) -> pa.Table:
    """simple-ring rows → one row per (ring, intersecting tile) with the
    clipped geometry."""
    gids = batch["geom_id"].to_pylist()
    idxs = batch["ring_seq"].to_pylist()
    rings = batch["ring"].to_pylist()
    n = 1 << zoom
    out = {
        "geom_id": [],
        "ring_seq": [],
        "tile_z": [],
        "tile_x": [],
        "tile_y": [],
        "clipped_ring": [],
    }
    for gid, ri, ring in zip(gids, idxs, rings):
        arr = np.asarray(ring, np.float64)
        cells, is_boundary = cover_ring_with_boundary(arr, zoom)
        lon0, lat0, lon1, lat1 = cell_bounds(cells)
        ii, jj = cell_ij(cells)
        for m in range(len(cells)):
            if not is_boundary[m]:
                # tile wholly inside the ring: the clip IS the tile bbox
                clipped = np.array(
                    [
                        [lon0[m], lat0[m]],
                        [lon1[m], lat0[m]],
                        [lon1[m], lat1[m]],
                        [lon0[m], lat1[m]],
                        [lon0[m], lat0[m]],
                    ]
                )
            else:
                clipped = sutherland_hodgman_bbox(
                    arr, lon0[m], lat0[m], lon1[m], lat1[m]
                )
            if len(clipped) < 4:
                continue
            out["geom_id"].append(gid)
            out["ring_seq"].append(ri)
            out["tile_z"].append(zoom)
            out["tile_x"].append(int(ii[m]))
            out["tile_y"].append(int(n - 1 - jj[m]))
            out["clipped_ring"].append(clipped.tolist())
    return pa.table(
        {
            "geom_id": pa.array(out["geom_id"], type=pa.string()),
            "ring_seq": pa.array(out["ring_seq"], type=pa.int32()),
            "tile_z": pa.array(out["tile_z"], type=pa.int16()),
            "tile_x": pa.array(out["tile_x"], type=pa.int32()),
            "tile_y": pa.array(out["tile_y"], type=pa.int32()),
            "clipped_ring": pa.array(out["clipped_ring"], type=_RING_T),
        }
    )


def tile_assign_dataset(simple_rings, *, zoom: int = 8):
    import functools

    return simple_rings.map_batches(
        functools.partial(tile_clip_batch, zoom=zoom), batch_format="pyarrow"
    )

"""Cell index tests: brute-force-verified coverings, id round trips."""

import numpy as np

from simplepolygon_ray.cells import (
    cell_bounds,
    cell_children,
    cell_ij,
    cell_level,
    cell_neighbors,
    cell_parent,
    compact_cells,
    cover_ring,
    point_to_cell,
)
from simplepolygon_ray.geom.kernels import points_in_ring


def test_point_cell_roundtrip():
    rng = np.random.default_rng(11)
    lon = rng.uniform(-180, 179.999, 1000)
    lat = rng.uniform(-90, 89.999, 1000)
    for level in (0, 3, 9, 15):
        c = point_to_cell(lon, lat, level)
        assert (cell_level(c) == level).all()
        lon0, lat0, lon1, lat1 = cell_bounds(c)
        assert (lon >= lon0).all() and (lon < lon1 + 1e-9).all()
        assert (lat >= lat0).all() and (lat < lat1 + 1e-9).all()


def test_parent_child():
    c = point_to_cell(np.array([10.0]), np.array([20.0]), 8)[0]
    kids = cell_children(c).ravel()
    assert len(kids) == 4
    assert (cell_parent(kids) == c).all()
    assert cell_level(cell_parent(c)) == 7


def test_neighbors_disk():
    c = int(point_to_cell(np.array([0.0]), np.array([0.0]), 5)[0])
    nb = cell_neighbors(c, radius=1)
    assert len(nb) == 9 and c in nb
    # at a pole edge: clamped rows
    cp = int(point_to_cell(np.array([0.0]), np.array([89.9]), 5)[0])
    nbp = cell_neighbors(cp, radius=1)
    assert len(nbp) == 6
    # at the antimeridian: wraps, still 9
    cw = int(point_to_cell(np.array([-179.9]), np.array([0.0]), 5)[0])
    assert len(cell_neighbors(cw, radius=1)) == 9


def _brute_cover(ring, level):
    """Oracle: every cell in the ring bbox whose closed bbox intersects
    the polygon (sampled densely)."""
    n = 1 << level
    got = []
    lon0, lat0 = ring[:, 0].min(), ring[:, 1].min()
    lon1, lat1 = ring[:, 0].max(), ring[:, 1].max()
    i0 = max(int(np.floor((lon0 + 180) / 360 * n)), 0)
    i1 = min(int(np.floor((lon1 + 180) / 360 * n)), n - 1)
    j0 = max(int(np.floor((lat0 + 90) / 180 * n)), 0)
    j1 = min(int(np.floor((lat1 + 90) / 180 * n)), n - 1)
    s = 12
    for i in range(i0, i1 + 1):
        for j in range(j0, j1 + 1):
            xs = -180 + (i + (np.arange(s) + 0.5) / s) / n * 360
            ys = -90 + (j + (np.arange(s) + 0.5) / s) / n * 180
            xx, yy = np.meshgrid(xs, ys, indexing="ij")
            if points_in_ring(xx.ravel(), yy.ravel(), ring).any():
                got.append((i, j))
    return got


def test_cover_matches_brute_force_sampling():
    ring = np.array(
        [[10.0, 10.0], [40.0, 12.0], [35.0, 35.0], [12.0, 30.0], [10.0, 10.0]]
    )
    for level in (4, 6):
        cover = cover_ring(ring, level)
        iijj = set(zip(*(v.tolist() for v in cell_ij(cover))))
        brute = set(_brute_cover(ring, level))
        # sampled-interior brute force must be a subset of the covering
        assert brute <= iijj, brute - iijj
        # covering must not wildly overshoot (only boundary-grazing extras)
        assert len(iijj) <= len(brute) + 4 * (2 ** (level - 2))


def test_cover_contains_all_member_points():
    # every point inside the ring maps to a covered cell
    ring = np.array([[0.0, 0.0], [20.0, 5.0], [15.0, 18.0], [2.0, 12.0], [0.0, 0.0]])
    rng = np.random.default_rng(5)
    pts = rng.uniform([0, 0], [20, 18], size=(2000, 2))
    inside = points_in_ring(pts[:, 0], pts[:, 1], ring)
    level = 7
    cover = set(cover_ring(ring, level).tolist())
    cells = point_to_cell(pts[inside, 0], pts[inside, 1], level)
    assert all(int(c) in cover for c in cells)


def test_compact():
    # a full 2x2 sibling quad compacts to its parent
    base = point_to_cell(np.array([50.0]), np.array([50.0]), 6)[0]
    kids = cell_children(base).ravel()
    out = compact_cells(kids)
    assert len(out) == 1 and out[0] == base
    # an incomplete quad stays
    out2 = compact_cells(kids[:3])
    assert len(out2) == 3


def test_cover_rings_flat_leading_empty_ring():
    """A zero-vertex leading ring (offs 0,0,...) must not wrap the
    straddle mask to -1 and drop the last ring's closing edge."""
    from simplepolygon_ray.cells.grid import cover_rings_flat

    ring = np.array(
        [[0.0, 0.0], [3.0, 0.0], [3.0, 3.0], [0.0, 3.0], [0.0, 0.0]]
    )
    offs_plain = np.array([0, len(ring)])
    r0, c0 = cover_rings_flat(ring, offs_plain, 7)
    coords = np.concatenate([np.empty((0, 2)), ring])
    offs_empty = np.array([0, 0, len(ring)])
    r1, c1 = cover_rings_flat(coords, offs_empty, 7)
    assert (r1 == 1).all()
    assert sorted(c1.tolist()) == sorted(c0.tolist())

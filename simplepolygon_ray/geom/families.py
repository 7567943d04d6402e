"""Deterministic synthetic polygon families (FIXTURES.md §2).

Pure functions of (family, params, placement) — the corpus generator
maps a row id to a polygon with no RNG state, so the polygons table can
be synthesized at any scale inside ``map_batches``.

Families:
- ``star(n)``: n-pointed pinwheel (every edge crosses others) — the
  classic self-intersecting stress case;
- ``zigzag(m)``: a zig ribbon whose straight return path crosses every
  zig edge (m proper crossings);
- ``crossed_rings()``: outer rectangle + inner ring shifted to cross
  the boundary (cross-ring intersections);
- ``nested(d)``: d concentric rings — the fast path with a d-deep
  parent chain.

Placement maps the unit shape into a lon/lat box so spatial stages
(cell covering, PIP join, tiling) see realistic geography; default
boxes land inside the synthetic image table's geotag range.
"""

from __future__ import annotations

import numpy as np

__all__ = ["star", "zigzag", "crossed_rings", "nested", "polygon_for_id", "N_FAMILIES"]

N_FAMILIES = 4


def _place(rings, cx: float, cy: float, r: float):
    """Scale unit-box rings ([-1,1]²) to a (cx, cy, r) placement."""
    return [[[cx + x * r, cy + y * r] for x, y in ring] for ring in rings]


def star(n: int) -> list:
    """n-pointed pinwheel star; n odd >= 5."""
    n = max(5, n | 1)
    s = (n - 1) // 2
    k = np.arange(n)
    t = 2.0 * np.pi * ((k * s) % n) / n
    ring = np.column_stack([np.cos(t), np.sin(t)])
    return [np.vstack([ring, ring[:1]]).tolist()]


def zigzag(m: int) -> list:
    """m-crossing zig ribbon: zig path at y∈{-1,1}, straight return at y=0."""
    m = max(1, m)
    pts = []
    for k in range(m + 1):
        x = -1.0 + 2.0 * k / m
        y = 1.0 if k % 2 == 0 else -1.0
        pts.append([x, y])
    pts.append([1.0 + 0.5 / m, 0.0])
    pts.append([-1.0 - 0.5 / m, 0.0])
    pts.append(pts[0])
    return [pts]


def crossed_rings() -> list:
    """Outer rectangle + inner ring crossing its right edge."""
    outer = [[-1, -1], [1, -1], [1, 1], [-1, 1], [-1, -1]]
    inner = [[0.2, -0.4], [1.4, -0.4], [1.4, 0.4], [0.2, 0.4], [0.2, -0.4]]
    return [outer, inner]


def nested(d: int) -> list:
    """d concentric square rings (fast path, parent chain depth d)."""
    d = max(1, min(d, 6))
    rings = []
    for k in range(d):
        s = 1.0 - k / (d + 0.5)
        rings.append([[-s, -s], [s, -s], [s, s], [-s, s], [-s, -s]])
    return rings


def _splitmix64(x: int) -> int:
    z = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


def polygon_for_id(
    gid: int,
    lon_range=(114.0, 141.0),
    lat_range=(-36.0, -14.0),
    max_radius: float = 1.5,
) -> list:
    """Deterministic polygon (list of rings) for one integer geometry id."""
    h = _splitmix64(gid)
    fam = gid % N_FAMILIES
    p = 5 + (h >> 8) % 6  # size parameter 5..10
    if fam == 0:
        rings = star(int(p))
    elif fam == 1:
        rings = zigzag(int(p))
    elif fam == 2:
        rings = crossed_rings()
    else:
        rings = nested(int(p) % 5 + 1)
    cx = lon_range[0] + ((h >> 16) % 10_000) / 10_000.0 * (lon_range[1] - lon_range[0])
    cy = lat_range[0] + ((h >> 32) % 10_000) / 10_000.0 * (lat_range[1] - lat_range[0])
    r = 0.2 + ((h >> 48) % 1_000) / 1_000.0 * (max_radius - 0.2)
    return _place(rings, cx, cy, r)

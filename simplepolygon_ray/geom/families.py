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

__all__ = [
    "star",
    "zigzag",
    "crossed_rings",
    "nested",
    "polygon_for_id",
    "placed_rings_for_ids",
    "N_FAMILIES",
]

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


def _splitmix64_vec(x: np.ndarray) -> np.ndarray:
    """Vectorized ``_splitmix64`` over a uint64 array (same bits)."""
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


_SHAPE_BANK = None


def _shape_bank():
    """Flattened bank of the 24 distinct unit shapes (4 families × 6
    size params). The placed corpus is a gather from this bank — the
    per-id Python construction only runs once per (fam, p)."""
    global _SHAPE_BANK
    if _SHAPE_BANK is None:
        coords, ring_lens = [], []
        tpl_v = np.zeros(N_FAMILIES * 6, np.int64)  # vertices per shape
        tpl_r = np.zeros(N_FAMILIES * 6, np.int64)  # rings per shape
        for fam in range(N_FAMILIES):
            for p in range(5, 11):
                if fam == 0:
                    rings = star(p)
                elif fam == 1:
                    rings = zigzag(p)
                elif fam == 2:
                    rings = crossed_rings()
                else:
                    rings = nested(p % 5 + 1)
                arrs = [np.asarray(r, dtype=np.float64) for r in rings]
                key = fam * 6 + (p - 5)
                tpl_v[key] = sum(len(a) for a in arrs)
                tpl_r[key] = len(arrs)
                coords.append(np.concatenate(arrs))
                ring_lens.append(np.fromiter((len(a) for a in arrs), np.int64))
        _SHAPE_BANK = {
            "coords": np.concatenate(coords),  # (sum V, 2) unit coords
            "v_start": np.concatenate([[0], np.cumsum(tpl_v)])[:-1],
            "tpl_v": tpl_v,
            "ring_lens": np.concatenate(ring_lens),
            "r_start": np.concatenate([[0], np.cumsum(tpl_r)])[:-1],
            "tpl_r": tpl_r,
        }
    return _SHAPE_BANK


def _within_segments(lens: np.ndarray) -> np.ndarray:
    """[0..l0), [0..l1), ... concatenated."""
    total = int(lens.sum())
    starts = np.cumsum(lens) - lens
    return np.arange(total, dtype=np.int64) - np.repeat(starts, lens)


def placed_rings_for_ids(
    ids: np.ndarray,
    lon_range=(114.0, 141.0),
    lat_range=(-36.0, -14.0),
    max_radius: float = 1.5,
):
    """Vectorized ``polygon_for_id`` over an int64 id array.

    Returns ``(flat_coords (V, 2) float64, ring_lens int64, nrings
    int64)`` — the per-polygon ring structure flattened in id order.
    Bit-exact vs the scalar path: the placement arithmetic applies the
    identical multiply-then-add rounding per coordinate
    (equivalence-tested in test_decompose_pin.py)."""
    ids = np.asarray(ids, dtype=np.int64)
    bank = _shape_bank()
    h = _splitmix64_vec(ids.view(np.uint64))
    p = ((h >> np.uint64(8)) % np.uint64(6)).astype(np.int64)  # p-5
    key = (ids % N_FAMILIES) * 6 + p
    cx = lon_range[0] + ((h >> np.uint64(16)) % np.uint64(10_000)).astype(
        np.float64
    ) / 10_000.0 * (lon_range[1] - lon_range[0])
    cy = lat_range[0] + ((h >> np.uint64(32)) % np.uint64(10_000)).astype(
        np.float64
    ) / 10_000.0 * (lat_range[1] - lat_range[0])
    r = 0.2 + ((h >> np.uint64(48)) % np.uint64(1_000)).astype(
        np.float64
    ) / 1_000.0 * (max_radius - 0.2)

    nv = bank["tpl_v"][key]
    gidx = np.repeat(bank["v_start"][key], nv) + _within_segments(nv)
    flat = bank["coords"][gidx]  # (V, 2) unit coords in id order
    # same rounding as _place's `cx + x * r`: multiply, then add
    flat = flat * np.repeat(r, nv)[:, None]
    flat[:, 0] += np.repeat(cx, nv)
    flat[:, 1] += np.repeat(cy, nv)

    nr = bank["tpl_r"][key]
    ridx = np.repeat(bank["r_start"][key], nr) + _within_segments(nr)
    ring_lens = bank["ring_lens"][ridx]
    return flat, ring_lens, nr

"""Frozen numeric kernels for the decomposition operator.

These carry the bit-exact float64 contract verified against the
reference golden fixtures (SURVEY.md §1.3):

- segment intersection uses the determinant ("Wikipedia line–line")
  formula — NOT the parametric form, which differs in the last ulp;
- the fractional position along an edge is computed on the x-axis
  unless the edge is exactly vertical (Δx == 0), then on y;
- ``is_convex`` is the 2-D cross product test of reference
  src/index.ts:604-613;
- ``winding_of_ring`` mirrors reference src/index.ts:615-638;
- ``point_in_ring`` is the even-odd ray cast with explicit boundary
  detection matching @turf/boolean-point-in-polygon 7.x with
  ``ignoreBoundary: true`` (consumed at reference src/index.ts:666-675).

Do not reassociate or fuse the arithmetic in these expressions: numpy
float64 elementwise ops written in the same order are IEEE-754
identical to the scalar reference computation.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "is_convex",
    "winding_of_ring",
    "point_in_ring",
    "shoelace_area",
    "segment_intersections",
]


def is_convex(p0, p1, p2, righthanded: bool) -> bool:
    """Cross-product convexity test (reference src/index.ts:604-613)."""
    d = (p1[0] - p0[0]) * (p2[1] - p0[1]) - (p1[1] - p0[1]) * (p2[0] - p0[0])
    return (d >= 0) == righthanded


def winding_of_ring(ring: np.ndarray) -> int:
    """Winding of a simple closed ring via its left-most vertex
    (reference src/index.ts:615-638). ``ring`` is (n,2) float64 with
    the closing vertex present (ring[0] == ring[-1])."""
    m = len(ring) - 1
    xs = ring[:m, 0]
    left = int(np.argmin(xs))  # strict '<' scan == first occurrence of min
    p0 = ring[(left - 1) % m]
    p1 = ring[left]
    p2 = ring[(left + 1) % m]
    return 1 if is_convex(p0, p1, p2, True) else -1


def point_in_ring(pt, ring: np.ndarray, ignore_boundary: bool = True) -> bool:
    """Even-odd point-in-ring with turf-7.x boundary semantics.

    ``ring`` is (n,2) with or without the closing vertex. A point
    exactly on an edge returns ``not ignore_boundary``. Matches
    @turf/boolean-point-in-polygon as consumed at reference
    src/index.ts:666-675 (``{ignoreBoundary: true}``).
    """
    px, py = float(pt[0]), float(pt[1])
    r = ring
    if r[0][0] == r[-1][0] and r[0][1] == r[-1][1]:
        r = r[:-1]
    n = len(r)
    inside = False
    j = n - 1
    for i in range(n):
        xi, yi = float(r[i][0]), float(r[i][1])
        xj, yj = float(r[j][0]), float(r[j][1])
        on_boundary = (
            py * (xi - xj) + yi * (xj - px) + yj * (px - xi) == 0
            and (xi - px) * (xj - px) <= 0
            and (yi - py) * (yj - py) <= 0
        )
        if on_boundary:
            return not ignore_boundary
        if ((yi > py) != (yj > py)) and (px < (xj - xi) * (py - yi) / (yj - yi) + xi):
            inside = not inside
        j = i
    return inside


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized even-odd PIP of many points against one ring
    (boundary counts as OUTSIDE, i.e. ignoreBoundary=True semantics).

    Used by the PIP-join stages where probe points are generic
    geotags (never exactly on ring edges in the synthetic corpus);
    the scalar ``point_in_ring`` stays authoritative for the
    reference-parity path.
    """
    r = ring
    if r[0][0] == r[-1][0] and r[0][1] == r[-1][1]:
        r = r[:-1]
    xi = r[:, 0][None, :]  # (1, n)
    yi = r[:, 1][None, :]
    xj = np.roll(r[:, 0], 1)[None, :]
    yj = np.roll(r[:, 1], 1)[None, :]
    px = px[:, None]
    py = py[:, None]
    cond = (yi > py) != (yj > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xcross = (xj - xi) * (py - yi) / (yj - yi) + xi
    hit = cond & (px < xcross)
    inside = (hit.sum(axis=1) % 2).astype(bool)
    # boundary: point exactly on an edge segment -> outside. The two
    # range products are only evaluated when some cross-product is
    # EXACTLY zero (bit-identical result; ~never on real probe data)
    onz = py * (xi - xj) + yi * (xj - px) + yj * (px - xi) == 0
    if onz.any():
        on = (
            onz & ((xi - px) * (xj - px) <= 0) & ((yi - py) * (yj - py) <= 0)
        ).any(axis=1)
        inside[on] = False
    return inside


def shoelace_area(ring: np.ndarray) -> float:
    """Signed planar shoelace area (general util; NOT used for parent
    determination — the reference's area comparison is dead code, see
    reference src/index.ts:662-676 and SURVEY.md §2.1 R14)."""
    r = ring
    if r[0][0] == r[-1][0] and r[0][1] == r[-1][1]:
        r = r[:-1]
    x = r[:, 0]
    y = r[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def _frac_along(sx, sy, ex, ey, ix, iy):
    """Fractional position of (ix,iy) along segment (s→e): x-axis unless
    the segment is exactly vertical, then y-axis (SURVEY.md §1.3)."""
    dx = ex - sx
    return np.where(dx != 0.0, (ix - sx) / np.where(dx != 0.0, dx, 1.0),
                    (iy - sy) / (ey - sy))


def segment_intersections(a0, a1, b0, b1):
    """Vectorized proper-intersection test of segment pairs.

    Inputs are (k,2) float64 arrays: segment A = a0[i]→a1[i], segment
    B = b0[i]→b1[i]. Returns ``(valid, ix, iy, fracA, fracB)`` where
    ``valid`` marks pairs with a proper interior crossing under the
    reference contract (SURVEY.md §1.3):

    - determinant formula for the intersection point (exact operand
      order preserved below);
    - strict 0 < frac < 1 on BOTH segments, frac on x unless Δx==0;
    - intersection point float-equal to any of the four endpoints
      rejected.

    Same-edge / cyclically-adjacent-pair exclusion is the caller's job
    (it needs ring topology).
    """
    x1, y1 = a0[:, 0], a0[:, 1]
    x2, y2 = a1[:, 0], a1[:, 1]
    x3, y3 = b0[:, 0], b0[:, 1]
    x4, y4 = b1[:, 0], b1[:, 1]

    denom = (x1 - x2) * (y3 - y4) - (y1 - y2) * (x3 - x4)
    ok = denom != 0.0
    safe = np.where(ok, denom, 1.0)
    c12 = x1 * y2 - y1 * x2
    c34 = x3 * y4 - y3 * x4
    ix = (c12 * (x3 - x4) - (x1 - x2) * c34) / safe
    iy = (c12 * (y3 - y4) - (y1 - y2) * c34) / safe

    with np.errstate(divide="ignore", invalid="ignore"):
        fa = _frac_along(x1, y1, x2, y2, ix, iy)
        fb = _frac_along(x3, y3, x4, y4, ix, iy)

    ok = ok & (fa > 0.0) & (fa < 1.0) & (fb > 0.0) & (fb < 1.0)
    for ex, ey in ((x1, y1), (x2, y2), (x3, y3), (x4, y4)):
        ok = ok & ~((ix == ex) & (iy == ey))
    return ok, ix, iy, fa, fb

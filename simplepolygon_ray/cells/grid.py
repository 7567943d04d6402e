"""Hierarchical quad-cell index on lon/lat (H3/S2-style, from scratch).

An equirectangular quadtree: level L splits lon ∈ [-180, 180) into 2^L
columns and lat ∈ [-90, 90] into 2^L rows. A cell id packs
``(level << 58) | (i << 29) | j`` into one uint64 (i = lon column,
j = lat row, level ≤ 28), so ids are cheap int64-compatible shuffle
keys for Ray Data groupby/join stages.

All functions are numpy-vectorized — they run inside ``map_batches``
over whole batches, never per row. Coverings are exact for the cell
grid: a cell is in ``cover_ring`` iff it intersects the ring's
boundary or its interior (edge-crossing cells ∪ fully-interior cells;
anything else is wholly outside).
"""

from __future__ import annotations

import numpy as np


__all__ = [
    "MAX_LEVEL",
    "point_to_cell",
    "cell_level",
    "cell_ij",
    "cell_bounds",
    "cell_parent",
    "cell_children",
    "cell_neighbors",
    "cover_ring",
    "cover_rings_flat",
    "compact_cells",
]

MAX_LEVEL = 28
_LSHIFT = np.uint64(58)
_ISHIFT = np.uint64(29)
_MASK29 = np.uint64((1 << 29) - 1)


def _pack(level, i, j):
    return (
        (np.asarray(level, np.uint64) << _LSHIFT)
        | (np.asarray(i, np.uint64) << _ISHIFT)
        | np.asarray(j, np.uint64)
    )


def cell_level(cell):
    return (np.asarray(cell, np.uint64) >> _LSHIFT).astype(np.int64)


def cell_ij(cell):
    c = np.asarray(cell, np.uint64)
    return (
        ((c >> _ISHIFT) & _MASK29).astype(np.int64),
        (c & _MASK29).astype(np.int64),
    )


def point_to_cell(lon, lat, level: int):
    """Vectorized lon/lat → cell id at ``level``."""
    n = 1 << level
    x = (np.asarray(lon, np.float64) + 180.0) / 360.0
    y = (np.asarray(lat, np.float64) + 90.0) / 180.0
    i = np.clip((x * n).astype(np.int64), 0, n - 1)
    j = np.clip((y * n).astype(np.int64), 0, n - 1)
    return _pack(level, i, j)


def cell_bounds(cell):
    """Cell id(s) → (lon0, lat0, lon1, lat1)."""
    lvl = cell_level(cell)
    i, j = cell_ij(cell)
    n = (np.int64(1) << lvl).astype(np.float64)
    lon0 = i / n * 360.0 - 180.0
    lon1 = (i + 1) / n * 360.0 - 180.0
    lat0 = j / n * 180.0 - 90.0
    lat1 = (j + 1) / n * 180.0 - 90.0
    return lon0, lat0, lon1, lat1


def cell_parent(cell, steps: int = 1):
    lvl = cell_level(cell)
    i, j = cell_ij(cell)
    return _pack(lvl - steps, i >> steps, j >> steps)


def cell_children(cell):
    """One cell → its 4 children (returns shape (..., 4) uint64)."""
    lvl = cell_level(cell)
    i, j = cell_ij(cell)
    i2, j2 = i * 2, j * 2
    kids = np.stack(
        [
            _pack(lvl + 1, i2, j2),
            _pack(lvl + 1, i2 + 1, j2),
            _pack(lvl + 1, i2, j2 + 1),
            _pack(lvl + 1, i2 + 1, j2 + 1),
        ],
        axis=-1,
    )
    return kids


def cell_neighbors(cell: int, radius: int = 1) -> np.ndarray:
    """k-ring disk around one cell (self included), with longitude
    wraparound and latitude clamping. Returns unique uint64 ids."""
    lvl = int(cell_level(cell))
    i, j = (int(v) for v in cell_ij(cell))
    n = 1 << lvl
    di = np.arange(-radius, radius + 1)
    dj = np.arange(-radius, radius + 1)
    ii, jj = np.meshgrid(di + i, dj + j, indexing="ij")
    ii = np.mod(ii, n)  # lon wraps
    mask = (jj >= 0) & (jj < n)  # lat clamps
    return np.unique(_pack(lvl, ii[mask], jj[mask]))


def _rl_arange(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Concatenated [arange(s, s+l) for s, l in zip(starts, lens)] in
    one vectorized pass (cumsum-of-steps trick)."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, np.int64)
    step = np.ones(total, np.int64)
    pos = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
    step[0] = starts[0]
    if len(lens) > 1:
        step[pos[1:]] = starts[1:] - (starts[:-1] + lens[:-1] - 1)
    return np.cumsum(step)


def _segments_cross_cells(ring: np.ndarray, level: int):
    """Cells (i, j) at ``level`` whose bbox a ring edge passes through.

    Conservative-and-tight rasterization, fully vectorized over all
    edges: per edge take its column range, clip the segment to each
    column slab, emit the slab's row range.
    """
    n = 1 << level
    x = (ring[:, 0] + 180.0) / 360.0 * n
    y = (ring[:, 1] + 90.0) / 180.0 * n
    x0, x1 = x[:-1], x[1:]
    y0, y1 = y[:-1], y[1:]

    i0 = np.clip(np.floor(np.minimum(x0, x1)), 0, n - 1).astype(np.int64)
    i1 = np.clip(np.floor(np.maximum(x0, x1)), 0, n - 1).astype(np.int64)
    ncols = i1 - i0 + 1
    eidx = np.repeat(np.arange(len(x0)), ncols)  # edge of each expanded col
    cols = _rl_arange(i0, ncols)

    vert = x0[eidx] == x1[eidx]
    with np.errstate(divide="ignore", invalid="ignore"):
        slope = (y1 - y0) / np.where(x1 - x0 != 0.0, x1 - x0, 1.0)
    colf = cols.astype(np.float64)
    xa = np.maximum(colf, np.minimum(x0, x1)[eidx])
    xb = np.minimum(colf + 1.0, np.maximum(x0, x1)[eidx])
    ya = np.where(vert, np.minimum(y0, y1)[eidx], y0[eidx] + slope[eidx] * (xa - x0[eidx]))
    yb = np.where(vert, np.maximum(y0, y1)[eidx], y0[eidx] + slope[eidx] * (xb - x0[eidx]))
    jlo = np.floor(np.clip(np.minimum(ya, yb), 0, n - 1)).astype(np.int64)
    jhi = np.floor(np.clip(np.maximum(ya, yb), 0, n - 1)).astype(np.int64)
    nrows = jhi - jlo + 1
    out_i = np.repeat(cols, nrows)
    out_j = _rl_arange(jlo, nrows)
    return out_i, out_j


def cover_ring(ring: np.ndarray, level: int) -> np.ndarray:
    """Exact covering of a simple closed ring at one level: all cells
    intersecting the ring boundary or interior. Returns sorted unique
    uint64 cell ids.

    Boundary cells come from edge rasterization; interior cells are the
    bbox cells whose center lies strictly inside (a cell untouched by
    any edge is wholly inside or wholly outside — its center decides).
    """
    ring = np.asarray(ring, np.float64)
    n = 1 << level
    bi, bj = _segments_cross_cells(ring, level)

    lon0, lat0 = ring[:, 0].min(), ring[:, 1].min()
    lon1, lat1 = ring[:, 0].max(), ring[:, 1].max()
    i0 = int(np.clip(np.floor((lon0 + 180.0) / 360.0 * n), 0, n - 1))
    i1 = int(np.clip(np.floor((lon1 + 180.0) / 360.0 * n), 0, n - 1))
    j0 = int(np.clip(np.floor((lat0 + 90.0) / 180.0 * n), 0, n - 1))
    j1 = int(np.clip(np.floor((lat1 + 90.0) / 180.0 * n), 0, n - 1))
    ii, jj = np.meshgrid(
        np.arange(i0, i1 + 1, dtype=np.int64),
        np.arange(j0, j1 + 1, dtype=np.int64),
        indexing="ij",
    )
    ii, jj = ii.ravel(), jj.ravel()
    clon = (ii + 0.5) / n * 360.0 - 180.0
    clat = (jj + 0.5) / n * 180.0 - 90.0
    # leaner even-odd PIP for cell centers: boundary handling is
    # irrelevant here (a center exactly on the ring boundary means the
    # cell crosses an edge, so edge rasterization already emits it)
    r = ring[:-1] if (ring[0] == ring[-1]).all() else ring
    xi = r[:, 0][None, :]
    yi = r[:, 1][None, :]
    xj = np.roll(r[:, 0], 1)[None, :]
    yj = np.roll(r[:, 1], 1)[None, :]
    px = clon[:, None]
    py = clat[:, None]
    with np.errstate(divide="ignore", invalid="ignore"):
        cross = ((yi > py) != (yj > py)) & (
            px < (xj - xi) * (py - yi) / (yj - yi) + xi
        )
    inside = (cross.sum(axis=1) % 2).astype(bool)
    cells = np.concatenate(
        [_pack(level, bi, bj), _pack(level, ii[inside], jj[inside])]
    )
    return np.unique(cells)


def cover_ring_with_boundary(ring: np.ndarray, level: int):
    """Like ``cover_ring`` but also returns which covered cells the
    ring BOUNDARY passes through. Interior cells (not boundary) lie
    wholly inside the ring — downstream clipping can emit their bbox
    rectangle without running the clip. Single rasterization pass."""
    ring = np.asarray(ring, np.float64)
    n = 1 << level
    bi, bj = _segments_cross_cells(ring, level)
    boundary = np.unique(_pack(level, bi, bj))

    lon0, lat0 = ring[:, 0].min(), ring[:, 1].min()
    lon1, lat1 = ring[:, 0].max(), ring[:, 1].max()
    i0 = int(np.clip(np.floor((lon0 + 180.0) / 360.0 * n), 0, n - 1))
    i1 = int(np.clip(np.floor((lon1 + 180.0) / 360.0 * n), 0, n - 1))
    j0 = int(np.clip(np.floor((lat0 + 90.0) / 180.0 * n), 0, n - 1))
    j1 = int(np.clip(np.floor((lat1 + 90.0) / 180.0 * n), 0, n - 1))
    ii, jj = np.meshgrid(
        np.arange(i0, i1 + 1, dtype=np.int64),
        np.arange(j0, j1 + 1, dtype=np.int64),
        indexing="ij",
    )
    ii, jj = ii.ravel(), jj.ravel()
    clon = (ii + 0.5) / n * 360.0 - 180.0
    clat = (jj + 0.5) / n * 180.0 - 90.0
    r = ring[:-1] if (ring[0] == ring[-1]).all() else ring
    xi = r[:, 0][None, :]
    yi = r[:, 1][None, :]
    xj = np.roll(r[:, 0], 1)[None, :]
    yj = np.roll(r[:, 1], 1)[None, :]
    px = clon[:, None]
    py = clat[:, None]
    with np.errstate(divide="ignore", invalid="ignore"):
        cross = ((yi > py) != (yj > py)) & (
            px < (xj - xi) * (py - yi) / (yj - yi) + xi
        )
    inside = (cross.sum(axis=1) % 2).astype(bool)
    interior = np.setdiff1d(_pack(level, ii[inside], jj[inside]), boundary)
    cells = np.concatenate([boundary, interior])
    order = np.argsort(cells, kind="stable")
    is_boundary = np.zeros(len(cells), bool)
    is_boundary[: len(boundary)] = True
    return cells[order], is_boundary[order]


def cover_rings_flat(
    coords: np.ndarray, offs: np.ndarray, level: int, with_boundary: bool = False
):
    """Batched :func:`cover_ring` over MANY rings stored as flat coords
    plus vertex offsets (the Arrow list layout): one vectorized
    rasterization pass over all rings' edges, one flat PIP pass over
    all rings' bbox cell centers. Per-ring output equals
    ``cover_ring(ring, level)`` (sorted unique cells).

    Returns ``(ring_row, cell_id)`` int64/uint64 flat arrays, plus
    ``is_boundary`` when requested (cells the ring boundary passes
    through, as in :func:`cover_ring_with_boundary`).
    """
    n = 1 << level
    offs = np.asarray(offs, np.int64)
    n_rings = len(offs) - 1
    empty = (
        (np.empty(0, np.int64), np.empty(0, np.uint64), np.empty(0, bool))
        if with_boundary
        else (np.empty(0, np.int64), np.empty(0, np.uint64))
    )
    if n_rings <= 0 or len(coords) == 0:
        return empty
    vlen = offs[1:] - offs[:-1]
    if (vlen == 0).any():
        # zero-vertex rings poison the run-length machinery (reduceat
        # over an empty segment, zero-length _rl_arange runs): compute
        # over the non-empty rings only and remap ring ids back
        nonempty = np.flatnonzero(vlen > 0)
        if len(nonempty) == 0:
            return empty
        gather = _rl_arange(offs[:-1][nonempty], vlen[nonempty])
        sub_offs = np.concatenate([[0], np.cumsum(vlen[nonempty])]).astype(np.int64)
        res = cover_rings_flat(coords[gather], sub_offs, level, with_boundary)
        if with_boundary:
            r, c, b = res
            return nonempty[r], c, b
        r, c = res
        return nonempty[r], c
    ring_of_vertex = np.repeat(np.arange(n_rings, dtype=np.int64), vlen)

    # ---- boundary: rasterize all consecutive-pair edges at once
    x = (coords[:, 0] + 180.0) / 360.0 * n
    y = (coords[:, 1] + 90.0) / 180.0 * n
    pair_ok = np.ones(max(len(coords) - 1, 0), bool)
    if n_rings > 1:
        # pairs that straddle two rings; a leading zero-vertex ring has
        # offs==0 whose -1 would wrap to the LAST pair — mask only
        # positive boundaries (an empty ring contributes no vertices,
        # so the straddling pair it shares sits at the same offset)
        bnd = offs[1:-1]
        pair_ok[bnd[bnd > 0] - 1] = False
    x0 = x[:-1][pair_ok]
    x1 = x[1:][pair_ok]
    y0 = y[:-1][pair_ok]
    y1 = y[1:][pair_ok]
    ering = ring_of_vertex[:-1][pair_ok]

    i0 = np.clip(np.floor(np.minimum(x0, x1)), 0, n - 1).astype(np.int64)
    i1 = np.clip(np.floor(np.maximum(x0, x1)), 0, n - 1).astype(np.int64)
    ncols = i1 - i0 + 1
    eidx = np.repeat(np.arange(len(x0)), ncols)
    cols = _rl_arange(i0, ncols)
    vert = x0[eidx] == x1[eidx]
    with np.errstate(divide="ignore", invalid="ignore"):
        slope = (y1 - y0) / np.where(x1 - x0 != 0.0, x1 - x0, 1.0)
    colf = cols.astype(np.float64)
    xa = np.maximum(colf, np.minimum(x0, x1)[eidx])
    xb = np.minimum(colf + 1.0, np.maximum(x0, x1)[eidx])
    ya = np.where(vert, np.minimum(y0, y1)[eidx], y0[eidx] + slope[eidx] * (xa - x0[eidx]))
    yb = np.where(vert, np.maximum(y0, y1)[eidx], y0[eidx] + slope[eidx] * (xb - x0[eidx]))
    jlo = np.floor(np.clip(np.minimum(ya, yb), 0, n - 1)).astype(np.int64)
    jhi = np.floor(np.clip(np.maximum(ya, yb), 0, n - 1)).astype(np.int64)
    nrows = jhi - jlo + 1
    b_ring = np.repeat(ering[eidx], nrows)
    b_cell = _pack(level, np.repeat(cols, nrows), _rl_arange(jlo, nrows))

    # ---- interior candidates: per-ring bbox cell centers
    rlon0 = np.minimum.reduceat(coords[:, 0], offs[:-1])
    rlon1 = np.maximum.reduceat(coords[:, 0], offs[:-1])
    rlat0 = np.minimum.reduceat(coords[:, 1], offs[:-1])
    rlat1 = np.maximum.reduceat(coords[:, 1], offs[:-1])
    i0r = np.clip(np.floor((rlon0 + 180.0) / 360.0 * n), 0, n - 1).astype(np.int64)
    i1r = np.clip(np.floor((rlon1 + 180.0) / 360.0 * n), 0, n - 1).astype(np.int64)
    j0r = np.clip(np.floor((rlat0 + 90.0) / 180.0 * n), 0, n - 1).astype(np.int64)
    j1r = np.clip(np.floor((rlat1 + 90.0) / 180.0 * n), 0, n - 1).astype(np.int64)
    hj = j1r - j0r + 1
    ncand = (i1r - i0r + 1) * hj
    cand_ring = np.repeat(np.arange(n_rings, dtype=np.int64), ncand)
    loc = _rl_arange(np.zeros(n_rings, np.int64), ncand)
    ci = i0r[cand_ring] + loc // hj[cand_ring]
    cj = j0r[cand_ring] + loc % hj[cand_ring]
    cx = (ci + 0.5) / n * 360.0 - 180.0
    cy = (cj + 0.5) / n * 180.0 - 90.0

    # open-vertex edges (cur=v, prev=cyclic v-1) matching cover_ring's
    # np.roll formulation bit-for-bit
    closed = (coords[offs[:-1]] == coords[np.maximum(offs[1:] - 1, 0)]).all(axis=1)
    closed &= vlen > 1
    olen = vlen - closed.astype(np.int64)
    gather = _rl_arange(offs[:-1], olen)
    oc = coords[gather]
    ostart = np.concatenate([[0], np.cumsum(olen)[:-1]]).astype(np.int64)
    vidx = np.arange(len(oc), dtype=np.int64)
    prev = vidx - 1
    nz = olen > 0
    prev[ostart[nz]] = (ostart + olen - 1)[nz]
    exi, eyi = oc[:, 0], oc[:, 1]
    exj, eyj = oc[prev, 0], oc[prev, 1]

    plens = olen[cand_ring]
    pg = _rl_arange(ostart[cand_ring], plens)
    pc_ = np.repeat(np.arange(len(cand_ring), dtype=np.int64), plens)
    with np.errstate(divide="ignore", invalid="ignore"):
        cross = ((eyi[pg] > cy[pc_]) != (eyj[pg] > cy[pc_])) & (
            cx[pc_]
            < (exj[pg] - exi[pg]) * (cy[pc_] - eyi[pg]) / (eyj[pg] - eyi[pg])
            + exi[pg]
        )
    counts = np.bincount(pc_, weights=cross, minlength=len(cand_ring))
    inside = (counts.astype(np.int64) & 1).astype(bool)
    i_ring = cand_ring[inside]
    i_cell = _pack(level, ci[inside], cj[inside])

    # ---- union with per-ring dedupe; boundary wins the flag
    all_ring = np.concatenate([b_ring, i_ring])
    all_cell = np.concatenate([b_cell, i_cell])
    all_b = np.zeros(len(all_ring), bool)
    all_b[: len(b_ring)] = True
    order = np.lexsort((~all_b, all_cell, all_ring))
    all_ring = all_ring[order]
    all_cell = all_cell[order]
    all_b = all_b[order]
    first = np.ones(len(all_ring), bool)
    first[1:] = (all_ring[1:] != all_ring[:-1]) | (all_cell[1:] != all_cell[:-1])
    if with_boundary:
        return all_ring[first], all_cell[first], all_b[first]
    return all_ring[first], all_cell[first]


def compact_cells(cells: np.ndarray) -> np.ndarray:
    """Merge complete sibling quads into their parent, repeatedly —
    mixed-level compaction of a single-level covering."""
    cells = np.unique(np.asarray(cells, np.uint64))
    while True:
        lvl = cell_level(cells)
        if (lvl == 0).all():
            return cells
        deepest = lvl.max()
        at = cells[lvl == deepest]
        rest = cells[lvl != deepest]
        if len(at) < 4:
            return cells
        parents = cell_parent(at)
        uniq, counts = np.unique(parents, return_counts=True)
        full = uniq[counts == 4]
        if len(full) == 0:
            return cells
        keep = at[~np.isin(parents, full)]
        cells = np.unique(np.concatenate([rest, keep, full]))

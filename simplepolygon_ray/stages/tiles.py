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

from ..cells.grid import cell_bounds, cell_ij, cover_rings_flat

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


def _clip_pass(P, cnt, axis, keep_ge, bound):
    """One Sutherland–Hodgman half-plane pass, vectorized over T
    polygons at once. ``P`` is padded (T, M, 2); ``cnt`` the valid
    vertex count per polygon; ``bound`` per-polygon clip value.
    Returns (newP, newcnt). Semantics (incl. emission order) match the
    scalar ``sutherland_hodgman_bbox`` exactly."""
    T, M, _ = P.shape
    if M == 0:
        # a previous pass clipped every polygon in the slab empty;
        # indexing a zero-width vertex axis below would raise
        return P, np.zeros(T, np.int64)
    idx = np.broadcast_to(np.arange(M), (T, M))
    valid = idx < cnt[:, None]
    coord = P[:, :, axis]
    inside = (coord >= bound[:, None]) if keep_ge else (coord <= bound[:, None])
    inside = inside & valid
    # previous vertex = shifted view; position 0 wraps to cnt-1
    rows = np.arange(T)
    last = np.maximum(cnt - 1, 0)
    prev = np.empty_like(P)
    prev[:, 1:] = P[:, :-1]
    prev[:, 0] = P[rows, last]
    pin = np.empty_like(inside)
    pin[:, 1:] = inside[:, :-1]
    pin[:, 0] = inside[rows, last]

    emit_ix = (inside != pin) & valid  # edge crosses the clip line
    emit_cur = inside
    n_out = emit_ix.astype(np.int64) + emit_cur.astype(np.int64)
    newcnt = n_out.sum(axis=1)
    M_new = int(newcnt.max()) if T else 0
    newP = np.zeros((T, M_new, 2))
    if M_new == 0:
        return newP, newcnt

    pc = coord
    pp = prev[:, :, axis]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (bound[:, None] - pp) / (pc - pp)
        other = prev[:, :, 1 - axis] + t * (P[:, :, 1 - axis] - prev[:, :, 1 - axis])
    ix_pts = np.empty((T, M, 2))
    ix_pts[:, :, axis] = bound[:, None]
    ix_pts[:, :, 1 - axis] = other

    pos = np.cumsum(n_out, axis=1) - n_out
    r, c = np.nonzero(emit_ix)
    newP[r, pos[r, c]] = ix_pts[r, c]
    r2, c2 = np.nonzero(emit_cur)
    newP[r2, pos[r2, c2] + emit_ix[r2, c2]] = P[r2, c2]
    return newP, newcnt


def _clip_tiles_vec(P, cnt, lon0, lat0, lon1, lat1):
    """Clip T padded open polygons against their per-row bboxes (4
    passes, left/right/bottom/top — same order as the scalar kernel)."""
    P, cnt = _clip_pass(P, cnt, 0, True, lon0)
    P, cnt = _clip_pass(P, cnt, 0, False, lon1)
    P, cnt = _clip_pass(P, cnt, 1, True, lat0)
    P, cnt = _clip_pass(P, cnt, 1, False, lat1)
    return P, cnt


def _rl_positions(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Concatenated [arange(s, s+l)] runs (cumsum-of-steps trick)."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, np.int64)
    step = np.ones(total, np.int64)
    pos = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
    step[0] = starts[0]
    if len(lens) > 1:
        step[pos[1:]] = starts[1:] - (starts[:-1] + lens[:-1] - 1)
    return np.cumsum(step)


# max padded float64 elements per clip slab: sized so a pass's (T, M, 2)
# temporaries stay ~1 MB (cache-resident; measured ~35% faster than
# 16 MB slabs, which thrash DRAM) while still amortizing numpy call
# overhead across thousands of tiles
_SLAB_ELEMS = 125_000


def tile_clip_batch(batch: pa.Table, *, zoom: int = 8) -> pa.Table:
    """simple-ring rows → one row per (ring, intersecting tile) with the
    clipped geometry.

    Fully vectorized: ring coords are zero-copy Arrow buffer views;
    interior tiles (ring covers them wholly) emit their bbox rectangle
    directly; boundary tiles of ALL rings in the batch are clipped
    together in slabbed (T, M, 2) numpy Sutherland–Hodgman passes — no
    per-tile Python, no list round-trips."""
    n = 1 << zoom
    col = batch["ring"].combine_chunks()
    offs = np.asarray(col.offsets).astype(np.int64)
    coords = np.asarray(col.values.values, dtype=np.float64).reshape(-1, 2)
    n_rings = len(batch)

    # batched covering of the whole block → (ring_row, cell, is_boundary)
    t_ring, t_cell, t_isb = cover_rings_flat(coords, offs, zoom, with_boundary=True)
    lon0, lat0, lon1, lat1 = cell_bounds(t_cell)
    ii, jj = cell_ij(t_cell)

    # ---- interior tiles: the clip IS the tile bbox (closed, 5 pts)
    int_sel = np.flatnonzero(~t_isb)
    Ti = len(int_sel)
    int_coords = np.empty((Ti, 5, 2))
    int_coords[:, 0, 0] = lon0[int_sel]
    int_coords[:, 0, 1] = lat0[int_sel]
    int_coords[:, 1, 0] = lon1[int_sel]
    int_coords[:, 1, 1] = lat0[int_sel]
    int_coords[:, 2, 0] = lon1[int_sel]
    int_coords[:, 2, 1] = lat1[int_sel]
    int_coords[:, 3, 0] = lon0[int_sel]
    int_coords[:, 3, 1] = lat1[int_sel]
    int_coords[:, 4] = int_coords[:, 0]

    # ---- boundary tiles: slabbed vectorized S–H over (T, M, 2)
    bnd_sel = np.flatnonzero(t_isb)
    # open vertex count per ring (strip the closing vertex when closed)
    vlen_all = offs[1:] - offs[:-1]
    if n_rings:
        closed = (coords[offs[:-1]] == coords[np.maximum(offs[1:] - 1, 0)]).all(axis=1)
        closed &= vlen_all > 1
    else:
        closed = np.empty(0, bool)
    open_len = vlen_all - closed.astype(np.int64)

    kept_rows: list[np.ndarray] = []  # tile-row ids kept
    kept_coords: list[np.ndarray] = []  # flat closed coords
    kept_lens: list[np.ndarray] = []  # closed vertex counts
    # per-tile vertex lengths + suffix max, computed once (a per-slab
    # tail .max() is O(slabs × remaining) — quadratic when one huge
    # ring forces tiny slabs)
    vl_all = open_len[t_ring[bnd_sel]] if len(bnd_sel) else np.empty(0, np.int64)
    suf_max = (
        np.maximum.accumulate(vl_all[::-1])[::-1] if len(vl_all) else vl_all
    )
    s = 0
    while s < len(bnd_sel):
        # size the slab so T*M stays bounded
        vmax_here = int(suf_max[s])
        per = max(1, _SLAB_ELEMS // max(vmax_here + 8, 1))
        sel = bnd_sel[s : s + per]
        s += per
        rrs = t_ring[sel]
        vl = open_len[rrs]
        M0 = int(vl.max())
        T = len(sel)
        P = np.zeros((T, M0, 2))
        vmask = np.arange(M0)[None, :] < vl[:, None]
        flat_idx = offs[rrs][:, None] + np.arange(M0)[None, :]
        P[vmask] = coords[np.minimum(flat_idx, len(coords) - 1)[vmask]]
        cP, ccnt = _clip_tiles_vec(P, vl, lon0[sel], lat0[sel], lon1[sel], lat1[sel])
        keep = ccnt >= 3
        if not keep.any():
            continue
        kp = cP[keep]
        kc = ccnt[keep]
        # flatten open polys then interleave the closing vertex
        vm = np.arange(kp.shape[1])[None, :] < kc[:, None]
        open_flat = kp[vm]
        lens_closed = kc + 1
        ends = np.cumsum(lens_closed)
        starts = ends - lens_closed
        out = np.empty((int(ends[-1]) if len(ends) else 0, 2))
        out[_rl_positions(starts, kc)] = open_flat
        out[ends - 1] = kp[:, 0, :]
        kept_rows.append(sel[keep])
        kept_coords.append(out)
        kept_lens.append(lens_closed)

    # ---- assemble output rows: interior first, then boundary slabs
    all_rows = np.concatenate([int_sel] + kept_rows) if Ti or kept_rows else np.empty(0, np.int64)
    all_lens = np.concatenate(
        [np.full(Ti, 5, np.int64)] + [k.astype(np.int64) for k in kept_lens]
    ) if Ti or kept_lens else np.empty(0, np.int64)
    all_coords = (
        np.concatenate([int_coords.reshape(-1, 2)] + kept_coords)
        if Ti or kept_coords
        else np.empty((0, 2))
    )

    ring_row_ids = t_ring[all_rows] if len(all_rows) else np.empty(0, np.int64)
    take_idx = pa.array(ring_row_ids)
    flat_vals = pa.array(all_coords.ravel())
    inner = pa.ListArray.from_arrays(
        pa.array(np.arange(len(all_coords) + 1, dtype=np.int64) * 2, type=pa.int32()),
        flat_vals,
    )
    outer = pa.ListArray.from_arrays(
        pa.array(
            np.concatenate([[0], np.cumsum(all_lens)]).astype(np.int64),
            type=pa.int32(),
        ),
        inner,
    )
    return pa.table(
        {
            "geom_id": batch["geom_id"].take(take_idx),
            "ring_seq": batch["ring_seq"].take(take_idx),
            "tile_z": pa.array(np.full(len(all_rows), zoom, np.int16)),
            "tile_x": pa.array(ii[all_rows].astype(np.int32)),
            "tile_y": pa.array((n - 1 - jj[all_rows]).astype(np.int32)),
            "clipped_ring": outer.cast(_RING_T),
        }
    )


def tile_assign_dataset(simple_rings, *, zoom: int = 8):
    import functools

    return simple_rings.map_batches(
        functools.partial(tile_clip_batch, zoom=zoom), batch_format="pyarrow"
    )

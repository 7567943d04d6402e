"""Self-intersection detection for a multi-ring polygon.

Reimplements (from scratch) the behavioral contract of the reference's
pinned dependency ``geojson-polygon-self-intersections`` 3.0.0 as
consumed at reference src/index.ts:68-113 and verified bit-exactly
against the golden fixtures (SURVEY.md §1.3, §2.2):

- every geometric intersection is reported TWICE, once per edge
  orientation (mirror rows), with ``unique=True`` on the first
  orientation only;
- rows are emitted grouped by the outer edge ``(ring0, edge0)`` in
  lexicographic order, inner edge ``(ring1, edge1)`` ascending within;
- pairs that are the same edge or cyclically adjacent within the same
  ring are skipped; candidates must properly cross (strict fracs,
  endpoint-equality rejection) per ``kernels.segment_intersections``.

Complexity: O(P·E) per polygon where P is the number of
bbox-overlapping edge pairs — candidate pairs come from a vectorized
bbox-overlap prefilter (all-pairs broadcast for small rings, a sorted
x-interval sweep for large ones), mirroring the reference's use of an
rbush edge-bbox index for pruning (reference README.md:74).
"""

from __future__ import annotations

import numpy as np

from .kernels import segment_intersections

__all__ = ["self_intersections", "self_intersections_batch"]

# all-pairs broadcast is O(E^2) memory; switch to interval sweep above this
_BROADCAST_MAX_EDGES = 1024


def _edge_table(rings):
    """Flatten closed rings into parallel edge arrays.

    Returns (ring_idx, edge_idx, sx, sy, ex, ey, nedges_per_ring).
    ``rings`` is a list of (n,2) float64 arrays with closing vertex.
    """
    ring_idx, edge_idx = [], []
    starts, ends = [], []
    nedges = []
    for ri, ring in enumerate(rings):
        m = len(ring) - 1
        nedges.append(m)
        ring_idx.append(np.full(m, ri, dtype=np.int64))
        edge_idx.append(np.arange(m, dtype=np.int64))
        starts.append(ring[:m])
        ends.append(ring[1 : m + 1])
    return (
        np.concatenate(ring_idx),
        np.concatenate(edge_idx),
        np.concatenate(starts),
        np.concatenate(ends),
        np.asarray(nedges, dtype=np.int64),
    )


def _candidate_pairs_broadcast(minx, miny, maxx, maxy):
    """All ordered pairs (i, j), i != j, whose bboxes overlap."""
    ov = (
        (minx[:, None] <= maxx[None, :])
        & (maxx[:, None] >= minx[None, :])
        & (miny[:, None] <= maxy[None, :])
        & (maxy[:, None] >= miny[None, :])
    )
    np.fill_diagonal(ov, False)
    return np.nonzero(ov)


def _candidate_pairs_sweep(minx, miny, maxx, maxy):
    """Ordered bbox-overlap pairs via a sort-based x-interval sweep.

    O(E log E + P) — the scale path for large rings where the E×E
    broadcast would blow memory.
    """
    n = len(minx)
    order = np.argsort(minx, kind="stable")
    out_i, out_j = [], []
    # active list kept sorted by maxx via periodic compaction
    active: list[int] = []
    for idx in order:
        lo = minx[idx]
        if active:
            keep = [a for a in active if maxx[a] >= lo]
            active = keep
            if keep:
                aarr = np.asarray(keep)
                hit = (miny[aarr] <= maxy[idx]) & (maxy[aarr] >= miny[idx]) & (
                    minx[aarr] <= maxx[idx]
                )
                js = aarr[hit]
                if len(js):
                    out_i.append(np.full(len(js), idx, dtype=np.int64))
                    out_j.append(js.astype(np.int64))
        active.append(int(idx))
    if not out_i:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    i = np.concatenate(out_i)
    j = np.concatenate(out_j)
    # make ordered (both orientations), then sort lexicographically
    ii = np.concatenate([i, j])
    jj = np.concatenate([j, i])
    key = np.lexsort((jj, ii))
    return ii[key], jj[key]


def self_intersections(rings):
    """Detect proper self-/cross-intersections of a ring set.

    ``rings``: list of (n,2) float64 numpy arrays, closed.

    Returns a dict of parallel numpy arrays with one row per
    (intersection × orientation):
    ``ix, iy, ring0, edge0, frac0, ring1, edge1, frac1, unique``
    in the reference emission order (outer edge lexicographic).
    """
    ring_idx, edge_idx, starts, ends, nedges = _edge_table(rings)
    E = len(ring_idx)
    empty = dict(
        ix=np.empty(0), iy=np.empty(0),
        ring0=np.empty(0, np.int64), edge0=np.empty(0, np.int64),
        frac0=np.empty(0), ring1=np.empty(0, np.int64),
        edge1=np.empty(0, np.int64), frac1=np.empty(0),
        unique=np.empty(0, bool),
    )
    if E < 2:
        return empty

    minx = np.minimum(starts[:, 0], ends[:, 0])
    maxx = np.maximum(starts[:, 0], ends[:, 0])
    miny = np.minimum(starts[:, 1], ends[:, 1])
    maxy = np.maximum(starts[:, 1], ends[:, 1])

    if E <= _BROADCAST_MAX_EDGES:
        pi, pj = _candidate_pairs_broadcast(minx, miny, maxx, maxy)
    else:
        pi, pj = _candidate_pairs_sweep(minx, miny, maxx, maxy)
    if len(pi) == 0:
        return empty

    # drop same-ring cyclically-adjacent edge pairs
    same_ring = ring_idx[pi] == ring_idx[pj]
    m = nedges[ring_idx[pi]]
    d = edge_idx[pi] - edge_idx[pj]
    adj = same_ring & (((d % m) == 1) | ((-d % m) == 1))
    keep = ~adj & (pi != pj)
    pi, pj = pi[keep], pj[keep]
    if len(pi) == 0:
        return empty

    ok, ix, iy, fa, fb = segment_intersections(
        starts[pi], ends[pi], starts[pj], ends[pj]
    )
    pi, pj = pi[ok], pj[ok]
    ix, iy, fa, fb = ix[ok], iy[ok], fa[ok], fb[ok]
    if len(pi) == 0:
        return empty

    # reference emission order: outer (ring0, edge0) lexicographic,
    # inner ascending within. Global edge ids are already lex-ordered.
    key = np.lexsort((pj, pi))
    pi, pj = pi[key], pj[key]
    ix, iy, fa, fb = ix[key], iy[key], fa[key], fb[key]

    return dict(
        ix=ix, iy=iy,
        ring0=ring_idx[pi], edge0=edge_idx[pi], frac0=fa,
        ring1=ring_idx[pj], edge1=edge_idx[pj], frac1=fb,
        unique=pi < pj,
    )


_BATCH_MAX_EDGES = 64  # per-polygon cutoff for the batched all-pairs path


def self_intersections_batch(ring_lists):
    """Batched ``self_intersections`` over many polygons in ONE
    vectorized pass (same contract per polygon, identical output).

    Small polygons (≤ ``_BATCH_MAX_EDGES`` edges) share one global
    numpy computation — per-polygon numpy call overhead dominates the
    per-geometry path at corpus scale; large polygons fall back to the
    bbox-prefiltered single-polygon path.
    """
    n = len(ring_lists)
    results: list[dict | None] = [None] * n

    polys = []  # (poly_row, ring_idx, edge_idx, starts, ends, nedges)
    for k, rings in enumerate(ring_lists):
        tab = _edge_table(rings)
        if len(tab[0]) < 2 or len(tab[0]) > _BATCH_MAX_EDGES:
            results[k] = self_intersections(rings)
        else:
            polys.append((k, *tab))
    if not polys:
        return results

    ring_idx = np.concatenate([p[1] for p in polys])
    edge_idx = np.concatenate([p[2] for p in polys])
    starts = np.concatenate([p[3] for p in polys])
    ends = np.concatenate([p[4] for p in polys])
    e_count = np.asarray([len(p[1]) for p in polys], np.int64)
    e_offset = np.concatenate([[0], np.cumsum(e_count)[:-1]]).astype(np.int64)
    # per-ring edge counts aligned to each edge (for cyclic adjacency)
    nedges_of_edge = np.concatenate(
        [np.repeat(p[5], p[5]) for p in polys]
    )

    # all ordered pairs (i, j), i != j, within each polygon
    p_sq = e_count * e_count
    pair_poly = np.repeat(np.arange(len(polys)), p_sq)
    k_within = np.arange(int(p_sq.sum())) - np.repeat(
        np.concatenate([[0], np.cumsum(p_sq)[:-1]]).astype(np.int64), p_sq
    )
    ecnt = e_count[pair_poly]
    pi = e_offset[pair_poly] + k_within // ecnt
    pj = e_offset[pair_poly] + k_within % ecnt

    keep = pi != pj
    same_ring = ring_idx[pi] == ring_idx[pj]
    m = nedges_of_edge[pi]
    d = edge_idx[pi] - edge_idx[pj]
    adj = same_ring & (((d % m) == 1) | ((-d % m) == 1))
    keep &= ~adj
    # bbox overlap prefilter
    minx = np.minimum(starts[:, 0], ends[:, 0])
    maxx = np.maximum(starts[:, 0], ends[:, 0])
    miny = np.minimum(starts[:, 1], ends[:, 1])
    maxy = np.maximum(starts[:, 1], ends[:, 1])
    keep &= (
        (minx[pi] <= maxx[pj])
        & (maxx[pi] >= minx[pj])
        & (miny[pi] <= maxy[pj])
        & (maxy[pi] >= miny[pj])
    )
    pi, pj, pair_poly = pi[keep], pj[keep], pair_poly[keep]

    ok, ix, iy, fa, fb = segment_intersections(starts[pi], ends[pi], starts[pj], ends[pj])
    pi, pj, pair_poly = pi[ok], pj[ok], pair_poly[ok]
    ix, iy, fa, fb = ix[ok], iy[ok], fa[ok], fb[ok]

    # reference emission order per polygon: (pi, pj) lexicographic —
    # global edge ids are already poly-then-lex ordered
    order = np.lexsort((pj, pi))
    pi, pj, pair_poly = pi[order], pj[order], pair_poly[order]
    ix, iy, fa, fb = ix[order], iy[order], fa[order], fb[order]

    bounds = np.searchsorted(pair_poly, np.arange(len(polys) + 1))
    empty = dict(
        ix=np.empty(0), iy=np.empty(0),
        ring0=np.empty(0, np.int64), edge0=np.empty(0, np.int64),
        frac0=np.empty(0), ring1=np.empty(0, np.int64),
        edge1=np.empty(0, np.int64), frac1=np.empty(0),
        unique=np.empty(0, bool),
    )
    for p_row, (k, *_rest) in enumerate(polys):
        s, e = bounds[p_row], bounds[p_row + 1]
        if s == e:
            results[k] = dict(empty)
            continue
        results[k] = dict(
            ix=ix[s:e], iy=iy[s:e],
            ring0=ring_idx[pi[s:e]], edge0=edge_idx[pi[s:e]], frac0=fa[s:e],
            ring1=ring_idx[pj[s:e]], edge1=edge_idx[pj[s:e]], frac1=fb[s:e],
            unique=pi[s:e] < pj[s:e],
        )
    return results

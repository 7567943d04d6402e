"""Per-geometry decomposition of a complex polygon into simple rings.

From-scratch reimplementation of the reference's algorithm
(reference src/index.ts:39-533; Subramaniam 2003 lineage) with the
exact output contract of the golden fixtures:

- fast path (0 self-intersections, src/index.ts:116-134): input rings
  pass through; properties {parent, winding, netWinding} — NO ``index``
  key;
- walk path (src/index.ts:136-519): pseudo-vertex / intersection graph,
  per-edge param sort, next-intersection linking, left-most queue
  seeding with a JS-string-coerced descending sort
  (src/index.ts:325-330 — see ``jsnum``), rightmost-next-edge ring
  walking with winding prediction, then parent determination
  (src/index.ts:645-694 — last-containing-ring-wins, reproducing the
  reference's never-updated ``parentArea`` quirk) and iterative
  net-winding propagation (src/index.ts:696-720, made iterative so deep
  nesting cannot blow Python's recursion limit).

The function is pure per-geometry: no cross-row state, which is what
lets the engine run it embarrassingly parallel inside
``Dataset.map_batches``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import logging
import os

from .gpsi import self_intersections
from .jsnum import js_coord_str
from .kernels import is_convex, point_in_ring, winding_of_ring

# stage logging parity with the reference (src/index.ts:722-730):
# gated on DEBUG=true; per-worker Python logging instead of console.log
_log = logging.getLogger("simplepolygon_ray.decompose")


_DEBUG = os.environ.get("DEBUG") == "true"


def _debug(msg: str) -> None:
    if _DEBUG:
        _log.warning(msg)

__all__ = ["decompose", "DecomposedRing", "DuplicateVertexError"]

class DuplicateVertexError(ValueError):
    """Input polygon has duplicate vertices (reference src/index.ts:60-63)."""


@dataclass
class DecomposedRing:
    """One simple output ring. ``index`` is None on the fast path
    (the reference omits the ``index`` property there)."""

    ring: np.ndarray  # (n,2) float64, closed
    index: int | None
    parent: int
    winding: int
    net_winding: int | None = None


def _close_rings(coordinates) -> list[np.ndarray]:
    rings = []
    for ring in coordinates:
        r = np.asarray(ring, dtype=np.float64)
        if r.ndim != 2 or r.shape[1] < 2 or r.shape[0] == 0:
            raise ValueError("ring must be a sequence of [x, y] positions")
        r = r[:, :2]
        if not (r[0][0] == r[-1][0] and r[0][1] == r[-1][1]):
            r = np.vstack([r, r[:1]])
        rings.append(r)
    return rings


class _WalkQueue:
    """The reference's walk queue (JS array semantics) with an index.

    Reference ops (src/index.ts:283-404): one initial sort, ``pop()``
    from the end, ``push`` at the end, and removal of the FIRST
    list-order occurrence of an intersection. The index (isect →
    ascending positions) makes removal/membership O(1) amortized while
    preserving exact list order — the reference's linear scans are
    O(K²) on large polygons (SURVEY.md §4.1 "quadratic warts").

    Items are ``(isect, parent, winding)`` tuples.
    """

    def __init__(self, items: list[tuple]):
        self.slots: list[tuple | None] = list(items)
        self.pos: dict[int, list[int]] = {}
        for p, it in enumerate(items):
            self.pos.setdefault(it[0], []).append(p)
        self.live = len(items)

    def push(self, item: tuple) -> None:
        self.pos.setdefault(item[0], []).append(len(self.slots))
        self.slots.append(item)
        self.live += 1

    def remove_first(self, isect: int) -> None:
        lst = self.pos.get(isect)
        if lst:
            p = lst.pop(0)
            self.slots[p] = None
            self.live -= 1

    def pop(self) -> tuple:
        while True:
            it = self.slots.pop()
            if it is not None:
                self.pos[it[0]].pop()  # its position is the max
                self.live -= 1
                return it

    def __bool__(self) -> bool:
        return self.live > 0


def _determine_parents(out: list[DecomposedRing]) -> None:
    """Assign parents to rings still at -1 (reference src/index.ts:645-694).

    Reproduces the verified quirk: the candidate loop keeps overwriting
    ``parent`` for every containing ring, so the LAST (highest-index)
    containing ring wins — the area comparison in the reference is
    dead code (const Infinity bound).

    For large outputs the containment tests vectorize per candidate
    ring (all orphan probe points at once); ``points_in_ring`` is
    semantically identical to the scalar kernel.
    """
    orphans = [i for i, f in enumerate(out) if f.parent == -1]
    if len(orphans) <= 1:
        return
    if len(orphans) * len(out) > 256:
        from .kernels import points_in_ring as _vec_pip

        px = np.array([out[i].ring[0][0] for i in orphans])
        py = np.array([out[i].ring[0][1] for i in orphans])
        parents = np.full(len(orphans), -1, np.int64)
        self_row = np.asarray(orphans)
        for j, cand in enumerate(out):
            hit = _vec_pip(px, py, cand.ring)
            hit &= self_row != j
            parents[hit] = j  # later j overwrites: last-containing-wins
        for k, i in enumerate(orphans):
            out[i].parent = int(parents[k])
        return
    for i in orphans:
        parent = -1
        first_vtx = out[i].ring[0]
        for j, cand in enumerate(out):
            if i == j:
                continue
            if point_in_ring(first_vtx, cand.ring, ignore_boundary=True):
                parent = j
        out[i].parent = parent


def _rl_runs(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Concatenated [arange(s, s+l)] runs, vectorized."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, np.int64)
    step = np.ones(total, np.int64)
    pos = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
    step[0] = starts[0]
    if len(lens) > 1:
        step[pos[1:]] = starts[1:] - (starts[:-1] + lens[:-1] - 1)
    return np.cumsum(step)


def determine_parents_batch(outs: list[list[DecomposedRing]]) -> None:
    """Fused parent determination + net winding for MANY polygons'
    outputs: every (orphan, candidate-ring) containment test of the
    whole block runs in ONE vectorized pass over a flat edge table
    (same per-element formulas as kernels.points_in_ring, same
    last-containing-wins overwrite, same single-orphan early-out) —
    output identical to per-polygon ``_determine_parents`` +
    ``_set_net_winding`` (reference src/index.ts:645-694)."""
    work: list[tuple[int, list[int]]] = []
    for p, out in enumerate(outs):
        orphans = [i for i, f in enumerate(out) if f.parent == -1]
        if len(orphans) > 1:
            work.append((p, orphans))
    if work:
        ring_arrays: list[np.ndarray] = []
        poly_R = np.empty(len(work), np.int64)
        for k, (p, _) in enumerate(work):
            poly_R[k] = len(outs[p])
            for f in outs[p]:
                r = f.ring
                if r[0][0] == r[-1][0] and r[0][1] == r[-1][1]:
                    r = r[:-1]
                ring_arrays.append(np.asarray(r, np.float64))
        elen = np.fromiter((len(r) for r in ring_arrays), np.int64, len(ring_arrays))
        flat = np.concatenate(ring_arrays)
        estart = np.concatenate([[0], np.cumsum(elen)[:-1]]).astype(np.int64)
        xi = flat[:, 0]
        yi = flat[:, 1]
        prev = np.arange(len(flat), dtype=np.int64) - 1
        nz = elen > 0
        prev[estart[nz]] = (estart + elen - 1)[nz]
        xj = flat[prev, 0]
        yj = flat[prev, 1]

        poly_ring_start = np.concatenate([[0], np.cumsum(poly_R)[:-1]]).astype(np.int64)
        probe_x, probe_y, probe_k, probe_local = [], [], [], []
        for k, (p, orphans) in enumerate(work):
            for i in orphans:
                probe_x.append(float(outs[p][i].ring[0][0]))
                probe_y.append(float(outs[p][i].ring[0][1]))
                probe_k.append(k)
                probe_local.append(i)
        probe_x = np.asarray(probe_x)
        probe_y = np.asarray(probe_y)
        probe_k = np.asarray(probe_k, np.int64)
        probe_local = np.asarray(probe_local, np.int64)

        Rs = poly_R[probe_k]
        pair_ring = _rl_runs(poly_ring_start[probe_k], Rs)
        pair_probe = np.repeat(np.arange(len(probe_x), dtype=np.int64), Rs)
        ring_local = pair_ring - poly_ring_start[probe_k][pair_probe]

        plen = elen[pair_ring]
        eg = _rl_runs(estart[pair_ring], plen)
        pe = np.repeat(np.arange(len(pair_ring), dtype=np.int64), plen)
        px = probe_x[pair_probe][pe]
        py = probe_y[pair_probe][pe]
        gxi = xi[eg]
        gyi = yi[eg]
        gxj = xj[eg]
        gyj = yj[eg]
        with np.errstate(divide="ignore", invalid="ignore"):
            cross = ((gyi > py) != (gyj > py)) & (
                px < (gxj - gxi) * (py - gyi) / (gyj - gyi) + gxi
            )
            on = (
                (py * (gxi - gxj) + gyi * (gxj - px) + gyj * (px - gxi) == 0)
                & ((gxi - px) * (gxj - px) <= 0)
                & ((gyi - py) * (gyj - py) <= 0)
            )
        counts = np.bincount(pe, weights=cross, minlength=len(pair_ring)).astype(np.int64)
        on_any = np.bincount(pe, weights=on, minlength=len(pair_ring)) > 0
        inside = (counts & 1).astype(bool) & ~on_any & (ring_local != probe_local[pair_probe])

        parent = np.full(len(probe_x), -1, np.int64)
        sel = np.flatnonzero(inside)
        if len(sel):
            np.maximum.at(parent, pair_probe[sel], ring_local[sel])
        for m in range(len(probe_x)):
            p, _ = work[int(probe_k[m])]
            outs[p][int(probe_local[m])].parent = int(parent[m])
    for out in outs:
        _set_net_winding(out)


def _set_net_winding(out: list[DecomposedRing]) -> None:
    """Iterative topological pass (reference src/index.ts:696-720)."""
    children: dict[int, list[int]] = {}
    for i, f in enumerate(out):
        children.setdefault(f.parent, []).append(i)
    # process roots in feature order, children depth-first like the reference
    roots = children.get(-1, [])
    stack = []
    for r in reversed(roots):
        stack.append((r, 0))
    while stack:
        i, parent_net = stack.pop()
        net = parent_net + out[i].winding
        out[i].net_winding = net
        for c in reversed(children.get(i, [])):
            stack.append((c, net))


def decompose(
    coordinates, _isect_rows=None, _defer_parents=False
) -> list[DecomposedRing]:
    """Decompose one polygon (``coordinates`` = GeoJSON ``Polygon``
    coordinates: list of rings of [x, y]) into simple rings.

    ``_isect_rows``: optional precomputed ``self_intersections`` output
    for these (closed) rings — the batch stage computes one vectorized
    gpsi pass for a whole block of polygons (gpsi.self_intersections_batch)
    and feeds each polygon's slice here.

    ``_defer_parents``: skip parent/net-winding assignment — the batch
    stage runs ONE fused pass for a whole block of polygons
    (``determine_parents_batch``), identical output."""
    rings = _close_rings(coordinates)
    num_rings = len(rings)

    # duplicate-vertex guard (closing vertices excluded)
    verts = np.concatenate([r[:-1] for r in rings])
    numvertices = len(verts)
    # set-of-tuples semantics (−0.0 == 0.0, NaN distinct) as before,
    # via C-level tolist instead of per-row numpy scalar boxing
    seen = set(map(tuple, verts.tolist()))
    if len(seen) != numvertices:
        raise DuplicateVertexError(
            "polygon may not have duplicate vertices "
            "(except the first/last vertex of each ring)"
        )

    _debug("Processing input")
    isect_rows = _isect_rows if _isect_rows is not None else self_intersections(rings)
    n_self = len(isect_rows["ix"])
    _debug(f"Computing self-intersections: {n_self} rows")

    if n_self == 0:
        out = [
            DecomposedRing(ring=r, index=None, parent=-1, winding=winding_of_ring(r))
            for r in rings
        ]
        if not _defer_parents:
            _determine_parents(out)
            _set_net_winding(out)
        return out

    # ---- build the intersection table ----
    # SoA layout of the reference's PseudoVtx / Isect objects
    # (src/index.ts:542,580): the same fields in parallel arrays, built
    # in the same order with C-level bulk ops. A ringAndEdge pair is
    # encoded as the single int ring * 2**32 + edge (only ever compared
    # for equality, exactly like the reference's [ring, edge] arrays).
    SHIFT = 1 << 32
    m_list = [len(r) - 1 for r in rings]

    ico: list = []  # coord tuples; [0:numvertices] are the ring vertices
    ire1: list = []  # encoded ringAndEdge1
    ire2: list = []  # encoded ringAndEdge2
    pts_list: list[list] = []
    for i in range(num_rings):
        m = m_list[i]
        # one C-level boxing pass for the whole ring's coords
        pts = [tuple(p) for p in rings[i][:m].tolist()]
        pts_list.append(pts)
        base = i * SHIFT
        ico += pts
        ire1.append(base + m - 1)
        ire1.extend(range(base, base + m - 1))
        ire2.extend(range(base, base + m))

    r0 = np.asarray(isect_rows["ring0"], dtype=np.int64)
    e0 = np.asarray(isect_rows["edge0"], dtype=np.int64)
    f0 = np.asarray(isect_rows["frac0"], dtype=np.float64)
    r1 = np.asarray(isect_rows["ring1"], dtype=np.int64)
    e1 = np.asarray(isect_rows["edge1"], dtype=np.int64)
    uq = np.asarray(isect_rows["unique"], dtype=bool)
    xs = np.asarray(isect_rows["ix"], dtype=np.float64)
    ys = np.asarray(isect_rows["iy"], dtype=np.float64)

    enc0 = r0 * SHIFT + e0
    enc1 = r1 * SHIFT + e1
    uqi = np.flatnonzero(uq)
    ico += list(zip(xs[uqi].tolist(), ys[uqi].tolist()))
    ire1 += enc0[uqi].tolist()
    ire2 += enc1[uqi].tolist()
    niso = len(ico)
    iw1 = [False] * numvertices + [True] * (niso - numvertices)
    iw2 = [True] * niso
    inx1: list = [None] * niso
    inx2: list = [None] * niso

    # exact-coordinate index: the reference's rbush point query is a
    # pure float-equality lookup (src/index.ts:203-215) -> dict;
    # duplicate coords resolve to the LAST entry, as before
    d = dict(zip(ico, range(niso)))

    # ---- linking: one pass over the per-ring pseudo-vertex chains.
    # A ring's chain is its edges in order, each edge's pseudo-vertices
    # sorted by param with the edge-end vertex LAST -- and FIRST among
    # exact param-1.0 ties (kind 0 sorts before kind 1 under the stable
    # lexsort), reproducing the reference's insert-then-stable-sort
    # order -- wrapping circularly at the ring end. The chain successor
    # IS the original pass 1's "next isect along the edge", and
    # assigning in chain order replays pass 2's write order exactly.
    t_ring = np.repeat(np.arange(num_rings, dtype=np.int64), m_list)
    t_edge = np.concatenate([np.arange(m, dtype=np.int64) for m in m_list])

    c_ring = np.concatenate([r0, t_ring])
    c_edge = np.concatenate([e0, t_edge])
    c_param = np.concatenate([f0, np.ones(numvertices)])
    c_kind = np.concatenate(
        [np.ones(n_self, dtype=np.int8), np.zeros(numvertices, dtype=np.int8)]
    )
    order = np.lexsort((c_kind, c_param, c_edge, c_ring)).tolist()

    # chain coords + incoming ringAndEdge, aligned with the combined
    # rows: intersections (all gpsi rows, row order) then terminals in
    # (ring, edge) order -- the terminal of edge j is vertex (j+1) % m
    c_coord = list(zip(xs.tolist(), ys.tolist()))
    for pts in pts_list:
        c_coord += pts[1:]
        c_coord.append(pts[0])
    c_rein = enc0.tolist() + ire2[:numvertices]

    seg_counts = (
        np.bincount(r0, minlength=num_rings) + np.asarray(m_list, dtype=np.int64)
    ).tolist()
    pos = 0
    for cnt in seg_counts:
        seg = order[pos : pos + cnt]
        pos += cnt
        cs = [c_coord[t] for t in seg]
        res = [c_rein[t] for t in seg]
        nxt_cs = cs[1:]
        nxt_cs.append(cs[0])
        for cc, ri, nc in zip(cs, res, nxt_cs):
            l = d[cc]
            nv = d[nc]
            if l < numvertices:
                inx2[l] = nv
            elif ire1[l] == ri:
                inx1[l] = nv
            else:
                inx2[l] = nv

    # ---- queue seeding (reference src/index.ts:283-330) ----
    # "first isect whose nxt1/nxt2 points here", via one reverse sweep
    # (equivalent to the reference's first-match forward scan)
    rev: dict = {}
    for k in range(niso - 1, -1, -1):
        n1 = inx1[k]
        if n1 is not None:
            rev[n1] = k
        n2 = inx2[k]
        if n2 is not None:
            rev[n2] = k

    queue: list[tuple] = []
    vbase = 0
    for i in range(num_rings):
        pts = pts_list[i]
        m = m_list[i]
        left = 0
        lx = pts[0][0]
        for j in range(1, m):
            xj = pts[j][0]
            if xj < lx:  # strict: first minimum wins, like the scan
                lx = xj
                left = j
        left += vbase
        vbase += m
        after = inx2[left]
        before = rev.get(left, 0)
        winding = 1 if is_convex(ico[before], ico[left], ico[after], True) else -1
        queue.append((left, -1, winding))

    # descending JS-string order so the left-most pops first (a
    # single-ring polygon seeds one entry — sorting a singleton is a
    # no-op, so skipping it never changes output)
    if len(queue) > 1:
        queue.sort(key=lambda q: js_coord_str(ico[q[0]]), reverse=True)
    queue = _WalkQueue(queue)

    # ---- walk (reference src/index.ts:332-519) ----
    out: list[DecomposedRing] = []
    while queue:
        start, cur_parent, cur_winding = queue.pop()
        cur_ring_idx = len(out)
        start_coord = ico[start]
        coords = [start_coord]

        cur = start
        if iw1[start]:
            walking = ire1[start]
            nxt = inx1[start]
        else:
            walking = ire2[start]
            nxt = inx2[start]
        if nxt is None:
            raise RuntimeError("next intersection not defined")

        qpush = queue.push
        qremove = queue.remove_first
        while ico[nxt] != start_coord:
            coords.append(ico[nxt])
            qremove(nxt)
            if walking == ire1[nxt]:
                walking = ire2[nxt]
                iw2[nxt] = False
                if iw1[nxt]:
                    nxt_along = inx2[nxt]
                    if nxt_along is None:
                        raise RuntimeError("next intersection not defined")
                    if is_convex(
                        ico[cur], ico[nxt], ico[nxt_along], cur_winding == 1
                    ):
                        qpush((nxt, cur_parent, -cur_winding))
                    else:
                        qpush((nxt, cur_ring_idx, cur_winding))
                cur = nxt
                nxt = inx2[nxt]
            else:
                walking = ire1[nxt]
                iw1[nxt] = False
                if iw2[nxt]:
                    nxt_along = inx1[nxt]
                    if nxt_along is None:
                        raise RuntimeError("next intersection not defined")
                    if is_convex(
                        ico[cur], ico[nxt], ico[nxt_along], cur_winding == 1
                    ):
                        qpush((nxt, cur_parent, -cur_winding))
                    else:
                        qpush((nxt, cur_ring_idx, cur_winding))
                cur = nxt
                nxt = inx1[nxt]
            if nxt is None:
                raise RuntimeError("next intersection not defined")

        coords.append(ico[nxt])
        out.append(
            DecomposedRing(
                ring=np.asarray(coords, dtype=np.float64),
                index=cur_ring_idx,
                parent=cur_parent,
                winding=cur_winding,
            )
        )

    if not _defer_parents:
        _determine_parents(out)
        _set_net_winding(out)
    _debug(f"# Total of {len(out)} rings")
    return out

"""Property-based invariants of the decompose operator (SURVEY.md
§5.2.2), hypothesis-driven over the deterministic polygon families
with random placements/jitter that keep crossings proper.

Invariants (no golden needed):
- total edge length conserved (every input edge covered exactly once —
  reference README.md:59);
- every output ring is simple (re-decompose hits the fast path);
- parent graph is acyclic and parents precede validity;
- net_winding(child) == net_winding(parent) + winding(child);
- decompose(decompose(x)) is a fixed point per ring.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from simplepolygon_ray.geom.decompose import decompose
from simplepolygon_ray.geom.families import crossed_rings, nested, star, zigzag


def _total_len(rings):
    return sum(
        float(np.hypot(*np.diff(np.asarray(r, float)[:, :2], axis=0).T).sum())
        for r in rings
    )


def _check_invariants(coords):
    out = decompose(coords)
    assert len(out) >= 1
    # edge length conservation
    in_len = _total_len(coords)
    out_len = sum(float(np.hypot(*np.diff(r.ring, axis=0).T).sum()) for r in out)
    assert np.isclose(in_len, out_len, rtol=1e-9), (in_len, out_len)
    for i, r in enumerate(out):
        # output rings closed and simple
        assert (r.ring[0] == r.ring[-1]).all()
        again = decompose([r.ring.tolist()])
        assert len(again) == 1 and again[0].index is None
        # fixed point: the ring passes through unchanged
        assert (again[0].ring == r.ring).all()
        # parent sanity + acyclic
        assert -1 <= r.parent < len(out) and r.parent != i
        seen = set()
        j = i
        while out[j].parent != -1:
            assert j not in seen
            seen.add(j)
            j = out[j].parent
        # net winding consistency
        if r.parent == -1:
            assert r.net_winding == r.winding
        else:
            assert r.net_winding == out[r.parent].net_winding + r.winding


def _place(rings, cx, cy, scale, jitter_seed):
    rng = np.random.default_rng(jitter_seed)
    out = []
    for ring in rings:
        arr = np.asarray(ring, float)
        open_part = arr[:-1]
        jit = rng.uniform(-1e-3, 1e-3, open_part.shape)
        placed = (open_part + jit) * scale + [cx, cy]
        out.append(np.vstack([placed, placed[:1]]).tolist())
    return out


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(5, 61),
    cx=st.floats(-170, 170),
    cy=st.floats(-80, 80),
    scale=st.floats(0.01, 10),
    seed=st.integers(0, 2**31),
)
def test_star_invariants(n, cx, cy, scale, seed):
    _check_invariants(_place(star(n), cx, cy, scale, seed))


@settings(max_examples=30, deadline=None)
@given(
    m=st.integers(1, 40),
    cx=st.floats(-100, 100),
    cy=st.floats(-50, 50),
    scale=st.floats(0.05, 5),
    seed=st.integers(0, 2**31),
)
def test_zigzag_invariants(m, cx, cy, scale, seed):
    _check_invariants(_place(zigzag(m), cx, cy, scale, seed))


@settings(max_examples=20, deadline=None)
@given(
    cx=st.floats(-100, 100),
    cy=st.floats(-50, 50),
    scale=st.floats(0.05, 5),
    seed=st.integers(0, 2**31),
)
def test_crossed_rings_invariants(cx, cy, scale, seed):
    _check_invariants(_place(crossed_rings(), cx, cy, scale, seed))


@settings(max_examples=20, deadline=None)
@given(
    d=st.integers(1, 6),
    cx=st.floats(-100, 100),
    cy=st.floats(-50, 50),
    scale=st.floats(0.05, 5),
    seed=st.integers(0, 2**31),
)
def test_nested_invariants(d, cx, cy, scale, seed):
    _check_invariants(_place(nested(d), cx, cy, scale, seed))


# ------------------------------------------------------------------
# round-2 vectorized kernels: batched == scalar, property-driven
# ------------------------------------------------------------------


def _random_simple_ring(rng, cx, cy, scale):
    """Random star-convex closed ring (guaranteed simple)."""
    n = int(rng.integers(4, 24))
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    rad = rng.uniform(0.3, 1.0, n)
    pts = np.stack([cx + rad * np.cos(ang) * scale, cy + rad * np.sin(ang) * scale], 1)
    return np.vstack([pts, pts[:1]])


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**31),
    cx=st.floats(-160, 160),
    cy=st.floats(-70, 70),
    scale=st.floats(0.05, 20),
    level=st.integers(3, 10),
)
def test_cover_rings_flat_matches_scalar(seed, cx, cy, scale, level):
    from simplepolygon_ray.cells.grid import cover_ring, cover_rings_flat

    rng = np.random.default_rng(seed)
    rings = [
        _random_simple_ring(rng, cx + dx, cy, scale) for dx in (0.0, scale, -scale)
    ]
    coords = np.concatenate(rings)
    offs = np.concatenate([[0], np.cumsum([len(r) for r in rings])]).astype(np.int64)
    rr, cc = cover_rings_flat(coords, offs, level)
    for k, ring in enumerate(rings):
        exp = cover_ring(ring, level)
        got = cc[rr == k]
        assert len(got) == len(exp) and (got == exp).all(), (k, level)


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**31),
    cx=st.floats(-160, 160),
    cy=st.floats(-70, 70),
    scale=st.floats(0.05, 20),
)
def test_vectorized_clip_matches_scalar_random(seed, cx, cy, scale):
    from simplepolygon_ray.stages.tiles import (
        _clip_tiles_vec,
        sutherland_hodgman_bbox,
    )

    rng = np.random.default_rng(seed)
    ring = _random_simple_ring(rng, cx, cy, scale)
    open_ring = ring[:-1]
    T = 6
    x0 = rng.uniform(cx - scale, cx + scale, T)
    y0 = rng.uniform(cy - scale, cy + scale, T)
    x1 = x0 + rng.uniform(0.1, 1.5, T) * scale
    y1 = y0 + rng.uniform(0.1, 1.5, T) * scale
    P = np.broadcast_to(open_ring, (T, len(open_ring), 2)).copy()
    cnt = np.full(T, len(open_ring), np.int64)
    cP, ccnt = _clip_tiles_vec(P, cnt, x0, y0, x1, y1)
    for t in range(T):
        exp = sutherland_hodgman_bbox(ring, x0[t], y0[t], x1[t], y1[t])
        if len(exp) < 4:
            assert ccnt[t] < 3, t
            continue
        got_open = cP[t, : ccnt[t]]
        assert ccnt[t] == len(exp) - 1, t
        assert (got_open == exp[:-1]).all(), t  # float64 bit-exact


@settings(max_examples=25, deadline=None)
@given(texts=st.lists(st.text(max_size=200), min_size=1, max_size=12))
def test_hash_kernels_property(texts):
    from simplepolygon_ray.text._hash import fnv64_batch
    from simplepolygon_ray.text.dedup import simhash64_many

    def scalar_fnv(data: bytes) -> int:
        h = 0xCBF29CE484222325
        for ch in data:
            h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h

    enc = [t.encode() for t in texts]
    assert [int(v) for v in fnv64_batch(enc)] == [scalar_fnv(b) for b in enc]

    def scalar_simhash(text):
        words = text.lower().split()
        if not words:
            return 0
        acc = np.zeros(64, np.int64)
        for w in words:
            h = np.uint64(scalar_fnv(w.encode()))
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits == 1, 1, -1)
        bits = (acc > 0).astype(np.uint64)
        return int((bits << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))

    assert [int(v) for v in simhash64_many(texts)] == [scalar_simhash(t) for t in texts]


@given(
    st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 8), st.integers(0, 6)),
        min_size=1,
        max_size=200,
    )
)
@settings(max_examples=40, deadline=None)
def test_segmented_topk_property(rows):
    """Vectorized segmented top-k == per-segment sorted head(k), for
    arbitrary (segment, neighbor, dist) multisets with heavy ties."""
    from simplepolygon_ray.stages.knn import _segmented_topk

    seg = np.array([r[0] for r in rows])
    nid = np.array([f"n{r[1]}" for r in rows])
    dist = np.array([float(r[2]) for r in rows])
    k = 3
    sel, rank = _segmented_topk(seg, nid, dist, k)
    got: dict = {}
    for s, r in zip(sel, rank):
        got.setdefault(int(seg[s]), []).append((dist[s], nid[s], int(r)))
    for s in np.unique(seg):
        want = sorted(
            [(dist[i], nid[i]) for i in range(len(seg)) if seg[i] == s]
        )[:k]
        assert got[int(s)] == [(d, x, i) for i, (d, x) in enumerate(want)]


@given(
    st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=30), min_size=2, max_size=40
    )
)
@settings(max_examples=40, deadline=None)
def test_pairs_within_property(texts):
    """Inverted-index pair finder == nested-loop jaccard for arbitrary
    short texts (incl. empty docs and exact duplicates)."""
    from simplepolygon_ray.text.dedup import _pairs_within, jaccard_ngrams

    ids = np.arange(len(texts), dtype=np.int64)
    a, b, jac = _pairs_within(ids, texts, 0.4)
    got = {(int(x), int(y)): j for x, y, j in zip(a, b, jac)}
    want = {}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            v = jaccard_ngrams(texts[i], texts[j])
            if v >= 0.4:
                want[(i, j)] = v
    assert got == want


@given(
    st.lists(st.text(alphabet="xy z", min_size=0, max_size=25), min_size=1, max_size=30),
    st.integers(0, 2**31),
)
@settings(max_examples=40, deadline=None)
def test_jaccard_rows_vec_property(texts, seed):
    from simplepolygon_ray.text.dedup import _jaccard_rows_vec, jaccard_ngrams

    rng = np.random.default_rng(seed)
    other = [texts[int(rng.integers(0, len(texts)))] for _ in texts]
    got = _jaccard_rows_vec(texts, other)
    want = [jaccard_ngrams(a, b) for a, b in zip(texts, other)]
    assert got.tolist() == want


@given(st.lists(st.integers(0, 2**16 - 1), min_size=1, max_size=200),
       st.lists(st.integers(0, 2**16 - 1), min_size=1, max_size=200))
@settings(max_examples=60, deadline=None)
def test_morton_interleave_property(xs, ys):
    """Vectorized _part1by1 interleave == per-bit scalar reference."""
    from simplepolygon_ray.relational.queries import _part1by1

    n = min(len(xs), len(ys))
    x = np.asarray(xs[:n], np.uint64)
    y = np.asarray(ys[:n], np.uint64)
    got = (_part1by1(x) | (_part1by1(y) << np.uint64(1))).astype(np.int64)
    for xi, yi, mi in zip(xs[:n], ys[:n], got):
        want = 0
        for b in range(16):
            want |= ((xi >> b) & 1) << (2 * b)
            want |= ((yi >> b) & 1) << (2 * b + 1)
        assert int(mi) == want


def test_distinct_user_day_packing_guard():
    """45-bit packing recovers (user, day) exactly and guards range."""
    import pyarrow as pa
    import pytest

    from simplepolygon_ray.relational.queries import _DAY_US, _distinct_user_day

    ts = pa.array(
        (np.array([0, 1, 1, 19723], np.int64) * _DAY_US + 123).view("datetime64[us]")
    )
    t = pa.table({"user_id": pa.array([7, 7, 7, (1 << 44)], type=pa.int64()), "ts": ts})
    out = _distinct_user_day(t)
    got = sorted(zip(out["user_id"].to_pylist(), out["day"].to_pylist()))
    assert got == [(7, 0), (7, 1), ((1 << 44), 19723)]

    bad = pa.table(
        {"user_id": pa.array([1 << 45], type=pa.int64()), "ts": ts.slice(0, 1)}
    )
    with pytest.raises(ValueError):
        _distinct_user_day(bad)


@given(st.lists(st.integers(0, 500), min_size=1, max_size=400))
@settings(max_examples=30, deadline=None)
def test_cms_never_underestimates(user_ids):
    """Count-Min invariant: est(key) >= true count for every key."""
    from collections import Counter

    from simplepolygon_ray.relational.queries import _CMS_D, _CMS_W, _cms_cols

    u = np.asarray(user_ids, np.uint64)
    regs = np.zeros((_CMS_D, _CMS_W), np.int64)
    for d in range(_CMS_D):
        np.add.at(regs[d], _cms_cols(u, d), 1)
    true = Counter(user_ids)
    keys = np.asarray(sorted(true), np.uint64)
    est = np.min([regs[d, _cms_cols(keys, d)] for d in range(_CMS_D)], axis=0)
    for k, e in zip(keys.tolist(), est.tolist()):
        assert e >= true[k]

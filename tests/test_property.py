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

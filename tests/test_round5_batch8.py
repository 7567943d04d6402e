"""Kernel property tests for the eighth round-5 batch: the exact
integer Gini numerator (tie-order invariance) and the cross-multiplied
above-average predicate."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st


def _gini_num_naive(x):
    xs = sorted(x)
    n = len(xs)
    return 2 * sum((i + 1) * v for i, v in enumerate(xs)) - (n + 1) * sum(xs)


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(-500, 500)),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=60, deadline=None)
def test_gini_bucket_kernel_matches_naive_and_is_order_invariant(rows):
    from simplepolygon_ray.relational.queries import q_acctbal_gini_by_nation  # noqa: F401

    # replicate the per-bucket kernel body on a shuffled frame
    df = pd.DataFrame(
        {
            "c_nationkey": [r[0] for r in rows],
            "c_acctbal": [r[1] / 100.0 for r in rows],
        }
    ).sample(frac=1.0, random_state=7)
    v = np.rint(df["c_acctbal"].to_numpy() * 100.0).astype(np.int64)
    natk = df["c_nationkey"].to_numpy(np.int64)
    order = np.lexsort((v, natk))
    natk, v = natk[order], v[order]
    new = np.r_[True, natk[1:] != natk[:-1]]
    starts = np.flatnonzero(new)
    n_per = np.diff(np.r_[starts, len(natk)]).astype(np.int64)
    i = np.arange(len(natk), dtype=np.int64) - np.repeat(starts, n_per) + 1
    sum_ix = np.add.reduceat(i * v, starts)
    sum_x = np.add.reduceat(v, starts)
    got = dict(zip(natk[starts].tolist(), (2 * sum_ix - (n_per + 1) * sum_x).tolist()))
    want = {
        k: _gini_num_naive([r[1] for r in rows if r[0] == k])
        for k in {r[0] for r in rows}
    }
    assert got == want


@given(st.lists(st.integers(-10_000, 10_000), min_size=1, max_size=100))
@settings(max_examples=60, deadline=None)
def test_cross_multiplied_above_avg_equals_float_filter(cents):
    x = np.array(cents, np.int64)
    pos = x[x > 0]
    if len(pos) == 0:
        return
    keep = x * len(pos) > pos.sum()
    # exact rational comparison, no float avg anywhere
    from fractions import Fraction

    avg = Fraction(int(pos.sum()), len(pos))
    assert keep.tolist() == [Fraction(int(v)) > avg for v in x]


def test_centroid_batch_exact_and_orientation_invariant():
    import pyarrow as pa

    from simplepolygon_ray.pipelines.catalog import _centroid_batch

    # unit square at (2,3)..(3,4): centroid (2.5, 3.5) -> floor e5 ints
    sq = [[2.0, 3.0], [3.0, 3.0], [3.0, 4.0], [2.0, 4.0], [2.0, 3.0]]
    sq_cw = sq[::-1]
    # triangle (0,0)(3,0)(0,3): centroid (1,1); area2 = 9 -> 9e10 at e5
    tri = [[0.0, 0.0], [3.0, 0.0], [0.0, 3.0], [0.0, 0.0]]
    t = pa.table(
        {
            "geom_id": pa.array(["a", "b", "c"], pa.string()),
            "ring_seq": pa.array([0, 0, 0], pa.int32()),
            "ring": pa.array([sq, sq_cw, tri], pa.list_(pa.list_(pa.float64(), 2))),
        }
    )
    out = _centroid_batch(t).to_pydict()
    assert out["abs_area2_e10"] == [2 * 10**10, 2 * 10**10, 9 * 10**10]
    assert out["cx_e5"][0] == out["cx_e5"][1] == 250000
    assert out["cy_e5"][0] == out["cy_e5"][1] == 350000
    assert (out["cx_e5"][2], out["cy_e5"][2]) == (100000, 100000)


def test_centroid_batch_wide_ring_numerator_exceeds_int64():
    """A ring wide enough that the moment numerator overflows int64
    must still produce the exact quotient (the object-dtype fold)."""
    import pyarrow as pa

    from simplepolygon_ray.pipelines.catalog import _centroid_batch

    # 300-degree-wide sliver: E = 3e7 at e5; numerator ~ E^3 >> 2^63
    w = 300.0
    ring = [[0.0, 0.0], [w, 0.0], [w, 1.0], [0.0, 1.0], [0.0, 0.0]]
    t = pa.table(
        {
            "geom_id": pa.array(["w"], pa.string()),
            "ring_seq": pa.array([0], pa.int32()),
            "ring": pa.array([ring], pa.list_(pa.list_(pa.float64(), 2))),
        }
    )
    out = _centroid_batch(t).to_pydict()
    E = 30_000_000
    assert out["abs_area2_e10"] == [2 * E * 100_000]
    assert out["cx_e5"] == [E // 2]
    assert out["cy_e5"] == [100_000 // 2]


def test_convexity_batch_census():
    import pyarrow as pa

    from simplepolygon_ray.pipelines.catalog import _convexity_batch

    sq = [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]]  # CCW convex
    sq_cw = sq[::-1]  # CW convex
    # L-shape: one reflex vertex -> not convex (CCW)
    ell = [
        [0.0, 0.0], [2.0, 0.0], [2.0, 1.0], [1.0, 1.0],
        [1.0, 2.0], [0.0, 2.0], [0.0, 0.0],
    ]
    # square with a collinear midpoint on the bottom edge: convex with
    # one straight vertex
    sqc = [[0.0, 0.0], [1.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0], [0.0, 0.0]]
    t = pa.table(
        {
            "geom_id": pa.array(["a", "b", "c", "d"], pa.string()),
            "ring_seq": pa.array([0, 0, 0, 0], pa.int32()),
            "ring": pa.array(
                [sq, sq_cw, ell, sqc], pa.list_(pa.list_(pa.float64(), 2))
            ),
        }
    )
    out = _convexity_batch(t).to_pydict()
    assert out["n_left"] == [4, 0, 5, 4]
    assert out["n_right"] == [0, 4, 1, 0]
    assert out["n_straight"] == [0, 0, 0, 1]
    assert out["is_convex"] == [1, 1, 0, 1]


def test_cover_area_is_superset_of_exact_area():
    """The level-8 covering contains the ring, so its doubled area must
    dominate the exact |shoelace| for every ring."""
    import pyarrow as pa

    from simplepolygon_ray.pipelines.catalog import _cover_area_batch

    rings = [
        [[0.0, 0.0], [3.0, 0.0], [3.0, 2.0], [0.0, 2.0], [0.0, 0.0]],
        [[10.0, 10.0], [10.4, 10.0], [10.4, 10.9], [10.0, 10.9], [10.0, 10.0]],
        [[-5.0, -5.0], [-4.0, -5.0], [-4.5, -4.0], [-5.0, -5.0]],
    ]
    t = pa.table(
        {
            "geom_id": pa.array(["a", "b", "c"], pa.string()),
            "ring_seq": pa.array([0, 0, 0], pa.int32()),
            "ring": pa.array(rings, pa.list_(pa.list_(pa.float64(), 2))),
        }
    )
    out = _cover_area_batch(t).to_pydict()
    for nc, ca, aa in zip(out["n_cells"], out["cover_area2_e10"], out["abs_area2_e10"]):
        assert nc > 0 and ca >= aa
    # exact shoelace check for the first rectangle: 2*3*2 deg^2 at e10
    assert out["abs_area2_e10"][0] == 12 * 10**10


@given(
    st.lists(st.integers(-50, 50), min_size=1, max_size=40),
)
@settings(max_examples=80, deadline=None)
def test_clamped_balance_identity_matches_sequential_loop(xs):
    """b_n = S_n - min(0, min_k S_k) equals the sequential clamp loop,
    and the strict-decrease-below-zero count equals the number of
    steps where the loop actually clamped to a new floor."""
    x = np.array(xs, np.int64)
    s = np.cumsum(x)
    mn = np.minimum.accumulate(s)
    bal = s[-1] - min(0, mn.min())
    b = 0
    clamps = 0
    for v in xs:
        b = b + v
        if b < 0:
            clamps += 1
            b = 0
    assert bal == b
    prev = np.r_[0, mn[:-1]]
    dec = (mn < 0) & (np.r_[True, mn[1:] < prev[1:]])
    assert int(dec.sum()) == clamps


@given(
    st.lists(st.integers(0, 2000), min_size=1, max_size=30),
    st.integers(5, 50),
)
@settings(max_examples=60, deadline=None)
def test_interval_union_sweep_matches_naive(starts, width):
    """+1/-1 sweep coverage equals the brute-force union of
    [t, t+width) intervals."""
    t = np.sort(np.array(starts, np.int64))
    pts = np.r_[t, t + width]
    d = np.r_[np.ones(len(t), np.int64), -np.ones(len(t), np.int64)]
    order = np.lexsort((-d, pts))
    pts, d = pts[order], d[order]
    depth = np.cumsum(d)
    gap = np.r_[np.diff(pts), 0]
    got = int(np.where(depth > 0, gap, 0).sum())
    covered = set()
    for a in starts:
        covered.update(range(a, a + width))
    assert got == len(covered)

"""Property tests for the round-4 kernels: pair dedupe, hot-bucket run
splitting, running-total segmentation, rolling-window explode."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from simplepolygon_ray.text.dedup import _dedupe_pair_rows, _split_runs_by_cap


@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 20)), min_size=0, max_size=60
    )
)
def test_dedupe_pair_rows_first_occurrence(pairs):
    a = np.array([p[0] for p in pairs], np.int64)
    b = np.array([p[1] for p in pairs], np.int64)
    rows = _dedupe_pair_rows(a, b)
    got = list(zip(a[rows], b[rows]))
    # one row per distinct pair
    assert sorted(got) == sorted(set(pairs))
    # and it is the FIRST occurrence of that pair
    first = {}
    for i, p in enumerate(pairs):
        first.setdefault(p, i)
    assert sorted(rows.tolist()) == sorted(first.values())


@given(
    st.lists(st.tuples(st.integers(0, 50), st.integers(0, 3)), min_size=0, max_size=80),
    st.integers(1, 40),
)
def test_split_runs_by_cap_partition(items, cap):
    primary = np.array([p[0] for p in items], np.int64)
    secondary = np.array([p[1] for p in items], np.int64)
    runs = _split_runs_by_cap(primary, secondary, cap)
    flat = np.concatenate(runs) if runs else np.empty(0, np.int64)
    # every row appears exactly once across runs
    assert sorted(flat.tolist()) == list(range(len(items)))
    if len(items) <= cap:
        assert len(runs) == 1
    else:
        # each run holds exactly one secondary value, rows in primary order
        for r in runs:
            assert len(set(secondary[r])) <= 1
            assert (np.diff(primary[r]) >= 0).all()


@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 100), st.integers(-500, 500)),
        min_size=1,
        max_size=100,
        unique_by=lambda t: t[1],
    )
)
@settings(max_examples=50)
def test_running_total_segmented_cumsum(rows):
    """The lexsort + segmented-cumsum shape used by user_running_value
    equals a per-user Python running total."""
    uid = np.array([r[0] for r in rows], np.int64)
    eid = np.array([r[1] for r in rows], np.int64)
    val = np.array([r[2] for r in rows], np.int64)
    order = np.lexsort((eid, uid))
    su, sv = uid[order], val[order]
    cum = np.cumsum(sv)
    new = np.ones(len(su), bool)
    new[1:] = su[1:] != su[:-1]
    starts = np.flatnonzero(new)
    lens = np.diff(np.append(starts, len(su)))
    base = np.repeat(cum[starts] - sv[starts], lens)
    run = cum - base
    # brute force
    acc: dict[int, int] = {}
    expect = {}
    for u, e, v in sorted(rows, key=lambda r: (r[0], r[1])):
        acc[u] = acc.get(u, 0) + v
        expect[e] = acc[u]
    got = dict(zip(eid[order], run))
    assert got == expect


@given(
    st.lists(st.tuples(st.integers(0, 6), st.integers(0, 30)), min_size=0, max_size=80)
)
def test_wau_window_explode(pairs):
    """The packed ×7 window explode equals the brute-force trailing
    7-day membership: user u counts for window day w iff u was active
    on some day in [w-6, w]."""
    DAY_BITS = 18
    u = np.array([p[0] for p in pairs], np.int64)
    d = np.array([p[1] for p in pairs], np.int64)
    if len(u):
        k = np.unique((u << np.int64(DAY_BITS)) + d)
        kw = np.unique((k[:, None] + np.arange(7, dtype=np.int64)[None, :]).ravel())
        got = set(zip((kw >> DAY_BITS).tolist(), (kw & ((1 << DAY_BITS) - 1)).tolist()))
    else:
        got = set()
    expect = set()
    for uu, dd in pairs:
        for w in range(dd, dd + 7):
            expect.add((uu, w))
    assert got == expect

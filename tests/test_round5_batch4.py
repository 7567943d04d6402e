"""Kernel property tests for the fourth round-5 batch: the NTILE
split rule, the decimation keep rule's exact-int replay, and the
within-order pair emission reused by copurchase."""

import numpy as np
import pyarrow as pa
from hypothesis import given
from hypothesis import strategies as st

from simplepolygon_ray.relational.queries import _ntile_of_rn


@given(st.integers(1, 200), st.integers(1, 16))
def test_ntile_matches_sql_semantics(n, k):
    """SQL NTILE: sizes differ by at most 1, larger tiles first,
    tiles numbered 1..min(n, k), sequential over the sorted order."""
    tiles = _ntile_of_rn(np.arange(n, dtype=np.int64), n, k)
    assert tiles[0] == 1 and tiles[-1] == min(n, k)
    assert (np.diff(tiles) >= 0).all() and (np.diff(tiles) <= 1).all()
    sizes = np.bincount(tiles)[1:]
    assert sizes.max() - sizes.min() <= 1
    assert (np.sort(sizes)[::-1] == sizes).all()  # larger tiles first
    assert sizes.sum() == n


def test_ring_decimate_batch_matches_scalar():
    from simplepolygon_ray.pipelines.catalog import _DECIM_C, _ring_decimate_batch

    rng = np.random.RandomState(7)
    rings, gids, seqs = [], [], []
    for i in range(12):
        m = rng.randint(4, 24)
        ang = np.sort(rng.uniform(0, 2 * np.pi, m))
        r = rng.uniform(0.5, 2.0, m)
        pts = np.stack([r * np.cos(ang), r * np.sin(ang)], axis=1).round(5)
        ring = np.vstack([pts, pts[:1]])  # closed
        rings.append(ring.tolist())
        gids.append(f"g{i}")
        seqs.append(np.int32(0))
    t = pa.table(
        {
            "geom_id": pa.array(gids, pa.string()),
            "ring_seq": pa.array(seqs, pa.int32()),
            "ring": pa.array(rings, pa.list_(pa.list_(pa.float64(), 2))),
        }
    )
    out = _ring_decimate_batch(t).to_pydict()
    for i in range(12):
        pts = np.asarray(rings[i][:-1], np.float64)
        xi = np.floor(pts[:, 0] * 1e5).astype(np.int64)
        yi = np.floor(pts[:, 1] * 1e5).astype(np.int64)
        m = len(xi)
        area2 = sum(
            int(xi[j]) * int(yi[(j + 1) % m]) - int(xi[(j + 1) % m]) * int(yi[j])
            for j in range(m)
        )
        keep = []
        for j in range(m):
            p, nx = (j - 1) % m, (j + 1) % m
            cr = (int(xi[j]) - int(xi[p])) * (int(yi[nx]) - int(yi[j])) - (
                int(xi[nx]) - int(xi[j])
            ) * (int(yi[j]) - int(yi[p]))
            keep.append(j == 0 or _DECIM_C * m * abs(cr) >= abs(area2))
        assert out["n_vertices"][i] == m
        assert out["n_kept"][i] == sum(keep)
        assert out["kept_vidx_sum"][i] == sum((j + 1) for j in range(m) if keep[j])
        assert out["kept_x_sum"][i] == sum(int(xi[j]) for j in range(m) if keep[j])
        assert out["kept_y_sum"][i] == sum(int(yi[j]) for j in range(m) if keep[j])
    # the screen must actually decimate something and keep something
    total_in = sum(out["n_vertices"])
    total_kept = sum(out["n_kept"])
    assert 0 < total_kept < total_in


@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 9)), min_size=0, max_size=40
    )
)
def test_within_order_pairs_match_brute_force(rows):
    from simplepolygon_ray.text.dedup import _pairs_in_runs

    ok = np.array(sorted(r[0] for r in rows), np.int64)
    # emulate the copurchase prep: sort by (order, part), distinct, runs
    arr = sorted(set(rows))
    ok = np.array([r[0] for r in arr], np.int64)
    pk = np.array([r[1] for r in arr], np.int64)
    new = np.r_[True, ok[1:] != ok[:-1]] if len(ok) else np.zeros(0, bool)
    a, b = _pairs_in_runs(new, pk)
    got = sorted(zip(a.tolist(), b.tolist()))
    exp = sorted(
        (p1, p2)
        for (o1, p1) in arr
        for (o2, p2) in arr
        if o1 == o2 and p1 < p2
    )
    assert got == exp


def test_frexp_gap_bucket_matches_bit_length():
    """floor(log2(gap)) via np.frexp must equal int.bit_length()-1 for
    every gap < 2^53 (the event_gap_histogram bucket rule; SQL side is
    length(bin(gap)) - 1)."""
    gaps = np.array(
        [1, 2, 3, 4, 7, 8, 1023, 1024, 1025, (1 << 40) - 1, 1 << 40,
         (1 << 52) + 12345, 0],
        np.int64,
    )
    got = np.frexp(gaps.astype(np.float64))[1] - 1
    exp = np.array([int(g).bit_length() - 1 for g in gaps], np.int64)
    assert got.tolist() == exp.tolist()

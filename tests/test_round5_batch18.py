"""Round-5 batch-18 operator tests: Hilbert-curve bucket locality,
grid non-max-suppression peaks, capped-gap linear interpolation —
brute recomputes at sf0.001 plus a scalar-reference check of the
vectorized Hilbert fold."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _xy2d_scalar(n: int, x: int, y: int) -> int:
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_d64_matches_scalar_reference():
    from simplepolygon_ray.pipelines.catalog import _hilbert_d64

    xs, ys = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    got = _hilbert_d64(xs.ravel(), ys.ravel())
    exp = np.array(
        [_xy2d_scalar(64, int(x), int(y)) for x, y in zip(xs.ravel(), ys.ravel())]
    )
    assert np.array_equal(got, exp)
    # a Hilbert index is a bijection on the grid
    assert len(np.unique(got)) == 64 * 64
    # consecutive indexes are grid neighbors (the defining property)
    order = np.argsort(got)
    ox, oy = xs.ravel()[order], ys.ravel()[order]
    assert (np.abs(np.diff(ox)) + np.abs(np.diff(oy)) == 1).all()


def test_hilbert_locality_buckets(ray_session):
    from simplepolygon_ray.images.synth import gen_points
    from simplepolygon_ray.pipelines.catalog import (
        _HILBERT_N,
        q_hilbert_locality,
    )
    from simplepolygon_ray.pipelines.flagship import scale_counts

    got = q_hilbert_locality(SF)
    _, n_images = scale_counts(SF)
    n_pts = min(n_images, 50_000)
    pts = gen_points(n_pts).to_pandas()
    i = np.clip(
        ((pts["lon"].to_numpy() + 180.0) / 360.0 * _HILBERT_N).astype(np.int64),
        0,
        _HILBERT_N - 1,
    )
    j = np.clip(
        ((pts["lat"].to_numpy() + 90.0) / 180.0 * _HILBERT_N).astype(np.int64),
        0,
        _HILBERT_N - 1,
    )
    n_cells = len(set(zip(i.tolist(), j.tolist())))
    assert len(got) == min(16, n_cells)
    assert got["n_points"].sum() == n_pts
    assert got["n_cells"].sum() == n_cells
    # rank bucketing splits cells as evenly as possible
    assert got["n_cells"].max() - got["n_cells"].min() <= 1


def test_grid_nms_peaks_matches_brute(ray_session):
    from simplepolygon_ray.images.synth import gen_points
    from simplepolygon_ray.pipelines.catalog import q_grid_nms_peaks
    from simplepolygon_ray.pipelines.flagship import scale_counts

    got = q_grid_nms_peaks(SF)
    _, n_images = scale_counts(SF)
    pts = gen_points(min(n_images, 50_000)).to_pandas()
    i = np.clip(((pts["lon"].to_numpy() + 180.0) / 360.0 * 64).astype(np.int64), 0, 63)
    j = np.clip(((pts["lat"].to_numpy() + 90.0) / 180.0 * 64).astype(np.int64), 0, 63)
    grid = np.zeros((64, 64), dtype=np.int64)
    np.add.at(grid, (i, j), 1)
    for _, r in got.iterrows():
        x, y = int(r["cx"]), int(r["cy"])
        assert grid[x, y] == r["n_points"]
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if (dx, dy) == (0, 0):
                    continue
                if 0 <= x + dx < 64 and 0 <= y + dy < 64:
                    assert grid[x + dx, y + dy] < grid[x, y]
    # brute peak count matches
    n_peaks = 0
    for x in range(64):
        for y in range(64):
            if grid[x, y] == 0:
                continue
            nb = [
                grid[x + dx, y + dy]
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
                if (dx, dy) != (0, 0) and 0 <= x + dx < 64 and 0 <= y + dy < 64
            ]
            if all(v < grid[x, y] for v in nb):
                n_peaks += 1
    assert n_peaks == len(got)


def test_user_value_interp_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import (
        _HOUR_US_INTERP,
        _INTERP_MAX_GAP,
        q_user_value_interp,
    )

    got = q_user_value_interp(SF)
    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    ).to_pandas()
    ev["t"] = ev["ts"].astype("int64")
    ev["h"] = ev["t"] // _HOUR_US_INTERP
    ev["v"] = np.rint(ev["value"].to_numpy() * 10000.0).astype(np.int64)
    last = (
        ev.sort_values(["user_id", "h", "t", "event_id"])
        .groupby(["user_id", "h"], as_index=False)
        .last()
    )
    agg: dict[int, list[int]] = {}
    for _, g in last.groupby("user_id"):
        h = g["h"].to_numpy(np.int64)
        v = g["v"].to_numpy(np.int64)
        for a in range(len(h) - 1):
            d = int(h[a + 1] - h[a])
            if not (2 <= d <= _INTERP_MAX_GAP):
                continue
            ent = agg.setdefault(d, [0, 0])
            ent[0] += 1
            for k in range(1, d):
                ent[1] += (int(v[a]) * (d - k) + int(v[a + 1]) * k) // d
    exp = pd.DataFrame(
        {
            "gap_hours": sorted(agg),
            "n_gaps": [agg[d][0] for d in sorted(agg)],
            "n_interp_hours": [(d - 1) * agg[d][0] for d in sorted(agg)],
            "sum_interp_e4": [agg[d][1] for d in sorted(agg)],
        }
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

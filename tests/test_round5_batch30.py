"""Round-5 batch-30 operator tests: Moran's I over the geotag grid,
global top inter-event gaps — brute recomputes at sf0.001."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_cell_morans_i_matches_brute(ray_session):
    from simplepolygon_ray.images.synth import gen_points
    from simplepolygon_ray.pipelines.flagship import scale_counts
    from simplepolygon_ray.pipelines.catalog import q_cell_morans_i

    got = q_cell_morans_i(SF)
    _, n_images = scale_counts(SF)
    pts = gen_points(min(n_images, 50_000)).to_pandas()
    n = 64
    i = np.clip(((pts["lon"].to_numpy() + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
    j = np.clip(((pts["lat"].to_numpy() + 90.0) / 180.0 * n).astype(np.int64), 0, n - 1)
    cnt = np.bincount(i * n + j, minlength=n * n).astype(np.int64)
    nz = np.flatnonzero(cnt)
    x = cnt[nz]
    nc = len(nz)
    sx = int(x.sum())
    dev = {(int(k // n), int(k % n)): int(nc * v - sx) for k, v in zip(nz, x)}
    num = 0
    w = 0
    for (cx, cy), d in dev.items():
        for b in ((cx + 1, cy), (cx, cy + 1)):
            if b in dev:
                num += d * dev[b]
                w += 1
    den = sum(d * d for d in dev.values())
    assert got["n_cells"][0] == nc
    assert got["w_pairs"][0] == w
    assert got["num_scaled"][0] == str(num)
    assert got["den_scaled"][0] == str(den)


def test_event_top_gaps_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import _TOPGAP_K, q_event_top_gaps

    got = q_event_top_gaps(SF)
    ev = pq.read_table(f"{SF}/events.parquet", columns=["ts"]).to_pandas()
    ts = np.sort(ev["ts"].astype("datetime64[us]").astype("int64").to_numpy(np.int64))
    gaps = ts[1:] - ts[:-1]
    starts = ts[:-1]
    o = np.lexsort((starts, -gaps))[: _TOPGAP_K]
    want = pd.DataFrame(
        {"gap_us": gaps[o].astype(np.int64), "start_ts": starts[o].astype(np.int64)}
    )
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want)

"""Round-5 batch-28 operator tests: exact point-to-edge distance,
Q4-shaped late-line order-priority audit — brute recomputes at
sf0.001."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_geo_point_edge_dist_matches_brute(ray_session):
    from simplepolygon_ray.images.synth import gen_points
    from simplepolygon_ray.pipelines.catalog import (
        _edges_batch,
        _simple_rings_cached,
        q_geo_point_edge_dist,
    )

    got = (
        q_geo_point_edge_dist(SF)
        .to_pandas()
        .sort_values("image_id", ignore_index=True)
    )
    ed = (
        _simple_rings_cached(SF)
        .map_batches(_edges_batch, batch_format="pyarrow")
        .to_pandas()
    )
    ax = np.floor(ed["xi"].to_numpy() * 1e5).astype(np.int64)
    ay = np.floor(ed["yi"].to_numpy() * 1e5).astype(np.int64)
    bx = np.floor(ed["xj"].to_numpy() * 1e5).astype(np.int64)
    by = np.floor(ed["yj"].to_numpy() * 1e5).astype(np.int64)
    pts = gen_points(len(got)).to_pandas().sort_values("image_id", ignore_index=True)
    for i in range(min(50, len(pts))):
        px = int(np.floor(pts["lon"][i] * 1e5))
        py = int(np.floor(pts["lat"][i] * 1e5))
        best = None
        for k in range(len(ax)):
            a = (int(ax[k]), int(ay[k]))
            b = (int(bx[k]), int(by[k]))
            abx, aby = b[0] - a[0], b[1] - a[1]
            den = abx * abx + aby * aby
            apx, apy = px - a[0], py - a[1]
            bpx, bpy = px - b[0], py - b[1]
            dot = apx * abx + apy * aby
            if den > 0 and 0 <= dot <= den:
                cross = apx * aby - apy * abx
                v = (cross * cross) // den
            else:
                v = min(apx * apx + apy * apy, bpx * bpx + bpy * bpy)
            if best is None or v < best:
                best = v
        assert got["d2_e10"][i] == best, i


def test_late_line_order_priority_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import (
        _Q4_LATE_DAYS,
        q_late_line_order_priority,
    )

    got = q_late_line_order_priority(SF)
    orders = pq.read_table(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).to_pandas()
    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).to_pandas()
    oday = orders["o_orderdate"].astype("datetime64[us]").astype("int64") // (
        86_400 * 10**6
    )
    sday = li["l_shipdate"].astype("datetime64[us]").astype("int64") // (86_400 * 10**6)
    mx = (
        pd.DataFrame({"k": li["l_orderkey"], "d": sday})
        .groupby("k", as_index=False)["d"]
        .max()
    )
    m = pd.DataFrame(
        {"k": orders["o_orderkey"], "od": oday, "prio": orders["o_orderpriority"]}
    ).merge(mx, on="k")
    m = m[m["d"] > m["od"] + _Q4_LATE_DAYS]
    want = (
        m.groupby("prio", as_index=False)
        .size()
        .rename(columns={"prio": "o_orderpriority", "size": "n_late_orders"})
        .sort_values("o_orderpriority", ignore_index=True)
        .astype({"n_late_orders": np.int64})
    )
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want)

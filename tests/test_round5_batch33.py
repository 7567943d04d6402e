"""Round-5 batch-33 operator tests: exact two-segment change-point on
daily order counts, image symmetry L1 — brute recomputes at sf0.001."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_changepoint_daily_orders_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import q_changepoint_daily_orders

    got = q_changepoint_daily_orders(SF)
    orders = pq.read_table(f"{SF}/orders.parquet", columns=["o_orderdate"]).to_pandas()
    days = (
        orders["o_orderdate"].astype("datetime64[us]").astype("int64")
        // (86_400 * 10**6)
    ).to_numpy(np.int64)
    d, x = np.unique(days, return_counts=True)
    x = x.astype(np.int64)
    nd = len(d)
    total = int(x.sum())
    best_v, best_day = None, None
    s1 = 0
    for k in range(nd - 1):
        s1 += int(x[k])
        n1, n2 = k + 1, nd - k - 1
        s2 = total - s1
        v = (s1 * s1 * n2 + s2 * s2 * n1) * 1000 // (n1 * n2)
        if best_v is None or v > best_v:
            best_v, best_day = v, int(d[k])
    assert got["split_day"][0] == best_day
    assert got["v_scaled"][0] == best_v
    assert got["n_left"][0] + got["n_right"][0] == nd
    assert got["sum_left"][0] + got["sum_right"][0] == total


def test_image_symmetry_l1_matches_brute(ray_session):
    from simplepolygon_ray.images.codec import decode
    from simplepolygon_ray.images.synth import gen_images
    from simplepolygon_ray.pipelines.catalog import q_image_symmetry_l1

    got = (
        q_image_symmetry_l1(SF)
        .to_pandas()
        .sort_values("image_id", ignore_index=True)
    )
    imgs = gen_images(len(got)).to_pandas().sort_values("image_id", ignore_index=True)
    for _, r in pd.concat([got, imgs.drop(columns=["image_id"])], axis=1).head(
        40
    ).iterrows():
        px = (
            decode(r["bytes"], int(r["w"]), int(r["h"]), r["fmt"])
            .astype(np.int64)
            .sum(axis=2)
        )
        assert r["rot180_l1"] == int(np.abs(px - px[::-1, ::-1]).sum())
        assert r["mirror_l1"] == int(np.abs(px - px[:, ::-1]).sum())
    # L1 distances are symmetric pair sums: always even
    assert (got["rot180_l1"] % 2 == 0).all() and (got["mirror_l1"] % 2 == 0).all()

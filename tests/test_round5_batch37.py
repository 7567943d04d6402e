"""Round-5 batch-37 operator tests: record-breaking orders per month
(distributed prefix-max), image palette stats — brute recomputes at
sf0.001."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_record_high_orders_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import q_record_high_orders

    got = q_record_high_orders(SF)
    od = pq.read_table(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_totalprice"],
    ).to_pandas()
    day = (
        od["o_orderdate"].astype("datetime64[us]").astype("int64") // (86_400 * 10**6)
    ).to_numpy(np.int64)
    k = od["o_orderkey"].to_numpy(np.int64)
    cents = np.rint(od["o_totalprice"] * 100).astype(np.int64).to_numpy()
    o = np.lexsort((k, day))
    day, cents = day[o], cents[o]
    run = np.maximum.accumulate(np.r_[np.iinfo(np.int64).min, cents])[:-1]
    rec = cents > run
    month = day // 32
    want = (
        pd.DataFrame({"month": month[rec]})
        .groupby("month", as_index=False)
        .size()
        .rename(columns={"size": "n_records"})
        .astype(np.int64)
        .sort_values("month", ignore_index=True)
    )
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want)


def test_image_palette_stats_matches_brute(ray_session):
    from simplepolygon_ray.images.codec import decode
    from simplepolygon_ray.images.synth import gen_images
    from simplepolygon_ray.pipelines.catalog import q_image_palette_stats

    got = (
        q_image_palette_stats(SF)
        .to_pandas()
        .sort_values("image_id", ignore_index=True)
    )
    imgs = gen_images(len(got)).to_pandas().sort_values("image_id", ignore_index=True)
    for _, r in pd.concat([got, imgs.drop(columns=["image_id"])], axis=1).head(
        40
    ).iterrows():
        px = decode(r["bytes"], int(r["w"]), int(r["h"]), r["fmt"]).astype(np.int64)
        code = (
            px[:, :, 0].ravel() * (1 << 20)
            + px[:, :, 1].ravel() * (1 << 10)
            + px[:, :, 2].ravel()
        )
        u, c = np.unique(code, return_counts=True)
        best = np.lexsort((u, -c))[0]
        assert r["n_colors"] == len(u)
        assert r["top_color_code"] == u[best]
        assert r["top_color_count"] == c[best]

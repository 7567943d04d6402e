"""Round-5 batch-27 operator tests: Q10-shaped returned-item top
customers, Theil-Sen daily-order trend, image projection-profile
peaks — brute recomputes at sf0.001."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_returned_item_top_customers_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import (
        _Q10_TOPK,
        q_returned_item_top_customers,
    )

    got = q_returned_item_top_customers(SF)
    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice"],
    ).to_pandas()
    orders = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).to_pandas()
    li = li[li["l_returnflag"] == "R"]
    m = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    m["rev_c"] = np.rint(m["l_extendedprice"] * 100).astype(np.int64)
    agg = m.groupby("o_custkey", as_index=False).agg(
        revenue_c=("rev_c", "sum"), n_items=("rev_c", "count")
    )
    want = (
        agg.sort_values(
            ["revenue_c", "o_custkey"], ascending=[False, True], kind="mergesort"
        )
        .head(_Q10_TOPK)
        .reset_index(drop=True)
        .rename(columns={"o_custkey": "c_custkey"})
        .astype({"c_custkey": np.int64, "revenue_c": np.int64, "n_items": np.int64})
    )
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want)


def test_theil_sen_daily_orders_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import (
        _TS_SCALE,
        q_theil_sen_daily_orders,
    )

    got = q_theil_sen_daily_orders(SF)
    orders = pq.read_table(f"{SF}/orders.parquet", columns=["o_orderdate"]).to_pandas()
    days = (
        orders["o_orderdate"].astype("datetime64[us]").astype("int64")
        // (86_400 * 10**6)
    ).to_numpy(np.int64)
    d, c = np.unique(days, return_counts=True)
    c = c.astype(np.int64)
    i, j = np.triu_indices(len(d), k=1)
    slopes = np.sort(np.floor_divide((c[j] - c[i]) * _TS_SCALE, d[j] - d[i]))
    assert got["n_days"][0] == len(d)
    assert got["n_pairs"][0] == len(slopes)
    assert got["median_slope_e6"][0] == slopes[(len(slopes) - 1) // 2]
    assert got["min_slope_e6"][0] == slopes[0]
    assert got["max_slope_e6"][0] == slopes[-1]


def test_image_projection_peaks_matches_brute(ray_session):
    from simplepolygon_ray.images.codec import decode
    from simplepolygon_ray.images.synth import gen_images
    from simplepolygon_ray.pipelines.catalog import q_image_projection_peaks

    got = (
        q_image_projection_peaks(SF)
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
        rows, cols = px.sum(axis=1), px.sum(axis=0)
        assert r["peak_row"] == int(rows.argmax())
        assert r["peak_row_val"] == int(rows.max())
        assert r["peak_col"] == int(cols.argmax())
        assert r["peak_col_val"] == int(cols.max())
    assert (got["peak_row_val"] >= 0).all() and (got["peak_col_val"] >= 0).all()

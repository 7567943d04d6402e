"""Round-5 batch-24 operator tests: TPC-H Q17-shaped small-quantity
revenue, Q18-shaped large-volume orders, image 4x4 Walsh-Hadamard
band energy — brute recomputes at sf0.001."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_small_qty_revenue_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import q_small_qty_revenue

    got = q_small_qty_revenue(SF)
    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    ).to_pandas()
    part = pq.read_table(
        f"{SF}/part.parquet", columns=["p_partkey", "p_brand"]
    ).to_pandas()
    li["qty"] = li["l_quantity"].astype(np.int64)
    li["price_c"] = np.rint(li["l_extendedprice"] * 100).astype(np.int64)
    stats = li.groupby("l_partkey")["qty"].agg(n="count", sq="sum")
    m = li.merge(stats, left_on="l_partkey", right_index=True)
    m = m[5 * m["qty"] * m["n"] < m["sq"]]
    m = m.merge(part, left_on="l_partkey", right_on="p_partkey")
    want = (
        m.groupby("p_brand", as_index=False)
        .agg(revenue_c=("price_c", "sum"), n_items=("price_c", "count"))
        .sort_values("p_brand", ignore_index=True)
    )
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(
        got[["p_brand", "revenue_c", "n_items"]].astype(
            {"revenue_c": np.int64, "n_items": np.int64}
        ),
        want.astype({"revenue_c": np.int64, "n_items": np.int64}),
    )


def test_large_qty_orders_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import _Q18_MIN_QTY, q_large_qty_orders

    got = q_large_qty_orders(SF)
    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    ).to_pandas()
    orders = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    ).to_pandas()
    sums = (
        li.assign(q=li["l_quantity"].astype(np.int64))
        .groupby("l_orderkey", as_index=False)["q"]
        .sum()
    )
    sums = sums[sums["q"] > _Q18_MIN_QTY]
    want = orders.merge(sums, left_on="o_orderkey", right_on="l_orderkey")
    want = pd.DataFrame(
        {
            "o_orderkey": want["o_orderkey"].astype(np.int64),
            "o_custkey": want["o_custkey"].astype(np.int64),
            "total_c": np.rint(want["o_totalprice"] * 100).astype(np.int64),
            "sum_qty": want["q"].astype(np.int64),
        }
    ).sort_values("o_orderkey", ignore_index=True)
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want)


def test_image_hadamard_energy_matches_brute(ray_session):
    from simplepolygon_ray.images.codec import decode
    from simplepolygon_ray.images.synth import gen_images
    from simplepolygon_ray.pipelines.catalog import q_image_hadamard_energy

    got = (
        q_image_hadamard_energy(SF)
        .to_pandas()
        .sort_values("image_id", ignore_index=True)
    )
    imgs = gen_images(len(got)).to_pandas().sort_values("image_id", ignore_index=True)
    sgn2 = np.array([1, 1, -1, -1], np.int64)
    sgn3 = np.array([1, -1, -1, 1], np.int64)
    for _, r in pd.concat([got, imgs.drop(columns=["image_id"])], axis=1).head(
        40
    ).iterrows():
        px = (
            decode(r["bytes"], int(r["w"]), int(r["h"]), r["fmt"])
            .astype(np.int64)
            .sum(axis=2)
        )
        h, w = px.shape
        h4, w4 = h // 4, w // 4
        ex = ey = exy = 0
        for by in range(h4):
            for bx in range(w4):
                blk = px[by * 4 : by * 4 + 4, bx * 4 : bx * 4 + 4]
                cx = int((blk * sgn2[None, :]).sum())
                cy = int((blk * sgn2[:, None]).sum())
                cxy = int((blk * sgn3[None, :] * sgn3[:, None]).sum())
                ex += cx * cx
                ey += cy * cy
                exy += cxy * cxy
        assert ex == r["had_x"] and ey == r["had_y"] and exy == r["had_xy"]

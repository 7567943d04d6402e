"""Round-5 batch-16 operator tests: trailing-24h sliding distinct
users, per-nation revenue drawdown, sequence-length bucket waste,
adaptive quadtree refinement and grid stencil hotspots — each checked
against an independent brute-force recompute at sf0.001."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_sliding_distinct_users_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import (
        _HOUR_US_SLIDE,
        q_sliding_distinct_users_24h,
    )

    got = q_sliding_distinct_users_24h(SF)
    ev = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "ts"]).to_pandas()
    h = ev["ts"].astype("int64").to_numpy() // _HOUR_US_SLIDE
    uid = ev["user_id"].to_numpy(np.int64)
    pairs = set(zip(uid.tolist(), h.tolist()))
    # brute: a user counts toward hour H if it has an event in (H-24, H]
    exp = {}
    for u, hh in pairs:
        for k in range(24):
            exp[hh + k] = exp.get(hh + k, set())
            exp[hh + k].add(u)
    exp = (
        pd.DataFrame(
            {"hour_id": list(exp), "n_users": [len(v) for v in exp.values()]}
        )
        .sort_values("hour_id", ignore_index=True)
        .astype(np.int64)
    )
    pd.testing.assert_frame_equal(
        got.sort_values("hour_id", ignore_index=True).astype(np.int64), exp
    )


def test_nation_drawdown_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import (
        _DAY_US,
        q_nation_revenue_drawdown,
    )

    got = q_nation_revenue_drawdown(SF)
    od = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_orderdate", "o_totalprice"]
    ).to_pandas()
    cu = pq.read_table(
        f"{SF}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    na = pq.read_table(
        f"{SF}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    od["cents"] = np.rint(od["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
    od["day"] = od["o_orderdate"].astype("int64") // _DAY_US
    j = od.merge(cu, left_on="o_custkey", right_on="c_custkey")
    daily = j.groupby(["c_nationkey", "day"], as_index=False)["cents"].sum()
    rows = []
    for nk, g in daily.groupby("c_nationkey"):
        g = g.sort_values("day")
        c = g["cents"].to_numpy(np.int64)
        rm = np.maximum.accumulate(c)
        rows.append(
            {
                "n_name": na.set_index("n_nationkey")["n_name"][nk],
                "max_drawdown_cents": int((rm - c).max()),
                "peak_daily_cents": int(c.max()),
                "n_days": len(c),
                "n_peak_days": int((c == rm).sum()),
            }
        )
    exp = pd.DataFrame(rows).sort_values("n_name", ignore_index=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_seq_len_bucket_waste_invariants(ray_session):
    from simplepolygon_ray.relational.queries import (
        _SEQ_BUCKETS,
        q_seq_len_bucket_waste,
    )

    got = q_seq_len_bucket_waste(SF)
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["text"]).to_pandas()
    n = docs["text"].str.lower().str.split().str.len().to_numpy(np.int64)
    c = np.minimum(n, 2048)
    bi = np.searchsorted(_SEQ_BUCKETS, c)
    exp_docs = np.bincount(bi, minlength=8)
    for _, r in got.iterrows():
        k = int(np.searchsorted(_SEQ_BUCKETS, r["bucket"]))
        assert exp_docs[k] == r["n_docs"]
        assert r["pad_waste"] == r["n_docs"] * r["bucket"] - r["sum_tokens"]
        assert 0 < r["util_bp"] <= 10_000
    assert got["n_docs"].sum() == len(docs)
    assert got["sum_tokens"].sum() == int(c.sum())


def test_quadtree_conserves_points_and_respects_threshold(ray_session):
    from simplepolygon_ray.pipelines.catalog import (
        _QT_SPLIT,
        q_geo_quadtree_refine,
    )

    got = q_geo_quadtree_refine(SF)
    # leaves partition the occupied space: total points conserved
    from simplepolygon_ray.images.synth import gen_points
    from simplepolygon_ray.pipelines.flagship import scale_counts

    _, n_images = scale_counts(SF)
    n_pts = min(n_images, 50_000)
    assert got["n_points"].sum() == n_pts
    # every non-finest leaf is at or under the split threshold
    assert (got.loc[got["level"] < 6, "n_points"] <= _QT_SPLIT).all()
    # leaves never overlap: project every leaf to level-6 cell ranges
    seen = np.zeros((64, 64), dtype=bool)
    for _, r in got.iterrows():
        s = 2 ** (6 - int(r["level"]))
        x0, y0 = int(r["cx"]) * s, int(r["cy"]) * s
        block = seen[x0 : x0 + s, y0 : y0 + s]
        assert not block.any()
        block[:] = True


def test_cell_smooth_topk_matches_brute(ray_session):
    from simplepolygon_ray.pipelines.catalog import q_cell_smooth_topk
    from simplepolygon_ray.images.synth import gen_points
    from simplepolygon_ray.pipelines.flagship import scale_counts

    got = q_cell_smooth_topk(SF)
    _, n_images = scale_counts(SF)
    pts = gen_points(min(n_images, 50_000)).to_pandas()
    i = np.clip(((pts["lon"].to_numpy() + 180.0) / 360.0 * 64).astype(np.int64), 0, 63)
    j = np.clip(((pts["lat"].to_numpy() + 90.0) / 180.0 * 64).astype(np.int64), 0, 63)
    grid = np.zeros((64, 64), dtype=np.int64)
    np.add.at(grid, (i, j), 1)
    p = np.pad(grid, 1)
    sm = sum(
        p[1 + dx : 65 + dx, 1 + dy : 65 + dy]
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
    )
    cx, cy = np.nonzero(sm > 0)
    exp = (
        pd.DataFrame(
            {
                "cx": cx.astype(np.int64),
                "cy": cy.astype(np.int64),
                "smooth_n": sm[cx, cy],
                "n_center": grid[cx, cy],
            }
        )
        .sort_values(["smooth_n", "cx", "cy"], ascending=[False, True, True])
        .head(20)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)
    assert (got["smooth_n"] >= got["n_center"]).all()

"""Round-5 batch-14 operator tests: RFM segmentation, TTL streaming
dedup, KMV set algebra, lagged hourly cross-correlation, deterministic
train/val/test split audit and language rebalance plan — each checked
against an independent brute-force recompute at sf0.001."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _orders():
    return pq.read_table(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_orderdate", "o_totalprice"]
    ).to_pandas()


def test_rfm_segments_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import (
        _RFM_ANCHOR_DAY,
        _RFM_F_EDGES,
        _RFM_M_EDGES,
        _RFM_R_EDGES,
        q_rfm_segments,
    )

    got = q_rfm_segments(SF)
    od = _orders()
    od["cents"] = np.rint(od["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
    od["day"] = od["o_orderdate"].astype("int64") // 86_400_000_000
    per = od.groupby("o_custkey").agg(
        f=("cents", "size"), m=("cents", "sum"), last_day=("day", "max")
    )
    rec = _RFM_ANCHOR_DAY - per["last_day"]

    def sc(v, edges, kind):
        if kind == "le":
            return np.where(
                v <= edges[0], 4, np.where(v <= edges[1], 3, np.where(v <= edges[2], 2, 1))
            )
        return np.where(
            v >= edges[0], 4, np.where(v >= edges[1], 3, np.where(v >= edges[2], 2, 1))
        )

    per["r_score"] = sc(rec, _RFM_R_EDGES, "le")
    per["f_score"] = sc(per["f"], _RFM_F_EDGES, "ge")
    per["m_score"] = sc(per["m"], _RFM_M_EDGES, "ge")
    exp = (
        per.groupby(["r_score", "f_score", "m_score"], as_index=False)
        .agg(n_customers=("f", "size"), monetary_cents=("m", "sum"))
        .sort_values(["r_score", "f_score", "m_score"], ignore_index=True)
    )
    assert int(got["n_customers"].sum()) == per.shape[0]
    pd.testing.assert_frame_equal(
        got.astype(np.int64), exp.astype(np.int64), check_dtype=False
    )


def test_ttl_dedup_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import _TTL_DEDUP_US, q_ttl_dedup_stats

    got = q_ttl_dedup_stats(SF)
    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "event_type", "ts"]
    ).to_pandas()
    ev["tus"] = ev["ts"].astype("int64")
    rows = {}
    for (uid, et), g in ev.sort_values("tus").groupby(["user_id", "event_type"]):
        t = g["tus"].to_numpy()
        kept = 1 + int((np.diff(t) > _TTL_DEDUP_US).sum())
        n_tot, n_kept, n_keys = rows.get(et, (0, 0, 0))
        rows[et] = (n_tot + len(t), n_kept + kept, n_keys + 1)
    exp = (
        pd.DataFrame(
            [
                {"event_type": et, "n_total": a, "n_kept": b, "n_keys": c}
                for et, (a, b, c) in rows.items()
            ]
        )
        .sort_values("event_type", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_kmv_set_algebra_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import _KSA_K, q_kmv_set_algebra
    from simplepolygon_ray.relational.sketches import _hash64

    got = q_kmv_set_algebra(SF)
    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "event_type"]
    ).to_pandas()
    k, off = _KSA_K, np.uint64(1 << 63)

    def sk(typ):
        u = ev.loc[ev["event_type"] == typ, "user_id"].to_numpy(np.int64)
        return np.unique((_hash64(u.view(np.uint64)) ^ off).view(np.int64))[:k]

    a, b = sk("click"), sk("purchase")

    def theta(v):
        return ((int(v[k - 1]) % (1 << 64)) ^ (1 << 63)) if len(v) >= k else (1 << 64)

    th = min(theta(a), theta(b))
    common = np.intersect1d(a, b)
    if th < (1 << 64):
        c = int((common < np.int64(np.uint64(th) ^ np.uint64(1 << 63))).sum())
        ei = (c << 64) // th
    else:
        c, ei = len(common), len(common)
    u = np.unique(np.concatenate([a, b]))[:k]
    eu = (
        ((k - 1) << 64) // (((int(u[k - 1]) % (1 << 64)) ^ (1 << 63)))
        if len(u) >= k
        else len(u)
    )
    assert got.iloc[0].tolist() == [k, c, ei, eu]
    # set-algebra sanity: intersection <= min side, union >= max side est
    assert got["est_intersect"].iloc[0] <= got["est_union"].iloc[0]


def test_hourly_xcorr_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import _XCORR_LAGS, q_hourly_xcorr

    got = q_hourly_xcorr(SF)
    ev = pq.read_table(f"{SF}/events.parquet", columns=["ts", "event_type"]).to_pandas()
    ev["h"] = ev["ts"].astype("int64") // 3_600_000_000
    sub = ev[ev["event_type"].isin(["click", "purchase"])]
    mn, mx = int(sub["h"].min()), int(sub["h"].max())
    T = mx - mn + 1
    A = np.zeros(T, np.int64)
    B = np.zeros(T, np.int64)
    for h, g in sub.groupby("h"):
        A[h - mn] = int((g["event_type"] == "click").sum())
        B[h - mn] = int((g["event_type"] == "purchase").sum())
    for lag in range(_XCORR_LAGS):
        x, y = A[: T - lag], B[lag:]
        row = got[got["lag"] == lag].iloc[0]
        assert row["n_hours"] == T - lag
        assert row["sum_a"] == x.sum() and row["sum_b"] == y.sum()
        assert row["sum_ab"] == (x * y).sum()
        assert row["sum_a2"] == (x * x).sum() and row["sum_b2"] == (y * y).sum()


def test_split_balance_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import q_dataset_split_balance
    from simplepolygon_ray.relational.sketches import _hash64

    got = q_dataset_split_balance(SF)
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    ).to_pandas()
    h = _hash64(docs["doc_id"].to_numpy(np.int64).view(np.uint64)) % np.uint64(100)
    h = h.astype(np.int64)
    docs["split"] = np.where(h < 80, "train", np.where(h < 90, "val", "test"))
    exp = (
        docs.groupby(["split", "lang"], as_index=False)
        .agg(n_docs=("doc_id", "size"), sum_chars=("n_chars", "sum"))
        .sort_values(["split", "lang"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # every doc lands in exactly one split
    assert int(got["n_docs"].sum()) == len(docs)


def test_lang_rebalance_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import (
        _REBALANCE_QUOTA,
        q_lang_rebalance_plan,
    )
    from simplepolygon_ray.relational.sketches import _hash64

    got = q_lang_rebalance_plan(SF)
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "lang"]
    ).to_pandas()
    off = np.uint64(1 << 63)
    docs["hs"] = (
        _hash64(docs["doc_id"].to_numpy(np.int64).view(np.uint64)) ^ off
    ).view(np.int64)
    for lang, g in docs.groupby("lang"):
        kept = g.sort_values("hs").head(_REBALANCE_QUOTA)
        row = got[got["lang"] == lang].iloc[0]
        assert row["n_docs"] == len(g)
        assert row["n_kept"] == len(kept)
        assert row["kept_id_sum"] == int(kept["doc_id"].sum())
        boundary = (int(row["boundary_hi"]) << 32) | int(row["boundary_lo"])
        assert boundary == (int(kept["hs"].iloc[-1]) % (1 << 64)) ^ (1 << 63)
        # the boundary re-applies the plan as a pure per-row predicate
        # (unmap the order-preserving int64 back to the true uint64 hash)
        hs_u = (
            g["hs"].to_numpy(np.int64).view(np.uint64) ^ np.uint64(1 << 63)
        ).astype(object)
        assert int((hs_u <= boundary).sum()) == len(kept)


def test_itemset3_matches_brute(ray_session):
    from itertools import combinations

    from simplepolygon_ray.relational.queries import _ITEMSET3_K, q_itemset3_topk

    got = q_itemset3_topk(SF)
    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pandas()
    cnt = {}
    for _, g in li.groupby("l_orderkey"):
        parts = sorted(set(g["l_partkey"].tolist()))
        for tri in combinations(parts, 3):
            cnt[tri] = cnt.get(tri, 0) + 1
    exp = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:_ITEMSET3_K]
    assert len(got) == len(exp)
    for row, (tri, n) in zip(got.itertuples(index=False), exp):
        assert (row.part_a, row.part_b, row.part_c) == tri
        assert row.n_orders == n


def test_consistent_hash_ring_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import (
        _RING_NODES,
        _RING_SALT,
        _RING_VNODES,
        q_consistent_hash_ring,
    )
    from simplepolygon_ray.relational.sketches import _hash64

    got = q_consistent_hash_ring(SF)
    ev = pq.read_table(f"{SF}/events.parquet", columns=["user_id"]).to_pandas()
    users = np.unique(ev["user_id"].to_numpy(np.int64))
    ring_u = _hash64((np.arange(_RING_VNODES, dtype=np.int64) + _RING_SALT).view(np.uint64))
    order = np.argsort(ring_u, kind="stable")
    ring_s, node_s = ring_u[order], (np.arange(_RING_VNODES) % _RING_NODES)[order]
    h = _hash64(users.view(np.uint64))
    pos = np.searchsorted(ring_s, h, side="left")
    pos[pos == len(ring_s)] = 0
    nodes = node_s[pos]
    exp = {}
    for u, nd in zip(users.tolist(), nodes.tolist()):
        a, b = exp.get(nd, (0, 0))
        exp[nd] = (a + 1, b + u)
    assert len(got) == len(exp)
    for row in got.itertuples(index=False):
        assert exp[row.node] == (row.n_keys, row.id_sum)
    # every distinct user is assigned exactly once
    assert int(got["n_keys"].sum()) == len(users)


def test_hist_equalize_matches_brute(ray_session):
    from simplepolygon_ray.images.codec import decode
    from simplepolygon_ray.images.synth import gen_images
    from simplepolygon_ray.pipelines.catalog import q_image_hist_equalize

    got = q_image_hist_equalize(SF).to_pandas().set_index("image_id")
    rows = gen_images(5).take_all()
    for r in rows:
        v = decode(r["bytes"], r["w"], r["h"], r["fmt"]).astype(np.int64).sum(2).ravel()
        u, c = np.unique(v, return_counts=True)
        cdf = np.cumsum(c)
        npix, c0 = int(cdf[-1]), int(cdf[0])
        if npix == c0:
            assert r["image_id"] not in got.index
            continue
        e = ((cdf - c0) * 765) // (npix - c0)
        g = got.loc[r["image_id"]]
        assert g["sum_eq"] == int((c * e).sum())
        assert g["n_levels"] == len(u)
        # equalized range invariant: max level maps to exactly 765
        assert e[-1] == 765
    # global bound: 0 <= sum_eq <= 765 * n_pix for every image
    assert (got["sum_eq"] >= 0).all()


def test_border_contrast_partitions_pixels(ray_session):
    from simplepolygon_ray.images.codec import decode
    from simplepolygon_ray.images.synth import gen_images
    from simplepolygon_ray.pipelines.catalog import q_image_border_contrast

    got = q_image_border_contrast(SF).to_pandas().set_index("image_id")
    rows = gen_images(5).take_all()
    for r in rows:
        px = decode(r["bytes"], r["w"], r["h"], r["fmt"]).astype(np.int64).sum(2)
        g = got.loc[r["image_id"]]
        # border + interior partition the plane exactly
        assert g["sum_border"] + g["sum_interior"] == px.sum()
        assert g["n_border"] + g["n_interior"] == r["w"] * r["h"]
        if r["w"] > 1 and r["h"] > 1:
            assert g["sum_interior"] == px[1:-1, 1:-1].sum()
            assert g["n_border"] == 2 * r["w"] + 2 * r["h"] - 4


def test_survival_curve_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import (
        _DAY_US,
        _SURV_DAYS,
        q_conversion_survival_curve,
    )

    got = q_conversion_survival_curve(SF)
    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "ts", "event_type"]
    ).to_pandas()
    ev["tu"] = ev["ts"].astype("int64")
    H = int(ev["tu"].max())
    rows = []
    for uid, g in ev.groupby("user_id"):
        s = g.loc[g["event_type"] == "signup", "tu"]
        if s.empty:
            continue
        s0 = int(s.min())
        p = g.loc[(g["event_type"] == "purchase") & (g["tu"] >= s0), "tu"]
        conv = (int(p.min()) - s0) // _DAY_US if not p.empty else -1
        rows.append(((H - s0) // _DAY_US, conv))
    for k in range(_SURV_DAYS):
        at_risk = sum(1 for o, c in rows if o >= k and (c == -1 or c >= k))
        conv = sum(1 for o, c in rows if c == k)
        r = got[got["day"] == k].iloc[0]
        assert (r["n_at_risk"], r["n_converted"]) == (at_risk, conv), k
    # survival invariants: risk set shrinks, conversions never exceed it
    ar = got.sort_values("day")["n_at_risk"].to_numpy(np.int64)
    assert (np.diff(ar) <= 0).all()
    assert (got["n_converted"] <= got["n_at_risk"]).all()


def test_click_conversion_matrix_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import (
        _CONV_WINDOW_US,
        _DAY_US,
        q_click_conversion_matrix,
    )

    got = q_click_conversion_matrix(SF)
    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "ts", "event_type"]
    ).to_pandas()
    ev["tu"] = ev["ts"].astype("int64")
    cells = {}
    for uid, g in ev.groupby("user_id"):
        pt = np.sort(g.loc[g["event_type"] == "purchase", "tu"].to_numpy(np.int64))
        for ct in g.loc[g["event_type"] == "click", "tu"].to_numpy(np.int64):
            i = np.searchsorted(pt, ct, side="right")  # strictly after
            cv = i < len(pt) and pt[i] - ct <= _CONV_WINDOW_US
            key = (int((ct // _DAY_US + 4) % 7), int((ct // 3_600_000_000) % 24))
            a, b = cells.get(key, (0, 0))
            cells[key] = (a + 1, b + int(cv))
    assert len(got) == len(cells)
    for r in got.itertuples(index=False):
        assert cells[(r.dow, r.hour)] == (r.n_clicks, r.n_converted)


def test_ship_lag_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import _DAY_US, q_ship_lag_histogram

    got = q_ship_lag_histogram(SF)
    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).to_pandas()
    od = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).to_pandas()
    j = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    lag = (
        j["l_shipdate"].astype("int64") // _DAY_US
        - j["o_orderdate"].astype("int64") // _DAY_US
    ).clip(-30, 30)
    exp = lag.value_counts().sort_index()
    assert got["lag_days"].tolist() == exp.index.tolist()
    assert got["n_items"].tolist() == exp.tolist()
    assert int(got["n_items"].sum()) == len(j)


def test_dominant_share_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import q_dominant_line_share

    got = q_dominant_line_share(SF)
    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice"]
    ).to_pandas()
    li["cents"] = np.rint(li["l_extendedprice"].to_numpy() * 100.0).astype(np.int64)
    per = li.groupby("l_orderkey")["cents"].agg(["sum", "max"])
    dec = np.minimum((10000 * per["max"]) // per["sum"] // 1000, 10)
    exp = dec.value_counts().sort_index()
    assert got["share_decile"].tolist() == exp.index.tolist()
    assert got["n_orders"].tolist() == exp.tolist()
    # share of the max line is always > 0 and the deciles partition orders
    assert int(got["n_orders"].sum()) == per.shape[0]


def test_latest_order_rank_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import q_latest_order_rank_hist

    got = q_latest_order_rank_hist(SF)
    od = pq.read_table(
        f"{SF}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
    ).to_pandas()
    od["cents"] = np.rint(od["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
    od["day"] = od["o_orderdate"].astype("int64")
    cnt = {}
    for cust, g in od.groupby("o_custkey"):
        g = g.sort_values(["cents", "o_orderkey"], ascending=[False, True])
        g = g.reset_index(drop=True)
        latest = g.sort_values(["day", "o_orderkey"], ascending=False).index[0]
        r = int(latest) + 1
        cnt[r] = cnt.get(r, 0) + 1
    assert got["rank_of_latest"].tolist() == sorted(cnt)
    assert got["n_customers"].tolist() == [cnt[k] for k in sorted(cnt)]
    assert int(got["n_customers"].sum()) == od["o_custkey"].nunique()


def test_bootstrap_spread_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import (
        _BOOT_B,
        _BOOT_SALT,
        q_bootstrap_mean_spread,
    )
    from simplepolygon_ray.relational.sketches import _hash64

    got = q_bootstrap_mean_spread(SF)
    od = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    ).to_pandas()
    okey = od["o_orderkey"].to_numpy(np.int64)
    cents = np.rint(od["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
    assert len(got) == _BOOT_B
    for b in range(_BOOT_B):
        m = (_hash64((okey + b * _BOOT_SALT).view(np.uint64)) % np.uint64(2)) == 0
        row = got[got["b"] == b].iloc[0]
        assert (row["n"], row["sum_cents"]) == (int(m.sum()), int(cents[m].sum()))
    # half-rate resamples hover near half the table
    assert (got["n"] > 0).all() and (got["n"] < len(od)).all()


def test_cdc_delete_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import (
        _CDC_DEL_BUMP_CENTS,
        q_cdc_delete_apply,
    )

    got = q_cdc_delete_apply(SF)
    cu = pq.read_table(
        f"{SF}/customer.parquet", columns=["c_custkey", "c_nationkey", "c_acctbal"]
    ).to_pandas()
    na = pq.read_table(f"{SF}/nation.parquet", columns=["n_nationkey"]).to_pandas()
    ck = cu["c_custkey"].to_numpy(np.int64)
    live = cu[ck % 11 != 3].copy()
    lk = live["c_custkey"].to_numpy(np.int64)
    cents = np.rint(live["c_acctbal"].to_numpy() * 100.0).astype(np.int64)
    cents = cents + np.where(lk % 7 == 0, _CDC_DEL_BUMP_CENTS, 0)
    live["cents"] = cents
    agg = live.groupby("c_nationkey")["cents"].agg(["size", "sum"])
    for r in got.itertuples(index=False):
        base = (
            (int(agg.loc[r.c_nationkey, "size"]), int(agg.loc[r.c_nationkey, "sum"]))
            if r.c_nationkey in agg.index
            else (0, 0)
        )
        ins = (1, 100000) if r.c_nationkey in set(na["n_nationkey"]) else (0, 0)
        assert (r.n_rows, r.bal_cents) == (base[0] + ins[0], base[1] + ins[1])
    # deletes really removed rows: total < customers + inserts
    assert int(got["n_rows"].sum()) == len(live) + len(na)


def test_cell_density_drift_halves_sum_to_density(ray_session):
    from simplepolygon_ray.pipelines.catalog import (
        q_cell_density_drift,
        q_image_cell_density,
    )

    drift = q_cell_density_drift(SF).sort_values(["cx", "cy"], ignore_index=True)
    dens = (
        q_image_cell_density(SF)
        .to_pandas()
        .sort_values(["cx", "cy"], ignore_index=True)
    )
    # the two halves partition the same point set the heatmap counts
    assert drift["cx"].tolist() == dens["cx"].tolist()
    assert drift["cy"].tolist() == dens["cy"].tolist()
    assert (
        drift["n_even"] + drift["n_odd"]
    ).tolist() == dens["n_images"].tolist()


def test_geo_snap_audits_match_brute(ray_session):
    from itertools import combinations

    from simplepolygon_ray.pipelines.catalog import (
        _SNAP_CAP,
        q_geo_selfisect_hist,
        q_geo_snap_dup_verts,
    )
    from simplepolygon_ray.pipelines.flagship import scale_counts
    from simplepolygon_ray.stages.decompose_stage import polygons_source

    isect = q_geo_selfisect_hist(SF)
    dups = q_geo_snap_dup_verts(SF)
    n_polys, _ = scale_counts(SF)
    n = min(n_polys, _SNAP_CAP)
    assert int(isect["n_rings"].sum()) == n
    assert int(dups["n_rings"].sum()) == n

    # brute recompute per ring over the whole corpus
    rows = polygons_source(n).take_all()
    ic, dc = {}, {}
    for r in rows:
        pts = np.asarray(r["rings"][0], np.float64)
        if len(pts) > 1 and (pts[0] == pts[-1]).all():
            pts = pts[:-1]
        p = np.floor(pts * 1e5).astype(np.int64)
        E = len(p)
        nd = min(E - len({(int(a), int(b)) for a, b in p}), 20)
        dc[nd] = dc.get(nd, 0) + 1
        cnt = 0
        for i, j in combinations(range(E), 2):
            if j == i + 1 or (i == 0 and j == E - 1):
                continue
            a1, a2, b1, b2 = p[i], p[(i + 1) % E], p[j], p[(j + 1) % E]

            def cross(u, v, w):
                return int((v[0] - u[0]) * (w[1] - u[1]) - (v[1] - u[1]) * (w[0] - u[0]))

            d1, d2 = cross(a1, a2, b1), cross(a1, a2, b2)
            d3, d4 = cross(b1, b2, a1), cross(b1, b2, a2)
            if ((d1 > 0) != (d2 > 0) and d1 != 0 and d2 != 0) and (
                (d3 > 0) != (d4 > 0) and d3 != 0 and d4 != 0
            ):
                cnt += 1
        k = min(cnt, 20)
        ic[k] = ic.get(k, 0) + 1
    assert isect["n_isects"].tolist() == sorted(ic)
    assert isect["n_rings"].tolist() == [ic[k] for k in sorted(ic)]
    assert dups["n_dups"].tolist() == sorted(dc)
    assert dups["n_rings"].tolist() == [dc[k] for k in sorted(dc)]


def test_needle_scan_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import _NEEDLES, q_needle_scan_counts

    got = q_needle_scan_counts(SF)
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["text"]).to_pandas()
    for needle in _NEEDLES:
        occ = docs["text"].str.count(needle.replace(" ", r"\ "))
        row = got[got["needle"] == needle].iloc[0]
        assert (row["n_docs"], row["n_occurrences"]) == (
            int((occ > 0).sum()),
            int(occ.sum()),
        ), needle


def test_run_compression_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import q_event_run_compression

    got = q_event_run_compression(SF)
    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "event_id", "ts", "event_type"]
    ).to_pandas()
    ev["tu"] = ev["ts"].astype("int64")
    cnt = {}
    for uid, g in ev.sort_values(["tu", "event_id"]).groupby("user_id"):
        et = g["event_type"].tolist()
        runs = 1 + sum(1 for a, b in zip(et, et[1:]) if a != b)
        d = min((10 * runs) // len(et), 10)
        cnt[d] = cnt.get(d, 0) + 1
    assert got["ratio_decile"].tolist() == sorted(cnt)
    assert got["n_users"].tolist() == [cnt[k] for k in sorted(cnt)]


def test_rrf_fusion_matches_brute(ray_session):
    from simplepolygon_ray.pipelines.catalog import (
        q_ann_brute,
        q_ann_lsh,
        q_ann_rrf_fusion,
    )

    got = q_ann_rrf_fusion(SF)
    brute = q_ann_brute(SF)
    lsh = q_ann_lsh(SF)
    pts = {}
    for df in (brute, lsh):
        for r in df.itertuples(index=False):
            pts[r.vec_id] = pts.get(r.vec_id, 0) + 10**6 // (60 + r.rank)
    exp = sorted(pts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(got["vec_id"], got["rrf_score"])) == exp
    # a vec ranked top by BOTH methods must outscore any single-method vec
    assert got["rrf_score"].iloc[0] >= got["rrf_score"].iloc[-1]


def test_nation_trend_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import (
        _DAY_US,
        _TREND_X0,
        q_nation_trend_moments,
    )

    got = q_nation_trend_moments(SF)
    od = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_orderdate", "o_totalprice"]
    ).to_pandas()
    cu = pq.read_table(
        f"{SF}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    j = od.merge(cu, left_on="o_custkey", right_on="c_custkey")
    x = (j["o_orderdate"].astype("int64") // _DAY_US - _TREND_X0).to_numpy(np.int64)
    y = np.rint(j["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
    j["x"], j["y"] = x, y
    for nat, g in j.groupby("c_nationkey"):
        row = got[got["nation"] == nat].iloc[0]
        gx = g["x"].to_numpy(np.int64)
        gy = g["y"].to_numpy(np.int64)
        assert row["n"] == len(g)
        assert row["sum_x"] == gx.sum() and row["sum_y"] == gy.sum()
        assert row["sum_xy"] == (gx * gy).sum()
        assert row["sum_x2"] == (gx * gx).sum()
    assert int(got["n"].sum()) == len(j)


def test_transition_dwell_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import q_transition_dwell_matrix

    got = q_transition_dwell_matrix(SF)
    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "event_id", "ts", "event_type"]
    ).to_pandas()
    ev["tu"] = ev["ts"].astype("int64")
    agg = {}
    for uid, g in ev.sort_values(["tu", "event_id"]).groupby("user_id"):
        et = g["event_type"].tolist()
        tu = g["tu"].tolist()
        for a, b, t0, t1 in zip(et, et[1:], tu, tu[1:]):
            n, s = agg.get((a, b), (0, 0))
            agg[(a, b)] = (n + 1, s + (t1 - t0) // 1_000_000)
    assert len(got) == len(agg)
    for r in got.itertuples(index=False):
        assert agg[(r.from_type, r.to_type)] == (r.n, r.dwell_sec)
    # each user's stream of E events yields exactly E-1 transitions
    n_users = ev["user_id"].nunique()
    assert int(got["n"].sum()) == len(ev) - n_users


def test_fiscal_445_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import (
        _DAY_US,
        _FISCAL_ANCHOR_DAY,
        q_fiscal_445_revenue,
    )

    got = q_fiscal_445_revenue(SF)
    od = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    ).to_pandas()
    day = (od["o_orderdate"].astype("int64") // _DAY_US).to_numpy(np.int64)
    assert (day >= _FISCAL_ANCHOR_DAY).all()  # anchor below the corpus min
    cents = np.rint(od["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
    week = (day - _FISCAL_ANCHOR_DAY) // 7
    fy, wiy = week // 52, week % 52
    q, wiq = wiy // 13, wiy % 13
    period = q * 3 + np.where(wiq < 4, 0, np.where(wiq < 8, 1, 2)) + 1
    agg = {}
    for f, p, c in zip(fy.tolist(), period.tolist(), cents.tolist()):
        n, s = agg.get((f, p), (0, 0))
        agg[(f, p)] = (n + 1, s + c)
    assert len(got) == len(agg)
    for r in got.itertuples(index=False):
        assert agg[(r.fiscal_year, r.fiscal_period)] == (r.n_orders, r.revenue_cents)
    # a 4-4-5 quarter is 13 weeks: periods stay in 1..12
    assert got["fiscal_period"].between(1, 12).all()

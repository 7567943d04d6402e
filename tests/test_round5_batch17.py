"""Round-5 batch-17 operator tests: windowed collocation lift, nation
balance-histogram intersection, order-sequence disorder deciles —
each checked against an independent brute-force recompute at sf0.001."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_colloc_window_lift_matches_brute(ray_session):
    from collections import Counter

    from simplepolygon_ray.relational.queries import _COLLOC_W, q_colloc_window_lift

    got = q_colloc_window_lift(SF)
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["text"]).to_pandas()
    uni: Counter = Counter()
    pairs: Counter = Counter()
    for text in docs["text"]:
        toks = [t for t in text.lower().split() if t]
        uni.update(toks)
        for i, a in enumerate(toks):
            for d in range(1, _COLLOC_W + 1):
                if i + d >= len(toks):
                    break
                b = toks[i + d]
                pairs[(min(a, b), max(a, b))] += 1
    tot = sum(uni.values())
    rows = [
        {
            "w1": w1,
            "w2": w2,
            "n": n,
            "lift": (n * tot * 1_000_000) // (uni[w1] * uni[w2]),
        }
        for (w1, w2), n in pairs.items()
        if n >= 3
    ]
    exp = (
        pd.DataFrame(rows)
        .sort_values(["lift", "w1", "w2"], ascending=[False, True, True], kind="mergesort")
        .head(20)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_nation_balance_overlap_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import (
        _BAL_BAND_CENTS,
        _BAL_OFF_CENTS,
        q_nation_balance_overlap,
    )

    got = q_nation_balance_overlap(SF)
    cu = pq.read_table(
        f"{SF}/customer.parquet", columns=["c_nationkey", "c_acctbal"]
    ).to_pandas()
    na = pq.read_table(
        f"{SF}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    cents = np.rint(cu["c_acctbal"].to_numpy() * 100.0).astype(np.int64)
    band = np.clip((cents + _BAL_OFF_CENTS) // _BAL_BAND_CENTS, 0, 10)
    nk = cu["c_nationkey"].to_numpy(np.int64)
    H = np.zeros((25, 11), dtype=np.int64)
    np.add.at(H, (nk, band), 1)
    names = na.set_index("n_nationkey")["n_name"]
    assert len(got) == 25 * 24 // 2
    for _, r in got.iterrows():
        a = int(na.loc[na["n_name"] == r["nation_a"], "n_nationkey"].iloc[0])
        b = int(na.loc[na["n_name"] == r["nation_b"], "n_nationkey"].iloc[0])
        inter = int(np.minimum(H[a], H[b]).sum())
        assert r["intersection"] == inter
        mn = int(min(H[a].sum(), H[b].sum()))
        assert r["overlap_bp"] == ((10_000 * inter) // mn if mn else 0)
    # intersection is bounded by the smaller histogram mass
    assert (got["overlap_bp"] <= 10_000).all()


def test_order_seq_disorder_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import _DAY_US, q_order_seq_disorder

    got = q_order_seq_disorder(SF)
    od = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_orderkey", "o_orderdate"]
    ).to_pandas()
    od["day"] = od["o_orderdate"].astype("int64") // _DAY_US
    cnt = np.zeros(11, dtype=np.int64)
    for _, g in od.groupby("o_custkey"):
        if len(g) < 2:
            continue
        g = g.sort_values("o_orderkey")
        d = g["day"].to_numpy(np.int64)
        k = len(d)
        inv = sum(
            int(d[i] > d[j]) for i in range(k) for j in range(i + 1, k)
        )
        cnt[(20 * inv) // (k * (k - 1))] += 1
    nz = np.flatnonzero(cnt)
    exp = pd.DataFrame({"decile": nz.astype(np.int64), "n_customers": cnt[nz]})
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

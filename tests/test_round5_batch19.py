"""Round-5 batch-19 operator tests: Q21-shaped order-blocker audit,
sorted-neighborhood blocking pairs, int8 embedding-quantization error
— brute recomputes at sf0.001."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_order_blocker_suppliers_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import q_order_blocker_suppliers

    got = q_order_blocker_suppliers(SF)
    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_suppkey", "l_shipdate"]
    ).to_pandas()
    li["sd"] = li["l_shipdate"].astype("int64")
    ls = li.groupby(["l_orderkey", "l_suppkey"], as_index=False)["sd"].max()
    numwait: dict[int, int] = {}
    for _, g in ls.groupby("l_orderkey"):
        if len(g) < 2:
            continue
        mx = g["sd"].max()
        winners = g.loc[g["sd"] == mx, "l_suppkey"]
        if len(winners) == 1:
            k = int(winners.iloc[0])
            numwait[k] = numwait.get(k, 0) + 1
    sup = pd.read_parquet(
        f"{SF}/supplier.parquet", columns=["s_suppkey", "s_name", "s_nationkey"]
    )
    nat = pd.read_parquet(f"{SF}/nation.parquet", columns=["n_nationkey", "n_name"])
    exp = pd.DataFrame(
        {"s_suppkey": list(numwait), "numwait": [numwait[k] for k in numwait]}
    )
    exp = exp.merge(sup, on="s_suppkey").merge(
        nat, left_on="s_nationkey", right_on="n_nationkey"
    )
    exp = (
        exp.sort_values(["numwait", "s_name"], ascending=[False, True])
        .head(20)[["s_suppkey", "s_name", "n_name", "numwait"]]
        .reset_index(drop=True)
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_sorted_neighborhood_pairs_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import (
        _SNB_W,
        q_sorted_neighborhood_pairs,
    )

    got = q_sorted_neighborhood_pairs(SF)
    c = pd.read_parquet(
        f"{SF}/customer.parquet", columns=["c_custkey", "c_acctbal", "c_nationkey"]
    )
    c["bal"] = np.rint(c["c_acctbal"].to_numpy() * 100.0).astype(np.int64)
    c = c.sort_values(["bal", "c_custkey"], ignore_index=True)
    bal = c["bal"].to_numpy(np.int64)
    nk = c["c_nationkey"].to_numpy(np.int64)
    exp = pd.DataFrame(
        {
            "d": np.arange(1, _SNB_W + 1, dtype=np.int64),
            "n_pairs": [max(0, len(bal) - d) for d in range(1, _SNB_W + 1)],
            "same_nation": [
                int((nk[d:] == nk[:-d]).sum()) for d in range(1, _SNB_W + 1)
            ],
            "sum_absdiff_e2": [
                int(np.abs(bal[d:] - bal[:-d]).sum()) for d in range(1, _SNB_W + 1)
            ],
        }
    )
    assert got["n_pairs"].sum() > 0
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_sorted_neighborhood_cross_bucket_edges(ray_session, monkeypatch):
    # force tiny buckets so nearly every pair crosses a bucket boundary:
    # the edge-row reconstruction must still produce exact global ranks
    import simplepolygon_ray.relational.queries as q

    monkeypatch.setattr(q, "_SNB_SHIFT", 0)
    got = q.q_sorted_neighborhood_pairs(SF)
    monkeypatch.setattr(q, "_SNB_SHIFT", 20)  # one giant bucket: all internal
    exp = q.q_sorted_neighborhood_pairs(SF)
    pd.testing.assert_frame_equal(got, exp)


def test_embedding_quant_error_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import q_embedding_quant_error

    got = q_embedding_quant_error(SF)
    emb = pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])
    col = emb["embedding"].combine_chunks()
    width = len(col[0])
    m = np.asarray(col.values, dtype=np.float64).reshape(-1, width)
    e = np.floor(m * 1e6).astype(np.int64)
    am = np.maximum(np.abs(e).max(axis=0), 1)
    qq = np.floor_divide(e * 127, am)
    dq = np.floor_divide(qq * am, 127)
    err = e - dq
    assert (err >= 0).all()  # floor quantization never overshoots
    assert (np.abs(qq) <= 127).all()  # int8-representable by construction
    exp = pd.DataFrame(
        {
            "dim": np.arange(width, dtype=np.int64),
            "absmax_e6": am,
            "n": np.full(width, len(e), np.int64),
            "sum_err": err.sum(axis=0),
            "sum_sq_err": (err * err).sum(axis=0),
            "max_err": err.max(axis=0),
        }
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

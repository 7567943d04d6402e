"""Round-5 batch-44 operator test: Q5-shaped local-supplier revenue —
brute recompute at sf0.001."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_local_supplier_revenue_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import q_local_supplier_revenue

    got = q_local_supplier_revenue(SF)
    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).to_pandas()
    od = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).to_pandas()
    cu = pq.read_table(
        f"{SF}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    su = pq.read_table(
        f"{SF}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pandas()
    na = pq.read_table(
        f"{SF}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    ).to_pandas()
    re = pq.read_table(
        f"{SF}/region.parquet", columns=["r_regionkey", "r_name"]
    ).to_pandas()
    m = (
        li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
        .merge(cu, left_on="o_custkey", right_on="c_custkey")
        .merge(su, left_on="l_suppkey", right_on="s_suppkey")
    )
    m = m[m["c_nationkey"] == m["s_nationkey"]]
    m = m.merge(na, left_on="c_nationkey", right_on="n_nationkey").merge(
        re, left_on="n_regionkey", right_on="r_regionkey"
    )
    m["rev"] = np.rint(
        m["l_extendedprice"] * (1.0 - m["l_discount"]) * 1e4
    ).astype(np.int64)
    want = (
        m.groupby("r_name", as_index=False)["rev"]
        .sum()
        .rename(columns={"rev": "revenue_e4"})
        .sort_values("r_name", ignore_index=True)
        .astype({"revenue_e4": np.int64})
    )
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want)

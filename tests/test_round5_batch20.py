"""Round-5 batch-20 operator tests: daily fulfillment-backlog peaks,
Zipf-tail hapax audit, balance×spend decile mobility matrix — brute
recomputes at sf0.001."""

import re

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_orders_backlog_peak_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import (
        _DAY_US_BACKLOG,
        q_orders_backlog_peak,
    )

    got = q_orders_backlog_peak(SF)
    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).to_pandas()
    od = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).to_pandas()
    li["ed"] = li["l_shipdate"].astype("int64") // _DAY_US_BACKLOG
    od["sd"] = od["o_orderdate"].astype("int64") // _DAY_US_BACKLOG
    ends = li.groupby("l_orderkey", as_index=False)["ed"].max()
    iv = od.merge(ends, left_on="o_orderkey", right_on="l_orderkey")
    deltas: dict[int, int] = {}
    for sd, ed in zip(iv["sd"], iv["ed"]):
        deltas[int(sd)] = deltas.get(int(sd), 0) + 1
        deltas[int(ed) + 1] = deltas.get(int(ed) + 1, 0) - 1
    days = sorted(deltas)
    backlog = np.cumsum([deltas[d] for d in days])
    exp = (
        pd.DataFrame({"day": days, "backlog": backlog})
        .sort_values(["backlog", "day"], ascending=[False, True], kind="mergesort")
        .head(10)
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_lang_hapax_share_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import q_lang_hapax_share

    got = q_lang_hapax_share(SF)
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["lang", "text"]).to_pandas()
    counts: dict[tuple[str, str], int] = {}
    for lang, text in zip(docs["lang"], docs["text"]):
        for tok in re.split(r"\s+", text.lower()):
            if tok:
                counts[(lang, tok)] = counts.get((lang, tok), 0) + 1
    rows: dict[str, list[int]] = {}
    for (lang, _), n in counts.items():
        r = rows.setdefault(lang, [0, 0, 0, 0, 0])
        r[0] += 1
        r[1] += 1 if n == 1 else 0
        r[2] += 1 if n == 2 else 0
        r[3] += n
        r[4] += 1 if n == 1 else 0
    exp = pd.DataFrame(
        {
            "lang": sorted(rows),
            "vocab": [rows[k][0] for k in sorted(rows)],
            "n_hapax": [rows[k][1] for k in sorted(rows)],
            "n_dis": [rows[k][2] for k in sorted(rows)],
            "total_occ": [rows[k][3] for k in sorted(rows)],
            "hapax_occ": [rows[k][4] for k in sorted(rows)],
        }
    )
    assert got["vocab"].sum() > 0
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_balance_spend_decile_matrix_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import q_balance_spend_decile_matrix

    got = q_balance_spend_decile_matrix(SF)
    cust = pd.read_parquet(
        f"{SF}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    )
    od = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    cust["bal"] = np.rint(cust["c_acctbal"].to_numpy() * 100.0).astype(np.int64)
    od["cents"] = np.rint(od["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
    spend = od.groupby("o_custkey")["cents"].sum()
    df = cust[["c_custkey", "bal"]].copy()
    df["spend"] = df["c_custkey"].map(spend).fillna(0).astype(np.int64)
    n = len(df)
    df = df.sort_values(["bal", "c_custkey"], ignore_index=True)
    df["bd"] = np.arange(n, dtype=np.int64) * 10 // n
    df = df.sort_values(["spend", "c_custkey"], ignore_index=True)
    df["sd"] = np.arange(n, dtype=np.int64) * 10 // n
    exp = (
        df.groupby(["bd", "sd"], as_index=False)
        .size()
        .rename(
            columns={"bd": "bal_decile", "sd": "spend_decile", "size": "n_customers"}
        )
        .sort_values(["bal_decile", "spend_decile"], ignore_index=True)
    )
    assert got["n_customers"].sum() == n
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # deciles are balanced to within bucket-boundary rounding
    per_bd = got.groupby("bal_decile")["n_customers"].sum()
    assert per_bd.max() - per_bd.min() <= 1

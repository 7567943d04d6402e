"""Round-5 batch-21 operator tests: fulfilled-keyspace gaps-and-islands
fold, char-bigram OOV-rate audit, order-interarrival burstiness classes
— brute recomputes at sf0.001."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _brute_islands(keys: np.ndarray) -> dict[str, int]:
    k = np.sort(keys)
    d = np.diff(k)
    brk = np.flatnonzero(d > 1)
    lens = np.diff(np.r_[0, brk + 1, len(k)])
    gaps = d[brk] - 1
    return {
        "n_keys": len(k),
        "n_runs": len(lens),
        "longest_run": int(lens.max()),
        "max_gap": int(gaps.max()) if len(gaps) else 0,
        "sum_gap": int(gaps.sum()) if len(gaps) else 0,
    }


def test_fulfilled_keyspace_islands_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import q_fulfilled_keyspace_islands

    got = q_fulfilled_keyspace_islands(SF)
    od = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_orderstatus"]
    ).to_pandas()
    keys = od.loc[od["o_orderstatus"] == "F", "o_orderkey"].to_numpy(np.int64)
    exp = _brute_islands(keys)
    assert len(got) == 1
    for col, val in exp.items():
        assert int(got[col].iloc[0]) == val, col
    assert exp["n_runs"] > 1  # the filtered keyspace is genuinely fragmented


def test_islands_fold_handles_boundary_joins(ray_session, monkeypatch):
    # shrink buckets to 4 keyspace slots so nearly every run crosses a
    # bucket edge: the driver fold must still merge them exactly
    from simplepolygon_ray.relational import queries as q

    monkeypatch.setattr(q, "_ISL_SHIFT", 2)
    got = q.q_fulfilled_keyspace_islands(SF)
    od = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_orderstatus"]
    ).to_pandas()
    keys = od.loc[od["o_orderstatus"] == "F", "o_orderkey"].to_numpy(np.int64)
    exp = _brute_islands(keys)
    for col, val in exp.items():
        assert int(got[col].iloc[0]) == val, col
    # sanity of the brute helper itself on a hand-counted case
    assert _brute_islands(np.array([5, 6, 1022, 1023, 1024, 1025, 1026, 4000])) == {
        "n_keys": 8,
        "n_runs": 3,
        "longest_run": 5,
        "max_gap": 2973,
        "sum_gap": 2973 + 1015,
    }


def test_char_bigram_oov_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import _OOV_TOP, q_char_bigram_oov

    got = q_char_bigram_oov(SF)
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["lang", "text"]).to_pandas()
    cnt: dict[int, int] = {}
    for text in docs["text"]:
        b = text.encode()
        for i in range(len(b) - 1):
            code = b[i] * 256 + b[i + 1]
            cnt[code] = cnt.get(code, 0) + 1
    top = set(
        sorted(cnt, key=lambda c: (-cnt[c], c))[:_OOV_TOP]
    )
    rows: dict[str, list[int]] = {}
    for lang, text in zip(docs["lang"], docs["text"]):
        b = text.encode()
        tot = max(len(b) - 1, 0)
        if tot == 0:
            continue
        oov = sum(
            1 for i in range(len(b) - 1) if b[i] * 256 + b[i + 1] not in top
        )
        r = rows.setdefault(lang, [0, 0, 0, 0])
        r[0] += 1
        r[1] += tot
        r[2] += oov
        r[3] += oov * 1_000_000 // tot
    exp = pd.DataFrame(
        {
            "lang": sorted(rows),
            "n_docs": [rows[k][0] for k in sorted(rows)],
            "total_bigrams": [rows[k][1] for k in sorted(rows)],
            "oov_bigrams": [rows[k][2] for k in sorted(rows)],
            "sum_oov_rate_e6": [rows[k][3] for k in sorted(rows)],
        }
    )
    assert got["oov_bigrams"].sum() > 0  # top-64 cut leaves real OOV mass
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_order_burstiness_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import _BURST_DAY_US, q_order_burstiness

    got = q_order_burstiness(SF)
    od = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_orderdate", "o_orderkey"]
    ).to_pandas()
    od["day"] = od["o_orderdate"].astype("int64") // _BURST_DAY_US
    agg: dict[str, list[int]] = {}
    for _, g in od.sort_values(["day", "o_orderkey"]).groupby("o_custkey"):
        d = np.diff(g["day"].to_numpy(np.int64))
        if len(d) < 3:
            continue
        n, s1, s2 = len(d), int(d.sum()), int((d * d).sum())
        dd = n * s2 - s1 * s1
        if dd > s1 * s1:
            cls = "bursty"
        elif 4 * dd <= s1 * s1:
            cls = "regular"
        else:
            cls = "mid"
        r = agg.setdefault(cls, [0, 0])
        r[0] += 1
        r[1] += n
    exp = pd.DataFrame(
        {
            "cls": sorted(agg),
            "n_customers": [agg[k][0] for k in sorted(agg)],
            "n_intervals": [agg[k][1] for k in sorted(agg)],
        }
    )
    assert exp["n_customers"].sum() > 0
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

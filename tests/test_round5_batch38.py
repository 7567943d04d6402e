"""Round-5 batch-38 operator tests: vocabulary drift between halves,
user-activity Gini from count-of-counts — brute recomputes at
sf0.001."""

import re

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_vocab_drift_l1_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import q_vocab_drift_l1

    got = q_vocab_drift_l1(SF)
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "lang", "text"]
    ).to_pandas()
    df = {}
    for did, lang, text in zip(docs["doc_id"], docs["lang"], docs["text"]):
        half = did % 2
        toks = {t for t in re.split(r"\s+", text.lower()) if t}
        for t in toks:
            k = (lang, t)
            d = df.setdefault(k, [0, 0])
            d[half] += 1
    rows = {}
    for (lang, _t), (d0, d1) in df.items():
        r = rows.setdefault(lang, [0, 0, 0, 0])
        r[0] += abs(d0 - d1)
        r[1] += 1 if (d0 > 0 and d1 == 0) else 0
        r[2] += 1 if (d1 > 0 and d0 == 0) else 0
        r[3] += 1
    want = pd.DataFrame(
        [(lang, *r) for lang, r in sorted(rows.items())],
        columns=["lang", "l1_df", "n_only_even", "n_only_odd", "vocab_size"],
    ).astype(
        {
            "l1_df": np.int64,
            "n_only_even": np.int64,
            "n_only_odd": np.int64,
            "vocab_size": np.int64,
        }
    )
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want)


def test_events_gini_users_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import q_events_gini_users

    got = q_events_gini_users(SF)
    ev = pq.read_table(f"{SF}/events.parquet", columns=["user_id"]).to_pandas()
    _, c = np.unique(ev["user_id"].to_numpy(np.int64), return_counts=True)
    x = np.sort(c.astype(np.int64))
    n = len(x)
    i = np.arange(1, n + 1, dtype=np.int64)
    num = int(((2 * i - n - 1) * x).sum())
    assert got["n_users"][0] == n
    assert got["sum_events"][0] == int(x.sum())
    assert got["gini_num"][0] == num
    assert 0 <= num <= n * int(x.sum())

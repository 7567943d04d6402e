"""Relational catalog vs DuckDB oracle at sf0.001 (fast in-suite gate;
the driver runs the same comparison at sf0.01)."""

import duckdb
import pandas as pd
import pytest

from simplepolygon_ray.relational.queries import ORACLE_SQL, QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(ray_session, con, name):
    res = QUERIES[name](SF_DIR)
    ray_df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    sql_df = con.execute(ORACLE_SQL[name]).fetchdf()
    assert sorted(ray_df.columns) == sorted(sql_df.columns)
    a, b = canon(ray_df), canon(sql_df)
    assert len(a) == len(b)
    for c in a.columns:
        assert str(a[c].dtype) == str(b[c].dtype), f"dtype mismatch on {c}"
        assert a[c].equals(b[c]), f"values differ on {c}"


def test_range_join_window_edges(ray_session):
    """Boundary semantics vs brute force: b.ts > a.ts - W (strict) and
    b.ts <= a.ts (inclusive), self excluded, equal timestamps count."""
    import numpy as np
    import ray.data as rd

    from simplepolygon_ray.relational.queries import _RANGE_WIN_US, q_range_join_user_window

    rng = np.random.RandomState(3)
    n = 400
    uid = rng.randint(0, 7, n).astype(np.int64)
    base = np.int64(1_700_000_000_000_000)
    ts = base + rng.randint(0, 6 * _RANGE_WIN_US, n).astype(np.int64)
    # force exact-boundary and duplicate timestamps
    ts[1] = ts[0]
    uid[1] = uid[0]
    ts[3] = ts[2] - _RANGE_WIN_US  # exactly W before: excluded (strict >)
    uid[3] = uid[2]

    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "user_id": pa.array(uid),
            "ts": pa.array(ts).cast(pa.timestamp("us")),
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(tbl, os.path.join(d, "events.parquet"))
        got = (
            q_range_join_user_window(d)
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )

    want = {}
    for i in range(n):
        c = 0
        for j in range(n):
            if i == j or uid[j] != uid[i]:
                continue
            if ts[j] > ts[i] - _RANGE_WIN_US and ts[j] <= ts[i]:
                c += 1
        if c:
            want[uid[i]] = want.get(uid[i], 0) + c
    assert dict(zip(got["user_id"], got["n_pairs"])) == want


def test_bloom_no_false_negatives_and_prunes():
    """Bloom prefilter contract: every true key passes (exactness of
    the semi join relies on it) and non-keys are overwhelmingly
    pruned (5k keys in 2^17 bits at k=4 → ~0.4% fp expected)."""
    import numpy as np

    from simplepolygon_ray.relational.queries import _BLOOM_M, _bloom_words

    keys = np.random.RandomState(7).randint(0, 1 << 40, 5000).astype(np.int64)
    bits = np.zeros(_BLOOM_M // 64, np.uint64)
    for w, b in _bloom_words(keys):
        np.bitwise_or.at(bits, w.astype(np.int64), np.uint64(1) << b)

    def member(arr):
        m = np.ones(len(arr), bool)
        for w, b in _bloom_words(arr):
            m &= ((bits[w.astype(np.int64)] >> b) & np.uint64(1)).astype(bool)
        return m

    assert member(keys).all()
    others = np.arange(1 << 41, (1 << 41) + 20000).astype(np.int64)
    assert member(others).mean() < 0.05

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


def test_exact_quantiles_skewed_bounded_pull(ray_session):
    """VERDICT r4 item 4: with the pull cap forced tiny, a value-skewed
    distribution (10^6 copies of one value — what prices do) must still
    resolve exactly: the recursion descends the histogram to shift 0,
    where the heavy bucket IS a single value and resolves with no
    driver pull at all."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from simplepolygon_ray.relational.queries import _resolve_exact_quantiles

    heavy = np.full(1_000_000, 123_456_789, np.int64)
    spread = np.arange(50_000, dtype=np.int64) * 97 + 1
    v = np.concatenate([heavy, spread])
    np.random.RandomState(0).shuffle(v)
    ds = rd.from_arrow(pa.table({"v": pa.array(v)}))

    got = _resolve_exact_quantiles(ds, [25, 50, 75, 90, 99], cap=100)
    sv = np.sort(v)
    n = len(v)
    assert len(got) == 5
    for _g, q, val in got:
        r = (q * n + 99) // 100
        assert val == int(sv[r - 1]), f"q={q}"


def test_group_quantiles_skewed_bounded_pull(ray_session):
    """Grouped form of the bounded-pull recursion: one heavy-skew group
    and one spread group resolve exactly under a tiny cap."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from simplepolygon_ray.relational.queries import _resolve_exact_quantiles

    va = np.full(200_000, 777_777, np.int64)
    vb = (np.arange(30_000, dtype=np.int64) * 13 + 5) % 1_000_000
    v = np.concatenate([va, vb])
    g = np.array(["hot"] * len(va) + ["cold"] * len(vb), object)
    order = np.random.RandomState(1).permutation(len(v))
    ds = rd.from_arrow(
        pa.table({"event_type": pa.array(g[order]), "v": pa.array(v[order])})
    )

    got = _resolve_exact_quantiles(ds, [50, 90], group_col="event_type", cap=50)
    by_grp = {"hot": np.sort(va), "cold": np.sort(vb)}
    assert len(got) == 4
    for grp, q, val in got:
        sv = by_grp[grp]
        r = (q * len(sv) + 99) // 100
        assert val == int(sv[r - 1]), f"{grp} q={q}"

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

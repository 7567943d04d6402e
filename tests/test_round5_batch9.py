"""Round-5 batch-9 operator tests: the two-phase exact-NN escalation
and the reconciliation band kernel."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_nn_quantiles_straggler_escalation_equivalence(ray_session, monkeypatch):
    """With GRAFT_NN_SHIFT forced tiny (512-unit phase-1 cells), almost
    every point misses its 3×3 neighborhood and escalates to the
    phase-2 full scan — the result must equal the default run where
    phase 1 resolves nearly everything locally."""
    from simplepolygon_ray.pipelines.catalog import q_nn_dist_quantiles

    base = q_nn_dist_quantiles(SF)
    monkeypatch.setenv("GRAFT_NN_SHIFT", "9")
    forced = q_nn_dist_quantiles(SF)
    pd.testing.assert_frame_equal(base, forced)


def test_reconciliation_bands_match_brute(ray_session):
    """The tagged-union banded diff equals a pandas join recompute."""
    import duckdb

    from simplepolygon_ray.relational.queries import (
        q_order_amount_reconciliation,
    )

    got = (
        q_order_amount_reconciliation(SF)
        .to_pandas()
        .sort_values("band")
        .reset_index(drop=True)
    )
    od = duckdb.sql(f"SELECT * FROM read_parquet('{SF}/orders.parquet')").df()
    li = duckdb.sql(f"SELECT * FROM read_parquet('{SF}/lineitem.parquet')").df()
    li["g"] = np.rint(
        li["l_extendedprice"].to_numpy()
        * (1.0 + li["l_tax"].to_numpy())
        * (1.0 - li["l_discount"].to_numpy())
        * 100.0
    ).astype(np.int64)
    ls = li.groupby("l_orderkey")["g"].sum()
    t = np.rint(od["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
    s = ls.reindex(od["o_orderkey"]).fillna(0).to_numpy(np.int64)
    diff = np.abs(t - s)
    band = np.select([diff == 0, diff <= 100, diff <= 10_000], [0, 1, 2], 3)
    u, c = np.unique(band, return_counts=True)
    exp = pd.DataFrame({"band": u.astype(np.int64), "n_orders": c.astype(np.int64)})
    pd.testing.assert_frame_equal(got, exp)

"""Round-5 batch-11 operator tests: KS numerator vs the float EDF
definition, Mann-Kendall vs an explicit pair loop."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_ks_numerator_matches_float_edf(ray_session):
    """num / (n_a·n_b) must equal max_h |F_a(h) − F_b(h)| computed
    straight from the raw per-hour EDFs in float."""
    import duckdb

    from simplepolygon_ray.relational.queries import q_ks_event_type_drift

    out = q_ks_event_type_drift(SF)
    df = duckdb.sql(
        f"SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS h, event_type "
        f"FROM read_parquet('{SF}/events.parquet') "
        f"WHERE event_type IN ('click','purchase')"
    ).df()
    ha = np.sort(df.loc[df["event_type"] == "click", "h"].to_numpy(np.int64))
    hb = np.sort(df.loc[df["event_type"] == "purchase", "h"].to_numpy(np.int64))
    hours = np.unique(np.concatenate([ha, hb]))
    fa = np.searchsorted(ha, hours, side="right") / len(ha)
    fb = np.searchsorted(hb, hours, side="right") / len(hb)
    d_float = np.abs(fa - fb).max()
    got = int(out["ks_num"].iloc[0]) / (len(ha) * len(hb))
    assert abs(got - d_float) < 1e-12
    assert int(out["n_click"].iloc[0]) == len(ha)
    assert int(out["n_purchase"].iloc[0]) == len(hb)


def test_mann_kendall_matches_pair_loop(ray_session):
    """S from the vectorized triangle fold equals the textbook
    double loop on the real daily series."""
    import duckdb

    from simplepolygon_ray.relational.queries import q_mk_trend_daily_orders

    out = q_mk_trend_daily_orders(SF)
    daily = duckdb.sql(
        f"SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day, "
        f"COUNT(*) AS n FROM read_parquet('{SF}/orders.parquet') "
        f"GROUP BY day ORDER BY day"
    ).df()["n"].to_numpy(np.int64)
    s = nc = nd = 0
    for i in range(len(daily)):
        for j in range(i + 1, len(daily)):
            if daily[j] > daily[i]:
                nc += 1
            elif daily[j] < daily[i]:
                nd += 1
    assert int(out["n_days"].iloc[0]) == len(daily)
    assert int(out["n_concordant"].iloc[0]) == nc
    assert int(out["n_discordant"].iloc[0]) == nd
    assert int(out["s_stat"].iloc[0]) == nc - nd

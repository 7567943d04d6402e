"""Round-5 batch-31 operator tests: Markov power counts, Q14-shaped
promo revenue share, geo ring compactness — brute recomputes at
sf0.001."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_markov_power_counts_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import _ETYPES, q_markov_power_counts

    got = q_markov_power_counts(SF)
    ev = (
        pq.read_table(
            f"{SF}/events.parquet",
            columns=["user_id", "event_id", "ts", "event_type"],
        )
        .to_pandas()
        .sort_values(["user_id", "ts", "event_id"], ignore_index=True)
    )
    ne = len(_ETYPES)
    idx = {t: k for k, t in enumerate(_ETYPES)}
    M = np.zeros((ne, ne), np.int64)
    u = ev["user_id"].to_numpy()
    c = ev["event_type"].map(idx).to_numpy(np.int64)
    for i in range(1, len(ev)):
        if u[i] == u[i - 1]:
            M[c[i - 1], c[i]] += 1
    v = np.ones(ne, dtype=object)
    powers = []
    for _ in range(3):
        v = M.T.astype(object) @ v
        powers.append(v.copy())
    for k, t in enumerate(sorted(_ETYPES)):
        row = got[got["event_type"] == t].iloc[0]
        j = idx[t]
        assert row["v1"] == str(powers[0][j])
        assert row["v2"] == str(powers[1][j])
        assert row["v3"] == str(powers[2][j])


def test_promo_revenue_share_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import (
        _Q14_DAY_HI,
        _Q14_DAY_LO,
        q_promo_revenue_share,
    )

    got = q_promo_revenue_share(SF)
    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).to_pandas()
    part = pq.read_table(
        f"{SF}/part.parquet", columns=["p_partkey", "p_type"]
    ).to_pandas()
    day = li["l_shipdate"].astype("datetime64[us]").astype("int64") // (86_400 * 10**6)
    li = li[(day >= _Q14_DAY_LO) & (day < _Q14_DAY_HI)]
    m = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    rev = np.rint(
        m["l_extendedprice"].to_numpy() * (1.0 - m["l_discount"].to_numpy()) * 1e4
    ).astype(np.int64)
    promo = m["p_type"].str.startswith("PROMO").to_numpy()
    assert got["promo_rev_e4"][0] == int(rev[promo].sum())
    assert got["total_rev_e4"][0] == int(rev.sum())
    assert got["n_promo_items"][0] == int(promo.sum())
    assert got["n_items"][0] == len(m)


def test_geo_compactness_matches_brute(ray_session):
    from simplepolygon_ray.pipelines.catalog import (
        _simple_rings_cached,
        q_geo_compactness,
    )

    got = (
        q_geo_compactness(SF)
        .to_pandas()
        .sort_values(["geom_id", "ring_seq"], ignore_index=True)
    )
    rings = (
        _simple_rings_cached(SF)
        .to_pandas()
        .sort_values(["geom_id", "ring_seq"], ignore_index=True)
    )
    assert len(got) == len(rings) > 0
    for i in range(min(50, len(rings))):
        ring = np.vstack([np.asarray(v, np.float64) for v in rings["ring"][i]])
        if len(ring) > 1 and (ring[0] == ring[-1]).all():
            ring = ring[:-1]
        xi = np.floor(ring[:, 0] * 1e5).astype(np.int64)
        yi = np.floor(ring[:, 1] * 1e5).astype(np.int64)
        a2 = abs(int((xi * np.roll(yi, -1) - np.roll(xi, -1) * yi).sum()))
        dx = xi[:, None] - xi[None, :]
        dy = yi[:, None] - yi[None, :]
        d2 = int((dx * dx + dy * dy).max())
        want = (a2 * 1000) // d2 if d2 > 0 else 0
        assert got["compactness_e3"][i] == want
    # the isoperimetric-ish bound: a disc scores pi/2*1000 ~ 1571
    assert (got["compactness_e3"] <= 1600).all()

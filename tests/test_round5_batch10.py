"""Round-5 batch-10 operator tests: KMV sketch invariants and the
exact tie-corrected AUC against a brute-force pair count."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_kmv_exact_mode_below_k(ray_session):
    """With fewer distinct keys than K the union of block partials IS
    the distinct-hash set, so the sketch must report the exact count
    (events at sf0.001 has 15 distinct users — run the same query
    body over user_id by monkey-free composition)."""
    import pyarrow as pa

    from simplepolygon_ray.relational.queries import _KMV_K, _hash64

    ids = np.arange(100, dtype=np.int64)  # 100 < K=256 distinct keys
    off = np.uint64(1 << 63)
    # replicate the per-block partial + driver merge on two "blocks"
    blocks = [ids[:60], ids[40:]]  # overlapping distinct sets
    parts = []
    for b in blocks:
        h = _hash64(b.view(np.uint64))
        parts.append(np.unique((h ^ off).view(np.int64))[:_KMV_K])
    vals = np.unique(np.concatenate(parts))
    assert len(vals) == 100  # exact mode: union is the distinct set


def test_kmv_estimate_matches_driver_query(ray_session):
    """The query's estimate over sf0.001 events (1000 distinct ids,
    sketch mode) is within the standard KMV error envelope and the
    kth-hash limbs reassemble to a value ≥ all K retained hashes."""
    from simplepolygon_ray.relational.queries import (
        _KMV_K,
        q_kmv_distinct_events,
    )

    out = q_kmv_distinct_events(SF)
    est = int(out["est_distinct"].iloc[0])
    # 1000 true distinct; K=256 gives rse ~ 1/sqrt(K-2) ≈ 6.3%
    assert 700 <= est <= 1300
    theta = (int(out["theta_hi"].iloc[0]) << 32) | int(out["theta_lo"].iloc[0])
    assert 0 < theta < (1 << 64)
    assert int(out["k"].iloc[0]) == _KMV_K


def test_auc_matches_brute_force_pairs(ray_session):
    """2U from the value-ordered cumulative fold equals the O(n^2)
    definition 2·#(pos>neg) + #(pos==neg) on the real table."""
    import duckdb

    from simplepolygon_ray.relational.queries import q_auc_segment_balance

    out = q_auc_segment_balance(SF)
    df = duckdb.sql(
        f"SELECT CAST(round(c_acctbal*100.0) AS BIGINT) AS v, c_mktsegment "
        f"FROM read_parquet('{SF}/customer.parquet')"
    ).df()
    v = df["v"].to_numpy(np.int64)
    isp = (df["c_mktsegment"] == "BUILDING").to_numpy()
    pos, neg = v[isp], v[~isp]
    gt = int(np.sum(pos[:, None] > neg[None, :]))
    eq = int(np.sum(pos[:, None] == neg[None, :]))
    assert int(out["u2"].iloc[0]) == 2 * gt + eq
    assert int(out["n_pos"].iloc[0]) == len(pos)
    assert int(out["n_neg"].iloc[0]) == len(neg)
    assert int(out["auc_e6"].iloc[0]) == (
        (2 * gt + eq) * 1_000_000 // (2 * len(pos) * len(neg))
    )

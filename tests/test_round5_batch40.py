"""Round-5 batch-40 operator tests: part-supplier fan-out histogram,
round-number bias audit — brute recomputes at sf0.001."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_part_supplier_fanout_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import q_part_supplier_fanout

    got = q_part_supplier_fanout(SF)
    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    ).to_pandas()
    fan = li.groupby("l_partkey")["l_suppkey"].nunique().to_numpy(np.int64)
    u, c = np.unique(fan, return_counts=True)
    want = pd.DataFrame(
        {"n_suppliers": u.astype(np.int64), "n_parts": c.astype(np.int64)}
    )
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want)


def test_value_round_bias_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import q_value_round_bias

    got = (
        q_value_round_bias(SF)
        .to_pandas()
        .sort_values("event_type", ignore_index=True)
        .astype(
            {
                "n_mult_1": np.int64,
                "n_mult_05": np.int64,
                "n_mult_01": np.int64,
                "n_events": np.int64,
            }
        )
    )
    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["event_type", "value"]
    ).to_pandas()
    v = np.rint(ev["value"] * 10_000).astype(np.int64)
    want = (
        pd.DataFrame(
            {
                "event_type": ev["event_type"],
                "n_mult_1": (v % 10_000 == 0).astype(np.int64),
                "n_mult_05": (v % 5_000 == 0).astype(np.int64),
                "n_mult_01": (v % 1_000 == 0).astype(np.int64),
                "n_events": 1,
            }
        )
        .groupby("event_type", as_index=False)
        .sum()
        .sort_values("event_type", ignore_index=True)
        .astype(
            {
                "n_mult_1": np.int64,
                "n_mult_05": np.int64,
                "n_mult_01": np.int64,
                "n_events": np.int64,
            }
        )
    )
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want)
    # nesting: multiples of 1.0 are multiples of 0.5 are multiples of 0.1
    assert (got["n_mult_1"] <= got["n_mult_05"]).all()
    assert (got["n_mult_05"] <= got["n_mult_01"]).all()

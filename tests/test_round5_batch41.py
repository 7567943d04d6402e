"""Round-5 batch-41 operator tests: geo vertex valence census, exact
shift-decayed value sums — brute recomputes at sf0.001."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_geo_vertex_valence_matches_brute(ray_session):
    from simplepolygon_ray.pipelines.catalog import (
        _simple_rings_cached,
        _verts_batch,
        q_geo_vertex_valence,
    )

    got = (
        q_geo_vertex_valence(SF)
        .to_pandas()
        .sort_values("geom_id", ignore_index=True)
        .astype(
            {
                "n_vertices": np.int64,
                "n_valence1": np.int64,
                "n_split_points": np.int64,
            }
        )
    )
    v = (
        _simple_rings_cached(SF)
        .map_batches(_verts_batch, batch_format="pyarrow")
        .to_pandas()
    )
    v["xi"] = np.floor(v["x"] * 1e5).astype(np.int64)
    v["yi"] = np.floor(v["y"] * 1e5).astype(np.int64)
    val = (
        v[["geom_id", "ring_seq", "xi", "yi"]]
        .drop_duplicates()
        .groupby(["geom_id", "xi", "yi"])["ring_seq"]
        .nunique()
        .reset_index(name="k")
    )
    want = (
        val.groupby("geom_id")
        .agg(
            n_vertices=("k", "size"),
            n_valence1=("k", lambda s: int((s == 1).sum())),
            n_split_points=("k", lambda s: int((s >= 2).sum())),
        )
        .reset_index()
        .sort_values("geom_id", ignore_index=True)
        .astype(
            {
                "n_vertices": np.int64,
                "n_valence1": np.int64,
                "n_split_points": np.int64,
            }
        )
    )
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want)
    # decompose creates split points somewhere in the corpus
    assert got["n_split_points"].sum() > 0


def test_decayed_value_sum_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import (
        _DECAY_MAX_SHIFT,
        _DECAY_WEEK_US,
        q_decayed_value_sum,
    )

    got = (
        q_decayed_value_sum(SF)
        .to_pandas()
        .sort_values("event_type", ignore_index=True)
        .astype({"decayed_e4": np.int64, "raw_e4": np.int64, "n_events": np.int64})
    )
    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["event_type", "ts", "value"]
    ).to_pandas()
    ts = ev["ts"].astype("datetime64[us]").astype("int64").to_numpy(np.int64)
    v = np.rint(ev["value"] * 10_000).astype(np.int64).to_numpy()
    now = int(ts.max())
    age = np.minimum((now - ts) // _DECAY_WEEK_US, _DECAY_MAX_SHIFT)
    dec = v >> age
    want = (
        pd.DataFrame(
            {
                "event_type": ev["event_type"],
                "decayed_e4": dec,
                "raw_e4": v,
                "n_events": 1,
            }
        )
        .groupby("event_type", as_index=False)
        .sum()
        .sort_values("event_type", ignore_index=True)
        .astype({"decayed_e4": np.int64, "raw_e4": np.int64, "n_events": np.int64})
    )
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want)
    assert (got["decayed_e4"] <= got["raw_e4"]).all()

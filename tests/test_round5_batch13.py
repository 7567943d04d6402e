"""Round-5 batch-13 operator tests: the iterative-graph pair (BFS
layers, k-core peeling), time-weighted averages, holistic/recurrence
windows, >int64 moment folds, independence deviations, anti-entropy
bucket hashes, SAT quadrants and power iteration — each checked
against an independent brute-force recompute or a structural
invariant at sf0.001."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_bfs_layers_partition_the_node_set(ray_session):
    from simplepolygon_ray.relational.queries import (
        q_bfs_layers_copurchase,
        q_kcore_copurchase,
    )

    bfs = q_bfs_layers_copurchase(SF)
    assert int(bfs.loc[bfs["hop"] == 0, "n_parts"].iloc[0]) == 1
    total = int(bfs["n_parts"].sum())
    kc = q_kcore_copurchase(SF)
    # round 0 of the peel is the full node set — same graph, same total
    assert int(kc.loc[kc["round"] == 0, "n_nodes"].iloc[0]) == total
    # peeling is monotone non-increasing
    nn = kc.sort_values("round")["n_nodes"].to_numpy(np.int64)
    assert (np.diff(nn) <= 0).all()


def test_time_weighted_avg_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import q_time_weighted_avg_value

    got = (
        q_time_weighted_avg_value(SF)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "event_id", "ts", "value"]
    ).to_pandas()
    ev["cents"] = np.floor(ev["value"].to_numpy() * 100.0).astype(np.int64)
    ev["tus"] = ev["ts"].astype("int64")
    exp = {}
    for uid, g in ev.sort_values(["user_id", "tus", "event_id"]).groupby("user_id"):
        dt = (g["tus"].to_numpy()[1:] - g["tus"].to_numpy()[:-1]) // 1_000_000
        exp[uid] = (int((g["cents"].to_numpy()[:-1] * dt).sum()), int(dt.sum()))
    assert len(got) == len(exp)
    for uid, num, den in got[["user_id", "twa_num", "twa_den"]].itertuples(
        index=False
    ):
        assert (num, den) == exp[uid], uid


def test_rolling_median_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import q_hourly_rolling_median

    got = q_hourly_rolling_median(SF)
    ts = pq.read_table(f"{SF}/events.parquet", columns=["ts"])["ts"]
    hour = ts.cast("int64").to_numpy(zero_copy_only=False) // 3_600_000_000
    u, c = np.unique(hour, return_counts=True)
    assert len(got) == len(u) - 4  # full windows only
    for i in range(len(got)):
        win = np.sort(c[i : i + 5])
        assert got["med5"].iloc[i] == win[2]
        assert got["n"].iloc[i] == c[i + 2]
        assert got["adev"].iloc[i] == abs(int(c[i + 2]) - int(win[2]))


def test_value_moment_sums_brute_and_cauchy_schwarz(ray_session):
    from simplepolygon_ray.relational.queries import q_value_moment_sums

    got = q_value_moment_sums(SF)
    ev = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "value"])
    et = ev["event_type"].to_numpy(zero_copy_only=False)
    c = np.floor(ev["value"].to_numpy(zero_copy_only=False) * 100.0).astype(
        np.int64
    )
    for row in got.itertuples(index=False):
        sel = [int(v) for v in c[et == row.event_type]]
        assert row.n == len(sel)
        assert row.sum_c == sum(sel)
        assert row.sum_c2 == sum(v * v for v in sel)
        assert int(row.sum_c3) == sum(v**3 for v in sel)
        assert int(row.sum_c4) == sum(v**4 for v in sel)
        # Cauchy–Schwarz on the exact integers
        assert row.n * row.sum_c2 >= row.sum_c * row.sum_c


def test_contingency_margins(ray_session):
    from simplepolygon_ray.relational.queries import q_contingency_assoc_l1

    got = q_contingency_assoc_l1(SF)
    ev = pq.read_table(f"{SF}/events.parquet", columns=["event_type"])
    assert int(got["obs"].sum()) == len(ev)
    et = pd.Series(ev["event_type"].to_numpy(zero_copy_only=False))
    per_type = et.value_counts()
    for t, g in got.groupby("event_type"):
        assert int(g["obs"].sum()) == int(per_type[t])
    assert (got["dev"] >= 0).all()


def test_bucket_hash_diff_flags_exactly_dropped_buckets(ray_session):
    from simplepolygon_ray.relational.queries import q_bucket_hash_diff

    got = q_bucket_hash_diff(SF)
    eid = (
        pq.read_table(f"{SF}/events.parquet", columns=["event_id"])["event_id"]
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    dropped_buckets = set((eid[eid % 997 == 0] % 64).tolist())
    flagged = set(got.loc[got["differs"] == 1, "bucket"].tolist())
    assert flagged == dropped_buckets
    assert int((got["cnt_a"] - got["cnt_b"]).sum()) == int((eid % 997 == 0).sum())


def test_ewma_brute(ray_session):
    from simplepolygon_ray.relational.queries import q_hourly_ewma

    got = q_hourly_ewma(SF)
    ts = pq.read_table(f"{SF}/events.parquet", columns=["ts"])["ts"]
    hour = ts.cast("int64").to_numpy(zero_copy_only=False) // 3_600_000_000
    u, c = np.unique(hour, return_counts=True)
    acc = int(c[0]) << 20
    exp = [acc]
    for n in c[1:]:
        acc = (acc + (int(n) << 20)) // 2
        exp.append(acc)
    assert got["ewma_s"].tolist() == exp
    assert got["hour"].tolist() == u.tolist()


def test_integral_quadrants_cover_and_match_direct_sum(ray_session):
    from simplepolygon_ray.pipelines.catalog import q_image_integral_quadrants
    from simplepolygon_ray.images.codec import decode
    from simplepolygon_ray.images.synth import gen_images

    got = (
        q_image_integral_quadrants(SF)
        .to_pandas()
        .set_index("image_id")
        .sort_index()
    )
    assert (
        got["q_tl"] + got["q_tr"] + got["q_bl"] + got["q_br"] == got["total"]
    ).all()
    # spot-check 5 images against a direct (non-SAT) masked sum
    rows = gen_images(5).take_all()
    for r in rows:
        px = decode(r["bytes"], r["w"], r["h"], r["fmt"]).astype(np.int64).sum(2)
        hh, hw = r["h"] // 2, r["w"] // 2
        g = got.loc[r["image_id"]]
        assert g["q_tl"] == px[:hh, :hw].sum()
        assert g["q_tr"] == px[:hh, hw:].sum()
        assert g["q_bl"] == px[hh:, :hw].sum()
        assert g["q_br"] == px[hh:, hw:].sum()


def test_power_iteration_matches_numpy(ray_session):
    from simplepolygon_ray.relational.queries import (
        _emb_matrix_i64,
        q_embedding_power_iteration,
    )

    got = q_embedding_power_iteration(SF)
    emb = pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])
    x = _emb_matrix_i64(emb["embedding"])
    n = len(x)
    v = np.ones(64, np.int64)
    for col in ("v1", "v2"):
        w = x.T @ (x @ v)
        v = np.clip(w // (n << 17), -16384, 16384)
        assert got[col].to_numpy(np.int64).tolist() == v.tolist(), col

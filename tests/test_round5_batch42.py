"""Round-5 batch-42 operator tests: global texton histogram, per-user
diversity deciles — brute recomputes at sf0.001."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_image_texton_hist_matches_brute(ray_session):
    from simplepolygon_ray.images.codec import decode
    from simplepolygon_ray.images.synth import gen_images
    from simplepolygon_ray.pipelines.catalog import q_image_texton_hist

    got = (
        q_image_texton_hist(SF)
        .to_pandas()
        .sort_values("pattern", ignore_index=True)
        .astype(np.int64)
    )
    imgs = gen_images(500).to_pandas()
    acc = np.zeros(16, np.int64)
    for _, r in imgs.iterrows():
        px = (
            decode(r["bytes"], int(r["w"]), int(r["h"]), r["fmt"])
            .astype(np.int64)
            .sum(axis=2)
        )
        h, w = px.shape
        b = (px * (w * h) > px.sum()).astype(np.int64)
        code = b[:-1, :-1] + 2 * b[:-1, 1:] + 4 * b[1:, :-1] + 8 * b[1:, 1:]
        acc += np.bincount(code.ravel(), minlength=16)
    nz = np.flatnonzero(acc)
    want = pd.DataFrame(
        {"pattern": nz.astype(np.int64), "n_windows": acc[nz].astype(np.int64)}
    )
    got_nz = got[got["n_windows"] > 0].reset_index(drop=True)
    assert len(got_nz) == len(want) > 0
    pd.testing.assert_frame_equal(got_nz, want)


def test_user_diversity_deciles_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import q_user_diversity_deciles

    got = q_user_diversity_deciles(SF)
    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "event_type"]
    ).to_pandas()
    tc = ev.groupby(["user_id", "event_type"]).size().reset_index(name="c")
    agg = tc.assign(c2=tc["c"] ** 2).groupby("user_id").agg(
        n=("c", "sum"), s2=("c2", "sum")
    )
    n = agg["n"].to_numpy(np.int64)
    s2 = agg["s2"].to_numpy(np.int64)
    dec = (10 * (n * n - s2)) // (n * n)
    u, c = np.unique(dec, return_counts=True)
    want = pd.DataFrame({"decile": u.astype(np.int64), "n_users": c.astype(np.int64)})
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want)
    # Gini-Simpson deciles live in [0, 9] for finite samples
    assert got["decile"].between(0, 9).all()

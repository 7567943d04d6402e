"""Round-5 batch-26 operator tests: AMS F2 sketch, image
erosion/dilation audit, geo x-monotone chain census — brute
recomputes at sf0.001."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_ams_f2_events_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import _AMS_R, q_ams_f2_events
    from simplepolygon_ray.relational.sketches import _hash64

    got = q_ams_f2_events(SF)
    ev = pq.read_table(f"{SF}/events.parquet", columns=["user_id"]).to_pandas()
    u = ev["user_id"].to_numpy(np.int64)
    h = _hash64(u)
    _, f = np.unique(u, return_counts=True)
    exact = int((f.astype(np.int64) ** 2).sum())
    assert (got["exact_f2"] == exact).all()
    for r in range(_AMS_R):
        s = int((1 - 2 * ((h >> np.uint64(r)) & np.uint64(1)).astype(np.int64)).sum())
        assert got["s_r"][r] == s
        assert got["est_f2"][r] == s * s
    # AMS estimates are unbiased: mean of 16 should be same order as exact
    assert got["est_f2"].mean() > 0


def test_image_erosion_audit_matches_brute(ray_session):
    from simplepolygon_ray.images.codec import decode
    from simplepolygon_ray.images.synth import gen_images
    from simplepolygon_ray.pipelines.catalog import q_image_erosion_audit

    got = (
        q_image_erosion_audit(SF)
        .to_pandas()
        .sort_values("image_id", ignore_index=True)
    )
    imgs = gen_images(len(got)).to_pandas().sort_values("image_id", ignore_index=True)
    for _, r in pd.concat([got, imgs.drop(columns=["image_id"])], axis=1).head(
        40
    ).iterrows():
        px = (
            decode(r["bytes"], int(r["w"]), int(r["h"]), r["fmt"])
            .astype(np.int64)
            .sum(axis=2)
        )
        h, w = px.shape
        bright = px * (w * h) > px.sum()
        c = bright[1:-1, 1:-1]
        ero = c & bright[:-2, 1:-1] & bright[2:, 1:-1] & bright[1:-1, :-2] & bright[1:-1, 2:]
        dil = c | bright[:-2, 1:-1] | bright[2:, 1:-1] | bright[1:-1, :-2] | bright[1:-1, 2:]
        assert r["n_interior"] == (w - 2) * (h - 2)
        assert r["n_eroded"] == int(ero.sum())
        assert r["n_dilated"] == int(dil.sum())
    # erosion shrinks, dilation grows
    assert (got["n_eroded"] <= got["n_dilated"]).all()


def test_geo_x_monotone_chains_matches_brute(ray_session):
    from simplepolygon_ray.pipelines.catalog import (
        _simple_rings_cached,
        q_geo_x_monotone_chains,
    )

    got = (
        q_geo_x_monotone_chains(SF)
        .to_pandas()
        .sort_values(["geom_id", "ring_seq"], ignore_index=True)
    )
    rings = (
        _simple_rings_cached(SF)
        .to_pandas()
        .sort_values(["geom_id", "ring_seq"], ignore_index=True)
    )
    assert len(got) == len(rings) > 0
    for i in range(min(60, len(rings))):
        ring = np.vstack([np.asarray(v, np.float64) for v in rings["ring"][i]])
        if len(ring) > 1 and (ring[0] == ring[-1]).all():
            ring = ring[:-1]
        xi = np.floor(ring[:, 0] * 1e5).astype(np.int64)
        dx = np.roll(xi, -1) - xi
        sg = np.sign(dx)
        nz = sg[sg != 0]
        want_chains = int((nz != np.roll(nz, 1)).sum()) if len(nz) else 0
        assert got["n_chains"][i] == want_chains
        assert got["n_flat_edges"][i] == int((sg == 0).sum())
    # every simple closed ring with any x-extent has an even chain count >= 2
    nzc = got.loc[got["n_chains"] > 0, "n_chains"]
    assert (nzc % 2 == 0).all() and (nzc >= 2).all()

"""Round-5 batch-36 operator tests: octant transition matrix, image
channel covariance pieces, exact unbounded-domain mode — brute
recomputes at sf0.001."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_geo_octant_transitions_matches_brute(ray_session):
    from simplepolygon_ray.pipelines.catalog import (
        _octants,
        _simple_rings_cached,
        q_geo_octant_transitions,
    )

    got = (
        q_geo_octant_transitions(SF)
        .to_pandas()
        .sort_values(["from_oct", "to_oct"], ignore_index=True)
    )
    rings = _simple_rings_cached(SF).to_pandas()
    mat = np.zeros((8, 8), np.int64)
    for rv in rings["ring"]:
        ring = np.vstack([np.asarray(v, np.float64) for v in rv])
        if len(ring) > 1 and (ring[0] == ring[-1]).all():
            ring = ring[:-1]
        xi = np.floor(ring[:, 0] * 1e5).astype(np.int64)
        yi = np.floor(ring[:, 1] * 1e5).astype(np.int64)
        dx = np.roll(xi, -1) - xi
        dy = np.roll(yi, -1) - yi
        o = _octants(dx, dy)
        for a, b in zip(o, np.roll(o, -1)):
            mat[a, b] += 1
    nz = np.argwhere(mat > 0)
    want = pd.DataFrame(
        {
            "from_oct": nz[:, 0].astype(np.int64),
            "to_oct": nz[:, 1].astype(np.int64),
            "n_pairs": mat[nz[:, 0], nz[:, 1]].astype(np.int64),
        }
    ).sort_values(["from_oct", "to_oct"], ignore_index=True)
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want)


def test_image_channel_covariance_matches_brute(ray_session):
    from simplepolygon_ray.images.codec import decode
    from simplepolygon_ray.images.synth import gen_images
    from simplepolygon_ray.pipelines.catalog import q_image_channel_covariance

    got = (
        q_image_channel_covariance(SF)
        .to_pandas()
        .sort_values("image_id", ignore_index=True)
    )
    imgs = gen_images(len(got)).to_pandas().sort_values("image_id", ignore_index=True)
    for _, r in pd.concat([got, imgs.drop(columns=["image_id"])], axis=1).head(
        40
    ).iterrows():
        px = decode(r["bytes"], int(r["w"]), int(r["h"]), r["fmt"]).astype(np.int64)
        rr, gg, bb = px[:, :, 0].ravel(), px[:, :, 1].ravel(), px[:, :, 2].ravel()
        assert r["n_px"] == r["w"] * r["h"]
        assert r["sr"] == rr.sum() and r["sg"] == gg.sum() and r["sb"] == bb.sum()
        assert r["srr"] == (rr * rr).sum() and r["sgg"] == (gg * gg).sum()
        assert r["sbb"] == (bb * bb).sum()
        assert r["srg"] == (rr * gg).sum() and r["srb"] == (rr * bb).sum()
        assert r["sgb"] == (gg * bb).sum()


def test_mode_order_total_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import q_mode_order_total

    got = q_mode_order_total(SF)
    od = pq.read_table(f"{SF}/orders.parquet", columns=["o_totalprice"]).to_pandas()
    v = np.rint(od["o_totalprice"] * 100).astype(np.int64)
    u, c = np.unique(v, return_counts=True)
    best = np.lexsort((u, -c))[0]
    assert got["mode_cents"][0] == u[best]
    assert got["multiplicity"][0] == c[best]

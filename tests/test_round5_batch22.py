"""Round-5 batch-22 operator tests: edge squared-length bit-bucket
spectrum, Bayer 4×4 ordered-dither audit, weighted systematic sample —
brute recomputes at sf0.001."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_geo_edge_len2_hist_matches_brute(ray_session):
    from simplepolygon_ray.pipelines.catalog import (
        _simple_rings_cached,
        q_geo_edge_len2_hist,
    )

    got = (
        q_geo_edge_len2_hist(SF)
        .to_pandas()
        .sort_values("bucket", ignore_index=True)
        .astype(np.int64)
    )
    rings = _simple_rings_cached(SF).to_pandas()
    buckets: dict[int, list[int]] = {}
    for ring in rings["ring"]:
        c = np.asarray([[p[0], p[1]] for p in ring], np.float64)
        if len(c) > 1 and (c[0] == c[-1]).all():
            c = c[:-1]
        xi = np.floor(c[:, 0] * 1e5).astype(np.int64)
        yi = np.floor(c[:, 1] * 1e5).astype(np.int64)
        dx = np.roll(xi, -1) - xi
        dy = np.roll(yi, -1) - yi
        for l2 in (dx * dx + dy * dy).tolist():
            b = int(l2).bit_length()
            r = buckets.setdefault(b, [0, 2**63 - 1, -(2**63)])
            r[0] += 1
            r[1] = min(r[1], l2)
            r[2] = max(r[2], l2)
    exp = pd.DataFrame(
        {
            "bucket": sorted(buckets),
            "n_edges": [buckets[b][0] for b in sorted(buckets)],
            "min_len2": [buckets[b][1] for b in sorted(buckets)],
            "max_len2": [buckets[b][2] for b in sorted(buckets)],
        }
    )
    assert exp["n_edges"].sum() > 0
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_image_bayer_dither_matches_brute(ray_session):
    from simplepolygon_ray.images.codec import decode
    from simplepolygon_ray.images.synth import gen_images
    from simplepolygon_ray.pipelines.catalog import _BAYER4, q_image_bayer_dither

    got = (
        q_image_bayer_dither(SF)
        .to_pandas()
        .sort_values("image_id", ignore_index=True)
    )
    imgs = gen_images(len(got)).to_pandas().sort_values("image_id", ignore_index=True)
    assert (_BAYER4.ravel() != np.arange(16)).any()  # a real Bayer matrix
    assert sorted(_BAYER4.ravel().tolist()) == list(range(16))
    for _, r in pd.concat([got, imgs.drop(columns=["image_id"])], axis=1).head(
        40
    ).iterrows():
        px = (
            decode(r["bytes"], int(r["w"]), int(r["h"]), r["fmt"])
            .astype(np.int64)
            .sum(axis=2)
        )
        bay = _BAYER4[np.arange(int(r["h"])) % 4][:, np.arange(int(r["w"])) % 4]
        on = 32 * px > 1530 * bay + 765
        naive = 2 * px > 765
        assert int(on.sum()) == r["n_on"]
        assert int((on != naive).sum()) == r["n_flip"]
        assert int(r["n_pix"]) == px.size
    # dithering must actually flip pixels somewhere in the corpus
    assert got["n_flip"].sum() > 0


def test_weighted_systematic_sample_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import (
        _WSS_TARGET,
        q_weighted_systematic_sample,
    )

    got = (
        q_weighted_systematic_sample(SF)
        .to_pandas()
        .sort_values("o_orderkey", ignore_index=True)
    )
    od = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    ).to_pandas()
    od["cents"] = np.rint(od["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
    od = od.sort_values("o_orderkey", ignore_index=True)
    cum = od["cents"].cumsum().to_numpy(np.int64)
    step = max(int(cum[-1]) // _WSS_TARGET, 1)
    keep = (cum - od["cents"].to_numpy(np.int64)) // step < cum // step
    exp = pd.DataFrame(
        {
            "o_orderkey": od.loc[keep, "o_orderkey"].to_numpy(np.int64),
            "cents": od.loc[keep, "cents"].to_numpy(np.int64),
            "cum_w": cum[keep],
        }
    )
    assert len(exp) > 0
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # size-proportional: sampled mean weight exceeds the corpus mean
    assert exp["cents"].mean() > od["cents"].mean()

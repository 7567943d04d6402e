"""Round-5 batch-29 operator tests: image 3x3 median-denoise audit,
l-diversity privacy audit, 32-char prefix duplicate groups — brute
recomputes at sf0.001."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_image_median_denoise_matches_brute(ray_session):
    from simplepolygon_ray.images.codec import decode
    from simplepolygon_ray.images.synth import gen_images
    from simplepolygon_ray.pipelines.catalog import q_image_median_denoise

    got = (
        q_image_median_denoise(SF)
        .to_pandas()
        .sort_values("image_id", ignore_index=True)
    )
    imgs = gen_images(len(got)).to_pandas().sort_values("image_id", ignore_index=True)
    for _, r in pd.concat([got, imgs.drop(columns=["image_id"])], axis=1).head(
        30
    ).iterrows():
        px = (
            decode(r["bytes"], int(r["w"]), int(r["h"]), r["fmt"])
            .astype(np.int64)
            .sum(axis=2)
        )
        h, w = px.shape
        stack = np.stack(
            [px[dy : h - 2 + dy, dx : w - 2 + dx] for dy in range(3) for dx in range(3)]
        )
        m = np.sort(stack, axis=0)[4]
        diff = np.abs(m - px[1:-1, 1:-1])
        assert r["n_changed"] == int((diff > 0).sum())
        assert r["sum_abs_change"] == int(diff.sum())


def test_l_diversity_audit_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import (
        _LDIV_BAND_C,
        _LDIV_L,
        q_l_diversity_audit,
    )

    got = q_l_diversity_audit(SF)
    cust = pq.read_table(
        f"{SF}/customer.parquet",
        columns=["c_nationkey", "c_mktsegment", "c_acctbal"],
    ).to_pandas()
    cust["band"] = np.floor_divide(
        np.rint(cust["c_acctbal"] * 100).astype(np.int64), _LDIV_BAND_C
    )
    want = cust.groupby(["c_nationkey", "c_mktsegment"], as_index=False).agg(
        n_rows=("band", "size"), n_distinct_sensitive=("band", "nunique")
    )
    want["l_ok"] = (want["n_distinct_sensitive"] >= _LDIV_L).astype(np.int64)
    want = want.sort_values(
        ["c_nationkey", "c_mktsegment"], ignore_index=True
    ).astype({"n_rows": np.int64, "n_distinct_sensitive": np.int64})
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(
        got.astype({"c_nationkey": want["c_nationkey"].dtype}), want
    )


def test_prefix_dup_groups_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import _PREFIX_LEN, q_prefix_dup_groups

    got = q_prefix_dup_groups(SF)
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["text"]).to_pandas()
    sizes = docs["text"].str.slice(0, _PREFIX_LEN).value_counts()
    sizes = sizes[sizes >= 2]
    u, c = np.unique(sizes.to_numpy(np.int64), return_counts=True)
    want = pd.DataFrame(
        {"group_size": u.astype(np.int64), "n_groups": c.astype(np.int64)}
    )
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want)

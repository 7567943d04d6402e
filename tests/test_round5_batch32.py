"""Round-5 batch-32 operator tests: image seam-carving DP energy,
longest repeated-token run — brute recomputes at sf0.001."""

import re

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_image_seam_energy_matches_brute(ray_session):
    from simplepolygon_ray.images.codec import decode
    from simplepolygon_ray.images.synth import gen_images
    from simplepolygon_ray.pipelines.catalog import q_image_seam_energy

    got = (
        q_image_seam_energy(SF)
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
        # reference DP: explicit per-cell loop
        dp = px[0].astype(np.int64).copy()
        for y in range(1, h):
            nxt = np.empty(w, np.int64)
            for x in range(w):
                lo = max(x - 1, 0)
                hi = min(x + 1, w - 1)
                nxt[x] = px[y, x] + min(dp[lo], dp[x], dp[hi])
            dp = nxt
        assert r["seam_cost"] == int(dp.min())
        assert r["seam_end_col"] == int(dp.argmin())


def test_max_token_run_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import q_max_token_run

    got = (
        q_max_token_run(SF)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    docs = docs.sort_values("doc_id", ignore_index=True)
    assert len(got) == len(docs) > 0
    for i in range(len(docs)):
        toks = re.split(r"\s+", docs["text"][i])
        best = cur = 0
        prev = None
        for tk in toks:
            if tk != "" and tk == prev:
                cur += 1
            elif tk != "":
                cur = 1
            else:
                cur = 0
            prev = tk
            best = max(best, cur)
        assert got["max_run"][i] == best, docs["doc_id"][i]
    # spam detector sanity: at least one doc has a run >= 2 or all are 1
    assert got["max_run"].max() >= 1

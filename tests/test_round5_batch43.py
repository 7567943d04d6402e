"""Round-5 batch-43 operator tests: image format/shape profile, daily
peak factor — brute recomputes at sf0.001."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_image_format_profile_matches_brute(ray_session):
    from simplepolygon_ray.images.synth import gen_images
    from simplepolygon_ray.pipelines.catalog import q_image_format_profile

    got = (
        q_image_format_profile(SF)
        .to_pandas()
        .sort_values(["fmt", "shape"], ignore_index=True)
        .astype({"n_bytes": np.int64, "n_px": np.int64, "n_images": np.int64})
    )
    imgs = gen_images(500).to_pandas()
    imgs["shape"] = np.where(
        imgs["w"] > imgs["h"], "landscape",
        np.where(imgs["w"] < imgs["h"], "portrait", "square"),
    )
    imgs["n_bytes"] = imgs["bytes"].map(len).astype(np.int64)
    imgs["n_px"] = (imgs["w"] * imgs["h"]).astype(np.int64)
    want = (
        imgs.groupby(["fmt", "shape"], as_index=False)
        .agg(n_bytes=("n_bytes", "sum"), n_px=("n_px", "sum"), n_images=("n_px", "count"))
        .sort_values(["fmt", "shape"], ignore_index=True)
        .astype({"n_bytes": np.int64, "n_px": np.int64, "n_images": np.int64})
    )
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want)


def test_daily_peak_factor_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import q_daily_peak_factor

    got = q_daily_peak_factor(SF)
    ev = pq.read_table(f"{SF}/events.parquet", columns=["ts"]).to_pandas()
    hour = (
        ev["ts"].astype("datetime64[us]").astype("int64") // 3_600_000_000
    ).to_numpy(np.int64)
    h, n = np.unique(hour, return_counts=True)
    df = pd.DataFrame({"day": h // 24, "n": n.astype(np.int64)})
    agg = df.groupby("day", as_index=False).agg(mx=("n", "max"), tot=("n", "sum"))
    want = pd.DataFrame(
        {
            "day": agg["day"].to_numpy(np.int64),
            "max_hour_events": agg["mx"].to_numpy(np.int64),
            "total_events": agg["tot"].to_numpy(np.int64),
            "peak_factor_e1": (240 * agg["mx"].to_numpy(np.int64))
            // agg["tot"].to_numpy(np.int64),
        }
    )
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want)
    # peak factor >= 10 (max >= mean) always
    assert (got["peak_factor_e1"] >= 10).all()

"""Round-5 batch-35 operator tests: candlestick pattern census, image
BTC block stats — brute recomputes at sf0.001."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_ohlc_candle_patterns_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import q_ohlc_candle_patterns

    got = q_ohlc_candle_patterns(SF)
    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["event_id", "ts", "value"]
    ).to_pandas()
    ev["t"] = ev["ts"].astype("datetime64[us]").astype("int64")
    ev["v"] = np.rint(ev["value"] * 10000).astype(np.int64)
    ev["hour"] = ev["t"] // 3_600_000_000
    ev = ev.sort_values(["hour", "t", "event_id"], ignore_index=True)
    c = ev.groupby("hour").agg(o=("v", "first"), c=("v", "last")).reset_index()
    h = c["hour"].to_numpy(np.int64)
    o = c["o"].to_numpy(np.int64)
    cl = c["c"].to_numpy(np.int64)
    bull = np.zeros(len(h), bool)
    bear = np.zeros(len(h), bool)
    adj = h[1:] == h[:-1] + 1
    bull[1:] = adj & (cl[:-1] < o[:-1]) & (cl[1:] > o[1:]) & (o[1:] < cl[:-1]) & (cl[1:] > o[:-1])
    bear[1:] = adj & (cl[:-1] > o[:-1]) & (cl[1:] < o[1:]) & (o[1:] > cl[:-1]) & (cl[1:] < o[:-1])
    want = (
        pd.DataFrame(
            {
                "day": h // 24,
                "n_candles": 1,
                "n_bull_engulf": bull.astype(np.int64),
                "n_bear_engulf": bear.astype(np.int64),
                "n_doji": (cl == o).astype(np.int64),
            }
        )
        .groupby("day", as_index=False)
        .sum()
        .astype(np.int64)
        .sort_values("day", ignore_index=True)
    )
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want)


def test_image_btc_stats_matches_brute(ray_session):
    from simplepolygon_ray.images.codec import decode
    from simplepolygon_ray.images.synth import gen_images
    from simplepolygon_ray.pipelines.catalog import q_image_btc_stats

    got = (
        q_image_btc_stats(SF)
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
        h4, w4 = h // 4, w // 4
        v = px[: h4 * 4, : w4 * 4].reshape(h4, 4, w4, 4)
        bsum = v.sum(axis=(1, 3))
        assert r["n_blocks"] == h4 * w4
        assert r["n_above_mean"] == int((16 * v > bsum[:, None, :, None]).sum())
        assert r["n_flat_blocks"] == int(
            (v.max(axis=(1, 3)) == v.min(axis=(1, 3))).sum()
        )

"""Multimodal actor-pool stages + HLL sketch tests."""

import numpy as np
import pyarrow as pa
import pytest

from simplepolygon_ray.images.codec import decode, phash64
from simplepolygon_ray.images.synth import gen_images
from simplepolygon_ray.stages.media import (
    AudioFeatureActor,
    ImageDecodeActor,
    VideoFrameSampleActor,
    decode_and_featurize,
    resize_images,
)


def test_decode_actor_matches_stored_phash(ray_session):
    imgs = gen_images(50)
    out = decode_and_featurize(imgs, concurrency=(1, 2)).to_pandas()
    # the actor passes the stored phash through for invariant checks
    assert "phash" in out.columns
    assert (out["phash_recomputed"] == out["phash"]).all()


def test_decode_actor_strict_raises_on_unknown_fmt():
    actor = ImageDecodeActor(strict=True)
    batch = pa.table(
        {
            "image_id": ["x"],
            "bytes": [b"\x00" * 12],
            "w": pa.array([2], type=pa.int32()),
            "h": pa.array([2], type=pa.int32()),
            "fmt": ["jpeg"],
        }
    )
    with pytest.raises(NotImplementedError, match="external codec"):
        actor(batch)
    # non-strict mode produces the documented deterministic fake
    lax = ImageDecodeActor(strict=False)
    out1, out2 = lax(batch), lax(batch)
    assert out1.equals(out2)


def test_resize_roundtrip(ray_session):
    imgs = gen_images(20)
    out = resize_images(imgs, out_w=8, out_h=8, concurrency=(1, 2)).to_pandas()
    assert (out["w"] == 8).all() and (out["h"] == 8).all()
    for _, row in out.iterrows():
        px = decode(bytes(row["bytes"]), 8, 8, "raw")
        assert px.shape == (8, 8, 3)


def test_audio_video_stubs_shape():
    batch = pa.table(
        {
            "image_id": ["a", "b"],
            "bytes": [bytes(range(256)) * 16, b"\x01" * 3072],
        }
    )
    feats = AudioFeatureActor(n_features=4)(batch)
    assert feats["features"].to_pylist()[0].__len__() == 4
    frames = VideoFrameSampleActor(frame_bytes=768, stride=2)(batch)
    assert set(frames["image_id"].to_pylist()) == {"a", "b"}
    assert frames["frame_no"].to_pylist() == [0, 2, 4, 0, 2]


def test_hll_accuracy(ray_session):
    import ray.data as rd

    from simplepolygon_ray.relational.sketches import approx_distinct

    n = 20_000
    ds = rd.range(n).map_batches(
        lambda b: {"k": np.asarray(b["id"]) % 5000}, batch_format="numpy"
    )
    est = approx_distinct(ds, "k", p=12)
    assert abs(est - 5000) / 5000 < 0.05  # HLL p=12 ≈ 1.6% rel error


def test_hll_merge_equals_single():
    from simplepolygon_ray.relational.sketches import HyperLogLog, _hash64

    a, b, full = HyperLogLog(10), HyperLogLog(10), HyperLogLog(10)
    x = np.arange(10_000, dtype=np.int64)
    a.add_hashed(_hash64(x[:6000]))
    b.add_hashed(_hash64(x[4000:]))
    full.add_hashed(_hash64(x))
    assert a.merge(b).estimate() == full.estimate()

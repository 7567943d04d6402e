"""Image codec + synthetic table tests (input_hint invariants)."""

import numpy as np
import pytest

from simplepolygon_ray.images import (
    LAT_RANGE,
    LON_RANGE,
    decode,
    encode,
    gen_batch,
    make_pixels,
    phash64,
    psnr,
)


def test_raw_roundtrip_lossless():
    px = make_pixels(42, 33, 21)
    assert decode(encode(px, "raw"), 33, 21, "raw").tobytes() == px.tobytes()


def test_q6_psnr_above_40db():
    for rid in (0, 7, 123456):
        px = make_pixels(rid, 48, 48)
        out = decode(encode(px, "q6"), 48, 48, "q6")
        assert psnr(px, out) >= 40.0


def test_psnr_identical_is_inf():
    px = make_pixels(1, 16, 16)
    assert psnr(px, px) == float("inf")


def test_phash_deterministic_and_discriminative():
    a = phash64(make_pixels(1, 32, 32))
    b = phash64(make_pixels(1, 32, 32))
    c = phash64(make_pixels(99999, 40, 24))
    assert a == b
    assert a != c
    assert 0 <= a < 2**64


def test_phash_robust_to_q6():
    px = make_pixels(321, 32, 32)
    lossy = decode(encode(px, "q6"), 32, 32, "q6")
    ha, hb = phash64(px), phash64(lossy)
    assert bin(ha ^ hb).count("1") <= 4  # near-identical perceptual hash


def test_gen_batch_schema_and_determinism():
    ids = np.arange(10, dtype=np.int64)
    t1 = gen_batch({"id": ids})
    t2 = gen_batch({"id": ids})
    assert t1.equals(t2)
    assert t1.column_names == [
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash", "lon", "lat",
    ]
    lon = t1["lon"].to_numpy()
    lat = t1["lat"].to_numpy()
    assert (lon >= LON_RANGE[0]).all() and (lon <= LON_RANGE[1]).all()
    assert (lat >= LAT_RANGE[0]).all() and (lat <= LAT_RANGE[1]).all()
    # per-row invariant: decode matches regenerated reference pixels
    for k in range(10):
        w, h = int(t1["w"][k].as_py()), int(t1["h"][k].as_py())
        fmt = t1["fmt"][k].as_py()
        dec = decode(t1["bytes"][k].as_py(), w, h, fmt)
        ref = make_pixels(int(ids[k]), w, h)
        if fmt == "raw":
            assert (dec == ref).all()
        else:
            assert psnr(ref, dec) >= 40.0
        assert t1["caption"][k].as_py() == (
            f"synthetic image {ids[k]:012d} stripe {ids[k] % 7} gradient {ids[k] % 11}"
        )

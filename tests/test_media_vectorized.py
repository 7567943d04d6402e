"""Vectorized media actors must be bit-identical to the scalar
images.codec kernels (the media oracles replay decode/phash/luma
op-for-op in SQL, so any drift fails the driver hash)."""

import numpy as np
import pyarrow as pa

from simplepolygon_ray.images.codec import decode, encode, phash64
from simplepolygon_ray.images.synth import make_pixels
from simplepolygon_ray.stages.media import (
    AudioFeatureActor,
    ImageDecodeActor,
    ImageResizeActor,
)


def _mixed_batch(specs):
    """specs: list of (row_id, w, h, fmt) → image table batch."""
    ids, payloads, ws, hs, fmts, phashes = [], [], [], [], [], []
    for rid, w, h, fmt in specs:
        px = make_pixels(rid, w, h)
        payload = encode(px, fmt)
        ids.append(f"img{rid:012d}")
        payloads.append(payload)
        ws.append(w)
        hs.append(h)
        fmts.append(fmt)
        phashes.append(int(np.uint64(phash64(decode(payload, w, h, fmt))).astype(np.int64)))
    return pa.table(
        {
            "image_id": ids,
            "bytes": pa.array(payloads, type=pa.binary()),
            "w": pa.array(ws, type=pa.int32()),
            "h": pa.array(hs, type=pa.int32()),
            "fmt": fmts,
            "phash": pa.array(phashes, type=pa.int64()),
        }
    )


def _specs():
    # mixed sizes/formats incl. the padded-gather edge case where every
    # row shares (w=64, h=16) so maxlen is small while maxh is large
    mixed = [
        (7, 16, 16, "raw"),
        (11, 64, 64, "q6"),
        (13, 17, 63, "raw"),
        (23, 64, 16, "q6"),
        (99, 16, 64, "raw"),
        (12345678901, 33, 41, "q6"),
    ]
    uniform_wide = [(i, 64, 16, "q6") for i in range(20)]
    return mixed, uniform_wide


def test_decode_actor_bit_exact_vs_scalar():
    actor = ImageDecodeActor(strict=True)
    for specs in _specs():
        batch = _mixed_batch(specs)
        out = actor(batch)
        for k, (rid, w, h, fmt) in enumerate(specs):
            px = decode(batch["bytes"][k].as_py(), w, h, fmt)
            assert out["phash_recomputed"][k].as_py() == int(
                np.uint64(phash64(px)).astype(np.int64)
            )
            assert out["mean_luma"][k].as_py() == float(px.mean())
        assert out["phash_recomputed"].to_pylist() == out["phash"].to_pylist()


def test_decode_actor_sliced_batch():
    # Arrow slices keep the parent buffers; offsets must rebase
    batch = _mixed_batch(_specs()[0]).slice(2, 3)
    out = ImageDecodeActor(strict=True)(batch)
    assert out["phash_recomputed"].to_pylist() == out["phash"].to_pylist()


def test_resize_actor_bit_exact_vs_scalar():
    from simplepolygon_ray.stages.media import _resize_nearest

    for specs in _specs():
        batch = _mixed_batch(specs)
        out = ImageResizeActor(out_w=16, out_h=16)(batch)
        for k, (rid, w, h, fmt) in enumerate(specs):
            px = decode(batch["bytes"][k].as_py(), w, h, fmt)
            want = encode(_resize_nearest(px, 16, 16), "raw")
            assert out["bytes"][k].as_py() == want
        assert out["fmt"].to_pylist() == ["raw"] * len(specs)


def test_audio_actor_matches_array_split_means():
    payloads = [bytes(range(256)) * 16, b"\x01" * 3072, b"", b"\x05\x09", b"\xff" * 7]
    batch = pa.table({"image_id": [f"a{i}" for i in range(len(payloads))], "bytes": payloads})
    out = AudioFeatureActor(n_features=4)(batch)["features"].to_pylist()
    for row, payload in zip(out, payloads):
        arr = np.frombuffer(payload, np.uint8).astype(np.float64)
        if len(arr) == 0:
            arr = np.zeros(1)
        want = [
            float(c.mean()) if len(c) else float("nan")
            for c in np.array_split(arr, 4)
        ]
        assert len(row) == 4
        for a, b in zip(row, want):
            assert (a == b) or (np.isnan(a) and np.isnan(b))

"""Deterministic synthetic image+caption table (FIXTURES.md §3).

Every value is a pure function of the row id under fixed constants —
no RNG state, no wall clock — so any worker can (re)generate any shard
independently (resume- and parallelism-safe), and the table can be
synthesized at any scale: ``ray.data.range(n).map_batches(gen_batch)``.

Schema (BASELINE.json input_hint + geotag extension):
  image_id:string  bytes:binary  w:int32  h:int32  fmt:string
  caption:string  phash:int64  lon:float64  lat:float64

Geotags land in lon [113, 142], lat [-37, -13] — the bbox of the three
reference fixtures — so spatial joins against decomposed rings have
non-trivial selectivity.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .codec import decode, encode, phash64

__all__ = [
    "gen_batch",
    "gen_images",
    "gen_points",
    "gen_points_batch",
    "make_pixels",
    "LON_RANGE",
    "LAT_RANGE",
]

LON_RANGE = (113.0, 142.0)
LAT_RANGE = (-37.0, -13.0)


def _image_ids(ids: np.ndarray) -> "pa.Array":
    """Vectorized f"img{id:012d}": digits computed by repeated divmod,
    Arrow StringArray assembled straight from the byte buffers."""
    n = len(ids)
    buf = np.empty((n, 15), np.uint8)
    buf[:, 0] = ord("i")
    buf[:, 1] = ord("m")
    buf[:, 2] = ord("g")
    v = ids.astype(np.int64).copy()
    for k in range(14, 2, -1):
        buf[:, k] = 48 + (v % 10)
        v //= 10
    offsets = (np.arange(n + 1, dtype=np.int32) * 15)
    return pa.StringArray.from_buffers(
        n, pa.py_buffer(offsets.tobytes()), pa.py_buffer(buf.tobytes())
    )


def _splitmix64(x: np.ndarray) -> np.ndarray:
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def make_pixels(row_id: int, w: int, h: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 pattern: gradient + id-seeded stripes."""
    xx = np.arange(w, dtype=np.int64)[None, :]
    yy = np.arange(h, dtype=np.int64)[:, None]
    r = (xx * 3 + yy * 0 + row_id) % 256
    g = (yy * 5 + (row_id >> 8)) % 256 + xx * 0
    b = ((xx ^ yy) * 7 + (row_id >> 16)) % 256
    return np.stack(
        [np.broadcast_to(r, (h, w)), np.broadcast_to(g, (h, w)), b], axis=2
    ).astype(np.uint8)


def gen_batch(batch) -> pa.Table:
    """map_batches kernel: {"id": int64 array} → image rows."""
    ids = np.asarray(batch["id"], dtype=np.int64)
    hsh = _splitmix64(ids.view(np.uint64) if ids.dtype == np.int64 else ids)
    w = (16 + (hsh % np.uint64(49))).astype(np.int64)
    h = (16 + ((hsh >> np.uint64(8)) % np.uint64(49))).astype(np.int64)
    is_raw = ((hsh >> np.uint64(16)) & np.uint64(1)).astype(bool)

    payloads, fmts, phashes = [], [], []
    for k, rid in enumerate(ids):
        fmt = "raw" if is_raw[k] else "q6"
        px = make_pixels(int(rid), int(w[k]), int(h[k]))
        payload = encode(px, fmt)
        decoded = decode(payload, int(w[k]), int(h[k]), fmt)
        payloads.append(payload)
        fmts.append(fmt)
        phashes.append(int(np.uint64(phash64(decoded)).astype(np.int64)))

    frac_lon = (hsh >> np.uint64(20)).astype(np.float64) / float(2**44)
    frac_lat = ((hsh >> np.uint64(3)) & np.uint64((1 << 40) - 1)).astype(
        np.float64
    ) / float(2**40)
    lon = LON_RANGE[0] + frac_lon * (LON_RANGE[1] - LON_RANGE[0])
    lat = LAT_RANGE[0] + frac_lat * (LAT_RANGE[1] - LAT_RANGE[0])

    return pa.table(
        {
            "image_id": pa.array([f"img{int(i):012d}" for i in ids]),
            "bytes": pa.array(payloads, type=pa.binary()),
            "w": pa.array(w.astype(np.int32)),
            "h": pa.array(h.astype(np.int32)),
            "fmt": pa.array(fmts),
            "caption": pa.array(
                [
                    f"synthetic image {int(i):012d} stripe {int(i) % 7} gradient {int(i) % 11}"
                    for i in ids
                ]
            ),
            "phash": pa.array(phashes, type=pa.int64()),
            "lon": pa.array(lon),
            "lat": pa.array(lat),
        }
    )


def gen_points_batch(batch) -> pa.Table:
    """Pruned-column generator: only (image_id, lon, lat, phash-free).

    Models `read_parquet(columns=["image_id","lon","lat"])` on the
    stored table — spatial joins must never pay for pixel bytes. Pure
    vectorized numpy; geotags are IDENTICAL to ``gen_batch``'s.
    """
    ids = np.asarray(batch["id"], dtype=np.int64)
    hsh = _splitmix64(ids.view(np.uint64) if ids.dtype == np.int64 else ids)
    frac_lon = (hsh >> np.uint64(20)).astype(np.float64) / float(2**44)
    frac_lat = ((hsh >> np.uint64(3)) & np.uint64((1 << 40) - 1)).astype(
        np.float64
    ) / float(2**40)
    lon = LON_RANGE[0] + frac_lon * (LON_RANGE[1] - LON_RANGE[0])
    lat = LAT_RANGE[0] + frac_lat * (LAT_RANGE[1] - LAT_RANGE[0])
    return pa.table(
        {
            "image_id": _image_ids(ids),
            "lon": pa.array(lon),
            "lat": pa.array(lat),
        }
    )


def gen_dup_batch(n_base: int):
    """Returns a map_batches kernel over global row ids [0, n_base + m):
    ids < n_base are exactly ``gen_batch``'s images; ids >= n_base are
    NEAR-DUPLICATES of base ``(id - n_base) % n_base`` — same
    dimensions/fmt/payload-pattern with a single pixel channel nudged
    by +1 (mod 256). Under q6 the nudge usually quantizes away
    entirely; under raw it moves one 8×8 block mean by 1/area — so dup
    pairs sit at phash Hamming distance 0 (occasionally 1-2), which
    the banded near-dup stage must recover."""

    def _fn(batch) -> pa.Table:
        ids = np.asarray(batch["id"], dtype=np.int64)
        base = np.where(ids < n_base, ids, (ids - n_base) % n_base)
        hsh = _splitmix64(base.view(np.uint64))
        w = (16 + (hsh % np.uint64(49))).astype(np.int64)
        h = (16 + ((hsh >> np.uint64(8)) % np.uint64(49))).astype(np.int64)
        is_raw = ((hsh >> np.uint64(16)) & np.uint64(1)).astype(bool)

        payloads, fmts, phashes = [], [], []
        for k, rid in enumerate(ids):
            fmt = "raw" if is_raw[k] else "q6"
            px = make_pixels(int(base[k]), int(w[k]), int(h[k]))
            if rid >= n_base:
                px = px.copy()
                px[0, 0, 0] = (int(px[0, 0, 0]) + 1) % 256
            payload = encode(px, fmt)
            decoded = decode(payload, int(w[k]), int(h[k]), fmt)
            payloads.append(payload)
            fmts.append(fmt)
            phashes.append(int(np.uint64(phash64(decoded)).astype(np.int64)))

        return pa.table(
            {
                "image_id": _image_ids(ids),
                "bytes": pa.array(payloads, type=pa.binary()),
                "w": pa.array(w.astype(np.int32)),
                "h": pa.array(h.astype(np.int32)),
                "fmt": pa.array(fmts),
                "phash": pa.array(phashes, type=pa.int64()),
            }
        )

    return _fn


def gen_images_with_dups(n_base: int, n_dups: int, *, parallelism: int = -1):
    """Image corpus with planted near-duplicates (see gen_dup_batch)."""
    import ray.data as rd

    n = n_base + n_dups
    blocks = parallelism if parallelism > 0 else 200
    ds = rd.range(n, override_num_blocks=max(1, min(n, blocks)))
    return ds.map_batches(gen_dup_batch(n_base), batch_format="numpy", batch_size=2048)


def gen_points(n: int, *, parallelism: int = -1):
    """Synthesize only the geo projection of the image table.

    Batch per block (``batch_size=None``): a fixed batch_size would
    coalesce the ``parallelism`` input blocks into fewer, larger tasks
    — callers control task granularity via ``parallelism`` instead.
    """
    import ray.data as rd

    # cap blocks at n: rd.range with more blocks than rows emits
    # zero-row zero-COLUMN blocks that poison downstream concat/joins
    blocks = parallelism if parallelism > 0 else 200
    ds = rd.range(n, override_num_blocks=max(1, min(n, blocks)))
    return ds.map_batches(gen_points_batch, batch_format="numpy", batch_size=None)


def gen_images(n: int, *, parallelism: int = -1):
    """Synthesize the n-row image table as a lazy Ray Dataset."""
    import ray.data as rd

    blocks = parallelism if parallelism > 0 else 200
    ds = rd.range(n, override_num_blocks=max(1, min(n, blocks)))
    return ds.map_batches(gen_batch, batch_format="numpy", batch_size=2048)

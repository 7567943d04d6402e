"""Banded phash LSH near-duplicate detection (images/neardup.py).

The exactness property under test: for max_hamming <= n_bands - 1 and
no band group over run_cap, the pipeline's pair set EQUALS the
brute-force all-pairs Hamming <= max_hamming set (pigeonhole recall).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from simplepolygon_ray.images.neardup import phash_near_dup_pairs, popcount64
from simplepolygon_ray.images.synth import gen_dup_batch, gen_images_with_dups


def brute_pairs(keys: np.ndarray, phashes: np.ndarray, max_hamming: int):
    out = set()
    for i in range(len(keys)):
        x = phashes[i + 1 :] ^ phashes[i]
        ham = popcount64(x.astype(np.int64))
        for j in np.nonzero(ham <= max_hamming)[0]:
            a, b = int(keys[i]), int(keys[i + 1 + j])
            out.add((min(a, b), max(a, b)))
    return out


def test_popcount64_matches_python():
    rng = np.random.default_rng(7)
    vals = rng.integers(-(2**63), 2**63, size=500, dtype=np.int64)
    vals[:3] = [0, -1, 2**62]
    got = popcount64(vals)
    want = [bin(int(np.uint64(v))).count("1") for v in vals]
    assert got.tolist() == want


def _phash_ds(ray, keys, phashes, n_blocks=4):
    import ray.data as rd

    t = pa.table(
        {
            "img_key": pa.array(keys, type=pa.int64()),
            "phash": pa.array(phashes, type=pa.int64()),
        }
    )
    return rd.from_arrow(t).repartition(n_blocks)


def test_pairs_equal_bruteforce_random(ray_session):
    # random phashes + planted near-dups at controlled Hamming distances
    rng = np.random.default_rng(11)
    n = 400
    ph = rng.integers(-(2**63), 2**63, size=n, dtype=np.int64)
    for k in range(0, 60, 3):
        d = (k // 3) % 4  # plant dups at Hamming 0..3
        dup = np.int64(ph[k])
        for bit in rng.choice(64, size=d, replace=False):
            dup = np.int64(dup ^ np.int64(1) << np.int64(int(bit)))
        ph[n - 1 - k] = dup
    keys = np.arange(n, dtype=np.int64)
    got = phash_near_dup_pairs(_phash_ds(ray_session, keys, ph), max_hamming=3)
    gdf = got.to_pandas()
    got_set = set(zip(gdf["id_a"].tolist(), gdf["id_b"].tolist()))
    want = brute_pairs(keys, ph, 3)
    assert got_set == want
    assert len(want) >= 20  # the plants actually landed
    # verified distances are right
    by_pair = dict(zip(zip(gdf["id_a"], gdf["id_b"]), gdf["hamming"]))
    ph_by_key = dict(zip(keys.tolist(), ph.tolist()))
    for (a, b), h in by_pair.items():
        x = np.int64(ph_by_key[a]) ^ np.int64(ph_by_key[b])
        assert int(popcount64(np.array([x]))[0]) == int(h) <= 3


def test_hot_band_split_complete_and_bounded(ray_session):
    # 600 identical phashes: every band group exceeds run_cap=256, the
    # sub-band split kicks in, and ALL C(600,2) pairs must still emerge
    # exactly once (identical hashes share every sub-band too).
    n = 600
    keys = np.arange(n, dtype=np.int64)
    ph = np.full(n, np.int64(0x0123456789ABCDEF), dtype=np.int64)
    got = phash_near_dup_pairs(
        _phash_ds(ray_session, keys, ph), max_hamming=3, run_cap=256
    )
    gdf = got.to_pandas()
    assert len(gdf) == n * (n - 1) // 2
    assert gdf.duplicated(["id_a", "id_b"]).sum() == 0
    assert (gdf["hamming"] == 0).all()


def test_gen_dup_batch_plants_recoverable_dups():
    n_base = 40
    fn = gen_dup_batch(n_base)
    ids = np.arange(n_base + 10, dtype=np.int64)
    t = fn({"id": ids})
    assert t.column_names == ["image_id", "bytes", "w", "h", "fmt", "phash"]
    ph = t["phash"].to_numpy()
    # each dup row's phash is within Hamming 3 of its base row
    for k in range(10):
        x = np.int64(ph[n_base + k]) ^ np.int64(ph[k])
        assert int(popcount64(np.array([x]))[0]) <= 3
    # determinism
    assert fn({"id": ids}).equals(t)


def test_end_to_end_synth_corpus(ray_session):
    # full path: synth corpus with planted dups -> pairs via phash table
    n_base, n_dups = 150, 40
    imgs = gen_images_with_dups(n_base, n_dups, parallelism=8)

    def keyed(t: pa.Table) -> pa.Table:
        keys = np.array([int(s[3:]) for s in t["image_id"].to_pylist()], np.int64)
        return pa.table({"img_key": pa.array(keys), "phash": t["phash"]})

    pairs = phash_near_dup_pairs(
        imgs.map_batches(keyed, batch_format="pyarrow"), max_hamming=3
    ).to_pandas()
    got = set(zip(pairs["id_a"].tolist(), pairs["id_b"].tolist()))
    # every planted (base, base + n_base) pair is recovered
    planted = {(k, n_base + k) for k in range(n_dups)}
    assert planted <= got

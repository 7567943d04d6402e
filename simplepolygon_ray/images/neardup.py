"""Near-duplicate image detection via banded perceptual-hash LSH.

Pipeline shape (Ray-Data-first, mirrors the text MinHash/SimHash
dedup stages in ``text/dedup.py``):

1. each image's 64-bit phash splits into ``n_bands`` contiguous
   16-bit bands; a pair of images agreeing on ANY band becomes a
   candidate (pigeonhole: every pair within Hamming distance
   ``n_bands - 1`` shares at least one band, so recall is EXACT for
   ``max_hamming <= n_bands - 1``);
2. candidates are found with ONE groupby on a hash BUCKET of the
   (band_id, band_value) key — every band-value group lands whole in
   one bucket, and pair emission is a segmented vectorized pass over
   runs (``_pairs_in_runs``), never a Python loop per pair;
3. hot bands (many images sharing a 16-bit band value — think
   near-constant thumbnails) split by the NEXT band's value once they
   exceed ``run_cap``, exactly like the SimHash-prefix blocking in
   ``text/dedup.py`` — bounded quadratics, replayed identically in
   the SQL oracle;
4. verification is a vectorized popcount of XORed phashes (no
   payload bytes travel past the featurize stage);
5. the same pair can fire in several bands: block-local dedupe, then
   one pair-hash-bucketed global dedupe (never a group per pair).

At 100 TB the only all-to-all exchanges are the two bucket groupbys,
both over slim (int64 × 4) rows — payload bytes never shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..text.dedup import _dedupe_pair_rows, _pairs_in_runs, dedupe_pairs_global

__all__ = ["phash_near_dup_pairs", "popcount64"]

_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Per-element popcount of an int64/uint64 array (numpy 1.x has no
    ``bitwise_count``): byte-view + 256-entry LUT."""
    b = np.ascontiguousarray(x).view(np.uint8).reshape(len(x), 8)
    return _POP8[b].sum(axis=1).astype(np.int64)


def phash_near_dup_pairs(
    imgs,
    *,
    max_hamming: int = 3,
    n_bands: int = 4,
    n_buckets: int = 512,
    run_cap: int = 256,
):
    """(img_key:int64, phash:int64) Dataset → near-dup pairs
    (id_a, id_b, hamming) with id_a < id_b and hamming <= max_hamming.

    Recall is exact for ``max_hamming <= n_bands - 1`` up to the
    ``run_cap`` hot-band split (deterministic, oracle-replayed).
    """
    if n_bands != 4:
        raise ValueError("n_bands is fixed at 4 (16-bit bands of a 64-bit phash)")

    def explode(t: pa.Table) -> pa.Table:
        key = t["img_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        ph = t["phash"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(key)
        band_id = np.repeat(np.arange(n_bands, dtype=np.int64), n)
        keys = np.tile(key, n_bands)
        phs = np.tile(ph, n_bands)
        # arithmetic shift + mask == logical band extraction (mask keeps
        # only the 16 true bits; DuckDB's BIGINT >> matches — prototyped)
        band_val = (phs >> (band_id * 16)) & np.int64(0xFFFF)
        sub = (phs >> (((band_id + 1) % n_bands) * 16)) & np.int64(0xFFFF)
        with np.errstate(over="ignore"):
            bb = (band_id * np.int64(0x9E3779B1) + band_val) % n_buckets
        return pa.table(
            {
                "_bb": pa.array(bb),
                "band_id": pa.array(band_id),
                "band_val": pa.array(band_val),
                "sub": pa.array(sub),
                "img_key": pa.array(keys),
                "phash": pa.array(phs),
            }
        )

    def pairs_from_group(g: pa.Table) -> pa.Table:
        bid = g["band_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bval = g["band_val"].to_numpy(zero_copy_only=False).astype(np.int64)
        sub = g["sub"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = g["img_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        ph = g["phash"].to_numpy(zero_copy_only=False).astype(np.int64)
        # global (band_id, band_val) group sizes: every such group lands
        # whole in this bucket, so local counts ARE global counts
        enc = bid * np.int64(1 << 16) + bval
        uenc, inv, cnt = np.unique(enc, return_inverse=True, return_counts=True)
        sub2 = np.where(cnt[inv] > run_cap, sub, np.int64(-1))
        order = np.lexsort((key, sub2, bval, bid))
        bid, bval, sub2 = bid[order], bval[order], sub2[order]
        new = np.ones(len(order), bool)
        new[1:] = (
            (bid[1:] != bid[:-1]) | (bval[1:] != bval[:-1]) | (sub2[1:] != sub2[:-1])
        )
        ai, bi = _pairs_in_runs(new, np.arange(len(order), dtype=np.int64))
        if len(ai) == 0:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "hamming": pa.array([], pa.int64()),
                }
            )
        k, p = key[order], ph[order]
        ham = popcount64((p[ai] ^ p[bi]).astype(np.int64))
        keep = ham <= max_hamming
        a, b, hm = k[ai[keep]], k[bi[keep]], ham[keep]
        rows = _dedupe_pair_rows(a, b)
        return pa.table(
            {"id_a": pa.array(a[rows]), "id_b": pa.array(b[rows]), "hamming": pa.array(hm[rows])}
        )

    cands = (
        imgs.map_batches(explode, batch_format="pyarrow")
        .groupby("_bb")
        .map_groups(pairs_from_group, batch_format="pyarrow")
    )
    return dedupe_pairs_global(cands, ["id_a", "id_b"], n_buckets=n_buckets)

"""queries() catalog for the geometry / text / ANN operators.

Geometry inputs are synthesized deterministically (fixtures + families
corpus + image table) at a scale tied to the sf directory — the driver
tables carry no geometry, and BASELINE.json's input_hint table is
synthesized per FIXTURES.md §3. These entries get rows-only checks
(not SQL-expressible); their correctness oracles are the brute-force
pytest suites (tests/test_stages.py, tests/test_text.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..ann.search import brute_topk, ivf_topk, query_vector
from ..images.codec import decode, psnr
from ..images.synth import gen_images, gen_points, make_pixels
from ..stages.cover_stage import DEFAULT_LEVEL, cover_rings_dataset
from ..stages.decompose_stage import decompose_dataset, fixture_polygons, polygons_source
from ..stages.pip_join import pip_join_broadcast, pip_join_shuffle
from ..stages.tiles import tile_assign_dataset
from ..text.dedup import embedding_near_dup_pairs, minhash_dedup_pairs
from ..text.ops import fingerprint_batch, langid_batch, quality_batch
from .flagship import scale_counts

__all__ = ["GEO_QUERIES", "TEXT_QUERIES", "ANN_QUERIES", "EXTRA_ORACLE_SQL"]


def q_geo_decompose(sf_dir: str):
    n_polys, _ = scale_counts(sf_dir)
    polygons = fixture_polygons().union(polygons_source(n_polys))
    simple = decompose_dataset(polygons)

    def project(t: pa.Table) -> pa.Table:
        nv = pa.array(
            [len(r) for r in t["ring"].to_pylist()], type=pa.int32()
        )
        return pa.table(
            {
                "geom_id": t["geom_id"],
                "ring_seq": t["ring_seq"],
                "ring_index": t["ring_index"],
                "parent": t["parent"],
                "winding": t["winding"],
                "net_winding": t["net_winding"],
                "n_vertices": nv,
            }
        )

    return simple.map_batches(project, batch_format="pyarrow")


def q_geo_cover(sf_dir: str):
    n_polys, _ = scale_counts(sf_dir)
    polygons = fixture_polygons().union(polygons_source(n_polys))
    simple = decompose_dataset(polygons)
    return cover_rings_dataset(simple, level=DEFAULT_LEVEL)


def q_geo_pip_join(sf_dir: str):
    n_polys, n_images = scale_counts(sf_dir)
    polygons = fixture_polygons().union(polygons_source(n_polys))
    simple = decompose_dataset(polygons)
    images = gen_points(n_images)
    return pip_join_broadcast(images, simple, level=DEFAULT_LEVEL).select_columns(
        ["image_id", "geom_id", "ring_seq"]
    )


def q_geo_pip_join_shuffle(sf_dir: str):
    import ray.data as rd

    n_polys, n_images = scale_counts(sf_dir)
    n_images = min(n_images, 20_000)  # shuffle variant exercised at reduced scale
    polygons = fixture_polygons().union(polygons_source(n_polys))
    simple = decompose_dataset(polygons)
    images = gen_points(n_images)
    return pip_join_shuffle(
        images, simple, level=DEFAULT_LEVEL, num_partitions=16, salt_factor=2
    ).select_columns(["image_id", "geom_id", "ring_seq"])


def q_geo_knn(sf_dir: str):
    from ..stages.knn import knn_join_dataset

    _, n_images = scale_counts(sf_dir)
    n_sites = max(n_images // 10, 100)
    sites = gen_points(n_sites)  # stays distributed; index compiles in a task
    probes = gen_points(min(n_images, 5_000))
    return knn_join_dataset(probes, sites, k=5, level=DEFAULT_LEVEL)


def q_geo_tile_assign(sf_dir: str):
    n_polys, _ = scale_counts(sf_dir)
    polygons = fixture_polygons().union(polygons_source(n_polys))
    simple = decompose_dataset(polygons)
    tiles = tile_assign_dataset(simple, zoom=8)

    def project(t: pa.Table) -> pa.Table:
        nv = pa.array([len(r) for r in t["clipped_ring"].to_pylist()], type=pa.int32())
        return pa.table(
            {
                "geom_id": t["geom_id"],
                "ring_seq": t["ring_seq"],
                "tile_z": t["tile_z"],
                "tile_x": t["tile_x"],
                "tile_y": t["tile_y"],
                "n_clip_vertices": nv,
            }
        )

    return tiles.map_batches(project, batch_format="pyarrow")


def q_image_decode_check(sf_dir: str):
    """Per-row input_hint invariant: decoded pixels vs reference pattern
    (bit-exact for raw, PSNR>=40dB for q6) + caption equality."""
    _, n_images = scale_counts(sf_dir)

    def check(t: pa.Table) -> pa.Table:
        ids = [int(s[3:]) for s in t["image_id"].to_pylist()]
        ws = t["w"].to_pylist()
        hs = t["h"].to_pylist()
        fmts = t["fmt"].to_pylist()
        payloads = t["bytes"].to_pylist()
        caps = t["caption"].to_pylist()
        phashes = t["phash"].to_pylist()
        ok_pix, ok_cap, psnrs = [], [], []
        for rid, w, h, fmt, payload, cap, ph in zip(
            ids, ws, hs, fmts, payloads, caps, phashes
        ):
            dec = decode(payload, w, h, fmt)
            ref = make_pixels(rid, w, h)
            p = psnr(ref, dec)
            psnrs.append(min(p, 99.0))
            ok_pix.append(bool(p == float("inf")) if fmt == "raw" else bool(p >= 40.0))
            ok_cap.append(
                cap == f"synthetic image {rid:012d} stripe {rid % 7} gradient {rid % 11}"
            )
        return pa.table(
            {
                "image_id": t["image_id"],
                "fmt": t["fmt"],
                "pixels_ok": pa.array(ok_pix, type=pa.bool_()),
                "caption_ok": pa.array(ok_cap, type=pa.bool_()),
                "psnr_db": pa.array(psnrs, type=pa.float64()),
            }
        )

    return gen_images(min(n_images, 20_000)).map_batches(check, batch_format="pyarrow")


GEO_QUERIES = {
    "geo_decompose": q_geo_decompose,
    "geo_cover": q_geo_cover,
    "geo_pip_join": q_geo_pip_join,
    "geo_pip_join_shuffle": q_geo_pip_join_shuffle,
    "geo_knn": q_geo_knn,
    "geo_tile_assign": q_geo_tile_assign,
    "image_decode_check": q_image_decode_check,
}


# ---------------------------------------------------------------- text


def _docs(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


def q_text_langid(sf_dir: str):
    return _docs(sf_dir).map_batches(
        lambda b: langid_batch(b)[["doc_id", "lang_pred"]], batch_format="pandas"
    )


def q_text_quality(sf_dir: str):
    return _docs(sf_dir).map_batches(
        lambda b: quality_batch(b)[["doc_id", "n_words", "punct_ratio", "stop_ratio", "quality"]],
        batch_format="pandas",
    )


def q_text_fingerprint(sf_dir: str):
    return _docs(sf_dir).map_batches(fingerprint_batch, batch_format="pandas")


def q_text_simhash(sf_dir: str):
    from ..text.dedup import simhash_batch

    return _docs(sf_dir).map_batches(simhash_batch, batch_format="pandas")


def q_minhash_dedup(sf_dir: str):
    return minhash_dedup_pairs(_docs(sf_dir), threshold=0.5)


def q_ngram_jaccard(sf_dir: str):
    from ..text.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs(sf_dir), threshold=0.3, prefix_bits=8)


def q_embedding_near_dup(sf_dir: str):
    import ray.data as rd

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return embedding_near_dup_pairs(emb, threshold=0.3)


TEXT_QUERIES = {
    "text_langid": q_text_langid,
    "text_quality": q_text_quality,
    "text_fingerprint": q_text_fingerprint,
    "text_simhash": q_text_simhash,
    "minhash_dedup_pairs": q_minhash_dedup,
    "ngram_jaccard_pairs": q_ngram_jaccard,
    "embedding_near_dup": q_embedding_near_dup,
}


# ---------------------------------------------------------------- ann


def q_ann_brute(sf_dir: str):
    import ray.data as rd

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return brute_topk(emb, query_vector(64), k=10)


def q_ann_ivf(sf_dir: str):
    import ray.data as rd

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return ivf_topk(emb, query_vector(64), k=10, n_clusters=16, nprobe=8)


ANN_QUERIES = {
    "ann_brute_topk": q_ann_brute,
    "ann_ivf_topk": q_ann_ivf,
}

EXTRA_ORACLE_SQL: dict[str, str] = {}


# ---------------------------------------------------------- cell stats


def q_cell_counts(sf_dir: str):
    """Per-cell covering density (skew diagnostic that sizes the salt
    factor of the shuffle join — SURVEY.md §4.3)."""
    from ray.data.aggregate import Sum

    cover = q_geo_cover(sf_dir)
    from ..relational.queries import _partial_groupby

    partial = cover.map_batches(
        _partial_groupby(["cell_id"], [("cell_id", "count", "n_rings")]),
        batch_format="pyarrow",
    )
    return partial.groupby("cell_id").aggregate(Sum("n_rings", alias_name="n_rings"))


def q_distinct_cells(sf_dir: str):
    """Distinct covered cell ids (local unique -> tiny global groupby)."""
    from ray.data.aggregate import Count

    cover = q_geo_cover(sf_dir)
    local = cover.map_batches(
        lambda t: pa.table({"cell_id": t["cell_id"].unique()}), batch_format="pyarrow"
    )
    return local.groupby("cell_id").aggregate(Count(alias_name="_c")).select_columns(
        ["cell_id"]
    )


GEO_QUERIES.update(
    {
        "cell_counts": q_cell_counts,
        "distinct_cells": q_distinct_cells,
    }
)


# ------------------------------------------------------- media + sketches


def q_media_decode_featurize(sf_dir: str):
    """Actor-pool image decode + phash/luma feature extraction."""
    from ..stages.media import decode_and_featurize

    _, n_images = scale_counts(sf_dir)
    return decode_and_featurize(gen_images(min(n_images, 5_000)), concurrency=(1, 4))


def q_media_resize(sf_dir: str):
    """Actor-pool thumbnailing; output projected to metadata columns."""
    from ..stages.media import resize_images

    _, n_images = scale_counts(sf_dir)
    out = resize_images(gen_images(min(n_images, 5_000)), out_w=16, out_h=16,
                        concurrency=(1, 4))
    return out.map_batches(
        lambda t: t.select(["image_id", "w", "h", "fmt"]), batch_format="pyarrow"
    )


def q_approx_distinct_users(sf_dir: str):
    """HLL approximate COUNT(DISTINCT user_id) over events (rows-only:
    approximate by design; error bound tested in pytest)."""
    import ray.data as rd

    from ..relational.sketches import approx_distinct

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    est = approx_distinct(ev, "user_id", p=12)
    return pd.DataFrame({"approx_distinct_users": [float(round(est, 1))]})


GEO_QUERIES.update(
    {
        "media_decode_featurize": q_media_decode_featurize,
        "media_resize": q_media_resize,
        "approx_distinct_users": q_approx_distinct_users,
    }
)


def q_geo_compact_cover(sf_dir: str):
    """Mixed-level compacted covering: full sibling quads merge into
    their parent cell (cells/grid.compact_cells)."""
    from ..cells.grid import compact_cells

    cover = q_geo_cover(sf_dir)

    def compact(t: pa.Table) -> pa.Table:
        from ..cells.grid import cell_level

        empty = pa.table(
            {
                "geom_id": pa.array([], type=pa.string()),
                "ring_seq": pa.array([], type=pa.int32()),
                "cell_id": pa.array([], type=pa.int64()),
                "level": pa.array([], type=pa.int8()),
            }
        )
        if t.num_columns == 0 or t.num_rows == 0:
            return empty
        # sort-split by (geom_id, ring_seq) instead of a per-row dict
        gid_codes = (
            t["geom_id"]
            .combine_chunks()
            .dictionary_encode()
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        seqs = t["ring_seq"].to_numpy(zero_copy_only=False).astype(np.int64)
        cells = t["cell_id"].to_numpy(zero_copy_only=False)
        key = gid_codes * np.int64(1 << 31) + seqs
        order = np.argsort(key, kind="stable")
        bounds = np.flatnonzero(np.diff(key[order])) + 1
        row_ids, comp_cells = [], []
        for rows in np.split(order, bounds):
            comp = compact_cells(cells[rows].astype(np.uint64))
            row_ids.append(np.full(len(comp), rows[0], np.int64))
            comp_cells.append(comp)
        if not row_ids:
            return empty
        rid = np.concatenate(row_ids)
        cc = np.concatenate(comp_cells)
        take = pa.array(rid)
        return pa.table(
            {
                "geom_id": t["geom_id"].take(take),
                "ring_seq": t["ring_seq"].take(take),
                "cell_id": pa.array(cc.astype(np.int64)),
                "level": pa.array(cell_level(cc).astype(np.int8)),
            }
        )

    return cover.map_batches(compact, batch_format="pyarrow")


def q_geo_zonal_counts(sf_dir: str):
    """Zonal statistics: image points per simple ring (spatial join
    composed with a grouped aggregate)."""
    from ray.data.aggregate import Sum

    from ..relational.queries import _partial_groupby

    joined = q_geo_pip_join(sf_dir)
    partial = joined.map_batches(
        _partial_groupby(["geom_id", "ring_seq"], [("ring_seq", "count", "n_points")]),
        batch_format="pyarrow",
    )
    return partial.groupby(["geom_id", "ring_seq"]).aggregate(
        Sum("n_points", alias_name="n_points")
    )


GEO_QUERIES.update(
    {
        "geo_compact_cover": q_geo_compact_cover,
        "geo_zonal_counts": q_geo_zonal_counts,
    }
)

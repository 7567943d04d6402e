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

# ------------------------------------------------------------------
# DuckDB oracle scaffolding: geometry inputs are synthesized, so the
# queries persist their EXACT inputs (points / ring edges / covers) as
# parquet under /tmp via DISTRIBUTED write_parquet, and the oracle SQL
# recomputes the operator (point-in-polygon crossing count, group-bys,
# kNN ranking) from those files. The driver always runs the Ray query
# before its SQL, so the files exist when DuckDB reads them.
# ------------------------------------------------------------------

_ORACLE_DIR = "/tmp/simplepolygon_oracle"


def _persist(ds, name: str) -> str:
    """Distributed-write a dataset to the oracle dir; returns the dir.
    (Never materializes on the driver — blocks stream to parquet.)"""
    import shutil

    out = f"{_ORACLE_DIR}/{name}"
    shutil.rmtree(out, ignore_errors=True)
    ds.write_parquet(out)
    return out


def _edges_batch(t: pa.Table) -> pa.Table:
    """simple-ring rows → one row per edge (cur vertex, cyclic prev),
    the exact edge table the PIP kernel tests against."""
    from ..cells.grid import _rl_arange

    if t.num_columns == 0 or t.num_rows == 0:
        return pa.table(
            {
                "geom_id": pa.array([], type=pa.string()),
                "ring_seq": pa.array([], type=pa.int32()),
                "xi": pa.array([], type=pa.float64()),
                "yi": pa.array([], type=pa.float64()),
                "xj": pa.array([], type=pa.float64()),
                "yj": pa.array([], type=pa.float64()),
            }
        )
    col = t["ring"].combine_chunks()
    offs = np.asarray(col.offsets).astype(np.int64)
    coords = np.asarray(col.values.values, dtype=np.float64).reshape(-1, 2)
    vlen = offs[1:] - offs[:-1]
    closed = (coords[offs[:-1]] == coords[np.maximum(offs[1:] - 1, 0)]).all(axis=1)
    closed &= vlen > 1
    olen = vlen - closed.astype(np.int64)
    gather = _rl_arange(offs[:-1], olen)
    oc = coords[gather]
    ostart = np.concatenate([[0], np.cumsum(olen)[:-1]]).astype(np.int64)
    vidx = np.arange(len(oc), dtype=np.int64)
    prev = vidx - 1
    nz = olen > 0
    prev[ostart[nz]] = (ostart + olen - 1)[nz]
    take = pa.array(np.repeat(np.arange(len(t), dtype=np.int64), olen))
    return pa.table(
        {
            "geom_id": t["geom_id"].take(take),
            "ring_seq": t["ring_seq"].take(take),
            "xi": pa.array(oc[:, 0]),
            "yi": pa.array(oc[:, 1]),
            "xj": pa.array(oc[prev, 0]),
            "yj": pa.array(oc[prev, 1]),
        }
    )


def _verts_batch(t: pa.Table) -> pa.Table:
    """simple-ring rows → one row per OPEN vertex (closing vertex
    stripped, exactly as tile_clip_batch's ``open_len``), with the
    in-ring position ``vidx`` so SQL can rebuild the ordered list."""
    from ..cells.grid import _rl_arange

    if t.num_columns == 0 or t.num_rows == 0:
        return pa.table(
            {
                "geom_id": pa.array([], type=pa.string()),
                "ring_seq": pa.array([], type=pa.int32()),
                "vidx": pa.array([], type=pa.int32()),
                "x": pa.array([], type=pa.float64()),
                "y": pa.array([], type=pa.float64()),
            }
        )
    col = t["ring"].combine_chunks()
    offs = np.asarray(col.offsets).astype(np.int64)
    coords = np.asarray(col.values.values, dtype=np.float64).reshape(-1, 2)
    vlen = offs[1:] - offs[:-1]
    closed = (coords[offs[:-1]] == coords[np.maximum(offs[1:] - 1, 0)]).all(axis=1)
    closed &= vlen > 1
    olen = vlen - closed.astype(np.int64)
    gather = _rl_arange(offs[:-1], olen)
    oc = coords[gather]
    ostart = np.concatenate([[0], np.cumsum(olen)[:-1]]).astype(np.int64)
    vidx = np.arange(len(oc), dtype=np.int64) - np.repeat(ostart, olen)
    take = pa.array(np.repeat(np.arange(len(t), dtype=np.int64), olen))
    return pa.table(
        {
            "geom_id": t["geom_id"].take(take),
            "ring_seq": t["ring_seq"].take(take),
            "vidx": pa.array(vidx.astype(np.int32)),
            "x": pa.array(oc[:, 0]),
            "y": pa.array(oc[:, 1]),
        }
    )


def _pip_sql(points_dir: str, edges_dir: str) -> str:
    """Crossing-number PIP in SQL, arithmetically identical (same ops,
    same order) to geom.kernels.points_in_ring / CompiledRingIndex.
    Division by zero yields NULL in DuckDB → predicate false, matching
    the numpy cond-mask. Boundary points count as outside."""
    return f"""
WITH pts AS (SELECT image_id, lon, lat FROM read_parquet('{points_dir}/*.parquet')),
e AS (SELECT * FROM read_parquet('{edges_dir}/*.parquet')),
bb AS (SELECT geom_id, ring_seq,
         min(least(xi, xj)) AS x0, max(greatest(xi, xj)) AS x1,
         min(least(yi, yj)) AS y0, max(greatest(yi, yj)) AS y1
       FROM e GROUP BY geom_id, ring_seq),
cand AS (SELECT p.image_id, p.lon, p.lat, b.geom_id, b.ring_seq
         FROM pts p JOIN bb b
           ON p.lon >= b.x0 AND p.lon <= b.x1 AND p.lat >= b.y0 AND p.lat <= b.y1),
t AS (SELECT c.image_id, c.geom_id, c.ring_seq,
        SUM(CASE WHEN ((e.yi > c.lat) <> (e.yj > c.lat))
                  AND c.lon < (e.xj - e.xi) * (c.lat - e.yi) / (e.yj - e.yi) + e.xi
            THEN 1 ELSE 0 END) AS crossings,
        SUM(CASE WHEN c.lat * (e.xi - e.xj) + e.yi * (e.xj - c.lon) + e.yj * (c.lon - e.xi) = 0
                  AND (e.xi - c.lon) * (e.xj - c.lon) <= 0
                  AND (e.yi - c.lat) * (e.yj - c.lat) <= 0
            THEN 1 ELSE 0 END) AS on_edges
      FROM cand c JOIN e ON e.geom_id = c.geom_id AND e.ring_seq = c.ring_seq
      GROUP BY c.image_id, c.geom_id, c.ring_seq)
SELECT image_id, geom_id, ring_seq FROM t WHERE crossings % 2 = 1 AND on_edges = 0
"""



_SIMPLE_CACHE: dict = {}


def _simple_rings_cached(sf_dir: str):
    """The decomposed simple-ring corpus (fixtures ∪ synthetic),
    materialized ONCE per (process, sf_dir) — ~15 catalog queries
    consume the identical corpus, so a driver sweep pays the
    decompose exactly once and every derived oracle export reads
    byte-identical blocks.  Decompose is deterministic, so results
    are unchanged; only the recomputation is eliminated (same shape
    as _COPURCHASE_CACHE / _minhash_pairs_cached)."""
    if _SIMPLE_CACHE.get("key") == sf_dir:
        return _SIMPLE_CACHE["ds"]
    n_polys, _ = scale_counts(sf_dir)
    polygons = fixture_polygons().union(polygons_source(n_polys))
    ds = decompose_dataset(polygons).materialize()
    _SIMPLE_CACHE["key"] = sf_dir
    _SIMPLE_CACHE["ds"] = ds
    return ds


def q_geo_decompose(sf_dir: str):
    """Decompose projection with a structural SQL oracle: the persisted
    rows carry (parent, winding) and the oracle RE-DERIVES net_winding
    by walking the parent chain with a recursive CTE (reference
    src/index.ts:696-720 semantics: net = parent net + winding, roots
    at parent = -1) — a wrong parent link, a cycle, or a wrong net
    value all break the hash/row compare. ring_index is fast-path-null
    in the engine; it persists as -1 so the compare is null-free."""
    import pyarrow.compute as pc
    import ray.data as rd

    simple = _simple_rings_cached(sf_dir)

    def project(t: pa.Table) -> pa.Table:
        col = t["ring"].combine_chunks()
        nv = pa.array(np.diff(np.asarray(col.offsets)).astype(np.int32))
        return pa.table(
            {
                "geom_id": t["geom_id"],
                "ring_seq": t["ring_seq"],
                "ring_index": pc.fill_null(t["ring_index"], -1),
                "parent": t["parent"],
                "winding": t["winding"],
                "net_winding": t["net_winding"],
                "n_vertices": nv,
            }
        )

    proj_dir = _persist(
        simple.map_batches(project, batch_format="pyarrow"), "decompose_proj"
    )
    return rd.read_parquet(proj_dir)


def q_geo_cover(sf_dir: str):
    simple = _simple_rings_cached(sf_dir)
    # persist the ring edge table so the SQL oracle can replay the
    # covering (slab rasterization + center PIP) on identical inputs
    _persist(simple.map_batches(_edges_batch, batch_format="pyarrow"), "cover_edges")
    return cover_rings_dataset(simple, level=DEFAULT_LEVEL)


def q_geo_pip_join(sf_dir: str):
    import ray.data as rd

    n_polys, n_images = scale_counts(sf_dir)
    simple = _simple_rings_cached(sf_dir)
    # persist the join inputs for the SQL oracle, then read them back
    # so both engines see byte-identical inputs (single compute)
    _persist(simple.map_batches(_edges_batch, batch_format="pyarrow"), "pip_edges")
    pts_dir = _persist(gen_points(n_images), "pip_points")
    images = rd.read_parquet(pts_dir)
    return pip_join_broadcast(images, simple, level=DEFAULT_LEVEL).select_columns(
        ["image_id", "geom_id", "ring_seq"]
    )


def q_geo_pip_join_shuffle(sf_dir: str):
    import ray.data as rd

    n_polys, n_images = scale_counts(sf_dir)
    n_images = min(n_images, 20_000)  # shuffle variant exercised at reduced scale
    simple = _simple_rings_cached(sf_dir)
    _persist(
        simple.map_batches(_edges_batch, batch_format="pyarrow"), "pip_edges_shuffle"
    )
    pts_dir = _persist(gen_points(n_images), "pip_points_shuffle")
    images = rd.read_parquet(pts_dir)
    return pip_join_shuffle(
        images, simple, level=DEFAULT_LEVEL, num_partitions=16, salt_factor=2
    ).select_columns(["image_id", "geom_id", "ring_seq"])


def q_geo_knn(sf_dir: str):
    import ray.data as rd

    from ..stages.knn import knn_join_dataset

    _, n_images = scale_counts(sf_dir)
    n_sites = max(n_images // 10, 100)
    sites_dir = _persist(gen_points(n_sites), "knn_sites")
    probes_dir = _persist(gen_points(min(n_images, 5_000)), "knn_probes")
    sites = rd.read_parquet(sites_dir)  # stays distributed; index compiles in a task
    probes = rd.read_parquet(probes_dir)
    out = knn_join_dataset(probes, sites, k=5, level=DEFAULT_LEVEL)
    # dist_km AND rank are dropped from the oracle-checked projection:
    # haversine needs sin/cos whose last-ulp differs between numpy and
    # DuckDB's libm, so (a) values can't hash-match and (b) a near-tie
    # could order differently per engine. The compare is the
    # rank-insensitive k-NN SET per probe — a wrong neighbor anywhere
    # still mismatches, but an ulp-swap inside the top k cannot flake.
    # Exact ties (planted corpus case in tests/test_stages.py::
    # test_knn_exact_tie_deterministic) resolve identically on both
    # sides via the (dist, neighbor_id) tie-break.
    return out.select_columns(["image_id", "neighbor_id"])


def q_geo_tile_assign(sf_dir: str):
    """Tile assignment + clip, oracle-checked end-to-end: the ordered
    open ring vertices persist and the SQL replays covering, boundary/
    interior split AND the 4-pass Sutherland–Hodgman clip op-for-op,
    comparing (geom, ring, tile, n_clip_vertices)."""
    simple = _simple_rings_cached(sf_dir)
    _persist(simple.map_batches(_verts_batch, batch_format="pyarrow"), "tile_verts")
    tiles = tile_assign_dataset(simple, zoom=8)

    def project(t: pa.Table) -> pa.Table:
        col = t["clipped_ring"].combine_chunks()
        nv = pa.array(np.diff(np.asarray(col.offsets)).astype(np.int32))
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


def q_tile_pyramid_counts(sf_dir: str):
    """Tile-pyramid rollup (the map-rendering aggregation): clipped
    ring×tile assignments at z8 roll up to their z6 and z4 parent
    tiles by integer shifts (x >> Δz, y >> Δz — exact both engines).
    One map_batches emits per-block partial counts for all three
    levels (3 slim rows per distinct tile per block), then a single
    groupby sums — the exchange is bounded by tiles × blocks, never
    assignments. Oracle: the z8 assignment persists and SQL replays
    the shift rollup."""
    simple = _simple_rings_cached(sf_dir)
    tiles = tile_assign_dataset(simple, zoom=8)

    def proj(t: pa.Table) -> pa.Table:
        return t.select(["geom_id", "ring_seq", "tile_x", "tile_y"])

    _persist(tiles.map_batches(proj, batch_format="pyarrow"), "pyramid_z8")

    def partial(t: pa.Table) -> pa.Table:
        x = t["tile_x"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t["tile_y"].to_numpy(zero_copy_only=False).astype(np.int64)
        zs, xs, ys, ns = [], [], [], []
        for z in (8, 6, 4):
            dz = 8 - z
            key = ((x >> dz) << np.int64(32)) | (y >> dz)
            uk, cnt = np.unique(key, return_counts=True)
            zs.append(np.full(len(uk), z, np.int64))
            xs.append(uk >> np.int64(32))
            ys.append(uk & np.int64(0xFFFFFFFF))
            ns.append(cnt.astype(np.int64))
        return pa.table(
            {
                "zoom": pa.array(np.concatenate(zs)),
                "tile_x": pa.array(np.concatenate(xs)),
                "tile_y": pa.array(np.concatenate(ys)),
                "n_rings": pa.array(np.concatenate(ns)),
            }
        )

    from ray.data.aggregate import Sum

    return (
        tiles.map_batches(partial, batch_format="pyarrow")
        .groupby(["zoom", "tile_x", "tile_y"])
        .aggregate(Sum("n_rings", alias_name="n_rings"))
    )


_TILE_PYRAMID_SQL = f"""
WITH a AS (SELECT tile_x, tile_y
           FROM read_parquet('{_ORACLE_DIR}/pyramid_z8/*.parquet')),
l AS (SELECT unnest([8, 6, 4]) AS zoom)
SELECT CAST(l.zoom AS BIGINT) AS zoom,
       CAST(a.tile_x >> (8 - l.zoom) AS BIGINT) AS tile_x,
       CAST(a.tile_y >> (8 - l.zoom) AS BIGINT) AS tile_y,
       COUNT(*) AS n_rings
FROM a CROSS JOIN l
GROUP BY 1, 2, 3
"""


def q_image_cell_density(sf_dir: str):
    """Geotag heatmap (images per level-6 grid cell): the pruned
    (lon, lat) projection streams through one map_batches computing
    cell coordinates + a block-local bincount, then a single groupby
    sums per-cell partials — the exchange is bounded by occupied cells
    × blocks. The quantization ((lon+180)/360·n, truncated, clipped)
    is exact IEEE arithmetic, so the SQL oracle replays point→cell
    INDEPENDENTLY from the persisted points — a real cross-engine
    check of the cell indexer, not a round-trip."""
    import ray.data as rd

    _, n_images = scale_counts(sf_dir)
    pts_dir = _persist(gen_points(min(n_images, 50_000)), "cell_density_pts")
    pts = rd.read_parquet(pts_dir, columns=["lon", "lat"])
    n = 64  # level 6

    def partial(t: pa.Table) -> pa.Table:
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        i = np.clip(((lon + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
        j = np.clip(((lat + 90.0) / 180.0 * n).astype(np.int64), 0, n - 1)
        cnt = np.bincount(i * n + j, minlength=n * n).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "cx": pa.array(nz // n),
                "cy": pa.array(nz % n),
                "n_images": pa.array(cnt[nz]),
            }
        )

    from ray.data.aggregate import Sum

    return (
        pts.map_batches(partial, batch_format="pyarrow")
        .groupby(["cx", "cy"])
        .aggregate(Sum("n_images", alias_name="n_images"))
    )


_CELL_DENSITY_SQL = f"""
SELECT cx, cy, COUNT(*) AS n_images
FROM (SELECT
        LEAST(GREATEST(CAST(trunc((lon + 180.0) / 360.0 * 64) AS BIGINT), 0), 63) AS cx,
        LEAST(GREATEST(CAST(trunc((lat + 90.0) / 180.0 * 64) AS BIGINT), 0), 63) AS cy
      FROM read_parquet('{_ORACLE_DIR}/cell_density_pts/*.parquet'))
GROUP BY cx, cy
"""


def q_image_decode_check(sf_dir: str):
    """Per-row input_hint invariant, fully SQL-oracled: decode payload,
    regenerate the deterministic reference pattern, compare as the
    EXACT integer sum of squared errors (raw ⇒ sse == 0; q6 ⇒
    sse·10⁴ ≤ 255²·10⁴/10⁴·n_px, i.e. PSNR ≥ 40 dB rewritten as an
    integer inequality — no cross-engine float log10), plus caption
    equality. The (image_id, payload-as-int-list, w, h, fmt, caption)
    projection persists so DuckDB replays decode + pattern + SSE
    op-for-op from the raw payload. Capped at 4000 rows (invariant
    check, not a throughput path; the cap is logged in the docstring,
    not silent)."""
    n = _persist_media_inputs(sf_dir)
    imgs = gen_images(n)

    def check(t: pa.Table) -> pa.Table:
        ids = [int(s[3:]) for s in t["image_id"].to_pylist()]
        ws = t["w"].to_pylist()
        hs = t["h"].to_pylist()
        fmts = t["fmt"].to_pylist()
        payloads = t["bytes"].to_pylist()
        caps = t["caption"].to_pylist()
        sses, n_pxs, ok_pix, ok_cap = [], [], [], []
        for rid, w, h, fmt, payload, cap in zip(ids, ws, hs, fmts, payloads, caps):
            dec = decode(payload, w, h, fmt).astype(np.int64)
            ref = make_pixels(rid, w, h).astype(np.int64)
            sse = int(((dec - ref) ** 2).sum())
            n_px = w * h * 3
            sses.append(sse)
            n_pxs.append(n_px)
            ok_pix.append(sse == 0 if fmt == "raw" else sse * 10000 <= 65025 * n_px)
            ok_cap.append(
                cap == f"synthetic image {rid:012d} stripe {rid % 7} gradient {rid % 11}"
            )
        return pa.table(
            {
                "image_id": t["image_id"],
                "fmt": t["fmt"],
                "sse": pa.array(sses, type=pa.int64()),
                "n_px": pa.array(n_pxs, type=pa.int64()),
                "pixels_ok": pa.array(np.asarray(ok_pix, np.int64)),
                "caption_ok": pa.array(np.asarray(ok_cap, np.int64)),
            }
        )

    return imgs.map_batches(check, batch_format="pyarrow")


def q_geo_knn_shuffle(sf_dir: str):
    """Cell-keyed shuffle kNN (huge-sites path): probes fan out to
    neighbor cells, hash join on cell, segmented vectorized top-k.
    Level 6 + radius 2 certifies most probes exact on this corpus.

    SQL oracle: probes/sites persist, the full result (with the
    ``exact`` certification flag) persists, and the query returns the
    exact-certified rows — which the oracle recomputes as the TRUE
    global kNN ranking over the persisted inputs restricted to those
    probes. A wrong join, top-k, or a falsely-set exact flag all
    mismatch."""
    import ray.data as rd

    from ..stages.knn import knn_join_shuffle

    _, n_images = scale_counts(sf_dir)
    sites_dir = _persist(gen_points(max(n_images // 10, 100)), "knn_shuffle_sites")
    probes_dir = _persist(gen_points(min(n_images, 2_000)), "knn_shuffle_probes")
    res = knn_join_shuffle(
        rd.read_parquet(probes_dir),
        rd.read_parquet(sites_dir),
        k=5,
        level=6,
        radius=2,
        num_partitions=8,
    ).materialize()
    _persist(res, "knn_shuffle_out")

    def exact_only(t: pa.Table) -> pa.Table:
        # rank dropped for ulp-tie immunity, same as q_geo_knn
        return t.filter(t["exact"].combine_chunks()).select(
            ["image_id", "neighbor_id"]
        )

    return res.map_batches(exact_only, batch_format="pyarrow")


def _query_boxes(n: int = 64):
    """Deterministic query rectangles — pure integer-derived float64
    arithmetic (every term dyadic-exact), so numpy and SQL build the
    IDENTICAL boxes with no trig/rounding divergence."""
    i = np.arange(n, dtype=np.int64)
    col = (i % 8).astype(np.float64)
    row = (i // 8).astype(np.float64)
    lon0 = -180.0 + col * 45.0 + (i % 7).astype(np.float64)
    lat0 = -90.0 + row * 22.5 + (i % 5).astype(np.float64)
    lon1 = lon0 + 20.0 + (i % 11).astype(np.float64)
    lat1 = lat0 + 10.0 + (i % 3).astype(np.float64)
    return i, lon0, lat0, lon1, lat1


def q_geo_bbox_join(sf_dir: str):
    """Spatial RANGE join (rect × rect interval overlap): each simple
    ring's bbox against a deterministic query-box set. The box side is
    the broadcast-small dimension (64 rows, generated in-task from a
    pure function — nothing ships); rings stream through one
    map_batches whose per-block work is a reduceat bbox pass + one
    vectorized (rings × boxes) interval test. No shuffle anywhere; at
    a huge box count the same pipeline would cover boxes and rings by
    cell and co-locate on the cell key (the pip_join_shuffle shape).

    Oracle: ordered open vertices persist (same projection as the tile
    oracle) and SQL rebuilds each ring's bbox with min/max GROUP BY,
    regenerates the boxes from the identical integer arithmetic, and
    replays the interval join."""
    simple = _simple_rings_cached(sf_dir)
    _persist(simple.map_batches(_verts_batch, batch_format="pyarrow"), "bbox_verts")
    bid, blon0, blat0, blon1, blat1 = _query_boxes()

    def join(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.table(
                {
                    "geom_id": pa.array([], pa.string()),
                    "ring_seq": pa.array([], pa.int32()),
                    "box_id": pa.array([], pa.int64()),
                }
            )
        col = t["ring"].combine_chunks()
        offs = np.asarray(col.offsets).astype(np.int64)
        coords = np.asarray(col.values.values, dtype=np.float64).reshape(-1, 2)
        starts = offs[:-1]
        mnx = np.minimum.reduceat(coords[:, 0], starts)
        mxx = np.maximum.reduceat(coords[:, 0], starts)
        mny = np.minimum.reduceat(coords[:, 1], starts)
        mxy = np.maximum.reduceat(coords[:, 1], starts)
        hit = (
            (mnx[:, None] <= blon1[None, :])
            & (mxx[:, None] >= blon0[None, :])
            & (mny[:, None] <= blat1[None, :])
            & (mxy[:, None] >= blat0[None, :])
        )
        r, b = np.nonzero(hit)
        take = pa.array(r)
        return pa.table(
            {
                "geom_id": t["geom_id"].take(take),
                "ring_seq": t["ring_seq"].take(take),
                "box_id": pa.array(bid[b]),
            }
        )

    return simple.map_batches(join, batch_format="pyarrow")


_BBOX_JOIN_SQL = f"""
WITH v AS (SELECT geom_id, ring_seq,
                  min(x) AS mnx, max(x) AS mxx, min(y) AS mny, max(y) AS mxy
           FROM read_parquet('{_ORACLE_DIR}/bbox_verts/*.parquet')
           GROUP BY geom_id, ring_seq),
b AS (SELECT i AS box_id,
             -180.0 + (i % 8) * 45.0 + (i % 7) AS lon0,
             -90.0 + (i // 8) * 22.5 + (i % 5) AS lat0,
             -180.0 + (i % 8) * 45.0 + (i % 7) + 20.0 + (i % 11) AS lon1,
             -90.0 + (i // 8) * 22.5 + (i % 5) + 10.0 + (i % 3) AS lat1
      FROM (SELECT unnest(generate_series(0, 63)) AS i))
SELECT v.geom_id, v.ring_seq, b.box_id
FROM v JOIN b ON v.mnx <= b.lon1 AND v.mxx >= b.lon0
             AND v.mny <= b.lat1 AND v.mxy >= b.lat0
"""


GEO_QUERIES = {
    "geo_decompose": q_geo_decompose,
    "geo_cover": q_geo_cover,
    "geo_pip_join": q_geo_pip_join,
    "geo_pip_join_shuffle": q_geo_pip_join_shuffle,
    "geo_knn": q_geo_knn,
    "geo_knn_shuffle": q_geo_knn_shuffle,
    "geo_tile_assign": q_geo_tile_assign,
    "geo_bbox_join": q_geo_bbox_join,
    "tile_pyramid_counts": q_tile_pyramid_counts,
    "image_cell_density": q_image_cell_density,
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
    """Quality scores in exact-integer fixed point (parts-per-million
    floors) so the DuckDB oracle hash-compares without float drift."""
    import pandas as pd

    def f(b):
        q = quality_batch(b)
        return pd.DataFrame(
            {
                "doc_id": q["doc_id"],
                "n_words": q["n_words"],
                "punct_ppm": np.floor(q["punct_ratio"].to_numpy() * 1e6).astype(np.int64),
                "stop_ppm": np.floor(q["stop_ratio"].to_numpy() * 1e6).astype(np.int64),
                "quality_ppm": np.floor(q["quality"].to_numpy() * 1e6).astype(np.int64),
            }
        )

    return _docs(sf_dir).map_batches(f, batch_format="pandas")


def q_text_fingerprint(sf_dir: str):
    return _docs(sf_dir).map_batches(fingerprint_batch, batch_format="pandas")


def q_text_simhash(sf_dir: str):
    from ..text.dedup import simhash_batch

    return _docs(sf_dir).map_batches(simhash_batch, batch_format="pyarrow")


_MINHASH_PAIRS_CACHE: dict = {}


def _minhash_pairs_cached(sf_dir: str):
    """Verified MinHash pair set at threshold 0.5, materialized once
    per (process, sf_dir): three catalog queries (pairs, groups,
    keep-best) consume the same deterministic intermediate, so a
    time-boxed driver sweep pays the LSH + verify cost once."""
    if _MINHASH_PAIRS_CACHE.get("key") != sf_dir:
        _MINHASH_PAIRS_CACHE["key"] = sf_dir
        _MINHASH_PAIRS_CACHE["ds"] = minhash_dedup_pairs(
            _docs(sf_dir), threshold=0.5
        ).materialize()
    return _MINHASH_PAIRS_CACHE["ds"]


def q_minhash_dedup(sf_dir: str):
    return _minhash_pairs_cached(sf_dir)


def q_near_dup_groups(sf_dir: str):
    """Near-dup GROUP ASSIGNMENT: MinHash-LSH verified pairs →
    hash-to-min connected components → (doc_id, group_id, group_size,
    keep). The oracle recomputes the pair set independently (all-pairs
    trigram Jaccard, the `minhash_dedup_pairs` SQL) and the components
    via a recursive min-label CTE — fully independent of the Ray
    LSH + propagation path."""
    from ..text.dedup import groups_from_pairs

    return groups_from_pairs(_minhash_pairs_cached(sf_dir))


def q_ngram_jaccard(sf_dir: str):
    from ..text.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs(sf_dir), threshold=0.3, prefix_bits=8)


def q_embedding_near_dup(sf_dir: str):
    """Hyperplane-LSH near-dup pairs; the bucket assignment persists so
    the SQL oracle recomputes the within-bucket cosine pairs from the
    embeddings view. The cosine VALUE is float32 on the Ray side vs
    float64 list kernels in DuckDB, so the hash compares the pair SET."""
    import ray.data as rd

    from ..text.dedup import hyperplane_bucketize

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    buckets = emb.map_batches(
        lambda b: hyperplane_bucketize(b).select(["vec_id", "bucket", "sub"]),
        batch_format="pyarrow",
    )
    _persist(buckets, "emb_buckets")
    pairs = embedding_near_dup_pairs(emb, threshold=0.3)
    return pairs.map_batches(
        lambda t: t.select(["doc_a", "doc_b"]), batch_format="pyarrow"
    )


def q_dedup_keep_best(sf_dir: str):
    """Apply-the-dedup, keeping the BEST representative: near-dup
    groups keep their longest doc (max n_chars, ties to the smaller
    doc_id) — the realistic corpus-dedup policy, vs near_dup_groups'
    min-id canonical. Output: one row per group
    (group_id, keep_doc_id, group_size, max_chars).

    Scale shape: member metadata is bounded by the NEAR-DUP GRAPH, not
    the corpus — member ids are collected in a Ray task, the docs
    stream is filtered to those ids, and the (doc_id, n_chars) table is
    broadcast for a searchsorted attach; the argmax itself is one
    lexsort per 256-way group-hash bucket."""
    import ray
    import pyarrow.compute as pc

    from ..text.dedup import _i64, connected_components

    pairs = _minhash_pairs_cached(sf_dir)
    labs = connected_components(pairs).materialize()

    @ray.remote
    def _member_ids(*blocks):
        ids = [
            t["doc_id"].to_numpy(zero_copy_only=False)
            for t in blocks
            if t.num_columns > 0 and t.num_rows > 0
        ]
        return np.unique(np.concatenate(ids)) if ids else np.empty(0, np.int64)

    ids_ref = _member_ids.remote(*labs.to_arrow_refs())

    import ray.data as rd

    meta = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])

    def filt(t: pa.Table) -> pa.Table:
        ids = ray.get(ids_ref)
        return t.filter(pc.is_in(t["doc_id"], value_set=pa.array(ids)))

    @ray.remote
    def _collect(*blocks) -> pa.Table:
        ts = [t for t in blocks if t.num_columns > 0 and t.num_rows > 0]
        if not ts:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "n_chars": pa.array([], pa.int64())}
            )
        return pa.concat_tables(ts)

    nc_ref = _collect.remote(
        *meta.map_batches(filt, batch_format="pyarrow").to_arrow_refs()
    )
    _cache: dict = {}

    def attach(t: pa.Table) -> pa.Table:
        if "ids" not in _cache:
            tb = ray.get(nc_ref)
            ids = _i64(tb["doc_id"])
            order = np.argsort(ids, kind="stable")
            _cache["ids"] = ids[order]
            _cache["nc"] = _i64(tb["n_chars"])[order]
        did = _i64(t["doc_id"])
        gid = _i64(t["group_id"])
        pos = np.searchsorted(_cache["ids"], did)
        return pa.table(
            {
                "doc_id": pa.array(did),
                "group_id": pa.array(gid),
                "n_chars": pa.array(_cache["nc"][pos]),
                "_gb": pa.array(gid % 256),
            }
        )

    def best(g: pa.Table) -> pa.Table:
        gid = _i64(g["group_id"])
        did = _i64(g["doc_id"])
        nc = _i64(g["n_chars"])
        order = np.lexsort((did, -nc, gid))
        sg = gid[order]
        new = np.ones(len(sg), bool)
        new[1:] = sg[1:] != sg[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(sg)))
        return pa.table(
            {
                "group_id": pa.array(sg[starts]),
                "keep_doc_id": pa.array(did[order][starts]),
                "group_size": pa.array(lens.astype(np.int64)),
                "max_chars": pa.array(nc[order][starts]),
            }
        )

    return (
        labs.map_batches(attach, batch_format="pyarrow")
        .groupby("_gb")
        .map_groups(best, batch_format="pyarrow")
    )


def q_edit_distance_pairs(sf_dir: str):
    """Fuzzy-dup verify: exact Levenshtein over the MinHash candidate
    pair set (the classic LSH-block → DP-verify pipeline). Texts attach
    to pairs via the doc_id-bucketed shuffle join (nothing broadcast);
    the DP vectorizes across the pair axis with a min-plus prefix scan.
    The SQL oracle recomputes the candidates independently (all-pairs
    trigram Jaccard) and scores with DuckDB's levenshtein()."""
    from ..text.dedup import edit_distance_score_pairs

    return edit_distance_score_pairs(
        _minhash_pairs_cached(sf_dir), _docs(sf_dir)
    )


TEXT_QUERIES = {
    "text_langid": q_text_langid,
    "edit_distance_pairs": q_edit_distance_pairs,
    "text_quality": q_text_quality,
    "text_fingerprint": q_text_fingerprint,
    "text_simhash": q_text_simhash,
    "minhash_dedup_pairs": q_minhash_dedup,
    "near_dup_groups": q_near_dup_groups,
    "dedup_keep_best": q_dedup_keep_best,
    "ngram_jaccard_pairs": q_ngram_jaccard,
    "embedding_near_dup": q_embedding_near_dup,
}


# ---------------------------------------------------------------- ann


def q_ann_brute(sf_dir: str):
    """Exact cosine top-10; oracle-checked on (vec_id, rank) — the
    cosine VALUES are float32 matmul on the Ray side vs float64 list
    kernels in DuckDB, so only the ranking is hash-comparable."""
    import ray.data as rd

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    top = brute_topk(emb, query_vector(64), k=10).to_pandas()
    top = top.reset_index(drop=True)
    top["rank"] = np.arange(len(top), dtype=np.int64)
    return top[["vec_id", "rank"]]


_MQ_SEEDS = (100, 101, 102, 103)


def q_ann_multi_query(sf_dir: str):
    """Batched multi-query ANN (the batched-inference shape): Q=4
    deterministic queries share ONE corpus scan — a (n, dim) @ (dim, Q)
    matmul per block, k×Q slim partial rows per block, Q-group merge.
    Oracle-checked on (query_id, vec_id, rank) like ann_brute_topk
    (cosine values are f32 vs f64 across engines; ranking compares)."""
    import ray.data as rd

    from ..ann.search import multi_brute_topk

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qs = np.stack([query_vector(64, seed=s) for s in _MQ_SEEDS])
    out = multi_brute_topk(emb, qs, k=10)
    return out.select_columns(["query_id", "vec_id", "rank"])


def _ann_multi_sql(k: int) -> str:
    from ..ann.search import query_vector

    parts = []
    for i, s in enumerate(_MQ_SEEDS):
        qlit = "[" + ", ".join(repr(float(v)) for v in query_vector(64, seed=s)) + "]"
        parts.append(
            f"SELECT CAST({i} AS BIGINT) AS query_id, CAST({qlit} AS DOUBLE[]) AS qv"
        )
    q_union = "\nUNION ALL\n".join(parts)
    return f"""
WITH q AS ({q_union}),
r AS (SELECT q.query_id, e.vec_id,
        row_number() OVER (PARTITION BY q.query_id
          ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) DESC,
                   e.vec_id) AS rn
      FROM embeddings e CROSS JOIN q)
SELECT query_id, vec_id, CAST(rn - 1 AS BIGINT) AS "rank"
FROM r WHERE rn <= {k}
"""


def q_ann_ivf(sf_dir: str):
    """IVF top-10, oracle-checked on (vec_id, rank): the per-vector
    bucket assignment + probe membership persists, so the SQL replays
    the bucket-restricted cosine ranking from the embeddings view
    (the centroid iteration itself is recall-tested in pytest)."""
    import ray.data as rd

    from ..ann.search import ivf_assign, ivf_compile

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ref = ivf_compile(emb, query_vector(64), n_clusters=16, nprobe=8)
    _persist(ivf_assign(emb, ref), "ivf_assign")
    top = ivf_topk(
        emb, query_vector(64), k=10, n_clusters=16, nprobe=8, compiled_ref=ref
    ).to_pandas()
    top = top.reset_index(drop=True)
    top["rank"] = np.arange(len(top), dtype=np.int64)
    return top[["vec_id", "rank"]]


def q_ann_lsh(sf_dir: str):
    """Hyperplane-LSH top-10 (multi-probe: query bucket + 1-bit
    flips), oracle-checked on (vec_id, rank): the per-vector bucket +
    probe membership persists, so the SQL replays the
    bucket-restricted cosine ranking from the embeddings view. The
    planes are a seeded pure function — no training pass, no
    broadcast, no shuffle (the scale path next to IVF)."""
    import ray.data as rd

    from ..ann.search import lsh_assign, lsh_topk

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    _persist(lsh_assign(emb, query_vector(64), n_planes=6), "lsh_assign")
    top = lsh_topk(emb, query_vector(64), k=10, n_planes=6).to_pandas()
    top = top.reset_index(drop=True)
    top["rank"] = np.arange(len(top), dtype=np.int64)
    return top[["vec_id", "rank"]]


ANN_QUERIES = {
    "ann_brute_topk": q_ann_brute,
    "ann_multi_query_topk": q_ann_multi_query,
    "ann_ivf_topk": q_ann_ivf,
    "ann_lsh_topk": q_ann_lsh,
}

def _knn_sql(probes_dir: str, sites_dir: str, k: int) -> str:
    return f"""
WITH p AS (SELECT image_id, lon, lat FROM read_parquet('{probes_dir}/*.parquet')),
s AS (SELECT image_id AS neighbor_id, lon AS slon, lat AS slat
      FROM read_parquet('{sites_dir}/*.parquet')),
d AS (SELECT p.image_id, s.neighbor_id,
        2 * 6371.0088 * asin(sqrt(
          pow(sin((radians(s.slat) - radians(p.lat)) / 2), 2)
          + cos(radians(p.lat)) * cos(radians(s.slat))
            * pow(sin((radians(s.slon) - radians(p.lon)) / 2), 2))) AS dist
      FROM p CROSS JOIN s),
r AS (SELECT image_id, neighbor_id,
        row_number() OVER (PARTITION BY image_id ORDER BY dist, neighbor_id) AS rn
      FROM d)
SELECT image_id, neighbor_id FROM r WHERE rn <= {k}
"""


def _knn_shuffle_sql(probes_dir: str, sites_dir: str, out_dir: str, k: int) -> str:
    """True global kNN SET restricted to the probes the shuffle
    path certified exact — identical to :func:`_knn_sql` plus the
    exact-probe filter read from the persisted shuffle output."""
    return f"""
WITH ex AS (SELECT DISTINCT image_id FROM read_parquet('{out_dir}/*.parquet')
            WHERE exact),
p AS (SELECT p0.image_id, p0.lon, p0.lat
      FROM read_parquet('{probes_dir}/*.parquet') p0 JOIN ex USING (image_id)),
s AS (SELECT image_id AS neighbor_id, lon AS slon, lat AS slat
      FROM read_parquet('{sites_dir}/*.parquet')),
d AS (SELECT p.image_id, s.neighbor_id,
        2 * 6371.0088 * asin(sqrt(
          pow(sin((radians(s.slat) - radians(p.lat)) / 2), 2)
          + cos(radians(p.lat)) * cos(radians(s.slat))
            * pow(sin((radians(s.slon) - radians(p.lon)) / 2), 2))) AS dist
      FROM p CROSS JOIN s),
r AS (SELECT image_id, neighbor_id,
        row_number() OVER (PARTITION BY image_id ORDER BY dist, neighbor_id) AS rn
      FROM d)
SELECT image_id, neighbor_id FROM r WHERE rn <= {k}
"""


def _decompose_sql(proj_dir: str) -> str:
    """Structural replay of the decompose projection: net_winding is
    re-derived from (parent, winding) by the recursive parent walk
    (net = parent net + winding, roots at parent = -1); every other
    column passes through, so row count, schema and values must all
    reconcile with the engine's own emission."""
    return f"""
WITH RECURSIVE p AS (
  SELECT geom_id, ring_seq, ring_index, parent, winding, n_vertices
  FROM read_parquet('{proj_dir}/*.parquet')),
rec AS (
  SELECT geom_id, ring_seq, ring_index, parent, winding, n_vertices,
         CAST(winding AS INTEGER) AS net_winding
  FROM p WHERE parent = -1
  UNION ALL
  SELECT c.geom_id, c.ring_seq, c.ring_index, c.parent, c.winding, c.n_vertices,
         CAST(r.net_winding + c.winding AS INTEGER) AS net_winding
  FROM p c JOIN rec r ON r.geom_id = c.geom_id AND r.ring_seq = c.parent)
SELECT geom_id, ring_seq, ring_index, parent, winding, net_winding, n_vertices
FROM rec
"""


def _sh_pass_expr(pts: str, axis: int, ge: bool, bound: str) -> str:
    """One Sutherland–Hodgman half-plane pass as a DuckDB list
    comprehension over ``pts`` (list of [x, y] DOUBLE lists). Emission
    order and arithmetic mirror stages/tiles._clip_pass op-for-op:
    crossing edges emit the intersection point first, inside current
    vertices follow; t = (bound - prev) / (cur - prev), other =
    prev_other + t * (cur_other - prev_other)."""
    other = 2 if axis == 1 else 1
    cur = f"{pts}[i]"
    prv = f"{pts}[CASE WHEN i = 1 THEN len({pts}) ELSE i - 1 END]"
    op = ">=" if ge else "<="
    ic = f"({cur}[{axis}] {op} {bound})"
    ip = f"({prv}[{axis}] {op} {bound})"
    t = f"(({bound} - {prv}[{axis}]) / ({cur}[{axis}] - {prv}[{axis}]))"
    oth = f"({prv}[{other}] + {t} * ({cur}[{other}] - {prv}[{other}]))"
    ix = f"[{bound}, {oth}]" if axis == 1 else f"[{oth}, {bound}]"
    return (
        f"flatten([CASE "
        f"WHEN {ic} AND NOT {ip} THEN [{ix}, {cur}] "
        f"WHEN {ic} THEN [{cur}] "
        f"WHEN {ip} THEN [{ix}] "
        f"ELSE CAST([] AS DOUBLE[][]) END "
        f"for i in generate_series(1, len({pts}))])"
    )


def _tile_sql(verts_dir: str, level: int = 8) -> str:
    """Tile-assignment oracle: replays the whole tile_clip_batch stage
    in SQL from the persisted ordered ring vertices — the covering with
    its boundary/interior split (same rasterization + center-PIP
    arithmetic as :func:`_cover_sql`), interior tiles emitting their
    5-vertex bbox, boundary tiles running the exact 4-pass
    Sutherland–Hodgman clip (left/right/bottom/top, same order as
    stages/tiles._clip_tiles_vec) — and compares
    (geom_id, ring_seq, tile_z, tile_x, tile_y, n_clip_vertices)."""
    n = 1 << level
    p1 = _sh_pass_expr("pts", 1, True, "lon0")
    p2 = _sh_pass_expr("pts", 1, False, "lon1")
    p3 = _sh_pass_expr("pts", 2, True, "lat0")
    p4 = _sh_pass_expr("pts", 2, False, "lat1")
    return f"""
WITH verts AS (SELECT geom_id, ring_seq, vidx, x, y
               FROM read_parquet('{verts_dir}/*.parquet')),
nv AS (SELECT geom_id, ring_seq, COUNT(*) AS n FROM verts GROUP BY geom_id, ring_seq),
raw AS (
  SELECT a.geom_id, a.ring_seq, a.x AS xi, a.y AS yi, b.x AS xj, b.y AS yj
  FROM verts a
  JOIN nv USING (geom_id, ring_seq)
  JOIN verts b ON b.geom_id = a.geom_id AND b.ring_seq = a.ring_seq
   AND b.vidx = CASE WHEN a.vidx = 0 THEN nv.n - 1 ELSE a.vidx - 1 END),
e AS (SELECT geom_id, ring_seq, xi, yi, xj, yj,
        (xj + 180.0) / 360.0 * {n} AS x0, (yj + 90.0) / 180.0 * {n} AS y0,
        (xi + 180.0) / 360.0 * {n} AS x1, (yi + 90.0) / 180.0 * {n} AS y1
      FROM raw),
ec AS (SELECT *,
        CAST(least(greatest(floor(least(x0, x1)), 0), {n - 1}) AS BIGINT) AS i0,
        CAST(least(greatest(floor(greatest(x0, x1)), 0), {n - 1}) AS BIGINT) AS i1,
        x0 = x1 AS vert,
        (y1 - y0) / (CASE WHEN x1 - x0 <> 0.0 THEN x1 - x0 ELSE 1.0 END) AS slope
      FROM e),
cols AS (SELECT geom_id, ring_seq, x0, y0, x1, y1, vert, slope,
          unnest(generate_series(i0, i1)) AS col FROM ec),
yy AS (SELECT geom_id, ring_seq, col,
        CASE WHEN vert THEN least(y0, y1)
             ELSE y0 + slope * (greatest(CAST(col AS DOUBLE), least(x0, x1)) - x0) END AS ya,
        CASE WHEN vert THEN greatest(y0, y1)
             ELSE y0 + slope * (least(CAST(col AS DOUBLE) + 1.0, greatest(x0, x1)) - x0) END AS yb
      FROM cols),
jr AS (SELECT geom_id, ring_seq, col,
        CAST(floor(least(greatest(least(ya, yb), 0), {n - 1})) AS BIGINT) AS jlo,
        CAST(floor(least(greatest(greatest(ya, yb), 0), {n - 1})) AS BIGINT) AS jhi
      FROM yy),
bnd AS (SELECT geom_id, ring_seq, col, unnest(generate_series(jlo, jhi)) AS row_ FROM jr),
bcells AS MATERIALIZED (SELECT DISTINCT geom_id, ring_seq, col AS ci, row_ AS cj FROM bnd),
bb AS (SELECT geom_id, ring_seq,
        min(xi) AS blon0, max(xi) AS blon1, min(yi) AS blat0, max(yi) AS blat1
       FROM raw GROUP BY geom_id, ring_seq),
bbi AS (SELECT geom_id, ring_seq,
        CAST(least(greatest(floor((blon0 + 180.0) / 360.0 * {n}), 0), {n - 1}) AS BIGINT) AS i0r,
        CAST(least(greatest(floor((blon1 + 180.0) / 360.0 * {n}), 0), {n - 1}) AS BIGINT) AS i1r,
        CAST(least(greatest(floor((blat0 + 90.0) / 180.0 * {n}), 0), {n - 1}) AS BIGINT) AS j0r,
        CAST(least(greatest(floor((blat1 + 90.0) / 180.0 * {n}), 0), {n - 1}) AS BIGINT) AS j1r
       FROM bb),
gi_ AS (SELECT geom_id, ring_seq, j0r, j1r, unnest(generate_series(i0r, i1r)) AS gi FROM bbi),
grid AS (SELECT geom_id, ring_seq, gi, unnest(generate_series(j0r, j1r)) AS gj FROM gi_),
cent AS (SELECT geom_id, ring_seq, gi, gj,
          (gi + 0.5) / {n} * 360.0 - 180.0 AS cx,
          (gj + 0.5) / {n} * 180.0 - 90.0 AS cy FROM grid),
pipc AS (SELECT c.geom_id, c.ring_seq, c.gi, c.gj,
           SUM(CASE WHEN ((e2.yi > c.cy) <> (e2.yj > c.cy))
                    AND c.cx < (e2.xj - e2.xi) * (c.cy - e2.yi) / (e2.yj - e2.yi) + e2.xi
               THEN 1 ELSE 0 END) AS crossings
         FROM cent c JOIN raw e2
           ON e2.geom_id = c.geom_id AND e2.ring_seq = c.ring_seq
         GROUP BY c.geom_id, c.ring_seq, c.gi, c.gj),
icells AS (SELECT geom_id, ring_seq, gi, gj FROM pipc WHERE crossings % 2 = 1),
int_only AS (
  SELECT i.geom_id, i.ring_seq, i.gi AS ci, i.gj AS cj
  FROM icells i LEFT JOIN bcells b
    ON b.geom_id = i.geom_id AND b.ring_seq = i.ring_seq
   AND b.ci = i.gi AND b.cj = i.gj
  WHERE b.ci IS NULL),
pts0 AS MATERIALIZED (SELECT geom_id, ring_seq, list([x, y] ORDER BY vidx) AS pts
         FROM verts GROUP BY geom_id, ring_seq),
b0 AS MATERIALIZED (SELECT f.geom_id, f.ring_seq, f.ci, f.cj,
        CAST(f.ci AS DOUBLE) / {float(n)} * 360.0 - 180.0 AS lon0,
        CAST(f.cj AS DOUBLE) / {float(n)} * 180.0 - 90.0 AS lat0,
        (CAST(f.ci AS DOUBLE) + 1.0) / {float(n)} * 360.0 - 180.0 AS lon1,
        (CAST(f.cj AS DOUBLE) + 1.0) / {float(n)} * 180.0 - 90.0 AS lat1,
        p.pts
       FROM bcells f JOIN pts0 p USING (geom_id, ring_seq)),
b1 AS MATERIALIZED (SELECT geom_id, ring_seq, ci, cj, lon0, lat0, lon1, lat1, {p1} AS pts FROM b0),
b2 AS MATERIALIZED (SELECT geom_id, ring_seq, ci, cj, lon0, lat0, lon1, lat1, {p2} AS pts FROM b1),
b3 AS MATERIALIZED (SELECT geom_id, ring_seq, ci, cj, lon0, lat0, lon1, lat1, {p3} AS pts FROM b2),
b4 AS MATERIALIZED (SELECT geom_id, ring_seq, ci, cj, lon0, lat0, lon1, lat1, {p4} AS pts FROM b3),
bnd_out AS (SELECT geom_id, ring_seq, ci, cj, len(pts) + 1 AS ncv
            FROM b4 WHERE len(pts) >= 3),
int_out AS (SELECT geom_id, ring_seq, ci, cj, 5 AS ncv FROM int_only)
SELECT geom_id, ring_seq,
       CAST({level} AS SMALLINT) AS tile_z,
       CAST(ci AS INTEGER) AS tile_x,
       CAST({n - 1} - cj AS INTEGER) AS tile_y,
       CAST(ncv AS INTEGER) AS n_clip_vertices
FROM (SELECT * FROM bnd_out UNION ALL SELECT * FROM int_out)
"""


def _hll_sql(p: int = 12) -> str:
    """Full HyperLogLog replay in SQL: splitmix64 over user_id (64×64
    multiply done in 32-bit limbs mod 2^64 — the raw product overflows
    signed INT128), the 6-step leading-zero cascade exactly as
    sketches._hash64/add_hashed, register MAX group-by, and the
    bias-corrected estimate with the small-range branch. Matches the
    Ray-side estimate to the rounded 0.1."""
    T = 1 << 64
    C0, C1, C2 = 0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    m = 1 << p
    sent = 1 << (p - 1)

    def mulmod(a: str, b: int) -> str:
        bh, bl = b >> 32, b & 0xFFFFFFFF
        return (
            f"((({a}) * {bl}) % {T} + (((({a}) % {1 << 32}) * {bh}) % {1 << 32})"
            f" * {1 << 32}) % {T}"
        )

    sql = f"""
WITH h0 AS (SELECT (CAST(user_id AS HUGEINT) + {C0}) % {T} AS x FROM events),
h1 AS (SELECT {mulmod('xor(x, x >> 30)', C1)} AS x FROM h0),
h2 AS (SELECT {mulmod('xor(x, x >> 27)', C2)} AS x FROM h1),
h3 AS (SELECT xor(x, x >> 31) AS h FROM h2),
s AS MATERIALIZED (SELECT CAST(h >> {64 - p} AS BIGINT) AS idx,
                ((h * {1 << p}) % {T}) + {sent} AS c, CAST(0 AS HUGEINT) AS l FROM h3)"""
    prev = "s"
    for i, sh in enumerate((32, 16, 8, 4, 2, 1)):
        lim = 1 << (64 - sh)
        sql += f""",
s{i} AS MATERIALIZED (SELECT idx,
   CASE WHEN c < CAST({lim} AS HUGEINT) THEN l + {sh} ELSE l END AS l,
   CASE WHEN c < CAST({lim} AS HUGEINT) THEN (c * {1 << sh}) % {T} ELSE c END AS c
 FROM {prev})"""
        prev = f"s{i}"
    sql += f""",
regs AS (SELECT idx, MAX(CAST(l AS BIGINT) + 1) AS r FROM {prev} GROUP BY idx),
agg AS (SELECT SUM(pow(2.0, -CAST(r AS DOUBLE))) AS present_sum, COUNT(*) AS npresent
        FROM regs),
est AS (SELECT (0.7213 / (1.0 + 1.079 / {float(m)})) * {float(m)} * {float(m)}
               / (present_sum + ({m} - npresent) * 1.0) AS e,
               {m} - npresent AS zeros FROM agg)
SELECT round(CASE WHEN e <= 2.5 * {float(m)} AND zeros > 0
             THEN {float(m)} * ln({float(m)} / zeros) ELSE e END, 1)
       AS approx_distinct_users
FROM est
"""
    return sql


def _ann_sql(k: int) -> str:
    from ..ann.search import query_vector

    qlit = "[" + ", ".join(repr(float(v)) for v in query_vector(64)) + "]"
    return f"""
SELECT vec_id,
       CAST(row_number() OVER (
         ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]), {qlit}) DESC,
                  vec_id) - 1 AS BIGINT) AS "rank"
FROM embeddings
ORDER BY "rank"
LIMIT {k}
"""


def _ann_ivf_sql(k: int) -> str:
    """Bucket-restricted ranking replay: only vectors whose persisted
    IVF assignment is in the probe set compete for the top-k."""
    from ..ann.search import query_vector

    qlit = "[" + ", ".join(repr(float(v)) for v in query_vector(64)) + "]"
    return f"""
WITH a AS (SELECT vec_id FROM read_parquet('{_ORACLE_DIR}/ivf_assign/*.parquet')
           WHERE in_probe),
e AS (SELECT e.vec_id, e.embedding FROM embeddings e JOIN a USING (vec_id))
SELECT vec_id,
       CAST(row_number() OVER (
         ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]), {qlit}) DESC,
                  vec_id) - 1 AS BIGINT) AS "rank"
FROM e
ORDER BY "rank"
LIMIT {k}
"""


def _ann_lsh_sql(k: int) -> str:
    """Bucket-restricted ranking replay over the persisted LSH
    assignment — same shape as the IVF oracle: a wrong plane sign,
    probe set, or bucket encoding all change ``in_probe`` and
    mismatch."""
    from ..ann.search import query_vector

    qlit = "[" + ", ".join(repr(float(v)) for v in query_vector(64)) + "]"
    return f"""
WITH a AS (SELECT vec_id FROM read_parquet('{_ORACLE_DIR}/lsh_assign/*.parquet')
           WHERE in_probe),
e AS (SELECT e.vec_id, e.embedding FROM embeddings e JOIN a USING (vec_id))
SELECT vec_id,
       CAST(row_number() OVER (
         ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]), {qlit}) DESC,
                  vec_id) - 1 AS BIGINT) AS "rank"
FROM e
ORDER BY "rank"
LIMIT {k}
"""


_QUALITY_SQL = """
WITH m AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(len(regexp_extract_all(text, '\\w+')) AS DOUBLE) AS n_words,
         CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE) AS n_punct,
         CAST(len(regexp_extract_all(text, '\\b(?:the|and|of|a|to|in|is|it|that|for)\\b')) AS DOUBLE) AS n_stop
  FROM documents),
r AS (
  SELECT doc_id, n_words,
         CASE WHEN n_words > 0 THEN (n_chars - n_words + 1) / greatest(n_words, 1.0) ELSE 0.0 END AS mwl,
         CASE WHEN n_chars > 0 THEN n_punct / greatest(n_chars, 1.0) ELSE 0.0 END AS punct_ratio,
         CASE WHEN n_words > 0 THEN n_stop / greatest(n_words, 1.0) ELSE 0.0 END AS stop_ratio
  FROM m)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(floor(punct_ratio * 1000000.0) AS BIGINT) AS punct_ppm,
       CAST(floor(stop_ratio * 1000000.0) AS BIGINT) AS stop_ppm,
       CAST(floor((
           0.25 * least(greatest(n_words / 50.0, 0.0), 1.0)
         + 0.25 * least(greatest(1.0 - abs(mwl - 5.0) / 5.0, 0.0), 1.0)
         + 0.25 * least(greatest(1.0 - punct_ratio * 5.0, 0.0), 1.0)
         + 0.25 * least(greatest(stop_ratio * 5.0, 0.0), 1.0)
       ) * 1000000.0) AS BIGINT) AS quality_ppm
FROM r
"""


def _langid_sql() -> str:
    """Language-ID oracle generated from the SAME marker tables as
    text/ops.py. Marker bigrams never self-overlap (no 'aa'-style
    pairs), so the non-overlapping replace-count equals the scalar's
    overlapping count; n_bigs = letters − letter-runs (RE2 has no
    lookahead). Scores are integer evidence with one double division
    in the same order as the numpy kernel, so the strict-first-max
    CASE reproduces the Python tie-break bit-exactly."""
    from ..text.ops import _LANG_BIGRAMS, _LANG_ORDER, _STOPWORDS

    score_cols = []
    for lang in _LANG_ORDER:
        markers = " + ".join(
            f"(length(t) - length(replace(t, '{b}', ''))) / 2"
            for b in sorted(_LANG_BIGRAMS[lang])
        )
        stops = " + ".join(
            f"(CASE WHEN regexp_matches(t, '\\b{w}\\b') THEN 1 ELSE 0 END)"
            for w in sorted(_STOPWORDS[lang])
        )
        score_cols.append(
            f"CAST({markers} AS DOUBLE) / greatest(CAST(n_bigs AS DOUBLE), 1.0)"
            f" + 0.5 * ({stops}) AS s_{lang}"
        )
    first_max = "CASE " + " ".join(
        f"WHEN s_{lang} = m THEN '{lang}'" for lang in _LANG_ORDER[:-1]
    ) + f" ELSE '{_LANG_ORDER[-1]}' END"
    glist = ", ".join(f"s_{lang}" for lang in _LANG_ORDER)
    return f"""
WITH d AS (SELECT doc_id, regexp_replace(lower(text), '[^a-z ]', '', 'g') AS t
           FROM documents),
n AS (SELECT doc_id, t,
        length(replace(t, ' ', '')) - len(regexp_extract_all(t, '[a-z]+')) AS n_bigs
      FROM d),
s AS (SELECT doc_id, n_bigs, {", ".join(score_cols)} FROM n),
m AS (SELECT *, greatest({glist}) AS m FROM s)
SELECT doc_id, CASE WHEN n_bigs = 0 THEN 'und' ELSE {first_max} END AS lang_pred
FROM m
"""


def _ngram_sql(prefix_bits: int = 8, threshold: float = 0.3, cap: int = 256) -> str:
    """n-gram Jaccard with SimHash-prefix blocking, replicated
    end-to-end: the bit-exact SimHash CTE reproduces the exact
    candidate buckets (top ``prefix_bits``), a bucket larger than
    ``cap`` splits by the next-8-bit secondary band exactly as the Ray
    side does, then trigram-set Jaccard verifies within blocks — so
    unlike the all-pairs minhash oracle this one matches the blocking's
    recall exactly, misses and all."""
    bshift = 64 - prefix_bits
    sshift = max(64 - prefix_bits - 8, 0)
    return f"""
WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS ts FROM documents),
hs AS (SELECT doc_id,
  [ list_reduce(
      list_prepend(CAST(14695981039346656037 AS HUGEINT),
                   [unicode(substr(t, i, 1)) for i in generate_series(1, length(t))]),
      (a, c) -> (xor(a, CAST(c AS HUGEINT)) * 1099511628211)
                % CAST(18446744073709551616 AS HUGEINT))
    for t in ts ] AS hl
  FROM toks),
b AS (SELECT doc_id,
  [ CASE WHEN len(hl) = 0 THEN CAST(0 AS HUGEINT)
         WHEN list_sum([CASE WHEN (h >> bb) % 2 = 1 THEN 1 ELSE -1 END for h in hl]) > 0
         THEN CAST(1 AS HUGEINT) << bb ELSE CAST(0 AS HUGEINT) END
    for bb in generate_series(0, 63) ] AS bitvals
  FROM hs),
v AS (SELECT doc_id, list_sum(bitvals) AS sh FROM b),
bkt AS (SELECT doc_id, CAST(sh >> {bshift} AS BIGINT) AS bucket,
               CAST((sh >> {sshift}) % 256 AS BIGINT) AS sub FROM v),
sz AS (SELECT bucket, COUNT(*) AS c FROM bkt GROUP BY bucket),
b2 AS (SELECT k.doc_id, k.bucket,
              CASE WHEN s.c > {cap} THEN k.sub ELSE -1 END AS sub2
       FROM bkt k JOIN sz s USING (bucket)),
dd AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS ws FROM documents),
shg AS (
  SELECT doc_id,
         unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                 for i in generate_series(1, len(ws) - 2)]) AS s
  FROM dd WHERE len(ws) >= 3
  UNION ALL
  SELECT doc_id, array_to_string(ws, ' ') AS s FROM dd WHERE len(ws) IN (1, 2)
  UNION ALL
  SELECT doc_id, '' AS s FROM dd WHERE len(ws) = 0
),
u AS (SELECT DISTINCT doc_id, s FROM shg),
cnt AS (SELECT doc_id, COUNT(*) AS n FROM u GROUP BY doc_id),
cand AS (SELECT a.doc_id AS doc_a, b2_.doc_id AS doc_b
         FROM b2 a JOIN b2 b2_ ON a.bucket = b2_.bucket AND a.sub2 = b2_.sub2
          AND a.doc_id < b2_.doc_id),
inter AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS ni
          FROM cand c
          JOIN u ua ON ua.doc_id = c.doc_a
          JOIN u ub ON ub.doc_id = c.doc_b AND ub.s = ua.s
          GROUP BY c.doc_a, c.doc_b)
SELECT i.doc_a, i.doc_b,
       CAST(i.ni AS DOUBLE) / (ca.n + cb.n - i.ni) AS jaccard
FROM inter i
JOIN cnt ca ON ca.doc_id = i.doc_a
JOIN cnt cb ON cb.doc_id = i.doc_b
WHERE CAST(i.ni AS DOUBLE) / (ca.n + cb.n - i.ni) >= {threshold}
"""


def _cover_sql(edges_dir: str, level: int = 8) -> str:
    """Covering oracle: replays cover_rings_flat in SQL — column-slab
    edge rasterization (same clip/floor order, same consecutive-pair
    orientation: prev=(xj,yj)→cur=(xi,yi)) unioned with bbox cell
    centers that pass the crossing-number test. All arithmetic mirrors
    the numpy kernel op-for-op, so floors land on identical cells."""
    n = 1 << level
    return f"""
WITH raw AS (SELECT * FROM read_parquet('{edges_dir}/*.parquet')),
e AS (SELECT geom_id, ring_seq, xi, yi, xj, yj,
        (xj + 180.0) / 360.0 * {n} AS x0, (yj + 90.0) / 180.0 * {n} AS y0,
        (xi + 180.0) / 360.0 * {n} AS x1, (yi + 90.0) / 180.0 * {n} AS y1
      FROM raw),
ec AS (SELECT *,
        CAST(least(greatest(floor(least(x0, x1)), 0), {n - 1}) AS BIGINT) AS i0,
        CAST(least(greatest(floor(greatest(x0, x1)), 0), {n - 1}) AS BIGINT) AS i1,
        x0 = x1 AS vert,
        (y1 - y0) / (CASE WHEN x1 - x0 <> 0.0 THEN x1 - x0 ELSE 1.0 END) AS slope
      FROM e),
cols AS (SELECT geom_id, ring_seq, x0, y0, x1, y1, vert, slope,
          unnest(generate_series(i0, i1)) AS col FROM ec),
yy AS (SELECT geom_id, ring_seq, col,
        CASE WHEN vert THEN least(y0, y1)
             ELSE y0 + slope * (greatest(CAST(col AS DOUBLE), least(x0, x1)) - x0) END AS ya,
        CASE WHEN vert THEN greatest(y0, y1)
             ELSE y0 + slope * (least(CAST(col AS DOUBLE) + 1.0, greatest(x0, x1)) - x0) END AS yb
      FROM cols),
jr AS (SELECT geom_id, ring_seq, col,
        CAST(floor(least(greatest(least(ya, yb), 0), {n - 1})) AS BIGINT) AS jlo,
        CAST(floor(least(greatest(greatest(ya, yb), 0), {n - 1})) AS BIGINT) AS jhi
      FROM yy),
bnd AS (SELECT geom_id, ring_seq, col, unnest(generate_series(jlo, jhi)) AS row_ FROM jr),
bcells AS (SELECT DISTINCT geom_id, ring_seq,
            (CAST({level} AS BIGINT) << 58) | (col << 29) | row_ AS cell_id FROM bnd),
bb AS (SELECT geom_id, ring_seq,
        min(xi) AS lon0, max(xi) AS lon1, min(yi) AS lat0, max(yi) AS lat1
       FROM raw GROUP BY geom_id, ring_seq),
bbi AS (SELECT geom_id, ring_seq,
        CAST(least(greatest(floor((lon0 + 180.0) / 360.0 * {n}), 0), {n - 1}) AS BIGINT) AS i0r,
        CAST(least(greatest(floor((lon1 + 180.0) / 360.0 * {n}), 0), {n - 1}) AS BIGINT) AS i1r,
        CAST(least(greatest(floor((lat0 + 90.0) / 180.0 * {n}), 0), {n - 1}) AS BIGINT) AS j0r,
        CAST(least(greatest(floor((lat1 + 90.0) / 180.0 * {n}), 0), {n - 1}) AS BIGINT) AS j1r
       FROM bb),
gi_ AS (SELECT geom_id, ring_seq, j0r, j1r, unnest(generate_series(i0r, i1r)) AS gi FROM bbi),
grid AS (SELECT geom_id, ring_seq, gi, unnest(generate_series(j0r, j1r)) AS gj FROM gi_),
cent AS (SELECT geom_id, ring_seq, gi, gj,
          (gi + 0.5) / {n} * 360.0 - 180.0 AS cx,
          (gj + 0.5) / {n} * 180.0 - 90.0 AS cy FROM grid),
pipc AS (SELECT c.geom_id, c.ring_seq, c.gi, c.gj,
           SUM(CASE WHEN ((e2.yi > c.cy) <> (e2.yj > c.cy))
                    AND c.cx < (e2.xj - e2.xi) * (c.cy - e2.yi) / (e2.yj - e2.yi) + e2.xi
               THEN 1 ELSE 0 END) AS crossings
         FROM cent c JOIN raw e2
           ON e2.geom_id = c.geom_id AND e2.ring_seq = c.ring_seq
         GROUP BY c.geom_id, c.ring_seq, c.gi, c.gj),
icells AS (SELECT geom_id, ring_seq,
            (CAST({level} AS BIGINT) << 58) | (gi << 29) | gj AS cell_id
           FROM pipc WHERE crossings % 2 = 1)
SELECT DISTINCT geom_id, ring_seq, cell_id
FROM (SELECT * FROM bcells UNION ALL SELECT * FROM icells)
"""


# FNV-1a in SQL: the 64-bit wrap-around chain runs in HUGEINT (the
# 105-bit intermediate product fits) reduced mod 2^64 per step via
# list_reduce over the code-point stream — bit-identical to the numpy
# masked-matrix kernel (docs are ASCII, so unicode(char) == byte).
_FINGERPRINT_SQL = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS ts FROM documents),
ops AS (
  SELECT doc_id,
    flatten([
      [unicode(substr(t, i, 1)) for i in generate_series(1, length(t))] || [-1]
      for t in ts
    ]) AS o
  FROM toks),
h AS (
  SELECT doc_id,
    list_reduce(
      list_prepend(CAST(14695981039346656037 AS HUGEINT), o),
      (a, c) -> CASE WHEN c = -1
                     THEN (a * 31 + 7) % CAST(18446744073709551616 AS HUGEINT)
                     ELSE (xor(a, CAST(c AS HUGEINT)) * 1099511628211)
                          % CAST(18446744073709551616 AS HUGEINT)
                END
    ) AS fp
  FROM ops)
SELECT doc_id,
       CAST(CASE WHEN fp >= CAST(9223372036854775808 AS HUGEINT)
                 THEN fp - CAST(18446744073709551616 AS HUGEINT)
                 ELSE fp END AS BIGINT) AS fingerprint
FROM h
"""

_SIMHASH_SQL = """
WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS ts FROM documents),
hs AS (SELECT doc_id,
  [ list_reduce(
      list_prepend(CAST(14695981039346656037 AS HUGEINT),
                   [unicode(substr(t, i, 1)) for i in generate_series(1, length(t))]),
      (a, c) -> (xor(a, CAST(c AS HUGEINT)) * 1099511628211)
                % CAST(18446744073709551616 AS HUGEINT))
    for t in ts ] AS hl
  FROM toks),
b AS (SELECT doc_id,
  [ CASE WHEN len(hl) = 0 THEN CAST(0 AS HUGEINT)
         WHEN list_sum([CASE WHEN (h >> bb) % 2 = 1 THEN 1 ELSE -1 END for h in hl]) > 0
         THEN CAST(1 AS HUGEINT) << bb ELSE CAST(0 AS HUGEINT) END
    for bb in generate_series(0, 63) ] AS bitvals
  FROM hs),
v AS (SELECT doc_id, list_sum(bitvals) AS sh FROM b)
SELECT doc_id,
  CAST(CASE WHEN sh >= CAST(9223372036854775808 AS HUGEINT)
            THEN sh - CAST(18446744073709551616 AS HUGEINT) ELSE sh END AS BIGINT) AS simhash
FROM v
"""


def _compact_sql(cover_dir: str) -> str:
    """Level-by-level quad compaction in SQL, unrolled 8→1. Mirrors
    compact_cells' semantics exactly: a ring merges at level L only
    while L is its CURRENT deepest level (the `mx` gate); full quads
    (4 distinct children) collapse to their parent; any leftover cell
    at the deepest level permanently stops that ring (its max level
    stays L, so it never becomes eligible at L-1)."""
    mask = (1 << 29) - 1
    p = (
        "(((c.cell_id >> 58) - 1) << 58) "
        f"| ((((c.cell_id >> 29) & {mask}) >> 1) << 29) "
        f"| ((c.cell_id & {mask}) >> 1)"
    )
    parts = [
        "WITH s9 AS MATERIALIZED (SELECT geom_id, ring_seq, cell_id "
        f"FROM read_parquet('{cover_dir}/*.parquet'))"
    ]
    for L in range(8, 0, -1):
        parts.append(
            f"""
mx{L} AS MATERIALIZED (SELECT geom_id, ring_seq, max(cell_id >> 58) AS ml
          FROM s{L + 1} GROUP BY geom_id, ring_seq),
full{L} AS MATERIALIZED (
  SELECT c.geom_id, c.ring_seq, {p} AS parent
  FROM s{L + 1} c JOIN mx{L} m
    ON m.geom_id = c.geom_id AND m.ring_seq = c.ring_seq AND m.ml = {L}
  WHERE (c.cell_id >> 58) = {L}
  GROUP BY c.geom_id, c.ring_seq, parent
  HAVING COUNT(*) = 4
),
s{L} AS MATERIALIZED (
  SELECT c.geom_id, c.ring_seq, c.cell_id
  FROM s{L + 1} c LEFT JOIN full{L} f
    ON f.geom_id = c.geom_id AND f.ring_seq = c.ring_seq
   AND (c.cell_id >> 58) = {L} AND f.parent = {p}
  WHERE f.parent IS NULL
  UNION ALL
  SELECT geom_id, ring_seq, parent AS cell_id FROM full{L}
)"""
        )
    return (
        parts[0]
        + ","
        + ",".join(parts[1:])
        + "\nSELECT geom_id, ring_seq, cell_id, "
        "CAST(cell_id >> 58 AS TINYINT) AS level FROM s1"
    )


# All-pairs word-trigram Jaccard in SQL. Valid as a minhash oracle on
# this corpus because every true pair has J ≥ 0.9, where the 16-band /
# 8-row LSH detects with ~certainty (and deterministically: fixed
# seeds) — so candidates ∩ threshold == all-pairs ∩ threshold. The
# jaccard value is an integer ratio on both sides (bit-equal float64).
_MINHASH_SQL = """
WITH d AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS ws
           FROM documents),
sh AS (
  SELECT doc_id,
         unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                 for i in generate_series(1, len(ws) - 2)]) AS s
  FROM d WHERE len(ws) >= 3
  UNION ALL
  SELECT doc_id, array_to_string(ws, ' ') AS s FROM d WHERE len(ws) IN (1, 2)
  UNION ALL
  SELECT doc_id, '' AS s FROM d WHERE len(ws) = 0
),
u AS (SELECT DISTINCT doc_id, s FROM sh),
cnt AS (SELECT doc_id, COUNT(*) AS n FROM u GROUP BY doc_id),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS ni
          FROM u a JOIN u b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id)
SELECT i.doc_a, i.doc_b,
       CAST(i.ni AS DOUBLE) / (ca.n + cb.n - i.ni) AS jaccard
FROM inter i
JOIN cnt ca ON ca.doc_id = i.doc_a
JOIN cnt cb ON cb.doc_id = i.doc_b
WHERE CAST(i.ni AS DOUBLE) / (ca.n + cb.n - i.ni) >= 0.5
"""



# Connected components over the independently recomputed all-pairs
# Jaccard pair set: recursive min-label propagation (UNION dedupes, so
# the fixpoint is the component min for every node).
_NEAR_DUP_GROUPS_SQL = f"""
WITH RECURSIVE pairs AS MATERIALIZED (SELECT doc_a, doc_b FROM ({_MINHASH_SQL})),
edges AS MATERIALIZED (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs),
reach(v, l) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges) n
  UNION
  SELECT e.b, r.l FROM reach r JOIN edges e ON e.a = r.v
),
lab AS (SELECT v AS doc_id, MIN(l) AS group_id FROM reach GROUP BY v)
SELECT l.doc_id, l.group_id, g.group_size,
       CAST(l.doc_id = l.group_id AS BIGINT) AS keep
FROM lab l
JOIN (SELECT group_id, COUNT(*) AS group_size FROM lab GROUP BY group_id) g
  USING (group_id)
"""



# Decode + reference-pattern + SSE replayed from the persisted raw
# payload (int-list serialization of the bytes column): q6 decode is
# b*4+2 (bin midpoint), the pattern is the synth gradient/stripe/xor
# formula, and PSNR >= 40 dB is the exact integer inequality
# sse*10^4 <= 255^2 * n_px (mse <= 255^2/10^4).
_IMG_CHECK_SQL = f"""
WITH base AS MATERIALIZED (
  SELECT image_id, fmt, caption, b, w, h,
         CAST(substr(image_id, 4) AS BIGINT) AS rid,
         CAST(w AS BIGINT) * h * 3 AS n_px
  FROM read_parquet('{_ORACLE_DIR}/media_in/*.parquet')),
px AS MATERIALIZED (
  SELECT image_id, fmt, caption, rid, n_px,
    CAST(list_sum([d*d for d in [
      (CASE WHEN fmt = 'raw' THEN b[p+1] ELSE b[p+1]*4 + 2 END)
      - (CASE p % 3
         WHEN 0 THEN (((p//3) % w)*3 + rid) % 256
         WHEN 1 THEN ((p//(w*3))*5 + (rid//256)) % 256
         ELSE (xor((p//3) % w, p//(w*3))*7 + (rid//65536)) % 256 END)
      for p in generate_series(0, n_px - 1)]]) AS BIGINT) AS sse
  FROM base)
SELECT image_id, fmt, sse, n_px,
  CASE WHEN fmt = 'raw' THEN CAST(sse = 0 AS BIGINT)
       ELSE CAST(sse*10000 <= 65025*n_px AS BIGINT) END AS pixels_ok,
  CAST(caption = printf('synthetic image %012d stripe %d gradient %d',
                        rid, rid % 7, rid % 11) AS BIGINT) AS caption_ok
FROM px
"""



# Media oracles: decode replayed from the persisted int-list payload.
# featurize: exact integer luma sum + the phash certificate (must be 1
# — synth stores the decoded-pixel phash, so recomputed == stored is
# an exact invariant and a 0 fails the hash compare).
_MEDIA_FEAT_SQL = f"""
SELECT image_id,
  CAST(list_sum([CASE WHEN fmt = 'raw' THEN v ELSE v*4 + 2 END for v in b])
       AS BIGINT) AS sum_luma,
  CAST(w AS BIGINT) * h * 3 AS n_px,
  CAST(1 AS BIGINT) AS phash_ok
FROM read_parquet('{_ORACLE_DIR}/media_in/*.parquet')
"""

# resize: decode → nearest-neighbor gather (src pixel for thumbnail
# byte j: y=j//48, x=(j%48)//3, c=j%3; src_y=(y*h)//16, src_x=(x*w)//16)
# → position-weighted checksum of the re-encoded 16×16×3 output.
_MEDIA_RESIZE_SQL = f"""
WITH base AS MATERIALIZED (
  SELECT image_id, b, w, h, fmt
  FROM read_parquet('{_ORACLE_DIR}/media_in/*.parquet'))
SELECT image_id,
  CAST(16 AS BIGINT) AS w, CAST(16 AS BIGINT) AS h, 'raw' AS fmt,
  CAST(list_sum([(j+1) * (CASE WHEN fmt = 'raw'
      THEN b[(((j//48)*h//16)*w + (((j%48)//3)*w//16))*3 + j%3 + 1]
      ELSE b[(((j//48)*h//16)*w + (((j%48)//3)*w//16))*3 + j%3 + 1]*4 + 2 END)
    for j in generate_series(0, 767)]) AS BIGINT) AS cksum
FROM base
"""


# keep-best dedup: same recursive-CTE components as near_dup_groups,
# then the per-group argmax (max n_chars, ties to the smaller doc_id)
# via one window ranking — fully independent of the Ray LSH path.
_DEDUP_KEEP_BEST_SQL = f"""
WITH RECURSIVE pairs AS MATERIALIZED (SELECT doc_a, doc_b FROM ({_MINHASH_SQL})),
edges AS MATERIALIZED (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs),
reach(v, l) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges) n
  UNION
  SELECT e.b, r.l FROM reach r JOIN edges e ON e.a = r.v
),
lab AS (SELECT v AS doc_id, MIN(l) AS group_id FROM reach GROUP BY v),
j AS (SELECT lab.doc_id, lab.group_id, d.n_chars
      FROM lab JOIN documents d USING (doc_id)),
r AS (SELECT group_id, doc_id, n_chars,
        row_number() OVER (PARTITION BY group_id
                           ORDER BY n_chars DESC, doc_id) AS rn,
        COUNT(*) OVER (PARTITION BY group_id) AS group_size,
        MAX(n_chars) OVER (PARTITION BY group_id) AS max_chars
      FROM j)
SELECT group_id, doc_id AS keep_doc_id,
       CAST(group_size AS BIGINT) AS group_size,
       CAST(max_chars AS BIGINT) AS max_chars
FROM r WHERE rn = 1
"""


_EDIT_DIST_SQL = (
    "WITH cand AS (" + _MINHASH_SQL + ")\n"
    "SELECT c.doc_a, c.doc_b,\n"
    "       CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist\n"
    "FROM cand c\n"
    "JOIN documents da ON da.doc_id = c.doc_a\n"
    "JOIN documents db ON db.doc_id = c.doc_b"
)


EXTRA_ORACLE_SQL: dict[str, str] = {
    "minhash_dedup_pairs": _MINHASH_SQL,
    "edit_distance_pairs": _EDIT_DIST_SQL,
    "near_dup_groups": _NEAR_DUP_GROUPS_SQL,
    "dedup_keep_best": _DEDUP_KEEP_BEST_SQL,
    "image_decode_check": _IMG_CHECK_SQL,
    "media_decode_featurize": _MEDIA_FEAT_SQL,
    "media_resize": _MEDIA_RESIZE_SQL,
    "geo_pip_join": _pip_sql(f"{_ORACLE_DIR}/pip_points", f"{_ORACLE_DIR}/pip_edges"),
    "geo_pip_join_shuffle": _pip_sql(
        f"{_ORACLE_DIR}/pip_points_shuffle", f"{_ORACLE_DIR}/pip_edges_shuffle"
    ),
    "geo_zonal_counts": (
        # ring_seq is BIGINT here because the Ray partial-groupby
        # promotes int32 keys to int64
        "SELECT geom_id, CAST(ring_seq AS BIGINT) AS ring_seq, COUNT(*) AS n_points FROM ("
        + _pip_sql(f"{_ORACLE_DIR}/pip_points", f"{_ORACLE_DIR}/pip_edges")
        + ") GROUP BY geom_id, ring_seq"
    ),
    "cell_counts": (
        f"SELECT cell_id, COUNT(*) AS n_rings FROM "
        f"read_parquet('{_ORACLE_DIR}/cover_counts/*.parquet') GROUP BY cell_id"
    ),
    "distinct_cells": (
        f"SELECT DISTINCT cell_id FROM read_parquet('{_ORACLE_DIR}/cover_distinct/*.parquet')"
    ),
    "geo_knn": _knn_sql(f"{_ORACLE_DIR}/knn_probes", f"{_ORACLE_DIR}/knn_sites", k=5),
    "geo_knn_shuffle": _knn_shuffle_sql(
        f"{_ORACLE_DIR}/knn_shuffle_probes",
        f"{_ORACLE_DIR}/knn_shuffle_sites",
        f"{_ORACLE_DIR}/knn_shuffle_out",
        k=5,
    ),
    "geo_decompose": _decompose_sql(f"{_ORACLE_DIR}/decompose_proj"),
    "geo_tile_assign": _tile_sql(f"{_ORACLE_DIR}/tile_verts", level=8),
    "geo_bbox_join": _BBOX_JOIN_SQL,
    "tile_pyramid_counts": _TILE_PYRAMID_SQL,
    "image_cell_density": _CELL_DENSITY_SQL,
    "geo_compact_cover": _compact_sql(f"{_ORACLE_DIR}/cover_compact"),
    "ann_brute_topk": _ann_sql(10),
    "ann_multi_query_topk": _ann_multi_sql(10),
    "ann_ivf_topk": _ann_ivf_sql(10),
    "ann_lsh_topk": _ann_lsh_sql(10),
    "approx_distinct_users": _hll_sql(p=12),
    "text_quality": _QUALITY_SQL,
    "text_langid": _langid_sql(),
    "text_fingerprint": _FINGERPRINT_SQL,
    "text_simhash": _SIMHASH_SQL,
    "geo_cover": _cover_sql(f"{_ORACLE_DIR}/cover_edges"),
    "ngram_jaccard_pairs": _ngram_sql(prefix_bits=8, threshold=0.3, cap=256),
    # the bucket-cap rule (split oversized buckets by the persisted
    # secondary band) mirrors embedding_near_dup_pairs exactly
    "embedding_near_dup": f"""
WITH b AS (SELECT vec_id, bucket, sub
           FROM read_parquet('{_ORACLE_DIR}/emb_buckets/*.parquet')),
sz AS (SELECT bucket, COUNT(*) AS c FROM b GROUP BY bucket),
b2 AS (SELECT b.vec_id, b.bucket,
              CASE WHEN sz.c > 512 THEN b.sub ELSE -1 END AS sub2
       FROM b JOIN sz USING (bucket)),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
j AS (SELECT b2.vec_id, b2.bucket, b2.sub2, e.v FROM b2 JOIN e USING (vec_id))
SELECT a.vec_id AS doc_a, b2_.vec_id AS doc_b
FROM j a JOIN j b2_ ON a.bucket = b2_.bucket AND a.sub2 = b2_.sub2
 AND a.vec_id < b2_.vec_id
WHERE list_cosine_similarity(a.v, b2_.v) >= 0.3
""",
}


# ---------------------------------------------------------- cell stats


def q_cell_counts(sf_dir: str):
    """Per-cell covering density (skew diagnostic that sizes the salt
    factor of the shuffle join — SURVEY.md §4.3). The exploded cover is
    persisted so DuckDB recomputes the group-by as the oracle."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..relational.queries import _partial_groupby

    cover_dir = _persist(q_geo_cover(sf_dir), "cover_counts")
    cover = rd.read_parquet(cover_dir, columns=["cell_id"])
    partial = cover.map_batches(
        _partial_groupby(["cell_id"], [("cell_id", "count", "n_rings")]),
        batch_format="pyarrow",
    )
    return partial.groupby("cell_id").aggregate(Sum("n_rings", alias_name="n_rings"))


def q_distinct_cells(sf_dir: str):
    """Distinct covered cell ids (local unique -> tiny global groupby)."""
    import ray.data as rd
    from ray.data.aggregate import Count

    cover_dir = _persist(q_geo_cover(sf_dir), "cover_distinct")
    cover = rd.read_parquet(cover_dir, columns=["cell_id"])
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


def _media_input_proj(t: pa.Table) -> pa.Table:
    """(image_id, payload-as-int-list, w, h, fmt, caption) — the ONE
    persisted raw-input projection every media/audio/video oracle
    replays decode from."""
    payloads = t["bytes"].to_pylist()
    return pa.table(
        {
            "image_id": t["image_id"],
            "b": pa.array(
                [np.frombuffer(p, np.uint8).astype(np.int32) for p in payloads],
                type=pa.list_(pa.int32()),
            ),
            "w": t["w"].cast(pa.int64()),
            "h": t["h"].cast(pa.int64()),
            "fmt": t["fmt"],
            "caption": t["caption"],
        }
    )


_MEDIA_IN_CACHE: dict = {}


def _persist_media_inputs(sf_dir: str) -> int:
    """Persist the shared media-input table ONCE per (process, size):
    five oracle queries (decode-check, featurize, resize, audio, video)
    replay from the same corpus, so a time-boxed driver sweep pays the
    synth + persist cost once instead of five times. Returns the
    corpus size."""
    _, n_images = scale_counts(sf_dir)
    n = min(n_images, 4000)
    if _MEDIA_IN_CACHE.get("n") != n:
        imgs = gen_images(n)
        _persist(
            imgs.map_batches(_media_input_proj, batch_format="pyarrow"), "media_in"
        )
        _MEDIA_IN_CACHE["n"] = n
    return n


def q_media_decode_featurize(sf_dir: str):
    """Actor-pool image decode + phash/luma featurize, SQL-oracled:
    the raw input payload persists as an int-list projection; DuckDB
    replays decode and the EXACT integer luma sum, while the phash
    certificate (recomputed-on-decoded == stored, an exact invariant
    because synth stores the decoded-pixel phash) rides as a flag the
    oracle asserts — a wrong phash kernel flips it to 0 and fails the
    hash. mean_luma→sum reconstruction is exact: integer sums < 2^53
    round-trip float64 division within ½ulp."""
    from ..stages.media import decode_and_featurize

    imgs = gen_images(_persist_media_inputs(sf_dir))
    feats = decode_and_featurize(imgs, concurrency=(1, 4))

    def proj(t: pa.Table) -> pa.Table:
        w = t["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = t["h"].to_numpy(zero_copy_only=False).astype(np.int64)
        n_px = w * h * 3
        mean = t["mean_luma"].to_numpy(zero_copy_only=False)
        stored = t["phash"].to_numpy(zero_copy_only=False).astype(np.int64)
        recomp = t["phash_recomputed"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "image_id": t["image_id"],
                "sum_luma": pa.array(np.rint(mean * n_px).astype(np.int64)),
                "n_px": pa.array(n_px),
                "phash_ok": pa.array((stored == recomp).astype(np.int64)),
            }
        )

    return feats.map_batches(proj, batch_format="pyarrow")


def q_media_resize(sf_dir: str):
    """Actor-pool thumbnailing, SQL-oracled end-to-end: DuckDB replays
    decode → nearest-neighbor gather → re-encode from the persisted
    input payload and compares a position-weighted checksum of the
    actual output bytes (Σ (j+1)·byte_j over the 16×16×3 thumbnail) —
    any wrong pixel, position, or decode path shifts the sum."""
    from ..stages.media import resize_images

    imgs = gen_images(_persist_media_inputs(sf_dir))
    out = resize_images(imgs, out_w=16, out_h=16, concurrency=(1, 4))

    def proj(t: pa.Table) -> pa.Table:
        payloads = t["bytes"].to_pylist()
        mat = np.frombuffer(b"".join(payloads), np.uint8).reshape(len(payloads), 768)
        weights = np.arange(1, 769, dtype=np.int64)
        cksum = (mat.astype(np.int64) * weights[None, :]).sum(axis=1)
        return pa.table(
            {
                "image_id": t["image_id"],
                "w": t["w"].cast(pa.int64()),
                "h": t["h"].cast(pa.int64()),
                "fmt": t["fmt"],
                "cksum": pa.array(cksum),
            }
        )

    return out.map_batches(proj, batch_format="pyarrow")


def q_image_phash_near_dup(sf_dir: str):
    """Near-duplicate image detection end-to-end: synthesize a corpus
    with planted near-dups → actor-pool decode + phash featurize →
    banded phash LSH (4 × 16-bit bands, hot-band split at 256) →
    vectorized Hamming verify ≤ 3. Recall is EXACT for Hamming ≤ 3
    (pigeonhole over 4 bands), so the oracle replays the banding +
    popcount verbatim from the persisted (img_key, phash) table —
    a wrong band split, cap rule, or popcount all mismatch."""
    import ray.data as rd

    from ..images.neardup import phash_near_dup_pairs
    from ..images.synth import gen_images_with_dups
    from ..stages.media import decode_and_featurize

    _, n_images = scale_counts(sf_dir)
    n_base = min(n_images, 3000)
    n_dups = max(n_base // 4, 8)
    imgs = gen_images_with_dups(n_base, n_dups)
    feats = decode_and_featurize(imgs, concurrency=(1, 4))

    def keyed(t: pa.Table) -> pa.Table:
        keys = np.array([int(s[3:]) for s in t["image_id"].to_pylist()], np.int64)
        return pa.table({"img_key": pa.array(keys), "phash": t["phash_recomputed"]})

    tbl_dir = _persist(feats.map_batches(keyed, batch_format="pyarrow"), "phash_tbl")
    return phash_near_dup_pairs(
        rd.read_parquet(tbl_dir), max_hamming=3, run_cap=256
    )


_PHASH_PAIRS_CACHE: dict = {}


def _phash_pairs_cached(sf_dir: str):
    """Banded-phash near-dup pairs, materialized once per (process,
    sf_dir) — shared by image_phash_near_dup and image_dedup_groups so
    a sweep pays the synth + decode + LSH cost once."""
    if _PHASH_PAIRS_CACHE.get("key") != sf_dir:
        _PHASH_PAIRS_CACHE["key"] = sf_dir
        _PHASH_PAIRS_CACHE["ds"] = q_image_phash_near_dup(sf_dir).materialize()
    return _PHASH_PAIRS_CACHE["ds"]


_PHASH_NEARDUP_SQL = f"""
WITH p AS (SELECT img_key, phash
           FROM read_parquet('{_ORACLE_DIR}/phash_tbl/*.parquet')),
bands AS (SELECT img_key, phash, bnd AS band_id,
                 (phash >> (bnd * 16)) & 65535 AS band_val,
                 (phash >> (((bnd + 1) % 4) * 16)) & 65535 AS sub
          FROM p CROSS JOIN generate_series(0, 3) t(bnd)),
sz AS (SELECT band_id, band_val, COUNT(*) AS c FROM bands
       GROUP BY band_id, band_val),
b2 AS (SELECT k.img_key, k.phash, k.band_id, k.band_val,
              CASE WHEN s.c > 256 THEN k.sub ELSE -1 END AS sub2
       FROM bands k JOIN sz s USING (band_id, band_val)),
cand AS (SELECT DISTINCT lhs.img_key AS id_a, rhs.img_key AS id_b,
                lhs.phash AS pa, rhs.phash AS pb
         FROM b2 lhs JOIN b2 rhs
           ON lhs.band_id = rhs.band_id AND lhs.band_val = rhs.band_val
          AND lhs.sub2 = rhs.sub2 AND lhs.img_key < rhs.img_key)
SELECT id_a, id_b, CAST(bit_count(xor(pa, pb)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(pa, pb)) <= 3
"""

EXTRA_ORACLE_SQL["image_phash_near_dup"] = _PHASH_NEARDUP_SQL


def q_image_dedup_groups(sf_dir: str):
    """Image dedup GROUP ASSIGNMENT: the banded-phash near-dup pairs →
    hash-to-min connected components → (img_key, group_id, group_size,
    keep). Same propagation engine as the text near_dup_groups; the
    oracle recomputes the pair set via the band-replay SQL and the
    components via a recursive min-label CTE."""
    from ..text.dedup import groups_from_pairs

    pairs = _phash_pairs_cached(sf_dir)

    def ren(t: pa.Table) -> pa.Table:
        return pa.table({"doc_a": t["id_a"], "doc_b": t["id_b"]})

    groups = groups_from_pairs(pairs.map_batches(ren, batch_format="pyarrow"))

    def out(t: pd.DataFrame) -> pd.DataFrame:
        return t.rename(columns={"doc_id": "img_key"})

    return groups.map_batches(out, batch_format="pandas")


_IMG_GROUPS_SQL = f"""
WITH RECURSIVE pairs AS MATERIALIZED (SELECT id_a, id_b FROM ({_PHASH_NEARDUP_SQL})),
edges AS MATERIALIZED (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs),
reach(v, l) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges) n
  UNION
  SELECT e.b, r.l FROM reach r JOIN edges e ON e.a = r.v
),
lab AS (SELECT v AS img_key, MIN(l) AS group_id FROM reach GROUP BY v)
SELECT l.img_key, l.group_id, g.group_size,
       CAST(l.img_key = l.group_id AS BIGINT) AS keep
FROM lab l
JOIN (SELECT group_id, COUNT(*) AS group_size FROM lab GROUP BY group_id) g
  USING (group_id)
"""

EXTRA_ORACLE_SQL["image_dedup_groups"] = _IMG_GROUPS_SQL


def q_approx_distinct_users(sf_dir: str):
    """HLL approximate COUNT(DISTINCT user_id) over events. Oracle:
    the SQL replays the WHOLE sketch — splitmix64, register max,
    bias-corrected estimate — in HUGEINT/DOUBLE arithmetic and must
    reproduce the identical rounded estimate (the approximation is
    deterministic; its error bound is separately tested in pytest)."""
    import ray.data as rd

    from ..relational.sketches import approx_distinct

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    est = approx_distinct(ev, "user_id", p=12)
    return pd.DataFrame({"approx_distinct_users": [float(round(est, 1))]})


def q_audio_features(sf_dir: str):
    """Actor-pool audio feature extraction over the deterministic
    synthetic payloads (the audio codec itself is an env-blocked stub;
    the Ray plumbing — actor pool, chunked reduceat featurize, list
    column output — is real). Output: one row per (clip, chunk) with
    the chunk mean floored at e4 fixed point. The SQL oracle replays
    the np.array_split chunking and the mean from the persisted
    int-list payload: chunk sums are exact int64 in both engines, the
    single float division and ×1e4 are the same correctly-rounded IEEE
    ops, and floor (not round) avoids the half-even/half-away trap."""
    from ..stages.media import AudioFeatureActor

    clips = gen_images(_persist_media_inputs(sf_dir))
    feats = clips.map_batches(
        AudioFeatureActor,
        fn_constructor_kwargs={"n_features": 8},
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(1, 4),
    )

    def proj(t: pa.Table) -> pa.Table:
        col = t["features"].combine_chunks()
        flat = np.asarray(col.values, np.float64)
        n = len(t)
        k = len(flat) // max(n, 1) if n else 0
        e4 = np.floor(flat * 10000.0)
        # zero-size chunks surface as nan (impossible for this corpus;
        # encode as a sentinel so the schema stays int64)
        e4 = np.where(np.isnan(e4), -1, e4).astype(np.int64)
        rows = np.repeat(np.arange(n, dtype=np.int64), k)
        return pa.table(
            {
                "image_id": t["image_id"].take(pa.array(rows)),
                "chunk_no": pa.array(np.tile(np.arange(k, dtype=np.int64), n)),
                "mean_e4": pa.array(e4),
            }
        )

    return feats.map_batches(proj, batch_format="pyarrow")


_AUDIO_FEAT_SQL = f"""
WITH base AS MATERIALIZED (
  SELECT image_id, b, len(b) AS l
  FROM read_parquet('{_ORACLE_DIR}/media_in/*.parquet')),
chunks AS (
  SELECT image_id, j,
    (l // 8) + CASE WHEN j < (l % 8) THEN 1 ELSE 0 END AS sz,
    j * (l // 8) + LEAST(j, l % 8) AS st,
    b
  FROM base CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS j) g)
SELECT image_id, CAST(j AS BIGINT) AS chunk_no,
  CAST(CASE WHEN sz = 0 THEN -1 ELSE
    floor(CAST(list_sum(array_slice(b, st + 1, st + sz)) AS DOUBLE)
          / sz * 10000.0) END AS BIGINT) AS mean_e4
FROM chunks
"""


def q_video_frame_sample(sf_dir: str):
    """Actor-pool video frame sampling over the deterministic synthetic
    payloads (demuxer is an env-blocked stub; the explode-to-rows frame
    layout and the vectorized gather are real). One row per sampled
    frame (every 4th full 768-byte frame) with a position-weighted
    checksum of the actual frame bytes — any wrong byte, offset or
    stride shifts the sum. The SQL oracle re-slices the persisted
    int-list payload and recomputes the checksum."""
    from ..stages.media import VideoFrameSampleActor

    clips = gen_images(_persist_media_inputs(sf_dir))
    frames = clips.map_batches(
        VideoFrameSampleActor,
        fn_constructor_kwargs={"frame_bytes": 768, "stride": 4},
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(1, 4),
    )

    def proj(t: pa.Table) -> pa.Table:
        payloads = t["frame"].to_pylist()
        n = len(payloads)
        if n:
            mat = np.frombuffer(b"".join(payloads), np.uint8).reshape(n, 768)
            weights = np.arange(1, 769, dtype=np.int64)
            cksum = (mat.astype(np.int64) * weights[None, :]).sum(axis=1)
        else:
            cksum = np.empty(0, np.int64)
        return pa.table(
            {
                "image_id": t["image_id"].cast(pa.string()),
                "frame_no": t["frame_no"].cast(pa.int64()),
                "cksum": pa.array(cksum),
            }
        )

    return frames.map_batches(proj, batch_format="pyarrow")


_VIDEO_FRAME_SQL = f"""
WITH base AS MATERIALIZED (
  SELECT image_id, b, len(b) // 768 AS n_frames
  FROM read_parquet('{_ORACLE_DIR}/media_in/*.parquet')),
sampled AS (
  SELECT image_id, b, unnest(generate_series(0, n_frames - 1, 4)) AS k
  FROM base WHERE n_frames > 0)
SELECT image_id, CAST(k AS BIGINT) AS frame_no,
  CAST(list_sum([(p + 1) * b[k * 768 + p + 1]
                 for p in generate_series(0, 767)]) AS BIGINT) AS cksum
FROM sampled
"""


def q_image_patches(sf_dir: str):
    """ViT-style patch extraction over the shared media corpus:
    actor-pool decode → 8×8×3 patch grid → one row per patch with a
    position-weighted byte checksum. The SQL oracle re-derives every
    patch byte from the persisted int-list payload (decode CASE per
    fmt, the same (py,px,j) → source-pixel arithmetic), so a wrong
    pixel, stride, grid bound or decode path shifts the sum."""
    from ..stages.media import ImagePatchActor

    imgs = gen_images(_persist_media_inputs(sf_dir))
    return imgs.map_batches(
        ImagePatchActor,
        fn_constructor_kwargs={"patch": 8},
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(1, 4),
    )


_IMAGE_PATCH_SQL = f"""
WITH base AS MATERIALIZED (
  SELECT image_id, b, w, fmt, w//8 AS gx, h//8 AS gy
  FROM read_parquet('{_ORACLE_DIR}/media_in/*.parquet')
  WHERE w >= 8 AND h >= 8),
g AS (SELECT image_id, b, w, fmt, gx,
             unnest(range(0, gy*gx)) AS pi
      FROM base)
SELECT image_id,
  CAST(pi // gx AS BIGINT) AS py,
  CAST(pi % gx AS BIGINT) AS px,
  CAST(list_sum([(j+1) * (CASE WHEN fmt = 'raw'
      THEN b[(((pi//gx)*8 + j//24)*w + ((pi%gx)*8 + (j%24)//3))*3 + j%3 + 1]
      ELSE b[(((pi//gx)*8 + j//24)*w + ((pi%gx)*8 + (j%24)//3))*3 + j%3 + 1]*4 + 2
      END) for j in generate_series(0, 191)]) AS BIGINT) AS cksum
FROM g
"""


def q_image_pyramid(sf_dir: str):
    """Mean-pool tile pyramid over the shared media corpus: actor-pool
    decode → 2^L×2^L integer box pooling (levels 1–2) → one row per
    (image, level) with a position-weighted checksum of the pooled
    grid. The SQL oracle re-derives every pooled cell from the
    persisted int-list payload (decode CASE per fmt, exact sum//area),
    so a wrong pool bound, stride or decode path shifts the sum."""
    from ..stages.media import ImagePyramidActor

    imgs = gen_images(_persist_media_inputs(sf_dir))
    return imgs.map_batches(
        ImagePyramidActor,
        fn_constructor_kwargs={"levels": (1, 2)},
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(1, 4),
    )


_IMAGE_PYRAMID_SQL = f"""
WITH base AS MATERIALIZED (
  SELECT image_id, b, w, h, fmt
  FROM read_parquet('{_ORACLE_DIR}/media_in/*.parquet')),
lv(level, s) AS (VALUES (1, 2), (2, 4)),
g AS (SELECT image_id, b, w, fmt, level, s, w//s AS gx, h//s AS gy
      FROM base CROSS JOIN lv WHERE w >= s AND h >= s),
cells AS (SELECT image_id, b, w, fmt, level, s, gx, gy,
                 unnest(range(0, gy*gx*3)) AS pi
          FROM g),
v AS (SELECT image_id, level, gy, gx, pi,
  list_sum([(CASE WHEN fmt = 'raw'
      THEN b[(((pi//(gx*3))*s + t//s)*w + ((pi%(gx*3))//3)*s + t%s)*3 + pi%3 + 1]
      ELSE b[(((pi//(gx*3))*s + t//s)*w + ((pi%(gx*3))//3)*s + t%s)*3 + pi%3 + 1]*4 + 2
      END) for t in generate_series(0, s*s - 1)]) // (s*s) AS pooled
  FROM cells)
SELECT image_id, CAST(level AS BIGINT) AS level,
       CAST(gy AS BIGINT) AS gy, CAST(gx AS BIGINT) AS gx,
       CAST(SUM((pi+1) * pooled) AS BIGINT) AS cksum
FROM v GROUP BY image_id, level, gy, gx
"""


GEO_QUERIES.update(
    {
        "media_decode_featurize": q_media_decode_featurize,
        "image_pyramid": q_image_pyramid,
        "media_resize": q_media_resize,
        "image_phash_near_dup": _phash_pairs_cached,
        "image_dedup_groups": q_image_dedup_groups,
        "approx_distinct_users": q_approx_distinct_users,
        "audio_features": q_audio_features,
        "video_frame_sample": q_video_frame_sample,
        "image_patches": q_image_patches,
    }
)

EXTRA_ORACLE_SQL.update(
    {
        "audio_features": _AUDIO_FEAT_SQL,
        "video_frame_sample": _VIDEO_FRAME_SQL,
        "image_patches": _IMAGE_PATCH_SQL,
        "image_pyramid": _IMAGE_PYRAMID_SQL,
    }
)


def q_geo_compact_cover(sf_dir: str):
    """Mixed-level compacted covering: full sibling quads merge into
    their parent cell (cells/grid.compact_cells). Input cover persists
    so the SQL oracle replays the level-by-level merge."""
    import ray.data as rd

    cover_dir = _persist(q_geo_cover(sf_dir), "cover_compact")
    cover = rd.read_parquet(cover_dir)
    # compaction needs every cell of a ring in ONE task: a block-local
    # pass silently under-merges whenever the read splits a ring
    # across blocks (happens at high cpu counts). A hash BUCKET of the
    # ring identity co-locates whole rings while handing
    # compact_cover_table (which sort-splits multi-ring input) hundreds
    # of rings per group — not a pandas group per ring.
    from ..text._hash import fnv64_batch

    def add_bucket(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return t
        gid_h = fnv64_batch([s.encode() for s in t["geom_id"].to_pylist()])
        seq = t["ring_seq"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = ((gid_h ^ (seq * np.uint64(0x9E3779B97F4A7C15))) % np.uint64(512)).astype(
            np.int64
        )
        return t.append_column("_rb", pa.array(b))

    compacted = (
        cover.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_rb")
        .map_groups(compact_cover_table, batch_format="pyarrow")
    )
    return compacted


def compact_cover_table(t: pa.Table) -> pa.Table:
    """Compact one co-located group (or block) of cover rows: sort-split
    by ring identity, compact_cells per ring. Requires every cell of a
    ring to be present (use under a (geom_id, ring_seq) groupby)."""
    from ..cells.grid import cell_level, compact_cells

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


def q_geo_zonal_value_stats(sf_dir: str):
    """Zonal statistics v2: per-ring point count AND value sum (the
    raster-zonal-mean building block). The per-point value is a
    deterministic function of the id digits (vectorized Arrow slice +
    cast — no per-row Python), pre-combined per block so the exchange
    carries (ring, partials) rows only."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ..relational.queries import _partial_groupby

    joined = q_geo_pip_join(sf_dir)

    def add_val(t: pa.Table) -> pa.Table:
        digits = pc.utf8_slice_codeunits(t["image_id"], 3, 64)
        v = pc.cast(digits, pa.int64()).to_numpy(zero_copy_only=False) % 1000
        return t.append_column("val", pa.array(v))

    partial = joined.map_batches(add_val, batch_format="pyarrow").map_batches(
        _partial_groupby(
            ["geom_id", "ring_seq"],
            [("ring_seq", "count", "n_points"), ("val", "sum", "sum_val")],
        ),
        batch_format="pyarrow",
    )
    return partial.groupby(["geom_id", "ring_seq"]).aggregate(
        Sum("n_points", alias_name="n_points"),
        Sum("sum_val", alias_name="sum_val"),
    )


def q_geo_image_brightness(sf_dir: str):
    """CROSS-MODAL zonal stats (the axes-A+B flagship shape): PIP-join
    the media corpus's geotags into the decomposed simple rings, then
    aggregate each ring's EXACT integer decoded-luma sum. The luma side
    is one scalar per image computed from payload byte sums without a
    full decode (raw: Σb; q6: Σ(4b+2) = 4Σb + 2·npx) and rides as a
    task-assembled broadcast keyed by the numeric image id — one
    ray.put, read per worker, never per batch. At a scale where the
    per-image scalar table outgrows a worker heap, the attach becomes
    an image_id-bucketed shuffle join (the `_verify_pairs_shuffle`
    pattern); the broadcast is the bounded-side fast path, like
    pip_join's `GRAFT_BROADCAST_EDGE_CAP` crossover."""
    import pyarrow.compute as pc
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..relational.queries import _partial_groupby
    from ..stages.pip_join import _cached_get

    n_media = _persist_media_inputs(sf_dir)
    simple = _simple_rings_cached(sf_dir)
    _persist(simple.map_batches(_edges_batch, batch_format="pyarrow"), "pipb_edges")
    pts_dir = _persist(gen_points(n_media), "pipb_points")
    joined = pip_join_broadcast(
        rd.read_parquet(pts_dir), simple, level=DEFAULT_LEVEL
    ).select_columns(["image_id", "geom_id", "ring_seq"])

    def luma_partial(t: pa.Table) -> pa.Table:
        from ..stages.media import _binary_parts

        data, off = _binary_parts(t["bytes"])
        npx = off[1:] - off[:-1]
        sums = np.add.reduceat(data.astype(np.int64), off[:-1]) if len(t) else np.zeros(0, np.int64)
        sums = np.where(npx > 0, sums, 0)
        is_q6 = pc.equal(t["fmt"], "q6").to_numpy(zero_copy_only=False)
        luma = np.where(is_q6, 4 * sums + 2 * npx, sums)
        ids = pc.cast(
            pc.utf8_slice_codeunits(t["image_id"], 3, 64), pa.int64()
        ).to_numpy(zero_copy_only=False)
        return pa.table({"iid": pa.array(ids), "luma": pa.array(luma)})

    luma_tbl = pa.concat_tables(
        ray.get(
            [
                blk
                for blk in gen_images(n_media)
                .map_batches(luma_partial, batch_format="pyarrow")
                .to_arrow_refs()
            ]
        )
    )
    order = np.argsort(luma_tbl["iid"].to_numpy(zero_copy_only=False), kind="stable")
    luma_ref = ray.put(
        (
            luma_tbl["iid"].to_numpy(zero_copy_only=False)[order],
            luma_tbl["luma"].to_numpy(zero_copy_only=False)[order],
        )
    )

    def attach(t: pa.Table) -> pa.Table:
        ids_sorted, luma = _cached_get(luma_ref)
        ids = pc.cast(
            pc.utf8_slice_codeunits(t["image_id"], 3, 64), pa.int64()
        ).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ids_sorted, ids)
        if len(ids) and not (ids_sorted[np.minimum(pos, len(ids_sorted) - 1)] == ids).all():
            raise ValueError("pip output references an image absent from the corpus")
        return pa.table(
            {
                "geom_id": t["geom_id"],
                "ring_seq": t["ring_seq"],
                "luma": pa.array(luma[pos]),
            }
        )

    partial = joined.map_batches(attach, batch_format="pyarrow").map_batches(
        _partial_groupby(
            ["geom_id", "ring_seq"],
            [("ring_seq", "count", "n_images"), ("luma", "sum", "sum_luma")],
        ),
        batch_format="pyarrow",
    )
    return partial.groupby(["geom_id", "ring_seq"]).aggregate(
        Sum("n_images", alias_name="n_images"),
        Sum("sum_luma", alias_name="sum_luma"),
    )


def q_geo_knn_classify(sf_dir: str):
    """k-NN classification (majority label of the 5 nearest sites;
    labels are a deterministic function of the site id digits). Builds
    on the broadcast kNN join; the per-probe vote is one lexsort +
    segmented bincount over the k·|probes| slim rows. Ties break on
    the smaller label, matching the SQL row_number. Shares geo_knn's
    persisted probes/sites, so the oracle recomputes the true global
    kNN and its majority independently."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ..stages.knn import knn_join_dataset

    _, n_images = scale_counts(sf_dir)
    n_sites = max(n_images // 10, 100)
    sites_dir = _persist(gen_points(n_sites), "knn_sites")
    probes_dir = _persist(gen_points(min(n_images, 5_000)), "knn_probes")
    out = knn_join_dataset(
        rd.read_parquet(probes_dir), rd.read_parquet(sites_dir), k=5, level=DEFAULT_LEVEL
    )

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        # per-block partial votes — robust to a probe's k rows
        # spanning blocks (dynamic block splitting at scale)
        pid = pc.cast(pc.utf8_slice_codeunits(t["image_id"], 3, 64), pa.int64())
        lbl = pa.array(
            pc.cast(pc.utf8_slice_codeunits(t["neighbor_id"], 3, 64), pa.int64())
            .to_numpy(zero_copy_only=False)
            % 5
        )
        g = (
            pa.table({"image_key": pid, "lbl": lbl})
            .group_by(["image_key", "lbl"])
            .aggregate([([], "count_all")])
        )
        # select by NAME (column order from aggregate() is
        # pyarrow-version-dependent)
        return pa.table(
            {"image_key": g["image_key"], "lbl": g["lbl"], "n": g["count_all"]}
        )

    cnts = (
        out.map_batches(partial, batch_format="pyarrow")
        .groupby(["image_key", "lbl"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def add_kb(t: pa.Table) -> pa.Table:
        k = t["image_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("_kb", pa.array(k % 512))

    def argmax(g: pa.Table) -> pa.Table:
        key = g["image_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        lbl = g["lbl"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = g["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((lbl, -n, key))
        sk = key[order]
        new = np.ones(len(sk), bool)
        new[1:] = sk[1:] != sk[:-1]
        starts = np.flatnonzero(new)
        return pa.table(
            {
                "image_key": pa.array(sk[starts]),
                "pred_label": pa.array(lbl[order][starts]),
            }
        )

    return (
        cnts.map_batches(add_kb, batch_format="pyarrow")
        .groupby("_kb")
        .map_groups(argmax, batch_format="pyarrow")
    )


_KNN_CLASSIFY_SQL = f"""
WITH p AS (SELECT image_id, lon, lat
           FROM read_parquet('{_ORACLE_DIR}/knn_probes/*.parquet')),
s AS (SELECT image_id AS neighbor_id, lon AS slon, lat AS slat
      FROM read_parquet('{_ORACLE_DIR}/knn_sites/*.parquet')),
d AS (SELECT p.image_id, s.neighbor_id,
        2 * 6371.0088 * asin(sqrt(
          pow(sin((radians(s.slat) - radians(p.lat)) / 2), 2)
          + cos(radians(p.lat)) * cos(radians(s.slat))
            * pow(sin((radians(s.slon) - radians(p.lon)) / 2), 2))) AS dist
      FROM p CROSS JOIN s),
r AS (SELECT image_id, neighbor_id,
        row_number() OVER (PARTITION BY image_id ORDER BY dist, neighbor_id) AS rn
      FROM d),
lab AS (SELECT CAST(substr(image_id, 4) AS BIGINT) AS image_key,
               CAST(substr(neighbor_id, 4) AS BIGINT) % 5 AS lbl
        FROM r WHERE rn <= 5),
cnt AS (SELECT image_key, lbl, COUNT(*) AS c FROM lab GROUP BY image_key, lbl)
SELECT image_key, lbl AS pred_label
FROM (SELECT image_key, lbl,
             row_number() OVER (PARTITION BY image_key ORDER BY c DESC, lbl) AS rn2
      FROM cnt)
WHERE rn2 = 1
"""


GEO_QUERIES.update(
    {
        "geo_compact_cover": q_geo_compact_cover,
        "geo_zonal_counts": q_geo_zonal_counts,
        "geo_zonal_value_stats": q_geo_zonal_value_stats,
        "geo_image_brightness": q_geo_image_brightness,
        "geo_knn_classify": q_geo_knn_classify,
    }
)

EXTRA_ORACLE_SQL["geo_zonal_value_stats"] = (
    "SELECT geom_id, CAST(ring_seq AS BIGINT) AS ring_seq, COUNT(*) AS n_points, "
    "CAST(SUM(CAST(substr(image_id, 4) AS BIGINT) % 1000) AS BIGINT) AS sum_val FROM ("
    + _pip_sql(f"{_ORACLE_DIR}/pip_points", f"{_ORACLE_DIR}/pip_edges")
    + ") GROUP BY geom_id, ring_seq"
)
EXTRA_ORACLE_SQL["geo_knn_classify"] = _KNN_CLASSIFY_SQL
EXTRA_ORACLE_SQL["geo_image_brightness"] = (
    "WITH j AS ("
    + _pip_sql(f"{_ORACLE_DIR}/pipb_points", f"{_ORACLE_DIR}/pipb_edges")
    + f"""),
luma AS (SELECT image_id,
  CAST(list_sum([CASE WHEN fmt = 'raw' THEN v ELSE v*4 + 2 END for v in b])
       AS BIGINT) AS sl
  FROM read_parquet('{_ORACLE_DIR}/media_in/*.parquet'))
SELECT j.geom_id, CAST(j.ring_seq AS BIGINT) AS ring_seq,
       CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(SUM(l.sl) AS BIGINT) AS sum_luma
FROM j JOIN luma l ON l.image_id = j.image_id
GROUP BY j.geom_id, j.ring_seq"""
)


# ---------------------------------------------------------------- ring stats


def _ring_stats_batch(t: pa.Table) -> pa.Table:
    """simple-ring rows → one row of exact fixed-point geometry stats
    per ring: open vertex count, 2×signed shoelace area in e10 units
    (int64 — no division, no float accumulation), and the e5 bbox.
    Fully vectorized via reduceat over the block's flat coord buffer."""
    from ..cells.grid import _rl_arange

    empty = pa.table(
        {
            "geom_id": pa.array([], type=pa.string()),
            "ring_seq": pa.array([], type=pa.int32()),
            "n_vertices": pa.array([], type=pa.int64()),
            "area2_e10": pa.array([], type=pa.int64()),
            "min_x_e5": pa.array([], type=pa.int64()),
            "max_x_e5": pa.array([], type=pa.int64()),
            "min_y_e5": pa.array([], type=pa.int64()),
            "max_y_e5": pa.array([], type=pa.int64()),
        }
    )
    if t.num_columns == 0 or t.num_rows == 0:
        return empty
    col = t["ring"].combine_chunks()
    offs = np.asarray(col.offsets).astype(np.int64)
    coords = np.asarray(col.values.values, dtype=np.float64).reshape(-1, 2)
    vlen = offs[1:] - offs[:-1]
    closed = (coords[offs[:-1]] == coords[np.maximum(offs[1:] - 1, 0)]).all(axis=1)
    closed &= vlen > 1
    olen = vlen - closed.astype(np.int64)
    if (olen <= 0).any():
        raise ValueError("degenerate ring in stats input")
    if olen.max(initial=0) > 900:
        # e5 cross terms stay < 6.5e14; 900 edges keeps the int64 sum
        # exact with >10x headroom — raise rather than overflow silently
        raise ValueError("ring too long for exact int64 shoelace at e5")
    gather = _rl_arange(offs[:-1], olen)
    oc = coords[gather]
    # floor, not round: these coords CAN land exactly on .5 at e5
    # scale, where numpy rint (half-even) and SQL round (half-away)
    # disagree; floor is bit-identical in both engines
    xi = np.floor(oc[:, 0] * 1e5).astype(np.int64)
    yi = np.floor(oc[:, 1] * 1e5).astype(np.int64)
    ostart = np.concatenate([[0], np.cumsum(olen)[:-1]]).astype(np.int64)
    nxt = np.arange(len(oc), dtype=np.int64) + 1
    nxt[ostart + olen - 1] = ostart
    cross = xi * yi[nxt] - xi[nxt] * yi
    return pa.table(
        {
            "geom_id": t["geom_id"],
            "ring_seq": t["ring_seq"],
            "n_vertices": pa.array(olen),
            "area2_e10": pa.array(np.add.reduceat(cross, ostart)),
            "min_x_e5": pa.array(np.minimum.reduceat(xi, ostart)),
            "max_x_e5": pa.array(np.maximum.reduceat(xi, ostart)),
            "min_y_e5": pa.array(np.minimum.reduceat(yi, ostart)),
            "max_y_e5": pa.array(np.maximum.reduceat(yi, ostart)),
        }
    )


def q_geo_ring_stats(sf_dir: str):
    """Per-ring area/bbox/vertex stats over the decompose output; the
    open-vertex table persists so the oracle replays the shoelace and
    bbox from the ordered vertices in SQL."""
    simple = _simple_rings_cached(sf_dir)
    _persist(
        simple.map_batches(_verts_batch, batch_format="pyarrow"), "ring_stats_verts"
    )
    return simple.map_batches(_ring_stats_batch, batch_format="pyarrow")


_RING_STATS_SQL = f"""
WITH v AS (SELECT geom_id, ring_seq, vidx,
                  CAST(floor(x * 100000.0) AS BIGINT) AS xi,
                  CAST(floor(y * 100000.0) AS BIGINT) AS yi
           FROM read_parquet('{_ORACLE_DIR}/ring_stats_verts/*.parquet')),
n AS (SELECT geom_id, ring_seq, COUNT(*) AS m FROM v GROUP BY geom_id, ring_seq),
e AS (SELECT a.geom_id, a.ring_seq, a.xi, a.yi,
             a.xi * b.yi - b.xi * a.yi AS cr
      FROM v a
      JOIN n ON n.geom_id = a.geom_id AND n.ring_seq = a.ring_seq
      JOIN v b ON b.geom_id = a.geom_id AND b.ring_seq = a.ring_seq
              AND b.vidx = (a.vidx + 1) % n.m)
SELECT geom_id, ring_seq, COUNT(*) AS n_vertices,
       CAST(SUM(cr) AS BIGINT) AS area2_e10,
       MIN(xi) AS min_x_e5, MAX(xi) AS max_x_e5,
       MIN(yi) AS min_y_e5, MAX(yi) AS max_y_e5
FROM e GROUP BY geom_id, ring_seq
"""


GEO_QUERIES.update({"geo_ring_stats": q_geo_ring_stats})
EXTRA_ORACLE_SQL["geo_ring_stats"] = _RING_STATS_SQL


# ---------------------------------------------------------------- decimation

# Keep a vertex iff C · m · |cross2_k| ≥ |area2| — its turn triangle is
# at least 1/(C·m) of the ring area. Scale-free (no tuning constant in
# coordinate units) and pure int64 on both engines. C=2, m ≤ 900,
# |cross2| < 6.5e14 keep the product < 1.2e18 (int64-safe).
_DECIM_C = 2


def _ring_decimate_batch(t: pa.Table) -> pa.Table:
    """simple-ring rows → one exact-int decimation summary per ring:
    one-pass Visvalingam-style vertex screen (drop vertices whose turn
    triangle is below 1/(C·m) of the ring area; vertex 0 pinned), with
    kept-vertex count and coordinate/position checksums so the SQL
    replay pins exactly WHICH vertices survive, not just how many."""
    from ..cells.grid import _rl_arange

    empty = pa.table(
        {
            "geom_id": pa.array([], type=pa.string()),
            "ring_seq": pa.array([], type=pa.int32()),
            "n_vertices": pa.array([], type=pa.int64()),
            "n_kept": pa.array([], type=pa.int64()),
            "kept_vidx_sum": pa.array([], type=pa.int64()),
            "kept_x_sum": pa.array([], type=pa.int64()),
            "kept_y_sum": pa.array([], type=pa.int64()),
        }
    )
    if t.num_columns == 0 or t.num_rows == 0:
        return empty
    col = t["ring"].combine_chunks()
    offs = np.asarray(col.offsets).astype(np.int64)
    coords = np.asarray(col.values.values, dtype=np.float64).reshape(-1, 2)
    vlen = offs[1:] - offs[:-1]
    closed = (coords[offs[:-1]] == coords[np.maximum(offs[1:] - 1, 0)]).all(axis=1)
    closed &= vlen > 1
    olen = vlen - closed.astype(np.int64)
    if (olen <= 0).any():
        raise ValueError("degenerate ring in decimate input")
    if olen.max(initial=0) > 900:
        raise ValueError("ring too long for exact int64 cross terms at e5")
    gather = _rl_arange(offs[:-1], olen)
    oc = coords[gather]
    # floor (not rint): e5-scaled coords land exactly on .5 (CLAUDE.md)
    xi = np.floor(oc[:, 0] * 1e5).astype(np.int64)
    yi = np.floor(oc[:, 1] * 1e5).astype(np.int64)
    ostart = np.concatenate([[0], np.cumsum(olen)[:-1]]).astype(np.int64)
    idx = np.arange(len(oc), dtype=np.int64)
    nxt = idx + 1
    nxt[ostart + olen - 1] = ostart
    prv = idx - 1
    prv[ostart] = ostart + olen - 1
    vidx = idx - np.repeat(ostart, olen)
    area2 = np.add.reduceat(xi * yi[nxt] - xi[nxt] * yi, ostart)
    cross2 = (xi - xi[prv]) * (yi[nxt] - yi) - (xi[nxt] - xi) * (yi - yi[prv])
    m_pv = np.repeat(olen, olen)
    keep = (vidx == 0) | (
        _DECIM_C * m_pv * np.abs(cross2) >= np.repeat(np.abs(area2), olen)
    )
    k64 = keep.astype(np.int64)
    return pa.table(
        {
            "geom_id": t["geom_id"],
            "ring_seq": t["ring_seq"],
            "n_vertices": pa.array(olen),
            "n_kept": pa.array(np.add.reduceat(k64, ostart)),
            "kept_vidx_sum": pa.array(np.add.reduceat((vidx + 1) * k64, ostart)),
            "kept_x_sum": pa.array(np.add.reduceat(xi * k64, ostart)),
            "kept_y_sum": pa.array(np.add.reduceat(yi * k64, ostart)),
        }
    )


def q_geo_ring_decimate(sf_dir: str):
    """Polyline/ring simplification over the decompose output — the
    tile-serving preprocessing step (render low zooms from decimated
    rings). One pass, no shuffle: each ring decimates inside its own
    block. The vertex table persists so SQL re-derives every turn
    triangle and the keep decision per vertex."""
    simple = _simple_rings_cached(sf_dir)
    _persist(
        simple.map_batches(_verts_batch, batch_format="pyarrow"), "decim_verts"
    )
    return simple.map_batches(_ring_decimate_batch, batch_format="pyarrow")


_RING_DECIMATE_SQL = f"""
WITH v AS (SELECT geom_id, ring_seq, vidx,
                  CAST(floor(x * 100000.0) AS BIGINT) AS xi,
                  CAST(floor(y * 100000.0) AS BIGINT) AS yi
           FROM read_parquet('{_ORACLE_DIR}/decim_verts/*.parquet')),
n AS (SELECT geom_id, ring_seq, COUNT(*) AS m FROM v GROUP BY geom_id, ring_seq),
ar AS (SELECT a.geom_id, a.ring_seq,
              SUM(a.xi * b.yi - b.xi * a.yi) AS area2
       FROM v a
       JOIN n ON n.geom_id = a.geom_id AND n.ring_seq = a.ring_seq
       JOIN v b ON b.geom_id = a.geom_id AND b.ring_seq = a.ring_seq
               AND b.vidx = (a.vidx + 1) % n.m
       GROUP BY a.geom_id, a.ring_seq),
k AS (SELECT a.geom_id, a.ring_seq, a.vidx, a.xi, a.yi,
             CASE WHEN a.vidx = 0 OR
                  {_DECIM_C} * n.m * abs((a.xi - c.xi) * (b.yi - a.yi)
                                       - (b.xi - a.xi) * (a.yi - c.yi))
                  >= abs(ar.area2)
             THEN 1 ELSE 0 END AS keep
      FROM v a
      JOIN n ON n.geom_id = a.geom_id AND n.ring_seq = a.ring_seq
      JOIN ar ON ar.geom_id = a.geom_id AND ar.ring_seq = a.ring_seq
      JOIN v b ON b.geom_id = a.geom_id AND b.ring_seq = a.ring_seq
              AND b.vidx = (a.vidx + 1) % n.m
      JOIN v c ON c.geom_id = a.geom_id AND c.ring_seq = a.ring_seq
              AND c.vidx = (a.vidx - 1 + n.m) % n.m)
SELECT geom_id, ring_seq, COUNT(*) AS n_vertices,
       CAST(SUM(keep) AS BIGINT) AS n_kept,
       CAST(SUM((vidx + 1) * keep) AS BIGINT) AS kept_vidx_sum,
       CAST(SUM(xi * keep) AS BIGINT) AS kept_x_sum,
       CAST(SUM(yi * keep) AS BIGINT) AS kept_y_sum
FROM k GROUP BY geom_id, ring_seq
"""


GEO_QUERIES.update({"geo_ring_decimate": q_geo_ring_decimate})
EXTRA_ORACLE_SQL["geo_ring_decimate"] = _RING_DECIMATE_SQL


# ---------------------------------------------------------------- filtered ann


def q_ann_filtered(sf_dir: str):
    """Metadata-filtered exact top-10 (the vector-db "filtered
    search" shape): the label predicate pushes down to the parquet
    read (row-group pruning at scale — the filtered-out vectors never
    leave storage), then the usual per-block partial top-k."""
    import pyarrow.compute as pc
    import ray.data as rd

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"],
        filter=(pc.field("label") == 3),
    ).drop_columns(["label"])
    top = brute_topk(emb, query_vector(64), k=10).to_pandas()
    top = top.reset_index(drop=True)
    top["rank"] = np.arange(len(top), dtype=np.int64)
    return top[["vec_id", "rank"]]


def _ann_filtered_sql(k: int) -> str:
    from ..ann.search import query_vector

    qlit = "[" + ", ".join(repr(float(v)) for v in query_vector(64)) + "]"
    return f"""
SELECT vec_id,
       CAST(row_number() OVER (
         ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]), {qlit}) DESC,
                  vec_id) - 1 AS BIGINT) AS "rank"
FROM embeddings
WHERE label = 3
ORDER BY "rank"
LIMIT {k}
"""


ANN_QUERIES["ann_filtered_topk"] = q_ann_filtered
EXTRA_ORACLE_SQL["ann_filtered_topk"] = _ann_filtered_sql(10)


# ---------------------------------------------------------- phash retrieval


def q_image_hamming_topk(sf_dir: str):
    """Query-by-image retrieval: top-20 nearest images to the img_key-0
    probe by phash Hamming distance — the exact-rerank half of a
    perceptual image search. Shares the persisted (img_key, phash)
    corpus with the near-dup queries (one synth+decode per sweep); the
    scan is a per-block XOR + LUT popcount with a block-local top-20
    prefilter, so the driver merge sees ≤ 20 × blocks rows. The SQL
    oracle replays the distance with bit_count(xor()) over the same
    persisted table."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pds
    import ray.data as rd

    from ..images.neardup import popcount64

    _phash_pairs_cached(sf_dir)  # ensures phash_tbl is persisted
    tbl_dir = f"{_ORACLE_DIR}/phash_tbl"
    probe = pds.dataset(tbl_dir).to_table(columns=["img_key", "phash"])
    sel = pc.equal(probe["img_key"], 0)
    qh = np.int64(probe.filter(sel)["phash"][0].as_py())

    def score(t: pa.Table) -> pa.Table:
        ph = t["phash"].to_numpy(zero_copy_only=False).astype(np.int64)
        ham = popcount64(np.bitwise_xor(ph, qh))
        k = t["img_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = np.lexsort((k, ham))[:20]
        return pa.table(
            {"img_key": pa.array(k[sel]), "hamming": pa.array(ham[sel])}
        )

    agg = (
        rd.read_parquet(tbl_dir)
        .map_batches(score, batch_format="pyarrow")
        .to_pandas()
    )
    return (
        agg.sort_values(["hamming", "img_key"], kind="mergesort")
        .head(20)
        .reset_index(drop=True)
        .astype(np.int64)
    )


_IMAGE_HAMMING_SQL = f"""
WITH p AS (SELECT img_key, phash
           FROM read_parquet('{_ORACLE_DIR}/phash_tbl/*.parquet')),
q AS (SELECT phash AS qh FROM p WHERE img_key = 0)
SELECT img_key, CAST(bit_count(xor(phash, qh)) AS BIGINT) AS hamming
FROM p, q
ORDER BY hamming, img_key
LIMIT 20
"""


GEO_QUERIES.update({"image_hamming_topk": q_image_hamming_topk})
EXTRA_ORACLE_SQL["image_hamming_topk"] = _IMAGE_HAMMING_SQL


# ------------------------------------------------------------ centroid moments


def _centroid_batch(t: pa.Table) -> pa.Table:
    """simple-ring rows → the exact quantized centroid per ring.

    Moments run RELATIVE to the ring's integer min corner (centroid =
    corner + M/(3·A2) by translation).  cr terms fit int64 at e5, but
    the Σ(dx_i+dx_{i+1})·cr_i numerators can exceed 2^63 on wide
    rings, so the numerator fold runs in arbitrary-precision Python
    ints via object-dtype ``reduceat`` (the SQL replay uses HUGEINT —
    a production path would carry a two-word int128).  The emitted
    centroid is the exact floor quotient M // (3·|A2|) with the sign
    canonicalized first: relative coords are >= 0, so numerator and
    denominator are both non-negative and floor == truncate on both
    engines.  area2 on relative coords equals the absolute shoelace
    (translation invariance) — a cross-check against
    `geo_ring_stats`."""
    from ..cells.grid import _rl_arange

    empty = pa.table(
        {
            "geom_id": pa.array([], type=pa.string()),
            "ring_seq": pa.array([], type=pa.int32()),
            "abs_area2_e10": pa.array([], type=pa.int64()),
            "cx_e5": pa.array([], type=pa.int64()),
            "cy_e5": pa.array([], type=pa.int64()),
        }
    )
    if t.num_columns == 0 or t.num_rows == 0:
        return empty
    col = t["ring"].combine_chunks()
    offs = np.asarray(col.offsets).astype(np.int64)
    coords = np.asarray(col.values.values, dtype=np.float64).reshape(-1, 2)
    vlen = offs[1:] - offs[:-1]
    closed = (coords[offs[:-1]] == coords[np.maximum(offs[1:] - 1, 0)]).all(axis=1)
    closed &= vlen > 1
    olen = vlen - closed.astype(np.int64)
    if (olen <= 0).any():
        raise ValueError("degenerate ring in centroid input")
    if olen.max(initial=0) > 900:
        raise ValueError("ring too long for exact int64 cross terms at e5")
    gather = _rl_arange(offs[:-1], olen)
    oc = coords[gather]
    # floor, not round — same .5-safety rule as _ring_stats_batch
    xi = np.floor(oc[:, 0] * 1e5).astype(np.int64)
    yi = np.floor(oc[:, 1] * 1e5).astype(np.int64)
    ostart = np.concatenate([[0], np.cumsum(olen)[:-1]]).astype(np.int64)
    minx = np.minimum.reduceat(xi, ostart)
    miny = np.minimum.reduceat(yi, ostart)
    dx = xi - np.repeat(minx, olen)
    dy = yi - np.repeat(miny, olen)
    nxt = np.arange(len(oc), dtype=np.int64) + 1
    nxt[ostart + olen - 1] = ostart
    cr = dx * dy[nxt] - dx[nxt] * dy  # |cr| <= 2E^2: int64-safe at e5
    a2 = np.add.reduceat(cr, ostart)
    if (a2 == 0).any():
        raise ValueError("zero-area ring in centroid input")
    cro = cr.astype(object)
    mxs = np.add.reduceat((dx + dx[nxt]).astype(object) * cro, ostart)
    mys = np.add.reduceat((dy + dy[nxt]).astype(object) * cro, ostart)
    neg = a2 < 0
    a2abs = np.where(neg, -a2, a2)
    mxs = np.where(neg, -mxs, mxs)
    mys = np.where(neg, -mys, mys)
    cx = minx + (mxs // (3 * a2abs.astype(object))).astype(np.int64)
    cy = miny + (mys // (3 * a2abs.astype(object))).astype(np.int64)
    return pa.table(
        {
            "geom_id": t["geom_id"],
            "ring_seq": t["ring_seq"],
            "abs_area2_e10": pa.array(a2abs.astype(np.int64)),
            "cx_e5": pa.array(cx),
            "cy_e5": pa.array(cy),
        }
    )


def q_geo_centroid_moments(sf_dir: str):
    """Exact centroid moment sums over the decompose output; the open
    vertex table persists so SQL replays the relative-corner moment
    arithmetic op-for-op."""
    simple = _simple_rings_cached(sf_dir)
    _persist(
        simple.map_batches(_verts_batch, batch_format="pyarrow"), "centroid_verts"
    )
    return simple.map_batches(_centroid_batch, batch_format="pyarrow")


_CENTROID_SQL = f"""
WITH v AS (SELECT geom_id, ring_seq, vidx,
                  CAST(floor(x * 100000.0) AS BIGINT) AS xi,
                  CAST(floor(y * 100000.0) AS BIGINT) AS yi
           FROM read_parquet('{_ORACLE_DIR}/centroid_verts/*.parquet')),
n AS (SELECT geom_id, ring_seq, COUNT(*) AS m, MIN(xi) AS mx, MIN(yi) AS my
      FROM v GROUP BY geom_id, ring_seq),
d AS (SELECT v.geom_id, v.ring_seq, v.vidx,
             v.xi - n.mx AS dx, v.yi - n.my AS dy, n.m, n.mx, n.my
      FROM v JOIN n ON n.geom_id = v.geom_id AND n.ring_seq = v.ring_seq),
e AS (SELECT a.geom_id, a.ring_seq, a.mx, a.my,
             a.dx * b.dy - b.dx * a.dy AS cr,
             a.dx + b.dx AS sx, a.dy + b.dy AS sy
      FROM d a
      JOIN d b ON b.geom_id = a.geom_id AND b.ring_seq = a.ring_seq
              AND b.vidx = (a.vidx + 1) % a.m),
agg AS (SELECT geom_id, ring_seq, MIN(mx) AS mx, MIN(my) AS my,
               SUM(CAST(cr AS HUGEINT)) AS a2,
               SUM(CAST(sx AS HUGEINT) * CAST(cr AS HUGEINT)) AS mxs,
               SUM(CAST(sy AS HUGEINT) * CAST(cr AS HUGEINT)) AS mys
        FROM e GROUP BY geom_id, ring_seq)
SELECT geom_id, ring_seq,
       CAST(abs(a2) AS BIGINT) AS abs_area2_e10,
       CAST(mx + (CASE WHEN a2 < 0 THEN -mxs ELSE mxs END) // (3 * abs(a2))
            AS BIGINT) AS cx_e5,
       CAST(my + (CASE WHEN a2 < 0 THEN -mys ELSE mys END) // (3 * abs(a2))
            AS BIGINT) AS cy_e5
FROM agg
"""


GEO_QUERIES.update({"geo_centroid_moments": q_geo_centroid_moments})
EXTRA_ORACLE_SQL["geo_centroid_moments"] = _CENTROID_SQL


# ------------------------------------------------------------ ring convexity


def _convexity_batch(t: pa.Table) -> pa.Table:
    """simple-ring rows → per-ring turn census on e5 integer coords:
    left / right / collinear turn counts at every open vertex (cross
    product of the incoming and outgoing edge vectors) and the
    orientation-agnostic convexity flag (all turns one way, collinear
    allowed).  Edge-vector cross terms are ≤ (2·3.6e7)² ≈ 5e15 —
    int64-safe at any geographic extent."""
    from ..cells.grid import _rl_arange

    empty = pa.table(
        {
            "geom_id": pa.array([], type=pa.string()),
            "ring_seq": pa.array([], type=pa.int32()),
            "n_left": pa.array([], type=pa.int64()),
            "n_right": pa.array([], type=pa.int64()),
            "n_straight": pa.array([], type=pa.int64()),
            "is_convex": pa.array([], type=pa.int64()),
        }
    )
    if t.num_columns == 0 or t.num_rows == 0:
        return empty
    col = t["ring"].combine_chunks()
    offs = np.asarray(col.offsets).astype(np.int64)
    coords = np.asarray(col.values.values, dtype=np.float64).reshape(-1, 2)
    vlen = offs[1:] - offs[:-1]
    closed = (coords[offs[:-1]] == coords[np.maximum(offs[1:] - 1, 0)]).all(axis=1)
    closed &= vlen > 1
    olen = vlen - closed.astype(np.int64)
    if (olen <= 0).any():
        raise ValueError("degenerate ring in convexity input")
    gather = _rl_arange(offs[:-1], olen)
    oc = coords[gather]
    xi = np.floor(oc[:, 0] * 1e5).astype(np.int64)
    yi = np.floor(oc[:, 1] * 1e5).astype(np.int64)
    ostart = np.concatenate([[0], np.cumsum(olen)[:-1]]).astype(np.int64)
    idx = np.arange(len(oc), dtype=np.int64)
    nxt = idx + 1
    nxt[ostart + olen - 1] = ostart
    prv = idx - 1
    prv[ostart] = ostart + olen - 1
    cr = (xi - xi[prv]) * (yi[nxt] - yi) - (xi[nxt] - xi) * (yi - yi[prv])
    n_left = np.add.reduceat((cr > 0).astype(np.int64), ostart)
    n_right = np.add.reduceat((cr < 0).astype(np.int64), ostart)
    n_straight = np.add.reduceat((cr == 0).astype(np.int64), ostart)
    return pa.table(
        {
            "geom_id": t["geom_id"],
            "ring_seq": t["ring_seq"],
            "n_left": pa.array(n_left),
            "n_right": pa.array(n_right),
            "n_straight": pa.array(n_straight),
            "is_convex": pa.array(
                ((n_left == 0) | (n_right == 0)).astype(np.int64)
            ),
        }
    )


def q_geo_ring_convexity(sf_dir: str):
    """Per-ring turn census + convexity flag over the decompose
    output; the open vertex table persists so SQL replays the
    cross-product census from the ordered vertices."""
    simple = _simple_rings_cached(sf_dir)
    _persist(
        simple.map_batches(_verts_batch, batch_format="pyarrow"), "convexity_verts"
    )
    return simple.map_batches(_convexity_batch, batch_format="pyarrow")


_CONVEXITY_SQL = f"""
WITH v AS (SELECT geom_id, ring_seq, vidx,
                  CAST(floor(x * 100000.0) AS BIGINT) AS xi,
                  CAST(floor(y * 100000.0) AS BIGINT) AS yi
           FROM read_parquet('{_ORACLE_DIR}/convexity_verts/*.parquet')),
n AS (SELECT geom_id, ring_seq, COUNT(*) AS m FROM v GROUP BY geom_id, ring_seq),
e AS (SELECT c.geom_id, c.ring_seq,
             (c.xi - p.xi) * (x.yi - c.yi) - (x.xi - c.xi) * (c.yi - p.yi) AS cr
      FROM v c
      JOIN n ON n.geom_id = c.geom_id AND n.ring_seq = c.ring_seq
      JOIN v p ON p.geom_id = c.geom_id AND p.ring_seq = c.ring_seq
              AND p.vidx = (c.vidx + n.m - 1) % n.m
      JOIN v x ON x.geom_id = c.geom_id AND x.ring_seq = c.ring_seq
              AND x.vidx = (c.vidx + 1) % n.m)
SELECT geom_id, ring_seq,
       CAST(SUM(CASE WHEN cr > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_left,
       CAST(SUM(CASE WHEN cr < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_right,
       CAST(SUM(CASE WHEN cr = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_straight,
       CAST(CASE WHEN SUM(CASE WHEN cr > 0 THEN 1 ELSE 0 END) = 0
                   OR SUM(CASE WHEN cr < 0 THEN 1 ELSE 0 END) = 0
                 THEN 1 ELSE 0 END AS BIGINT) AS is_convex
FROM e GROUP BY geom_id, ring_seq
"""


GEO_QUERIES.update({"geo_ring_convexity": q_geo_ring_convexity})
EXTRA_ORACLE_SQL["geo_ring_convexity"] = _CONVEXITY_SQL


# --------------------------------------------------------- cover area error

# doubled cell area at level 8 in e10 units: 2 * (36000000/256) *
# (18000000/256) = 2 * 140625 * 70312.5 — exact integer because the
# area2 convention already carries the factor 2
_CELL_AREA2_E10_L8 = 19_775_390_625


def _cover_area_batch(t: pa.Table) -> pa.Table:
    """simple-ring rows → per-ring covering-vs-exact area comparison:
    cell count at level 8, the covering's doubled area in exact e10
    ints (count × the constant doubled cell area), and the ring's
    exact |shoelace|.  One vectorized covering pass + one reduceat
    shoelace per block — no join between derived datasets needed
    because both quantities fall out of the same ring rows."""
    from ..cells.grid import _rl_arange, cover_rings_flat

    empty = pa.table(
        {
            "geom_id": pa.array([], type=pa.string()),
            "ring_seq": pa.array([], type=pa.int32()),
            "n_cells": pa.array([], type=pa.int64()),
            "cover_area2_e10": pa.array([], type=pa.int64()),
            "abs_area2_e10": pa.array([], type=pa.int64()),
        }
    )
    if t.num_columns == 0 or t.num_rows == 0:
        return empty
    col = t["ring"].combine_chunks()
    offs = np.asarray(col.offsets).astype(np.int64)
    coords = np.asarray(col.values.values, dtype=np.float64).reshape(-1, 2)
    ring_row, _cells = cover_rings_flat(coords, offs, 8)
    n_cells = np.bincount(ring_row, minlength=len(t)).astype(np.int64)
    vlen = offs[1:] - offs[:-1]
    closed = (coords[offs[:-1]] == coords[np.maximum(offs[1:] - 1, 0)]).all(axis=1)
    closed &= vlen > 1
    olen = vlen - closed.astype(np.int64)
    gather = _rl_arange(offs[:-1], olen)
    oc = coords[gather]
    xi = np.floor(oc[:, 0] * 1e5).astype(np.int64)
    yi = np.floor(oc[:, 1] * 1e5).astype(np.int64)
    ostart = np.concatenate([[0], np.cumsum(olen)[:-1]]).astype(np.int64)
    nxt = np.arange(len(oc), dtype=np.int64) + 1
    nxt[ostart + olen - 1] = ostart
    cross = xi * yi[nxt] - xi[nxt] * yi
    a2 = np.add.reduceat(cross, ostart)
    return pa.table(
        {
            "geom_id": t["geom_id"],
            "ring_seq": t["ring_seq"],
            "n_cells": pa.array(n_cells),
            "cover_area2_e10": pa.array(n_cells * _CELL_AREA2_E10_L8),
            "abs_area2_e10": pa.array(np.abs(a2)),
        }
    )


def q_cover_area_error(sf_dir: str):
    """Covering-approximation error audit: per ring, the level-8 cell
    cover's doubled area (exact int) beside the exact |shoelace| —
    the cover is a superset of the ring, so cover_area2 >= abs_area2
    always (asserted by a test).  Edge and vertex tables persist so
    SQL replays BOTH the covering and the shoelace and joins them."""
    simple = _simple_rings_cached(sf_dir)
    _persist(simple.map_batches(_edges_batch, batch_format="pyarrow"), "cae_edges")
    _persist(simple.map_batches(_verts_batch, batch_format="pyarrow"), "cae_verts")
    return simple.map_batches(_cover_area_batch, batch_format="pyarrow")


_COVER_AREA_SQL = f"""
WITH cov AS ({_cover_sql(f"{_ORACLE_DIR}/cae_edges")}),
cnt AS (SELECT geom_id, ring_seq, CAST(COUNT(*) AS BIGINT) AS n_cells
        FROM cov GROUP BY geom_id, ring_seq),
v AS (SELECT geom_id, ring_seq, vidx,
             CAST(floor(x * 100000.0) AS BIGINT) AS xi,
             CAST(floor(y * 100000.0) AS BIGINT) AS yi
      FROM read_parquet('{_ORACLE_DIR}/cae_verts/*.parquet')),
n AS (SELECT geom_id, ring_seq, COUNT(*) AS m FROM v GROUP BY geom_id, ring_seq),
e AS (SELECT a.geom_id, a.ring_seq, a.xi * b.yi - b.xi * a.yi AS cr
      FROM v a
      JOIN n ON n.geom_id = a.geom_id AND n.ring_seq = a.ring_seq
      JOIN v b ON b.geom_id = a.geom_id AND b.ring_seq = a.ring_seq
              AND b.vidx = (a.vidx + 1) % n.m),
ar AS (SELECT geom_id, ring_seq, CAST(abs(SUM(cr)) AS BIGINT) AS abs_area2_e10
       FROM e GROUP BY geom_id, ring_seq)
SELECT c.geom_id, c.ring_seq, c.n_cells,
       CAST(c.n_cells * {_CELL_AREA2_E10_L8} AS BIGINT) AS cover_area2_e10,
       ar.abs_area2_e10
FROM cnt c JOIN ar ON ar.geom_id = c.geom_id AND ar.ring_seq = c.ring_seq
"""


GEO_QUERIES.update({"cover_area_error": q_cover_area_error})
EXTRA_ORACLE_SQL["cover_area_error"] = _COVER_AREA_SQL


# ------------------------------------------------------ survivorship merge


def q_dedup_merge_fields(sf_dir: str):
    """Survivorship MERGE over near-dup groups: instead of keeping one
    winner (q_dedup_keep_best), fuse each group into a golden record —
    canonical min id, member count, longest text length, and the
    distinct language/source counts (the classic MDM field-merge
    policy).  Same scale shape as keep_best: member metadata is
    bounded by the near-dup graph, broadcast once, searchsorted
    attach, one lexsort fold per 256-way group-hash bucket."""
    import ray
    import ray.data as rd
    import pyarrow.compute as pc

    from ..text.dedup import _i64, connected_components

    pairs = _minhash_pairs_cached(sf_dir)
    labs = connected_components(pairs).materialize()

    @ray.remote
    def _member_ids(*blocks):
        ids = [
            t["doc_id"].to_numpy(zero_copy_only=False)
            for t in blocks
            if t.num_columns > 0 and t.num_rows > 0
        ]
        return np.unique(np.concatenate(ids)) if ids else np.empty(0, np.int64)

    ids_ref = _member_ids.remote(*labs.to_arrow_refs())

    meta = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars", "lang", "source"]
    )

    def filt(t: pa.Table) -> pa.Table:
        ids = ray.get(ids_ref)
        return t.filter(pc.is_in(t["doc_id"], value_set=pa.array(ids)))

    @ray.remote
    def _collect(*blocks) -> pa.Table:
        ts = [t for t in blocks if t.num_columns > 0 and t.num_rows > 0]
        if not ts:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_chars": pa.array([], pa.int64()),
                    "lang": pa.array([], pa.string()),
                    "source": pa.array([], pa.string()),
                }
            )
        return pa.concat_tables(ts)

    meta_ref = _collect.remote(
        *meta.map_batches(filt, batch_format="pyarrow").to_arrow_refs()
    )
    _cache: dict = {}

    def attach(t: pa.Table) -> pa.Table:
        if "ids" not in _cache:
            tb = ray.get(meta_ref)
            ids = _i64(tb["doc_id"])
            order = np.argsort(ids, kind="stable")
            _cache["ids"] = ids[order]
            _cache["nc"] = _i64(tb["n_chars"])[order]
            # dictionary codes for distinct counting (values irrelevant)
            lang = pc.dictionary_encode(tb["lang"].combine_chunks())
            src = pc.dictionary_encode(tb["source"].combine_chunks())
            _cache["lang"] = np.asarray(lang.indices, np.int64)[order]
            _cache["src"] = np.asarray(src.indices, np.int64)[order]
        did = _i64(t["doc_id"])
        gid = _i64(t["group_id"])
        pos = np.searchsorted(_cache["ids"], did)
        return pa.table(
            {
                "doc_id": pa.array(did),
                "group_id": pa.array(gid),
                "n_chars": pa.array(_cache["nc"][pos]),
                "lang_c": pa.array(_cache["lang"][pos]),
                "src_c": pa.array(_cache["src"][pos]),
                "_gb": pa.array(gid % 256),
            }
        )

    def merge(g: pa.Table) -> pa.Table:
        gid = _i64(g["group_id"])
        did = _i64(g["doc_id"])
        nc = _i64(g["n_chars"])
        order = np.argsort(gid, kind="stable")
        sg = gid[order]
        new = np.ones(len(sg), bool)
        new[1:] = sg[1:] != sg[:-1]
        starts = np.flatnonzero(new)
        seg = np.cumsum(new) - 1
        n_seg = len(starts)
        cnt = np.diff(np.append(starts, len(sg))).astype(np.int64)
        mn = np.full(n_seg, np.iinfo(np.int64).max)
        np.minimum.at(mn, seg, did[order])
        mx = np.zeros(n_seg, np.int64)
        np.maximum.at(mx, seg, nc[order])

        def n_distinct(codes: np.ndarray) -> np.ndarray:
            key = sg * (codes.max() + 1) + codes[order] if len(codes) else sg
            sk = np.sort(key)
            nw = np.r_[True, sk[1:] != sk[:-1]]
            return np.bincount(
                np.searchsorted(sg[starts], sk[nw] // (codes.max() + 1)),
                minlength=n_seg,
            ).astype(np.int64)

        return pa.table(
            {
                "group_id": pa.array(sg[starts]),
                "canonical_doc_id": pa.array(mn),
                "n_members": pa.array(cnt),
                "max_chars": pa.array(mx),
                "n_langs": pa.array(n_distinct(_i64(g["lang_c"]))),
                "n_sources": pa.array(n_distinct(_i64(g["src_c"]))),
            }
        )

    return (
        labs.map_batches(attach, batch_format="pyarrow")
        .groupby("_gb")
        .map_groups(merge, batch_format="pyarrow")
    )


_MERGE_FIELDS_SQL = f"""
WITH RECURSIVE pairs AS MATERIALIZED (SELECT doc_a, doc_b FROM ({_MINHASH_SQL})),
edges AS MATERIALIZED (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs),
reach(v, l) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges) n
  UNION
  SELECT e.b, r.l FROM reach r JOIN edges e ON e.a = r.v
),
lab AS (SELECT v AS doc_id, MIN(l) AS group_id FROM reach GROUP BY v),
m AS (SELECT l.group_id, d.doc_id, d.n_chars, d.lang, d.source
      FROM lab l JOIN documents d USING (doc_id))
SELECT group_id, CAST(MIN(doc_id) AS BIGINT) AS canonical_doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
FROM m GROUP BY group_id
"""


GEO_QUERIES.update({"dedup_merge_fields": q_dedup_merge_fields})
EXTRA_ORACLE_SQL["dedup_merge_fields"] = _MERGE_FIELDS_SQL


# --------------------------------------------------------- bbox overlap area


def q_bbox_overlap_area(sf_dir: str):
    """Spatial join with a COMPUTED measure: per ring, the summed
    exact intersection-rectangle area (e10 ints) against the 64
    deterministic query boxes, plus the positive-overlap count.  Same
    broadcast-small shape as `geo_bbox_join`, but the pair predicate
    and measure run entirely in the integer domain (floor-e5 bounds;
    box coords are dyadic-exact, so both engines floor identically)."""
    simple = _simple_rings_cached(sf_dir)
    _persist(simple.map_batches(_verts_batch, batch_format="pyarrow"), "bboxa_verts")
    _bid, blon0, blat0, blon1, blat1 = _query_boxes()
    bx0 = np.floor(blon0 * 1e5).astype(np.int64)
    by0 = np.floor(blat0 * 1e5).astype(np.int64)
    bx1 = np.floor(blon1 * 1e5).astype(np.int64)
    by1 = np.floor(blat1 * 1e5).astype(np.int64)

    def join(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.table(
                {
                    "geom_id": pa.array([], pa.string()),
                    "ring_seq": pa.array([], pa.int32()),
                    "n_boxes": pa.array([], pa.int64()),
                    "overlap_area_e10": pa.array([], pa.int64()),
                }
            )
        col = t["ring"].combine_chunks()
        offs = np.asarray(col.offsets).astype(np.int64)
        coords = np.asarray(col.values.values, dtype=np.float64).reshape(-1, 2)
        starts = offs[:-1]
        gx0 = np.floor(np.minimum.reduceat(coords[:, 0], starts) * 1e5).astype(np.int64)
        gx1 = np.floor(np.maximum.reduceat(coords[:, 0], starts) * 1e5).astype(np.int64)
        gy0 = np.floor(np.minimum.reduceat(coords[:, 1], starts) * 1e5).astype(np.int64)
        gy1 = np.floor(np.maximum.reduceat(coords[:, 1], starts) * 1e5).astype(np.int64)
        w = np.minimum(gx1[:, None], bx1[None, :]) - np.maximum(gx0[:, None], bx0[None, :])
        h = np.minimum(gy1[:, None], by1[None, :]) - np.maximum(gy0[:, None], by0[None, :])
        pos = (w > 0) & (h > 0)
        area = np.where(pos, w * h, 0)
        return pa.table(
            {
                "geom_id": t["geom_id"],
                "ring_seq": t["ring_seq"],
                "n_boxes": pa.array(pos.sum(axis=1).astype(np.int64)),
                "overlap_area_e10": pa.array(area.sum(axis=1).astype(np.int64)),
            }
        )

    return simple.map_batches(join, batch_format="pyarrow")


_BBOX_AREA_SQL = f"""
WITH v AS (SELECT geom_id, ring_seq,
                  CAST(floor(min(x) * 100000.0) AS BIGINT) AS gx0,
                  CAST(floor(max(x) * 100000.0) AS BIGINT) AS gx1,
                  CAST(floor(min(y) * 100000.0) AS BIGINT) AS gy0,
                  CAST(floor(max(y) * 100000.0) AS BIGINT) AS gy1
           FROM read_parquet('{_ORACLE_DIR}/bboxa_verts/*.parquet')
           GROUP BY geom_id, ring_seq),
b AS (SELECT CAST(floor((-180.0 + (i % 8) * 45.0 + (i % 7)) * 100000.0) AS BIGINT) AS bx0,
             CAST(floor((-90.0 + (i // 8) * 22.5 + (i % 5)) * 100000.0) AS BIGINT) AS by0,
             CAST(floor((-180.0 + (i % 8) * 45.0 + (i % 7) + 20.0 + (i % 11)) * 100000.0) AS BIGINT) AS bx1,
             CAST(floor((-90.0 + (i // 8) * 22.5 + (i % 5) + 10.0 + (i % 3)) * 100000.0) AS BIGINT) AS by1
      FROM (SELECT unnest(generate_series(0, 63)) AS i)),
p AS (SELECT v.geom_id, v.ring_seq,
             least(v.gx1, b.bx1) - greatest(v.gx0, b.bx0) AS w,
             least(v.gy1, b.by1) - greatest(v.gy0, b.by0) AS h
      FROM v CROSS JOIN b)
SELECT geom_id, ring_seq,
       CAST(SUM(CASE WHEN w > 0 AND h > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_boxes,
       CAST(SUM(CASE WHEN w > 0 AND h > 0 THEN w * h ELSE 0 END) AS BIGINT)
         AS overlap_area_e10
FROM p GROUP BY geom_id, ring_seq
"""


GEO_QUERIES.update({"bbox_overlap_area": q_bbox_overlap_area})
EXTRA_ORACLE_SQL["bbox_overlap_area"] = _BBOX_AREA_SQL


# ------------------------------------------------------ incremental HLL merge


def q_hll_incremental_merge(sf_dir: str):
    """Incremental-computation demonstration: the corpus splits into a
    'base' batch (event_id % 10 < 8) and an 'increment' (the rest);
    each builds its own HLL sketch INDEPENDENTLY and the driver merges
    registers (register max is associative/commutative/idempotent), so
    the merged estimate is BIT-IDENTICAL to a from-scratch build —
    which is exactly what the oracle computes (the full-corpus SQL HLL
    replay).  This is the mergeable-state contract a streaming
    pipeline needs: update without recompute."""
    import ray.data as rd

    from ..relational.sketches import HyperLogLog, _hash64

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id"])

    def sketch_split(batch: pd.DataFrame) -> pd.DataFrame:
        m = (batch["event_id"].to_numpy(np.int64) % 10) < 8
        uid = batch["user_id"].to_numpy(np.int64)
        out = []
        for name, sel in (("base", m), ("inc", ~m), ("full", np.ones(len(m), bool))):
            h = HyperLogLog(12)
            h.add_hashed(_hash64(uid[sel]))
            out.append((name, h.to_bytes()))
        return pd.DataFrame(
            {"split": [o[0] for o in out], "sketch": [o[1] for o in out]}
        )

    parts = ev.map_batches(sketch_split, batch_format="pandas").to_pandas()
    acc = {
        "base": HyperLogLog(12),
        "inc": HyperLogLog(12),
        "full": HyperLogLog(12),
    }
    for _, row in parts.iterrows():
        acc[row["split"]] = acc[row["split"]].merge(
            HyperLogLog.from_bytes(row["sketch"], 12)
        )
    merged = acc["base"].merge(acc["inc"])
    # incremental merge MUST equal the from-scratch unsplit build
    assert merged.to_bytes() == acc["full"].to_bytes()
    return pd.DataFrame({"merged_estimate": [float(round(merged.estimate(), 1))]})


_HLL_MERGE_SQL = (
    "SELECT approx_distinct_users AS merged_estimate FROM ("
    + _hll_sql(p=12)
    + ")"
)


GEO_QUERIES.update({"hll_incremental_merge": q_hll_incremental_merge})
EXTRA_ORACLE_SQL["hll_incremental_merge"] = _HLL_MERGE_SQL


# ------------------------------------------------------- cover adjacency


def q_cover_adjacency_counts(sf_dir: str):
    """Raster morphology over the covered-cell set: for every DISTINCT
    covered cell, how many of its 8 grid neighbors are also covered
    (8 = interior, <8 = boundary of the coverage mask).  One-shuffle
    design: each distinct cell emits a claim row at each neighbor plus
    a self-marker; the groupby counts claims only where the marker
    proves the cell is covered.  SQL replays the neighbor arithmetic
    by unpacking the (level<<58 | i<<29 | j) id with bit ops."""
    import ray.data as rd
    from ray.data.aggregate import Sum as _Sum

    cover_dir = _persist(q_geo_cover(sf_dir), "adj_cover")
    cover = rd.read_parquet(cover_dir, columns=["cell_id"])
    # GLOBAL distinct first: post-groupby blocks hold disjoint keys, so
    # each covered cell emits its claim fan exactly once
    from ray.data.aggregate import Count as _Count

    distinct = (
        cover.map_batches(
            lambda t: pa.table({"cell_id": t["cell_id"].unique()}),
            batch_format="pyarrow",
        )
        .groupby("cell_id")
        .aggregate(_Count(alias_name="_c"))
    )

    def emit(t: pa.Table) -> pa.Table:
        c = (
            t["cell_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ).astype(np.uint64)
        lvl = (c >> np.uint64(58)).astype(np.int64)
        i = ((c >> np.uint64(29)) & np.uint64((1 << 29) - 1)).astype(np.int64)
        j = (c & np.uint64((1 << 29) - 1)).astype(np.int64)
        n = 1 << int(lvl[0]) if len(lvl) else 2
        rows_c, rows_claim, rows_self = [], [], []
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                if di == 0 and dj == 0:
                    continue
                ni, nj = i + di, j + dj
                ok = (ni >= 0) & (ni < n) & (nj >= 0) & (nj < n)
                nid = (
                    (lvl[ok].astype(np.uint64) << np.uint64(58))
                    | (ni[ok].astype(np.uint64) << np.uint64(29))
                    | nj[ok].astype(np.uint64)
                ).astype(np.int64)
                rows_c.append(nid)
                rows_claim.append(np.ones(len(nid), np.int64))
                rows_self.append(np.zeros(len(nid), np.int64))
        rows_c.append(c.astype(np.int64))
        rows_claim.append(np.zeros(len(c), np.int64))
        rows_self.append(np.ones(len(c), np.int64))
        return pa.table(
            {
                "cell_id": pa.array(np.concatenate(rows_c)),
                "n_claims": pa.array(np.concatenate(rows_claim)),
                "is_covered": pa.array(np.concatenate(rows_self)),
            }
        )

    agg = (
        distinct.map_batches(emit, batch_format="pyarrow")
        .groupby("cell_id")
        .aggregate(
            _Sum("n_claims", alias_name="n_neighbors"),
            _Sum("is_covered", alias_name="cov"),
        )
    )

    def keep_covered(t: pa.Table) -> pa.Table:
        m = t["cov"].to_numpy(zero_copy_only=False) > 0
        sub = t.filter(pa.array(m))
        return pa.table(
            {"cell_id": sub["cell_id"], "n_neighbors": sub["n_neighbors"]}
        )

    return agg.map_batches(keep_covered, batch_format="pyarrow")


_ADJ_SQL = f"""
WITH c AS (SELECT DISTINCT cell_id
           FROM read_parquet('{_ORACLE_DIR}/adj_cover/*.parquet')),
u AS (SELECT cell_id,
             cell_id >> 58 AS lvl,
             (cell_id >> 29) & 536870911 AS i,
             cell_id & 536870911 AS j
      FROM c),
nb AS (SELECT a.cell_id,
              SUM(CASE WHEN b.cell_id IS NOT NULL THEN 1 ELSE 0 END) AS nn
       FROM u a
       CROSS JOIN (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),(1,-1),(1,0),(1,1))
         AS d(di, dj)
       LEFT JOIN u b ON b.i = a.i + d.di AND b.j = a.j + d.dj
                    AND b.lvl = a.lvl
       GROUP BY a.cell_id)
SELECT cell_id, CAST(nn AS BIGINT) AS n_neighbors FROM nb
"""


GEO_QUERIES.update({"cover_adjacency_counts": q_cover_adjacency_counts})
EXTRA_ORACLE_SQL["cover_adjacency_counts"] = _ADJ_SQL


# ----------------------------------------------------- curation endstate

_CURATION_SQL = f"""
SELECT 'raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
UNION ALL
SELECT 'exact_dedup', CAST(COUNT(*) AS BIGINT), CAST(SUM(n_chars) AS BIGINT)
FROM (SELECT MIN(doc_id) AS d, MIN(n_chars) AS n_chars
      FROM documents GROUP BY text)
UNION ALL
SELECT 'near_dedup', CAST(COUNT(*) AS BIGINT), CAST(SUM(n_chars) AS BIGINT)
FROM (SELECT MIN(doc_id) AS d, MIN(n_chars) AS n_chars
      FROM documents GROUP BY text) ex
WHERE ex.d NOT IN (
  SELECT g.doc_id FROM ({_NEAR_DUP_GROUPS_SQL}) g
  WHERE g.doc_id NOT IN (
    SELECT keep_doc_id FROM ({_DEDUP_KEEP_BEST_SQL})))
"""

from ..relational.queries import (  # noqa: E402
    q_curation_endstate as _q_curation_endstate,
    q_quality_filter_pipeline as _q_quality_filter,
    _SQL_QUALITY_FILTER as _QF_SQL,
)

GEO_QUERIES.update(
    {
        "curation_endstate": _q_curation_endstate,
        "quality_filter_pipeline": _q_quality_filter,
    }
)
EXTRA_ORACLE_SQL["curation_endstate"] = _CURATION_SQL
EXTRA_ORACLE_SQL["quality_filter_pipeline"] = _QF_SQL


# ------------------------------------------------------- cover blobs (CC)


def q_cover_blob_components(sf_dir: str):
    """Raster connected components over the covered-cell mask
    (4-connectivity): blob id = the smallest cell id in each blob,
    with its cell count — the mask-segmentation counterpart of the
    document near-dup groups, reusing the SAME hash-to-min CC engine
    on a different graph.  Edges build with the claims shuffle (each
    distinct cell claims its right/up neighbor; a claim becomes an
    edge only where the neighbor's self-marker proves coverage);
    singleton cells (no covered neighbor) emit size-1 blobs."""
    import ray.data as rd
    from ray.data.aggregate import Count as _Count, Sum as _Sum

    from ..relational.queries import _bucket_groupby
    from ..text.dedup import connected_components

    cover_dir = _persist(q_geo_cover(sf_dir), "blob_cover")
    cover = rd.read_parquet(cover_dir, columns=["cell_id"])
    distinct = (
        cover.map_batches(
            lambda t: pa.table({"cell_id": t["cell_id"].unique()}),
            batch_format="pyarrow",
        )
        .groupby("cell_id")
        .aggregate(_Count(alias_name="_c"))
        .materialize()
    )

    def emit(t: pa.Table) -> pa.Table:
        c = t["cell_id"].to_numpy(zero_copy_only=False).astype(np.int64).astype(np.uint64)
        lvl = (c >> np.uint64(58)).astype(np.int64)
        i = ((c >> np.uint64(29)) & np.uint64((1 << 29) - 1)).astype(np.int64)
        j = (c & np.uint64((1 << 29) - 1)).astype(np.int64)
        n = 1 << int(lvl[0]) if len(lvl) else 2
        tgt, src, selfm = [], [], []
        for di, dj in ((1, 0), (0, 1)):
            ni, nj = i + di, j + dj
            ok = (ni < n) & (nj < n)
            nid = (
                (lvl[ok].astype(np.uint64) << np.uint64(58))
                | (ni[ok].astype(np.uint64) << np.uint64(29))
                | nj[ok].astype(np.uint64)
            ).astype(np.int64)
            tgt.append(nid)
            src.append(c[ok].astype(np.int64))
            selfm.append(np.zeros(len(nid), np.int64))
        tgt.append(c.astype(np.int64))
        src.append(np.full(len(c), -1, np.int64))
        selfm.append(np.ones(len(c), np.int64))
        return pa.table(
            {
                "cell_id": pa.array(np.concatenate(tgt)),
                "src": pa.array(np.concatenate(src)),
                "is_self": pa.array(np.concatenate(selfm)),
            }
        )

    def to_edges(g: pd.DataFrame) -> pd.DataFrame:
        cid = g["cell_id"].to_numpy(np.int64)
        src = g["src"].to_numpy(np.int64)
        selfm = g["is_self"].to_numpy(np.int64)
        covered = np.unique(cid[selfm == 1])
        m = (selfm == 0) & np.isin(cid, covered)
        a = np.minimum(src[m], cid[m])
        b = np.maximum(src[m], cid[m])
        return pd.DataFrame({"doc_a": a, "doc_b": b})

    edges = _bucket_groupby(
        distinct.map_batches(emit, batch_format="pyarrow"), "cell_id", to_edges
    ).materialize()
    labs = connected_components(edges).to_pandas()
    blob = labs.groupby("group_id").size().rename("n_cells").reset_index()
    labeled = np.sort(labs["doc_id"].to_numpy(np.int64))
    allc = distinct.to_pandas()["cell_id"].to_numpy(np.int64)
    singles = np.setdiff1d(allc, labeled)
    out = pd.concat(
        [
            pd.DataFrame(
                {
                    "blob_id": blob["group_id"].to_numpy(np.int64),
                    "n_cells": blob["n_cells"].to_numpy(np.int64),
                }
            ),
            pd.DataFrame(
                {"blob_id": singles, "n_cells": np.ones(len(singles), np.int64)}
            ),
        ],
        ignore_index=True,
    )
    return out.sort_values("blob_id").reset_index(drop=True)


_BLOB_SQL = f"""
WITH RECURSIVE c AS (SELECT DISTINCT cell_id
           FROM read_parquet('{_ORACLE_DIR}/blob_cover/*.parquet')),
u AS (SELECT cell_id, cell_id >> 58 AS lvl,
             (cell_id >> 29) & 536870911 AS i, cell_id & 536870911 AS j
      FROM c),
e0 AS (SELECT a.cell_id AS x, b.cell_id AS y
       FROM u a JOIN u b ON b.lvl = a.lvl
        AND ((b.i = a.i + 1 AND b.j = a.j) OR (b.i = a.i AND b.j = a.j + 1))),
edges AS MATERIALIZED (
  SELECT x AS a, y AS b FROM e0 UNION SELECT y, x FROM e0),
reach(v, l) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges) n
  UNION
  SELECT e.b, r.l FROM reach r JOIN edges e ON e.a = r.v),
lab AS (SELECT v AS cell_id, MIN(l) AS group_id FROM reach GROUP BY v),
blobs AS (SELECT group_id AS blob_id, CAST(COUNT(*) AS BIGINT) AS n_cells
          FROM lab GROUP BY group_id),
singles AS (SELECT cell_id AS blob_id, CAST(1 AS BIGINT) AS n_cells
            FROM c WHERE cell_id NOT IN (SELECT cell_id FROM lab))
SELECT blob_id, n_cells FROM blobs
UNION ALL
SELECT blob_id, n_cells FROM singles
"""


GEO_QUERIES.update({"cover_blob_components": q_cover_blob_components})
EXTRA_ORACLE_SQL["cover_blob_components"] = _BLOB_SQL


# ------------------------------------------------- eval + dedup diagnostics


def q_langid_confusion(sf_dir: str):
    """Model-eval confusion matrix: the langid heuristic's prediction
    against the table's lang tag, counted per (truth, prediction)
    pair — the evaluation-harness shape every classifier stage needs.
    One pandas batch pass (the langid kernel is vectorized RE2), tiny
    (langs × langs) exchange."""
    import ray.data as rd
    from ray.data.aggregate import Sum as _Sum

    from ..text.ops import langid_batch

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    def conf(b: pd.DataFrame) -> pd.DataFrame:
        pred = langid_batch(b)["lang_pred"]
        g = (
            pd.DataFrame({"lang": b["lang"], "lang_pred": pred})
            .groupby(["lang", "lang_pred"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        return g.astype({"n": np.int64})

    return (
        docs.map_batches(conf, batch_format="pandas")
        .groupby(["lang", "lang_pred"])
        .aggregate(_Sum("n", alias_name="n"))
    )


_LANGID_CONFUSION_SQL = (
    "WITH p AS (" + "\n".join(_langid_sql().splitlines()) + ")\n"
    "SELECT d.lang, p.lang_pred, CAST(COUNT(*) AS BIGINT) AS n\n"
    "FROM p JOIN documents d USING (doc_id)\n"
    "GROUP BY d.lang, p.lang_pred"
)


def q_dup_group_size_hist(sf_dir: str):
    """Near-dup cluster-size distribution: how many groups have 2, 3,
    … members — the shape a dedup run reports to show duplication
    structure.  Bounded by the near-dup graph."""
    from ..text.dedup import connected_components

    labs = connected_components(_minhash_pairs_cached(sf_dir)).to_pandas()
    sizes = labs.groupby("group_id").size().to_numpy()
    u, c = np.unique(sizes, return_counts=True)
    return pd.DataFrame(
        {
            "group_size": u.astype(np.int64),
            "n_groups": c.astype(np.int64),
        }
    )


_DUP_SIZE_SQL = f"""
WITH g AS (SELECT DISTINCT group_id, group_size
           FROM ({_NEAR_DUP_GROUPS_SQL}))
SELECT CAST(group_size AS BIGINT) AS group_size,
       CAST(COUNT(*) AS BIGINT) AS n_groups
FROM g GROUP BY group_size
"""


GEO_QUERIES.update(
    {
        "langid_confusion": q_langid_confusion,
        "dup_group_size_hist": q_dup_group_size_hist,
    }
)
EXTRA_ORACLE_SQL["langid_confusion"] = _LANGID_CONFUSION_SQL
EXTRA_ORACLE_SQL["dup_group_size_hist"] = _DUP_SIZE_SQL


# ------------------------------------------------------ tile occupancy hist


def q_tile_occupancy_hist(sf_dir: str):
    """Tile occupancy distribution: how many tiles hold exactly k
    clipped rings — the layout diagnostic that sizes tile-serving
    shards.  Rides the proven tile-assignment pipeline; the two
    count folds are bounded by the tile domain."""
    simple = _simple_rings_cached(sf_dir)
    _persist(simple.map_batches(_verts_batch, batch_format="pyarrow"), "tileocc_verts")
    tiles = tile_assign_dataset(simple, zoom=8)

    def per_tile(t: pa.Table) -> pa.Table:
        x = t["tile_x"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t["tile_y"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = x * 1_000_000 + y
        u, c = np.unique(key, return_counts=True)
        return pa.table(
            {"tkey": pa.array(u), "k": pa.array(c.astype(np.int64))}
        )

    from ray.data.aggregate import Sum as _Sum

    per = (
        tiles.map_batches(per_tile, batch_format="pyarrow")
        .groupby("tkey")
        .aggregate(_Sum("k", alias_name="k"))
    )

    def hist(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(k, return_counts=True)
        return pa.table(
            {
                "rings_in_tile": pa.array(u),
                "n_tiles": pa.array(c.astype(np.int64)),
            }
        )

    return (
        per.map_batches(hist, batch_format="pyarrow")
        .groupby("rings_in_tile")
        .aggregate(_Sum("n_tiles", alias_name="n_tiles"))
    )


_TILE_OCC_SQL = f"""
WITH t AS ({_tile_sql(f"{_ORACLE_DIR}/tileocc_verts", level=8)}),
per AS (SELECT tile_x, tile_y, COUNT(*) AS k FROM t GROUP BY tile_x, tile_y)
SELECT CAST(k AS BIGINT) AS rings_in_tile,
       CAST(COUNT(*) AS BIGINT) AS n_tiles
FROM per GROUP BY k
"""


GEO_QUERIES.update({"tile_occupancy_hist": q_tile_occupancy_hist})
EXTRA_ORACLE_SQL["tile_occupancy_hist"] = _TILE_OCC_SQL


# ------------------------------------------------- containment depth + recall


def q_pip_depth_hist(sf_dir: str):
    """Containment-depth distribution: for every probe point matched
    by the PIP join, how many rings contain it — then the histogram
    depth → point count (depth ≥ 2 flags nested/overlapping
    geometry).  Rides the broadcast PIP join; both folds are
    bounded."""
    import ray.data as rd
    from ray.data.aggregate import Sum as _Sum

    n_polys, n_images = scale_counts(sf_dir)
    simple = _simple_rings_cached(sf_dir)
    _persist(simple.map_batches(_edges_batch, batch_format="pyarrow"), "pipd_edges")
    pts_dir = _persist(gen_points(n_images), "pipd_points")
    joined = pip_join_broadcast(
        rd.read_parquet(pts_dir), simple, level=DEFAULT_LEVEL
    ).select_columns(["image_id"])

    def per_point(t: pa.Table) -> pa.Table:
        ids = t["image_id"].to_numpy(zero_copy_only=False)  # string ids
        u, c = np.unique(ids, return_counts=True)
        return pa.table(
            {"image_id": pa.array(u, type=pa.string()),
             "depth": pa.array(c.astype(np.int64))}
        )

    per = (
        joined.map_batches(per_point, batch_format="pyarrow")
        .groupby("image_id")
        .aggregate(_Sum("depth", alias_name="depth"))
    )

    def hist(t: pa.Table) -> pa.Table:
        d = t["depth"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(d, return_counts=True)
        return pa.table(
            {"depth": pa.array(u), "n_points": pa.array(c.astype(np.int64))}
        )

    return (
        per.map_batches(hist, batch_format="pyarrow")
        .groupby("depth")
        .aggregate(_Sum("n_points", alias_name="n_points"))
    )


_PIP_DEPTH_SQL = (
    "WITH m AS ("
    + _pip_sql(f"{_ORACLE_DIR}/pipd_points", f"{_ORACLE_DIR}/pipd_edges")
    + "),\n"
    "d AS (SELECT image_id, CAST(COUNT(*) AS BIGINT) AS depth\n"
    "      FROM m GROUP BY image_id)\n"
    "SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_points\n"
    "FROM d GROUP BY depth"
)


def q_ann_ivf_recall(sf_dir: str):
    """ANN quality evaluation: recall@10 pieces of the IVF path
    against the exact brute-force ranking — |top-10 ∩ top-10| as an
    exact integer (the metric an ANN rollout gates on).  Composes the
    two already-oracled ANN paths; the IVF run persists its
    assignment so the SQL replays BOTH rankings and intersects."""
    brute = q_ann_brute(sf_dir)
    ivf = q_ann_ivf(sf_dir)  # persists ivf_assign for the oracle
    b = brute.to_pandas() if hasattr(brute, "to_pandas") else brute
    v = ivf.to_pandas() if hasattr(ivf, "to_pandas") else ivf
    common = np.intersect1d(
        b["vec_id"].to_numpy(np.int64), v["vec_id"].to_numpy(np.int64)
    )
    return pd.DataFrame({"k": [10], "n_common": [len(common)]}).astype(np.int64)


_ANN_RECALL_SQL = (
    "SELECT CAST(10 AS BIGINT) AS k, CAST(COUNT(*) AS BIGINT) AS n_common\n"
    "FROM (" + _ann_sql(10) + ") b JOIN (" + _ann_ivf_sql(10) + ") v USING (vec_id)"
)


GEO_QUERIES.update(
    {
        "pip_depth_hist": q_pip_depth_hist,
        "ann_ivf_recall": q_ann_ivf_recall,
    }
)
EXTRA_ORACLE_SQL["pip_depth_hist"] = _PIP_DEPTH_SQL
EXTRA_ORACLE_SQL["ann_ivf_recall"] = _ANN_RECALL_SQL


# ------------------------------------------------ radius self-join (grid hash)


def q_radius_neighbor_hist(sf_dir: str):
    """Spatial self-join by grid hash: per-point neighbor count within
    integer radius R = 4000 e4-fixed-point units (~0.4°), then the
    histogram n_nb → n_points — the DBSCAN core/border/noise
    primitive. Each point replicates to its 3×3 neighbor cells (cell
    size 2^13 = 8192 ≥ R, so every true neighbor is provably in the
    home cell's group); cells shuffle by hash bucket and pairs verify
    with exact int64 squared distance — the exchange is 9× the point
    table, never all-pairs. The SQL oracle recomputes the join
    INDEPENDENTLY (range self-join on the persisted points), so this
    cross-checks the grid indexer end to end."""
    import ray.data as rd
    from ray.data.aggregate import Sum as _Sum

    from ..cells.grid import _rl_arange
    from ..relational.queries import _bucket_groupby

    R = 4000
    SHIFT = 13
    _, n_images = scale_counts(sf_dir)
    pts_dir = _persist(gen_points(n_images), "radius_pts")
    pts = rd.read_parquet(pts_dir)

    def replicate(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        ix = np.floor(lon * 10000.0).astype(np.int64)
        iy = np.floor(lat * 10000.0).astype(np.int64)
        pid = (
            pc.cast(pc.utf8_slice_codeunits(t["image_id"], 3, 15), pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        cx, cy = ix >> SHIFT, iy >> SHIFT
        outs = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                outs.append(
                    pa.table(
                        {
                            "cellkey": pa.array((cx + dx) * 100_000 + (cy + dy)),
                            "pid": pa.array(pid),
                            "ix": pa.array(ix),
                            "iy": pa.array(iy),
                            "is_host": pa.array(
                                np.full(len(ix), dx == 0 and dy == 0)
                            ),
                        }
                    )
                )
        return pa.concat_tables(outs)

    rep = pts.map_batches(replicate, batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "n_nb": pd.Series([], dtype=np.int64),
                    "n_points": pd.Series([], dtype=np.int64),
                }
            )
        ck = g["cellkey"].to_numpy(np.int64)
        order = np.argsort(ck, kind="stable")
        ck_s = ck[order]
        ix_s = g["ix"].to_numpy(np.int64)[order]
        iy_s = g["iy"].to_numpy(np.int64)[order]
        pid_s = g["pid"].to_numpy(np.int64)[order]
        hidx = np.flatnonzero(g["is_host"].to_numpy(bool)[order])
        lo = np.searchsorted(ck_s, ck_s[hidx], side="left")
        hi = np.searchsorted(ck_s, ck_s[hidx], side="right")
        lens = hi - lo
        cand = _rl_arange(lo, lens)  # segmented cross product, vectorized
        hrep = np.repeat(np.arange(len(hidx), dtype=np.int64), lens)
        dx = ix_s[hidx][hrep] - ix_s[cand]
        dy = iy_s[hidx][hrep] - iy_s[cand]
        ok = (dx * dx + dy * dy <= R * R) & (pid_s[hidx][hrep] != pid_s[cand])
        nnb = np.bincount(hrep[ok], minlength=len(hidx)).astype(np.int64)
        u, c = np.unique(nnb, return_counts=True)
        return pd.DataFrame({"n_nb": u, "n_points": c.astype(np.int64)})

    return (
        _bucket_groupby(rep, "cellkey", per_bucket)
        .groupby("n_nb")
        .aggregate(_Sum("n_points", alias_name="n_points"))
    )


_RADIUS_NB_SQL = f"""
WITH p AS (SELECT image_id,
                  CAST(floor(lon * 10000) AS BIGINT) AS ix,
                  CAST(floor(lat * 10000) AS BIGINT) AS iy
           FROM read_parquet('{_ORACLE_DIR}/radius_pts/*.parquet')),
nb AS (SELECT a.image_id,
              CAST(COUNT(b.image_id) AS BIGINT) AS n_nb
       FROM p a LEFT JOIN p b
         ON b.ix BETWEEN a.ix - 4000 AND a.ix + 4000
        AND b.iy BETWEEN a.iy - 4000 AND a.iy + 4000
        AND b.image_id <> a.image_id
        AND (a.ix - b.ix) * (a.ix - b.ix) + (a.iy - b.iy) * (a.iy - b.iy)
            <= 16000000
       GROUP BY a.image_id)
SELECT n_nb, CAST(COUNT(*) AS BIGINT) AS n_points FROM nb GROUP BY n_nb
"""


GEO_QUERIES.update({"radius_neighbor_hist": q_radius_neighbor_hist})
EXTRA_ORACLE_SQL["radius_neighbor_hist"] = _RADIUS_NB_SQL


# ---------------------------------------------- cell-prefilter precision audit


def q_cover_filter_precision(sf_dir: str):
    """Index-quality audit for the cell prefilter: per ring, how many
    probe points land in the ring's covered cells (candidates) versus
    how many pass the exact PIP refine (hits) — the false-positive
    rate a coarser cover level would trade against re-shuffle volume.
    The cover, the point→cell indexer and the PIP kernel are each
    independently oracled elsewhere (geo_cover, image_cell_density,
    geo_pip_join); this composes all three and cross-checks the counts
    end to end. Scale shape: the cover table is the same bounded
    artifact pip_join's compiled broadcast index ships; points stream
    once for candidates (searchsorted into the sorted cover cells +
    ring-bounded bincount partials) and once through the PIP join."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum as _Sum

    from ..cells.grid import _rl_arange, point_to_cell

    _, n_images = scale_counts(sf_dir)
    simple = _simple_rings_cached(sf_dir)
    _persist(simple.map_batches(_edges_batch, batch_format="pyarrow"), "prec_edges")
    pts_dir = _persist(gen_points(n_images), "prec_points")
    cover_dir = _persist(
        cover_rings_dataset(simple, level=DEFAULT_LEVEL), "prec_cover"
    )

    cov_pd = rd.read_parquet(cover_dir).to_pandas()
    rkey = cov_pd["geom_id"].astype(str) + "\x00" + cov_pd["ring_seq"].astype(str)
    codes, _uniq = pd.factorize(rkey, sort=True)
    rings = (
        cov_pd.assign(_c=codes)[["_c", "geom_id", "ring_seq"]]
        .drop_duplicates("_c")
        .sort_values("_c")
        .reset_index(drop=True)
    )
    order = np.argsort(cov_pd["cell_id"].to_numpy(np.int64), kind="stable")
    cells_s = cov_pd["cell_id"].to_numpy(np.int64)[order]
    codes_s = codes[order]
    n_rings = len(rings)
    ref = ray.put((cells_s, codes_s, n_rings))

    def cand_partial(t: pa.Table) -> pa.Table:
        cs, rc, nr = ray.get(ref)
        # point_to_cell returns uint64; cast before searchsorted against
        # the int64 cover cells (mixed dtypes silently promote to
        # float64 and 2^61-scale ids collide)
        cell = point_to_cell(
            t["lon"].to_numpy(zero_copy_only=False),
            t["lat"].to_numpy(zero_copy_only=False),
            DEFAULT_LEVEL,
        ).astype(np.int64)
        lo = np.searchsorted(cs, cell, side="left")
        hi = np.searchsorted(cs, cell, side="right")
        lens = hi - lo
        nzm = lens > 0  # _rl_arange requires positive run lengths
        touch = _rl_arange(lo[nzm], lens[nzm])
        cnt = np.bincount(rc[touch], minlength=nr).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table({"_c": pa.array(nz), "n_cand": pa.array(cnt[nz])})

    cand = (
        rd.read_parquet(pts_dir)
        .map_batches(cand_partial, batch_format="pyarrow")
        .groupby("_c")
        .aggregate(_Sum("n_cand", alias_name="n_cand"))
        .to_pandas()  # ring-bounded
    )

    hits = (
        pip_join_broadcast(rd.read_parquet(pts_dir), simple, level=DEFAULT_LEVEL)
        .select_columns(["geom_id", "ring_seq"])
        .map_batches(
            lambda t: (
                lambda g: pa.table(
                    {
                        "geom_id": g["geom_id"],
                        "ring_seq": g["ring_seq"],
                        "n_hit": g["count_all"],
                    }
                )
            )(t.group_by(["geom_id", "ring_seq"]).aggregate([([], "count_all")])),
            batch_format="pyarrow",
        )
        .groupby(["geom_id", "ring_seq"])
        .aggregate(_Sum("n_hit", alias_name="n_hit"))
        .to_pandas()  # ring-bounded
    )

    out = rings.merge(cand, on="_c", how="left").merge(
        hits, on=["geom_id", "ring_seq"], how="left"
    )
    out["n_cand"] = out["n_cand"].fillna(0).astype(np.int64)
    out["n_hit"] = out["n_hit"].fillna(0).astype(np.int64)
    out["ring_seq"] = out["ring_seq"].astype(np.int64)
    return out[["geom_id", "ring_seq", "n_cand", "n_hit"]].reset_index(drop=True)


_PREC_SQL = (
    f"""
WITH pts AS (SELECT image_id, lon, lat
             FROM read_parquet('{_ORACLE_DIR}/prec_points/*.parquet')),
pcell AS (SELECT image_id,
           (CAST({DEFAULT_LEVEL} AS BIGINT) << 58)
           | (CAST(least(greatest(trunc((lon + 180.0) / 360.0 * {1 << DEFAULT_LEVEL}), 0), {(1 << DEFAULT_LEVEL) - 1}) AS BIGINT) << 29)
           | CAST(least(greatest(trunc((lat + 90.0) / 180.0 * {1 << DEFAULT_LEVEL}), 0), {(1 << DEFAULT_LEVEL) - 1}) AS BIGINT) AS cell_id
          FROM pts),
cov AS (SELECT geom_id, ring_seq, cell_id
        FROM read_parquet('{_ORACLE_DIR}/prec_cover/*.parquet')),
cand AS (SELECT c.geom_id, c.ring_seq,
                CAST(COUNT(p.image_id) AS BIGINT) AS n_cand
         FROM cov c LEFT JOIN pcell p ON p.cell_id = c.cell_id
         GROUP BY c.geom_id, c.ring_seq),
m AS ("""
    + _pip_sql(f"{_ORACLE_DIR}/prec_points", f"{_ORACLE_DIR}/prec_edges")
    + """),
hit AS (SELECT geom_id, ring_seq, CAST(COUNT(*) AS BIGINT) AS n_hit
        FROM m GROUP BY geom_id, ring_seq)
SELECT c.geom_id, CAST(c.ring_seq AS BIGINT) AS ring_seq, c.n_cand,
       COALESCE(h.n_hit, 0) AS n_hit
FROM cand c LEFT JOIN hit h
  ON h.geom_id = c.geom_id AND h.ring_seq = c.ring_seq
"""
)


GEO_QUERIES.update({"cover_filter_precision": q_cover_filter_precision})
EXTRA_ORACLE_SQL["cover_filter_precision"] = _PREC_SQL


# ------------------------------------------------- ring-overlap IoU (cell set)


def q_cover_overlap_pairs(sf_dir: str):
    """Polygon-pair overlap candidates through the cell index: every
    ring pair sharing ≥1 level-8 cover cell, with the shared-cell
    count and the integer cover-IoU floor(shared·1e6 / (|A|+|B|−
    shared)) — the spatial similarity self-join (dedup / conflation
    candidate generation). Scale shape: cells shuffle once by hash
    bucket and pairs are emitted per cell segment (the minhash band
    pattern — never all ring pairs); per-ring cover sizes are a
    ring-bounded broadcast. Pair order (a < b) is the (geom_id,
    ring_seq) tuple order on both engines."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum as _Sum

    from ..relational.queries import _bucket_groupby
    from ..text.dedup import _pairs_in_runs

    simple = _simple_rings_cached(sf_dir)
    cover_dir = _persist(
        cover_rings_dataset(simple, level=DEFAULT_LEVEL), "ovl_cover"
    )
    cov = rd.read_parquet(cover_dir)

    # ring-bounded artifacts: code table in tuple order + cover sizes
    sz = (
        cov.map_batches(
            lambda t: (
                lambda g: pa.table(
                    {
                        "geom_id": g["geom_id"],
                        "ring_seq": g["ring_seq"],
                        "n": g["count_all"],
                    }
                )
            )(t.group_by(["geom_id", "ring_seq"]).aggregate([([], "count_all")])),
            batch_format="pyarrow",
        )
        .groupby(["geom_id", "ring_seq"])
        .aggregate(_Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["geom_id", "ring_seq"], kind="mergesort")
        .reset_index(drop=True)
    )
    key = pd.Index(sz["geom_id"] + "\x00" + sz["ring_seq"].astype(str))
    sizes = sz["n"].to_numpy(np.int64)
    ref = ray.put(key)

    def code_batch(t: pa.Table) -> pa.Table:
        k = ray.get(ref)
        rk = (
            pd.Series(t["geom_id"].to_pylist())
            + "\x00"
            + pd.Series(t["ring_seq"].to_pylist()).astype(str)
        )
        return pa.table(
            {
                "cell_id": t["cell_id"],
                "code": pa.array(k.get_indexer(rk).astype(np.int64)),
            }
        )

    coded = cov.map_batches(code_batch, batch_format="pyarrow")

    def pairs_in_cells(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "a": pd.Series([], dtype=np.int64),
                    "b": pd.Series([], dtype=np.int64),
                    "shared": pd.Series([], dtype=np.int64),
                }
            )
        c = g["cell_id"].to_numpy(np.int64)
        r = g["code"].to_numpy(np.int64)
        order = np.lexsort((r, c))
        c, r = c[order], r[order]
        new = np.r_[True, c[1:] != c[:-1]]
        a, b = _pairs_in_runs(new, r)  # run is code-ascending → a < b
        t = (
            pd.DataFrame({"a": a, "b": b})
            .groupby(["a", "b"], sort=False)
            .size()
            .rename("shared")
            .reset_index()
        )
        return t.astype(np.int64)

    agg = (
        _bucket_groupby(coded, "cell_id", pairs_in_cells)
        .groupby(["a", "b"])
        .aggregate(_Sum("shared", alias_name="shared"))
        .to_pandas()  # bounded by overlapping ring pairs
    )
    a = agg["a"].to_numpy(np.int64)
    b = agg["b"].to_numpy(np.int64)
    shared = agg["shared"].to_numpy(np.int64)
    iou = (shared * 1_000_000) // (sizes[a] + sizes[b] - shared)
    ga, ra = sz["geom_id"].to_numpy(object), sz["ring_seq"].to_numpy(np.int64)
    out = pd.DataFrame(
        {
            "geom_a": ga[a],
            "ring_a": ra[a],
            "geom_b": ga[b],
            "ring_b": ra[b],
            "n_shared": shared,
            "iou_e6": iou,
        }
    )
    return out.astype(
        {"ring_a": np.int64, "ring_b": np.int64, "n_shared": np.int64, "iou_e6": np.int64}
    ).reset_index(drop=True)


_OVL_SQL = f"""
WITH cov AS (SELECT geom_id, ring_seq, cell_id
             FROM read_parquet('{_ORACLE_DIR}/ovl_cover/*.parquet')),
sz AS (SELECT geom_id, ring_seq, CAST(COUNT(*) AS BIGINT) AS n
       FROM cov GROUP BY geom_id, ring_seq),
p AS (SELECT a.geom_id AS ga, a.ring_seq AS ra,
             b.geom_id AS gb, b.ring_seq AS rb,
             CAST(COUNT(*) AS BIGINT) AS shared
      FROM cov a JOIN cov b
        ON a.cell_id = b.cell_id
       AND (a.geom_id < b.geom_id
            OR (a.geom_id = b.geom_id AND a.ring_seq < b.ring_seq))
      GROUP BY 1, 2, 3, 4)
SELECT p.ga AS geom_a, CAST(p.ra AS BIGINT) AS ring_a,
       p.gb AS geom_b, CAST(p.rb AS BIGINT) AS ring_b,
       p.shared AS n_shared,
       CAST(p.shared * 1000000 // (sa.n + sb.n - p.shared) AS BIGINT) AS iou_e6
FROM p
JOIN sz sa ON sa.geom_id = p.ga AND sa.ring_seq = p.ra
JOIN sz sb ON sb.geom_id = p.gb AND sb.ring_seq = p.rb
"""


GEO_QUERIES.update({"cover_overlap_pairs": q_cover_overlap_pairs})
EXTRA_ORACLE_SQL["cover_overlap_pairs"] = _OVL_SQL


# ----------------------------------------- exact 1-NN distance distribution


def q_nn_dist_quantiles(sf_dir: str):
    """Exact nearest-neighbor distance distribution (the statistic a
    DBSCAN eps or an ANN radius is tuned from): per point the TRUE
    1-NN squared integer distance, then exact quartiles via the
    bounded-pull histogram resolver. Two-phase exact-NN: phase 1
    resolves each point against its 3×3 coarse-cell neighborhood
    (cell 2^15 e4-units) — a best candidate within one cell width is
    PROVABLY the global NN (any closer point must lie in the 3×3);
    the rare stragglers escalate to phase 2, a full scan with the
    straggler set broadcast and per-block min partials. The SQL
    oracle recomputes NN from the persisted points by brute force."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Min as _Min

    from ..cells.grid import _rl_arange
    from ..relational.queries import _bucket_groupby, _resolve_exact_quantiles

    import os

    # GRAFT_NN_SHIFT shrinks the phase-1 cell so tests can force the
    # straggler escalation path (same convention as the broadcast →
    # shuffle crossover caps)
    SHIFT = int(os.environ.get("GRAFT_NN_SHIFT", "15"))
    CELL = 1 << SHIFT
    _, n_images = scale_counts(sf_dir)
    pts_dir = _persist(gen_points(n_images), "nn_pts")
    pts = rd.read_parquet(pts_dir)

    def replicate(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        ix = np.floor(lon * 10000.0).astype(np.int64)
        iy = np.floor(lat * 10000.0).astype(np.int64)
        pid = (
            pc.cast(pc.utf8_slice_codeunits(t["image_id"], 3, 15), pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        cx, cy = ix >> SHIFT, iy >> SHIFT
        outs = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                outs.append(
                    pa.table(
                        {
                            "cellkey": pa.array((cx + dx) * 100_000 + (cy + dy)),
                            "pid": pa.array(pid),
                            "ix": pa.array(ix),
                            "iy": pa.array(iy),
                            "is_host": pa.array(
                                np.full(len(ix), dx == 0 and dy == 0)
                            ),
                        }
                    )
                )
        return pa.concat_tables(outs)

    def local_nn(g: pd.DataFrame) -> pd.DataFrame:
        cols = {
            "pid": np.int64,
            "ix": np.int64,
            "iy": np.int64,
            "v": np.int64,
            "resolved": np.int64,
        }
        if len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        ck = g["cellkey"].to_numpy(np.int64)
        order = np.argsort(ck, kind="stable")
        ck_s = ck[order]
        ix_s = g["ix"].to_numpy(np.int64)[order]
        iy_s = g["iy"].to_numpy(np.int64)[order]
        pid_s = g["pid"].to_numpy(np.int64)[order]
        hidx = np.flatnonzero(g["is_host"].to_numpy(bool)[order])
        lo = np.searchsorted(ck_s, ck_s[hidx], side="left")
        hi = np.searchsorted(ck_s, ck_s[hidx], side="right")
        lens = hi - lo
        cand = _rl_arange(lo, lens)  # every host sees ≥1 row (itself)
        hrep = np.repeat(np.arange(len(hidx), dtype=np.int64), lens)
        dx = ix_s[hidx][hrep] - ix_s[cand]
        dy = iy_s[hidx][hrep] - iy_s[cand]
        d2 = dx * dx + dy * dy
        d2[pid_s[hidx][hrep] == pid_s[cand]] = np.iinfo(np.int64).max  # self
        best = np.full(len(hidx), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(best, hrep, d2)
        resolved = (best <= np.int64(CELL) * np.int64(CELL)).astype(np.int64)
        return pd.DataFrame(
            {
                "pid": pid_s[hidx],
                "ix": ix_s[hidx],
                "iy": iy_s[hidx],
                "v": best,
                "resolved": resolved,
            }
        )

    phase1 = _bucket_groupby(
        pts.map_batches(replicate, batch_format="pyarrow"), "cellkey", local_nn
    ).materialize()

    res_vals = phase1.map_batches(
        lambda t: t.filter(
            pa.compute.equal(t["resolved"], 1)
        ).select(["v"]),
        batch_format="pyarrow",
    )

    stragglers = phase1.map_batches(
        lambda t: t.filter(pa.compute.equal(t["resolved"], 0)).select(
            ["pid", "ix", "iy"]
        ),
        batch_format="pyarrow",
    ).to_pandas()  # straggler-bounded (empty at normal densities)

    if len(stragglers):
        sref = ray.put(
            (
                stragglers["pid"].to_numpy(np.int64),
                stragglers["ix"].to_numpy(np.int64),
                stragglers["iy"].to_numpy(np.int64),
            )
        )

        def scan_min(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            spid, six, siy = ray.get(sref)
            lon = t["lon"].to_numpy(zero_copy_only=False)
            lat = t["lat"].to_numpy(zero_copy_only=False)
            ix = np.floor(lon * 10000.0).astype(np.int64)
            iy = np.floor(lat * 10000.0).astype(np.int64)
            pid = (
                pc.cast(pc.utf8_slice_codeunits(t["image_id"], 3, 15), pa.int64())
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            d2 = (six[:, None] - ix[None, :]) ** 2 + (siy[:, None] - iy[None, :]) ** 2
            d2[spid[:, None] == pid[None, :]] = np.iinfo(np.int64).max
            return pa.table(
                {"pid": pa.array(spid), "v": pa.array(d2.min(axis=1))}
            )

        phase2 = (
            pts.map_batches(scan_min, batch_format="pyarrow")
            .groupby("pid")
            .aggregate(_Min("v", alias_name="v"))
            .select_columns(["v"])
        )
        vals = res_vals.union(phase2)
    else:
        vals = res_vals

    resolved_q = _resolve_exact_quantiles(vals, [25, 50, 75], group_col=None)
    qv = {q: v for _g, q, v in resolved_q}
    n_total = vals.count()
    return pd.DataFrame(
        {
            "p25": [qv[25]],
            "p50": [qv[50]],
            "p75": [qv[75]],
            "n_points": [n_total],
        }
    ).astype(np.int64)


_NN_QUANT_SQL = f"""
WITH p AS (SELECT image_id,
                  CAST(floor(lon * 10000) AS BIGINT) AS ix,
                  CAST(floor(lat * 10000) AS BIGINT) AS iy
           FROM read_parquet('{_ORACLE_DIR}/nn_pts/*.parquet')),
nn AS (SELECT a.image_id,
              MIN((a.ix - b.ix) * (a.ix - b.ix)
                  + (a.iy - b.iy) * (a.iy - b.iy)) AS v
       FROM p a JOIN p b ON b.image_id <> a.image_id
       GROUP BY a.image_id),
r AS (SELECT v, row_number() OVER (ORDER BY v) AS rk FROM nn),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nn)
SELECT
  (SELECT MIN(v) FROM r, t WHERE 4 * rk >= 1 * t.n) AS p25,
  (SELECT MIN(v) FROM r, t WHERE 4 * rk >= 2 * t.n) AS p50,
  (SELECT MIN(v) FROM r, t WHERE 4 * rk >= 3 * t.n) AS p75,
  (SELECT n FROM t) AS n_points
"""


GEO_QUERIES.update({"nn_dist_quantiles": q_nn_dist_quantiles})
EXTRA_ORACLE_SQL["nn_dist_quantiles"] = _NN_QUANT_SQL


# ---------------------------------------------------------- DBSCAN (grid eps)


def q_dbscan_cluster_stats(sf_dir: str):
    """Full DBSCAN over the probe points (eps = 8000 e4-units ≈ 0.8°,
    minPts = 3), deterministic end to end: neighbor pairs come from
    the 3×3 grid-hash self-join, core points by out-degree, clusters
    as hash-to-min connected components over core-core edges (label =
    min point id — the same label rule as the dedup-group CC), border
    points to the MINIMUM cluster label among their core neighbors,
    and one pseudo-row (cluster −1, n_core 0) reporting the noise
    count in n_border. Scale shape: the pair list streams through one
    cell-bucketed shuffle; CC runs O(log d) bucket rounds on the
    bounded edge list; only core/border-bounded label tables touch
    the driver. SQL replays eps-join → degree → recursive-CTE closure
    independently."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Min as _Min

    from ..cells.grid import _rl_arange
    from ..relational.queries import _bucket_groupby, _partial_groupby
    from ..text.dedup import connected_components

    EPS = 8000
    SHIFT = 13
    MINPTS = 3
    _, n_images = scale_counts(sf_dir)
    pts_dir = _persist(gen_points(n_images), "dbscan_pts")
    pts = rd.read_parquet(pts_dir)

    def replicate(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        ix = np.floor(lon * 10000.0).astype(np.int64)
        iy = np.floor(lat * 10000.0).astype(np.int64)
        pid = (
            pc.cast(pc.utf8_slice_codeunits(t["image_id"], 3, 15), pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        cx, cy = ix >> SHIFT, iy >> SHIFT
        outs = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                outs.append(
                    pa.table(
                        {
                            "cellkey": pa.array((cx + dx) * 100_000 + (cy + dy)),
                            "pid": pa.array(pid),
                            "ix": pa.array(ix),
                            "iy": pa.array(iy),
                            "is_host": pa.array(
                                np.full(len(ix), dx == 0 and dy == 0)
                            ),
                        }
                    )
                )
        return pa.concat_tables(outs)

    def eps_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64)}
            )
        ck = g["cellkey"].to_numpy(np.int64)
        order = np.argsort(ck, kind="stable")
        ck_s = ck[order]
        ix_s = g["ix"].to_numpy(np.int64)[order]
        iy_s = g["iy"].to_numpy(np.int64)[order]
        pid_s = g["pid"].to_numpy(np.int64)[order]
        hidx = np.flatnonzero(g["is_host"].to_numpy(bool)[order])
        lo = np.searchsorted(ck_s, ck_s[hidx], side="left")
        hi = np.searchsorted(ck_s, ck_s[hidx], side="right")
        lens = hi - lo
        cand = _rl_arange(lo, lens)
        hrep = np.repeat(np.arange(len(hidx), dtype=np.int64), lens)
        dx = ix_s[hidx][hrep] - ix_s[cand]
        dy = iy_s[hidx][hrep] - iy_s[cand]
        ok = (dx * dx + dy * dy <= EPS * EPS) & (
            pid_s[hidx][hrep] != pid_s[cand]
        )
        return pd.DataFrame(
            {"a": pid_s[hidx][hrep[ok]], "b": pid_s[cand[ok]]}
        ).astype(np.int64)

    nb = _bucket_groupby(
        pts.map_batches(replicate, batch_format="pyarrow"), "cellkey", eps_pairs
    ).materialize()  # directed eps-neighbor pairs, bounded by the join output

    deg = (
        nb.map_batches(
            _partial_groupby(["a"], [("", "count", "n")]), batch_format="pyarrow"
        )
        .groupby("a")
        .aggregate(_Sum_agg("n"))
        .to_pandas()
    )
    cores = np.sort(deg.loc[deg["n"] >= MINPTS, "a"].to_numpy(np.int64))
    cref = ray.put(cores)

    def core_edges(t: pa.Table) -> pa.Table:
        cs = ray.get(cref)
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        keep = np.isin(a, cs) & np.isin(b, cs)
        return pa.table({"doc_a": pa.array(a[keep]), "doc_b": pa.array(b[keep])})

    labs_pd = connected_components(
        nb.map_batches(core_edges, batch_format="pyarrow")
    ).to_pandas()  # core-bounded
    # isolated cores (no core neighbor) are singleton clusters
    lone = np.setdiff1d(cores, labs_pd["doc_id"].to_numpy(np.int64))
    labs_pd = pd.concat(
        [labs_pd, pd.DataFrame({"doc_id": lone, "group_id": lone})],
        ignore_index=True,
    )
    gkey = labs_pd["doc_id"].to_numpy(np.int64)
    gval = labs_pd["group_id"].to_numpy(np.int64)
    gorder = np.argsort(gkey, kind="stable")
    bref = ray.put((gkey[gorder], gval[gorder]))

    def border_partial(t: pa.Table) -> pa.Table:
        cs = ray.get(cref)
        gk, gv = ray.get(bref)
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        keep = (~np.isin(a, cs)) & np.isin(b, cs)
        a, b = a[keep], b[keep]
        cl = gv[np.searchsorted(gk, b)]
        order = np.lexsort((cl, a))  # per-block min cluster per border pt
        a, cl = a[order], cl[order]
        first = np.r_[True, a[1:] != a[:-1]]
        return pa.table(
            {"pid": pa.array(a[first]), "cluster": pa.array(cl[first])}
        )

    border_pd = (
        nb.map_batches(border_partial, batch_format="pyarrow")
        .groupby("pid")
        .aggregate(_Min("cluster", alias_name="cluster"))
        .to_pandas()  # border-bounded
    )

    ccnt = (
        labs_pd.groupby("group_id").size().rename("n_core").reset_index()
    )
    bcnt = (
        border_pd.groupby("cluster").size().rename("n_border").reset_index()
    )
    out = ccnt.merge(bcnt, left_on="group_id", right_on="cluster", how="left")
    out = pd.DataFrame(
        {
            "cluster": out["group_id"].to_numpy(np.int64),
            "n_core": out["n_core"].to_numpy(np.int64),
            "n_border": out["n_border"].fillna(0).to_numpy(np.int64),
        }
    )
    noise = n_images - int(out["n_core"].sum()) - int(out["n_border"].sum())
    out = pd.concat(
        [out, pd.DataFrame({"cluster": [-1], "n_core": [0], "n_border": [noise]})],
        ignore_index=True,
    )
    return out.sort_values("cluster").reset_index(drop=True).astype(np.int64)


def _Sum_agg(col):
    from ray.data.aggregate import Sum as _Sum

    return _Sum(col, alias_name=col)


_DBSCAN_SQL = f"""
WITH RECURSIVE p AS (
  SELECT CAST(substr(image_id, 4) AS BIGINT) AS pid,
         CAST(floor(lon * 10000) AS BIGINT) AS ix,
         CAST(floor(lat * 10000) AS BIGINT) AS iy
  FROM read_parquet('{_ORACLE_DIR}/dbscan_pts/*.parquet')),
nb AS MATERIALIZED (
  SELECT a.pid AS a, b.pid AS b
  FROM p a JOIN p b
    ON b.ix BETWEEN a.ix - 8000 AND a.ix + 8000
   AND b.iy BETWEEN a.iy - 8000 AND a.iy + 8000
   AND b.pid <> a.pid
   AND (a.ix - b.ix) * (a.ix - b.ix) + (a.iy - b.iy) * (a.iy - b.iy)
       <= 64000000),
deg AS (SELECT a, COUNT(*) AS n FROM nb GROUP BY a),
core AS MATERIALIZED (SELECT a AS pid FROM deg WHERE n >= 3),
ce AS MATERIALIZED (
  SELECT nb.a, nb.b FROM nb
  JOIN core ca ON ca.pid = nb.a JOIN core cb ON cb.pid = nb.b),
reach(v, l) AS (
  SELECT pid, pid FROM core
  UNION
  SELECT ce.b, r.l FROM reach r JOIN ce ON ce.a = r.v),
lab AS (SELECT v AS pid, MIN(l) AS cluster FROM reach GROUP BY v),
bord AS (SELECT nb.a AS pid, MIN(lab.cluster) AS cluster
         FROM nb JOIN lab ON lab.pid = nb.b
         WHERE nb.a NOT IN (SELECT pid FROM core)
         GROUP BY nb.a),
cc AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_core FROM lab GROUP BY cluster),
bc AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_border FROM bord GROUP BY cluster),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM p)
SELECT cc.cluster, cc.n_core, COALESCE(bc.n_border, 0) AS n_border
FROM cc LEFT JOIN bc ON bc.cluster = cc.cluster
UNION ALL
SELECT CAST(-1 AS BIGINT) AS cluster, CAST(0 AS BIGINT) AS n_core,
       CAST(tot.n - (SELECT COALESCE(SUM(n_core), 0) FROM cc)
                  - (SELECT COALESCE(SUM(n_border), 0) FROM bc)
            AS BIGINT) AS n_border
FROM tot
"""


GEO_QUERIES.update({"dbscan_cluster_stats": q_dbscan_cluster_stats})
EXTRA_ORACLE_SQL["dbscan_cluster_stats"] = _DBSCAN_SQL


# --------------------------------------------------------------------------
# Integral-image (summed-area table) quadrant sums — the classic O(1)
# region-query image primitive (Viola–Jones feature extraction): per
# image the channel-summed pixel grid folds into a 2-D prefix-sum
# table and the four quadrant sums are read off the 4-corner identity
# S(y1,x1) − S(y0-1,x1) − S(y1,x0-1) + S(y0-1,x0-1).  The SQL oracle
# never builds the SAT: it re-decodes the persisted payload int-list
# (same projection as image_decode_check) and groups raw pixels by
# quadrant — two independent computations of the same region sums.
# Capped at 4000 rows via _persist_media_inputs (invariant corpus, not
# a throughput path); the streaming-scale decode path is the
# stages/media.py actor pool.
# --------------------------------------------------------------------------


def q_image_integral_quadrants(sf_dir: str):
    n = _persist_media_inputs(sf_dir)
    imgs = gen_images(n)

    def sat_quads(t: pa.Table) -> pa.Table:
        ws = t["w"].to_pylist()
        hs = t["h"].to_pylist()
        fmts = t["fmt"].to_pylist()
        payloads = t["bytes"].to_pylist()
        tl, tr, bl, br, tot = [], [], [], [], []
        for w, h, fmt, payload in zip(ws, hs, fmts, payloads):
            px = decode(payload, w, h, fmt).astype(np.int64).sum(axis=2)
            s = px.cumsum(axis=0).cumsum(axis=1)  # the SAT
            hh, hw = h // 2, w // 2  # w, h >= 16: quadrants never empty
            a = int(s[hh - 1, hw - 1])
            b = int(s[hh - 1, w - 1]) - a
            c = int(s[h - 1, hw - 1]) - a
            d = int(s[h - 1, w - 1]) - a - b - c
            tl.append(a)
            tr.append(b)
            bl.append(c)
            br.append(d)
            tot.append(int(s[h - 1, w - 1]))
        return pa.table(
            {
                "image_id": t["image_id"],
                "q_tl": pa.array(tl, pa.int64()),
                "q_tr": pa.array(tr, pa.int64()),
                "q_bl": pa.array(bl, pa.int64()),
                "q_br": pa.array(br, pa.int64()),
                "total": pa.array(tot, pa.int64()),
            }
        )

    return imgs.map_batches(sat_quads, batch_format="pyarrow")


_IMG_QUAD_SQL = f"""
WITH base AS MATERIALIZED (
  SELECT image_id, fmt, b, w, h, CAST(w AS BIGINT) * h * 3 AS n_px
  FROM read_parquet('{_ORACLE_DIR}/media_in/*.parquet')),
s AS (SELECT image_id,
  CAST(list_sum([CASE WHEN (p // 3) % w < w // 2 AND p // (w * 3) < h // 2
       THEN (CASE WHEN fmt = 'raw' THEN b[p + 1] ELSE b[p + 1] * 4 + 2 END)
       ELSE 0 END for p in generate_series(0, n_px - 1)]) AS BIGINT) AS q_tl,
  CAST(list_sum([CASE WHEN (p // 3) % w >= w // 2 AND p // (w * 3) < h // 2
       THEN (CASE WHEN fmt = 'raw' THEN b[p + 1] ELSE b[p + 1] * 4 + 2 END)
       ELSE 0 END for p in generate_series(0, n_px - 1)]) AS BIGINT) AS q_tr,
  CAST(list_sum([CASE WHEN (p // 3) % w < w // 2 AND p // (w * 3) >= h // 2
       THEN (CASE WHEN fmt = 'raw' THEN b[p + 1] ELSE b[p + 1] * 4 + 2 END)
       ELSE 0 END for p in generate_series(0, n_px - 1)]) AS BIGINT) AS q_bl,
  CAST(list_sum([CASE WHEN fmt = 'raw' THEN v ELSE v * 4 + 2 END for v in b])
       AS BIGINT) AS total
  FROM base)
SELECT image_id, q_tl, q_tr, q_bl,
       total - q_tl - q_tr - q_bl AS q_br, total
FROM s
"""

GEO_QUERIES.update({"image_integral_quadrants": q_image_integral_quadrants})
EXTRA_ORACLE_SQL["image_integral_quadrants"] = _IMG_QUAD_SQL


# --------------------------------------------------------------------------
# Image gradient energy — the edge/texture feature primitive (the L1
# Sobel-lite used by blur/quality filters in training-data pipelines):
# per image, on the channel-summed grid, gx = Σ|p(y,x+1) − p(y,x)| and
# gy = Σ|p(y+1,x) − p(y,x)| as exact integers (numpy diff on the
# decoded int64 grid).  The SQL oracle re-decodes the persisted
# payload int-list and replays both directed sums with neighbor
# indexing inside a list comprehension — no SAT, no shared code with
# the Ray kernel.  Same 4000-row invariant corpus as the other media
# oracles; the throughput path for real corpora is the media.py actor
# pool.
# --------------------------------------------------------------------------


def q_image_gradient_energy(sf_dir: str):
    n = _persist_media_inputs(sf_dir)
    imgs = gen_images(n)

    def grad(t: pa.Table) -> pa.Table:
        ws = t["w"].to_pylist()
        hs = t["h"].to_pylist()
        fmts = t["fmt"].to_pylist()
        payloads = t["bytes"].to_pylist()
        gxs, gys = [], []
        for w, h, fmt, payload in zip(ws, hs, fmts, payloads):
            px = decode(payload, w, h, fmt).astype(np.int64).sum(axis=2)
            gxs.append(int(np.abs(np.diff(px, axis=1)).sum()))
            gys.append(int(np.abs(np.diff(px, axis=0)).sum()))
        gx = np.asarray(gxs, np.int64)
        gy = np.asarray(gys, np.int64)
        return pa.table(
            {
                "image_id": t["image_id"],
                "gx": pa.array(gx),
                "gy": pa.array(gy),
                "energy": pa.array(gx + gy),
            }
        )

    return imgs.map_batches(grad, batch_format="pyarrow")


def _gq_pix(q: str) -> str:
    """channel-summed decoded pixel value at pixel index q (SQL)."""
    return (
        f"(CASE WHEN fmt = 'raw' THEN b[3*({q})+1] + b[3*({q})+2] + b[3*({q})+3] "
        f"ELSE (b[3*({q})+1] + b[3*({q})+2] + b[3*({q})+3]) * 4 + 6 END)"
    )


_IMG_GRAD_SQL = f"""
WITH base AS MATERIALIZED (
  SELECT image_id, fmt, b, w, h, CAST(w AS BIGINT) * h AS n_pix
  FROM read_parquet('{_ORACLE_DIR}/media_in/*.parquet')),
s AS (SELECT image_id,
  CAST(list_sum([CASE WHEN p % w < w - 1
       THEN abs({_gq_pix("p + 1")} - {_gq_pix("p")}) ELSE 0 END
       for p in generate_series(0, n_pix - 1)]) AS BIGINT) AS gx,
  CAST(list_sum([CASE WHEN p < w * (h - 1)
       THEN abs({_gq_pix("p + w")} - {_gq_pix("p")}) ELSE 0 END
       for p in generate_series(0, n_pix - 1)]) AS BIGINT) AS gy
  FROM base)
SELECT image_id, gx, gy, gx + gy AS energy FROM s
"""


GEO_QUERIES.update({"image_gradient_energy": q_image_gradient_energy})
EXTRA_ORACLE_SQL["image_gradient_energy"] = _IMG_GRAD_SQL


# --------------------------------------------------------------------------
# Edge-direction octant histogram over the decomposed ring corpus —
# the direction/bearing primitive done WITHOUT atan2: each directed
# edge of each open ring (wraparound included) is classified into one
# of 8 octants purely by exact integer sign/magnitude comparisons on
# the floor-e5 deltas (the same .5-safe scaling as the centroid
# moments), so no transcendental ever enters and both engines agree
# bit-for-bit.  Per octant: edge count and the exact L1 length sum.
# The open-vertex table persists (same projection as centroid_verts)
# and SQL rebuilds the wraparound edges with the (vidx + 1) % m join,
# replaying the CASE chain in the identical order.
# --------------------------------------------------------------------------

_OCT_CASES = [
    ("dx > 0 AND dy >= 0 AND dx >= dy", 0),
    ("dy > 0 AND dx > 0 AND dy > dx", 1),
    ("dy > 0 AND dx <= 0 AND dy >= -dx", 2),
    ("dx < 0 AND dy > 0 AND -dx > dy", 3),
    ("dx < 0 AND dy <= 0 AND -dx >= -dy", 4),
    ("dy < 0 AND dx < 0 AND -dy > -dx", 5),
    ("dy < 0 AND dx >= 0 AND -dy >= dx", 6),
]


def _octants(dx: np.ndarray, dy: np.ndarray) -> np.ndarray:
    conds = [
        (dx > 0) & (dy >= 0) & (dx >= dy),
        (dy > 0) & (dx > 0) & (dy > dx),
        (dy > 0) & (dx <= 0) & (dy >= -dx),
        (dx < 0) & (dy > 0) & (-dx > dy),
        (dx < 0) & (dy <= 0) & (-dx >= -dy),
        (dy < 0) & (dx < 0) & (-dy > -dx),
        (dy < 0) & (dx >= 0) & (-dy >= dx),
    ]
    return np.select(conds, np.arange(7, dtype=np.int64), default=np.int64(7))


def q_geo_edge_octant_hist(sf_dir: str):
    from ray.data.aggregate import Sum

    from ..cells.grid import _rl_arange

    simple = _simple_rings_cached(sf_dir)
    _persist(
        simple.map_batches(_verts_batch, batch_format="pyarrow"), "octant_verts"
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.table(
                {
                    "octant": pa.array([], pa.int64()),
                    "n_edges": pa.array([], pa.int64()),
                    "sum_l1_e5": pa.array([], pa.int64()),
                }
            )
        col = t["ring"].combine_chunks()
        offs = np.asarray(col.offsets).astype(np.int64)
        coords = np.asarray(col.values.values, dtype=np.float64).reshape(-1, 2)
        vlen = offs[1:] - offs[:-1]
        closed = (coords[offs[:-1]] == coords[np.maximum(offs[1:] - 1, 0)]).all(
            axis=1
        )
        closed &= vlen > 1
        olen = vlen - closed.astype(np.int64)
        gather = _rl_arange(offs[:-1], olen)
        oc = coords[gather]
        xi = np.floor(oc[:, 0] * 1e5).astype(np.int64)
        yi = np.floor(oc[:, 1] * 1e5).astype(np.int64)
        ostart = np.concatenate([[0], np.cumsum(olen)[:-1]]).astype(np.int64)
        nxt = np.arange(len(oc), dtype=np.int64) + 1
        nxt[ostart + olen - 1] = ostart
        dx = xi[nxt] - xi
        dy = yi[nxt] - yi
        o = _octants(dx, dy)
        n = np.bincount(o, minlength=8).astype(np.int64)
        l1 = np.zeros(8, np.int64)
        np.add.at(l1, o, np.abs(dx) + np.abs(dy))
        return pa.table(
            {
                "octant": pa.array(np.arange(8, dtype=np.int64)),
                "n_edges": pa.array(n),
                "sum_l1_e5": pa.array(l1),
            }
        )

    agg = (
        simple.map_batches(partial, batch_format="pyarrow")
        .groupby("octant")
        .aggregate(
            Sum("n_edges", alias_name="n_edges"),
            Sum("sum_l1_e5", alias_name="sum_l1_e5"),
        )
    )

    def drop_empty(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.greater(t["n_edges"], 0))

    return agg.map_batches(drop_empty, batch_format="pyarrow")


_OCT_CASE_SQL = "CASE " + " ".join(
    f"WHEN {cond} THEN {val}" for cond, val in _OCT_CASES
) + " ELSE 7 END"

_OCTANT_SQL = f"""
WITH v AS (SELECT geom_id, ring_seq, vidx,
                  CAST(floor(x * 100000.0) AS BIGINT) AS xi,
                  CAST(floor(y * 100000.0) AS BIGINT) AS yi
           FROM read_parquet('{_ORACLE_DIR}/octant_verts/*.parquet')),
n AS (SELECT geom_id, ring_seq, COUNT(*) AS m FROM v GROUP BY geom_id, ring_seq),
e AS (SELECT b.xi - a.xi AS dx, b.yi - a.yi AS dy
      FROM v a
      JOIN n USING (geom_id, ring_seq)
      JOIN v b ON b.geom_id = a.geom_id AND b.ring_seq = a.ring_seq
              AND b.vidx = (a.vidx + 1) % n.m)
SELECT CAST(({_OCT_CASE_SQL}) AS BIGINT) AS octant,
       CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(SUM(abs(dx) + abs(dy)) AS BIGINT) AS sum_l1_e5
FROM e GROUP BY octant
"""


GEO_QUERIES.update({"geo_edge_octant_hist": q_geo_edge_octant_hist})
EXTRA_ORACLE_SQL["geo_edge_octant_hist"] = _OCTANT_SQL


# --------------------------------------------------------------------------
# Image RLE run counts — the compressibility audit used to flag
# synthetic/flat regions in image-corpus curation: per image, on the
# channel-summed decoded grid, the number of horizontal runs (each row
# contributes 1 + its value-change count) and vertical runs (each
# column likewise), both exact integers.  A low runs/n_pix ratio means
# the image RLE-compresses well (flat banner / solid-color detection).
# The SQL oracle re-decodes the persisted payload int-list and counts
# neighbor inequalities with the same CASE-decoded pixel expression as
# the gradient oracle — no shared kernel with the Ray side.
# --------------------------------------------------------------------------


def q_image_rle_runs(sf_dir: str):
    n = _persist_media_inputs(sf_dir)
    imgs = gen_images(n)

    def rle(t: pa.Table) -> pa.Table:
        ws = t["w"].to_pylist()
        hs = t["h"].to_pylist()
        fmts = t["fmt"].to_pylist()
        payloads = t["bytes"].to_pylist()
        hr, vr, npx = [], [], []
        for w, h, fmt, payload in zip(ws, hs, fmts, payloads):
            px = decode(payload, w, h, fmt).astype(np.int64).sum(axis=2)
            hr.append(h + int((np.diff(px, axis=1) != 0).sum()))
            vr.append(w + int((np.diff(px, axis=0) != 0).sum()))
            npx.append(w * h)
        return pa.table(
            {
                "image_id": t["image_id"],
                "h_runs": pa.array(hr, pa.int64()),
                "v_runs": pa.array(vr, pa.int64()),
                "n_pix": pa.array(npx, pa.int64()),
            }
        )

    return imgs.map_batches(rle, batch_format="pyarrow")


_IMG_RLE_SQL = f"""
WITH base AS MATERIALIZED (
  SELECT image_id, fmt, b, w, h, CAST(w AS BIGINT) * h AS n_pix
  FROM read_parquet('{_ORACLE_DIR}/media_in/*.parquet'))
SELECT image_id,
  CAST(h + list_sum([CASE WHEN p % w > 0
       AND {_gq_pix("p")} != {_gq_pix("p - 1")} THEN 1 ELSE 0 END
       for p in generate_series(0, n_pix - 1)]) AS BIGINT) AS h_runs,
  CAST(w + list_sum([CASE WHEN p >= w
       AND {_gq_pix("p")} != {_gq_pix("p - w")} THEN 1 ELSE 0 END
       for p in generate_series(0, n_pix - 1)]) AS BIGINT) AS v_runs,
  n_pix
FROM base
"""

GEO_QUERIES.update({"image_rle_runs": q_image_rle_runs})
EXTRA_ORACLE_SQL["image_rle_runs"] = _IMG_RLE_SQL


# --------------------------------------------------------------------------
# Image brightness moments — raw spatial moments m00/m10/m01/m11/m20/
# m02 of the channel-summed grid (x = column, y = row), the primitive
# behind brightness-centroid crops, orientation estimates and
# blur/vignette audits.  All six are exact int64 sums (p <= 765,
# x,y < 256, n_pix <= 2^16 -> far inside int64).  Vectorized on the
# Ray side with per-image row/column index folds (no meshgrid: column
# sums x weights, row sums x weights), replayed in SQL with x = p % w,
# y = p // w inside a list comprehension over the persisted payload.
# --------------------------------------------------------------------------


def q_image_moments(sf_dir: str):
    n = _persist_media_inputs(sf_dir)
    imgs = gen_images(n)

    def moments(t: pa.Table) -> pa.Table:
        ws = t["w"].to_pylist()
        hs = t["h"].to_pylist()
        fmts = t["fmt"].to_pylist()
        payloads = t["bytes"].to_pylist()
        out = {k: [] for k in ("m00", "m10", "m01", "m11", "m20", "m02")}
        for w, h, fmt, payload in zip(ws, hs, fmts, payloads):
            px = decode(payload, w, h, fmt).astype(np.int64).sum(axis=2)
            xs = np.arange(w, dtype=np.int64)
            ys = np.arange(h, dtype=np.int64)
            col = px.sum(axis=0)  # weight per column
            row = px.sum(axis=1)  # weight per row
            out["m00"].append(int(col.sum()))
            out["m10"].append(int((col * xs).sum()))
            out["m01"].append(int((row * ys).sum()))
            out["m20"].append(int((col * xs * xs).sum()))
            out["m02"].append(int((row * ys * ys).sum()))
            out["m11"].append(int(((px @ xs) * ys).sum()))
        cols = {"image_id": t["image_id"]}
        cols.update({k: pa.array(v, pa.int64()) for k, v in out.items()})
        return pa.table(cols)

    return imgs.map_batches(moments, batch_format="pyarrow")


_IMG_MOM_SQL = f"""
WITH base AS MATERIALIZED (
  SELECT image_id, fmt, b, w, h, CAST(w AS BIGINT) * h AS n_pix
  FROM read_parquet('{_ORACLE_DIR}/media_in/*.parquet'))
SELECT image_id,
  CAST(list_sum([{_gq_pix("p")}
       for p in generate_series(0, n_pix - 1)]) AS BIGINT) AS m00,
  CAST(list_sum([(p % w) * {_gq_pix("p")}
       for p in generate_series(0, n_pix - 1)]) AS BIGINT) AS m10,
  CAST(list_sum([(p // w) * {_gq_pix("p")}
       for p in generate_series(0, n_pix - 1)]) AS BIGINT) AS m01,
  CAST(list_sum([(p % w) * (p // w) * {_gq_pix("p")}
       for p in generate_series(0, n_pix - 1)]) AS BIGINT) AS m11,
  CAST(list_sum([(p % w) * (p % w) * {_gq_pix("p")}
       for p in generate_series(0, n_pix - 1)]) AS BIGINT) AS m20,
  CAST(list_sum([(p // w) * (p // w) * {_gq_pix("p")}
       for p in generate_series(0, n_pix - 1)]) AS BIGINT) AS m02
FROM base
"""

GEO_QUERIES.update({"image_moments": q_image_moments})
EXTRA_ORACLE_SQL["image_moments"] = _IMG_MOM_SQL


# --------------------------------------------------------------------------
# Otsu adaptive threshold — the classic histogram-based binarization
# operator (document scans / mask extraction in image curation), made
# engine-exact: per image, over the channel-summed value histogram,
# pick the threshold t (class 0 = pixels ≤ t) maximizing the between-
# class variance ∝ (S0·n − S·n0)² / (n0·(n−n0)).  Scores are compared
# as exact integers — floor((S0·n − S·n0)² / den) needs >int64 for the
# square, so the per-candidate scan runs on Python ints over the
# value-bounded (≤766-candidate) domain; ties break to the smallest t
# on both engines.  The SQL oracle replays the whole thing from the
# persisted payload: pixel UNNEST → per-value histogram → window
# cumsums → HUGEINT score → QUALIFY argmax.  Candidates exclude each
# image's max value (n1 = 0 is undefined), identically on both sides.
# --------------------------------------------------------------------------


def q_image_otsu_threshold(sf_dir: str):
    n = _persist_media_inputs(sf_dir)
    imgs = gen_images(n)

    def otsu(t: pa.Table) -> pa.Table:
        ws = t["w"].to_pylist()
        hs = t["h"].to_pylist()
        fmts = t["fmt"].to_pylist()
        payloads = t["bytes"].to_pylist()
        ids = t["image_id"].to_pylist()
        out_id, out_t, out_n0, out_s0, out_sc = [], [], [], [], []
        for img_id, w, h, fmt, payload in zip(ids, ws, hs, fmts, payloads):
            v = decode(payload, w, h, fmt).astype(np.int64).sum(axis=2).ravel()
            u, c = np.unique(v, return_counts=True)
            if len(u) < 2:
                continue  # constant image: no valid threshold (SQL omits too)
            n0 = np.cumsum(c)
            s0 = np.cumsum(u * c)
            ntot, stot = int(n0[-1]), int(s0[-1])
            best = None  # (score, t, n0, s0)
            for k in range(len(u) - 1):  # value-bounded: ≤ 765 candidates
                nk, sk = int(n0[k]), int(s0[k])
                num = sk * ntot - stot * nk  # exact int
                score = (num * num) // (nk * (ntot - nk))  # Python ints
                if best is None or score > best[0]:
                    best = (score, int(u[k]), nk, sk)
            out_id.append(img_id)
            out_t.append(best[1])
            out_n0.append(best[2])
            out_s0.append(best[3])
            out_sc.append(best[0])
        return pa.table(
            {
                "image_id": pa.array(out_id, pa.string()),
                "otsu_t": pa.array(out_t, pa.int64()),
                "n0": pa.array(out_n0, pa.int64()),
                "s0": pa.array(out_s0, pa.int64()),
                "score": pa.array(out_sc, pa.int64()),
            }
        )

    return imgs.map_batches(otsu, batch_format="pyarrow")


_IMG_OTSU_SQL = f"""
WITH base AS MATERIALIZED (
  SELECT image_id, fmt, b, w, h, CAST(w AS BIGINT) * h AS n_pix
  FROM read_parquet('{_ORACLE_DIR}/media_in/*.parquet')),
px AS (SELECT image_id,
              unnest([{_gq_pix("p")}
                      for p in generate_series(0, n_pix - 1)]) AS v
       FROM base),
hist AS (SELECT image_id, CAST(v AS BIGINT) AS v, CAST(COUNT(*) AS BIGINT) AS c
         FROM px GROUP BY 1, 2),
tot AS (SELECT image_id, SUM(c) AS n, SUM(v * c) AS s FROM hist GROUP BY 1),
cum AS (SELECT image_id, v,
               SUM(c) OVER w AS n0, SUM(v * c) OVER w AS s0,
               ROW_NUMBER() OVER
                 (PARTITION BY image_id ORDER BY v DESC) AS rn
        FROM hist WINDOW w AS (PARTITION BY image_id ORDER BY v)),
sc AS (SELECT c.image_id, c.v, c.n0, c.s0,
              CAST(CAST(c.s0 * t.n - t.s * c.n0 AS HUGEINT)
                   * CAST(c.s0 * t.n - t.s * c.n0 AS HUGEINT)
                   // (c.n0 * (t.n - c.n0)) AS BIGINT) AS score
       FROM cum c JOIN tot t USING (image_id) WHERE c.rn > 1)
SELECT image_id, v AS otsu_t, CAST(n0 AS BIGINT) AS n0,
       CAST(s0 AS BIGINT) AS s0, score
FROM sc
QUALIFY ROW_NUMBER() OVER
  (PARTITION BY image_id ORDER BY score DESC, v ASC) = 1
"""

GEO_QUERIES.update({"image_otsu_threshold": q_image_otsu_threshold})
EXTRA_ORACLE_SQL["image_otsu_threshold"] = _IMG_OTSU_SQL


# --------------------------------------------------------------------------
# Strided template match — min-SSD localization of a fixed 4×4
# template over a stride-4 offset grid, per image: the patch-lookup
# primitive behind logo/watermark detection in image-corpus curation.
# The template is specified by the formula t[i,j] = ((7i + 13j + 3)
# mod 16) · 40 (both engines derive it independently); SSD values are
# exact int64 (≤ 16 · 765²).  The Ray kernel folds the 16 cell
# contributions over the whole offset grid with np.ix_ views (16
# vectorized adds per image, no per-offset loop); ties break to the
# smallest (off_y, off_x).  SQL replays every (offset, cell) term from
# the persisted payload and QUALIFY-picks the argmin.
# --------------------------------------------------------------------------

_TMPL44 = np.array(
    [[((7 * i + 13 * j + 3) % 16) * 40 for j in range(4)] for i in range(4)],
    np.int64,
)


def q_image_template_match(sf_dir: str):
    n = _persist_media_inputs(sf_dir)
    imgs = gen_images(n)

    def match(t: pa.Table) -> pa.Table:
        ws = t["w"].to_pylist()
        hs = t["h"].to_pylist()
        fmts = t["fmt"].to_pylist()
        payloads = t["bytes"].to_pylist()
        oys, oxs, ssds = [], [], []
        for w, h, fmt, payload in zip(ws, hs, fmts, payloads):
            px = decode(payload, w, h, fmt).astype(np.int64).sum(axis=2)
            gy = np.arange(0, h - 3, 4)
            gx = np.arange(0, w - 3, 4)
            acc = np.zeros((len(gy), len(gx)), np.int64)
            for i in range(4):
                for j in range(4):
                    d = px[np.ix_(gy + i, gx + j)] - _TMPL44[i, j]
                    acc += d * d
            k = int(np.argmin(acc))  # first min in (oy, ox) row-major order
            oys.append(int(gy[k // len(gx)]))
            oxs.append(int(gx[k % len(gx)]))
            ssds.append(int(acc.ravel()[k]))
        return pa.table(
            {
                "image_id": t["image_id"],
                "off_y": pa.array(oys, pa.int64()),
                "off_x": pa.array(oxs, pa.int64()),
                "min_ssd": pa.array(ssds, pa.int64()),
            }
        )

    return imgs.map_batches(match, batch_format="pyarrow")


_TMPL44_SQL = "[" + ", ".join(
    str(((7 * i + 13 * j + 3) % 16) * 40) for i in range(4) for j in range(4)
) + "]"

_IMG_TMPL_SQL = f"""
WITH base AS MATERIALIZED (
  SELECT image_id, fmt, b, w, h, {_TMPL44_SQL} AS tmpl
  FROM read_parquet('{_ORACLE_DIR}/media_in/*.parquet')),
offs AS (SELECT image_id, fmt, b, w, tmpl,
                4 * gy.g AS oy, 4 * gx.g AS ox
         FROM base,
              UNNEST(generate_series(0, (h - 4) // 4)) AS gy(g),
              UNNEST(generate_series(0, (w - 4) // 4)) AS gx(g)),
sc AS (SELECT image_id, oy, ox,
  CAST(list_sum([({_gq_pix("(oy + c // 4) * w + ox + c % 4")} - tmpl[c + 1])
                 * ({_gq_pix("(oy + c // 4) * w + ox + c % 4")} - tmpl[c + 1])
                 for c in generate_series(0, 15)]) AS BIGINT) AS ssd
  FROM offs)
SELECT image_id, CAST(oy AS BIGINT) AS off_y, CAST(ox AS BIGINT) AS off_x,
       ssd AS min_ssd
FROM sc
QUALIFY ROW_NUMBER() OVER
  (PARTITION BY image_id ORDER BY ssd ASC, oy ASC, ox ASC) = 1
"""

GEO_QUERIES.update({"image_template_match": q_image_template_match})
EXTRA_ORACLE_SQL["image_template_match"] = _IMG_TMPL_SQL


# --------------------------------------------------------------------------
# Histogram equalization audit — the contrast-normalization transform an
# image-curation pipeline applies before feature extraction, verified by
# its exact integer output moments.  Per image: 766-bin channel-sum
# histogram, integer CDF remap e(v) = ((cdf(v) - cdf_min) * 765) //
# (n_pix - cdf_min), and the audit reports the equalized SUM plus the
# level count — all exact ints, value-bounded per image.  Constant
# images (n_pix == cdf_min) have no valid remap and are omitted on both
# sides, mirroring the Otsu convention.
# --------------------------------------------------------------------------


def q_image_hist_equalize(sf_dir: str):
    n = _persist_media_inputs(sf_dir)
    imgs = gen_images(n)

    def equalize(t: pa.Table) -> pa.Table:
        ws = t["w"].to_pylist()
        hs = t["h"].to_pylist()
        fmts = t["fmt"].to_pylist()
        payloads = t["bytes"].to_pylist()
        ids = t["image_id"].to_pylist()
        out_id, out_sum, out_lvl = [], [], []
        for img_id, w, h, fmt, payload in zip(ids, ws, hs, fmts, payloads):
            v = decode(payload, w, h, fmt).astype(np.int64).sum(axis=2).ravel()
            u, c = np.unique(v, return_counts=True)
            cdf = np.cumsum(c)
            npix, c0 = int(cdf[-1]), int(cdf[0])
            if npix == c0:
                continue  # constant image: no valid remap (SQL omits too)
            e = ((cdf - c0) * 765) // (npix - c0)
            out_id.append(img_id)
            out_sum.append(int((c * e).sum()))
            out_lvl.append(len(u))
        return pa.table(
            {
                "image_id": pa.array(out_id, pa.string()),
                "sum_eq": pa.array(out_sum, pa.int64()),
                "n_levels": pa.array(out_lvl, pa.int64()),
            }
        )

    return imgs.map_batches(equalize, batch_format="pyarrow")


_IMG_EQ_SQL = f"""
WITH base AS MATERIALIZED (
  SELECT image_id, fmt, b, w, h, CAST(w AS BIGINT) * h AS n_pix
  FROM read_parquet('{_ORACLE_DIR}/media_in/*.parquet')),
px AS (SELECT image_id,
              unnest([{_gq_pix("p")}
                      for p in generate_series(0, n_pix - 1)]) AS v
       FROM base),
hist AS (SELECT image_id, CAST(v AS BIGINT) AS v, CAST(COUNT(*) AS BIGINT) AS c
         FROM px GROUP BY 1, 2),
cum AS (SELECT image_id, v, c,
               SUM(c) OVER (PARTITION BY image_id ORDER BY v) AS cdf
        FROM hist),
tot AS (SELECT image_id, MAX(cdf) AS n, MIN(cdf) AS c0 FROM cum GROUP BY 1),
eq AS (SELECT c.image_id, c.c,
              ((c.cdf - t.c0) * 765) // (t.n - t.c0) AS e
       FROM cum c JOIN tot t USING (image_id) WHERE t.n > t.c0)
SELECT image_id, CAST(SUM(c * e) AS BIGINT) AS sum_eq,
       COUNT(*) AS n_levels
FROM eq GROUP BY image_id
"""

GEO_QUERIES.update({"image_hist_equalize": q_image_hist_equalize})
EXTRA_ORACLE_SQL["image_hist_equalize"] = _IMG_EQ_SQL


# --------------------------------------------------------------------------
# Border-vs-interior contrast audit — the vignetting / frame-artifact
# screen an image-QA stage runs: exact channel-sum totals and pixel
# counts for the 1-px border ring vs the interior, per image.  Python
# side reads the four edge slices of the decoded plane (no mask
# materialization); the SQL oracle reconstructs coordinates from the
# flat pixel index (x = p % w, y = p // w) and filters in a DuckDB
# list comprehension.
# --------------------------------------------------------------------------


def q_image_border_contrast(sf_dir: str):
    n = _persist_media_inputs(sf_dir)
    imgs = gen_images(n)

    def contrast(t: pa.Table) -> pa.Table:
        ws = t["w"].to_pylist()
        hs = t["h"].to_pylist()
        fmts = t["fmt"].to_pylist()
        payloads = t["bytes"].to_pylist()
        out_b, out_nb, out_i, out_ni = [], [], [], []
        for w, h, fmt, payload in zip(ws, hs, fmts, payloads):
            px = decode(payload, w, h, fmt).astype(np.int64).sum(axis=2)
            total = int(px.sum())
            if w > 1 and h > 1:
                interior = int(px[1:-1, 1:-1].sum())
                n_border = 2 * w + 2 * h - 4
            else:
                interior = 0
                n_border = w * h
            out_b.append(total - interior)
            out_nb.append(n_border)
            out_i.append(interior)
            out_ni.append(w * h - n_border)
        return pa.table(
            {
                "image_id": t["image_id"],
                "sum_border": pa.array(out_b, pa.int64()),
                "n_border": pa.array(out_nb, pa.int64()),
                "sum_interior": pa.array(out_i, pa.int64()),
                "n_interior": pa.array(out_ni, pa.int64()),
            }
        )

    return imgs.map_batches(contrast, batch_format="pyarrow")


_IMG_BORDER_SQL = f"""
WITH base AS MATERIALIZED (
  SELECT image_id, fmt, b, w, h, CAST(w AS BIGINT) * h AS n_pix
  FROM read_parquet('{_ORACLE_DIR}/media_in/*.parquet'))
SELECT image_id,
  CAST(list_sum([{_gq_pix("p")}
       for p in generate_series(0, n_pix - 1)
       if (p % w) = 0 OR (p % w) = w - 1
          OR (p // w) = 0 OR (p // w) = h - 1]) AS BIGINT) AS sum_border,
  CAST(CASE WHEN w > 1 AND h > 1 THEN 2 * w + 2 * h - 4
            ELSE w * h END AS BIGINT) AS n_border,
  CAST(COALESCE(list_sum([{_gq_pix("p")}
       for p in generate_series(0, n_pix - 1)
       if (p % w) > 0 AND (p % w) < w - 1
          AND (p // w) > 0 AND (p // w) < h - 1]), 0) AS BIGINT) AS sum_interior,
  CAST(n_pix - (CASE WHEN w > 1 AND h > 1 THEN 2 * w + 2 * h - 4
                     ELSE w * h END) AS BIGINT) AS n_interior
FROM base
"""

GEO_QUERIES.update({"image_border_contrast": q_image_border_contrast})
EXTRA_ORACLE_SQL["image_border_contrast"] = _IMG_BORDER_SQL


# --------------------------------------------------------------------------
# Spatial density drift — does the geotag distribution differ between
# the even- and odd-id halves of the image corpus?  The snapshot
# distribution-shift audit run on SPATIAL data: per level-6 cell,
# exact point counts for each half (the cell grid bounds the output at
# 4096 rows regardless of data volume; per-block bincount partials ×
# one cell groupby, same exchange shape as image_cell_density).  The
# SQL oracle recomputes point→cell AND the half split independently
# from the persisted points.
# --------------------------------------------------------------------------


def q_cell_density_drift(sf_dir: str):
    import pyarrow.compute as pc
    import ray.data as rd

    _, n_images = scale_counts(sf_dir)
    pts_dir = _persist(gen_points(min(n_images, 50_000)), "drift_pts")
    pts = rd.read_parquet(pts_dir, columns=["image_id", "lon", "lat"])
    n = 64  # level 6

    def partial(t: pa.Table) -> pa.Table:
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        idx = (
            pc.cast(pc.utf8_slice_codeunits(t["image_id"], 3), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        i = np.clip(((lon + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
        j = np.clip(((lat + 90.0) / 180.0 * n).astype(np.int64), 0, n - 1)
        cell = i * n + j
        even = np.bincount(cell[idx % 2 == 0], minlength=n * n).astype(np.int64)
        odd = np.bincount(cell[idx % 2 == 1], minlength=n * n).astype(np.int64)
        nz = np.flatnonzero(even + odd)
        return pa.table(
            {
                "cx": pa.array(nz // n),
                "cy": pa.array(nz % n),
                "n_even": pa.array(even[nz]),
                "n_odd": pa.array(odd[nz]),
            }
        )

    parts = pts.map_batches(partial, batch_format="pyarrow").to_pandas()
    return (
        parts.groupby(["cx", "cy"], as_index=False)
        .agg(n_even=("n_even", "sum"), n_odd=("n_odd", "sum"))
        .sort_values(["cx", "cy"], ignore_index=True)
    )


_CELL_DRIFT_SQL = f"""
SELECT cx, cy,
       CAST(SUM(CASE WHEN idx % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_even,
       CAST(SUM(CASE WHEN idx % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_odd
FROM (SELECT
        CAST(substr(image_id, 4) AS BIGINT) AS idx,
        LEAST(GREATEST(CAST(trunc((lon + 180.0) / 360.0 * 64) AS BIGINT), 0), 63) AS cx,
        LEAST(GREATEST(CAST(trunc((lat + 90.0) / 180.0 * 64) AS BIGINT), 0), 63) AS cy
      FROM read_parquet('{_ORACLE_DIR}/drift_pts/*.parquet'))
GROUP BY cx, cy ORDER BY cx, cy
"""

GEO_QUERIES.update({"cell_density_drift": q_cell_density_drift})
EXTRA_ORACLE_SQL["cell_density_drift"] = _CELL_DRIFT_SQL


# --------------------------------------------------------------------------
# Raw-corpus validity profile on the e5 snap grid — two QA audits a
# geometry-ingest pipeline runs BEFORE decompose, on the raw (self-
# intersecting) polygon corpus:
#   geo_selfisect_hist  — per outer ring, the count of PROPER edge
#     crossings (strict double-straddle sign test) between non-adjacent
#     edges, histogrammed (clamped at 20+);
#   geo_snap_dup_verts  — per outer ring, how many duplicate vertices
#     the e5 floor-snap introduces (the degeneracy the reference's
#     dup-vertex guard would reject), histogrammed.
# Coordinates floor-snap to the 1e-5-degree grid (np.floor ↔ SQL floor,
# immune to the rint/round half-rule divergence), making every cross
# product an exact int64 (|coord| ≤ 1.9e7 ⇒ |cross| ≤ 1.5e15 < 2^53) —
# the SQL oracle replays the predicate from one persisted edge table.
# Capped at 3000 rings (QA audit, not a throughput path; cap documented
# here, not silent).
# --------------------------------------------------------------------------

_SNAP_CAP = 3000


def _snap_edge_rows(sf_dir: str):
    """Persist (geom_id, eid, ne, x1..y2) int64 snapped outer-ring edges
    once per (process, sf_dir); both snap audits read the same table."""
    key = ("snap_edges", sf_dir)
    if _SNAP_CACHE.get("key") == key:
        return _SNAP_CACHE["dir"]
    from ..stages.decompose_stage import _rings_from_arrow, polygons_source

    n_polys, _ = scale_counts(sf_dir)
    polys = polygons_source(min(n_polys, _SNAP_CAP))

    def edges(t: pa.Table) -> pa.Table:
        gids, gkeys, eids, nes = [], [], [], []
        xs1, ys1, xs2, ys2 = [], [], [], []
        ring_lists = _rings_from_arrow(t["rings"])
        for gid, rlist in zip(t["geom_id"].to_pylist(), ring_lists):
            pts = np.asarray(rlist[0], np.float64)
            if len(pts) > 1 and (pts[0] == pts[-1]).all():
                pts = pts[:-1]  # drop the closing vertex
            p = np.floor(pts * 1e5).astype(np.int64)
            e = len(p)
            q = np.roll(p, -1, axis=0)
            gids.extend([gid] * e)
            gkeys.append(np.full(e, int(gid[4:]), np.int64))
            eids.append(np.arange(e, dtype=np.int64))
            nes.append(np.full(e, e, np.int64))
            xs1.append(p[:, 0]); ys1.append(p[:, 1])
            xs2.append(q[:, 0]); ys2.append(q[:, 1])
        return pa.table(
            {
                "geom_id": pa.array(gids, pa.string()),
                "gkey": pa.array(np.concatenate(gkeys)),
                "eid": pa.array(np.concatenate(eids)),
                "ne": pa.array(np.concatenate(nes)),
                "x1": pa.array(np.concatenate(xs1)),
                "y1": pa.array(np.concatenate(ys1)),
                "x2": pa.array(np.concatenate(xs2)),
                "y2": pa.array(np.concatenate(ys2)),
            }
        )

    out = _persist(polys.map_batches(edges, batch_format="pyarrow"), "snap_edges")
    _SNAP_CACHE["key"] = key
    _SNAP_CACHE["dir"] = out
    return out


_SNAP_CACHE: dict = {}


def q_geo_selfisect_hist(sf_dir: str):
    import ray.data as rd

    edges_dir = _snap_edge_rows(sf_dir)
    ed = rd.read_parquet(
        edges_dir, columns=["gkey", "eid", "x1", "y1", "x2", "y2"]
    )

    def isect(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {"n_isects": pa.array([], pa.int64()), "n_rings": pa.array([], pa.int64())}
        )
        if len(g) == 0:
            return empty
        gid = g["gkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = g["eid"].to_numpy(zero_copy_only=False)
        x1 = g["x1"].to_numpy(zero_copy_only=False)
        y1 = g["y1"].to_numpy(zero_copy_only=False)
        x2 = g["x2"].to_numpy(zero_copy_only=False)
        y2 = g["y2"].to_numpy(zero_copy_only=False)
        o = np.lexsort((eid, gid))
        gid, x1, y1, x2, y2 = gid[o], x1[o], y1[o], x2[o], y2[o]
        starts = np.flatnonzero(np.r_[True, gid[1:] != gid[:-1]])
        lens = np.diff(np.append(starts, len(gid)))
        counts = []
        for s, e in zip(starts, starts + lens):
            p1x, p1y = x1[s:e], y1[s:e]
            p2x, p2y = x2[s:e], y2[s:e]
            E = e - s
            if E < 4:
                counts.append(0)
                continue
            i, j = np.triu_indices(E, 2)
            keep = ~((i == 0) & (j == E - 1))
            i, j = i[keep], j[keep]
            d1 = (p2x[i] - p1x[i]) * (p1y[j] - p1y[i]) - (p2y[i] - p1y[i]) * (p1x[j] - p1x[i])
            d2 = (p2x[i] - p1x[i]) * (p2y[j] - p1y[i]) - (p2y[i] - p1y[i]) * (p2x[j] - p1x[i])
            d3 = (p2x[j] - p1x[j]) * (p1y[i] - p1y[j]) - (p2y[j] - p1y[j]) * (p1x[i] - p1x[j])
            d4 = (p2x[j] - p1x[j]) * (p2y[i] - p1y[j]) - (p2y[j] - p1y[j]) * (p2x[i] - p1x[j])
            proper = (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))) & (
                ((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0))
            )
            counts.append(int(proper.sum()))
        b = np.minimum(np.array(counts, np.int64), 20)
        cnt = np.bincount(b, minlength=21).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {"n_isects": pa.array(nz.astype(np.int64)), "n_rings": pa.array(cnt[nz])}
        )

    from ..relational.queries import _bucket_groupby

    parts = _bucket_groupby(ed, "gkey", isect, batch_format="pyarrow").to_pandas()
    return (
        parts.groupby("n_isects", as_index=False)
        .agg(n_rings=("n_rings", "sum"))
        .sort_values("n_isects", ignore_index=True)
    )


def _selfisect_sql(edges_dir: str) -> str:
    return f"""
WITH e AS (SELECT * FROM read_parquet('{edges_dir}/*.parquet')),
pr AS (SELECT a.geom_id,
              (a.x2 - a.x1) * (b.y1 - a.y1) - (a.y2 - a.y1) * (b.x1 - a.x1) AS d1,
              (a.x2 - a.x1) * (b.y2 - a.y1) - (a.y2 - a.y1) * (b.x2 - a.x1) AS d2,
              (b.x2 - b.x1) * (a.y1 - b.y1) - (b.y2 - b.y1) * (a.x1 - b.x1) AS d3,
              (b.x2 - b.x1) * (a.y2 - b.y1) - (b.y2 - b.y1) * (a.x2 - b.x1) AS d4
       FROM e a JOIN e b ON a.geom_id = b.geom_id AND b.eid >= a.eid + 2
        AND NOT (a.eid = 0 AND b.eid = a.ne - 1)),
per AS (SELECT geom_id,
               SUM(CASE WHEN ((d1 > 0 AND d2 < 0) OR (d1 < 0 AND d2 > 0))
                         AND ((d3 > 0 AND d4 < 0) OR (d3 < 0 AND d4 > 0))
                        THEN 1 ELSE 0 END) AS c
        FROM pr GROUP BY geom_id),
allg AS (SELECT DISTINCT geom_id FROM e),
f AS (SELECT LEAST(COALESCE(per.c, 0), 20) AS n_isects
      FROM allg LEFT JOIN per USING (geom_id))
SELECT CAST(n_isects AS BIGINT) AS n_isects, COUNT(*) AS n_rings
FROM f GROUP BY 1 ORDER BY 1
"""


def q_geo_snap_dup_verts(sf_dir: str):
    import ray.data as rd

    edges_dir = _snap_edge_rows(sf_dir)
    ed = rd.read_parquet(edges_dir, columns=["gkey", "x1", "y1"])

    def dups(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {"n_dups": pa.array([], pa.int64()), "n_rings": pa.array([], pa.int64())}
        )
        if len(g) == 0:
            return empty
        gid = g["gkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = g["x1"].to_numpy(zero_copy_only=False)
        y = g["y1"].to_numpy(zero_copy_only=False)
        o = np.lexsort((y, x, gid))
        gid, x, y = gid[o], x[o], y[o]
        n = len(gid)
        newg = np.r_[True, gid[1:] != gid[:-1]]
        newv = newg | np.r_[True, (x[1:] != x[:-1]) | (y[1:] != y[:-1])]
        starts = np.flatnonzero(newg)
        tot = np.diff(np.append(starts, n))
        # distinct snapped vertices per ring
        seg = np.cumsum(newg) - 1
        dis = np.bincount(seg[newv], minlength=len(starts))
        d = np.minimum(tot - dis, 20)
        cnt = np.bincount(d, minlength=21).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {"n_dups": pa.array(nz.astype(np.int64)), "n_rings": pa.array(cnt[nz])}
        )

    from ..relational.queries import _bucket_groupby

    parts = _bucket_groupby(ed, "gkey", dups, batch_format="pyarrow").to_pandas()
    return (
        parts.groupby("n_dups", as_index=False)
        .agg(n_rings=("n_rings", "sum"))
        .sort_values("n_dups", ignore_index=True)
    )


def _snap_dups_sql(edges_dir: str) -> str:
    return f"""
WITH e AS (SELECT geom_id, x1, y1 FROM read_parquet('{edges_dir}/*.parquet')),
per AS (SELECT geom_id,
               LEAST(COUNT(*) - COUNT(DISTINCT (x1, y1)), 20) AS n_dups
        FROM e GROUP BY geom_id)
SELECT CAST(n_dups AS BIGINT) AS n_dups, COUNT(*) AS n_rings
FROM per GROUP BY 1 ORDER BY 1
"""


GEO_QUERIES.update(
    {
        "geo_selfisect_hist": q_geo_selfisect_hist,
        "geo_snap_dup_verts": q_geo_snap_dup_verts,
    }
)
EXTRA_ORACLE_SQL["geo_selfisect_hist"] = _selfisect_sql(f"{_ORACLE_DIR}/snap_edges")
EXTRA_ORACLE_SQL["geo_snap_dup_verts"] = _snap_dups_sql(f"{_ORACLE_DIR}/snap_edges")


# --------------------------------------------------------------------------
# Reciprocal-rank fusion of two retrieval paths — the standard way a
# retrieval pipeline merges an exact ranking with an ANN shortlist:
# each method's top-10 contributes floor(1e6 / (60 + rank)) integer
# points per vec_id (the RRF constant 60, fixed-point so the fusion is
# exact and order-independent); the fused top-10 ties break by vec_id.
# Reuses the brute and LSH paths as-is (the LSH bucket assignment
# persists for the oracle), so the SQL replay composes the two ranking
# oracles verbatim and fuses them in SQL.
# --------------------------------------------------------------------------


def q_ann_rrf_fusion(sf_dir: str):
    brute = q_ann_brute(sf_dir)
    lsh = q_ann_lsh(sf_dir)
    both = pd.concat([brute, lsh], ignore_index=True)
    both["pts"] = 10**6 // (60 + both["rank"].to_numpy(np.int64))
    fused = (
        both.groupby("vec_id", as_index=False)
        .agg(rrf_score=("pts", "sum"))
        .sort_values(["rrf_score", "vec_id"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    fused["rrf_score"] = fused["rrf_score"].astype(np.int64)
    return fused


_RRF_SQL = f"""
WITH brute AS ({_ann_sql(10)}),
lsh AS ({_ann_lsh_sql(10)}),
both_ AS (SELECT vec_id, 1000000 // (60 + "rank") AS pts FROM brute
          UNION ALL
          SELECT vec_id, 1000000 // (60 + "rank") AS pts FROM lsh)
SELECT vec_id, CAST(SUM(pts) AS BIGINT) AS rrf_score
FROM both_ GROUP BY vec_id
ORDER BY rrf_score DESC, vec_id LIMIT 10
"""

GEO_QUERIES.update({"ann_rrf_fusion": q_ann_rrf_fusion})
EXTRA_ORACLE_SQL["ann_rrf_fusion"] = _RRF_SQL


# --------------------------------------------------------------------------
# Adaptive quadtree occupancy — data-driven recursive grid refinement:
# cells at the base level (16×16, level 4) holding more than
# _QT_SPLIT points split into their 4 children, recursively down to
# level 6; leaves report (level, cx, cy, n_points).  The distributed
# pass is ONE bincount-partial scan at the FINEST grid (64×64 — the
# exchange is bounded by 4096 cells × blocks, never by data volume);
# the refinement fold is pure numpy over that bounded grid.  Coarser
# counts derive exactly from the finest grid (floor(16x) ==
# floor(floor(64x)/4), clipping commutes), so the SQL oracle replays
# quantization AND the split rule independently from persisted points.
# --------------------------------------------------------------------------

_QT_SPLIT = 96  # split threshold (points per cell)


def _cell64_partial(t: pa.Table, count_col: str) -> pa.Table:
    lon = t["lon"].to_numpy(zero_copy_only=False)
    lat = t["lat"].to_numpy(zero_copy_only=False)
    i = np.clip(((lon + 180.0) / 360.0 * 64).astype(np.int64), 0, 63)
    j = np.clip(((lat + 90.0) / 180.0 * 64).astype(np.int64), 0, 63)
    cnt = np.bincount(i * 64 + j, minlength=64 * 64).astype(np.int64)
    nz = np.flatnonzero(cnt)
    return pa.table(
        {"cx": pa.array(nz // 64), "cy": pa.array(nz % 64), count_col: pa.array(cnt[nz])}
    )


def _cell64_counts(sf_dir: str, persist_name: str) -> pd.DataFrame:
    """Shared finest-grid scan: persist the points (for the SQL replay)
    and return the (cx, cy, n) level-6 count table (≤ 4096 rows)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    _, n_images = scale_counts(sf_dir)
    pts_dir = _persist(gen_points(min(n_images, 50_000)), persist_name)
    pts = rd.read_parquet(pts_dir, columns=["lon", "lat"])
    return (
        pts.map_batches(
            lambda t: _cell64_partial(t, "n"), batch_format="pyarrow"
        )
        .groupby(["cx", "cy"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )


def q_geo_quadtree_refine(sf_dir: str):
    c6 = _cell64_counts(sf_dir, "quadtree_pts")
    grid = np.zeros((64, 64), dtype=np.int64)
    grid[c6["cx"].to_numpy(np.int64), c6["cy"].to_numpy(np.int64)] = c6[
        "n"
    ].to_numpy(np.int64)
    g5 = grid.reshape(32, 2, 32, 2).sum(axis=(1, 3))
    g4 = g5.reshape(16, 2, 16, 2).sum(axis=(1, 3))

    rows = []
    split4 = g4 > _QT_SPLIT
    # level 4 leaves: occupied, not split
    cx, cy = np.nonzero((g4 > 0) & ~split4)
    rows.append((np.full(len(cx), 4), cx, cy, g4[cx, cy]))
    # level 5: children of split level-4 cells
    in_split5 = split4[np.arange(32)[:, None] // 2, np.arange(32)[None, :] // 2]
    split5 = (g5 > _QT_SPLIT) & in_split5
    cx, cy = np.nonzero((g5 > 0) & in_split5 & ~split5)
    rows.append((np.full(len(cx), 5), cx, cy, g5[cx, cy]))
    # level 6: children of split level-5 cells (always leaves)
    in_split6 = split5[np.arange(64)[:, None] // 2, np.arange(64)[None, :] // 2]
    cx, cy = np.nonzero((grid > 0) & in_split6)
    rows.append((np.full(len(cx), 6), cx, cy, grid[cx, cy]))

    out = pd.DataFrame(
        {
            "level": np.concatenate([r[0] for r in rows]).astype(np.int64),
            "cx": np.concatenate([r[1] for r in rows]).astype(np.int64),
            "cy": np.concatenate([r[2] for r in rows]).astype(np.int64),
            "n_points": np.concatenate([r[3] for r in rows]).astype(np.int64),
        }
    )
    return out.sort_values(["level", "cx", "cy"], ignore_index=True)


def _quadtree_sql(pts_glob: str) -> str:
    return f"""
WITH p AS (SELECT
        LEAST(GREATEST(CAST(trunc((lon + 180.0) / 360.0 * 64) AS BIGINT), 0), 63) AS cx6,
        LEAST(GREATEST(CAST(trunc((lat + 90.0) / 180.0 * 64) AS BIGINT), 0), 63) AS cy6
      FROM read_parquet('{pts_glob}')),
c6 AS (SELECT cx6, cy6, COUNT(*) AS n FROM p GROUP BY 1, 2),
c5 AS (SELECT cx6 // 2 AS cx5, cy6 // 2 AS cy5, SUM(n) AS n FROM c6 GROUP BY 1, 2),
c4 AS (SELECT cx5 // 2 AS cx4, cy5 // 2 AS cy4, SUM(n) AS n FROM c5 GROUP BY 1, 2),
leaf4 AS (SELECT 4 AS level, cx4 AS cx, cy4 AS cy, n FROM c4 WHERE n <= {_QT_SPLIT}),
split4 AS (SELECT cx4, cy4 FROM c4 WHERE n > {_QT_SPLIT}),
c5s AS (SELECT cx5, cy5, n FROM c5 JOIN split4
        ON cx5 // 2 = cx4 AND cy5 // 2 = cy4),
leaf5 AS (SELECT 5 AS level, cx5, cy5, n FROM c5s WHERE n <= {_QT_SPLIT}),
split5 AS (SELECT cx5, cy5 FROM c5s WHERE n > {_QT_SPLIT}),
leaf6 AS (SELECT 6 AS level, cx6, cy6, n FROM c6 JOIN split5
          ON cx6 // 2 = cx5 AND cy6 // 2 = cy5)
SELECT CAST(level AS BIGINT) AS level, CAST(cx AS BIGINT) AS cx,
       CAST(cy AS BIGINT) AS cy, CAST(n AS BIGINT) AS n_points
FROM (SELECT * FROM leaf4 UNION ALL SELECT * FROM leaf5
      UNION ALL SELECT * FROM leaf6)
ORDER BY level, cx, cy
"""


# --------------------------------------------------------------------------
# Grid stencil hotspots — the raster-convolution shape: a 3×3
# neighborhood SUM over the level-6 occupancy grid ranks "hotspot"
# cells the way a density-based heatmap smoother does.  Same
# bounded-grid scan as the quadtree (bincount partials, 4096-row
# exchange); the stencil is one padded numpy slice-sum on the driver
# over the dense grid, i.e. the convolution never touches row data.
# Top-20 by (smoothed count desc, cx, cy), with the cell's own count
# carried for contrast.
# --------------------------------------------------------------------------


def q_cell_smooth_topk(sf_dir: str):
    c6 = _cell64_counts(sf_dir, "stencil_pts")
    grid = np.zeros((64, 64), dtype=np.int64)
    grid[c6["cx"].to_numpy(np.int64), c6["cy"].to_numpy(np.int64)] = c6[
        "n"
    ].to_numpy(np.int64)
    p = np.pad(grid, 1)
    sm = sum(
        p[1 + dx : 65 + dx, 1 + dy : 65 + dy]
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
    )
    cx, cy = np.nonzero(sm > 0)
    df = pd.DataFrame(
        {
            "cx": cx.astype(np.int64),
            "cy": cy.astype(np.int64),
            "smooth_n": sm[cx, cy],
            "n_center": grid[cx, cy],
        }
    )
    return (
        df.sort_values(["smooth_n", "cx", "cy"], ascending=[False, True, True])
        .head(20)
        .reset_index(drop=True)
    )


def _stencil_sql(pts_glob: str) -> str:
    return f"""
WITH p AS (SELECT
        LEAST(GREATEST(CAST(trunc((lon + 180.0) / 360.0 * 64) AS BIGINT), 0), 63) AS cx,
        LEAST(GREATEST(CAST(trunc((lat + 90.0) / 180.0 * 64) AS BIGINT), 0), 63) AS cy
      FROM read_parquet('{pts_glob}')),
c AS (SELECT cx, cy, COUNT(*) AS n FROM p GROUP BY 1, 2),
off AS (SELECT a.range AS dx, b.range AS dy
        FROM range(-1, 2) a CROSS JOIN range(-1, 2) b),
s AS (SELECT c.cx + dx AS cx, c.cy + dy AS cy, SUM(n) AS sm
      FROM c CROSS JOIN off
      WHERE c.cx + dx BETWEEN 0 AND 63 AND c.cy + dy BETWEEN 0 AND 63
      GROUP BY 1, 2)
SELECT s.cx, s.cy, CAST(sm AS BIGINT) AS smooth_n,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n_center
FROM s LEFT JOIN c ON s.cx = c.cx AND s.cy = c.cy
ORDER BY smooth_n DESC, s.cx, s.cy LIMIT 20
"""


GEO_QUERIES.update(
    {
        "geo_quadtree_refine": q_geo_quadtree_refine,
        "cell_smooth_topk": q_cell_smooth_topk,
    }
)
EXTRA_ORACLE_SQL["geo_quadtree_refine"] = _quadtree_sql(
    f"{_ORACLE_DIR}/quadtree_pts/*.parquet"
)
EXTRA_ORACLE_SQL["cell_smooth_topk"] = _stencil_sql(
    f"{_ORACLE_DIR}/stencil_pts/*.parquet"
)


# --------------------------------------------------------------------------
# Hilbert-curve bucket locality — the space-filling-curve audit a
# storage layout planner runs before choosing a clustering key: order-8
# (256×256) cells map to their Hilbert index (the classic xy2d bit
# fold, vectorized; bitwise ops on int64 two's complement match DuckDB
# exactly, so the SQL oracle replays all eight fold steps as chained
# CTEs — a genuine cross-engine replay of the curve, not a persisted
# mapping).  Occupied cells then split into 16 EQUAL-CELL-COUNT runs
# along the curve ((16·rank) // n_cells — the rank bucketing a storage
# layout actually uses, and exactly replicable as row_number in SQL),
# and each run reports point mass plus its occupied-cell bounding box
# — compact boxes = good locality.  Data pass: one sparse unique-count
# scan; exchange and curve math bounded by occupied cells (≤ 65536).
# --------------------------------------------------------------------------

_HILBERT_ORDER = 8
_HILBERT_N = 1 << _HILBERT_ORDER


def _hilbert_d(x: np.ndarray, y: np.ndarray, order: int) -> np.ndarray:
    """Vectorized xy2d on the 2^order grid."""
    x = x.astype(np.int64).copy()
    y = y.astype(np.int64).copy()
    d = np.zeros_like(x)
    s = 1 << (order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        flip = (ry == 0) & (rx == 1)
        x2 = np.where(flip, s - 1 - x, x)
        y2 = np.where(flip, s - 1 - y, y)
        x, y = np.where(ry == 0, y2, x2), np.where(ry == 0, x2, y2)
        s >>= 1
    return d


def _hilbert_d64(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorized xy2d on the 64×64 grid (order 6)."""
    return _hilbert_d(x, y, 6)


def q_hilbert_locality(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Sum

    _, n_images = scale_counts(sf_dir)
    pts_dir = _persist(gen_points(min(n_images, 50_000)), "hilbert_pts")
    pts = rd.read_parquet(pts_dir, columns=["lon", "lat"])
    n = _HILBERT_N

    def part(t: pa.Table) -> pa.Table:
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        i = np.clip(((lon + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
        j = np.clip(((lat + 90.0) / 180.0 * n).astype(np.int64), 0, n - 1)
        key, cnt = np.unique(i * n + j, return_counts=True)
        return pa.table(
            {
                "cx": pa.array(key // n),
                "cy": pa.array(key % n),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    cells = (
        pts.map_batches(part, batch_format="pyarrow")
        .groupby(["cx", "cy"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    cx = cells["cx"].to_numpy(np.int64)
    cy = cells["cy"].to_numpy(np.int64)
    cn = cells["n"].to_numpy(np.int64)
    d = _hilbert_d(cx, cy, _HILBERT_ORDER)
    order = np.argsort(d)  # d is a bijection -> unique, total order
    cx, cy, cn = cx[order], cy[order], cn[order]
    m = len(cx)
    b = (16 * np.arange(m, dtype=np.int64)) // m
    out = []
    for bk in np.unique(b):
        sel = b == bk
        out.append(
            {
                "bucket": int(bk),
                "n_points": int(cn[sel].sum()),
                "n_cells": int(sel.sum()),
                "min_cx": int(cx[sel].min()),
                "max_cx": int(cx[sel].max()),
                "min_cy": int(cy[sel].min()),
                "max_cy": int(cy[sel].max()),
            }
        )
    return pd.DataFrame(out).astype(np.int64).sort_values("bucket", ignore_index=True)


def _hilbert_sql(pts_glob: str) -> str:
    # one CTE per fold step; (x, y, d) carried through s = 128..1.
    # Negative intermediates are intended (two's-complement & matches
    # numpy); rx/ry test the sign-safe (x & s) > 0.
    steps = []
    prev = "c0"
    s_list = tuple(1 << k for k in range(_HILBERT_ORDER - 1, -1, -1))
    for i, s in enumerate(s_list, start=1):
        cur = f"c{i}"
        steps.append(
            f"""{cur} AS (
  SELECT cx, cy, n,
         d + {s * s} * (xor(3 * rx, ry)) AS d,
         CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN {s} - 1 - y ELSE y END)
              ELSE x END AS x,
         CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN {s} - 1 - x ELSE x END)
              ELSE y END AS y
  FROM (SELECT cx, cy, n, d, x, y,
               CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END AS rx,
               CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END AS ry
        FROM {prev}))"""
        )
        prev = cur
    chain = ",\n".join(steps)
    g = _HILBERT_N
    return f"""
WITH p AS (SELECT
        LEAST(GREATEST(CAST(trunc((lon + 180.0) / 360.0 * {g}) AS BIGINT), 0), {g - 1}) AS cx,
        LEAST(GREATEST(CAST(trunc((lat + 90.0) / 180.0 * {g}) AS BIGINT), 0), {g - 1}) AS cy
      FROM read_parquet('{pts_glob}')),
cells AS (SELECT cx, cy, COUNT(*) AS n FROM p GROUP BY 1, 2),
c0 AS (SELECT cx, cy, n, CAST(0 AS BIGINT) AS d, CAST(cx AS BIGINT) AS x,
              CAST(cy AS BIGINT) AS y FROM cells),
{chain},
ranked AS (SELECT cx, cy, n,
                  row_number() OVER (ORDER BY d) - 1 AS rk,
                  COUNT(*) OVER () AS m
           FROM {prev})
SELECT CAST((16 * rk) // m AS BIGINT) AS bucket,
       CAST(SUM(n) AS BIGINT) AS n_points,
       COUNT(*) AS n_cells,
       CAST(MIN(cx) AS BIGINT) AS min_cx, CAST(MAX(cx) AS BIGINT) AS max_cx,
       CAST(MIN(cy) AS BIGINT) AS min_cy, CAST(MAX(cy) AS BIGINT) AS max_cy
FROM ranked
GROUP BY 1 ORDER BY bucket
"""


# --------------------------------------------------------------------------
# Grid non-max-suppression peaks — the detector post-process shape:
# level-6 cells whose point count STRICTLY exceeds all 8 neighbors
# (missing neighbor counts as 0) are density peaks; suppressing
# non-maxima turns the heatmap into a site list.  Bounded-grid scan +
# driver mask; SQL verifies peakness via NOT EXISTS over the 8-offset
# neighbor join.
# --------------------------------------------------------------------------


def q_grid_nms_peaks(sf_dir: str):
    c6 = _cell64_counts(sf_dir, "nms_pts")
    grid = np.zeros((64, 64), dtype=np.int64)
    grid[c6["cx"].to_numpy(np.int64), c6["cy"].to_numpy(np.int64)] = c6[
        "n"
    ].to_numpy(np.int64)
    p = np.pad(grid, 1)
    nbr_max = np.maximum.reduce(
        [
            p[1 + dx : 65 + dx, 1 + dy : 65 + dy]
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            if (dx, dy) != (0, 0)
        ]
    )
    cx, cy = np.nonzero((grid > 0) & (grid > nbr_max))
    return pd.DataFrame(
        {
            "cx": cx.astype(np.int64),
            "cy": cy.astype(np.int64),
            "n_points": grid[cx, cy],
        }
    ).sort_values(["cx", "cy"], ignore_index=True)


def _nms_sql(pts_glob: str) -> str:
    return f"""
WITH p AS (SELECT
        LEAST(GREATEST(CAST(trunc((lon + 180.0) / 360.0 * 64) AS BIGINT), 0), 63) AS cx,
        LEAST(GREATEST(CAST(trunc((lat + 90.0) / 180.0 * 64) AS BIGINT), 0), 63) AS cy
      FROM read_parquet('{pts_glob}')),
c AS (SELECT cx, cy, COUNT(*) AS n FROM p GROUP BY 1, 2),
off AS (SELECT a.range AS dx, b.range AS dy
        FROM range(-1, 2) a CROSS JOIN range(-1, 2) b
        WHERE NOT (a.range = 0 AND b.range = 0))
SELECT cx, cy, CAST(n AS BIGINT) AS n_points
FROM c
WHERE NOT EXISTS (SELECT 1 FROM c nb JOIN off
                    ON nb.cx = c.cx + dx AND nb.cy = c.cy + dy
                  WHERE nb.n >= c.n)
ORDER BY cx, cy
"""


GEO_QUERIES.update(
    {
        "hilbert_locality": q_hilbert_locality,
        "grid_nms_peaks": q_grid_nms_peaks,
    }
)
EXTRA_ORACLE_SQL["hilbert_locality"] = _hilbert_sql(
    f"{_ORACLE_DIR}/hilbert_pts/*.parquet"
)
EXTRA_ORACLE_SQL["grid_nms_peaks"] = _nms_sql(f"{_ORACLE_DIR}/nms_pts/*.parquet")


# --------------------------------------------------------------------------
# Edge squared-length spectrum over the decomposed ring corpus — the
# resolution audit a tiling planner runs to pick a snap grid: every
# directed ring edge's EXACT integer squared length (e5 fixed-point
# coords, so dx²+dy² is exact) lands in its bit-length bucket
# (floor(log2)+1, computed by integer power-table searchsorted on the
# Ray side and length(printf('%b', v)) in SQL — no float log anywhere).
# Per bucket: edge count and exact min/max squared length.
# --------------------------------------------------------------------------

_POW2 = (2 ** np.arange(63, dtype=np.uint64)).astype(np.int64)


def q_geo_edge_len2_hist(sf_dir: str):
    from ray.data.aggregate import Max, Min, Sum

    from ..cells.grid import _rl_arange

    simple = _simple_rings_cached(sf_dir)
    _persist(simple.map_batches(_verts_batch, batch_format="pyarrow"), "len2_verts")

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "bucket": pa.array([], pa.int64()),
                "n_edges": pa.array([], pa.int64()),
                "min_len2": pa.array([], pa.int64()),
                "max_len2": pa.array([], pa.int64()),
            }
        )
        if t.num_columns == 0 or t.num_rows == 0:
            return empty
        col = t["ring"].combine_chunks()
        offs = np.asarray(col.offsets).astype(np.int64)
        coords = np.asarray(col.values.values, dtype=np.float64).reshape(-1, 2)
        vlen = offs[1:] - offs[:-1]
        closed = (coords[offs[:-1]] == coords[np.maximum(offs[1:] - 1, 0)]).all(axis=1)
        closed &= vlen > 1
        olen = vlen - closed.astype(np.int64)
        gather = _rl_arange(offs[:-1], olen)
        oc = coords[gather]
        xi = np.floor(oc[:, 0] * 1e5).astype(np.int64)
        yi = np.floor(oc[:, 1] * 1e5).astype(np.int64)
        ostart = np.concatenate([[0], np.cumsum(olen)[:-1]]).astype(np.int64)
        nxt = np.arange(len(oc), dtype=np.int64) + 1
        nxt[ostart + olen - 1] = ostart
        dx = xi[nxt] - xi
        dy = yi[nxt] - yi
        len2 = dx * dx + dy * dy
        bucket = np.searchsorted(_POW2, len2, side="right")  # bit length; 0 → 0
        if len(len2) == 0:
            return empty
        u, inv = np.unique(bucket, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        mn = np.full(len(u), np.iinfo(np.int64).max)
        mx = np.full(len(u), np.iinfo(np.int64).min)
        np.minimum.at(mn, inv, len2)
        np.maximum.at(mx, inv, len2)
        return pa.table(
            {
                "bucket": pa.array(u.astype(np.int64)),
                "n_edges": pa.array(n),
                "min_len2": pa.array(mn),
                "max_len2": pa.array(mx),
            }
        )

    return (
        simple.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(
            Sum("n_edges", alias_name="n_edges"),
            Min("min_len2", alias_name="min_len2"),
            Max("max_len2", alias_name="max_len2"),
        )
    )


_LEN2_SQL = f"""
WITH v AS (SELECT geom_id, ring_seq, vidx,
                  CAST(floor(x * 100000.0) AS BIGINT) AS xi,
                  CAST(floor(y * 100000.0) AS BIGINT) AS yi
           FROM read_parquet('{_ORACLE_DIR}/len2_verts/*.parquet')),
n AS (SELECT geom_id, ring_seq, COUNT(*) AS m FROM v GROUP BY geom_id, ring_seq),
e AS (SELECT (b.xi - a.xi) * (b.xi - a.xi)
              + (b.yi - a.yi) * (b.yi - a.yi) AS len2
      FROM v a
      JOIN n USING (geom_id, ring_seq)
      JOIN v b ON b.geom_id = a.geom_id AND b.ring_seq = a.ring_seq
              AND b.vidx = (a.vidx + 1) % n.m)
SELECT CAST(CASE WHEN len2 = 0 THEN 0
                 ELSE length(printf('%b', len2)) END AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(MIN(len2) AS BIGINT) AS min_len2,
       CAST(MAX(len2) AS BIGINT) AS max_len2
FROM e GROUP BY bucket
"""

GEO_QUERIES.update({"geo_edge_len2_hist": q_geo_edge_len2_hist})
EXTRA_ORACLE_SQL["geo_edge_len2_hist"] = _LEN2_SQL


# --------------------------------------------------------------------------
# Ordered (Bayer 4×4) dithering audit — the 1-bit preview a thumbnail
# pipeline generates: per image, how many pixels turn "on" under the
# position-dependent Bayer threshold, and how many FLIP versus the
# naive global 50% threshold (the dither's whole point — flips measure
# recovered tonal detail).  Exact integer predicates on the
# channel-summed pixel: on ⇔ 32·p > 1530·B(x,y) + 765, naive ⇔
# 2·p > 765; the SQL replays both from the persisted payload with the
# Bayer matrix as a flat list literal.
# --------------------------------------------------------------------------

_BAYER4 = np.array(
    [[0, 8, 2, 10], [12, 4, 14, 6], [3, 11, 1, 9], [15, 7, 13, 5]], np.int64
)


def q_image_bayer_dither(sf_dir: str):
    n = _persist_media_inputs(sf_dir)
    imgs = gen_images(n)

    def dither(t: pa.Table) -> pa.Table:
        ws = t["w"].to_pylist()
        hs = t["h"].to_pylist()
        fmts = t["fmt"].to_pylist()
        payloads = t["bytes"].to_pylist()
        n_on, n_flip, npx = [], [], []
        for w, h, fmt, payload in zip(ws, hs, fmts, payloads):
            px = decode(payload, w, h, fmt).astype(np.int64).sum(axis=2)
            bay = _BAYER4[np.arange(h) % 4][:, np.arange(w) % 4]
            on = 32 * px > 1530 * bay + 765
            naive = 2 * px > 765
            n_on.append(int(on.sum()))
            n_flip.append(int((on != naive).sum()))
            npx.append(w * h)
        return pa.table(
            {
                "image_id": t["image_id"],
                "n_on": pa.array(n_on, pa.int64()),
                "n_flip": pa.array(n_flip, pa.int64()),
                "n_pix": pa.array(npx, pa.int64()),
            }
        )

    return imgs.map_batches(dither, batch_format="pyarrow")


_BAYER_LIST_SQL = "[0,8,2,10,12,4,14,6,3,11,1,9,15,7,13,5]"

_IMG_BAYER_SQL = f"""
WITH base AS MATERIALIZED (
  SELECT image_id, fmt, b, w, h, CAST(w AS BIGINT) * h AS n_pix
  FROM read_parquet('{_ORACLE_DIR}/media_in/*.parquet'))
SELECT image_id,
  CAST(list_sum([CASE WHEN 32 * {_gq_pix("p")} >
       1530 * list_extract({_BAYER_LIST_SQL},
                           1 + ((p // w) % 4) * 4 + (p % w) % 4) + 765
       THEN 1 ELSE 0 END for p in generate_series(0, n_pix - 1)])
       AS BIGINT) AS n_on,
  CAST(list_sum([CASE WHEN (32 * {_gq_pix("p")} >
       1530 * list_extract({_BAYER_LIST_SQL},
                           1 + ((p // w) % 4) * 4 + (p % w) % 4) + 765)
       != (2 * {_gq_pix("p")} > 765)
       THEN 1 ELSE 0 END for p in generate_series(0, n_pix - 1)])
       AS BIGINT) AS n_flip,
  n_pix
FROM base
"""

GEO_QUERIES.update({"image_bayer_dither": q_image_bayer_dither})
EXTRA_ORACLE_SQL["image_bayer_dither"] = _IMG_BAYER_SQL


# --------------------------------------------------------------------------
# Nyquist / checkerboard energy — the upsampling-artifact score an
# image-QA stage computes: the exact integer response of the
# channel-summed grid to the three highest-frequency sign patterns,
# Σ(−1)^(x+y)·p (checkerboard), Σ(−1)^x·p (column comb) and
# Σ(−1)^y·p (row comb).  One vectorized signed fold per image on the
# Ray side; the SQL replays the signs from the pixel index parity.
# --------------------------------------------------------------------------


def q_image_nyquist_energy(sf_dir: str):
    n = _persist_media_inputs(sf_dir)
    imgs = gen_images(n)

    def nyq(t: pa.Table) -> pa.Table:
        ws = t["w"].to_pylist()
        hs = t["h"].to_pylist()
        fmts = t["fmt"].to_pylist()
        payloads = t["bytes"].to_pylist()
        xy, xs, ys = [], [], []
        for w, h, fmt, payload in zip(ws, hs, fmts, payloads):
            px = decode(payload, w, h, fmt).astype(np.int64).sum(axis=2)
            sx = np.where(np.arange(w) % 2 == 0, 1, -1).astype(np.int64)
            sy = np.where(np.arange(h) % 2 == 0, 1, -1).astype(np.int64)
            col = px.sum(axis=0)
            row = px.sum(axis=1)
            xs.append(int((col * sx).sum()))
            ys.append(int((row * sy).sum()))
            xy.append(int(((px * sx[None, :]) * sy[:, None]).sum()))
        return pa.table(
            {
                "image_id": t["image_id"],
                "nyq_xy": pa.array(xy, pa.int64()),
                "nyq_x": pa.array(xs, pa.int64()),
                "nyq_y": pa.array(ys, pa.int64()),
            }
        )

    return imgs.map_batches(nyq, batch_format="pyarrow")


_IMG_NYQ_SQL = f"""
WITH base AS MATERIALIZED (
  SELECT image_id, fmt, b, w, h, CAST(w AS BIGINT) * h AS n_pix
  FROM read_parquet('{_ORACLE_DIR}/media_in/*.parquet'))
SELECT image_id,
  CAST(list_sum([(1 - 2 * ((p % w + p // w) % 2)) * {_gq_pix("p")}
       for p in generate_series(0, n_pix - 1)]) AS BIGINT) AS nyq_xy,
  CAST(list_sum([(1 - 2 * ((p % w) % 2)) * {_gq_pix("p")}
       for p in generate_series(0, n_pix - 1)]) AS BIGINT) AS nyq_x,
  CAST(list_sum([(1 - 2 * ((p // w) % 2)) * {_gq_pix("p")}
       for p in generate_series(0, n_pix - 1)]) AS BIGINT) AS nyq_y
FROM base
"""

GEO_QUERIES.update({"image_nyquist_energy": q_image_nyquist_energy})
EXTRA_ORACLE_SQL["image_nyquist_energy"] = _IMG_NYQ_SQL


# --------------------------------------------------------------------------
# image 4x4 block Walsh–Hadamard band energy — the transform-domain
# texture probe (the integer cousin of a DCT band split): each
# complete 4x4 pixel block of the channel-summed image is projected
# onto three Walsh patterns (horizontal half-band [+ + - -],
# vertical half-band, and the checkerboard-in-blocks [+ - - +] x
# [+ - - +]) and the squared coefficients sum per image.  All
# arithmetic is int64 (coefficients < 2^16, energies < 2^53, so the
# oracle's double-typed list_sum is exact).  SQL replays the exact
# block/index arithmetic from the persisted payload bytes.
# --------------------------------------------------------------------------

_WHT_SGN2 = (1, 1, -1, -1)
_WHT_SGN3 = (1, -1, -1, 1)


def q_image_hadamard_energy(sf_dir: str):
    n = _persist_media_inputs(sf_dir)
    imgs = gen_images(n)
    sgn2 = np.asarray(_WHT_SGN2, np.int64)
    sgn3 = np.asarray(_WHT_SGN3, np.int64)

    def wht(t: pa.Table) -> pa.Table:
        ws = t["w"].to_pylist()
        hs = t["h"].to_pylist()
        fmts = t["fmt"].to_pylist()
        payloads = t["bytes"].to_pylist()
        ex, ey, exy = [], [], []
        for w, h, fmt, payload in zip(ws, hs, fmts, payloads):
            px = decode(payload, w, h, fmt).astype(np.int64).sum(axis=2)
            h4, w4 = h // 4, w // 4
            v = px[: h4 * 4, : w4 * 4].reshape(h4, 4, w4, 4)
            cx = (v * sgn2[None, None, None, :]).sum(axis=(1, 3))
            cy = (v * sgn2[None, :, None, None]).sum(axis=(1, 3))
            cxy = (v * sgn3[None, None, None, :] * sgn3[None, :, None, None]).sum(
                axis=(1, 3)
            )
            ex.append(int((cx * cx).sum()))
            ey.append(int((cy * cy).sum()))
            exy.append(int((cxy * cxy).sum()))
        return pa.table(
            {
                "image_id": t["image_id"],
                "had_x": pa.array(ex, pa.int64()),
                "had_y": pa.array(ey, pa.int64()),
                "had_xy": pa.array(exy, pa.int64()),
            }
        )

    return imgs.map_batches(wht, batch_format="pyarrow")


def _wht_coeff_sql(sgnx, sgny) -> str:
    """SQL for one 4x4 block's Walsh coefficient at block index b."""
    b0 = "(((bk // (w // 4)) * 4) * w + (bk % (w // 4)) * 4)"
    terms = []
    for y in range(4):
        for x in range(4):
            s = sgnx[x] * sgny[y]
            op = "+" if s > 0 else "-"
            terms.append(f"{op} {_gq_pix(f'{b0} + {y} * w + {x}')}")
    return " ".join(terms)


def _wht_band_sql(sgnx, sgny, alias: str) -> str:
    coeff = _wht_coeff_sql(sgnx, sgny)
    return (
        f"CAST(list_sum([power({coeff}, 2) "
        f"for bk in generate_series(0, (w // 4) * (h // 4) - 1)]) AS BIGINT) AS {alias}"
    )


_ONES4 = (1, 1, 1, 1)

_IMG_WHT_SQL = f"""
WITH base AS MATERIALIZED (
  SELECT image_id, fmt, b, w, h
  FROM read_parquet('{_ORACLE_DIR}/media_in/*.parquet'))
SELECT image_id,
  {_wht_band_sql(_WHT_SGN2, _ONES4, "had_x")},
  {_wht_band_sql(_ONES4, _WHT_SGN2, "had_y")},
  {_wht_band_sql(_WHT_SGN3, _WHT_SGN3, "had_xy")}
FROM base
"""

GEO_QUERIES.update({"image_hadamard_energy": q_image_hadamard_energy})
EXTRA_ORACLE_SQL["image_hadamard_energy"] = _IMG_WHT_SQL


# --------------------------------------------------------------------------
# geo ring diameter — per decomposed ring, the exact max squared
# vertex-pair distance at the e5 quantization grid (int64 throughout;
# the true geometric diameter of the vertex set).  Per-ring work is
# block-local: rings are small (bounded vertex count per geometry),
# so the O(V^2) pair scan vectorizes inside the block and nothing
# shuffles.  SQL replays it as a per-ring self-join on the persisted
# ordered vertex table.
# --------------------------------------------------------------------------


def _diam_batch(t: pa.Table) -> pa.Table:
    from ..cells.grid import _rl_arange

    empty = pa.table(
        {
            "geom_id": pa.array([], type=pa.string()),
            "ring_seq": pa.array([], type=pa.int32()),
            "n_verts": pa.array([], type=pa.int64()),
            "diam2_e10": pa.array([], type=pa.int64()),
        }
    )
    if t.num_columns == 0 or t.num_rows == 0:
        return empty
    col = t["ring"].combine_chunks()
    offs = np.asarray(col.offsets).astype(np.int64)
    coords = np.asarray(col.values.values, dtype=np.float64).reshape(-1, 2)
    vlen = offs[1:] - offs[:-1]
    closed = (coords[offs[:-1]] == coords[np.maximum(offs[1:] - 1, 0)]).all(axis=1)
    closed &= vlen > 1
    olen = vlen - closed.astype(np.int64)
    gather = _rl_arange(offs[:-1], olen)
    oc = coords[gather]
    xi = np.floor(oc[:, 0] * 1e5).astype(np.int64)
    yi = np.floor(oc[:, 1] * 1e5).astype(np.int64)
    ostart = np.concatenate([[0], np.cumsum(olen)[:-1]]).astype(np.int64)
    diam = np.zeros(len(t), np.int64)
    for i in range(len(t)):
        s, m = int(ostart[i]), int(olen[i])
        if m < 2:
            continue
        x, y = xi[s : s + m], yi[s : s + m]
        dx = x[:, None] - x[None, :]
        dy = y[:, None] - y[None, :]
        diam[i] = int((dx * dx + dy * dy).max())
    return pa.table(
        {
            "geom_id": t["geom_id"],
            "ring_seq": t["ring_seq"],
            "n_verts": pa.array(olen.astype(np.int64)),
            "diam2_e10": pa.array(diam),
        }
    )


def q_geo_ring_diameter(sf_dir: str):
    simple = _simple_rings_cached(sf_dir)
    _persist(simple.map_batches(_verts_batch, batch_format="pyarrow"), "diam_verts")
    return simple.map_batches(_diam_batch, batch_format="pyarrow")


_DIAM_SQL = f"""
WITH v AS (SELECT geom_id, ring_seq, vidx,
                  CAST(floor(x * 100000.0) AS BIGINT) AS xi,
                  CAST(floor(y * 100000.0) AS BIGINT) AS yi
           FROM read_parquet('{_ORACLE_DIR}/diam_verts/*.parquet'))
SELECT a.geom_id, a.ring_seq,
       CAST(COUNT(DISTINCT a.vidx) AS BIGINT) AS n_verts,
       CAST(MAX((a.xi - b.xi) * (a.xi - b.xi)
              + (a.yi - b.yi) * (a.yi - b.yi)) AS BIGINT) AS diam2_e10
FROM v a
JOIN v b ON b.geom_id = a.geom_id AND b.ring_seq = a.ring_seq
GROUP BY a.geom_id, a.ring_seq
"""

GEO_QUERIES.update({"geo_ring_diameter": q_geo_ring_diameter})
EXTRA_ORACLE_SQL["geo_ring_diameter"] = _DIAM_SQL


# --------------------------------------------------------------------------
# image erosion/dilation audit — binary morphology with the von
# Neumann (4-neighbor cross) structuring element over the image
# binarized AT ITS OWN MEAN: a pixel is "bright" iff px·n_pix >
# Σpx (integer cross-multiplied, so the mean never exists as a
# float).  Per image: interior pixel count, erosion survivors (all 5
# cross pixels bright) and dilation hits (any of the 5 bright).
# All block-local; SQL replays the cross from the persisted payload.
# --------------------------------------------------------------------------


def q_image_erosion_audit(sf_dir: str):
    n = _persist_media_inputs(sf_dir)
    imgs = gen_images(n)

    def erode(t: pa.Table) -> pa.Table:
        ws = t["w"].to_pylist()
        hs = t["h"].to_pylist()
        fmts = t["fmt"].to_pylist()
        payloads = t["bytes"].to_pylist()
        n_int, n_ero, n_dil = [], [], []
        for w, h, fmt, payload in zip(ws, hs, fmts, payloads):
            px = decode(payload, w, h, fmt).astype(np.int64).sum(axis=2)
            bright = px * (w * h) > int(px.sum())
            c = bright[1:-1, 1:-1]
            up = bright[:-2, 1:-1]
            dn = bright[2:, 1:-1]
            lf = bright[1:-1, :-2]
            rt = bright[1:-1, 2:]
            n_int.append(int(c.size))
            n_ero.append(int((c & up & dn & lf & rt).sum()))
            n_dil.append(int((c | up | dn | lf | rt).sum()))
        return pa.table(
            {
                "image_id": t["image_id"],
                "n_interior": pa.array(n_int, pa.int64()),
                "n_eroded": pa.array(n_ero, pa.int64()),
                "n_dilated": pa.array(n_dil, pa.int64()),
            }
        )

    return imgs.map_batches(erode, batch_format="pyarrow")


def _bright_sql(q: str) -> str:
    return f"(CASE WHEN {_gq_pix(q)} * n_pix > s THEN 1 ELSE 0 END)"


_IMG_ERO_SQL = f"""
WITH base AS MATERIALIZED (
  SELECT image_id, fmt, b, w, h, CAST(w AS BIGINT) * h AS n_pix,
         CAST(list_sum([{_gq_pix("p")}
              for p in generate_series(0, CAST(w AS BIGINT) * h - 1)]) AS BIGINT) AS s
  FROM read_parquet('{_ORACLE_DIR}/media_in/*.parquet'))
SELECT image_id,
  CAST((w - 2) * (h - 2) AS BIGINT) AS n_interior,
  CAST(list_sum([CASE WHEN p % w BETWEEN 1 AND w - 2 AND p // w BETWEEN 1 AND h - 2
       AND {_bright_sql("p")} + {_bright_sql("p - 1")} + {_bright_sql("p + 1")}
         + {_bright_sql("p - w")} + {_bright_sql("p + w")} = 5
       THEN 1 ELSE 0 END for p in generate_series(0, n_pix - 1)]) AS BIGINT) AS n_eroded,
  CAST(list_sum([CASE WHEN p % w BETWEEN 1 AND w - 2 AND p // w BETWEEN 1 AND h - 2
       AND {_bright_sql("p")} + {_bright_sql("p - 1")} + {_bright_sql("p + 1")}
         + {_bright_sql("p - w")} + {_bright_sql("p + w")} >= 1
       THEN 1 ELSE 0 END for p in generate_series(0, n_pix - 1)]) AS BIGINT) AS n_dilated
FROM base
"""

GEO_QUERIES.update({"image_erosion_audit": q_image_erosion_audit})
EXTRA_ORACLE_SQL["image_erosion_audit"] = _IMG_ERO_SQL


# --------------------------------------------------------------------------
# geo x-monotone chain census — per decomposed ring, the number of
# maximal x-monotone chains: walk the cyclic edge sequence, keep the
# nonzero signs of dx (at the e5 grid), and count cyclic adjacent
# sign flips.  A convex ring has exactly 2; staircase geometries
# score high.  Block-local per ring; SQL replays it from the
# persisted ordered vertex table with a window LAG whose first-row
# hole is patched by the cyclic last sign.
# --------------------------------------------------------------------------


def _monotone_batch(t: pa.Table) -> pa.Table:
    from ..cells.grid import _rl_arange

    empty = pa.table(
        {
            "geom_id": pa.array([], type=pa.string()),
            "ring_seq": pa.array([], type=pa.int32()),
            "n_chains": pa.array([], type=pa.int64()),
            "n_flat_edges": pa.array([], type=pa.int64()),
        }
    )
    if t.num_columns == 0 or t.num_rows == 0:
        return empty
    col = t["ring"].combine_chunks()
    offs = np.asarray(col.offsets).astype(np.int64)
    coords = np.asarray(col.values.values, dtype=np.float64).reshape(-1, 2)
    vlen = offs[1:] - offs[:-1]
    closed = (coords[offs[:-1]] == coords[np.maximum(offs[1:] - 1, 0)]).all(axis=1)
    closed &= vlen > 1
    olen = vlen - closed.astype(np.int64)
    gather = _rl_arange(offs[:-1], olen)
    oc = coords[gather]
    xi = np.floor(oc[:, 0] * 1e5).astype(np.int64)
    ostart = np.concatenate([[0], np.cumsum(olen)[:-1]]).astype(np.int64)
    chains = np.zeros(len(t), np.int64)
    flats = np.zeros(len(t), np.int64)
    for i in range(len(t)):
        s, m = int(ostart[i]), int(olen[i])
        if m < 2:
            continue
        x = xi[s : s + m]
        dx = np.roll(x, -1) - x  # edge i: v_i -> v_{i+1 mod m}
        sg = np.sign(dx)
        flats[i] = int((sg == 0).sum())
        nz = sg[sg != 0]
        if len(nz) == 0:
            continue
        chains[i] = int((nz != np.roll(nz, 1)).sum())
    return pa.table(
        {
            "geom_id": t["geom_id"],
            "ring_seq": t["ring_seq"],
            "n_chains": pa.array(chains),
            "n_flat_edges": pa.array(flats),
        }
    )


def q_geo_x_monotone_chains(sf_dir: str):
    simple = _simple_rings_cached(sf_dir)
    _persist(simple.map_batches(_verts_batch, batch_format="pyarrow"), "mono_verts")
    return simple.map_batches(_monotone_batch, batch_format="pyarrow")


_MONO_SQL = f"""
WITH v AS (SELECT geom_id, ring_seq, vidx,
                  CAST(floor(x * 100000.0) AS BIGINT) AS xi
           FROM read_parquet('{_ORACLE_DIR}/mono_verts/*.parquet')),
n AS (SELECT geom_id, ring_seq, COUNT(*) AS m FROM v GROUP BY geom_id, ring_seq),
e AS (SELECT c.geom_id, c.ring_seq, c.vidx,
             sign(x.xi - c.xi) AS s
      FROM v c
      JOIN n ON n.geom_id = c.geom_id AND n.ring_seq = c.ring_seq
      JOIN v x ON x.geom_id = c.geom_id AND x.ring_seq = c.ring_seq
              AND x.vidx = (c.vidx + 1) % n.m
      WHERE n.m >= 2),
nz AS (SELECT geom_id, ring_seq, vidx, s,
              ROW_NUMBER() OVER w AS rn, COUNT(*) OVER (PARTITION BY geom_id, ring_seq) AS k
       FROM e WHERE s <> 0
       WINDOW w AS (PARTITION BY geom_id, ring_seq ORDER BY vidx)),
lastv AS (SELECT geom_id, ring_seq, s AS slast FROM nz WHERE rn = k),
ch AS (SELECT nz.geom_id, nz.ring_seq,
              CASE WHEN nz.s <> COALESCE(LAG(nz.s) OVER
                     (PARTITION BY nz.geom_id, nz.ring_seq ORDER BY nz.rn), l.slast)
                   THEN 1 ELSE 0 END AS flip
       FROM nz JOIN lastv l ON l.geom_id = nz.geom_id AND l.ring_seq = nz.ring_seq),
agg AS (SELECT geom_id, ring_seq, CAST(SUM(flip) AS BIGINT) AS n_chains
        FROM ch GROUP BY geom_id, ring_seq),
fl AS (SELECT geom_id, ring_seq,
              CAST(SUM(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flat_edges
       FROM e GROUP BY geom_id, ring_seq)
SELECT fl.geom_id, fl.ring_seq,
       COALESCE(agg.n_chains, 0) AS n_chains, fl.n_flat_edges
FROM fl LEFT JOIN agg ON agg.geom_id = fl.geom_id AND agg.ring_seq = fl.ring_seq
"""

GEO_QUERIES.update({"geo_x_monotone_chains": q_geo_x_monotone_chains})
EXTRA_ORACLE_SQL["geo_x_monotone_chains"] = _MONO_SQL


# --------------------------------------------------------------------------
# image projection-profile peaks — the document-layout-analysis
# primitive: per image, the horizontal and vertical projection
# profiles (row sums / column sums of the channel-summed pixels) and
# their first argmax (index + value).  Ties break to the LOWEST index
# on both engines (numpy argmax first-occurrence == SQL list_position
# of the max).  All int64; block-local.
# --------------------------------------------------------------------------


def q_image_projection_peaks(sf_dir: str):
    n = _persist_media_inputs(sf_dir)
    imgs = gen_images(n)

    def peaks(t: pa.Table) -> pa.Table:
        ws = t["w"].to_pylist()
        hs = t["h"].to_pylist()
        fmts = t["fmt"].to_pylist()
        payloads = t["bytes"].to_pylist()
        pr, prv, pcx, pcv = [], [], [], []
        for w, h, fmt, payload in zip(ws, hs, fmts, payloads):
            px = decode(payload, w, h, fmt).astype(np.int64).sum(axis=2)
            rows = px.sum(axis=1)
            cols = px.sum(axis=0)
            pr.append(int(rows.argmax()))
            prv.append(int(rows.max()))
            pcx.append(int(cols.argmax()))
            pcv.append(int(cols.max()))
        return pa.table(
            {
                "image_id": t["image_id"],
                "peak_row": pa.array(pr, pa.int64()),
                "peak_row_val": pa.array(prv, pa.int64()),
                "peak_col": pa.array(pcx, pa.int64()),
                "peak_col_val": pa.array(pcv, pa.int64()),
            }
        )

    return imgs.map_batches(peaks, batch_format="pyarrow")


_IMG_PROJ_SQL = f"""
WITH base AS MATERIALIZED (
  SELECT image_id, fmt, b, w, h
  FROM read_parquet('{_ORACLE_DIR}/media_in/*.parquet')),
proj AS (SELECT image_id,
  [CAST(list_sum([{_gq_pix("y * w + x")} for x in generate_series(0, w - 1)]) AS BIGINT)
   for y in generate_series(0, h - 1)] AS rl,
  [CAST(list_sum([{_gq_pix("y * w + x")} for y in generate_series(0, h - 1)]) AS BIGINT)
   for x in generate_series(0, w - 1)] AS cl
  FROM base)
SELECT image_id,
  CAST(list_position(rl, list_aggregate(rl, 'max')) - 1 AS BIGINT) AS peak_row,
  CAST(list_aggregate(rl, 'max') AS BIGINT) AS peak_row_val,
  CAST(list_position(cl, list_aggregate(cl, 'max')) - 1 AS BIGINT) AS peak_col,
  CAST(list_aggregate(cl, 'max') AS BIGINT) AS peak_col_val
FROM proj
"""

GEO_QUERIES.update({"image_projection_peaks": q_image_projection_peaks})
EXTRA_ORACLE_SQL["image_projection_peaks"] = _IMG_PROJ_SQL


# --------------------------------------------------------------------------
# geo point→edge distance — the exact "distance to coastline" query:
# for a deterministic probe subset of the geotagged points, the exact
# minimum squared distance (e10 units, e5 grid) to ANY decomposed
# ring edge.  Per edge the true value is min(endpoint distances) or,
# when the perpendicular foot lands inside the segment, the floor
# quotient cross²//den whose intermediate square exceeds int64 — the
# kernel runs a float64 pre-pass to shortlist candidate edges (~1-2
# per point; float error 1e-16·value vs a 1e-9 shortlist margin, so
# the true argmin can't be excluded), then evaluates the shortlist in
# exact Python ints.  The edge table is a broadcast bounded dim; SQL
# replays the full cross join in HUGEINT.
# --------------------------------------------------------------------------

_PED_MAX_POINTS = 2000


def q_geo_point_edge_dist(sf_dir: str):
    import ray

    simple = _simple_rings_cached(sf_dir)
    edges_ds = simple.map_batches(_edges_batch, batch_format="pyarrow")
    _persist(edges_ds, "ped_edges")
    ed = edges_ds.to_pandas()  # bounded: the decomposed fixture corpus
    ax = np.floor(ed["xi"].to_numpy() * 1e5).astype(np.int64)
    ay = np.floor(ed["yi"].to_numpy() * 1e5).astype(np.int64)
    bx = np.floor(ed["xj"].to_numpy() * 1e5).astype(np.int64)
    by = np.floor(ed["yj"].to_numpy() * 1e5).astype(np.int64)
    eref = ray.put((ax, ay, bx, by))

    _, n_images = scale_counts(sf_dir)
    n = min(n_images, _PED_MAX_POINTS)
    pts = gen_points(n)
    _persist(pts, "ped_points")

    def dist(t: pa.Table, _eref=eref) -> pa.Table:
        eax, eay, ebx, eby = ray.get(_eref)
        abx = ebx - eax
        aby = eby - eay
        den = abx * abx + aby * aby
        px = np.floor(t["lon"].to_numpy(zero_copy_only=False) * 1e5).astype(np.int64)
        py = np.floor(t["lat"].to_numpy(zero_copy_only=False) * 1e5).astype(np.int64)
        out = np.empty(len(px), np.int64)
        for i in range(len(px)):
            apx = px[i] - eax
            apy = py[i] - eay
            bpx = px[i] - ebx
            bpy = py[i] - eby
            d_end = np.minimum(apx * apx + apy * apy, bpx * bpx + bpy * bpy)
            dot = apx * abx + apy * aby
            inside = (den > 0) & (dot >= 0) & (dot <= den)
            cross = apx * aby - apy * abx
            d_f = d_end.astype(np.float64)
            d_f[inside] = (
                cross[inside].astype(np.float64) ** 2 / den[inside].astype(np.float64)
            )
            mf = d_f.min()
            cand = np.flatnonzero(d_f <= mf * (1.0 + 1e-9) + 2.0)
            best = None
            for j in cand:
                if inside[j]:
                    v = (int(cross[j]) ** 2) // int(den[j])
                else:
                    v = int(d_end[j])
                if best is None or v < best:
                    best = v
            out[i] = best
        return pa.table(
            {"image_id": t["image_id"], "d2_e10": pa.array(out)}
        )

    return pts.map_batches(dist, batch_format="pyarrow")


_PED_SQL = f"""
WITH e AS (SELECT CAST(floor(xi * 100000.0) AS BIGINT) AS ax,
                  CAST(floor(yi * 100000.0) AS BIGINT) AS ay,
                  CAST(floor(xj * 100000.0) AS BIGINT) AS bx,
                  CAST(floor(yj * 100000.0) AS BIGINT) AS by
           FROM read_parquet('{_ORACLE_DIR}/ped_edges/*.parquet')),
p AS (SELECT image_id,
             CAST(floor(lon * 100000.0) AS BIGINT) AS px,
             CAST(floor(lat * 100000.0) AS BIGINT) AS py
      FROM read_parquet('{_ORACLE_DIR}/ped_points/*.parquet')),
d AS (SELECT p.image_id,
        CASE WHEN (bx - ax) * (bx - ax) + (by - ay) * (by - ay) > 0
              AND (px - ax) * (bx - ax) + (py - ay) * (by - ay) >= 0
              AND (px - ax) * (bx - ax) + (py - ay) * (by - ay)
                  <= (bx - ax) * (bx - ax) + (by - ay) * (by - ay)
             THEN CAST((CAST((px - ax) * (by - ay) - (py - ay) * (bx - ax) AS HUGEINT)
                        * ((px - ax) * (by - ay) - (py - ay) * (bx - ax)))
                       // ((bx - ax) * (bx - ax) + (by - ay) * (by - ay)) AS BIGINT)
             ELSE LEAST((px - ax) * (px - ax) + (py - ay) * (py - ay),
                        (px - bx) * (px - bx) + (py - by) * (py - by))
        END AS d2
      FROM p CROSS JOIN e)
SELECT image_id, CAST(MIN(d2) AS BIGINT) AS d2_e10
FROM d GROUP BY image_id
"""

GEO_QUERIES.update({"geo_point_edge_dist": q_geo_point_edge_dist})
EXTRA_ORACLE_SQL["geo_point_edge_dist"] = _PED_SQL


# --------------------------------------------------------------------------
# image 3x3 median-filter denoise audit — per image: how many interior
# pixels a median filter would change, and the total absolute change.
# The 3x3 median of nine int64 channel-sums is the exact 5th order
# statistic (odd window → no interpolation; DuckDB's double-typed
# median of nine ints is the integral middle element, cast back
# exactly).  Block-local; SQL replays the nine-term window.
# --------------------------------------------------------------------------


def q_image_median_denoise(sf_dir: str):
    n = _persist_media_inputs(sf_dir)
    imgs = gen_images(n)

    def med(t: pa.Table) -> pa.Table:
        ws = t["w"].to_pylist()
        hs = t["h"].to_pylist()
        fmts = t["fmt"].to_pylist()
        payloads = t["bytes"].to_pylist()
        n_ch, s_abs = [], []
        for w, h, fmt, payload in zip(ws, hs, fmts, payloads):
            px = decode(payload, w, h, fmt).astype(np.int64).sum(axis=2)
            stack = np.stack(
                [
                    px[dy : h - 2 + dy, dx : w - 2 + dx]
                    for dy in range(3)
                    for dx in range(3)
                ]
            )
            m = np.sort(stack, axis=0)[4]
            c = px[1:-1, 1:-1]
            diff = np.abs(m - c)
            n_ch.append(int((diff > 0).sum()))
            s_abs.append(int(diff.sum()))
        return pa.table(
            {
                "image_id": t["image_id"],
                "n_changed": pa.array(n_ch, pa.int64()),
                "sum_abs_change": pa.array(s_abs, pa.int64()),
            }
        )

    return imgs.map_batches(med, batch_format="pyarrow")


_MED_WINDOW = ", ".join(
    _gq_pix(f"p + {dy} * w + {dx}") for dy in (-1, 0, 1) for dx in (-1, 0, 1)
)

_IMG_MED_SQL = f"""
WITH base AS MATERIALIZED (
  SELECT image_id, fmt, b, w, h, CAST(w AS BIGINT) * h AS n_pix
  FROM read_parquet('{_ORACLE_DIR}/media_in/*.parquet')),
d AS (SELECT image_id,
  [CASE WHEN p % w BETWEEN 1 AND w - 2 AND p // w BETWEEN 1 AND h - 2
        THEN abs(CAST(list_aggregate([{_MED_WINDOW}], 'median') AS BIGINT)
                 - {_gq_pix("p")})
        ELSE 0 END for p in generate_series(0, n_pix - 1)] AS diffs
  FROM base)
SELECT image_id,
  CAST(list_sum(list_transform(diffs, x -> CASE WHEN x > 0 THEN 1 ELSE 0 END))
       AS BIGINT) AS n_changed,
  CAST(list_sum(diffs) AS BIGINT) AS sum_abs_change
FROM d
"""

GEO_QUERIES.update({"image_median_denoise": q_image_median_denoise})
EXTRA_ORACLE_SQL["image_median_denoise"] = _IMG_MED_SQL


# --------------------------------------------------------------------------
# Moran's I spatial autocorrelation over the geotag heatmap — the
# spatial-statistics classic: are occupied level-6 cells with high
# image counts adjacent to other high-count cells?  The scale-free
# pieces are exact integers: with n occupied cells and S total
# points, dev_c = n·x_c − S, numerator Σ dev_i·dev_j over rook-
# adjacent occupied pairs and denominator Σ dev² — both can exceed
# int64, so they fold in Python big ints and travel as decimal
# strings (DuckDB replays in HUGEINT and casts to VARCHAR).  The
# per-cell aggregate is the bounded 64×64 domain; everything upstream
# is block-local bincounts.
# --------------------------------------------------------------------------


def q_cell_morans_i(sf_dir: str):
    import ray.data as rd

    _, n_images = scale_counts(sf_dir)
    pts_dir = _persist(gen_points(min(n_images, 50_000)), "morans_pts")
    pts = rd.read_parquet(pts_dir, columns=["lon", "lat"])
    n = 64

    def partial(t: pa.Table) -> pa.Table:
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        i = np.clip(((lon + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
        j = np.clip(((lat + 90.0) / 180.0 * n).astype(np.int64), 0, n - 1)
        cnt = np.bincount(i * n + j, minlength=n * n).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "cx": pa.array(nz // n),
                "cy": pa.array(nz % n),
                "x": pa.array(cnt[nz]),
            }
        )

    from ray.data.aggregate import Sum

    cells = (
        pts.map_batches(partial, batch_format="pyarrow")
        .groupby(["cx", "cy"])
        .aggregate(Sum("x", alias_name="x"))
        .to_pandas()  # bounded: 64x64 domain
    )
    cx = cells["cx"].to_numpy(np.int64)
    cy = cells["cy"].to_numpy(np.int64)
    x = cells["x"].to_numpy(np.int64)
    n_cells = len(cells)
    sx = int(x.sum())
    dev = n_cells * x - sx  # int64-safe: n_cells<=4096, x<=5e4
    grid = {}
    for k in range(n_cells):
        grid[(int(cx[k]), int(cy[k]))] = int(dev[k])
    num = 0
    w_pairs = 0
    for k in range(n_cells):
        a = (int(cx[k]), int(cy[k]))
        for b in ((a[0] + 1, a[1]), (a[0], a[1] + 1)):
            if b in grid:
                num += grid[a] * grid[b]  # Python ints: no overflow
                w_pairs += 1
    den = int(sum(int(d) * int(d) for d in dev))
    return pd.DataFrame(
        {
            "n_cells": np.array([n_cells], np.int64),
            "w_pairs": np.array([w_pairs], np.int64),
            "num_scaled": pd.Series([str(num)], dtype=object),
            "den_scaled": pd.Series([str(den)], dtype=object),
        }
    )


_MORANS_SQL = f"""
WITH p AS (SELECT
    LEAST(GREATEST(CAST(trunc((lon + 180.0) / 360.0 * 64) AS BIGINT), 0), 63) AS cx,
    LEAST(GREATEST(CAST(trunc((lat + 90.0) / 180.0 * 64) AS BIGINT), 0), 63) AS cy
  FROM read_parquet('{_ORACLE_DIR}/morans_pts/*.parquet')),
c AS (SELECT cx, cy, CAST(COUNT(*) AS BIGINT) AS x FROM p GROUP BY cx, cy),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx FROM c),
d AS (SELECT cx, cy, CAST(s.n * c.x - s.sx AS HUGEINT) AS dev FROM c, s),
pairs AS (
  SELECT a.dev AS da, b.dev AS db
  FROM d a JOIN d b ON b.cx = a.cx + 1 AND b.cy = a.cy
  UNION ALL
  SELECT a.dev, b.dev
  FROM d a JOIN d b ON b.cx = a.cx AND b.cy = a.cy + 1)
SELECT (SELECT n FROM s) AS n_cells,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs) AS w_pairs,
       CAST(COALESCE((SELECT SUM(da * db) FROM pairs), 0) AS VARCHAR) AS num_scaled,
       CAST((SELECT SUM(dev * dev) FROM d) AS VARCHAR) AS den_scaled
"""

GEO_QUERIES.update({"cell_morans_i": q_cell_morans_i})
EXTRA_ORACLE_SQL["cell_morans_i"] = _MORANS_SQL


# --------------------------------------------------------------------------
# geo ring compactness — the gerrymandering-style shape score without
# a square root: c_e3 = (|area2| · 1000) // diam², all exact e5-grid
# integers (a disc scores ~1571, a sliver ~0).  Reuses the shoelace
# and diameter kernels in one block-local pass; SQL joins the two
# replays (cyclic-next shoelace, pair-max diameter) on the persisted
# vertex table.
# --------------------------------------------------------------------------


def _compactness_batch(t: pa.Table) -> pa.Table:
    from ..cells.grid import _rl_arange

    empty = pa.table(
        {
            "geom_id": pa.array([], type=pa.string()),
            "ring_seq": pa.array([], type=pa.int32()),
            "compactness_e3": pa.array([], type=pa.int64()),
        }
    )
    if t.num_columns == 0 or t.num_rows == 0:
        return empty
    col = t["ring"].combine_chunks()
    offs = np.asarray(col.offsets).astype(np.int64)
    coords = np.asarray(col.values.values, dtype=np.float64).reshape(-1, 2)
    vlen = offs[1:] - offs[:-1]
    closed = (coords[offs[:-1]] == coords[np.maximum(offs[1:] - 1, 0)]).all(axis=1)
    closed &= vlen > 1
    olen = vlen - closed.astype(np.int64)
    gather = _rl_arange(offs[:-1], olen)
    oc = coords[gather]
    xi = np.floor(oc[:, 0] * 1e5).astype(np.int64)
    yi = np.floor(oc[:, 1] * 1e5).astype(np.int64)
    ostart = np.concatenate([[0], np.cumsum(olen)[:-1]]).astype(np.int64)
    nxt = np.arange(len(oc), dtype=np.int64) + 1
    nz = olen > 0
    nxt[(ostart + olen - 1)[nz]] = ostart[nz]
    cross = xi * yi[nxt] - xi[nxt] * yi
    a2 = np.abs(np.add.reduceat(cross, ostart)) if len(cross) else np.zeros(0, np.int64)
    comp = np.zeros(len(t), np.int64)
    for i in range(len(t)):
        s, m = int(ostart[i]), int(olen[i])
        if m < 2:
            continue
        x, y = xi[s : s + m], yi[s : s + m]
        dx = x[:, None] - x[None, :]
        dy = y[:, None] - y[None, :]
        d2 = int((dx * dx + dy * dy).max())
        if d2 > 0:
            comp[i] = (int(a2[i]) * 1000) // d2
    return pa.table(
        {
            "geom_id": t["geom_id"],
            "ring_seq": t["ring_seq"],
            "compactness_e3": pa.array(comp),
        }
    )


def q_geo_compactness(sf_dir: str):
    simple = _simple_rings_cached(sf_dir)
    _persist(simple.map_batches(_verts_batch, batch_format="pyarrow"), "comp_verts")
    return simple.map_batches(_compactness_batch, batch_format="pyarrow")


_COMPACT_SQL = f"""
WITH v AS (SELECT geom_id, ring_seq, vidx,
                  CAST(floor(x * 100000.0) AS BIGINT) AS xi,
                  CAST(floor(y * 100000.0) AS BIGINT) AS yi
           FROM read_parquet('{_ORACLE_DIR}/comp_verts/*.parquet')),
n AS (SELECT geom_id, ring_seq, COUNT(*) AS m FROM v GROUP BY geom_id, ring_seq),
sh AS (SELECT c.geom_id, c.ring_seq,
              abs(SUM(c.xi * x.yi - x.xi * c.yi)) AS a2
       FROM v c
       JOIN n ON n.geom_id = c.geom_id AND n.ring_seq = c.ring_seq
       JOIN v x ON x.geom_id = c.geom_id AND x.ring_seq = c.ring_seq
               AND x.vidx = (c.vidx + 1) % n.m
       GROUP BY c.geom_id, c.ring_seq),
dm AS (SELECT a.geom_id, a.ring_seq,
              MAX((a.xi - b.xi) * (a.xi - b.xi)
                + (a.yi - b.yi) * (a.yi - b.yi)) AS d2
       FROM v a JOIN v b ON b.geom_id = a.geom_id AND b.ring_seq = a.ring_seq
       GROUP BY a.geom_id, a.ring_seq)
SELECT sh.geom_id, sh.ring_seq,
       CAST(CASE WHEN dm.d2 > 0 THEN (sh.a2 * 1000) // dm.d2 ELSE 0 END AS BIGINT)
         AS compactness_e3
FROM sh JOIN dm ON dm.geom_id = sh.geom_id AND dm.ring_seq = sh.ring_seq
"""

GEO_QUERIES.update({"geo_compactness": q_geo_compactness})
EXTRA_ORACLE_SQL["geo_compactness"] = _COMPACT_SQL


# --------------------------------------------------------------------------
# image vertical seam energy — the seam-carving primitive: the
# cheapest top-to-bottom 8-connected path through the channel-summed
# pixel grid, by exact integer dynamic programming (cost[r][x] =
# px[r][x] + min of the three parents).  The Ray kernel runs the DP
# vectorized per image; the oracle replays it as a RECURSIVE CTE
# whose state is the per-image cost LIST, folded one row per
# iteration — dynamic programming in SQL, bit-identical because every
# operand is an int64.  Ties in the final argmin break to the lowest
# column on both engines.
# --------------------------------------------------------------------------


def q_image_seam_energy(sf_dir: str):
    n = _persist_media_inputs(sf_dir)
    imgs = gen_images(n)

    def seam(t: pa.Table) -> pa.Table:
        ws = t["w"].to_pylist()
        hs = t["h"].to_pylist()
        fmts = t["fmt"].to_pylist()
        payloads = t["bytes"].to_pylist()
        costs, ends = [], []
        for w, h, fmt, payload in zip(ws, hs, fmts, payloads):
            px = decode(payload, w, h, fmt).astype(np.int64).sum(axis=2)
            prev = px[0].copy()
            for r in range(1, h):
                left = np.r_[prev[0], prev[:-1]]
                right = np.r_[prev[1:], prev[-1]]
                prev = px[r] + np.minimum(np.minimum(left, prev), right)
            costs.append(int(prev.min()))
            ends.append(int(prev.argmin()))
        return pa.table(
            {
                "image_id": t["image_id"],
                "seam_cost": pa.array(costs, pa.int64()),
                "seam_end_col": pa.array(ends, pa.int64()),
            }
        )

    return imgs.map_batches(seam, batch_format="pyarrow")


_SEAM_SQL = f"""
WITH RECURSIVE base AS MATERIALIZED (
  SELECT image_id, fmt, b, w, h
  FROM read_parquet('{_ORACLE_DIR}/media_in/*.parquet')),
dp(image_id, r, costs) AS (
  SELECT image_id, 0,
         [CAST({_gq_pix("x")} AS BIGINT) for x in generate_series(0, w - 1)]
  FROM base
  UNION ALL
  SELECT dp.image_id, dp.r + 1,
         list_transform(generate_series(0, base.w - 1), x ->
            CAST({_gq_pix("(dp.r + 1) * base.w + x")} AS BIGINT)
            + LEAST(costs[GREATEST(x, 1)], costs[x + 1],
                    costs[LEAST(x + 2, base.w)]))
  FROM dp JOIN base ON base.image_id = dp.image_id
  WHERE dp.r + 1 < base.h
),
last_row AS (SELECT dp.image_id, costs
             FROM dp JOIN base ON base.image_id = dp.image_id
             WHERE dp.r = base.h - 1)
SELECT image_id,
       CAST(list_aggregate(costs, 'min') AS BIGINT) AS seam_cost,
       CAST(list_position(costs, list_aggregate(costs, 'min')) - 1 AS BIGINT)
         AS seam_end_col
FROM last_row
"""

GEO_QUERIES.update({"image_seam_energy": q_image_seam_energy})
EXTRA_ORACLE_SQL["image_seam_energy"] = _SEAM_SQL


# --------------------------------------------------------------------------
# image symmetry L1 scores — the symmetry-detection primitive: exact
# integer L1 distance between the channel-summed image and (a) its
# 180° point rotation, (b) its horizontal mirror.  Zero means perfect
# symmetry.  Each pair is counted twice (full-sum convention, stated
# here so the SQL replay matches term-for-term).  Block-local.
# --------------------------------------------------------------------------


def q_image_symmetry_l1(sf_dir: str):
    n = _persist_media_inputs(sf_dir)
    imgs = gen_images(n)

    def sym(t: pa.Table) -> pa.Table:
        ws = t["w"].to_pylist()
        hs = t["h"].to_pylist()
        fmts = t["fmt"].to_pylist()
        payloads = t["bytes"].to_pylist()
        rot, mir = [], []
        for w, h, fmt, payload in zip(ws, hs, fmts, payloads):
            px = decode(payload, w, h, fmt).astype(np.int64).sum(axis=2)
            rot.append(int(np.abs(px - px[::-1, ::-1]).sum()))
            mir.append(int(np.abs(px - px[:, ::-1]).sum()))
        return pa.table(
            {
                "image_id": t["image_id"],
                "rot180_l1": pa.array(rot, pa.int64()),
                "mirror_l1": pa.array(mir, pa.int64()),
            }
        )

    return imgs.map_batches(sym, batch_format="pyarrow")


_SYM_SQL = f"""
WITH base AS MATERIALIZED (
  SELECT image_id, fmt, b, w, h, CAST(w AS BIGINT) * h AS n_pix
  FROM read_parquet('{_ORACLE_DIR}/media_in/*.parquet'))
SELECT image_id,
  CAST(list_sum([abs({_gq_pix("p")} - {_gq_pix("n_pix - 1 - p")})
       for p in generate_series(0, n_pix - 1)]) AS BIGINT) AS rot180_l1,
  CAST(list_sum([abs({_gq_pix("p")} - {_gq_pix("(p // w) * w + (w - 1 - p % w)")})
       for p in generate_series(0, n_pix - 1)]) AS BIGINT) AS mirror_l1
FROM base
"""

GEO_QUERIES.update({"image_symmetry_l1": q_image_symmetry_l1})
EXTRA_ORACLE_SQL["image_symmetry_l1"] = _SYM_SQL


# --------------------------------------------------------------------------
# image block-truncation-coding stats — the BTC codec's decision
# census per image over complete 4x4 blocks: how many pixels sit
# strictly above their own block's mean (16·px > Σblock, integer
# cross-multiplied — the BTC bit plane's popcount) and how many
# blocks are perfectly flat (max == min).  Block-local; SQL replays
# the 16-term block arithmetic.
# --------------------------------------------------------------------------


def q_image_btc_stats(sf_dir: str):
    n = _persist_media_inputs(sf_dir)
    imgs = gen_images(n)

    def btc(t: pa.Table) -> pa.Table:
        ws = t["w"].to_pylist()
        hs = t["h"].to_pylist()
        fmts = t["fmt"].to_pylist()
        payloads = t["bytes"].to_pylist()
        nb, na, nf = [], [], []
        for w, h, fmt, payload in zip(ws, hs, fmts, payloads):
            px = decode(payload, w, h, fmt).astype(np.int64).sum(axis=2)
            h4, w4 = h // 4, w // 4
            v = px[: h4 * 4, : w4 * 4].reshape(h4, 4, w4, 4)
            bsum = v.sum(axis=(1, 3))
            above = (16 * v > bsum[:, None, :, None]).sum()
            flat = (v.max(axis=(1, 3)) == v.min(axis=(1, 3))).sum()
            nb.append(int(h4 * w4))
            na.append(int(above))
            nf.append(int(flat))
        return pa.table(
            {
                "image_id": t["image_id"],
                "n_blocks": pa.array(nb, pa.int64()),
                "n_above_mean": pa.array(na, pa.int64()),
                "n_flat_blocks": pa.array(nf, pa.int64()),
            }
        )

    return imgs.map_batches(btc, batch_format="pyarrow")


_BTC_B0 = "(((bk // (w // 4)) * 4) * w + (bk % (w // 4)) * 4)"
_BTC_TERMS = [f"{_BTC_B0} + {y} * w + {x}" for y in range(4) for x in range(4)]
_BTC_SUM = " + ".join(_gq_pix(q) for q in _BTC_TERMS)
_BTC_ABOVE = " + ".join(
    f"(CASE WHEN 16 * {_gq_pix(q)} > bs[bk + 1] THEN 1 ELSE 0 END)"
    for q in _BTC_TERMS
)
_BTC_MAX = "GREATEST(" + ", ".join(_gq_pix(q) for q in _BTC_TERMS) + ")"
_BTC_MIN = "LEAST(" + ", ".join(_gq_pix(q) for q in _BTC_TERMS) + ")"

_BTC_SQL = f"""
WITH base AS MATERIALIZED (
  SELECT image_id, fmt, b, w, h
  FROM read_parquet('{_ORACLE_DIR}/media_in/*.parquet')),
d AS MATERIALIZED (
  SELECT image_id, fmt, b, w, h,
         [CAST({_BTC_SUM} AS BIGINT)
          for bk in generate_series(0, (w // 4) * (h // 4) - 1)] AS bs
  FROM base)
SELECT image_id,
  CAST((w // 4) * (h // 4) AS BIGINT) AS n_blocks,
  CAST(list_sum([{_BTC_ABOVE}
       for bk in generate_series(0, (w // 4) * (h // 4) - 1)]) AS BIGINT)
    AS n_above_mean,
  CAST(list_sum([CASE WHEN {_BTC_MAX} = {_BTC_MIN} THEN 1 ELSE 0 END
       for bk in generate_series(0, (w // 4) * (h // 4) - 1)]) AS BIGINT)
    AS n_flat_blocks
FROM d
"""

GEO_QUERIES.update({"image_btc_stats": q_image_btc_stats})
EXTRA_ORACLE_SQL["image_btc_stats"] = _BTC_SQL


# --------------------------------------------------------------------------
# geo octant transition matrix — the contour-shape descriptor: for
# every pair of CONSECUTIVE ring edges (cyclic), the (from, to) pair
# of their direction octants, summed into a global 8x8 matrix (zero
# cells omitted on both engines).  Reuses the octant kernel; SQL
# replays the successor join on the persisted vertex table.
# --------------------------------------------------------------------------


def q_geo_octant_transitions(sf_dir: str):
    from ray.data.aggregate import Sum

    from ..cells.grid import _rl_arange

    simple = _simple_rings_cached(sf_dir)
    _persist(simple.map_batches(_verts_batch, batch_format="pyarrow"), "octtr_verts")

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "from_oct": pa.array([], pa.int64()),
                "to_oct": pa.array([], pa.int64()),
                "n_pairs": pa.array([], pa.int64()),
            }
        )
        if t.num_columns == 0 or t.num_rows == 0:
            return empty
        col = t["ring"].combine_chunks()
        offs = np.asarray(col.offsets).astype(np.int64)
        coords = np.asarray(col.values.values, dtype=np.float64).reshape(-1, 2)
        vlen = offs[1:] - offs[:-1]
        closed = (coords[offs[:-1]] == coords[np.maximum(offs[1:] - 1, 0)]).all(axis=1)
        closed &= vlen > 1
        olen = vlen - closed.astype(np.int64)
        gather = _rl_arange(offs[:-1], olen)
        oc = coords[gather]
        xi = np.floor(oc[:, 0] * 1e5).astype(np.int64)
        yi = np.floor(oc[:, 1] * 1e5).astype(np.int64)
        ostart = np.concatenate([[0], np.cumsum(olen)[:-1]]).astype(np.int64)
        nxt = np.arange(len(oc), dtype=np.int64) + 1
        nz = olen > 0
        nxt[(ostart + olen - 1)[nz]] = ostart[nz]
        dx = xi[nxt] - xi
        dy = yi[nxt] - yi
        o = _octants(dx, dy)
        o_next = o[nxt]  # octant of the successor edge (cyclic)
        key = o * 8 + o_next
        cnt = np.bincount(key, minlength=64).astype(np.int64)
        nzk = np.flatnonzero(cnt)
        return pa.table(
            {
                "from_oct": pa.array(nzk // 8),
                "to_oct": pa.array(nzk % 8),
                "n_pairs": pa.array(cnt[nzk]),
            }
        )

    return (
        simple.map_batches(partial, batch_format="pyarrow")
        .groupby(["from_oct", "to_oct"])
        .aggregate(Sum("n_pairs", alias_name="n_pairs"))
    )


_OCTTR_SQL = f"""
WITH v AS (SELECT geom_id, ring_seq, vidx,
                  CAST(floor(x * 100000.0) AS BIGINT) AS xi,
                  CAST(floor(y * 100000.0) AS BIGINT) AS yi
           FROM read_parquet('{_ORACLE_DIR}/octtr_verts/*.parquet')),
n AS (SELECT geom_id, ring_seq, COUNT(*) AS m FROM v GROUP BY geom_id, ring_seq),
e AS (SELECT a.geom_id, a.ring_seq, a.vidx,
             b.xi - a.xi AS dx, b.yi - a.yi AS dy, n.m
      FROM v a
      JOIN n USING (geom_id, ring_seq)
      JOIN v b ON b.geom_id = a.geom_id AND b.ring_seq = a.ring_seq
              AND b.vidx = (a.vidx + 1) % n.m),
o AS (SELECT geom_id, ring_seq, vidx, m,
             CAST(({_OCT_CASE_SQL}) AS BIGINT) AS oct FROM e),
tr AS (SELECT a.oct AS from_oct, b.oct AS to_oct
       FROM o a JOIN o b ON b.geom_id = a.geom_id AND b.ring_seq = a.ring_seq
                        AND b.vidx = (a.vidx + 1) % a.m)
SELECT from_oct, to_oct, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM tr GROUP BY from_oct, to_oct
"""

GEO_QUERIES.update({"geo_octant_transitions": q_geo_octant_transitions})
EXTRA_ORACLE_SQL["geo_octant_transitions"] = _OCTTR_SQL


# --------------------------------------------------------------------------
# image channel covariance pieces — the color-statistics primitive:
# per image, the exact integer sufficient statistics for every
# channel pair correlation (Σr, Σg, Σb, Σr², Σg², Σb², Σrg, Σrb,
# Σgb, n) straight off the decoded channels.  Block-local; SQL
# replays per-channel decode (raw: byte; q6: byte·4+2) term-exactly.
# --------------------------------------------------------------------------


def _gq_chan(q: str, ch: int) -> str:
    """decoded channel ``ch`` value at pixel index q (SQL)."""
    return (
        f"(CASE WHEN fmt = 'raw' THEN b[3*({q})+{ch + 1}] "
        f"ELSE b[3*({q})+{ch + 1}] * 4 + 2 END)"
    )


def q_image_channel_covariance(sf_dir: str):
    n = _persist_media_inputs(sf_dir)
    imgs = gen_images(n)

    def cov(t: pa.Table) -> pa.Table:
        ws = t["w"].to_pylist()
        hs = t["h"].to_pylist()
        fmts = t["fmt"].to_pylist()
        payloads = t["bytes"].to_pylist()
        rows = {k: [] for k in ("n_px", "sr", "sg", "sb", "srr", "sgg", "sbb", "srg", "srb", "sgb")}
        for w, h, fmt, payload in zip(ws, hs, fmts, payloads):
            px = decode(payload, w, h, fmt).astype(np.int64)
            r = px[:, :, 0].ravel()
            g = px[:, :, 1].ravel()
            bl = px[:, :, 2].ravel()
            rows["n_px"].append(w * h)
            rows["sr"].append(int(r.sum()))
            rows["sg"].append(int(g.sum()))
            rows["sb"].append(int(bl.sum()))
            rows["srr"].append(int((r * r).sum()))
            rows["sgg"].append(int((g * g).sum()))
            rows["sbb"].append(int((bl * bl).sum()))
            rows["srg"].append(int((r * g).sum()))
            rows["srb"].append(int((r * bl).sum()))
            rows["sgb"].append(int((g * bl).sum()))
        cols = {"image_id": t["image_id"]}
        for k, v in rows.items():
            cols[k] = pa.array(np.array(v, np.int64))
        return pa.table(cols)

    return imgs.map_batches(cov, batch_format="pyarrow")


def _chan_sum(expr_fn, alias: str) -> str:
    return (
        f"CAST(list_sum([{expr_fn} for p in generate_series(0, n_pix - 1)]) "
        f"AS BIGINT) AS {alias}"
    )


_CHAN_COV_SQL = f"""
WITH base AS MATERIALIZED (
  SELECT image_id, fmt, b, w, h, CAST(w AS BIGINT) * h AS n_pix
  FROM read_parquet('{_ORACLE_DIR}/media_in/*.parquet'))
SELECT image_id, n_pix AS n_px,
  {_chan_sum(_gq_chan("p", 0), "sr")},
  {_chan_sum(_gq_chan("p", 1), "sg")},
  {_chan_sum(_gq_chan("p", 2), "sb")},
  {_chan_sum(f"{_gq_chan('p', 0)} * {_gq_chan('p', 0)}", "srr")},
  {_chan_sum(f"{_gq_chan('p', 1)} * {_gq_chan('p', 1)}", "sgg")},
  {_chan_sum(f"{_gq_chan('p', 2)} * {_gq_chan('p', 2)}", "sbb")},
  {_chan_sum(f"{_gq_chan('p', 0)} * {_gq_chan('p', 1)}", "srg")},
  {_chan_sum(f"{_gq_chan('p', 0)} * {_gq_chan('p', 2)}", "srb")},
  {_chan_sum(f"{_gq_chan('p', 1)} * {_gq_chan('p', 2)}", "sgb")}
FROM base
"""

GEO_QUERIES.update({"image_channel_covariance": q_image_channel_covariance})
EXTRA_ORACLE_SQL["image_channel_covariance"] = _CHAN_COV_SQL


# --------------------------------------------------------------------------
# image palette stats — the quantization-prep census: distinct RGB
# colors per image and the most frequent color (ties → numerically
# smallest packed code r·2^20 + g·2^10 + b, identical on both
# engines).  Block-local np.unique; SQL replays the packed-code
# grouping from the payload bytes.
# --------------------------------------------------------------------------


def q_image_palette_stats(sf_dir: str):
    n = _persist_media_inputs(sf_dir)
    imgs = gen_images(n)

    def pal(t: pa.Table) -> pa.Table:
        ws = t["w"].to_pylist()
        hs = t["h"].to_pylist()
        fmts = t["fmt"].to_pylist()
        payloads = t["bytes"].to_pylist()
        nc, tc, tn = [], [], []
        for w, h, fmt, payload in zip(ws, hs, fmts, payloads):
            px = decode(payload, w, h, fmt).astype(np.int64)
            code = (
                px[:, :, 0].ravel() * (1 << 20)
                + px[:, :, 1].ravel() * (1 << 10)
                + px[:, :, 2].ravel()
            )
            u, c = np.unique(code, return_counts=True)
            best = np.lexsort((u, -c))[0]
            nc.append(len(u))
            tc.append(int(u[best]))
            tn.append(int(c[best]))
        return pa.table(
            {
                "image_id": t["image_id"],
                "n_colors": pa.array(nc, pa.int64()),
                "top_color_code": pa.array(tc, pa.int64()),
                "top_color_count": pa.array(tn, pa.int64()),
            }
        )

    return imgs.map_batches(pal, batch_format="pyarrow")


def _gq_code(q: str) -> str:
    from_parts = " + ".join(
        f"{_gq_chan(q, ch)} * {1 << (20 - 10 * ch)}" if ch < 2 else _gq_chan(q, ch)
        for ch in range(3)
    )
    return f"({from_parts})"


_PALETTE_SQL = f"""
WITH base AS MATERIALIZED (
  SELECT image_id, fmt, b, w, h, CAST(w AS BIGINT) * h AS n_pix
  FROM read_parquet('{_ORACLE_DIR}/media_in/*.parquet')),
px AS (SELECT image_id,
              unnest([{_gq_code("p")}
                      for p in generate_series(0, n_pix - 1)]) AS code
       FROM base),
cc AS (SELECT image_id, code, COUNT(*) AS cnt FROM px GROUP BY image_id, code),
top AS (SELECT image_id, code, cnt,
               ROW_NUMBER() OVER (PARTITION BY image_id
                                  ORDER BY cnt DESC, code) AS rn
        FROM cc)
SELECT c.image_id,
       CAST(COUNT(*) AS BIGINT) AS n_colors,
       CAST(MAX(t.code) AS BIGINT) AS top_color_code,
       CAST(MAX(t.cnt) AS BIGINT) AS top_color_count
FROM cc c JOIN top t ON t.image_id = c.image_id AND t.rn = 1
GROUP BY c.image_id
"""

GEO_QUERIES.update({"image_palette_stats": q_image_palette_stats})
EXTRA_ORACLE_SQL["image_palette_stats"] = _PALETTE_SQL


# --------------------------------------------------------------------------
# geo vertex valence census — the decompose intersection-graph
# fingerprint: the self-intersection pseudo-vertices that decompose
# creates appear in MULTIPLE child rings of the same geometry; per
# geometry this counts its distinct quantized vertices by ring-
# valence (1 = ordinary boundary vertex, ≥2 = split point).
# Block-local (a geometry's rings share a block); SQL replays from
# the persisted vertex table.
# --------------------------------------------------------------------------


def q_geo_vertex_valence(sf_dir: str):
    from ..relational.queries import _bucket_groupby
    from ray.data.aggregate import Sum

    simple = _simple_rings_cached(sf_dir)
    _persist(simple.map_batches(_verts_batch, batch_format="pyarrow"), "valence_verts")
    verts = simple.map_batches(_verts_batch, batch_format="pyarrow")

    def quads(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "vk": pa.array([], pa.int64()),
                "geom_id": pa.array([], pa.string()),
                "xi": pa.array([], pa.int64()),
                "yi": pa.array([], pa.int64()),
                "ring_seq": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        xi = np.floor(t["x"].to_numpy(zero_copy_only=False) * 1e5).astype(np.int64)
        yi = np.floor(t["y"].to_numpy(zero_copy_only=False) * 1e5).astype(np.int64)
        d = (
            pa.table(
                {
                    "vk": pa.array(xi * np.int64(1_000_003) + yi),
                    "geom_id": t["geom_id"].cast(pa.string()),
                    "xi": pa.array(xi),
                    "yi": pa.array(yi),
                    "ring_seq": t["ring_seq"].cast(pa.int64()),
                }
            )
            .group_by(["vk", "geom_id", "xi", "yi", "ring_seq"])
            .aggregate([])
        )
        return d

    _VAL_EMPTY = {
        "geom_id": pd.Series([], dtype=object),
        "n_vertices": pd.Series([], dtype=np.int64),
        "n_valence1": pd.Series([], dtype=np.int64),
        "n_split_points": pd.Series([], dtype=np.int64),
    }

    def frame(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(_VAL_EMPTY)
        val = (
            g.drop_duplicates()
            .groupby(["geom_id", "xi", "yi"])["ring_seq"]
            .nunique()
            .reset_index(name="v")
        )
        out = val.groupby("geom_id").agg(
            n_vertices=("v", "size"),
            n_valence1=("v", lambda s: int((s == 1).sum())),
            n_split_points=("v", lambda s: int((s >= 2).sum())),
        )
        out = out.reset_index()
        return pd.DataFrame(
            {
                "geom_id": out["geom_id"].to_numpy(object),
                "n_vertices": out["n_vertices"].to_numpy(np.int64),
                "n_valence1": out["n_valence1"].to_numpy(np.int64),
                "n_split_points": out["n_split_points"].to_numpy(np.int64),
            }
        )

    # every occurrence of a vertex lands in one bucket (vk hash), so
    # the valence count is frame-exact; per-geom partials then Sum
    return (
        _bucket_groupby(
            verts.map_batches(quads, batch_format="pyarrow"), "vk", frame
        )
        .groupby("geom_id")
        .aggregate(
            Sum("n_vertices", alias_name="n_vertices"),
            Sum("n_valence1", alias_name="n_valence1"),
            Sum("n_split_points", alias_name="n_split_points"),
        )
    )


_VALENCE_SQL = f"""
WITH v AS (SELECT DISTINCT geom_id, ring_seq,
                  CAST(floor(x * 100000.0) AS BIGINT) AS xi,
                  CAST(floor(y * 100000.0) AS BIGINT) AS yi
           FROM read_parquet('{_ORACLE_DIR}/valence_verts/*.parquet')),
val AS (SELECT geom_id, xi, yi, COUNT(DISTINCT ring_seq) AS k
        FROM v GROUP BY geom_id, xi, yi)
SELECT geom_id,
       CAST(COUNT(*) AS BIGINT) AS n_vertices,
       CAST(SUM(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_valence1,
       CAST(SUM(CASE WHEN k >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_split_points
FROM val GROUP BY geom_id
"""

GEO_QUERIES.update({"geo_vertex_valence": q_geo_vertex_valence})
EXTRA_ORACLE_SQL["geo_vertex_valence"] = _VALENCE_SQL


# --------------------------------------------------------------------------
# global texton histogram — the classic texture-bag primitive: every
# 2x2 window of every image maps to a 4-bit code from the per-pixel
# "bright" bit (px·n_pix > Σpx, integer cross-multiplied against the
# image's own mean), histogrammed over the whole corpus (16 rows).
# Per-image bincounts are block-local partials; SQL replays the
# window codes and unnests them.
# --------------------------------------------------------------------------


def q_image_texton_hist(sf_dir: str):
    from ray.data.aggregate import Sum

    n = _persist_media_inputs(sf_dir)
    imgs = gen_images(n)

    def textons(t: pa.Table) -> pa.Table:
        ws = t["w"].to_pylist()
        hs = t["h"].to_pylist()
        fmts = t["fmt"].to_pylist()
        payloads = t["bytes"].to_pylist()
        acc = np.zeros(16, np.int64)
        for w, h, fmt, payload in zip(ws, hs, fmts, payloads):
            px = decode(payload, w, h, fmt).astype(np.int64).sum(axis=2)
            bright = (px * (w * h) > int(px.sum())).astype(np.int64)
            code = (
                bright[:-1, :-1]
                + 2 * bright[:-1, 1:]
                + 4 * bright[1:, :-1]
                + 8 * bright[1:, 1:]
            )
            acc += np.bincount(code.ravel(), minlength=16)
        return pa.table(
            {
                "pattern": pa.array(np.arange(16, dtype=np.int64)),
                "n_windows": pa.array(acc),
            }
        )

    return (
        imgs.map_batches(textons, batch_format="pyarrow")
        .groupby("pattern")
        .aggregate(Sum("n_windows", alias_name="n_windows"))
    )


def _texton_bit(q: str, mult: int) -> str:
    return f"(CASE WHEN {_gq_pix(q)} * n_pix > s THEN {mult} ELSE 0 END)"


_TEXTON_SQL = f"""
WITH base AS MATERIALIZED (
  SELECT image_id, fmt, b, w, h, CAST(w AS BIGINT) * h AS n_pix,
         CAST(list_sum([{_gq_pix("p")}
              for p in generate_series(0, CAST(w AS BIGINT) * h - 1)]) AS BIGINT) AS s
  FROM read_parquet('{_ORACLE_DIR}/media_in/*.parquet')),
codes AS (SELECT unnest([
    {_texton_bit("p", 1)} + {_texton_bit("p + 1", 2)}
    + {_texton_bit("p + w", 4)} + {_texton_bit("p + w + 1", 8)}
    for p in generate_series(0, n_pix - 1)
    if p % w < w - 1 and p // w < h - 1]) AS pattern
  FROM base)
SELECT CAST(pattern AS BIGINT) AS pattern,
       CAST(COUNT(*) AS BIGINT) AS n_windows
FROM codes GROUP BY pattern ORDER BY pattern
"""

GEO_QUERIES.update({"image_texton_hist": q_image_texton_hist})
EXTRA_ORACLE_SQL["image_texton_hist"] = _TEXTON_SQL


# --------------------------------------------------------------------------
# image format/shape profile — the catalog-level metadata census a
# curation pipeline runs before touching pixels: counts and byte
# totals per (fmt, orientation class).  Pure metadata pass — pixels
# never decode; the exchange is the tiny (fmt × class) domain.
# --------------------------------------------------------------------------


def q_image_format_profile(sf_dir: str):
    from ray.data.aggregate import Sum

    n = _persist_media_inputs(sf_dir)
    imgs = gen_images(n)

    def prof(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        w = t["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = t["h"].to_numpy(zero_copy_only=False).astype(np.int64)
        shape = np.where(w > h, "landscape", np.where(w < h, "portrait", "square"))
        nbytes = pc.binary_length(t["bytes"]).cast(pa.int64())
        part = (
            pa.table(
                {
                    "fmt": t["fmt"],
                    "shape": pa.array(shape.astype(object), pa.string()),
                    "n_bytes": nbytes,
                    "n_px": pa.array(w * h),
                }
            )
            .group_by(["fmt", "shape"])
            .aggregate([("n_bytes", "sum"), ("n_px", "sum"), ([], "count_all")])
        )
        return pa.table(
            {
                "fmt": part["fmt"],
                "shape": part["shape"],
                "n_bytes": part["n_bytes_sum"].cast(pa.int64()),
                "n_px": part["n_px_sum"].cast(pa.int64()),
                "n_images": part["count_all"].cast(pa.int64()),
            }
        )

    return (
        imgs.map_batches(prof, batch_format="pyarrow")
        .groupby(["fmt", "shape"])
        .aggregate(
            Sum("n_bytes", alias_name="n_bytes"),
            Sum("n_px", alias_name="n_px"),
            Sum("n_images", alias_name="n_images"),
        )
    )


_FMT_PROFILE_SQL = f"""
SELECT fmt,
       CASE WHEN w > h THEN 'landscape'
            WHEN w < h THEN 'portrait' ELSE 'square' END AS shape,
       CAST(SUM(len(b)) AS BIGINT) AS n_bytes,
       CAST(SUM(CAST(w AS BIGINT) * h) AS BIGINT) AS n_px,
       CAST(COUNT(*) AS BIGINT) AS n_images
FROM read_parquet('{_ORACLE_DIR}/media_in/*.parquet')
GROUP BY fmt, shape
"""

GEO_QUERIES.update({"image_format_profile": q_image_format_profile})
EXTRA_ORACLE_SQL["image_format_profile"] = _FMT_PROFILE_SQL

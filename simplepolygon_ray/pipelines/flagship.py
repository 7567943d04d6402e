"""Flagship pipeline: the full spatial-join story end-to-end.

synthesize polygons → decompose (map_batches) → compile ring index
(broadcast) → synthesize geotagged image table → cell-index points →
PIP join (actor pool) → per-geometry aggregate.

Scale follows the sf directory name so the same pipeline runs at
sf0.001 (driver smoke), sf0.01 (correctness) and sf0.1 (bench).
"""

from __future__ import annotations

import re

from ..images.synth import gen_points
from ..stages.cover_stage import DEFAULT_LEVEL
from ..stages.decompose_stage import decompose_dataset, fixture_polygons, polygons_source
from ..stages.pip_join import pip_join_broadcast

__all__ = ["flagship", "flagship_checkpointed", "sf_of_dir", "scale_counts"]


def sf_of_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir or "")
    return float(m.group(1)) if m else 0.01


def scale_counts(sf_dir: str) -> tuple[int, int]:
    """(n_polygons, n_images) for an sf directory."""
    sf = sf_of_dir(sf_dir)
    return max(int(2_000 * sf), 20), max(int(200_000 * sf), 500)


def flagship(sf_dir: str, *, level: int = DEFAULT_LEVEL, concurrency=4):
    """Returns the PIP-join membership Dataset (image ⋈ simple ring)."""
    n_polys, n_images = scale_counts(sf_dir)

    polygons = fixture_polygons().union(polygons_source(n_polys))
    simple_rings = decompose_dataset(polygons)
    # pruned-column read: joins only ship (image_id, lon, lat)
    images = gen_points(n_images)
    joined = pip_join_broadcast(
        images,
        simple_rings,  # covered in parallel, compiled once, broadcast
        level=level,
        concurrency=concurrency,
    )
    return joined


def _points_range(lo: int, hi: int, *, parallelism: int = 32):
    """Deterministic probe shard: the same geotags ``gen_points`` would
    emit for global row ids [lo, hi) — a shard is an id range, so a
    resumed run regenerates bit-identical input."""
    import numpy as np
    import ray.data as rd

    from ..images.synth import gen_points_batch

    n = hi - lo
    ds = rd.range(n, override_num_blocks=max(1, min(n, parallelism)))

    def shift(b):
        return {"id": np.asarray(b["id"], np.int64) + lo}

    return ds.map_batches(shift, batch_format="numpy").map_batches(
        gen_points_batch, batch_format="numpy", batch_size=None
    )


def flagship_checkpointed(
    sf_dir: str,
    out_dir: str,
    *,
    n_shards: int = 8,
    level: int = DEFAULT_LEVEL,
    fail_after: int | None = None,
):
    """The flagship as a RESUMABLE checkpointed run (north_rule:
    checkpoints with per-partition lineage and metrics, resume
    mid-pipeline).

    The probe (image) side splits into deterministic id-range shards;
    the ring index compiles ONCE in Ray tasks and every shard joins
    against the same broadcast ObjectRef. Each shard's membership rows
    land atomically under ``out_dir/flagship_join/shard=<k>/`` with a
    manifest row (lineage, rows, bytes, checksum, duration); a rerun
    skips finished shards and loses at most the in-flight shard on a
    kill. Returns the full membership Dataset read back from the
    checkpointed output. ``fail_after`` is the kill/resume test hook."""
    from ..state.manifest import CheckpointedRunner, load_output

    n_polys, n_images = scale_counts(sf_dir)
    polygons = fixture_polygons().union(polygons_source(n_polys))
    simple_rings = decompose_dataset(polygons)
    from ..stages.pip_join import compile_ring_index_ref

    index_ref = compile_ring_index_ref(simple_rings, level=level)

    per = -(-n_images // n_shards)
    # skip tail shards with hi <= lo (n_images < n_shards): they would
    # build rd.range(0) with more blocks than rows — the zero-row
    # zero-column block hazard — and write empty schema-less output
    shard_ids = [str(i) for i in range(n_shards) if i * per < n_images]
    runner = CheckpointedRunner(out_dir, "flagship_join")

    def make(sid: str):
        lo = int(sid) * per
        hi = min(lo + per, n_images)
        return pip_join_broadcast(_points_range(lo, hi), index_ref, level=level)

    runner.run(
        shard_ids,
        make,
        lineage=lambda s: (
            f"{sf_dir}|polys={n_polys}|images[{int(s) * per}:"
            f"{min(int(s) * per + per, n_images)}]|level={level}"
        ),
        fail_after=fail_after,
    )
    out = load_output(out_dir, "flagship_join", shard_ids=shard_ids)
    # the hive shard=<k> directory surfaces as a partition column on
    # read-back; drop it so the schema matches the streaming flagship
    if "shard" in out.schema().names:
        out = out.drop_columns(["shard"])
    return out

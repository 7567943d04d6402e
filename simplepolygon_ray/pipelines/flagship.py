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

__all__ = ["flagship", "sf_of_dir", "scale_counts"]


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

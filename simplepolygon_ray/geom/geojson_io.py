"""GeoJSON boundary: parse reference-shaped Features, emit
reference-shaped FeatureCollections.

The emitters reproduce the exact property shape of the reference output
(reference src/index.ts:511-518 walk path with ``index``;
src/index.ts:118-125 fast path without) plus the test harness's
``colorize`` decoration (reference test/index.test.ts:34-51: 5-color
cycle by feature index) so golden files compare structurally equal.
"""

from __future__ import annotations

import json

import numpy as np

from .decompose import DecomposedRing, decompose

__all__ = [
    "parse_polygon_feature",
    "rings_to_feature_collection",
    "decompose_feature",
    "colorize",
]

_COLORS = ["#F00", "#00F", "#0F0", "#F0F", "#FFF"]


def parse_polygon_feature(feature: dict):
    """Validate + extract coordinates (reference src/index.ts:42-48)."""
    if feature.get("type") != "Feature":
        raise ValueError("The input must a geojson object of type Feature")
    geom = feature.get("geometry")
    if geom is None:
        raise ValueError("The input must a geojson object with a non-empty geometry")
    if geom.get("type") != "Polygon":
        raise ValueError("The input must be a geojson Polygon")
    return geom["coordinates"]


def _ring_to_coords(ring: np.ndarray):
    return [[float(x), float(y)] for x, y in ring]


def rings_to_feature_collection(rings: list[DecomposedRing]) -> dict:
    feats = []
    for r in rings:
        props = {}
        if r.index is not None:
            props["index"] = r.index
        props["parent"] = r.parent
        props["winding"] = r.winding
        props["netWinding"] = r.net_winding
        feats.append(
            {
                "type": "Feature",
                "properties": props,
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [_ring_to_coords(r.ring)],
                },
            }
        )
    return {"type": "FeatureCollection", "features": feats}


def colorize(fc: dict, colors=None, width: int = 6) -> dict:
    """Reference test decoration (test/index.test.ts:34-51)."""
    colors = colors or _COLORS
    for idx, f in enumerate(fc["features"]):
        c = colors[idx % len(colors)]
        f["properties"].update(
            {"stroke": c, "fill": c, "stroke-width": width, "fill-opacity": 0.1}
        )
    return fc


def decompose_feature(feature: dict) -> dict:
    """simplepolygon(feature) — full pipeline on one GeoJSON Feature."""
    coords = parse_polygon_feature(feature)
    return rings_to_feature_collection(decompose(coords))


def load_geojson(path: str) -> dict:
    with open(path) as f:
        return json.load(f)

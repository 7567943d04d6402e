from .decompose import DecomposedRing, DuplicateVertexError, decompose
from .geojson_io import colorize, decompose_feature, parse_polygon_feature
from .kernels import (
    is_convex,
    point_in_ring,
    points_in_ring,
    shoelace_area,
    winding_of_ring,
)

__all__ = [
    "DecomposedRing",
    "DuplicateVertexError",
    "decompose",
    "decompose_feature",
    "parse_polygon_feature",
    "colorize",
    "is_convex",
    "point_in_ring",
    "points_in_ring",
    "shoelace_area",
    "winding_of_ring",
]

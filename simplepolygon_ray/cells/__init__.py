from .grid import (
    MAX_LEVEL,
    cell_bounds,
    cell_children,
    cell_ij,
    cell_level,
    cell_neighbors,
    cell_parent,
    compact_cells,
    cover_ring,
    point_to_cell,
)

__all__ = [
    "MAX_LEVEL",
    "point_to_cell",
    "cell_level",
    "cell_ij",
    "cell_bounds",
    "cell_parent",
    "cell_children",
    "cell_neighbors",
    "cover_ring",
    "compact_cells",
]

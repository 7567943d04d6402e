from .catalog import ANN_QUERIES, EXTRA_ORACLE_SQL, GEO_QUERIES, TEXT_QUERIES
from .flagship import flagship, scale_counts, sf_of_dir

__all__ = [
    "flagship",
    "sf_of_dir",
    "scale_counts",
    "GEO_QUERIES",
    "TEXT_QUERIES",
    "ANN_QUERIES",
    "EXTRA_ORACLE_SQL",
]

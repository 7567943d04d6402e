from .geojson_source import (
    read_geojson,
    read_geojson_ndjson,
    write_feature_collections,
    write_geojson_ndjson,
)
from .table_io import read_image_table, write_image_table

__all__ = [
    "read_geojson",
    "read_geojson_ndjson",
    "write_geojson_ndjson",
    "write_feature_collections",
    "read_image_table",
    "write_image_table",
]

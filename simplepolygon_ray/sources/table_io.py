"""Image+caption table I/O facade (Lance target, Parquet in-sandbox).

The production target for BASELINE.json's ``input_hint`` table is a
Lance dataset; this sandbox has no ``lance`` package (SURVEY.md §0), so
the facade reads/writes Parquet with the exact same schema and exposes
one switch point (``FORMAT``) where a ``lance.dataset`` /
``ray.data.read_lance`` implementation drops in.

Writes are partitioned (one directory per shard of ``num_shards``)
so a failed bulk load can resume per-shard (see state.manifest).
"""

from __future__ import annotations

import pyarrow as pa

FORMAT = "parquet"  # "lance" when the lance package is available

IMAGE_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
        ("lon", pa.float64()),
        ("lat", pa.float64()),
    ]
)

__all__ = ["IMAGE_SCHEMA", "read_image_table", "write_image_table", "FORMAT"]


def read_image_table(path: str, *, columns=None):
    """Read the image table; pass ``columns`` to prune at the scan —
    a join that reads pixel bytes it never uses is wrong at any scale."""
    import ray.data as rd

    if FORMAT == "lance":  # pragma: no cover - not installable here
        return rd.read_lance(path, columns=columns)
    return rd.read_parquet(path, columns=columns)


def write_image_table(ds, path: str, *, min_rows_per_file: int = 200_000):
    if FORMAT == "lance":  # pragma: no cover
        return ds.write_lance(path)
    try:
        return ds.write_parquet(path, min_rows_per_file=min_rows_per_file)
    except TypeError:  # older Ray: num_rows_per_file
        return ds.write_parquet(path, num_rows_per_file=min_rows_per_file)

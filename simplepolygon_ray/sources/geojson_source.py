"""GeoJSON sources/sinks for polygon datasets.

Reference input surface (reference src/index.ts:39-48): a GeoJSON
``Feature<Polygon>``. Engine surface: files containing a Feature, a
FeatureCollection, or NDJSON (one Feature per line) → a ``polygons``
Dataset (geom_id, rings); and the inverse sink emitting
reference-shaped FeatureCollections (property shape per SURVEY.md
§2.1 R5/R13: walk-path features carry ``index``, fast-path features
don't).

Parsing happens in parallel ``map_batches`` over ``read_text`` lines
for NDJSON (the scale path); whole-file Feature/FeatureCollection
parsing reads driver-side (config-sized inputs).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

_RINGS_T = pa.list_(pa.list_(pa.list_(pa.float64())))

__all__ = [
    "read_geojson",
    "read_geojson_ndjson",
    "write_feature_collections",
    "write_geojson_ndjson",
]


def _feature_row(feat: dict, fallback_id: str):
    from ..geom.geojson_io import parse_polygon_feature

    coords = parse_polygon_feature(feat)
    gid = str(feat.get("id") or (feat.get("properties") or {}).get("id") or fallback_id)
    return gid, coords


def read_geojson(paths):
    """Read GeoJSON file(s) (Feature or FeatureCollection) into a
    polygons Dataset."""
    import ray.data as rd

    if isinstance(paths, str):
        paths = [paths]
    gids, ringsets = [], []
    for path in paths:
        with open(path) as f:
            obj = json.load(f)
        stem = os.path.splitext(os.path.basename(path))[0]
        if obj.get("type") == "FeatureCollection":
            for i, feat in enumerate(obj["features"]):
                gid, coords = _feature_row(feat, f"{stem}#{i}")
                gids.append(gid)
                ringsets.append(coords)
        else:
            gid, coords = _feature_row(obj, stem)
            gids.append(gid)
            ringsets.append(coords)
    return rd.from_arrow(
        pa.table({"geom_id": pa.array(gids), "rings": pa.array(ringsets, type=_RINGS_T)})
    )


def read_geojson_ndjson(paths, *, id_prefix: str = "feat"):
    """NDJSON of Features (one per line) → polygons Dataset; parsing is
    a parallel batch transform over text lines."""
    import ray.data as rd

    lines = rd.read_text(paths)

    def parse(batch) -> pa.Table:
        gids, ringsets = [], []
        for line in batch["text"]:
            line = line.strip()
            if not line:
                continue
            feat = json.loads(line)
            gid, coords = _feature_row(feat, f"{id_prefix}{len(gids)}")
            gids.append(gid)
            ringsets.append(coords)
        return pa.table(
            {"geom_id": pa.array(gids), "rings": pa.array(ringsets, type=_RINGS_T)}
        )

    return lines.map_batches(parse, batch_format="numpy")


def write_feature_collections(simple_rings, out_dir: str):
    """simple-rings Dataset → one reference-shaped FeatureCollection
    JSON file per geometry (``<out_dir>/<geom_id>.json``).

    Grouped per geometry so each file is the complete, ordered
    decomposition; the group transform writes its own file (a
    per-partition sink) and emits a tiny receipt row.
    """
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ring_seq")
        feats = []
        for _, row in g.iterrows():
            props = {}
            if row["ring_index"] is not None and not pd.isna(row["ring_index"]):
                props["index"] = int(row["ring_index"])
            props["parent"] = int(row["parent"])
            props["winding"] = int(row["winding"])
            props["netWinding"] = int(row["net_winding"])
            feats.append(
                {
                    "type": "Feature",
                    "properties": props,
                    "geometry": {
                        "type": "Polygon",
                        "coordinates": [[list(map(float, p)) for p in row["ring"]]],
                    },
                }
            )
        gid = g["geom_id"].iloc[0]
        path = os.path.join(out_dir, f"{gid}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"type": "FeatureCollection", "features": feats}, f)
        os.replace(tmp, path)
        return pd.DataFrame({"geom_id": [gid], "n_features": [len(feats)]})

    return simple_rings.groupby("geom_id").map_groups(write_group, batch_format="pandas")


def write_geojson_ndjson(simple_rings, out_dir: str):
    """simple-rings Dataset → sharded NDJSON (one Feature per line, one
    ``part-*.jsonl`` file per block) — the scale-path sink: no
    per-geometry grouping shuffle, each task streams its block straight
    to its own shard, resumable at shard granularity. Emits one receipt
    row per shard."""
    import uuid

    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.table({"shard": pa.array([], type=pa.string()),
                             "n_features": pa.array([], type=pa.int64())})
        name = f"part-{uuid.uuid4().hex[:12]}.jsonl"
        tmp = os.path.join(out_dir, name + ".tmp")
        idx = t["ring_index"].to_pylist()
        with open(tmp, "w") as f:
            for k in range(t.num_rows):
                props = {}
                if idx[k] is not None:
                    props["index"] = int(idx[k])
                props["parent"] = int(t["parent"][k].as_py())
                props["winding"] = int(t["winding"][k].as_py())
                props["netWinding"] = int(t["net_winding"][k].as_py())
                props["geomId"] = t["geom_id"][k].as_py()
                props["ringSeq"] = int(t["ring_seq"][k].as_py())
                feat = {
                    "type": "Feature",
                    "properties": props,
                    "geometry": {
                        "type": "Polygon",
                        "coordinates": [t["ring"][k].as_py()],
                    },
                }
                f.write(json.dumps(feat) + "\n")
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table({"shard": pa.array([name]),
                         "n_features": pa.array([t.num_rows], type=pa.int64())})

    return simple_rings.map_batches(write_block, batch_format="pyarrow")

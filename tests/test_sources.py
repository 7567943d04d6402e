"""I/O sources: golden fixtures through the FULL Ray path
(read GeoJSON → map_batches decompose → write FeatureCollection),
NDJSON parsing, image-table round trip."""

import json
import pathlib

import numpy as np
import pytest

FIX = pathlib.Path(__file__).parent / "fixtures"


def test_geojson_roundtrip_golden_parity(ray_session, tmp_path):
    """End-to-end through Ray: fixture files in → decompose via
    map_batches → FeatureCollection files out == golden files (modulo
    the colorize decoration of the reference test harness)."""
    from simplepolygon_ray.geom.geojson_io import colorize
    from simplepolygon_ray.sources import read_geojson, write_feature_collections
    from simplepolygon_ray.stages.decompose_stage import decompose_dataset

    paths = [str(FIX / f"in_{n}.json") for n in ["simple", "complex", "with-hole"]]
    polys = read_geojson(paths)
    simple = decompose_dataset(polys)
    out_dir = tmp_path / "fc"
    receipts = write_feature_collections(simple, str(out_dir)).to_pandas()
    assert sorted(receipts["geom_id"]) == ["in_complex", "in_simple", "in_with-hole"]

    for name in ["simple", "complex", "with-hole"]:
        got = json.loads((out_dir / f"in_{name}.json").read_text())
        expected = json.loads((FIX / f"out_{name}.json").read_text())
        assert colorize(got) == expected  # float-exact dict equality


def test_ndjson_reader(ray_session, tmp_path):
    from simplepolygon_ray.sources import read_geojson_ndjson

    feats = []
    for name in ["simple", "complex"]:
        feat = json.loads((FIX / f"in_{name}.json").read_text())
        feat["id"] = name
        feats.append(json.dumps(feat))
    p = tmp_path / "polys.ndjson"
    p.write_text("\n".join(feats) + "\n")
    ds = read_geojson_ndjson(str(p))
    df = ds.to_pandas()
    assert sorted(df["geom_id"]) == ["complex", "simple"]
    # float64 preserved exactly through the text round trip
    simple_in = json.loads((FIX / "in_simple.json").read_text())
    row = df[df["geom_id"] == "simple"].iloc[0]
    got = [[list(map(float, pt)) for pt in ring] for ring in row["rings"]]
    assert got == simple_in["geometry"]["coordinates"]


def test_ndjson_sink_roundtrip(ray_session, tmp_path):
    """Sharded NDJSON sink: decompose → write_geojson_ndjson → read
    lines back; ring coords survive float64-exact and receipts match."""
    import numpy as np

    from simplepolygon_ray.sources import write_geojson_ndjson
    from simplepolygon_ray.stages.decompose_stage import decompose_dataset, fixture_polygons

    simple = decompose_dataset(fixture_polygons())
    out = str(tmp_path / "shards")
    receipts = write_geojson_ndjson(simple, out).to_pandas()
    assert receipts["n_features"].sum() == simple.count()
    feats = []
    for p in sorted((tmp_path / "shards").glob("part-*.jsonl")):
        feats += [json.loads(line) for line in p.read_text().splitlines()]
    assert len(feats) == receipts["n_features"].sum()
    # bit-exact coords through the text round trip
    direct = decompose_dataset(fixture_polygons()).to_pandas()
    by_key = {
        (f["properties"]["geomId"], f["properties"]["ringSeq"]): f for f in feats
    }
    for _, row in direct.iterrows():
        f = by_key[(row["geom_id"], int(row["ring_seq"]))]
        got = np.asarray(f["geometry"]["coordinates"][0])
        exp = np.asarray([list(p) for p in row["ring"]])
        assert (got == exp).all()


def test_image_table_roundtrip(ray_session, tmp_path):
    from simplepolygon_ray.images.synth import gen_images
    from simplepolygon_ray.sources import read_image_table, write_image_table

    out = str(tmp_path / "imgs")
    write_image_table(gen_images(200), out)
    back = read_image_table(out)
    assert back.count() == 200
    # pruned read only materializes the requested columns
    slim = read_image_table(out, columns=["image_id", "lon", "lat"])
    assert slim.schema().names == ["image_id", "lon", "lat"]
    df = back.to_pandas().sort_values("image_id").reset_index(drop=True)
    ref = gen_images(200).to_pandas().sort_values("image_id").reset_index(drop=True)
    assert (df["phash"] == ref["phash"]).all()
    assert (df["caption"] == ref["caption"]).all()
    assert all(bytes(a) == bytes(b) for a, b in zip(df["bytes"], ref["bytes"]))

"""Golden parity vs the reference fixtures (reference test/{in,out}).

Equality bar matches the reference's vitest deep-equality
(test/index.test.ts:16-32): identical feature order, identical property
sets, and float64 BIT-identical coordinates (checked via struct pack).
"""

import json
import pathlib
import struct

import pytest

from simplepolygon_ray.geom import colorize, decompose_feature

FIX = pathlib.Path(__file__).parent / "fixtures"
NAMES = ["simple", "complex", "with-hole"]


def bits(x: float) -> int:
    return struct.unpack("<Q", struct.pack("<d", float(x)))[0]


def assert_deep_equal(a, b, path=""):
    if isinstance(a, dict) and isinstance(b, dict):
        assert set(a) == set(b), f"keys differ at {path}: {sorted(set(a) ^ set(b))}"
        for k in a:
            assert_deep_equal(a[k], b[k], f"{path}/{k}")
    elif isinstance(a, list) and isinstance(b, list):
        assert len(a) == len(b), f"length differs at {path}"
        for i, (x, y) in enumerate(zip(a, b)):
            assert_deep_equal(x, y, f"{path}[{i}]")
    elif (
        isinstance(a, (int, float))
        and isinstance(b, (int, float))
        and not isinstance(a, bool)
        and not isinstance(b, bool)
    ):
        assert bits(float(a)) == bits(float(b)), f"float bits differ at {path}: {a!r} vs {b!r}"
    else:
        assert a == b, f"value differs at {path}: {a!r} vs {b!r}"


@pytest.mark.parametrize("name", NAMES)
def test_golden_fixture(name):
    fin = json.loads((FIX / f"in_{name}.json").read_text())
    expected = json.loads((FIX / f"out_{name}.json").read_text())
    got = colorize(decompose_feature(fin))
    assert_deep_equal(got, expected)


def test_complex_has_more_than_two_features():
    fin = json.loads((FIX / "in_complex.json").read_text())
    got = decompose_feature(fin)
    assert len(got["features"]) > 2


def test_fast_path_has_no_index_property():
    fin = json.loads((FIX / "in_with-hole.json").read_text())
    got = decompose_feature(fin)
    for f in got["features"]:
        assert "index" not in f["properties"]


def test_walk_path_has_index_property():
    fin = json.loads((FIX / "in_simple.json").read_text())
    got = decompose_feature(fin)
    assert [f["properties"]["index"] for f in got["features"]] == [0, 1]


def test_public_api_reference_readme_example():
    """The reference README / jsdoc example (src/index.ts:19-37):
    one figure-eight polygon in -> FeatureCollection of two simple
    triangles with parent -1 and opposite windings — consumable from
    the package top level without Ray."""
    from simplepolygon_ray import simplepolygon

    poly = {
        "type": "Feature",
        "geometry": {
            "type": "Polygon",
            "coordinates": [[[0, 0], [2, 0], [0, 2], [2, 2], [0, 0]]],
        },
    }
    result = simplepolygon(poly)
    assert result["type"] == "FeatureCollection"
    coords = [f["geometry"]["coordinates"] for f in result["features"]]
    props = [f["properties"] for f in result["features"]]
    assert coords == [
        [[[0, 0], [2, 0], [1, 1], [0, 0]]],
        [[[1, 1], [0, 2], [2, 2], [1, 1]]],
    ]
    assert [p["parent"] for p in props] == [-1, -1]
    assert [p["winding"] for p in props] == [1, -1]
    assert [p["netWinding"] for p in props] == [1, -1]

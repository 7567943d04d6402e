"""Ray stage tests: decompose-through-Ray golden parity, PIP join vs
O(N·M) brute force, kNN vs exhaustive sort, tile clip oracle."""

import numpy as np
import pyarrow as pa
import pytest

from simplepolygon_ray.geom.kernels import points_in_ring
from simplepolygon_ray.images.synth import gen_batch
from simplepolygon_ray.stages.cover_stage import cover_batch
from simplepolygon_ray.stages.decompose_stage import (
    decompose_batch,
    decompose_dataset,
    fixture_polygons,
    polygons_source,
)
from simplepolygon_ray.stages.knn import CellPointIndex, haversine_km
from simplepolygon_ray.stages.pip_join import CompiledRingIndex, pip_join_broadcast
from simplepolygon_ray.stages.tiles import sutherland_hodgman_bbox, tile_clip_batch


@pytest.fixture(scope="module")
def ring_table(ray_session):
    polys = fixture_polygons().union(polygons_source(60))
    refs = decompose_dataset(polys).to_arrow_refs()
    import ray

    return pa.concat_tables([ray.get(r) for r in refs])


def test_decompose_through_ray_matches_direct(ray_session):
    """The Ray pipeline (read → map_batches → collect) must equal the
    direct kernel call — golden fixtures through the distributed path."""
    import json
    import pathlib

    from simplepolygon_ray.geom import decompose

    out = decompose_dataset(fixture_polygons()).to_pandas()
    fix = pathlib.Path(__file__).parent / "fixtures"
    for name in ["simple", "complex", "with-hole"]:
        feat = json.loads((fix / f"in_{name}.json").read_text())
        direct = decompose(feat["geometry"]["coordinates"])
        got = out[out["geom_id"] == name].sort_values("ring_seq")
        assert len(got) == len(direct)
        for (_, row), exp in zip(got.iterrows(), direct):
            assert row["parent"] == exp.parent
            assert row["winding"] == exp.winding
            assert row["net_winding"] == exp.net_winding
            ring = np.asarray([list(p) for p in row["ring"]])
            assert ring.shape == exp.ring.shape
            assert (ring == exp.ring).all()  # float64 bit-exact through Arrow
            if exp.index is None:
                assert row["ring_index"] is None or np.isnan(row["ring_index"])
            else:
                assert int(row["ring_index"]) == exp.index


def test_pip_join_matches_brute_force(ray_session, ring_table):
    import ray.data as rd

    n_pts = 4000
    imgs = gen_batch({"id": np.arange(n_pts, dtype=np.int64)})
    pts = imgs.select(["image_id", "lon", "lat"])
    joined = (
        pip_join_broadcast(rd.from_arrow(pts), ring_table, concurrency=2)
        .to_pandas()
        .sort_values(["image_id", "geom_id", "ring_seq"])
        .reset_index(drop=True)
    )
    # brute force: every (point, ring) pair
    lon = pts["lon"].to_numpy()
    lat = pts["lat"].to_numpy()
    ids = pts["image_id"].to_pylist()
    expected = set()
    rings = ring_table["ring"].to_pylist()
    for rrow in range(len(ring_table)):
        ring = np.asarray([list(p) for p in rings[rrow]])
        hit = points_in_ring(lon, lat, ring)
        g = ring_table["geom_id"][rrow].as_py()
        s = ring_table["ring_seq"][rrow].as_py()
        for k in np.nonzero(hit)[0]:
            expected.add((ids[k], g, s))
    got = set(
        zip(joined["image_id"], joined["geom_id"], joined["ring_seq"].astype(int))
    )
    assert got == expected
    assert len(expected) > 0  # non-trivial test


def test_pip_join_shuffle_matches_broadcast(ray_session, ring_table):
    import ray.data as rd

    from simplepolygon_ray.stages.pip_join import pip_join_shuffle

    n_pts = 2000
    imgs = gen_batch({"id": np.arange(n_pts, dtype=np.int64)})
    pts = rd.from_arrow(imgs.select(["image_id", "lon", "lat"]))
    bc = pip_join_broadcast(pts, ring_table, concurrency=2).to_pandas()
    simple = rd.from_arrow(ring_table)
    sh = pip_join_shuffle(pts, simple, num_partitions=8, salt_factor=2).to_pandas()
    key = lambda df: set(zip(df["image_id"], df["geom_id"], df["ring_seq"].astype(int)))
    assert key(bc) == key(sh)


def test_pip_join_crossover_warns_and_matches(ray_session, caplog, monkeypatch):
    """Above the documented broadcast→shuffle crossover
    (``BROADCAST_GATHERED_EDGE_CAP``) the compiled index warns, and the
    shuffle path — the prescribed alternative — produces the identical
    membership set on the same corpus."""
    import logging

    import ray.data as rd

    from simplepolygon_ray.stages import pip_join as pj

    polys = polygons_source(250)
    simple = decompose_dataset(polys)
    refs = simple.to_arrow_refs()
    import ray

    ring_tbl = pa.concat_tables([ray.get(r) for r in refs])

    # a cap below this corpus's gathered-edge count models the
    # crossover; the warning must fire on the in-process build
    monkeypatch.setattr(pj, "BROADCAST_GATHERED_EDGE_CAP", 1_000)
    with caplog.at_level(logging.WARNING, logger="simplepolygon_ray.stages.pip_join"):
        idx = CompiledRingIndex(ring_tbl)
    assert idx.gathered_edges > 1_000  # corpus is above the (test) crossover
    assert any("pip_join_shuffle" in r.message for r in caplog.records)

    n_pts = 3000
    imgs = gen_batch({"id": np.arange(n_pts, dtype=np.int64)})
    pts_tbl = imgs.select(["image_id", "lon", "lat"])
    bc = pip_join_broadcast(rd.from_arrow(pts_tbl), idx).to_pandas()
    sh = pj.pip_join_shuffle(
        rd.from_arrow(pts_tbl),
        rd.from_arrow(ring_tbl),
        num_partitions=8,
        salt_factor=2,
    ).to_pandas()
    key = lambda df: set(zip(df["image_id"], df["geom_id"], df["ring_seq"].astype(int)))
    assert key(bc) == key(sh)
    assert len(bc) > 0


def test_knn_exact_tie_deterministic(ray_session):
    """Planted exact-tie corpus case: two sites mirror-symmetric in
    longitude about a probe have BIT-EQUAL haversine distances (same
    |Δlon|, same lats). Both must appear in the top-k, ordered by the
    (dist, neighbor_id) tie-break — the same rule the SQL oracle uses,
    so exact ties can never flake the rank-insensitive set compare."""
    import pyarrow as pa
    import ray.data as rd

    from simplepolygon_ray.stages.knn import haversine_km, knn_join_dataset

    lon0, lat0, d = 11.25, 47.5, 0.125
    probes = rd.from_arrow(
        pa.table({"image_id": ["p0"], "lon": [lon0], "lat": [lat0]})
    )
    sites = rd.from_arrow(
        pa.table(
            {
                "image_id": ["sA", "sB", "sC", "sD"],
                "lon": [lon0 - d, lon0 + d, lon0 + 3 * d, lon0 - 5 * d],
                "lat": [lat0, lat0, lat0, lat0],
            }
        )
    )
    dA = haversine_km(np.array([lon0]), np.array([lat0]), np.array([lon0 - d]), np.array([lat0]))[0]
    dB = haversine_km(np.array([lon0]), np.array([lat0]), np.array([lon0 + d]), np.array([lat0]))[0]
    assert dA == dB  # the tie is exact in float64
    out = (
        knn_join_dataset(probes, sites, k=3, level=4, concurrency=1)
        .to_pandas()
        .sort_values("rank")
    )
    assert list(out["neighbor_id"]) == ["sA", "sB", "sC"]  # id breaks the tie


def test_knn_matches_exhaustive(ray_session):
    imgs = gen_batch({"id": np.arange(800, dtype=np.int64)})
    sids = np.asarray(imgs["image_id"].to_pylist())
    slon = imgs["lon"].to_numpy()
    slat = imgs["lat"].to_numpy()
    index = CellPointIndex(sids, slon, slat, level=8)
    probes = gen_batch({"id": np.arange(10_000, 10_050, dtype=np.int64)})
    k = 5
    for m in range(len(probes["lon"])):
        qlon = probes["lon"][m].as_py()
        qlat = probes["lat"][m].as_py()
        idx, d = index.knn(qlon, qlat, k)
        got = [index.ids[i] for i in idx]
        brute = haversine_km(qlon, qlat, slon, slat)
        order = np.argsort(brute, kind="stable")[:k]
        assert list(np.sort(brute[order])) == pytest.approx(list(d), abs=0)
        assert set(got) == set(sids[order])


def test_knn_batch_matches_scalar(ray_session):
    """The per-cell-group batched probe path must equal the per-probe
    scalar expansion exactly (sites, ranks and distances)."""
    imgs = gen_batch({"id": np.arange(600, dtype=np.int64)})
    sids = np.asarray(imgs["image_id"].to_pylist())
    index = CellPointIndex(sids, imgs["lon"].to_numpy(), imgs["lat"].to_numpy(), level=8)
    probes = gen_batch({"id": np.arange(20_000, 20_300, dtype=np.int64)})
    plon = probes["lon"].to_numpy()
    plat = probes["lat"].to_numpy()
    k = 5
    pp, ss, rr, dd = index.knn_batch(plon, plat, k)
    for m in range(len(plon)):
        idx, d = index.knn(float(plon[m]), float(plat[m]), k)
        sel = pp == m
        assert (ss[sel] == idx).all(), m
        assert (rr[sel] == np.arange(len(idx))).all(), m
        assert (dd[sel] == d).all(), m  # bit-exact


def test_knn_join_dataset(ray_session):
    """Dataset-sides kNN join: index compiled in a task, same rows as
    the array-sides join."""
    import ray.data as rd

    from simplepolygon_ray.stages.knn import knn_join, knn_join_dataset

    sites_tbl = gen_batch({"id": np.arange(400, dtype=np.int64)}).select(
        ["image_id", "lon", "lat"]
    )
    probes = rd.from_arrow(
        gen_batch({"id": np.arange(30_000, 30_200, dtype=np.int64)}).select(
            ["image_id", "lon", "lat"]
        )
    )
    a = knn_join(
        probes,
        np.asarray(sites_tbl["image_id"].to_pylist()),
        sites_tbl["lon"].to_numpy(),
        sites_tbl["lat"].to_numpy(),
        k=3,
        concurrency=2,
    ).to_pandas()
    b = knn_join_dataset(
        probes, rd.from_arrow(sites_tbl), k=3, concurrency=2
    ).to_pandas()
    key = lambda df: sorted(zip(df["image_id"], df["neighbor_id"], df["rank"]))
    assert key(a) == key(b)


def test_knn_shuffle_matches_broadcast_when_exact(ray_session):
    """Cell-keyed shuffle kNN: rows flagged exact must equal the
    broadcast result; inexact flags only occur when the radius bound
    genuinely cannot certify the group."""
    import ray.data as rd

    from simplepolygon_ray.stages.knn import knn_join_dataset, knn_join_shuffle

    sites_tbl = gen_batch({"id": np.arange(1500, dtype=np.int64)}).select(
        ["image_id", "lon", "lat"]
    )
    probes = rd.from_arrow(
        gen_batch({"id": np.arange(40_000, 40_150, dtype=np.int64)}).select(
            ["image_id", "lon", "lat"]
        )
    )
    sites = rd.from_arrow(sites_tbl)
    sh = knn_join_shuffle(
        probes, sites, k=3, radius=2, num_partitions=4
    ).to_pandas()
    bc = knn_join_dataset(probes, sites, k=3, concurrency=2).to_pandas()
    exact = sh[sh["exact"]]
    assert len(exact) > 0  # radius 2 certifies most probes on this corpus
    key = lambda df: set(zip(df["image_id"], df["neighbor_id"], df["rank"]))
    assert key(exact) <= key(bc)
    # per-probe: every fully-exact probe's rows agree with broadcast
    for pid, grp in exact.groupby("image_id"):
        bgrp = bc[bc["image_id"] == pid]
        assert key(grp) == key(bgrp.head(len(grp))), pid


def test_fused_parent_pass_matches_per_polygon():
    """decompose(_defer_parents) + determine_parents_batch must equal
    per-polygon decompose exactly (parents, windings, net windings)
    over a diverse corpus slice."""
    from simplepolygon_ray.geom.decompose import decompose, determine_parents_batch
    from simplepolygon_ray.geom.families import polygon_for_id

    ringsets = [polygon_for_id(i, max_radius=1.5) for i in range(120)]
    direct = [decompose(r) for r in ringsets]
    deferred = [decompose(r, _defer_parents=True) for r in ringsets]
    determine_parents_batch(deferred)
    for d, f in zip(direct, deferred):
        assert len(d) == len(f)
        for a, b in zip(d, f):
            assert a.parent == b.parent
            assert a.winding == b.winding
            assert a.net_winding == b.net_winding
            assert (a.ring == b.ring).all()


def test_compact_cover_ring_split_across_blocks(ray_session):
    """Regression: compaction must see every cell of a ring in one
    task. A full sibling quad split across two input blocks still
    merges when routed through the (geom_id, ring_seq) groupby."""
    import ray.data as rd

    from simplepolygon_ray.cells.grid import _pack, cell_children
    from simplepolygon_ray.pipelines.catalog import compact_cover_table

    kids = cell_children(_pack(7, 3, 5)).ravel().astype(np.int64)

    def block(cells):
        return pa.table(
            {
                "geom_id": pa.array(["g"] * len(cells)),
                "ring_seq": pa.array([0] * len(cells), type=pa.int32()),
                "cell_id": pa.array(cells),
            }
        )

    ds = rd.from_arrow(block(kids[:2])).union(rd.from_arrow(block(kids[2:])))
    out = (
        ds.groupby(["geom_id", "ring_seq"])
        .map_groups(compact_cover_table, batch_format="pyarrow")
        .to_pandas()
    )
    assert len(out) == 1  # all 4 siblings merged into the parent
    assert int(out["level"].iloc[0]) == 7
    # block-local compaction would have missed the merge:
    partial = compact_cover_table(block(kids[:2]))
    assert len(partial) == 2


def test_cover_batch_empty():
    empty = pa.table(
        {
            "geom_id": pa.array([], type=pa.string()),
            "ring_seq": pa.array([], type=pa.int32()),
            "ring": pa.array([], type=pa.list_(pa.list_(pa.float64()))),
        }
    )
    out = cover_batch(empty)
    assert len(out) == 0


def test_sutherland_hodgman():
    sq = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float)
    # clip to a window cutting the square in half
    out = sutherland_hodgman_bbox(sq, 2, -1, 6, 5)
    assert len(out) >= 4
    from simplepolygon_ray.geom.kernels import shoelace_area

    assert abs(shoelace_area(out)) == pytest.approx(8.0)
    # window fully outside
    assert len(sutherland_hodgman_bbox(sq, 10, 10, 12, 12)) == 0
    # window fully containing: area preserved
    out2 = sutherland_hodgman_bbox(sq, -1, -1, 5, 5)
    assert abs(shoelace_area(out2)) == pytest.approx(16.0)


def test_tile_clip_covers_ring_area(ray_session):
    """Tiles partition the plane ⇒ clipped areas must sum to ring area."""
    from simplepolygon_ray.geom.kernels import shoelace_area

    ring = [[10.0, 10.0], [25.0, 12.0], [20.0, 25.0], [11.0, 20.0], [10.0, 10.0]]
    batch = pa.table(
        {
            "geom_id": pa.array(["g"]),
            "ring_seq": pa.array([0], type=pa.int32()),
            "ring": pa.array([ring], type=pa.list_(pa.list_(pa.float64()))),
        }
    )
    out = tile_clip_batch(batch, zoom=6)
    total = sum(
        abs(shoelace_area(np.asarray([list(p) for p in r])))
        for r in out["clipped_ring"].to_pylist()
    )
    want = abs(shoelace_area(np.asarray(ring)))
    assert total == pytest.approx(want, rel=1e-9)
    # tile ids are within range and unique
    tx = out["tile_x"].to_numpy()
    ty = out["tile_y"].to_numpy()
    assert len(set(zip(tx.tolist(), ty.tolist()))) == len(out)


def test_tile_clip_vectorized_matches_scalar(ray_session, ring_table):
    """The slabbed (T, M, 2) Sutherland–Hodgman must emit bit-identical
    clipped rings to the scalar per-tile kernel, for every tile of a
    real decomposed corpus."""
    from simplepolygon_ray.cells.grid import cell_bounds, cell_ij, cover_ring_with_boundary

    sub = ring_table.slice(0, 40)
    out = tile_clip_batch(sub, zoom=7)
    got = {}
    for k in range(len(out)):
        key = (
            out["geom_id"][k].as_py(),
            out["ring_seq"][k].as_py(),
            out["tile_x"][k].as_py(),
            out["tile_y"][k].as_py(),
        )
        got[key] = np.asarray(out["clipped_ring"][k].as_py())
    n = 1 << 7
    expected = {}
    for rr in range(len(sub)):
        ring = np.asarray(sub["ring"][rr].as_py())
        cells, is_b = cover_ring_with_boundary(ring, 7)
        lon0, lat0, lon1, lat1 = cell_bounds(cells)
        ii, jj = cell_ij(cells)
        for m in range(len(cells)):
            if is_b[m]:
                clipped = sutherland_hodgman_bbox(ring, lon0[m], lat0[m], lon1[m], lat1[m])
            else:
                clipped = np.array(
                    [[lon0[m], lat0[m]], [lon1[m], lat0[m]], [lon1[m], lat1[m]],
                     [lon0[m], lat1[m]], [lon0[m], lat0[m]]]
                )
            if len(clipped) < 4:
                continue
            key = (
                sub["geom_id"][rr].as_py(),
                sub["ring_seq"][rr].as_py(),
                int(ii[m]),
                int(n - 1 - jj[m]),
            )
            expected[key] = clipped
    assert set(got) == set(expected)
    for key in expected:
        assert got[key].shape == expected[key].shape, key
        assert (got[key] == expected[key]).all(), key  # float64 bit-exact


def test_pip_join_survives_empty_blocks(ray_session):
    """Regression (CORRECTNESS_r01 geo_pip_join): rd.range with more
    blocks than rows emits zero-row ZERO-COLUMN blocks; the compile
    path must normalize them, and polygons_source must cap its block
    count at n so they never arise from the public source."""
    import functools

    import ray.data as rd

    from simplepolygon_ray.stages.decompose_stage import gen_polygon_batch
    from simplepolygon_ray.stages.pip_join import compile_ring_index

    # hand-built failing shape: 12 blocks for 3 rows -> 9 empty blocks
    polys = rd.range(3, override_num_blocks=12).map_batches(
        functools.partial(gen_polygon_batch, max_radius=1.5),
        batch_format="numpy",
        batch_size=None,
    )
    simple = decompose_dataset(polys)
    index = compile_ring_index(simple)
    assert len(index.cell_to_rings) > 0

    imgs = gen_batch({"id": np.arange(500, dtype=np.int64)})
    pts = rd.from_arrow(imgs.select(["image_id", "lon", "lat"]))
    joined = pip_join_broadcast(pts, simple).to_pandas()
    assert {"image_id", "geom_id", "ring_seq"} <= set(joined.columns)

    # the public source caps blocks at n: no empty blocks at any width
    capped = polygons_source(3, parallelism=64).materialize()
    assert capped.num_blocks() <= 3


def test_decompose_quarantine(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from simplepolygon_ray.stages.decompose_stage import _RINGS_T, decompose_dataset

    polys = pa.table(
        {
            "geom_id": pa.array(["good", "dup_vertex", "also_good"]),
            "rings": pa.array(
                [
                    [[[0.0, 0.0], [2.0, 0.0], [0.0, 2.0], [2.0, 2.0], [0.0, 0.0]]],
                    [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [1.0, 0.0], [0.0, 0.0]]],
                    [[[5.0, 5.0], [6.0, 5.0], [6.0, 6.0], [5.0, 6.0], [5.0, 5.0]]],
                ],
                type=_RINGS_T,
            ),
        }
    )
    out = decompose_dataset(rd.from_arrow(polys), on_error="quarantine").to_pandas()
    bad = out[~out["ok"]]
    good = out[out["ok"]]
    assert list(bad["geom_id"]) == ["dup_vertex"]
    assert "DuplicateVertexError" in bad["error"].iloc[0]
    assert set(good["geom_id"]) == {"good", "also_good"}
    assert len(good[good["geom_id"] == "good"]) == 2  # bowtie decomposes
    # strict mode still raises
    import pytest as _pytest

    with _pytest.raises(Exception, match="duplicate"):
        decompose_dataset(rd.from_arrow(polys)).to_pandas()


def test_clip_pass_empty_slab():
    """A slab whose polygons ALL clip empty must not raise on the
    remaining passes (ADVICE: zero-width vertex axis after M_new==0)."""
    from simplepolygon_ray.stages.tiles import _clip_tiles_vec

    # triangle entirely left of its clip window -> first pass empties it
    P = np.zeros((2, 3, 2))
    P[:, 0] = (-10.0, 0.0)
    P[:, 1] = (-9.0, 0.0)
    P[:, 2] = (-9.5, 1.0)
    cnt = np.array([3, 3], np.int64)
    lo = np.array([5.0, 5.0])
    hi = np.array([6.0, 6.0])
    _, out_cnt = _clip_tiles_vec(P, cnt, lo, np.array([0.0, 0.0]), hi, np.array([1.0, 1.0]))
    assert (out_cnt == 0).all()


def test_knn_tie_break_by_neighbor_id(ray_session):
    """Equidistant sites rank by ascending neighbor id (deterministic,
    matching the SQL oracle's ORDER BY dist, neighbor_id)."""
    from simplepolygon_ray.stages.knn import CellPointIndex

    # two sites mirror-imaged across the probe longitude: identical
    # haversine distance, ids chosen so accumulation order != id order
    sids = np.asarray(["z_far", "b_site", "a_site"])
    slon = np.array([10.0, 1.0, -1.0])
    slat = np.array([40.0, 0.0, 0.0])
    index = CellPointIndex(sids, slon, slat, level=4)
    idx, d = index.knn(0.0, 0.0, 2)
    assert list(index.ids[idx]) == ["a_site", "b_site"]
    assert d[0] == d[1]
    pp, ss, rr, dd = index.knn_batch(np.array([0.0]), np.array([0.0]), 2)
    assert list(index.ids[ss]) == ["a_site", "b_site"]


def test_segmented_topk_matches_naive():
    from simplepolygon_ray.stages.knn import _segmented_topk

    rng = np.random.default_rng(13)
    n = 500
    probes = rng.choice([f"p{i}" for i in range(40)], n)
    nids = rng.choice([f"s{i}" for i in range(25)], n)
    dist = rng.choice(np.linspace(0, 10, 20), n)  # force distance ties
    k = 3
    sel, rank = _segmented_topk(probes, nids, dist, k)
    got = {}
    for s, r in zip(sel, rank):
        got.setdefault(probes[s], []).append((dist[s], nids[s], r))
    for p in np.unique(probes):
        rows = sorted(
            [(dist[i], nids[i]) for i in range(n) if probes[i] == p]
        )[:k]
        want = [(d, s, i) for i, (d, s) in enumerate(rows)]
        assert got[p] == want, p


def test_knn_shuffle_salted_matches_unsalted(ray_session):
    """salt_factor shards a hot cell's sites; the result is identical
    to the unsalted join (probes visit every shard)."""
    import ray.data as rd

    from simplepolygon_ray.stages.knn import knn_join_shuffle

    sites = rd.from_arrow(
        gen_batch({"id": np.arange(900, dtype=np.int64)}).select(
            ["image_id", "lon", "lat"]
        )
    )
    probes = rd.from_arrow(
        gen_batch({"id": np.arange(50_000, 50_120, dtype=np.int64)}).select(
            ["image_id", "lon", "lat"]
        )
    )
    a = knn_join_shuffle(probes, sites, k=3, radius=2, num_partitions=4).to_pandas()
    b = knn_join_shuffle(
        probes, sites, k=3, radius=2, num_partitions=4, salt_factor=3
    ).to_pandas()
    key = lambda df: sorted(
        zip(df["image_id"], df["neighbor_id"], df["rank"], df["exact"])
    )
    assert key(a) == key(b)


def test_knn_dataset_shard_crossover_equivalence(ray_session, caplog):
    """VERDICT r4 item 6: past the gathered-site cap the dataset-sides
    kNN join warns and shards the index; the sharded result must equal
    the broadcast result row-for-row (every global top-k site is in
    its own shard's top-k, and both paths tie-break by (dist, id))."""
    import logging

    import ray.data as rd

    from simplepolygon_ray.stages.knn import knn_join_dataset

    sites = rd.from_arrow(
        gen_batch({"id": np.arange(900, dtype=np.int64)}).select(
            ["image_id", "lon", "lat"]
        )
    ).repartition(6)
    probes = rd.from_arrow(
        gen_batch({"id": np.arange(50_000, 50_180, dtype=np.int64)}).select(
            ["image_id", "lon", "lat"]
        )
    )

    bc = knn_join_dataset(probes, sites, k=3, concurrency=2).to_pandas()
    with caplog.at_level(logging.WARNING, logger="simplepolygon_ray.stages.knn"):
        sh = knn_join_dataset(
            probes, sites, k=3, concurrency=2, broadcast_site_cap=100
        ).to_pandas()
    assert any("no longer broadcast-small" in r.message for r in caplog.records)

    key = lambda df: sorted(
        zip(df["image_id"], df["neighbor_id"], df["rank"], df["dist_km"])
    )
    assert len(bc) == len(probes.to_pandas()) * 3
    assert key(bc) == key(sh)

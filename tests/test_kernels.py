"""Unit tests of the frozen numeric kernels (SURVEY.md §1.3 contract)."""

import numpy as np
import pytest

from simplepolygon_ray.geom.jsnum import js_coord_str, js_num_str
from simplepolygon_ray.geom.kernels import (
    is_convex,
    point_in_ring,
    points_in_ring,
    segment_intersections,
    shoelace_area,
    winding_of_ring,
)
from simplepolygon_ray.geom.gpsi import self_intersections
from simplepolygon_ray.geom.decompose import DuplicateVertexError, decompose


class TestJsNum:
    @pytest.mark.parametrize(
        "x,s",
        [
            (5.0, "5"),
            (-5.0, "-5"),
            (0.0, "0"),
            (-0.0, "0"),
            (0.5, "0.5"),
            (123.456, "123.456"),
            (1e21, "1e+21"),
            (1e20, "100000000000000000000"),
            (1e-6, "0.000001"),
            (1e-7, "1e-7"),
            (1e16, "10000000000000000"),
            (0.1, "0.1"),
            (-18.062312304546715, "-18.062312304546715"),
            (1.5e-5, "0.000015"),
            (2.5e22, "2.5e+22"),
        ],
    )
    def test_js_num_str(self, x, s):
        assert js_num_str(x) == s

    def test_coord_str(self):
        assert js_coord_str([113.291015625, -18.062312304546715]) == (
            "113.291015625,-18.062312304546715"
        )


class TestConvexWinding:
    def test_is_convex(self):
        assert is_convex((0, 0), (1, 0), (1, 1), True)
        assert not is_convex((0, 0), (1, 0), (1, -1), True)
        assert is_convex((0, 0), (1, 0), (1, -1), False)

    def test_winding(self):
        ccw = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], float)
        assert winding_of_ring(ccw) == 1
        assert winding_of_ring(ccw[::-1].copy()) == -1


class TestPointInRing:
    SQ = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float)

    def test_inside_outside(self):
        assert point_in_ring((2, 2), self.SQ)
        assert not point_in_ring((5, 2), self.SQ)
        assert not point_in_ring((-1, -1), self.SQ)

    def test_boundary_ignored(self):
        # vertices and edge-interior points are both boundary -> outside
        assert not point_in_ring((0, 0), self.SQ)
        assert not point_in_ring((2, 0), self.SQ)
        assert not point_in_ring((4, 2), self.SQ)
        assert point_in_ring((2, 0), self.SQ, ignore_boundary=False)

    def test_vectorized_matches_scalar(self):
        rng = np.random.default_rng(7)
        pts = rng.uniform(-1, 5, size=(500, 2))
        ring = np.array([[0, 0], [4, 1], [3, 4], [1, 3], [0, 0]], float)
        vec = points_in_ring(pts[:, 0], pts[:, 1], ring)
        ref = np.array([point_in_ring(p, ring) for p in pts])
        assert (vec == ref).all()


class TestSegmentIntersections:
    def test_proper_cross(self):
        ok, ix, iy, fa, fb = segment_intersections(
            np.array([[0.0, 0.0]]), np.array([[2.0, 2.0]]),
            np.array([[0.0, 2.0]]), np.array([[2.0, 0.0]]),
        )
        assert ok[0] and ix[0] == 1.0 and iy[0] == 1.0
        assert fa[0] == 0.5 and fb[0] == 0.5

    def test_endpoint_touch_rejected(self):
        # B starts exactly at the crossing point -> frac 0 (strict reject)
        ok, *_ = segment_intersections(
            np.array([[0.0, 0.0]]), np.array([[2.0, 2.0]]),
            np.array([[1.0, 1.0]]), np.array([[2.0, 0.0]]),
        )
        assert not ok[0]

    def test_parallel_rejected(self):
        ok, *_ = segment_intersections(
            np.array([[0.0, 0.0]]), np.array([[1.0, 0.0]]),
            np.array([[0.0, 1.0]]), np.array([[1.0, 1.0]]),
        )
        assert not ok[0]

    def test_vertical_edge_frac_on_y(self):
        # A vertical: frac computed on y-axis
        ok, ix, iy, fa, fb = segment_intersections(
            np.array([[1.0, 0.0]]), np.array([[1.0, 4.0]]),
            np.array([[0.0, 1.0]]), np.array([[2.0, 1.0]]),
        )
        assert ok[0] and fa[0] == 0.25 and fb[0] == 0.5

    def test_swap_invariance_bit_exact(self):
        rng = np.random.default_rng(3)
        a0, a1, b0, b1 = (rng.uniform(-100, 100, size=(200, 2)) for _ in range(4))
        ok1, x1, y1, *_ = segment_intersections(a0, a1, b0, b1)
        ok2, x2, y2, *_ = segment_intersections(b0, b1, a0, a1)
        assert (ok1 == ok2).all()
        assert (x1[ok1] == x2[ok1]).all() and (y1[ok1] == y2[ok1]).all()


class TestGpsi:
    def test_bowtie(self):
        ring = np.array([[0, 0], [2, 0], [0, 2], [2, 2], [0, 0]], float)
        rows = self_intersections([ring])
        # one geometric intersection at (1,1), two mirror rows
        assert len(rows["ix"]) == 2
        assert rows["unique"].sum() == 1
        assert (rows["ix"] == 1.0).all() and (rows["iy"] == 1.0).all()
        # emission grouped by outer edge lexicographic
        assert list(rows["edge0"]) == sorted(rows["edge0"])

    def test_square_no_isects(self):
        ring = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float)
        rows = self_intersections([ring])
        assert len(rows["ix"]) == 0

    def test_adjacent_edges_skipped(self):
        # sharp spike: adjacent edges share a vertex but must not report it
        ring = np.array([[0, 0], [4, 0], [2, 0.0001], [2, 3], [0, 3], [0, 0]], float)
        rows = self_intersections([ring])
        for x, y in zip(rows["ix"], rows["iy"]):
            assert (x, y) not in {(0, 0), (4, 0), (2, 0.0001), (2, 3), (0, 3)}

    def test_sweep_matches_broadcast(self):
        from simplepolygon_ray.geom import gpsi as g

        n = 60
        t = np.linspace(0, 2 * np.pi, n, endpoint=False)
        # 7-pointed star-like self-intersecting ring
        r = 1 + 0.9 * np.cos(7 * t)
        ring = np.column_stack([r * np.cos(t), r * np.sin(t)])
        ring = np.vstack([ring, ring[:1]])
        a = g.self_intersections([ring])
        old = g._BROADCAST_MAX_EDGES
        try:
            g._BROADCAST_MAX_EDGES = 1
            b = g.self_intersections([ring])
        finally:
            g._BROADCAST_MAX_EDGES = old
        for k in a:
            assert np.array_equal(a[k], b[k]), k


class TestDecomposeInvariants:
    def test_duplicate_vertex_raises(self):
        with pytest.raises(DuplicateVertexError):
            decompose([[[0, 0], [1, 0], [1, 1], [1, 0], [0, 0]]])

    def test_bowtie_decomposition(self):
        out = decompose([[[0, 0], [2, 0], [0, 2], [2, 2], [0, 0]]])
        assert len(out) == 2
        assert [r.winding for r in out] == [1, -1]
        assert [r.parent for r in out] == [-1, -1]
        assert [r.net_winding for r in out] == [1, -1]

    @pytest.mark.parametrize("n", [5, 7, 9])
    def test_star_family_invariants(self, n):
        # n-pointed pinwheel star: classic self-intersecting polygon
        t = 2 * np.pi * (np.arange(n) * ((n - 1) // 2)) / n
        coords = np.column_stack([np.cos(t), np.sin(t)])
        out = decompose([coords.tolist()])
        assert len(out) >= 2
        # every output ring is simple: re-decompose hits the fast path
        for r in out:
            again = decompose([r.ring.tolist()])
            assert len(again) == 1 and again[0].index is None
        # parent DAG is acyclic and net winding is consistent
        for i, r in enumerate(out):
            seen = set()
            j = i
            while out[j].parent != -1:
                assert j not in seen
                seen.add(j)
                j = out[j].parent
            if r.parent == -1:
                assert r.net_winding == r.winding
            else:
                assert r.net_winding == out[r.parent].net_winding + r.winding

    def test_edge_cover_invariant(self):
        # every input edge is covered exactly once by output rings
        # (reference README.md:59)
        coords = [[0, 0], [2, 0], [0, 2], [2, 2], [0, 0]]
        out = decompose([coords])
        in_len = sum(
            np.hypot(*(np.diff(np.asarray(coords, float), axis=0).T))
        )
        out_len = sum(
            np.hypot(*(np.diff(r.ring, axis=0).T)).sum() for r in out
        )
        assert np.isclose(in_len, out_len)

    def test_nested_fast_path_parent_chain(self):
        sq = lambda s: [[-s, -s], [s, -s], [s, s], [-s, s], [-s, -s]]
        out = decompose([sq(8), sq(4), sq(2)])
        assert [r.parent for r in out] == [-1, 0, 1]
        assert [r.net_winding for r in out] == [1, 2, 3]
        assert all(r.index is None for r in out)


def test_shoelace():
    sq = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], float)
    assert shoelace_area(sq) == 4.0
    assert shoelace_area(sq[::-1].copy()) == -4.0


def test_large_star_decomposes_in_bounded_time():
    """The reference's queue-membership scan is O(K^2) and effectively
    hangs on large polygons; the engine's indexed walk queue keeps the
    walk near-linear in the intersection count (star(301) has ~22k
    proper self-intersections)."""
    import time

    from simplepolygon_ray.geom.families import star

    t0 = time.perf_counter()
    out = decompose(star(301))
    assert time.perf_counter() - t0 < 15.0
    assert len(out) == 84
    # spot invariants at scale
    for r in out[:5]:
        assert (r.ring[0] == r.ring[-1]).all()

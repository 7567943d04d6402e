"""Behavior pin for the decompose kernel over a large seeded corpus.

The hash below was recorded from the golden-verified implementation
(bit-exact vs the reference fixtures). Any refactor of
geom/decompose.py must reproduce it exactly — it covers every synthetic
polygon family at many sizes, including multi-ring and hole cases the
three golden fixtures don't reach.
"""

import hashlib

import numpy as np

from simplepolygon_ray.geom.decompose import decompose
from simplepolygon_ray.geom.families import polygon_for_id

PIN = "99ae2aa897fedf9399696ba6dd3770807d055329f7d9fc55ac8699e14558a662"


def corpus_digest(n: int = 1500) -> str:
    h = hashlib.sha256()
    for gid in range(n):
        out = decompose(polygon_for_id(gid))
        for r in out:
            h.update(
                b"%d|%d|%d|%d|%d;"
                % (
                    -1 if r.index is None else r.index,
                    r.parent,
                    r.winding,
                    -(10**9) if r.net_winding is None else r.net_winding,
                    len(r.ring),
                )
            )
            h.update(np.ascontiguousarray(r.ring, dtype=np.float64).tobytes())
    return h.hexdigest()


def test_decompose_corpus_pin():
    assert corpus_digest() == PIN


def test_vectorized_generator_bit_exact():
    """gen_polygon_batch (bank-gather path) must reproduce the scalar
    polygon_for_id corpus bit-for-bit — coordinates AND geom_id
    strings — including >10-digit ids and a non-default max_radius."""
    import pyarrow as pa

    from simplepolygon_ray.stages.decompose_stage import _RINGS_T, gen_polygon_batch

    ids = np.concatenate(
        [np.arange(2000, dtype=np.int64), np.array([10**10 + 7, 2**40], dtype=np.int64)]
    )
    for mr in (1.5, 0.4):
        got = gen_polygon_batch({"id": ids}, max_radius=mr)
        ref = pa.table(
            {
                "geom_id": pa.array([f"poly{int(i):010d}" for i in ids]),
                "rings": pa.array(
                    [polygon_for_id(int(i), max_radius=mr) for i in ids], type=_RINGS_T
                ),
            }
        )
        assert got["geom_id"].to_pylist() == ref["geom_id"].to_pylist()
        assert got["rings"].to_pylist() == ref["rings"].to_pylist()

"""Round-5 batch-25 operator tests: geo ring diameter, TPC-H
Q19-shaped disjunctive promo revenue, tokenizer fertility — brute
recomputes at sf0.001."""

import re

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_geo_ring_diameter_matches_brute(ray_session):
    from simplepolygon_ray.pipelines.catalog import (
        _simple_rings_cached,
        q_geo_ring_diameter,
    )

    got = (
        q_geo_ring_diameter(SF)
        .to_pandas()
        .sort_values(["geom_id", "ring_seq"], ignore_index=True)
    )
    rings = _simple_rings_cached(SF).to_pandas()
    assert len(got) == len(rings) > 0
    rings = rings.sort_values(["geom_id", "ring_seq"], ignore_index=True)
    for i in range(min(60, len(rings))):
        ring = np.vstack([np.asarray(v, np.float64) for v in rings["ring"][i]])
        if len(ring) > 1 and (ring[0] == ring[-1]).all():
            ring = ring[:-1]
        xi = np.floor(ring[:, 0] * 1e5).astype(np.int64)
        yi = np.floor(ring[:, 1] * 1e5).astype(np.int64)
        dx = xi[:, None] - xi[None, :]
        dy = yi[:, None] - yi[None, :]
        want = int((dx * dx + dy * dy).max()) if len(ring) >= 2 else 0
        assert got["diam2_e10"][i] == want
        assert got["n_verts"][i] == len(ring)
    # the diameter dominates every edge length (sanity invariant)
    assert (got["diam2_e10"] >= 0).all()


def test_disjunctive_promo_revenue_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import (
        _Q19_TRIPLES,
        q_disjunctive_promo_revenue,
    )

    got = q_disjunctive_promo_revenue(SF)
    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    ).to_pandas()
    part = pq.read_table(
        f"{SF}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    ).to_pandas()
    m = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    mask = np.zeros(len(m), bool)
    for b, slo, shi, qlo, qhi in _Q19_TRIPLES:
        mask |= (
            (m["p_brand"] == b).to_numpy()
            & m["p_size"].between(slo, shi).to_numpy()
            & m["l_quantity"].between(qlo, qhi).to_numpy()
        )
    m = m[mask]
    m = m.assign(price_c=np.rint(m["l_extendedprice"] * 100).astype(np.int64))
    want = (
        m.groupby("p_brand", as_index=False)
        .agg(revenue_c=("price_c", "sum"), n_items=("price_c", "count"))
        .sort_values("p_brand", ignore_index=True)
    )
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(
        got, want.astype({"revenue_c": np.int64, "n_items": np.int64})
    )


def test_tokenizer_fertility_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import (
        _FERTILITY_PIECE_RE,
        q_tokenizer_fertility,
    )

    got = (
        q_tokenizer_fertility(SF)
        .to_pandas()
        .sort_values("lang", ignore_index=True)
        .astype({"sum_pieces": np.int64, "sum_words": np.int64, "n_docs": np.int64})
    )
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["lang", "text"]).to_pandas()
    pat = re.compile(_FERTILITY_PIECE_RE)
    docs["p"] = docs["text"].map(lambda s: len(pat.findall(s)))
    docs["w"] = docs["text"].map(lambda s: len(re.findall(r"\S+", s)))
    want = (
        docs.groupby("lang", as_index=False)
        .agg(sum_pieces=("p", "sum"), sum_words=("w", "sum"), n_docs=("p", "count"))
        .sort_values("lang", ignore_index=True)
        .astype({"sum_pieces": np.int64, "sum_words": np.int64, "n_docs": np.int64})
    )
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want)
    # fertility >= 1: every word is at least one piece
    assert (got["sum_pieces"] >= got["sum_words"]).all()

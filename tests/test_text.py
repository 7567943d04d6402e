"""Text analysis + dedup tests (brute-force oracles)."""

import numpy as np
import pandas as pd
import pytest

from simplepolygon_ray.text.dedup import (
    jaccard_ngrams,
    minhash_signature,
    simhash64,
)
from simplepolygon_ray.text.ops import (
    fingerprint_batch,
    langid_batch,
    quality_batch,
    token_count_batch,
)


def test_minhash_estimates_jaccard():
    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = "the quick brown fox jumps over the lazy cat again and again today"
    c = "completely unrelated sentence about database engines and shuffles"
    sa, sb, sc = (minhash_signature(t) for t in (a, b, c))
    est_ab = (sa == sb).mean()
    est_ac = (sa == sc).mean()
    true_ab = jaccard_ngrams(a, b)
    assert abs(est_ab - true_ab) < 0.2
    assert est_ab > 0.5 > est_ac


def test_minhash_identical_docs():
    s1 = minhash_signature("same text here")
    s2 = minhash_signature("same text here")
    assert (s1 == s2).all()


def test_simhash_similarity_ordering():
    a = simhash64("ray data engine with arrow batches and actor pools")
    b = simhash64("ray data engine with arrow batches and actor pool")
    c = simhash64("tomato soup recipe with basil garlic and fresh bread")
    assert bin(a ^ b).count("1") < bin(a ^ c).count("1")


def test_token_counts():
    df = pd.DataFrame({"doc_id": [1, 2, 3], "text": ["a b  c", "", "hello, world!"]})
    out = token_count_batch(df)
    assert out["n_ws_tokens"].tolist() == [3, 0, 2]
    assert out["n_bpeish_tokens"].tolist() == [3, 0, 4]  # hello , world !


def test_fingerprint_deterministic_and_order_sensitive():
    df = pd.DataFrame({"doc_id": [1, 2], "text": ["alpha beta", "beta alpha"]})
    out1 = fingerprint_batch(df)
    out2 = fingerprint_batch(df)
    assert out1["fingerprint"].tolist() == out2["fingerprint"].tolist()
    assert out1["fingerprint"][0] != out1["fingerprint"][1]


def test_langid_reasonable():
    df = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [
                "the cat and the dog sat in the house for a while",
                "el perro y el gato en la casa de los amigos es una",
            ],
        }
    )
    out = langid_batch(df)
    assert out["lang_pred"].tolist() == ["en", "es"]


def test_quality_scores_bounded():
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "the quick brown fox jumps over the lazy dog and runs away to the hills for a rest",
                "!!! ??? ... ###",
                "",
            ],
        }
    )
    out = quality_batch(df)
    assert ((out["quality"] >= 0) & (out["quality"] <= 1)).all()
    assert out["quality"][0] > out["quality"][1]


def test_minhash_dedup_pipeline_finds_near_dups(ray_session):
    import ray.data as rd

    from simplepolygon_ray.text.dedup import minhash_dedup_pairs

    # 16 bands × 8 rows ⇒ LSH similarity threshold ≈ (1/16)^(1/8) ≈ 0.7;
    # near-dups here sit well above it, the distinct docs well below
    base = "spark ray data engine shuffle groupby map batches arrow " * 4
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                base,
                base + "tail",
                "another document entirely about cooking pasta and sauce tonight",
                base + "extra words",
                "short",
                "yet another unrelated text regarding mountain hiking trips",
            ],
        }
    )
    pairs = minhash_dedup_pairs(rd.from_pandas(docs), threshold=0.7).to_pandas()
    got = set(zip(pairs["doc_a"].astype(int), pairs["doc_b"].astype(int)))
    assert (0, 1) in got and (0, 3) in got and (1, 3) in got
    assert not any(2 in p or 4 in p or 5 in p for p in got)
    for a, b in got:
        assert jaccard_ngrams(docs["text"][a], docs["text"][b]) >= 0.7


def test_exact_dedup(ray_session):
    import ray.data as rd

    from simplepolygon_ray.text.dedup import exact_dedup

    df = pd.DataFrame(
        {"doc_id": [3, 1, 2, 5], "text": ["x", "x", "y", "y"]}
    )
    out = exact_dedup(rd.from_pandas(df), "text").to_pandas()
    assert sorted(out["doc_id"].tolist()) == [1, 2]


def test_embedding_near_dup(ray_session):
    import ray.data as rd

    from simplepolygon_ray.text.dedup import embedding_near_dup_pairs

    rng = np.random.default_rng(3)
    base = rng.standard_normal(64).astype(np.float32)
    rows = []
    vecs = {
        0: base,
        1: base + 0.01 * rng.standard_normal(64).astype(np.float32),
        2: rng.standard_normal(64).astype(np.float32),
        3: base * 2.0,
    }
    df = pd.DataFrame(
        {
            "vec_id": np.asarray(list(vecs), np.int64),
            "embedding": [v.tolist() for v in vecs.values()],
        }
    )
    pairs = embedding_near_dup_pairs(rd.from_pandas(df), threshold=0.99).to_pandas()
    got = set(zip(pairs["doc_a"].astype(int), pairs["doc_b"].astype(int)))
    assert (0, 1) in got and (0, 3) in got
    assert not any(2 in p for p in got)

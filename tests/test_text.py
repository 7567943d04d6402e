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


def _scalar_fnv1a(data: bytes) -> int:
    h = 0xCBF29CE484222325
    for ch in data:
        h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def test_vectorized_hash_kernels_match_scalar():
    """The masked-matrix FNV kernels must be bit-identical to the
    per-character scalar chains they replaced."""
    import numpy as np
    import pandas as pd

    from simplepolygon_ray.text._hash import fnv64_batch
    from simplepolygon_ray.text.dedup import (
        _hash_shingles,
        _shingle_strings,
        explode_bands,
        shingle_minhash_batch,
        simhash64_many,
    )
    from simplepolygon_ray.text.ops import _bigram_scores, _rolling_fnv64, _rolling_fnv64_docs, _WORD_RE

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "",
        "a",
        "der schnelle braune fuchs und der faule hund",
        "punctuation, everywhere!!! 123 nums\nand newlines",
        "x " * 300,
    ]
    # fnv64_batch vs scalar FNV-1a
    strs = [t.encode() for t in texts]
    assert [int(v) for v in fnv64_batch(strs)] == [_scalar_fnv1a(s) for s in strs]
    # shingle hashes vs scalar chain
    for t in texts:
        sh = _hash_shingles(t, 3)
        exp = [_scalar_fnv1a(s.encode()) for s in _shingle_strings(t, 3)] or [0]
        assert [int(v) for v in sh] == exp
    # simhash vs the round-1 scalar definition
    def scalar_simhash(text):
        words = text.lower().split()
        if not words:
            return 0
        acc = np.zeros(64, np.int64)
        for w in words:
            h = np.uint64(_scalar_fnv1a(w.encode()))
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits == 1, 1, -1)
        bits = (acc > 0).astype(np.uint64)
        return int((bits << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))

    assert [int(v) for v in simhash64_many(texts)] == [scalar_simhash(t) for t in texts]
    # rolling fingerprint vs scalar chain
    exp_fp = [_rolling_fnv64(_WORD_RE.findall(t.lower())) for t in texts]
    assert [int(v) for v in _rolling_fnv64_docs(texts)] == exp_fp
    # band hashes vs scalar per-band FNV over uint64 lanes
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    sigs = shingle_minhash_batch(df)  # pa.Table (sig = fixed-size binary)
    bands = explode_bands(sigs)
    sig_bytes = sigs["sig"].to_pylist()
    b_did = bands["doc_id"].to_pylist()
    b_bid = bands["band_id"].to_pylist()
    b_bh = bands["band_hash"].to_pylist()
    for k in range(bands.num_rows):
        did, bid, bh = b_did[k], b_bid[k], b_bh[k]
        sig = np.frombuffer(sig_bytes[did], np.uint64)
        h = 0xCBF29CE484222325
        for v in sig[bid * 8 : (bid + 1) * 8]:
            h = ((h ^ int(v)) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        assert int(np.uint64(bh << 1)) >> 1 == h >> 1
        assert int(bh) == int(np.int64(np.uint64(h) >> np.uint64(1)))
    # vectorized langid equals the scalar reference on every text
    from simplepolygon_ray.text.ops import langid_batch

    got = langid_batch(pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    assert list(got["lang_pred"]) == [_bigram_scores(t) for t in texts]


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


def test_jaccard_rows_vec_matches_scalar():
    from simplepolygon_ray.text.dedup import _jaccard_rows_vec, jaccard_ngrams

    rng = np.random.default_rng(3)
    words = [f"w{i}" for i in range(30)]
    texts_a = [" ".join(rng.choice(words, rng.integers(0, 12))) for _ in range(40)]
    texts_b = [" ".join(rng.choice(words, rng.integers(0, 12))) for _ in range(40)]
    texts_a[5] = ""  # empty-doc sentinel path
    texts_b[5] = ""
    got = _jaccard_rows_vec(texts_a, texts_b)
    want = [jaccard_ngrams(a, b) for a, b in zip(texts_a, texts_b)]
    assert got.tolist() == want  # bit-exact (integer ratios in float64)


def test_pairs_within_matches_nested_loop():
    from simplepolygon_ray.text.dedup import _pairs_within, jaccard_ngrams

    rng = np.random.default_rng(7)
    words = [f"tok{i}" for i in range(25)]
    texts = [" ".join(rng.choice(words, rng.integers(1, 15))) for _ in range(60)]
    ids = np.arange(100, 160, dtype=np.int64)
    a, b, jac = _pairs_within(ids, texts, 0.2)
    got = {(int(x), int(y)): j for x, y, j in zip(a, b, jac)}
    want = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            v = jaccard_ngrams(texts[i], texts[j])
            if v >= 0.2:
                want[(int(ids[i]), int(ids[j]))] = v
    assert got == want  # same pairs, bit-exact values


def test_ngram_hot_bucket_bounded(ray_session):
    """5k docs forced into ONE SimHash-prefix bucket (prefix_bits=0)
    must finish fast: the secondary band splits the bucket and the
    inverted index avoids the 12.5M-pair nested loop."""
    import time

    import ray.data as rd

    from simplepolygon_ray.text.dedup import ngram_jaccard_pairs

    rng = np.random.default_rng(11)
    words = [f"word{i}" for i in range(5000)]
    texts = [" ".join(rng.choice(words, 20)) for _ in range(5000)]
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(5000, dtype=np.int64), "text": texts})
    )
    t0 = time.monotonic()
    pairs = ngram_jaccard_pairs(docs, threshold=0.9, prefix_bits=0).to_pandas()
    dt = time.monotonic() - t0
    assert dt < 60, f"hot bucket took {dt:.1f}s"
    assert len(pairs) == 0  # random 20-word docs share almost nothing


def test_embedding_near_dup_hot_bucket_bounded(ray_session):
    """A skewed bucket (all vectors in one LSH bucket) splits by the
    secondary band and runs chunked matmuls — bounded memory, and the
    found pairs are all true near-dups."""
    import ray.data as rd

    from simplepolygon_ray.text.dedup import embedding_near_dup_pairs

    rng = np.random.default_rng(5)
    base = rng.standard_normal(32).astype(np.float32)
    base /= np.linalg.norm(base)
    vecs = base[None, :] + 0.02 * rng.standard_normal((2000, 32)).astype(np.float32)
    vecs[1000:1010] = vecs[0:10]  # ten exact duplicates (cosine 1.0)
    df = pd.DataFrame(
        {
            "vec_id": np.arange(2000, dtype=np.int64),
            "embedding": [v for v in vecs],
        }
    )
    pairs = embedding_near_dup_pairs(
        rd.from_pandas(df), threshold=0.9999, bucket_cap=256
    ).to_pandas()
    got = set(zip(pairs["doc_a"].astype(int), pairs["doc_b"].astype(int)))
    assert got == {(i, 1000 + i) for i in range(10)}


def test_connected_components_hash_to_min(ray_session):
    """Chains, a star, and singleton pairs all collapse to the min-id
    label; compared against a brute-force union-find."""
    import ray.data as rd

    from simplepolygon_ray.text.dedup import connected_components

    rng = np.random.RandomState(7)
    # random forest of edges over 200 nodes
    a = rng.randint(0, 200, size=150).astype(np.int64)
    b = rng.randint(0, 200, size=150).astype(np.int64)
    keep = a != b
    a, b = a[keep], b[keep]
    # plus a long chain (worst case for propagation depth)
    chain = np.arange(300, 340, dtype=np.int64)
    a = np.concatenate([a, chain[:-1]])
    b = np.concatenate([b, chain[1:]])
    pairs = rd.from_pandas(pd.DataFrame({"doc_a": a, "doc_b": b})).repartition(4)
    got = connected_components(pairs, n_buckets=8).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)

    # brute union-find
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(a.tolist(), b.tolist()):
        parent[find(x)] = find(y)
    nodes = sorted(set(a.tolist()) | set(b.tolist()))
    roots = {}
    for n in nodes:
        roots.setdefault(find(n), []).append(n)
    want = {}
    for mem in roots.values():
        m = min(mem)
        for n in mem:
            want[n] = m
    assert list(got["doc_id"]) == nodes
    assert [want[n] for n in nodes] == list(got["group_id"])


def test_connected_components_empty(ray_session):
    import ray.data as rd

    from simplepolygon_ray.text.dedup import connected_components

    pairs = rd.from_pandas(
        pd.DataFrame({"doc_a": np.empty(0, np.int64), "doc_b": np.empty(0, np.int64)})
    )
    ds = connected_components(pairs)
    assert ds.count() == 0
    # empty Ray results drop schema through to_pandas; the dataset
    # itself stays typed
    assert sorted(ds.schema().names) == ["doc_id", "group_id"]


def test_near_dup_groups_keep_semantics(ray_session):
    import ray.data as rd

    from simplepolygon_ray.text.dedup import near_dup_groups

    base = "large scale web corpus dedup connected components label " * 4
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                base,
                base + "tail one",
                base + "tail two",
                "completely different text about something else entirely ok",
                "completely different text about something else entirely ok!",
                "unrelated singleton document with no duplicate partner here",
            ],
        }
    )
    out = near_dup_groups(rd.from_pandas(docs).repartition(3), threshold=0.5).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    # docs 0-2 form one group; 3-4 another; 5 absent (no pair)
    assert set(out["doc_id"]) == {0, 1, 2, 3, 4}
    g1 = out[out["doc_id"].isin([0, 1, 2])]
    assert (g1["group_id"] == 0).all() and (g1["group_size"] == 3).all()
    g2 = out[out["doc_id"].isin([3, 4])]
    assert (g2["group_id"] == 3).all() and (g2["group_size"] == 2).all()
    assert list(out.loc[out["keep"] == 1, "doc_id"]) == [0, 3]


def test_dedup_keep_best_semantics(ray_session, tmp_path):
    """Keep-best dedup keeps the LONGEST doc per near-dup group (ties
    to the smaller doc_id), unlike near_dup_groups' min-id canonical."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from simplepolygon_ray.pipelines.catalog import q_dedup_keep_best

    base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    texts = [
        base,                       # 0: group with 1 and 2
        base + " tailword",         # 1: longer -> the keeper
        base,                       # 2: same as 0
        "totally different text about other things entirely now",  # 3: solo
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([10, 11, 12, 13], pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["t"] * 4),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    pq.write_table(tbl, f"{sf}/documents.parquet")
    out = q_dedup_keep_best(sf).to_pandas().sort_values("group_id")
    assert len(out) == 1  # doc 13 pairs with nobody -> no group row
    row = out.iloc[0]
    assert row["group_id"] == 10  # min-id labels the component
    assert row["keep_doc_id"] == 11  # longest member wins
    assert row["group_size"] == 3
    assert row["max_chars"] == len(texts[1])


def test_minhash_verify_crossover_equivalence(ray_session, caplog):
    """VERDICT r4 item 5: past the broadcast-id cap the verify switches
    to the doc_id-bucketed shuffle join — forced here with cap=0 — and
    must emit exactly the broadcast path's verified pairs, with the
    crossover warning logged."""
    import logging

    import ray.data as rd

    from simplepolygon_ray.text.dedup import minhash_dedup_pairs

    docs = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )

    def canon(df):
        return (
            df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        )

    base = canon(minhash_dedup_pairs(docs, threshold=0.8).to_pandas())
    with caplog.at_level(logging.WARNING, logger="simplepolygon_ray.text.dedup"):
        alt = canon(
            minhash_dedup_pairs(docs, threshold=0.8, broadcast_id_cap=0).to_pandas()
        )
    assert any("shuffle-join verify" in r.message for r in caplog.records)
    assert len(base) > 0
    assert base.equals(alt)


def test_connected_components_local_fast_path_equivalence(ray_session):
    """The single-task small-graph fast path must produce the same
    (doc_id, group_id) labels as the distributed hash-to-min rounds
    (forced with local_cap=0) on a random multi-component graph."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from simplepolygon_ray.text.dedup import connected_components

    rng = np.random.RandomState(42)
    # several chains + stars + singleton pairs across a sparse id space
    a = rng.randint(0, 4000, 600).astype(np.int64)
    b = (a + rng.randint(1, 50, 600)).astype(np.int64)
    pairs = rd.from_arrow(pa.table({"doc_a": pa.array(a), "doc_b": pa.array(b)}))

    def canon(ds):
        df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
        return list(zip(df["doc_id"], df["group_id"]))

    local = canon(connected_components(pairs))  # n_edges << default cap
    dist = canon(connected_components(pairs, local_cap=0))
    assert len(local) > 0
    assert local == dist

"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

Scale shapes (the 100 TB design):

- **exact**: content hash in a vectorized map_batches, then
  ``groupby(hash).map_groups`` first-wins — the shuffle only carries
  (hash, id) after a slim projection.
- **MinHash-LSH**: per-batch shingle→minhash signatures (numpy
  universal hashing, no Python per shingle), explode to
  (band_id, band_hash, doc_id) rows, ``groupby`` the band key, emit
  candidate pairs per bucket, verify true Jaccard. Each stage is a
  batch transform; the only wide op is the band groupby.
- **SimHash**: 64-bit signature per doc; near-dups collide on rotated
  prefix buckets.
- **embedding cosine**: LSH hyperplane buckets over the vector column,
  within-bucket exact cosine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = [
    "shingle_minhash_batch",
    "explode_bands",
    "candidate_pairs_from_bucket",
    "jaccard_ngrams",
    "simhash_batch",
    "minhash_dedup_pairs",
    "simhash64",
    "ngram_jaccard_pairs",
    "exact_dedup",
    "embedding_near_dup_pairs",
]

_MERSENNE = (1 << 61) - 1
_N_PERM = 128
_BANDS = 16
_ROWS = _N_PERM // _BANDS

_rng = np.random.RandomState(0x5EED)
_A = _rng.randint(1, _MERSENNE, size=_N_PERM, dtype=np.int64).astype(np.uint64)
_B = _rng.randint(0, _MERSENNE, size=_N_PERM, dtype=np.int64).astype(np.uint64)


def _hash_shingles(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingles → uint64 hashes (vectorized FNV over bytes)."""
    words = text.lower().split()
    if len(words) < k:
        shingles = [" ".join(words)] if words else []
    else:
        shingles = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    if not shingles:
        return np.zeros(1, np.uint64)
    out = np.empty(len(shingles), np.uint64)
    for i, s in enumerate(shingles):
        h = np.uint64(0xCBF29CE484222325)
        for ch in s.encode():
            h = np.uint64((int(h) ^ ch) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
        out[i] = h
    return out


def minhash_signature(text: str, k: int = 3) -> np.ndarray:
    """(128,) uint64 minhash signature of a document."""
    sh = _hash_shingles(text, k)
    # universal hash: (a * x + b) mod p, vectorized over perms × shingles
    x = (sh % np.uint64(_MERSENNE))[None, :]
    vals = (_A[:, None] * x + _B[:, None]) % np.uint64(_MERSENNE)
    return vals.min(axis=1)


def shingle_minhash_batch(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    sigs = [minhash_signature(t or "") for t in batch[text_col]]
    return pd.DataFrame(
        {"doc_id": batch["doc_id"].to_numpy(), "sig": [s.tobytes() for s in sigs]}
    )


def explode_bands(batch: pd.DataFrame) -> pd.DataFrame:
    """signature rows → (doc_id, band_id, band_hash) rows."""
    doc_ids, band_ids, band_hashes = [], [], []
    for did, sb in zip(batch["doc_id"], batch["sig"]):
        sig = np.frombuffer(sb, np.uint64)
        for b in range(_BANDS):
            chunk = sig[b * _ROWS : (b + 1) * _ROWS]
            h = np.uint64(0xCBF29CE484222325)
            for v in chunk:
                h = np.uint64((int(h) ^ int(v)) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
            doc_ids.append(did)
            band_ids.append(b)
            band_hashes.append(np.int64(np.uint64(h) >> np.uint64(1)))
    return pd.DataFrame(
        {
            "doc_id": np.asarray(doc_ids, np.int64),
            "band_id": np.asarray(band_ids, np.int64),
            "band_hash": np.asarray(band_hashes, np.int64),
        }
    )


def candidate_pairs_from_bucket(group: pd.DataFrame) -> pd.DataFrame:
    ids = np.sort(group["doc_id"].to_numpy(np.int64))
    if len(ids) < 2:
        return pd.DataFrame({"doc_a": [], "doc_b": []}).astype(np.int64)
    a, b = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"doc_a": ids[a], "doc_b": ids[b]})


def jaccard_ngrams(t1: str, t2: str, k: int = 3) -> float:
    s1 = set(_hash_shingles(t1, k).tolist())
    s2 = set(_hash_shingles(t2, k).tolist())
    if not s1 and not s2:
        return 1.0
    return len(s1 & s2) / len(s1 | s2)


def minhash_dedup_pairs(docs, *, threshold: float = 0.8, text_col: str = "text"):
    """Full MinHash-LSH near-dup pipeline over a docs Dataset
    (doc_id, text) → verified pairs (doc_a, doc_b, jaccard)."""
    import ray

    sigs = docs.map_batches(shingle_minhash_batch, batch_format="pandas")
    bands = sigs.map_batches(explode_bands, batch_format="pandas")
    cands = bands.groupby(["band_id", "band_hash"]).map_groups(
        candidate_pairs_from_bucket, batch_format="pandas"
    )

    # dedup candidate pairs (same pair fires in multiple bands): slim shuffle
    def dedup_local(t: pd.DataFrame) -> pd.DataFrame:
        return t.drop_duplicates(["doc_a", "doc_b"])

    cands = cands.map_batches(dedup_local, batch_format="pandas")
    cands = cands.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )

    # verify true Jaccard; text side broadcast (slim id→text map). At
    # 100 TB the text map would be a hash-join back on doc_id instead.
    texts = dict(
        zip(
            docs.to_pandas()["doc_id"].to_numpy(np.int64),
            docs.to_pandas()[text_col],
        )
    )
    text_ref = ray.put(texts)

    def verify(t: pd.DataFrame) -> pd.DataFrame:
        tx = ray.get(text_ref)
        jac = np.array(
            [jaccard_ngrams(tx[a], tx[b]) for a, b in zip(t["doc_a"], t["doc_b"])]
        )
        t = t.assign(jaccard=jac)
        return t[t["jaccard"] >= threshold]

    return cands.map_batches(verify, batch_format="pandas")


def simhash64(text: str) -> int:
    """64-bit SimHash over word hashes."""
    words = text.lower().split()
    if not words:
        return 0
    acc = np.zeros(64, np.int64)
    for w in words:
        h = np.uint64(0xCBF29CE484222325)
        for ch in w.encode():
            h = np.uint64((int(h) ^ ch) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits == 1, 1, -1)
    bits = (acc > 0).astype(np.uint64)
    return int((bits << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))


def simhash_batch(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "simhash": pd.array(
                [int(np.uint64(simhash64(t or "")).astype(np.int64)) for t in batch[text_col]],
                dtype="int64",
            ),
        }
    )


def exact_dedup(ds, key_cols, *, id_col: str = "doc_id"):
    """Exact dedup: keep the minimum-id row per key group."""

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col, kind="mergesort").head(1)

    return ds.groupby(key_cols if isinstance(key_cols, list) else [key_cols]).map_groups(
        first, batch_format="pandas"
    )


def embedding_near_dup_pairs(
    emb, *, threshold: float = 0.95, n_planes: int = 12, vec_col: str = "embedding"
):
    """Near-dup by embedding cosine: LSH hyperplane bucket groupby, then
    within-bucket exact cosine (pairs emitted once, doc_a < doc_b)."""
    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack([np.asarray(v, np.float32) for v in batch[vec_col]])
        # deterministic hyperplanes: seeded per call, pure function of dim
        r = np.random.RandomState(0x91A)
        p = r.standard_normal((vecs.shape[1], n_planes)).astype(np.float32)
        bits = (vecs @ p) > 0
        bucket = (bits.astype(np.uint64) << np.arange(n_planes, dtype=np.uint64)).sum(axis=1)
        return pd.DataFrame(
            {
                "vec_id": batch["vec_id"].to_numpy(np.int64),
                "bucket": bucket.astype(np.int64),
                "vec": [v.tobytes() for v in vecs],
            }
        )

    def within(g: pd.DataFrame) -> pd.DataFrame:
        n = len(g)
        if n < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "cosine": []})
        vecs = np.stack([np.frombuffer(b, np.float32) for b in g["vec"]])
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        sim = unit @ unit.T
        ids = g["vec_id"].to_numpy(np.int64)
        order = np.argsort(ids, kind="stable")
        ids, sim = ids[order], sim[np.ix_(order, order)]
        a, b = np.triu_indices(n, k=1)
        keep = sim[a, b] >= threshold
        return pd.DataFrame(
            {
                "doc_a": ids[a[keep]],
                "doc_b": ids[b[keep]],
                "cosine": sim[a, b][keep].astype(np.float64),
            }
        )

    return (
        emb.map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(within, batch_format="pandas")
    )


def ngram_jaccard_pairs(
    docs,
    *,
    threshold: float = 0.5,
    prefix_bits: int = 12,
    text_col: str = "text",
):
    """n-gram Jaccard near-dup with SimHash-prefix blocking: docs that
    share the top ``prefix_bits`` of their SimHash become candidate
    pairs (groupby the prefix — the only shuffle), then exact word
    3-gram Jaccard verifies each pair. Pairs are emitted once
    (doc_a < doc_b) with their exact similarity."""

    def sig(batch: pd.DataFrame) -> pd.DataFrame:
        sh = np.asarray(
            [np.uint64(simhash64(t or "")) for t in batch[text_col]], np.uint64
        )
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(np.int64),
                "bucket": (sh >> np.uint64(64 - prefix_bits)).astype(np.int64),
                "text": batch[text_col],
            }
        )

    def within(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []}).astype(
                {"doc_a": np.int64, "doc_b": np.int64, "jaccard": np.float64}
            )
        g = g.sort_values("doc_id", kind="mergesort")
        ids = g["doc_id"].to_numpy(np.int64)
        texts = list(g["text"])
        shingles = [set(_hash_shingles(t, 3).tolist()) for t in texts]
        rows = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                si, sj = shingles[i], shingles[j]
                if not si and not sj:
                    jac = 1.0
                else:
                    jac = len(si & sj) / len(si | sj)
                if jac >= threshold:
                    rows.append((ids[i], ids[j], jac))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"]).astype(
            {"doc_a": np.int64, "doc_b": np.int64, "jaccard": np.float64}
        )

    return (
        docs.map_batches(sig, batch_format="pandas")
        .groupby("bucket")
        .map_groups(within, batch_format="pandas")
    )

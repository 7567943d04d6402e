"""Similarity search over an embedding column (``list<float>``).

- ``brute_topk``: exact cosine top-k — per-batch numpy matmul against
  a broadcast query matrix, partial top-k per batch, global
  sort+limit merge. The baseline every approximate method is judged
  against.
- ``multi_brute_topk``: Q queries share ONE corpus scan (batched
  matmul per block, k×Q slim partials, per-query merge).
- ``ivf_topk``: IVF-style scale path — deterministic k-means-lite
  centroids (task-compiled from a hash-mod sample), per-batch
  assignment, search restricted to the ``nprobe`` closest centroid
  buckets.
- ``lsh_topk``: hyperplane-LSH multi-probe path — seeded pure-function
  planes (no training, no shuffle, no broadcast).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..text.dedup import _list_f32_matrix

__all__ = [
    "brute_topk",
    "ivf_compile",
    "ivf_assign",
    "ivf_topk",
    "lsh_assign",
    "lsh_topk",
    "query_vector",
]


def query_vector(dim: int, seed: int = 7) -> np.ndarray:
    """Deterministic unit query vector for tests/benchmarks."""
    r = np.random.RandomState(seed)
    q = r.standard_normal(dim).astype(np.float32)
    return q / np.linalg.norm(q)


def _batch_vecs(batch, vec_col: str) -> np.ndarray:
    """(n, dim) float32 matrix of a vector column. Arrow tables read
    the flat list values buffer with ONE cast (zero row loop); pandas
    inputs keep the stacking fallback for driver-side helpers."""
    if isinstance(batch, pa.Table):
        return _list_f32_matrix(batch[vec_col])
    return np.stack([np.asarray(v, np.float32) for v in batch[vec_col]])


def _topk_table(ids: np.ndarray, sims: np.ndarray, k: int, id_col: str) -> pa.Table:
    """Partial top-k rows, (cosine desc, id asc) — the same tie-break
    as the global sort merge, so block boundaries never flip ties."""
    sel = np.lexsort((ids, -sims))[: min(k, len(ids))]
    return pa.table({id_col: pa.array(ids[sel]), "cosine": pa.array(sims[sel])})


def brute_topk(
    emb,
    query: np.ndarray,
    *,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Exact cosine top-k of one query against an embeddings Dataset."""
    qref = ray.put(np.asarray(query, np.float32))

    def score(t: pa.Table) -> pa.Table:
        q = ray.get(qref)
        vecs = _batch_vecs(t, vec_col)
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        sims = ((vecs @ q) / (norms * float(np.linalg.norm(q)))).astype(np.float64)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # partial top-k per batch: the global merge only sees k rows per block
        return _topk_table(ids, sims, k, id_col)

    partial = emb.map_batches(score, batch_format="pyarrow")
    return partial.sort(["cosine", id_col], descending=[True, False]).limit(k)


def _kmeans_lite(sample: np.ndarray, n_clusters: int, iters: int = 8) -> np.ndarray:
    """Deterministic k-means: first-k init on a hash-shuffled sample."""
    order = np.argsort(
        np.frombuffer(
            np.ascontiguousarray(sample[:, 0]).tobytes(), dtype=np.uint64
        ),
        kind="stable",
    )
    cent = sample[order[:n_clusters]].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(n_clusters):
            m = assign == c
            if m.any():
                cent[c] = sample[m].mean(0)
    return cent


@ray.remote
def _compile_centroids(n_clusters, nprobe, q, vec_col, *blocks):
    """k-means-lite centroids + probe-bucket set, built INSIDE a Ray
    task from the bounded sample's block refs — sample vectors never
    transit the driver; the returned ObjectRef is the broadcast."""
    import pyarrow as pa

    tables = [t for t in blocks if t.num_columns > 0 and t.num_rows > 0]
    full = pa.concat_tables(tables)
    sample = _list_f32_matrix(full[vec_col].combine_chunks())
    cent = _kmeans_lite(sample, min(n_clusters, len(sample)))
    probe_buckets = np.argsort(((cent - q[None, :]) ** 2).sum(1), kind="stable")[:nprobe]
    return cent, set(int(b) for b in probe_buckets)


def ivf_compile(
    emb,
    query: np.ndarray,
    *,
    n_clusters: int = 16,
    nprobe: int = 4,
    sample_rows: int = 2048,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Compile IVF centroids + probe-bucket set from a DETERMINISTIC
    hash-mod sample (every m-th id, m sized from the corpus count) —
    unbiased across the whole dataset, unlike a ``limit(n)`` that
    trains on the first parquet file at scale. Returns the broadcast
    ObjectRef; sample vectors never transit the driver."""
    q = np.asarray(query, np.float32)
    total = emb.count()  # parquet-metadata count: no data scan
    m = max(1, total // sample_rows)

    def keep_mod(t):
        import pyarrow as pa

        ids = t[id_col].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % m == 0))

    sample_refs = emb.map_batches(keep_mod, batch_format="pyarrow").to_arrow_refs()
    return _compile_centroids.remote(n_clusters, nprobe, q, vec_col, *sample_refs)


def ivf_assign(emb, compiled_ref, *, vec_col: str = "embedding", id_col: str = "vec_id"):
    """Per-vector IVF assignment + probe membership as a Dataset
    (vec_id, bucket, in_probe) — the persistable search manifest an
    oracle can replay the bucket-restricted ranking from."""

    def assign(t: pa.Table) -> pa.Table:
        c, probes = ray.get(compiled_ref)
        vecs = _batch_vecs(t, vec_col)
        d = ((vecs[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        a = d.argmin(1)
        return pa.table(
            {
                id_col: pa.array(
                    t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
                "bucket": pa.array(a.astype(np.int64)),
                "in_probe": pa.array(np.isin(a, list(probes))),
            }
        )

    return emb.map_batches(assign, batch_format="pyarrow")


def ivf_topk(
    emb,
    query: np.ndarray,
    *,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    sample_rows: int = 2048,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    compiled_ref=None,
):
    """IVF-bucketed approximate top-k: centroids from a deterministic
    hash-mod sample compiled in a Ray task (driver holds only refs),
    probe side searches only the ``nprobe`` nearest buckets."""
    q = np.asarray(query, np.float32)
    if compiled_ref is None:
        compiled_ref = ivf_compile(
            emb,
            q,
            n_clusters=n_clusters,
            nprobe=nprobe,
            sample_rows=sample_rows,
            vec_col=vec_col,
            id_col=id_col,
        )
    qref = ray.put(q)

    def score(t: pa.Table) -> pa.Table:
        c, probes = ray.get(compiled_ref)
        qq = ray.get(qref)
        vecs = _batch_vecs(t, vec_col)
        d = ((vecs[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        mask = np.isin(assign, list(probes))
        if not mask.any():
            return pa.table(
                {id_col: pa.array([], pa.int64()), "cosine": pa.array([], pa.float64())}
            )
        vecs = vecs[mask]
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        sims = ((vecs @ qq) / (norms * float(np.linalg.norm(qq)))).astype(np.float64)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)[mask]
        return _topk_table(ids, sims, k, id_col)

    partial = emb.map_batches(score, batch_format="pyarrow")
    return partial.sort(["cosine", id_col], descending=[True, False]).limit(k)


# ------------------------------------------------------------- LSH ANN

_LSH_PLANES_CACHE: dict = {}


def lsh_planes(dim: int, n_planes: int) -> np.ndarray:
    """Seeded hyperplane matrix, drawn once per worker process —
    a pure function of (dim, n_planes), so every task and the driver
    agree on bucket assignments without any broadcast."""
    key = (dim, n_planes)
    if key not in _LSH_PLANES_CACHE:
        r = np.random.RandomState(0xA55)
        _LSH_PLANES_CACHE[key] = r.standard_normal((dim, n_planes)).astype(np.float32)
    return _LSH_PLANES_CACHE[key]


def lsh_bucket_of(vecs: np.ndarray, n_planes: int) -> np.ndarray:
    """Sign-bit hyperplane bucket per row of ``vecs``."""
    p = lsh_planes(vecs.shape[1], n_planes)
    bits = (vecs @ p) > 0
    return (
        (bits.astype(np.uint64) << np.arange(n_planes, dtype=np.uint64))
        .sum(axis=1)
        .astype(np.int64)
    )


def lsh_probe_set(query: np.ndarray, n_planes: int) -> set[int]:
    """Multi-probe bucket set for one query: its own bucket plus every
    single-bit flip (vectors within one hyperplane of the query)."""
    qb = int(lsh_bucket_of(np.asarray(query, np.float32)[None, :], n_planes)[0])
    return {qb} | {qb ^ (1 << b) for b in range(n_planes)}


def lsh_assign(
    emb,
    query: np.ndarray,
    *,
    n_planes: int = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Per-vector LSH bucket + probe membership as a Dataset
    (vec_id, bucket, in_probe) — the persistable search manifest an
    oracle replays the bucket-restricted ranking from. Stateless,
    shuffle-free: the planes are a seeded pure function."""
    q = np.asarray(query, np.float32)

    def assign(t: pa.Table) -> pa.Table:
        vecs = _batch_vecs(t, vec_col)
        b = lsh_bucket_of(vecs, n_planes)
        probes = np.fromiter(lsh_probe_set(q, n_planes), np.int64)
        return pa.table(
            {
                id_col: pa.array(
                    t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
                "bucket": pa.array(b),
                "in_probe": pa.array(np.isin(b, probes)),
            }
        )

    return emb.map_batches(assign, batch_format="pyarrow")


def lsh_topk(
    emb,
    query: np.ndarray,
    *,
    k: int = 10,
    n_planes: int = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """LSH-bucketed approximate cosine top-k: candidates are vectors
    in the query's multi-probe buckets (own + 1-bit flips ≈
    (n_planes+1)/2^n_planes of the corpus), exact cosine rank within.

    The 100 TB scale path: NO shuffle, no training pass, no broadcast
    state — bucketize is a pure seeded function computed inside each
    map task, candidates reduce via per-block partial top-k and a
    k-row-per-block sort merge, so the only data movement is the
    filtered candidates' (id, cosine) pairs."""
    q = np.asarray(query, np.float32)
    qn = float(np.linalg.norm(q))

    def score(t: pa.Table) -> pa.Table:
        vecs = _batch_vecs(t, vec_col)
        b = lsh_bucket_of(vecs, n_planes)
        probes = np.fromiter(lsh_probe_set(q, n_planes), np.int64)
        mask = np.isin(b, probes)
        if not mask.any():
            return pa.table(
                {id_col: pa.array([], pa.int64()), "cosine": pa.array([], pa.float64())}
            )
        vecs = vecs[mask]
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        sims = ((vecs @ q) / (norms * qn)).astype(np.float64)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)[mask]
        return _topk_table(ids, sims, k, id_col)

    partial = emb.map_batches(score, batch_format="pyarrow")
    return partial.sort(["cosine", id_col], descending=[True, False]).limit(k)


def multi_brute_topk(
    emb,
    queries: np.ndarray,
    *,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Batched exact cosine top-k for Q probe queries in ONE pass over
    the corpus — the batched-inference shape: every block does a single
    (n, dim) @ (dim, Q) matmul against the broadcast query matrix,
    emits a per-(block, query) partial top-k (k × Q slim rows per
    block cross the wire, never vectors), and a Q-group groupby merges
    each query's global top-k with the (cosine desc, id asc)
    tie-break. Scales as one corpus scan regardless of Q."""
    qm = np.ascontiguousarray(np.asarray(queries, np.float32))
    qn = np.linalg.norm(qm, axis=1)
    qn[qn == 0] = 1.0
    qref = ray.put((qm.T.copy(), qn))
    Q = qm.shape[0]

    def score(t: pa.Table) -> pa.Table:
        qt, qnorm = ray.get(qref)
        vecs = _batch_vecs(t, vec_col)
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        sims = ((vecs @ qt) / (norms[:, None] * qnorm[None, :])).astype(np.float64)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        kk = min(k, len(ids))
        out_q, out_i, out_c = [], [], []
        for q in range(Q):  # Q is small; each column select is exact
            sel = np.lexsort((ids, -sims[:, q]))[:kk]
            out_q.append(np.full(kk, q, np.int64))
            out_i.append(ids[sel])
            out_c.append(sims[sel, q])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                id_col: pa.array(np.concatenate(out_i)),
                "cosine": pa.array(np.concatenate(out_c)),
            }
        )

    partial = emb.map_batches(score, batch_format="pyarrow")

    def merge(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cos = g["cosine"].to_numpy(zero_copy_only=False)
        qid = g["query_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = np.lexsort((ids, -cos))[: min(k, len(ids))]
        return pa.table(
            {
                "query_id": pa.array(qid[sel]),
                id_col: pa.array(ids[sel]),
                "rank": pa.array(np.arange(len(sel), dtype=np.int64)),
                "cosine": pa.array(cos[sel]),
            }
        )

    return partial.groupby("query_id").map_groups(merge, batch_format="pyarrow")

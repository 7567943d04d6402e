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

from ._hash import FNV_OFFSET, FNV_PRIME, fnv64_batch

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
    "connected_components",
    "near_dup_groups",
    "groups_from_pairs",
    "embedding_near_dup_pairs",
]

_MERSENNE = (1 << 61) - 1
_N_PERM = 128
_BANDS = 16
_ROWS = _N_PERM // _BANDS

_rng = np.random.RandomState(0x5EED)
_A = _rng.randint(1, _MERSENNE, size=_N_PERM, dtype=np.int64).astype(np.uint64)
_B = _rng.randint(0, _MERSENNE, size=_N_PERM, dtype=np.int64).astype(np.uint64)


def _shingle_strings(text: str, k: int = 3) -> list[str]:
    words = text.lower().split()
    if len(words) < k:
        return [" ".join(words)] if words else []
    return [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]


def _hash_shingles(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingles → uint64 hashes (vectorized FNV-1a)."""
    shingles = _shingle_strings(text, k)
    if not shingles:
        return np.zeros(1, np.uint64)
    return fnv64_batch([s.encode() for s in shingles])


def _hash_shingles_docs(texts: list[str], k: int = 3):
    """Shingle-hash MANY documents in one vectorized FNV pass.
    Returns (hashes, doc_offsets) with one zero-hash sentinel for
    shingle-less docs (matching ``_hash_shingles``)."""
    all_s: list[bytes] = []
    lens = np.empty(len(texts), np.int64)
    sentinel: list[int] = []
    for d, t in enumerate(texts):
        sh = _shingle_strings(t, k)
        if not sh:
            sentinel.append(len(all_s))
            all_s.append(b"")
            lens[d] = 1
            continue
        all_s.extend(s.encode() for s in sh)
        lens[d] = len(sh)
    h = fnv64_batch(all_s)
    if sentinel:
        h[np.asarray(sentinel, np.int64)] = np.uint64(0)
    offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    return h, offs


def minhash_signature(text: str, k: int = 3) -> np.ndarray:
    """(128,) uint64 minhash signature of a document."""
    sh = _hash_shingles(text, k)
    # universal hash: (a * x + b) mod p, vectorized over perms × shingles
    x = (sh % np.uint64(_MERSENNE))[None, :]
    vals = (_A[:, None] * x + _B[:, None]) % np.uint64(_MERSENNE)
    return vals.min(axis=1)


def shingle_minhash_batch(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Docs → 128-perm minhash signatures, one vectorized pass for the
    whole batch (shared FNV shingle matrix + per-perm reduceat mins)."""
    texts = [t or "" for t in batch[text_col]]
    h, offs = _hash_shingles_docs(texts)
    x = h % np.uint64(_MERSENNE)
    sigs = np.empty((len(texts), _N_PERM), np.uint64)
    starts = offs[:-1]
    for p in range(_N_PERM):
        v = (_A[p] * x + _B[p]) % np.uint64(_MERSENNE)
        sigs[:, p] = np.minimum.reduceat(v, starts)
    return pd.DataFrame(
        {"doc_id": batch["doc_id"].to_numpy(), "sig": [s.tobytes() for s in sigs]}
    )


def explode_bands(batch: pd.DataFrame) -> pd.DataFrame:
    """signature rows → (doc_id, band_id, band_hash) rows. The per-band
    FNV over 8 uint64 lanes runs as 8 full-width vector ops."""
    D = len(batch)
    if D == 0:
        return pd.DataFrame(
            {
                "doc_id": np.empty(0, np.int64),
                "band_id": np.empty(0, np.int64),
                "band_hash": np.empty(0, np.int64),
            }
        )
    sigs = np.frombuffer(b"".join(batch["sig"]), np.uint64).reshape(D, _BANDS, _ROWS)
    h = np.full((D, _BANDS), FNV_OFFSET, np.uint64)
    for r in range(_ROWS):
        h = (h ^ sigs[:, :, r]) * FNV_PRIME
    return pd.DataFrame(
        {
            "doc_id": np.repeat(batch["doc_id"].to_numpy(np.int64), _BANDS),
            "band_id": np.tile(np.arange(_BANDS, dtype=np.int64), D),
            "band_hash": (h >> np.uint64(1)).astype(np.int64).ravel(),
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


def _unique_row_hashes(texts: list[str], k: int = 3):
    """Per-document UNIQUE shingle hashes as flat (row, hash) arrays —
    the vectorized equivalent of ``set(_hash_shingles(t))`` per doc
    (one shared FNV pass + one lexsort, no per-doc Python)."""
    h, offs = _hash_shingles_docs(texts, k)
    rows = np.repeat(np.arange(len(texts), dtype=np.int64), np.diff(offs))
    order = np.lexsort((h, rows))
    r, hh = rows[order], h[order]
    keep = np.ones(len(r), bool)
    keep[1:] = (r[1:] != r[:-1]) | (hh[1:] != hh[:-1])
    return r[keep], hh[keep]


def _jaccard_rows_vec(texts_a: list[str], texts_b: list[str]) -> np.ndarray:
    """jaccard_ngrams(texts_a[i], texts_b[i]) for every i, fully
    vectorized: both sides' unique shingle hashes are concatenated and
    sorted once; duplicate (row, hash) entries — possible only across
    sides after the per-side dedupe — count the intersection."""
    n = len(texts_a)
    ra, ha = _unique_row_hashes(texts_a)
    rb, hb = _unique_row_hashes(texts_b)
    na = np.bincount(ra, minlength=n)
    nb = np.bincount(rb, minlength=n)
    rows = np.concatenate([ra, rb])
    hs = np.concatenate([ha, hb])
    order = np.lexsort((hs, rows))
    rows, hs = rows[order], hs[order]
    dup = (rows[1:] == rows[:-1]) & (hs[1:] == hs[:-1])
    ni = np.bincount(rows[1:][dup], minlength=n)
    union = na + nb - ni  # >= 1 always: empty docs carry the 0-sentinel
    return ni / np.maximum(union, 1)


def _pairs_in_runs(new: np.ndarray, vals: np.ndarray):
    """All within-run (a, b) pairs (a before b in run order) for runs
    delimited by ``new`` (True at each run start), batched by run-size
    class — no per-run Python loop beyond one iteration per DISTINCT
    size."""
    starts = np.flatnonzero(new)
    lens = np.diff(np.append(starts, len(new)))
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    for size in np.unique(lens[lens >= 2]):
        sel = starts[lens == size]
        members = vals[sel[:, None] + np.arange(size)[None, :]]
        ai, bi = np.triu_indices(int(size), 1)
        out_a.append(members[:, ai].ravel())
        out_b.append(members[:, bi].ravel())
    if not out_a:
        return np.empty(0, vals.dtype), np.empty(0, vals.dtype)
    return np.concatenate(out_a), np.concatenate(out_b)


def _pairs_within(ids: np.ndarray, texts: list[str], threshold: float):
    """All (doc_a < doc_b, jaccard >= threshold) pairs among one block
    of docs via a shingle inverted index (the structure the SQL oracle
    itself uses): pairs are generated ONLY for docs sharing a shingle
    hash, batched by group-size class — no nested Python pair loop.
    Output-sensitive: cost ~ total shingles + co-occurring pairs.
    Requires ``threshold > 0`` (zero-overlap pairs are never emitted)
    and ``ids`` sorted ascending."""
    n = len(texts)
    if n < 2:
        return np.empty(0, ids.dtype), np.empty(0, ids.dtype), np.empty(0)
    rh, hh = _unique_row_hashes(texts)
    counts = np.bincount(rh, minlength=n)
    order = np.lexsort((rh, hh))  # group by hash; rows ascending within
    hs, rs = hh[order], rh[order]
    new = np.ones(len(hs), bool)
    new[1:] = hs[1:] != hs[:-1]
    A, B = _pairs_in_runs(new, rs)
    if len(A) == 0:
        return np.empty(0, ids.dtype), np.empty(0, ids.dtype), np.empty(0)
    key = A * np.int64(n) + B
    uk, ni = np.unique(key, return_counts=True)
    ua, ub = uk // n, uk % n
    jac = ni / (counts[ua] + counts[ub] - ni)
    keep = jac >= threshold
    return ids[ua[keep]], ids[ub[keep]], jac[keep]


def dedupe_pairs_global(pairs, cols, *, n_buckets: int = 512):
    """Global (a, b)-pair dedupe for pairs emitted from several LSH
    bands: block-local ``drop_duplicates``, then ONE pair-hash-bucketed
    groupby dedupe — never an engine group per pair. Extra columns
    (e.g. a verified distance) ride along; duplicate pair rows carry
    identical values, so keeping the first is deterministic."""
    a_col, b_col = cols

    def local(t: pd.DataFrame) -> pd.DataFrame:
        t = t.drop_duplicates([a_col, b_col]).copy()
        with np.errstate(over="ignore"):
            t["_pb"] = (
                t[a_col].to_numpy(np.int64) * np.int64(0x9E3779B1)
                + t[b_col].to_numpy(np.int64)
            ) % n_buckets
        return t

    def grp(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates([a_col, b_col]).drop(columns=["_pb"])

    return (
        pairs.map_batches(local, batch_format="pandas")
        .groupby("_pb")
        .map_groups(grp, batch_format="pandas")
    )


def minhash_dedup_pairs(
    docs,
    *,
    threshold: float = 0.8,
    text_col: str = "text",
):
    """Full MinHash-LSH near-dup pipeline over a docs Dataset
    (doc_id, text) → verified pairs (doc_a, doc_b, jaccard).

    The verify stage never materializes the docs side anywhere: the
    candidate-id set (bounded by the LSH output) is assembled in a Ray
    task, broadcast to filter docs down to candidate texts inside
    ``map_batches``, and the resulting candidate-id→text map — also
    task-assembled — is broadcast to the verify stage. The docs table
    itself only ever streams."""
    sigs = docs.map_batches(shingle_minhash_batch, batch_format="pandas")
    bands = sigs.map_batches(explode_bands, batch_format="pandas")

    # candidate pairs: shuffle on a HASH BUCKET of the band hash (every
    # (band_id, band_hash) bucket lands whole in one group) and emit
    # pairs for ALL buckets of the group in one segmented vectorized
    # pass — no pandas group per LSH bucket (millions at corpus scale)
    n_band_buckets = 1024

    def add_bucket(t: pd.DataFrame) -> pd.DataFrame:
        t = t.copy()
        t["_bb"] = t["band_hash"].to_numpy(np.int64) % n_band_buckets
        return t

    def pairs_from_group(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort(
            (
                g["doc_id"].to_numpy(np.int64),
                g["band_hash"].to_numpy(np.int64),
                g["band_id"].to_numpy(np.int64),
            )
        )
        bid = g["band_id"].to_numpy(np.int64)[order]
        bh = g["band_hash"].to_numpy(np.int64)[order]
        ids = g["doc_id"].to_numpy(np.int64)[order]
        new = np.ones(len(order), bool)
        new[1:] = (bid[1:] != bid[:-1]) | (bh[1:] != bh[:-1])
        a, b = _pairs_in_runs(new, ids)
        return pd.DataFrame({"doc_a": a, "doc_b": b}).drop_duplicates(
            ["doc_a", "doc_b"]
        )

    cands = (
        bands.map_batches(add_bucket, batch_format="pandas")
        .groupby("_bb")
        .map_groups(pairs_from_group, batch_format="pandas")
    )

    # dedup candidate pairs across band buckets (same pair fires in
    # multiple bands): block-local dedupe, then one pair-hash-bucketed
    # dedupe — never a group per pair
    cands = dedupe_pairs_global(cands, ["doc_a", "doc_b"], n_buckets=n_band_buckets)

    # slim the text side BEFORE the joins: only docs that appear in a
    # candidate pair carry their text through the shuffle. The id set
    # is bounded by the LSH candidate count (not the corpus), collected
    # in a Ray task and broadcast — the driver holds one ObjectRef.
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    cands = cands.materialize()

    @ray.remote
    def _cand_ids(*blocks):
        parts = [
            np.concatenate(
                [
                    t["doc_a"].to_numpy(zero_copy_only=False),
                    t["doc_b"].to_numpy(zero_copy_only=False),
                ]
            )
            for t in blocks
            if t.num_columns > 0 and t.num_rows > 0
        ]
        return np.unique(np.concatenate(parts)) if parts else np.empty(0, np.int64)

    ids_ref = _cand_ids.remote(*cands.to_arrow_refs())

    def _filter(t: pa.Table) -> pa.Table:
        ids = ray.get(ids_ref)
        keep = t.filter(pc.is_in(t["doc_id"], value_set=pa.array(ids)))
        return keep.select(["doc_id", text_col])

    docs_small = docs.map_batches(_filter, batch_format="pyarrow")

    @ray.remote
    def _collect_texts_table(*blocks) -> pa.Table:
        ts = [
            t.select(["doc_id", text_col])
            for t in blocks
            if t.num_columns > 0 and t.num_rows > 0
        ]
        if not ts:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), text_col: pa.array([], pa.string())}
            )
        return pa.concat_tables(ts)

    # candidate-id→text table, assembled in a task and broadcast as one
    # columnar Arrow block: its size is bounded by the candidate-pair
    # count (LSH output), NOT the corpus, so the broadcast stays small
    # at any input scale. (A pathological corpus where candidates ~
    # corpus breaks any pair-verify design, joins included.)
    texts_ref = _collect_texts_table.remote(*docs_small.to_arrow_refs())

    _tx_cache: dict = {}

    def verify(t: pd.DataFrame) -> pd.DataFrame:
        # two vectorized hash joins of the pair batch against the
        # broadcast (doc_id, text) table, then one vectorized
        # shingle-set compare for the whole batch — no per-pair Python.
        # The pandas view of the broadcast converts once per worker
        # process, not once per batch.
        if "tx" not in _tx_cache:
            _tx_cache["tx"] = ray.get(texts_ref).to_pandas()
        tx = _tx_cache["tx"]
        m = t[["doc_a", "doc_b"]].merge(
            tx.rename(columns={"doc_id": "doc_a", text_col: "_ta"}), on="doc_a", how="left"
        )
        m = m.merge(
            tx.rename(columns={"doc_id": "doc_b", text_col: "_tb"}), on="doc_b", how="left"
        )
        jac = _jaccard_rows_vec(
            [x if isinstance(x, str) else "" for x in m["_ta"]],
            [x if isinstance(x, str) else "" for x in m["_tb"]],
        )
        out = pd.DataFrame(
            {
                "doc_a": m["doc_a"].to_numpy(np.int64),
                "doc_b": m["doc_b"].to_numpy(np.int64),
                "jaccard": jac,
            }
        )
        return out[out["jaccard"] >= threshold]

    return cands.map_batches(verify, batch_format="pandas")


def simhash64_many(texts: list[str]) -> np.ndarray:
    """(N,) uint64 SimHash of many documents in one vectorized pass:
    all words hash through the shared FNV matrix, per-doc ±1 bit sums
    come from one reduceat."""
    words_per: list[list[str]] = [t.lower().split() for t in texts]
    lens = np.fromiter((len(w) for w in words_per), np.int64, len(texts))
    all_words: list[bytes] = []
    for w in words_per:
        all_words.extend(x.encode() for x in w)
    h = fnv64_batch(all_words)
    shifts = np.arange(64, dtype=np.uint64)
    contrib = np.where(((h[:, None] >> shifts[None, :]) & np.uint64(1)) == 1, 1, -1)
    out = np.zeros(len(texts), np.uint64)
    nz = lens > 0
    if nz.any():
        offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
        acc = np.add.reduceat(contrib, offs[:-1][nz], axis=0)
        bits = (acc > 0).astype(np.uint64)
        out[nz] = (bits << shifts[None, :]).sum(axis=1, dtype=np.uint64)
    return out


def simhash64(text: str) -> int:
    """64-bit SimHash over word hashes."""
    return int(simhash64_many([text])[0])


def simhash_batch(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    sh = simhash64_many([t or "" for t in batch[text_col]])
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "simhash": pd.array(sh.astype(np.int64), dtype="int64"),
        }
    )


def exact_dedup(ds, key_cols, *, id_col: str = "doc_id"):
    """Exact dedup: keep the minimum-id row per key group. Runs as a
    block-local pre-combine (pandas groupby-min per block) followed by
    one Min aggregate — the shuffle carries at most one row per
    (key, block) and no per-key Python group ever materializes."""
    from ray.data.aggregate import Min

    keys = key_cols if isinstance(key_cols, list) else [key_cols]

    def local_min(t: pd.DataFrame) -> pd.DataFrame:
        return t.groupby(keys, as_index=False, sort=False)[id_col].min()

    partial = ds.map_batches(local_min, batch_format="pandas")
    return partial.groupby(keys).aggregate(Min(id_col, alias_name=id_col))


_PLANES_CACHE: dict = {}


def _planes_cached(dim: int, n_planes: int):
    """Seeded hyperplane matrices, drawn once per worker process.
    Primary planes come from the unchanged stream prefix (buckets stay
    bit-compatible across versions); the secondary band continues the
    same seeded stream."""
    key = (dim, n_planes)
    if key not in _PLANES_CACHE:
        r = np.random.RandomState(0x91A)
        p = r.standard_normal((dim, n_planes)).astype(np.float32)
        p2 = r.standard_normal((dim, 8)).astype(np.float32)
        _PLANES_CACHE[key] = (p, p2)
    return _PLANES_CACHE[key]


def hyperplane_bucketize(
    batch: pd.DataFrame, *, n_planes: int = 12, vec_col: str = "embedding"
) -> pd.DataFrame:
    """Deterministic hyperplane-LSH bucket per vector (seeded planes,
    pure function of the embedding dim). Also emits ``sub``: 8 extra
    hyperplane bits used as a secondary band to split oversized
    buckets (hot-bucket skew defusal; deterministic, SQL-replayable)."""
    vecs = np.stack([np.asarray(v, np.float32) for v in batch[vec_col]])
    p, p2 = _planes_cached(vecs.shape[1], n_planes)
    bits = (vecs @ p) > 0
    bits2 = (vecs @ p2) > 0
    bucket = (bits.astype(np.uint64) << np.arange(n_planes, dtype=np.uint64)).sum(axis=1)
    sub = (bits2.astype(np.uint64) << np.arange(8, dtype=np.uint64)).sum(axis=1)
    return pd.DataFrame(
        {
            "vec_id": batch["vec_id"].to_numpy(np.int64),
            "bucket": bucket.astype(np.int64),
            "sub": sub.astype(np.int64),
            "vec": [v.tobytes() for v in vecs],
        }
    )


def _cosine_pairs_block(ids: np.ndarray, unit: np.ndarray, threshold: float, chunk: int = 1024):
    """Upper-triangle cosine pairs >= threshold via row-chunked matmul:
    peak memory is chunk × n, never n × n. ``ids`` sorted ascending."""
    n = len(ids)
    out_a, out_b, out_c = [], [], []
    for c0 in range(0, n, chunk):
        c1 = min(c0 + chunk, n)
        sim = unit[c0:c1] @ unit.T  # (c, n)
        rows = np.arange(c0, c1)[:, None]
        cols = np.arange(n)[None, :]
        keep = (sim >= threshold) & (cols > rows)
        r, c = np.nonzero(keep)
        out_a.append(ids[r + c0])
        out_b.append(ids[c])
        out_c.append(sim[r, c].astype(np.float64))
    if not out_a:
        return np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0)
    return np.concatenate(out_a), np.concatenate(out_b), np.concatenate(out_c)


def embedding_near_dup_pairs(
    emb,
    *,
    threshold: float = 0.95,
    n_planes: int = 12,
    vec_col: str = "embedding",
    bucket_cap: int = 512,
):
    """Near-dup by embedding cosine: LSH hyperplane bucket groupby, then
    within-bucket exact cosine (pairs emitted once, doc_a < doc_b).

    Hot-bucket defusal: a bucket larger than ``bucket_cap`` is split by
    the deterministic secondary hyperplane band (``sub``) before the
    exact compare — bounded pair work per group at a small, replayable
    recall cost (the SQL oracle applies the identical rule). The exact
    compare itself runs as row-chunked matmuls (memory ~ chunk × n)."""
    import functools

    bucketize = functools.partial(
        hyperplane_bucketize, n_planes=n_planes, vec_col=vec_col
    )

    def within(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_a": [], "doc_b": [], "cosine": []}).astype(
            {"doc_a": np.int64, "doc_b": np.int64, "cosine": np.float64}
        )
        if len(g) < 2:
            return empty
        g = g.sort_values("vec_id", kind="mergesort")
        parts = (
            [sg for _, sg in g.groupby("sub", sort=True)]
            if len(g) > bucket_cap
            else [g]
        )
        frames = []
        for sg in parts:
            if len(sg) < 2:
                continue
            vecs = np.stack([np.frombuffer(b, np.float32) for b in sg["vec"]])
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            a, b, c = _cosine_pairs_block(
                sg["vec_id"].to_numpy(np.int64), vecs / norms, threshold
            )
            frames.append(pd.DataFrame({"doc_a": a, "doc_b": b, "cosine": c}))
        if not frames:
            return empty
        return pd.concat(frames, ignore_index=True)

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
    bucket_cap: int = 256,
):
    """n-gram Jaccard near-dup with SimHash-prefix blocking: docs that
    share the top ``prefix_bits`` of their SimHash become candidate
    pairs (groupby the prefix — the only shuffle), then exact word
    3-gram Jaccard verifies within buckets. Pairs are emitted once
    (doc_a < doc_b) with their exact similarity.

    Hot-bucket defusal: a bucket larger than ``bucket_cap`` splits by
    the NEXT 8 SimHash bits (secondary band) before the verify —
    deterministic and replayed identically by the SQL oracle. The
    verify itself is a shingle inverted index (no nested pair loop);
    ``threshold`` must be > 0 (zero-overlap pairs are never emitted)."""
    sub_shift = np.uint64(max(64 - prefix_bits - 8, 0))

    def sig(batch: pd.DataFrame) -> pd.DataFrame:
        sh = simhash64_many([t or "" for t in batch[text_col]])
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(np.int64),
                "bucket": (sh >> np.uint64(64 - prefix_bits)).astype(np.int64),
                "sub": ((sh >> sub_shift) & np.uint64(255)).astype(np.int64),
                "text": batch[text_col],
            }
        )

    def within(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []}).astype(
            {"doc_a": np.int64, "doc_b": np.int64, "jaccard": np.float64}
        )
        if len(g) < 2:
            return empty
        g = g.sort_values("doc_id", kind="mergesort")
        parts = (
            [sg for _, sg in g.groupby("sub", sort=True)]
            if len(g) > bucket_cap
            else [g]
        )
        frames = []
        for sg in parts:
            if len(sg) < 2:
                continue
            a, b, jac = _pairs_within(
                sg["doc_id"].to_numpy(np.int64), list(sg["text"]), threshold
            )
            frames.append(pd.DataFrame({"doc_a": a, "doc_b": b, "jaccard": jac}))
        if not frames:
            return empty
        return pd.concat(frames, ignore_index=True)

    return (
        docs.map_batches(sig, batch_format="pandas")
        .groupby("bucket")
        .map_groups(within, batch_format="pandas")
    )


# ------------------------------------------------------------------
# connected components over near-dup pairs → dedup group assignment
# ------------------------------------------------------------------


def _cc_step(g: pd.DataFrame) -> pd.DataFrame:
    """One hash-to-min round over one node bucket: every node computes
    the min of its (deduped) neighborhood m(v) and emits (u, m) for
    every neighbor u plus (m, u) — fully segmented numpy, no per-node
    Python."""
    node = g["node"].to_numpy(np.int64)
    nbr = g["nbr"].to_numpy(np.int64)
    order = np.lexsort((nbr, node))
    node, nbr = node[order], nbr[order]
    keep = np.ones(len(node), bool)
    keep[1:] = (node[1:] != node[:-1]) | (nbr[1:] != nbr[:-1])
    node, nbr = node[keep], nbr[keep]
    new = np.ones(len(node), bool)
    new[1:] = node[1:] != node[:-1]
    starts = np.flatnonzero(new)
    lens = np.diff(np.append(starts, len(node)))
    m = np.repeat(nbr[starts], lens)  # min nbr per node (sorted run head)
    out_node = np.concatenate([nbr, m])
    out_nbr = np.concatenate([m, nbr])
    out = pd.DataFrame({"node": out_node, "nbr": out_nbr})
    return out.drop_duplicates()


def connected_components(pairs, *, n_buckets: int = 256, max_rounds: int = 16):
    """Undirected pair Dataset (doc_a, doc_b) → (doc_id, group_id)
    where ``group_id`` is the smallest doc id in the node's connected
    component.

    Hash-to-min label propagation (Rastogi et al. 2013, "Finding
    Connected Components in Map-Reduce in Logarithmic Rounds"): each
    round every node v sends min(N(v) ∪ {v}) to all its neighbors and
    its neighborhood to that min — O(log d) rounds, each round ONE
    bucket-grouped shuffle of the (bounded) edge list, no joins. The
    edge set is materialized per round (it is bounded by the pair
    output, not the corpus) so lineage does not replay earlier rounds;
    convergence is detected by a rows+checksum signature aggregate."""
    import pyarrow as pa

    import ray.data as rd

    def seed(t: pd.DataFrame) -> pd.DataFrame:
        a = t["doc_a"].to_numpy(np.int64)
        b = t["doc_b"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "node": np.concatenate([a, b, a, b]),
                "nbr": np.concatenate([b, a, a, b]),
            }
        ).drop_duplicates()

    def add_bucket(t: pd.DataFrame) -> pd.DataFrame:
        t = t.copy()
        t["_nb"] = t["node"].to_numpy(np.int64) % n_buckets
        return t

    def step(g: pd.DataFrame) -> pd.DataFrame:
        return _cc_step(g.drop(columns=["_nb"]))

    def _signature(ds) -> tuple[int, int]:
        def sig(t: pa.Table) -> pa.Table:
            if t.num_columns == 0 or t.num_rows == 0:
                return pa.table({"n": pa.array([0], pa.int64()), "s": pa.array([0], pa.int64())})
            node = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
            nbr = t["nbr"].to_numpy(zero_copy_only=False).astype(np.int64)
            with np.errstate(over="ignore"):
                h = (node * np.int64(0x9E3779B1) + nbr * np.int64(0x85EBCA77)).sum()
            return pa.table({"n": pa.array([t.num_rows], pa.int64()), "s": pa.array([int(h)], pa.int64())})

        parts = ds.map_batches(sig, batch_format="pyarrow").to_pandas()
        return int(parts["n"].sum()), int(np.int64(parts["s"].to_numpy(np.int64)).sum())

    edges = pairs.map_batches(seed, batch_format="pandas").materialize()
    if edges.count() == 0:
        return rd.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()), "group_id": pa.array([], pa.int64())})
        )
    prev_sig = _signature(edges)
    for _ in range(max_rounds):
        edges = (
            edges.map_batches(add_bucket, batch_format="pandas")
            .groupby("_nb")
            .map_groups(step, batch_format="pandas")
            .materialize()
        )
        cur_sig = _signature(edges)
        if cur_sig == prev_sig:
            break
        prev_sig = cur_sig

    def labels(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_nb"])
        lab = g.groupby("node", as_index=False)["nbr"].min()
        return lab.rename(columns={"node": "doc_id", "nbr": "group_id"})

    return (
        edges.map_batches(add_bucket, batch_format="pandas")
        .groupby("_nb")
        .map_groups(labels, batch_format="pandas")
    )


def near_dup_groups(docs, *, threshold: float = 0.5, text_col: str = "text"):
    """Full near-dedup group assignment: MinHash-LSH verified pairs →
    connected components → (doc_id, group_id, group_size, keep) with
    ``keep = 1`` on the canonical (min-id) doc of each group. Docs in
    no pair are untouched (implicitly kept) — the output is bounded by
    the near-dup graph, not the corpus."""
    pairs = minhash_dedup_pairs(docs, threshold=threshold, text_col=text_col)
    return groups_from_pairs(pairs)


def groups_from_pairs(pairs):
    """Generic (doc_a, doc_b) pair Dataset → (doc_id, group_id,
    group_size, keep) group assignment — shared by the text and image
    near-dedup pipelines."""
    labs = connected_components(pairs)

    def attach_size(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_gb"]).copy()
        g["group_size"] = g.groupby("group_id")["doc_id"].transform("size").astype(np.int64)
        g["keep"] = (g["doc_id"].to_numpy(np.int64) == g["group_id"].to_numpy(np.int64)).astype(
            np.int64
        )
        return g

    def add_gbucket(t: pd.DataFrame) -> pd.DataFrame:
        t = t.copy()
        t["_gb"] = t["group_id"].to_numpy(np.int64) % 256
        return t

    return (
        labs.map_batches(add_gbucket, batch_format="pandas")
        .groupby("_gb")
        .map_groups(attach_size, batch_format="pandas")
    )

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

Every Dataset-facing stage here runs ``batch_format="pyarrow"`` —
blocks come out of the object store zero-copy, numpy kernels read the
Arrow buffers directly, and no per-block Arrow→pandas→Arrow conversion
happens anywhere on the dedup hot path.
"""

from __future__ import annotations

import logging as _logging
import os as _os

import numpy as np
import pyarrow as pa

from ._hash import FNV_OFFSET, FNV_PRIME, fnv64_batch

_logger = _logging.getLogger(__name__)

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

_SIG_TYPE = pa.binary(_N_PERM * 8)  # fixed-size: one zero-copy frombuffer per block


def _i64(col) -> np.ndarray:
    """int64 numpy view of an Arrow column (zero-copy when possible)."""
    return col.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)


def _dedupe_pair_rows(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row indices of the FIRST occurrence of each distinct (a, b) pair
    (lexsort is stable, so ties resolve to input order)."""
    order = np.lexsort((b, a))
    aa, bb = a[order], b[order]
    keep = np.ones(len(aa), bool)
    keep[1:] = (aa[1:] != aa[:-1]) | (bb[1:] != bb[:-1])
    return order[keep]


def _binary_views(col: pa.ChunkedArray | pa.Array):
    """(offsets, data) numpy views of a binary column — one frombuffer
    for the whole block, no per-row ``.as_py()``."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    off = np.frombuffer(arr.buffers()[1], np.int32)[arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(arr.buffers()[2], np.uint8)
    return off.astype(np.int64), data


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


def shingle_minhash_batch(batch, text_col: str = "text") -> pa.Table:
    """Docs → 128-perm minhash signatures, one vectorized pass for the
    whole batch (shared FNV shingle matrix + per-perm reduceat mins).
    The signature column is fixed-size binary, built from the (D, 128)
    uint64 block in one buffer handoff (no per-row tobytes)."""
    if not isinstance(batch, pa.Table):  # accept pandas in unit tests
        batch = pa.Table.from_pandas(batch, preserve_index=False)
    texts = [t if isinstance(t, str) else "" for t in batch[text_col].to_pylist()]
    h, offs = _hash_shingles_docs(texts)
    x = h % np.uint64(_MERSENNE)
    sigs = np.empty((len(texts), _N_PERM), np.uint64)
    starts = offs[:-1]
    for p in range(_N_PERM):
        v = (_A[p] * x + _B[p]) % np.uint64(_MERSENNE)
        sigs[:, p] = np.minimum.reduceat(v, starts)
    sig_col = pa.Array.from_buffers(
        _SIG_TYPE, len(texts), [None, pa.py_buffer(sigs.tobytes())]
    )
    return pa.table({"doc_id": batch["doc_id"], "sig": sig_col})


def explode_bands(batch: pa.Table) -> pa.Table:
    """signature rows → (doc_id, band_id, band_hash) rows. Signatures
    read as ONE frombuffer over the fixed-size binary column; the
    per-band FNV over 8 uint64 lanes runs as 8 full-width vector ops."""
    D = batch.num_rows
    if D == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "band_id": pa.array([], pa.int64()),
                "band_hash": pa.array([], pa.int64()),
            }
        )
    sig_arr = batch["sig"].combine_chunks()
    raw = np.frombuffer(sig_arr.buffers()[1], np.uint64)
    start = sig_arr.offset * _N_PERM
    sigs = raw[start : start + D * _N_PERM].reshape(D, _BANDS, _ROWS)
    h = np.full((D, _BANDS), FNV_OFFSET, np.uint64)
    for r in range(_ROWS):
        h = (h ^ sigs[:, :, r]) * FNV_PRIME
    return pa.table(
        {
            "doc_id": pa.array(np.repeat(_i64(batch["doc_id"]), _BANDS)),
            "band_id": pa.array(np.tile(np.arange(_BANDS, dtype=np.int64), D)),
            "band_hash": pa.array((h >> np.uint64(1)).astype(np.int64).ravel()),
        }
    )


def candidate_pairs_from_bucket(group) -> pa.Table:
    if isinstance(group, pa.Table):
        ids = np.sort(_i64(group["doc_id"]))
    else:
        ids = np.sort(np.asarray(group["doc_id"], np.int64))
    if len(ids) < 2:
        return pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
        )
    a, b = np.triu_indices(len(ids), k=1)
    return pa.table({"doc_a": pa.array(ids[a]), "doc_b": pa.array(ids[b])})


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


def _levenshtein_rows_vec(texts_a: list[str], texts_b: list[str]) -> np.ndarray:
    """levenshtein(texts_a[i], texts_b[i]) for every i — unit-cost
    Wagner–Fischer, vectorized ACROSS the pair axis: the outer loop
    runs max-len(b) times, and inside it the row update's sequential
    left-dependency (dp[i][j-1]+1) collapses to a min-plus prefix scan
    (minimum.accumulate of cand - j, plus j back). ASCII corpora only
    (byte == char, matching DuckDB's levenshtein on these inputs)."""
    n = len(texts_a)
    if n == 0:
        return np.zeros(0, np.int64)
    ba = [t.encode("utf-8") for t in texts_a]
    bb = [t.encode("utf-8") for t in texts_b]
    la = np.array([len(x) for x in ba], np.int64)
    lb = np.array([len(x) for x in bb], np.int64)
    La, Lb = int(la.max()), int(lb.max())
    A = np.zeros((n, max(La, 1)), np.uint8)
    B = np.zeros((n, max(Lb, 1)), np.uint8)
    for i, x in enumerate(ba):
        A[i, : len(x)] = np.frombuffer(x, np.uint8)
    for i, x in enumerate(bb):
        B[i, : len(x)] = np.frombuffer(x, np.uint8)
    res = np.zeros(n, np.int64)
    res[lb == 0] = la[lb == 0]
    row = np.broadcast_to(np.arange(La + 1, dtype=np.int64), (n, La + 1)).copy()
    j_idx = np.arange(La + 1, dtype=np.int64)
    for i in range(1, Lb + 1):
        cost = (A != B[:, i - 1 : i]).astype(np.int64)
        cand = np.empty_like(row)
        cand[:, 0] = i
        np.minimum(row[:, 1:] + 1, row[:, :-1] + cost, out=cand[:, 1:])
        row = np.minimum.accumulate(cand - j_idx, axis=1) + j_idx
        done = lb == i
        if done.any():
            res[done] = row[done, la[done]]
    return res


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
    bands: block-local numpy dedupe, then ONE pair-hash-bucketed
    groupby dedupe — never an engine group per pair. Extra columns
    (e.g. a verified distance) ride along via Arrow ``take``; duplicate
    pair rows carry identical values, so keeping the first is
    deterministic."""
    a_col, b_col = cols

    def local(t: pa.Table) -> pa.Table:
        a = _i64(t[a_col])
        b = _i64(t[b_col])
        rows = _dedupe_pair_rows(a, b)
        t = t.take(pa.array(rows))
        with np.errstate(over="ignore"):
            pb = (a[rows] * np.int64(0x9E3779B1) + b[rows]) % n_buckets
        return t.append_column("_pb", pa.array(pb))

    def grp(g: pa.Table) -> pa.Table:
        rows = _dedupe_pair_rows(_i64(g[a_col]), _i64(g[b_col]))
        return g.drop_columns(["_pb"]).take(pa.array(rows))

    return (
        pairs.map_batches(local, batch_format="pyarrow")
        .groupby("_pb")
        .map_groups(grp, batch_format="pyarrow")
    )


def _verify_pairs_shuffle(
    cands,
    docs,
    *,
    text_col: str,
    threshold: float,
    n_buckets: int = 512,
    scorer=None,
):
    """doc_id-bucketed shuffle verify for candidate sets too large to
    broadcast (the crossover target of ``MINHASH_BROADCAST_ID_CAP``):

    each candidate pair fans out to one row per side keyed by that
    side's doc_id; the full docs table streams in as text rows keyed by
    doc_id; ONE doc-hash bucket groupby co-locates them and attaches
    each side's text via a searchsorted within the bucket; a second
    pair-hash bucket groupby reunites the two sides of every pair and
    runs the whole-bucket vectorized shingle compare. Nothing is
    broadcast or driver-materialized — the exchange is bounded by
    (2 × pairs + docs) rows."""

    def fan_out(t: pa.Table) -> pa.Table:
        a = _i64(t["doc_a"])
        b = _i64(t["doc_b"])
        n = len(a)
        return pa.table(
            {
                "key": pa.array(np.concatenate([a, b])),
                "doc_a": pa.array(np.concatenate([a, a])),
                "doc_b": pa.array(np.concatenate([b, b])),
                "side": pa.array(
                    np.concatenate(
                        [np.zeros(n, np.int8), np.ones(n, np.int8)]
                    ),
                    type=pa.int8(),
                ),
                text_col: pa.nulls(2 * n, pa.string()),
            }
        )

    def as_text_rows(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table(
            {
                "key": pa.array(_i64(t["doc_id"])),
                "doc_a": pa.array(np.full(n, -1, np.int64)),
                "doc_b": pa.array(np.full(n, -1, np.int64)),
                "side": pa.array(np.full(n, 2, np.int8), type=pa.int8()),
                text_col: t[text_col].cast(pa.string()),
            }
        )

    needs = cands.map_batches(fan_out, batch_format="pyarrow")
    texts = docs.map_batches(as_text_rows, batch_format="pyarrow")

    def add_kb(t: pa.Table) -> pa.Table:
        return t.append_column("_kb", pa.array(_i64(t["key"]) % n_buckets))

    def attach(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_kb"])
        side = g["side"].to_numpy(zero_copy_only=False)
        is_txt = side == 2
        key = _i64(g["key"])
        tkeys = key[is_txt]
        order = np.argsort(tkeys, kind="stable")
        tkeys = tkeys[order]
        txt_all = g[text_col].filter(pa.array(is_txt)).to_pylist()
        txts = [txt_all[i] for i in order]
        need = np.flatnonzero(~is_txt)
        pos = np.searchsorted(tkeys, key[need])
        pos = np.minimum(pos, max(len(tkeys) - 1, 0))
        ok = len(tkeys) > 0 and (tkeys[pos] == key[need]).all()
        if not ok and len(need):
            raise ValueError("candidate pair references a doc_id absent from docs")
        sel = pa.array(need)
        return pa.table(
            {
                "doc_a": g["doc_a"].take(sel),
                "doc_b": g["doc_b"].take(sel),
                "side": g["side"].take(sel),
                text_col: pa.array(
                    [txts[i] if isinstance(txts[i], str) else "" for i in pos],
                    type=pa.string(),
                ),
            }
        )

    attached = (
        needs.union(texts)
        .map_batches(add_kb, batch_format="pyarrow")
        .groupby("_kb")
        .map_groups(attach, batch_format="pyarrow")
    )

    def add_pb(t: pa.Table) -> pa.Table:
        a = _i64(t["doc_a"])
        b = _i64(t["doc_b"])
        with np.errstate(over="ignore"):
            pb = (a * np.int64(0x9E3779B1) + b) % n_buckets
        return t.append_column("_pb", pa.array(pb))

    def verify_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_pb"])
        a = _i64(g["doc_a"])
        b = _i64(g["doc_b"])
        side = g["side"].to_numpy(zero_copy_only=False)
        order = np.lexsort((side, b, a))
        if len(order) % 2:
            raise ValueError("unpaired verify row — pair fan-out bug")
        ev, od = order[0::2], order[1::2]
        if not ((side[ev] == 0).all() and (side[od] == 1).all()):
            raise ValueError("verify rows not (side0, side1)-paired")
        txt = g[text_col].to_pylist()
        ta = [txt[i] for i in ev]
        tb = [txt[i] for i in od]
        if scorer is not None:
            col, vals, keep = scorer(ta, tb)
        else:
            col, vals = "jaccard", _jaccard_rows_vec(ta, tb)
            keep = vals >= threshold
        return pa.table(
            {
                "doc_a": pa.array(a[ev][keep]),
                "doc_b": pa.array(b[ev][keep]),
                col: pa.array(vals[keep]),
            }
        )

    return (
        attached.map_batches(add_pb, batch_format="pyarrow")
        .groupby("_pb")
        .map_groups(verify_bucket, batch_format="pyarrow")
    )


def minhash_dedup_pairs(
    docs,
    *,
    threshold: float = 0.8,
    text_col: str = "text",
    broadcast_id_cap: int | None = None,
):
    """Full MinHash-LSH near-dup pipeline over a docs Dataset
    (doc_id, text) → verified pairs (doc_a, doc_b, jaccard).

    The verify stage never materializes the docs side anywhere: the
    candidate-id set (bounded by the LSH output) is assembled in a Ray
    task, broadcast to filter docs down to candidate texts inside
    ``map_batches``, and the resulting candidate-id→text map — also
    task-assembled — is broadcast to the verify stage. The docs table
    itself only ever streams."""
    sigs = docs.map_batches(shingle_minhash_batch, batch_format="pyarrow")
    bands = sigs.map_batches(explode_bands, batch_format="pyarrow")

    # candidate pairs: shuffle on a HASH BUCKET of the band hash (every
    # (band_id, band_hash) bucket lands whole in one group) and emit
    # pairs for ALL buckets of the group in one segmented vectorized
    # pass — no group per LSH bucket (millions at corpus scale)
    n_band_buckets = 1024

    def add_bucket(t: pa.Table) -> pa.Table:
        bb = _i64(t["band_hash"]) % n_band_buckets
        return t.append_column("_bb", pa.array(bb))

    def pairs_from_group(g: pa.Table) -> pa.Table:
        bid = _i64(g["band_id"])
        bh = _i64(g["band_hash"])
        ids = _i64(g["doc_id"])
        order = np.lexsort((ids, bh, bid))
        bid, bh, ids = bid[order], bh[order], ids[order]
        new = np.ones(len(order), bool)
        new[1:] = (bid[1:] != bid[:-1]) | (bh[1:] != bh[:-1])
        a, b = _pairs_in_runs(new, ids)
        if len(a):
            rows = _dedupe_pair_rows(a, b)
            a, b = a[rows], b[rows]
        return pa.table({"doc_a": pa.array(a), "doc_b": pa.array(b)})

    cands = (
        bands.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bb")
        .map_groups(pairs_from_group, batch_format="pyarrow")
    )

    # dedup candidate pairs across band buckets (same pair fires in
    # multiple bands): block-local dedupe, then one pair-hash-bucketed
    # dedupe — never a group per pair
    cands = dedupe_pairs_global(cands, ["doc_a", "doc_b"], n_buckets=n_band_buckets)

    # slim the text side BEFORE the joins: only docs that appear in a
    # candidate pair carry their text through the shuffle. The id set
    # is bounded by the LSH candidate count (not the corpus), collected
    # in a Ray task and broadcast — the driver holds one ObjectRef.
    import pyarrow.compute as pc
    import ray

    cands = cands.materialize()

    # broadcast→shuffle crossover: the verify broadcast gathers every
    # candidate text into ONE Arrow table in a worker heap. Bounded by
    # the LSH output, but a high-dup-rate corpus at 100 TB can push it
    # past any single heap — past the cap, verify switches to a
    # doc_id-bucketed shuffle join of pairs ⋈ texts, which scales with
    # partitions instead (mirrors BROADCAST_GATHERED_EDGE_CAP in
    # stages/pip_join.py).
    cap = (
        broadcast_id_cap
        if broadcast_id_cap is not None
        else int(_os.environ.get("GRAFT_MINHASH_BROADCAST_CAP", 5_000_000))
    )
    n_pairs = cands.count()  # materialized: metadata-only
    if 2 * n_pairs > cap:
        _logger.warning(
            "minhash verify: %d candidate pairs (≤%d distinct texts) exceed "
            "the broadcast cap %d — switching to the doc_id-bucketed "
            "shuffle-join verify",
            n_pairs,
            2 * n_pairs,
            cap,
        )
        return _verify_pairs_shuffle(
            cands, docs, text_col=text_col, threshold=threshold
        )

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

    _ids_cache: dict = {}

    def _filter(t: pa.Table) -> pa.Table:
        # build the is_in value-set array once per worker process, not
        # once per batch (ray.get is plasma-cached; pa.array is not)
        if "arr" not in _ids_cache:
            _ids_cache["arr"] = pa.array(ray.get(ids_ref))
        keep = t.filter(pc.is_in(t["doc_id"], value_set=_ids_cache["arr"]))
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
    # columnar Arrow block: bounded by the candidate-pair count (LSH
    # output), NOT the corpus — and the cap check above guarantees this
    # path only runs when that bound fits a worker heap (beyond it the
    # shuffle-join verify takes over).
    texts_ref = _collect_texts_table.remote(*docs_small.to_arrow_refs())

    _tx_cache: dict = {}

    def verify(t: pa.Table) -> pa.Table:
        # id→text lookup via ONE searchsorted against the broadcast
        # table (sorted once per worker process, not once per batch),
        # then one vectorized shingle-set compare for the whole batch —
        # no per-pair Python, no pandas merge.
        if "ids" not in _tx_cache:
            tx = ray.get(texts_ref)
            ids = _i64(tx["doc_id"])
            order = np.argsort(ids, kind="stable")
            txt = tx[text_col].to_pylist()
            _tx_cache["ids"] = ids[order]
            _tx_cache["texts"] = [txt[i] for i in order]
        ids_s, texts = _tx_cache["ids"], _tx_cache["texts"]
        da = _i64(t["doc_a"])
        db = _i64(t["doc_b"])
        pa_pos = np.searchsorted(ids_s, da)
        pb_pos = np.searchsorted(ids_s, db)
        ta = [texts[i] if isinstance(texts[i], str) else "" for i in pa_pos]
        tb = [texts[i] if isinstance(texts[i], str) else "" for i in pb_pos]
        jac = _jaccard_rows_vec(ta, tb)
        keep = jac >= threshold
        return pa.table(
            {
                "doc_a": pa.array(da[keep]),
                "doc_b": pa.array(db[keep]),
                "jaccard": pa.array(jac[keep]),
            }
        )

    return cands.map_batches(verify, batch_format="pyarrow")


def edit_distance_score_pairs(cands, docs, *, text_col: str = "text", max_dist=None):
    """Exact unit-cost Levenshtein over a CANDIDATE pair set (fuzzy-dup
    verify, the classic second stage after LSH blocking): texts attach
    to pairs via the same doc_id-bucketed shuffle join as the minhash
    verify crossover — exchange bounded by (2 × pairs + docs) rows,
    nothing broadcast — then the whole-bucket vectorized DP scores each
    pair. ``max_dist=None`` emits every pair with its distance;
    otherwise pairs with distance > max_dist drop."""

    def scorer(ta, tb):
        d = _levenshtein_rows_vec(ta, tb)
        keep = d <= max_dist if max_dist is not None else np.ones(len(d), bool)
        return "edit_dist", d, keep

    return _verify_pairs_shuffle(
        cands, docs, text_col=text_col, threshold=0.0, scorer=scorer
    )


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


def simhash_batch(batch, text_col: str = "text") -> pa.Table:
    if not isinstance(batch, pa.Table):
        batch = pa.Table.from_pandas(batch, preserve_index=False)
    sh = simhash64_many(
        [t if isinstance(t, str) else "" for t in batch[text_col].to_pylist()]
    )
    return pa.table(
        {"doc_id": batch["doc_id"], "simhash": pa.array(sh.astype(np.int64))}
    )


def exact_dedup(ds, key_cols, *, id_col: str = "doc_id"):
    """Exact dedup: keep the minimum-id row per key group. Runs as a
    block-local pre-combine (Arrow C++ hash groupby per block) followed
    by one Min aggregate — the shuffle carries at most one row per
    (key, block) and no per-key Python group ever materializes."""
    from ray.data.aggregate import Min

    keys = key_cols if isinstance(key_cols, list) else [key_cols]

    def local_min(t: pa.Table) -> pa.Table:
        res = t.group_by(keys).aggregate([(id_col, "min")])
        return res.rename_columns(
            [id_col if c == f"{id_col}_min" else c for c in res.column_names]
        )

    partial = ds.map_batches(local_min, batch_format="pyarrow")
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


def _list_f32_matrix(col) -> np.ndarray:
    """(n, dim) float32 matrix view of a vector column — flat values
    cast once, no per-row np.asarray. Handles list<float> (parquet),
    fixed_size_list, and Ray's tensor extension arrays."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), np.float32)
    if isinstance(arr, pa.FixedSizeListArray):
        dim = arr.type.list_size
        vals = np.asarray(arr.values, dtype=np.float32)
        return vals[arr.offset * dim : (arr.offset + n) * dim].reshape(n, dim)
    if isinstance(arr, (pa.ListArray, pa.LargeListArray)):
        offs = np.asarray(arr.offsets, np.int64)
        vals = np.asarray(arr.values, dtype=np.float32)
        dim = int(offs[1] - offs[0])
        assert (np.diff(offs) == dim).all(), "embedding column must be fixed-dim"
        return vals[offs[0] : offs[0] + n * dim].reshape(n, dim)
    # Ray tensor extension array (rd.from_pandas of ndarray cells)
    m = arr.to_numpy(zero_copy_only=False)
    return np.ascontiguousarray(np.asarray(m), dtype=np.float32)


def hyperplane_bucketize(
    batch, *, n_planes: int = 12, vec_col: str = "embedding"
) -> pa.Table:
    """Deterministic hyperplane-LSH bucket per vector (seeded planes,
    pure function of the embedding dim). Also emits ``sub``: 8 extra
    hyperplane bits used as a secondary band to split oversized
    buckets (hot-bucket skew defusal; deterministic, SQL-replayable).
    ``vec`` rides along as a fixed-stride binary column built from the
    flat float32 buffer (no per-row tobytes)."""
    if not isinstance(batch, pa.Table):
        batch = pa.Table.from_pandas(batch, preserve_index=False)
    vecs = _list_f32_matrix(batch[vec_col])
    n, dim = vecs.shape
    p, p2 = _planes_cached(dim, n_planes)
    bits = (vecs @ p) > 0
    bits2 = (vecs @ p2) > 0
    bucket = (bits.astype(np.uint64) << np.arange(n_planes, dtype=np.uint64)).sum(axis=1)
    sub = (bits2.astype(np.uint64) << np.arange(8, dtype=np.uint64)).sum(axis=1)
    if n * dim * 4 > np.iinfo(np.int32).max:
        raise ValueError(
            f"vector blob block is {n * dim * 4} bytes — past the int32 "
            "binary-offset limit; split the stage into more blocks"
        )
    voffs = (np.arange(n + 1, dtype=np.int64) * dim * 4).astype(np.int32)
    vec_blob = pa.Array.from_buffers(
        pa.binary(),
        n,
        [None, pa.py_buffer(voffs.tobytes()), pa.py_buffer(np.ascontiguousarray(vecs).tobytes())],
    )
    return pa.table(
        {
            "vec_id": pa.array(_i64(batch["vec_id"])),
            "bucket": pa.array(bucket.astype(np.int64)),
            "sub": pa.array(sub.astype(np.int64)),
            "vec": vec_blob,
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


def _split_runs_by_cap(primary: np.ndarray, secondary: np.ndarray, cap: int):
    """Row-index runs for the hot-bucket rule shared by the embedding
    and ngram near-dup paths: rows (already belonging to ONE bucket
    group) sort by ``primary`` (id order); when the group exceeds
    ``cap`` it splits by ``secondary`` (id order within each split).
    Returns a list of index arrays."""
    n = len(primary)
    if n <= cap:
        return [np.argsort(primary, kind="stable")]
    order = np.lexsort((primary, secondary))
    sec = secondary[order]
    bounds = np.flatnonzero(np.diff(sec)) + 1
    return np.split(order, bounds)


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

    def within(g: pa.Table) -> pa.Table:
        out_a, out_b, out_c = [], [], []
        if g.num_rows >= 2:
            vid = _i64(g["vec_id"])
            sub = _i64(g["sub"])
            boffs, bdata = _binary_views(g["vec"])
            stride = int(boffs[1] - boffs[0])
            flat = bdata[boffs[0] : boffs[0] + g.num_rows * stride].view(np.float32)
            vecs_all = flat.reshape(g.num_rows, stride // 4)
            for rows in _split_runs_by_cap(vid, sub, bucket_cap):
                if len(rows) < 2:
                    continue
                vecs = vecs_all[rows]
                norms = np.linalg.norm(vecs, axis=1, keepdims=True)
                norms[norms == 0] = 1.0
                a, b, c = _cosine_pairs_block(vid[rows], vecs / norms, threshold)
                out_a.append(a)
                out_b.append(b)
                out_c.append(c)
        if not out_a:
            return pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(out_a)),
                "doc_b": pa.array(np.concatenate(out_b)),
                "cosine": pa.array(np.concatenate(out_c)),
            }
        )

    return (
        emb.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(within, batch_format="pyarrow")
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

    def sig(batch: pa.Table) -> pa.Table:
        texts = [
            t if isinstance(t, str) else "" for t in batch[text_col].to_pylist()
        ]
        sh = simhash64_many(texts)
        return pa.table(
            {
                "doc_id": pa.array(_i64(batch["doc_id"])),
                "bucket": pa.array(
                    (sh >> np.uint64(64 - prefix_bits)).astype(np.int64)
                ),
                "sub": pa.array(((sh >> sub_shift) & np.uint64(255)).astype(np.int64)),
                "text": batch[text_col],
            }
        )

    def within(g: pa.Table) -> pa.Table:
        out_a, out_b, out_j = [], [], []
        if g.num_rows >= 2:
            did = _i64(g["doc_id"])
            sub = _i64(g["sub"])
            texts = g["text"].to_pylist()
            for rows in _split_runs_by_cap(did, sub, bucket_cap):
                if len(rows) < 2:
                    continue
                a, b, jac = _pairs_within(
                    did[rows], [texts[i] or "" for i in rows], threshold
                )
                out_a.append(a)
                out_b.append(b)
                out_j.append(jac)
        if not out_a:
            return pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(out_a)),
                "doc_b": pa.array(np.concatenate(out_b)),
                "jaccard": pa.array(np.concatenate(out_j)),
            }
        )

    return (
        docs.map_batches(sig, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(within, batch_format="pyarrow")
    )


# ------------------------------------------------------------------
# connected components over near-dup pairs → dedup group assignment
# ------------------------------------------------------------------


def _cc_step(node: np.ndarray, nbr: np.ndarray):
    """One hash-to-min round over one node bucket: every node computes
    the min of its (deduped) neighborhood m(v) and emits (u, m) for
    every neighbor u plus (m, u) — fully segmented numpy, no per-node
    Python (numpy in/out)."""
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
    rows = _dedupe_pair_rows(out_node, out_nbr)
    return out_node[rows], out_nbr[rows]


_EDGE_SCHEMA = pa.schema([("node", pa.int64()), ("nbr", pa.int64())])


def connected_components(
    pairs, *, n_buckets: int = 256, max_rounds: int = 16, local_cap: int | None = None
):
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
    convergence is detected by a rows+checksum signature aggregate.

    Small graphs skip the distributed rounds: at or below
    ``GRAFT_CC_LOCAL_CAP`` seeded edges (default 2M ≈ 32 MB) the whole
    propagation runs in ONE Ray task over the edge block refs — the
    per-round shuffle+materialize round-trips dominate wall time at
    that size, and the fixed point (hash-to-min labels) is identical
    whether rounds apply per bucket or to the whole multiset."""
    import ray
    import ray.data as rd

    if local_cap is None:
        local_cap = int(_os.environ.get("GRAFT_CC_LOCAL_CAP", 2_000_000))

    def seed(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return _EDGE_SCHEMA.empty_table()
        a = _i64(t["doc_a"])
        b = _i64(t["doc_b"])
        node = np.concatenate([a, b, a, b])
        nbr = np.concatenate([b, a, a, b])
        rows = _dedupe_pair_rows(node, nbr)
        return pa.table({"node": pa.array(node[rows]), "nbr": pa.array(nbr[rows])})

    def add_bucket(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return _EDGE_SCHEMA.append(pa.field("_nb", pa.int64())).empty_table()
        return t.append_column("_nb", pa.array(_i64(t["node"]) % n_buckets))

    def step(g: pa.Table) -> pa.Table:
        node, nbr = _cc_step(_i64(g["node"]), _i64(g["nbr"]))
        return pa.table({"node": pa.array(node), "nbr": pa.array(nbr)})

    def _signature(ds) -> tuple[int, int]:
        def sig(t: pa.Table) -> pa.Table:
            if t.num_columns == 0 or t.num_rows == 0:
                return pa.table({"n": pa.array([0], pa.int64()), "s": pa.array([0], pa.int64())})
            node = _i64(t["node"])
            nbr = _i64(t["nbr"])
            with np.errstate(over="ignore"):
                h = (node * np.int64(0x9E3779B1) + nbr * np.int64(0x85EBCA77)).sum()
            return pa.table({"n": pa.array([t.num_rows], pa.int64()), "s": pa.array([int(h)], pa.int64())})

        parts = ds.map_batches(sig, batch_format="pyarrow").to_pandas()
        return int(parts["n"].sum()), int(np.int64(parts["s"].to_numpy(np.int64)).sum())

    edges = pairs.map_batches(seed, batch_format="pyarrow").materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()), "group_id": pa.array([], pa.int64())})
        )

    if n_edges <= local_cap:

        @ray.remote
        def _local_cc(*blocks: pa.Table) -> pa.Table:
            ts = [t for t in blocks if t.num_columns > 0 and t.num_rows > 0]
            full = pa.concat_tables(ts)
            node, nbr = _i64(full["node"]), _i64(full["nbr"])
            for _ in range(max_rounds):
                node2, nbr2 = _cc_step(node, nbr)
                if (
                    len(node2) == len(node)
                    and np.array_equal(node2, node)
                    and np.array_equal(nbr2, nbr)
                ):
                    break
                node, nbr = node2, nbr2
            order = np.lexsort((nbr, node))
            node, nbr = node[order], nbr[order]
            first = np.ones(len(node), bool)
            first[1:] = node[1:] != node[:-1]
            sel = np.flatnonzero(first)
            return pa.table(
                {"doc_id": pa.array(node[sel]), "group_id": pa.array(nbr[sel])}
            )

        return rd.from_arrow_refs([_local_cc.remote(*edges.to_arrow_refs())])

    prev_sig = _signature(edges)
    for _ in range(max_rounds):
        edges = (
            edges.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("_nb")
            .map_groups(step, batch_format="pyarrow")
            .materialize()
        )
        cur_sig = _signature(edges)
        if cur_sig == prev_sig:
            break
        prev_sig = cur_sig

    def labels(g: pa.Table) -> pa.Table:
        node = _i64(g["node"])
        nbr = _i64(g["nbr"])
        order = np.lexsort((nbr, node))
        node, nbr = node[order], nbr[order]
        new = np.ones(len(node), bool)
        new[1:] = node[1:] != node[:-1]
        starts = np.flatnonzero(new)
        return pa.table(
            {"doc_id": pa.array(node[starts]), "group_id": pa.array(nbr[starts])}
        )

    return (
        edges.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_nb")
        .map_groups(labels, batch_format="pyarrow")
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

    def add_gbucket(t: pa.Table) -> pa.Table:
        return t.append_column("_gb", pa.array(_i64(t["group_id"]) % 256))

    def attach_size(g: pa.Table) -> pa.Table:
        did = _i64(g["doc_id"])
        gid = _i64(g["group_id"])
        order = np.argsort(gid, kind="stable")
        sg = gid[order]
        new = np.ones(len(sg), bool)
        new[1:] = sg[1:] != sg[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(sg)))
        sizes = np.empty(len(sg), np.int64)
        sizes[order] = np.repeat(lens, lens)
        return pa.table(
            {
                "doc_id": pa.array(did),
                "group_id": pa.array(gid),
                "group_size": pa.array(sizes),
                "keep": pa.array((did == gid).astype(np.int64)),
            }
        )

    return (
        labs.map_batches(add_gbucket, batch_format="pyarrow")
        .groupby("_gb")
        .map_groups(attach_size, batch_format="pyarrow")
    )

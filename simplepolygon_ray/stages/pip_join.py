"""Point-in-polygon join of streaming points against decomposed rings.

Two strategies (SURVEY.md §2.3, §3.4 step 6):

- **Broadcast** (default; ring side ≪ point side, the 100 TB shape):
  the compiled ring index — per-cell candidate lists + ring coordinate
  arrays — is built ONCE on the driver, ``ray.put`` into the object
  store, and each actor of the ``map_batches`` pool deserializes it
  ONCE in ``__init__``. Probe batches stream through with zero
  shuffles; each point is assigned its single containing cell, so a
  (point, ring) pair can only be emitted once — no dedup pass needed.

- **Shuffle** (both sides huge): both sides keyed by ``cell_id``, Ray
  native hash join on the cell key, then exact PIP refinement per
  matched pair. Skew from dense cells is defused by salting the point
  side and replicating ring cover rows across salts
  (``salt_factor``).

The per-ring membership test is the engine's own even-odd kernel
(boundary = outside), vectorized over all points that share a cell.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..cells.grid import point_to_cell
from ..geom.kernels import points_in_ring
from .cover_stage import DEFAULT_LEVEL, cover_batch

__all__ = [
    "CompiledRingIndex",
    "PipJoinActor",
    "compile_ring_index",
    "compile_ring_index_ref",
    "pip_join_broadcast",
    "pip_join_shuffle",
]

# per-worker-process cache of deserialized broadcast indexes: Ray reuses
# worker processes across tasks, so stateless probe tasks amortize the
# object-graph rebuild exactly like an actor pool would — without
# reserving CPUs or paying pool ramp-up
_BROADCAST_CACHE: dict = {}

# elements per (chunk, E) probe temporary: sized so the ~8 live f64
# temporaries of the fused PIP expression stay inside one core's
# private L2 instead of contending for shared L3/DRAM at full
# occupancy (tunable for benchmarking via GRAFT_PIP_CHUNK)
import logging as _logging
import os as _os

_CHUNK_ELEMS = int(_os.environ.get("GRAFT_PIP_CHUNK", "125000"))

# broadcast→shuffle crossover (soft cap, see pip_join_broadcast doc):
# the compiled index holds 4 float64 edge arrays PLUS a per-cell
# gathered copy of every candidate ring's edges — ~32 B × gathered
# edges for the dominant term. 30M gathered edges ≈ 1 GB inside ONE
# assembly task / per probe worker; beyond that the ring side is no
# longer "small" and callers should switch to pip_join_shuffle.
BROADCAST_GATHERED_EDGE_CAP = int(
    _os.environ.get("GRAFT_BROADCAST_EDGE_CAP", 30_000_000)
)

_logger = _logging.getLogger(__name__)


def _cached_get(ref):
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    obj = _BROADCAST_CACHE.get(key)
    if obj is None:
        obj = ray.get(ref)
        _BROADCAST_CACHE.clear()  # hold at most one index per worker
        _BROADCAST_CACHE[key] = obj
    return obj


class CompiledRingIndex:
    """cell_id → candidate ring list, plus precompiled edge tables.

    Compiled once (driver side), broadcast, then read-only in every
    probe actor. Edge arrays (xi, yi, xj, yj per ring) are precomputed
    here so the probe's inner PIP is a single fused numpy expression
    with no per-call ``np.roll``/closing-vertex work.
    """

    def __init__(
        self,
        ring_rows: pa.Table,
        level: int = DEFAULT_LEVEL,
        cover: pa.Table | None = None,
        cover_rows: tuple[np.ndarray, np.ndarray] | None = None,
    ):
        """``cover_rows``, when given, is ``(cell_id, ring_row)`` numpy
        arrays mapping covered cells directly to ring ROW NUMBERS in
        ``ring_rows`` — the task-side compile path supplies it so no
        (geom_id, ring_seq) → row dict is ever built."""
        self.level = level
        self._gid_arr = ring_rows["geom_id"].combine_chunks()
        self._seq_arr = ring_rows["ring_seq"].combine_chunks()

        n_rings = len(ring_rows)
        self.cell_to_rings: dict[int, list[int]] = {}
        self.cell_tables: dict[int, tuple] = {}
        if n_rings == 0:
            self._coords = np.empty((0, 2))
            self._vtx_off = np.zeros(1, np.int64)
            self.gathered_edges = 0
            return

        # flatten ring coords straight out of the Arrow buffers
        # (zero-copy: list<list<f64>> values are one contiguous float64
        # run because every vertex is exactly [x, y])
        col = ring_rows["ring"].combine_chunks()
        vtx_off = np.asarray(col.offsets)  # vertex boundaries per ring
        vtx = col.values  # list<double> vertex array
        coords = np.asarray(vtx.values, dtype=np.float64).reshape(-1, 2)
        # per-ring OPEN vertex ranges (decompose output is always closed)
        r_start = vtx_off[:-1].astype(np.int64)
        r_len = (vtx_off[1:] - vtx_off[:-1]).astype(np.int64) - 1  # drop closing
        # flat edge table: edge e of ring r is (v[i], v[i-1 mod n]);
        # built in one vectorized pass over all rings' vertices
        E = int(r_len.sum())
        edge_start = np.concatenate([[0], np.cumsum(r_len)[:-1]]).astype(np.int64)
        # vertex index of each edge's "i" endpoint
        vi = np.repeat(r_start, r_len) + (
            np.arange(E) - np.repeat(edge_start, r_len)
        )
        # "j" endpoint = previous vertex cyclically within the ring
        local = np.arange(E) - np.repeat(edge_start, r_len)
        prev_local = np.where(local == 0, np.repeat(r_len, r_len) - 1, local - 1)
        vj = np.repeat(r_start, r_len) + prev_local
        self._exi = coords[vi, 0]
        self._eyi = coords[vi, 1]
        self._exj = coords[vj, 0]
        self._eyj = coords[vj, 1]
        self._edge_start = edge_start
        self._edge_len = r_len
        self._coords = coords
        self._vtx_off = vtx_off

        if cover_rows is not None:
            cov_cell, cov_ring = cover_rows
            cov_cell = np.asarray(cov_cell, np.int64)
            cov_ring = np.asarray(cov_ring, np.int64)
        else:
            if cover is None:
                cover = cover_batch(ring_rows, level=level)
            # cover rows → ring row numbers
            row_of = {}
            gids = self._gid_arr.to_pylist()
            seqs = self._seq_arr.to_pylist()
            for k, (g, i) in enumerate(zip(gids, seqs)):
                row_of[(g, i)] = k
            cov_ring = np.fromiter(
                (
                    row_of[(g, i)]
                    for g, i in zip(
                        cover["geom_id"].to_pylist(), cover["ring_seq"].to_pylist()
                    )
                ),
                dtype=np.int64,
                count=len(cover),
            )
            cov_cell = cover["cell_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((cov_ring, cov_cell))
        cov_cell = cov_cell[order]
        cov_ring = cov_ring[order]

        # fused per-cell probe tables: gather all candidate rings' edges
        # into one contiguous block per cell so a single numpy expression
        # tests every (point, ring) pair; reduceat offsets segment per
        # ring. Gather indices are built with a vectorized cumsum trick —
        # no per-ring Python work.
        lens = r_len[cov_ring]
        total = int(lens.sum())
        self.gathered_edges = total
        if total > BROADCAST_GATHERED_EDGE_CAP:
            _logger.warning(
                "compiled ring index gathers %d edges (> cap %d, ~%d MB in one "
                "worker heap): the ring side is no longer broadcast-small — "
                "switch to pip_join_shuffle",
                total,
                BROADCAST_GATHERED_EDGE_CAP,
                total * 32 // 1_000_000,
            )
        gpos = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
        if total:
            step = np.ones(total, np.int64)
            starts_ = edge_start[cov_ring]
            step[0] = starts_[0]
            if len(lens) > 1:
                step[gpos[1:]] = starts_[1:] - (starts_[:-1] + lens[:-1] - 1)
            gather = np.cumsum(step)
        else:
            gather = np.empty(0, np.int64)
        gxi = self._exi[gather][None, :]
        gyi = self._eyi[gather][None, :]
        gxj = self._exj[gather][None, :]
        gyj = self._eyj[gather][None, :]

        self.cell_tables: dict[int, tuple] = {}
        cbounds = np.flatnonzero(np.diff(cov_cell)) + 1
        cstarts = np.concatenate([[0], cbounds])
        cends = np.concatenate([cbounds, [len(cov_cell)]])
        for s, e in zip(cstarts, cends):
            if s == e:
                continue
            c = int(cov_cell[s])
            rrows = cov_ring[s:e]
            self.cell_to_rings[c] = rrows.tolist()
            a, b = int(gpos[s]), int(gpos[e - 1] + lens[e - 1])
            offs = (gpos[s:e] - gpos[s]).astype(np.intp)
            self.cell_tables[c] = (
                gxi[:, a:b],
                gyi[:, a:b],
                gxj[:, a:b],
                gyj[:, a:b],
                offs,
                rrows,
            )

    def ring_coords(self, rrow: int) -> np.ndarray:
        """Closed (n,2) coordinates of one indexed ring."""
        return self._coords[self._vtx_off[rrow] : self._vtx_off[rrow + 1]]

    def emit(self, batch: pa.Table, id_col: str, lon, lat, pts, rrows) -> pa.Table:
        """Vectorized membership-row construction (arrow takes, no
        per-output-row Python)."""
        ridx = pa.array(rrows)
        return pa.table(
            {
                id_col: batch[id_col].take(pa.array(pts)),
                "geom_id": self._gid_arr.take(ridx),
                "ring_seq": self._seq_arr.take(ridx),
                "lon": pa.array(lon[pts]),
                "lat": pa.array(lat[pts]),
            }
        )

    def probe(self, ids, lon: np.ndarray, lat: np.ndarray):
        """Vectorized membership probe. Returns (point_pos, ring_row).

        Semantics per ring match geom.kernels.points_in_ring (even-odd,
        boundary = outside)."""
        cells = point_to_cell(lon, lat, self.level).astype(np.int64)
        order = np.argsort(cells, kind="stable")
        out_pts, out_rings = [], []
        sorted_cells = cells[order]
        # group boundaries without a Python scan
        bounds = np.flatnonzero(np.diff(sorted_cells)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(order)]])
        with np.errstate(divide="ignore", invalid="ignore"):
            for s, e in zip(starts, ends):
                entry = self.cell_tables.get(int(sorted_cells[s]))
                if entry is None:
                    continue
                xi, yi, xj, yj, offs, rrows = entry
                # probe sub-chunks sized so the (chunk, E) temporaries
                # stay cache-resident instead of streaming through DRAM
                E = xi.shape[1]
                chunk = max(1, _CHUNK_ELEMS // max(E, 1))
                for cs in range(s, e, chunk):
                    pos = order[cs : min(cs + chunk, e)]
                    px = lon[pos][:, None]
                    py = lat[pos][:, None]
                    cond = (yi > py) != (yj > py)
                    xcross = (xj - xi) * (py - yi) / (yj - yi) + xi
                    cross = cond & (px < xcross)
                    counts = np.add.reduceat(cross, offs, axis=1)
                    inside = (counts & 1).astype(bool)
                    # boundary test only when some cross-product is
                    # EXACTLY zero — on real probe streams that is ~never,
                    # so the three extra (chunk, E) products usually never
                    # materialize; results are bit-identical either way
                    on_zero = py * (xi - xj) + yi * (xj - px) + yj * (px - xi) == 0
                    if on_zero.any():
                        on = (
                            on_zero
                            & ((xi - px) * (xj - px) <= 0)
                            & ((yi - py) * (yj - py) <= 0)
                        )
                        inside &= ~(np.add.reduceat(on, offs, axis=1) > 0)
                    pidx, ridx = np.nonzero(inside)
                    if len(pidx):
                        out_pts.append(pos[pidx])
                        out_rings.append(rrows[ridx])
        if not out_pts:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return np.concatenate(out_pts), np.concatenate(out_rings)


class PipJoinActor:
    """Actor-pool stage: compiled index fetched once per actor."""

    def __init__(self, index_ref, id_col: str = "image_id"):
        self.index: CompiledRingIndex = ray.get(index_ref)
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        pts, rrows = self.index.probe(None, lon, lat)
        return self.index.emit(batch, self.id_col, lon, lat, pts, rrows)


def _add_cover_batch(t: pa.Table, *, level: int) -> pa.Table:
    """simple-ring rows → + ``cover_cells`` list column. Ring coords are
    read as zero-copy slices off the Arrow buffers (no to_pylist)."""
    from ..cells.grid import cover_rings_flat
    from .decompose_stage import RING_SCHEMA

    covered_schema = RING_SCHEMA.append(pa.field("cover_cells", pa.list_(pa.int64())))
    if t.num_columns == 0 or t.num_rows == 0:
        # rd.range emits zero-row ZERO-COLUMN blocks when it has more
        # blocks than rows; normalize them to the typed empty table so
        # downstream concat never sees a divergent schema
        return covered_schema.empty_table()
    col = t["ring"].combine_chunks()
    offs = np.asarray(col.offsets).astype(np.int64)
    coords = np.asarray(col.values.values, dtype=np.float64).reshape(-1, 2)
    ring_row, cells = cover_rings_flat(coords, offs, level)
    lens = np.bincount(ring_row, minlength=len(t)).astype(np.int64)
    cover_col = pa.ListArray.from_arrays(
        pa.array(np.concatenate([[0], np.cumsum(lens)]), type=pa.int32()),
        pa.array(cells.astype(np.int64)),
    )
    return t.append_column("cover_cells", cover_col)


@ray.remote
def _assemble_index(level: int, *blocks: pa.Table) -> CompiledRingIndex:
    """Assemble the compiled index INSIDE a Ray task: block refs are
    fetched into this worker, never onto the driver. Returns the index
    (its ObjectRef doubles as the broadcast handle)."""
    from .decompose_stage import RING_SCHEMA

    tables = [t for t in blocks if t.num_columns > 0 and t.num_rows > 0]
    if tables:
        full = pa.concat_tables(tables)
    else:
        full = RING_SCHEMA.append(
            pa.field("cover_cells", pa.list_(pa.int64()))
        ).empty_table()
    ring_table = full.drop_columns(["cover_cells"])
    cov = full["cover_cells"].combine_chunks()
    lens = np.diff(np.asarray(cov.offsets).astype(np.int64))
    cov_ring = np.repeat(np.arange(len(full), dtype=np.int64), lens)
    cov_cell = np.asarray(cov.values, dtype=np.int64)
    return CompiledRingIndex(
        ring_table, level=level, cover_rows=(cov_cell, cov_ring)
    )


def compile_ring_index_ref(simple_rings, *, level: int = DEFAULT_LEVEL):
    """Compile the broadcast ring index WITHOUT driver materialization:
    coverings are computed in parallel map tasks (``cover_cells``
    column), then one assembly task concats the blocks and builds the
    numpy edge tables. The driver only ever holds ObjectRefs — at 100×
    the ring side nothing transits the driver heap."""
    import functools

    with_cover = simple_rings.map_batches(
        functools.partial(_add_cover_batch, level=level), batch_format="pyarrow"
    )
    refs = with_cover.to_arrow_refs()
    return _assemble_index.remote(level, *refs)


def compile_ring_index(simple_rings, *, level: int = DEFAULT_LEVEL) -> CompiledRingIndex:
    """Materialized-index convenience wrapper around
    :func:`compile_ring_index_ref` (tests / local inspection)."""
    return ray.get(compile_ring_index_ref(simple_rings, level=level))


def pip_join_broadcast(
    points,
    ring_rows,
    *,
    level: int = DEFAULT_LEVEL,
    id_col: str = "image_id",
    concurrency: int | tuple | None = None,
    batch_size: int | None = None,
    use_actors: bool = False,
):
    """points Dataset (id, lon, lat, ...) ⋈ rings → membership rows.

    ``ring_rows`` is an Arrow table of simple rings, a Dataset of them
    (covered in parallel via ``compile_ring_index``), or an
    already-compiled ``CompiledRingIndex``.

    Default execution is STATELESS TASKS with the index fetched from
    the object store per task: plasma gives zero-copy numpy views, the
    per-task deserialize is only the dict skeleton, and tasks avoid
    actor-pool ramp-up and CPU reservation (a fixed-size pool that
    reserves every CPU starves the upstream read and deadlocks the
    stream). Set ``use_actors=True`` for an autoscaling actor pool
    (``concurrency=(min, max)``; cap max below the CPU count) when the
    index is big enough that per-task deserialization matters.

    **Broadcast→shuffle crossover.** The compiled index is assembled in
    ONE Ray task and read whole by every probe worker, so the ring side
    must fit a single worker heap: memory ≈ 32 B × E (base edge arrays)
    + 32 B × Σ_cells(candidate-ring edges) — the gathered per-cell term
    dominates and is reported as ``CompiledRingIndex.gathered_edges``.
    Past ``BROADCAST_GATHERED_EDGE_CAP`` (default 30M gathered edges ≈
    1 GB; env ``GRAFT_BROADCAST_EDGE_CAP``) a warning fires and callers
    should switch to :func:`pip_join_shuffle`, which never assembles
    the ring side in one place (rings shuffle as per-cover-row blobs).
    Equivalence of the two paths is pinned by
    ``tests/test_stages.py::test_pip_join_shuffle_matches_broadcast``
    and ``test_pip_join_crossover_warns_and_matches``.
    """
    if isinstance(ring_rows, ray.ObjectRef):
        # already-compiled broadcast handle (e.g. shared across the
        # shards of a checkpointed run — compiled once, joined many)
        index_ref = ring_rows
    elif isinstance(ring_rows, CompiledRingIndex):
        index_ref = ray.put(ring_rows)
    elif isinstance(ring_rows, pa.Table):
        index_ref = ray.put(CompiledRingIndex(ring_rows, level=level))
    else:
        # Dataset: compiled entirely in tasks; the driver holds one ref
        index_ref = compile_ring_index_ref(ring_rows, level=level)

    if use_actors:
        return points.map_batches(
            PipJoinActor,
            fn_constructor_args=(index_ref, id_col),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency or (2, 8),
        )

    def probe_fn(batch: pa.Table) -> pa.Table:
        idx = _cached_get(index_ref)
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        pts, rrows = idx.probe(None, lon, lat)
        return idx.emit(batch, id_col, lon, lat, pts, rrows)

    return points.map_batches(
        probe_fn, batch_format="pyarrow", batch_size=batch_size
    )


def pip_join_shuffle(
    points,
    simple_rings,
    *,
    level: int = DEFAULT_LEVEL,
    id_col: str = "image_id",
    num_partitions: int = 32,
    salt_factor: int = 1,
):
    """Shuffle variant for huge ring sets: co-locate by (cell_id, salt),
    Ray native hash join, then exact PIP refinement per matched pair.

    ``salt_factor`` S splits each dense cell's points across S
    sub-partitions; ring cover rows are replicated S× so every salt
    sees every candidate ring (skew defusal, SURVEY.md §4.3).

    NOTHING is materialized on the driver: each cover row carries its
    ring's coordinates as a float64 blob through the shuffle, so
    refinement reads the geometry straight off the joined row. (The
    blob is a binary column because Arrow's hash join doesn't carry
    nested-list payloads; decode is a zero-copy ``frombuffer``.)
    """
    from .cover_stage import cover_rings_dataset, index_points_batch

    cover = cover_rings_dataset(simple_rings, level=level)

    # slim ring-blob side: (geom_id, ring_seq, ring_blob) — joined onto
    # the cover rows by ring identity before the wide cell shuffle
    def blobify(t: pa.Table) -> pa.Table:
        # one binary column built straight from the Arrow list buffers:
        # ring i's blob is its float64 (x, y) run, offsets = vertex
        # offsets × 16 bytes — no per-ring tobytes loop
        col = t["ring"].combine_chunks()
        offs = np.asarray(col.offsets).astype(np.int64)
        flat = np.asarray(col.values.values, dtype=np.float64)
        data = np.ascontiguousarray(flat[2 * offs[0] : 2 * offs[-1]])
        nbytes = int(offs[-1] - offs[0]) * 16
        if nbytes > np.iinfo(np.int32).max:
            raise ValueError(
                f"ring blob block holds {nbytes} bytes of vertices — past "
                "the int32 binary-offset limit (~134M vertices/block); "
                "split the stage into more blocks (override_num_blocks)"
            )
        boffs = ((offs - offs[0]) * 16).astype(np.int32)
        blob_col = pa.Array.from_buffers(
            pa.binary(),
            len(t),
            [None, pa.py_buffer(boffs.tobytes()), pa.py_buffer(data.tobytes())],
        )
        return pa.table(
            {
                "geom_id": t["geom_id"],
                "ring_seq": t["ring_seq"],
                "ring_blob": blob_col,
            }
        )

    blobs = simple_rings.map_batches(blobify, batch_format="pyarrow")
    cover = cover.join(
        blobs,
        join_type="inner",
        num_partitions=num_partitions,
        on=("geom_id", "ring_seq"),
    )

    if salt_factor > 1:

        def add_salts(t: pa.Table) -> pa.Table:
            n = len(t)
            rep = pa.concat_tables([t] * salt_factor)
            salts = np.repeat(np.arange(salt_factor, dtype=np.int64), n)
            return rep.append_column("salt", pa.array(salts))

        cover = cover.map_batches(add_salts, batch_format="pyarrow")

    def point_salt(t: pa.Table) -> pa.Table:
        t = index_points_batch(t, level=level)
        if salt_factor > 1:
            h = np.abs(
                np.frombuffer(
                    np.ascontiguousarray(t["lon"].to_numpy(zero_copy_only=False)).tobytes(),
                    dtype=np.int64,
                )
            )
            t = t.append_column("salt", pa.array(h % salt_factor))
        return t.select(
            [id_col, "lon", "lat", "cell_id"] + (["salt"] if salt_factor > 1 else [])
        )

    pts = points.map_batches(point_salt, batch_format="pyarrow")
    keys = ("cell_id", "salt") if salt_factor > 1 else ("cell_id",)
    matched = pts.join(
        cover, join_type="inner", num_partitions=num_partitions, on=keys
    )

    def refine(t: pa.Table) -> pa.Table:
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        blob_col = t["ring_blob"].combine_chunks()
        # whole-column buffer views: byte offsets + data, ONE frombuffer
        # per batch — no per-ring ``.as_py()`` anywhere
        boffs = np.frombuffer(blob_col.buffers()[1], np.int32)[
            blob_col.offset : blob_col.offset + len(blob_col) + 1
        ].astype(np.int64)
        bdata = np.frombuffer(blob_col.buffers()[2], np.uint8)
        # group rows by ring identity: exact grouping on
        # (geom_id, ring_seq) via dictionary-encoded sort
        gid_codes = t["geom_id"].dictionary_encode().combine_chunks().indices.to_numpy(
            zero_copy_only=False
        )
        rkeys = gid_codes.astype(np.int64) * np.int64(1 << 31) + t[
            "ring_seq"
        ].to_numpy(zero_copy_only=False)
        keep = np.zeros(len(t), bool)
        # vectorize per candidate ring: all rows sharing a ring test at
        # once; the ring decode is a zero-copy float64 view of the blob
        # run (blob byte offsets are multiples of 16, so the view is
        # 8-byte aligned)
        order = np.argsort(rkeys, kind="stable")
        bounds = np.flatnonzero(np.diff(rkeys[order])) + 1
        for rows in np.split(order, bounds):
            r0 = int(rows[0])
            seg = bdata[boffs[r0] : boffs[r0 + 1]]
            ring = (
                seg.view(np.float64)
                if (boffs[r0] % 8) == 0
                else np.frombuffer(seg.tobytes(), np.float64)
            ).reshape(-1, 2)
            keep[rows] = points_in_ring(lon[rows], lat[rows], ring)
        t = t.filter(pa.array(keep))
        return t.select([id_col, "geom_id", "ring_seq", "lon", "lat"])

    return matched.map_batches(refine, batch_format="pyarrow")

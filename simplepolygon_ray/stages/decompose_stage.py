"""Ray Data stages for the decomposition operator.

The decompose operator is per-geometry pure (no cross-row state), so it
runs as STATELESS ``map_batches`` tasks — Ray gives per-block
parallelism, retries and streaming for free. Input/output are Arrow
tables; ring coordinates travel as Arrow nested lists
(``list<list<list<double>>>`` per SURVEY.md §1.2) which parquet
round-trips losslessly in float64.

Stages:
- ``polygons_source(n)``: deterministic polygon corpus Dataset
  (geom_id, rings);
- ``decompose_batch``: one input polygon row → one output row per
  simple ring (flat explosion), schema
  (geom_id, ring_index int32-nullable, parent, winding, net_winding,
  ring);
- ``fixture_polygons()``: the 3 reference fixtures as a tiny Dataset.
"""

from __future__ import annotations

import json
import pathlib

import numpy as np
import pyarrow as pa

from ..geom.decompose import _close_rings, decompose, determine_parents_batch
from ..geom.gpsi import self_intersections_batch
from ..geom.families import placed_rings_for_ids

__all__ = [
    "decompose_batch",
    "polygons_source",
    "fixture_polygons",
    "decompose_dataset",
    "RING_SCHEMA",
]

_RING_T = pa.list_(pa.list_(pa.float64()))
_RINGS_T = pa.list_(_RING_T)

RING_SCHEMA = pa.schema(
    [
        ("geom_id", pa.string()),
        ("ring_seq", pa.int32()),  # emission order per geometry — never null
        ("ring_index", pa.int32()),  # reference `index` property — null on fast path
        ("parent", pa.int32()),
        ("winding", pa.int8()),
        ("net_winding", pa.int32()),
        ("ring", _RING_T),
    ]
)


def gen_polygon_batch(batch, *, max_radius: float = 1.5) -> pa.Table:
    """{"id": int64 array} → polygon rows (geom_id, rings).

    Fully vectorized: coordinates come from one gather over the
    24-shape unit bank (``placed_rings_for_ids``, bit-exact vs the
    scalar ``polygon_for_id`` — equivalence-pinned in
    test_decompose_pin.py) and the nested Arrow list column is built
    straight from offsets + the flat float64 buffer."""
    ids = np.asarray(batch["id"], dtype=np.int64)
    flat, ring_lens, nrings = placed_rings_for_ids(ids, max_radius=max_radius)
    geom_ids = np.char.mod("poly%010d", ids)
    coords = pa.ListArray.from_arrays(
        pa.array(np.arange(len(flat) + 1, dtype=np.int64) * 2, type=pa.int32()),
        pa.array(flat.ravel()),
    )
    rings = pa.ListArray.from_arrays(
        pa.array(
            np.concatenate([[0], np.cumsum(ring_lens)]).astype(np.int64),
            type=pa.int32(),
        ),
        coords,
    )
    polys = pa.ListArray.from_arrays(
        pa.array(
            np.concatenate([[0], np.cumsum(nrings)]).astype(np.int64),
            type=pa.int32(),
        ),
        rings,
    ).cast(_RINGS_T)
    return pa.table({"geom_id": pa.array(geom_ids), "rings": polys})


def polygons_source(n: int, *, parallelism: int = -1, max_radius: float = 1.5):
    """Deterministic polygon corpus. ``max_radius`` (degrees) controls
    overlap density: 1.5 gives a dense stress corpus; ~0.4 gives a
    realistic ~1-2 ring memberships per probe point.

    ``override_num_blocks`` is always capped at ``n``: more blocks than
    rows makes ``rd.range`` emit zero-row blocks whose schema is EMPTY
    (zero columns) — those blocks pass through every map_batches
    unchanged and break any downstream ``pa.concat_tables``."""
    import functools

    import ray.data as rd

    blocks = parallelism if parallelism > 0 else 200
    ds = rd.range(n, override_num_blocks=max(1, min(n, blocks)))
    # batch per block: forcing a bigger batch_size would coalesce
    # blocks and serialize the whole polygon side into one task
    return ds.map_batches(
        functools.partial(gen_polygon_batch, max_radius=max_radius),
        batch_format="numpy",
        batch_size=None,
    )


def fixture_polygons(fixture_dir: str | None = None):
    """The three reference golden inputs as a Dataset."""
    import ray.data as rd

    d = pathlib.Path(fixture_dir or pathlib.Path(__file__).parents[2] / "tests" / "fixtures")
    rows = []
    for name in ["simple", "complex", "with-hole"]:
        feat = json.loads((d / f"in_{name}.json").read_text())
        rows.append({"geom_id": name, "rings": feat["geometry"]["coordinates"]})
    return rd.from_arrow(
        pa.table(
            {
                "geom_id": pa.array([r["geom_id"] for r in rows]),
                "rings": pa.array([r["rings"] for r in rows], type=_RINGS_T),
            }
        )
    )


def _rings_from_arrow(col) -> list[list[np.ndarray]]:
    """Per-polygon list of per-ring (n, 2) float64 arrays read straight
    off the Arrow offset/value buffers — no per-coordinate Python
    boxing (``to_pylist`` boxes every float and costs ~20% of the
    decompose stage). Falls back to ``to_pylist`` for irregular inputs
    (nulls, non-2-coordinate points) — same downstream semantics, the
    per-ring arrays feed ``_close_rings`` either way."""
    import pyarrow.compute as pc

    if col.null_count:
        return col.to_pylist()
    polys = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    ring_counts = pc.list_value_length(polys).to_numpy()
    rings_arr = pc.list_flatten(polys)
    if rings_arr.null_count:
        return col.to_pylist()
    pt_counts = pc.list_value_length(rings_arr).to_numpy()
    pts_arr = pc.list_flatten(rings_arr)
    if pts_arr.null_count:
        return col.to_pylist()
    coord_counts = pc.list_value_length(pts_arr).to_numpy()
    if len(coord_counts) and not (coord_counts == 2).all():
        return col.to_pylist()  # 3D / ragged points: rare path
    flat = pc.list_flatten(pts_arr).to_numpy().reshape(-1, 2)
    ring_ends = np.cumsum(pt_counts)
    ring_starts = ring_ends - pt_counts
    poly_ends = np.cumsum(ring_counts)
    poly_starts = poly_ends - ring_counts
    return [
        [flat[ring_starts[r] : ring_ends[r]] for r in range(poly_starts[p], poly_ends[p])]
        for p in range(len(ring_counts))
    ]


def decompose_batch(batch: pa.Table) -> pa.Table:
    """One polygon row in → one row per simple output ring. The ring
    column is assembled straight from the kernels' float64 coordinate
    arrays (offsets + flat buffer — values pass through bit-unchanged,
    no tolist round-trip)."""
    geom_ids = batch["geom_id"].to_pylist()
    ringsets = _rings_from_arrow(batch["rings"])
    # one vectorized self-intersection pass for the whole block
    closed = [_close_rings(r) for r in ringsets]
    isect_rows = self_intersections_batch(closed)
    # decompose with parents deferred, then ONE fused containment pass
    # for the whole block (identical output, no per-pair Python PIP)
    all_outs = [
        decompose(rings, _isect_rows=rows, _defer_parents=True)
        for rings, rows in zip(ringsets, isect_rows)
    ]
    determine_parents_batch(all_outs)
    out_gid, out_seq, out_idx = [], [], []
    out_parent, out_wind, out_net = [], [], []
    out_rings: list[np.ndarray] = []
    for gid, results in zip(geom_ids, all_outs):
        for seq, res in enumerate(results):
            out_gid.append(gid)
            out_seq.append(seq)
            out_idx.append(res.index)
            out_parent.append(res.parent)
            out_wind.append(res.winding)
            out_net.append(res.net_winding)
            out_rings.append(res.ring)
    lens = np.fromiter((len(r) for r in out_rings), np.int64, len(out_rings))
    flat = (
        np.concatenate(out_rings).astype(np.float64, copy=False)
        if out_rings
        else np.empty((0, 2))
    )
    inner = pa.ListArray.from_arrays(
        pa.array(np.arange(len(flat) + 1, dtype=np.int64) * 2, type=pa.int32()),
        pa.array(flat.ravel()),
    )
    ring_col = pa.ListArray.from_arrays(
        pa.array(np.concatenate([[0], np.cumsum(lens)]).astype(np.int64), type=pa.int32()),
        inner,
    ).cast(_RING_T)
    return pa.table(
        {
            "geom_id": pa.array(out_gid, type=pa.string()),
            "ring_seq": pa.array(out_seq, type=pa.int32()),
            "ring_index": pa.array(out_idx, type=pa.int32()),
            "parent": pa.array(out_parent, type=pa.int32()),
            "winding": pa.array(out_wind, type=pa.int8()),
            "net_winding": pa.array(out_net, type=pa.int32()),
            "ring": ring_col,
        }
    )


def decompose_batch_quarantine(batch: pa.Table) -> pa.Table:
    """Like ``decompose_batch`` but a bad polygon (duplicate vertices,
    malformed rings) never kills the task: its error is quarantined as
    a row with ``ok=False`` and null ring fields — the dead-letter
    channel of SURVEY.md §2.1 R1. At 100 TB one corrupt record must
    not poison a block."""
    geom_ids = batch["geom_id"].to_pylist()
    ringsets = _rings_from_arrow(batch["rings"])
    cols: dict[str, list] = {k: [] for k in (
        "geom_id", "ok", "error", "ring_seq", "ring_index",
        "parent", "winding", "net_winding", "ring",
    )}
    for gid, rings in zip(geom_ids, ringsets):
        try:
            results = decompose(rings)
        except Exception as e:  # noqa: BLE001 - quarantine any row error
            cols["geom_id"].append(gid)
            cols["ok"].append(False)
            cols["error"].append(f"{type(e).__name__}: {e}")
            for k in ("ring_seq", "ring_index", "parent", "winding", "net_winding"):
                cols[k].append(None)
            cols["ring"].append([])  # empty, not null: nested nulls break
            continue  # Ray's Arrow->pandas block conversion
        for seq, res in enumerate(results):
            cols["geom_id"].append(gid)
            cols["ok"].append(True)
            cols["error"].append(None)
            cols["ring_seq"].append(seq)
            cols["ring_index"].append(res.index)
            cols["parent"].append(res.parent)
            cols["winding"].append(res.winding)
            cols["net_winding"].append(res.net_winding)
            cols["ring"].append(res.ring.tolist())
    return pa.table(
        {
            "geom_id": pa.array(cols["geom_id"], type=pa.string()),
            "ok": pa.array(cols["ok"], type=pa.bool_()),
            "error": pa.array(cols["error"], type=pa.string()),
            "ring_seq": pa.array(cols["ring_seq"], type=pa.int32()),
            "ring_index": pa.array(cols["ring_index"], type=pa.int32()),
            "parent": pa.array(cols["parent"], type=pa.int32()),
            "winding": pa.array(cols["winding"], type=pa.int8()),
            "net_winding": pa.array(cols["net_winding"], type=pa.int32()),
            "ring": pa.array(cols["ring"], type=_RING_T),
        }
    )


def decompose_dataset(polygons, *, batch_size: int | None = None, on_error: str = "raise"):
    """polygons Dataset (geom_id, rings) → simple-rings Dataset.

    Default batch = one task per input block (don't coalesce: the
    decompose kernel is CPU-heavy per row, so block-level parallelism
    is what scales it). ``on_error="quarantine"`` emits bad polygons
    as ``ok=False`` rows instead of failing the task."""
    if on_error == "quarantine":
        return polygons.map_batches(
            decompose_batch_quarantine, batch_format="pyarrow", batch_size=batch_size
        )
    return polygons.map_batches(
        decompose_batch, batch_format="pyarrow", batch_size=batch_size
    )

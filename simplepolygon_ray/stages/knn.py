"""kNN via cell-neighbor expansion (SURVEY.md §2.3 "Joins / lookups").

Sites (lon/lat + id) are compiled into a cell→points index, broadcast
once, and held per actor; probes stream through ``map_batches``. Each
probe expands its k-ring of cells until it holds ≥ k candidates AND the
k-th best haversine distance is ≤ the minimum possible distance of any
unexplored cell (a correct lower bound from the equirectangular cell
geometry), so results equal the exhaustive scan.
"""

from __future__ import annotations

import logging as _logging
import os as _os

import numpy as np
import pyarrow as pa
import ray

from ..cells.grid import point_to_cell
from .cover_stage import DEFAULT_LEVEL

_logger = _logging.getLogger(__name__)

# broadcast→shard crossover for the dataset-sides kNN join: the
# compiled site index holds (ids, lon, lat, cell) for EVERY site in one
# worker heap (~24-40 B/site + the id strings). 50M sites ≈ 2 GB; past
# the cap the site side is no longer broadcast-small and the join
# shards the index block-wise, merging per-probe top-k afterwards
# (mirrors BROADCAST_GATHERED_EDGE_CAP in pip_join.py).
BROADCAST_GATHERED_SITE_CAP = int(
    _os.environ.get("GRAFT_BROADCAST_SITE_CAP", 50_000_000)
)

__all__ = [
    "haversine_km",
    "CellPointIndex",
    "KnnActor",
    "knn_join",
    "knn_join_dataset",
    "knn_join_shuffle",
]

_EARTH_R = 6371.0088


def haversine_km(lon1, lat1, lon2, lat2):
    """Vectorized haversine distance in km."""
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dp = p2 - p1
    dl = np.radians(lon2) - np.radians(lon1)
    a = np.sin(dp / 2.0) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2.0) ** 2
    return 2.0 * _EARTH_R * np.arcsin(np.sqrt(a))


class CellPointIndex:
    """cell_id → (ids, lon, lat) arrays of the site set."""

    def __init__(self, ids, lon, lat, level: int = DEFAULT_LEVEL):
        self.level = level
        lon = np.asarray(lon, np.float64)
        lat = np.asarray(lat, np.float64)
        ids = np.asarray(ids)
        cells = point_to_cell(lon, lat, level).astype(np.int64)
        order = np.argsort(cells, kind="stable")
        self.cells_sorted = cells[order]
        self.ids = ids[order]
        self.lon = lon[order]
        self.lat = lat[order]
        uniq, starts = np.unique(self.cells_sorted, return_index=True)
        self.cell_start = dict(zip(uniq.tolist(), starts.tolist()))
        self.cell_end = dict(
            zip(uniq.tolist(), np.append(starts[1:], len(cells)).tolist())
        )
        self.n_cells = 1 << level
        # smallest lon extent of a cell in km (worst case at max |lat|)
        self.cell_lat_km = 180.0 / self.n_cells * 111.19492664455873
        max_abs_lat = float(np.max(np.abs(lat))) if len(lat) else 0.0
        self.cos_floor = np.cos(np.radians(min(max_abs_lat + 180.0 / self.n_cells, 90.0)))

    def cell_range(self, c: int):
        s = self.cell_start.get(c)
        if s is None:
            return None
        return s, self.cell_end[c]

    def knn(self, qlon: float, qlat: float, k: int):
        """Exact k nearest sites to one probe point."""
        lvl = self.level
        qcell = int(point_to_cell(np.array([qlon]), np.array([qlat]), lvl)[0])
        qi = (qcell >> 29) & ((1 << 29) - 1)
        qj = qcell & ((1 << 29) - 1)
        n = self.n_cells
        got_idx: list[np.ndarray] = []
        r = 0
        while True:
            # ring of cells at Chebyshev radius r
            ring_cells = []
            if r == 0:
                ring_cells.append((qi, qj))
            else:
                for di in range(-r, r + 1):
                    for dj in (-r, r):
                        jj = qj + dj
                        if 0 <= jj < n:
                            ring_cells.append(((qi + di) % n, jj))
                for dj in range(-r + 1, r):
                    for di in (-r, r):
                        jj = qj + dj
                        if 0 <= jj < n:
                            ring_cells.append(((qi + di) % n, jj))
            for ci, cj in ring_cells:
                rng = self.cell_range((lvl << 58) | (ci << 29) | cj)
                if rng:
                    got_idx.append(np.arange(rng[0], rng[1]))
            total = sum(len(a) for a in got_idx)
            # lower bound on distance to any cell beyond radius r
            lon_km_per_cell = 360.0 / n * 111.19492664455873 * self.cos_floor
            bound_km = r * min(self.cell_lat_km, lon_km_per_cell)
            if total >= k:
                idx = np.concatenate(got_idx)
                # pre-sort candidates by neighbor id: the stable
                # distance argsort then tie-breaks by (dist, id),
                # deterministic and matching the SQL oracle's ORDER BY
                idx = idx[np.argsort(self.ids[idx], kind="stable")]
                d = haversine_km(qlon, qlat, self.lon[idx], self.lat[idx])
                top = np.argsort(d, kind="stable")[:k]
                if d[top[-1]] <= bound_km or r >= n:
                    return idx[top], d[top]
            elif r >= n:
                if total == 0:
                    return np.empty(0, np.int64), np.empty(0)
                idx = np.concatenate(got_idx)
                idx = idx[np.argsort(self.ids[idx], kind="stable")]
                d = haversine_km(qlon, qlat, self.lon[idx], self.lat[idx])
                top = np.argsort(d, kind="stable")[: min(k, total)]
                return idx[top], d[top]
            r += 1


    def _ring_cells(self, qi: int, qj: int, r: int):
        """Cell ids of the Chebyshev ring at radius r, in the scalar
        enumeration order (top/bottom rows, then side columns) so
        candidate accumulation order — and thus distance-tie behavior —
        matches :meth:`knn` exactly."""
        n = self.n_cells
        lvl = self.level
        if r == 0:
            dis = np.zeros(1, np.int64)
            djs = np.zeros(1, np.int64)
        else:
            di1 = np.repeat(np.arange(-r, r + 1, dtype=np.int64), 2)
            dj1 = np.tile(np.array([-r, r], np.int64), 2 * r + 1)
            dj2 = np.repeat(np.arange(-r + 1, r, dtype=np.int64), 2)
            di2 = np.tile(np.array([-r, r], np.int64), max(2 * r - 1, 0))
            dis = np.concatenate([di1, di2])
            djs = np.concatenate([dj1, dj2])
        jj = qj + djs
        ok = (jj >= 0) & (jj < n)
        ii = np.mod(qi + dis[ok], n)
        return (np.int64(lvl) << np.int64(58)) | (ii << np.int64(29)) | jj[ok]

    def knn_batch(self, lon: np.ndarray, lat: np.ndarray, k: int):
        """Exact kNN for a whole probe batch: probes sharing a cell are
        expanded and scored together (one distance matrix per cell
        group per radius round). Results equal per-probe :meth:`knn`.

        Returns (probe_pos, site_row, rank, dist) flat arrays ordered
        by (probe_pos, rank)."""
        lvl = self.level
        n = self.n_cells
        cells = point_to_cell(lon, lat, lvl).astype(np.int64)
        order = np.argsort(cells, kind="stable")
        sc = cells[order]
        bounds = np.flatnonzero(np.diff(sc)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(order)]])
        lon_km_per_cell = 360.0 / n * 111.19492664455873 * self.cos_floor
        cell_km = min(self.cell_lat_km, lon_km_per_cell)

        out_p, out_s, out_r, out_d = [], [], [], []
        for s, e in zip(starts, ends):
            qcell = int(sc[s])
            qi = (qcell >> 29) & ((1 << 29) - 1)
            qj = qcell & ((1 << 29) - 1)
            pos = order[s:e]
            plon = lon[pos]
            plat = lat[pos]
            got: list[np.ndarray] = []
            r = 0
            while True:
                for c in self._ring_cells(qi, qj, r):
                    rng = self.cell_range(int(c))
                    if rng:
                        got.append(np.arange(rng[0], rng[1]))
                total = sum(len(a) for a in got)
                bound_km = r * cell_km
                if total >= k or r >= n:
                    idx = np.concatenate(got) if got else np.empty(0, np.int64)
                    if total == 0:
                        break
                    # deterministic (dist, neighbor_id) tie-break as in knn()
                    idx = idx[np.argsort(self.ids[idx], kind="stable")]
                    d = haversine_km(
                        plon[:, None], plat[:, None], self.lon[idx], self.lat[idx]
                    )
                    kk = min(k, total)
                    top = np.argsort(d, axis=1, kind="stable")[:, :kk]
                    dk = np.take_along_axis(d, top, axis=1)
                    if (total >= k and (dk[:, -1] <= bound_km).all()) or r >= n:
                        ranks = np.broadcast_to(np.arange(kk), (len(pos), kk))
                        out_p.append(np.repeat(pos, kk))
                        out_s.append(idx[top].ravel())
                        out_r.append(ranks.ravel())
                        out_d.append(dk.ravel())
                        break
                r += 1
        if not out_p:
            return (
                np.empty(0, np.int64),
                np.empty(0, np.int64),
                np.empty(0, np.int64),
                np.empty(0),
            )
        p = np.concatenate(out_p)
        srt = np.argsort(p, kind="stable")  # rank order preserved within probe
        return (
            p[srt],
            np.concatenate(out_s)[srt],
            np.concatenate(out_r)[srt],
            np.concatenate(out_d)[srt],
        )


class KnnActor:
    """Actor-pool stage: site index fetched once per actor; probes are
    scored in vectorized per-cell groups (no per-probe Python loop).
    ``emit_cell`` adds the probe's cell id — the sharded join's merge
    key (all of a probe's rows share it across shards)."""

    def __init__(self, index_ref, k: int, id_col: str, emit_cell: bool = False):
        self.index: CellPointIndex = ray.get(index_ref)
        self.k = k
        self.id_col = id_col
        self.emit_cell = emit_cell

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        pp, ss, rr, dd = self.index.knn_batch(lon, lat, self.k)
        cols = {
            self.id_col: batch[self.id_col].take(pa.array(pp)),
            "neighbor_id": pa.array(self.index.ids[ss]),
            "rank": pa.array(rr.astype(np.int32)),
            "dist_km": pa.array(dd),
        }
        if self.emit_cell:
            cells = point_to_cell(lon, lat, self.index.level).astype(np.int64)
            cols["pcell"] = pa.array(cells[pp])
        return pa.table(cols)


def knn_join(
    probes,
    site_ids,
    site_lon,
    site_lat,
    *,
    k: int = 5,
    level: int = DEFAULT_LEVEL,
    id_col: str = "image_id",
    concurrency: int | tuple = 4,
    batch_size: int = 4096,
):
    """probes Dataset (id, lon, lat) × site arrays → kNN rows."""
    index_ref = ray.put(CellPointIndex(site_ids, site_lon, site_lat, level=level))
    return probes.map_batches(
        KnnActor,
        fn_constructor_args=(index_ref, k, id_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def _segmented_topk(seg_codes, nid, dist, k: int):
    """Vectorized per-segment top-k by (dist, neighbor_id): returns
    (row_selector, rank) for the kept rows, ordered (segment, rank).
    ``seg_codes``/``nid`` may be any comparable dtype (encoded to
    codes so the lexsort never touches Python objects)."""
    seg = np.unique(seg_codes, return_inverse=True)[1]
    nidc = np.unique(nid, return_inverse=True)[1]
    order = np.lexsort((nidc, dist, seg))
    s = seg[order]
    new = np.ones(len(s), bool)
    new[1:] = s[1:] != s[:-1]
    starts = np.flatnonzero(new)
    lens = np.diff(np.append(starts, len(s)))
    rank = np.arange(len(s), dtype=np.int64) - np.repeat(starts, lens)
    keep = rank < k
    return order[keep], rank[keep]


def knn_join_shuffle(
    probes,
    sites,
    *,
    k: int = 5,
    level: int = DEFAULT_LEVEL,
    radius: int = 1,
    id_col: str = "image_id",
    site_id_col: str = "image_id",
    num_partitions: int = 16,
    salt_factor: int = 1,
):
    """Shuffle kNN for HUGE site sets (no broadcast index): sites are
    keyed by cell, each probe fans out to its (2·radius+1)² neighbor
    cells, and a cell-keyed hash join co-locates candidates. A hot
    cell (dense site cluster) can be split across ``salt_factor``
    shards — sites take one shard each, probes replicate to all — at
    the cost of ×salt_factor probe fan-out; the partial top-k absorbs
    the shards and the final merge is unchanged. The
    top-k then runs in two vectorized phases: a per-block segmented
    partial top-k (reduces to ≤ k rows per probe per block, plus the
    block-local candidate count), and a final merge grouped by the
    probe's OWN cell — thousands of cell groups instead of a Python/
    pandas group per probe — again via segmented lexsort.

    Partitioning assumption: ``radius`` must be sized so a probe's
    neighborhood usually holds ≥ k sites AND the k-th distance fits
    inside the ring bound; each output group carries an ``exact`` flag
    (count ≥ k and d_k ≤ bound) so callers can re-run the flagged
    remainder at a larger radius (or through the broadcast path).
    """
    import pandas as pd

    n = 1 << level
    cell_km_lat = 180.0 / n * 111.19492664455873

    def key_sites(t: pa.Table) -> pa.Table:
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        cells = point_to_cell(lon, lat, level).astype(np.int64)
        # shard assignment only spreads load; ANY per-site choice is
        # correct because probes visit every shard of a cell
        salt = np.arange(len(t), dtype=np.int64) % salt_factor
        return pa.table(
            {
                "neighbor_id": t[site_id_col],
                "slon": pa.array(lon),
                "slat": pa.array(lat),
                "cell_id": pa.array(cells),
                "salt": pa.array(salt),
            }
        )

    def expand_probes(t: pa.Table) -> pa.Table:
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        cells = point_to_cell(lon, lat, level).astype(np.int64)
        qi = (cells >> np.int64(29)) & np.int64((1 << 29) - 1)
        qj = cells & np.int64((1 << 29) - 1)
        d = np.arange(-radius, radius + 1, dtype=np.int64)
        di = np.repeat(d, len(d))[None, :]
        dj = np.tile(d, len(d))[None, :]
        ii = np.mod(qi[:, None] + di, n)
        jj = qj[:, None] + dj
        ok = (jj >= 0) & (jj < n)
        ncell = ok.sum(axis=1)
        rows = np.repeat(np.arange(len(t), dtype=np.int64), ncell)
        cell = (np.int64(level) << np.int64(58)) | (ii[ok] << np.int64(29)) | jj[ok]
        # probes visit every salt shard of each neighbor cell
        rows = np.repeat(rows, salt_factor)
        cell = np.repeat(cell, salt_factor)
        salt = np.tile(np.arange(salt_factor, dtype=np.int64), len(rows) // salt_factor)
        take = pa.array(rows)
        return pa.table(
            {
                id_col: t[id_col].take(take),
                "lon": pa.array(lon[rows]),
                "lat": pa.array(lat[rows]),
                "pcell": pa.array(cells[rows]),  # probe's own cell: final-merge key
                "cell_id": pa.array(cell),
                "salt": pa.array(salt),
            }
        )

    exp = probes.map_batches(expand_probes, batch_format="pyarrow")
    keyed = sites.map_batches(key_sites, batch_format="pyarrow")
    matched = exp.join(
        keyed,
        join_type="inner",
        num_partitions=num_partitions,
        on=("cell_id", "salt"),
    )

    def score_partial(t: pa.Table) -> pa.Table:
        """Haversine + ring bound, then block-local segmented top-k:
        only ≤ k rows per (probe, block) — plus the block's candidate
        count on each probe's rank-0 row — enter the final shuffle."""
        plat = t["lat"].to_numpy(zero_copy_only=False)
        d = haversine_km(
            t["lon"].to_numpy(zero_copy_only=False),
            plat,
            t["slon"].to_numpy(zero_copy_only=False),
            t["slat"].to_numpy(zero_copy_only=False),
        )
        # conservative per-probe lower bound on the distance to ANY
        # cell outside the explored (2r+1)² neighborhood: the lat-band
        # argument caps cos(λ) over cells within ±(radius+1) rows
        cosf = np.cos(
            np.radians(np.minimum(np.abs(plat) + (radius + 1) * 180.0 / n, 90.0))
        )
        bound = radius * np.minimum(
            cell_km_lat, 360.0 / n * 111.19492664455873 * cosf
        )
        pid = t[id_col].to_numpy(zero_copy_only=False)
        nid = t["neighbor_id"].to_numpy(zero_copy_only=False)
        sel, rank = _segmented_topk(pid, nid, d, k)
        # block-local candidate count per probe, attached to rank-0 rows
        seg = np.unique(pid, return_inverse=True)[1]
        counts = np.bincount(seg)
        cnt = np.where(rank == 0, counts[seg[sel]], 0).astype(np.int64)
        take = pa.array(sel)
        return pa.table(
            {
                id_col: t[id_col].take(take),
                "pcell": t["pcell"].take(take),
                "neighbor_id": t["neighbor_id"].take(take),
                "dist_km": pa.array(d[sel]),
                "bound_km": pa.array(bound[sel]),
                "cnt": pa.array(cnt),
            }
        )

    partial = matched.map_batches(score_partial, batch_format="pyarrow")

    def final_merge(g: pd.DataFrame) -> pd.DataFrame:
        """One cell's probes at once: global top-k per probe from the
        ≤ k-per-block partials, candidate totals from the cnt column."""
        pid = g[id_col].to_numpy()
        nid = g["neighbor_id"].to_numpy()
        dist = g["dist_km"].to_numpy()
        sel, rank = _segmented_topk(pid, nid, dist, k)
        seg = np.unique(pid, return_inverse=True)[1]
        total = np.bincount(seg, weights=g["cnt"].to_numpy()).astype(np.int64)
        kept_seg = seg[sel]
        # per-probe k-th distance among kept rows (rank order within segment)
        is_last = np.ones(len(sel), bool)
        is_last[:-1] = kept_seg[1:] != kept_seg[:-1]
        dk = np.empty(len(total))
        dk[kept_seg[is_last]] = dist[sel][is_last]
        exact = (total >= k) & (dk <= g["bound_km"].to_numpy()[sel][is_last])
        return pd.DataFrame(
            {
                id_col: pid[sel],
                "neighbor_id": nid[sel],
                "rank": rank.astype(np.int32),
                "dist_km": dist[sel],
                "exact": exact[kept_seg],
            }
        )

    return partial.groupby("pcell").map_groups(final_merge, batch_format="pandas")


@ray.remote
def _compile_site_index(level: int, id_col: str, *blocks: pa.Table) -> CellPointIndex:
    """Build the site index INSIDE a Ray task (sites never transit the
    driver; the returned ObjectRef is the broadcast handle)."""
    tables = [t for t in blocks if t.num_columns > 0 and t.num_rows > 0]
    if tables:
        full = pa.concat_tables(tables)
        ids = full[id_col].to_numpy(zero_copy_only=False)
        lon = full["lon"].to_numpy(zero_copy_only=False)
        lat = full["lat"].to_numpy(zero_copy_only=False)
    else:
        ids = np.empty(0, object)
        lon = np.empty(0)
        lat = np.empty(0)
    return CellPointIndex(ids, lon, lat, level=level)


def knn_join_dataset(
    probes,
    sites,
    *,
    k: int = 5,
    level: int = DEFAULT_LEVEL,
    id_col: str = "image_id",
    site_id_col: str = "image_id",
    concurrency: int | tuple = 4,
    batch_size: int = 4096,
    n_shards: int | None = None,
    broadcast_site_cap: int | None = None,
):
    """probes Dataset × sites DATASET → kNN rows. The site index is the
    broadcast dimension table: compiled in one Ray task from the sites
    Dataset's block refs and fetched once per probe actor — the driver
    only holds ObjectRefs.

    Partitioning assumption + crossover: the compiled index must fit
    one worker's heap. Past ``broadcast_site_cap`` sites (default
    ``BROADCAST_GATHERED_SITE_CAP``) the join warns and SHARDS the
    index block-wise instead: per-shard exact kNN (a shard's top-k is
    certified by the same cell-expansion bound), then one
    cell-bucketed groupby merges per-probe global top-k — every global
    top-k site is in its own shard's top-k, so the merge equals the
    single-index join row-for-row. ``n_shards`` forces the shard
    count (tests; >1 selects the sharded path unconditionally)."""
    cap = (
        broadcast_site_cap
        if broadcast_site_cap is not None
        else BROADCAST_GATHERED_SITE_CAP
    )
    sites = sites.materialize()
    n_sites = sites.count()  # materialized → metadata-only
    refs = sites.to_arrow_refs()
    if n_shards is None:
        n_shards = 1
        if n_sites > cap:
            n_shards = int(-(-n_sites // max(cap, 1)))
            _logger.warning(
                "kNN site index would gather %d sites (> cap %d): the site "
                "side is no longer broadcast-small — sharding the index %d "
                "ways with a per-probe top-k merge (consider "
                "knn_join_shuffle for cell-keyed scaling)",
                n_sites,
                cap,
                n_shards,
            )
    if n_shards <= 1:
        index_ref = _compile_site_index.remote(level, site_id_col, *refs)
        return probes.map_batches(
            KnnActor,
            fn_constructor_args=(index_ref, k, id_col),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )

    # sharded path: round-robin the site BLOCKS into shards (no extra
    # pass over the sites), compile one sub-index per shard
    groups = [refs[i::n_shards] for i in range(n_shards)]
    idx_refs = [
        _compile_site_index.remote(level, site_id_col, *g) for g in groups
    ]
    parts = [
        probes.map_batches(
            KnnActor,
            fn_constructor_args=(r, k, id_col, True),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
        for r in idx_refs
    ]
    un = parts[0].union(*parts[1:])

    def merge(g: pa.Table) -> pa.Table:
        pid = g[id_col].to_numpy(zero_copy_only=False)
        nid = g["neighbor_id"].to_numpy(zero_copy_only=False)
        d = g["dist_km"].to_numpy(zero_copy_only=False)
        sel, rank = _segmented_topk(pid, nid, d, k)
        selp = pa.array(sel)
        return pa.table(
            {
                id_col: g[id_col].take(selp),
                "neighbor_id": g["neighbor_id"].take(selp),
                "rank": pa.array(rank.astype(np.int32)),
                "dist_km": pa.array(d[sel]),
            }
        )

    return un.groupby("pcell").map_groups(merge, batch_format="pyarrow")

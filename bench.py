"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N}

``--scaling`` re-runs the harness in two fresh subprocesses at
num_cpus=8 and num_cpus=32 on the same input and reports both
throughputs + scaling efficiency (the sandbox proxy for the N vs 4N
node criterion — BASELINE.md row 8).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# headline spatial workload scale (independent of sf tables; the image
# table is synthesized). Sized so the composite spatial pipeline
# carries ~600 cpu-seconds of parallel work — enough that the
# two-parallelism scaling comparison measures throughput, not fixed
# Ray overhead (per-pipeline startup + compile are a few seconds).
# Polygon counts were raised 800k→2M / 200k→500k when the corpus
# generator was vectorized (commit 65539f9 removed ~300 cpu-s of
# synthesis), restoring the intended cpu-second budget; BENCH rows
# disclose the per-run counts, so cross-round compares use rows/s.
N_IMAGES = int(os.environ.get("GRAFT_BENCH_IMAGES", "32000000"))
N_POLYGONS = int(os.environ.get("GRAFT_BENCH_POLYGONS", "2000000"))
N_POLYGONS_TILES = int(os.environ.get("GRAFT_BENCH_POLYGONS_TILES", "500000"))
N_POLYGONS_JOIN = int(os.environ.get("GRAFT_BENCH_POLYGONS_JOIN", "3000"))


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data as rd

    ctx = rd.DataContext.get_current()
    ctx.enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from simplepolygon_ray.images.synth import gen_points
    from simplepolygon_ray.relational.queries import QUERIES
    from simplepolygon_ray.stages.decompose_stage import (
        decompose_dataset,
        fixture_polygons,
        polygons_source,
    )
    from simplepolygon_ray.stages.pip_join import pip_join_broadcast
    from simplepolygon_ray.stages.tiles import tile_assign_dataset

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}

    def timed(name, fn, repeats: int = 1):
        best = None
        for _ in range(repeats):
            t0 = time.perf_counter()
            n = fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        rows[name] = int(n)

    # warm (untimed): page cache for the parquet inputs + Ray worker
    # process spawn/imports, so timings measure compute + shuffle
    rd.read_parquet(f"{SF_DIR}/lineitem.parquet").count()
    _warm_polys = fixture_polygons().union(polygons_source(64, parallelism=NUM_CPUS))
    pip_join_broadcast(
        gen_points(NUM_CPUS * 2048, parallelism=NUM_CPUS),
        decompose_dataset(_warm_polys),
    ).count()

    # --- headline: composite spatial pipeline ---
    # decompose (the reference's core operator) at full width, tile
    # assignment + clipping on a slice, PIP join of the image table
    # against a compiled ring index. One fixed task-granularity at both
    # parallelism levels = the same job.

    def decompose_job():
        polys = fixture_polygons().union(polygons_source(N_POLYGONS, parallelism=256))
        return decompose_dataset(polys).count()

    timed("decompose", decompose_job, repeats=2)

    def tiles_job():
        polys = polygons_source(N_POLYGONS_TILES, parallelism=256)
        simple = decompose_dataset(polys)
        return tile_assign_dataset(simple, zoom=8).count()

    timed("tile_assign", tiles_job, repeats=2)

    def join_job():
        # realistic membership density (~1-2 rings per point): small
        # ring radii; the giant fixture rings stay out of the join index
        polys = polygons_source(N_POLYGONS_JOIN, parallelism=64, max_radius=0.4)
        simple = decompose_dataset(polys)
        par = max(NUM_CPUS * 2, N_IMAGES // 65536)
        imgs = gen_points(N_IMAGES, parallelism=par)
        return pip_join_broadcast(imgs, simple).count()

    timed("spatial_join", join_job, repeats=2)

    # --- relational over the sf tables ---
    def consume(name):
        def run():
            import pandas as pd

            res = QUERIES[name](SF_DIR)
            return len(res) if isinstance(res, pd.DataFrame) else res.count()

        return run

    timed("pricing_summary", consume("pricing_summary"))
    timed("order_revenue_topk", consume("order_revenue_topk"))
    timed("events_hourly", consume("events_hourly"))

    # --- text + ann ---
    from simplepolygon_ray.ann.search import brute_topk, query_vector
    from simplepolygon_ray.text.dedup import minhash_dedup_pairs

    def dedup():
        docs = rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
        return minhash_dedup_pairs(docs, threshold=0.7).count()

    timed("minhash_dedup", dedup)

    def ann():
        emb = rd.read_parquet(
            f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        return brute_topk(emb, query_vector(64), k=10).count()

    timed("ann_brute_topk", ann)

    total = round(sum(timings.values()), 3)
    spatial_sec = timings["decompose"] + timings["tile_assign"] + timings["spatial_join"]
    spatial_rows_per_sec = round(
        (N_POLYGONS + N_POLYGONS_TILES + N_POLYGONS_JOIN + N_IMAGES) / spatial_sec, 1
    )
    result = {
        "metric": "headline_pipelines_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "rows": rows,
        "spatial_sec": round(spatial_sec, 3),
        "spatial_rows_per_sec": spatial_rows_per_sec,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
    }
    ray.shutdown()
    return result


def run_scaling():
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        last_err = None
        for attempt in range(2):  # co-tenant kills of a leg are transient:
            # retry once rather than aborting a 25-minute protocol run
            try:
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__)],
                    env=env,
                    capture_output=True,
                    text=True,
                    check=True,
                ).stdout
                return json.loads(out.strip().splitlines()[-1])
            except subprocess.CalledProcessError as e:
                last_err = e
                print(
                    f"# leg ncpu={ncpu} attempt {attempt} failed "
                    f"(rc={e.returncode}); tail: {e.stderr[-300:]!r}",
                    file=sys.stderr,
                )
        raise last_err

    # alternate the two levels and keep each level's best spatial time:
    # co-tenant noise on this box drifts over minutes, so measuring the
    # levels in disjoint time windows biases the ratio either way
    repeats = int(os.environ.get("GRAFT_SCALING_REPEATS", "2"))
    lo = hi = None
    for _ in range(repeats):
        a, b = run(8), run(32)
        if lo is None or a["spatial_sec"] < lo["spatial_sec"]:
            lo = a
        if hi is None or b["spatial_sec"] < hi["spatial_sec"]:
            hi = b
    tput_lo = lo["spatial_rows_per_sec"]
    tput_hi = hi["spatial_rows_per_sec"]
    eff = (tput_hi / tput_lo) / (32 / 8)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "value": round(eff, 3),
                "unit": "ratio",
                "spatial_rows_per_sec_8": tput_lo,
                "spatial_rows_per_sec_32": tput_hi,
                "sec_8": lo["value"],
                "sec_32": hi["value"],
                "per_query_8": lo["queries"],
                "per_query_32": hi["queries"],
                "sf": SF_DIR,
            }
        )
    )


def _ceiling_work(chunk_id: int) -> int:
    """One fixed-size decompose work unit (no Ray): synthesize a
    2000-polygon chunk and run the full decompose kernel over it."""
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from simplepolygon_ray.stages.decompose_stage import (
        decompose_batch,
        gen_polygon_batch,
    )

    ids = np.arange(chunk_id * 2000, (chunk_id + 1) * 2000, dtype=np.int64)
    t = gen_polygon_batch({"id": ids})
    return len(decompose_batch(t))


def run_host_ceiling():
    """No-Ray multiprocessing control: the BOX's own 8→32-proc scaling
    for the decompose kernel (fixed total work, alternating levels,
    best-of). On one host, 32 processes share one memory controller —
    per-core throughput drops ~1.3× (DRAM/L3 contention), capping ANY
    32-proc measurement near 0.78 even with zero framework overhead.
    A real N→4N NODE cluster brings 4N memory controllers, so this
    control isolates what the one-box proxy systematically
    underestimates. Compare `bench.py --scaling` (Ray) against this
    ceiling rather than against 1.0."""
    import multiprocessing as mp

    n_chunks = int(os.environ.get("GRAFT_CEILING_CHUNKS", "200"))  # 400k polys
    repeats = int(os.environ.get("GRAFT_SCALING_REPEATS", "2"))
    levels = (8, 32)
    best: dict[int, float] = {}
    ctx = mp.get_context("spawn")
    for _ in range(repeats):
        for nproc in levels:
            with ctx.Pool(nproc) as pool:
                pool.map(_ceiling_work, range(nproc))  # warm imports, untimed
                t0 = time.perf_counter()
                pool.map(_ceiling_work, range(n_chunks), chunksize=1)
                dt = time.perf_counter() - t0
            best[nproc] = min(best.get(nproc, dt), dt)
    lo, hi = levels
    polys = n_chunks * 2000
    eff = (polys / best[hi]) / (polys / best[lo]) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": "host_ceiling_efficiency",
                "value": round(eff, 3),
                "unit": "ratio",
                "polys_per_sec_8": round(polys / best[lo], 1),
                "polys_per_sec_32": round(polys / best[hi], 1),
                "sec_8": round(best[lo], 3),
                "sec_32": round(best[hi], 3),
                "note": "no-Ray mp control; one-box DRAM ceiling for the "
                "decompose kernel — the bar the Ray measurement is judged "
                "against (a 4N-node cluster has 4N memory controllers)",
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    elif "--host-ceiling" in sys.argv:
        run_host_ceiling()
    else:
        print(json.dumps(run_bench()))

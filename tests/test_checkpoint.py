"""Checkpoint/resume: kill after k shards, rerun, assert identical
final outputs and that finished shards were skipped (SURVEY.md §5.2.5)."""

import os

import numpy as np
import pytest

from simplepolygon_ray.state import CheckpointedRunner, load_output


def _make_shard_factory():
    import ray.data as rd

    from simplepolygon_ray.stages.decompose_stage import decompose_dataset, polygons_source

    def make(shard_id: str):
        lo = int(shard_id) * 100
        ds = rd.range(100).map_batches(
            lambda b: {"id": np.asarray(b["id"]) + lo}, batch_format="numpy"
        )
        from simplepolygon_ray.stages.decompose_stage import gen_polygon_batch, decompose_batch

        return ds.map_batches(gen_polygon_batch, batch_format="numpy").map_batches(
            decompose_batch, batch_format="pyarrow"
        )

    return make


def test_kill_and_resume(ray_session, tmp_path):
    out = str(tmp_path / "ckpt")
    shards = [str(i) for i in range(6)]
    make = _make_shard_factory()

    runner = CheckpointedRunner(out, "decompose")
    with pytest.raises(RuntimeError, match="injected failure"):
        runner.run(shards, make, lineage=lambda s: f"ids[{int(s)*100}:{int(s)*100+100}]",
                   fail_after=3)
    assert len(runner.manifest.records()) == 3

    # resume with a FRESH runner (manifest reloaded from disk); the
    # same lineage description must be presented for shards to skip
    lin = lambda s: f"ids[{int(s)*100}:{int(s)*100+100}]"
    runner2 = CheckpointedRunner(out, "decompose")
    assert runner2.pending(shards) == ["3", "4", "5"]
    assert runner2.pending(shards, lineage=lin) == ["3", "4", "5"]
    stats = runner2.run(shards, make, lineage=lin)
    assert stats == {"ran": 3, "skipped": 3}

    # a CHANGED lineage (different code/inputs) invalidates the
    # checkpoint instead of silently reusing it
    runner3 = CheckpointedRunner(out, "decompose")
    assert runner3.pending(shards, lineage=lambda s: "v2") == shards

    # final output identical to a clean single run
    resumed = load_output(out, "decompose").to_pandas()
    clean_dir = str(tmp_path / "clean")
    CheckpointedRunner(clean_dir, "decompose").run(shards, make)
    clean = load_output(clean_dir, "decompose").to_pandas()
    key = ["geom_id", "ring_seq"]
    a = resumed.sort_values(key).reset_index(drop=True)
    b = clean.sort_values(key).reset_index(drop=True)
    assert a[["geom_id", "ring_seq", "parent", "winding", "net_winding"]].equals(
        b[["geom_id", "ring_seq", "parent", "winding", "net_winding"]]
    )
    assert len(a) == len(b) > 0

    # metrics present in the manifest
    for rec in runner2.manifest.records():
        assert rec.rows > 0 and rec.num_bytes > 0 and rec.duration_s > 0


def test_rerun_is_noop(ray_session, tmp_path):
    out = str(tmp_path / "ckpt2")
    make = _make_shard_factory()
    shards = ["0", "1"]
    CheckpointedRunner(out, "decompose").run(shards, make)
    stats = CheckpointedRunner(out, "decompose").run(shards, make)
    assert stats == {"ran": 0, "skipped": 2}


def test_partial_output_without_manifest_is_rewritten(ray_session, tmp_path):
    out = str(tmp_path / "ckpt3")
    make = _make_shard_factory()
    runner = CheckpointedRunner(out, "decompose")
    # simulate a crash mid-write: directory exists, no manifest row
    os.makedirs(runner.shard_dir("0"))
    stats = runner.run(["0"], make)
    assert stats == {"ran": 1, "skipped": 0}
    assert load_output(out, "decompose").count() > 0


def test_stage_metrics(ray_session):
    from simplepolygon_ray.stages.decompose_stage import decompose_dataset, polygons_source
    from simplepolygon_ray.state import stage_metrics

    ds = decompose_dataset(polygons_source(200, parallelism=4)).materialize()
    df = stage_metrics(ds)
    assert len(df) >= 1
    assert {"operator", "total_wall_s", "tasks"} <= set(df.columns)
    assert (df["total_wall_s"] >= 0).all()


def test_write_partitioned(ray_session, tmp_path):
    import os

    import ray.data as rd

    from simplepolygon_ray.state import write_partitioned

    from simplepolygon_ray.images.synth import gen_points

    out = str(tmp_path / "parts")
    write_partitioned(gen_points(2000), out, "image_id", num_buckets=8)
    dirs = sorted(d for d in os.listdir(out) if d.startswith("bucket="))
    assert len(dirs) == 8
    back = rd.read_parquet(out).to_pandas()
    assert len(back) == 2000
    assert set(gen_points(2000).to_pandas()["image_id"]) == set(back["image_id"])


def test_flagship_kill_and_resume(ray_session, tmp_path):
    """North-rule story: kill the FLAGSHIP mid-pipeline, resume, and
    the checkpointed output equals a clean run — finished shards are
    skipped, only pending shards re-execute."""
    import pytest

    from simplepolygon_ray.pipelines.flagship import flagship, flagship_checkpointed

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "flagship_ckpt")
    with pytest.raises(RuntimeError, match="injected failure"):
        flagship_checkpointed(sf, out, n_shards=4, fail_after=2)

    runner_manifest = os.path.join(out, "_manifest.jsonl")
    assert os.path.exists(runner_manifest)
    assert sum(1 for _ in open(runner_manifest)) == 2  # two shards survived the kill

    resumed = flagship_checkpointed(sf, out, n_shards=4).to_pandas()
    assert sum(1 for _ in open(runner_manifest)) == 4  # only 2 more ran

    clean = flagship(sf).to_pandas()
    key = ["image_id", "geom_id", "ring_seq"]
    a = resumed.sort_values(key).reset_index(drop=True)[key]
    b = clean.sort_values(key).reset_index(drop=True)[key]
    assert len(a) == len(b) > 0
    assert a.equals(b.astype(a.dtypes.to_dict()))


def test_orphaned_shards_excluded_from_planned_read(ray_session, tmp_path):
    """ADVICE r4: rerunning a stage with FEWER shards over an existing
    out_dir must not silently read back the orphaned shard dirs —
    load_output(shard_ids=...) reads only the current plan."""
    out = str(tmp_path / "ckpt4")
    make = _make_shard_factory()

    CheckpointedRunner(out, "decompose").run(["0", "1", "2"], make)
    full = load_output(out, "decompose").count()
    planned = load_output(out, "decompose", shard_ids=["0", "1"]).count()
    orphan = load_output(out, "decompose", shard_ids=["2"]).count()
    assert planned + orphan == full
    assert planned < full  # shard 2's rows are excluded from the plan

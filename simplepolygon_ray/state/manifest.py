"""Per-partition checkpoint manifests — resumable pipeline runs.

"Resumable from checkpoint with per-partition lineage and metrics"
(BASELINE.json north_rule) for a batch pipeline means:

- the job is split into DETERMINISTIC shards (key ranges / id ranges),
- each shard's output is written to its own directory ATOMICALLY
  (write to ``<dir>.tmp``, fsync, rename),
- a manifest (JSONL, append-only) records one row per finished shard:
  stage, shard id, input lineage descriptor, row count, byte size,
  content checksum, wall duration, timestamp,
- a rerun loads the manifest and SKIPS every shard whose entry exists
  and whose output directory is present — resume is an anti-join of
  planned shards against the manifest.

The runner executes shards as independent Ray Data pipelines, so a
mid-run kill loses at most the in-flight shards.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections.abc import Callable, Sequence
from dataclasses import asdict, dataclass

__all__ = ["ShardManifest", "CheckpointedRunner", "load_output", "write_partitioned"]


@dataclass
class ShardRecord:
    stage: str
    shard_id: str
    lineage: str
    rows: int
    num_bytes: int
    checksum: str
    duration_s: float
    finished_at: float


class ShardManifest:
    """Append-only JSONL manifest of finished shards."""

    def __init__(self, path: str):
        self.path = path
        self._records: dict[tuple[str, str], ShardRecord] = {}
        if os.path.exists(path):
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    rec = ShardRecord(**json.loads(line))
                    self._records[(rec.stage, rec.shard_id)] = rec

    def done(self, stage: str, shard_id: str) -> bool:
        return (stage, shard_id) in self._records

    def record(self, rec: ShardRecord) -> None:
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        with open(self.path, "a") as f:
            f.write(json.dumps(asdict(rec)) + "\n")
            f.flush()
            os.fsync(f.fileno())
        self._records[(rec.stage, rec.shard_id)] = rec

    def records(self) -> list[ShardRecord]:
        return list(self._records.values())


def _table_checksum(num_rows: int, num_bytes: int, col_names: Sequence[str]) -> str:
    import hashlib

    h = hashlib.sha256()
    h.update(f"{num_rows}|{num_bytes}|{','.join(col_names)}".encode())
    return h.hexdigest()[:16]


class CheckpointedRunner:
    """Run a sharded pipeline with atomic per-shard output + manifest.

    ``make_shard(shard_id) -> ray.data.Dataset`` builds the (lazy)
    pipeline for one shard; the runner writes it to
    ``<out_dir>/<stage>/shard=<shard_id>/`` and appends the manifest
    row. Finished shards (manifest row + directory present) are
    skipped on rerun.
    """

    def __init__(self, out_dir: str, stage: str):
        self.out_dir = out_dir
        self.stage = stage
        self.manifest = ShardManifest(os.path.join(out_dir, "_manifest.jsonl"))

    def shard_dir(self, shard_id: str) -> str:
        return os.path.join(self.out_dir, self.stage, f"shard={shard_id}")

    def _finished(self, sid: str, lineage: Callable[[str], str] | None) -> bool:
        """A shard is resumable-finished iff its manifest row exists,
        its directory exists, AND — when the caller describes lineage —
        the recorded lineage matches the CURRENT lineage string. A
        stale checkpoint written by different code/inputs re-runs
        instead of being silently reused."""
        if not self.manifest.done(self.stage, sid):
            return False
        if not os.path.isdir(self.shard_dir(sid)):
            return False
        if lineage is not None:
            rec = self.manifest._records[(self.stage, sid)]
            if rec.lineage != lineage(sid):
                return False
        return True

    def pending(
        self, shard_ids: Sequence[str], lineage: Callable[[str], str] | None = None
    ) -> list[str]:
        return [sid for sid in shard_ids if not self._finished(sid, lineage)]

    def run(
        self,
        shard_ids: Sequence[str],
        make_shard: Callable[[str], "object"],
        lineage: Callable[[str], str] | None = None,
        fail_after: int | None = None,
    ) -> dict:
        """Execute pending shards. ``fail_after`` aborts after N shards
        (test hook for kill/resume). Returns run stats."""
        ran, skipped = 0, 0
        for sid in shard_ids:
            if self._finished(sid, lineage):
                skipped += 1
                continue
            if fail_after is not None and ran >= fail_after:
                raise RuntimeError(f"injected failure after {ran} shards")
            t0 = time.perf_counter()
            ds = make_shard(sid)
            final = self.shard_dir(sid)
            tmp = final + ".tmp"
            if os.path.exists(tmp):
                shutil.rmtree(tmp)
            if os.path.exists(final):
                shutil.rmtree(final)  # partial output without manifest row
            ds.write_parquet(tmp)
            # gather metrics from the written files (cheap metadata scan)
            import pyarrow.dataset as pds

            written = pds.dataset(tmp, format="parquet")
            num_rows = written.count_rows()
            num_bytes = sum(
                os.path.getsize(os.path.join(root, fn))
                for root, _, files in os.walk(tmp)
                for fn in files
            )
            os.rename(tmp, final)
            self.manifest.record(
                ShardRecord(
                    stage=self.stage,
                    shard_id=sid,
                    lineage=lineage(sid) if lineage else "",
                    rows=num_rows,
                    num_bytes=num_bytes,
                    checksum=_table_checksum(num_rows, num_bytes, written.schema.names),
                    duration_s=round(time.perf_counter() - t0, 4),
                    finished_at=time.time(),
                )
            )
            ran += 1
        return {"ran": ran, "skipped": skipped}


def load_output(out_dir: str, stage: str, *, shard_ids=None):
    """Read a checkpointed stage's output back as one Dataset.

    ``shard_ids``: when given, read ONLY the ``shard=<id>`` directories
    of the current plan — shards orphaned by a plan change (e.g. a
    rerun with fewer shards over an existing out_dir) are excluded
    instead of silently duplicating rows."""
    import ray.data as rd

    base = os.path.join(out_dir, stage)
    if shard_ids is not None:
        roots = [os.path.join(base, f"shard={sid}") for sid in shard_ids]
    else:
        roots = [base]
    files = sorted(
        os.path.join(root, fn)
        for top in roots
        for root, _, fns in os.walk(top)
        for fn in fns
        if fn.endswith(".parquet")
    )
    return rd.read_parquet(files)


def write_partitioned(ds, path: str, key_col: str, *, num_buckets: int = 64):
    """Bucketed, resumable-friendly sink: adds ``bucket =
    splitmix64(key) % num_buckets`` and writes hive-partitioned parquet
    (one directory per bucket). A rerun over the same deterministic
    input rewrites whole buckets idempotently; combined with
    ``CheckpointedRunner`` it gives key-range-addressable outputs
    (SURVEY.md §4.3 "resumable output layout")."""
    import numpy as np
    import pyarrow as pa

    def add_bucket(t: "pa.Table") -> "pa.Table":
        col = t[key_col]
        if pa.types.is_integer(col.type):
            x = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        else:
            import zlib

            x = np.fromiter(
                (zlib.crc32(str(v).encode()) for v in col.to_pylist()),
                dtype=np.uint64,
                count=len(t),
            )
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        return t.append_column(
            "bucket", pa.array((x % np.uint64(num_buckets)).astype(np.int64))
        )

    ds.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
        path, partition_cols=["bucket"]
    )

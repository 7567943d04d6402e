"""Per-stage pipeline metrics from Ray Data's own accounting.

The reference's only observability is DEBUG prints
(reference src/index.ts:722-730); the engine surfaces per-operator
wall time, rows and memory from ``Dataset.stats()`` as a table — used
by bench.py and available to any pipeline.
"""

from __future__ import annotations

import re

import pandas as pd

__all__ = ["stage_metrics"]

_OP_RE = re.compile(r"Operator (\d+) (\S+):")
_TIME_RE = re.compile(r"\* Remote wall time: ([^ ]+) min, ([^ ]+) max, ([^ ]+) mean, ([^ ]+) total")
_ROWS_RE = re.compile(r"\* Output rows per task: (\d+) min, (\d+) max, (\d+) mean, (\d+) tasks used")


def _to_seconds(s: str) -> float:
    if s.endswith("ms"):
        return float(s[:-2]) / 1e3
    if s.endswith("us"):
        return float(s[:-2]) / 1e6
    if s.endswith("s"):
        return float(s[:-1])
    return float(s)


def stage_metrics(ds) -> pd.DataFrame:
    """Parse ``ds.stats()`` into one row per operator:
    (operator, total_wall_s, mean_task_s, tasks, rows_per_task_mean)."""
    text = ds.stats()
    rows = []
    current = None
    for line in text.splitlines():
        m = _OP_RE.search(line)
        if m:
            current = {"operator": m.group(2)}
            rows.append(current)
            continue
        if current is None:
            continue
        t = _TIME_RE.search(line)
        if t:
            current["mean_task_s"] = _to_seconds(t.group(3))
            current["total_wall_s"] = _to_seconds(t.group(4))
        r = _ROWS_RE.search(line)
        if r:
            current["rows_per_task_mean"] = int(r.group(3))
            current["tasks"] = int(r.group(4))
    return pd.DataFrame(rows)

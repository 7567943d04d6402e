"""Round-5 batch-34 operator tests: ABC inventory classification —
brute recompute at sf0.001 plus a value-skew property test (the
weighted-threshold recursion must resolve with no row pull even when
one value dominates)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _brute_abc(rev: np.ndarray):
    tot = int(rev.sum())
    t_a = (tot * 80 + 99) // 100
    t_b = (tot * 95 + 99) // 100
    vals = np.unique(rev)[::-1]
    sge = 0
    v_a = v_b = None
    for v in vals:
        sge += int(rev[rev == v].sum())
        if v_a is None and sge >= t_a:
            v_a = int(v)
        if v_b is None and sge >= t_b:
            v_b = int(v)
    cls = np.where(rev >= v_a, "A", np.where(rev >= v_b, "B", "C"))
    rows = []
    for c, thr in (("A", v_a), ("B", v_b), ("C", 0)):
        m = cls == c
        if m.sum():
            rows.append((c, int(m.sum()), int(rev[m].sum()), thr))
    return pd.DataFrame(
        rows, columns=["abc_class", "n_parts", "revenue_c", "threshold_c"]
    ).astype({"n_parts": np.int64, "revenue_c": np.int64, "threshold_c": np.int64})


def test_abc_classification_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import q_abc_classification

    got = q_abc_classification(SF).reset_index(drop=True)
    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_partkey", "l_extendedprice"]
    ).to_pandas()
    li["rev"] = np.rint(li["l_extendedprice"] * 100).astype(np.int64)
    pr = li.groupby("l_partkey")["rev"].sum().to_numpy(np.int64)
    want = _brute_abc(pr)
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want)


def test_abc_threshold_value_skew_resolves_exactly(ray_session):
    """10^5 copies of ONE revenue value: the recursion must bottom out
    at shift 0 and return that value with zero pulls."""
    import pyarrow as pa
    import ray.data as rd

    from simplepolygon_ray.relational.queries import _abc_threshold

    rev = np.full(100_000, 123_456, np.int64)
    rev[:5] = 999_999_999  # a few giants on top
    import tempfile, os

    d = tempfile.mkdtemp(prefix="abc_skew_")
    import pyarrow.parquet as pq_

    pq_.write_table(pa.table({"rev": pa.array(rev)}), os.path.join(d, "p.parquet"))
    tot = int(rev.sum())
    t_a = (tot * 80 + 99) // 100
    got = _abc_threshold(d, t_a)
    # brute
    vals = np.unique(rev)[::-1]
    sge, want = 0, None
    for v in vals:
        sge += int(rev[rev == v].sum())
        if sge >= t_a:
            want = int(v)
            break
    assert got == want == 123_456

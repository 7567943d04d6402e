"""Round-5 batch-12 operator tests: SCD2 interval algebra and the
linkage pattern histogram vs the blocking audit's pair totals."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_scd2_intervals_tile_and_alternate(ray_session):
    """Per user: intervals chain (valid_to == next valid_from), exactly
    one open current row, and consecutive states always differ."""
    from simplepolygon_ray.relational.queries import q_scd2_user_state_history

    df = (
        q_scd2_user_state_history(SF)
        .to_pandas()
        .sort_values(["user_id", "valid_from"], kind="mergesort")
        .reset_index(drop=True)
    )
    for uid, g in df.groupby("user_id"):
        vt = g["valid_to"].to_numpy(np.int64)
        vf = g["valid_from"].to_numpy(np.int64)
        st = g["state"].to_numpy()
        cur = g["is_current"].to_numpy(np.int64)
        assert (vt[:-1] == vf[1:]).all(), uid  # closed intervals chain
        assert vt[-1] == -1 and cur[-1] == 1 and (cur[:-1] == 0).all(), uid
        assert (st[1:] != st[:-1]).all(), uid  # runs collapsed


def test_linkage_pattern_total_equals_blocking_candidates(ray_session):
    """Σ n_pairs over patterns == Σ n_candidates of the blocking audit
    (same blocks, every candidate pair classified exactly once)."""
    from simplepolygon_ray.relational.queries import (
        q_blocking_candidates,
        q_linkage_agreement_patterns,
    )

    pats = q_linkage_agreement_patterns(SF).to_pandas()
    blocks = q_blocking_candidates(SF)
    if not isinstance(blocks, pd.DataFrame):
        blocks = blocks.to_pandas()
    assert int(pats["n_pairs"].sum()) == int(blocks["n_candidates"].sum())
    assert set(pats["pattern"]) <= set(range(8))

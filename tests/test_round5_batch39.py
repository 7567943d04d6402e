"""Round-5 batch-39 operator test: Merkle root of orders — brute
recompute at sf0.001 plus a single-row-flip sensitivity check."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _mix(a: int, b: int) -> int:
    x = (a + 3 * b + 0x9E3779B97F4A7C15) % (1 << 64)
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) % (1 << 64)
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) % (1 << 64)
    return x ^ (x >> 31)


def _root(k: np.ndarray, cents: np.ndarray) -> str:
    from simplepolygon_ray.relational.sketches import _hash64

    h = _hash64(k * np.int64(31) + cents)
    acc = np.zeros(64, np.uint64)
    np.add.at(acc, (k % 64).astype(np.int64), h)
    level = [int(x) for x in acc]
    while len(level) > 1:
        level = [_mix(level[i], level[i + 1]) for i in range(0, len(level), 2)]
    return str(level[0])


def test_merkle_root_orders_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import q_merkle_root_orders

    got = q_merkle_root_orders(SF)
    od = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    ).to_pandas()
    k = od["o_orderkey"].to_numpy(np.int64)
    cents = np.rint(od["o_totalprice"] * 100).astype(np.int64).to_numpy()
    assert got["root"][0] == _root(k, cents)
    assert got["n_rows"][0] == len(od)
    assert got["n_leaves"][0] == 64
    # single-row flip sensitivity: +1 cent on one row changes the root
    cents2 = cents.copy()
    cents2[0] += 1
    assert _root(k, cents2) != got["root"][0]

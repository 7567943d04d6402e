"""Text analysis operators for large-scale training-data pipelines.

All are stateless, vectorized batch kernels (compiled regexes are
module-level constants — setup cost is paid at import, once per worker
process, not per batch):

- ``langid_batch``: character-n-gram heuristic language ID;
- ``quality_batch``: length / punctuation / stopword-ratio scoring;
- ``token_count_batch``: whitespace + BPE-ish regex token counts;
- ``fingerprint_batch``: 64-bit rolling-hash document fingerprint.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

__all__ = [
    "langid_batch",
    "quality_batch",
    "token_count_batch",
    "fingerprint_batch",
]

_WORD_RE = re.compile(r"\w+", re.UNICODE)
# BPE-ish segmentation: word pieces, numbers, punctuation runs
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")
_PUNCT_RE = re.compile(r"[^\w\s]")

_STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "that", "for"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "es", "los"},
    "de": {"der", "die", "das", "und", "ist", "von", "den", "ein", "eine", "mit"},
    "fr": {"le", "la", "les", "de", "et", "est", "un", "une", "des", "dans"},
}

# characteristic letter-pair frequencies per language (tiny static model)
_LANG_BIGRAMS = {
    "en": {"th", "he", "in", "er", "an", "re", "on", "at", "en", "nd"},
    "es": {"de", "en", "el", "la", "os", "es", "ar", "ue", "ra", "as"},
    "de": {"en", "er", "ch", "de", "ei", "ie", "in", "te", "nd", "ge"},
    "fr": {"es", "le", "de", "en", "re", "nt", "on", "ou", "ai", "it"},
}


_LANG_ORDER = list(_LANG_BIGRAMS)  # dict order = scalar tie-break order


def _bigram_scores(text: str) -> str:
    t = re.sub(r"[^a-z ]", "", text.lower())
    bigs = [t[i : i + 2] for i in range(len(t) - 1) if " " not in t[i : i + 2]]
    if not bigs:
        return "und"
    best_lang, best = "und", -1.0
    n = len(bigs)
    for lang, marks in _LANG_BIGRAMS.items():
        score = sum(1 for b in bigs if b in marks) / n
        # stopword evidence dominates when present
        words = set(t.split())
        score += 0.5 * len(words & _STOPWORDS.get(lang, set()))
        if score > best:
            best, best_lang = score, lang
    return best_lang


def langid_batch(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Vectorized language ID: per-language evidence comes from ~10
    ``str.count``/``str.contains`` passes over the whole column instead
    of a per-document Python bigram loop. Output is identical to the
    scalar ``_bigram_scores`` (integer evidence counts, same division,
    same first-wins tie-break)."""
    batch = batch.copy()
    s = batch[text_col].fillna("").astype(str)
    t = s.str.lower().str.replace(r"[^a-z ]", "", regex=True)
    # letter-letter bigram positions (overlapping) = scalar's len(bigs)
    n = t.str.count(r"(?=[a-z][a-z])").to_numpy(np.float64)
    scores = np.empty((len(_LANG_ORDER), len(s)))
    for li, lang in enumerate(_LANG_ORDER):
        c = np.zeros(len(s))
        for b in _LANG_BIGRAMS[lang]:
            c += t.str.count(f"(?={b})").to_numpy(np.float64)
        stop = np.zeros(len(s))
        for w in _STOPWORDS.get(lang, set()):
            stop += t.str.contains(rf"\b{w}\b", regex=True).to_numpy(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            scores[li] = np.where(n > 0, c / np.maximum(n, 1.0), -1.0) + 0.5 * stop
    pick = np.argmax(scores, axis=0)  # first max, as in the scalar loop
    langs = np.asarray(_LANG_ORDER, object)[pick]
    batch["lang_pred"] = np.where(n > 0, langs, "und")
    return batch


def quality_batch(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    s = batch[text_col].fillna("")
    n_chars = s.str.len().to_numpy(np.float64)
    n_words = s.str.count(r"\w+").to_numpy(np.float64)
    n_punct = s.str.count(r"[^\w\s]").to_numpy(np.float64)
    n_stop = s.str.count(
        r"\b(?:the|and|of|a|to|in|is|it|that|for)\b"
    ).to_numpy(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        mean_word_len = np.where(n_words > 0, (n_chars - n_words + 1) / np.maximum(n_words, 1), 0.0)
        punct_ratio = np.where(n_chars > 0, n_punct / np.maximum(n_chars, 1), 0.0)
        stop_ratio = np.where(n_words > 0, n_stop / np.maximum(n_words, 1), 0.0)
    # simple composite in [0,1]: enough words, sane word length,
    # not punctuation soup, some stopword mass
    score = (
        0.25 * np.clip(n_words / 50.0, 0, 1)
        + 0.25 * np.clip(1.0 - np.abs(mean_word_len - 5.0) / 5.0, 0, 1)
        + 0.25 * np.clip(1.0 - punct_ratio * 5.0, 0, 1)
        + 0.25 * np.clip(stop_ratio * 5.0, 0, 1)
    )
    out = batch.copy()
    out["n_words"] = n_words.astype(np.int64)
    out["punct_ratio"] = punct_ratio
    out["stop_ratio"] = stop_ratio
    out["quality"] = score
    return out


def token_count_batch(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    s = batch[text_col].fillna("")
    out = pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_ws_tokens": s.str.count(r"\S+").astype(np.int64),
            "n_bpeish_tokens": s.str.count(_BPE_RE.pattern).astype(np.int64),
        }
    )
    return out


def _rolling_fnv64(tokens: list[str]) -> int:
    h = 0xCBF29CE484222325
    for t in tokens:
        for ch in t.encode():
            h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        h = (h * 31 + 7) & 0xFFFFFFFFFFFFFFFF
    return h


def _rolling_fnv64_docs(texts: list[str]) -> np.ndarray:
    """Vectorized ``_rolling_fnv64`` over many documents: each doc's
    token stream becomes one byte string with a 0x00 marker after each
    token (UTF-8 word chars never encode to 0x00), and the chain
    iterates over byte positions with full-width numpy ops."""
    from ._hash import FNV_OFFSET, FNV_PRIME, byte_matrix

    streams = [
        b"".join(tok.encode() + b"\x00" for tok in _WORD_RE.findall(t.lower()))
        for t in texts
    ]
    mat, mask = byte_matrix(streams)
    h = np.full(len(texts), FNV_OFFSET, np.uint64)
    t31, t7 = np.uint64(31), np.uint64(7)
    for pos in range(mat.shape[1]):
        b = mat[:, pos]
        nh = np.where(b == 0, h * t31 + t7, (h ^ b.astype(np.uint64)) * FNV_PRIME)
        h = np.where(mask[:, pos], nh, h)
    return h


def fingerprint_batch(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    s = batch[text_col].fillna("")
    fp = _rolling_fnv64_docs(list(s)).astype(np.int64)
    return pd.DataFrame({"doc_id": batch["doc_id"], "fingerprint": pd.array(fp, dtype="int64")})

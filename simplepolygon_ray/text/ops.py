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
    batch = batch.copy()
    batch["lang_pred"] = [_bigram_scores(t or "") for t in batch[text_col]]
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
            "n_bpeish_tokens": s.map(lambda t: len(_BPE_RE.findall(t))).astype(np.int64),
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


def fingerprint_batch(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    s = batch[text_col].fillna("")
    fp = [
        int(np.uint64(_rolling_fnv64(_WORD_RE.findall(t.lower()))).astype(np.int64))
        for t in s
    ]
    return pd.DataFrame({"doc_id": batch["doc_id"], "fingerprint": pd.array(fp, dtype="int64")})

"""Text-analysis stages for training-data pipelines (SURVEY addendum):
language-ID, quality scoring, token counting, document fingerprinting.

All are vectorized map_batches fns over a ``text`` column; the language
model / stopword tables are module-level constants compiled once per
worker process (no per-batch setup).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from cocrawler_ray.hashing import hash64, splitmix64

_WS = re.compile(r"\s+")

# tiny n-gram/stopword language profiles (public-knowledge heuristic)
_LANG_STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "for", "on"},
    "de": {"der", "die", "das", "und", "ist", "ein", "nicht", "mit", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "pas", "pour"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "no", "para"},
}


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """n_tokens = whitespace-delimited token count (matches SQL
    length(regexp_split_to_array(trim(text),'\\s+')))."""
    texts = batch.column(text_col).to_pylist()
    n = np.array([len(t.split()) if t and t.strip() else 0 for t in texts], dtype=np.int64)
    return batch.append_column("n_tokens", pa.array(n))


def quality_score_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Length / whitespace / mean-token-length quality signals."""
    texts = batch.column(text_col).to_pylist()
    length = np.array([len(t) for t in texts], dtype=np.int64)
    n_spaces = np.array([t.count(" ") for t in texts], dtype=np.int64)
    nonspace = np.array([len(t.replace(" ", "")) for t in texts], dtype=np.int64)
    n_tokens = np.array([len(t.split()) for t in texts], dtype=np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        avg_tok = np.where(n_tokens > 0, nonspace / np.maximum(n_tokens, 1), 0.0)
    return (batch
            .append_column("len", pa.array(length))
            .append_column("n_spaces", pa.array(n_spaces))
            .append_column("avg_token_len", pa.array(np.round(avg_tok, 6))))


def langid_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Stopword-vote language ID; 'und' when no profile scores."""
    texts = batch.column(text_col).to_pylist()
    preds = []
    for t in texts:
        toks = set(w.lower() for w in _WS.split(t)[:200])
        best, best_n = "und", 0
        for lang, sw in _LANG_STOPWORDS.items():
            n = len(toks & sw)
            if n > best_n:
                best, best_n = lang, n
        preds.append(best)
    return batch.append_column("lang_pred", pa.array(preds, pa.string()))


def fingerprint_batch(batch: pa.Table, text_col: str = "text", k: int = 5,
                      window: int = 8) -> pa.Table:
    """Winnowing-style document fingerprint: min-of-window over rolling
    k-gram token hashes, xor-folded to one uint64 per document.

    (Schleimer et al., "Winnowing: Local Algorithms for Document
    Fingerprinting", SIGMOD 2003 — public algorithm.)"""
    texts = batch.column(text_col).to_pylist()
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        toks = t.split()
        if len(toks) < k:
            out[i] = hash64([t])[0] if t else np.uint64(0)
            continue
        grams = [" ".join(toks[j:j + k]) for j in range(len(toks) - k + 1)]
        h = hash64(grams)
        if len(h) <= window:
            out[i] = h.min()
        else:
            mins = pd.Series(h).rolling(window).min().dropna().to_numpy(dtype=np.uint64)
            fp = np.uint64(0)
            for m in np.unique(mins):
                fp ^= splitmix64(np.array([m], dtype=np.uint64))[0]
            out[i] = fp
    return batch.append_column("fingerprint", pa.array(out, pa.uint64()))

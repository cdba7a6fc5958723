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

from cocrawler_ray.hashing import splitmix64

_WS = re.compile(r"\s+")
# RE2/DuckDB \s spelled out as the ASCII class (Python \s is unicode-wide;
# the oracle's regexp_split_to_array('\s+') is RE2) — every query whose
# SQL mirror tokenizes on \s+ must split with THIS pattern, not _WS.
WS_ASCII = re.compile(r"[\t\n\f\r ]+")

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
    """Stopword-vote language ID; 'und' when no profile scores.

    Vote = number of DISTINCT profile stopwords among the doc's first 200
    tokens; argmax over profiles in declaration order (strict-greater, so
    ties keep the earlier profile and zero votes stay 'und'). The per-doc
    set intersection over <=200 tokens IS the fast form here (~18 µs/doc);
    a hash-all-tokens vectorization was measured 2.4x slower."""
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
    k-gram token hashes, distinct window-mins xor-folded (splitmix64) to
    one uint64 per document. Docs with <= window shingles fingerprint to
    their min shingle hash; empty docs to 0.

    (Schleimer et al., "Winnowing: Local Algorithms for Document
    Fingerprinting", SIGMOD 2003 — public algorithm.)

    Fully batch-vectorized: shingles come from the shared
    ``shingle_hash_batch`` kernel (one hash call for the whole batch),
    window minima from one ``sliding_window_view`` pass over the
    concatenated shingle array with per-doc valid ranges gathered out,
    and the distinct-xor fold from a (doc, min) lexsort + reduceat. The
    previous per-doc loop (one pd rolling + one hash64 call per doc,
    ~550 µs/doc) was the slowest text kernel."""
    from numpy.lib.stride_tricks import sliding_window_view

    from cocrawler_ray.hashing import concat_ranges, shingle_hash_batch

    texts = batch.column(text_col).to_pylist()
    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    sh, counts = shingle_hash_batch(texts, k)
    offs = np.cumsum(counts) - counts
    nz = counts > 0
    if nz.any():
        # per-doc overall min (reduceat over nonzero docs is contiguous:
        # zero-count docs contribute no shingles)
        doc_min = np.zeros(n, dtype=np.uint64)
        doc_min[nz] = np.minimum.reduceat(sh, offs[nz])
        small = nz & (counts <= window)
        out[small] = doc_min[small]
    big = counts > window
    if big.any():
        gmins = sliding_window_view(sh, window).min(axis=1)
        wcounts = counts[big] - window + 1
        wmins = gmins[concat_ranges(offs[big], wcounts)]
        wdoc = np.repeat(np.flatnonzero(big), wcounts)
        order = np.lexsort((wmins, wdoc))
        wd, wm = wdoc[order], wmins[order]
        keep = np.concatenate(([True], (wd[1:] != wd[:-1]) | (wm[1:] != wm[:-1])))
        wd, wm = wd[keep], wm[keep]
        doc_starts = np.flatnonzero(
            np.concatenate(([True], wd[1:] != wd[:-1])))
        out[wd[doc_starts]] = np.bitwise_xor.reduceat(splitmix64(wm), doc_starts)
    return batch.append_column("fingerprint", pa.array(out, pa.uint64()))


def winnow_grams_batch(batch: pa.Table, text_col: str = "text",
                       id_col: str = "doc_id", k: int = 5,
                       window: int = 8) -> pa.Table:
    """Exploded winnowing selection: one (id, gram) row per DISTINCT
    window-min k-gram hash a document selects — the same selection rule
    as :func:`fingerprint_batch` (Schleimer et al. winnowing) but WITHOUT
    the per-doc fold, so documents can be PAIRED on shared selected
    grams (MOSS-style overlap detection). Docs with 0 < shingles <=
    window select their single overall min; empty docs select nothing.
    Vectorization identical to fingerprint_batch (shared shingle kernel,
    one sliding-window pass, lexsort dedup)."""
    from numpy.lib.stride_tricks import sliding_window_view

    from cocrawler_ray.hashing import concat_ranges, shingle_hash_batch

    texts = batch.column(text_col).to_pylist()
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    sh, counts = shingle_hash_batch(texts, k)
    offs = np.cumsum(counts) - counts
    out_d: list[np.ndarray] = []
    out_m: list[np.ndarray] = []
    nz = counts > 0
    small = nz & (counts <= window)
    if small.any():
        doc_min = np.minimum.reduceat(sh, offs[small])
        out_d.append(ids[small])
        out_m.append(doc_min)
    big = counts > window
    if big.any():
        gmins = sliding_window_view(sh, window).min(axis=1)
        wcounts = counts[big] - window + 1
        wmins = gmins[concat_ranges(offs[big], wcounts)]
        wdoc = np.repeat(np.flatnonzero(big), wcounts)
        order = np.lexsort((wmins, wdoc))
        wd, wm = wdoc[order], wmins[order]
        keep = np.concatenate(
            ([True], (wd[1:] != wd[:-1]) | (wm[1:] != wm[:-1])))
        out_d.append(ids[wd[keep]])
        out_m.append(wm[keep])
    if not out_d:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "gram": pa.array([], pa.int64())})
    return pa.table({
        id_col: pa.array(np.concatenate(out_d), pa.int64()),
        "gram": pa.array(np.concatenate(out_m).view(np.int64), pa.int64())})


def _distinct_ngrams(texts: list[str], n: int = 3):
    """Per-doc DISTINCT word n-grams: (doc_idx int64[], gram unicode[]).

    One np.char.add chain per doc over the token array (the q_bigrams
    measured shape); docs shorter than n tokens contribute nothing.
    """
    idxs, grams = [], []
    for i, txt in enumerate(texts):
        toks = txt.split()
        if len(toks) < n:
            continue
        a = np.asarray(toks)
        g = a[: len(toks) - n + 1]
        for j in range(1, n):
            g = np.char.add(np.char.add(g, " "), a[j: len(toks) - n + j + 1])
        u = np.unique(g)
        idxs.append(np.full(len(u), i, dtype=np.int64))
        grams.append(u)
    if not idxs:
        return np.array([], np.int64), np.array([], dtype="U1")
    return np.concatenate(idxs), np.concatenate(grams)


class ContaminationCheck:
    """Actor-pool decontamination stage: count each document's DISTINCT
    word n-grams that appear in a broadcast benchmark shingle set (the
    standard eval-set-decontamination gate for training corpora).

    The benchmark set is small by contract (held-out eval suites, not the
    corpus); it is passed BY VALUE in the constructor kwargs and sorted
    ONCE per actor here in ``__init__`` — per batch, membership is a
    vectorized searchsorted against the sorted array. Emits
    (id_col, n_hits) for hit docs only, so clean documents never leave
    the scan. (By value, not an ObjectRef: Ray Data sets max_restarts on
    pool actors, and constructor args living in the object store break
    actor restart — ray#53727.)
    """

    def __init__(self, bench=None, n: int = 3, id_col: str = "doc_id",
                 text_col: str = "text", bench_path: str | None = None,
                 holdout_mod: int = 50):
        import ray
        if bench is None:
            # production shape: each actor loads the benchmark suite from
            # shared storage ONCE in init — constructor kwargs stay a few
            # bytes (a path), below Ray's inline threshold, so Ray Data
            # never spills them to the object store (the ray#53727
            # restart hazard) and the driver never gathers the grams
            import pyarrow.parquet as pq
            t = pq.read_table(bench_path, columns=[id_col, text_col])
            keep = t.column(id_col).to_numpy() % holdout_mod == 0
            _, grams = _distinct_ngrams(
                t.filter(pa.array(keep)).column(text_col).to_pylist(), n)
            bench = np.unique(grams)
        elif isinstance(bench, ray.ObjectRef):  # legacy callers
            bench = ray.get(bench)
        self._bench = np.sort(np.asarray(bench))
        self._n = n
        self._id_col = id_col
        self._text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self._id_col).to_numpy()
        texts = batch.column(self._text_col).to_pylist()
        di, grams = _distinct_ngrams(texts, self._n)
        n_hits = np.zeros(len(ids), dtype=np.int64)
        if len(grams) and len(self._bench):
            pos = np.searchsorted(self._bench, grams)
            pos = np.minimum(pos, len(self._bench) - 1)
            hit = self._bench[pos] == grams
            np.add.at(n_hits, di[hit], 1)
        keep = n_hits > 0
        return pa.table({self._id_col: pa.array(ids[keep]),
                         "n_hits": pa.array(n_hits[keep])})


def repetition_stats_batch(df, id_col: str = "doc_id",
                           text_col: str = "text"):
    """Gopher-style repetition signals per document: token count, distinct
    -token ratio, and the fraction of tokens taken by the single most
    frequent token; ``keep_doc`` applies the classic repetition gate
    (distinct_ratio >= 0.3 AND top_tok_frac <= 0.2).

    Vectorized: all docs' tokens concatenate into one (doc, token) frame,
    counted with two C-path pandas groupbys — no per-token Python.
    (Rae et al., "Scaling Language Models: ... Gopher", 2021 — public
    repetition-filter heuristics.)
    """
    import pandas as pd
    ids = df[id_col].to_numpy()
    toks_per_doc = [t.split() for t in df[text_col].to_numpy()]
    lens = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
    nz = lens > 0
    if not nz.any():
        return pd.DataFrame({id_col: np.array([], np.int64),
                             "n_tok": np.array([], np.int64),
                             "distinct_ratio": np.array([], np.float64),
                             "top_tok_frac": np.array([], np.float64),
                             "keep_doc": np.array([], np.int64)})
    di = np.repeat(ids, lens)
    words = np.concatenate([np.asarray(t, dtype=object)
                            for t in toks_per_doc if t])
    cnt = (pd.DataFrame({"d": di, "w": words})
           .groupby(["d", "w"], sort=False, observed=True).size()
           .rename("c").reset_index())
    st = cnt.groupby("d", sort=False, observed=True)["c"].agg(
        n_tok="sum", n_distinct="count", top_c="max").reset_index()
    n_tok = st["n_tok"].to_numpy().astype(np.int64)
    dr = st["n_distinct"].to_numpy() / n_tok
    tf = st["top_c"].to_numpy() / n_tok
    return pd.DataFrame({
        id_col: st["d"].to_numpy().astype(np.int64),
        "n_tok": n_tok,
        "distinct_ratio": np.round(dr, 6),
        "top_tok_frac": np.round(tf, 6),
        "keep_doc": ((dr >= 0.3) & (tf <= 0.2)).astype(np.int64)})


_NON_ALNUM = re.compile(r"[^a-z0-9\s]")


def normalize_text_batch(batch: pa.Table, text_col: str = "text",
                         out_col: str = "norm") -> pa.Table:
    """Canonical text normalization for dedup/tokenization pre-passes:
    lowercase, strip non-alphanumerics to spaces, collapse all whitespace
    runs to single spaces, trim. Appends ``out_col`` and ``norm_len``."""
    texts = batch.column(text_col).to_pylist()
    norm = [" ".join(_NON_ALNUM.sub(" ", t.lower()).split()) if t else ""
            for t in texts]
    lens = np.array([len(s) for s in norm], dtype=np.int64)
    return (batch.append_column(out_col, pa.array(norm, pa.string()))
            .append_column("norm_len", pa.array(lens)))


def levenshtein(a: str, b: str) -> int:
    """Edit distance with a row-vectorized DP: the column-wise dependency
    ``cur[j] = min(..., cur[j-1]+1)`` folds into one
    ``np.minimum.accumulate`` over ``base[j] - j`` (min over k<=j of
    base[k] + (j-k) == j + running-min of base[k]-k), so each DP row is
    pure numpy — no per-cell Python."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    bv = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    m = len(bv)
    j = np.arange(m + 1, dtype=np.int64)
    prev = j.copy()
    for i, ca in enumerate(a, 1):
        cost = (bv != np.uint32(ord(ca))).astype(np.int64)
        base = np.concatenate((
            [np.int64(i)],
            np.minimum(prev[1:] + 1, prev[:-1] + cost)))
        prev = np.minimum.accumulate(base - j) + j
    return int(prev[-1])


_JSON_INT_RES: dict = {}


def json_extract_int_batch(batch: pa.Table, col: str, key: str,
                           out_col: str) -> pa.Table:
    """Extract an integer field from a JSON-string column. Fast path: one
    compiled regex over the batch (covers the flat `{"key": 123}` shapes
    crawl-log props actually take); rows the regex misses fall back to a
    real ``json.loads`` so nested/escaped documents stay correct."""
    import json as _json
    import re
    rx = _JSON_INT_RES.get(key)
    if rx is None:
        rx = _JSON_INT_RES[key] = re.compile(
            r'"%s"\s*:\s*(-?\d+)(?=\s*[,}])' % re.escape(key))
    vals = batch.column(col).to_pylist()
    out = np.empty(len(vals), dtype=np.float64)
    for i, s in enumerate(vals):
        # the regex is only trusted on FLAT, escape-free documents — a
        # nested object could carry the key below the top level, where
        # $.key semantics say null
        m = (rx.search(s) if s and s.count("{") == 1 and "\\" not in s
             else None)
        if m is not None:
            out[i] = float(m.group(1))
        elif s:
            v = _json.loads(s).get(key)
            out[i] = float(v) if isinstance(v, int) else np.nan
        else:
            out[i] = np.nan
    mask = np.isnan(out)
    arr = pa.array(out.astype(np.int64), pa.int64(),
                   mask=mask if mask.any() else None)
    return batch.append_column(out_col, arr)


def regex_extract_all_batch(batch: pa.Table, pattern: str,
                            id_col: str = "doc_id",
                            text_col: str = "text") -> pa.Table:
    """Flat-map every non-overlapping leftmost match of ``pattern`` out of
    ``text_col``: one output row per match, (id, ord, tok) with ``ord``
    the 1-based match ordinal within the document. The regex compiles
    once per process (module-level cache) and must stay ASCII-class-only
    and lookaround-free so Python ``re`` and RE2-style engines (DuckDB
    ``regexp_extract_all``) agree on the match set — the q_pii_redact
    restatability rule. Per-document ``finditer`` is inherent to global
    regex scanning (no Arrow extract-all kernel exists); the loop body is
    a single C-level scan per document."""
    rx = _EXTRACT_RES.get(pattern)
    if rx is None:
        rx = _EXTRACT_RES[pattern] = re.compile(pattern)
    ids_in = batch.column(id_col).to_numpy()
    ids, ords, toks = [], [], []
    for d, s in zip(ids_in, batch.column(text_col).to_pylist()):
        ms = rx.findall(s or "")
        ids.extend([d] * len(ms))
        ords.extend(range(1, len(ms) + 1))
        toks.extend(ms)
    return pa.table({id_col: pa.array(ids, pa.int64()),
                     "ord": pa.array(ords, pa.int64()),
                     "tok": pa.array(toks, pa.string())})


_EXTRACT_RES: dict[str, "re.Pattern"] = {}


# ---------------------------------------------------------------------------
# PII redaction + document chunking (training-corpus preprocessing)
# ---------------------------------------------------------------------------

# compiled once at import (shared by every task; no per-batch setup).
# Patterns stay lookaround-free so behavior is restatable analytically.
_PII_EMAIL = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
_PII_IPV4 = re.compile(r"\b(?:\d{1,3}\.){3}\d{1,3}\b")
_PII_PHONE = re.compile(r"\b\d{3}[- .]\d{3,4}\b")


def pii_redact_batch(df, text_col: str = "text"):
    """Detect + redact emails / IPv4 addresses / phone-shaped numbers —
    the standard pre-training privacy scrub. Order matters: emails first
    (their domains contain dots that would half-match the IP pattern),
    then IPs (dotted quads would otherwise match the phone pattern),
    then phones. Emits per-doc counts and the redacted text."""
    import pandas as pd
    texts = df[text_col].to_numpy()
    n_email = np.zeros(len(texts), dtype=np.int64)
    n_ip = np.zeros(len(texts), dtype=np.int64)
    n_phone = np.zeros(len(texts), dtype=np.int64)
    red = []
    for i, t in enumerate(texts):
        t, n_email[i] = _PII_EMAIL.subn("<EMAIL>", t)
        t, n_ip[i] = _PII_IPV4.subn("<IP>", t)
        t, n_phone[i] = _PII_PHONE.subn("<PHONE>", t)
        red.append(t)
    out = df.drop(columns=[text_col]).reset_index(drop=True)
    return out.assign(n_email=n_email, n_ip=n_ip, n_phone=n_phone,
                      redacted=pd.Series(red, dtype=object))


def chunk_docs_batch(df, window: int = 32, stride: int = 24,
                     id_col: str = "doc_id", text_col: str = "text"):
    """Fixed-token-window chunking with overlap (window - stride tokens),
    the standard context-length packing precursor: each document expands
    to ceil(n_tok / stride) chunks starting at 0, stride, 2*stride, ...
    Chunking is per-document by construction (documents are rows), so the
    expansion happens entirely inside the scan — no shuffle at any scale."""
    import pandas as pd
    ids_out, cid_out, start_out, ntok_out, chunks = [], [], [], [], []
    for did, txt in zip(df[id_col].to_numpy(), df[text_col].to_numpy()):
        toks = txt.split()
        if not toks:
            continue
        for ci, s in enumerate(range(0, len(toks), stride)):
            piece = toks[s:s + window]
            ids_out.append(did)
            cid_out.append(ci)
            start_out.append(s)
            ntok_out.append(len(piece))
            chunks.append(" ".join(piece))
    return pd.DataFrame({
        id_col: np.asarray(ids_out, dtype=np.int64),
        "chunk_id": np.asarray(cid_out, dtype=np.int64),
        "start_tok": np.asarray(start_out, dtype=np.int64),
        "n_tok": np.asarray(ntok_out, dtype=np.int64),
        "chunk": pd.Series(chunks, dtype=object)})


_CLS_STOPWORDS = frozenset(
    ("the", "a", "of", "to", "and", "in", "is", "it"))
# fixed linear-model weights (a stand-in for a trained fastText/logreg
# quality classifier — the 100 TB pipeline swaps these for learned ones;
# the Ray plumbing, feature extraction, and gate are the real operator):
# score = b + w_n*n_tokens + w_t*ttr + w_l*avg_len + w_s*stop_ratio
_CLS_W = (-3.0, 0.004, 2.0, 0.35, 4.0)


def token_entropy_batch(df, id_col: str = "doc_id",
                        text_col: str = "text"):
    """Per-document unigram (token) Shannon entropy, a standard corpus
    quality / repetitiveness signal (low entropy => boilerplate or
    degenerate repetition; cf. the Gopher repetition rules this engine
    implements in ``repetition_stats_batch``).

    Per-document by construction, so the whole operator is one streaming
    scan at any corpus size. The per-doc ``np.unique`` over its tokens is
    the measured-fast form at ~100-token docs (same finding as
    ``_doc_terms``: a global hash-all-tokens vectorization pays more in
    object-array churn than it saves). Empty docs are skipped, mirroring
    the oracle's ``trim(text) <> ''`` filter."""
    import pandas as pd
    ids = df[id_col].to_numpy()
    out_id, out_n, out_e = [], [], []
    for i, txt in enumerate(df[text_col].to_numpy()):
        toks = txt.split()
        if not toks:
            continue
        _, counts = np.unique(np.asarray(toks, dtype=object),
                              return_counts=True)
        p = counts / counts.sum()
        out_id.append(ids[i])
        out_n.append(len(toks))
        out_e.append(float(-(p * np.log2(p)).sum()))
    return pd.DataFrame({
        id_col: np.asarray(out_id, dtype=np.int64),
        "n_tokens": np.asarray(out_n, dtype=np.int64),
        "entropy": np.round(np.asarray(out_e, dtype=np.float64), 6)})



def round_half_away(x: np.ndarray, decimals: int) -> np.ndarray:
    """DuckDB-compatible round: half AWAY from zero (np.round is half to
    even, which disagrees whenever the scaled value lands exactly on .5 —
    reachable here because the features are small-denominator rationals)."""
    m = 10.0 ** decimals
    s = x * m
    return np.trunc(s + np.copysign(0.5, s)) / m

def quality_classifier_batch(df, id_col: str = "doc_id",
                             text_col: str = "text"):
    """Linear quality-classifier scoring + gate: extract per-doc features
    (token count, type-token ratio, mean token length, stopword ratio),
    apply a broadcast weight vector, and emit the raw score plus a 0/1
    keep label (score > 0). This is the model-scoring representative of
    the curation surface: at 100 TB the weights come from a trained
    classifier shipped once per actor; here they are fixed constants so
    the DuckDB oracle can restate the identical arithmetic.

    The score is computed in the same left-associated double-precision
    order as the SQL mirror, so values (rounded to 6) hash-match."""
    import pandas as pd
    b, wn, wt, wl, ws = _CLS_W
    ids = df[id_col].to_numpy()
    out = {"doc_id": [], "n_tokens": [], "ttr": [], "avg_len": [],
           "stop_ratio": [], "score": [], "keep": []}
    for i, txt in enumerate(df[text_col].to_numpy()):
        toks = txt.split()
        if not toks:
            continue
        n = len(toks)
        ttr = len(set(toks)) / n
        avg_len = sum(map(len, toks)) / n
        stop = sum(t in _CLS_STOPWORDS for t in toks) / n
        score = b + wn * n + wt * ttr + wl * avg_len + ws * stop
        out["doc_id"].append(ids[i])
        out["n_tokens"].append(n)
        out["ttr"].append(ttr)
        out["avg_len"].append(avg_len)
        out["stop_ratio"].append(stop)
        out["score"].append(score)
        out["keep"].append(1 if score > 0 else 0)
    return pd.DataFrame({
        id_col: np.asarray(out["doc_id"], dtype=np.int64),
        "n_tokens": np.asarray(out["n_tokens"], dtype=np.int64),
        "ttr": round_half_away(np.asarray(out["ttr"], dtype=np.float64), 6),
        "avg_len": round_half_away(
            np.asarray(out["avg_len"], dtype=np.float64), 6),
        "stop_ratio": round_half_away(
            np.asarray(out["stop_ratio"], dtype=np.float64), 6),
        "score": round_half_away(
            np.asarray(out["score"], dtype=np.float64), 6),
        "keep": np.asarray(out["keep"], dtype=np.int64)})


def unigram_lp_micro(terms, counts):
    """Quantize a corpus unigram LM to integer micro-nats.

    Given the corpus term-count table (the same O(vocabulary) combiner
    output TF-IDF broadcasts), compute add-one-smoothed log-probs
    ``ln((c + 1) / (total + V))`` and round them half-away-from-zero to
    integer micro-nats. Integer quantization makes every downstream
    per-document sum order-independent and therefore restatable exactly
    in SQL (the q_fingerprint / sketch-row pattern). Returns
    ``(sorted_terms, lp_micro_int64)`` ready for ``np.searchsorted``.

    Scale: the table is vocabulary-sized (bounded by construction at
    100 TB via top-V truncation, same assumption as TF-IDF's idf map);
    it broadcasts once via ``ray.put``."""
    terms = np.asarray(terms, dtype=object)
    c = np.asarray(counts, dtype=np.float64)
    total = float(c.sum())
    v = float(len(c))
    lp = np.log((c + 1.0) / (total + v)) * 1e6
    order = np.argsort(terms)
    return terms[order], round_half_away(lp, 0).astype(np.int64)[order]


def perplexity_batch(df, lm_ref, threshold: float,
                     id_col: str = "doc_id", text_col: str = "text"):
    """CCNet-style perplexity gate: score each document under a corpus
    unigram LM (broadcast as integer micro-nat log-probs) and keep docs
    whose perplexity is below ``threshold``.

    Fully vectorized: the batch's tokens concatenate into one array, one
    ``searchsorted`` against the broadcast vocabulary maps them to
    integer log-probs, and ``np.add.reduceat`` folds them back to
    per-document negative-log-likelihood sums — exact integers, so the
    DuckDB oracle reproduces them bit-for-bit regardless of partitioning.
    One streaming scan; the LM rides the object store (ray.put once).

    Mirrors cocrawler's content-quality gating hook (SURVEY §2 M6) in
    the form modern curation pipelines use (CCNet / Gopher ppl filters)."""
    import pandas as pd
    import ray
    vocab, lp = ray.get(lm_ref) if not isinstance(lm_ref, tuple) else lm_ref
    ids = df[id_col].to_numpy()
    doc_toks, doc_ids, lens = [], [], []
    for i, txt in enumerate(df[text_col].to_numpy()):
        toks = txt.split()
        if not toks:
            continue
        doc_toks.append(np.asarray(toks, dtype=object))
        doc_ids.append(ids[i])
        lens.append(len(toks))
    if not doc_ids:
        return pd.DataFrame({
            id_col: np.array([], np.int64),
            "n_tokens": np.array([], np.int64),
            "nll_micro": np.array([], np.int64),
            "ppl": np.array([], np.float64),
            "keep": np.array([], np.int64)})
    all_toks = np.concatenate(doc_toks)
    if not len(vocab):  # scoring against an empty LM: everything is OOV
        tok_lp = np.full(len(all_toks), _OOV_LP_FLOOR, dtype=np.int64)
        oov = np.zeros(len(all_toks), dtype=bool)
    else:
        idx = np.searchsorted(vocab, all_toks)
        idx = np.clip(idx, 0, len(vocab) - 1)
        tok_lp = lp[idx]
        oov = vocab[idx] != all_toks
    if oov.any():  # OOV (scoring a foreign corpus): add-one floor
        tok_lp = np.where(oov, np.int64(_OOV_LP_FLOOR), tok_lp)
    n = np.asarray(lens, dtype=np.int64)
    offsets = np.concatenate(([0], np.cumsum(n)[:-1]))
    nll = -np.add.reduceat(tok_lp, offsets)
    ppl = round_half_away(np.exp(nll.astype(np.float64) / n / 1e6), 6)
    return pd.DataFrame({
        id_col: np.asarray(doc_ids, dtype=np.int64),
        "n_tokens": n,
        "nll_micro": nll,
        "ppl": ppl,
        "keep": (ppl < threshold).astype(np.int64)})


_OOV_LP_FLOOR = -30_000_000  # ln-prob micro-nats floor for unseen terms


# GPT-2-style pre-tokenizer pattern, restricted to RE2-compatible syntax
# (no lookahead) so the DuckDB oracle can run the IDENTICAL pattern via
# regexp_extract_all — whitespace runs are not counted as tokens, the one
# (documented) divergence from the exact GPT-2 pattern. The whitespace
# class is spelled as explicit ASCII chars, NOT \s: Python's \s is
# Unicode (matches U+00A0 etc.) while RE2's is ASCII-only, so \s would
# silently diverge on Unicode whitespace.
_BPE_PAT = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^ \t\n\r\f\x0bA-Za-z0-9]+"
_BPE_RE = re.compile(_BPE_PAT)


def bpe_token_count_batch(batch: pa.Table,
                          text_col: str = "text") -> pa.Table:
    """BPE-ish token counting (the brief's second token-count mode): the
    GPT-2 pre-tokenizer regex splits contractions, letter runs, digit
    runs and punctuation runs — a far better train-token estimator than
    whitespace counting (code and punctuation-dense text tokenize 2-4x
    denser). The compiled pattern is module-level (built once per worker
    process); counting is one findall per doc — inherently per-string,
    same measured-justified shape as langid_batch."""
    texts = batch.column(text_col).to_pylist()
    n = np.fromiter((len(_BPE_RE.findall(t)) for t in texts),
                    dtype=np.int64, count=len(texts))
    return batch.append_column("n_bpe_tokens", pa.array(n))


def doc_terms_batch(df) -> "pd.DataFrame":
    """(doc_id, term, tf) rows — each doc is one input row, so per-doc
    term frequency needs no shuffle at all (the per-doc np.unique loop is
    the langid-style measured choice: rows are whole documents)."""
    import pandas as pd

    ids, terms, tfs = [], [], []
    for d, txt in zip(df["doc_id"].to_numpy(), df["text"].to_numpy()):
        toks = txt.split()
        if not toks:
            continue
        u, c = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        ids.append(np.full(len(u), d, dtype=np.int64))
        terms.append(u)
        tfs.append(c)
    if not ids:
        return pd.DataFrame({"doc_id": np.array([], np.int64),
                             "term": np.array([], object),
                             "tf": np.array([], np.int64)})
    return pd.DataFrame({"doc_id": np.concatenate(ids),
                         "term": np.concatenate(terms),
                         "tf": np.concatenate(tfs).astype(np.int64)})


def broadcast_unigram_lm(docs_ds):
    """Build the corpus unigram LM (integer micro-nat log-probs) and
    broadcast it: one (doc, term, tf) scan reduces to the O(vocabulary)
    count table via the combiner, quantizes with unigram_lp_micro, and
    ships once via ray.put. Shared by q_perplexity_gate and the curation
    pipeline so the LM construction has exactly one definition."""
    import ray

    from cocrawler_ray.stages.agg import partial_groupby_agg

    tfds = docs_ds.map_batches(doc_terms_batch, batch_format="pandas")
    cf = partial_groupby_agg(tfds, ["term"], {"c": ("tf", "sum")})
    return ray.put(unigram_lp_micro(cf["term"].to_numpy(),
                                    cf["c"].to_numpy()))


def distinct_ngram_rows_batch(batch: pa.Table, n: int = 5,
                              id_col: str = "doc_id",
                              text_col: str = "text") -> pa.Table:
    """Scan-side of exact substring-dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better" — the sharded-gram-table
    formulation that replaces the single-machine suffix array at corpus
    scale): one (id, gram) row per DISTINCT word n-gram per document.
    Docs shorter than n tokens emit nothing. Gram strings (not hashes)
    flow so the DuckDB oracle can restate membership exactly; at 100 TB
    you'd exchange a 128-bit gram hash instead — same shape, noted in
    q_substring_dup."""
    ids_in = batch.column(id_col).to_numpy()
    idxs, grams = _distinct_ngrams(batch.column(text_col).to_pylist(), n)
    return pa.table({id_col: pa.array(ids_in[idxs], pa.int64()),
                     "g": pa.array(grams, pa.string())})


def dup_gram_partials_reduce(df: pd.DataFrame,
                             id_col: str = "doc_id") -> pd.DataFrame:
    """Gram-keyed partition reduce behind q_substring_dup: every copy of
    a gram is co-located here, so a gram is a DUPLICATE iff its group has
    >1 row (rows are per-doc-distinct by construction). Emits per-doc
    partials (n_grams, n_dup) — a doc's grams spread across partitions;
    the caller combines with one id-keyed grouped sum."""
    if not len(df):
        return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                             "n_grams": pd.Series([], dtype=np.int64),
                             "n_dup": pd.Series([], dtype=np.int64)})
    dup = (df.groupby("g", sort=False)["g"].transform("size") > 1)
    out = (df.assign(__d=dup.to_numpy(np.int64))
           .groupby(id_col, sort=False)["__d"]
           .agg(n_grams="size", n_dup="sum").reset_index())
    return pd.DataFrame({id_col: out[id_col].to_numpy(np.int64),
                         "n_grams": out["n_grams"].to_numpy(np.int64),
                         "n_dup": out["n_dup"].to_numpy(np.int64)})


def rake_word_stats_batch(df, id_col: str = "doc_id",
                          text_col: str = "text"):
    """Per-batch PARTIAL RAKE word statistics (Rose et al., "Automatic
    Keyword Extraction from Individual Documents", 2010 — the classic
    unsupervised keyphrase scorer). Candidate phrases are maximal
    stopword-free token runs; for every non-stop word occurrence,
    freq += 1 and degree += length of its containing phrase (RAKE's
    word score is degree/freq; the integer numerator/denominator pair
    is emitted so the oracle stays float-free). Phrases never cross
    doc boundaries and docs never cross batches, so per-batch partials
    are exact and the global table is a combiner sum — zero shuffles
    before the O(vocabulary) combine."""
    import pandas as pd

    s = df[text_col].astype(str).str.strip()
    s = s[s != ""]
    empty = pd.DataFrame({"term": pd.Series(dtype=object),
                          "freq": pd.Series(dtype=np.int64),
                          "degree": pd.Series(dtype=np.int64)})
    if not len(s):
        return empty
    tok = s.str.split().explode()
    t = pd.DataFrame({"doc": tok.index.to_numpy(), "term": tok.to_numpy()})
    t["is_stop"] = t["term"].isin(_CLS_STOPWORDS)
    t["phid"] = t.groupby("doc", sort=False)["is_stop"].cumsum()
    w = t[~t["is_stop"]]
    if not len(w):
        return empty
    plen = w.groupby(["doc", "phid"], sort=False)["term"].transform("size")
    g = (w.assign(plen=plen.to_numpy(np.int64))
         .groupby("term", sort=False)["plen"]
         .agg(freq="size", degree="sum").reset_index())
    return pd.DataFrame({"term": g["term"].to_numpy(object),
                         "freq": g["freq"].to_numpy(np.int64),
                         "degree": g["degree"].to_numpy(np.int64)})

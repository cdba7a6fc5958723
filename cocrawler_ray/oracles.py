"""DuckDB SQL mirrors for the hash/sketch conformance queries.

The sketch operators (MinHash-LSH, SimHash, winnowing fingerprint) and the
pruned ANN paths hash open-vocabulary text with a siphash-based string hash
that SQL cannot restate, so their round-1 correctness rows were rows-only.
This module closes that gap with the repo's established two-implementation
oracle pattern (queries.py module doc): both sides CONSTRUCT the same
deterministic input from integer formulas, the Ray side runs the REAL
operator (dedup.minhash_lsh_pairs, dedup.simhash_batch,
text.fingerprint_batch, similarity.lsh_topk/ivf_topk_seeded, the multimodal
actor stages), and the SQL side recomputes the expected result analytically:

- Text ops draw tokens from a fixed 64-word vocabulary whose hash64 values
  are computed HERE (same pd.util.hash_array call as the engine) and
  embedded in the SQL as HUGEINT literals. All uint64 arithmetic
  (rolling-polynomial shingles, (a*x+b) mod 2^64 MinHash permutations,
  splitmix64, FNV band folds) is restated exactly in SQL over HUGEINT with
  explicit mod-2^64 split multiplies and 32-bit-half XORs.
- Image/audio/video payloads come from pure integer pixel/byte formulas
  (no RNG), encoded with the real codecs on the Ray side; the SQL
  regenerates pixels via generate_series and states decode stats, resize
  bytes (sha256 of the hex string), frame slices and window features with
  integer-exact arithmetic (block sizes are powers of two, so every mean
  is a dyadic rational that float64 represents exactly — bit-equal on both
  sides with no rounding ambiguity).
- ANN bucketing is integer-exact by design: LSH uses Rademacher (+-1)
  hyperplanes against floor(v*1000+0.5)-quantized vectors, IVF assigns by
  integer squared-L2 to stride-seeded centroids, so bucket membership can
  never drift between numpy and SQL float kernels; only the final cosine
  ranking is float (round-6, the pattern q_ann_cosine already validates).

Everything here is generated SQL text — no DuckDB import, no execution.
"""

from __future__ import annotations

import numpy as np

from cocrawler_ray.hashing import _perm_constants, hash64, splitmix64

M64 = 1 << 64
H32 = 1 << 32
POLY = 0x100000001B3           # hashing._POLY rolling-shingle multiplier
SM_C1 = 0x9E3779B97F4A7C15     # splitmix64 constants
SM_C2 = 0xBF58476D1CE4E5B9
SM_C3 = 0x94D049BB133111EB

VOCAB = [f"w{i:02d}" for i in range(64)]
VOCAB_H = [int(h) for h in hash64(VOCAB)]


# ---------------------------------------------------------------------------
# uint64 arithmetic fragments (HUGEINT carries values in [0, 2^64))
# ---------------------------------------------------------------------------

def mulmod(a: str, b: int) -> str:
    """(a * b) mod 2^64 for a HUGEINT expr in [0,2^64) and a constant b."""
    if b < (1 << 62):  # product < 2^126 fits HUGEINT directly
        return f"((({a}) * {b}::HUGEINT) % {M64})"
    bhi, blo = b >> 32, b & 0xFFFFFFFF
    return (f"(((({a}) * {bhi}::HUGEINT % {H32}) * {H32}"
            f" + ({a}) * {blo}::HUGEINT) % {M64})")


def xor64(a: str, b: str) -> str:
    """Bitwise XOR of two HUGEINT exprs in [0,2^64) via 32-bit halves."""
    return (f"(xor(CAST(({a}) // {H32} AS BIGINT), CAST(({b}) // {H32} AS BIGINT))::HUGEINT * {H32}"
            f" + xor(CAST(({a}) % {H32} AS BIGINT), CAST(({b}) % {H32} AS BIGINT))::HUGEINT)")


def shr(a: str, k: int) -> str:
    return f"(({a}) // {1 << k})"


def to_i64(a: str) -> str:
    """Reinterpret a [0,2^64) HUGEINT as signed int64 (two's complement)."""
    return (f"CAST(CASE WHEN ({a}) >= {1 << 63} THEN ({a}) - {M64}"
            f" ELSE ({a}) END AS BIGINT)")


def splitmix_ctes(src: str, carry: str, x: str, out: str, pfx: str) -> tuple[str, str]:
    """CTE chain computing out = splitmix64(x) from CTE `src`, carrying
    columns `carry` through. Returns (sql_fragment, final_cte_name)."""
    z1 = f"(({x}) + {SM_C1}) % {M64}"
    s1 = f"{pfx}_a AS (SELECT {carry}, {mulmod(xor64('z1', shr('z1', 30)), SM_C2)} AS z2 FROM (SELECT {carry}, {z1} AS z1 FROM {src}))"
    s2 = f"{pfx}_b AS (SELECT {carry}, {mulmod(xor64('z2', shr('z2', 27)), SM_C3)} AS z3 FROM {pfx}_a)"
    s3 = f"{pfx}_c AS (SELECT {carry}, {xor64('z3', shr('z3', 31))} AS {out} FROM {pfx}_b)"
    return ",\n".join([s1, s2, s3]), f"{pfx}_c"


def _vocab_values() -> str:
    """VALUES table vocab(idx, h HUGEINT, bits VARCHAR) — bits is the
    64-char LSB-first bit string of h (simhash bit extraction)."""
    rows = []
    for i, h in enumerate(VOCAB_H):
        bits = "".join("1" if (h >> b) & 1 else "0" for b in range(64))
        rows.append(f"({i}, {h}::HUGEINT, '{bits}')")
    return "(VALUES " + ", ".join(rows) + ") v(idx, h, bits)"


# ---------------------------------------------------------------------------
# Constructed text corpora (Python builders — the Ray side runs the REAL
# operators over these; each SQL generator restates the same formula)
# ---------------------------------------------------------------------------

def minhash_text(d: int) -> str:
    """Clustered near-dup corpus: 4 docs per cluster sharing ~90% of a
    12..28-token sequence; variant positions differ per doc."""
    c = d // 4
    length = 12 + (c * 3) % 17
    words = []
    for j in range(length):
        base = (c * 7 + j * 11 + (j * j) % 13) % 64
        idx = (base + 1 + d % 5) % 64 if (j + d) % 12 == 0 else base
        words.append(VOCAB[idx])
    return " ".join(words)


def simhash_text(d: int) -> str:
    """Periodic tokens (period 7 — exercises occurrence weighting); every
    13th doc is empty (simhash 0 path)."""
    if d % 13 == 0:
        return ""
    length = 8 + (d * 5) % 13
    return " ".join(VOCAB[(d * 3 + (j % 7) * 9) % 64] for j in range(length))


def fingerprint_text(d: int) -> str:
    """Length mix covering all fingerprint paths: empty (0), 2 tokens
    (single sub-k shingle), 12..28 tokens (min-shingle and winnowing)."""
    m = d % 11
    length = 0 if m == 0 else (2 if m == 1 else 12 + (d * 3) % 17)
    return " ".join(VOCAB[(d * 7 + j * 11 + (j * j) % 13) % 64] for j in range(length))


def _toks_cte(idx_expr_sql: str, len_expr_sql: str, where: str = "") -> str:
    """ids + exploded (d, j, h, bits) token table from the documents view."""
    return f"""ids AS (SELECT doc_id AS d FROM documents),
vocab AS (SELECT * FROM {_vocab_values()}),
jj AS (SELECT d, unnest(generate_series(0, ({len_expr_sql}) - 1)) AS j
       FROM ids{where}),
toks AS (SELECT jj.d, jj.j, v.h, v.bits
         FROM jj JOIN vocab v ON v.idx = ({idx_expr_sql}))"""


# ---------------------------------------------------------------------------
# q_simhash oracle
# ---------------------------------------------------------------------------

def simhash_sql() -> str:
    # signed bit contribution for simhash value; unsigned 2^(i%16) for bands
    contrib = ", ".join(
        f"({i}, ({(1 << i) if i < 63 else -(1 << 63)})::BIGINT, {1 << (i % 16)}::BIGINT)"
        for i in range(64))
    return f"""
WITH {_toks_cte("(jj.d*3 + (jj.j%7)*9) % 64", "8 + (d*5) % 13", " WHERE d % 13 <> 0")},
bitn AS (SELECT * FROM (VALUES {contrib}) c(i, contrib, bcontrib)),
votes AS (
  SELECT t.d, b.i, b.contrib, b.bcontrib,
         sum(CASE WHEN substring(t.bits, b.i + 1, 1) = '1' THEN 1 ELSE -1 END) AS s
  FROM toks t CROSS JOIN bitn b GROUP BY t.d, b.i, b.contrib, b.bcontrib),
vals AS (
  SELECT d,
         CAST(sum(CASE WHEN s > 0 THEN contrib ELSE 0 END) AS BIGINT) AS simhash,
         CAST(sum(CASE WHEN s > 0 AND i BETWEEN  0 AND 15 THEN bcontrib ELSE 0 END) AS BIGINT) AS band0,
         CAST(sum(CASE WHEN s > 0 AND i BETWEEN 16 AND 31 THEN bcontrib ELSE 0 END) AS BIGINT) AS band1,
         CAST(sum(CASE WHEN s > 0 AND i BETWEEN 32 AND 47 THEN bcontrib ELSE 0 END) AS BIGINT) AS band2,
         CAST(sum(CASE WHEN s > 0 AND i BETWEEN 48 AND 63 THEN bcontrib ELSE 0 END) AS BIGINT) AS band3
  FROM votes GROUP BY d)
SELECT d AS doc_id, simhash, band0, band1, band2, band3 FROM vals
UNION ALL
SELECT doc_id, 0, 0, 0, 0, 0 FROM documents WHERE doc_id % 13 = 0
"""


# ---------------------------------------------------------------------------
# q_fingerprint oracle
# ---------------------------------------------------------------------------

def _winnow_ctes(k: int, window: int) -> str:
    """Shared CTE chain: constructed tokens -> rolling k-gram shingles ->
    per-doc window minima -> the winnowing selection (``sel`` for docs
    with > window shingles, ``cnt``.mn for the small-doc single pick).
    Used by fingerprint_sql (folds the selection) and winnow_overlap_sql
    (pairs docs on it)."""
    # rolling k-gram: acc = acc*POLY + h (mod 2^64), h0..h{k-1} via lead()
    leads = ", ".join(f"lead(h, {j}) OVER w AS h{j}" for j in range(1, k))
    acc = "h0"
    for j in range(1, k):
        acc = f"(({mulmod(acc, POLY)}) + h{j}) % {M64}"
    return f"""
WITH {_toks_cte("(jj.d*7 + jj.j*11 + (jj.j*jj.j) % 13) % 64",
                "CASE d % 11 WHEN 0 THEN 0 WHEN 1 THEN 2 ELSE 12 + (d*3) % 17 END")},
base AS (SELECT d, j, h AS h0, {leads}
         FROM toks WINDOW w AS (PARTITION BY d ORDER BY j)),
shfull AS (SELECT d, j AS i, {acc} AS s FROM base WHERE h{k - 1} IS NOT NULL),
shshort AS (  -- docs with 0 < n_tokens < k: one shingle over all tokens
  SELECT d, 0 AS i,
         list_reduce(list(h ORDER BY j), (a, b) -> (a * {POLY} + b) % {M64}) AS s
  FROM toks GROUP BY d HAVING count(*) < {k}),
sh AS (SELECT * FROM shfull UNION ALL SELECT * FROM shshort),
cnt AS (SELECT d, count(*) AS n, min(s) AS mn FROM sh GROUP BY d),
wm AS (SELECT d, i, min(s) OVER (PARTITION BY d ORDER BY i
           ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING) AS m,
           count(*) OVER (PARTITION BY d) AS n
       FROM sh),
sel AS (SELECT DISTINCT d, m FROM wm WHERE n > {window} AND i <= n - {window})"""


def fingerprint_sql(k: int = 5, window: int = 8) -> str:
    sm, sm_final = splitmix_ctes("sel", "d", "m", "sm", "smx")
    return f"""{_winnow_ctes(k, window)},
{sm},
folded AS (SELECT d,
             bit_xor(CAST(sm // {H32} AS BIGINT)) AS xhi,
             bit_xor(CAST(sm % {H32} AS BIGINT)) AS xlo
           FROM {sm_final} GROUP BY d),
fp AS (
  SELECT d, {to_i64(f"(xhi::HUGEINT * {H32} + xlo::HUGEINT)")} AS fingerprint FROM folded
  UNION ALL
  SELECT d, {to_i64('mn')} FROM cnt WHERE n <= {window}
  UNION ALL
  SELECT doc_id, 0 FROM documents WHERE doc_id % 11 = 0)
SELECT d AS doc_id, fingerprint FROM fp
"""


def winnow_overlap_sql(k: int = 5, window: int = 8,
                       min_shared: int = 2) -> str:
    """MOSS overlap restatement: the shared winnowing selection, paired on
    equal selected hashes with an exact shared count."""
    return f"""{_winnow_ctes(k, window)},
selset AS (SELECT d, m FROM sel
           UNION ALL
           SELECT d, mn AS m FROM cnt WHERE n <= {window}),
pairs AS (SELECT x.d AS doc_a, y.d AS doc_b, count(*) AS shared
          FROM selset x JOIN selset y ON x.m = y.m AND x.d < y.d
          GROUP BY x.d, y.d)
SELECT doc_a, doc_b, CAST(shared AS BIGINT) AS shared
FROM pairs WHERE shared >= {min_shared}
"""


# ---------------------------------------------------------------------------
# q_minhash_dedup oracle
# ---------------------------------------------------------------------------

def minhash_sql(num_perm: int = 64, bands: int = 16, k: int = 3,
                threshold: float = 0.5) -> str:
    a, b = _perm_constants(num_perm, seed=7)
    perm_rows = ", ".join(f"({p}, {int(a[p]) >> 32}, {int(a[p]) & 0xFFFFFFFF}, {int(b[p])}::HUGEINT)"
                          for p in range(num_perm))
    acc = "h0"
    for j in range(1, k):
        acc = f"(({mulmod(acc, POLY)}) + h{j}) % {M64}"
    leads = ", ".join(f"lead(h, {j}) OVER w AS h{j}" for j in range(1, k))
    r = num_perm // bands
    bh = "l[1]"
    for j in range(2, r + 1):
        bh = xor64(mulmod(bh, POLY), f"l[{j}]")
    return f"""
WITH {_toks_cte(
        "CASE WHEN (jj.j + jj.d) % 12 = 0 "
        "THEN (((jj.d//4)*7 + jj.j*11 + (jj.j*jj.j) % 13) % 64 + 1 + jj.d % 5) % 64 "
        "ELSE ((jj.d//4)*7 + jj.j*11 + (jj.j*jj.j) % 13) % 64 END",
        "12 + ((d//4)*3) % 17")},
base AS (SELECT d, j, h AS h0, {leads}
         FROM toks WINDOW w AS (PARTITION BY d ORDER BY j)),
sh AS (SELECT d, {acc} AS s FROM base WHERE h{k - 1} IS NOT NULL),
perms AS (SELECT * FROM (VALUES {perm_rows}) p(p, ahi, alo, badd)),
sigs AS (
  SELECT s.d, p.p,
         min((((s.s * p.ahi % {H32}) * {H32} + s.s * p.alo) % {M64} + p.badd) % {M64}) AS sig
  FROM sh s CROSS JOIN perms p GROUP BY s.d, p.p),
bl AS (SELECT d, p // {r} AS band, list(sig ORDER BY p) AS l
       FROM sigs GROUP BY d, p // {r}),
mem AS (SELECT d, band, {bh} AS bh FROM bl),
hot AS (SELECT band, bh FROM mem GROUP BY band, bh HAVING count(*) >= 2),
pairs AS (SELECT DISTINCT m1.d AS doc_a, m2.d AS doc_b
          FROM hot JOIN mem m1 USING (band, bh) JOIN mem m2 USING (band, bh)
          WHERE m1.d < m2.d),
shsets AS (SELECT d, list_distinct(list(s)) AS ss FROM sh GROUP BY d),
jac AS (SELECT p.doc_a, p.doc_b,
               ROUND(len(list_intersect(sa.ss, sb.ss)) * 1.0 /
                     len(list_distinct(list_concat(sa.ss, sb.ss))), 6) AS jaccard
        FROM pairs p JOIN shsets sa ON sa.d = p.doc_a
                     JOIN shsets sb ON sb.d = p.doc_b)
SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= {threshold}
"""


# ---------------------------------------------------------------------------
# ANN: Rademacher hyperplanes + integer quantization (shared with engine)
# ---------------------------------------------------------------------------

QUANT = 1000


def rademacher_planes(n_bits: int, dim: int, seed: int = 17) -> np.ndarray:
    """Deterministic +-1 hyperplanes: sign of splitmix64 bit 20."""
    idx = (np.arange(n_bits * dim, dtype=np.uint64)
           + np.uint64(seed * 2_654_435_761))
    bits = (splitmix64(idx) >> np.uint64(20)) & np.uint64(1)
    return (bits.astype(np.int64) * 2 - 1).reshape(n_bits, dim)


def quantize_vecs(M: np.ndarray) -> np.ndarray:
    """floor(v*1000 + 0.5) in float64 — bit-identical to the SQL mirror."""
    return np.floor(M.astype(np.float64) * QUANT + 0.5).astype(np.int64)


def _quant_sql(col: str) -> str:
    return (f"list_transform(CAST({col} AS DOUBLE[]), "
            f"x -> CAST(floor(x * {QUANT} + 0.5) AS BIGINT))")


def ann_lsh_sql(n_bits: int = 6, dim: int = 64, k: int = 10,
                probe_hamming: int = 1, seed: int = 17) -> str:
    planes = rademacher_planes(n_bits, dim, seed)
    bit_exprs = []
    for bi in range(n_bits):
        lit = "[" + ", ".join(f"{v}.0" for v in planes[bi]) + "]"
        bit_exprs.append(
            f"CASE WHEN list_dot_product(CAST(q AS DOUBLE[]), {lit}) > 0 THEN 1 ELSE 0 END AS b{bi}")
    ham = " + ".join(f"abs(e.b{i} - qq.b{i})" for i in range(n_bits))
    bits = ", ".join(bit_exprs)
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                  {_quant_sql('embedding')} AS q
           FROM embeddings),
keyed AS (SELECT vec_id, v, {bits} FROM e),
qq AS (SELECT * FROM keyed WHERE vec_id = 0),
cand AS (SELECT e.vec_id, e.v FROM keyed e, qq WHERE {ham} <= {probe_hamming})
SELECT c.vec_id,
       ROUND(list_cosine_similarity(c.v, (SELECT v FROM qq)), 6) AS sim
FROM cand c ORDER BY sim DESC, vec_id LIMIT {k}
"""


def embed_neardup_lsh_sql(threshold: float = 0.45, n_bits: int = 4,
                          n_tables: int = 8, dim: int = 64,
                          seed: int = 29) -> str:
    """Mirror of dedup.embedding_neardup_lsh_pairs: same quantized
    Rademacher buckets (integer-exact), pairs sharing any (table, key)
    bucket, exact cosine >= threshold."""
    selects = []
    for t in range(n_tables):
        planes = rademacher_planes(n_bits, dim, seed + t)
        bits = " + ".join(
            f"CASE WHEN list_dot_product(CAST(q AS DOUBLE[]), "
            f"[{', '.join(f'{v}.0' for v in planes[b])}]) > 0 THEN {1 << b} ELSE 0 END"
            for b in range(n_bits))
        selects.append(f"SELECT vec_id, {t} AS tbl, ({bits}) AS key FROM e")
    keys_union = "\nUNION ALL\n".join(selects)
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                  {_quant_sql('embedding')} AS q
           FROM embeddings),
keys AS ({keys_union}),
cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
         FROM keys a JOIN keys b ON a.tbl = b.tbl AND a.key = b.key
         WHERE a.vec_id < b.vec_id)
SELECT c.vec_a, c.vec_b,
       ROUND(list_cosine_similarity(ea.v, eb.v), 6) AS sim
FROM cand c JOIN e ea ON ea.vec_id = c.vec_a JOIN e eb ON eb.vec_id = c.vec_b
WHERE list_cosine_similarity(ea.v, eb.v) >= {threshold}
"""


def kmeans_assign_sql(stride: int = 37, max_centroids: int = 256) -> str:
    """Mirror of similarity.kmeans_assign_seeded: stride-seeded centroids
    bounded at max_centroids (corpus-size-independent), integer-exact
    squared-L2 argmin over quantized vectors, ties to the smallest
    centroid id."""
    d2 = ("CAST(list_dot_product(CAST(a.q AS DOUBLE[]), CAST(a.q AS DOUBLE[]))"
          " - 2 * list_dot_product(CAST(a.q AS DOUBLE[]), CAST(c.cq AS DOUBLE[]))"
          " + list_dot_product(CAST(c.cq AS DOUBLE[]), CAST(c.cq AS DOUBLE[])) AS BIGINT)")
    return f"""
WITH e AS (SELECT vec_id, {_quant_sql('embedding')} AS q FROM embeddings),
cent AS (SELECT vec_id AS cid, q AS cq FROM e
         WHERE vec_id % {stride} = 1 AND vec_id < {stride * max_centroids})
SELECT a.vec_id, c.cid, {d2} AS d2
FROM e a CROSS JOIN cent c
QUALIFY row_number() OVER (PARTITION BY a.vec_id ORDER BY d2, c.cid) = 1
"""


def pq_encode_sql(m: int = 4, dim: int = 64, stride: int = 37,
                  max_centroids: int = 64) -> str:
    """Mirror of similarity.pq_encode_seeded: per-subspace integer-exact
    squared-L2 argmin over 1-based inclusive list slices, ties to the
    smallest centroid id; d2 sums the per-subspace minima."""
    sub = dim // m

    def d2(s: int, left: str = "a.q", right: str = "c.cq") -> str:
        lo, hi = s * sub + 1, (s + 1) * sub
        ls, rs = f"{left}[{lo}:{hi}]", f"{right}[{lo}:{hi}]"
        return (f"CAST(list_dot_product(CAST({ls} AS DOUBLE[]), "
                f"CAST({ls} AS DOUBLE[]))"
                f" - 2 * list_dot_product(CAST({ls} AS DOUBLE[]), "
                f"CAST({rs} AS DOUBLE[]))"
                f" + list_dot_product(CAST({rs} AS DOUBLE[]), "
                f"CAST({rs} AS DOUBLE[])) AS BIGINT)")

    assigns = ",\n".join(
        f"""a{s} AS (
  SELECT a.vec_id, c.cid, {d2(s)} AS d2
  FROM e a CROSS JOIN cent c
  QUALIFY row_number() OVER (PARTITION BY a.vec_id ORDER BY d2, c.cid) = 1)"""
        for s in range(m))
    code_cols = ", ".join(f"a{s}.cid AS code_{s}" for s in range(m))
    d2_sum = " + ".join(f"a{s}.d2" for s in range(m))
    joins = " ".join(f"JOIN a{s} ON a{s}.vec_id = e.vec_id"
                     for s in range(m))
    return f"""
WITH e AS (SELECT vec_id, {_quant_sql('embedding')} AS q FROM embeddings),
cent AS (SELECT vec_id AS cid, q AS cq FROM e
         WHERE vec_id % {stride} = 1 AND vec_id < {stride * max_centroids}),
{assigns}
SELECT e.vec_id, {code_cols}, CAST({d2_sum} AS BIGINT) AS d2
FROM e {joins}
"""


def pq_adc_sql(m: int = 4, dim: int = 64, stride: int = 37,
               max_centroids: int = 64, k: int = 10) -> str:
    """Mirror of similarity.pq_adc_topk: per-subspace codes as in
    pq_encode_sql, then the asymmetric distance = sum over subspaces of
    d2(query slice, assigned centroid slice); top-k ties to vec_id."""
    sub = dim // m

    def d2(s: int, left: str, right: str) -> str:
        lo, hi = s * sub + 1, (s + 1) * sub
        ls, rs = f"{left}[{lo}:{hi}]", f"{right}[{lo}:{hi}]"
        return (f"CAST(list_dot_product(CAST({ls} AS DOUBLE[]), "
                f"CAST({ls} AS DOUBLE[]))"
                f" - 2 * list_dot_product(CAST({ls} AS DOUBLE[]), "
                f"CAST({rs} AS DOUBLE[]))"
                f" + list_dot_product(CAST({rs} AS DOUBLE[]), "
                f"CAST({rs} AS DOUBLE[])) AS BIGINT)")

    assigns = ",\n".join(
        f"""a{s} AS (
  SELECT a.vec_id, c.cid, {d2(s, 'a.q', 'c.cq')} AS d2
  FROM e a CROSS JOIN cent c
  QUALIFY row_number() OVER (PARTITION BY a.vec_id ORDER BY d2, c.cid) = 1)"""
        for s in range(m))
    cjoins = " ".join(
        f"JOIN a{s} ON a{s}.vec_id = e.vec_id "
        f"JOIN cent c{s} ON c{s}.cid = a{s}.cid" for s in range(m))
    adist = " + ".join(d2(s, "qv.q", f"c{s}.cq") for s in range(m))
    return f"""
WITH e AS (SELECT vec_id, {_quant_sql('embedding')} AS q FROM embeddings),
cent AS (SELECT vec_id AS cid, q AS cq FROM e
         WHERE vec_id % {stride} = 1 AND vec_id < {stride * max_centroids}),
{assigns},
qv AS (SELECT q FROM e WHERE vec_id = 0)
SELECT e.vec_id, CAST({adist} AS BIGINT) AS adist
FROM e {cjoins} CROSS JOIN qv
ORDER BY adist, e.vec_id LIMIT {k}
"""


def ann_ivf_sql(stride: int = 37, nprobe: int = 4, k: int = 10,
                max_centroids: int = 256) -> str:
    d2 = ("CAST(list_dot_product(CAST(a.q AS DOUBLE[]), CAST(a.q AS DOUBLE[]))"
          " - 2 * list_dot_product(CAST(a.q AS DOUBLE[]), CAST(c.cq AS DOUBLE[]))"
          " + list_dot_product(CAST(c.cq AS DOUBLE[]), CAST(c.cq AS DOUBLE[])) AS BIGINT)")
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                  {_quant_sql('embedding')} AS q
           FROM embeddings),
cent AS (SELECT vec_id AS cid, q AS cq FROM e
         WHERE vec_id % {stride} = 1 AND vec_id < {stride * max_centroids}),
assign AS (
  SELECT a.vec_id, c.cid, {d2} AS d2
  FROM e a CROSS JOIN cent c
  QUALIFY row_number() OVER (PARTITION BY a.vec_id ORDER BY d2, c.cid) = 1),
qprobe AS (
  SELECT c.cid FROM e a CROSS JOIN cent c WHERE a.vec_id = 0
  ORDER BY {d2}, c.cid LIMIT {nprobe}),
cand AS (SELECT e.vec_id, e.v FROM e
         JOIN assign s ON s.vec_id = e.vec_id
         WHERE s.cid IN (SELECT cid FROM qprobe))
SELECT c.vec_id,
       ROUND(list_cosine_similarity(c.v, (SELECT v FROM e WHERE vec_id = 0)), 6) AS sim
FROM cand c ORDER BY sim DESC, vec_id LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Multimodal formula corpora (pure integer pixels/bytes — no RNG)
# ---------------------------------------------------------------------------

N_IMAGES = 64
N_PAYLOADS = 32
PAYLOAD_LEN = 1024


def image_dims(d: int) -> tuple[int, int]:
    return 16 * (1 + d % 2), 16 * (1 + (d // 2) % 2)  # (w, h), both 8-divisible


def varied_image_dims(d: int) -> tuple[int, int]:
    """35 (w, h) combinations — the aspect-bucketing corpus (q_image_
    aspect_buckets needs real dimensional variety, unlike the 4-shape
    decode corpus)."""
    return 8 * (1 + d % 7), 8 * (1 + (d // 7) % 5)


def formula_image(d: int, dims=None) -> np.ndarray:
    """(h, w, 3) uint8 — pixel = integer formula of (d, x, y, ch)."""
    w, h = dims or image_dims(d)
    y, x = np.mgrid[0:h, 0:w]
    img = np.empty((h, w, 3), dtype=np.uint8)
    for ch in range(3):
        img[:, :, ch] = ((x * 3 + y * 5 + ch * 11 + d * 17
                          + ((x * y + d) % 31) * 7) % 256).astype(np.uint8)
    return img


def conformance_images(n: int = N_IMAGES, dims_fn=None):
    """Arrow web-schema table of formula images (real codec encode)."""
    import pyarrow as pa

    from cocrawler_ray import codecs
    dims_fn = dims_fn or image_dims
    ids, data, ws, hs, fmts = [], [], [], [], []
    for d in range(n):
        w, h = dims_fn(d)
        fmt = codecs.FORMATS[d % 3]
        ids.append(f"img{d:04d}")
        data.append(codecs.encode(formula_image(d, (w, h)), fmt))
        ws.append(w); hs.append(h); fmts.append(fmt)
    return pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(data, pa.binary()),
        "w": pa.array(np.array(ws, dtype=np.int32)),
        "h": pa.array(np.array(hs, dtype=np.int32)),
        "fmt": pa.array(fmts, pa.string()),
    })


def conformance_images_varied(n: int = 140):
    """The 35-shape corpus for aspect-ratio bucketing."""
    return conformance_images(n, dims_fn=varied_image_dims)


def formula_payload(d: int, length: int = PAYLOAD_LEN) -> bytes:
    i = np.arange(length, dtype=np.int64)
    return ((d * 31 + i * 7 + ((i * i) % 97) * 5) % 256).astype(np.uint8).tobytes()


def conformance_payloads(n: int = N_PAYLOADS):
    import pyarrow as pa
    return pa.table({
        "image_id": pa.array([f"img{d:04d}" for d in range(n)], pa.string()),
        "bytes": pa.array([formula_payload(d) for d in range(n)], pa.binary()),
    })


_PIXEL_SQL = "(x*3 + y*5 + ch*11 + d*17 + ((x*y + d) % 31) * 7) % 256"
# qnt codec decode: ((p >> 3) << 3) + 4
_DECODED_SQL = f"CASE WHEN d % 3 = 2 THEN (({_PIXEL_SQL}) // 8) * 8 + 4 ELSE {_PIXEL_SQL} END"


def _px_ctes(n: int) -> str:
    return f"""ids AS (SELECT unnest(generate_series(0, {n - 1})) AS d),
xs AS (SELECT d, unnest(generate_series(0, 16*(1 + d % 2) - 1)) AS x FROM ids),
ys AS (SELECT d, x, unnest(generate_series(0, 16*(1 + (d//2) % 2) - 1)) AS y FROM xs),
px AS (SELECT d, x, y, ch, {_DECODED_SQL} AS p
       FROM ys CROSS JOIN (SELECT unnest([0,1,2]) AS ch) c)"""


def transcode_audit_sql(n: int = N_IMAGES) -> str:
    """q_transcode_audit: qnt re-encode of the decoded pixels — p2 =
    (p // 8) * 8 + 4 (the qnt decode formula; p <= 255 so the engine's
    clip never binds), enc_bytes = 3*w*h, sse = sum (p - p2)^2. qnt-
    source images (d % 3 = 2) restate as sse 0 (idempotent re-encode)."""
    return f"""
WITH {_px_ctes(n)},
t AS (SELECT d, p, (p // 8) * 8 + 4 AS p2 FROM px)
SELECT 'img' || lpad(CAST(d AS VARCHAR), 4, '0') AS image_id,
       CAST(3 * (16 * (1 + d % 2)) * (16 * (1 + (d // 2) % 2))
            AS BIGINT) AS enc_bytes,
       CAST(sum((p - p2) * (p - p2)) AS BIGINT) AS sse
FROM t GROUP BY d
"""


def image_decode_stats_sql(n: int = N_IMAGES) -> str:
    """Means are dyadic-exact (no rounding); stds round-4; phash bits via
    the integer-exact 64*blocksum > totalsum comparison."""
    ch_stats = ", ".join(
        f"avg(CASE WHEN ch = {c} THEN p END) AS mean_{name}, "
        f"ROUND(stddev_pop(CASE WHEN ch = {c} THEN p END), 4) AS std_{name}"
        for c, name in enumerate("rgb"))
    return f"""
WITH {_px_ctes(n)},
stats AS (SELECT d, {ch_stats} FROM px GROUP BY d),
-- phash: 8x8 block sums of gray*3 = r+g+b (integer), bit = 64*S > total
g3 AS (SELECT d, x, y, sum(p) AS s3 FROM px GROUP BY d, x, y),
blocks AS (SELECT d, (y * 8) // (16*(1 + (d//2) % 2)) AS bi,
                  (x * 8) // (16*(1 + d % 2)) AS bj, sum(s3) AS bs
           FROM g3 GROUP BY d, bi, bj),
tot AS (SELECT d, sum(bs) AS t FROM blocks GROUP BY d),
ph AS (SELECT b.d,
         CAST(sum(CASE WHEN 64 * b.bs > tt.t THEN
           CASE WHEN b.bi = 0 AND b.bj = 0 THEN -9223372036854775808::HUGEINT
                ELSE (2::HUGEINT ^ (63 - (b.bi * 8 + b.bj)))::HUGEINT END
           ELSE 0 END) AS BIGINT) AS phash_decoded
       FROM blocks b JOIN tot tt ON tt.d = b.d GROUP BY b.d)
SELECT 'img' || lpad(CAST(s.d AS VARCHAR), 4, '0') AS image_id,
       s.mean_r, s.std_r, s.mean_g, s.std_g, s.mean_b, s.std_b,
       ph.phash_decoded
FROM stats s JOIN ph ON ph.d = s.d
"""


def image_dhash_sql(n: int = N_IMAGES) -> str:
    """Difference-hash bits via integer cross-multiplication of adjacent
    8x9-grid block sums/counts (codecs.difference_dhash restated)."""
    return f"""
WITH {_px_ctes(n)},
g3 AS (SELECT d, x, y, sum(p) AS s3 FROM px GROUP BY d, x, y),
blocks AS (SELECT d, (y * 8) // (16*(1 + (d//2) % 2)) AS bi,
                  (x * 9) // (16*(1 + d % 2)) AS bj,
                  sum(s3) AS s, count(*) AS c
           FROM g3 GROUP BY d, bi, bj),
pairs AS (SELECT l.d, l.bi, l.bj, (r.s * l.c > l.s * r.c) AS bit
          FROM blocks l JOIN blocks r
            ON r.d = l.d AND r.bi = l.bi AND r.bj = l.bj + 1),
dh AS (SELECT d, CAST(sum(CASE WHEN bit THEN
         CASE WHEN bi = 0 AND bj = 0 THEN -9223372036854775808::HUGEINT
              ELSE (2::HUGEINT ^ (63 - (bi * 8 + bj)))::HUGEINT END
         ELSE 0 END) AS BIGINT) AS dhash
       FROM pairs GROUP BY d)
SELECT 'img' || lpad(CAST(d AS VARCHAR), 4, '0') AS image_id, dhash
FROM dh
"""


def psnr_gate_sql(n: int = N_IMAGES) -> str:
    """Lossy-roundtrip PSNR>=40dB gate: the qnt re-quantization of the
    DECODED pixel is (p//8)*8+4, the gate compares integer ssq*10^4
    against 65025*samples (255^2/10^(40/10) cleared of the fraction)."""
    return f"""
WITH {_px_ctes(n)},
e AS (SELECT d, p - ((p // 8) * 8 + 4) AS err FROM px)
SELECT 'img' || lpad(CAST(d AS VARCHAR), 4, '0') AS image_id,
       CAST(sum(err * err) AS BIGINT) AS ssq,
       CAST(count(*) AS BIGINT) AS npx,
       (sum(err * err) * 10000 <= 65025 * count(*)) AS passed
FROM e GROUP BY d
"""


def channel_norm_sql(n: int = N_IMAGES) -> str:
    """Dataset-level per-channel normalization constants: exact int64
    moment sums across ALL images, then the identical double expressions
    mean = s/n and std = sqrt(ss/n - mean^2) on both sides (sqrt is
    IEEE-correctly-rounded in DuckDB and numpy alike). Outputs ship as
    floor(x * 1e6) integers — floor of an identical double is exact,
    where ROUND could split on a half-in-double edge."""
    return f"""
WITH {_px_ctes(n)},
a AS (SELECT ch, CAST(SUM(p) AS BIGINT) AS s,
             CAST(SUM(p * p) AS BIGINT) AS ss,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM px GROUP BY ch)
SELECT ch,
       CAST(floor(CAST(s AS DOUBLE) / n * 1000000) AS BIGINT)
           AS mean_micro,
       CAST(floor(sqrt(CAST(ss AS DOUBLE) / n -
                       (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
                  * 1000000) AS BIGINT) AS std_micro
FROM a
"""


def maxbin_gate_sql(n: int = N_IMAGES) -> str:
    """Flat-image gate: red-channel histogram max bin vs pixel count,
    decided by the integer comparison maxcnt*8 >= w*h."""
    return f"""
WITH {_px_ctes(n)},
c AS (SELECT d, p, count(*) AS cnt FROM px WHERE ch = 0 GROUP BY d, p),
m AS (SELECT d, max(cnt) AS maxcnt FROM c GROUP BY d)
SELECT 'img' || lpad(CAST(d AS VARCHAR), 4, '0') AS image_id,
       CAST(maxcnt AS BIGINT) AS maxcnt,
       maxcnt * 8 >= (16*(1 + d % 2)) * (16*(1 + (d//2) % 2)) AS flat
FROM m
"""


def tile_stats_sql(n: int = N_IMAGES, tile: int = 8) -> str:
    """Patchify: exact int64 pixel sum (all channels) per tile x tile
    patch, one row per (image, ti, tj)."""
    return f"""
WITH {_px_ctes(n)}
SELECT 'img' || lpad(CAST(d AS VARCHAR), 4, '0') AS image_id,
       CAST(y // {tile} AS BIGINT) AS ti,
       CAST(x // {tile} AS BIGINT) AS tj,
       CAST(SUM(p) AS BIGINT) AS tsum
FROM px GROUP BY d, y // {tile}, x // {tile}
"""


def conformance_dup_images(n: int = 64, mod: int = 48,
                           n_flat: int = 4, n_noisy: int = 4):
    """Image corpus for curation-pipeline conformance, with every failure
    mode present: rows 0..n-1 carry formula image e = d % mod (rows
    mod..n-1 are true byte-duplicates of rows 0..n-mod-1, so dhash
    first-wins dedup has real work); then ``n_flat`` constant-color
    images (flat-gate casualties: one histogram bin holds everything)
    and ``n_noisy`` images snapped to lattice offset 0 (qnt roundtrip
    error -4 per sample -> mse 16 > 255^2/10^4, PSNR-gate casualties).
    Specials are 16x16 raw16 so their decoded pixels are exactly the
    stated formulas."""
    import pyarrow as pa

    from cocrawler_ray import codecs
    ids, data, ws, hs, fmts = [], [], [], [], []
    for d in range(n):
        e = d % mod
        w, h = image_dims(e)
        fmt = codecs.FORMATS[e % 3]
        ids.append(f"img{d:04d}")
        data.append(codecs.encode(formula_image(e, (w, h)), fmt))
        ws.append(w); hs.append(h); fmts.append(fmt)
    for d in range(n, n + n_flat):
        ids.append(f"img{d:04d}")
        data.append(np.full((16, 16, 3), 100, dtype=np.uint8).tobytes())
        ws.append(16); hs.append(16); fmts.append("raw16")
    for d in range(n + n_flat, n + n_flat + n_noisy):
        img = (formula_image(d, (16, 16)).astype(np.int64) // 8 * 8) \
            .astype(np.uint8)
        ids.append(f"img{d:04d}")
        data.append(img.tobytes())
        ws.append(16); hs.append(16); fmts.append("raw16")
    return pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(data, pa.binary()),
        "w": pa.array(np.array(ws, dtype=np.int32)),
        "h": pa.array(np.array(hs, dtype=np.int32)),
        "fmt": pa.array(fmts, pa.string()),
    })


def curate_images_sql(n: int = 64, mod: int = 48,
                      n_flat: int = 4, n_noisy: int = 4) -> str:
    """End-to-end image-curation restatement: PSNR>=40dB qnt-roundtrip
    gate AND not-flat histogram gate, then first-wins (min image_id)
    dedup on the exact 64-bit dhash. Every stage reuses the established
    integer-exact forms (psnr_gate_sql, maxbin_gate_sql,
    image_dhash_sql), parametrized on the duplicated seed e = d % mod
    for the base rows and the stated constant / lattice-0 formulas for
    the adversarial rows."""
    e = f"(d % {mod})"
    pixel = f"(x*3 + y*5 + ch*11 + {e}*17 + ((x*y + {e}) % 31) * 7) % 256"
    pixel_d = "(x*3 + y*5 + ch*11 + d*17 + ((x*y + d) % 31) * 7) % 256"
    base = (f"CASE WHEN {e} % 3 = 2 THEN (({pixel}) // 8) * 8 + 4 "
            f"ELSE {pixel} END")
    decoded = (f"CASE WHEN d < {n} THEN ({base}) "
               f"WHEN d < {n + n_flat} THEN 100 "
               f"ELSE (({pixel_d}) // 8) * 8 END")
    w = f"(CASE WHEN d < {n} THEN 16*(1 + {e} % 2) ELSE 16 END)"
    h = f"(CASE WHEN d < {n} THEN 16*(1 + ({e}//2) % 2) ELSE 16 END)"
    total = n + n_flat + n_noisy
    return f"""
WITH ids AS (SELECT unnest(generate_series(0, {total - 1})) AS d),
xs AS (SELECT d, unnest(generate_series(0, {w} - 1)) AS x FROM ids),
ys AS (SELECT d, x, unnest(generate_series(0, {h} - 1)) AS y FROM xs),
px AS (SELECT d, x, y, ch, {decoded} AS p
       FROM ys CROSS JOIN (SELECT unnest([0,1,2]) AS ch) c),
psnr AS (SELECT d, sum((p - ((p // 8) * 8 + 4)) *
                       (p - ((p // 8) * 8 + 4))) * 10000
                    <= 65025 * count(*) AS ok
         FROM px GROUP BY d),
mb AS (SELECT d, max(cnt) * 8 >= {w} * {h} AS flat
       FROM (SELECT d, p, count(*) AS cnt FROM px WHERE ch = 0
             GROUP BY d, p) GROUP BY d),
g3 AS (SELECT d, x, y, sum(p) AS s3 FROM px GROUP BY d, x, y),
blocks AS (SELECT d, (y * 8) // {h} AS bi, (x * 9) // {w} AS bj,
                  sum(s3) AS s, count(*) AS c
           FROM g3 GROUP BY d, bi, bj),
pairs AS (SELECT l.d, l.bi, l.bj, (r.s * l.c > l.s * r.c) AS bit
          FROM blocks l JOIN blocks r
            ON r.d = l.d AND r.bi = l.bi AND r.bj = l.bj + 1),
dh AS (SELECT d, CAST(sum(CASE WHEN bit THEN
         CASE WHEN bi = 0 AND bj = 0 THEN -9223372036854775808::HUGEINT
              ELSE (2::HUGEINT ^ (63 - (bi * 8 + bj)))::HUGEINT END
         ELSE 0 END) AS BIGINT) AS dhash
       FROM pairs GROUP BY d),
surv AS (SELECT dh.d, dh.dhash FROM dh
         JOIN psnr ON psnr.d = dh.d JOIN mb ON mb.d = dh.d
         WHERE psnr.ok AND NOT mb.flat)
SELECT min('img' || lpad(CAST(d AS VARCHAR), 4, '0')) AS image_id, dhash
FROM surv GROUP BY dhash
"""


N_VIDEOS = 12
VIDEO_FRAMES = 8
VIDEO_W = VIDEO_H = 16


def conformance_videos(n: int = N_VIDEOS, frames: int = VIDEO_FRAMES):
    """Arrow table of synthetic videos: each payload is ``frames``
    raw16-encoded 16x16 formula images concatenated, frame f of video v
    drawn with formula seed d = v*101 + f (so adjacent-frame deltas are
    SQL-restatable)."""
    import pyarrow as pa
    ids, data = [], []
    for v in range(n):
        ids.append(f"vid{v:04d}")
        data.append(b"".join(
            formula_image(v * 101 + f, (VIDEO_W, VIDEO_H)).tobytes()
            for f in range(frames)))
    return pa.table({
        "video_id": pa.array(ids, pa.string()),
        "bytes": pa.array(data, pa.binary()),
        "w": pa.array(np.full(n, VIDEO_W, dtype=np.int32)),
        "h": pa.array(np.full(n, VIDEO_H, dtype=np.int32)),
        "n_frames": pa.array(np.full(n, frames, dtype=np.int32)),
    })


def scene_cut_sql(n: int = N_VIDEOS, frames: int = VIDEO_FRAMES,
                  threshold: int = 45) -> str:
    """Adjacent-frame sum-of-absolute-differences per frame pair, cut
    decided by the integer comparison sad >= threshold * w * h * 3."""
    px = ("(x*3 + y*5 + ch*11 + {d}*17 + ((x*y + {d}) % 31) * 7) % 256")
    cur = px.format(d="(vid*101 + fi)")
    prev = px.format(d="(vid*101 + fi - 1)")
    npx = VIDEO_W * VIDEO_H * 3
    return f"""
WITH v AS (SELECT unnest(generate_series(0, {n - 1})) AS vid),
f AS (SELECT vid, unnest(generate_series(1, {frames - 1})) AS fi FROM v),
xs AS (SELECT vid, fi, unnest(generate_series(0, {VIDEO_W - 1})) AS x FROM f),
ys AS (SELECT vid, fi, x, unnest(generate_series(0, {VIDEO_H - 1})) AS y
       FROM xs),
px AS (SELECT vid, fi, abs(({cur}) - ({prev})) AS ad
       FROM ys CROSS JOIN (SELECT unnest([0,1,2]) AS ch) c)
SELECT 'vid' || lpad(CAST(vid AS VARCHAR), 4, '0') AS video_id,
       CAST(fi AS BIGINT) AS frame_idx,
       CAST(sum(ad) AS BIGINT) AS sad,
       sum(ad) >= {threshold} * {npx} AS cut
FROM px GROUP BY vid, fi
"""


def image_resize_sql(n: int = N_IMAGES, out_w: int = 8, out_h: int = 8) -> str:
    """Resized bytes = per-block integer mean (floor; block counts are
    powers of two so the float mean is exact and truncation == //)."""
    return f"""
WITH {_px_ctes(n)},
blocks AS (SELECT d, (y * {out_h}) // (16*(1 + (d//2) % 2)) AS bi,
                  (x * {out_w}) // (16*(1 + d % 2)) AS bj, ch,
                  sum(p) // count(*) AS byte
           FROM px GROUP BY d, bi, bj, ch),
hexes AS (SELECT d, string_agg(lpad(lower(to_hex(byte)), 2, '0'), ''
                               ORDER BY bi, bj, ch) AS hx
          FROM blocks GROUP BY d)
SELECT 'img' || lpad(CAST(d AS VARCHAR), 4, '0') AS image_id,
       {out_w} AS w, {out_h} AS h, 'raw16' AS fmt,
       sha256(hx) AS bytes_sha256
FROM hexes
"""


_BYTE_SQL = "(d*31 + i*7 + ((i*i) % 97) * 5) % 256"


def frame_sample_sql(n: int = N_PAYLOADS, length: int = PAYLOAD_LEN,
                     every_k: int = 10) -> str:
    step = max(1, length // 16)
    n_chunks = (length + step - 1) // step
    frame_chunks = list(range(0, n_chunks, every_k))
    return f"""
WITH ids AS (SELECT unnest(generate_series(0, {n - 1})) AS d),
fr AS (SELECT d, unnest([{", ".join(str(j) for j in range(len(frame_chunks)))}]) AS frame_idx,
              unnest([{", ".join(str(c) for c in frame_chunks)}]) AS chunk
       FROM ids),
by AS (SELECT d, frame_idx, chunk,
              unnest(generate_series(chunk * {step},
                     least((chunk + 1) * {step}, {length}) - 1)) AS i
       FROM fr),
hexes AS (SELECT d, frame_idx,
                 string_agg(lpad(lower(to_hex({_BYTE_SQL})), 2, '0'), '' ORDER BY i) AS hx
          FROM by GROUP BY d, frame_idx)
SELECT 'img' || lpad(CAST(d AS VARCHAR), 4, '0') AS image_id,
       CAST(frame_idx AS INTEGER) AS frame_idx, sha256(hx) AS frame_bytes_sha256
FROM hexes
"""


def audio_features_sql(n: int = N_PAYLOADS, length: int = PAYLOAD_LEN,
                       n_windows: int = 8) -> str:
    win = length // n_windows
    return f"""
WITH ids AS (SELECT unnest(generate_series(0, {n - 1})) AS d),
by AS (SELECT d, unnest(generate_series(0, {length - 1})) AS i FROM ids),
feats AS (SELECT d, i // {win} AS win_idx,
                 sum({_BYTE_SQL}) / {win}.0 AS feat
          FROM by GROUP BY d, i // {win})
SELECT 'img' || lpad(CAST(d AS VARCHAR), 4, '0') AS image_id,
       CAST(win_idx AS INTEGER) AS win_idx, feat
FROM feats
"""


def stratified_sample_sql(n: int, cols: str, key: str, src_sql: str) -> str:
    """Rank-within-stratum sample: row_number() over (PARTITION BY key
    ORDER BY splitmix64(doc_id), doc_id) <= n — the SQL restatement of
    stages/sample.py::stratified_sample."""
    sm, fin = splitmix_ctes("src", cols, "doc_id::HUGEINT", "smx", "ss")
    return f"""
WITH src AS ({src_sql}),
{sm}
SELECT {cols} FROM (
  SELECT {cols}, row_number() OVER (PARTITION BY {key} ORDER BY smx, doc_id) AS rn
  FROM {fin})
WHERE rn <= {n}
"""


def pagerank_sql(iters: int = 3, damping: float = 0.85) -> str:
    """Unrolled fixed-iteration PageRank over the constructed doc link
    graph (doc d -> (7d+1) % N and (13d+3) % N) — SQL restatement of
    stages/graph.py::pagerank."""
    base = f"{1.0 - damping} / (SELECT N FROM nn)"
    ctes = [
        "nn AS (SELECT count(*) AS N FROM documents)",
        """edges AS (
  SELECT doc_id AS src, (doc_id * 7 + 1) % (SELECT N FROM nn) AS dst FROM documents
  UNION ALL
  SELECT doc_id, (doc_id * 13 + 3) % (SELECT N FROM nn) FROM documents)""",
        "deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS outdeg FROM edges GROUP BY src)",
        "r0 AS (SELECT doc_id AS node, 1.0 / (SELECT N FROM nn) AS r FROM documents)",
    ]
    prev = "r0"
    for i in range(1, iters + 1):
        ctes.append(f"""i{i} AS (
  SELECT d.doc_id AS node, {base} + {damping} * COALESCE(c.s, 0) AS r
  FROM documents d LEFT JOIN (
    SELECT e.dst AS node, sum(p.r / g.outdeg) AS s
    FROM edges e JOIN {prev} p ON p.node = e.src JOIN deg g ON g.src = e.src
    GROUP BY e.dst) c ON c.node = d.doc_id)""")
        prev = f"i{i}"
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node, ROUND(r, 6) AS pr FROM {prev}")


def bitext_margin_sql(k: int = 4, threshold: float = 1.0) -> str:
    """q_bitext_mine: CCMatrix/LASER margin criterion over int8-exact
    dots — even vec_ids are the source side, odd the target; margin =
    2k*s(x,y) / (sumNNk(x) + sumNNk(y)) as ONE division of exact int64
    sums (bit-identical doubles both sides), argmax per source with
    (margin DESC, dst ASC) ties, threshold gate, non-positive
    denominators excluded."""
    return f"""
WITH q AS (SELECT vec_id,
         list_transform(embedding,
             x -> GREATEST(-127.0, LEAST(127.0,
                           FLOOR(CAST(x AS DOUBLE) * 64)))) AS qv
  FROM embeddings),
a AS (SELECT vec_id AS ai, qv FROM q WHERE vec_id % 2 = 0),
b AS (SELECT vec_id AS bi, qv FROM q WHERE vec_id % 2 = 1),
d AS (SELECT ai, bi, CAST(list_dot_product(a.qv, b.qv) AS BIGINT) AS s
      FROM a CROSS JOIN b),
sa AS (SELECT ai, CAST(sum(s) AS BIGINT) AS sa FROM (
         SELECT ai, s, row_number() OVER (
             PARTITION BY ai ORDER BY s DESC, bi) AS r FROM d)
       WHERE r <= {k} GROUP BY ai),
sb AS (SELECT bi, CAST(sum(s) AS BIGINT) AS sb FROM (
         SELECT bi, s, row_number() OVER (
             PARTITION BY bi ORDER BY s DESC, ai) AS r FROM d)
       WHERE r <= {k} GROUP BY bi),
m AS (SELECT d.ai, d.bi,
             CAST({2 * k} * s AS DOUBLE) / (sa.sa + sb.sb) AS margin
      FROM d JOIN sa ON sa.ai = d.ai JOIN sb ON sb.bi = d.bi
      WHERE sa.sa + sb.sb > 0),
best AS (SELECT ai, bi, margin, row_number() OVER (
             PARTITION BY ai ORDER BY margin DESC, bi) AS r FROM m)
SELECT ai AS src, bi AS dst, ROUND(margin, 6) AS margin
FROM best WHERE r = 1 AND margin >= {threshold}
"""


def opic_sql(iters: int = 3) -> str:
    """Unrolled fixed-iteration OPIC over the constructed doc link graph
    (same edges as pagerank_sql) — SQL restatement of
    stages/graph.py::opic: cash flows c_t -> c_{t+1} along edges (no
    damping, no teleport), importance = ROUND(sum of c_0..c_K, 6)."""
    ctes = [
        "nn AS (SELECT count(*) AS N FROM documents)",
        """edges AS (
  SELECT doc_id AS src, (doc_id * 7 + 1) % (SELECT N FROM nn) AS dst FROM documents
  UNION ALL
  SELECT doc_id, (doc_id * 13 + 3) % (SELECT N FROM nn) FROM documents)""",
        "deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS outdeg FROM edges GROUP BY src)",
        "c0 AS (SELECT doc_id AS node, 1.0 / (SELECT N FROM nn) AS r FROM documents)",
    ]
    prev = "c0"
    for i in range(1, iters + 1):
        ctes.append(f"""c{i} AS (
  SELECT d.doc_id AS node, COALESCE(m.s, 0) AS r
  FROM documents d LEFT JOIN (
    SELECT e.dst AS node, sum(p.r / g.outdeg) AS s
    FROM edges e JOIN {prev} p ON p.node = e.src JOIN deg g ON g.src = e.src
    GROUP BY e.dst) m ON m.node = d.doc_id)""")
        prev = f"c{i}"
    total = " + ".join(f"c{i}.r" for i in range(iters + 1))
    joins_sql = " ".join(f"JOIN c{i} ON c{i}.node = d.doc_id"
                         for i in range(iters + 1))
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT d.doc_id AS node, ROUND({total}, 6) AS imp"
            + f"\nFROM documents d {joins_sql}")


def pagerank_personalized_sql(iters: int = 3, damping: float = 0.85,
                              seed_mod: int = 20) -> str:
    """Unrolled personalized PageRank over the constructed doc graph:
    identical to pagerank_sql except the teleport base is per-node
    (seeds = doc_id % seed_mod == 0) and r0 = the teleport
    distribution."""
    ctes = [
        "nn AS (SELECT count(*) AS N FROM documents)",
        f"ns AS (SELECT CAST((count(*) + {seed_mod - 1}) // {seed_mod} "
        f"AS BIGINT) AS S FROM documents)",
        """edges AS (
  SELECT doc_id AS src, (doc_id * 7 + 1) % (SELECT N FROM nn) AS dst FROM documents
  UNION ALL
  SELECT doc_id, (doc_id * 13 + 3) % (SELECT N FROM nn) FROM documents)""",
        "deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS outdeg FROM edges GROUP BY src)",
        f"""r0 AS (SELECT doc_id AS node,
  CASE WHEN doc_id % {seed_mod} = 0
       THEN {1.0 - damping} / (SELECT S FROM ns) ELSE 0.0 END AS r
  FROM documents)""",
    ]
    b = (f"CASE WHEN d.doc_id % {seed_mod} = 0 "
         f"THEN {1.0 - damping} / (SELECT S FROM ns) ELSE 0.0 END")
    prev = "r0"
    for i in range(1, iters + 1):
        ctes.append(f"""i{i} AS (
  SELECT d.doc_id AS node, {b} + {damping} * COALESCE(c.s, 0) AS r
  FROM documents d LEFT JOIN (
    SELECT e.dst AS node, sum(p.r / g.outdeg) AS s
    FROM edges e JOIN {prev} p ON p.node = e.src JOIN deg g ON g.src = e.src
    GROUP BY e.dst) c ON c.node = d.doc_id)""")
        prev = f"i{i}"
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node, ROUND(r, 8) AS ppr FROM {prev}")


def hits_sql(iters: int = 2) -> str:
    """Unrolled fixed-iteration unnormalized HITS over the constructed doc
    link graph (same edges as pagerank_sql) — SQL restatement of
    stages/graph.py::hits; every score is an exact BIGINT."""
    ctes = [
        "nn AS (SELECT count(*) AS N FROM documents)",
        """edges AS (
  SELECT doc_id AS src, (doc_id * 7 + 1) % (SELECT N FROM nn) AS dst FROM documents
  UNION ALL
  SELECT doc_id, (doc_id * 13 + 3) % (SELECT N FROM nn) FROM documents)""",
        "h0 AS (SELECT doc_id AS node, CAST(1 AS BIGINT) AS c FROM documents)",
    ]
    prev_h = "h0"
    for i in range(1, iters + 1):
        ctes.append(f"""a{i} AS (
  SELECT e.dst AS node, CAST(sum(p.c) AS BIGINT) AS c
  FROM edges e JOIN {prev_h} p ON p.node = e.src GROUP BY e.dst)""")
        ctes.append(f"""h{i} AS (
  SELECT e.src AS node, CAST(sum(p.c) AS BIGINT) AS c
  FROM edges e JOIN a{i} p ON p.node = e.dst GROUP BY e.src)""")
        prev_h = f"h{i}"
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT d.doc_id AS node,
       COALESCE(a.c, 0) AS auth, COALESCE(h.c, 0) AS hub
FROM documents d
LEFT JOIN a{iters} a ON a.node = d.doc_id
LEFT JOIN h{iters} h ON h.node = d.doc_id""")


# ---------------------------------------------------------------------------
# Sketch oracles (HLL / Count-Min / Bloom): both sides construct the same
# bounded key domain from table columns; per-key hash derivatives (register
# index + rho, CMS cells, Bloom bit positions) are computed HERE from the
# engine's own hash64 and embedded as literals, and the SQL restates the
# sketch SEMANTICS (max-per-register, min-over-rows of colliding sums,
# all-k-bits-set membership incl. false positives) analytically.
# ---------------------------------------------------------------------------

HLL_DOMAIN = 1021   # prime; q_approx_distinct key domain
HLL_P = 8           # 256 registers

CMS_W, CMS_D = 2048, 4
CMS_KEYS = 64       # q_approx_topk key domain (<= cand_factor*k so the
                    # candidate union is provably every present key)

BLOOM_BITS, BLOOM_K = 1024, 7
BLOOM_KEYS = 512    # q_bloom key domain; ~1/3 inserted -> measurable FPs

THETA_K = 48        # q_theta_sketch retained-set size (< present keys on
THETA_KEYS = 512    # both sides at sf0.001+, so the kth-min path is live)


def hll_register_literals() -> str:
    """VALUES hr(kid, idx, rho) for every kid in the q_approx_distinct
    domain, from hash64(f'k{kid}') exactly as hll_add computes them."""
    from cocrawler_ray.stages.sketch import _clz64
    h = hash64([f"k{i}" for i in range(HLL_DOMAIN)])
    p = np.uint64(HLL_P)
    idx = (h >> (np.uint64(64) - p)).astype(np.int64)
    w = h << p
    rho = np.where(w == 0, np.uint64(64 - HLL_P + 1),
                   _clz64(w) + np.uint64(1)).astype(np.int64)
    rows = ", ".join(f"({i}, {int(idx[i])}, {int(rho[i])})"
                     for i in range(HLL_DOMAIN))
    return f"(VALUES {rows}) hr(kid, idx, rho)"


def approx_distinct_sql() -> str:
    """q_approx_distinct: the merged HLL's nonzero registers (integer-
    exact; the float estimate formula is unit-tested separately)."""
    return f"""
WITH present AS (SELECT DISTINCT (event_id * 11 + 5) % {HLL_DOMAIN} AS kid
                 FROM events),
hr AS (SELECT * FROM {hll_register_literals()})
SELECT CAST(hr.idx AS BIGINT) AS reg_idx, CAST(max(hr.rho) AS BIGINT) AS rho
FROM present JOIN hr ON hr.kid = present.kid
GROUP BY hr.idx
"""


def cms_cell_literals() -> str:
    """VALUES cl(kid, r, cell) — each key's Count-Min cell per row, from
    the same Kirsch-Mitzenmacher indices CountMinSketch uses."""
    from cocrawler_ray.stages.sketch import CountMinSketch
    cms = CountMinSketch(CMS_W, CMS_D)
    idx = cms._indices([f"t{i:02d}" for i in range(CMS_KEYS)])
    rows = ", ".join(f"({kid}, {r}, {int(idx[r, kid])})"
                     for kid in range(CMS_KEYS) for r in range(CMS_D))
    return f"(VALUES {rows}) cl(kid, r, cell)"


def approx_topk_sql(k: int = 10) -> str:
    """q_approx_topk: CMS-estimated top-k over a skewed constructed key
    (AND of two uniform 6-bit fields -> heavy mass at small ids). The
    key domain (64) is below cand_factor*k, so every present key is a
    per-block candidate and the result is exactly the sketch ranking:
    est(key) = min over rows of the summed counts colliding in that cell."""
    return f"""
WITH base AS (SELECT ((event_id % 64) & ((event_id // 64) % 64)) AS kid
              FROM events),
cnt AS (SELECT kid, count(*) AS c FROM base GROUP BY kid),
cl AS (SELECT * FROM {cms_cell_literals()}),
cellsum AS (SELECT cl.r, cl.cell, sum(cnt.c) AS s
            FROM cl JOIN cnt ON cnt.kid = cl.kid
            GROUP BY cl.r, cl.cell),
est AS (SELECT cnt.kid, min(cs.s) AS est
        FROM cnt JOIN cl ON cl.kid = cnt.kid
        JOIN cellsum cs ON cs.r = cl.r AND cs.cell = cl.cell
        GROUP BY cnt.kid)
SELECT 't' || lpad(CAST(kid AS VARCHAR), 2, '0') AS key,
       CAST(est AS BIGINT) AS est
FROM est ORDER BY est DESC, key LIMIT {k}
"""


def bloom_bit_literals() -> str:
    """VALUES bp(kid, pi, bit) — every key's k Bloom bit positions, from
    BloomFilter._positions."""
    from cocrawler_ray.stages.sketch import BloomFilter
    bf = BloomFilter(BLOOM_BITS, BLOOM_K)
    pos = bf._positions([f"u{i:03d}" for i in range(BLOOM_KEYS)])
    rows = ", ".join(f"({kid}, {pi}, {int(pos[pi, kid])})"
                     for kid in range(BLOOM_KEYS) for pi in range(BLOOM_K))
    return f"(VALUES {rows}) bp(kid, pi, bit)"


def bloom_sql() -> str:
    """q_bloom: membership of every document key against a Bloom filter
    of the member subset (kid % 3 == 0). hit=1 iff ALL k probe bits land
    in the union of the PRESENT members' bit sets — false positives and
    all (no false negatives by construction)."""
    return f"""
WITH bp AS (SELECT * FROM {bloom_bit_literals()}),
probe AS (SELECT doc_id, doc_id % {BLOOM_KEYS} AS kid FROM documents),
setbits AS (SELECT DISTINCT bp.bit
            FROM (SELECT DISTINCT kid FROM probe WHERE kid % 3 = 0) m
            JOIN bp ON bp.kid = m.kid),
hitc AS (SELECT p.kid, count(*) AS nhit
         FROM (SELECT DISTINCT kid FROM probe) p
         JOIN bp ON bp.kid = p.kid
         JOIN setbits s ON s.bit = bp.bit
         GROUP BY p.kid)
SELECT probe.doc_id,
       CAST(coalesce(h.nhit, 0) = {BLOOM_K} AS BIGINT) AS hit
FROM probe LEFT JOIN hitc h ON h.kid = probe.kid
"""


def theta_hash_literals() -> str:
    """VALUES th(kid, h HUGEINT) — hash64 of every key in the
    q_theta_sketch domain, exactly as ThetaSketch.add computes them."""
    h = hash64([f"k{i:03d}" for i in range(THETA_KEYS)])
    rows = ", ".join(f"({i}, {int(h[i])}::HUGEINT)"
                     for i in range(THETA_KEYS))
    return f"(VALUES {rows}) th(kid, h)"


def theta_sql(k: int = THETA_K) -> str:
    """q_theta_sketch: the UNION theta sketch's retained hashes with
    per-side membership flags — k smallest distinct hashes of
    (A_k ∪ B_k), where A_k / B_k are each side's k smallest distinct
    hashes. Set A = keys touched by even event_ids, B = by event_ids
    divisible by 3 (overlapping but distinct sets, so both flags carry
    information). DISTINCT before the LIMIT on every retained set: if
    two kids collide to one hash value the engine's np.unique keeps it
    once, and the SQL must too."""
    return f"""
WITH th AS (SELECT * FROM {theta_hash_literals()}),
prs_a AS (SELECT DISTINCT (event_id * 7 + 3) % {THETA_KEYS} AS kid
          FROM events WHERE event_id % 2 = 0),
prs_b AS (SELECT DISTINCT (event_id * 11 + 5) % {THETA_KEYS} AS kid
          FROM events WHERE event_id % 3 = 0),
ha AS (SELECT DISTINCT h FROM th JOIN prs_a USING (kid)
       ORDER BY h LIMIT {k}),
hb AS (SELECT DISTINCT h FROM th JOIN prs_b USING (kid)
       ORDER BY h LIMIT {k}),
u AS (SELECT DISTINCT h
      FROM (SELECT h FROM ha UNION ALL SELECT h FROM hb)
      ORDER BY h LIMIT {k})
SELECT {to_i64('u.h')} AS h,
       CAST(u.h IN (SELECT h FROM ha) AS BIGINT) AS in_a,
       CAST(u.h IN (SELECT h FROM hb) AS BIGINT) AS in_b
FROM u
"""


def conformance_letterbox_images(n: int = N_IMAGES):
    """16x16 images whose BLACK BORDERS are analytic in d — top = d % 4,
    bottom = (d//4) % 4, left = (d//16) % 4, right = (d//7) % 4 (a
    divisor coprime to the others so ALL FOUR borders vary within the
    64-image corpus) — and
    whose interior pixels are 16 + formula % 240 (never below 16, so
    every interior row/column carries signal through every codec: qnt
    decodes interior >= 20, border 0 -> 4, both sides of the engine's
    p < 8 black threshold). The q_box_blur two-independent-algorithms
    pattern: the engine SCANS decoded pixels for the content box, the
    oracle restates the closed form."""
    import pyarrow as pa

    from cocrawler_ray import codecs
    ids, data, ws, hs, fmts = [], [], [], [], []
    w = h = 16
    y, x = np.mgrid[0:h, 0:w]
    for d in range(n):
        img = np.empty((h, w, 3), dtype=np.uint8)
        for ch in range(3):
            img[:, :, ch] = (16 + (x * 3 + y * 5 + ch * 11 + d * 17
                                   + ((x * y + d) % 31) * 7) % 240
                             ).astype(np.uint8)
        t_, b_ = d % 4, (d // 4) % 4
        l_, r_ = (d // 16) % 4, (d // 7) % 4
        if t_:
            img[:t_, :, :] = 0
        if b_:
            img[h - b_:, :, :] = 0
        if l_:
            img[:, :l_, :] = 0
        if r_:
            img[:, w - r_:, :] = 0
        fmt = codecs.FORMATS[d % 3]
        ids.append(f"img{d:04d}")
        data.append(codecs.encode(img, fmt))
        ws.append(w); hs.append(h); fmts.append(fmt)
    return pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(data, pa.binary()),
        "w": pa.array(np.array(ws, dtype=np.int32)),
        "h": pa.array(np.array(hs, dtype=np.int32)),
        "fmt": pa.array(fmts, pa.string()),
    })


def letterbox_sql(n: int = N_IMAGES) -> str:
    """q_letterbox: the fixture's closed-form border widths (the engine
    derives the same numbers by scanning decoded pixels)."""
    return f"""
WITH ids AS (SELECT unnest(generate_series(0, {n - 1})) AS d)
SELECT 'img' || lpad(CAST(d AS VARCHAR), 4, '0') AS image_id,
       CAST(d % 4 AS BIGINT) AS top_px,
       CAST((d // 4) % 4 AS BIGINT) AS bot_px,
       CAST((d // 16) % 4 AS BIGINT) AS left_px,
       CAST((d // 7) % 4 AS BIGINT) AS right_px,
       CAST(16 - (d // 16) % 4 - (d // 7) % 4 AS BIGINT) AS inner_w,
       CAST(16 - d % 4 - (d // 4) % 4 AS BIGINT) AS inner_h
FROM ids
"""


def letterbox_crop_sql(n: int = N_IMAGES) -> str:
    """q_letterbox_crop: restate the letterbox fixture's pixels (interior
    16 + formula % 240, borders 0, qnt decode for d % 3 = 2), then the
    cropped-box dimensions AND the integer pixel sum over the box — a
    checksum that the engine's crop took exactly the content box."""
    formula = ("16 + (x * 3 + y * 5 + ch * 11 + d * 17"
               " + ((x * y + d) % 31) * 7) % 240")
    return f"""
WITH ids AS (SELECT unnest(generate_series(0, {n - 1})) AS d),
b AS (SELECT d, d % 4 AS t_, (d // 4) % 4 AS b_,
             (d // 16) % 4 AS l_, (d // 7) % 4 AS r_
      FROM ids),
xs AS (SELECT d, t_, b_, l_, r_, unnest(generate_series(0, 15)) AS x
       FROM b),
ys AS (SELECT d, t_, b_, l_, r_, x, unnest(generate_series(0, 15)) AS y
       FROM xs),
raw AS (SELECT d, t_, b_, l_, r_, x, y, ch,
               CASE WHEN x < l_ OR x >= 16 - r_
                         OR y < t_ OR y >= 16 - b_
                    THEN 0 ELSE {formula} END AS p0
        FROM ys CROSS JOIN (SELECT unnest([0,1,2]) AS ch) c),
dec AS (SELECT d, t_, b_, l_, r_, x, y,
               CASE WHEN d % 3 = 2 THEN (p0 // 8) * 8 + 4 ELSE p0 END AS p
        FROM raw)
SELECT 'img' || lpad(CAST(d AS VARCHAR), 4, '0') AS image_id,
       CAST(16 - l_ - r_ AS BIGINT) AS new_w,
       CAST(16 - t_ - b_ AS BIGINT) AS new_h,
       CAST(sum(CASE WHEN x >= l_ AND x < 16 - r_
                      AND y >= t_ AND y < 16 - b_ THEN p ELSE 0 END)
            AS BIGINT) AS px_sum
FROM dec GROUP BY d, t_, b_, l_, r_
"""


def conformance_captioned_images(n: int = N_IMAGES):
    """The decode corpus + a deterministic color-word caption per image
    (caption token counts are a pure function of d, so the SQL mirror
    restates them analytically while the Ray stage parses the string)."""
    import pyarrow as pa
    t = conformance_images(n)
    caps = ["a photo of " + "red " * (1 + d % 3)
            + "green " * (1 + (d // 3) % 3)
            + "blue " * (1 + (d // 9) % 3) + f"scene{d}"
            for d in range(n)]
    return t.append_column("caption", pa.array(caps, pa.string()))


def clip_score_sql(n: int = N_IMAGES, threshold: float = 0.93) -> str:
    """CLIP-score gate mirror: pixel-formula channel means (dyadic-exact)
    x analytic caption counts -> cosine; same left-associated double
    arithmetic as ClipScoreGate.__call__; gate on the UNROUNDED score."""
    caption = ("'a photo of ' || repeat('red ', 1 + d % 3) || "
               "repeat('green ', 1 + (d // 3) % 3) || "
               "repeat('blue ', 1 + (d // 9) % 3) || 'scene' || CAST(d AS VARCHAR)")
    return f"""
WITH {_px_ctes(n)},
stats AS (SELECT d, avg(CASE WHEN ch = 0 THEN p END) AS mr,
                 avg(CASE WHEN ch = 1 THEN p END) AS mg,
                 avg(CASE WHEN ch = 2 THEN p END) AS mb
          FROM px GROUP BY d),
cap AS (SELECT d, CAST(1 + d % 3 AS DOUBLE) AS cr,
               CAST(1 + (d // 3) % 3 AS DOUBLE) AS cg,
               CAST(1 + (d // 9) % 3 AS DOUBLE) AS cb
        FROM ids),
sc AS (SELECT s.d,
              (s.mr * c.cr + s.mg * c.cg + s.mb * c.cb)
                  / (sqrt(s.mr * s.mr + s.mg * s.mg + s.mb * s.mb)
                     * sqrt(c.cr * c.cr + c.cg * c.cg + c.cb * c.cb)) AS score
       FROM stats s JOIN cap c ON c.d = s.d)
SELECT 'img' || lpad(CAST(d AS VARCHAR), 4, '0') AS image_id,
       {caption} AS caption,
       round(score, 6) AS clip_score
FROM sc WHERE score > {threshold}::DOUBLE
"""


# ---------------------------------------------------------------------------
# q_cdc_chunks oracle (content-defined chunking)
# ---------------------------------------------------------------------------

def cdc_sql(mask: int = 63) -> str:
    """Restate dedup.cdc_chunk_payloads analytically: regenerate the byte
    formula, roll the 4-byte polynomial with lag()+mulmod, derive chunk
    ids from a shifted windowed sum of cut flags, and xor-fold the
    position-salted splitmix chunk hash in 32-bit halves (the
    fingerprint_sql fold)."""
    cdc_a = 1000003
    cdc_b = 0x5851F42D4C957F2D
    acc = "b3"
    for nxt in ("b2", "b1", "b"):
        acc = f"(({mulmod(acc, POLY)}) + {nxt}) % {M64}"
    x = f"((b * {cdc_a}::HUGEINT + rel::HUGEINT * {cdc_b}::HUGEINT) % {M64})"
    sm, sm_final = splitmix_ctes("relq", "d, chunk_ix", x, "smx", "cdc")
    return f"""
WITH ids AS (SELECT doc_id AS d FROM documents),
jj AS (SELECT d, unnest(generate_series(0, (40 + (d * 13) % 200) - 1)) AS j
       FROM ids),
byt AS (SELECT d, j, ((d * 7 + j * 31 + (j * j) % 29) % 256)::HUGEINT AS b
        FROM jj),
r AS (SELECT d, j, b, lag(b, 3) OVER w AS b3, lag(b, 2) OVER w AS b2,
             lag(b, 1) OVER w AS b1
      FROM byt WINDOW w AS (PARTITION BY d ORDER BY j)),
c AS (SELECT d, j, b,
             CASE WHEN b3 IS NOT NULL AND ({acc}) % {mask + 1} = 0
                  THEN 1 ELSE 0 END AS cut
      FROM r),
ch AS (SELECT d, j, b,
              CAST(coalesce(sum(cut) OVER (PARTITION BY d ORDER BY j
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS chunk_ix
       FROM c),
relq AS (SELECT d, chunk_ix, j, b,
                j - min(j) OVER (PARTITION BY d, chunk_ix) AS rel
         FROM ch),
{sm},
folded AS (SELECT d, chunk_ix,
                  bit_xor(CAST(smx // {H32} AS BIGINT)) AS xhi,
                  bit_xor(CAST(smx % {H32} AS BIGINT)) AS xlo
           FROM {sm_final} GROUP BY d, chunk_ix),
meta AS (SELECT d, chunk_ix, CAST(min(j) AS BIGINT) AS "start",
                CAST(count(*) AS BIGINT) AS length
         FROM ch GROUP BY d, chunk_ix)
SELECT m.d AS doc_id, m.chunk_ix, m."start", m.length,
       {to_i64(f"(xhi::HUGEINT * {H32} + xlo::HUGEINT)")} AS chunk_hash
FROM meta m JOIN folded f ON m.d = f.d AND m.chunk_ix = f.chunk_ix
"""


def sharpness_sql(n: int = N_IMAGES,
                  threshold_micro: int = 776_000_000_000) -> str:
    """q_sharpness_gate: variance-of-Laplacian restated over the decoded
    pixel formula — gray = channel sum, 4-neighbour Laplacian via an
    offset/weight join (HAVING count(*)=5 keeps interior pixels only),
    then the exact integer micro-variance (m*ss - s^2)*10^6 // m^2 in
    HUGEINT so the intermediate never wraps."""
    return f"""
WITH {_px_ctes(n)},
g3 AS (SELECT d, x, y, sum(p) AS s3 FROM px GROUP BY d, x, y),
loff AS (SELECT * FROM (VALUES (0,0,4),(1,0,-1),(-1,0,-1),
                               (0,1,-1),(0,-1,-1)) t(dx, dy, wt)),
lap AS (SELECT g.d, g.x, g.y, sum(nb.s3 * o.wt) AS L
        FROM g3 g CROSS JOIN loff o
        JOIN g3 nb ON nb.d = g.d AND nb.x = g.x + o.dx
                  AND nb.y = g.y + o.dy
        GROUP BY g.d, g.x, g.y HAVING count(*) = 5),
st AS (SELECT d, count(*)::HUGEINT AS m, sum(L)::HUGEINT AS s,
              sum(L * L)::HUGEINT AS ss
       FROM lap GROUP BY d),
v AS (SELECT d, CAST((m * ss - s * s) * 1000000 // (m * m) AS BIGINT)
               AS var_micro
      FROM st)
SELECT 'img' || lpad(CAST(d AS VARCHAR), 4, '0') AS image_id,
       var_micro, var_micro > {threshold_micro} AS sharp
FROM v
"""


def edge_density_sql(n: int = N_IMAGES, mag_threshold: int = 800,
                     frac_permille: int = 570) -> str:
    """q_edge_density: 3x3 Sobel restated via a 9-offset join on the
    gray-sum CTE with inline kernel weights wx = dx*(2-|dy|),
    wy = dy*(2-|dx|); interior pixels are the ones with all 9
    neighbours. Edge census + the integer cross-multiplied density
    gate (1000*edge_px > permille*n_int — no float division)."""
    return f"""
WITH {_px_ctes(n)},
g3 AS (SELECT d, x, y, sum(p) AS s3 FROM px GROUP BY d, x, y),
soff AS (SELECT a.dx, b.dy
         FROM (VALUES (-1),(0),(1)) a(dx)
         CROSS JOIN (VALUES (-1),(0),(1)) b(dy)),
sob AS (SELECT g.d, g.x, g.y,
               sum(nb.s3 * o.dx * (2 - abs(o.dy))) AS gx,
               sum(nb.s3 * o.dy * (2 - abs(o.dx))) AS gy
        FROM g3 g CROSS JOIN soff o
        JOIN g3 nb ON nb.d = g.d AND nb.x = g.x + o.dx
                  AND nb.y = g.y + o.dy
        GROUP BY g.d, g.x, g.y HAVING count(*) = 9),
per AS (SELECT d,
               CAST(sum(CASE WHEN abs(gx) + abs(gy) > {mag_threshold}
                             THEN 1 ELSE 0 END) AS BIGINT) AS edge_px,
               CAST(count(*) AS BIGINT) AS n_int
        FROM sob GROUP BY d)
SELECT 'img' || lpad(CAST(d AS VARCHAR), 4, '0') AS image_id,
       edge_px, n_int,
       1000 * edge_px > {frac_permille} * n_int AS dense_edges
FROM per
"""


def augment_checksum_sql(n: int = N_IMAGES) -> str:
    """q_augment_checksum: the flip / rot90-clockwise position-weighted
    checksums restated in SOURCE coordinates — a source pixel (x, y, ch)
    lands at flipped position (w-1-x, y) and at rotated position
    (col h-1-y, row x) of an (h x w)-swapped frame, so
    chk_flip = sum p*(1 + (w-1-x) + y*w + ch*w*h) and
    chk_rot = sum p*(1 + (h-1-y) + x*h + ch*w*h). Any axis swap or
    off-by-one in the engine's transform shifts the weights and breaks
    the sum."""
    return f"""
WITH {_px_ctes(n)},
dims AS (SELECT d, 16 * (1 + d % 2) AS w, 16 * (1 + (d // 2) % 2) AS h
         FROM (SELECT DISTINCT d FROM px)),
t AS (SELECT p.d, p.p, p.x, p.y, p.ch, m.w, m.h
      FROM px p JOIN dims m ON m.d = p.d)
SELECT 'img' || lpad(CAST(d AS VARCHAR), 4, '0') AS image_id,
       CAST(sum(p * (1 + (w - 1 - x) + y * w + ch * w * h))
            AS BIGINT) AS chk_flip,
       CAST(sum(p * (1 + (h - 1 - y) + x * h + ch * w * h))
            AS BIGINT) AS chk_rot,
       CAST(any_value(h) AS BIGINT) AS rot_w,
       CAST(any_value(w) AS BIGINT) AS rot_h
FROM t GROUP BY d
"""


def mip_pyramid_sql(n: int = N_IMAGES, levels: int = 2) -> str:
    """q_mip_pyramid: nested floor-mean 2x2 downsampling restated as
    chained GROUP BY (x//2, y//2) CTEs with sum(p)//4 — the same exact
    integer rounding as the engine's level loop — plus the
    position-weighted checksum (1 + x + y*lw + ch*lw*lh) per level."""
    lvl_ctes, selects = [], []
    for lv in range(levels + 1):
        src = "px" if lv == 0 else f"l{lv - 1}"
        if lv == 0:
            lvl_ctes.append(
                "l0 AS (SELECT d, ch, x, y, p FROM px)")
        else:
            # fixture dims are 16/32 so every level halves evenly; the
            # engine's odd-trailing-drop never binds on this corpus
            lvl_ctes.append(
                f"l{lv} AS (SELECT d, ch, x // 2 AS x, y // 2 AS y, "
                f"sum(p) // 4 AS p FROM {src} "
                f"GROUP BY d, ch, x // 2, y // 2)")
        w_expr = f"(16 * (1 + d % 2)) // {2 ** lv}"
        h_expr = f"(16 * (1 + (d // 2) % 2)) // {2 ** lv}"
        selects.append(f"""
SELECT 'img' || lpad(CAST(d AS VARCHAR), 4, '0') AS image_id,
       CAST({lv} AS BIGINT) AS level,
       CAST({w_expr} AS BIGINT) AS lw, CAST({h_expr} AS BIGINT) AS lh,
       CAST(sum(p * (1 + x + y * ({w_expr})
                     + ch * ({w_expr}) * ({h_expr}))) AS BIGINT) AS chk
FROM l{lv} GROUP BY d""")
    return (f"WITH {_px_ctes(n)},\n" + ",\n".join(lvl_ctes)
            + "\nSELECT * FROM (" + "\nUNION ALL".join(selects) + ") u")


def gamma_lut_sql(n: int = N_IMAGES, highlight: int = 200) -> str:
    """q_gamma_hist: the gamma-0.5 transfer curve restated as
    floor(sqrt(255*p)) — exact for p in [0, 255] (perfect squares are
    exact in double, non-squares are >= 2e-3 from an integer) — with
    the same per-image sum + highlight census as the engine's LUT."""
    return f"""
WITH {_px_ctes(n)},
g AS (SELECT d, CAST(floor(sqrt(255.0 * p)) AS BIGINT) AS c FROM px)
SELECT 'img' || lpad(CAST(d AS VARCHAR), 4, '0') AS image_id,
       CAST(sum(c) AS BIGINT) AS gamma_sum,
       CAST(sum(CASE WHEN c > {highlight} THEN 1 ELSE 0 END)
            AS BIGINT) AS highlight_px
FROM g GROUP BY d
"""


def keyframe_select_sql(n: int = N_VIDEOS, frames: int = VIDEO_FRAMES,
                        threshold: int = 45) -> str:
    """q_keyframe_select: the SceneCut x SharpnessGate composition
    restated end to end — SAD cuts from the frame-pair formula join,
    scene_id as a running cut count (frame 0 opens scene 0), Laplacian
    micro-variance per frame via the 5-offset join, then the sharpest
    frame per scene by window rank (tie -> earliest frame). Every gate
    and score is integer, so the full composition hashes exactly."""
    npx = VIDEO_W * VIDEO_H * 3
    return f"""
WITH v AS (SELECT unnest(generate_series(0, {n - 1})) AS vid),
fr AS (SELECT vid, unnest(generate_series(0, {frames - 1})) AS fi FROM v),
xs AS (SELECT vid, fi, unnest(generate_series(0, {VIDEO_W - 1})) AS x
       FROM fr),
ys AS (SELECT vid, fi, x, unnest(generate_series(0, {VIDEO_H - 1})) AS y
       FROM xs),
px AS (SELECT vid, fi, x, y, ch,
              (x*3 + y*5 + ch*11 + (vid*101 + fi)*17
               + ((x*y + vid*101 + fi) % 31) * 7) % 256 AS p
       FROM ys CROSS JOIN (SELECT unnest([0,1,2]) AS ch) c),
sadpx AS (SELECT a.vid, a.fi, sum(abs(a.p - b.p)) AS sad
          FROM px a JOIN px b ON b.vid = a.vid AND b.fi = a.fi - 1
                             AND b.x = a.x AND b.y = a.y AND b.ch = a.ch
          WHERE a.fi >= 1 GROUP BY a.vid, a.fi),
cuts AS (SELECT vid, fi, sad >= {threshold} * {npx} AS cut FROM sadpx),
scn AS (SELECT f.vid, f.fi,
               sum(CASE WHEN c.cut THEN 1 ELSE 0 END)
                   OVER (PARTITION BY f.vid ORDER BY f.fi) AS scene_id
        FROM fr f LEFT JOIN cuts c ON c.vid = f.vid AND c.fi = f.fi),
g3 AS (SELECT vid, fi, x, y, sum(p) AS s3 FROM px
       GROUP BY vid, fi, x, y),
loff AS (SELECT * FROM (VALUES (0,0,4),(1,0,-1),(-1,0,-1),
                               (0,1,-1),(0,-1,-1)) t(dx, dy, wt)),
lap AS (SELECT g.vid, g.fi, g.x, g.y, sum(nb.s3 * o.wt) AS L
        FROM g3 g CROSS JOIN loff o
        JOIN g3 nb ON nb.vid = g.vid AND nb.fi = g.fi
                  AND nb.x = g.x + o.dx AND nb.y = g.y + o.dy
        GROUP BY g.vid, g.fi, g.x, g.y HAVING count(*) = 5),
st AS (SELECT vid, fi, count(*)::HUGEINT AS m, sum(L)::HUGEINT AS s,
              sum(L * L)::HUGEINT AS ss
       FROM lap GROUP BY vid, fi),
vr AS (SELECT vid, fi,
              CAST((m * ss - s * s) * 1000000 // (m * m) AS BIGINT)
                  AS var_micro
       FROM st),
j AS (SELECT s.vid, s.scene_id, s.fi, w.var_micro,
             row_number() OVER (PARTITION BY s.vid, s.scene_id
                                ORDER BY w.var_micro DESC, s.fi) AS rn,
             count(*) OVER (PARTITION BY s.vid, s.scene_id)
                 AS scene_len
      FROM scn s JOIN vr w ON w.vid = s.vid AND w.fi = s.fi)
SELECT 'vid' || lpad(CAST(vid AS VARCHAR), 4, '0') AS video_id,
       CAST(scene_id AS BIGINT) AS scene_id,
       CAST(fi AS BIGINT) AS key_frame, var_micro,
       CAST(scene_len AS BIGINT) AS scene_len
FROM j WHERE rn = 1
"""


def conformance_silence_payloads(n: int = N_PAYLOADS,
                                 length: int = PAYLOAD_LEN):
    """Audio payloads whose SILENCE BORDERS are analytic in d — front =
    (d % 6) * 32 samples at DC (128), tail = ((d // 6) % 5) * 32, every
    13th payload entirely silent — and whose middle samples are
    144 + formula % 100 (offset >= 16 from DC, so signal survives the
    |s - 128| >= 8 gate with margin). The letterbox pattern on the audio
    axis: the engine SCANS samples for the signal span, the oracle
    restates the closed form."""
    import pyarrow as pa
    ids, data = [], []
    for d in range(n):
        if d % 13 == 0:
            s = np.full(length, 128, np.uint8)
        else:
            i = np.arange(length, dtype=np.int64)
            s = (144 + (d * 31 + i * 7 + ((i * i) % 97) * 5) % 100) \
                .astype(np.uint8)
            f = (d % 6) * 32
            t = (d // 6) % 5 * 32
            if f:
                s[:f] = 128
            if t:
                s[length - t:] = 128
        ids.append(f"img{d:04d}")
        data.append(s.tobytes())
    return pa.table({"image_id": pa.array(ids, pa.string()),
                     "bytes": pa.array(data, pa.binary())})


def silence_trim_sql(n: int = N_PAYLOADS, length: int = PAYLOAD_LEN) -> str:
    """q_audio_trim: closed-form silence borders + the exact integer
    energy of the trimmed span (sum (s - 128)^2 over the signal
    samples); all-silent payloads restate as (length, 0, 0, 0) —
    the letterbox all-black convention."""
    return f"""
WITH ids AS (SELECT unnest(generate_series(0, {n - 1})) AS d),
b AS (SELECT d,
             CASE WHEN d % 13 = 0 THEN {length} ELSE (d % 6) * 32 END
                 AS front,
             CASE WHEN d % 13 = 0 THEN 0 ELSE ((d // 6) % 5) * 32 END
                 AS tail
      FROM ids),
mid AS (SELECT b.d, b.front, b.tail,
               (16 + (b.d * 31 + i * 7 + ((i * i) % 97) * 5) % 100)
                   AS v
        FROM b, unnest(generate_series(0, {length - 1})) t(i)
        WHERE b.d % 13 <> 0 AND i >= b.front AND i < {length} - b.tail)
SELECT 'img' || lpad(CAST(b.d AS VARCHAR), 4, '0') AS image_id,
       CAST(b.front AS BIGINT) AS front_n,
       CAST(b.tail AS BIGINT) AS tail_n,
       CAST({length} - b.front - b.tail AS BIGINT) AS signal_n,
       CAST(COALESCE(sum(m.v * m.v), 0) AS BIGINT) AS signal_energy
FROM b LEFT JOIN mid m ON m.d = b.d
GROUP BY b.d, b.front, b.tail
"""


def bpe_merges_sql(rounds: int = 3) -> str:
    """q_bpe_merges: the three-round BPE training loop restated in
    unrolled SQL — word census from trim/regexp-split (the vocab_build
    discipline), per-round overlapping pair counts via list
    comprehension, best pair by (count DESC, l, r), greedy
    left-to-right application as gaps-and-islands + run parity (a run
    of consecutive match positions means l == r; the greedy scan takes
    the odd-ranked members of each run), and the corpus token count
    after each merge."""
    sql = """
WITH docs AS (SELECT regexp_split_to_array(trim(text), '\\s+') AS ws
              FROM documents WHERE trim(text) <> ''),
wtab AS (SELECT w, CAST(count(*) AS BIGINT) AS n
         FROM (SELECT unnest(ws) AS w FROM docs) GROUP BY w),
s0 AS (SELECT w, n, regexp_split_to_array(w, '') AS s FROM wtab)"""
    for k in range(rounds):
        sql += f""",
p{k} AS (SELECT pr[1] AS l, pr[2] AS r, sum(n) AS cnt
         FROM (SELECT n, unnest([[s[i], s[i + 1]]
                       for i in generate_series(1, len(s) - 1)]) AS pr
               FROM s{k}) GROUP BY l, r),
b{k} AS (SELECT l, r, CAST(cnt AS BIGINT) AS cnt FROM p{k}
         ORDER BY cnt DESC, l, r LIMIT 1),
m{k} AS (SELECT w, i, i - row_number() OVER (PARTITION BY w ORDER BY i)
                       AS isl
         FROM s{k}, b{k},
              unnest(generate_series(1, len(s) - 1)) t(i)
         WHERE s[i] = b{k}.l AND s[i + 1] = b{k}.r),
mm{k} AS (SELECT w, i FROM
          (SELECT w, i,
                  row_number() OVER (PARTITION BY w, isl ORDER BY i) AS o
           FROM m{k}) WHERE o % 2 = 1),
s{k + 1} AS (
  SELECT t.w, t.n, list(CASE WHEN mm.i IS NOT NULL
                              THEN t.s[j] || t.s[j + 1]
                              ELSE t.s[j] END ORDER BY j) AS s
  FROM (SELECT w, n, s, unnest(generate_series(1, len(s))) AS j
        FROM s{k}) t
  LEFT JOIN mm{k} mm ON mm.w = t.w AND mm.i = t.j
  LEFT JOIN mm{k} prev ON prev.w = t.w AND prev.i = t.j - 1
  WHERE prev.i IS NULL
  GROUP BY t.w, t.n)"""
    sel = "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS BIGINT) AS round, b{k}.l AS left_sym, "
        f"b{k}.r AS right_sym, b{k}.cnt AS pair_n, "
        f"(SELECT CAST(sum(n * len(s)) AS BIGINT) FROM s{k + 1}) "
        f"AS tokens_after FROM b{k}" for k in range(rounds))
    return sql + "\nSELECT * FROM (" + sel + ") u"


def rle_runs_sql(n: int = N_IMAGES, threshold: int = 380) -> str:
    """q_rle_runs: row-wise RLE run census restated via a lag() window
    over the thresholded gray-sum — a run starts where prev IS NULL
    (row head) or the foreground bit flips; the compressibility gate is
    the integer cross-multiplication 2*n_runs < n_px."""
    return f"""
WITH {_px_ctes(n)},
g3 AS (SELECT d, x, y, sum(p) AS s3 FROM px GROUP BY d, x, y),
m AS (SELECT d, x, y, CASE WHEN s3 > {threshold} THEN 1 ELSE 0 END AS b
      FROM g3),
r AS (SELECT d, y, b,
             lag(b) OVER (PARTITION BY d, y ORDER BY x) AS prev
      FROM m),
per AS (SELECT d,
               CAST(sum(CASE WHEN prev IS NULL THEN 1
                             WHEN b <> prev THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_runs,
               CAST(count(*) AS BIGINT) AS n_px
        FROM r GROUP BY d)
SELECT 'img' || lpad(CAST(d AS VARCHAR), 4, '0') AS image_id,
       n_runs, n_px, 2 * n_runs < n_px AS rle_saves
FROM per
"""


def blob_count_sql(n: int = N_IMAGES, threshold: int = 640) -> str:
    """q_blob_count: 4-connected components restated as recursive
    min-label propagation — every foreground pixel seeds its own label,
    the recursive step carries any neighbour's label across Manhattan-
    distance-1 edges (UNION dedups, so the fixpoint is the full
    label-reachability set), min per pixel is its component id, and
    count(DISTINCT) per image is the blob census. Row volume is
    sum(component_size^2) — measured 15k at threshold 640 over the
    64-image conformance corpus."""
    return f"""
WITH RECURSIVE {_px_ctes(n)},
g3 AS (SELECT d, x, y, sum(p) AS s3 FROM px GROUP BY d, x, y),
base AS (SELECT d, x, y FROM g3 WHERE s3 > {threshold}),
lab AS (
    SELECT d, x, y, y * 64 + x AS l FROM base
    UNION
    SELECT b.d, b.x, b.y, lab.l
    FROM lab JOIN base b ON b.d = lab.d
         AND abs(b.x - lab.x) + abs(b.y - lab.y) = 1
),
ml AS (SELECT d, x, y, min(l) AS l FROM lab GROUP BY 1, 2, 3)
SELECT 'img' || lpad(CAST(d AS VARCHAR), 4, '0') AS image_id,
       CAST(count(DISTINCT l) AS BIGINT) AS n_blobs,
       CAST(count(*) AS BIGINT) AS n_fg
FROM ml GROUP BY d
"""


def random_projection_sql(k: int = 16, dim: int = 64, seed: int = 29) -> str:
    """q_random_projection: Johnson-Lindenstrauss sketch restated as k
    literal Rademacher (+-1) dot products over the quantized vectors —
    both sides generate the SAME plane matrix from rademacher_planes,
    and a +-1 dot over |q|<=1000 milli-units stays exactly
    representable in the DOUBLE accumulator (|proj| <= 64000)."""
    planes = rademacher_planes(k, dim, seed)
    cols = ",\n       ".join(
        "CAST(list_dot_product(CAST(q AS DOUBLE[]), ["
        + ", ".join(f"{v}.0" for v in planes[i])
        + f"]) AS BIGINT) AS p{i}"
        for i in range(k))
    return f"""
WITH e AS (SELECT vec_id, {_quant_sql('embedding')} AS q FROM embeddings)
SELECT vec_id,
       {cols}
FROM e
"""


def kmeans_update_sql(stride: int = 37, max_centroids: int = 256,
                      dim: int = 64) -> str:
    """q_kmeans_update: one Lloyd update step restated with NO division
    (DuckDB // truncates while numpy floors, so the centroid shift is
    the cross-multiplied drift_num = sum_j (n*c_j - S_j)^2 — exactly
    n^2 * ||c - mean||^2 in milli-unit^2). inertia is the within-
    cluster sum of the integer squared-L2 the assignment minimizes."""
    d2 = ("CAST(list_dot_product(CAST(a.q AS DOUBLE[]), CAST(a.q AS DOUBLE[]))"
          " - 2 * list_dot_product(CAST(a.q AS DOUBLE[]), CAST(c.cq AS DOUBLE[]))"
          " + list_dot_product(CAST(c.cq AS DOUBLE[]), CAST(c.cq AS DOUBLE[])) AS BIGINT)")
    ssum = ", ".join(f"CAST(sum(q[{j + 1}]) AS BIGINT) AS s{j}"
                     for j in range(dim))
    drift = " + ".join(f"(g.n * c.cq[{j + 1}] - g.s{j})"
                       f" * (g.n * c.cq[{j + 1}] - g.s{j})"
                       for j in range(dim))
    return f"""
WITH e AS (SELECT vec_id, {_quant_sql('embedding')} AS q FROM embeddings),
cent AS (SELECT vec_id AS cid, q AS cq FROM e
         WHERE vec_id % {stride} = 1 AND vec_id < {stride * max_centroids}),
a AS (SELECT a.vec_id, c.cid, {d2} AS d2, a.q
      FROM e a CROSS JOIN cent c
      QUALIFY row_number() OVER (PARTITION BY a.vec_id
                                 ORDER BY d2, c.cid) = 1),
g AS (SELECT cid, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(d2) AS BIGINT) AS inertia, {ssum}
      FROM a GROUP BY 1)
SELECT g.cid, g.n AS n_members, g.inertia,
       CAST({drift} AS BIGINT) AS drift_num
FROM g JOIN cent c ON c.cid = g.cid
"""


def haar_energy_sql(n: int = N_IMAGES) -> str:
    """q_haar_energy: level-1 Haar detail energies restated as signed
    2x2 block sums over the gray-sum CTE — weights (1-2*(x%2)),
    (1-2*(y%2)) and their product pick out the HL/LH/HH details; per-
    image energy is the sum of squared block details."""
    return f"""
WITH {_px_ctes(n)},
g3 AS (SELECT d, x, y, sum(p) AS s3 FROM px GROUP BY d, x, y),
blk AS (SELECT d, x // 2 AS bx, y // 2 AS by,
               CAST(sum(s3 * (1 - 2 * (x % 2)) * (1 - 2 * (y % 2)))
                    AS BIGINT) AS hh,
               CAST(sum(s3 * (1 - 2 * (y % 2))) AS BIGINT) AS lh,
               CAST(sum(s3 * (1 - 2 * (x % 2))) AS BIGINT) AS hl
        FROM g3 GROUP BY 1, 2, 3)
SELECT 'img' || lpad(CAST(d AS VARCHAR), 4, '0') AS image_id,
       CAST(sum(hh * hh) AS BIGINT) AS e_hh,
       CAST(sum(lh * lh) AS BIGINT) AS e_lh,
       CAST(sum(hl * hl) AS BIGINT) AS e_hl
FROM blk GROUP BY d
"""


def audio_decimate_sql(n: int = N_PAYLOADS, length: int = PAYLOAD_LEN) -> str:
    """q_audio_decimate: 2:1 decimation restated over the even-index
    half of the payload formula; energy is DC-centered, the checksum is
    position-weighted over the DECIMATED index (1 + i//2) so a stride
    or phase error breaks it."""
    return f"""
WITH ids AS (SELECT unnest(generate_series(0, {n - 1})) AS d),
by AS (SELECT d, unnest(generate_series(0, {length - 1})) AS i FROM ids),
k AS (SELECT d, i, {_BYTE_SQL} AS v FROM by WHERE i % 2 = 0)
SELECT 'img' || lpad(CAST(d AS VARCHAR), 4, '0') AS image_id,
       CAST(count(*) AS BIGINT) AS n_out,
       CAST(sum((v - 128) * (v - 128)) AS BIGINT) AS energy,
       CAST(sum(v * (1 + i // 2)) AS BIGINT) AS chk
FROM k GROUP BY d
"""


def orientation_census_sql(n: int = N_IMAGES, mag_threshold: int = 800) -> str:
    """q_orientation_census: the edge-density Sobel restated (same
    9-offset join) with edge pixels bucketed by the gradient sign
    quadrant 2*(gx>0) + (gy>0) — a wrong kernel sign flips a bucket."""
    return f"""
WITH {_px_ctes(n)},
g3 AS (SELECT d, x, y, sum(p) AS s3 FROM px GROUP BY d, x, y),
soff AS (SELECT a.dx, b.dy
         FROM (VALUES (-1),(0),(1)) a(dx)
         CROSS JOIN (VALUES (-1),(0),(1)) b(dy)),
sob AS (SELECT g.d, g.x, g.y,
               sum(nb.s3 * o.dx * (2 - abs(o.dy))) AS gx,
               sum(nb.s3 * o.dy * (2 - abs(o.dx))) AS gy
        FROM g3 g CROSS JOIN soff o
        JOIN g3 nb ON nb.d = g.d AND nb.x = g.x + o.dx
                  AND nb.y = g.y + o.dy
        GROUP BY g.d, g.x, g.y HAVING count(*) = 9),
e AS (SELECT d, abs(gx) + abs(gy) > {mag_threshold} AS edge,
               2 * CASE WHEN gx > 0 THEN 1 ELSE 0 END
               + CASE WHEN gy > 0 THEN 1 ELSE 0 END AS q
      FROM sob)
SELECT 'img' || lpad(CAST(d AS VARCHAR), 4, '0') AS image_id,
       CAST(sum(CASE WHEN edge AND q = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b0,
       CAST(sum(CASE WHEN edge AND q = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b1,
       CAST(sum(CASE WHEN edge AND q = 2 THEN 1 ELSE 0 END) AS BIGINT) AS b2,
       CAST(sum(CASE WHEN edge AND q = 3 THEN 1 ELSE 0 END) AS BIGINT) AS b3
FROM e GROUP BY d
"""


def ann_recall_sql(stride: int = 37, nprobe: int = 4, k: int = 10,
                   max_centroids: int = 256) -> str:
    """q_ann_recall: recall@k of the seeded-IVF path against the exact
    brute-force ranking — both restated with the SAME tie rule
    (sim DESC, vec_id), the query vector excluded from both lists. The
    ANN evaluation harness as a query: the overlap count and integer
    permille recall."""
    d2 = ("CAST(list_dot_product(CAST(a.q AS DOUBLE[]), CAST(a.q AS DOUBLE[]))"
          " - 2 * list_dot_product(CAST(a.q AS DOUBLE[]), CAST(c.cq AS DOUBLE[]))"
          " + list_dot_product(CAST(c.cq AS DOUBLE[]), CAST(c.cq AS DOUBLE[])) AS BIGINT)")
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                  {_quant_sql('embedding')} AS q
           FROM embeddings),
brute AS (
  SELECT vec_id FROM (
    SELECT vec_id,
           ROUND(list_cosine_similarity(v, (SELECT v FROM e
                                            WHERE vec_id = 0)), 6) AS sim
    FROM e WHERE vec_id <> 0
    ORDER BY sim DESC, vec_id LIMIT {k})),
cent AS (SELECT vec_id AS cid, q AS cq FROM e
         WHERE vec_id % {stride} = 1 AND vec_id < {stride * max_centroids}),
assign AS (
  SELECT a.vec_id, c.cid, {d2} AS d2
  FROM e a CROSS JOIN cent c
  QUALIFY row_number() OVER (PARTITION BY a.vec_id ORDER BY d2, c.cid) = 1),
qprobe AS (
  SELECT c.cid FROM e a CROSS JOIN cent c WHERE a.vec_id = 0
  ORDER BY {d2}, c.cid LIMIT {nprobe}),
ivf AS (
  SELECT vec_id FROM (
    SELECT cnd.vec_id,
           ROUND(list_cosine_similarity(cnd.v, (SELECT v FROM e
                                                WHERE vec_id = 0)), 6) AS sim
    FROM (SELECT e.vec_id, e.v FROM e
          JOIN assign s ON s.vec_id = e.vec_id
          WHERE s.cid IN (SELECT cid FROM qprobe)
            AND e.vec_id <> 0) cnd
    ORDER BY sim DESC, vec_id LIMIT {k}))
SELECT CAST({k} AS BIGINT) AS k,
       CAST(count(*) AS BIGINT) AS n_overlap,
       CAST(1000 * count(*) // {k} AS BIGINT) AS recall_permille
FROM brute JOIN ivf USING (vec_id)
"""


def gray_gate_sql(n: int = N_IMAGES, spread: int = 24,
                  permille: int = 50) -> str:
    """q_gray_gate: per-pixel channel pivot + greatest-abs-spread census
    with the integer cross-multiplied near-grayscale gate."""
    return f"""
WITH {_px_ctes(n)},
rgb AS (SELECT d, x, y,
               sum(CASE WHEN ch = 0 THEN p END) AS r,
               sum(CASE WHEN ch = 1 THEN p END) AS g,
               sum(CASE WHEN ch = 2 THEN p END) AS b
        FROM px GROUP BY 1, 2, 3),
c AS (SELECT d, CASE WHEN greatest(abs(r - g), abs(g - b), abs(r - b))
                          > {spread} THEN 1 ELSE 0 END AS col
      FROM rgb)
SELECT 'img' || lpad(CAST(d AS VARCHAR), 4, '0') AS image_id,
       CAST(count(*) AS BIGINT) AS n_px,
       CAST(sum(col) AS BIGINT) AS n_colorful,
       1000 * sum(col) < {permille} * count(*) AS grayscalish
FROM c GROUP BY d
"""


def ycc_subsample_sql(n: int = N_IMAGES, busy_range: int = 16) -> str:
    """q_ycc_subsample: fixed-point BT.601 RGB→YCbCr (biased
    non-negative dividends so DuckDB's trunc // equals numpy's floor
    division) + the 4:2:0 busy-block census — 2x2 blocks whose chroma
    range exceeds ``busy_range`` in either plane."""
    return f"""
WITH {_px_ctes(n)},
rgb AS (SELECT d, x, y,
               sum(CASE WHEN ch = 0 THEN p END) AS r,
               sum(CASE WHEN ch = 1 THEN p END) AS g,
               sum(CASE WHEN ch = 2 THEN p END) AS b
        FROM px GROUP BY 1, 2, 3),
ycc AS (SELECT d, x, y,
               (77*r + 150*g + 29*b) // 256 AS yy,
               (-43*r - 85*g + 128*b + 32768) // 256 AS cb,
               (128*r - 107*g - 21*b + 32768) // 256 AS cr
        FROM rgb),
sums AS (SELECT d, CAST(sum(yy) AS BIGINT) AS sum_y,
                CAST(sum(cb) AS BIGINT) AS sum_cb,
                CAST(sum(cr) AS BIGINT) AS sum_cr
         FROM ycc GROUP BY d),
blk AS (SELECT d, x // 2 AS bx, y // 2 AS by,
               max(cb) - min(cb) AS rcb, max(cr) - min(cr) AS rcr
        FROM ycc GROUP BY 1, 2, 3),
bz AS (SELECT d,
              CAST(sum(CASE WHEN rcb > {busy_range}
                             OR rcr > {busy_range}
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_busy,
              CAST(count(*) AS BIGINT) AS n_blocks
       FROM blk GROUP BY d)
SELECT 'img' || lpad(CAST(s.d AS VARCHAR), 4, '0') AS image_id,
       sum_y, sum_cb, sum_cr, n_busy, n_blocks
FROM sums s JOIN bz ON bz.d = s.d
"""


def otsu_sql(n: int = N_IMAGES, divisor: int = 12) -> str:
    """q_otsu_threshold: Otsu's between-class-variance argmax restated
    over the 6-bit gray-sum histogram with EXACT fraction ordering —
    num/den candidates compare by HUGEINT cross-multiplication in a
    NOT EXISTS anti-join (O(bins^2) per image, bins = 64), so the
    selected threshold can never drift on float rounding. Ties break to
    the smallest t on both sides; all-one-bin frames emit no row
    (den = 0 everywhere)."""
    return f"""
WITH {_px_ctes(n)},
g3 AS (SELECT d, x, y, sum(p) AS s3 FROM px GROUP BY d, x, y),
bb AS (SELECT d, s3 // {divisor} AS bin FROM g3),
hh AS (SELECT d, bin, CAST(count(*) AS BIGINT) AS c FROM bb GROUP BY 1, 2),
tot AS (SELECT d, CAST(sum(c) AS BIGINT) AS nn,
               CAST(sum(bin * c) AS BIGINT) AS s
        FROM hh GROUP BY d),
th AS (SELECT unnest(generate_series(0, 62)) AS t),
cum AS (SELECT hh.d, th.t,
               CAST(sum(CASE WHEN bin <= t THEN c ELSE 0 END)
                    AS BIGINT) AS cnt,
               CAST(sum(CASE WHEN bin <= t THEN bin * c ELSE 0 END)
                    AS BIGINT) AS cums
        FROM hh CROSS JOIN th GROUP BY 1, 2),
v AS (SELECT cum.d, cum.t, cum.cnt,
             (cums * nn - s * cnt) * (cums * nn - s * cnt) AS num,
             cnt * (nn - cnt) AS den
      FROM cum JOIN tot USING (d)),
sel AS (SELECT a.d, a.t, a.cnt, a.num, a.den
        FROM v a
        WHERE a.den > 0 AND NOT EXISTS (
            SELECT 1 FROM v b2
            WHERE b2.d = a.d AND b2.den > 0 AND
                  (CAST(b2.num AS HUGEINT) * a.den
                       > CAST(a.num AS HUGEINT) * b2.den
                   OR (CAST(b2.num AS HUGEINT) * a.den
                           = CAST(a.num AS HUGEINT) * b2.den
                       AND b2.t < a.t))))
SELECT 'img' || lpad(CAST(sel.d AS VARCHAR), 4, '0') AS image_id,
       CAST(sel.t AS BIGINT) AS otsu_bin,
       CAST(tot.nn - sel.cnt AS BIGINT) AS n_fg,
       sel.num AS sep_num, sel.den AS sep_den
FROM sel JOIN tot ON tot.d = sel.d
"""


def bootstrap_ci_sql(n_resamples: int = 32) -> str:
    """q_bootstrap_ci: the deterministic Poisson bootstrap restated —
    per (row, resample) weight = pseudo-Poisson(1) draw from
    splitmix64(event_id*B + rs), where the inverse-CDF comparison uses
    the SAME uint64 integer thresholds floor(cdf_k * 2^64) on both
    sides, so weight assignment is bit-exact (no float CDF crosses the
    oracle). Values quantize to micro-units; the per-resample mean is
    non-negative integer floor division (events.value >= 0 by
    generator contract — numpy floor and DuckDB // agree there)."""
    import math
    cdf, ts = 0.0, []
    for k in range(7):
        cdf += math.exp(-1) / math.factorial(k)
        ts.append(min(int(cdf * 2.0**64), 2**64 - 1))
    case = "CASE " + " ".join(
        f"WHEN h < {t}::HUGEINT THEN {k}" for k, t in enumerate(ts)
    ) + " ELSE 7 END"
    sm, fin = splitmix_ctes(
        "s", "rs, v", f"(event_id::HUGEINT * {n_resamples} + rs)",
        "h", "bs")
    return f"""
WITH e AS (SELECT event_id,
                  CAST(round(value * 1e6) AS BIGINT) AS v FROM events),
b AS (SELECT unnest(generate_series(0, {n_resamples - 1})) AS rs),
s AS (SELECT rs, v, event_id FROM e CROSS JOIN b),
{sm},
w AS (SELECT rs, v, {case} AS wt FROM {fin})
SELECT CAST(rs AS BIGINT) AS resample,
       CAST(sum(wt) AS BIGINT) AS n_eff,
       CAST(sum(wt * v) AS BIGINT) AS sum_micro,
       CAST(CASE WHEN sum(wt) = 0 THEN 0
                 ELSE sum(wt * v) // sum(wt) END AS BIGINT) AS mean_micro
FROM w GROUP BY 1
"""


def blob_bbox_sql(n: int = N_IMAGES, threshold: int = 640) -> str:
    """q_blob_bbox: the BlobCount recursive min-label fixpoint, then
    per-component size + bbox, keeping the largest component per image
    (ties to the smallest label — the same rule as the stage's
    lexsort). Row volume is the blob_count_sql bound."""
    return f"""
WITH RECURSIVE {_px_ctes(n)},
g3 AS (SELECT d, x, y, sum(p) AS s3 FROM px GROUP BY d, x, y),
base AS (SELECT d, x, y FROM g3 WHERE s3 > {threshold}),
lab AS (
    SELECT d, x, y, y * 64 + x AS l FROM base
    UNION
    SELECT b.d, b.x, b.y, lab.l
    FROM lab JOIN base b ON b.d = lab.d
         AND abs(b.x - lab.x) + abs(b.y - lab.y) = 1
),
ml AS (SELECT d, x, y, min(l) AS l FROM lab GROUP BY 1, 2, 3),
comp AS (SELECT d, l, CAST(count(*) AS BIGINT) AS blob_px,
                CAST(min(x) AS BIGINT) AS x0,
                CAST(max(x) AS BIGINT) AS x1,
                CAST(min(y) AS BIGINT) AS y0,
                CAST(max(y) AS BIGINT) AS y1
         FROM ml GROUP BY d, l),
sel AS (SELECT *, row_number() OVER (
            PARTITION BY d ORDER BY blob_px DESC, l ASC) AS rk
        FROM comp)
SELECT 'img' || lpad(CAST(d AS VARCHAR), 4, '0') AS image_id,
       blob_px, x0, x1, y0, y1
FROM sel WHERE rk = 1
"""


def audio_gain_sql(n: int = 32, length: int = 1024) -> str:
    """q_audio_gain: peak / permille-gain / DC stats restated from the
    payload byte formula; gain = 127000 // peak is non-negative integer
    floor division on both sides."""
    b = "(d*31 + i*7 + ((i*i) % 97)*5) % 256"
    return f"""
WITH ids AS (SELECT unnest(generate_series(0, {n - 1})) AS d),
xs AS (SELECT d, unnest(generate_series(0, {length - 1})) AS i FROM ids),
s AS (SELECT d, ({b}) - 128 AS v FROM xs),
agg AS (SELECT d, CAST(max(abs(v)) AS BIGINT) AS peak,
               CAST(sum(v) AS BIGINT) AS sum_dc,
               CAST(count(*) AS BIGINT) AS n_samples
        FROM s GROUP BY d)
SELECT 'img' || lpad(CAST(d AS VARCHAR), 4, '0') AS image_id,
       peak,
       CAST(CASE WHEN peak = 0 THEN 0
                 ELSE 127000 // peak END AS BIGINT) AS gain_permille,
       sum_dc, n_samples
FROM agg
"""

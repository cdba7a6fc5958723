"""Similarity search over embedding columns (SURVEY addendum).

- ``cosine_topk``: brute-force baseline — per-batch float64 matmul against
  a broadcast query matrix; exact, streaming, no shuffle.
- ``lsh_topk``: the scale path — random-hyperplane LSH bucket keys computed
  per batch; only buckets matching the query's key are scored. Recall<1 by
  design; bucket bits trade recall for compute.
- ``ivf_topk``: IVF coarse quantizer — k-means centroids trained on a small
  driver-side sample (one pass, numpy), broadcast via ray.put; per batch,
  rows are assigned to their nearest centroid and only rows in the query's
  ``nprobe`` nearest cells are scored. At 100 TB this is the standard
  scale path: the train sample stays tiny and the scan prunes to
  nprobe/nlist of the data with zero shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd


def _norm_rows(M: np.ndarray) -> np.ndarray:
    return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)


def cosine_topk(ds: rd.Dataset, query_vec: np.ndarray, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                exclude_ids: set | None = None) -> pd.DataFrame:
    """Exact top-k by cosine: per-batch local top-k, then driver-side merge
    of the (tiny) per-batch results. Ties broken by id ascending."""
    q = _norm_rows(np.asarray(query_vec, dtype=np.float64)[None, :])[0]
    qref = ray.put(q)
    excl = exclude_ids or set()

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        qv = ray.get(qref)
        M = _norm_rows(np.stack([np.asarray(v, dtype=np.float64) for v in batch[vec_col]]))
        sims = M @ qv
        out = pd.DataFrame({id_col: batch[id_col].to_numpy(), "sim": np.round(sims, 6)})
        out = out[~out[id_col].isin(excl)]
        return out.sort_values(["sim", id_col], ascending=[False, True]).head(k)

    local = ds.map_batches(score, batch_format="pandas").to_pandas()
    return (local.sort_values(["sim", id_col], ascending=[False, True])
            .head(k).reset_index(drop=True))


def int8_quantize(M: np.ndarray, scale: float = 64.0) -> np.ndarray:
    """Symmetric int8 scalar quantization with a FIXED global scale:
    q = clip(floor(x * scale), -127, 127). floor (not round) so the SQL
    mirror's FLOOR() reproduces it bit-for-bit — the quantized index is
    part of the oracle contract, not an approximation detail."""
    q = np.floor(M.astype(np.float64) * scale)
    return np.clip(q, -127, 127).astype(np.int8)


def int8_topk(ds: rd.Dataset, query_vec: np.ndarray, k: int = 10,
              id_col: str = "vec_id", vec_col: str = "embedding",
              exclude_ids: set | None = None,
              scale: float = 64.0) -> pd.DataFrame:
    """Top-k by EXACT integer dot product over int8-quantized vectors —
    the memory-compression ANN path (4x smaller index than float32,
    SIMD-friendly int arithmetic). At 100 TB the quantized index is what
    actually fits in cluster RAM; this is the brute-force scorer over it
    (compose with the IVF bucketing for the scale path). Same
    per-batch-top-k -> tiny driver merge shape as cosine_topk; scores are
    int64 (<= 127*127*dim), so there is no float tie ambiguity."""
    qq = int8_quantize(np.asarray(query_vec, dtype=np.float64)[None, :],
                       scale)[0].astype(np.int64)
    qref = ray.put(qq)
    excl = exclude_ids or set()

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        qv = ray.get(qref)
        M = int8_quantize(
            np.stack([np.asarray(v, dtype=np.float64)
                      for v in batch[vec_col]]), scale).astype(np.int64)
        s = M @ qv
        out = pd.DataFrame({id_col: batch[id_col].to_numpy(), "score": s})
        out = out[~out[id_col].isin(excl)]
        return out.sort_values(["score", id_col],
                               ascending=[False, True]).head(k)

    local = ds.map_batches(score, batch_format="pandas").to_pandas()
    return (local.sort_values(["score", id_col], ascending=[False, True])
            .head(k).reset_index(drop=True))


def bitext_margin_mine(ds: rd.Dataset, id_col: str = "vec_id",
                       vec_col: str = "embedding", k: int = 4,
                       threshold: float = 1.0,
                       scale: float = 64.0) -> rd.Dataset:
    """Margin-based parallel-corpus (bitext) mining — the
    CCMatrix/LASER criterion that built the largest public translation
    corpora: for a source vector x, candidate y scores
    ``margin(x, y) = s(x, y) / ((avgNN_k(x) + avgNN_k(y)) / 2)`` —
    similarity normalized by both sides' local neighborhood density, so
    hub vectors (close to everything) don't win every alignment; keep
    the argmax y per x when the margin clears ``threshold``.

    Sides: even ``id_col`` = source language, odd = target (the
    deterministic stand-in for a language-ID column). Integer-exact
    scoring: vectors int8-quantize (floor, fixed scale — the
    ``int8_quantize`` contract) and s(x, y) is the EXACT int64 dot, so
    avgNN sums are exact ints and the margin is one division of exact
    integers — bit-identical doubles on the engine and DuckDB sides,
    which makes the per-source argmax deterministic (ties break by
    target id). Pairs with non-positive denominators are excluded
    (degenerate all-negative neighborhoods).

    Scale shape: the target side is gathered ONCE and broadcast
    (``ray.put``) — an int8 matrix, 4x smaller than float32 (25k
    vectors x 64 dims = 1.6 MB at sf1); two streaming passes over the
    Dataset do all O(|A| x |B|) work blockwise (pass 1: per-target
    top-k sums vs the broadcast source matrix; pass 2: per-source
    argmax with both neighborhood sums in hand). At 100 TB neither side
    broadcasts whole — IVF-bucket both sides (``ivf_topk`` machinery)
    and run this margin inside each bucket pairing."""
    from cocrawler_ray.stages import exchange

    empty = pd.DataFrame({"src": pd.Series([], dtype=np.int64),
                          "dst": pd.Series([], dtype=np.int64),
                          "margin": pd.Series([], dtype=np.float64)})
    # three consumers of the input (target gather + two source passes)
    ds = exchange.materialize_if_small(ds.select_columns([id_col, vec_col]))

    # TARGET side only gathers (the documented broadcast: int8, 4x
    # smaller than float32) — filtered DISTRIBUTED, so only the target
    # rows ever reach the driver; sorted by id so the (score DESC,
    # id ASC) tie rule is positional
    b_rows = (ds.map_batches(
        lambda df: df[df[id_col].to_numpy() % 2 == 1],
        batch_format="pandas").take_all())
    if not b_rows:
        return rd.from_pandas(empty)
    b_ids = np.array(sorted(r[id_col] for r in b_rows), dtype=np.int64)
    by_id = {r[id_col]: r[vec_col] for r in b_rows}
    B = int8_quantize(np.stack([np.asarray(by_id[i], dtype=np.float64)
                                for i in b_ids]), scale).astype(np.int64)
    b_ref = ray.put((b_ids, B))

    def _quant_block(batch: pd.DataFrame):
        sel = batch[id_col].to_numpy() % 2 == 0
        if not sel.any():
            return None, None
        aid = batch[id_col].to_numpy()[sel].astype(np.int64)
        A = int8_quantize(
            np.stack([np.asarray(v, dtype=np.float64)
                      for v in batch[vec_col][sel]]), scale).astype(np.int64)
        return aid, A

    # pass 1 (streaming over the SOURCE side): per-target top-k PARTIALS
    # — each block emits its k best dots per target column; partials
    # concat + re-top-k on the driver (k x |B| ints per block)
    def b_partials(batch: pd.DataFrame) -> pd.DataFrame:
        aid, A = _quant_block(batch)
        if aid is None:
            return pd.DataFrame({"col": pd.Series([], dtype=np.int64),
                                 "val": pd.Series([], dtype=np.int64)})
        _, Bm = ray.get(b_ref)
        dots = Bm @ A.T                      # |B| x |blk|
        kk = min(k, dots.shape[1])
        part = np.partition(dots, dots.shape[1] - kk, axis=1)[:, dots.shape[1] - kk:]
        cols = np.repeat(np.arange(part.shape[0], dtype=np.int64), kk)
        return pd.DataFrame({"col": cols, "val": part.reshape(-1)})

    parts = ds.map_batches(b_partials, batch_format="pandas").to_pandas()
    if parts.empty:
        return rd.from_pandas(empty)
    # fold the per-block partials: top-k per target column, vectorized
    # (sort by (col, val desc) -> rank within col -> keep rank < k)
    sb = np.zeros(len(b_ids), dtype=np.int64)
    srt = parts.sort_values(["col", "val"], ascending=[True, False],
                            kind="stable")
    cols = srt["col"].to_numpy()
    rank = np.arange(len(srt)) - np.searchsorted(cols, cols, side="left")
    kept = srt[rank < k]
    agg = kept.groupby("col", sort=False)["val"].sum()
    sb[agg.index.to_numpy(np.int64)] = agg.to_numpy(np.int64)
    sb_ref = ray.put(sb)

    # pass 2 (streaming): per-source argmax margin with both
    # neighborhood sums in hand; sa completes in-block (full B present)
    def mine(batch: pd.DataFrame) -> pd.DataFrame:
        aid, A = _quant_block(batch)
        if aid is None:
            return empty
        bi, Bm = ray.get(b_ref)
        sbv = ray.get(sb_ref)
        dots = A @ Bm.T                      # |blk| x |B|
        kk = min(k, dots.shape[1])
        part = np.partition(dots, dots.shape[1] - kk, axis=1)[:, dots.shape[1] - kk:]
        sa = part.sum(axis=1)
        den = sa[:, None] + sbv[None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            margin = (2.0 * k * dots) / den
        margin[den <= 0] = -np.inf
        best = np.argmax(margin, axis=1)     # first = smallest dst id
        mbest = margin[np.arange(len(aid)), best]
        keep = np.isfinite(mbest) & (mbest >= threshold)
        return pd.DataFrame({"src": aid[keep],
                             "dst": bi[best[keep]],
                             "margin": np.round(mbest[keep], 6)})

    return ds.map_batches(mine, batch_format="pandas")


def hyperplane_key_batch(batch: pa.Table, planes: np.ndarray,
                         vec_col: str = "embedding") -> pa.Table:
    """LSH bucket key = sign bits of integer dot products against
    Rademacher (+-1) `planes` over floor(v*1000+0.5)-quantized vectors.

    Quantized bucketing makes bucket membership integer-EXACT: at cluster
    scale the same vector always lands in the same bucket no matter which
    worker/platform/kernel computed the dot (a float sign test near 0 can
    flip between summation orders), and it is what lets the DuckDB
    conformance oracle (oracles.ann_lsh_sql) restate bucketing exactly."""
    from cocrawler_ray.oracles import quantize_vecs
    M = np.stack([np.asarray(v, dtype=np.float64)
                  for v in batch.column(vec_col).to_pylist()])
    bits = (quantize_vecs(M) @ planes.T) > 0
    key = np.zeros(len(M), dtype=np.int64)
    for b in range(planes.shape[0]):
        key |= bits[:, b].astype(np.int64) << b
    return batch.append_column("lsh_key", pa.array(key))


def lsh_topk(ds: rd.Dataset, query_vec: np.ndarray, k: int = 10, n_bits: int = 8,
             id_col: str = "vec_id", vec_col: str = "embedding",
             seed: int = 17, probe_hamming: int = 1) -> pd.DataFrame:
    """Approximate top-k: score only rows whose hyperplane key is within
    `probe_hamming` bits of the query's key (multi-probe)."""
    from cocrawler_ray.oracles import quantize_vecs, rademacher_planes
    dim = len(query_vec)
    planes = rademacher_planes(n_bits, dim, seed)
    qb = (quantize_vecs(np.asarray(query_vec, dtype=np.float64)[None, :])[0]
          @ planes.T) > 0
    qkey = 0
    for b in range(n_bits):
        qkey |= int(qb[b]) << b
    ok_keys = {qkey}
    if probe_hamming >= 1:
        for b in range(n_bits):
            ok_keys.add(qkey ^ (1 << b))
    keyed = ds.map_batches(hyperplane_key_batch, fn_kwargs=dict(planes=planes, vec_col=vec_col),
                           batch_format="pyarrow")
    cand = keyed.map_batches(
        lambda t: t.filter(pa.array(np.isin(t.column("lsh_key").to_numpy(), list(ok_keys)))),
        batch_format="pyarrow")
    return cosine_topk(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def train_centroids(sample: np.ndarray, nlist: int, iters: int = 10,
                    seed: int = 17) -> np.ndarray:
    """Plain k-means on a normalized sample (cosine == dot after norm)."""
    X = _norm_rows(np.asarray(sample, dtype=np.float64))
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(nlist, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(len(C)):
            m = assign == j
            if m.any():
                C[j] = X[m].mean(axis=0)
        C = _norm_rows(C)
    return C


def ivf_topk(ds: rd.Dataset, query_vec: np.ndarray, k: int = 10,
             nlist: int = 16, nprobe: int = 4, train_rows: int = 2048,
             id_col: str = "vec_id", vec_col: str = "embedding",
             seed: int = 17) -> pd.DataFrame:
    """Approximate top-k via an IVF coarse quantizer (see module doc)."""
    sample = np.stack([np.asarray(r[vec_col], dtype=np.float64)
                       for r in ds.limit(train_rows).take(train_rows)])
    C = train_centroids(sample, nlist, seed=seed)
    q = _norm_rows(np.asarray(query_vec, dtype=np.float64)[None, :])[0]
    probe = set(np.argsort(C @ q)[::-1][:nprobe].tolist())
    cref = ray.put(C)

    def prune(t: pa.Table) -> pa.Table:
        cents = ray.get(cref)
        M = _norm_rows(np.stack([np.asarray(v, dtype=np.float64)
                                 for v in t.column(vec_col).to_pylist()]))
        assign = np.argmax(M @ cents.T, axis=1)
        return t.filter(pa.array(np.isin(assign, list(probe))))

    cand = ds.map_batches(prune, batch_format="pyarrow")
    return cosine_topk(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def kmeans_assign_seeded(ds: rd.Dataset, stride: int = 37,
                         max_centroids: int = 256,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> rd.Dataset:
    """Nearest-centroid (one k-means assignment step) over an embedding
    column — the semantic-clustering primitive behind cluster-balanced
    corpus sampling and IVF cell builds.

    Centroids are the rows with ``id % stride == 1 AND
    id < stride * max_centroids`` — deterministic AND corpus-size-
    independent: the driver gather below is bounded by ``max_centroids``
    rows no matter how large the corpus grows (swap in
    ``train_centroids`` over a bounded sample when cluster balance
    matters more than restatability). Assignment is argmin integer
    squared-L2 over floor(v*1000+0.5)-quantized vectors, ties to the
    smallest centroid id, so the clustering is exactly reproducible
    anywhere (incl. the DuckDB mirror, oracles.kmeans_assign_sql).
    Centroids broadcast once via ray.put; the scan streams — per-row
    output (id, cid, d2), no shuffle.
    """
    from cocrawler_ray.oracles import quantize_vecs

    bound = stride * max_centroids

    cent_tab = (ds.map_batches(
        lambda t: t.filter(pa.array(
            (t.column(id_col).to_numpy() % stride == 1)
            & (t.column(id_col).to_numpy() < bound))),
        batch_format="pyarrow").to_pandas())
    if not len(cent_tab):
        # ids that never land in [0, stride*max_centroids) select zero
        # seeds — fail with the remedy instead of np.stack([]) noise
        raise ValueError(
            f"no seeded centroids: no id satisfies id % {stride} == 1 and "
            f"id < {bound}; raise max_centroids/stride for this id range, "
            "or use train_centroids() for arbitrary id spaces")
    cent_tab = cent_tab.sort_values(id_col)
    cids = cent_tab[id_col].to_numpy().astype(np.int64)
    C = quantize_vecs(np.stack([np.asarray(v, dtype=np.float64)
                                for v in cent_tab[vec_col]]))
    bref = ray.put((cids, C))

    def assign(t: pa.Table) -> pa.Table:
        cid_arr, cents = ray.get(bref)
        X = quantize_vecs(np.stack([np.asarray(v, dtype=np.float64)
                                    for v in t.column(vec_col).to_pylist()]))
        dd = ((X * X).sum(axis=1)[:, None] - 2 * (X @ cents.T)
              + (cents * cents).sum(axis=1)[None, :])
        j = np.argmin(dd, axis=1)  # first min == smallest cid (sorted)
        return pa.table({
            id_col: t.column(id_col),
            "cid": pa.array(cid_arr[j]),
            "d2": pa.array(dd[np.arange(len(j)), j].astype(np.int64))})

    return ds.map_batches(assign, batch_format="pyarrow")


def ivf_topk_seeded(ds: rd.Dataset, query_vec: np.ndarray, k: int = 10,
                    stride: int = 37, nprobe: int = 4,
                    max_centroids: int = 256,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    exclude_ids: set | None = None) -> pd.DataFrame:
    """IVF-flat with stride-seeded centroids and integer-exact assignment.

    Centroids are the rows with ``id % stride == 1 AND
    id < stride * max_centroids`` (deterministic sample init, zero Lloyd
    iterations, centroid count bounded independent of corpus size; use
    ``ivf_topk``'s trained k-means when cell balance matters more than
    restatability). Cell assignment is argmin squared-L2 between
    floor(v*1000+0.5)-quantized int64 vectors (ties -> smallest centroid
    id), so the partition of rows into cells is exactly reproducible
    anywhere — including the DuckDB conformance oracle
    (oracles.ann_ivf_sql). Only the final cosine ranking is float.
    """
    from cocrawler_ray.oracles import quantize_vecs

    bound = stride * max_centroids

    cent_tab = (ds.map_batches(
        lambda t: t.filter(pa.array(
            (t.column(id_col).to_numpy() % stride == 1)
            & (t.column(id_col).to_numpy() < bound))),
        batch_format="pyarrow").to_pandas())
    if not len(cent_tab):
        raise ValueError(
            f"no seeded centroids: no id satisfies id % {stride} == 1 and "
            f"id < {bound}; raise max_centroids/stride for this id range, "
            "or use ivf_topk()'s trained centroids")
    cent_tab = cent_tab.sort_values(id_col)
    C = quantize_vecs(np.stack([np.asarray(v, dtype=np.float64)
                                for v in cent_tab[vec_col]]))
    qq = quantize_vecs(np.asarray(query_vec, dtype=np.float64)[None, :])[0]

    def d2(X: np.ndarray) -> np.ndarray:
        # (n, ncent) integer squared L2 — exact, no float in the argmin
        return ((X * X).sum(axis=1)[:, None]
                - 2 * (X @ C.T) + (C * C).sum(axis=1)[None, :])

    probe = set(np.argsort(d2(qq[None, :])[0], kind="stable")[:nprobe].tolist())
    import ray
    cref = ray.put(C)

    def prune(t: pa.Table) -> pa.Table:
        cents = ray.get(cref)
        X = quantize_vecs(np.stack([np.asarray(v, dtype=np.float64)
                                    for v in t.column(vec_col).to_pylist()]))
        dd = ((X * X).sum(axis=1)[:, None] - 2 * (X @ cents.T)
              + (cents * cents).sum(axis=1)[None, :])
        assign = np.argmin(dd, axis=1)
        return t.filter(pa.array(np.isin(assign, list(probe))))

    cand = ds.map_batches(prune, batch_format="pyarrow")
    return cosine_topk(cand, query_vec, k=k, id_col=id_col,
                       vec_col=vec_col, exclude_ids=exclude_ids)


def _seeded_codebook(ds: rd.Dataset, stride: int, max_centroids: int,
                     id_col: str, vec_col: str):
    """Bounded row-seeded codebook (the kmeans_assign_seeded selection):
    quantized vectors of rows with id % stride == 1 below
    stride*max_centroids, sorted by id — corpus-size-independent and
    integer-exact-restatable in SQL."""
    from cocrawler_ray.oracles import quantize_vecs

    bound = stride * max_centroids
    cent_tab = (ds.map_batches(
        lambda t: t.filter(pa.array(
            (t.column(id_col).to_numpy() % stride == 1)
            & (t.column(id_col).to_numpy() < bound))),
        batch_format="pyarrow").to_pandas())
    if not len(cent_tab):
        raise ValueError(
            f"no seeded centroids below {bound}; raise stride/max_centroids "
            "or train a codebook from a sample")
    cent_tab = cent_tab.sort_values(id_col)
    cids = cent_tab[id_col].to_numpy().astype(np.int64)
    C = quantize_vecs(np.stack([np.asarray(v, dtype=np.float64)
                                for v in cent_tab[vec_col]]))
    return cids, C


def pq_encode_seeded(ds: rd.Dataset, m: int = 4, stride: int = 37,
                     max_centroids: int = 64,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> rd.Dataset:
    """Product-quantization encode (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): split each D-dim vector
    into ``m`` contiguous subspaces and store only the id of the nearest
    sub-codebook centroid per subspace — the memory-compression path that
    lets a 100 TB embedding corpus fit hot in RAM (D floats -> m small
    ints; here the codebook is row-seeded like kmeans_assign_seeded, so
    every code is integer-exact-restatable in SQL).

    Per-subspace assignment is the quantized squared-L2 argmin with ties
    to the smallest centroid id; ``d2`` is the total reconstruction
    distance (sum over subspaces) — the quantization error a recall
    budget would monitor. Codebook broadcasts once; the scan streams
    with no shuffle.
    """
    from cocrawler_ray.oracles import quantize_vecs

    cids, C = _seeded_codebook(ds, stride, max_centroids, id_col, vec_col)
    if C.shape[1] % m:
        raise ValueError(f"dim {C.shape[1]} not divisible by m={m}")
    bref = ray.put((cids, C))

    def encode(t: pa.Table) -> pa.Table:
        cid_arr, cents = ray.get(bref)
        X = quantize_vecs(np.stack([np.asarray(v, dtype=np.float64)
                                    for v in t.column(vec_col).to_pylist()]))
        sub = X.shape[1] // m
        cols: dict = {id_col: t.column(id_col)}
        total = np.zeros(len(X), np.int64)
        for s in range(m):
            Xs = X[:, s * sub:(s + 1) * sub]
            Cs = cents[:, s * sub:(s + 1) * sub]
            dd = ((Xs * Xs).sum(axis=1)[:, None] - 2 * (Xs @ Cs.T)
                  + (Cs * Cs).sum(axis=1)[None, :])
            j = np.argmin(dd, axis=1)  # first min == smallest cid (sorted)
            cols[f"code_{s}"] = pa.array(cid_arr[j], pa.int64())
            total += dd[np.arange(len(j)), j].astype(np.int64)
        cols["d2"] = pa.array(total, pa.int64())
        return pa.table(cols)

    return ds.map_batches(encode, batch_format="pyarrow")


def pq_adc_topk(ds: rd.Dataset, query_vec: np.ndarray, k: int = 10,
                m: int = 4, stride: int = 37, max_centroids: int = 64,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> pd.DataFrame:
    """PQ asymmetric-distance (ADC) top-k: the query stays full-precision,
    every database vector is represented by its m sub-codebook ids, and
    distance is the sum of m table lookups — O(m) adds per vector instead
    of O(D) multiplies, over codes 64x smaller than the raw floats. The
    lookup table (m x n_centroids integer d2s) is built ONCE on the
    driver and broadcast; the scan streams per-block local top-k and the
    driver merges k x n_blocks candidate rows (the cosine_topk shape).

    Integer-exact end to end (quantized query, quantized codebook), so
    every approximate distance — and therefore the exact candidate
    ranking, ties to the smallest id — is restatable in SQL.
    """
    from cocrawler_ray.oracles import quantize_vecs

    cids, C = _seeded_codebook(ds, stride, max_centroids, id_col, vec_col)
    D = C.shape[1]
    if D % m:
        raise ValueError(f"dim {D} not divisible by m={m}")
    sub = D // m
    q = quantize_vecs(np.asarray(query_vec, dtype=np.float64)[None, :])[0]
    # LUT[s][c] = ||q_s - C[c]_s||^2 (int64)
    lut = np.stack([
        ((q[s * sub:(s + 1) * sub][None, :]
          - C[:, s * sub:(s + 1) * sub]) ** 2).sum(axis=1)
        for s in range(m)]).astype(np.int64)
    bref = ray.put((C, lut))

    def score(t: pa.Table) -> pa.Table:
        cents, table = ray.get(bref)
        X = quantize_vecs(np.stack([np.asarray(v, dtype=np.float64)
                                    for v in t.column(vec_col).to_pylist()]))
        adist = np.zeros(len(X), np.int64)
        for s in range(m):
            Xs = X[:, s * sub:(s + 1) * sub]
            Cs = cents[:, s * sub:(s + 1) * sub]
            dd = ((Xs * Xs).sum(axis=1)[:, None] - 2 * (Xs @ Cs.T)
                  + (Cs * Cs).sum(axis=1)[None, :])
            adist += table[s][np.argmin(dd, axis=1)]
        ids = t.column(id_col).to_numpy()
        order = np.lexsort((ids, adist))[:k]
        return pa.table({id_col: pa.array(ids[order], pa.int64()),
                         "adist": pa.array(adist[order], pa.int64())})

    local = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    return (local.sort_values(["adist", id_col], kind="stable")
            .head(k).reset_index(drop=True))


def matryoshka_overlap(ds: rd.Dataset, prefix_dim: int = 16, k: int = 10,
                       n_queries: int = 8, id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       scale: float = 64.0) -> pd.DataFrame:
    """Matryoshka (MRL) prefix-dimension retrieval audit: per query, the
    overlap between the top-k by FULL-dimension score and the top-k by
    the first ``prefix_dim`` dimensions — the measurement behind
    truncated-embedding index sizing (how much recall a d/4-width index
    keeps). Scores are exact int64 dot products over int8-quantized
    vectors (a truncated int8 dot is a prefix sum of the full one, so
    the audit is self-consistent and float-tie-free); ranking breaks
    ties by id on both sides. Scale shape: the n_queries quantized rows
    broadcast once; each batch emits at most 2k candidate rows per
    query (the union of both per-batch top-k sets — a candidate outside
    both per-batch top-k can never enter either global top-k), so the
    driver merge is O(2k * P * n_queries) regardless of corpus size."""
    qrows = (ds.map_batches(
        lambda t: t.filter(pc.less(t[id_col], n_queries)),
        batch_format="pyarrow").to_pandas()
        .sort_values(id_col).reset_index(drop=True))
    Q = int8_quantize(
        np.stack([np.asarray(v, dtype=np.float64)
                  for v in qrows[vec_col]]), scale).astype(np.int64)
    qref = ray.put(Q)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        qq = ray.get(qref)
        b = batch[batch[id_col] >= n_queries]
        if not len(b):
            return pd.DataFrame({
                "qid": pd.Series([], dtype=np.int64),
                id_col: pd.Series([], dtype=np.int64),
                "sfull": pd.Series([], dtype=np.int64),
                "spre": pd.Series([], dtype=np.int64)})
        M = int8_quantize(
            np.stack([np.asarray(v, dtype=np.float64)
                      for v in b[vec_col]]), scale).astype(np.int64)
        ids = b[id_col].to_numpy(np.int64)
        sfull = M @ qq.T                      # (B, n_queries)
        spre = M[:, :prefix_dim] @ qq[:, :prefix_dim].T
        outs = []
        for q in range(qq.shape[0]):
            cand = np.zeros(len(ids), bool)
            for s in (sfull[:, q], spre[:, q]):
                order = np.lexsort((ids, -s))[:k]
                cand[order] = True
            outs.append(pd.DataFrame({
                "qid": np.full(int(cand.sum()), q, np.int64),
                id_col: ids[cand], "sfull": sfull[cand, q],
                "spre": spre[cand, q]}))
        return pd.concat(outs, ignore_index=True)

    local = ds.map_batches(score, batch_format="pandas").to_pandas()
    rows = []
    for q, g in local.groupby("qid", sort=True):
        ids = g[id_col].to_numpy(np.int64)
        top_f = set(ids[np.lexsort((ids, -g["sfull"].to_numpy()))[:k]])
        top_p = set(ids[np.lexsort((ids, -g["spre"].to_numpy()))[:k]])
        rows.append((np.int64(q), np.int64(len(top_f & top_p))))
    return pd.DataFrame(rows, columns=["query_id", "overlap10"]).astype(
        np.int64)

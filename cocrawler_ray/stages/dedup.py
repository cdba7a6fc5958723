"""Deduplication operators for training-data pipelines (SURVEY addendum):
exact (content-hash), MinHash+LSH, SimHash banding, n-gram Jaccard verify,
embedding-cosine near-dup.

Scale shapes (ray_guide.md "Aggregation at scale"):
- exact: vectorized content-hash per batch -> groupby(hash) -> first.
- MinHash-LSH: shingle+minhash per batch -> explode to
  (band_id, band_hash, doc_id) rows -> groupby band -> candidate pairs ->
  verify Jaccard. Only the tiny band table shuffles, never the text.
- embedding near-dup: normalized matmul per batch against a broadcast
  matrix (LSH-bucket the rows first at scale).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from cocrawler_ray.hashing import hash64, minhash_signatures


# -- exact ------------------------------------------------------------------

def content_hash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """md5 content hash (matches DuckDB md5() for the oracle)."""
    texts = batch.column(text_col).to_pylist()
    digests = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
    return batch.append_column("digest", pa.array(digests, pa.string()))


def exact_dedup(ds: rd.Dataset, id_col: str, text_col: str = "text") -> rd.Dataset:
    """Keep the min-id row per identical content (first-wins under id order).

    Combiner shape: min-by-id is associative, so each block drops its local
    duplicates first and only the survivors shuffle — the digest groupby
    then touches |distinct| rows, not |corpus| rows. At 100 TB the hash +
    local dedup pass streams; only (digest, winner-row) survivors hit the
    exchange. Same first-wins rule as the crawl loop's link dedup
    (stages/process.py::dedup_links_batch)."""
    def local_first(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(id_col, kind="stable")
                  .drop_duplicates("digest", keep="first"))

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col, kind="stable").head(1)

    return (ds.map_batches(content_hash_batch, fn_kwargs=dict(text_col=text_col),
                           batch_format="pyarrow")
              .map_batches(local_first, batch_format="pandas")
              .groupby("digest")
              .map_groups(first, batch_format="pandas"))


# -- shingles / MinHash LSH -------------------------------------------------

def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    toks = text.split()
    if len(toks) < k:
        return hash64([" ".join(toks)]) if toks else np.empty(0, dtype=np.uint64)
    return np.unique(hash64([" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]))


def minhash_bands_batch(batch: pa.Table, id_col: str, text_col: str = "text",
                        num_perm: int = 64, bands: int = 16, k: int = 3) -> pa.Table:
    """Per-doc minhash -> (doc_id, band_id, band_hash) rows (exploded).
    rows_per_band = num_perm // bands; band_hash = hash of the band slice."""
    ids = batch.column(id_col).to_numpy()
    texts = batch.column(text_col).to_pylist()
    sh = [shingle_hashes(t, k) for t in texts]
    sigs = minhash_signatures(sh, num_perm)  # (n, num_perm)
    r = num_perm // bands
    n = len(ids)
    band_ids = np.tile(np.arange(bands, dtype=np.int32), n)
    doc_ids = np.repeat(ids, bands)
    with np.errstate(over="ignore"):
        chunks = sigs.reshape(n, bands, r)
        bh = chunks[:, :, 0].astype(np.uint64).copy()
        for j in range(1, r):
            bh = bh * np.uint64(0x100000001B3) ^ chunks[:, :, j]
    return pa.table({
        id_col: pa.array(doc_ids),
        "band_id": pa.array(band_ids),
        "band_hash": pa.array(bh.reshape(-1), pa.uint64()),
    })


def candidate_pairs_group(g: pd.DataFrame, id_col: str) -> pd.DataFrame:
    """All (a<b) pairs within one (band_id, band_hash) bucket."""
    ids = np.sort(g[id_col].to_numpy())
    if len(ids) < 2:
        return pd.DataFrame({"doc_a": [], "doc_b": []})
    ia, ib = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]})


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    sa, sb = set(shingle_hashes(a, k).tolist()), set(shingle_hashes(b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


def minhash_lsh_pairs(ds: rd.Dataset, id_col: str, text_col: str = "text",
                      num_perm: int = 64, bands: int = 16, k: int = 3,
                      verify_threshold: float | None = None) -> pd.DataFrame:
    """Candidate near-dup pairs via MinHash banding; optional exact-Jaccard
    verification.

    Scale shape: the banding pass streams (map_batches), the bucket groupby
    shuffles only (id, band) rows — never text — and the verify step pulls
    text ONLY for candidate-pair ids (a second pruned streaming pass over
    ``ds``), so nothing materializes the corpus on the driver. Candidate
    count is assumed << corpus size (that's what LSH banding is for)."""
    band_rows = ds.map_batches(
        minhash_bands_batch,
        fn_kwargs=dict(id_col=id_col, text_col=text_col, num_perm=num_perm,
                       bands=bands, k=k),
        batch_format="pyarrow")
    pairs = (band_rows.groupby(["band_id", "band_hash"])
             .map_groups(lambda g: candidate_pairs_group(g, id_col),
                         batch_format="pandas")
             .to_pandas())
    pairs = pairs.drop_duplicates().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    if verify_threshold is not None and len(pairs):
        cand_ids = np.unique(np.concatenate([pairs["doc_a"].to_numpy(),
                                             pairs["doc_b"].to_numpy()]))
        id_set = set(cand_ids.tolist())
        texts_tab = (ds.map_batches(
            lambda t: t.filter(pa.array(np.isin(t.column(id_col).to_numpy(),
                                                cand_ids))),
            batch_format="pyarrow").to_pandas())
        texts = dict(zip(texts_tab[id_col], texts_tab[text_col]))
        assert id_set <= set(texts), "candidate ids missing from corpus"
        jac = np.array([ngram_jaccard(texts[a], texts[b], k)
                        for a, b in zip(pairs["doc_a"], pairs["doc_b"])])
        pairs = pairs.assign(jaccard=np.round(jac, 6))
        pairs = pairs[pairs["jaccard"] >= verify_threshold].reset_index(drop=True)
    return pairs


# -- SimHash ----------------------------------------------------------------

def simhash_batch(batch: pa.Table, id_col: str, text_col: str = "text") -> pa.Table:
    """64-bit SimHash per document + 4x16-bit band keys for blocking."""
    from cocrawler_ray.hashing import simhash64
    texts = batch.column(text_col).to_pylist()
    hs = np.array([simhash64(hash64(t.split())) if t.split() else 0 for t in texts],
                  dtype=np.uint64)
    out = pa.table({id_col: batch.column(id_col)})
    out = out.append_column("simhash", pa.array(hs.astype(np.int64).view(np.int64)))
    for b in range(4):
        band = ((hs >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
        out = out.append_column(f"band{b}", pa.array(band))
    return out


# -- embedding cosine near-dup ---------------------------------------------

def embedding_neardup_pairs(ds: rd.Dataset, id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            threshold: float = 0.8) -> pd.DataFrame:
    """All (a<b) pairs with cosine >= threshold.

    Batch x broadcast-matrix matmul (float64). At this table's scale the
    full matrix broadcasts; the 100 TB path LSH-buckets rows first (random
    hyperplane signs) and only compares within buckets."""
    import ray

    tbl = ds.to_pandas()
    ids = tbl[id_col].to_numpy()
    M = np.stack([np.asarray(v, dtype=np.float64) for v in tbl[vec_col]])
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, M))

    def against_all(batch: pd.DataFrame) -> pd.DataFrame:
        all_ids, all_M = ray.get(ref)
        q = np.stack([np.asarray(v, dtype=np.float64) for v in batch[vec_col]])
        q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        sims = q @ all_M.T
        qa, qb = np.nonzero(sims >= threshold)
        a = batch[id_col].to_numpy()[qa]
        b = all_ids[qb]
        keep = a < b
        return pd.DataFrame({"vec_a": a[keep], "vec_b": b[keep],
                             "sim": np.round(sims[qa, qb][keep], 6)})

    out = ds.map_batches(against_all, batch_format="pandas").to_pandas()
    if out.empty:
        return pd.DataFrame({"vec_a": pd.Series([], dtype="int64"),
                             "vec_b": pd.Series([], dtype="int64"),
                             "sim": pd.Series([], dtype="float64")})
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)

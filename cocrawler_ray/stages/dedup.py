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

from cocrawler_ray.hashing import hash64, shingle_hash_batch
from cocrawler_ray.stages import exchange
from cocrawler_ray.stages import text as textops


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

    survivors = (ds.map_batches(content_hash_batch,
                                fn_kwargs=dict(text_col=text_col),
                                batch_format="pyarrow")
                 .map_batches(local_first, batch_format="pandas"))
    # digest domain ~= |distinct corpus| -> hash exchange (vectorized
    # winner rule per partition), not the per-group-Python native groupby
    return exchange.grouped_shuffle(survivors, ["digest"], local_first)


# -- shingles / MinHash LSH -------------------------------------------------

def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Distinct shingle hashes of one document (set semantics — the exact
    Jaccard kernel). Single-doc view of shingle_hash_batch."""
    sh, _ = shingle_hash_batch([text], k)
    return np.unique(sh)


def minhash_bands_batch(batch: pa.Table, id_col: str, text_col: str = "text",
                        num_perm: int = 64, bands: int = 16, k: int = 3) -> pa.Table:
    """Per-doc minhash -> (doc_id, band_id, band_hash) rows (exploded).
    rows_per_band = num_perm // bands; band_hash = hash of the band slice."""
    from cocrawler_ray.hashing import _perm_constants

    ids = batch.column(id_col).to_numpy()
    texts = batch.column(text_col).to_pylist()
    # batch shingles + per-permutation min via reduceat over doc segments —
    # no per-doc Python. (Duplicate shingles don't change a min, so no
    # per-doc unique is needed for MinHash.)
    sh_concat, sh_counts = shingle_hash_batch(texts, k)
    n_docs = len(texts)
    a, b = _perm_constants(num_perm, seed=7)
    sigs = np.full((n_docs, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    nz = sh_counts > 0
    if nz.any():
        seg_offs = (np.cumsum(sh_counts) - sh_counts)[nz]
        with np.errstate(over="ignore"):
            for j in range(num_perm):
                v = a[j] * sh_concat + b[j]
                sigs[nz, j] = np.minimum.reduceat(v, seg_offs)
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
        # int64 view of the uint64 hash: >2^63 values break the pandas
        # round-trip inside Ray Data's groupby (bit-identical, key-only)
        "band_hash": pa.array(bh.reshape(-1).view(np.int64), pa.int64()),
    })


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    sa, sb = set(shingle_hashes(a, k).tolist()), set(shingle_hashes(b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


def minhash_lsh_pairs(ds: rd.Dataset, id_col: str, text_col: str = "text",
                      num_perm: int = 64, bands: int = 16, k: int = 3,
                      verify_threshold: float | None = None,
                      est_bytes: int | None = None) -> rd.Dataset:
    """Candidate near-dup pairs via MinHash banding; optional exact-Jaccard
    verification. Returns a DATASET of (doc_a, doc_b[, jaccard]) — pairs
    never gather on the driver (a saturated-dup sf1 stress produced
    millions; consumers stream, write, aggregate, or feed them to
    components).

    Scale shape: the banding pass streams (map_batches) into int-only band
    rows (never text), which take ONE hash exchange
    (``exchange.grouped_shuffle``) co-locating each (band, hash) bucket.
    Hot-bucket detection is then a local vectorized size transform inside
    the partition reduce, and only the multi-member buckets (the actual
    near-dup clusters, << corpus) pay per-group pair expansion; a SECOND
    pair-keyed exchange removes the bands-fold multiplicity distributed.
    ``Dataset.groupby`` is avoided deliberately: its aggregate is
    per-group Python over the bands x corpus bucket domain (measured
    14 s / 90k rows — exchange.py). The verify step is fully distributed
    too: two hash joins co-locate each pair with both its texts and the
    exact Jaccard runs vectorized per joined batch — no driver text dict,
    no per-pair driver loop (the round-1 form pulled every candidate text
    to the driver; the round-4 form still pulled the PAIR SET)."""
    _FNV = np.uint64(0x100000001B3)

    if verify_threshold is not None:
        # the corpus feeds two passes (banding + verify tag); pin the
        # blocks (spillable) instead of recomputing the upstream pipeline
        # per pass — SIZE-GATED like every other multi-consumer pin
        # (``est_bytes``: caller's corpus estimate, e.g. the parquet
        # size); past the budget each pass re-executes the pruned scan
        ds = exchange.materialize_if_small(ds, est_bytes)

    def _bucket_key(band_id: np.ndarray, band_hash: np.ndarray) -> np.ndarray:
        # collisions only over-include rows; exact grouping happens later
        with np.errstate(over="ignore"):
            bh = np.ascontiguousarray(band_hash, dtype=np.int64).view(np.uint64)
            return bh * _FNV + band_id.astype(np.uint64)

    band_rows = ds.map_batches(
        minhash_bands_batch,
        fn_kwargs=dict(id_col=id_col, text_col=text_col, num_perm=num_perm,
                       bands=bands, k=k),
        batch_format="pyarrow")
    empty = pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                          "doc_b": pd.Series([], dtype="int64")})

    def expand_partition(df: pd.DataFrame) -> pd.DataFrame:
        # every member of a bucket is co-located here, so hot-bucket
        # detection is a LOCAL vectorized size transform; only the hot
        # buckets (the actual near-dup clusters, << corpus) pay the
        # per-group pair expansion.
        key = _bucket_key(df["band_id"].to_numpy(), df["band_hash"].to_numpy())
        sizes = df.groupby(key, sort=False)[df.columns[0]].transform("size")
        hot = df[sizes.to_numpy() >= 2]
        out = []
        for _, g in hot.groupby(["band_id", "band_hash"], sort=False):
            ids = np.sort(g[id_col].to_numpy())
            ia, ib = np.triu_indices(len(ids), k=1)
            out.append(pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]}))
        return pd.concat(out, ignore_index=True) if out else empty

    # ONE hash exchange of int-only band rows, NOT Dataset.groupby (the
    # bucket domain is bands x corpus — per-group Python in the native
    # aggregate, see exchange.py). A pair caught in b bands lands in b
    # bucket partitions, so the raw expansion carries up to a bands-fold
    # multiplicity — a SECOND pair-keyed exchange dedups it distributed
    # (copies of a pair hash to the same partition), and only the
    # distinct pairs land on the driver: bounded by the true near-dup
    # rate, with no bands factor (measured: 650 MB driver heap at a
    # saturated-dup sf1 stress before this exchange existed).
    pair_rows = exchange.grouped_shuffle(
        band_rows, ["band_id", "band_hash"], expand_partition)
    pairs = exchange.grouped_shuffle(
        pair_rows, ["doc_a", "doc_b"],
        lambda df: df.drop_duplicates(["doc_a", "doc_b"]))
    if verify_threshold is not None:
        scored = verify_pairs_jaccard(ds, pairs, id_col=id_col,
                                      text_col=text_col, k=k)
        thr = float(verify_threshold)

        def gate(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return t.filter(pc.greater_equal(t.column("jaccard"),
                                             pa.scalar(thr)))

        pairs = scored.map_batches(gate, batch_format="pyarrow")
    return pairs


def winnow_overlap_pairs(ds: rd.Dataset, id_col: str = "doc_id",
                         text_col: str = "text", k: int = 5,
                         window: int = 8,
                         min_shared: int = 2) -> rd.Dataset:
    """MOSS-style overlap detection: pairs of documents sharing at least
    ``min_shared`` winnowing-selected k-gram hashes, with the exact
    shared count (Schleimer et al. 2003 — the plagiarism/mirror-content
    detector; unlike MinHash it reports WHICH grams matched in exact
    count, so the score is deterministic, not an estimate).

    Scale shape mirrors minhash_lsh_pairs: the selection pass streams
    into int-only (id, gram) rows (distinct per doc — never text), ONE
    gram exchange co-locates each gram's members, only multi-member
    grams pay pair expansion, and a SECOND pair exchange counts shared
    grams per pair so the >= min_shared filter runs distributed. The
    result STAYS a Dataset — surviving (doc_a, doc_b, shared) triples
    never land on the driver (a saturated-dup sf1 stress produced 9.3M
    of them; consumers stream, write, or aggregate it). A gram shared by
    g docs expands to O(g^2) pairs — the same
    documented hot-bucket property as LSH banding (real mirror clusters
    ARE quadratic in pair space)."""
    gram_rows = ds.map_batches(
        textops.winnow_grams_batch,
        fn_kwargs=dict(id_col=id_col, text_col=text_col, k=k,
                       window=window),
        batch_format="pyarrow")
    empty = pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                          "doc_b": pd.Series([], dtype="int64")})

    def expand_partition(df: pd.DataFrame) -> pd.DataFrame:
        sizes = df.groupby("gram", sort=False)[id_col].transform("size")
        hot = df[sizes.to_numpy() >= 2]
        out = []
        for _, g in hot.groupby("gram", sort=False):
            ids = np.sort(g[id_col].to_numpy())
            ia, ib = np.triu_indices(len(ids), k=1)
            out.append(pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]}))
        return pd.concat(out, ignore_index=True) if out else empty

    pair_rows = exchange.grouped_shuffle(gram_rows, ["gram"],
                                         expand_partition)

    def count_partition(df: pd.DataFrame) -> pd.DataFrame:
        # grams are distinct per doc, so each shared gram contributes
        # exactly one (a, b) row — the group size IS the shared count
        g = (df.groupby(["doc_a", "doc_b"], sort=False).size()
             .reset_index(name="shared"))
        return g[g["shared"] >= min_shared]

    return exchange.grouped_shuffle(pair_rows, ["doc_a", "doc_b"],
                                    count_partition)


def verify_pairs_jaccard(ds: rd.Dataset, pairs: rd.Dataset,
                         id_col: str, text_col: str = "text", k: int = 3
                         ) -> rd.Dataset:
    """Exact n-gram Jaccard for candidate (doc_a, doc_b) pairs — fully
    distributed, pairs in AND out as Datasets (nothing pair- or
    corpus-sized touches the driver).

    Shape: two hash joins (``exchange.hash_join`` — the same vectorized
    exchange) attach each side's text to its pairs, so every scored
    batch holds both members co-located. A doc in P pairs is replicated
    P times (P is bounded by the doc's near-dup cluster size) — but each
    distinct TEXT is shingled once per batch, and each pair is then a
    sorted-array intersection, not a re-shingle. Pairs whose members are
    missing from the corpus drop out (inner join) — candidates came from
    the corpus, so none exist in practice."""

    def side(role: str) -> rd.Dataset:
        def ren(t: pa.Table) -> pa.Table:
            return pa.table({f"doc_{role}": t.column(id_col),
                             f"__text_{role}": t.column(text_col)})
        return ds.map_batches(ren, batch_format="pyarrow")

    j1 = exchange.hash_join(pairs, side("a"), on=["doc_a"])
    j2 = exchange.hash_join(j1, side("b"), on=["doc_b"])

    def jac_batch(t: pa.Table) -> pa.Table:
        out_t = pa.table({"doc_a": t.column("doc_a"),
                          "doc_b": t.column("doc_b")})
        if not t.num_rows:
            return out_t.append_column("jaccard",
                                       pa.array([], pa.float64()))
        ta = t.column("__text_a").to_pylist()
        tb = t.column("__text_b").to_pylist()
        texts = list(dict.fromkeys(ta + tb))
        sh, counts = shingle_hash_batch(texts, k)
        offs = np.cumsum(counts) - counts
        sets = {s: np.unique(sh[offs[i]:offs[i] + counts[i]])
                for i, s in enumerate(texts)}
        jac = np.empty(len(ta), dtype=np.float64)
        for i in range(len(ta)):
            sa, sb = sets[ta[i]], sets[tb[i]]
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = sa.size + sb.size - inter
            jac[i] = round(1.0 if union == 0 else inter / union, 6)
        return out_t.append_column("jaccard", pa.array(jac, pa.float64()))

    return j2.map_batches(jac_batch, batch_format="pyarrow")


# -- SimHash ----------------------------------------------------------------

def simhash_batch(batch: pa.Table, id_col: str, text_col: str = "text") -> pa.Table:
    """64-bit SimHash per document + 4x16-bit band keys for blocking.

    Batch-vectorized: ONE hash64 call over the batch's flattened tokens,
    then 64 per-bit ±1 reduceat sums over doc segments (bounded memory —
    a (tokens x 64) ±1 matrix would be hundreds of MB per batch). Same
    definition as hashing.simhash64 per doc (property-tested)."""
    texts = batch.column(text_col).to_pylist()
    tok_lists = [t.split() for t in texts]
    lens = np.array([len(x) for x in tok_lists], dtype=np.int64)
    flat = [w for toks in tok_lists for w in toks]
    th = hash64(flat)
    n = len(texts)
    offs = np.cumsum(lens) - lens
    nz = lens > 0
    hs = np.zeros(n, dtype=np.uint64)
    if nz.any():
        seg = offs[nz]   # contiguous: zero-token docs contribute nothing
        one = np.uint64(1)
        for i in range(64):
            bit = ((th >> np.uint64(i)) & one).astype(np.int64) * 2 - 1
            pos = np.add.reduceat(bit, seg) > 0
            hs[nz] |= pos.astype(np.uint64) << np.uint64(i)
    out = pa.table({id_col: batch.column(id_col)})
    out = out.append_column("simhash", pa.array(hs.astype(np.int64).view(np.int64)))
    for b in range(4):
        band = ((hs >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
        out = out.append_column(f"band{b}", pa.array(band))
    return out


# -- embedding cosine near-dup ---------------------------------------------

_EMPTY_PAIRS = {"vec_a": pd.Series([], dtype="int64"),
                "vec_b": pd.Series([], dtype="int64"),
                "sim": pd.Series([], dtype="float64")}


def _norm_mat(vals) -> np.ndarray:
    M = np.stack([np.asarray(v, dtype=np.float64) for v in vals])
    return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)


def embedding_neardup_pairs(ds: rd.Dataset, id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            threshold: float = 0.8) -> pd.DataFrame:
    """All (a<b) pairs with cosine >= threshold — EXACT, distributed.

    All-pairs is inherently O(N^2) compute; the scale question is where it
    runs. This is a block-pair cartesian: the dataset's blocks stay in the
    object store (``to_arrow_refs`` — nothing materializes on the driver),
    one Ray task scores each unordered block pair (i <= j), and only the
    tiny qualifying-pair tables return. Worker memory is O(block), compute
    parallelism is B(B+1)/2 tasks. Raw tasks instead of Dataset ops
    because a pairwise self-join over blocks has no map_batches/groupby
    shape (each task needs exactly two co-located blocks).

    For the sub-quadratic approximate path use
    ``embedding_neardup_lsh_pairs``."""
    import ray

    refs = ds.to_arrow_refs()

    @ray.remote
    def block_pairs(ta: pa.Table, tb: pa.Table, same: bool) -> pd.DataFrame:
        ia = ta.column(id_col).to_numpy()
        ib = tb.column(id_col).to_numpy()
        A = _norm_mat(ta.column(vec_col).to_pylist())
        B = _norm_mat(tb.column(vec_col).to_pylist())
        sims = A @ B.T
        qa, qb = np.nonzero(sims >= threshold)
        a, b = ia[qa], ib[qb]
        keep = a < b if same else a != b
        a2 = np.where(a[keep] < b[keep], a[keep], b[keep])
        b2 = np.where(a[keep] < b[keep], b[keep], a[keep])
        return pd.DataFrame({"vec_a": a2, "vec_b": b2,
                             "sim": np.round(sims[qa, qb][keep], 6)})

    futs = [block_pairs.remote(refs[i], refs[j], i == j)
            for i in range(len(refs)) for j in range(i, len(refs))]
    parts = [p for p in ray.get(futs) if len(p)]
    if not parts:
        return pd.DataFrame(_EMPTY_PAIRS)
    out = pd.concat(parts, ignore_index=True).drop_duplicates(["vec_a", "vec_b"])
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


def embedding_neardup_lsh_pairs(ds: rd.Dataset, id_col: str = "vec_id",
                                vec_col: str = "embedding",
                                threshold: float = 0.45, n_bits: int = 4,
                                n_tables: int = 8, seed: int = 29,
                                tile: int = 2048) -> rd.Dataset:
    """Approximate near-dup pairs — the 100 TB path: sub-quadratic
    LSH-bucketed comparison (SemDeDup-style blocking).

    Each row is keyed into ``n_tables`` independent hyperplane tables
    (OR-construction recall boost); rows sharing a (table, key) bucket
    are scored within the bucket. Scale shape matches
    ``minhash_lsh_pairs``: the keying pass streams, ONE hash exchange
    (``exchange.grouped_shuffle``) co-locates each bucket's members, and
    in-bucket scoring is a TILED matmul — each tile scores ``tile`` rows
    against the bucket, so worker memory is O(tile x |bucket|), never
    O(|bucket|^2), even when a giant near-dup cluster lands one bucket.
    A pair caught by multiple tables carries a tables-fold multiplicity,
    so a SECOND pair-keyed exchange dedups it distributed; the result
    STAYS a Dataset — pairs never gather on the driver (consumers
    stream, write, or aggregate). In-bucket pair compute is inherently
    O(|bucket|^2) — the same documented hot-bucket property as MinHash
    banding (real near-dup clusters ARE quadratic in pair space).
    Bucketing uses the integer-exact quantized Rademacher planes
    (similarity.hyperplane_key_batch rationale), so the DuckDB mirror
    (oracles.embed_neardup_lsh_sql) restates bucket membership exactly.
    Recall < 1 by design; raise n_tables (or use the exact block-pair
    ``embedding_neardup_pairs``) when completeness matters."""
    from cocrawler_ray.oracles import quantize_vecs, rademacher_planes

    first = ds.take(1)[0]
    dim = len(first[vec_col])
    planes = [rademacher_planes(n_bits, dim, seed + t) for t in range(n_tables)]

    def key(t: pa.Table) -> pa.Table:
        Q = quantize_vecs(np.stack([np.asarray(v, dtype=np.float64)
                                    for v in t.column(vec_col).to_pylist()]))
        outs = []
        for ti, P in enumerate(planes):
            bits = (Q @ P.T) > 0
            k = np.full(len(Q), ti << n_bits, dtype=np.int64)
            for b in range(n_bits):
                k |= bits[:, b].astype(np.int64) << b
            outs.append(pa.table({"bucket": pa.array(k),
                                  id_col: t.column(id_col),
                                  vec_col: t.column(vec_col)}))
        return pa.concat_tables(outs)

    empty = pd.DataFrame(_EMPTY_PAIRS)

    def score_partition(df: pd.DataFrame) -> pd.DataFrame:
        # every member of each bucket is co-located here; buckets are
        # bounded by n_tables * 2^n_bits so this group loop is O(128),
        # and the per-bucket work is vectorized tiled matmul.
        out = []
        for _, g in df.groupby("bucket", sort=False):
            if len(g) < 2:
                continue
            ids = g[id_col].to_numpy()
            M = _norm_mat(g[vec_col])
            for s in range(0, len(g), tile):
                A = M[s:s + tile]
                sims = A @ M.T            # (tile x |bucket|) — bounded
                qa, qb = np.nonzero(sims >= threshold)
                keep = ids[qa + s] < ids[qb]   # a<b once per bucket
                out.append(pd.DataFrame({
                    "vec_a": ids[qa + s][keep], "vec_b": ids[qb][keep],
                    "sim": np.round(sims[qa, qb][keep], 6)}))
        return pd.concat(out, ignore_index=True) if out else empty

    pair_rows = exchange.grouped_shuffle(
        ds.map_batches(key, batch_format="pyarrow"),
        ["bucket"], score_partition)
    # tables-fold multiplicity dedups DISTRIBUTED (copies of a pair hash
    # to the same partition); sims are deterministic per pair, so any
    # copy may survive
    return exchange.grouped_shuffle(
        pair_rows, ["vec_a", "vec_b"],
        lambda df: df.drop_duplicates(["vec_a", "vec_b"]))


# -- phash hamming near-dup (image axis) ------------------------------------

_POP16 = np.array([bin(i).count("1") for i in range(1 << 16)], dtype=np.int64)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount via a 16-bit lookup table (numpy < 2.0
    has no bitwise_count)."""
    x = x.view(np.uint64) if x.dtype == np.int64 else x.astype(np.uint64)
    return (_POP16[(x & np.uint64(0xFFFF)).astype(np.int64)]
            + _POP16[((x >> np.uint64(16)) & np.uint64(0xFFFF)).astype(np.int64)]
            + _POP16[((x >> np.uint64(32)) & np.uint64(0xFFFF)).astype(np.int64)]
            + _POP16[(x >> np.uint64(48)).astype(np.int64)])


def phash_hamming_pairs(ds: rd.Dataset, id_col: str, phash_col: str,
                        bits: int = 32, bands: int = 4,
                        max_dist: int = 6) -> rd.Dataset:
    """Near-duplicate image pairs by perceptual-hash Hamming distance,
    LSH-blocked: split each ``bits``-bit phash into ``bands`` equal-width
    exact-match bands; pairs sharing >= 1 aligned band are candidates, and
    candidates verify with popcount(xor) <= ``max_dist``.

    Recall contract (standard banding pigeonhole): any pair with distance
    < ``bands`` is GUARANTEED caught; beyond that recall decays — size
    ``bands`` to the target distance. Scale shape mirrors MinHash-LSH:
    int-only (band, band_value) rows through ONE ``grouped_shuffle``;
    every bucket's members are co-located so pair expansion + Hamming
    verification run vectorized inside the partition reduce; a SECOND
    pair-keyed exchange removes the bands-fold multiplicity distributed,
    and the verified pairs STAY a Dataset (bounded by the near-dup rate
    but never funneled through driver pandas)."""
    assert bits % bands == 0
    width = bits // bands
    mask = np.int64((1 << width) - 1)

    def band_rows(t: pa.Table) -> pa.Table:
        ph = t.column(phash_col).to_numpy().astype(np.int64)
        ids = t.column(id_col).to_numpy()
        outs = []
        for b in range(bands):
            bv = (ph >> np.int64(b * width)) & mask
            outs.append(pa.table({
                "band": pa.array(np.full(len(ph), b, dtype=np.int64)),
                "bv": pa.array(bv),
                id_col: pa.array(ids),
                "ph": pa.array(ph)}))
        return pa.concat_tables(outs)

    empty = pd.DataFrame({"vec_a": pd.Series([], dtype=np.int64),
                          "vec_b": pd.Series([], dtype=np.int64),
                          "hamming": pd.Series([], dtype=np.int64)})

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        sizes = df.groupby(["band", "bv"], sort=False)[id_col].transform("size")
        hot = df[sizes.to_numpy() >= 2]
        out = []
        for _, g in hot.groupby(["band", "bv"], sort=False):
            order = np.argsort(g[id_col].to_numpy(), kind="stable")
            ids = g[id_col].to_numpy()[order]
            phs = g["ph"].to_numpy()[order]
            ia, ib = np.triu_indices(len(ids), k=1)
            d = popcount64(phs[ia] ^ phs[ib])
            keep = d <= max_dist
            out.append(pd.DataFrame({"vec_a": ids[ia][keep],
                                     "vec_b": ids[ib][keep],
                                     "hamming": d[keep]}))
        return pd.concat(out, ignore_index=True) if out else empty

    pair_rows = exchange.grouped_shuffle(
        ds.map_batches(band_rows, batch_format="pyarrow"),
        ["band", "bv"], expand)
    return exchange.grouped_shuffle(
        pair_rows, ["vec_a", "vec_b"],
        lambda df: df.drop_duplicates(["vec_a", "vec_b"]))


def span_dedup(spans: rd.Dataset, id_col: str, ord_col: str,
               span_col: str) -> rd.Dataset:
    """Corpus-level exact span deduplication (RefinedWeb-style repeated
    paragraph / boilerplate removal): a span (paragraph, line, fixed word
    window) survives only in its FIRST occurrence corpus-wide — smallest
    ``(id, ord)`` — and every document is reassembled from its surviving
    spans. Returns one row per document: ``n_kept``, ``n_dropped``,
    ``clean_text`` (kept spans re-joined in document order; '' when a doc
    loses every span).

    Scale shape: two hash exchanges and nothing else. Exchange 1
    co-locates spans by TEXT (winner = min (id, ord) is a vectorized sort
    + duplicated() inside the partition reduce); exchange 2 co-locates the
    marked spans by DOCUMENT for the reassembly group-concat. Span rows
    cross the wire twice but never gather on the driver, and both reduces
    are O(partition). Boilerplate-heavy corpora shrink in exchange 2's
    output by exactly the dup mass removed."""

    def winner(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([span_col, id_col, ord_col], kind="stable")
        return df.assign(
            kept=~df[span_col].duplicated().to_numpy())

    marked = exchange.grouped_shuffle(spans, [span_col], winner)

    def reassemble(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                id_col: pd.Series([], dtype=np.int64),
                "n_kept": pd.Series([], dtype=np.int64),
                "n_dropped": pd.Series([], dtype=np.int64),
                "clean_text": pd.Series([], dtype=object)})
        df = df.sort_values([id_col, ord_col], kind="stable")
        g = df.groupby(id_col, sort=False)
        n_kept = g["kept"].sum().astype(np.int64)
        n_tot = g.size().astype(np.int64)
        clean = (df[df["kept"]]
                 .groupby(id_col, sort=False)[span_col].agg(" ".join))
        idx = n_kept.index
        return pd.DataFrame({
            id_col: idx.to_numpy().astype(np.int64),
            "n_kept": n_kept.to_numpy(),
            "n_dropped": (n_tot - n_kept).to_numpy(),
            "clean_text": clean.reindex(idx).fillna("").to_numpy(object)})

    return exchange.grouped_shuffle(marked, [id_col], reassemble)


_CDC_POLY = np.uint64(0x100000001B3)   # hashing._POLY rolling multiplier
_CDC_A = np.uint64(1000003)            # chunk-hash byte salt
_CDC_B = np.uint64(0x5851F42D4C957F2D)  # chunk-hash position salt


def cdc_chunk_payloads(batch: pa.Table, id_col: str = "doc_id",
                       payload_col: str = "payload",
                       mask: int = 63) -> pa.Table:
    """Content-defined chunking (rsync/FastCDC-style): cut each binary
    payload where a rolling 4-byte polynomial hash lands on ``hash &
    mask == 0`` (mask must be 2^k - 1, i.e. hash % (mask+1) == 0), so chunk boundaries follow content — an insertion
    shifts bytes but downstream boundaries re-synchronize, which is what
    makes chunk-level dedup of near-identical payloads (WARC revisits,
    mirrored pages) work at archive scale. Production CDC adds min/max
    chunk clamps; this keeps the pure content-defined rule so the oracle
    stays a closed form.

    Fully batch-vectorized: all payloads concatenate into one uint8
    array; the rolling hash is four shifted uint64 multiplies over that
    array (boundary positions crossing payloads are masked out); chunk
    ids fall out of a reset cumulative sum, and per-chunk (start, length,
    hash) out of reduceat over the boundary flags. The chunk hash is an
    xor-fold of splitmix64(byte * A + offset_in_chunk * B) — position-
    salted so it is order-aware yet segment-computable, and exactly
    restatable in SQL (oracles.cdc_sql).

    Emits one row per chunk: (doc_id, chunk_ix, start, length,
    chunk_hash int64). Per-payload by construction -> one streaming scan;
    a downstream exact-dedup groupby on chunk_hash is the standard
    chunk-store shape."""
    from cocrawler_ray.hashing import splitmix64

    if (mask + 1) & mask:
        raise ValueError("mask must be 2^k - 1 (the cut test is acc & mask)")
    ids = batch.column(id_col).to_numpy()
    payloads = batch.column(payload_col).to_pylist()
    if not len(ids):
        return pa.table({
            id_col: pa.array([], pa.int64()),
            "chunk_ix": pa.array([], pa.int64()),
            "start": pa.array([], pa.int64()),
            "length": pa.array([], pa.int64()),
            "chunk_hash": pa.array([], pa.int64())})
    lens = np.array([len(p) for p in payloads], dtype=np.int64)
    b = np.frombuffer(b"".join(payloads), dtype=np.uint8).astype(np.uint64)
    n = len(b)
    starts = np.cumsum(lens) - lens
    row = np.repeat(np.arange(len(ids), dtype=np.int64), lens)
    pstart = np.repeat(starts, lens)
    rel = np.arange(n, dtype=np.int64) - pstart

    with np.errstate(over="ignore"):
        acc = np.zeros(n, dtype=np.uint64)
        acc[3:] = b[:-3]
        for sl in (b[1:-2], b[2:-1], b[3:]):
            acc[3:] = acc[3:] * _CDC_POLY + sl
        cut = np.zeros(n, dtype=np.int64)
        valid = rel >= 3
        cut[valid] = (acc[valid] & np.uint64(mask)) == 0
        # chunk id = number of cuts strictly before this byte, reset per
        # payload (a cut AFTER position j closes the chunk at j)
        pre = np.concatenate(([0], np.cumsum(cut)[:-1]))
        chunk = pre - pre[pstart]
        # boundary flags: new (payload, chunk) runs
        new = np.ones(n, dtype=bool)
        if n > 1:
            new[1:] = (row[1:] != row[:-1]) | (chunk[1:] != chunk[:-1])
        bpos = np.flatnonzero(new)
        cstart = np.repeat(rel[bpos], np.diff(np.append(bpos, n)))
        inchunk = rel - cstart
        xh = splitmix64(b * _CDC_A + inchunk.astype(np.uint64) * _CDC_B)
        chash = np.bitwise_xor.reduceat(xh, bpos)
        length = np.diff(np.append(bpos, n)).astype(np.int64)
    return pa.table({
        id_col: pa.array(ids[row[bpos]], pa.int64()),
        "chunk_ix": pa.array(chunk[bpos], pa.int64()),
        "start": pa.array(rel[bpos], pa.int64()),
        "length": pa.array(length, pa.int64()),
        "chunk_hash": pa.array(chash.view(np.int64), pa.int64())})

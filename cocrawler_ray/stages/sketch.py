"""Mergeable cardinality sketch (HyperLogLog) — the approximate
count-distinct an engine needs at 100 TB, where the exact distinct set IS
the big data (distinct URLs/hosts across 10^10 rows).

Reference parity: upstream CoCrawler keeps exact per-crawl URL/host sets
(``cocrawler/stats.py`` counters + the in-memory seen set); at the target
scale an exact global distinct is a full shuffle (``queries.py::
q_union_links``'s documented limit), so the sketch is the scale path:
per-block registers (one streaming pass, no shuffle), merged by an
elementwise ``max`` — associative, commutative, idempotent — and only
KB-sized register arrays ever cross the wire.

Flajolet et al., "HyperLogLog: the analysis of a near-optimal cardinality
estimation algorithm" (2007), with the standard small-range linear
counting correction. Hashing rides ``hashing.hash64`` (the engine-wide
splitmix-based 64-bit hash), so sketches built anywhere in the engine
merge consistently.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from cocrawler_ray.hashing import hash64, splitmix64


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (6 masked passes).
    x == 0 returns 63 — callers special-case zero."""
    x = x.copy()
    n = np.zeros(x.shape, np.uint64)
    for s in (32, 16, 8, 4, 2, 1):
        m = (x >> np.uint64(64 - s)) == 0
        n[m] += np.uint64(s)
        x[m] = x[m] << np.uint64(s)
    return n


def hll_init(p: int = 12) -> np.ndarray:
    """2^p uint8 registers (p=12 -> 4 KB, ~1.6% standard error)."""
    if not 4 <= p <= 18:
        raise ValueError(f"p={p} out of range [4, 18]")
    return np.zeros(1 << p, dtype=np.uint8)


def hll_add_hashes(regs: np.ndarray, hashes: np.ndarray) -> None:
    """Fold pre-hashed uint64 values into the registers, vectorized:
    top p bits pick the register, rho = leading-zero run of the rest + 1,
    ``np.maximum.at`` resolves duplicate registers within the batch."""
    p = int(np.log2(len(regs)))
    h = hashes.astype(np.uint64, copy=False)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h << np.uint64(p)
    rho = np.where(w == 0, np.uint64(64 - p + 1), _clz64(w) + np.uint64(1))
    np.maximum.at(regs, idx, rho.astype(np.uint8))


def hll_add(regs: np.ndarray, values) -> None:
    """Hash arbitrary values (via their string form) and fold them in."""
    vals = np.asarray(values)
    if vals.dtype.kind != "U" and vals.dtype != object:
        vals = vals.astype(str)
    hll_add_hashes(regs, hash64(list(vals)))


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Union of two sketches: elementwise register max (exactly the
    registers a single pass over the combined input would produce)."""
    if a.shape != b.shape:
        raise ValueError("merging sketches of different precision")
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    """Raw HLL estimate with the small-range linear-counting correction."""
    m = float(len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


class CountMinSketch:
    """Count-Min frequency sketch (Cormode & Muthukrishnan 2005): d rows
    of w counters; estimates are EXACT-or-OVERESTIMATE, with
    err <= e/w * total_count at probability 1 - (1/e)^d. Merge is
    elementwise ADD (counts are linear), so per-block sketches combine
    like any other combiner partial. One-pass approximate companion to
    ``stages.agg.heavy_hitters`` (exact two-pass Misra-Gries): the sketch
    answers point frequency queries without the second scan.

    Row hashes derive from one ``hashing.hash64`` via the
    Kirsch-Mitzenmacher double-hashing trick (h1 + i*h2), vectorized
    across the whole batch."""

    def __init__(self, w: int = 2048, d: int = 4):
        self.w, self.d = int(w), int(d)
        self.table = np.zeros((self.d, self.w), dtype=np.int64)

    def _indices(self, values) -> np.ndarray:
        vals = np.asarray(values)
        if vals.dtype.kind != "U" and vals.dtype != object:
            vals = vals.astype(str)
        h = hash64(list(vals))
        h1 = h >> np.uint64(32)
        h2 = (h & np.uint64(0xFFFFFFFF)) | np.uint64(1)  # odd, never 0
        i = np.arange(self.d, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :])
                % np.uint64(self.w)).astype(np.int64)

    def add(self, values, counts=None) -> None:
        idx = self._indices(values)
        c = (np.ones(idx.shape[1], np.int64) if counts is None
             else np.asarray(counts, np.int64))
        for r in range(self.d):
            np.add.at(self.table[r], idx[r], c)

    def query(self, values) -> np.ndarray:
        """Min over rows — vectorized point estimates (>= true count)."""
        idx = self._indices(values)
        return np.min(self.table[np.arange(self.d)[:, None], idx], axis=0)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (self.w, self.d) != (other.w, other.d):
            raise ValueError("merging sketches of different shape")
        out = CountMinSketch(self.w, self.d)
        out.table = self.table + other.table
        return out


def approx_topk(ds: rd.Dataset, col: str, k: int,
                w: int = 2048, d: int = 4,
                cand_factor: int = 8) -> pd.DataFrame:
    """One-pass approximate top-k: each block emits a CMS + its local
    candidate keys; the driver merges the KB-sized sketches and ranks the
    (bounded) candidate union by sketched count. Recall is HEURISTIC, not
    guaranteed: a key spread evenly across many blocks can be globally
    top-k without being locally top-k in any block — each block therefore
    keeps ``cand_factor * k`` local candidates, so missing a true top-k
    key requires it to fall outside the local top-(c*k) in EVERY block it
    touches. Counts may overestimate per the CMS bound. For exact
    phi-heavy keys use :func:`cocrawler_ray.stages.agg.heavy_hitters`."""
    def sketch_block(df: pd.DataFrame) -> pd.DataFrame:
        cms = CountMinSketch(w, d)
        u, c = np.unique(df[col].astype(str).to_numpy(), return_counts=True)
        cms.add(u, c)
        local = u[np.argsort(-c, kind="stable")][:cand_factor * k]
        return pd.DataFrame({"table": [cms.table.tobytes()],
                             "cand": [",".join(local)]})

    merged, cands = CountMinSketch(w, d), set()
    for row in (ds.map_batches(sketch_block, batch_format="pandas")
                .iter_rows()):
        part = CountMinSketch(w, d)
        part.table = np.frombuffer(row["table"], np.int64).reshape(d, w)
        merged = merged.merge(part)
        cands.update(row["cand"].split(","))
    cand = np.asarray(sorted(cands))
    est = merged.query(cand)
    order = np.lexsort((cand, -est))[:k]
    return pd.DataFrame({col: cand[order], "est": est[order]})


def approx_distinct(ds: rd.Dataset, col: str, p: int = 12) -> float:
    """Approximate count-distinct of ``ds[col]``: per-block sketches built
    inside ``map_batches`` (one streaming pass), merged on the driver —
    n_blocks x 2^p bytes, independent of row count."""
    def sketch_block(df: pd.DataFrame) -> pd.DataFrame:
        regs = hll_init(p)
        hll_add(regs, df[col].to_numpy())
        return pd.DataFrame({"regs": [regs.tobytes()]})

    merged = hll_init(p)
    for row in (ds.map_batches(sketch_block, batch_format="pandas")
                .iter_rows()):
        merged = hll_merge(merged, np.frombuffer(row["regs"], np.uint8))
    return hll_estimate(merged)


class BloomFilter:
    """Mergeable Bloom filter — the probabilistic membership gate for
    10^10-URL seen-checks when even the cuckoo table's memory is too dear
    (state/seen.py holds the engine's primary exact-shadowed cuckoo set;
    the Bloom is the cheaper one-bit-per-slot variant with NO deletion and
    NO false negatives). k hash probes per key via Kirsch-Mitzenmacher
    double hashing off one ``hashing.hash64`` call, vectorized across the
    batch; union-merge is bitwise OR, so per-block filters combine like
    any combiner partial.

    (Bloom 1970; Kirsch & Mitzenmacher 2006 — public algorithms.)
    """

    def __init__(self, n_bits: int = 1 << 20, k: int = 7):
        if n_bits & 7:
            raise ValueError("n_bits must be a multiple of 8")
        self.n_bits, self.k = int(n_bits), int(k)
        self.bits = np.zeros(self.n_bits >> 3, dtype=np.uint8)

    def _positions(self, values) -> np.ndarray:
        vals = np.asarray(values)
        if vals.dtype.kind != "U" and vals.dtype != object:
            vals = vals.astype(str)
        h = hash64(list(vals))
        h1 = h >> np.uint64(32)
        h2 = (h & np.uint64(0xFFFFFFFF)) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :])
                % np.uint64(self.n_bits)).astype(np.int64)

    def add(self, values) -> None:
        pos = self._positions(values).ravel()
        np.bitwise_or.at(self.bits, pos >> 3,
                         np.uint8(1) << (pos & 7).astype(np.uint8))

    def contains(self, values) -> np.ndarray:
        """Vectorized membership: True may be a false positive, False is
        definite."""
        pos = self._positions(values)
        got = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return got.all(axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (self.n_bits, self.k) != (other.n_bits, other.k):
            raise ValueError("merging filters of different shape")
        out = BloomFilter(self.n_bits, self.k)
        out.bits = self.bits | other.bits
        return out


def bloom_from_dataset(ds: rd.Dataset, col: str, n_bits: int = 1 << 20,
                       k: int = 7) -> BloomFilter:
    """Build a Bloom filter over a column in one streaming pass: per-block
    filters inside ``map_batches``, OR-merged on the driver (n_blocks x
    n_bits/8 bytes cross the wire, independent of row count)."""
    def sketch_block(df: pd.DataFrame) -> pd.DataFrame:
        bf = BloomFilter(n_bits, k)
        bf.add(df[col].to_numpy())
        return pd.DataFrame({"bits": [bf.bits.tobytes()]})

    merged = BloomFilter(n_bits, k)
    for row in (ds.map_batches(sketch_block, batch_format="pandas")
                .iter_rows()):
        part = BloomFilter(n_bits, k)
        part.bits = np.frombuffer(row["bits"], np.uint8).copy()
        merged = merged.merge(part)
    return merged


class QuantileSketch:
    """Mergeable approximate-quantile sketch (KLL compactor stack —
    Karnin, Lang & Liberty, "Optimal Quantile Approximation in Streams",
    FOCS 2016; public algorithm). Completes the sketch family: HLL =
    distinct, Count-Min = frequency, Bloom = membership, KLL = quantiles
    — the four summaries a 100 TB engine keeps when the exact answer IS
    the big data (exact_quantile_cont's value-count histogram is exact
    but bounded by the value DOMAIN; latencies/scores at corpus scale
    need a bounded-size sketch instead).

    Level i holds items with weight 2^i. When a level overflows its
    capacity, the sorted buffer keeps every other item (the survivors'
    parity comes from a splitmix64 coin seeded by (level, compaction
    count), so a fixed add/merge order is exactly reproducible) and
    promotes them one level up. Size is O(k log(n/k)); rank error is
    O(n/k) with small constants.

    ``merge`` concatenates per-level buffers and re-compacts — per-block
    sketches built by ``quantile_sketch_from_dataset`` merge in block
    order, so the distributed result is deterministic for a fixed
    partitioning (same contract as the other sketches)."""

    def __init__(self, k: int = 256):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, np.float64)]
        self.n = 0
        self._compactions = 0

    def _capacity(self, level: int) -> int:
        # geometrically decaying capacities (2/3^depth), floored
        depth = len(self.levels) - 1 - level
        return max(int(self.k * (2.0 / 3.0) ** depth), 8)

    def add(self, values) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if not len(v):
            return
        self.n += len(v)
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compress()

    def _compress(self) -> None:
        i = 0
        while i < len(self.levels):
            if len(self.levels[i]) <= self._capacity(i):
                i += 1
                continue
            buf = np.sort(self.levels[i])
            coin = int(splitmix64(np.array(
                [(i << 32) ^ self._compactions],
                dtype=np.uint64))[0] & np.uint64(1))
            self._compactions += 1
            survivors = buf[coin::2]
            self.levels[i] = np.empty(0, np.float64)
            if i + 1 == len(self.levels):
                self.levels.append(np.empty(0, np.float64))
            self.levels[i + 1] = np.concatenate(
                [self.levels[i + 1], survivors])
            i += 1

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        if other.k != self.k:
            raise ValueError("merging sketches of different k")
        out = QuantileSketch(self.k)
        out.n = self.n + other.n
        out._compactions = self._compactions + other._compactions
        depth = max(len(self.levels), len(other.levels))
        out.levels = []
        for i in range(depth):
            bufs = []
            if i < len(self.levels):
                bufs.append(self.levels[i])
            if i < len(other.levels):
                bufs.append(other.levels[i])
            out.levels.append(np.concatenate(bufs) if bufs
                              else np.empty(0, np.float64))
        out._compress()
        return out

    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        items, weights = [], []
        for i, buf in enumerate(self.levels):
            if len(buf):
                items.append(buf)
                weights.append(np.full(len(buf), 1 << i, np.int64))
        if not items:
            return np.empty(0, np.float64), np.empty(0, np.int64)
        v = np.concatenate(items)
        w = np.concatenate(weights)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float) -> float:
        """Value whose estimated rank is q*n (nearest-rank semantics)."""
        v, w = self._weighted_items()
        if not len(v):
            raise ValueError("empty sketch")
        cum = np.cumsum(w)
        target = q * cum[-1]
        return float(v[min(int(np.searchsorted(cum, target)), len(v) - 1)])

    def rank(self, x: float) -> float:
        """Estimated fraction of items <= x."""
        v, w = self._weighted_items()
        if not len(v):
            raise ValueError("empty sketch")
        cum = np.cumsum(w)
        i = int(np.searchsorted(v, x, side="right"))
        return float(cum[i - 1] / cum[-1]) if i else 0.0


def quantile_sketch_from_dataset(ds: rd.Dataset, col: str,
                                 k: int = 256) -> QuantileSketch:
    """Distributed build: one KLL sketch per block inside the scan (a
    streaming map_batches — the corpus never concentrates), merged on
    the driver in block order. Driver cost: O(blocks) sketches of
    O(k log n) floats each, independent of row count."""
    def per_block(df: pd.DataFrame) -> pd.DataFrame:
        s = QuantileSketch(k)
        s.add(df[col].to_numpy())
        import pickle
        return pd.DataFrame({"sk": [pickle.dumps(s)]})

    parts = ds.select_columns([col]).map_batches(
        per_block, batch_format="pandas").take_all()
    import pickle
    out = QuantileSketch(k)
    for row in parts:
        out = out.merge(pickle.loads(row["sk"]))
    return out


class ThetaSketch:
    """KMV / theta distinct sketch (Beyer et al., "On Synopses for
    Distinct-Value Estimation Under Multiset Operations", SIGMOD 2007;
    the Apache DataSketches theta family — public algorithms): keep the
    ``k`` smallest DISTINCT 64-bit hashes of the stream. Unlike HLL it
    supports SET ALGEBRA: union = k smallest of the merged retained
    sets, and an intersection ESTIMATE falls out of the union's retained
    sample (|A∩B| ≈ theta-scaled count of union-retained hashes present
    in both sides) — the summary a 100 TB engine keeps when it needs
    overlap between two corpora (crawl frontiers, dedup universes)
    without a distributed join. Retained state is k uint64s (~KB);
    merges are associative/commutative, so per-block partials combine in
    any order."""

    def __init__(self, k: int = 48):
        self.k = int(k)
        self.hashes = np.empty(0, dtype=np.uint64)  # sorted, distinct

    def add(self, values) -> None:
        h = hash64(np.asarray(values, dtype=object))
        self.hashes = np.unique(
            np.concatenate([self.hashes, h]))[: self.k]

    def add_hashes(self, h: np.ndarray) -> None:
        self.hashes = np.unique(
            np.concatenate([self.hashes, h.astype(np.uint64)]))[: self.k]

    def merge(self, other: "ThetaSketch") -> "ThetaSketch":
        out = ThetaSketch(self.k)
        out.hashes = np.unique(
            np.concatenate([self.hashes, other.hashes]))[: self.k]
        return out

    def theta(self) -> float:
        """Sampling threshold in [0, 1]: 1.0 while the sketch is exact
        (fewer than k distinct hashes seen), else kth-smallest / 2^64."""
        if len(self.hashes) < self.k:
            return 1.0
        return float(self.hashes[-1]) / 2.0 ** 64

    def estimate(self) -> float:
        """Distinct estimate: exact count below k, else (k-1)/theta."""
        if len(self.hashes) < self.k:
            return float(len(self.hashes))
        return (self.k - 1) / self.theta()

    def contains(self, h: np.ndarray) -> np.ndarray:
        """Vectorized membership of hash values in the retained set."""
        h = h.astype(np.uint64)
        idx = np.searchsorted(self.hashes, h)
        idx[idx == len(self.hashes)] = 0
        return (self.hashes[idx] == h) if len(self.hashes) else \
            np.zeros(len(h), dtype=bool)


def theta_from_dataset(ds: rd.Dataset, col: str,
                       k: int = 48) -> ThetaSketch:
    """Distributed build: one ThetaSketch per block inside the scan
    (streaming map_batches), merged on the driver. Driver cost:
    O(blocks) x k uint64s, independent of row count."""
    def per_block(df: pd.DataFrame) -> pd.DataFrame:
        s = ThetaSketch(k)
        s.add(df[col].to_numpy())
        return pd.DataFrame({"hs": [s.hashes.tobytes()]})

    out = ThetaSketch(k)
    for row in (ds.select_columns([col])
                .map_batches(per_block, batch_format="pandas")
                .iter_rows()):
        part = ThetaSketch(k)
        part.hashes = np.frombuffer(row["hs"], np.uint64).copy()
        out = out.merge(part)
    return out

"""Deterministic, vectorized hashing for partitioning / dedup / ordering.

The reference uses Python's `random.uniform` as the queue tiebreak
(cocrawler/scheduler.py queue tuples) and sha1 for WARC payload digests
(cocrawler/warc.py). We replace the nondeterministic rand with a seeded
splitmix64 of the SURT so crawl ordering is reproducible (SURVEY.md §2.6 O2),
and use pandas' stable siphash-based string hash for partition keys.

All functions are numpy-vectorized; none are per-row Python in the hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# Fixed 16-byte key for pd.util.hash_array → stable across processes/runs.
_HASH_KEY = "cocrawler-ray-00"

_U64 = np.uint64


def hash64(strings) -> np.ndarray:
    """Deterministic 64-bit hash of a sequence/array of strings → uint64.

    Used for: seen-set keys (hash of SURT), partition assignment, minhash
    shingle bases. Stable across processes (fixed hash key, no PYTHONHASHSEED
    dependence).
    """
    arr = np.asarray(strings, dtype=object)
    if arr.size == 0:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(arr, hash_key=_HASH_KEY, categorize=False)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — uint64 in, well-mixed uint64 out (vectorized)."""
    with np.errstate(over="ignore"):
        z = (np.asarray(x, dtype=_U64) + _U64(0x9E3779B97F4A7C15))
        z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
        return z ^ (z >> _U64(31))


def rand_for_surt(surts, seed: int = 42) -> np.ndarray:
    """Deterministic queue tiebreak replacing cocrawler's random.uniform.

    rand = splitmix64(hash64(surt) ^ splitmix64(seed)); reproducible crawl
    ordering requires only (priority, rand, surt) and this function.
    """
    base = hash64(surts)
    s = splitmix64(np.array([seed], dtype=_U64))[0]
    return splitmix64(base ^ s)


def partition_of(keys: np.ndarray, num_parts: int) -> np.ndarray:
    """Partition id for pre-hashed uint64 keys: splitmix64(key) % K."""
    return (splitmix64(keys) % _U64(num_parts)).astype(np.int32)


def host_partition(hosts, num_parts: int) -> np.ndarray:
    """hash(host) % K — frontier/robots co-partitioning (SURVEY §3.4)."""
    return partition_of(hash64(hosts), num_parts)


def surt_partition(surts, num_parts: int) -> np.ndarray:
    """hash(surt) % K — seen-filter partitioning (north_rule)."""
    return partition_of(hash64(surts), num_parts)


# ---------------------------------------------------------------------------
# Batch shingling (shared by MinHash banding, exact Jaccard, winnowing)
# ---------------------------------------------------------------------------

_POLY = _U64(0x100000001B3)  # FNV-ish odd multiplier for rolling combine


def shingle_hash_batch(texts: list[str], k: int = 3
                       ) -> tuple[np.ndarray, np.ndarray]:
    """Concatenated k-gram shingle hashes for a WHOLE batch + per-doc
    counts (docs in order; empty docs contribute 0 shingles, docs with
    1..k-1 tokens contribute 1 — the polynomial over all their tokens).

    Token hashes come from ONE vectorized hash64 call over the batch's
    flattened tokens; a shingle hash is the rolling polynomial combination
    of its k token hashes. The previous form built every shingle STRING and
    called hash64 per document — per-doc pd.util.hash_array overhead made
    the shingling stages per-row Python loops (~80 µs/doc)."""
    tok_lists = [t.split() for t in texts]
    lens = np.array([len(t) for t in tok_lists], dtype=np.int64)
    flat = [w for toks in tok_lists for w in toks]
    th = hash64(flat)
    doc_offs = np.concatenate(([0], np.cumsum(lens)))
    counts = np.where(lens == 0, 0, np.maximum(lens - k + 1, 1))
    out_offs = np.cumsum(counts) - counts
    out = np.empty(int(counts.sum()), dtype=_U64)
    with np.errstate(over="ignore"):
        full = lens >= k   # vectorized main path: all length-k windows
        if full.any():
            starts = concat_ranges(doc_offs[:-1][full], counts[full])
            pos = concat_ranges(out_offs[full], counts[full])
            acc = np.zeros(len(starts), dtype=_U64)
            for j in range(k):
                acc = acc * _POLY + th[starts + j]
            out[pos] = acc
        for d in np.flatnonzero((lens > 0) & ~full):  # rare short docs
            acc = _U64(0)
            for j in range(doc_offs[d], doc_offs[d + 1]):
                acc = acc * _POLY + th[j]
            out[out_offs[d]] = acc
    return out, counts


def concat_ranges(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Concatenate [start, start+count) ranges, vectorized."""
    cts = counts.astype(np.int64)
    total = int(cts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    offs = np.repeat(np.cumsum(cts) - cts, cts)
    within = np.arange(total, dtype=np.int64) - offs
    return np.repeat(starts.astype(np.int64), cts) + within


# ---------------------------------------------------------------------------
# MinHash (for near-dup dedup over text; SURVEY "training-data ops")
# ---------------------------------------------------------------------------

_MERSENNE = _U64(0xFFFFFFFFFFFFFFC5)  # large 64-bit prime-ish modulus base


def minhash_signature(shingle_hashes: np.ndarray, num_perm: int, seed: int = 7) -> np.ndarray:
    """MinHash signature of one document from its shingle hash set.

    Permutations are (a*x+b) over uint64 with per-permutation constants from
    splitmix64(seed..seed+2*num_perm) — the standard mergeable construction.
    Returns uint64[num_perm]; empty input → all-max sentinel.
    """
    a, b = _perm_constants(num_perm, seed)
    if shingle_hashes.size == 0:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    with np.errstate(over="ignore"):
        # (num_perm, n) matrix of permuted hashes; min over shingles
        m = a[:, None] * shingle_hashes[None, :] + b[:, None]
    return m.min(axis=1)


def minhash_signatures(docs_shingle_hashes: list[np.ndarray], num_perm: int, seed: int = 7) -> np.ndarray:
    """Batch MinHash: list of per-doc shingle-hash arrays → (n_docs, num_perm)."""
    a, b = _perm_constants(num_perm, seed)
    out = np.full((len(docs_shingle_hashes), num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, sh in enumerate(docs_shingle_hashes):
            if sh.size:
                out[i] = (a[:, None] * sh[None, :] + b[:, None]).min(axis=1)
    return out


def _perm_constants(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    idx = np.arange(2 * num_perm, dtype=_U64) + _U64(seed * 1_000_003)
    c = splitmix64(idx)
    a = c[:num_perm] | _U64(1)  # odd multipliers
    b = c[num_perm:]
    return a, b


def simhash64(token_hashes: np.ndarray, weights: np.ndarray | None = None) -> int:
    """64-bit SimHash of one document's token hashes (optionally weighted)."""
    if token_hashes.size == 0:
        return 0
    bits = ((token_hashes[:, None] >> np.arange(64, dtype=_U64)[None, :]) & _U64(1)).astype(np.int64)
    w = np.ones(len(token_hashes), dtype=np.int64) if weights is None else weights.astype(np.int64)
    score = ((bits * 2 - 1) * w[:, None]).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if score[i] > 0:
            out |= _U64(1) << _U64(i)
    return int(out)


def zorder_key(x: np.ndarray, y: np.ndarray, bits: int = 12) -> np.ndarray:
    """Morton (Z-order) interleave of two ``bits``-wide integer columns:
    bit b of x lands at position 2b, bit b of y at 2b+1. The standard
    multi-column clustering key for data layout — sorting / range-
    partitioning by the z-value co-locates rows close in BOTH dimensions,
    so min-max pruning works on either column (Delta/Iceberg OPTIMIZE
    ZORDER semantics). Vectorized magic-constant bit spreading; exact
    int64 output (2*bits <= 32 — the 32-bit spread masks cap each column
    at 16 bits; widen them to 0x0000FFFF0000FFFF-style 64-bit constants
    if wider z-values are ever needed)."""
    if bits > 16:
        raise ValueError("bits > 16 would overflow the 32-bit spread")

    def spread(v: np.ndarray) -> np.ndarray:
        v = v.astype(np.uint64) & _U64((1 << bits) - 1)
        v = (v | (v << _U64(8))) & _U64(0x00FF00FF)
        v = (v | (v << _U64(4))) & _U64(0x0F0F0F0F)
        v = (v | (v << _U64(2))) & _U64(0x33333333)
        v = (v | (v << _U64(1))) & _U64(0x55555555)
        return v

    z = spread(x) | (spread(y) << _U64(1))
    return z.astype(np.int64)

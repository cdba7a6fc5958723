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

from cocrawler_ray.hashing import hash64


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

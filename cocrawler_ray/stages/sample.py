"""Deterministic stratified sampling — the per-domain page cap of a
training-corpus curation pass.

The reference has no sampling operator (its analogue is the crawl-time
per-host politeness budget, `cocrawler/scheduler.py` semantics per SURVEY
§2.3 T1); a 100 TB corpus build needs the offline form: cap each stratum
(host / source / language) at n documents, chosen hash-randomly but
DETERMINISTICALLY so re-runs and the DuckDB oracle agree.

Scale shape: rank-within-stratum needs each stratum co-located — ONE
``grouped_shuffle`` on the stratum key; the rank+head is a vectorized sort
inside the partition reduce. The sample key is ``splitmix64(id)``, the
engine's seeded hash (hashing.py), restated in SQL by
``oracles.splitmix_ctes`` — no RNG state, no order dependence.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from cocrawler_ray.hashing import splitmix64
from cocrawler_ray.stages.agg import partial_groupby_agg
from cocrawler_ray.stages.exchange import grouped_shuffle


def stratified_sample(ds: rd.Dataset, keys: list[str], n: int,
                      id_col: str) -> rd.Dataset:
    """Keep the ``n`` rows of each ``keys`` stratum with smallest
    ``(splitmix64(id), id)`` — a uniform hash-random sample per stratum,
    deterministic across runs and partitionings. ``id_col`` must be a
    non-negative int64 unique id."""

    def head_per_stratum(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        sm = splitmix64(df[id_col].to_numpy().astype(np.int64).view(np.uint64))
        out = (df.assign(__sm=sm)
               .sort_values(keys + ["__sm", id_col], kind="stable")
               .groupby(keys, sort=False, observed=True).head(n))
        return out.drop(columns="__sm").reset_index(drop=True)

    return grouped_shuffle(ds, keys, head_per_stratum)


def source_mix(ds: rd.Dataset, key_col: str, id_col: str,
               weights: dict[str, int],
               resolution_bits: int = 20) -> rd.Dataset:
    """Deterministic mixture subsampling to target source proportions —
    the data-mixing step of a training-corpus build ("40% web, 30% code,
    30% wiki"). Integer-exact so re-runs and the SQL mirror agree bit
    for bit:

      T        = min_s (cnt_s * W) // w_s     (largest total no source
                                               can over-draw; W = sum w)
      need_s   = (w_s * T) // W               (rows wanted from source s)
      thresh_s = (need_s << bits) // cnt_s    (Bernoulli gate threshold)
      keep row <=> splitmix64(id) % 2^bits < thresh_s

    Scale shape: ONE tiny combiner groupby for the per-source counts
    (O(#sources) rows to the driver — the mixture spec is dimension-sized
    by definition), thresholds broadcast in the gate closure, then a
    streaming filter scan. Zero shuffles; rows from sources absent from
    ``weights`` are dropped. The sampled size per source is Binomial
    around need_s (a hash gate, not an exact cap) — the standard
    trade for a single-pass, partition-invariant mix."""
    counts = partial_groupby_agg(ds, [key_col], {"cnt": (None, "count")})
    W = sum(weights.values())
    cnt = {k: int(c) for k, c in zip(counts[key_col], counts["cnt"])
           if k in weights}
    R = np.int64(1) << resolution_bits
    if cnt:
        T = min((c * W) // weights[k] for k, c in cnt.items())
        thresh = {k: min(int(R), (weights[k] * T // W) * int(R) // c)
                  for k, c in cnt.items()}
    else:
        thresh = {}

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        th = df[key_col].map(thresh).fillna(0).to_numpy(np.int64)
        ids = df[id_col].to_numpy().astype(np.int64).view(np.uint64)
        hx = (splitmix64(ids) % np.uint64(int(R))).astype(np.int64)
        return df[hx < th].reset_index(drop=True)

    return ds.map_batches(gate, batch_format="pandas")

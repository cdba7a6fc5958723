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

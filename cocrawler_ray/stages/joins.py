"""Join/lookup patterns (SURVEY §2.4) — the batch forms of the reference's
keyed lookups (seen-set membership, robots per-host rules, web-table fetch).

Three shapes, chosen by side size (ray_guide.md):

- **broadcast_join / broadcast_semi / broadcast_anti**: small side shipped
  once via ``ray.put``; every task reads it zero-copy and does a vectorized
  pandas merge / isin per batch. No shuffle. At 100 TB, "small" means the
  side fits a worker heap (dimension tables, key sets, blocklists); for
  bigger key sets swap the python set for a Bloom filter — same interface.
- **hash_join**: both sides large — Ray Data's hash-partitioned
  ``Dataset.join`` (all-to-all shuffle on the key; num_partitions sized to
  cluster CPUs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd


def broadcast_join(ds: rd.Dataset, small: pd.DataFrame, left_key: str,
                   right_key: str) -> rd.Dataset:
    """Inner join against a broadcast small side (J2 pattern)."""
    ref = ray.put(small)

    def join_batch(batch: pd.DataFrame) -> pd.DataFrame:
        s = ray.get(ref)
        return batch.merge(s, left_on=left_key, right_on=right_key, how="inner")

    return ds.map_batches(join_batch, batch_format="pandas")


def broadcast_semi(ds: rd.Dataset, keys, key_col: str) -> rd.Dataset:
    """Semi join: keep rows whose key is in the broadcast key set (J3)."""
    ref = ray.put(np.asarray(keys))

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch[key_col].isin(ray.get(ref))]

    return ds.map_batches(f, batch_format="pandas")


def broadcast_anti(ds: rd.Dataset, keys, key_col: str) -> rd.Dataset:
    """Anti join: drop rows whose key is in the broadcast key set (J1 —
    links-minus-seen in batch form)."""
    ref = ray.put(np.asarray(keys))

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[~batch[key_col].isin(ray.get(ref))]

    return ds.map_batches(f, batch_format="pandas")


def hash_join(left: rd.Dataset, right: rd.Dataset, on: str, right_on: str | None = None,
              num_partitions: int = 16, join_type: str = "inner") -> rd.Dataset:
    """Large-large hash-partitioned join (J4) — Ray Data's shuffle join."""
    return left.join(right, join_type=join_type, num_partitions=num_partitions,
                     on=(on,), right_on=(right_on,) if right_on else None)

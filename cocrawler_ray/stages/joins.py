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
import pyarrow.compute as pc

import ray
import ray.data as rd


def broadcast_join(ds: rd.Dataset, small, left_key: str,
                   right_key: str,
                   join_type: str = "inner") -> rd.Dataset:
    """Join against a broadcast small side (J2 pattern).

    Arrow-native end to end: the small side ships once as a single-chunk
    Arrow table (``ray.put``), every batch joins zero-copy via
    ``pa.Table.join`` (Acero hash join in C++) — no per-batch
    Arrow->pandas->Arrow round-trip. The right key column is dropped from
    the output (it equals the left key on every surviving row).
    ``join_type`` is Acero's: "inner" (default) or "left outer" — a
    broadcast LEFT join is safe because each left row matches at most the
    broadcast side; unmatched rows carry nulls."""
    tbl = (pa.Table.from_pandas(small, preserve_index=False)
           if isinstance(small, pd.DataFrame) else small)
    ref = ray.put(tbl.combine_chunks())

    def join_batch(batch: pa.Table) -> pa.Table:
        return batch.join(ray.get(ref), keys=[left_key],
                          right_keys=[right_key], join_type=join_type)

    return ds.map_batches(join_batch, batch_format="pyarrow")


def _isin_filter(ds: rd.Dataset, keys, key_col: str, negate: bool) -> rd.Dataset:
    ref = ray.put(pa.array(np.asarray(keys)))

    def f(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column(key_col), value_set=ray.get(ref))
        if negate:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return ds.map_batches(f, batch_format="pyarrow")


def broadcast_semi(ds: rd.Dataset, keys, key_col: str) -> rd.Dataset:
    """Semi join: keep rows whose key is in the broadcast key set (J3).
    Vectorized ``pc.is_in`` per Arrow batch — no pandas conversion."""
    return _isin_filter(ds, keys, key_col, negate=False)


def broadcast_anti(ds: rd.Dataset, keys, key_col: str) -> rd.Dataset:
    """Anti join: drop rows whose key is in the broadcast key set (J1 —
    links-minus-seen in batch form)."""
    return _isin_filter(ds, keys, key_col, negate=True)


def hash_join(left: rd.Dataset, right: rd.Dataset, on: str, right_on: str | None = None,
              num_partitions: int | None = None, join_type: str = "inner") -> rd.Dataset:
    """Large-large hash-partitioned join (J4) — the vectorized hash
    exchange + per-partition Acero join (exchange.hash_join; Ray Data's
    native ``Dataset.join`` pays a per-call aggregator actor pool)."""
    from cocrawler_ray.stages.exchange import hash_join as _hj
    return _hj(left, right, on=[on],
               right_on=[right_on] if right_on else None,
               how=join_type, num_partitions=num_partitions)


def auto_join(left: rd.Dataset, right: rd.Dataset, left_key: str,
              right_key: str | None = None, how: str = "inner",
              broadcast_rows_max: int = 2_000_000,
              num_partitions: int | None = None) -> rd.Dataset:
    """Size-dispatched join front-end: broadcast the right side when it is
    dimension-sized, otherwise take the hash exchange — the planner rule a
    user of the reference's keyed lookups expects to not write by hand.

    The right side is materialized once (its blocks land in the object
    store either way; ``count()`` then reads metadata only). Below the
    row gate and for Acero-broadcastable join types the small side ships
    via ``ray.put`` and every left batch joins zero-copy with no shuffle;
    above it (or for right/full outer), both sides go through the
    hash-partition exchange. ``broadcast_rows_max`` is the worker-heap
    proxy; at 100 TB tune it to rows-per-GiB of the dimension schema."""
    from cocrawler_ray.stages.exchange import hash_join

    right_key = right_key or left_key
    mat = right.materialize()
    n_right = mat.count()
    if (0 < n_right <= broadcast_rows_max
            and how in ("inner", "left outer")):
        # drop zero-row blocks before concat: an empty pandas-born block
        # can carry null-typed columns (the empty-block schema gotcha)
        # that concat_tables/Acero reject; n_right > 0 guarantees at
        # least one real block survives
        tables = [t for t in ray.get(mat.to_arrow_refs()) if t.num_rows]
        small = pa.concat_tables(tables)
        return broadcast_join(left, small, left_key, right_key,
                              join_type=how)
    # n_right == 0 takes this path too: hash_join synthesizes a
    # schema-bearing empty block per join type (exchange.py empty-side
    # handling) where the broadcast path would crash on concat([])
    return hash_join(left, mat, [left_key], [right_key], how=how,
                     num_partitions=num_partitions)

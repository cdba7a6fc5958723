"""Training-shard reader — the consumer side of export/curate: stream
the sharded parquet back out as deterministically shuffled batches for
a training loop.

The shuffle is the standard two-level webdataset scheme, not a global
``random_shuffle`` (which is an all-to-all exchange of the whole
corpus): shard ORDER is permuted per epoch, and rows shuffle WITHIN
each block — at 100 TB the data never crosses the cluster, yet every
row appears exactly once per epoch and any (seed, epoch) pair replays
bit-identically, which is what checkpoint-resumable training needs.
Both permutations come from splitmix64, so the order is reproducible
on any cluster shape.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from cocrawler_ray.hashing import splitmix64


def _perm(n: int, seed: int) -> np.ndarray:
    """Deterministic permutation of range(n): argsort of splitmix keys
    (keys are distinct uint64 w.h.p.; ties broken by index, still
    deterministic)."""
    keys = splitmix64(np.arange(n, dtype=np.uint64)
                      ^ np.uint64(seed & 0xFFFFFFFFFFFFFFFF))
    return np.argsort(keys, kind="stable")


def shard_files(src: str) -> list[str]:
    """Sorted shard list of a curate/export output dir (or pass-through
    for an explicit file list)."""
    p = Path(src)
    files = sorted(str(f) for f in p.glob("shard_*.parquet"))
    if not files:
        raise FileNotFoundError(f"no shard_*.parquet under {src}")
    return files


def training_dataset(src: str | list[str], *, seed: int = 0,
                     epoch: int = 0, columns: list[str] | None = None
                     ) -> rd.Dataset:
    """Ray Dataset over the shards in per-epoch shuffled shard order,
    rows shuffled within each block. Consume with ``iter_batches`` /
    ``iter_torch_batches``; one pass = one epoch."""
    files = shard_files(src) if isinstance(src, str) else list(src)
    order = _perm(len(files), seed ^ (epoch * 0x9E3779B9) ^ 0x5DEECE66D)
    files = [files[i] for i in order]
    # one block per shard keeps the within-block shuffle aligned to the
    # shard boundary (the webdataset contract) and the read resumable
    ds = rd.read_parquet(files, columns=columns,
                         override_num_blocks=len(files))
    block_seed = seed ^ (epoch << 20)

    def shuffle_block(t: pa.Table) -> pa.Table:
        if t.num_rows < 2:
            return t
        # salt by block content (first row id if present) so distinct
        # blocks get distinct permutations under the same epoch seed
        salt = 0
        if "doc_id" in t.column_names and t.num_rows:
            salt = int(t.column("doc_id")[0].as_py()) & 0xFFFFFFFF
        p = _perm(t.num_rows, block_seed ^ (salt << 16))
        return t.take(pa.array(p))

    return ds.map_batches(shuffle_block, batch_format="pyarrow",
                          batch_size=None)


def iter_training_batches(src: str | list[str], *, batch_size: int,
                          seed: int = 0, epoch: int = 0,
                          columns: list[str] | None = None):
    """Iterate pandas batches of the epoch's shuffled stream."""
    ds = training_dataset(src, seed=seed, epoch=epoch, columns=columns)
    yield from ds.iter_batches(batch_size=batch_size,
                               batch_format="pandas")

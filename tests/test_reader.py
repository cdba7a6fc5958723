"""Tests for pipelines/reader.py — deterministic two-level shuffled
training-shard reader (replayable epochs, exactly-once delivery)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def shards(tmp_path_factory):
    d = tmp_path_factory.mktemp("shards")
    rng = np.arange(300)
    for s in range(3):
        ids = rng[s * 100:(s + 1) * 100]
        pq.write_table(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([f"doc {i}" for i in ids], pa.string())}),
            d / f"shard_{s:05d}.parquet")
    return str(d)


def _sequence(src, seed, epoch):
    from cocrawler_ray.pipelines.reader import iter_training_batches
    out = []
    for b in iter_training_batches(src, batch_size=32, seed=seed,
                                   epoch=epoch):
        out.extend(b["doc_id"].tolist())
    return out


def test_epoch_replay_is_bit_identical(ray_session, shards):
    assert _sequence(shards, 7, 0) == _sequence(shards, 7, 0)


def test_exactly_once_per_epoch(ray_session, shards):
    seq = _sequence(shards, 7, 0)
    assert sorted(seq) == list(range(300))


def test_epochs_and_seeds_reshuffle(ray_session, shards):
    e0, e1 = _sequence(shards, 7, 0), _sequence(shards, 7, 1)
    s2 = _sequence(shards, 8, 0)
    assert sorted(e0) == sorted(e1) == sorted(s2)
    assert e0 != e1 and e0 != s2
    # rows actually shuffle within shards, not just shard order
    assert e0[:100] != sorted(e0[:100])


def test_missing_dir_raises(shards):
    from cocrawler_ray.pipelines.reader import shard_files
    with pytest.raises(FileNotFoundError):
        shard_files("/tmp/definitely-not-a-shard-dir")

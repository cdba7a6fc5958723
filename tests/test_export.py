"""Training-data export tests (pipelines/export.py): curate -> dedup ->
hash-bucketed shard files with resume semantics (the brief's "resumable
output" requirement — one file per shard key range, finished shards
skipped on re-run)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cocrawler_ray.hashing import hash64, partition_of
from cocrawler_ray.pipelines.export import export_training_shards


def _fetched(tmp_path, name, rows):
    """Write a minimal fetched-cell parquet with the export columns."""
    cols = {
        "image_id": pa.array([r["image_id"] for r in rows], pa.string()),
        "bytes": pa.array([r.get("bytes", b"\x01\x02") for r in rows],
                          pa.binary()),
        "w": pa.array([r.get("w", 4) for r in rows], pa.int32()),
        "h": pa.array([r.get("h", 4) for r in rows], pa.int32()),
        "fmt": pa.array([r.get("fmt", "ppm") for r in rows], pa.string()),
        "caption": pa.array([r["caption"] for r in rows], pa.string()),
        "phash": pa.array([r.get("phash", 0) for r in rows], pa.int64()),
        "digest": pa.array([r["digest"] for r in rows], pa.string()),
        "status": pa.array([r.get("status", 200) for r in rows], pa.int32()),
    }
    path = tmp_path / f"{name}.parquet"
    pq.write_table(pa.table(cols), path)
    return str(path)


@pytest.fixture()
def corpus(tmp_path):
    base = [{"image_id": f"img{i:04d}", "caption": f"a cat number {i}",
             "digest": f"d{i:04d}"} for i in range(20)]
    special = [
        # duplicate payload of img0000 with a LARGER id — loses first-wins
        {"image_id": "img9000", "caption": "dup of zero", "digest": "d0000"},
        # duplicate payload with the SMALLEST id but an empty caption —
        # gated out BEFORE dedup, must not steal the digest group
        {"image_id": "img!!!!", "caption": "", "digest": "d0000"},
        # non-200 row: dropped
        {"image_id": "img9001", "caption": "broken", "digest": "d9001",
         "status": 404},
        # empty caption, unique digest: dropped
        {"image_id": "img9002", "caption": "", "digest": "d9002"},
    ]
    files = [_fetched(tmp_path, "cell-a", base[:10] + special),
             _fetched(tmp_path, "cell-b", base[10:])]
    return files


def _read_all(manifest):
    tabs = [pq.read_table(p) for p in manifest["path"]]
    return pa.concat_tables(tabs).to_pandas().sort_values(
        "image_id").reset_index(drop=True)


def test_export_curates_dedups_and_shards(ray_session, corpus, tmp_path):
    dest = tmp_path / "out"
    m = export_training_shards(corpus, str(dest), num_shards=8)
    assert not m["skipped"].any()
    rows = _read_all(m)
    # 20 curated winners: gated rows and the losing duplicate are gone
    assert list(rows["image_id"]) == [f"img{i:04d}" for i in range(20)]
    assert int(m["rows"].sum()) == 20
    # shard/status columns are not exported; payload columns are
    assert "shard" not in rows.columns and "status" not in rows.columns
    assert {"bytes", "caption", "digest", "phash"} <= set(rows.columns)
    # every row sits in the file its stable hash says (resume contract)
    for p in m["path"]:
        t = pq.read_table(p, columns=["image_id"])
        shard = int(p.rsplit("-", 1)[1].split(".")[0])
        want = partition_of(hash64(t.column("image_id").to_pylist()), 8)
        assert (want == shard).all()


def test_export_resume_skips_finished_shards(ray_session, corpus, tmp_path):
    dest = tmp_path / "out"
    m1 = export_training_shards(corpus, str(dest), num_shards=4)
    before = {p: open(p, "rb").read() for p in m1["path"]}
    # full re-run: every shard skipped, bytes untouched
    m2 = export_training_shards(corpus, str(dest), num_shards=4)
    assert m2["skipped"].all()
    assert (m1[["shard", "rows"]].values == m2[["shard", "rows"]].values).all()
    for p, blob in before.items():
        assert open(p, "rb").read() == blob
    # partial re-run: delete one shard, only it is rewritten
    victim = m1["path"].iloc[0]
    import os
    os.unlink(victim)
    m3 = export_training_shards(corpus, str(dest), num_shards=4)
    redone = m3[~m3["skipped"]]
    assert list(redone["path"]) == [victim]
    assert open(victim, "rb").read() == before[victim]


def test_export_deterministic_shard_bytes(ray_session, corpus, tmp_path):
    m1 = export_training_shards(corpus, str(tmp_path / "a"), num_shards=4)
    m2 = export_training_shards(corpus, str(tmp_path / "b"), num_shards=4)
    for pa_, pb in zip(m1["path"], m2["path"]):
        assert open(pa_, "rb").read() == open(pb, "rb").read()


def test_export_caption_token_gate(ray_session, tmp_path):
    files = [_fetched(tmp_path, "c", [
        {"image_id": "a", "caption": "one two three", "digest": "x1"},
        {"image_id": "b", "caption": "one two", "digest": "x2"},
    ])]
    m = export_training_shards(files, str(tmp_path / "o"), num_shards=2,
                               min_caption_tokens=3)
    rows = _read_all(m)
    assert list(rows["image_id"]) == ["a"]


def test_export_empty_input(ray_session, tmp_path):
    m = export_training_shards([], str(tmp_path / "o"))
    assert len(m) == 0
    assert list(m.columns) == ["shard", "rows", "path", "skipped"]
    assert m["shard"].dtype == np.int64

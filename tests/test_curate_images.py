"""pipelines/curate_images.py over a corpus with known duplicates and
gate casualties (the q_curate_images fixture plus fetched-table columns)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _fetched_file(tmp_path):
    from cocrawler_ray import oracles
    t = oracles.conformance_dup_images()  # 64 base (48 distinct) + 8 bad
    n = t.num_rows
    t = (t.append_column("caption", pa.array([f"cap {i}" for i in range(n)]))
         .append_column("phash", pa.array(np.zeros(n, np.int64)))
         .append_column("status", pa.array(np.full(n, 200, np.int32))))
    path = tmp_path / "fetched-000.parquet"
    pq.write_table(t, path)
    return str(path)


def test_curate_image_shards_gates_dedups_resumes(ray_session, tmp_path):
    from cocrawler_ray.pipelines.curate_images import curate_image_shards

    src = _fetched_file(tmp_path)
    dest = tmp_path / "out"
    res = curate_image_shards([src], str(dest), num_shards=4)
    # 72 in -> 64 survive the gates (4 flat + 4 noisy dropped) -> 48
    # distinct dhash survivors
    assert res["counts"]["gated"] == 64
    assert res["counts"]["deduped"] == 48
    m = res["manifest"]
    assert int(m["rows"].sum()) == 48
    assert not m["skipped"].any()
    # every winner is the FIRST image_id of its dup pair (img0000..0047)
    rows = pa.concat_tables([pq.read_table(p) for p in m["path"]])
    ids = sorted(rows.column("image_id").to_pylist())
    assert ids == [f"img{d:04d}" for d in range(48)]
    assert "caption" in rows.column_names  # payload columns survive
    # resume: all shards skip, rows unchanged
    res2 = curate_image_shards([src], str(dest), num_shards=4)
    assert res2["manifest"]["skipped"].all()
    assert int(res2["manifest"]["rows"].sum()) == 48

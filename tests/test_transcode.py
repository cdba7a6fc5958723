"""pipelines/transcode.py — bulk qnt migration with the integer loss
gate, idempotent re-encode, and shard-level resume."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _fetched_file(tmp_path, n=48):
    from cocrawler_ray import oracles
    t = oracles.conformance_images(n)  # raw16 / pngz / qnt round-robin
    t = (t.append_column("caption", pa.array([f"cap {i}" for i in range(n)]))
         .append_column("phash", pa.array(np.zeros(n, np.int64)))
         .append_column("status", pa.array(np.full(n, 200, np.int32))))
    path = tmp_path / "fetched-000.parquet"
    pq.write_table(t, path)
    return str(path)


def test_transcode_migrates_within_budget(ray_session, tmp_path):
    from cocrawler_ray import codecs, oracles
    from cocrawler_ray.pipelines.transcode import transcode_shards

    src = _fetched_file(tmp_path)
    dest = tmp_path / "out"
    res = transcode_shards([src], str(dest), num_shards=4)
    c = res["counts"]
    # qnt's worst-case per-pixel error is 4 -> mse <= 16, well under the
    # 6.5 default budget in practice for the formula images; everything
    # migrates on this corpus
    assert c["rows"] == 48
    assert c["migrated"] == 48
    assert c["bytes_out"] < c["bytes_in"]  # qntz genuinely shrinks
    m = res["manifest"]
    assert int(m["rows"].sum()) == 48
    rows = pa.concat_tables([pq.read_table(p) for p in m["path"]])
    assert sorted(rows.column("image_id").to_pylist()) == \
        [f"img{d:04d}" for d in range(48)]
    assert set(rows.column("fmt").to_pylist()) == {"qntz"}
    # qnt-source rows (d % 3 == 2) re-encode LOSSLESSLY: sse == 0
    # (quantize-of-quantized is identity; zlib is lossless)
    sse = dict(zip(rows.column("image_id").to_pylist(),
                   rows.column("sse").to_pylist()))
    for d in range(48):
        if d % 3 == 2:
            assert sse[f"img{d:04d}"] == 0
        else:
            assert sse[f"img{d:04d}"] > 0
    # migrated payloads decode bit-identically to the audit's own
    # re-encode of the source
    ws = dict(zip(rows.column("image_id").to_pylist(),
                  rows.column("w").to_pylist()))
    one = rows.column("image_id").to_pylist().index("img0000")
    w = int(rows.column("w")[one].as_py())
    h = int(rows.column("h")[one].as_py())
    got = codecs.decode(rows.column("bytes")[one].as_py(), w, h, "qntz")
    want = codecs.decode(
        codecs.encode(oracles.formula_image(0), "qntz"), w, h, "qntz")
    np.testing.assert_array_equal(got, want)
    # resume: all shards skip, rows unchanged
    res2 = transcode_shards([src], str(dest), num_shards=4)
    assert res2["manifest"]["skipped"].all()
    assert int(res2["manifest"]["rows"].sum()) == 48


def test_transcode_loss_gate_keeps_originals(ray_session, tmp_path):
    from cocrawler_ray.pipelines.transcode import transcode_shards

    src = _fetched_file(tmp_path, n=12)
    dest = tmp_path / "out"
    # budget 0: only already-lossless-under-qnt rows (the qnt sources,
    # d % 3 == 2) may migrate; every other row keeps its original bytes
    res = transcode_shards([src], str(dest), num_shards=2,
                           max_mse_milli=0)
    c = res["counts"]
    assert c["rows"] == 12
    assert c["migrated"] == 4          # d = 2, 5, 8, 11
    assert c["kept_original"] == 8
    m = res["manifest"]
    rows = pa.concat_tables([pq.read_table(p) for p in m["path"]])
    fmts = dict(zip(rows.column("image_id").to_pylist(),
                    rows.column("fmt").to_pylist()))
    from cocrawler_ray import codecs
    for d in range(12):
        want = "qntz" if d % 3 == 2 else codecs.FORMATS[d % 3]
        assert fmts[f"img{d:04d}"] == want

"""Bulk image format migration — fetched crawl cells re-encoded to the
compact ``qntz`` codec (5-bit quantization + zlib — the quantized plane
is ~5 bits/sample entropy, so deflate genuinely shrinks it), loss-audited, written as resumable shards.

The archival half of the image pipeline family: ``curate_images.py``
selects WHICH rows survive; this rewrites HOW the surviving payloads are
stored (a 100 TB archive's storage-cost lever). Flow, all streaming:

1. read fetched cells (payload columns only), keep status-200 rows;
2. per-batch transcode: decode -> re-encode ``qntz`` -> decode back ->
   integer sse vs the decoded source (the q_transcode_audit kernel).
   The LOSS GATE is per-image and integer-exact: migrate iff
   ``sse * 1000 <= max_mse_milli * npx`` (default 6500 = the PSNR>=40 dB
   bar on the 0..255 scale); rows over budget keep their ORIGINAL bytes
   and fmt, so the migration is safe on payloads the codec would damage.
   qnt/qntz-source rows re-encode losslessly (sse 0) — re-running the job on
   its own output is a no-op rewrite, which is what makes shard-level
   resume sound;
3. shard = splitmix64(hash64(image_id)) % num_shards; one grouped
   shuffle whose reduce WRITES its shards (atomic temp+rename, existing
   files skipped) and returns only manifest rows.

The driver holds counts and the manifest; payloads never leave the
workers. Reference analogue: the crawl ecosystem's WARC re-packaging /
recompression pass (SURVEY §2.1 S3's storage loop).
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from cocrawler_ray import codecs
from cocrawler_ray import storage as storage_mod
from cocrawler_ray.stages import exchange
from cocrawler_ray.hashing import hash64, partition_of
from cocrawler_ray.stages.exchange import grouped_shuffle

TRANSCODE_COLUMNS = ["image_id", "bytes", "w", "h", "fmt", "caption",
                     "phash", "status"]


def _transcode_batch(t: pa.Table, max_mse_milli: int) -> pa.Table:
    """Status filter + decode/re-encode + integer loss gate."""
    t = t.filter(pa.compute.equal(t.column("status"), 200))
    ids = t.column("image_id").to_pylist()
    data = t.column("bytes").to_pylist()
    ws = t.column("w").to_numpy()
    hs = t.column("h").to_numpy()
    fmts = t.column("fmt").to_pylist()
    n = t.num_rows
    out_bytes: list[bytes] = []
    out_fmt: list[str] = []
    sse = np.zeros(n, np.int64)
    migrated = np.zeros(n, np.int64)
    for i in range(n):
        img = codecs.decode(data[i], int(ws[i]), int(hs[i]), fmts[i])
        enc, s = codecs.roundtrip_sse(img, "qntz")
        sse[i] = s
        if s * 1000 <= max_mse_milli * img.size:
            out_bytes.append(enc)
            out_fmt.append("qntz")
            migrated[i] = 1
        else:  # over the loss budget: keep the original payload
            out_bytes.append(data[i])
            out_fmt.append(fmts[i])
    in_sz = np.array([len(b) for b in data], np.int64)
    out_sz = np.array([len(b) for b in out_bytes], np.int64)
    return pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(out_bytes, pa.binary()),
        "w": t.column("w"), "h": t.column("h"),
        "fmt": pa.array(out_fmt, pa.string()),
        "caption": t.column("caption"),
        "phash": t.column("phash"),
        "sse": pa.array(sse),
        "migrated": pa.array(migrated),
        "bytes_in": pa.array(in_sz),
        "bytes_out": pa.array(out_sz)})


def transcode_shards(fetched_files: list[str], dest: str,
                     num_shards: int = 16,
                     max_mse_milli: int = 6500) -> dict:
    """Run the migration; returns ``{"manifest": DataFrame, "counts":
    {...}}``. Safe to re-run: finished shards are skipped (their
    manifest rows report skipped=True)."""
    dest_p = Path(dest)
    dest_p.mkdir(parents=True, exist_ok=True)
    empty = pd.DataFrame({"shard": pd.Series([], dtype=np.int64),
                          "rows": pd.Series([], dtype=np.int64),
                          "path": pd.Series([], dtype=str),
                          "skipped": pd.Series([], dtype=bool)})
    counts: dict[str, int] = {}
    if not fetched_files:
        return {"manifest": empty, "counts": counts}

    coded = (storage_mod.read_ray_dataset(fetched_files,
                                          columns=TRANSCODE_COLUMNS)
             .map_batches(lambda t: _transcode_batch(t, max_mse_milli),
                          batch_format="pyarrow"))
    # branch point (stats pass + shard pass) — size-gated on the source
    # cell bytes, same rule as every other multi-consumer pin
    coded = exchange.materialize_if_small(
        coded, est_bytes=sum(os.path.getsize(f) for f in fetched_files))
    stats = coded.map_batches(
        lambda t: pa.table({
            "rows": pa.array([t.num_rows], pa.int64()),
            "migrated": pa.array(
                [int(t.column("migrated").to_numpy().sum())], pa.int64()),
            "b_in": pa.array(
                [int(t.column("bytes_in").to_numpy().sum())], pa.int64()),
            "b_out": pa.array(
                [int(t.column("bytes_out").to_numpy().sum())], pa.int64()),
        }), batch_format="pyarrow").to_pandas()
    counts = {"rows": int(stats["rows"].sum()),
              "migrated": int(stats["migrated"].sum()),
              "kept_original": int(stats["rows"].sum()
                                   - stats["migrated"].sum()),
              "bytes_in": int(stats["b_in"].sum()),
              "bytes_out": int(stats["b_out"].sum())}

    def add_shard(t: pa.Table) -> pa.Table:
        shard = partition_of(hash64(t.column("image_id").to_pylist()),
                             num_shards).astype(np.int64)
        return (t.drop_columns(["migrated", "bytes_in", "bytes_out"])
                .append_column("shard", pa.array(shard, pa.int64())))

    def write_shards(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for shard, g in df.groupby("shard", sort=True):
            path = dest_p / f"img-qntz-{int(shard):05d}.parquet"
            skipped = path.exists()
            if not skipped:
                tbl = pa.Table.from_pandas(
                    g.drop(columns=["shard"])
                    .sort_values("image_id", kind="stable"),
                    preserve_index=False)
                tmp = path.with_suffix(f".{os.getpid()}.tmp")
                pq.write_table(tbl, tmp, compression="zstd")
                os.replace(tmp, path)
            out.append({"shard": int(shard), "rows": int(len(g)),
                        "path": str(path), "skipped": bool(skipped)})
        return pd.DataFrame(out) if out else empty

    manifest = grouped_shuffle(
        coded.map_batches(add_shard, batch_format="pyarrow"),
        ["shard"], write_shards).to_pandas()
    if manifest.empty:
        return {"manifest": empty, "counts": counts}
    manifest = (manifest.sort_values("shard").reset_index(drop=True)
                .astype({"shard": np.int64, "rows": np.int64}))
    return {"manifest": manifest, "counts": counts}

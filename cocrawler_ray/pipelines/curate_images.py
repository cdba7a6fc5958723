"""Image-corpus curation — fetched crawl cells -> quality-gated,
near-dup-free, hash-bucketed shard files.

The text side has ``pipelines/curate.py`` (ppl/quality gates -> dedup ->
pack); this is its IMAGE-axis twin over the input_hint schema (image_id,
bytes, w, h, fmt, caption, phash). Flow, all streaming:

1. read fetched cells (curation columns only), keep status-200 rows;
2. ONE fused decode pass per batch (the stages/multimodal.py
   CurateImageFeatures kernels) appends the qnt-roundtrip PSNR integers,
   the red-channel histogram peak and the 64-bit dhash to every row, then
   gates in-batch: PSNR >= 40 dB (ssq*10^4 <= 65025*npx) and not-flat
   (maxcnt*8 < w*h). Decode cost is paid once — gating as three separate
   decode stages would triple the dominant cost;
3. perceptual near-dup removal: first-wins (min image_id) per dhash
   through ONE grouped exchange — byte-identical AND
   brightness/contrast-shifted duplicates collapse, unlike the export
   pipeline's digest (exact-byte) dedup;
4. shard = splitmix64(hash64(image_id)) % num_shards; one grouped shuffle
   whose reduce WRITES its shards (atomic temp+rename) and returns only
   manifest rows. A shard file that already exists is skipped (resume).

The driver holds counts and the manifest — payloads never leave the
workers. ``q_curate_images`` is the oracled conformance twin of stages
2–3 over the formula-image corpus.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from cocrawler_ray import storage as storage_mod
from cocrawler_ray.stages import exchange
from cocrawler_ray.hashing import hash64, partition_of
from cocrawler_ray.stages.exchange import grouped_shuffle
from cocrawler_ray.stages.multimodal import CurateImageFeatures

CURATE_COLUMNS = ["image_id", "bytes", "w", "h", "fmt", "caption",
                  "phash", "status"]


def _gate_features(t: pa.Table, feats: CurateImageFeatures) -> pa.Table:
    """Status filter + fused feature append + in-batch quality gates."""
    t = t.filter(pa.compute.equal(t.column("status"), 200))
    if not t.num_rows:
        return t.drop_columns(["status"]).append_column(
            "dhash", pa.array([], pa.int64()))
    f = feats(t)  # aligned row-for-row: image_id, ssq, npx, maxcnt, dhash
    ssq = f.column("ssq").to_numpy()
    npx = f.column("npx").to_numpy()
    mc = f.column("maxcnt").to_numpy()
    # npx counts w*h*3 samples; the flat gate's histogram is red-channel
    # only (npx // 3 pixels) — the q_curate_images gate, exactly
    keep = (ssq * 10_000 <= 65_025 * npx) & (mc * 8 < npx // 3)
    return (t.drop_columns(["status"])
            .append_column("dhash", f.column("dhash"))
            .filter(pa.array(keep)))


def curate_image_shards(fetched_files: list[str], dest: str,
                        num_shards: int = 16) -> dict:
    """Run the image-curation pipeline; returns ``{"manifest": DataFrame,
    "counts": {stage: rows}}``. Safe to re-run: finished shards are
    skipped (their manifest rows report skipped=True)."""
    dest_p = Path(dest)
    dest_p.mkdir(parents=True, exist_ok=True)
    empty = pd.DataFrame({"shard": pd.Series([], dtype=np.int64),
                          "rows": pd.Series([], dtype=np.int64),
                          "path": pd.Series([], dtype=str),
                          "skipped": pd.Series([], dtype=bool)})
    counts: dict[str, int] = {}
    if not fetched_files:
        return {"manifest": empty, "counts": counts}

    feats = CurateImageFeatures()
    gated = (storage_mod.read_ray_dataset(fetched_files,
                                          columns=CURATE_COLUMNS)
             .map_batches(lambda t: _gate_features(t, feats),
                          batch_format="pyarrow"))
    # branch point (counted once, deduped once) — size-gated on the
    # source cell bytes: past the budget the consumers re-execute the
    # pruned scan instead of pinning the image corpus
    gated = exchange.materialize_if_small(
        gated, est_bytes=sum(os.path.getsize(f) for f in fetched_files))
    counts["gated"] = gated.count()

    def first_wins(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        # drop_duplicates keeps WHOLE rows — groupby().first() would take
        # each column's first non-null independently, splicing fields
        # from losing rows into the winner when nullable columns appear
        return (df.sort_values(["dhash", "image_id"], kind="stable")
                .drop_duplicates("dhash", keep="first"))

    # local combiner bounds the exchange by distinct (block, dhash) rows
    deduped = exchange.materialize_if_small(
        grouped_shuffle(
            gated.map_batches(first_wins, batch_format="pandas"),
            ["dhash"], first_wins),
        est_bytes=sum(os.path.getsize(f) for f in fetched_files))
    counts["deduped"] = deduped.count()

    def add_shard(t: pa.Table) -> pa.Table:
        shard = partition_of(hash64(t.column("image_id").to_pylist()),
                             num_shards).astype(np.int64)
        return t.append_column("shard", pa.array(shard, pa.int64()))

    def write_shards(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for shard, g in df.groupby("shard", sort=True):
            path = dest_p / f"img-shard-{int(shard):05d}.parquet"
            skipped = path.exists()
            if not skipped:
                t = pa.Table.from_pandas(
                    g.drop(columns=["shard"])
                    .sort_values("image_id", kind="stable"),
                    preserve_index=False)
                tmp = path.with_suffix(f".{os.getpid()}.tmp")
                pq.write_table(t, tmp, compression="zstd")
                os.replace(tmp, path)
            out.append({"shard": int(shard), "rows": int(len(g)),
                        "path": str(path), "skipped": bool(skipped)})
        return pd.DataFrame(out) if out else empty

    manifest = grouped_shuffle(
        deduped.map_batches(add_shard, batch_format="pyarrow"),
        ["shard"], write_shards).to_pandas()
    if manifest.empty:
        return {"manifest": empty, "counts": counts}
    manifest = (manifest.sort_values("shard").reset_index(drop=True)
                .astype({"shard": np.int64, "rows": np.int64}))
    return {"manifest": manifest, "counts": counts}

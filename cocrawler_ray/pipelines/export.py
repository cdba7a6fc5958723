"""Training-data export — fetched crawl cells -> curated, hash-bucketed
shard files.

The reference stops at WARC/crawllog output; a training pipeline needs the
next step (the brief's "resumable output" requirement): one file per shard
key range so a failed export re-run skips finished shards. Flow, all
streaming:

1. read fetched cells (only the export columns), keep status-200 rows
   whose caption passes the token gate (>= min_caption_tokens) — gate
   BEFORE dedup so a gated-out row never wins a digest group over a
   usable duplicate;
2. exact dedup by payload digest — per-block winner combiner, then one
   digest exchange (first-wins by image_id, the crawl's dedup rule);
3. shard = splitmix64(hash64(image_id)) % num_shards via ONE grouped shuffle whose
   partition reduce WRITES its shard files (atomic temp+rename) and
   returns only a manifest row per shard — the driver sees (shard, rows,
   path), never the data.

Resume: a shard file that already exists is not rewritten (its manifest
row reports skipped=True). Rows still flow to the reduce on a resumed run
— the savings are the writes, which dominate export cost; a fully
incremental resume would persist the shard assignment, which the crawl's
checkpoint lineage already enables if needed.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from cocrawler_ray import storage as storage_mod
from cocrawler_ray.hashing import hash64, partition_of
from cocrawler_ray.stages.exchange import grouped_shuffle

EXPORT_COLUMNS = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash",
                  "digest", "status"]


def export_training_shards(fetched_files: list[str], dest: str,
                           num_shards: int = 64,
                           min_caption_tokens: int = 1) -> pd.DataFrame:
    """Export curated training shards to ``dest``. Returns the manifest
    (shard:int64, rows:int64, path:str, skipped:bool), one row per
    non-empty shard."""
    dest_p = Path(dest)
    dest_p.mkdir(parents=True, exist_ok=True)
    empty = pd.DataFrame({"shard": pd.Series([], dtype=np.int64),
                          "rows": pd.Series([], dtype=np.int64),
                          "path": pd.Series([], dtype=str),
                          "skipped": pd.Series([], dtype=bool)})
    if not fetched_files:
        return empty

    def gate(t: pa.Table) -> pa.Table:
        t = t.filter(pa.compute.equal(t.column("status"), 200))
        caps = t.column("caption").to_pylist()
        ntok = np.array([len(c.split()) if c else 0 for c in caps])
        t = t.filter(pa.array(ntok >= min_caption_tokens))
        # stable shard key (hashing.hash64 is process-stable; resume of a
        # partial export must re-derive the SAME shard per image_id)
        shard = partition_of(hash64(t.column("image_id").to_pylist()),
                             num_shards).astype(np.int64)
        return t.append_column("shard", pa.array(shard, pa.int64()))

    def local_winner(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values("image_id", kind="stable")
                .drop_duplicates("digest", keep="first"))

    ds = (storage_mod.read_ray_dataset(fetched_files, columns=EXPORT_COLUMNS)
          .map_batches(gate, batch_format="pyarrow")
          .map_batches(local_winner, batch_format="pandas"))
    deduped = grouped_shuffle(ds, ["digest"], local_winner)

    def write_shards(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for shard, g in df.groupby("shard", sort=True):
            path = dest_p / f"shard-{int(shard):05d}.parquet"
            skipped = path.exists()
            if not skipped:
                t = pa.Table.from_pandas(
                    g.drop(columns=["shard", "status"])
                    .sort_values("image_id", kind="stable"),
                    preserve_index=False)
                tmp = path.with_suffix(f".{os.getpid()}.tmp")
                pq.write_table(t, tmp, compression="zstd")
                os.replace(tmp, path)
            out.append({"shard": int(shard), "rows": int(len(g)),
                        "path": str(path), "skipped": bool(skipped)})
        return pd.DataFrame(out) if out else empty

    manifest = grouped_shuffle(deduped, ["shard"], write_shards).to_pandas()
    if manifest.empty:
        return empty
    return (manifest.sort_values("shard").reset_index(drop=True)
            .astype({"shard": np.int64, "rows": np.int64}))

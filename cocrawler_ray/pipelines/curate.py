"""End-to-end LLM-training-corpus curation — documents parquet in,
packed + sharded training parquet out, every stage streaming.

This is the pipeline a user of the reference's data-processing surface
actually runs over a crawled corpus before pre-training (the brief's
"large-scale training-data pipeline"), composed from the operators the
query surface proves correct one by one:

1. **Perplexity gate** (stages/text.py::perplexity_batch): pass 1
   reduces the corpus to the O(vocabulary) unigram count table via the
   combiner; the quantized LM broadcasts once; pass 2 scores each doc.
   The keep threshold is either a fixed ``ppl_threshold`` or the exact
   ``ppl_quantile`` of the corpus ppl distribution (ppl rounds to 3
   decimals first, so the value-count histogram behind
   exact_quantile_cont stays domain-bounded).
2. **Quality-classifier gate** (quality_classifier_batch): linear model
   over per-doc features, broadcast weights, keep score > 0 rows.
3. **Decontamination** (ContaminationCheck actor pool): hit doc_ids —
   bounded by the contamination rate, not the corpus — gather once and
   broadcast as an exclusion set.
4. **Exact dedup** (stages/dedup.py::exact_dedup): per-block winner
   combiner, one digest exchange.
5. **Sequence packing** (stages/window.py::token_pack): one global
   ordered prefix sum assigns each doc its pre-training pack.
6. **Resumable shard write**: one grouped shuffle by
   ``splitmix64(pack_id) % num_shards`` whose partition reduce WRITES
   the shard parquet (atomic temp+rename; existing files are skipped on
   re-run) and returns only manifest rows — the export.py contract.

Nothing materializes the corpus on the driver: the driver sees the
vocab table, the quantile histogram, the contaminated-id set and the
manifest — all bounded independent of corpus size.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd

from cocrawler_ray.hashing import splitmix64
from cocrawler_ray.stages import dedup, text as textops
from cocrawler_ray.stages.agg import exact_quantile_cont
from cocrawler_ray.stages import exchange
from cocrawler_ray.stages.exchange import grouped_shuffle
from cocrawler_ray.stages.window import token_pack


def _read_documents(src: str, min_blocks: int = 4) -> rd.Dataset:
    path = f"{src}/documents.parquet" if os.path.isdir(src) else src
    rows = pq.read_metadata(path).num_rows
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    blocks = max(min_blocks, min(2 * cpus, rows // 32_000 + 1))
    return rd.read_parquet(path, columns=["doc_id", "text", "source"],
                           override_num_blocks=min(blocks, max(rows, 1)))


def curate_documents(src: str, dest: str, *,
                     ppl_threshold: float | None = None,
                     ppl_quantile: float = 0.95,
                     bench_holdout_mod: int = 50,
                     pack_budget: int = 2048,
                     num_shards: int = 16) -> dict:
    """Run the curation pipeline; returns ``{"manifest": DataFrame,
    "counts": {stage: rows}}``. Safe to re-run: finished shards are
    skipped (their manifest rows report skipped=True)."""
    dest_p = Path(dest)
    dest_p.mkdir(parents=True, exist_ok=True)
    path = f"{src}/documents.parquet" if os.path.isdir(src) else src
    counts: dict[str, int] = {}
    counts["input"] = pq.read_metadata(path).num_rows

    # ---- 1. unigram LM + perplexity gate ---------------------------------
    lm_ref = textops.broadcast_unigram_lm(_read_documents(src))

    def score_ppl(df: pd.DataFrame) -> pd.DataFrame:
        out = textops.perplexity_batch(df, lm_ref, np.inf)
        m = dict(zip(out["doc_id"], out["ppl"]))
        keep = df["doc_id"].map(m).notna()
        df = df[keep].copy()
        # the gate and the quantile threshold both operate on the SAME
        # 3-decimal half-away rounding (bounded value domain for the
        # exact-quantile histogram; no raw-vs-rounded boundary drift)
        df["ppl"] = textops.round_half_away(
            df["doc_id"].map(m).to_numpy(np.float64), 3)
        return df

    # pin the scored corpus ONCE: it feeds the quantile pass and the
    # gates — without this the read + scoring lineage would re-execute
    # per consumer. SIZE-GATED on the source parquet size (the same rule
    # as auto_join's broadcast): past the budget, each consumer
    # re-executes the pruned scan instead of pinning the corpus in the
    # object store at 100 TB
    src_bytes = os.path.getsize(path)
    scored = exchange.materialize_if_small(
        _read_documents(src).map_batches(score_ppl, batch_format="pandas"),
        est_bytes=src_bytes)
    if ppl_threshold is None:
        ppl_threshold = float(exact_quantile_cont(
            scored.select_columns(["ppl"]), "ppl", ppl_quantile))
    thr = ppl_threshold

    # ---- 2. quality-classifier gate --------------------------------------
    def both_gates(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["ppl"] <= thr]
        if not len(df):
            return df
        q = textops.quality_classifier_batch(df)
        keep = set(q[q["keep"] == 1]["doc_id"].tolist())
        return df[df["doc_id"].isin(keep)]

    # pinned for the same reason (and the same size gate): consumed by
    # the contamination gather AND the dedup -> pack -> shard write
    gated = exchange.materialize_if_small(
        scored.map_batches(both_gates, batch_format="pandas"),
        est_bytes=src_bytes)

    # ---- 3. decontamination ----------------------------------------------
    hits = gated.map_batches(
        textops.ContaminationCheck, batch_format="pyarrow",
        concurrency=(2, 8),
        fn_constructor_kwargs={"bench_path": path,
                               "holdout_mod": bench_holdout_mod})
    # hit set is bounded by the contamination rate — gather + broadcast
    hit_ids = set(
        hits.select_columns(["doc_id"]).to_pandas()["doc_id"].tolist())
    hit_ref = ray.put(np.sort(np.fromiter(hit_ids, dtype=np.int64,
                                          count=len(hit_ids))))

    def drop_contaminated(df: pd.DataFrame) -> pd.DataFrame:
        h = ray.get(hit_ref)
        ids = df["doc_id"].to_numpy()
        pos = np.searchsorted(h, ids)
        pos = np.clip(pos, 0, max(len(h) - 1, 0))
        bad = (h[pos] == ids) if len(h) else np.zeros(len(ids), bool)
        return df[~bad]

    clean = gated.map_batches(drop_contaminated, batch_format="pandas")

    # ---- 4. exact dedup ----------------------------------------------------
    deduped = dedup.exact_dedup(clean, "doc_id")

    # ---- 5. token counting + sequence packing ------------------------------
    with_tok = deduped.map_batches(
        lambda df: df.assign(
            n_tokens=np.fromiter((len(t.split()) for t in df["text"]),
                                 dtype=np.int64, count=len(df))),
        batch_format="pandas")
    packed = token_pack(with_tok, "doc_id", "n_tokens", pack_budget)

    # ---- 6. resumable shard write ------------------------------------------
    def add_shard(df: pd.DataFrame) -> pd.DataFrame:
        pid = df["pack_id"].to_numpy().astype(np.uint64)
        return df.assign(
            shard=(splitmix64(pid) % np.uint64(num_shards)).astype(np.int64))

    def write_shard(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return _empty_manifest()
        rows_out = []
        for shard, g in df.groupby("shard", sort=True):
            out = dest_p / f"shard_{int(shard):05d}.parquet"
            if out.exists():
                rows_out.append((int(shard), len(g), str(out), True))
                continue
            g = g.sort_values(["pack_id", "doc_id"], kind="stable")
            cols = ["doc_id", "source", "text", "n_tokens", "ppl",
                    "pack_id", "shard"]
            tmp = out.with_suffix(".tmp")
            pq.write_table(pa.Table.from_pandas(g[cols],
                                                preserve_index=False),
                           tmp)
            os.replace(tmp, out)
            rows_out.append((int(shard), len(g), str(out), False))
        return pd.DataFrame(rows_out,
                            columns=["shard", "rows", "path", "skipped"])

    manifest = grouped_shuffle(
        packed.map_batches(add_shard, batch_format="pandas"),
        ["shard"], write_shard).to_pandas()
    manifest = manifest.sort_values("shard").reset_index(drop=True)
    counts["contaminated"] = len(hit_ids)
    counts["output"] = int(manifest["rows"].sum())
    return {"manifest": manifest, "counts": counts,
            "ppl_threshold": float(thr)}


def _empty_manifest() -> pd.DataFrame:
    # "string" extension dtype (not object) so an empty partition's block
    # carries pa.string, matching non-empty blocks — an object-dtype empty
    # column would surface as a null-typed Arrow column and trip schema
    # unification (the empty-block gotcha exchange.py documents)
    return pd.DataFrame({"shard": pd.Series([], dtype=np.int64),
                         "rows": pd.Series([], dtype=np.int64),
                         "path": pd.Series([], dtype="string"),
                         "skipped": pd.Series([], dtype=bool)})

"""Link-graph analytics — fixed-iteration PageRank over (src, dst) edges.

The reference prioritizes fetches by a static per-URL score
(`cocrawler/urls.py` priority semantics per SURVEY §2.2 M8); a corpus-scale
crawl wants link-structure scores, which means iterative distributed
computation the reference never does. Classic bulk-synchronous shape, each
iteration two exchanges:

1. join current ranks onto edges by src (``hash_join``) and emit
   (dst, damping * rank / outdeg) contribution rows — streaming batch map;
2. sum contributions per dst (``grouped_shuffle``) and left-join back onto
   the node list so sinks/no-inbound nodes get the teleport base.

Out-degrees are computed ONCE before iterating. All state lives in
object-store-backed Datasets keyed by node — the driver never holds a rank
vector, so node count scales with cluster memory, not driver memory.
Deterministic: no RNG, float sums vary only by partition summation order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from cocrawler_ray.stages.exchange import grouped_shuffle, hash_join


def pagerank(nodes: rd.Dataset, edges: rd.Dataset, iters: int = 3,
             damping: float = 0.85) -> rd.Dataset:
    """``nodes``: (node:int64) — every vertex, exactly once. ``edges``:
    (src, dst) int64 rows, parallel edges allowed (each contributes).
    Returns (node, pr:float64) after ``iters`` synchronous iterations from
    a uniform start; dangling mass is dropped (teleport base only), the
    convention of the unrolled SQL oracle."""
    n_total = nodes.count()
    base = (1.0 - damping) / n_total

    def deg(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("src", sort=False).size().astype(np.float64)
                .rename("outdeg").reset_index())

    edges_w = hash_join(edges, grouped_shuffle(edges, ["src"], deg),
                        on=["src"])

    def init(t: pa.Table) -> pa.Table:
        return t.append_column(
            "r", pa.array(np.full(t.num_rows, 1.0 / n_total), pa.float64()))

    ranks = nodes.map_batches(init, batch_format="pyarrow")
    for _ in range(iters):
        contrib = (hash_join(edges_w, ranks, on=["src"], right_on=["node"])
                   .map_batches(
                       lambda df: pd.DataFrame({
                           "node": df["dst"].to_numpy(),
                           "c": damping * df["r"].to_numpy()
                                / df["outdeg"].to_numpy()}),
                       batch_format="pandas"))
        sums = grouped_shuffle(
            contrib, ["node"],
            lambda df: df.groupby("node", sort=False)["c"].sum().reset_index())
        ranks = (hash_join(nodes, sums, on=["node"], how="left outer")
                 .map_batches(
                     lambda df: pd.DataFrame({
                         "node": df["node"].to_numpy(),
                         "r": base + df["c"].fillna(0.0).to_numpy()}),
                     batch_format="pandas"))
    return ranks


def min_label_components(nodes: rd.Dataset, edges: rd.Dataset,
                         iters: int = 8) -> rd.Dataset:
    """Connected components by ``iters`` rounds of synchronous min-label
    propagation — the clustering step after a near-dup pair scan (pairs ->
    components -> keep one representative per cluster). ``nodes``:
    (node:int64); ``edges``: (src, dst) undirected pairs (one direction is
    enough — both are propagated). Returns (node, label) where label is the
    minimum node id reachable within ``iters`` hops: fixed-depth semantics,
    identical on both oracle sides whether or not labels converged; size
    ``iters`` >= graph diameter for full components.

    Same two-exchange BSP shape as :func:`pagerank`; label state stays in
    object-store Datasets."""

    def both_dirs(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        return pa.table({"src": pa.array(np.concatenate([s, d]), pa.int64()),
                         "dst": pa.array(np.concatenate([d, s]), pa.int64())})

    und = edges.map_batches(both_dirs, batch_format="pyarrow")
    labels = nodes.map_batches(
        lambda t: t.append_column("label", t.column("node")),
        batch_format="pyarrow")
    for _ in range(iters):
        prop = (hash_join(und, labels, on=["src"], right_on=["node"])
                .map_batches(lambda df: pd.DataFrame({
                    "node": df["dst"].to_numpy(),
                    "nl": df["label"].to_numpy()}), batch_format="pandas"))
        mins = grouped_shuffle(
            prop, ["node"],
            lambda df: df.groupby("node", sort=False)["nl"].min().reset_index())
        def take_min(df: pd.DataFrame) -> pd.DataFrame:
            lab = df["label"].to_numpy().copy()
            nl = df["nl"].to_numpy()
            # unmatched left-outer rows are NaN (and float64 would overflow
            # an int64 cast) — only matched rows take the neighbor min
            ok = ~np.isnan(nl) if nl.dtype.kind == "f" \
                else np.ones(len(nl), dtype=bool)
            lab[ok] = np.minimum(lab[ok], nl[ok].astype(np.int64))
            return pd.DataFrame({"node": df["node"].to_numpy(), "label": lab})

        labels = (hash_join(labels, mins, on=["node"], how="left outer")
                  .map_batches(take_min, batch_format="pandas"))
    return labels

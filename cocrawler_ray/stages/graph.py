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

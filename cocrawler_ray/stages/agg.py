"""Partial (combiner-style) group-by aggregation.

``Dataset.groupby().aggregate()`` is a sort-based all-to-all shuffle of the
FULL input — correct but wasteful when the group-key cardinality is small
relative to the data (global counters, per-status stats, TPC-H Q1-style
summaries: exactly the stats.py-shaped aggregations of SURVEY §2.5). The
scale-correct plan is the classic combiner: aggregate inside each
``map_batches`` block (one streaming pass, no shuffle), then combine the
tiny per-block partials — (n_blocks × n_groups) rows — at the end.

At 100 TB: the partial pass streams; only partials (kilobytes) cross the
wire. This is the same pattern the crawl loop uses for in-batch link dedup
before the seen shuffle (stages/process.py::dedup_links_batch).

Supported kinds: sum, count, min, max, mean (mean decomposes into
sum+count partials and divides in the combine step).

Two combine strategies, chosen by key cardinality at the CALL SITE:

- ``distributed=False`` (default): per-block partials are pulled to the
  driver and combined in pandas. Correct plan ONLY when the group domain
  is bounded by a small constant (status codes, event types, TPC-H
  returnflag) — then the driver holds n_blocks × O(1) rows.
- ``distributed=True``: the partials stay a Dataset and the combine is a
  hash exchange OF THE PARTIALS (``stages.exchange.grouped_shuffle`` —
  still far smaller than shuffling the raw input whenever blocks contain
  repeated keys; a native ``groupby().aggregate()`` was measured at 14 s+
  on 90k partial rows, see exchange.py). Use for keys whose domain scales
  with the data — per-host / per-user counts, where a driver combine
  would hold the whole key domain × n_blocks. Only the final
  one-row-per-group result is materialized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from cocrawler_ray.stages.exchange import grouped_shuffle

_PARTIAL_KINDS = {"sum", "count", "min", "max", "mean"}


def partial_groupby_agg(ds: rd.Dataset, keys: list[str],
                        aggs: dict[str, tuple[str | None, str]],
                        *, distributed: bool = False) -> pd.DataFrame:
    """``aggs``: out_col -> (in_col, kind); kind in sum/count/min/max/mean
    (in_col ignored for count). Returns the combined result as pandas.
    Set ``distributed=True`` when the key domain scales with the data
    (see module docstring)."""
    for out_col, (_, kind) in aggs.items():
        if kind not in _PARTIAL_KINDS:
            raise ValueError(f"{out_col}: unsupported kind {kind}")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False, observed=True)
        cols = {}
        for out_col, (col, kind) in aggs.items():
            if kind == "count":
                cols[out_col] = g.size()
            elif kind == "mean":
                cols[f"__{out_col}_sum"] = g[col].sum()
                cols[f"__{out_col}_n"] = g[col].count()
            else:
                cols[out_col] = getattr(g[col], kind)()
        return pd.concat(cols, axis=1).reset_index()

    parts_ds = ds.map_batches(partial, batch_format="pandas")

    if distributed:
        plan = {}  # partial-col -> numpy combine op
        for out_col, (_, kind) in aggs.items():
            if kind in ("sum", "count"):
                plan[out_col] = "sum"
            elif kind == "mean":
                plan[f"__{out_col}_sum"] = "sum"
                plan[f"__{out_col}_n"] = "sum"
            else:
                plan[out_col] = kind

        def combine(df: pd.DataFrame) -> pd.DataFrame:
            return (df.groupby(keys, sort=False, observed=True)
                    .agg(plan).reset_index())

        res = grouped_shuffle(parts_ds, keys, combine).to_pandas()
        for out_col, (_, kind) in aggs.items():
            if kind == "mean":
                res[out_col] = res[f"__{out_col}_sum"] / res[f"__{out_col}_n"]
                res = res.drop(columns=[f"__{out_col}_sum", f"__{out_col}_n"])
            elif kind == "count":
                res[out_col] = res[out_col].astype(np.int64)
        return res[keys + list(aggs)]

    parts = parts_ds.to_pandas()
    g = parts.groupby(keys, sort=False, observed=True)
    out = {}
    for out_col, (_, kind) in aggs.items():
        if kind in ("sum", "count"):
            out[out_col] = g[out_col].sum()
        elif kind == "mean":
            out[out_col] = g[f"__{out_col}_sum"].sum() / g[f"__{out_col}_n"].sum()
        else:
            out[out_col] = getattr(g[out_col], kind)()
    res = pd.concat(out, axis=1).reset_index()
    for out_col, (_, kind) in aggs.items():
        if kind == "count":
            res[out_col] = res[out_col].astype(np.int64)
    return res

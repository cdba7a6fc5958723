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

    def _partial_cols() -> list[str]:
        names = list(keys)
        for out_col, (_, kind) in aggs.items():
            if kind == "mean":
                names += [f"__{out_col}_sum", f"__{out_col}_n"]
            else:
                names.append(out_col)
        return names

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            # Ray hands COLUMN-LESS empty frames to UDFs on an all-empty
            # dataset — groupby(keys) would KeyError; emit the shaped
            # empty partial instead
            return pd.DataFrame({c: pd.Series(dtype=np.float64)
                                 for c in _partial_cols()})
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
            if not len(df) or any(k not in df.columns for k in keys):
                return pd.DataFrame({c: pd.Series(dtype=np.float64)
                                     for c in [*keys, *plan]})
            return (df.groupby(keys, sort=False, observed=True)
                    .agg(plan).reset_index())

        res = grouped_shuffle(parts_ds, keys, combine).to_pandas()
        if not len(res):
            # same empty-Dataset column-loss gotcha as the local branch
            return pd.DataFrame({c: pd.Series(dtype=np.float64)
                                 for c in [*keys, *aggs]})
        for out_col, (_, kind) in aggs.items():
            if kind == "mean":
                res[out_col] = res[f"__{out_col}_sum"] / res[f"__{out_col}_n"]
                res = res.drop(columns=[f"__{out_col}_sum", f"__{out_col}_n"])
            elif kind == "count":
                res[out_col] = res[out_col].astype(np.int64)
        return res[keys + list(aggs)]

    parts = parts_ds.to_pandas()
    if not len(parts):
        # an all-empty Dataset loses its columns through to_pandas — hand
        # back a correctly-shaped (if generically-typed) empty frame
        return pd.DataFrame({c: pd.Series(dtype=np.float64)
                             for c in [*keys, *aggs]})
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


def exact_quantile_cont(ds: rd.Dataset, col: str, q: float) -> float:
    """EXACT linear-interpolation quantile (SQL ``quantile_cont`` / numpy
    'linear') of a numeric column, without sorting the data: a value-count
    combiner reduces the scan to a (value, count) histogram — the driver
    holds O(distinct values), bounded by the value DOMAIN (lengths,
    scores, status codes), not the row count — and the quantile reads off
    the cumulative counts. The compute-threshold -> broadcast -> gate
    two-pass is the standard corpus-curation shape."""
    hist = partial_groupby_agg(ds.select_columns([col]), [col],
                               {"cnt": (None, "count")})
    if not len(hist):
        raise ValueError(
            f"exact_quantile_cont: empty input (no rows in column {col!r})")
    hist = hist.sort_values(col)
    vals = hist[col].to_numpy().astype(np.float64)
    cum = hist["cnt"].to_numpy().astype(np.int64).cumsum()
    n = int(cum[-1])
    h = (n - 1) * q
    lo = int(np.floor(h))
    hi = int(np.ceil(h))
    v_lo = vals[np.searchsorted(cum, lo + 1)]  # (lo+1)-th smallest
    v_hi = vals[np.searchsorted(cum, hi + 1)]
    return float(v_lo + (h - lo) * (v_hi - v_lo))


def grouped_quantile_cont(ds: rd.Dataset, keys: list[str], col: str,
                          qs: dict[str, float]) -> pd.DataFrame:
    """EXACT per-group linear-interpolation quantiles (SQL
    ``quantile_cont(col, q) ... GROUP BY keys``) without a sort-based
    all-to-all of the raw rows and without requiring a whole group's rows
    in one worker (the ``groupby().map_groups`` anti-pattern this
    replaces — a hot group at 100 TB would OOM its reducer).

    Plan: (1) each block reduces to a ``(keys..., col) -> count``
    histogram partial inside ``map_batches`` — one streaming pass, memory
    bounded by the block's distinct (group, value) pairs; (2) the tiny
    partials hash-exchange by the GROUP keys (``grouped_shuffle``), so a
    reducer holds O(distinct values) per group — bounded by the value
    DOMAIN (latencies, scores, lengths), never the group's row count; (3)
    each quantile reads off the cumulative counts with the same
    interpolation as :func:`exact_quantile_cont`.

    ``qs``: out_col -> fraction in [0, 1]. Returns one row per group with
    columns [*keys, *qs] as float64."""
    out_cols = [*keys, *qs]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({c: pd.Series(dtype=np.float64)
                                 for c in [*keys, col, "cnt"]})
        return (df.groupby([*keys, col], sort=False, observed=True)
                .size().rename("cnt").reset_index())

    def reduce(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df) or any(k not in df.columns for k in keys):
            return pd.DataFrame({c: pd.Series(dtype=np.float64)
                                 for c in out_cols})
        hist = (df.groupby([*keys, col], sort=False, observed=True)["cnt"]
                .sum().reset_index().sort_values([*keys, col]))
        rows = []
        for gk, g in hist.groupby(keys, sort=False, observed=True):
            vals = g[col].to_numpy(np.float64)
            cum = g["cnt"].to_numpy(np.int64).cumsum()
            n = int(cum[-1])
            row = dict(zip(keys, gk if isinstance(gk, tuple) else (gk,)))
            for name, q in qs.items():
                h = (n - 1) * q
                lo, hi = int(np.floor(h)), int(np.ceil(h))
                v_lo = vals[np.searchsorted(cum, lo + 1)]
                v_hi = vals[np.searchsorted(cum, hi + 1)]
                row[name] = float(v_lo + (h - lo) * (v_hi - v_lo))
            rows.append(row)
        return pd.DataFrame(rows, columns=out_cols)

    parts = ds.select_columns([*keys, col]).map_batches(
        partial, batch_format="pandas")
    res = grouped_shuffle(parts, keys, reduce).to_pandas()
    if not len(res):
        return pd.DataFrame({c: pd.Series(dtype=np.float64)
                             for c in out_cols})
    return res[out_cols]


def grouped_winsorized_mean(ds: rd.Dataset, keys: list[str], col: str,
                            lo_pct: int = 10,
                            hi_pct: int = 90) -> pd.DataFrame:
    """Per-group WINSORIZED sum (robust mean's numerator) over an
    integer column, exact end to end: clamp every value into the group's
    [lo_pct, hi_pct] DISCRETE percentile bounds, then sum. Discrete
    bounds are rank statistics — the ((n-1)*pct//100 + 1)-th smallest —
    so no interpolation float ever enters; the clamped sum is read
    directly OFF the value histogram (sum cnt * clip(v)), making the
    whole operator one streaming histogram pass + one tiny group
    exchange (the grouped_quantile_cont plan, same memory bound:
    O(distinct values) per group, never the group's row count).

    Returns one row per group: [*keys, lo_micro, hi_micro, n,
    wsum_micro] — all int64; consumers derive the robust mean as
    wsum/n in their own rounding discipline."""
    out_cols = [*keys, "lo_micro", "hi_micro", "n", "wsum_micro"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            # keep the INPUT dtypes on the empty block (a dtype-blind
            # empty frame makes Ray Data see two schemas for the stage
            # — the string-key vs int64 RefBundle warning)
            out = df[[*keys, col]].copy()
            out["cnt"] = pd.Series(dtype=np.int64)
            return out
        return (df.groupby([*keys, col], sort=False, observed=True)
                .size().rename("cnt").reset_index())

    def reduce(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df) or any(k not in df.columns for k in keys):
            # same dtype discipline as the partial: key columns keep
            # their input dtype when present so empty partitions don't
            # flip the stage's schema
            out = pd.DataFrame({k: (df[k].iloc[:0] if k in df.columns
                                    else pd.Series(dtype=np.int64))
                                for k in keys})
            for c in ("lo_micro", "hi_micro", "n", "wsum_micro"):
                out[c] = pd.Series(dtype=np.int64)
            return out
        hist = (df.groupby([*keys, col], sort=False, observed=True)["cnt"]
                .sum().reset_index().sort_values([*keys, col]))
        rows = []
        for gk, g in hist.groupby(keys, sort=False, observed=True):
            vals = g[col].to_numpy(np.int64)
            cnt = g["cnt"].to_numpy(np.int64)
            cum = cnt.cumsum()
            n = int(cum[-1])
            lo = int(vals[np.searchsorted(cum, (n - 1) * lo_pct // 100 + 1)])
            hi = int(vals[np.searchsorted(cum, (n - 1) * hi_pct // 100 + 1)])
            wsum = int((cnt * np.clip(vals, lo, hi)).sum())
            row = dict(zip(keys, gk if isinstance(gk, tuple) else (gk,)))
            row.update(lo_micro=lo, hi_micro=hi, n=n, wsum_micro=wsum)
            rows.append(row)
        return pd.DataFrame(rows, columns=out_cols)

    parts = ds.select_columns([*keys, col]).map_batches(
        partial, batch_format="pandas")
    res = grouped_shuffle(parts, keys, reduce).to_pandas()
    if not len(res):
        return pd.DataFrame({c: pd.Series(dtype=np.int64)
                             for c in out_cols})
    return res[out_cols]


def heavy_hitters(make_ds, keys: list[str], phi: float) -> pd.DataFrame:
    """EXACT phi-frequent keys (count > phi*N) in two bounded-memory passes
    — the scale-correct form of the crawl loop's hot-host detection
    (SURVEY §2.5 A2 / hot-host splitting), usable when even the per-key
    count table is too big to shuffle in full.

    Pass 1 (candidates): each block reduces to a Misra-Gries summary of
    capacity k = ceil(2/phi) — exact block counts minus the (k+1)-th
    largest, positives kept. MG summaries are mergeable by summing stored
    counts; the summed underestimate is < N/(k+1) <= phi*N/2, so every
    phi-heavy key survives the candidate filter
    ``stored_sum > N*(phi - 1/(k+1))`` and the candidate set is bounded by
    ~2/phi keys regardless of data size. The merge is a grouped_shuffle of
    the tiny summaries.

    Pass 2 (verify): broadcast the candidate keys, exact-count ONLY them
    (per-block combiner -> driver combine over <= 2/phi rows), keep
    count > phi*N.

    ``make_ds``: zero-arg callable returning the input Dataset — the
    operator scans twice, so the input must be re-buildable (a read_parquet
    lineage re-executes; pass ``lambda: ds`` only for cached datasets).
    Returns (keys..., n:int64) for the exact heavy keys."""
    k = int(np.ceil(2.0 / phi))

    def mg_summary(df: pd.DataFrame) -> pd.DataFrame:
        c = df.groupby(keys, sort=False, observed=True).size()
        if len(c) > k:
            t = np.partition(c.to_numpy(), len(c) - k - 1)[len(c) - k - 1]
            kept = c - t
            kept = kept[kept > 0]
            if not len(kept):  # all counts tied at t: keep one zero-info
                kept = (c - t).iloc[:1]  # row so the block-size marker and
            c = kept                     # N survive (0 can't pass the
        out = c.rename("__mg").reset_index()  # positive candidate filter)
        n = np.zeros(len(out), dtype=np.int64)
        if len(n):  # block size rides on exactly ONE row (N = sum of __n)
            n[0] = len(df)
        out["__n"] = n
        return out

    summaries = make_ds().map_batches(mg_summary, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(keys, sort=False, observed=True)
                .agg(__mg=("__mg", "sum"), __n=("__n", "sum")).reset_index())

    merged = grouped_shuffle(summaries, keys, merge).to_pandas()
    n_total = int(merged["__n"].sum()) if len(merged) else 0
    if n_total == 0:
        return pd.DataFrame({**{c: pd.Series([], dtype=object) for c in keys},
                             "n": pd.Series([], dtype=np.int64)})
    cand = merged[merged["__mg"].to_numpy()
                  > n_total * (phi - 1.0 / (k + 1))][keys]
    if not len(cand):
        out = merged[keys].iloc[:0].reset_index(drop=True)
        out["n"] = pd.Series([], dtype=np.int64)
        return out
    cand_sets = {c: set(cand[c].tolist()) for c in keys}

    def count_cands(df: pd.DataFrame) -> pd.DataFrame:
        m = np.ones(len(df), dtype=bool)
        for c in keys:  # per-column prefilter, then exact tuple match
            m &= df[c].isin(cand_sets[c]).to_numpy()
        sub = df[m]
        if len(keys) > 1 and len(sub):
            sub = sub.merge(cand, on=keys)
        return (sub.groupby(keys, sort=False, observed=True).size()
                .rename("n").reset_index())

    counts = make_ds().map_batches(count_cands, batch_format="pandas").to_pandas()
    out = counts.groupby(keys, sort=False, observed=True)["n"].sum().reset_index()
    out = out[out["n"].to_numpy() > phi * n_total].reset_index(drop=True)
    out["n"] = out["n"].astype(np.int64)
    return out


def cooccur_pairs_reduce(df, key_col: str = "user_id",
                         item_col: str = "event_type"):
    """Partition reduce behind q_cooccur: per-partition co-occurrence
    counts of unordered item pairs within an entity (market-basket
    shape). drop_duplicates collapses to the distinct (entity, item)
    pairs, a pandas self-merge on the entity generates each entity's
    item pairs (t1 < t2 keeps one orientation), and a groupby counts —
    all C-paths, no per-entity loop. Per-entity pair fan-out is
    k·(k-1)/2 for k distinct items; the operator contract is a BOUNDED
    per-entity item domain (event types, content categories), so the
    pair volume is O(rows). Output is per-partition (t1, t2, n) — the
    caller combines with one tiny grouped sum (pair-domain-sized)."""
    if not len(df):
        # dtype-preserving empty: item_col may be str (event types) or
        # int64 (part keys) — a hardcoded dtype would split the output
        # schema across partitions
        it = (df[item_col].iloc[:0] if item_col in df.columns
              else pd.Series([], dtype=str))
        return pd.DataFrame({"t1": it.reset_index(drop=True),
                             "t2": it.reset_index(drop=True),
                             "n": pd.Series([], dtype=np.int64)})
    dd = df[[key_col, item_col]].drop_duplicates()
    m = dd.merge(dd, on=key_col, suffixes=("_1", "_2"))
    m = m[m[f"{item_col}_1"] < m[f"{item_col}_2"]]
    out = (m.groupby([f"{item_col}_1", f"{item_col}_2"], sort=False)
           .size().rename("n").reset_index())
    return pd.DataFrame({"t1": out[f"{item_col}_1"],
                         "t2": out[f"{item_col}_2"],
                         "n": out["n"].to_numpy(np.int64)})


def _grouped_median_sorted(a: np.ndarray, start: np.ndarray,
                           cnt: np.ndarray) -> np.ndarray:
    """Median of each contiguous sorted run: pure indexing, no loop."""
    mid = start + cnt // 2
    lo = np.maximum(mid - 1, start)  # == mid-1 whenever cnt is even
    return np.where(cnt % 2 == 1, a[mid], (a[lo] + a[mid]) / 2.0)


def mad_outliers_reduce(df, val_col: str = "value",
                        key_col: str = "user_id"):
    """Partition reduce behind q_mad_outliers: per-key median, median
    absolute deviation, and 3-MAD outlier counts from two vectorized
    lexsorts + run indexing (no per-group loop). Micro-int quantization
    keeps the interpolated medians dyadic-exact (.5 steps)."""
    from cocrawler_ray.stages.text import round_half_away

    if not len(df):
        return pd.DataFrame({
            key_col: np.array([], np.int64),
            "n": np.array([], np.int64),
            "med": np.array([], np.float64),
            "mad": np.array([], np.float64),
            "n_outliers": np.array([], np.int64)})
    v = round_half_away(df[val_col].to_numpy() * 1e6, 0).astype(np.int64)
    df = df.assign(v=v).sort_values([key_col, "v"], kind="stable")
    g = df[key_col].to_numpy()
    vv = df["v"].to_numpy().astype(np.float64)
    uniq, start, cnt = np.unique(g, return_index=True, return_counts=True)
    med = _grouped_median_sorted(vv, start, cnt)
    dev = np.abs(vv - np.repeat(med, cnt))
    dev_s = dev[np.lexsort((dev, g))]
    madv = _grouped_median_sorted(dev_s, start, cnt)
    n_out = np.add.reduceat(
        (dev > 3.0 * np.repeat(madv, cnt)).astype(np.int64), start)
    return pd.DataFrame({
        key_col: uniq, "n": cnt.astype(np.int64),
        "med": round_half_away(med / 1e6, 6),
        "mad": round_half_away(madv / 1e6, 6),
        "n_outliers": n_out})


def skyline_min_max(df: pd.DataFrame, min_col: str,
                    max_col: str) -> pd.DataFrame:
    """Pareto frontier: keep rows not dominated on (minimize ``min_col``,
    maximize ``max_col``). q dominates p iff q.min <= p.min, q.max >=
    p.max, and q is strictly better on at least one axis; exact
    (min, max) ties are mutually non-dominating and ALL survive
    (mirrors the SQL NOT EXISTS restatement in q_skyline).

    Vectorized: after a (min asc, max desc) lexsort every dominator of a
    row sorts strictly before it, so dominance reduces to two prefix
    checks — the running max of ``max_col`` over strictly-cheaper
    prefixes, and a strictly-better ``max`` at the same cost. O(n log n),
    no pairwise matrix.

    Distributed use is two-phase (the classic skyline decomposition):
    skyline(union) ⊆ union(local skylines), so run this per block and
    once more over the concatenated survivors — global candidates are
    frontier-sized, never data-sized."""
    if not len(df):
        return df
    lo = df[min_col].to_numpy()
    hi = df[max_col].to_numpy()
    order = np.lexsort((-hi, lo))
    lo_s, hi_s = lo[order], hi[order]
    run_max = np.maximum.accumulate(hi_s)
    prev_max = np.concatenate(([np.iinfo(np.int64).min
                                if np.issubdtype(hi_s.dtype, np.integer)
                                else -np.inf], run_max[:-1]))
    # dominated by a strictly-cheaper row with max >= ours
    new_price = np.concatenate(
        ([True], lo_s[1:] != lo_s[:-1]))  # first row of each price run
    # best max over STRICTLY cheaper prefixes: freeze prev_max at the
    # start of each equal-price run
    run_id = np.cumsum(new_price) - 1
    price_start_max = prev_max[new_price]
    cheaper_max = price_start_max[run_id]
    dom_cheaper = cheaper_max >= hi_s
    # dominated within the same price by a strictly larger max: rows
    # after the first of an equal-price run with a smaller max than the
    # run head are dominated unless they tie the head exactly
    head_max = hi_s[new_price][run_id]
    dom_same = (~new_price) & (hi_s < head_max)
    keep = ~(dom_cheaper | dom_same)
    out_idx = np.sort(order[keep])
    return df.iloc[out_idx]

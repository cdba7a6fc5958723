"""Event-time windowing — tumbling-window aggregates and gap-based
sessionization over timestamped tables.

The reference has no event-time semantics (SURVEY §2.9: pull-based, no
watermarks), but a training-data pipeline over crawl logs needs them; both
operators here follow the engine's exchange discipline:

- ``tumbling_window_agg``: the window id is a PURE per-row function
  (``epoch_us // width``), so the whole operator is a per-batch column add
  followed by the combiner/distributed ``partial_groupby_agg`` — no sort,
  no range repartition, no watermark state. Window x key cardinality
  scales with data ⇒ distributed combine.
- ``sessionize``: sessions are per-entity state, so co-locate each
  entity's rows with ONE ``grouped_shuffle`` and run the classic
  vectorized gap-split (sort, diff, cumsum) inside the partition reduce.
  A session can never span partitions because the entity key is the
  partition key — the documented partitioning assumption.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from cocrawler_ray.stages.agg import partial_groupby_agg
from cocrawler_ray.stages.exchange import grouped_shuffle


def _ts_us(col: pd.Series | pa.ChunkedArray) -> np.ndarray:
    """timestamp column -> int64 epoch microseconds."""
    if isinstance(col, pd.Series):
        return col.to_numpy().astype("datetime64[us]").view("int64")
    if pa.types.is_timestamp(col.type):
        # normalize the unit first: a timestamp[ns|s] cast straight to
        # int64 would yield ns/s epochs and wrong window ids
        col = col.cast(pa.timestamp("us", col.type.tz))
    return col.cast(pa.int64()).to_numpy()


def tumbling_window_agg(ds: rd.Dataset, ts_col: str, width_us: int,
                        keys: list[str], aggs: dict) -> pd.DataFrame:
    """Aggregate per (tumbling window, *keys). ``aggs`` as in
    ``partial_groupby_agg``. Output has an int64 ``win`` column =
    floor(epoch_us / width_us) (epoch is non-negative by contract)."""

    def add_win(t: pa.Table) -> pa.Table:
        win = _ts_us(t[ts_col]) // np.int64(width_us)
        return t.append_column("win", pa.array(win, pa.int64()))

    return partial_groupby_agg(
        ds.map_batches(add_win, batch_format="pyarrow"),
        ["win"] + keys, aggs, distributed=True)


def sessionize(ds: rd.Dataset, by: str, ts_col: str, order_col: str,
               gap_us: int, value_col: str) -> rd.Dataset:
    """Gap-based sessions per ``by`` entity: a new session starts when the
    time since the previous event (ordered by ``ts_col, order_col``)
    exceeds ``gap_us`` STRICTLY. Returns one row per session:
    (by, session_start_us:int64, n:int64, sv:float=sum(value_col))."""

    def split_sessions(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({by: df[by],
                                 "session_start_us": pd.Series([], dtype=np.int64),
                                 "n": pd.Series([], dtype=np.int64),
                                 "sv": pd.Series([], dtype=np.float64)})
        df = df.sort_values([by, ts_col, order_col], kind="stable")
        ts = _ts_us(df[ts_col])
        ent = df[by].to_numpy()
        new = np.ones(len(df), dtype=bool)
        new[1:] = (ent[1:] != ent[:-1]) | ((ts[1:] - ts[:-1]) > gap_us)
        sess = np.cumsum(new)
        g = df.assign(__ts_us=ts, __s=sess).groupby([by, "__s"], sort=False)
        out = g.agg(session_start_us=("__ts_us", "min"), n=("__ts_us", "size"),
                    sv=(value_col, "sum")).reset_index().drop(columns="__s")
        out["n"] = out["n"].astype(np.int64)
        return out

    return grouped_shuffle(
        ds.select_columns([by, ts_col, order_col, value_col]),
        [by], split_sessions)


def ordered_prefix_sum(ds: rd.Dataset, order_col: str, val_col: str,
                       out_col: str = "cum") -> rd.Dataset:
    """Global running sum of ``val_col`` in ``order_col`` order — the
    distributed scan primitive behind sequence packing, global ranking and
    ordered chunking.

    Plan: one ``ds.sort(order_col)`` (range partition; blocks then hold
    DISJOINT key ranges), a per-block (first_key, block_sum) summary —
    O(blocks) on the driver — turned into exclusive block offsets, then a
    second pass over the SAME materialized block refs adds
    offset + within-block cumsum. The data crosses the cluster once (the
    sort); the offset table is KB-sized regardless of row count.
    ``out_col`` is INCLUSIVE (first row's cum == its value).

    ``order_col`` must be UNIQUE (an id column): offsets key on each
    block's first value, so a duplicate key straddling a block boundary
    would alias two blocks (guarded below)."""
    import ray

    refs = [r for r in ds.sort(order_col).to_arrow_refs()]

    def summary(t: pa.Table):
        if t.num_rows == 0:
            return None
        import pyarrow.compute as pc
        s = pc.sum(t.column(val_col)).as_py()
        return (t.column(order_col)[0].as_py(), int(s or 0))

    infos = ray.get([ray.remote(summary).remote(r) for r in refs])
    live = [i for i in infos if i is not None]
    offsets: dict = {}
    run = 0
    for first, total in sorted(live):
        offsets[first] = run
        run += total
    if len(offsets) != len(live):
        raise ValueError(
            f"{order_col} values are not unique across block boundaries")
    oref = ray.put(offsets)

    def add_cum(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        off = ray.get(oref)[t.column(order_col)[0].as_py()]
        v = t.column(val_col).to_numpy().astype(np.int64)
        return t.append_column(out_col,
                               pa.array(np.cumsum(v) + off, pa.int64()))

    packed = [ray.remote(add_cum).remote(r) for r in refs]
    return rd.from_arrow_refs(packed)


def token_pack(ds: rd.Dataset, order_col: str, tok_col: str,
               budget: int) -> rd.Dataset:
    """Sequence packing (concat-then-chunk pre-training semantics): lay
    documents end to end in ``order_col`` order and assign each to the
    ``budget``-token chunk its FIRST token lands in —
    pack_id = (running_sum_before_doc) // budget. One distributed ordered
    prefix sum; packs are reproducible for any partitioning."""
    cum = ordered_prefix_sum(ds, order_col, tok_col, out_col="__cum")

    def pack(t: pa.Table) -> pa.Table:
        c = t.column("__cum").to_numpy()
        v = t.column(tok_col).to_numpy().astype(np.int64)
        pid = (c - v) // budget
        return (t.drop_columns(["__cum"])
                .append_column("pack_id", pa.array(pid, pa.int64())))

    return cum.map_batches(pack, batch_format="pyarrow")


def hopping_window_agg(ds: rd.Dataset, ts_col: str, width_us: int,
                       hop_us: int, keys: list[str], aggs: dict) -> pd.DataFrame:
    """Aggregate per (hopping window, *keys): windows of ``width_us``
    starting every ``hop_us`` (width must be a multiple of hop), so each
    event lands in width/hop overlapping windows. Same shape as
    :func:`tumbling_window_agg` — the window REPLICATION is a pure per-row
    column expansion inside the scan (width/hop copies), the aggregate is
    the distributed combiner; no sort or range repartition at any scale.
    Output ``win_start`` is the window's int64 epoch-us start."""
    if width_us % hop_us:
        raise ValueError("width_us must be a multiple of hop_us")
    k = width_us // hop_us

    def explode(t: pa.Table) -> pa.Table:
        us = _ts_us(t[ts_col])
        base = us // np.int64(hop_us)
        reps = np.repeat(np.arange(k, dtype=np.int64), len(us))
        win = (np.tile(base, k) - reps) * np.int64(hop_us)
        cols = {"win_start": pa.array(win)}
        for c in t.column_names:
            if c != ts_col:
                cols[c] = pa.concat_arrays(
                    [t.column(c).combine_chunks()] * k)
        return pa.table(cols)

    return partial_groupby_agg(
        ds.map_batches(explode, batch_format="pyarrow"),
        ["win_start"] + keys, aggs, distributed=True)


def frame_sums_reduce(df, val_col: str = "value", key_col: str = "user_id",
                      preceding: int = 4):
    """Partition reduce behind q_window_frame: exact integer frame sums
    for ROWS BETWEEN ``preceding`` PRECEDING AND CURRENT ROW per key in
    (ts, event_id) order, from one group-reset cumulative sum — O(rows),
    no per-window loop. Values quantize to integer micro-units first so
    the sums are order-independent (SQL-exact)."""
    import pandas as pd

    from cocrawler_ray.stages.text import round_half_away

    df = df.sort_values([key_col, "ts", "event_id"], kind="stable")
    g = df[key_col].to_numpy()
    v = round_half_away(df[val_col].to_numpy() * 1e6, 0).astype(np.int64)
    n = len(g)
    idx = np.arange(n, dtype=np.int64)
    new = np.ones(n, dtype=bool)
    if n > 1:
        new[1:] = g[1:] != g[:-1]
    grp_start = np.maximum.accumulate(np.where(new, idx, 0))
    lo = np.maximum(grp_start, idx - preceding)
    cs = np.cumsum(v)
    prev = np.where(lo > 0, cs[np.maximum(lo - 1, 0)], 0)
    win_sum = cs - prev
    win_n = idx - lo + 1
    avg = round_half_away(win_sum.astype(np.float64) / win_n / 1e6, 6)
    return pd.DataFrame({
        "event_id": df["event_id"].to_numpy(),
        key_col: g, "v_micro": v,
        "win_sum_micro": win_sum, "win_n": win_n,
        "moving_avg": avg})


def funnel_reduce(steps: list[str], key_col: str = "user_id",
                  type_col: str = "event_type", ts_col: str = "ts"):
    """Partition reduce behind q_funnel: per entity, the deepest funnel
    stage reached where stage i+1 requires an event of type ``steps[i+1]``
    STRICTLY after the entity's earliest completion time of stage i
    (earliest-completion semantics — the standard product-analytics
    funnel). Entirely merge/filter/groupby-min pandas C-paths; no
    per-entity loop. Emits per-partition (step, n_users) counts where
    n_users = entities whose deepest stage >= step — the caller sums the
    tiny per-partition tables. An entity's events are co-located by the
    grouped_shuffle key, the documented partitioning assumption."""
    def reduce(df: pd.DataFrame) -> pd.DataFrame:
        out_empty = pd.DataFrame({
            "step": pd.Series([], dtype=np.int64),
            "n_users": pd.Series([], dtype=np.int64)})
        if not len(df):
            return out_empty
        ts = pd.Series(_ts_us(df[ts_col]), index=df.index)
        df = df.assign(__us=ts)
        # earliest stage-1 completion per entity
        cur = (df[df[type_col] == steps[0]]
               .groupby(key_col, sort=False)["__us"].min())
        rows = [(1, len(cur))]
        for i, step in enumerate(steps[1:], start=2):
            if not len(cur):
                rows.append((i, 0))
                continue
            sub = df[df[type_col] == step]
            # Series.map, not merge(right_index=True): merging an EMPTY
            # step subset names the result index after the right index
            # (the entity key), making the groupby below ambiguous
            prev = sub[key_col].map(cur)
            ok = prev.notna().to_numpy()
            mask = np.zeros(len(sub), dtype=bool)
            # int64 epoch-µs survive the float64 round-trip exactly
            # (< 2**53), so the strict > is exact
            mask[ok] = (sub["__us"].to_numpy()[ok]
                        > prev.to_numpy()[ok].astype(np.int64))
            cur = sub[mask].groupby(key_col, sort=False)["__us"].min()
            rows.append((i, len(cur)))
        return pd.DataFrame({"step": np.array([r[0] for r in rows], np.int64),
                             "n_users": np.array([r[1] for r in rows], np.int64)})
    return reduce


def islands_reduce(df, key_col: str = "o_custkey", day_col: str = "day"):
    """Partition reduce behind q_gaps_islands: maximal runs of CONSECUTIVE
    integer values (days) per entity — the gaps-and-islands pattern. One
    drop_duplicates + lexsort; island boundaries are where the day step
    exceeds 1 (or the entity changes); per-island (start, end, length)
    reads off a cumsum-labelled groupby. Differs from :func:`sessionize`:
    islands run over the DISTINCT integer domain (calendar coverage), not
    event-time gaps over raw rows."""
    cols = {key_col: pd.Series([], dtype=np.int64),
            "start_day": pd.Series([], dtype=np.int64),
            "end_day": pd.Series([], dtype=np.int64),
            "n_days": pd.Series([], dtype=np.int64)}
    if not len(df):
        return pd.DataFrame(cols)
    dd = (df[[key_col, day_col]].drop_duplicates()
          .sort_values([key_col, day_col], kind="stable"))
    k = dd[key_col].to_numpy()
    d = dd[day_col].to_numpy().astype(np.int64)
    new = np.ones(len(dd), dtype=bool)
    new[1:] = (k[1:] != k[:-1]) | (d[1:] - d[:-1] > 1)
    isl = np.cumsum(new)
    g = dd.assign(__i=isl).groupby([key_col, "__i"], sort=False)[day_col]
    out = g.agg(start_day="min", end_day="max", n_days="size").reset_index()
    return pd.DataFrame({key_col: out[key_col].to_numpy(),
                         "start_day": out["start_day"].to_numpy(np.int64),
                         "end_day": out["end_day"].to_numpy(np.int64),
                         "n_days": out["n_days"].to_numpy(np.int64)})


def rank_reduce(df, val_col: str = "value", key_col: str = "user_id"):
    """Partition reduce behind q_rank_events: rank + dense_rank per key
    by value DESC from one sort and boundary-flag scans. Ties share the
    min rank, so the output is deterministic under any partitioning."""
    import pandas as pd

    from cocrawler_ray.stages.text import round_half_away

    v = round_half_away(df[val_col].to_numpy() * 1e6, 0).astype(np.int64)
    df = df.assign(v_micro=v).sort_values(
        [key_col, "v_micro"], ascending=[True, False], kind="stable")
    g = df[key_col].to_numpy()
    vm = df["v_micro"].to_numpy()
    n = len(g)
    idx = np.arange(n, dtype=np.int64)
    new_grp = np.ones(n, dtype=bool)
    new_val = np.ones(n, dtype=bool)
    if n > 1:
        new_grp[1:] = g[1:] != g[:-1]
        new_val[1:] = new_grp[1:] | (vm[1:] != vm[:-1])
    grp_start = np.maximum.accumulate(np.where(new_grp, idx, 0))
    first_eq = np.maximum.accumulate(np.where(new_val, idx, 0))
    rnk = first_eq - grp_start + 1
    dense_cum = np.cumsum(new_val)
    drnk = dense_cum - np.where(
        grp_start > 0, dense_cum[np.maximum(grp_start - 1, 0)], 0)
    return pd.DataFrame({
        "event_id": df["event_id"].to_numpy(),
        key_col: g, "v_micro": vm, "rnk": rnk, "drnk": drnk})


def percent_cume_reduce(df, val_col: str = "value",
                        key_col: str = "user_id"):
    """Partition reduce behind q_percent_rank: percent_rank + cume_dist
    per key by value ASC, as EXACT integer micro-units so both oracle
    sides share one arithmetic (truncating integer division — DuckDB
    ``//`` truncates, numpy ``//`` floors; both operands are non-negative
    here so the two agree):

        prk_micro  = (rank - 1) * 1_000_000 // (n_group - 1)   (0 if n=1)
        cume_micro = rows_with_value<=current * 1_000_000 // n_group

    One sort + boundary-flag scans (the rank_reduce pattern): rank = min
    position of the equal-value run, rows<= = max position of the run + 1,
    so ties are deterministic under any input order."""
    from cocrawler_ray.stages.text import round_half_away

    v = round_half_away(df[val_col].to_numpy() * 1e6, 0).astype(np.int64)
    df = df.assign(v_micro=v).sort_values(
        [key_col, "v_micro"], ascending=[True, True], kind="stable")
    g = df[key_col].to_numpy()
    vm = df["v_micro"].to_numpy()
    n = len(g)
    idx = np.arange(n, dtype=np.int64)
    new_grp = np.ones(n, dtype=bool)
    new_val = np.ones(n, dtype=bool)
    if n > 1:
        new_grp[1:] = g[1:] != g[:-1]
        new_val[1:] = new_grp[1:] | (vm[1:] != vm[:-1])
    grp_start = np.maximum.accumulate(np.where(new_grp, idx, 0))
    first_eq = np.maximum.accumulate(np.where(new_val, idx, 0))
    # group end / run end via the reversed cumulative trick
    end_grp = np.empty(n, dtype=np.int64)
    end_val = np.empty(n, dtype=np.int64)
    if n:
        last_of_grp = np.append(new_grp[1:], True)
        last_of_val = np.append(new_val[1:], True)
        rev = idx[::-1]
        end_grp = np.minimum.accumulate(
            np.where(last_of_grp, idx, n - 1)[::-1])[::-1]
        end_val = np.minimum.accumulate(
            np.where(last_of_val, idx, n - 1)[::-1])[::-1]
        del rev
    n_grp = end_grp - grp_start + 1
    rnk = first_eq - grp_start + 1
    cnt_le = end_val - grp_start + 1
    prk = np.where(n_grp > 1,
                   (rnk - 1) * 1_000_000 // np.maximum(n_grp - 1, 1), 0)
    cume = cnt_le * 1_000_000 // n_grp
    return pd.DataFrame({
        "event_id": df["event_id"].to_numpy(),
        key_col: g, "v_micro": vm,
        "prk_micro": prk.astype(np.int64),
        "cume_micro": cume.astype(np.int64)})

"""Vectorized hash exchange — a key-co-locating shuffle built on raw Ray
tasks, for high-cardinality grouped reductions.

Why not ``Dataset.groupby().aggregate()``: Ray Data 2.49's sort-based
aggregate pays per-GROUP Python cost in the reduce stage — measured here at
~14 s for 90k rows / 75k groups on 32 CPUs (and *worse* with fewer blocks:
41 s at 8 blocks), versus <1 s for the same reduction expressed as a
vectorized pandas/Arrow groupby. For key domains that scale with the data
(per-host counts, winner-per-key dedup, LSH bucket membership) that cost is
the difference between an engine and a demo.

Shape (classic MR exchange, expressed in Ray):

1. ``ds.to_arrow_refs()`` — executes the upstream pipeline; block refs
   stay in the object store (NO driver pull).
2. One split task per block: vectorized ``hash(key) % P`` partition
   assignment (``pd.util.hash_pandas_object`` — deterministic, any key
   dtype mix), returning P sub-tables per block.
3. One reduce task per partition: concat its N sub-tables (all rows of
   its key range, co-located) and apply the caller's VECTORIZED reduce
   (a pandas groupby / drop_duplicates / pa.TableGroupBy — never a
   per-group Python call).
4. ``rd.from_arrow_refs`` wraps the P reduced blocks back into a Dataset,
   so downstream stages keep streaming. The driver only ever holds
   ObjectRefs.

Scale notes: P should track cluster width (defaults to cluster CPUs).
The exchange creates N x P sub-objects; with Ray Data's ~128 MiB target
blocks a 100 TB input is ~10^6 blocks, so at P=10^3 the driver would hold
10^9 refs — beyond that scale, run the exchange hierarchically (exchange
within node-sized groups of blocks first, then exchange the ~P x groups
partials; both rounds are this same function). Skewed keys: a single hot
key lands one partition; salt upstream (the crawl loop's hot-host
splitting) before exchanging.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd


def _split_by_hash(table: pa.Table, keys: list[str], P: int) -> list[pa.Table]:
    """Vectorized partition split of one block: list of P sub-tables."""
    if table.num_rows == 0:
        return [table] * P
    df = table.select(keys).to_pandas()
    h = pd.util.hash_pandas_object(df, index=False).to_numpy()
    part = (h % np.uint64(P)).astype(np.int64)
    order = np.argsort(part, kind="stable")
    sorted_parts = part[order]
    bounds = np.searchsorted(sorted_parts, np.arange(P + 1))
    taken = table.take(pa.array(order, pa.int64()))
    return [taken.slice(bounds[p], bounds[p + 1] - bounds[p])
            for p in range(P)]


_FLAT_REF_BUDGET = 32_768  # max N x P sub-objects a flat exchange may create
_GROUP_SIZE = 64           # default round-1 group width for the 2-round path

# Pin budget for materialize_if_small, in INPUT bytes (on-disk parquet —
# a conservative proxy; decompressed Arrow is typically 2-5x larger).
_PIN_BUDGET_BYTES = 2 << 30


def materialize_if_small(ds: rd.Dataset, est_bytes: int | None = None,
                         budget_bytes: int | None = None) -> rd.Dataset:
    """Size-gated lineage pinning for multi-consumer datasets.

    A Ray Dataset consumed twice re-executes its lineage per consumer;
    ``.materialize()`` avoids that but pins every block in the object
    store for the dataset's whole lifetime — at 100 TB that trades a
    cheap re-run of a PRUNED PARQUET SCAN for object-store spill churn
    on the entire corpus. This gates the pin the way ``auto_join`` gates
    broadcast: materialize only when the input is estimated under
    ``budget_bytes`` (default 2 GiB of on-disk input); above it, return
    the lazy dataset so each consumer streams the scan again.

    ``est_bytes``: caller-supplied input-size estimate (e.g. the parquet
    file size — required when the lineage has maps, since
    ``input_files()`` only reports on an un-mapped read). When no
    estimate is available the dataset is pinned (the pre-gate behavior);
    callers on fact tables should always pass one."""
    budget = _PIN_BUDGET_BYTES if budget_bytes is None else budget_bytes
    if est_bytes is None:
        try:
            import os
            files = ds.input_files()
            est_bytes = (sum(os.path.getsize(f) for f in files)
                         if files else None)
        except Exception:
            est_bytes = None
    if est_bytes is not None and est_bytes > budget:
        return ds
    return ds.materialize()


def _reduce(fn: Callable[[pd.DataFrame], pd.DataFrame],
            *tables: pa.Table) -> pa.Table:
    full = pa.concat_tables([t for t in tables if t.num_rows] or tables[:1])
    out = fn(full.to_pandas())
    return pa.Table.from_pandas(out, preserve_index=False)


def _concat_blocks(*tables: pa.Table) -> pa.Table:
    """Ref-count compaction: concat a partition's sub-tables, no reduce."""
    return pa.concat_tables(
        [t for t in tables if t.num_rows] or tables[:1]).combine_chunks()


def _compact_refs(refs: list, keys: list[str], P: int, group_size: int,
                  target: int) -> list:
    """Shrink a block-ref list to <= ``target`` refs with concat-only
    group-local exchanges (each round: groups of ``group_size`` blocks ->
    P key-partitioned concatenated blocks, >= 2x fewer refs since
    group_size >= 2P). Key-hash partitioning is semantics-neutral here —
    the downstream flat exchange re-splits. ``target`` is the side's OWN
    allowance (callers split the joint budget), so one side never
    over-compacts — shipping its whole payload through extra rounds —
    just because the other side is large."""
    split = ray.remote(num_returns=P)(_split_by_hash)
    cat = ray.remote(_concat_blocks)
    target = max(target, P)  # a round can never produce fewer than P
    while len(refs) > target:
        n_next = -(-len(refs) // group_size) * P
        if n_next >= len(refs):  # can't shrink further with these params
            break
        nxt = []
        for g in range(0, len(refs), group_size):
            subs = [split.remote(r, keys, P) for r in refs[g:g + group_size]]
            nxt.extend(cat.remote(*[s[p] for s in subs]) for p in range(P))
        refs = nxt
    return refs


def _pairwise_concat(refs: list, P: int) -> list:
    """Budget fallback for short-but-over-budget ref lists (len <= one
    compaction group yet len x P exceeds the sub-object budget, e.g.
    huge P): halve the ref count by concatenating neighbours until the
    flat fan-out fits. Block size doubles per round — acceptable here
    because this path only triggers for FEW blocks."""
    cat = ray.remote(_concat_blocks)
    while len(refs) * P > _FLAT_REF_BUDGET and len(refs) >= max(P, 2) * 2:
        refs = [cat.remote(*refs[i:i + 2])
                for i in range(0, len(refs), 2)]
    return refs


def _schema_empty_refs(ds: rd.Dataset) -> list | None:
    """One ray.put ref to a schema-bearing empty Arrow table for a
    zero-block Dataset, or None if the schema is unknowable."""
    sch = ds.schema(fetch_if_missing=True)
    if sch is None:
        return None
    pa_sch = getattr(sch, "base_schema", None) \
        or pa.schema(list(zip(sch.names, sch.types)))
    return [ray.put(pa_sch.empty_table())]


def _repair_null_keys(t: pa.Table, keys: list[str],
                      other: pa.Table, other_keys: list[str]) -> pa.Table:
    """An all-empty side may carry null-typed columns (Ray's empty-block
    schema gotcha); Acero rejects null-typed key AND payload fields, so
    repair every null column of an empty side: keys borrow the other
    side's key type, payload columns recover their dtype from the block's
    pandas schema metadata when present (int64/string as the last resort
    — output is empty either way, only the type must be joinable)."""
    if t.num_rows:
        return t
    key_src = dict(zip(keys, other_keys))
    pandas_types: dict[str, str] = {}
    meta = (t.schema.metadata or {}).get(b"pandas")
    if meta:  # empty-from_pandas blocks keep the true dtypes here
        import json
        pandas_types = {c["name"]: c["numpy_type"]
                        for c in json.loads(meta).get("columns", [])
                        if c.get("name")}
    for i, f in enumerate(t.schema):
        if not pa.types.is_null(f.type):
            continue
        if f.name in key_src:
            ot = other.schema.field(key_src[f.name]).type
        else:
            try:
                ot = pa.from_numpy_dtype(np.dtype(pandas_types[f.name]))
            except Exception:
                ot = pa.string() if pandas_types.get(f.name) == "object" \
                    else pa.int64()
        if pa.types.is_null(ot):
            ot = pa.int64()
        t = t.set_column(i, f.name, t.column(f.name).cast(ot))
    return t


def _join_reduce(left_keys: list[str], right_keys: list[str], how: str,
                 n_left: int, *tables: pa.Table,
                 reduce_fn=None) -> pa.Table:
    """Join one hash partition; optionally apply ``reduce_fn`` (pandas in
    /pandas out) to the joined partition IN the join task — every row of
    a join key lives in this partition, so a grouped reduce keyed by the
    join key is complete here and the usual post-join exchange is free."""
    out = _join_core(left_keys, right_keys, how, n_left, *tables)
    if reduce_fn is not None:
        out = pa.Table.from_pandas(reduce_fn(out.to_pandas()),
                                   preserve_index=False)
    return out


def _join_core(left_keys: list[str], right_keys: list[str], how: str,
               n_left: int, *tables: pa.Table) -> pa.Table:
    lts, rts = tables[:n_left], tables[n_left:]
    left = pa.concat_tables([t for t in lts if t.num_rows] or lts[:1])
    right = pa.concat_tables([t for t in rts if t.num_rows] or rts[:1])
    # A filtered-to-empty Dataset loses its schema entirely (column-less
    # blocks, ds.schema() is None) — the other side's columns are then
    # unknowable, so degrade to the best-defined result per join type
    # (output misses the schema-less side's columns; rows are correct).
    if not right.num_columns and not right.num_rows:
        if how in ("left outer", "left anti", "full outer"):
            return left
        if how.startswith("right"):
            return right
        return left.slice(0, 0)
    if not left.num_columns and not left.num_rows:
        if how in ("right outer", "right anti", "full outer"):
            return right
        if how.startswith("left"):
            return left
        return right.slice(0, 0)
    left = _repair_null_keys(left, left_keys, right, right_keys)
    right = _repair_null_keys(right, right_keys, left, left_keys)
    return left.join(right, keys=left_keys, right_keys=right_keys,
                     join_type=how)


def hash_join(left: rd.Dataset, right: rd.Dataset, on: list[str],
              right_on: list[str] | None = None, how: str = "inner",
              num_partitions: int | None = None,
              reduce_fn=None) -> rd.Dataset:
    """Large-large join as the same hash exchange: both sides split by
    identical key hashes (values only — column names don't enter
    ``hash_pandas_object``), each partition joined with Acero
    (``pa.Table.join``, C++ hash join). Replaces ``Dataset.join`` for the
    same reason grouped_shuffle replaces ``groupby().aggregate()``: the
    native operator spins a per-call aggregator actor pool whose fixed
    cost dominates at any scale a single query sees, while this exchange
    is plain tasks over object-store refs.

    ``reduce_fn`` (optional, pandas in/pandas out) runs on each JOINED
    partition inside the join task. Because the partition holds every
    row of its join keys, a grouped reduce keyed by the join key fuses
    here for free — join + grouped_shuffle collapse into ONE exchange
    (the reuse-the-partitioning-key discipline)."""
    right_on = right_on or on
    lrefs = left.to_arrow_refs()
    rrefs = right.to_arrow_refs()
    if not lrefs or not rrefs:
        # A zero-block side must still flow through the reduce so outer /
        # anti semantics and the combined output schema hold (a bare
        # "return the other side" would drop left rows from a left-outer
        # join with an empty right, and lose the other side's columns):
        # synthesize ONE schema-bearing empty block, as asof_join does.
        lrefs = lrefs or _schema_empty_refs(left)
        rrefs = rrefs or _schema_empty_refs(right)
        if lrefs is None or rrefs is None:  # schema unrecoverable
            return left if not left.to_arrow_refs() else right
    P = num_partitions or max(2, int(ray.cluster_resources().get("CPU", 8)))
    gs = max(_GROUP_SIZE, 2 * P)
    if (len(lrefs) + len(rrefs)) * P > _FLAT_REF_BUDGET:
        # same ref-budget guard as grouped_shuffle: compact each side's
        # blocks with concat-only group-local exchanges (>=2x fewer refs
        # per round, semantics untouched) until the flat join's
        # (N_l + N_r) x P sub-object fan-out fits the budget. Each side
        # gets its own allowance (half the budget, or the slack the other
        # side leaves) so a large right side can't force the left through
        # pointless extra full-data rounds.
        half = _FLAT_REF_BUDGET // (2 * P)
        l_target = max(_FLAT_REF_BUDGET // P - len(rrefs), half)
        lrefs = _compact_refs(lrefs, on, P, gs, l_target)
        rrefs = _compact_refs(rrefs, right_on, P, gs,
                              _FLAT_REF_BUDGET // P - len(lrefs))
        lrefs = _pairwise_concat(lrefs, P)
        rrefs = _pairwise_concat(rrefs, P)
    joinr = ray.remote(_join_reduce)
    if P == 1:  # no exchange needed — join all blocks in one task
        return rd.from_arrow_refs(
            [joinr.remote(on, right_on, how, len(lrefs), *lrefs, *rrefs,
                          reduce_fn=reduce_fn)])
    split = ray.remote(num_returns=P)(_split_by_hash)
    ls = [split.remote(r, on, P) for r in lrefs]
    rs = [split.remote(r, right_on, P) for r in rrefs]
    out = [joinr.remote(on, right_on, how, len(ls),
                        *[l[p] for l in ls], *[r[p] for r in rs],
                        reduce_fn=reduce_fn)
           for p in range(P)]
    return rd.from_arrow_refs(out)


def _asof_reduce(lby: list[str], rby: list[str], lon: str, ron: str,
                 direction: str, n_left: int, *tables: pa.Table) -> pa.Table:
    lts, rts = tables[:n_left], tables[n_left:]
    left = pa.concat_tables([t for t in lts if t.num_rows] or lts[:1]).to_pandas()
    right = pa.concat_tables([t for t in rts if t.num_rows] or rts[:1]).to_pandas()
    # An empty side may carry null-typed (object) columns (e.g. Ray
    # from_pandas of an empty frame); merge_asof requires matching numeric
    # dtypes, so borrow the non-empty side's dtypes for the join columns.
    if not len(right) and len(left):
        right = right.astype({ron: left[lon].dtype,
                              **{rb: left[lb].dtype
                                 for lb, rb in zip(lby, rby)}})
    elif not len(left) and len(right):
        left = left.astype({lon: right[ron].dtype,
                            **{lb: right[rb].dtype
                               for lb, rb in zip(lby, rby)}})
    elif not len(left) and not len(right):
        cols = dict(left.items())
        cols.update((c, v) for c, v in right.items() if c not in cols)
        return pa.Table.from_pandas(pd.DataFrame(cols), preserve_index=False)
    # merge_asof needs GLOBAL sort by the on-column (by-groups are handled
    # internally); stable so equal-time rows keep input order
    left = left.sort_values(lon, kind="stable")
    right = right.sort_values(ron, kind="stable")
    out = pd.merge_asof(left, right, left_on=lon, right_on=ron,
                        left_by=lby, right_by=rby, direction=direction)
    out = out[out[ron].notna()]  # inner semantics: unmatched left rows drop
    return pa.Table.from_pandas(out, preserve_index=False)


def asof_join(left: rd.Dataset, right: rd.Dataset, left_by: list[str],
              right_by: list[str], left_on: str, right_on: str,
              direction: str = "backward",
              num_partitions: int | None = None) -> rd.Dataset:
    """As-of join (nearest prior/following ``right_on`` per ``left_on``,
    within equal ``by`` keys) — an operator Ray Data lacks. Same hash
    exchange as :func:`hash_join` on the by-keys (values-only hashing, so
    differently-named by-columns co-locate), then a vectorized
    ``pd.merge_asof`` per partition. Inner semantics: left rows with no
    match drop.

    Partitioning assumption (documented per the custom-operator contract):
    correctness requires only that all rows of one by-key land in one
    partition — the exchange guarantees it; time ranges need NOT be
    partition-aligned. Ties in the right side at the same (by, on) value
    resolve to the last row in sorted order — pre-aggregate the right side
    to unique (by, on) pairs for deterministic output."""
    right_by = right_by or left_by
    lrefs, rrefs = left.to_arrow_refs(), right.to_arrow_refs()
    if not lrefs:
        return left
    P = num_partitions or max(2, int(ray.cluster_resources().get("CPU", 8)))
    reducer = ray.remote(_asof_reduce)
    if not rrefs:  # schema-bearing empty right block so the reduce runs
        sch = right.schema()
        pa_sch = getattr(sch, "base_schema", None) \
            or pa.schema(list(zip(sch.names, sch.types)))
        rrefs = [ray.put(pa_sch.empty_table())]
    if P == 1:
        return rd.from_arrow_refs(
            [reducer.remote(left_by, right_by, left_on, right_on,
                            direction, len(lrefs), *lrefs, *rrefs)])
    split = ray.remote(num_returns=P)(_split_by_hash)
    ls = [split.remote(r, left_by, P) for r in lrefs]
    rs = [split.remote(r, right_by, P) for r in rrefs]
    out = [reducer.remote(left_by, right_by, left_on, right_on, direction,
                          len(ls), *[l[p] for l in ls], *[r[p] for r in rs])
           for p in range(P)]
    return rd.from_arrow_refs(out)


def grouped_shuffle(ds: rd.Dataset, keys: list[str],
                    reduce_fn: Callable[[pd.DataFrame], pd.DataFrame],
                    num_partitions: int | None = None) -> rd.Dataset:
    """Co-locate rows by ``keys`` and apply a vectorized per-partition
    reduce. ``reduce_fn`` sees every row of its key range in one pandas
    DataFrame (multiple keys per partition — it must group internally,
    e.g. ``df.groupby(keys).agg(...)`` / ``drop_duplicates``)."""
    refs = ds.to_arrow_refs()
    if not refs:
        return ds
    P = num_partitions or max(2, int(ray.cluster_resources().get("CPU", 8)))
    gs = max(_GROUP_SIZE, 2 * P)  # guarantees >=2x block shrink per round
    if len(refs) * P > _FLAT_REF_BUDGET:
        if len(refs) > gs:
            # the flat exchange would create N x P sub-objects beyond the
            # driver/scheduler ref budget — take the two-round path with
            # a concat-only (semantics-preserving) first round
            return grouped_shuffle_hierarchical(
                rd.from_arrow_refs(refs), keys, reduce_fn,
                group_size=gs, num_partitions=P, reapply=False)
        # few blocks but huge P (len <= group_size yet len x P over
        # budget): halve refs by neighbour concat until the fan-out fits
        refs = _pairwise_concat(refs, P)
    reduce_t = ray.remote(_reduce)
    if P == 1:  # no exchange needed — reduce all blocks in one task
        return rd.from_arrow_refs([reduce_t.remote(reduce_fn, *refs)])
    split = ray.remote(num_returns=P)(_split_by_hash)
    subs = [split.remote(ref, keys, P) for ref in refs]
    out = [reduce_t.remote(reduce_fn, *[s[p] for s in subs])
           for p in range(P)]
    return rd.from_arrow_refs(out)


def _expand_ranges(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Concatenate [start, start+count) index ranges, vectorized."""
    cts = counts.astype(np.int64)
    total = int(cts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    offs = np.repeat(np.cumsum(cts) - cts, cts)
    within = np.arange(total, dtype=np.int64) - offs
    return np.repeat(starts.astype(np.int64), cts) + within


def _range_reduce(val_col: str, lo_col: str, hi_col: str, width: float,
                  n_left: int, *tables: pa.Table) -> pa.Table:
    lts, rts = tables[:n_left], tables[n_left:]
    left = pa.concat_tables([t for t in lts if t.num_rows] or lts[:1]).to_pandas()
    right = pa.concat_tables([t for t in rts if t.num_rows] or rts[:1]).to_pandas()
    lcols = [c for c in left.columns if c != "__bkt"]
    rcols = [c for c in right.columns if c not in ("__bkt", "__lo_c")]
    if not len(left) or not len(right):
        return pa.Table.from_pandas(
            pd.concat([left[lcols].iloc[:0], right[rcols].iloc[:0]], axis=1),
            preserve_index=False)
    # __lo_c values of bucket b lie in [b*W, (b+1)*W): one global sort by
    # __lo_c IS bucket-major order, so per-row candidate ranges are two
    # vectorized searchsorteds — no per-bucket loop.
    right = right.sort_values("__lo_c", kind="stable").reset_index(drop=True)
    lo_c = right["__lo_c"].to_numpy()
    hi = right[hi_col].to_numpy()
    x = left[val_col].to_numpy()
    bkt = left["__bkt"].to_numpy()
    starts = np.searchsorted(lo_c, bkt * width, side="left")
    ends = np.searchsorted(lo_c, x, side="right")
    counts = np.maximum(ends - starts, 0)
    ridx = _expand_ranges(starts, counts)
    lidx = np.repeat(np.arange(len(left), dtype=np.int64), counts)
    keep = hi[ridx] >= x[lidx]
    out = pd.concat([left[lcols].iloc[lidx[keep]].reset_index(drop=True),
                     right[rcols].iloc[ridx[keep]].reset_index(drop=True)],
                    axis=1)
    return pa.Table.from_pandas(out, preserve_index=False)


def range_join_broadcast(left: rd.Dataset, right: pd.DataFrame, val_col: str,
                         lo_col: str, hi_col: str) -> rd.Dataset:
    """Interval join with a SMALL-BY-CONTRACT right side: the intervals
    sort once on the driver, broadcast once via ray.put, and every left
    batch resolves containment with two searchsorteds against the sorted
    interval starts — zero shuffles, the streaming scan shape. Use this
    when the interval table is a dimension (rate bands, SLA tiers);
    ``range_join`` is the large-large exchange path. Semantics identical:
    inner join on lo <= val <= hi, both ends inclusive.

    Correctness + cost of the scan: with intervals sorted by lo, a match
    for x needs lo <= x AND hi >= x; since hi - lo <= max_width, every
    match also has lo >= x - max_width. Two searchsorteds bound the
    candidate window [x - max_width, x] in lo-order, then hi >= x filters
    exactly. Per-probe work is O(intervals within max_width of x) — the
    local interval DENSITY, not the whole prefix (a prefix expansion is
    O(n_intervals) per probe and went 100x superlinear on a 10x-denser
    dimension in the sf1 scale-stress). One pathologically wide interval
    widens the window for everyone; that skew would call for splitting
    wide intervals into width-capped segments, not needed at dimension
    cardinality."""
    right = right.sort_values(lo_col, kind="stable").reset_index(drop=True)
    lo = right[lo_col].to_numpy().astype(np.float64)
    hi = right[hi_col].to_numpy().astype(np.float64)
    max_w = float(np.max(hi - lo)) if len(lo) else 0.0
    rref = ray.put((lo, hi, max_w,
                    pa.Table.from_pandas(right, preserve_index=False)))

    def probe(t: pa.Table) -> pa.Table:
        lo_b, hi_b, w_b, rtab = ray.get(rref)
        x = t.column(val_col).to_numpy(zero_copy_only=False).astype(np.float64)
        starts = np.searchsorted(lo_b, x - w_b, side="left")
        ends = np.searchsorted(lo_b, x, side="right")
        counts = np.maximum(ends - starts, 0)
        ridx = _expand_ranges(starts, counts)
        lidx = np.repeat(np.arange(len(x), dtype=np.int64), counts)
        keep = hi_b[ridx] >= x[lidx]
        ltab = t.take(pa.array(lidx[keep], pa.int64()))
        rsel = rtab.take(pa.array(ridx[keep], pa.int64()))
        for name in rsel.column_names:
            ltab = ltab.append_column(name, rsel.column(name))
        return ltab

    return left.map_batches(probe, batch_format="pyarrow")


def range_join(left: rd.Dataset, right: rd.Dataset, val_col: str,
               lo_col: str, hi_col: str, bucket_width: float,
               num_partitions: int | None = None) -> rd.Dataset:
    """Interval (range) join — inner join of left rows whose ``val_col``
    falls in [``lo_col``, ``hi_col``] of a right row (both ends inclusive);
    another operator Ray Data lacks.

    Plan: left rows key to bucket floor(x/W); right intervals REPLICATE to
    every bucket they cover, each copy carrying a clipped start
    ``__lo_c = max(lo, bucket*W)``; one hash exchange on the bucket
    co-locates probes with every interval that can contain them (exact for
    ANY ``bucket_width`` — an interval covering x always covers x's
    bucket). In the partition reduce the containment scan is two
    searchsorteds + a vectorized range expansion.

    ``bucket_width`` tunes cost, not correctness: replication factor is
    ~1 + interval_width/W, while probe-side candidate count grows with W —
    set W near the typical interval width. Values must be numeric."""
    W = float(bucket_width)

    def add_bucket(t: pa.Table) -> pa.Table:
        x = t.column(val_col).to_numpy(zero_copy_only=False).astype(np.float64)
        return t.append_column(
            "__bkt", pa.array(np.floor(x / W), pa.float64()))

    def replicate(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        lo = df[lo_col].to_numpy().astype(np.float64)
        hi = df[hi_col].to_numpy().astype(np.float64)
        blo = np.floor(lo / W).astype(np.int64)
        counts = (np.floor(hi / W).astype(np.int64) - blo + 1)
        idx = np.repeat(np.arange(len(df), dtype=np.int64), counts)
        bkt = _expand_ranges(blo, counts).astype(np.float64)
        out = df.iloc[idx].reset_index(drop=True)
        out["__bkt"] = bkt
        out["__lo_c"] = np.maximum(lo[idx], bkt * W)
        return pa.Table.from_pandas(out, preserve_index=False)

    lrefs = left.map_batches(add_bucket, batch_format="pyarrow").to_arrow_refs()
    rrefs = right.map_batches(replicate, batch_format="pyarrow").to_arrow_refs()
    if not lrefs:
        return left
    P = num_partitions or max(2, int(ray.cluster_resources().get("CPU", 8)))
    reducer = ray.remote(_range_reduce)
    if not rrefs:  # schema-bearing empty right block so the reduce runs
        sch = right.schema()
        pa_sch = getattr(sch, "base_schema", None) \
            or pa.schema(list(zip(sch.names, sch.types)))
        pa_sch = pa_sch.append(pa.field("__bkt", pa.float64()))
        pa_sch = pa_sch.append(pa.field("__lo_c", pa.float64()))
        rrefs = [ray.put(pa_sch.empty_table())]
    if P == 1:
        return rd.from_arrow_refs(
            [reducer.remote(val_col, lo_col, hi_col, W,
                            len(lrefs), *lrefs, *rrefs)])
    split = ray.remote(num_returns=P)(_split_by_hash)
    ls = [split.remote(r, ["__bkt"], P) for r in lrefs]
    rs = [split.remote(r, ["__bkt"], P) for r in rrefs]
    out = [reducer.remote(val_col, lo_col, hi_col, W, len(ls),
                          *[l[p] for l in ls], *[r[p] for r in rs])
           for p in range(P)]
    return rd.from_arrow_refs(out)


def grouped_shuffle_hierarchical(ds: rd.Dataset, keys: list[str],
                                 reduce_fn: Callable[[pd.DataFrame], pd.DataFrame],
                                 group_size: int = 64,
                                 num_partitions: int | None = None,
                                 reapply: bool = True) -> rd.Dataset:
    """Two-round :func:`grouped_shuffle` for block counts where a flat
    exchange's N x P sub-object fan-out would swamp the driver/scheduler
    (the module docstring's 10^6-block case: ~10^9 refs at P=10^3).
    ``grouped_shuffle`` engages this path AUTOMATICALLY (with
    ``reapply=False``) once N x P exceeds ``_FLAT_REF_BUDGET``.

    Round 1 exchanges WITHIN groups of ``group_size`` blocks (fan-out
    group_size x P per group, scheduled independently); round 2 exchanges
    the per-group partials (n_groups x P). Total refs
    ~ N x P / group_size + n_groups x P — tunable orders of magnitude below
    the flat exchange.

    ``reapply=True`` applies ``reduce_fn`` in BOTH rounds — round 1 then
    shrinks data, but ``reduce_fn`` must be REAPPLICABLE: a semigroup on
    its own output (true for groupby aggregations of sum/count/min/max,
    winner-per-key dedup, drop_duplicates), since each key's rows are
    reduced once per round; count-style reduces must be expressed as sums
    of partial counts, exactly the ``partial_groupby_agg`` combiner shape.
    ``reapply=False`` makes round 1 CONCAT-ONLY (pure ref-count
    compaction, identical semantics to the flat exchange for ANY
    reduce_fn) and applies ``reduce_fn`` exactly once in round 2."""
    refs = ds.to_arrow_refs()
    if len(refs) <= group_size:
        return grouped_shuffle(ds, keys, reduce_fn, num_partitions)
    P = num_partitions or max(2, int(ray.cluster_resources().get("CPU", 8)))
    split = ray.remote(num_returns=P)(_split_by_hash)
    round1 = ray.remote(_reduce) if reapply else ray.remote(_concat_blocks)
    partials = []
    for g in range(0, len(refs), group_size):
        subs = [split.remote(r, keys, P) for r in refs[g:g + group_size]]
        partials.extend(
            (round1.remote(reduce_fn, *[s[p] for s in subs]) if reapply
             else round1.remote(*[s[p] for s in subs]))
            for p in range(P))
    return grouped_shuffle(rd.from_arrow_refs(partials), keys, reduce_fn, P)


def detect_hot_keys(ds: rd.Dataset, key: str, hot_threshold: int) -> np.ndarray:
    """Two-pass exact hot-key detection with bounded driver state.

    Pass 1: each block emits keys that are LOCALLY frequent (count >
    hot_threshold / n_blocks) — a key with global count > hot_threshold
    must exceed that local bar in at least one block (pigeonhole), so the
    candidate set has full recall while staying tiny (bounded by
    n_blocks x rows/local_bar, not by distinct keys). Pass 2: exact
    global counts for the candidates only (per-block masked value_counts,
    summed on the driver — O(candidates) rows per block). Returns the
    sorted array of keys with exact global count > hot_threshold.

    Degenerate regime: with more blocks than the threshold the local bar
    floor(T/B) is 0 and EVERY present key would become a candidate —
    O(distinct keys) driver state, voiding the bound above. That regime
    is repaired below by concat-compacting blocks until B <= T/2 (the
    pigeonhole argument holds at any granularity, so exactness is
    preserved); compacted blocks are g x larger, so extremely small
    thresholds over huge corpora should prefer a sketch-based census
    (stages/sketch.py CountMinSketch) over this exact pass."""
    refs = ds.to_arrow_refs()
    if len(refs) > max(1, hot_threshold // 2):
        # keep the local bar >= 2: group-concat refs so B' <= T/2
        target = max(1, hot_threshold // 2)
        g = -(-len(refs) // target)  # ceil
        cat = ray.remote(_concat_blocks)
        refs = [cat.remote(*refs[i:i + g])
                for i in range(0, len(refs), g)]
    # floor(T/B) — NOT clamped to 1: clamping would silently miss a key
    # spread one row per block, breaking the pigeonhole guarantee below
    local_bar = hot_threshold // max(1, len(refs))

    def local_heavy(t: pa.Table) -> np.ndarray:
        v, c = np.unique(t.column(key).to_numpy(zero_copy_only=False),
                         return_counts=True)
        return v[c > local_bar]

    cands = ray.get([ray.remote(local_heavy).remote(r) for r in refs])
    cand = np.unique(np.concatenate(cands)) if cands else np.array([])
    if not len(cand):
        return cand  # dtype-generic (int or string keys)
    cand_ref = ray.put(np.sort(cand))

    def cand_counts(t: pa.Table) -> np.ndarray:
        ks = ray.get(cand_ref)
        v = t.column(key).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(ks, v)
        idx[idx == len(ks)] = 0
        hit = ks[idx] == v
        return np.bincount(idx[hit], minlength=len(ks)).astype(np.int64)

    totals = sum(ray.get([ray.remote(cand_counts).remote(r) for r in refs]))
    return np.sort(cand)[totals > hot_threshold]


def skew_hybrid_join(left: rd.Dataset, right: rd.Dataset, key: str,
                     hot_threshold: int = 100_000,
                     num_partitions: int | None = None,
                     left_est_bytes: int | None = None) -> rd.Dataset:
    """Skew-aware inner join (both sides share the key column name).

    A plain hash exchange sends ALL rows of a key to one partition — a
    single hot key (the crawl loop's mega-host, a null-ish default id,
    a power-law head URL) serializes the join no matter how wide the
    cluster. This hybrid routes around it: exact hot keys (global count >
    ``hot_threshold`` on the left, via ``detect_hot_keys``'s bounded
    two-pass) join via BROADCAST of the right side's hot slice — hot left
    rows never move, every task streams them against the replicated
    slice — while the cold remainder takes the standard hash exchange.
    Assumes the right side is dimension-like per key (bounded rows per
    hot key), the usual fact-dim skew case; the result is the exact union
    of both paths.
    """
    # left is consumed by the census AND both splits; right by the hot
    # slice AND the cold split. Pinning avoids lineage re-execution but
    # holds a fact side in the object store, so it is size-gated like
    # auto_join's broadcast: above the budget, the later consumers
    # re-execute the pruned scan while the census's refs stay transient.
    left = materialize_if_small(left, left_est_bytes)
    hot = detect_hot_keys(left, key, hot_threshold)
    rrefs = right.to_arrow_refs() if len(hot) else []
    if not len(hot) or not rrefs:
        # no skew — or an empty right side, where the hot path's slice
        # concat would have nothing to concat; hash_join synthesizes
        # schema-bearing empty blocks for both cases
        return hash_join(left, right, on=[key],
                         num_partitions=num_partitions)
    hot_ref = ray.put(np.sort(hot))

    def split(flag: bool):
        def f(t: pa.Table) -> pa.Table:
            ks = ray.get(hot_ref)
            v = t.column(key).to_numpy(zero_copy_only=False)
            idx = np.searchsorted(ks, v)
            idx[idx == len(ks)] = 0
            is_hot = ks[idx] == v
            return t.filter(pa.array(is_hot if flag else ~is_hot))
        return f

    # The right side's hot slice never lands on the driver: per-block
    # remote slices concat in ONE remote task and broadcast as a single
    # object-store ref that every hot-path task reads zero-copy.
    slice_hot = ray.remote(lambda r, f=split(True): f(r))
    right_hot_ref = ray.remote(_concat_blocks).remote(
        *[slice_hot.remote(rr) for rr in rrefs])

    def hot_join_batch(batch: pa.Table) -> pa.Table:
        return batch.join(ray.get(right_hot_ref), keys=[key],
                          join_type="inner")

    hot_joined = (left.map_batches(split(True), batch_format="pyarrow")
                  .map_batches(hot_join_batch, batch_format="pyarrow"))
    # cold path reuses the already-executed right blocks (dimension-like
    # by the documented contract, so the pin is bounded) — no re-execute
    right = rd.from_arrow_refs(rrefs)
    cold_joined = hash_join(
        left.map_batches(split(False), batch_format="pyarrow"),
        right.map_batches(split(False), batch_format="pyarrow"),
        on=[key], num_partitions=num_partitions)
    cols = sorted(set(hot_joined.schema().names))
    return (hot_joined.map_batches(lambda t: t.select(cols),
                                   batch_format="pyarrow")
            .union(cold_joined.map_batches(lambda t: t.select(cols),
                                           batch_format="pyarrow")))

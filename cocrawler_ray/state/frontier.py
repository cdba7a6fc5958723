"""Sharded URL frontier with per-host politeness (burrow/ratelimit).

Behavioral analogue of ``cocrawler/scheduler.py`` (get_work / work_done /
queue_work / requeue_work + the ridealong map): the reference holds one
global asyncio.PriorityQueue of (priority, rand, id) tuples and *burrows*
popped work whose host's crawl-delay has not elapsed. Our engine is
generation-based (SURVEY §2.9): politeness = **at most `budget` URLs per
host per generation**, so a hot host's surplus stays burrowed to the next
generation — the batch-mode image of the reference's wall-clock ratelimit
(the mapping is documented here as required by SURVEY §7 hard part (c)).

Each FrontierPartition owns the hosts with ``hash(host) % K == part``.
Storage is **columnar**: pending rows live in Arrow tables (appends are
O(1) buffer collects), and a drain concatenates + sorts ONCE with
``pyarrow.compute.sort_indices`` on ``(host, priority, rand, surt)`` —
C++ string sort — then takes each host's best ``budget`` rows with
vectorized range arithmetic. The previous per-row Python ``heapq`` push/
pop was the engine's largest remaining row-at-a-time hot loop (~µs × every
frontier row × twice). ``rand`` is the seeded splitmix64 of the surt,
replacing the reference's random.uniform tiebreak (SURVEY §2.6 O2), so the
drain order is the deterministic total order (priority, rand, surt) per
host regardless of append order.

Scale path (10^10 feasibility, SURVEY §4.3): when a partition exceeds
``spill_threshold`` rows, the worst half of each big host group is spilled
to a Parquet band on disk and reloaded lazily when the in-memory set
drains. Heads stay in RAM, tails on disk.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from cocrawler_ray import schemas

_COLS = ("surt", "url", "host", "priority", "rand", "depth", "retries", "seed_id")
_SORT_KEYS = [("host", "ascending"), ("priority", "ascending"),
              ("rand", "ascending"), ("surt", "ascending")]
_TYPES = {
    "surt": pa.string(), "url": pa.string(), "host": pa.string(),
    "priority": pa.int32(), "rand": pa.uint64(), "depth": pa.int32(),
    "retries": pa.int32(), "seed_id": pa.int64(),
}


def _as_table(rows: dict[str, np.ndarray] | pa.Table) -> pa.Table:
    if isinstance(rows, pa.Table):
        return rows.select(list(_COLS)).cast(
            pa.schema([pa.field(c, _TYPES[c]) for c in _COLS]))
    return pa.table({c: pa.array(np.asarray(rows[c]), _TYPES[c]) for c in _COLS})


class FrontierPartition:
    def __init__(self, part: int, spill_threshold: int = 2_000_000,
                 spill_dir: str | None = None):
        self.part = part
        self._chunks: list[pa.Table] = []   # unsorted pending appends
        self._sorted: pa.Table | None = None  # leftover from last drain (sorted)
        self.total = 0
        self.spill_threshold = spill_threshold
        self.spill_dir = Path(spill_dir) if spill_dir else None
        self.spilled_files: list[str] = []
        self.appended = 0
        self.drained = 0

    # -- queue_work ---------------------------------------------------------

    def append(self, rows: dict[str, np.ndarray] | pa.Table) -> int:
        """Add frontier rows (already deduped by the seen filter)."""
        t = _as_table(rows)
        if t.num_rows == 0:
            return 0
        self._chunks.append(t)
        self.total += t.num_rows
        self.appended += t.num_rows
        if self.spill_dir and self.total > self.spill_threshold:
            self._spill()
        return t.num_rows

    def requeue(self, rows: pa.Table, priority_penalty: int = 1) -> int:
        """Retry path (scheduler.py::requeue_work): bump retries, demote."""
        t = rows.select(list(_COLS))
        t = t.set_column(t.schema.get_field_index("retries"), "retries",
                         pc.add(t.column("retries"), 1))
        t = t.set_column(t.schema.get_field_index("priority"), "priority",
                         pc.cast(pc.add(t.column("priority"), priority_penalty),
                                 pa.int32()))
        return self.append(t)

    def _pending_sorted(self) -> pa.Table:
        """All pending rows, sorted by (host, priority, rand, surt)."""
        tabs = ([self._sorted] if self._sorted is not None else []) + self._chunks
        if not tabs:
            return _as_table({c: np.array([], dtype=object) if _TYPES[c] == pa.string()
                              else np.array([], dtype=np.int64) for c in _COLS})
        t = pa.concat_tables(tabs).combine_chunks() if len(tabs) > 1 else tabs[0]
        if len(tabs) > 1 or self._sorted is None:
            t = t.take(pc.sort_indices(t, sort_keys=_SORT_KEYS))
        self._chunks = []
        self._sorted = t
        return t

    # -- get_work (generation drain, politeness-gated) ----------------------

    def drain(self, gen: int, budget_per_host: int, max_rows: int | None = None,
              host_budgets: dict[str, int] | None = None) -> pa.Table:
        """Take up to `budget_per_host` best rows per host (deterministic
        (priority, rand, surt) order within each host); remainder stays
        burrowed. Output rows are host-grouped (hosts ascending).
        ``host_budgets`` overrides the budget for specific hosts (the
        Crawl-delay image — see module doc / ShardHost._host_delays)."""
        t = self._pending_sorted()
        n = t.num_rows
        if n == 0:
            return self._finish([], gen)
        hosts = t.column("host")
        # per-host group boundaries on the sorted table (vectorized)
        starts = np.flatnonzero(np.concatenate((
            [True], np.asarray(pc.not_equal(hosts.slice(1), hosts.slice(0, n - 1))))))
        ends = np.concatenate((starts[1:], [n]))
        budgets = budget_per_host
        if host_budgets:
            import pandas as pd
            head_hosts = pd.Series(np.asarray(hosts.take(
                pa.array(starts, pa.int64()))).astype(object))
            budgets = (head_hosts.map(host_budgets)
                       .fillna(budget_per_host).to_numpy()
                       .astype(np.int64))
        take_counts = np.minimum(ends - starts, budgets)
        idx = _ranges(starts, take_counts)
        out = t.take(pa.array(idx, pa.int64()))
        if max_rows is not None and out.num_rows > max_rows:
            # global cap: keep best by (priority, rand, surt); rest stays
            best = pc.sort_indices(out, sort_keys=_SORT_KEYS[1:])
            keep = best.slice(0, max_rows)
            rest_idx = np.asarray(best.slice(max_rows))
            idx_np = np.asarray(idx)
            leftover_mask = np.ones(n, dtype=bool)
            leftover_mask[idx_np] = False
            leftover_mask[idx_np[rest_idx]] = True
            out = out.take(keep)
            self._sorted = t.filter(pa.array(leftover_mask))
        else:
            mask = np.ones(n, dtype=bool)
            mask[np.asarray(idx)] = False
            self._sorted = t.filter(pa.array(mask))
        self.total = self._sorted.num_rows
        self.drained += out.num_rows
        self._maybe_unspill()
        return self._finish(out, gen)

    def _finish(self, out, gen: int) -> pa.Table:
        if not isinstance(out, pa.Table):
            out = _as_table({c: np.array([], dtype=object) for c in _COLS})
        n = out.num_rows
        return (out
                .append_column("gen", pa.array(np.full(n, gen, dtype=np.int32)))
                .append_column("part", pa.array(np.full(n, self.part, dtype=np.int32))))

    # -- introspection ------------------------------------------------------

    def ready_count(self) -> int:
        return self.total

    def host_counts(self) -> dict[str, int]:
        t = self._pending_sorted()
        vc = pc.value_counts(t.column("host"))
        return {str(v["values"]): int(v["counts"]) for v in vc.to_pylist()}

    def hot_hosts(self, threshold: int) -> dict[str, int]:
        """Hosts whose pending queue exceeds `threshold` (skew detection;
        north_rule 'hot-host splitting via groupby-count + repartition' —
        counts computed columnar instead of a per-gen shuffle)."""
        return {h: c for h, c in self.host_counts().items() if c > threshold}

    def is_empty(self) -> bool:
        return self.total == 0 and not self.spilled_files

    # -- cold-tail spill (scale path) ---------------------------------------

    def _spill(self) -> None:
        """Spill the worst half of every oversized host group to Parquet."""
        t = self._pending_sorted()
        n = t.num_rows
        if n == 0:
            return
        hosts = t.column("host")
        starts = np.flatnonzero(np.concatenate((
            [True], np.asarray(pc.not_equal(hosts.slice(1), hosts.slice(0, n - 1))))))
        ends = np.concatenate((starts[1:], [n]))
        counts = ends - starts
        big = counts >= 64
        if not big.any():
            return
        keep_counts = np.where(big, counts // 2, counts)
        keep_idx = _ranges(starts, keep_counts)
        mask = np.zeros(n, dtype=bool)
        mask[np.asarray(keep_idx)] = True
        spill_t = t.filter(pa.array(~mask))
        if spill_t.num_rows == 0:
            return
        self._sorted = t.filter(pa.array(mask))
        self.total = self._sorted.num_rows
        self.spill_dir.mkdir(parents=True, exist_ok=True)
        path = self.spill_dir / f"band-{self.part:04d}-{len(self.spilled_files):05d}.parquet"
        pq.write_table(self._finish(spill_t, gen=-1), path, compression="zstd")
        self.spilled_files.append(str(path))

    def _maybe_unspill(self) -> None:
        while self.spilled_files and self.total < self.spill_threshold // 4:
            path = self.spilled_files.pop()
            t = pq.read_table(path)
            Path(path).unlink()
            self.append(t)

    # -- checkpoint (replaces whole-state pickle of Crawler.save/load) ------

    def snapshot(self) -> pa.Table:
        t = self._finish(self._pending_sorted(), gen=-1)
        if self.spilled_files:
            # spilled cold-tail bands are part of the partition's state —
            # fold them into the snapshot so restore() is self-contained
            t = pa.concat_tables(
                [t] + [pq.read_table(p) for p in self.spilled_files])
        return schemas.validate(t, "frontier")

    def restore(self, table: pa.Table) -> None:
        """Restore from a folded snapshot (snapshot() already inlines any
        spilled bands, so the snapshot table IS the whole partition state).
        spilled_files is reset BEFORE append(): append() may legitimately
        re-spill the restored rows, and those new band files must be
        tracked, not clobbered."""
        self._chunks = []
        self._sorted = None
        self.total = 0
        self.spilled_files = []
        self.append(table)


def _ranges(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Concatenate [start, start+count) ranges — vectorized (no per-range
    Python loop)."""
    cts = counts.astype(np.int64)
    total = int(cts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    offs = np.repeat(np.cumsum(cts) - cts, cts)  # exclusive prefix, exploded
    within = np.arange(total, dtype=np.int64) - offs
    return np.repeat(starts.astype(np.int64), cts) + within


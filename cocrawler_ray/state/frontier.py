"""Sharded URL frontier with per-host politeness (burrow/ratelimit).

Behavioral analogue of ``cocrawler/scheduler.py`` (get_work / work_done /
queue_work / requeue_work + the ridealong map): the reference holds one
global asyncio.PriorityQueue of (priority, rand, id) tuples and *burrows*
popped work whose host's crawl-delay has not elapsed. Our engine is
generation-based (SURVEY §2.9): politeness = **at most `budget` URLs per
host per generation**, so a hot host's surplus stays burrowed to the next
generation — the batch-mode image of the reference's wall-clock ratelimit
(the mapping is documented here as required by SURVEY §7 hard part (c)).

Each FrontierPartition owns the hosts with ``hash(host) % K == part`` and
keeps one heap per host ordered by the deterministic total order
``(priority, rand, surt)`` (rand = seeded splitmix64 of surt, replacing the
reference's random.uniform tiebreak — SURVEY §2.6 O2).

Scale path (10^10 feasibility, SURVEY §4.3): when a partition exceeds
``spill_threshold`` rows, the worst (highest-priority-value) tail of each
big host queue is spilled to a Parquet band on disk and reloaded lazily
when the in-memory queue drains. Heads stay in RAM, tails on disk.
"""

from __future__ import annotations

import heapq
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from cocrawler_ray import schemas

# heap entry: (priority, rand, surt, url, depth, retries, seed_id)
Entry = tuple[int, int, str, str, int, int, int]


class FrontierPartition:
    def __init__(self, part: int, spill_threshold: int = 2_000_000,
                 spill_dir: str | None = None):
        self.part = part
        self.hosts: dict[str, list[Entry]] = {}
        self.total = 0
        self.spill_threshold = spill_threshold
        self.spill_dir = Path(spill_dir) if spill_dir else None
        self.spilled_files: list[str] = []
        self.appended = 0
        self.drained = 0

    # -- queue_work ---------------------------------------------------------

    def append(self, rows: dict[str, np.ndarray] | pa.Table) -> int:
        """Add frontier rows (already deduped by the seen filter)."""
        if isinstance(rows, pa.Table):
            rows = {c: rows.column(c).to_numpy(zero_copy_only=False) for c in rows.column_names}
        n = len(rows["surt"])
        hosts = self.hosts
        for i in range(n):
            e = (int(rows["priority"][i]), int(rows["rand"][i]), str(rows["surt"][i]),
                 str(rows["url"][i]), int(rows["depth"][i]), int(rows["retries"][i]),
                 int(rows["seed_id"][i]))
            heapq.heappush(hosts.setdefault(str(rows["host"][i]), []), e)
        self.total += n
        self.appended += n
        if self.spill_dir and self.total > self.spill_threshold:
            self._spill()
        return n

    def requeue(self, rows: pa.Table, priority_penalty: int = 1) -> int:
        """Retry path (scheduler.py::requeue_work): bump retries, demote."""
        cols = {c: rows.column(c).to_numpy(zero_copy_only=False) for c in rows.column_names}
        cols["retries"] = cols["retries"] + 1
        cols["priority"] = cols["priority"] + priority_penalty
        return self.append(cols)

    # -- get_work (generation drain, politeness-gated) ----------------------

    def drain(self, gen: int, budget_per_host: int, max_rows: int | None = None
              ) -> pa.Table:
        """Pop up to `budget_per_host` best entries per host (deterministic
        (priority, rand, surt) order); remainder stays burrowed."""
        out: list[tuple] = []
        for host in sorted(self.hosts):
            heap = self.hosts[host]
            take = min(budget_per_host, len(heap))
            for _ in range(take):
                p, r, surt, url, depth, retries, seed_id = heapq.heappop(heap)
                out.append((surt, url, host, p, r, depth, retries, seed_id))
            if not heap:
                del self.hosts[host]
        popped = len(out)
        if max_rows is not None and len(out) > max_rows:
            # global cap: keep best by (priority, rand, surt); rest re-queued
            out.sort(key=lambda t: (t[3], t[4], t[0]))
            for surt, url, host, p, r, depth, retries, seed_id in out[max_rows:]:
                heapq.heappush(self.hosts.setdefault(host, []),
                               (p, r, surt, url, depth, retries, seed_id))
            popped = max_rows  # the re-queued tail never left the partition
            out = out[:max_rows]
        self.total -= popped
        self.drained += len(out)
        self._maybe_unspill()
        return self._to_table(out, gen)

    def _to_table(self, rows: list[tuple], gen: int) -> pa.Table:
        n = len(rows)
        cols = list(zip(*rows)) if rows else [[]] * 8
        return pa.table({
            "surt": pa.array(cols[0], pa.string()),
            "url": pa.array(cols[1], pa.string()),
            "host": pa.array(cols[2], pa.string()),
            "priority": pa.array(np.array(cols[3], dtype=np.int32)),
            "rand": pa.array(np.array(cols[4], dtype=np.uint64)),
            "depth": pa.array(np.array(cols[5], dtype=np.int32)),
            "retries": pa.array(np.array(cols[6], dtype=np.int32)),
            "seed_id": pa.array(np.array(cols[7], dtype=np.int64)),
            "gen": pa.array(np.full(n, gen, dtype=np.int32)),
            "part": pa.array(np.full(n, self.part, dtype=np.int32)),
        })

    # -- introspection ------------------------------------------------------

    def ready_count(self) -> int:
        return self.total

    def host_counts(self) -> dict[str, int]:
        return {h: len(q) for h, q in self.hosts.items()}

    def hot_hosts(self, threshold: int) -> dict[str, int]:
        """Hosts whose pending queue exceeds `threshold` (skew detection;
        north_rule 'hot-host splitting via groupby-count + repartition' —
        counts maintained incrementally here instead of a per-gen shuffle)."""
        return {h: len(q) for h, q in self.hosts.items() if len(q) > threshold}

    def is_empty(self) -> bool:
        return self.total == 0 and not self.spilled_files

    # -- cold-tail spill (scale path) ---------------------------------------

    def _spill(self) -> None:
        """Spill the worst half of every oversized host queue to Parquet."""
        spill_rows: list[tuple] = []
        for host, heap in self.hosts.items():
            if len(heap) < 64:
                continue
            heap.sort()  # heap list -> fully sorted ascending (still a valid heap)
            keep = len(heap) // 2
            for p, r, surt, url, depth, retries, seed_id in heap[keep:]:
                spill_rows.append((surt, url, host, p, r, depth, retries, seed_id))
            del heap[keep:]
        if not spill_rows:
            return
        self.total -= len(spill_rows)
        t = self._to_table(spill_rows, gen=-1)
        self.spill_dir.mkdir(parents=True, exist_ok=True)
        path = self.spill_dir / f"band-{self.part:04d}-{len(self.spilled_files):05d}.parquet"
        pq.write_table(t, path, compression="zstd")
        self.spilled_files.append(str(path))

    def _maybe_unspill(self) -> None:
        while self.spilled_files and self.total < self.spill_threshold // 4:
            path = self.spilled_files.pop()
            t = pq.read_table(path)
            Path(path).unlink()
            self.total -= 0
            self.append(t)

    # -- checkpoint (replaces whole-state pickle of Crawler.save/load) ------

    def snapshot(self) -> pa.Table:
        rows: list[tuple] = []
        for host in sorted(self.hosts):
            for p, r, surt, url, depth, retries, seed_id in sorted(self.hosts[host]):
                rows.append((surt, url, host, p, r, depth, retries, seed_id))
        # spilled bands are already durable; snapshot carries their paths via
        # lineage rows written by the pipeline
        t = self._to_table(rows, gen=-1)
        return schemas.validate(t, "frontier")

    def restore(self, table: pa.Table, spilled_files: list[str] | None = None) -> None:
        self.hosts.clear()
        self.total = 0
        self.append(table)
        self.spilled_files = list(spilled_files or [])

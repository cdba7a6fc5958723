"""ShardHost — the actor process hosting a slice of every partitioned store.

Scale design (SURVEY §4.2/§4.3): the engine's *logical* partitioning is
fixed at K = ``num_parts`` (frontier/robots by hash(host)%K, seen by
hash(surt)%K) so results are identical on any hardware; the *physical*
actor count A is a resource knob (≈ one per CPU locally, ≈ per-node slots
on a cluster). Actor ``a`` hosts every logical partition with
``part % A == a``:

- ``FrontierPartition`` per owned host-partition (per-host politeness heaps)
- ``SeenPartition``     per owned surt-partition (cuckoo + exact shadow)
- one ``RobotsPartition``  (per-host TTL rule cache — host-keyed, any row
  this actor is routed can be answered locally)
- one ``FetcherPartition`` (web-table index / HTTP pool; zero-copy Arrow
  read of the ray.put broadcast tables)

This replaces four K-wide actor pools (4K processes) with A processes —
actor-process startup was the dominant cost of small jobs, and on a real
cluster A maps 1:1 to scheduling slots while K stays the stable shuffle
key-space. Peers are wired via ``set_peers`` so the seen-side finalize can
push frontier appends actor-to-actor without driver involvement.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from cocrawler_ray.hashing import hash64, host_partition, surt_partition
from cocrawler_ray.robots import parse_robots
from cocrawler_ray.stages.fetch import FetcherPartition
from cocrawler_ray.state.frontier import FrontierPartition
from cocrawler_ray.state.robots_actor import RobotsPartition
from cocrawler_ray.state.seen import SeenPartition


def url_paths(us) -> np.ndarray:
    """Path component of each URL — vectorized (RE2 over the Arrow column;
    the per-row Python split was a hot per-drained-URL loop). Accepts an
    Arrow array/chunked array or a Python list."""
    import pyarrow.compute as pc
    arr = us if isinstance(us, (pa.Array, pa.ChunkedArray)) else pa.array(us, pa.string())
    stripped = pc.replace_substring_regex(arr, pattern=r"^[a-z][a-z0-9+.-]*://[^/]*",
                                          replacement="")
    out = stripped.to_numpy(zero_copy_only=False).astype(object)
    out[out == ""] = "/"
    return out


class ShardHost:
    def __init__(self, actor_id: int, num_actors: int, num_parts: int,
                 robots_bodies: dict[str, str], user_agent: str,
                 web: pa.Table, web_html: pa.Table,
                 seen_capacity: int, exact_seen: bool,
                 spill_threshold: int, spill_dir: str,
                 transient_every: int = 0):
        self.actor_id = actor_id
        self.num_actors = num_actors
        self.num_parts = num_parts
        my_parts = [p for p in range(num_parts) if p % num_actors == actor_id]
        self.frontier = {p: FrontierPartition(p, spill_threshold, spill_dir)
                         for p in my_parts}
        self.seen = {p: SeenPartition(p, seen_capacity, exact_seen)
                     for p in my_parts}
        self.robots = RobotsPartition(actor_id, robots_bodies, 10, user_agent)
        # per-host Crawl-delay -> per-generation budget scale. One generation
        # is the politeness epoch of `budget_per_host` reference-seconds
        # (budget fetches at the default 1 req/s), so a delay-d host fits
        # floor(budget/d) fetches per gen, floored at 1 (frontier.py module
        # doc maps the reference's wall-clock burrow to gen budgets). Bodies
        # are static per job, so parse the few delay-bearing ones ONCE here;
        # the cheap substring scan skips the rest.
        self._host_delays: dict[str, float] = {}
        for h, body in robots_bodies.items():
            if body and "rawl-delay" in body:
                d = parse_robots(body).crawl_delay(user_agent)
                if d and d > 1.0:
                    self._host_delays[h] = d
        self.fetcher = FetcherPartition(actor_id, web, web_html, transient_every)
        self.peers: list | None = None
        self._outbox: dict[int, list] = {}  # target actor -> candidate bufs
        self._requeue_outbox: dict[int, list] = {}  # target actor -> 5xx rows

    def set_peers(self, handles: list) -> None:
        self.peers = handles

    # -- frontier ------------------------------------------------------------

    def ready_count(self) -> int:
        return sum(f.ready_count() for f in self.frontier.values())

    def drain_all(self, gen: int, budget_per_host: int,
                  max_rows_per_part: int | None = None) -> pa.Table:
        hb = ({h: max(1, int(budget_per_host // d))
               for h, d in self._host_delays.items()}
              if self._host_delays else None)
        tabs = [self.frontier[p].drain(gen, budget_per_host,
                                       max_rows_per_part, host_budgets=hb)
                for p in sorted(self.frontier)]
        return pa.concat_tables(tabs)

    def drain_chunks(self, gen: int, budget_per_host: int,
                     max_rows_per_part: int | None = None,
                     chunk_rows: int = 512):
        """Generator form of drain_all for ``num_returns="dynamic"``: yields
        ≤chunk_rows slices so every fetch batch becomes its own Ray Data
        block — parallelism tracks batch count, not actor count, and a
        hot-partition drain can't produce one giant straggler block."""
        t = self.drain_all(gen, budget_per_host, max_rows_per_part)
        for off in range(0, t.num_rows, chunk_rows):
            yield t.slice(off, chunk_rows).combine_chunks()

    def append_rows(self, by_part: dict[int, dict[str, np.ndarray]]) -> int:
        return sum(self.frontier[p].append(rows) for p, rows in by_part.items())

    def hot_hosts(self, threshold: int) -> dict[str, int]:
        out: dict[str, int] = {}
        for f in self.frontier.values():
            out.update(f.hot_hosts(threshold))
        return out

    # -- fused chunk processing (load-balanced across ALL actors) ------------

    def process_chunk(self, chunk: pa.Table, gen: int, max_depth: int,
                      out_dir: str, max_tries: int = 4,
                      log_rejects: bool = False) -> dict:
        """Process one politeness-gated drain chunk end-to-end on THIS
        actor: robots-gate + fetch + persist + extract/canonicalize/score +
        combiner-dedup; candidates are BUFFERED in a per-target outbox
        (no RPC here — ``flush_outbox`` exchanges them once per generation).

        Any actor can process any chunk: robots rules and the fetch backend
        are host-agnostic replicas (a real crawler's fetchers can hit any
        URL); only frontier/seen state is partition-affine, and candidates
        are routed there by hash. The driver round-robins chunks across the
        pool, so a hot partition's drain spreads over every actor instead
        of serializing on its owner (north_rule hot-host skew handling,
        fused-path form)."""
        from cocrawler_ray.stages.process import (
            links_to_candidates, persist_fetched_cell, persist_rejects_cell,
            retry_rows)
        from cocrawler_ray.storage import Storage

        storage = Storage(out_dir)
        counts = {"n_in": chunk.num_rows, "n_allowed": 0, "n_fetched": 0,
                  "n_cand": 0, "n_retry": 0}
        fetched, gated = self.fetch_gated(chunk, gen)
        counts["n_allowed"] = gated.num_rows
        if fetched.num_rows == 0:
            return counts
        counts["n_fetched"] = fetched.num_rows
        persist_fetched_cell(storage, fetched, gen)
        # 5xx -> requeue to the owning frontier partition (buffered like
        # candidates; flushed in the same per-gen exchange round)
        rr = retry_rows(gated, fetched.column("status"), max_tries)
        counts["n_retry"] = rr.num_rows
        if rr.num_rows:
            rparts = host_partition(rr.column("host").to_pylist(), self.num_parts)
            for a in np.unique(rparts % self.num_actors):
                idx = np.flatnonzero(rparts % self.num_actors == a)
                self._requeue_outbox.setdefault(int(a), []).append(
                    rr.take(pa.array(idx, pa.int64())))
        if log_rejects:
            links, rejects = links_to_candidates(fetched, max_depth,
                                                 collect_rejects=True)
            persist_rejects_cell(storage, rejects, fetched, gen)
        else:
            links = links_to_candidates(fetched, max_depth)
        counts["n_cand"] = links.num_rows
        if links.num_rows == 0:
            return counts
        sparts = surt_partition(links.column("dst_surt").to_pylist(),
                                self.num_parts)
        actor_of = sparts % self.num_actors
        for a in np.unique(actor_of):
            idx = np.flatnonzero(actor_of == a)
            self._outbox.setdefault(int(a), []).append(
                links.take(pa.array(idx, pa.int64())))
        return counts

    def flush_outbox_refs(self) -> dict:
        """Stage this actor's half of the per-generation candidate
        exchange: deliver own-target buffers locally, ``ray.put`` each
        remaining target's merged table, and return
        ``{"cand": {target: ref}, "requeue": {target: ref}}``. The DRIVER
        then issues ONE ``accept_exchange`` call per TARGET actor carrying
        all its refs, so per-generation task invocations are O(A) — A
        stagings + <=A accepts — instead of the O(A^2) peer-to-peer RPCs
        of the previous protocol (an earlier iteration sent ~chunks x A
        messages; the A x A form fixed that but its A^2 fixed task costs
        still dominated small generations once A tracked cluster width,
        measured 2-4x on the 33k-page corpus at A=32 vs A=8). Data still
        crosses A x A but plasma-to-plasma, fetched in one batched
        ``ray.get`` inside each target."""
        out = {"cand": {}, "requeue": {}}
        for a, bufs in self._outbox.items():
            merged = pa.concat_tables(bufs) if len(bufs) > 1 else bufs[0]
            if a == self.actor_id:
                self.accept_candidates(merged)
            else:
                out["cand"][a] = ray.put(merged)
        self._outbox = {}
        for a, bufs in self._requeue_outbox.items():
            merged = pa.concat_tables(bufs) if len(bufs) > 1 else bufs[0]
            if a == self.actor_id:
                self.requeue_rows(merged)
            else:
                out["requeue"][a] = ray.put(merged)
        self._requeue_outbox = {}
        return out

    def accept_exchange(self, cand_refs: list, requeue_refs: list) -> int:
        """Receive this generation's exchange: one batched plasma fetch of
        every peer's staged buffer for this actor (refs arrive unresolved
        — they are nested in lists by design), then local accept/requeue."""
        n = 0
        for t in ray.get(list(cand_refs)):
            n += self.accept_candidates(t)
        for t in ray.get(list(requeue_refs)):
            self.requeue_rows(t)
        return n

    def requeue_rows(self, rows: pa.Table) -> int:
        """Requeue 5xx rows into their owning frontier partitions (retries
        and priority bumped by FrontierPartition.requeue). No seen gate —
        the URLs are already seen; they re-enter the queue directly."""
        parts = host_partition(rows.column("host").to_pylist(), self.num_parts)
        n = 0
        for p in np.unique(parts):
            idx = np.flatnonzero(parts == p)
            n += self.frontier[int(p)].requeue(
                rows.take(pa.array(idx, pa.int64())))
        return n

    # -- robots + fetch (fused: one RPC per batch per actor) -----------------

    def fetch_gated(self, batch: pa.Table, gen: int) -> tuple[pa.Table, pa.Table]:
        """Robots-gate then fetch a batch of frontier rows; returns
        (fetched_table, gated_batch) — fetch output is positionally aligned
        with the gated input, so callers can split retries off the original
        frontier rows."""
        hosts = np.asarray(batch.column("host").to_pylist(), dtype=object)
        paths = url_paths(batch.column("url"))
        allow = self.robots.check_batch(hosts, paths, gen)
        batch = batch.filter(pa.array(allow))
        if batch.num_rows == 0:
            return batch, batch
        return self.fetcher.fetch(batch), batch

    # -- seen ----------------------------------------------------------------

    def check_and_add(self, parts: np.ndarray, keys: np.ndarray) -> np.ndarray:
        """Vector API over this actor's seen partitions: rows pre-routed here
        (part % A == actor_id); split by exact partition internally."""
        new = np.zeros(len(keys), dtype=bool)
        for p in np.unique(parts):
            idx = np.flatnonzero(parts == p)
            new[idx] = self.seen[int(p)].check_and_add(keys[idx])
        return new

    def accept_candidates(self, links: pa.Table) -> int:
        """Buffer candidate links for this actor's surt partitions. Arrow
        tables end-to-end: string columns cross the wire as contiguous
        buffers — a dict of object-dtype numpy arrays pickled every Python
        string individually, which dominated exchange CPU at high A."""
        sparts = surt_partition(links.column("dst_surt").to_pylist(),
                                self.num_parts)
        n = 0
        for p in np.unique(sparts):
            idx = np.flatnonzero(sparts == p)
            n += self.seen[int(p)].accept_candidates(
                links.take(pa.array(idx, pa.int64())))
        return n

    def finalize_gen(self, seed: int, hot_host_threshold: int | None = None) -> dict:
        """Per owned seen-partition: winner dedup + seen gate; then push
        survivors to peer actors grouped by hash(host)%K partition.

        MUST NOT block on peers (every shard finalizes concurrently and
        peer appends are circular — blocking here deadlocks the pool), so
        appends are STAGED (``ray.put``) and their refs returned for the
        driver to deliver in one batched call per target. Piggybacks the per-gen hot-host counts (skew
        metric) so the driver needs no extra barrier round; cross-actor
        appends still in flight may be slightly undercounted — advisory."""
        totals = {"candidates": 0, "new": 0, "appended": 0, "append_refs": {},
                  "hot_hosts": (self.hot_hosts(hot_host_threshold)
                                if hot_host_threshold is not None else {})}
        rows_list = []
        for p in sorted(self.seen):
            res = self.seen[p].finalize_local(seed)
            totals["candidates"] += res["candidates"]
            totals["new"] += res["new"]
            if res["rows"] is not None:
                rows_list.append(res["rows"])
        if not rows_list:
            return totals
        # Arrow tables end-to-end (same rationale as accept_candidates: the
        # previous dict-of-object-ndarrays pickled every string individually)
        rows = (pa.concat_tables(rows_list).combine_chunks()
                if len(rows_list) > 1 else rows_list[0])
        parts = host_partition(rows.column("host").to_pylist(), self.num_parts)
        by_actor: dict[int, dict[int, pa.Table]] = {}
        for p in np.unique(parts):
            idx = np.flatnonzero(parts == p)
            a = int(p) % self.num_actors
            by_actor.setdefault(a, {})[int(p)] = rows.take(
                pa.array(idx, pa.int64()))
        for a, by_part in by_actor.items():
            if a == self.actor_id:
                totals["appended"] += self.append_rows(by_part)
            else:
                # staged like flush_outbox_refs: the driver batches one
                # append_rows_refs per target (O(A) task invocations)
                totals["append_refs"][a] = ray.put(by_part)
        return totals

    def append_rows_refs(self, refs: list) -> int:
        """Apply every peer's staged seen->frontier appends in one call."""
        return sum(self.append_rows(d) for d in ray.get(list(refs)))

    # -- checkpoint / conformance -------------------------------------------

    def snapshot_frontier(self) -> dict[int, pa.Table]:
        return {p: f.snapshot() for p, f in self.frontier.items()}

    def snapshot_seen(self) -> dict[int, pa.Table]:
        return {p: s.snapshot() for p, s in self.seen.items()}

    def restore_frontier(self, part: int, table: pa.Table) -> None:
        self.frontier[part].restore(table)

    def restore_seen(self, part: int, table: pa.Table) -> None:
        self.seen[part].restore(table)

    def robots_stats(self) -> dict:
        return {"actor": self.actor_id, **self.robots.stats()}

    def fetch_stats(self) -> dict:
        return self.fetcher.stats()

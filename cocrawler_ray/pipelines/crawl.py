"""The crawl generation loop — CoCrawler's main loop, Ray-Data-native.

Reference lifecycle (cocrawler/__init__.py::Crawler.crawl, SURVEY §3.1):
coroutines pull work from a global priority queue, robots-check, fetch,
parse, and push extracted links back through canonicalize -> seen-check ->
add_url. Our engine runs the same dataflow as **generations** (BFS waves;
SURVEY §3.4): each generation is ONE lazy Ray Data pipeline streamed
end-to-end, with a single fused map stage per drained block:

    shard[a].drain_all(gen)         A object refs (politeness-gated)
      -> rd.from_arrow_refs         no driver materialization
      -> map_batches(process):      fused stage, per batch:
           fetch_gated              ONE RPC: robots gate + fetch on the
                                    co-partitioned ShardHost actor
           persist fetched cell     idempotent (content-keyed file name)
           extract+canonicalize+score   vectorized, in-task
           in-batch dedup (combiner)
           route candidates         hash(dst_surt)%K -> seen buffers
      -> tiny per-batch count rows  (the only thing that reaches the driver)
    shard[a].finalize_gen()         per seen-partition: winner-per-surt
                                    dedup (co-located by the hash route — NO
                                    sort shuffle), seen gate, actor-to-actor
                                    push of survivors to hash(host)%K
                                    frontier partitions

Physical layout: K = cfg.num_parts *logical* partitions (fixed; determines
every shuffle key and all determinism) hosted on A = cfg.num_actors
ShardHost actor processes (``part % A`` — a resource knob, ≈ CPUs locally,
≈ node slots on a cluster). See state/shard.py.

Determinism: ordering conformance is defined as sort(gen, priority, rand,
surt) (rand = seeded splitmix64 of surt), and the in-gen dedup winner is
min (priority, src_surt, kind) per dst_surt — so neither the parallel
execution order nor A leaks into results (SURVEY §2.6 O2, §2.9). Candidate
delivery is idempotent under task replay (duplicates collapse at finalize;
fetched cells overwrite by deterministic name).

Checkpoint/resume: every `checkpoint_every` generations each frontier and
seen partition snapshots to a Parquet cell + a lineage/manifest row; resume
restores the latest generation whose checkpoint has all partitions present
(per-partition lineage, NOT a whole-state pickle like Crawler.save/load).
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from cocrawler_ray import seeds as seeds_mod
from cocrawler_ray.config import CrawlConfig
from cocrawler_ray.hashing import hash64, host_partition, surt_partition
from cocrawler_ray.state.shard import ShardHost
from cocrawler_ray import storage as storage_mod
from cocrawler_ray.storage import Storage


# shared per-batch kernels live in stages/process.py (both execution paths)
from cocrawler_ray.stages.process import (  # noqa: E402  (re-export for tests)
    dedup_links_batch, extract_and_score, links_to_candidates,
    persist_fetched_cell)


# Worker-process replica cache for the huge-wave path: Ray Data task-pool
# workers PERSIST across pipeline executions (unlike actor pools, which are
# torn down per Dataset), so each worker builds the fetch/robots replica —
# including the O(corpus) url->row index — once per crawl, not once per
# generation. Keyed by the broadcast refs; a new crawl's refs evict the old
# replica.
_REPLICA_CACHE: dict = {}


def _wave_replicas(web_ref, html_ref, robots_ref, user_agent: str,
                   transient_every: int = 0):
    from cocrawler_ray.stages.fetch import FetcherPartition
    from cocrawler_ray.state.robots_actor import RobotsPartition

    key = (web_ref.hex(), html_ref.hex(), robots_ref.hex(), user_agent,
           transient_every)
    hit = _REPLICA_CACHE.get(key)
    if hit is None:
        # zero-copy plasma reads of the single-chunk broadcast tables
        web, html, bodies = ray.get(web_ref), ray.get(html_ref), ray.get(robots_ref)
        hit = (FetcherPartition(-1, web, html, transient_every),
               RobotsPartition(-1, bodies, 10, user_agent))
        _REPLICA_CACHE.clear()
        _REPLICA_CACHE[key] = hit
    return hit


def make_process(shards, num_parts: int, num_actors: int, max_depth: int,
                 out_dir: str, web_ref, html_ref, robots_ref,
                 user_agent: str, transient_every: int = 0,
                 max_tries: int = 4, log_rejects: bool = False):
    """The fused per-batch stage of the huge-wave Ray Data path (see module
    docstring). SELF-SUFFICIENT: robots gate + fetch run locally against
    the worker's cached replica (fetch state is host-agnostic; only
    frontier/seen state is partition-affine), so fetch parallelism tracks
    the streaming executor's task count — a previous version RPC'd every
    batch through the A single-threaded ShardHosts, capping the wave's
    fetch throughput at A regardless of cluster width and paying a plasma
    round-trip per batch. Only candidate DELIVERY touches the stateful
    actors; it is awaited in-task so Dataset completion implies every
    candidate reached its seen partition before finalize.

    Returns one count row per batch — payloads are persisted / routed
    inside the task, so the driver only ever sees counters."""
    from cocrawler_ray.state.shard import url_paths

    storage = Storage(out_dir)

    def process(batch: pa.Table) -> pa.Table:
        def counts(n_in=0, n_allowed=0, n_fetched=0, n_cand=0,
                   rf=0, rh=0):
            return pa.table({"n_in": pa.array([n_in], pa.int64()),
                             "n_allowed": pa.array([n_allowed], pa.int64()),
                             "n_fetched": pa.array([n_fetched], pa.int64()),
                             "n_cand": pa.array([n_cand], pa.int64()),
                             # robots counter DELTAS from this worker's
                             # replica — merged by the driver so robotslog
                             # covers huge-wave decisions too
                             "robots_fetches": pa.array([rf], pa.int64()),
                             "robots_hits": pa.array([rh], pa.int64())})

        n_in = batch.num_rows
        if n_in == 0:
            return counts()
        gen = int(batch.column("gen")[0].as_py())
        fetcher, robots = _wave_replicas(web_ref, html_ref, robots_ref,
                                         user_agent, transient_every)

        # robots gate + fetch, locally (replica decisions are deterministic:
        # static rule bodies, host-agnostic — same gate as ShardHost's)
        hosts = np.asarray(batch.column("host").to_pylist(), dtype=object)
        paths = url_paths(batch.column("url"))
        rf0, rh0 = robots.fetch_count, robots.hit_count
        allow = robots.check_batch(hosts, paths, gen)
        rf, rh = robots.fetch_count - rf0, robots.hit_count - rh0
        gated = batch.filter(pa.array(allow))
        n_allowed = gated.num_rows
        if n_allowed == 0:
            return counts(n_in, 0, rf=rf, rh=rh)
        fetched = fetcher.fetch(gated)
        n_fetched = fetched.num_rows
        if n_fetched == 0:
            return counts(n_in, n_allowed, rf=rf, rh=rh)

        persist_fetched_cell(storage, fetched, gen)

        futs = []
        # 5xx -> requeue to the owning frontier partitions (awaited with
        # the candidate delivery below, so Dataset completion implies both)
        from cocrawler_ray.stages.process import retry_rows
        rr = retry_rows(gated, fetched.column("status"), max_tries)
        if rr.num_rows:
            rparts = host_partition(rr.column("host").to_pylist(), num_parts)
            for a in np.unique(rparts % num_actors):
                idx = np.flatnonzero(rparts % num_actors == a)
                futs.append(shards[int(a)].requeue_rows.remote(
                    rr.take(pa.array(idx, pa.int64()))))

        # extract + canonicalize + score on 200s (+3xx targets), combiner dedup
        if log_rejects:
            from cocrawler_ray.stages.process import persist_rejects_cell
            links, rejects = links_to_candidates(fetched, max_depth,
                                                 collect_rejects=True)
            persist_rejects_cell(storage, rejects, fetched, gen)
        else:
            links = links_to_candidates(fetched, max_depth)
        n_cand = links.num_rows
        if n_cand:
            # route candidates to their seen partitions' hosting actors
            surts = links.column("dst_surt").to_pylist()
            actor_of = surt_partition(surts, num_parts) % num_actors
            for a in np.unique(actor_of):
                idx = np.flatnonzero(actor_of == a)
                futs.append(shards[int(a)].accept_candidates.remote(
                    links.take(pa.array(idx, pa.int64()))))
        if futs:
            ray.get(futs)
        return counts(n_in, n_allowed, n_fetched, n_cand, rf=rf, rh=rh)

    return process


def _contiguous(t: pa.Table) -> pa.Table:
    """One chunk per column, with 64-bit offsets for var-length columns so
    arbitrarily large tables CAN be single-chunk (int32 offsets cap a
    string/binary chunk at 2 GiB)."""
    fields = []
    for f in t.schema:
        if pa.types.is_string(f.type):
            fields.append(pa.field(f.name, pa.large_string()))
        elif pa.types.is_binary(f.type):
            fields.append(pa.field(f.name, pa.large_binary()))
        else:
            fields.append(f)
    return t.cast(pa.schema(fields)).combine_chunks()


class CrawlJob:
    """Owns the ShardHost actor pool + storage; runs generations until the
    frontier drains or budgets hit. Does NOT call ray.init (driver owns the
    session)."""

    def __init__(self, cfg: CrawlConfig, web: pa.Table, web_html: pa.Table,
                 robots_bodies: dict[str, str]):
        self.cfg = cfg
        self.storage = Storage(cfg.out_dir)
        K = cfg.num_parts
        A = cfg.num_actors or max(1, min(K, int(ray.cluster_resources().get("CPU", 8))))
        self.num_actors = A
        spill = str(self.storage.root / "frontier_spill")
        # ship tables once, as SINGLE-chunk tables: every actor's fetcher
        # then reads the same plasma buffers zero-copy (multi-chunk tables
        # would force a per-actor combine_chunks heap copy — A x table size).
        # 32-bit offset columns are upgraded to large_* first: a >2 GiB
        # string/binary column cannot combine into one chunk otherwise, and
        # the per-actor fallback copy would OOM the pool.
        web_ref = ray.put(_contiguous(web))
        html_ref = ray.put(_contiguous(web_html))
        # kept for the huge-wave path's worker replicas (fetch/robots state
        # is broadcast once; task workers read it zero-copy)
        self.web_ref, self.html_ref = web_ref, html_ref
        self.robots_ref = ray.put(robots_bodies)
        Shard = ray.remote(ShardHost)
        self.shards = [Shard.remote(a, A, K, robots_bodies, cfg.user_agent,
                                    web_ref, html_ref, cfg.seen_capacity,
                                    cfg.exact_seen, cfg.spill_threshold, spill,
                                    cfg.transient_every)
                       for a in range(A)]
        ray.get([s.set_peers.remote(self.shards) for s in self.shards])
        self.fetched_total = 0
        self.appended_total = 0
        self.gen = 0
        self._pending_est = 0  # frontier-size estimate (path choice only)
        from cocrawler_ray.memory import MemoryMonitor
        self._memmon = MemoryMonitor(cfg.mem_soft_limit)
        # driver-held buffers the monitor can see/shed: the metrics buffer
        # (flushable early) is the only unbounded driver-side holder — all
        # crawl data lives in actors / the object store by design.
        self._memmon.register(
            "metrics_buffer",
            lambda: sum(64 + len(str(r[2])) for r in self.metrics_rows),
            lambda: (n := sum(64 + len(str(r[2])) for r in self.metrics_rows),
                     self.flush_metrics(), n)[-1])
        self.metrics_rows: list[tuple] = []
        self._metrics_flush_seq = 0
        # robots decisions made by huge-wave task-worker replicas (merged
        # into robotslog; the ShardHost counters only see the actor path)
        self.wave_robots = {"fetches": 0, "hits": 0}

    # -- seeding (seeds.py::expand_seeds -> add_url flow) --------------------

    def add_seeds(self, seed_lines: list[str]) -> int:
        cfg = self.cfg
        t = seeds_mod.expand_seeds_batch(pa.table({"text": seed_lines}), seed=cfg.seed)
        if t.num_rows == 0:
            return 0
        # seen-gate the seeds (at-most-once enqueue), routed to seen shards
        surts = t.column("surt").to_pylist()
        keys = hash64(surts)
        sparts = surt_partition(surts, cfg.num_parts)
        actor_of = sparts % self.num_actors
        new = np.zeros(len(surts), dtype=bool)
        futs = [(np.flatnonzero(actor_of == a),
                 self.shards[int(a)].check_and_add.remote(
                     sparts[actor_of == a], keys[actor_of == a]))
                for a in np.unique(actor_of)]
        for idx, fut in futs:
            new[idx] = ray.get(fut)
        t = t.filter(pa.array(new))
        if t.num_rows == 0:
            return 0
        hosts = np.asarray(t.column("host").to_pylist(), dtype=object)
        parts = host_partition(hosts, cfg.num_parts)
        rows = {c: (np.asarray(t.column(c).to_pylist(), dtype=object)
                    if t.schema.field(c).type == pa.string()
                    else t.column(c).to_numpy())
                for c in ("surt", "url", "host", "priority", "rand", "depth", "retries", "seed_id")}
        by_actor: dict[int, dict[int, dict]] = {}
        for p in np.unique(parts):
            idx = np.flatnonzero(parts == p)
            by_actor.setdefault(int(p) % self.num_actors, {})[int(p)] = \
                {k: v[idx] for k, v in rows.items()}
        futs = [self.shards[a].append_rows.remote(bp) for a, bp in by_actor.items()]
        n = sum(ray.get(futs))
        self._pending_est += n
        return n

    # -- one generation -----------------------------------------------------

    def run_generation(self) -> dict[str, int]:
        cfg, g = self.cfg, self.gen
        remaining = None if cfg.max_urls is None else max(0, cfg.max_urls - self.fetched_total)
        if remaining == 0:
            return {"drained": 0, "fetched": 0, "appended": 0}
        # pending estimate for execution-path choice (exact emptiness comes
        # free from the drain itself: zero chunks -> zero drained -> stop).
        # Row conservation: pending' = pending - drained + appended; both
        # paths are correct, so a skewed estimate only shifts the switch.
        ready = self._pending_est
        per_part_cap = cfg.max_rows_per_part_gen
        if remaining is not None:
            cap = (remaining + cfg.num_parts - 1) // cfg.num_parts
            per_part_cap = min(per_part_cap, cap) if per_part_cap else cap

        import time as _time
        t0 = _time.perf_counter()
        if ready <= cfg.actor_path_max_rows:
            # modest wave: fused actor path — drain chunks (politeness
            # applied inside the owning partition), then round-robin them
            # across ALL warm actors; fetch/robots state is host-agnostic
            # so a hot partition's chunks spread over the whole pool.
            drain_gens = [s.drain_chunks.options(num_returns="dynamic").remote(
                              g, cfg.budget_per_host, per_part_cap,
                              cfg.fetch_batch_size)
                          for s in self.shards]
            chunk_refs = [ref for dg in ray.get(drain_gens) for ref in dg]
            outs = ray.get([
                self.shards[i % self.num_actors].process_chunk.remote(
                    ref, g, cfg.max_depth, cfg.out_dir, cfg.max_tries,
                    cfg.log_rejects)
                for i, ref in enumerate(chunk_refs)])
            drained = sum(c["n_in"] for c in outs)
            n_fetched = sum(c["n_fetched"] for c in outs)
            # candidate exchange: stage refs on every actor, then ONE
            # batched accept per target actor (O(A) task invocations; see
            # shard.py::flush_outbox_refs) — barriered before finalize
            staged = ray.get([s.flush_outbox_refs.remote()
                              for s in self.shards])
            cand_t: dict[int, list] = {}
            req_t: dict[int, list] = {}
            for st in staged:
                for a, ref in st["cand"].items():
                    cand_t.setdefault(a, []).append(ref)
                for a, ref in st["requeue"].items():
                    req_t.setdefault(a, []).append(ref)
            targets = set(cand_t) | set(req_t)
            if targets:
                ray.get([self.shards[a].accept_exchange.remote(
                             cand_t.get(a, []), req_t.get(a, []))
                         for a in targets])
        else:
            # huge wave: Ray Data streaming pipeline — drained blocks stay
            # in the object store (refs, no driver pull); dynamic returns
            # chunk each actor's drain into ≤batch_size blocks so task
            # parallelism tracks batch count (fine-grained load balancing
            # across the cluster) and the streaming executor applies
            # backpressure to in-flight fetch batches.
            drain_gens = [s.drain_chunks.options(num_returns="dynamic").remote(
                              g, cfg.budget_per_host, per_part_cap,
                              cfg.fetch_batch_size)
                          for s in self.shards]
            drains = [ref for dg in ray.get(drain_gens) for ref in dg]
            if not drains:
                drained = n_fetched = 0
            else:
                process = make_process(self.shards, cfg.num_parts,
                                       self.num_actors, cfg.max_depth,
                                       cfg.out_dir, self.web_ref,
                                       self.html_ref, self.robots_ref,
                                       cfg.user_agent, cfg.transient_every,
                                       cfg.max_tries, cfg.log_rejects)
                counts = (rd.from_arrow_refs(drains)
                          .map_batches(process, batch_format="pyarrow",
                                       batch_size=cfg.fetch_batch_size)
                          .to_pandas())
                drained = int(counts["n_in"].sum()) if len(counts) else 0
                n_fetched = int(counts["n_fetched"].sum()) if len(counts) else 0
                if len(counts):
                    self.wave_robots["fetches"] += int(counts["robots_fetches"].sum())
                    self.wave_robots["hits"] += int(counts["robots_hits"].sum())
        t_pipeline = _time.perf_counter() - t0
        self.fetched_total += n_fetched
        self.storage.append_manifest({"kind": "fetched", "gen": g})

        # per-partition finalize: dedup winners -> seen gate -> frontier push
        # (shards stage cross-actor appends as refs — they must not block
        # on each other; delivery is one batched call per target below)
        t0 = _time.perf_counter()
        rets = ray.get([s.finalize_gen.remote(cfg.seed, cfg.hot_host_threshold)
                        for s in self.shards])
        n_appended = sum(r["appended"] for r in rets)
        app_t: dict[int, list] = {}
        for r in rets:
            for a, ref in r["append_refs"].items():
                app_t.setdefault(a, []).append(ref)
        if app_t:
            n_appended += sum(ray.get(
                [self.shards[a].append_rows_refs.remote(refs)
                 for a, refs in app_t.items()]))
        t_finalize = _time.perf_counter() - t0
        self.appended_total += n_appended
        self._pending_est = max(0, self._pending_est - drained) + n_appended
        self._metric(g, "wall.pipeline_s", t_pipeline)
        self._metric(g, "wall.finalize_s", t_finalize)

        # hot-host skew detection: incremental per-partition counts (the
        # batch image of per-gen groupby(host).count() — north_rule),
        # piggybacked on the finalize round (no extra barrier)
        for r in rets:
            for h, c in r["hot_hosts"].items():
                self._metric(g, f"hot_host.{h}", float(c))

        self._metric(g, "fetched", float(n_fetched))
        self._metric(g, "drained", float(drained))
        self._metric(g, "appended", float(n_appended))
        if cfg.checkpoint_every and (g + 1) % cfg.checkpoint_every == 0:
            self.checkpoint()
        self.gen += 1
        return {"drained": drained, "fetched": n_fetched, "appended": n_appended}

    def run(self, seed_lines: list[str] | None = None) -> dict[str, int]:
        if seed_lines is not None:
            self.add_seeds(seed_lines)
        while self.gen < self.cfg.max_gens:
            out = self.run_generation()
            if out["drained"] == 0:
                break
        self.flush_metrics()
        return {"gens": self.gen, "fetched": self.fetched_total,
                "appended": self.appended_total}

    # -- metrics ------------------------------------------------------------

    def _metric(self, gen: int, name: str, value: float) -> None:
        self.metrics_rows.append(
            (gen, 0, name, value, _dt.datetime.now(_dt.UTC).replace(tzinfo=None)))

    def flush_metrics(self) -> None:
        if not self.metrics_rows:
            return
        cols = list(zip(*self.metrics_rows))
        t = pa.table({
            "gen": pa.array(np.array(cols[0], dtype=np.int32)),
            "part": pa.array(np.array(cols[1], dtype=np.int32)),
            "name": pa.array(cols[2], pa.string()),
            "value": pa.array(np.array(cols[3], dtype=np.float64)),
            "ts": pa.array(cols[4], pa.timestamp("us")),
        })
        # flush-sequence-keyed cell name: a shed-triggered early flush and
        # the end-of-run flush can both land in the same generation without
        # the second overwriting the first (read_table globs every cell)
        self.storage.write_cell_named(
            t, "metrics", self.gen, f"part=00000-f{self._metrics_flush_seq:03d}")
        self._metrics_flush_seq += 1
        self.metrics_rows.clear()

    # -- checkpoint / resume (per-partition lineage; SURVEY §4.2) -----------

    def checkpoint(self) -> None:
        g = self.gen
        # T8 memory monitor (memory.py): sample driver RSS + object-store
        # usage at every checkpoint barrier (already a sync point, so the
        # sample costs nothing extra) and persist as mem.* metrics rows —
        # the reference's memory.py RSS log, visible on the S6 status page.
        for name, v in self._memmon.sample().items():
            self._metric(g, name, v)
        f_snaps = ray.get([s.snapshot_frontier.remote() for s in self.shards])
        s_snaps = ray.get([s.snapshot_seen.remote() for s in self.shards])
        for table, snaps in (("frontier_ckpt", f_snaps), ("seen_ckpt", s_snaps)):
            for by_part in snaps:
                for p, t in by_part.items():
                    uri = self.storage.write_cell(t, table, g, p, validate=False)
                    self.storage.append_manifest({
                        "kind": "checkpoint", "table": table, "gen": g, "part": p,
                        "rows": t.num_rows, "uri": uri,
                        "fetched_total": self.fetched_total,
                        "appended_total": self.appended_total})

    def restore_latest(self) -> int | None:
        """Restore actors from the newest complete checkpoint; returns the
        generation to continue FROM (next gen index), or None if absent."""
        done = self.storage.completed_generations(self.cfg.num_parts)
        if not done:
            return None
        g = done[-1]
        futs = []
        for p in range(self.cfg.num_parts):
            a = p % self.num_actors
            futs.append(self.shards[a].restore_frontier.remote(
                p, self.storage.read_cell("frontier_ckpt", g, p)))
            futs.append(self.shards[a].restore_seen.remote(
                p, self.storage.read_cell("seen_ckpt", g, p)))
        ray.get(futs)
        recs = [r for r in self.storage.read_manifest()
                if r.get("kind") == "checkpoint" and r["gen"] == g]
        if recs:
            self.fetched_total = int(recs[-1].get("fetched_total", 0))
            self.appended_total = int(recs[-1].get("appended_total", 0))
        self.gen = g + 1
        self._pending_est = sum(
            ray.get([s.ready_count.remote() for s in self.shards]))
        return self.gen

    # -- log sinks (SURVEY §2.1 S4/S5: crawllog / robots-log JSON lines) ----

    def write_logs(self) -> dict[str, str]:
        """Export the side-channel logs the reference writes per fetch
        (SURVEY §2.1 S4/S5): crawllog (url, status, timings, sizes —
        Crawler.fetch_and_process jsonl), robotslog (decision counts,
        actor-path counters PLUS the huge-wave replica deltas), facetlog
        (per-200-page head facets — Logging.facet_log) and rejectlog
        (dropped candidate URLs — Logging.rejected_url_log, written as
        cells during processing when cfg.log_rejects). All streaming
        projections — no driver materialization."""
        out = {}
        files = self.storage.table_files("fetched")
        if files:
            crawllog_dir = str(self.storage.root / "crawllog")
            (storage_mod.read_ray_dataset(
                    files, columns=["url", "host", "status", "gen",
                                    "fetch_ms", "digest"])
               .write_json(crawllog_dir))
            out["crawllog"] = crawllog_dir
            # facetlog: re-join 200 rows to their HTML (broadcast table)
            # and extract head facets — a streaming pass, one task per cell
            html_ref = self.html_ref
            facet_dir = str(self.storage.root / "facetlog")

            def facets(t: pa.Table) -> pa.Table:
                from cocrawler_ray import facet as facet_mod
                html_t = ray.get(html_ref)
                idx = pd_index = None
                import pandas as _pd
                pd_index = _pd.Index(html_t.column("image_id").to_pylist())
                keep = t.filter(pa.compute.equal(t.column("status"), 200))
                pos = pd_index.get_indexer(keep.column("image_id").to_pylist())
                urls_, gens_ = keep.column("url").to_pylist(), keep.column("gen").to_pylist()
                us, gs, ks, vs = [], [], [], []
                for i, p in enumerate(pos):
                    if p < 0:
                        continue
                    body = html_t.column("html")[int(p)].as_py()
                    for k, v in facet_mod.find_head_facets(body):
                        us.append(urls_[i]); gs.append(gens_[i])
                        ks.append(k); vs.append(v)
                _ = idx
                return pa.table({"url": pa.array(us, pa.string()),
                                 "gen": pa.array(np.array(gs, dtype=np.int32)),
                                 "k": pa.array(ks, pa.string()),
                                 "v": pa.array(vs, pa.string())})

            (storage_mod.read_ray_dataset(
                    files, columns=["url", "image_id", "status", "gen"])
               .map_batches(facets, batch_format="pyarrow")
               .write_json(facet_dir))
            out["facetlog"] = facet_dir
        reject_files = self.storage.table_files("rejectlog")
        if reject_files:
            reject_dir = str(self.storage.root / "rejectlog_json")
            storage_mod.read_ray_dataset(reject_files).write_json(reject_dir)
            out["rejectlog"] = reject_dir
        robots_counts = ray.get([s.robots_stats.remote() for s in self.shards])
        if self.wave_robots["fetches"] or self.wave_robots["hits"]:
            robots_counts.append({"actor": -1, "source": "wave_replicas",
                                  **self.wave_robots})
        robotslog = self.storage.root / "robotslog.jsonl"
        import json as _json
        with open(robotslog, "w") as fh:
            for rec in robots_counts:
                fh.write(_json.dumps(rec) + "\n")
        out["robotslog"] = str(robotslog)
        return out

    def write_warcs(self, max_size: int = 1 << 30,
                    date: str = "2026-01-01T00:00:00Z") -> dict:
        """Optional archival sink (S3): render the fetched Parquet cells as
        WARC/1.0 request+response pairs (warc.py). Streaming, one rotated
        series per cell — resumable, never one giant file."""
        from cocrawler_ray import warc
        dest = str(self.storage.root / "warc")
        files = self.storage.table_files("fetched")
        n = warc.write_warc_from_fetched(files, dest, max_size, date) if files else 0
        return {"dir": dest, "records": n}

    # -- conformance views --------------------------------------------------

    def final_seen_surt_hashes(self) -> np.ndarray:
        snaps = ray.get([s.snapshot_seen.remote() for s in self.shards])
        t = pa.concat_tables([t for by_part in snaps for t in by_part.values()])
        arr = t.column("surt_hash").to_numpy(zero_copy_only=False)
        arr.sort()
        return arr

    def fetched_table(self) -> pa.Table:
        return self.storage.read_table("fetched")


def crawl_status(out_dir: str) -> dict:
    """Status summary of a crawl output directory — the info surface the
    reference serves over HTTP (``cocrawler/webserver.py`` per SURVEY §2
    S6: live counters, rates, hot hosts), re-expressed over the engine's
    PERSISTED state so it works during the run (metrics cells flush per
    checkpoint), after it, and from any machine that sees the storage.
    No Ray session required."""
    from cocrawler_ray.storage import Storage

    st = Storage(out_dir)
    out: dict = {"out": str(out_dir)}

    m = st.read_table("metrics")
    if m.num_rows:
        import pandas as pd  # noqa: F401 (vectorized rollups below)
        df = m.to_pandas()
        core = df[~df["name"].str.startswith("hot_host.")]
        per_gen = (core.pivot_table(index="gen", columns="name",
                                    values="value", aggfunc="sum")
                   .sort_index())
        totals = {k: float(core.loc[core["name"] == k, "value"].sum())
                  for k in ("fetched", "appended", "drained")}
        wall = float(core.loc[core["name"].str.startswith("wall."),
                              "value"].sum())
        out.update({
            "gens": int(df["gen"].max()) + 1,
            "totals": {k: int(v) for k, v in totals.items()},
            "wall_s": round(wall, 3),
            "pages_per_sec": round(totals["fetched"] / wall, 1) if wall else None,
            # counters stay ints; fractional metrics (the wall.* phase
            # timings) keep their sub-second precision instead of
            # truncating to 0
            "last_gen": {k: (0 if v != v
                             else int(v) if float(v).is_integer()
                             else round(float(v), 3))
                         for k, v in per_gen.iloc[-1].to_dict().items()},
        })
        hot = df[df["name"].str.startswith("hot_host.")]
        if len(hot):
            hh = (hot.assign(host=hot["name"].str[len("hot_host."):])
                  .groupby("host")["value"].sum()
                  .sort_values(ascending=False).head(10))
            out["hot_hosts"] = {h: int(v) for h, v in hh.items()}

    recs = st.read_manifest()
    if recs:
        cps = [r for r in recs if r.get("kind") == "checkpoint"]
        out["manifest"] = {"records": len(recs),
                           "fetched_gens": sum(r.get("kind") == "fetched"
                                               for r in recs)}
        if cps:
            last = max(cps, key=lambda r: (r.get("gen", -1), r.get("part", -1)))
            out["last_checkpoint"] = {
                "gen": last.get("gen"),
                "fetched_total": last.get("fetched_total"),
                "appended_total": last.get("appended_total")}
    for table in ("fetched", "frontier", "links"):
        files = st.table_files(table)
        if files:
            out.setdefault("tables", {})[table] = len(files)
    return out

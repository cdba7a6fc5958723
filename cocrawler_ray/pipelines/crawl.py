"""The crawl generation loop — CoCrawler's main loop, Ray-Data-native.

Reference lifecycle (cocrawler/__init__.py::Crawler.crawl, SURVEY §3.1):
coroutines pull work from a global priority queue, robots-check, fetch,
parse, and push extracted links back through canonicalize -> seen-check ->
add_url. Our engine runs the same dataflow as **generations** (BFS waves;
SURVEY §3.4): each generation is one lazy Ray Data pipeline streamed
end-to-end:

    frontier.drain(gen)                       (politeness-gated, per-host budget)
      -> robots gate        map_batches task  (routes to per-partition RobotsPartition actors)
      -> fetch              map_batches task  (routes to persistent FetcherPartition actors)
      -> persist fetched    write parquet     (Lance-shaped cells, per gen)
      -> extract links      map_batches task  (regex parse + canonicalize + score)
      -> in-gen dedup       groupby(dst_surt) (keep best (priority, src, kind))
      -> seen check         map_batches task  (hash(surt)%K SeenPartition actors)
      -> frontier append    map_batches task  (hash(host)%K shuffle)

All per-batch stage fns are stateless Ray tasks; ALL state lives in the
three persistent actor pools (frontier/seen/robots, hash-partitioned) plus
the K fetcher actors — created once per job, never per generation.

Determinism: ordering conformance is defined as sort(priority, rand, surt)
within a generation (rand = seeded splitmix64 of surt), so the parallel
execution order never leaks into results (SURVEY §2.6 O2, §2.9).

Checkpoint/resume: every `checkpoint_every` generations each frontier and
seen partition snapshots to a Parquet cell + a lineage/manifest row; resume
restores the latest generation whose checkpoint has all partitions present
(per-partition lineage, NOT a whole-state pickle like Crawler.save/load).
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from cocrawler_ray import parse, schemas, seeds as seeds_mod, urls
from cocrawler_ray.config import CrawlConfig
from cocrawler_ray.hashing import hash64, host_partition, rand_for_surt, surt_partition
from cocrawler_ray.stages.fetch import FetcherPartition
from cocrawler_ray.state.frontier import FrontierPartition
from cocrawler_ray.state.robots_actor import RobotsPartition
from cocrawler_ray.state.seen import SeenPartition
from cocrawler_ray.storage import Storage


# ---------------------------------------------------------------------------
# stateless stage fns (plain map_batches tasks; actors reached by routing)
# ---------------------------------------------------------------------------

def _route(batch: pa.Table, parts: np.ndarray, call) -> dict[int, tuple[np.ndarray, object]]:
    """Split batch rows by partition id; fire one actor call per partition.
    Returns {part: (row_idx, future)} — caller ray.gets and reassembles."""
    out = {}
    for p in np.unique(parts):
        idx = np.flatnonzero(parts == p)
        out[int(p)] = (idx, call(int(p), idx))
    return out


def url_paths(us: list[str]) -> np.ndarray:
    return np.array(["/" + u.split("/", 3)[3] if u.count("/") >= 3 else "/" for u in us],
                    dtype=object)


def make_robots_gate(robots_actors, num_parts: int, gen: int):
    """Per-partition robots decision (partition-aligned actor calls)."""
    def gate(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        hosts = np.asarray(batch.column("host").to_pylist(), dtype=object)
        paths = url_paths(batch.column("url").to_pylist())
        parts = host_partition(hosts, num_parts)
        allow = np.zeros(len(hosts), dtype=bool)
        futs = _route(batch, parts,
                      lambda p, idx: robots_actors[p].check_batch.remote(hosts[idx], paths[idx], gen))
        for p, (idx, fut) in futs.items():
            allow[idx] = ray.get(fut)
        return batch.filter(pa.array(allow))
    return gate


def make_fetch(fetch_actors, num_parts: int):
    """Route rows to the persistent fetcher for their host partition."""
    def fetch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        hosts = batch.column("host").to_pylist()
        parts = host_partition(hosts, num_parts)
        futs = _route(batch, parts,
                      lambda p, idx: fetch_actors[p].fetch.remote(batch.take(pa.array(idx, pa.int64()))))
        pieces = [ray.get(fut) for _, fut in futs.values()]
        return pa.concat_tables(pieces)
    return fetch


def make_seen_gate(seen_actors, num_parts: int, surt_col: str):
    """J1 anti-join, streaming form: hash(surt)%K check_and_add; keeps only
    never-seen rows (at-most-once enqueue)."""
    def gate(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        surts = batch.column(surt_col).to_pylist()
        keys = hash64(surts)
        parts = surt_partition(surts, num_parts)
        new = np.zeros(len(surts), dtype=bool)
        futs = _route(batch, parts,
                      lambda p, idx: seen_actors[p].check_and_add.remote(keys[idx]))
        for p, (idx, fut) in futs.items():
            new[idx] = ray.get(fut)
        return batch.filter(pa.array(new))
    return gate


def make_frontier_append(frontier_actors, num_parts: int, seed: int):
    """Terminal stage: shuffle rows to hash(host)%K frontier actors; emits
    per-batch append counts (consumed by a driver-side sum)."""
    def append(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"appended": pa.array([0], pa.int64())})
        hosts = np.asarray(batch.column("dst_host").to_pylist(), dtype=object)
        surts = batch.column("dst_surt").to_pylist()
        rows = {
            "surt": np.asarray(surts, dtype=object),
            "url": np.asarray(batch.column("dst_url").to_pylist(), dtype=object),
            "host": hosts,
            "priority": batch.column("priority").to_numpy(),
            "rand": rand_for_surt(surts, seed=seed),
            "depth": batch.column("depth").to_numpy(),
            "retries": np.zeros(batch.num_rows, dtype=np.int32),
            "seed_id": np.full(batch.num_rows, -1, dtype=np.int64),
        }
        parts = host_partition(hosts, num_parts)
        futs = _route(batch, parts,
                      lambda p, idx: frontier_actors[p].append.remote({k: v[idx] for k, v in rows.items()}))
        total = sum(ray.get(fut) for _, fut in futs.values())
        return pa.table({"appended": pa.array([total], pa.int64())})
    return append


def extract_and_score(batch: pa.Table, seed: int, max_depth: int) -> pa.Table:
    """fetched(+html) batch -> links rows: extract, canonicalize, validity-
    filter, priority-score (child = parent priority + 1, drop depth>max).
    Reference: parse.py + urls.py + Crawler.add_url (M4, M1, M8)."""
    htmls = batch.column("html").to_pylist()
    page_urls = batch.column("url").to_pylist()
    src_surts = batch.column("surt").to_pylist()
    prio = batch.column("priority").to_numpy()
    depth = batch.column("depth").to_numpy()

    ex = parse.extract_links_batch(htmls, page_urls)
    res = urls.canonicalize_batch(ex["raw"], ex["base"])
    keep = res["valid"]
    si = ex["src_idx"][keep]
    child_depth = depth[si] + 1
    keep2 = child_depth <= max_depth
    si = si[keep2]
    n = len(si)
    return pa.table({
        "src_surt": pa.array([src_surts[i] for i in si], pa.string()),
        "dst_url": pa.array(res["url"][keep][keep2], pa.string()),
        "dst_surt": pa.array(res["surt"][keep][keep2], pa.string()),
        "dst_host": pa.array(res["host"][keep][keep2], pa.string()),
        "kind": pa.array(ex["kind"][keep][keep2], pa.string()),
        "priority": pa.array((prio[si] + 1).astype(np.int32)),
        "depth": pa.array((depth[si] + 1).astype(np.int32)),
    })


def dedup_links_batch(batch: pa.Table) -> pa.Table:
    """Partial in-batch dedup (combiner) before the groupby shuffle: keeps
    the best (priority, src_surt, kind) row per dst_surt within the batch."""
    df = batch.to_pandas()
    df = df.sort_values(["dst_surt", "priority", "src_surt", "kind"], kind="stable")
    df = df.drop_duplicates("dst_surt", keep="first")
    return pa.Table.from_pandas(df, preserve_index=False)


def dedup_links_group(df):
    """D1 exact dedup winner per dst_surt: deterministic min
    (priority, src_surt, kind) — 'first add_url wins' under generation order."""
    df = df.sort_values(["priority", "src_surt", "kind"], kind="stable")
    return df.head(1)


# ---------------------------------------------------------------------------
# the job
# ---------------------------------------------------------------------------

class CrawlJob:
    """Owns the actor pools + storage; runs generations until the frontier
    drains or budgets hit. Does NOT call ray.init (driver owns the session).
    """

    def __init__(self, cfg: CrawlConfig, web: pa.Table, web_html: pa.Table,
                 robots_bodies: dict[str, str]):
        self.cfg = cfg
        self.storage = Storage(cfg.out_dir)
        K = cfg.num_parts
        Frontier = ray.remote(FrontierPartition)
        Seen = ray.remote(SeenPartition)
        Robots = ray.remote(RobotsPartition)
        Fetch = ray.remote(FetcherPartition)
        spill = str(self.storage.root / "frontier_spill")
        self.frontier = [Frontier.remote(p, cfg.spill_threshold, spill) for p in range(K)]
        self.seen = [Seen.remote(p, cfg.seen_capacity, cfg.exact_seen) for p in range(K)]
        # each robots partition only ever queries its own hosts; handing every
        # partition the full (small) body dict is the broadcast pattern
        self.robots = [Robots.remote(p, robots_bodies, 10, cfg.user_agent) for p in range(K)]
        web_ref, html_ref = ray.put(web), ray.put(web_html)  # ship tables once
        self.fetchers = [Fetch.remote(p, web_ref, html_ref) for p in range(K)]
        self.fetched_total = 0
        self.appended_total = 0
        self.gen = 0
        self.metrics_rows: list[tuple] = []

    # -- seeding (seeds.py::expand_seeds -> add_url flow) --------------------

    def add_seeds(self, seed_lines: list[str]) -> int:
        t = seeds_mod.expand_seeds_batch(pa.table({"text": seed_lines}), seed=self.cfg.seed)
        t = make_seen_gate(self.seen, self.cfg.num_parts, "surt")(t)
        if t.num_rows == 0:
            return 0
        hosts = np.asarray(t.column("host").to_pylist(), dtype=object)
        parts = host_partition(hosts, self.cfg.num_parts)
        rows = {c: (np.asarray(t.column(c).to_pylist(), dtype=object)
                    if t.schema.field(c).type == pa.string()
                    else t.column(c).to_numpy())
                for c in ("surt", "url", "host", "priority", "rand", "depth", "retries", "seed_id")}
        futs = []
        for p in np.unique(parts):
            idx = np.flatnonzero(parts == p)
            futs.append(self.frontier[p].append.remote({k: v[idx] for k, v in rows.items()}))
        return sum(ray.get(futs))

    # -- one generation -----------------------------------------------------

    def run_generation(self) -> dict[str, int]:
        cfg, g = self.cfg, self.gen
        remaining = None if cfg.max_urls is None else max(0, cfg.max_urls - self.fetched_total)
        if remaining == 0:
            return {"drained": 0, "fetched": 0, "appended": 0}
        per_part_cap = cfg.max_rows_per_part_gen
        if remaining is not None:
            cap = (remaining + cfg.num_parts - 1) // cfg.num_parts
            per_part_cap = min(per_part_cap, cap) if per_part_cap else cap
        drains = ray.get([f.drain.remote(g, cfg.budget_per_host, per_part_cap)
                          for f in self.frontier])
        drains = [d for d in drains if d.num_rows]
        drained = sum(d.num_rows for d in drains)
        if drained == 0:
            return {"drained": 0, "fetched": 0, "appended": 0}

        bs = cfg.fetch_batch_size
        fetched = (rd.from_arrow(drains)
                   .map_batches(make_robots_gate(self.robots, cfg.num_parts, g),
                                batch_format="pyarrow", batch_size=bs)
                   .map_batches(make_fetch(self.fetchers, cfg.num_parts),
                                batch_format="pyarrow", batch_size=bs)
                   # one generation is a bounded working set: materialize once,
                   # then (a) persist payloads, (b) run the link pipeline,
                   # without re-running the fetch.
                   .materialize())
        n_fetched = fetched.count()
        self.fetched_total += n_fetched
        self._write_fetched(fetched, g)

        deduped = (fetched
                   .select_columns(["surt", "url", "priority", "depth", "html", "status"])
                   .map_batches(lambda b: b.filter(pc.equal(b["status"], 200)),
                                batch_format="pyarrow")
                   .map_batches(extract_and_score,
                                fn_kwargs=dict(seed=cfg.seed, max_depth=cfg.max_depth),
                                batch_format="pyarrow")
                   .map_batches(dedup_links_batch, batch_format="pyarrow")
                   .groupby("dst_surt")
                   .map_groups(dedup_links_group, batch_format="pandas")
                   # deduped feeds two consumers (hot-host counts + the
                   # stateful seen/append path) — materialize so the side-
                   # effecting stages execute exactly once.
                   .materialize())

        n_appended = 0
        n_deduped = deduped.count()
        if n_deduped > 0:
            # hot-host detection (explicit skew handling, north_rule):
            # per-gen groupby(host).count(); hosts over threshold recorded.
            # Only worth a pass when the generation could contain a hot host.
            if n_deduped > cfg.hot_host_threshold:
                host_counts = deduped.groupby("dst_host").count().to_pandas()
                cnt_col = [c for c in host_counts.columns if c != "dst_host"][0]
                hot = host_counts[host_counts[cnt_col] > cfg.hot_host_threshold]
                for h, c in zip(hot["dst_host"], hot[cnt_col]):
                    self._metric(g, f"hot_host.{h}", float(c))

            appended = (deduped
                        .map_batches(make_seen_gate(self.seen, cfg.num_parts, "dst_surt"),
                                     batch_format="pyarrow", batch_size=bs)
                        .map_batches(make_frontier_append(self.frontier, cfg.num_parts, cfg.seed),
                                     batch_format="pyarrow", batch_size=bs))
            pdf = appended.to_pandas()
            n_appended = int(pdf["appended"].sum()) if "appended" in pdf.columns else 0
        self.appended_total += n_appended

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

    # -- persistence --------------------------------------------------------

    def _write_fetched(self, fetched_ds, gen: int) -> None:
        # one cell per (gen, block) — resumable layout; html column dropped
        for i, ref in enumerate(fetched_ds.drop_columns(["html"]).to_arrow_refs()):
            t = ray.get(ref)
            if t.num_rows:
                self.storage.write_cell(schemas.validate(t, "fetched"), "fetched", gen, i)
        self.storage.append_manifest({"kind": "fetched", "gen": gen})

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
        self.storage.write_cell(t, "metrics", self.gen, 0)
        self.metrics_rows.clear()

    # -- checkpoint / resume (per-partition lineage; SURVEY §4.2) -----------

    def checkpoint(self) -> None:
        g = self.gen
        f_snaps = ray.get([f.snapshot.remote() for f in self.frontier])
        s_snaps = ray.get([s.snapshot.remote() for s in self.seen])
        for table, snaps in (("frontier_ckpt", f_snaps), ("seen_ckpt", s_snaps)):
            for p, t in enumerate(snaps):
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
            futs.append(self.frontier[p].restore.remote(
                self.storage.read_cell("frontier_ckpt", g, p)))
            futs.append(self.seen[p].restore.remote(
                self.storage.read_cell("seen_ckpt", g, p)))
        ray.get(futs)
        recs = [r for r in self.storage.read_manifest()
                if r.get("kind") == "checkpoint" and r["gen"] == g]
        if recs:
            self.fetched_total = int(recs[-1].get("fetched_total", 0))
            self.appended_total = int(recs[-1].get("appended_total", 0))
        self.gen = g + 1
        return self.gen

    # -- conformance views --------------------------------------------------

    def final_seen_surt_hashes(self) -> np.ndarray:
        snaps = ray.get([s.snapshot.remote() for s in self.seen])
        t = pa.concat_tables(snaps)
        arr = t.column("surt_hash").to_numpy(zero_copy_only=False)
        arr.sort()
        return arr

    def fetched_table(self) -> pa.Table:
        return self.storage.read_table("fetched")

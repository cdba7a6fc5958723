"""Crawl configuration (stands in for cocrawler's YAML config tree +
CLI ``--config Section.Key:value`` overrides; SURVEY §2.10).

A flat dataclass with the knobs that matter; `from_overrides` accepts
"Key:value" strings for CLI parity.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class CrawlConfig:
    out_dir: str = "/tmp/cocrawler_ray_out"
    # partitioning (SURVEY §4.2): K LOGICAL shards for frontier/robots
    # (hash(host)) and seen (hash(surt)) — fixed per job; determines every
    # shuffle key and all determinism. Size ~2x max cluster width.
    num_parts: int = 4
    # physical ShardHost actor count A (logical part p lives on actor p % A).
    # None = min(num_parts, cluster CPUs). A resource knob only — results
    # are identical for any A (state/shard.py).
    num_actors: int | None = None
    # politeness: max URLs per host per generation — the batch-mode image of
    # cocrawler/scheduler.py's per-host crawl-delay burrow (SURVEY §2.9).
    budget_per_host: int = 4
    # Crawl.MaxDepth: children get priority = parent+1; depth > max_depth drops.
    max_depth: int = 6
    # Crawl.MaxCrawledUrls-style budget; None = unbounded.
    max_urls: int | None = None
    max_gens: int = 50
    # global per-generation cap across a partition (qsize watermark analogue)
    max_rows_per_part_gen: int | None = None
    seed: int = 42
    user_agent: str = "cocrawler"
    # fetch actor pool (SURVEY §2.3 T5)
    fetch_concurrency: int = 4
    fetch_batch_size: int = 256
    # checkpointing: snapshot frontier+seen every C generations (0 = off)
    checkpoint_every: int = 0
    # seen-set mode: exact shadow (conformance) vs cuckoo-only (scale demo)
    exact_seen: bool = True
    seen_capacity: int = 1 << 20
    # skew: hosts with more than this many pending appends in one generation
    # are flagged hot; appends beyond the cap are dropped+counted (explicit
    # skew handling per north_rule).
    hot_host_threshold: int = 10_000
    # frontier cold-tail spill threshold (rows per partition)
    spill_threshold: int = 2_000_000
    # T8 memory monitor: driver-RSS soft limit in bytes; over it, the
    # monitor sheds registered driver-side holders (memory.py). None = off
    # (metrics-only sampling at checkpoints).
    mem_soft_limit: int | None = None
    # retry semantics (cocrawler/fetcher.py MaxTries + scheduler requeue):
    # total attempts per URL before giving up
    max_tries: int = 4
    # synthetic transient-failure rate knob for the sandbox fetcher: URLs
    # with hash64(url) % transient_every == 0 return 503 on their first
    # 1-2 attempts (0 = off). A real-HTTP backend replaces this with actual
    # connection errors behind the same status>=500 requeue path.
    transient_every: int = 0
    # S5 rejected-URL log: persist dropped candidates (invalid/too-deep)
    # as rejectlog cells during processing (off by default — hot-path cost)
    log_rejects: bool = False
    # execution-path switch (pipelines/crawl.py): generations whose ready
    # frontier is at most this many rows run the fused per-actor path (one
    # RPC per actor); larger waves run the Ray Data streaming pipeline
    # (fine-grained load balancing + backpressure).
    actor_path_max_rows: int = 500_000

    @classmethod
    def from_overrides(cls, *overrides: str, **kwargs) -> "CrawlConfig":
        """CLI parity: CrawlConfig.from_overrides("max_depth:3", "num_parts:8")."""
        cfg = cls(**kwargs)
        for ov in overrides:
            key, _, val = ov.partition(":")
            field = {f.name: f for f in dataclasses.fields(cls)}[key]
            typ = field.type if callable(field.type) else type(getattr(cfg, key) or "")
            cast = int if "int" in str(typ) else str
            setattr(cfg, key, cast(val))
        return cfg

"""Crawl configuration — cocrawler's YAML config tree + CLI
``--config Section.Key:value`` overrides (reference:
``cocrawler/config.py::config`` merges the packaged config.yml defaults,
a user --configfile, and dotted CLI overrides; SURVEY §2.10).

A flat dataclass with the knobs that matter. Three entry points:
- ``CrawlConfig()`` — code defaults;
- ``from_overrides("key:value" | "Section.Key:value", ...)`` — CLI
  parity (section prefixes are dropped, CamelCase keys fold to
  snake_case, reference names map via ``REFERENCE_ALIASES``);
- ``from_yaml(path, *overrides, **kwargs)`` — file-driven config with
  the reference's precedence: file < dotted overrides < explicit
  kwargs. Unmodeled Section.Key entries (Logging.*, GeoIP.*, ...) are
  preserved in ``extras`` rather than rejected, matching the
  reference's tolerance of its large config tree; unknown FLAT keys
  still raise (typo safety on our own knobs).
"""

from __future__ import annotations

import dataclasses
import re

# reference config names whose snake_case folding doesn't match our
# field names (cocrawler config.yml: Crawl.MaxCrawledUrls,
# Crawl.MaxWorkers, Fetcher.CookieJar)
REFERENCE_ALIASES = {
    "max_crawled_urls": "max_urls",
    "max_workers": "fetch_concurrency",
    "cookie_jar": "cookie_policy",
}

_CAMEL = re.compile(r"(?<!^)(?=[A-Z])")


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
    # cookie policy for the live-HTTP fetch backend (reference:
    # cocrawler/cookies.py — "none" mirrors its default no-op Defective
    # jar; "per_host" enables the real RFC 6265 per-session jar in
    # stages/http_fetch.py::CookieJar)
    cookie_policy: str = "none"
    # execution-path switch (pipelines/crawl.py): generations whose ready
    # frontier is at most this many rows run the fused per-actor path (one
    # RPC per actor); larger waves run the Ray Data streaming pipeline
    # (fine-grained load balancing + backpressure).
    actor_path_max_rows: int = 500_000

    # unmodeled Section.Key entries from a YAML tree (reference config
    # sections this engine has no knob for) — preserved, not rejected
    extras: dict = dataclasses.field(default_factory=dict)

    def _apply(self, key: str, val) -> None:
        """One ``key`` (flat, dotted ``Section.Key``, or CamelCase) to
        one field. Dotted unknowns land in ``extras``; flat unknowns
        raise."""
        dotted = "." in key
        name = key.split(".")[-1]
        if any(c.isupper() for c in name):
            name = _CAMEL.sub("_", name).lower()
        name = REFERENCE_ALIASES.get(name, name)
        fields = {f.name: f for f in dataclasses.fields(type(self))}
        if name not in fields or name == "extras":
            if dotted:
                self.extras[key] = val
                return
            raise KeyError(f"unknown config key {key!r}")
        typ = str(fields[name].type)
        if isinstance(val, str):
            if val.lower() in ("none", "null", ""):
                val = None
            elif "bool" in typ:
                val = val.lower() in ("1", "true", "yes", "on")
            elif "int" in typ:
                val = int(val)
        if name == "cookie_policy" and isinstance(val, str):
            # reference values: "Defective" (no-op jar) vs a real jar
            val = {"defective": "none"}.get(val.lower(), val.lower())
        setattr(self, name, val)

    @classmethod
    def from_overrides(cls, *overrides: str, **kwargs) -> "CrawlConfig":
        """CLI parity: CrawlConfig.from_overrides("max_depth:3",
        "Crawl.MaxDepth:3", "Fetcher.CookieJar:Defective", ...)."""
        cfg = cls(**kwargs)
        for ov in overrides:
            key, _, val = ov.partition(":")
            cfg._apply(key, val)
        return cfg

    @classmethod
    def from_yaml(cls, path: str, *overrides: str, **kwargs
                  ) -> "CrawlConfig":
        """Reference launch parity (``crawl.py --configfile config.yml
        --config Crawl.MaxDepth:3``): load a YAML config tree —
        ``Section:\\n  Key: value`` nesting or flat keys — then apply
        dotted CLI overrides, then explicit kwargs (highest
        precedence)."""
        import yaml
        with open(path) as f:
            tree = yaml.safe_load(f) or {}
        cfg = cls()
        for sect, v in tree.items():
            if isinstance(v, dict):
                for k, vv in v.items():
                    cfg._apply(f"{sect}.{k}", vv)
            else:
                try:
                    cfg._apply(str(sect), v)
                except KeyError:
                    cfg.extras[str(sect)] = v  # file keys are tolerated
        for ov in overrides:
            key, _, val = ov.partition(":")
            cfg._apply(key, val)
        for k, v in kwargs.items():
            setattr(cfg, k, v)
        return cfg

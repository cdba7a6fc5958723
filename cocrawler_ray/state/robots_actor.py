"""Per-partition robots cache (cocrawler/robots.py + datalayer TTL cache).

Each RobotsPartition owns the hosts with hash(host) % K == part (the same
partitioning as the frontier, per north_rule: "robots.txt decisions cached
in a per-partition actor"). Bodies come from the synthetic ``robots`` table
(the sandbox stand-in for fetching http://host/robots.txt); the parsed
rules are cached with a generation-based TTL (gen stands in for wall-clock:
ttl_gens generations ≈ the reference's cachetools TTL seconds).

The real-web slot: `fetch_body` is the single place an HTTP GET of
/robots.txt would plug in.
"""

from __future__ import annotations

import numpy as np

from cocrawler_ray.robots import RobotsRules, parse_robots


class RobotsPartition:
    def __init__(self, part: int, bodies: dict[str, str] | None = None,
                 ttl_gens: int = 10, user_agent: str = "cocrawler"):
        self.part = part
        self.bodies = bodies or {}
        self.ttl_gens = ttl_gens
        self.user_agent = user_agent
        self.cache: dict[str, tuple[RobotsRules, int]] = {}
        self.fetch_count = 0
        self.hit_count = 0

    def fetch_body(self, host: str) -> str | None:
        """Stand-in for GET http://{host}/robots.txt (real-web slot)."""
        self.fetch_count += 1
        return self.bodies.get(host)

    def _rules_for(self, host: str, gen: int) -> RobotsRules:
        hit = self.cache.get(host)
        if hit is not None and gen - hit[1] < self.ttl_gens:
            self.hit_count += 1
            return hit[0]
        rules = parse_robots(self.fetch_body(host))
        self.cache[host] = (rules, gen)
        return rules

    def check_batch(self, hosts, paths, gen: int = 0) -> np.ndarray:
        """Vectorized-per-host allow/deny for a batch of (host, path)."""
        n = len(hosts)
        out = np.zeros(n, dtype=bool)
        # group rows by host so each host's rules are resolved once per batch
        order = np.argsort(np.asarray(hosts, dtype=object), kind="stable")
        i = 0
        hosts_arr = np.asarray(hosts, dtype=object)
        paths_arr = np.asarray(paths, dtype=object)
        while i < n:
            j = i
            h = hosts_arr[order[i]]
            rules = self._rules_for(str(h), gen)
            while j < n and hosts_arr[order[j]] == h:
                idx = order[j]
                out[idx] = rules.allowed(str(paths_arr[idx]), self.user_agent)
                j += 1
            i = j
        return out

    def stats(self) -> dict[str, int]:
        return {"fetches": self.fetch_count, "hits": self.hit_count,
                "cached_hosts": len(self.cache)}

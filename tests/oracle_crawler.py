"""Single-process oracle crawler (FIXTURES.md F5, SURVEY §5#3).

A faithful ~150-LoC reimplementation of the engine's documented semantics
(generation waves, per-host politeness budget, deterministic
(priority, rand, surt) order, robots gate, seen set, depth/priority
scoring) used to validate the distributed engine's **final URL-seen set**
and **crawl ordering**. It shares only the leaf behavior modules
(urls/parse/robots/hashing) with the engine — the scheduling logic is
written independently against the spec, not imported from the pipeline.

(The real reference's tests/ corpus was absent this session; swap these
expectations for CoCrawler's corpus when /root/reference is populated.)
"""

from __future__ import annotations

import heapq

import numpy as np

from cocrawler_ray import parse, robots as robots_mod, urls
from cocrawler_ray.hashing import rand_for_surt
from cocrawler_ray.seeds import parse_seed_lines


class OracleCrawler:
    def __init__(self, web_urls: set[str], html_by_url: dict[str, str],
                 robots_bodies: dict[str, str], budget_per_host: int = 4,
                 max_depth: int = 6, max_gens: int = 50, seed: int = 42,
                 user_agent: str = "cocrawler", transient_every: int = 0,
                 max_tries: int = 4):
        self.web_urls = web_urls
        self.html_by_url = html_by_url
        self.robots = {h: robots_mod.parse_robots(b) for h, b in robots_bodies.items()}
        self.budget = budget_per_host
        # Crawl-delay image (same mapping as ShardHost._host_delays):
        # delay-d hosts get max(1, budget // d) per generation
        self.host_budget = {}
        for h, rules in self.robots.items():
            d = rules.crawl_delay(user_agent)
            if d and d > 1.0:
                self.host_budget[h] = max(1, int(budget_per_host // d))
        self.max_depth = max_depth
        self.max_gens = max_gens
        self.seed = seed
        self.ua = user_agent
        self.transient_every = transient_every
        self.max_tries = max_tries
        self.seen: set[str] = set()
        # host -> heap of (prio, rand, surt, url, depth, retries)
        self.frontier: dict[str, list] = {}
        self.fetch_log: list[tuple] = []  # (gen, priority, rand, surt, url, status)

    def _fetch_status(self, url: str, retries: int) -> tuple[int, str]:
        """(status, location) — mirrors FetcherPartition: deterministic
        transient 503s gated on the row's retry count, /aNNNNNN alias 301s
        when the same-host /pNNNNNN target exists, else 200/404."""
        from cocrawler_ray.hashing import hash64
        if self.transient_every and int(hash64([url])[0]) % self.transient_every == 0:
            fail_n = 1 + int(hash64([url + "#t"])[0]) % 2
            if retries < fail_n:
                return 503, ""
        if url in self.web_urls:
            return 200, ""
        j = url.rfind("/a")
        if j >= 0 and url[j + 2:].isdigit():
            target = url[:j] + "/p" + url[j + 2:]
            if target in self.web_urls:
                return 301, target
        return 404, ""

    def _rand(self, surt: str) -> int:
        return int(rand_for_surt([surt], seed=self.seed)[0])

    def add_url(self, raw: str, base: str | None, priority: int, depth: int) -> bool:
        c = urls.canonicalize(raw, base)
        if c is None or depth > self.max_depth:
            return False
        if c.surt in self.seen:
            return False
        self.seen.add(c.surt)
        heapq.heappush(self.frontier.setdefault(c.host, []),
                       (priority, self._rand(c.surt), c.surt, c.url, depth, 0))
        return True

    def add_seeds(self, seed_lines: list[str]) -> int:
        n = 0
        for u in parse_seed_lines(seed_lines):
            n += self.add_url(u, None, priority=1, depth=0)
        return n

    def _allowed(self, host: str, url: str) -> bool:
        rules = self.robots.get(host)
        if rules is None:
            return True
        path = "/" + url.split("/", 3)[3] if url.count("/") >= 3 else "/"
        return rules.allowed(path, self.ua)

    def run(self) -> None:
        for gen in range(self.max_gens):
            # drain: per host, pop up to budget best (priority, rand, surt)
            drained = []
            for host in sorted(self.frontier):
                heap = self.frontier[host]
                for _ in range(min(self.host_budget.get(host, self.budget),
                                   len(heap))):
                    p, r, surt, url, depth, retries = heapq.heappop(heap)
                    drained.append((p, r, surt, url, depth, retries, host))
                if not heap:
                    del self.frontier[host]
            if not drained:
                break
            # robots gate then fetch
            new_links = []  # (dst_surt, priority, src_surt, kind, dst_url, dst_host, depth)
            requeues = []   # (prio+1, rand, surt, url, depth, retries+1, host)
            for p, r, surt, url, depth, retries, host in drained:
                if not self._allowed(host, url):
                    continue
                status, location = self._fetch_status(url, retries)
                self.fetch_log.append((gen, p, r, surt, url, status))
                if status >= 500:
                    # engine: FrontierPartition.requeue (retries+1, prio+1),
                    # dropped when the NEXT attempt would exceed max_tries
                    if retries + 1 < self.max_tries:
                        requeues.append((p + 1, r, surt, url, depth, retries + 1, host))
                    continue
                if 300 <= status < 400:
                    # engine: redirect target inherits priority and depth
                    c = urls.canonicalize(location, url)
                    if c is not None:
                        new_links.append((c.surt, p, surt, "redirect", c.url, c.host, depth))
                    continue
                if status != 200:
                    continue
                html = self.html_by_url.get(url, "")
                base = parse.find_base(html, url)
                links, embeds = parse.find_html_links(html)
                for raw, kind in [(u, "href") for u in links] + [(u, "embed") for u in embeds]:
                    c = urls.canonicalize(raw, base)
                    if c is None or depth + 1 > self.max_depth:
                        continue
                    new_links.append((c.surt, p + 1, surt, kind, c.url, c.host, depth + 1))
            # in-gen dedup: winner = min (priority, src_surt, kind) per dst_surt
            best: dict[str, tuple] = {}
            for t in new_links:
                dst, prio, src, kind = t[0], t[1], t[2], t[3]
                cur = best.get(dst)
                if cur is None or (prio, src, kind) < (cur[1], cur[2], cur[3]):
                    best[dst] = t
            # seen gate + frontier append
            for dst, prio, src, kind, dst_url, dst_host, depth in best.values():
                if dst in self.seen:
                    continue
                self.seen.add(dst)
                heapq.heappush(self.frontier.setdefault(dst_host, []),
                               (prio, self._rand(dst), dst, dst_url, depth, 0))
            # requeues re-enter directly (already seen — no gate)
            for prio, r, surt, url, depth, retries, host in requeues:
                heapq.heappush(self.frontier.setdefault(host, []),
                               (prio, r, surt, url, depth, retries))

    # -- conformance views --------------------------------------------------

    def ordering(self) -> list[str]:
        """Fetched surts in conformance order: (gen, priority, rand, surt)."""
        return [t[3] for t in sorted(self.fetch_log)]

    def seen_hashes(self) -> np.ndarray:
        from cocrawler_ray.hashing import hash64
        arr = hash64(sorted(self.seen))
        arr.sort()
        return arr

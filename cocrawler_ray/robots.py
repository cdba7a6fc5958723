"""robots.txt parsing and allow/deny decisions (SURVEY §2.3 T3).

Behavioral analogue of ``cocrawler/robots.py::Robots.check``: parse a
robots.txt body into per-agent rule groups; answer allow/deny for
(path, user-agent) with the specific-UA section if present, else the ``*``
fallback; longest-path-match wins, Allow wins ties (Google/REP semantics).
Oversized bodies are treated as allow-all with a truncation flag; missing
bodies mean allow-all. Caching lives in state/robots_actor.py.
"""

from __future__ import annotations

MAX_ROBOTS_SIZE = 512 * 1024


class RobotsRules:
    """Parsed rules for one host. `groups`: lower-ua -> [(allow, path), ...].
    ``sitemaps``: the UA-independent ``Sitemap:`` directive URLs in file
    order (REP: sitemap lines live outside agent groups) — the crawl
    ecosystem's primary sitemap-discovery channel, fed to
    seeds/parse.find_sitemap_urls for seed expansion."""

    __slots__ = ("groups", "truncated", "delays", "sitemaps")

    def __init__(self, groups: dict[str, list[tuple[bool, str]]], truncated: bool = False,
                 delays: dict[str, float] | None = None,
                 sitemaps: list[str] | None = None):
        self.groups = groups
        self.truncated = truncated
        self.delays = delays or {}
        self.sitemaps = sitemaps or []

    def crawl_delay(self, user_agent: str = "cocrawler") -> float | None:
        """Declared Crawl-delay seconds for this UA (specific-UA section
        first, else '*'), None when absent — mirrors the reference's
        robots.py crawl-delay read that scheduler.py's burrow honors."""
        ua = user_agent.lower()
        for token, d in self.delays.items():
            if token != "*" and token in ua:
                return d
        return self.delays.get("*")

    def allowed(self, path: str, user_agent: str = "cocrawler") -> bool:
        if self.truncated:
            return True
        ua = user_agent.lower()
        rules = None
        # most-specific UA token match, else '*'
        for token, g in self.groups.items():
            if token != "*" and token in ua:
                rules = g
                break
        if rules is None:
            rules = self.groups.get("*")
        if not rules:
            return True
        best_len = -1
        best_allow = True
        for allow, prefix in rules:
            if _prefix_match(path, prefix) and len(prefix) > best_len:
                best_len = len(prefix)
                best_allow = allow
            elif _prefix_match(path, prefix) and len(prefix) == best_len and allow:
                best_allow = True
        return best_allow


def _prefix_match(path: str, prefix: str) -> bool:
    if prefix == "":
        return False
    if "*" in prefix or prefix.endswith("$"):
        # minimal wildcard support: '*' matches any run, '$' anchors end
        import re

        pat = re.escape(prefix).replace(r"\*", ".*")
        if pat.endswith(r"\$"):
            pat = pat[:-2] + "$"
        return re.match(pat, path) is not None
    return path.startswith(prefix)


def parse_robots(body: str | None) -> RobotsRules:
    """Parse a robots.txt body. None/empty body -> allow-all."""
    if body is None:
        return RobotsRules({})
    if len(body) > MAX_ROBOTS_SIZE:
        return RobotsRules({}, truncated=True)
    groups: dict[str, list[tuple[bool, str]]] = {}
    delays: dict[str, float] = {}
    sitemaps: list[str] = []
    current: list[str] = []
    last_was_rule = True
    for line in body.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            ua = val.lower()
            if last_was_rule:
                current = [ua]
            else:
                current.append(ua)  # consecutive UA lines share one group
            groups.setdefault(ua, [])
            last_was_rule = False
        elif key in ("allow", "disallow"):
            last_was_rule = True
            if not current:
                continue
            if key == "disallow" and val == "":
                continue  # empty Disallow = allow all (no rule)
            for ua in current:
                groups.setdefault(ua, []).append((key == "allow", val))
        elif key == "crawl-delay":
            last_was_rule = True
            try:
                d = float(val)
            except ValueError:
                continue
            if d > 0:
                for ua in current:
                    delays.setdefault(ua, d)
        elif key == "sitemap":
            last_was_rule = True  # UA-independent; ends a UA run
            if val and val not in sitemaps:
                sitemaps.append(val)
        else:
            last_was_rule = True  # unknown fields end a UA run
    return RobotsRules(groups, delays=delays, sitemaps=sitemaps)

"""Real-web HTTP fetcher backend — the adapter that proves the
``fetch(batch) -> batch`` interface carries a real crawler.

``FetcherPartition`` (fetch.py) resolves the sandbox's table-backed "web";
this module is the same interface over an HTTP client pool
(``cocrawler/fetcher.py::fetch`` semantics: per-request timeout, bounded
connection pool, per-host connection cap, redirect surfaced as 3xx +
Location rather than auto-followed, payload size cap). The sandbox has no
network and no aiohttp, so the CLIENT is injectable: production passes
aiohttp (import-tried below); tests pass any object with the same tiny
``get(url, timeout) -> (status, headers, body)`` surface and exercise the
full batch plumbing (DNS gate, ordering, schema, digests, truncation).

An actor-pool deployment is identical to the table-backed one: one
HttpFetcherBackend per ShardHost (or per map_batches actor), created once
in ``__init__`` — the event loop, TCP pool and DNS cache live for the
crawl, not per batch.
"""

from __future__ import annotations

import hashlib
import time

import numpy as np
import pyarrow as pa

from cocrawler_ray.state.dns import DnsCache

try:  # production client — absent in this sandbox
    import aiohttp  # noqa: F401
    HAS_AIOHTTP = True
except ImportError:
    HAS_AIOHTTP = False


class CookieJar:
    """Minimal RFC 6265 per-host cookie store (reference parity:
    ``cocrawler/cookies.py`` — the reference ships a deliberately
    no-op "Defective" jar as its DEFAULT policy, because a broad crawl
    must not accumulate unbounded session state, and a real per-session
    jar as the config alternative. Same knob here:
    ``cookie_policy="none"`` (default, no cookies ever) vs
    ``"per_host"`` (this jar).)

    Honors Set-Cookie name/value plus Domain (leading-dot and host-only
    semantics), Path (RFC 6265 path-match), Max-Age (precedence over
    Expires; <= 0 deletes), Expires, and Secure. Per-domain cookie count
    is capped so an adversarial server cannot balloon the actor."""

    MAX_PER_DOMAIN = 50

    def __init__(self):
        # (domain, path, name) -> (value, expires_ts|None, host_only,
        #                          secure)
        self._store: dict = {}

    @staticmethod
    def _domain_match(host: str, domain: str) -> bool:
        return host == domain or host.endswith("." + domain)

    @staticmethod
    def _path_match(req_path: str, cpath: str) -> bool:
        if req_path == cpath:
            return True
        if req_path.startswith(cpath):
            return cpath.endswith("/") or req_path[len(cpath)] == "/"
        return False

    def store(self, host: str, set_cookie_lines, default_path: str = "/"):
        import email.utils
        import http.cookies
        import time as _t
        for line in set_cookie_lines or ():
            try:
                c = http.cookies.SimpleCookie()
                c.load(line)
            except http.cookies.CookieError:
                continue
            for name, morsel in c.items():
                dom = morsel["domain"].lstrip(".").lower()
                host_only = not dom
                if not dom:
                    dom = host
                elif not self._domain_match(host, dom):
                    continue  # RFC 6265: reject foreign-domain cookies
                # RFC 6265 5.1.4 default-path: the request path up to
                # (not including) its right-most '/'
                dp = default_path[:default_path.rfind("/")] or "/" \
                    if default_path.startswith("/") else "/"
                cpath = morsel["path"] or dp
                expires = None
                if morsel["max-age"]:
                    try:
                        ma = int(morsel["max-age"])
                    except ValueError:
                        ma = None
                    if ma is not None:
                        if ma <= 0:
                            self._store.pop((dom, cpath, name), None)
                            continue
                        expires = _t.time() + ma
                elif morsel["expires"]:
                    try:
                        dt = email.utils.parsedate_to_datetime(
                            morsel["expires"])
                        expires = dt.timestamp()
                    except (TypeError, ValueError):
                        expires = None
                    if expires is not None and expires <= _t.time():
                        self._store.pop((dom, cpath, name), None)
                        continue
                n_dom = sum(1 for (d, _, _) in self._store if d == dom)
                if ((dom, cpath, name) not in self._store
                        and n_dom >= self.MAX_PER_DOMAIN):
                    continue
                self._store[(dom, cpath, name)] = (
                    morsel.value, expires, host_only,
                    bool(morsel["secure"]))

    def header_for(self, host: str, path: str,
                   secure: bool = False) -> str | None:
        import time as _t
        now = _t.time()
        out, dead = [], []
        for (dom, cpath, name), (val, exp, host_only, sec) in \
                self._store.items():
            if exp is not None and exp <= now:
                dead.append((dom, cpath, name))
                continue
            if sec and not secure:
                continue
            if host_only:
                if host != dom:
                    continue
            elif not self._domain_match(host, dom):
                continue
            if not self._path_match(path or "/", cpath):
                continue
            out.append((cpath, name, val))
        for k in dead:
            self._store.pop(k, None)
        if not out:
            return None
        # RFC 6265 5.4: longer (more specific) paths first
        out.sort(key=lambda t: (-len(t[0]), t[1]))
        return "; ".join(f"{n}={v}" for _, n, v in out)


class StdlibHttpClient:
    """Blocking HTTP/1.1 client over stdlib ``http.client`` — the
    in-tree live-socket default (aiohttp is absent in this sandbox, and
    a synchronous client is correct inside a Ray actor pool: concurrency
    comes from the POOL, one in-flight request per actor is the per-host
    politeness cap of ``cocrawler/fetcher.py::fetch``).

    Semantics matched to the reference fetch contract: per-request
    timeout, redirects surfaced as 3xx + Location (never auto-followed —
    ``http.client`` returns the raw response), connection reuse per host
    with a bounded keep-alive map, a ONE-retry-on-fresh-connection rule
    for stale pooled sockets (a server may close an idle keep-alive
    connection at any time — that is not a fetch failure), https via
    ``HTTPSConnection``, and a bounded body read (``max_bytes``) so an
    adversarial multi-GB page cannot balloon the actor before the
    caller's size cap applies. ``resolve(host) -> (addr, port) | None``
    lets tests aim synthetic hosts at a loopback server while the Host
    header still carries the logical host; production leaves it None
    and connects by name."""

    def __init__(self, resolve=None, max_conns: int = 64,
                 max_bytes: int | None = None,
                 cookie_policy: str = "none"):
        import collections
        self.resolve = resolve
        self.max_conns = max_conns
        self.max_bytes = max_bytes
        if cookie_policy not in ("none", "per_host"):
            raise ValueError(f"unknown cookie_policy {cookie_policy!r}")
        # reference default: the no-op jar (cocrawler/cookies.py
        # "Defective"); "per_host" opts into the real RFC 6265 jar
        self.jar = CookieJar() if cookie_policy == "per_host" else None
        self._conns: "collections.OrderedDict" = collections.OrderedDict()

    def _conn(self, scheme: str, host: str, port: int, timeout: float):
        """(key, conn, reused) — ``reused`` marks a pooled keep-alive
        socket, which may have been closed server-side while idle."""
        import http.client
        key = (scheme, host, port)
        conn = self._conns.pop(key, None)
        if conn is not None:
            return key, conn, True
        addr = (host, port)
        if self.resolve is not None:
            target = self.resolve(host)
            if target is None:
                raise ConnectionError(f"unresolvable host {host!r}")
            addr = target
        cls = (http.client.HTTPSConnection if scheme == "https"
               else http.client.HTTPConnection)
        conn = cls(addr[0], addr[1], timeout=timeout)
        while len(self._conns) >= self.max_conns:
            _, old = self._conns.popitem(last=False)
            old.close()
        return key, conn, False

    def get(self, url: str, timeout: float = 30.0):
        import urllib.parse
        u = urllib.parse.urlsplit(url)
        scheme = (u.scheme or "http").lower()
        host = u.hostname or ""
        port = u.port or (443 if scheme == "https" else 80)
        path = (u.path or "/") + (f"?{u.query}" if u.query else "")
        req_headers = {"Host": u.netloc}
        if self.jar is not None:
            ck = self.jar.header_for(host, u.path or "/",
                                     secure=scheme == "https")
            if ck:
                req_headers["Cookie"] = ck
        for attempt in (0, 1):
            key, conn, reused = self._conn(scheme, host, port, timeout)
            try:
                conn.request("GET", path, headers=req_headers)
                resp = conn.getresponse()
                if self.jar is not None:
                    # getheaders() collapses duplicate Set-Cookie lines
                    # into one dict slot — read them all off the message
                    self.jar.store(host,
                                   resp.msg.get_all("Set-Cookie") or (),
                                   default_path=u.path or "/")
                if self.max_bytes is not None:
                    body = resp.read(self.max_bytes + 1)
                    truncated = len(body) > self.max_bytes
                    body = body[: self.max_bytes]
                else:
                    body, truncated = resp.read(), False
                headers = dict(resp.getheaders())
                if truncated:
                    conn.close()  # unread tail: socket can't be reused
                else:
                    self._conns[key] = conn  # keep-alive for next request
                return resp.status, headers, body
            except Exception:
                conn.close()
                if reused and attempt == 0:
                    continue  # stale pooled socket — retry on a fresh one
                raise


def _default_client(max_bytes: int | None = None,
                    cookie_policy: str = "none"):
    # aiohttp (when present) would slot in here; the stdlib client is the
    # working live-socket default either way — one blocking request per
    # actor, pool-level concurrency.
    return StdlibHttpClient(max_bytes=max_bytes,
                            cookie_policy=cookie_policy)


class HttpFetcherBackend:
    """Same contract as FetcherPartition.fetch: one output row per input
    row, positionally aligned, fetched-table columns. Payloads are opaque
    bytes (image metadata columns are zeroed — a real pipeline decodes
    them downstream in the multimodal stages)."""

    def __init__(self, part: int, client=None, timeout_s: float = 30.0,
                 max_page_size: int = 1 << 20, resolver=None,
                 cookie_policy: str = "none"):
        self.part = part
        self.client = (client if client is not None
                       else _default_client(max_bytes=max_page_size,
                                            cookie_policy=cookie_policy))
        self.timeout_s = timeout_s
        self.max_page_size = max_page_size
        if resolver is not None:
            self.dns = DnsCache(resolver)
        elif client is None:
            # live default client -> real DNS (the synthetic resolver
            # NXDOMAINs every non-.test host, which would gate the live
            # path off the whole real web)
            from cocrawler_ray.state.dns import stdlib_resolver
            self.dns = DnsCache(stdlib_resolver)
        else:
            self.dns = DnsCache()  # injected client: synthetic closed world
        self.fetch_count = 0

    def fetch(self, batch: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        urls = batch.column("url").to_pylist()
        n = len(urls)
        self.fetch_count += n
        resolvable = self.dns.resolve_batch(batch.column("host").to_pylist())
        status = np.full(n, 444, dtype=np.int32)
        location = np.full(n, "", dtype=object)
        bodies: list[bytes | None] = [None] * n
        html: list[str] = [""] * n
        for i in np.flatnonzero(resolvable):
            try:
                st, headers, body = self.client.get(urls[i], timeout=self.timeout_s)
            except Exception:
                status[i] = 503  # connect/timeout -> retryable
                continue
            status[i] = int(st)
            # HTTP header names are case-insensitive (RFC 9110); clients/
            # servers legitimately send 'location:' / 'content-type:'
            hl = ({k.lower(): v for k, v in headers.items()}
                  if headers else {})
            location[i] = hl.get("location", "")
            if st == 200 and body is not None:
                body = body[: self.max_page_size]
                bodies[i] = body
                if hl.get("content-type", "").startswith("text/html"):
                    html[i] = body.decode("utf-8", errors="replace")
        digest = np.array([hashlib.sha256(b).hexdigest() if b is not None else ""
                           for b in bodies], dtype=object)
        ms = (time.perf_counter() - t0) * 1000.0 / max(1, n)
        zero32 = pa.array(np.zeros(n, dtype=np.int32))
        out = batch.select(["surt", "url", "host", "priority", "rand",
                            "depth", "gen", "part"])
        return (out
                .append_column("status", pa.array(status))
                .append_column("location", pa.array(location, pa.string()))
                .append_column("image_id", pa.array([""] * n, pa.string()))
                .append_column("bytes", pa.array(bodies, pa.binary()))
                .append_column("w", zero32)
                .append_column("h", zero32)
                .append_column("fmt", pa.array([""] * n, pa.string()))
                .append_column("caption", pa.array([""] * n, pa.string()))
                .append_column("phash", pa.array(np.zeros(n, dtype=np.int64)))
                .append_column("digest", pa.array(digest, pa.string()))
                .append_column("fetch_ms", pa.array(np.full(n, ms)))
                .append_column("html", pa.array(html, pa.string())))

    def stats(self) -> dict:
        return {"part": self.part, "fetched": self.fetch_count,
                "dns": self.dns.stats()}

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
                 max_bytes: int | None = None):
        import collections
        self.resolve = resolve
        self.max_conns = max_conns
        self.max_bytes = max_bytes
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
        for attempt in (0, 1):
            key, conn, reused = self._conn(scheme, host, port, timeout)
            try:
                conn.request("GET", path, headers={"Host": u.netloc})
                resp = conn.getresponse()
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


def _default_client(max_bytes: int | None = None):
    # aiohttp (when present) would slot in here; the stdlib client is the
    # working live-socket default either way — one blocking request per
    # actor, pool-level concurrency.
    return StdlibHttpClient(max_bytes=max_bytes)


class HttpFetcherBackend:
    """Same contract as FetcherPartition.fetch: one output row per input
    row, positionally aligned, fetched-table columns. Payloads are opaque
    bytes (image metadata columns are zeroed — a real pipeline decodes
    them downstream in the multimodal stages)."""

    def __init__(self, part: int, client=None, timeout_s: float = 30.0,
                 max_page_size: int = 1 << 20, resolver=None):
        self.part = part
        self.client = (client if client is not None
                       else _default_client(max_bytes=max_page_size))
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

"""T4 DNS cache + the real-HTTP backend adapter slot (T5).

The HTTP client is injectable, so these tests drive the FULL batch
plumbing (DNS gate, positional alignment, fetched schema, digest,
truncation, retryable connect errors) with a fake client — the aiohttp
wiring is the only thing that stays outside the sandbox.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from cocrawler_ray.hashing import rand_for_surt
from cocrawler_ray.state.dns import DnsCache, synthetic_resolver
from cocrawler_ray.stages.http_fetch import HttpFetcherBackend


def _frontier_batch(urls):
    hosts = [u.split("/")[2] for u in urls]
    n = len(urls)
    return pa.table({
        "surt": pa.array([f"s{i}" for i in range(n)], pa.string()),
        "url": pa.array(urls, pa.string()),
        "host": pa.array(hosts, pa.string()),
        "priority": pa.array(np.ones(n, dtype=np.int32)),
        "rand": pa.array(rand_for_surt([f"s{i}" for i in range(n)])),
        "depth": pa.array(np.zeros(n, dtype=np.int32)),
        "retries": pa.array(np.zeros(n, dtype=np.int32)),
        "seed_id": pa.array(np.arange(n, dtype=np.int64)),
        "gen": pa.array(np.zeros(n, dtype=np.int32)),
        "part": pa.array(np.zeros(n, dtype=np.int32)),
    })


# -- DNS cache ---------------------------------------------------------------

def test_dns_cache_hits_and_ttl():
    calls = []

    def resolver(host):
        calls.append(host)
        return synthetic_resolver(host)

    dns = DnsCache(resolver, ttl_gens=2)
    hosts = ["a.test", "b.test", "a.test", "nope.example"]
    ok = dns.resolve_batch(hosts, gen=0)
    assert ok.tolist() == [True, True, True, False]
    assert sorted(calls) == ["a.test", "b.test", "nope.example"]  # unique only
    dns.resolve_batch(["a.test"], gen=1)  # cached
    assert len(calls) == 3
    dns.resolve_batch(["a.test"], gen=5)  # TTL expired -> re-resolve
    assert len(calls) == 4
    assert dns.stats()["hits"] >= 1


def test_dns_resolver_deterministic():
    a1 = synthetic_resolver("h0001.test")
    a2 = synthetic_resolver("h0001.test")
    assert a1 == a2 and a1.startswith("10.")
    assert synthetic_resolver("example.com") is None


def test_table_fetcher_dns_gate():
    """FetcherPartition answers 444 for unresolvable hosts without
    consulting the web table."""
    from cocrawler_ray import synth
    from cocrawler_ray.stages.fetch import FetcherPartition
    web, html = synth.gen_web_tables(num_hosts=2, num_pages=10, seed=1)
    f = FetcherPartition(0, web, html)
    batch = _frontier_batch(["http://h0000.test/p000000",
                             "http://outside.example/x"])
    out = f.fetch(batch)
    assert out.column("status").to_pylist()[1] == 444
    assert out.column("status").to_pylist()[0] in (200, 404)


# -- HTTP adapter ------------------------------------------------------------

class FakeClient:
    def __init__(self):
        self.calls = []

    def get(self, url, timeout):
        self.calls.append(url)
        if url.endswith("/boom"):
            raise ConnectionError("reset")
        if url.endswith("/moved"):
            return 301, {"Location": url.replace("/moved", "/p1")}, b""
        if url.endswith("/big"):
            return 200, {"Content-Type": "application/octet-stream"}, b"x" * 4096
        return 200, {"Content-Type": "text/html"}, b"<a href='/p2'>x</a>"


def test_http_backend_schema_and_alignment():
    be = HttpFetcherBackend(0, client=FakeClient(), max_page_size=1024)
    urls = ["http://a.test/p1", "http://a.test/moved", "http://a.test/boom",
            "http://b.test/big", "http://nope.example/x"]
    out = be.fetch(_frontier_batch(urls))
    assert out.num_rows == 5
    assert out.column("url").to_pylist() == urls  # positional alignment
    st = out.column("status").to_pylist()
    assert st == [200, 301, 503, 200, 444]
    assert out.column("location").to_pylist()[1] == "http://a.test/p1"
    # page-size cap truncates the payload AND the digest matches it
    body = out.column("bytes").to_pylist()[3]
    assert len(body) == 1024
    assert out.column("digest").to_pylist()[3] == hashlib.sha256(body).hexdigest()
    # html only decoded for text/html
    assert out.column("html").to_pylist()[0].startswith("<a ")
    assert out.column("html").to_pylist()[3] == ""
    # schema matches the engine's fetched layout (+html transit column)
    from cocrawler_ray import schemas
    assert [f.name for f in schemas.FETCHED] + ["html"] == \
        [c for c in out.column_names if c not in ("retries", "seed_id")]


def test_http_backend_default_client_is_live():
    """With no injected client the backend now builds the stdlib
    live-socket client (StdlibHttpClient) — the in-tree default."""
    from cocrawler_ray.stages.http_fetch import StdlibHttpClient
    be = HttpFetcherBackend(0)
    assert isinstance(be.client, StdlibHttpClient)

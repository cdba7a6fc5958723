"""Live-socket fetch conformance (SURVEY §2 T5, the
``cocrawler/fetcher.py::fetch`` semantics over REAL sockets).

A stdlib ``http.server`` serves the synthetic corpus in-process (one
logical host per Host header, text/html pages, 301 alias redirects, 404
for unknown paths), and ``HttpFetcherBackend`` crawls it through the
in-tree ``StdlibHttpClient`` — per-request timeout, no auto-redirect,
keep-alive connection reuse. Conformance: a BFS over live sockets must
produce the SAME fetched table (status / location / html payload) and
the SAME extracted+canonicalized link set per generation as the
table-backed ``FetcherPartition`` on identical frontier batches.
"""

from __future__ import annotations

import hashlib
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pyarrow as pa
import pytest

from cocrawler_ray import parse, synth, urls
from cocrawler_ray.hashing import rand_for_surt
from cocrawler_ray.stages.fetch import FetcherPartition
from cocrawler_ray.stages.http_fetch import HttpFetcherBackend, StdlibHttpClient


def _make_handler(pages: dict):
    class SyntheticWebHandler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"  # keep-alive, so the client's
        # per-host connection reuse is actually exercised

        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            host = (self.headers.get("Host") or "").split(":")[0]
            body = pages.get((host, self.path))
            if body is not None:
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            # alias redirect: /aNNNNNN -> 301 /pNNNNNN when target exists
            if self.path.startswith("/a") and self.path[2:].isdigit():
                target = "/p" + self.path[2:]
                if (host, target) in pages:
                    self.send_response(301)
                    self.send_header("Location", f"http://{host}{target}")
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
            self.send_response(404)
            self.send_header("Content-Length", "0")
            self.end_headers()

    return SyntheticWebHandler


def _frontier_batch(url_list):
    hosts = [u.split("/")[2] for u in url_list]
    n = len(url_list)
    surts = [f"s{i}" for i in range(n)]
    return pa.table({
        "surt": pa.array(surts, pa.string()),
        "url": pa.array(url_list, pa.string()),
        "host": pa.array(hosts, pa.string()),
        "priority": pa.array(np.ones(n, dtype=np.int32)),
        "rand": pa.array(rand_for_surt(surts)),
        "depth": pa.array(np.zeros(n, dtype=np.int32)),
        "retries": pa.array(np.zeros(n, dtype=np.int32)),
        "seed_id": pa.array(np.arange(n, dtype=np.int64)),
        "gen": pa.array(np.zeros(n, dtype=np.int32)),
        "part": pa.array(np.zeros(n, dtype=np.int32)),
    })


@pytest.fixture(scope="module")
def live_web():
    web, html = synth.gen_web_tables(num_hosts=6, num_pages=60, seed=42)
    ids = html.column("image_id").to_pylist()
    docs = html.column("html").to_pylist()
    pages = {(f"{i[:5]}.test", "/" + i[6:]): d.encode() for i, d in
             zip(ids, docs)}
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(pages))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield web, html, srv.server_address[1]
    finally:
        srv.shutdown()
        srv.server_close()


def _next_urls(html_col, base_urls):
    """Shared link step: extract -> canonicalize -> dedupe, sorted."""
    out = set()
    for doc, base in zip(html_col, base_urls):
        if not doc:
            continue
        links, embeds = parse.find_html_links(doc)
        t = urls.canonicalize_batch(links + embeds, base)
        out.update(t["url"])
    return sorted(out)


def test_live_socket_matches_table_backend(live_web):
    web, html, port = live_web
    live = HttpFetcherBackend(
        0, client=StdlibHttpClient(resolve=lambda h: ("127.0.0.1", port)))
    table = FetcherPartition(0, web, html)

    ids = web.column("image_id").to_pylist()
    seeds = sorted({f"http://{i[:5]}.test/{i[6:]}" for i in ids})[:6]
    # adversarial rows: alias redirect, missing page, unresolvable host
    alias = seeds[0].rsplit("/", 1)[0] + "/a" + seeds[0].rsplit("/p", 1)[1]
    frontier = seeds + [alias, seeds[0].rsplit("/", 1)[0] + "/p999999",
                        "http://nope.example/x"]

    for gen in range(3):
        batch = _frontier_batch(frontier)
        got_live = live.fetch(batch)
        got_table = table.fetch(batch)
        assert (got_live.column("status").to_pylist()
                == got_table.column("status").to_pylist()), f"gen {gen}"
        assert (got_live.column("location").to_pylist()
                == got_table.column("location").to_pylist()), f"gen {gen}"
        lh = got_live.column("html").to_pylist()
        th = got_table.column("html").to_pylist()
        assert lh == th, f"gen {gen}: html payloads diverge"
        # the live digest covers the raw body bytes it actually received
        for body, dg, st in zip(got_live.column("bytes").to_pylist(),
                                got_live.column("digest").to_pylist(),
                                got_live.column("status").to_pylist()):
            if st == 200:
                assert dg == hashlib.sha256(body).hexdigest()
        # identical next-generation frontier from either path
        nxt_live = _next_urls(lh, batch.column("url").to_pylist())
        nxt_table = _next_urls(th, batch.column("url").to_pylist())
        assert nxt_live == nxt_table, f"gen {gen}"
        if not nxt_live:
            break
        frontier = nxt_live[:12]


def test_live_client_timeout_and_reuse(live_web):
    web, html, port = live_web
    client = StdlibHttpClient(resolve=lambda h: ("127.0.0.1", port))
    ids = web.column("image_id").to_pylist()
    url = f"http://{ids[0][:5]}.test/{ids[0][6:]}"
    s1, h1, b1 = client.get(url, timeout=5.0)
    s2, h2, b2 = client.get(url, timeout=5.0)  # keep-alive reuse
    assert s1 == s2 == 200 and b1 == b2 and len(client._conns) == 1
    with pytest.raises(ConnectionError):
        StdlibHttpClient(resolve=lambda h: None).get(url)


def _one_shot_server(pages, lowercase_headers=False):
    """Server that CLOSES the socket after every response without
    advertising Connection: close — the stale-keep-alive hazard every
    real server's idle timeout produces."""
    class OneShotHandler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):
            pass

        def do_GET(self):
            host = (self.headers.get("Host") or "").split(":")[0]
            body = pages.get((host, self.path))
            ct = "content-type" if lowercase_headers else "Content-Type"
            loc = "location" if lowercase_headers else "Location"
            if body is not None:
                self.send_response(200)
                self.send_header(ct, "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_response(301)
                self.send_header(loc, f"http://{host}/p000000")
                self.send_header("Content-Length", "0")
                self.end_headers()
            self.close_connection = True  # silent server-side close

    srv = ThreadingHTTPServer(("127.0.0.1", 0), OneShotHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv


def test_stale_keepalive_retries_on_fresh_connection():
    pages = {("h0000.test", "/p000000"): b"<html>ok</html>"}
    srv = _one_shot_server(pages)
    try:
        port = srv.server_address[1]
        client = StdlibHttpClient(resolve=lambda h: ("127.0.0.1", port))
        url = "http://h0000.test/p000000"
        s1, _, b1 = client.get(url, timeout=5.0)
        # the pooled socket is now dead server-side; the client must
        # retry once on a fresh connection, not surface a fetch failure
        s2, _, b2 = client.get(url, timeout=5.0)
        s3, _, b3 = client.get(url, timeout=5.0)
        assert (s1, s2, s3) == (200, 200, 200) and b1 == b2 == b3
    finally:
        srv.shutdown()
        srv.server_close()


def test_lowercase_headers_are_honored():
    pages = {("h0000.test", "/p000000"): b"<html><a href='/x'>x</a></html>"}
    srv = _one_shot_server(pages, lowercase_headers=True)
    try:
        port = srv.server_address[1]
        be = HttpFetcherBackend(
            0, client=StdlibHttpClient(resolve=lambda h: ("127.0.0.1", port)))
        out = be.fetch(_frontier_batch(["http://h0000.test/p000000",
                                        "http://h0000.test/a000000"]))
        assert out.column("status").to_pylist() == [200, 301]
        assert out.column("html").to_pylist()[0] != ""  # content-type seen
        assert (out.column("location").to_pylist()[1]
                == "http://h0000.test/p000000")  # location seen
    finally:
        srv.shutdown()
        srv.server_close()


def test_bounded_body_read(live_web):
    web, html, port = live_web
    ids = web.column("image_id").to_pylist()
    url = f"http://{ids[0][:5]}.test/{ids[0][6:]}"
    client = StdlibHttpClient(resolve=lambda h: ("127.0.0.1", port),
                              max_bytes=64)
    s, h, b = client.get(url, timeout=5.0)
    assert s == 200 and len(b) == 64
    assert len(client._conns) == 0  # truncated read: socket not reusable
    s2, _, b2 = client.get(url, timeout=5.0)  # still works on a fresh conn
    assert s2 == 200 and b2 == b


def test_https_scheme_selects_tls_connection():
    import http.client
    client = StdlibHttpClient()
    _, conn, reused = client._conn("https", "example.invalid", 443, 5.0)
    assert isinstance(conn, http.client.HTTPSConnection) and not reused
    _, conn2, _ = client._conn("http", "example.invalid", 80, 5.0)
    assert not isinstance(conn2, http.client.HTTPSConnection)


# --- cookie jar (reference: cocrawler/cookies.py — policy knob with a
# no-op default and a real per-session jar) ----------------------------

def _cookie_gated_server():
    """GET /login sets a session cookie (plus a decoy for another path);
    GET /secret returns 200 only when the session cookie comes back,
    403 otherwise. Cross-host isolation: the cookie names the host."""
    class CookieHandler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):
            pass

        def do_GET(self):
            host = (self.headers.get("Host") or "").split(":")[0]
            if self.path == "/login":
                body = b"<html>logged in</html>"
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Set-Cookie",
                                 f"session={host}-tok; Path=/")
                self.send_header("Set-Cookie",
                                 "scoped=x; Path=/other")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if self.path == "/secret":
                sent = self.headers.get("Cookie") or ""
                ok = f"session={host}-tok" in sent
                bad = "scoped=x" in sent  # must NOT leak across paths
                body = (b"<html>secret</html>"
                        if ok and not bad else b"")
                self.send_response(200 if ok and not bad else 403)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            self.send_response(404)
            self.send_header("Content-Length", "0")
            self.end_headers()

    srv = ThreadingHTTPServer(("127.0.0.1", 0), CookieHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv


def test_cookie_gated_page_fetches_with_per_host_policy():
    srv = _cookie_gated_server()
    try:
        port = srv.server_address[1]
        be = HttpFetcherBackend(
            0, client=StdlibHttpClient(
                resolve=lambda h: ("127.0.0.1", port),
                cookie_policy="per_host"))
        out1 = be.fetch(_frontier_batch(["http://site-a.test/login",
                                         "http://site-b.test/login"]))
        assert out1.column("status").to_pylist() == [200, 200]
        out2 = be.fetch(_frontier_batch(["http://site-a.test/secret",
                                         "http://site-b.test/secret"]))
        # each host's session cookie came back to ITS host only, and the
        # /other-scoped decoy was not sent to /secret
        assert out2.column("status").to_pylist() == [200, 200]
        assert "secret" in out2.column("html").to_pylist()[0]
    finally:
        srv.shutdown()
        srv.server_close()


def test_cookie_default_policy_sends_nothing():
    srv = _cookie_gated_server()
    try:
        port = srv.server_address[1]
        be = HttpFetcherBackend(
            0, client=StdlibHttpClient(
                resolve=lambda h: ("127.0.0.1", port)))  # policy: none
        be.fetch(_frontier_batch(["http://site-a.test/login"]))
        out = be.fetch(_frontier_batch(["http://site-a.test/secret"]))
        assert out.column("status").to_pylist() == [403]
    finally:
        srv.shutdown()
        srv.server_close()


def test_cookie_jar_semantics():
    from cocrawler_ray.stages.http_fetch import CookieJar
    jar = CookieJar()
    # host-only cookie: exact host, not subdomains
    jar.store("example.test", ["a=1; Path=/"])
    assert jar.header_for("example.test", "/") == "a=1"
    assert jar.header_for("sub.example.test", "/") is None
    # domain cookie: host + subdomains, foreign domains rejected
    jar.store("example.test", ["b=2; Domain=example.test; Path=/"])
    jar.store("example.test", ["evil=3; Domain=other.test; Path=/"])
    assert "b=2" in (jar.header_for("sub.example.test", "/") or "")
    assert "evil" not in (jar.header_for("other.test", "/") or "")
    # path scoping + RFC 6265 default-path derivation
    jar.store("example.test", ["p=4"], default_path="/app/login")
    assert "p=4" in jar.header_for("example.test", "/app/x")
    assert "p=4" not in (jar.header_for("example.test", "/") or "")
    # Max-Age=0 deletes; Secure withheld on http
    jar.store("example.test", ["a=1; Path=/; Max-Age=0"])
    assert "a=1" not in (jar.header_for("example.test", "/") or "")
    jar.store("example.test", ["s=5; Path=/; Secure"])
    assert "s=5" not in (jar.header_for("example.test", "/",
                                        secure=False) or "")
    assert "s=5" in jar.header_for("example.test", "/", secure=True)

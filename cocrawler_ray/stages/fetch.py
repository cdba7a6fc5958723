"""Fetch stage — persistent actor partition (SURVEY §2.3 T5).

Behavioral analogue of ``cocrawler/fetcher.py::fetch``: in the sandbox the
"network" is the Lance-shaped ``web`` table; a fetch is a zero-copy Arrow
key lookup (url -> row) emitting status, payload bytes, image metadata,
caption, phash, a sha256 payload digest (warc.py uses sha1) and timing.
The HTML body rides along (for the parse stage) and is dropped before the
fetched table is persisted.

Scale design: ``FetcherPartition`` instances are created ONCE per crawl job
(K persistent actors, co-partitioned with the frontier by hash(host)%K so
each fetcher holds connections/lookups for its own hosts) — not re-created
per generation or per map_batches pool. The web/web_html tables arrive
through the object store once per actor; the pandas-Index url->row lookup
is built once in __init__, then every fetch is a vectorized get_indexer +
Arrow take. A real-web backend replaces the table lookup with an HTTP
client pool behind the same ``fetch(batch) -> batch`` interface.
"""

from __future__ import annotations

import hashlib
import time

import numpy as np
import pandas as pd
import pyarrow as pa


class FetcherPartition:
    """``transient_every`` > 0 turns on deterministic transient failures
    (the sandbox image of connection resets / 5xx): a URL with
    ``hash64(url) % transient_every == 0`` answers 503 until the row's
    ``retries`` reaches ``1 + hash64(url + "#t") % 2`` — so MaxTries/
    requeue semantics (cocrawler/fetcher.py::fetch retry loop +
    scheduler.py::requeue_work) are exercised end-to-end. Alias URLs
    (path ``/aNNNNNN``) 301-redirect to the same host's ``/pNNNNNN`` page
    when that page exists (post_fetch.py::handle_redirect analogue)."""

    def __init__(self, part: int, web: pa.Table, html: pa.Table,
                 transient_every: int = 0, dns=None):
        from cocrawler_ray.state.dns import DnsCache
        self.part = part
        self.transient_every = transient_every
        # T4 DNS cache: hosts resolve through a TTL cache before any fetch
        # (cocrawler/dns.py prefetch semantics); unresolvable hosts answer
        # 444 (connect-failed, non-retryable) without touching the backend
        self.dns = dns if dns is not None else DnsCache()
        # contiguous tables: pa.Table.take on a multi-chunk binary column is
        # ~200x slower than on contiguous buffers (per-chunk gather). The
        # driver broadcasts single-chunk tables (CrawlJob combines before
        # ray.put), making this a zero-copy view of the shared plasma
        # buffers; the combine here is a safety net for other callers.
        if any(web.column(c).num_chunks > 1 for c in web.column_names):
            web = web.combine_chunks()
        if any(html.column(c).num_chunks > 1 for c in html.column_names):
            html = html.combine_chunks()
        self.web = web
        # url key = http://h{host}.test/p{page} derives from image_id "hHHHH/pPPPPPP"
        ids = web.column("image_id").to_pylist()
        urls = [f"http://{i[:5]}.test/{i[6:]}" for i in ids]
        self.index = pd.Index(urls)
        self.html_pos = pd.Index(html.column("image_id").to_pylist())
        self.html = html
        self.fetch_count = 0

    def fetch(self, batch: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        urls = batch.column("url").to_pylist()
        n = len(urls)
        self.fetch_count += n
        # DNS gate first (cache-hit for every warm host, one lookup per new)
        resolvable = self.dns.resolve_batch(batch.column("host").to_pylist())
        pos = self.index.get_indexer(urls)
        found = (pos >= 0) & resolvable

        # alias redirects: /aNNNNNN -> 301 to /pNNNNNN on the same host
        location = np.full(n, "", dtype=object)
        redirected = np.zeros(n, dtype=bool)
        for i in np.flatnonzero(~found & resolvable):
            u = urls[i]
            j = u.rfind("/a")
            if j >= 0 and u[j + 2:].isdigit():
                target = u[:j] + "/p" + u[j + 2:]
                if self.index.get_indexer([target])[0] >= 0:
                    location[i] = target
                    redirected[i] = True

        # deterministic transient 5xx (see class docstring)
        failing = np.zeros(n, dtype=bool)
        if self.transient_every:
            from cocrawler_ray.hashing import hash64
            h = hash64(urls)
            cand = (h % np.uint64(self.transient_every)) == 0
            if cand.any():
                fail_n = 1 + (hash64([urls[i] + "#t"
                                      for i in np.flatnonzero(cand)])
                              % np.uint64(2)).astype(np.int64)
                retries = batch.column("retries").to_numpy()[cand]
                failing[np.flatnonzero(cand)] = retries < fail_n
        failing &= resolvable
        found = found & ~failing
        redirected = redirected & ~failing
        location[failing] = ""
        sub = self.web.take(pa.array(pos[found], pa.int64()))

        def scatter(col, fill):
            out = np.full(n, fill, dtype=object)
            out[found] = col.to_pylist()
            return out

        bytes_col = scatter(sub.column("bytes"), None)
        w = np.zeros(n, dtype=np.int32); w[found] = sub.column("w").to_numpy()
        h = np.zeros(n, dtype=np.int32); h[found] = sub.column("h").to_numpy()
        fmt = scatter(sub.column("fmt"), "")
        caption = scatter(sub.column("caption"), "")
        phash = np.zeros(n, dtype=np.int64); phash[found] = sub.column("phash").to_numpy()
        image_id = scatter(sub.column("image_id"), "")
        status = np.where(~resolvable, 444,
                          np.where(found, 200,
                                   np.where(failing, 503,
                                            np.where(redirected, 301, 404)))
                          ).astype(np.int32)
        digest = np.array([hashlib.sha256(b).hexdigest() if b is not None else ""
                           for b in bytes_col], dtype=object)

        hpos = self.html_pos.get_indexer([i if i else "\x00" for i in image_id])
        html_col = np.full(n, "", dtype=object)
        ok = hpos >= 0
        if ok.any():
            html_col[ok] = self.html.column("html").take(pa.array(hpos[ok], pa.int64())).to_pylist()

        ms = (time.perf_counter() - t0) * 1000.0 / max(1, n)
        out = batch.select(["surt", "url", "host", "priority", "rand", "depth", "gen", "part"])
        return (out
                .append_column("status", pa.array(status))
                .append_column("location", pa.array(location, pa.string()))
                .append_column("image_id", pa.array(image_id, pa.string()))
                .append_column("bytes", pa.array(list(bytes_col), pa.binary()))
                .append_column("w", pa.array(w))
                .append_column("h", pa.array(h))
                .append_column("fmt", pa.array(fmt, pa.string()))
                .append_column("caption", pa.array(caption, pa.string()))
                .append_column("phash", pa.array(phash))
                .append_column("digest", pa.array(digest, pa.string()))
                .append_column("fetch_ms", pa.array(np.full(n, ms)))
                .append_column("html", pa.array(html_col, pa.string())))

    def stats(self) -> dict:
        return {"part": self.part, "fetched": self.fetch_count,
                "dns": self.dns.stats()}

"""Live HTTP status server for a running (or finished) crawl.

SURVEY §2 S6 (``cocrawler/webserver.py``): the reference runs an aiohttp
site inside the crawler process serving live counters, rates and hot
hosts. A Ray crawl has no single long-lived "crawler process" whose heap
holds the counters — the authoritative run state is the PERSISTED
metrics/manifest surface that every generation checkpoint flushes
(pipelines/crawl.py). So the Ray-native status page is a stdlib
``ThreadingHTTPServer`` over :func:`crawl_status` of the output
directory: it can run inside the driver, as a sidecar on any node that
sees the storage, or long after the crawl exited — each request
recomputes the summary from the current on-disk state, so a page reload
during a run shows the latest checkpointed generation.

Endpoints (content mirrors the reference's summary page):

- ``/`` — human HTML: totals, rates, last-generation row, hot hosts.
- ``/status.json`` — the :func:`crawl_status` dict as JSON (machine
  surface; the CLI's ``--status`` prints the same dict).
- ``/healthz`` — 200 ``ok`` (liveness for supervisors).

Stdlib-only by design (aiohttp is absent in this environment and
unnecessary: status traffic is human-scale, and ``ThreadingHTTPServer``
serves concurrent reloads fine). Each request re-reads only the metrics
/ manifest cells — KB-scale per checkpoint — never the data tables.
"""

from __future__ import annotations

import html
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def _render_html(status: dict) -> str:
    """Small dependency-free HTML rendering of the status dict."""
    def esc(v) -> str:
        return html.escape(str(v))

    rows = []
    totals = status.get("totals", {})
    if totals:
        rows.append("<h2>Totals</h2><table>")
        for k, v in totals.items():
            rows.append(f"<tr><td>{esc(k)}</td><td>{v:,}</td></tr>")
        if status.get("pages_per_sec") is not None:
            rows.append(f"<tr><td>pages/sec</td>"
                        f"<td>{esc(status['pages_per_sec'])}</td></tr>")
        if status.get("wall_s") is not None:
            rows.append(f"<tr><td>wall (s)</td>"
                        f"<td>{esc(status['wall_s'])}</td></tr>")
        rows.append("</table>")
    lg = status.get("last_gen")
    if lg:
        rows.append(f"<h2>Last generation "
                    f"(of {esc(status.get('gens', '?'))})</h2><table>")
        for k in sorted(lg):
            rows.append(f"<tr><td>{esc(k)}</td><td>{esc(lg[k])}</td></tr>")
        rows.append("</table>")
    hot = status.get("hot_hosts")
    if hot:
        rows.append("<h2>Hot hosts</h2><table>")
        for h, n in hot.items():
            rows.append(f"<tr><td>{esc(h)}</td><td>{n:,}</td></tr>")
        rows.append("</table>")
    cp = status.get("last_checkpoint")
    if cp:
        rows.append("<h2>Last checkpoint</h2><table>")
        for k in sorted(cp):
            rows.append(f"<tr><td>{esc(k)}</td><td>{esc(cp[k])}</td></tr>")
        rows.append("</table>")
    if not rows:
        rows.append("<p>No metrics persisted yet.</p>")
    return ("<!doctype html><html><head><title>crawl status</title>"
            "<style>body{font-family:monospace;margin:2em}"
            "table{border-collapse:collapse}"
            "td{border:1px solid #999;padding:2px 8px}</style></head>"
            f"<body><h1>crawl status — {esc(status.get('out', ''))}</h1>"
            + "".join(rows) +
            '<p><a href="/status.json">status.json</a></p></body></html>')


class StatusServer:
    """Serve :func:`crawl_status(out_dir)` over HTTP from a daemon thread.

    ``port=0`` binds an ephemeral port; read it back from ``.port`` after
    :meth:`start`. ``stop()`` shuts the listener down and joins the
    thread — tests and the CLI both own the lifecycle explicitly.
    """

    def __init__(self, out_dir: str, host: str = "127.0.0.1",
                 port: int = 0):
        self.out_dir = str(out_dir)
        self.host = host
        self.port = port
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    def _make_handler(self):
        out_dir = self.out_dir

        class StatusHandler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # no stderr chatter under Ray
                pass

            def _send(self, code: int, ctype: str, body: bytes) -> None:
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                path = self.path.split("?", 1)[0]
                if path == "/healthz":
                    self._send(200, "text/plain", b"ok")
                    return
                if path not in ("/", "/status.json"):
                    self._send(404, "text/plain", b"not found")
                    return
                # recompute per request: the persisted metrics surface IS
                # the live state (flushed every generation checkpoint)
                from cocrawler_ray.pipelines.crawl import crawl_status
                try:
                    status = crawl_status(out_dir)
                except Exception as e:  # storage mid-write / missing dir
                    self._send(503, "application/json",
                               json.dumps({"error": str(e)}).encode())
                    return
                if path == "/status.json":
                    self._send(200, "application/json",
                               json.dumps(status).encode())
                else:
                    self._send(200, "text/html; charset=utf-8",
                               _render_html(status).encode())

        return StatusHandler

    def start(self) -> "StatusServer":
        self._httpd = ThreadingHTTPServer((self.host, self.port),
                                          self._make_handler())
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        name="crawl-status-http",
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

    def __enter__(self) -> "StatusServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

"""S6 live HTTP status server (SURVEY §2 S6, ``cocrawler/webserver.py``).

A crawl runs to completion, then StatusServer serves its output dir;
the JSON endpoint must agree with the CLI's ``--status`` dict, the HTML
page must carry the headline numbers, and the server must track NEW
state written after it started (the live-during-a-run property: each
request re-reads the persisted metrics surface).
"""

from __future__ import annotations

import json
import urllib.request

import pyarrow.parquet as pq
import pytest

from cocrawler_ray import cli, synth
from cocrawler_ray.status_server import StatusServer


@pytest.fixture(scope="module")
def crawl_out(tmp_path_factory, ray_session, capsys_disabled=None):
    d = tmp_path_factory.mktemp("status")
    corpus = d / "corpus"
    synth.write_web_dataset(str(corpus), 6, 90, seed=7)
    pq.write_table(synth.gen_robots_table(6), d / "robots.parquet")
    seeds = d / "seeds.txt"
    seeds.write_text("\n".join(synth.gen_seed_lines(6, 90, num_seeds=3,
                                                    seed=7)))
    out = d / "out"
    rc = cli.main(["--seeds", str(seeds), "--web-dir", str(corpus),
                   "--robots", str(d / "robots.parquet"), "--out", str(out),
                   "--config", "num_parts:2", "--checkpoint-every", "2"])
    assert rc == 0
    return out


def _get(port: int, path: str) -> tuple[int, bytes]:
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}{path}", timeout=10) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:  # non-2xx still has a body
        return e.code, e.read()


def test_status_json_matches_cli(crawl_out):
    from cocrawler_ray.pipelines.crawl import crawl_status

    with StatusServer(str(crawl_out)) as srv:
        code, body = _get(srv.port, "/status.json")
        assert code == 200
        served = json.loads(body)
        assert served == json.loads(json.dumps(crawl_status(str(crawl_out))))
        assert served["totals"]["fetched"] > 0
        assert served["last_checkpoint"]["fetched_total"] == \
            served["totals"]["fetched"]


def test_status_html_and_health(crawl_out):
    with StatusServer(str(crawl_out)) as srv:
        code, body = _get(srv.port, "/healthz")
        assert (code, body) == (200, b"ok")
        code, body = _get(srv.port, "/")
        assert code == 200
        page = body.decode()
        st = json.loads(_get(srv.port, "/status.json")[1])
        assert "crawl status" in page
        if "hot_hosts" in st:  # only recorded when a host crosses the bar
            assert "Hot hosts" in page
        # headline totals appear in the page (comma-grouped rendering)
        assert f"{st['totals']['fetched']:,}" in page
        code, _ = _get(srv.port, "/nope")
        assert code == 404


def test_status_tracks_new_state(tmp_path, crawl_out):
    """Server started on an empty dir picks up state written later —
    the property that makes it live during a run."""
    out = tmp_path / "later"
    with StatusServer(str(out)) as srv:
        first = json.loads(_get(srv.port, "/status.json")[1])
        assert "totals" not in first  # nothing persisted yet
        # now a crawl writes into the dir the server is already watching
        import shutil
        shutil.copytree(crawl_out, out, dirs_exist_ok=True)
        second = json.loads(_get(srv.port, "/status.json")[1])
        assert second["totals"]["fetched"] > 0

"""WARC/1.0 sink golden tests (SURVEY §2.1 S3 — CCWARCWriter semantics:
request+response pairs, sha1 payload digest, per-record gzip members,
rotation, deterministic output)."""

from __future__ import annotations

import hashlib
import zlib

from cocrawler_ray import warc


def _write_sample(tmp_path, name="t", max_size=1 << 30):
    w = warc.WARCWriter(str(tmp_path), prefix=name, max_size=max_size)
    w.write_fetch("http://h0001.test/p000002", 0, 200, b"\x00PAYLOAD\xff\r\n\r\nX")
    w.write_fetch("http://h0001.test/a000003", 0, 301, b"",
                  location="http://h0001.test/p000003")
    w.close()
    return tmp_path / f"{name}-00000.warc.gz"


def test_warc_roundtrip_and_digest(tmp_path):
    path = _write_sample(tmp_path)
    recs = warc.read_warc_records(str(path))
    kinds = [r["WARC-Type"] for r in recs]
    assert kinds == ["warcinfo", "request", "response", "request", "response"]
    resp = recs[2]
    # HTTP head + binary payload round-trips byte-exact
    head, _, payload = resp["block"].partition(b"\r\n\r\n")
    assert head.startswith(b"HTTP/1.1 200 OK")
    assert payload == b"\x00PAYLOAD\xff\r\n\r\nX"
    assert resp["WARC-Payload-Digest"] == warc.sha1_b32(payload)
    # redirect response carries the Location header
    head301 = recs[4]["block"].partition(b"\r\n\r\n")[0]
    assert b"Location: http://h0001.test/p000003" in head301
    # request is linked to its response
    assert recs[1]["WARC-Concurrent-To"] == recs[2]["WARC-Record-ID"]


def test_warc_deterministic_bytes(tmp_path):
    a = _write_sample(tmp_path / "a")
    b = _write_sample(tmp_path / "b")
    assert a.read_bytes() == b.read_bytes()


def test_warc_rotation(tmp_path):
    w = warc.WARCWriter(str(tmp_path), prefix="r", max_size=500)
    for i in range(10):
        w.write_fetch(f"http://h.test/p{i:06d}", 0, 200, b"x" * 300)
    w.close()
    files = sorted(tmp_path.glob("r-*.warc.gz"))
    assert len(files) > 1, "size rotation did not trigger"
    # every file standalone-parses and starts with its own warcinfo
    total = 0
    for f in files:
        recs = warc.read_warc_records(str(f))
        assert recs[0]["WARC-Type"] == "warcinfo"
        assert recs[0]["WARC-Filename"] == f.name
        total += sum(1 for r in recs if r["WARC-Type"] == "response")
    assert total == 10


def test_warc_gzip_members_individually_seekable(tmp_path):
    """Each record is its own gzip member: decompressing the first member
    alone yields exactly the warcinfo record."""
    path = _write_sample(tmp_path)
    raw = path.read_bytes()
    d = zlib.decompressobj(wbits=31)
    first = d.decompress(raw)
    assert first.startswith(b"WARC/1.0\r\nWARC-Type: warcinfo")
    assert d.unused_data, "expected more gzip members after the first"


def test_warc_export_from_crawl(ray_session, tmp_path):
    """End-to-end: crawl -> write_warcs -> every fetched row has a response
    record whose payload digest matches the stored sha256 digest."""
    from cocrawler_ray import synth
    from cocrawler_ray.config import CrawlConfig
    from cocrawler_ray.pipelines.crawl import CrawlJob

    web, html = synth.gen_web_tables(num_hosts=6, num_pages=60, seed=42)
    seeds = synth.gen_seed_lines(6, 60, num_seeds=6, seed=42)
    cfg = CrawlConfig(out_dir=str(tmp_path), num_parts=2, budget_per_host=4,
                      max_depth=3, max_gens=4, seed=42)
    job = CrawlJob(cfg, web, html, {})
    job.run(seeds)
    out = job.write_warcs()
    fetched = job.fetched_table()
    assert out["records"] == fetched.num_rows
    by_url_gen = {}
    import pathlib
    for f in pathlib.Path(out["dir"]).glob("*.warc.gz"):
        for r in warc.read_warc_records(str(f)):
            if r["WARC-Type"] == "response":
                by_url_gen[(r["WARC-Target-URI"],)] = r
    n_checked = 0
    for row in fetched.to_pylist():
        rec = by_url_gen.get((row["url"],))
        assert rec is not None, row["url"]
        payload = rec["block"].partition(b"\r\n\r\n")[2]
        if row["status"] == 200:
            assert hashlib.sha256(payload).hexdigest() == row["digest"]
            n_checked += 1
    assert n_checked > 10


def test_read_warc_source_single_file(ray_session, tmp_path):
    """read_warc (the Ray Data source) parses a written series back into
    the fetched-shaped schema with byte-exact payloads and verified
    digests."""
    path = _write_sample(tmp_path)
    df = warc.read_warc([str(path)]).to_pandas()
    assert list(df.columns) == warc.WARC_FETCHED_SCHEMA.names
    assert len(df) == 2  # response records only
    assert bool(df["digest_ok"].all())
    by_url = dict(zip(df["url"], df["bytes"]))
    assert by_url["http://h0001.test/p000002"] == b"\x00PAYLOAD\xff\r\n\r\nX"
    r301 = df[df["url"] == "http://h0001.test/a000003"].iloc[0]
    assert int(r301["status"]) == 301
    assert r301["location"] == "http://h0001.test/p000003"


def test_read_warc_roundtrip_from_crawl(ray_session, tmp_path):
    """crawl -> write_warcs -> read_warc: the re-ingested Dataset matches
    the crawl's fetched table on url, status, and payload bytes, and the
    stored sha1 WARC digests re-verify (the reference ecosystem's
    crawl -> WARC -> re-parse reprocessing loop, SURVEY §2.1 S3)."""
    from cocrawler_ray import synth
    from cocrawler_ray.config import CrawlConfig
    from cocrawler_ray.pipelines.crawl import CrawlJob

    web, html = synth.gen_web_tables(num_hosts=6, num_pages=60, seed=42)
    seeds = synth.gen_seed_lines(6, 60, num_seeds=6, seed=42)
    cfg = CrawlConfig(out_dir=str(tmp_path), num_parts=2, budget_per_host=4,
                      max_depth=3, max_gens=4, seed=42)
    job = CrawlJob(cfg, web, html, {})
    job.run(seeds)
    out = job.write_warcs()
    fetched = job.fetched_table()

    df = warc.read_warc(out["dir"]).to_pandas()
    assert len(df) == fetched.num_rows
    assert bool(df["digest_ok"].all())
    got = {(u, int(s)): p for u, s, p in
           zip(df["url"], df["status"], df["bytes"])}
    for row in fetched.to_pylist():
        key = (row["url"], int(row["status"]))
        assert key in got, key
        assert got[key] == (row["bytes"] or b""), row["url"]


def test_parse_http_response_header_edge_cases():
    """RFC 9112: OWS after the header colon is optional, and names are
    case-insensitive — re-ingest must not lose content_type/location on
    'Header:value' or lowercase forms."""
    block = (b"HTTP/1.1 301 Moved\r\n"
             b"Content-Type:text/html\r\n"
             b"location:  http://a.test/target \r\n"
             b"\r\nBODY")
    status, ctype, loc, payload = warc._parse_http_response(block)
    assert status == 301
    assert ctype == "text/html"
    assert loc == "http://a.test/target"
    assert payload == b"BODY"


def test_warc_revisit_records_identical_payload_digest(tmp_path):
    """dedup_revisits: a repeated 200 payload becomes a headers-only
    revisit record (WARC 1.0 identical-payload-digest profile) pointing
    at the first capture; distinct payloads and non-200s still write
    full responses."""
    body = b"<html>same body</html>"
    w = warc.WARCWriter(str(tmp_path), prefix="rv", dedup_revisits=True)
    w.write_fetch("http://h0001.test/p000001", 0, 200, body)
    w.write_fetch("http://h0002.test/mirror", 0, 200, body)      # dup
    w.write_fetch("http://h0001.test/p000002", 0, 200, b"other")
    w.write_fetch("http://h0003.test/gone", 0, 404, b"")
    w.write_fetch("http://h0003.test/gone2", 0, 404, b"")  # 404s never dedup
    w.close()
    assert w.revisit_count == 1
    recs = warc.read_warc_records(str(tmp_path / "rv-00000.warc.gz"))
    by_type = [r["WARC-Type"] for r in recs]
    assert by_type.count("revisit") == 1
    assert by_type.count("response") == 4  # first 200, "other", two 404s
    rv = next(r for r in recs if r["WARC-Type"] == "revisit")
    assert rv["WARC-Target-URI"] == "http://h0002.test/mirror"
    assert rv["WARC-Refers-To-Target-URI"] == "http://h0001.test/p000001"
    assert rv["WARC-Profile"].endswith("identical-payload-digest")
    assert rv["WARC-Payload-Digest"] == warc.sha1_b32(body)
    # headers-only block: no payload bytes after the HTTP head
    head, _, payload = rv["block"].partition(b"\r\n\r\n")
    assert head.startswith(b"HTTP/1.1 200 OK") and payload == b""


def test_warc_default_off_keeps_bytes_identical(tmp_path):
    """The revisit knob must not perturb the default golden byte
    stream."""
    a = warc.WARCWriter(str(tmp_path / "a"), prefix="t")
    b = warc.WARCWriter(str(tmp_path / "b"), prefix="t",
                        dedup_revisits=False)
    for w in (a, b):
        w.write_fetch("http://h.test/x", 0, 200, b"dup")
        w.write_fetch("http://h.test/y", 0, 200, b"dup")
        w.close()
    assert ((tmp_path / "a" / "t-00000.warc.gz").read_bytes()
            == (tmp_path / "b" / "t-00000.warc.gz").read_bytes())

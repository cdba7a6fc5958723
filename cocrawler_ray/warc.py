"""Minimal WARC/1.0 writer — the reference's CCWARCWriter semantics
(``cocrawler/warc.py``: request+response record pairs per fetch, sha1
payload digest, per-record gzip members, size-based file rotation) written
from scratch against the public WARC/1.0 spec (ISO 28500; the warcio
library is absent in this sandbox).

Engine mapping: the crawl loop persists fetched rows as Parquet cells (the
queryable store); ``write_warc_from_fetched`` is the optional archival
datasink that renders those rows as standard WARC files — a streaming Ray
Data pass writing one rotated .warc.gz series per input block directory,
so a failed export can skip finished parts (resumable output).

Determinism for golden tests: record ids are uuid5 of (url, gen, kind) and
the caller supplies the WARC-Date — no wall clock, so byte-identical runs.
"""

from __future__ import annotations

import base64
import gzip
import hashlib
import io
import uuid
from pathlib import Path

import pyarrow as pa

_NS = uuid.UUID("6ba7b811-9dad-11d1-80b4-00c04fd430c8")  # RFC 4122 URL ns


def sha1_b32(payload: bytes) -> str:
    """WARC-Payload-Digest value: sha1 in base32 (spec convention)."""
    return "sha1:" + base64.b32encode(hashlib.sha1(payload).digest()).decode()


def _record(warc_type: str, rec_id: str, date: str, headers: list[tuple[str, str]],
            block: bytes) -> bytes:
    head = [f"WARC/1.0",
            f"WARC-Type: {warc_type}",
            f"WARC-Record-ID: <urn:uuid:{rec_id}>",
            f"WARC-Date: {date}"]
    head += [f"{k}: {v}" for k, v in headers]
    head.append(f"Content-Length: {len(block)}")
    return ("\r\n".join(head) + "\r\n\r\n").encode() + block + b"\r\n\r\n"


class WARCWriter:
    """Size-rotated .warc.gz series; each record is its own gzip member
    (the standard layout that lets readers seek to member offsets)."""

    def __init__(self, dest_dir: str, prefix: str = "crawl",
                 max_size: int = 1 << 30, date: str = "2026-01-01T00:00:00Z",
                 software: str = "cocrawler-ray/2.0",
                 dedup_revisits: bool = False,
                 max_digests: int = 1 << 20):
        self.dest = Path(dest_dir)
        self.dest.mkdir(parents=True, exist_ok=True)
        self.prefix = prefix
        self.max_size = max_size
        self.date = date
        self.software = software
        # WARC 1.0 revisit records (identical-payload-digest profile):
        # a 200 whose payload digest was already written in THIS series
        # becomes a headers-only revisit record pointing at the first
        # capture — the standard archive-side dedup for recrawls and
        # mirrored content. Per-writer digest memory is capped
        # (max_digests); past the cap new digests simply write full
        # responses again (correct, just less compact).
        self.dedup_revisits = dedup_revisits
        self.max_digests = max_digests
        self._digests: dict[str, str] = {}
        self.revisit_count = 0
        self.serial = -1
        self._fh: io.BufferedWriter | None = None
        self._rotate()

    @property
    def path(self) -> Path:
        return self.dest / f"{self.prefix}-{self.serial:05d}.warc.gz"

    def _rotate(self) -> None:
        if self._fh is not None:
            self._fh.close()
        self.serial += 1
        self._fh = open(self.path, "wb")
        info_id = str(uuid.uuid5(_NS, f"{self.prefix}-{self.serial}-warcinfo"))
        block = (f"software: {self.software}\r\n"
                 f"format: WARC File Format 1.0\r\n").encode()
        self._write_member(_record(
            "warcinfo", info_id, self.date,
            [("Content-Type", "application/warc-fields"),
             ("WARC-Filename", self.path.name)], block))

    def _write_member(self, record: bytes) -> None:
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(record)
        self._fh.write(buf.getvalue())

    def write_fetch(self, url: str, gen: int, status: int, payload: bytes,
                    content_type: str = "application/octet-stream",
                    location: str = "") -> None:
        """One request+response record pair (CCWARCWriter.write_request_
        response_pair analogue)."""
        if self._fh.tell() > self.max_size:
            self._rotate()
        req_id = str(uuid.uuid5(_NS, f"{url}#{gen}#request"))
        resp_id = str(uuid.uuid5(_NS, f"{url}#{gen}#response"))
        host = url.split("/", 3)[2] if url.count("/") >= 3 else url
        path = "/" + url.split("/", 3)[3] if url.count("/") >= 3 else "/"
        req_http = (f"GET {path} HTTP/1.1\r\nHost: {host}\r\n"
                    f"User-Agent: {self.software}\r\n\r\n").encode()
        self._write_member(_record(
            "request", req_id, self.date,
            [("WARC-Target-URI", url),
             ("Content-Type", "application/http; msgtype=request"),
             ("WARC-Concurrent-To", f"<urn:uuid:{resp_id}>")], req_http))
        reason = {200: "OK", 301: "Moved Permanently", 404: "Not Found",
                  503: "Service Unavailable"}.get(status, "Unknown")
        http_head = [f"HTTP/1.1 {status} {reason}",
                     f"Content-Type: {content_type}",
                     f"Content-Length: {len(payload)}"]
        if location:
            http_head.append(f"Location: {location}")
        digest = sha1_b32(payload)
        if self.dedup_revisits and status == 200:
            first_url = self._digests.get(digest)
            if first_url is not None:
                # WARC 1.0 §6.7.2 revisit, identical-payload-digest
                # profile: HTTP headers only, no payload bytes
                head_http = ("\r\n".join(http_head) + "\r\n\r\n").encode()
                self._write_member(_record(
                    "revisit", resp_id, self.date,
                    [("WARC-Target-URI", url),
                     ("WARC-Profile", "http://netpreserve.org/warc/1.0/"
                                      "revisit/identical-payload-digest"),
                     ("WARC-Refers-To-Target-URI", first_url),
                     ("Content-Type",
                      "application/http; msgtype=response"),
                     ("WARC-Payload-Digest", digest)], head_http))
                self.revisit_count += 1
                return
            if len(self._digests) < self.max_digests:
                self._digests[digest] = url
        resp_http = ("\r\n".join(http_head) + "\r\n\r\n").encode() + payload
        self._write_member(_record(
            "response", resp_id, self.date,
            [("WARC-Target-URI", url),
             ("Content-Type", "application/http; msgtype=response"),
             ("WARC-Payload-Digest", digest)], resp_http))

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None


def write_batch(t: pa.Table, dest_dir: str, part_name: str,
                max_size: int = 1 << 30,
                date: str = "2026-01-01T00:00:00Z",
                dedup_revisits: bool = False) -> int:
    """Render one fetched-table batch as its own WARC series (one series
    per part => a re-run overwrites rather than appends: resumable).
    ``dedup_revisits``: repeated payloads within the series become
    headers-only revisit records (digest scope is per-series, matching
    the partition-resumable layout — cross-series dedup would make a
    series' bytes depend on other partitions' completion order)."""
    w = WARCWriter(dest_dir, prefix=part_name, max_size=max_size, date=date,
                   dedup_revisits=dedup_revisits)
    urls = t.column("url").to_pylist()
    gens = t.column("gen").to_pylist()
    statuses = t.column("status").to_pylist()
    payloads = t.column("bytes").to_pylist()
    locs = (t.column("location").to_pylist() if "location" in t.column_names
            else [""] * t.num_rows)
    for u, g, s, p, loc in zip(urls, gens, statuses, payloads, locs):
        w.write_fetch(u, int(g), int(s), p or b"", location=loc or "")
    w.close()
    return t.num_rows


def write_warc_from_fetched(fetched_files: list[str], dest_dir: str,
                            max_size: int = 1 << 30,
                            date: str = "2026-01-01T00:00:00Z") -> int:
    """Distributed export: one Ray task per fetched Parquet cell, each
    rendering EXACTLY ONE WARC series named after its cell (a batch-split
    pipeline would let two batches of the same file collide on the series
    prefix and overwrite each other's rotation counter). Cell-per-task is
    also the resume unit: a re-run regenerates each series idempotently."""
    import ray

    @ray.remote
    def render(path: str) -> int:
        # format-agnostic cell read (Parquet shim or Lance dataset dir —
        # storage.py dispatches the codec), matching write_logs/export
        from cocrawler_ray.storage import _read_cell_file
        return write_batch(_read_cell_file(Path(path)), dest_dir,
                           Path(path).stem, max_size, date)

    return sum(ray.get([render.remote(f) for f in fetched_files]))


def records_from_bytes(data: bytes) -> list[dict]:
    """Parse decompressed WARC/1.0 bytes into {headers..., "block": bytes}
    dicts — a sequential Content-Length-driven reader (payloads are
    binary, so splitting on blank lines would corrupt them)."""
    out = []
    pos = 0
    while pos < len(data):
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break
        head = data[pos:head_end].decode()
        if not head.startswith("WARC/1.0"):
            pos = head_end + 4
            continue
        rec: dict = {}
        for ln in head.split("\r\n")[1:]:
            k, _, v = ln.partition(": ")
            rec[k] = v
        n = int(rec["Content-Length"])
        block_start = head_end + 4
        rec["block"] = data[block_start:block_start + n]
        out.append(rec)
        pos = block_start + n + 4  # skip the two trailing CRLFs
    return out


def read_warc_records(path: str) -> list[dict]:
    """Parse one .warc.gz file (all gzip members) into record dicts.
    Driver-side primitive; the distributed source is :func:`read_warc`."""
    with gzip.open(path, "rb") as fh:
        return records_from_bytes(fh.read())


def _parse_http_response(block: bytes) -> tuple[int, str, str, bytes]:
    """(status, content_type, location, payload) from an HTTP response
    block of a WARC response record."""
    head_end = block.find(b"\r\n\r\n")
    if head_end < 0:
        return 0, "", "", b""
    lines = block[:head_end].decode("latin-1").split("\r\n")
    parts = lines[0].split(" ")
    status = int(parts[1]) if len(parts) > 1 and parts[1].isdigit() else 0
    ctype = loc = ""
    for ln in lines[1:]:
        # split on ':' (OWS after the colon is optional per RFC 9112 —
        # 'Content-Type:text/html' is legal), then trim the value
        k, _, v = ln.partition(":")
        lk, v = k.lower(), v.strip()
        if lk == "content-type":
            ctype = v
        elif lk == "location":
            loc = v
    return status, ctype, loc, block[head_end + 4:]


WARC_FETCHED_SCHEMA = pa.schema([
    ("url", pa.string()), ("host", pa.string()), ("status", pa.int32()),
    ("content_type", pa.string()), ("location", pa.string()),
    ("bytes", pa.large_binary()), ("digest", pa.string()),
    ("digest_ok", pa.bool_()), ("warc_date", pa.string()),
    ("warc_file", pa.string()),
])


def warc_bytes_to_table(data: bytes, source_path: str = "") -> pa.Table:
    """Response records of one .warc.gz file -> a fetched-shaped Arrow
    table (the read-back half of the reference ecosystem's crawl -> WARC
    -> re-parse loop; write side: :class:`WARCWriter`). ``digest_ok``
    re-verifies the stored WARC-Payload-Digest against the payload."""
    cols: dict[str, list] = {n: [] for n in WARC_FETCHED_SCHEMA.names}
    if data[:2] == b"\x1f\x8b":  # raw .warc.gz bytes; Ray's
        data = gzip.decompress(data)  # read_binary_files may have
    for rec in records_from_bytes(data):  # already inflated by extension
        if rec.get("WARC-Type") != "response":
            continue
        status, ctype, loc, payload = _parse_http_response(rec["block"])
        url = rec.get("WARC-Target-URI", "")
        host = url.split("/", 3)[2] if url.count("/") >= 3 else url
        digest = rec.get("WARC-Payload-Digest", "")
        cols["url"].append(url)
        cols["host"].append(host)
        cols["status"].append(status)
        cols["content_type"].append(ctype)
        cols["location"].append(loc)
        cols["bytes"].append(payload)
        cols["digest"].append(digest)
        cols["digest_ok"].append(digest == sha1_b32(payload))
        cols["warc_date"].append(rec.get("WARC-Date", ""))
        cols["warc_file"].append(source_path)
    return pa.table(
        {n: pa.array(cols[n], WARC_FETCHED_SCHEMA.field(n).type)
         for n in WARC_FETCHED_SCHEMA.names})


def read_warc(paths):
    """WARC read-back SOURCE: one or more .warc.gz files (or a directory
    of them) -> a streaming ``ray.data.Dataset`` with
    :data:`WARC_FETCHED_SCHEMA` — the re-ingest half of the reference
    ecosystem's reprocessing loop (crawl -> WARC -> re-parse), so
    archives written by :func:`write_warc_from_fetched` feed straight
    back into the parse/link-extract/dedup stages.

    Ray-Data-native: ``read_binary_files`` streams one file per row (the
    file is the partition/resume unit the writer produced), and a
    ``map_batches`` pass parses each into a fetched-shaped Arrow table —
    no driver-side parsing, no full-archive materialization. Per-record
    gzip members mean a corrupted tail truncates one file's parse, never
    the whole read."""
    import ray.data as rd

    p = Path(paths) if isinstance(paths, (str, Path)) else None
    if p is not None and p.is_dir():
        paths = sorted(str(f) for f in p.glob("*.warc.gz"))

    ds = rd.read_binary_files(paths, include_paths=True)

    def parse(t: pa.Table) -> pa.Table:
        tabs = [warc_bytes_to_table(data.as_py(), path.as_py())
                for path, data in zip(t["path"], t["bytes"])]
        return (pa.concat_tables(tabs) if tabs
                else WARC_FETCHED_SCHEMA.empty_table())

    return ds.map_batches(parse, batch_format="pyarrow")

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
                 software: str = "cocrawler-ray/2.0"):
        self.dest = Path(dest_dir)
        self.dest.mkdir(parents=True, exist_ok=True)
        self.prefix = prefix
        self.max_size = max_size
        self.date = date
        self.software = software
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
        resp_http = ("\r\n".join(http_head) + "\r\n\r\n").encode() + payload
        self._write_member(_record(
            "response", resp_id, self.date,
            [("WARC-Target-URI", url),
             ("Content-Type", "application/http; msgtype=response"),
             ("WARC-Payload-Digest", sha1_b32(payload))], resp_http))

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None


def write_batch(t: pa.Table, dest_dir: str, part_name: str,
                max_size: int = 1 << 30,
                date: str = "2026-01-01T00:00:00Z") -> int:
    """Render one fetched-table batch as its own WARC series (one series
    per part => a re-run overwrites rather than appends: resumable)."""
    w = WARCWriter(dest_dir, prefix=part_name, max_size=max_size, date=date)
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


def read_warc_records(path: str) -> list[dict]:
    """Parse a .warc.gz series back into {headers..., "block": bytes}
    dicts — a sequential Content-Length-driven reader (payloads are
    binary, so splitting on blank lines would corrupt them). Enough of
    the spec to round-trip and verify our own writer."""
    out = []
    with gzip.open(path, "rb") as fh:
        data = fh.read()
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

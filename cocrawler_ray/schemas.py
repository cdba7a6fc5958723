"""Arrow schemas for every logical table in the engine (SURVEY.md §1.2).

Schema-on-write: every stage validates its output against these, and the
storage shim refuses to write a table whose schema does not match. The
``web`` schema is the authoritative input shape from
``BASELINE.json:input_hint`` (Lance table of image + caption pairs).
"""

from __future__ import annotations

import pyarrow as pa

# The crawlable corpus — stands in for the remote web. `image_id` doubles as
# the URL path: page URL = http://{host}/{image_id-page-part}.
WEB = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),  # raw16 | pngz | qnt
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)

# The synthetic HTML bodies live beside the web table (one row per page).
WEB_HTML = pa.schema(
    [
        ("image_id", pa.string()),
        ("html", pa.string()),
    ]
)

# Frontier rows — what cocrawler keeps as (priority, rand, id) queue tuples
# plus the `ridealong` dict (cocrawler/scheduler.py::queue_work).
FRONTIER = pa.schema(
    [
        ("surt", pa.string()),
        ("url", pa.string()),
        ("host", pa.string()),
        ("priority", pa.int32()),
        ("rand", pa.uint64()),
        ("depth", pa.int32()),
        ("retries", pa.int32()),
        ("seed_id", pa.int64()),
        ("gen", pa.int32()),
        ("part", pa.int32()),
    ]
)

# Fetched rows — fetch response + payload (cocrawler/fetcher.py::fetch +
# WARC payload, cocrawler/warc.py).
FETCHED = pa.schema(
    [
        ("surt", pa.string()),
        ("url", pa.string()),
        ("host", pa.string()),
        ("priority", pa.int32()),
        ("rand", pa.uint64()),
        ("depth", pa.int32()),
        ("gen", pa.int32()),
        ("part", pa.int32()),
        ("status", pa.int32()),
        ("location", pa.string()),  # 3xx redirect target ("" otherwise)
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
        ("digest", pa.string()),  # sha256 of payload (warc.py uses sha1)
        ("fetch_ms", pa.float64()),
    ]
)

# Extracted links (cocrawler/parse.py link/embed lists, exploded).
LINKS = pa.schema(
    [
        ("src_surt", pa.string()),
        ("dst_url", pa.string()),
        ("dst_surt", pa.string()),
        ("dst_host", pa.string()),
        ("kind", pa.string()),  # href | embed | redirect | seed
        ("priority", pa.int32()),
        ("depth", pa.int32()),
    ]
)

# Robots bodies / parsed decisions (cocrawler/robots.py cache).
ROBOTS = pa.schema(
    [
        ("host", pa.string()),
        ("body", pa.string()),
        ("ttl_s", pa.int32()),
    ]
)

# Metrics rows (cocrawler/stats.py counters, persisted per generation).
METRICS = pa.schema(
    [
        ("gen", pa.int32()),
        ("part", pa.int32()),
        ("name", pa.string()),
        ("value", pa.float64()),
        ("ts", pa.timestamp("us")),
    ]
)

# Per-partition checkpoint lineage (replaces cocrawler's whole-state pickle,
# cocrawler/__init__.py::Crawler.save/load).
LINEAGE = pa.schema(
    [
        ("gen", pa.int32()),
        ("part", pa.int32()),
        ("table", pa.string()),
        ("in_rows", pa.int64()),
        ("out_rows", pa.int64()),
        ("checkpoint_uri", pa.string()),
    ]
)

ALL_SCHEMAS: dict[str, pa.Schema] = {
    "web": WEB,
    "web_html": WEB_HTML,
    "frontier": FRONTIER,
    "fetched": FETCHED,
    "links": LINKS,
    "robots": ROBOTS,
    "metrics": METRICS,
    "lineage": LINEAGE,
}


def validate(table: pa.Table, name: str) -> pa.Table:
    """Cast `table` to the registered schema (raises on mismatch)."""
    want = ALL_SCHEMAS[name]
    if table.schema.equals(want):
        return table
    return table.select(want.names).cast(want)

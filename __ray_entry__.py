"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in cocrawler_ray) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: crawl a deterministic Lance-shaped image+caption
    corpus (BASELINE.json input_hint) end-to-end — frontier drain -> robots
    -> fetch -> parse -> canonicalize -> dedup -> seen -> frontier append —
    and link-extract over the sf0.001 documents table. Returns the fetched
    table (image payloads + captions + digests)."""
    import ray.data as rd

    from cocrawler_ray import synth
    from cocrawler_ray.config import CrawlConfig
    from cocrawler_ray.pipelines.crawl import CrawlJob
    from cocrawler_ray.queries import QUERIES

    # exercise the testdata path (link extraction over documents.text)
    _ = QUERIES["q_link_extract"]("/root/testdata/sf0.001").take(5)

    web, html = synth.gen_web_tables(num_hosts=8, num_pages=120, seed=42)
    robots_t = synth.gen_robots_table(8)
    seeds = synth.gen_seed_lines(8, 120, num_seeds=10, seed=42)
    robots_bodies = dict(zip(robots_t.column("host").to_pylist(),
                             robots_t.column("body").to_pylist()))
    out_dir = tempfile.mkdtemp(prefix="cocrawler_entry_")
    cfg = CrawlConfig(out_dir=out_dir, num_parts=2, budget_per_host=4,
                      max_depth=3, max_gens=4, seed=42, fetch_concurrency=2)
    job = CrawlJob(cfg, web, html, robots_bodies)
    job.run(seeds)
    return rd.read_parquet(job.storage.table_files("fetched"))


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from cocrawler_ray.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; the rest
    (heuristic/sketch/approximate ops) get the driver's rows-only check."""
    from cocrawler_ray.queries import ORACLE

    return dict(ORACLE)

"""Crawl-delay politeness (reference robots.py crawl-delay read +
scheduler.py burrow): parser, per-host drain budgets, and end-to-end
engine-vs-oracle conformance on a delay-bearing corpus."""

from __future__ import annotations

import numpy as np
import pytest

from cocrawler_ray import synth
from cocrawler_ray.robots import parse_robots
from tests.oracle_crawler import OracleCrawler
from tests.test_crawl import engine_ordering

N_HOSTS, N_PAGES, SEED = 30, 240, 42


def test_parse_crawl_delay():
    r = parse_robots("User-agent: *\nCrawl-delay: 2.5\nDisallow: /x\n")
    assert r.crawl_delay("cocrawler") == 2.5
    r = parse_robots("User-agent: cocrawler\nCrawl-delay: 4\n\n"
                     "User-agent: *\nCrawl-delay: 1\n")
    assert r.crawl_delay("cocrawler") == 4.0
    assert r.crawl_delay("otherbot") == 1.0
    assert parse_robots("User-agent: *\nDisallow: /\n").crawl_delay() is None
    # malformed / non-positive values are ignored
    assert parse_robots("User-agent: *\nCrawl-delay: soon\n").crawl_delay() is None
    assert parse_robots("User-agent: *\nCrawl-delay: -3\n").crawl_delay() is None


def test_drain_honors_host_budgets(tmp_path):
    from cocrawler_ray.state.frontier import FrontierPartition
    f = FrontierPartition(0, 10_000, str(tmp_path))
    rows = {
        "surt": np.array([f"test,h)/p{i}" for i in range(6)]
                         + [f"test,g)/p{i}" for i in range(6)], object),
        "url": np.array([f"http://h.test/p{i}" for i in range(6)]
                        + [f"http://g.test/p{i}" for i in range(6)], object),
        "host": np.array(["h.test"] * 6 + ["g.test"] * 6, object),
        "priority": np.ones(12, np.int32),
        "rand": np.arange(12).astype(np.uint64),
        "depth": np.zeros(12, np.int32),
        "retries": np.zeros(12, np.int32),
        "seed_id": np.zeros(12, np.int64),
    }
    f.append(rows)
    out = f.drain(0, budget_per_host=3, host_budgets={"g.test": 1}).to_pandas()
    got = out.groupby("host").size().to_dict()
    assert got == {"g.test": 1, "h.test": 3}
    # burrowed rows stay queued for the next generation
    out2 = f.drain(1, budget_per_host=3, host_budgets={"g.test": 1}).to_pandas()
    assert out2.groupby("host").size().to_dict() == {"g.test": 1, "h.test": 3}


@pytest.fixture(scope="module")
def corpus_delay():
    web, html = synth.gen_web_tables(num_hosts=N_HOSTS, num_pages=N_PAGES,
                                     seed=SEED)
    robots_t = synth.gen_robots_table(N_HOSTS, with_delays=True)
    seeds = synth.gen_seed_lines(N_HOSTS, N_PAGES, num_seeds=24, seed=SEED)
    ids = web.column("image_id").to_pylist()
    urls = [f"http://{i[:5]}.test/{i[6:]}" for i in ids]
    html_by_url = dict(zip(urls, html.column("html").to_pylist()))
    robots_bodies = dict(zip(robots_t.column("host").to_pylist(),
                             robots_t.column("body").to_pylist()))
    assert any("Crawl-delay" in b for b in robots_bodies.values())
    return web, html, robots_bodies, seeds, set(urls), html_by_url


def test_crawl_conformance_with_delays(ray_session, corpus_delay, tmp_path):
    from tests.test_crawl import run_engine
    web, html, robots_bodies, seeds, web_urls, html_by_url = corpus_delay
    budget = 3
    oc = OracleCrawler(web_urls, html_by_url, robots_bodies,
                       budget_per_host=budget, max_depth=4, max_gens=20,
                       seed=SEED)
    oc.add_seeds(seeds)
    oc.run()
    job = run_engine(corpus_delay, tmp_path, budget=budget)
    fetched = job.fetched_table()
    df = fetched.to_pandas()

    # the delayed hosts exist, were fetched, and never exceed their
    # reduced per-generation budget while normal hosts use the full one
    delay_budget = {h: max(1, budget // int(parse_robots(b).crawl_delay()))
                    for h, b in robots_bodies.items()
                    if b and "Crawl-delay" in b}
    assert delay_budget
    per = df.groupby(["gen", "host"]).size()
    hit = [h for h in delay_budget if h in df["host"].to_numpy()]
    assert hit, "no delayed host was ever crawled"
    for h in hit:
        sel = per.loc[:, h]
        assert (sel <= delay_budget[h]).all(), (h, dict(sel))
    assert per.max() > max(delay_budget.values()), \
        "corpus never exercised the full budget on a normal host"

    assert np.array_equal(job.final_seen_surt_hashes(), oc.seen_hashes())
    assert engine_ordering(fetched) == oc.ordering()
    assert fetched.num_rows == len(oc.fetch_log)


def test_crawl_conformance_with_delays_ray_data_path(ray_session, corpus_delay,
                                                     tmp_path):
    """Same delay corpus forced through the huge-wave Ray Data pipeline
    (actor_path_max_rows=0): politeness budgets bind in drain_all either
    way, so engine == oracle on both execution paths."""
    from tests.test_crawl import run_engine
    _, _, robots_bodies, seeds, web_urls, html_by_url = corpus_delay
    oc = OracleCrawler(web_urls, html_by_url, robots_bodies,
                       budget_per_host=3, max_depth=4, max_gens=20, seed=SEED)
    oc.add_seeds(seeds)
    oc.run()
    job = run_engine(corpus_delay, tmp_path, budget=3,
                     actor_path_max_rows=0)
    assert np.array_equal(job.final_seen_surt_hashes(), oc.seen_hashes())
    assert engine_ordering(job.fetched_table()) == oc.ordering()


def test_robots_sitemap_directives_collected():
    """Sitemap: lines are UA-independent, collected in file order,
    deduped, and do not break UA rule groups around them."""
    from cocrawler_ray.robots import parse_robots
    body = (
        "Sitemap: https://h.test/a.xml\n"
        "User-agent: *\n"
        "Disallow: /x\n"
        "Sitemap: https://h.test/b.xml\n"
        "User-agent: bot\n"
        "Allow: /x\n"
        "Sitemap: https://h.test/a.xml\n"   # duplicate: kept once
    )
    r = parse_robots(body)
    assert r.sitemaps == ["https://h.test/a.xml", "https://h.test/b.xml"]
    assert not r.allowed("/x", "other")
    assert r.allowed("/x", "bot")
    assert parse_robots("User-agent: *\nDisallow:\n").sitemaps == []

"""End-to-end crawl conformance (FIXTURES.md F5; SURVEY §5 #3-#5).

The distributed engine must reproduce the oracle simulator's final
URL-seen set AND crawl ordering, satisfy the per-row payload invariant
(decoded-pixel PSNR>=40dB + caption equality vs the source web table),
and resume from checkpoint to byte-identical results.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from cocrawler_ray import codecs, synth
from cocrawler_ray.config import CrawlConfig
from tests.oracle_crawler import OracleCrawler

NUM_HOSTS = 12
NUM_PAGES = 120
SEED = 42


@pytest.fixture(scope="module")
def corpus():
    web, html = synth.gen_web_tables(num_hosts=NUM_HOSTS, num_pages=NUM_PAGES, seed=SEED)
    robots_t = synth.gen_robots_table(NUM_HOSTS)
    seeds = synth.gen_seed_lines(NUM_HOSTS, NUM_PAGES, num_seeds=12, seed=SEED)
    ids = web.column("image_id").to_pylist()
    urls = [f"http://{i[:5]}.test/{i[6:]}" for i in ids]
    html_by_url = dict(zip(urls, html.column("html").to_pylist()))
    robots_bodies = dict(zip(robots_t.column("host").to_pylist(),
                             robots_t.column("body").to_pylist()))
    return web, html, robots_bodies, seeds, set(urls), html_by_url


def run_oracle(corpus, budget=3, max_depth=4, max_gens=20):
    _, _, robots_bodies, seeds, web_urls, html_by_url = corpus
    oc = OracleCrawler(web_urls, html_by_url, robots_bodies,
                       budget_per_host=budget, max_depth=max_depth,
                       max_gens=max_gens, seed=SEED)
    oc.add_seeds(seeds)
    oc.run()
    return oc


def run_engine(corpus, tmp_path, budget=3, max_depth=4, max_gens=20, **kw):
    from cocrawler_ray.pipelines.crawl import CrawlJob
    web, html, robots_bodies, seeds, _, _ = corpus
    cfg = CrawlConfig(out_dir=str(tmp_path), num_parts=3, budget_per_host=budget,
                      max_depth=max_depth, max_gens=max_gens, seed=SEED,
                      fetch_concurrency=2, **kw)
    job = CrawlJob(cfg, web, html, robots_bodies)
    job.run(seeds)
    return job


def engine_ordering(fetched: pa.Table) -> list[str]:
    import pandas as pd
    df = fetched.to_pandas()
    df = df.sort_values(["gen", "priority", "rand", "surt"], kind="stable")
    return df["surt"].tolist()


def test_crawl_conformance(ray_session, corpus, tmp_path):
    oc = run_oracle(corpus)
    job = run_engine(corpus, tmp_path)
    fetched = job.fetched_table()

    # final URL-seen set identical
    assert np.array_equal(job.final_seen_surt_hashes(), oc.seen_hashes())
    # crawl ordering identical (deterministic (gen, priority, rand, surt))
    assert engine_ordering(fetched) == oc.ordering()
    assert fetched.num_rows == len(oc.fetch_log)
    # crawl made real progress across generations
    assert fetched.num_rows > 20
    assert len(set(fetched.column("gen").to_pylist())) > 2


def test_payload_invariant(ray_session, corpus, tmp_path):
    """input_hint per-row invariant: decoded-pixel PSNR>=40dB (lossy) +
    caption equality vs the source web table, for every 200 row."""
    web = corpus[0]
    job = run_engine(corpus, tmp_path, budget=3, max_depth=3)
    fetched = job.fetched_table()
    src = {r["image_id"]: r for r in web.to_pylist()}
    n200 = 0
    for row in fetched.to_pylist():
        if row["status"] != 200:
            continue
        n200 += 1
        s = src[row["image_id"]]
        assert row["caption"] == s["caption"]
        dec = codecs.decode(row["bytes"], row["w"], row["h"], row["fmt"])
        ref = codecs.decode(s["bytes"], s["w"], s["h"], s["fmt"])
        assert np.array_equal(dec, ref)  # lossless vs fetched copy
        orig = codecs.make_image(row["image_id"], row["w"], row["h"])
        assert codecs.psnr(orig, dec) >= 40.0
        assert row["phash"] == s["phash"]
    assert n200 > 10


def test_url_budget(ray_session, corpus, tmp_path):
    job = run_engine(corpus, tmp_path, budget=3, max_depth=6, max_urls=17)
    fetched = job.fetched_table()
    # fetch stops within a partition-rounded margin of the budget
    assert 0 < fetched.num_rows <= 17 + 3 * 3


def test_hot_host_skew(ray_session, tmp_path):
    """North-rule skew handling: on a Zipf corpus whose head host dominates,
    per-(gen, host) fetches never exceed the politeness budget, the hot-host
    backlog metric fires, and ordering still matches the oracle."""
    from cocrawler_ray.pipelines.crawl import CrawlJob

    web, html = synth.gen_web_tables(num_hosts=5, num_pages=250, seed=7)
    seeds = synth.gen_seed_lines(5, 250, num_seeds=10, seed=7)
    cfg = CrawlConfig(out_dir=str(tmp_path), num_parts=4, budget_per_host=4,
                      max_depth=8, max_gens=40, seed=7, hot_host_threshold=5)
    job = CrawlJob(cfg, web, html, {})
    job.run(seeds)

    fetched = job.fetched_table()
    df = fetched.to_pandas()
    per = df.groupby(["gen", "host"]).size()
    assert (per <= 4).all(), "politeness budget violated under skew"
    assert df["host"].value_counts().iloc[0] > df["host"].value_counts().iloc[-1]

    m = job.storage.read_table("metrics").to_pandas()
    assert m["name"].str.startswith("hot_host.").any(), \
        "hot-host backlog metric did not fire"

    ids = web.column("image_id").to_pylist()
    urls_ = [f"http://{i[:5]}.test/{i[6:]}" for i in ids]
    oc = OracleCrawler(set(urls_),
                       dict(zip(urls_, html.column("html").to_pylist())), {},
                       budget_per_host=4, max_depth=8, max_gens=40, seed=7)
    oc.add_seeds(seeds)
    oc.run()
    assert engine_ordering(fetched) == oc.ordering()
    assert np.array_equal(job.final_seen_surt_hashes(), oc.seen_hashes())


@pytest.fixture(scope="module")
def corpus_rr():
    """Corpus with redirects (alias links -> 301) and transient 503s:
    exercises M7 redirect handling and MaxTries/requeue end-to-end."""
    web, html = synth.gen_web_tables(num_hosts=NUM_HOSTS, num_pages=NUM_PAGES,
                                     seed=SEED, alias_every=4)
    robots_t = synth.gen_robots_table(NUM_HOSTS)
    seeds = synth.gen_seed_lines(NUM_HOSTS, NUM_PAGES, num_seeds=12, seed=SEED)
    ids = web.column("image_id").to_pylist()
    urls = [f"http://{i[:5]}.test/{i[6:]}" for i in ids]
    html_by_url = dict(zip(urls, html.column("html").to_pylist()))
    robots_bodies = dict(zip(robots_t.column("host").to_pylist(),
                             robots_t.column("body").to_pylist()))
    return web, html, robots_bodies, seeds, set(urls), html_by_url


def _run_rr(corpus_rr, tmp_path, **engine_kw):
    oc = OracleCrawler(corpus_rr[4], corpus_rr[5], corpus_rr[2],
                       budget_per_host=3, max_depth=4, max_gens=20, seed=SEED,
                       transient_every=5, max_tries=3)
    oc.add_seeds(corpus_rr[3])
    oc.run()
    job = run_engine(corpus_rr, tmp_path, transient_every=5, max_tries=3,
                     **engine_kw)
    return oc, job


def test_crawl_conformance_redirects_and_retries(ray_session, corpus_rr, tmp_path):
    """Engine == oracle with 3xx and 5xx present: same seen set, same
    ordering, and the corpus actually produced redirects and retries."""
    oc, job = _run_rr(corpus_rr, tmp_path)
    fetched = job.fetched_table()
    statuses = fetched.column("status").to_pylist()
    assert 301 in statuses, "corpus produced no redirects"
    assert 503 in statuses, "corpus produced no transient failures"
    # a 503'd URL must be re-attempted (appears more than once)
    urls_503 = {u for u, s in zip(fetched.column("url").to_pylist(), statuses)
                if s == 503}
    from collections import Counter
    attempts = Counter(fetched.column("url").to_pylist())
    assert any(attempts[u] > 1 for u in urls_503), "no retry was attempted"
    # a redirect target must have been fetched in a later generation
    locs = {loc for loc, s in zip(fetched.column("location").to_pylist(), statuses)
            if 300 <= s < 400}
    fetched_urls = set(fetched.column("url").to_pylist())
    assert locs and locs & fetched_urls, "no redirect target was followed"
    assert np.array_equal(job.final_seen_surt_hashes(), oc.seen_hashes())
    assert engine_ordering(fetched) == oc.ordering()
    assert fetched.num_rows == len(oc.fetch_log)


def test_crawl_conformance_redirects_and_retries_ray_data_path(
        ray_session, corpus_rr, tmp_path):
    oc, job = _run_rr(corpus_rr, tmp_path, actor_path_max_rows=0)
    assert np.array_equal(job.final_seen_surt_hashes(), oc.seen_hashes())
    assert engine_ordering(job.fetched_table()) == oc.ordering()


def test_crawl_conformance_ray_data_path(ray_session, corpus, tmp_path):
    """The huge-wave Ray Data pipeline path must produce byte-identical
    results to the fused per-actor path (they share the same kernels but
    different physical execution)."""
    oc = run_oracle(corpus)
    job = run_engine(corpus, tmp_path, actor_path_max_rows=0)  # force Dataset path
    fetched = job.fetched_table()
    assert np.array_equal(job.final_seen_surt_hashes(), oc.seen_hashes())
    assert engine_ordering(fetched) == oc.ordering()


def test_ray_data_path_replica_cache_not_stale(ray_session, corpus, tmp_path):
    """Two sequential jobs over DIFFERENT corpora in the same Ray session,
    both forced down the Ray Data path: the worker-process replica cache
    (keyed by broadcast refs) must serve each job ITS corpus — a stale hit
    would fetch the first corpus's pages for the second job."""
    from cocrawler_ray.pipelines.crawl import CrawlJob

    for i, (hosts, pages) in enumerate([(6, 60), (9, 90)]):
        web, html = synth.gen_web_tables(num_hosts=hosts, num_pages=pages,
                                         seed=100 + i)
        seeds = synth.gen_seed_lines(hosts, pages, num_seeds=6, seed=100 + i)
        cfg = CrawlConfig(out_dir=str(tmp_path / f"j{i}"), num_parts=3,
                          budget_per_host=5, max_depth=4, max_gens=10,
                          seed=100 + i, actor_path_max_rows=0)
        job = CrawlJob(cfg, web, html, {})
        res = job.run(seeds)
        assert res["fetched"] > 0
        fetched = job.fetched_table()
        valid_ids = set(web.column("image_id").to_pylist())
        got_ids = {r for r, s in zip(fetched.column("image_id").to_pylist(),
                                     fetched.column("status").to_pylist())
                   if s == 200}
        assert got_ids <= valid_ids and got_ids, \
            "Ray Data path fetched rows from a stale corpus replica"


def test_all_denied_batch(ray_session, corpus, tmp_path):
    """Regression: a drain block whose rows are ALL robots-denied must not
    crash the fused process stage (pa.concat_tables([]) guard)."""
    from cocrawler_ray.pipelines.crawl import CrawlJob
    web, html, _, seeds, _, _ = corpus
    deny_all = {synth.host_name(h): "User-agent: *\nDisallow: /\n"
                for h in range(NUM_HOSTS)}
    cfg = CrawlConfig(out_dir=str(tmp_path), num_parts=3, budget_per_host=3,
                      max_depth=4, max_gens=5, seed=SEED, fetch_concurrency=2)
    job = CrawlJob(cfg, web, html, deny_all)
    res = job.run(seeds)
    assert res["fetched"] == 0


def test_log_sinks(ray_session, corpus, tmp_path):
    """S4/S5: crawllog JSON export covers every fetched row; robotslog has
    one record per shard actor."""
    import json, pathlib
    job = run_engine(corpus, tmp_path, budget=3, max_depth=3)
    out = job.write_logs()
    lines = []
    for f in pathlib.Path(out["crawllog"]).iterdir():
        lines += [json.loads(l) for l in f.read_text().splitlines() if l.strip()]
    assert len(lines) == job.fetched_table().num_rows
    assert {"url", "status", "digest"} <= set(lines[0])
    robots = [json.loads(l) for l in
              pathlib.Path(out["robotslog"]).read_text().splitlines()]
    assert len(robots) == job.num_actors
    # facetlog: every 200 page contributes its <title> facet
    facets = []
    for f in pathlib.Path(out["facetlog"]).iterdir():
        facets += [json.loads(l) for l in f.read_text().splitlines() if l.strip()]
    n200 = sum(1 for s in job.fetched_table().column("status").to_pylist()
               if s == 200)
    titles = [r for r in facets if r["k"] == "title"]
    assert len(titles) == n200 and all(r["v"].startswith("caption ") for r in titles)


def test_reject_log_sink(ray_session, tmp_path):
    """S5 rejected-URL log: a corpus with depth-exceeding links produces
    rejectlog cells with reasons."""
    import json, pathlib
    web, html = synth.gen_web_tables(num_hosts=6, num_pages=80, seed=7)
    seeds = synth.gen_seed_lines(6, 80, num_seeds=6, seed=7)
    from cocrawler_ray.pipelines.crawl import CrawlJob
    cfg = CrawlConfig(out_dir=str(tmp_path), num_parts=2, budget_per_host=4,
                      max_depth=1, max_gens=4, seed=7, log_rejects=True)
    job = CrawlJob(cfg, web, html, {})
    job.run(seeds)
    out = job.write_logs()
    assert "rejectlog" in out
    recs = []
    for f in pathlib.Path(out["rejectlog"]).iterdir():
        recs += [json.loads(l) for l in f.read_text().splitlines() if l.strip()]
    assert recs and all(r["reason"] == "too_deep" for r in recs)
    assert all(r["raw_url"] for r in recs)


def test_robotslog_covers_ray_data_path(ray_session, corpus, tmp_path):
    """Regression (round-1 advice): robots decisions made by huge-wave
    task-worker replicas must appear in robotslog, not vanish."""
    import json, pathlib
    job = run_engine(corpus, tmp_path, budget=3, max_depth=3,
                     actor_path_max_rows=0)  # force the Ray Data path
    out = job.write_logs()
    robots = [json.loads(l) for l in
              pathlib.Path(out["robotslog"]).read_text().splitlines()]
    wave = [r for r in robots if r.get("source") == "wave_replicas"]
    assert wave and wave[0]["fetches"] > 0


def test_resume_matches_uninterrupted(ray_session, corpus, tmp_path):
    from cocrawler_ray.pipelines.crawl import CrawlJob
    web, html, robots_bodies, seeds, _, _ = corpus

    # reference: uninterrupted run
    ref = run_engine(corpus, tmp_path / "ref", budget=3, max_depth=4)
    ref_fetched = ref.fetched_table()
    ref_seen = ref.final_seen_surt_hashes()

    # interrupted: run 3 gens with checkpoints, then resume in a NEW job
    cfg1 = CrawlConfig(out_dir=str(tmp_path / "ckpt"), num_parts=3, budget_per_host=3,
                       max_depth=4, max_gens=3, seed=SEED, checkpoint_every=1,
                       fetch_concurrency=2)
    j1 = CrawlJob(cfg1, web, html, robots_bodies)
    j1.run(seeds)

    cfg2 = CrawlConfig(out_dir=str(tmp_path / "ckpt"), num_parts=3, budget_per_host=3,
                       max_depth=4, max_gens=30, seed=SEED, checkpoint_every=0,
                       fetch_concurrency=2)
    j2 = CrawlJob(cfg2, web, html, robots_bodies)
    assert j2.restore_latest() == 3
    j2.run(seed_lines=None)

    assert np.array_equal(j2.final_seen_surt_hashes(), ref_seen)
    resumed = j2.fetched_table()
    assert engine_ordering(resumed) == engine_ordering(ref_fetched)


def test_audit_clean_and_detects_corruption(ray_session, corpus, tmp_path):
    """Distributed audit (stages/verify.py): a healthy crawl has zero
    violations; a corrupted fetched cell is flagged with the right rows."""
    import pyarrow.parquet as pq

    from cocrawler_ray.stages.verify import audit_fetched

    web = corpus[0]
    job = run_engine(corpus, tmp_path, budget=3, max_depth=3)
    files = job.storage.table_files("fetched")
    assert files
    vio = audit_fetched(files, web, concurrency=2)
    assert len(vio) == 0

    # corrupt one cell: flip a 200 row's caption and zero another's payload
    t = pq.read_table(files[0])
    n200 = int(pa.compute.sum(
        pa.compute.equal(t.column("status"), 200).cast(pa.int64())).as_py())
    if n200 == 0:
        t = pq.read_table(files[-1])
    df = t.to_pandas()
    hit = df.index[df["status"] == 200][:2]
    df.loc[hit[0], "caption"] = "corrupted caption"
    if len(hit) > 1:
        df.loc[hit[1], "bytes"] = b"\x00\x01garbage"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), files[0])

    vio2 = audit_fetched(files, web, concurrency=2)
    assert len(vio2) >= 1
    assert "caption mismatch" in set(vio2["reason"])

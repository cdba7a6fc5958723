"""CLI (python -m cocrawler_ray) — fresh run, overrides, checkpoint resume.

Mirrors the reference's crawl.py entry surface (SURVEY §3.1/§3.2): seeds
file + config overrides + --load-style resume.
"""

from __future__ import annotations

import json

import pyarrow.parquet as pq
import pytest

from cocrawler_ray import cli, synth


@pytest.fixture(scope="module")
def cli_inputs(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("cli")
    corpus = d / "corpus"
    synth.write_web_dataset(str(corpus), 8, 120, seed=42)
    pq.write_table(synth.gen_robots_table(8), d / "robots.parquet")
    seeds = d / "seeds.txt"
    seeds.write_text("\n".join(
        ["# comment line"] + synth.gen_seed_lines(8, 120, num_seeds=4, seed=42)))
    return d


def _run(args, capsys):
    rc = cli.main(args)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert rc == 0
    return json.loads(out)


def test_cli_crawl_and_resume(cli_inputs, capsys):
    d = cli_inputs
    out_dir = d / "out"
    base = ["--seeds", str(d / "seeds.txt"), "--web-dir", str(d / "corpus"),
            "--robots", str(d / "robots.parquet"), "--out", str(out_dir),
            "--config", "num_parts:4", "--config", "budget_per_host:50"]

    s1 = _run(base + ["--checkpoint-every", "2", "--write-logs"], capsys)
    assert s1["fetched"] > 0 and s1["gens"] > 1
    assert (out_dir / "robotslog.jsonl").exists()

    # resume from the newest checkpoint: restored totals carry over and the
    # crawl completes without re-seeding
    s2 = _run(base + ["--resume"], capsys)
    assert s2["resumed_from_gen"] is not None
    assert s2["fetched"] >= s1["fetched"] - s1["fetched"]  # counters restored
    assert s2["fetched"] == s1["fetched"]  # nothing new: frontier was drained


def test_cli_export_shards(cli_inputs, tmp_path, capsys):
    d = cli_inputs
    shards = tmp_path / "shards"
    s = _run(["--seeds", str(d / "seeds.txt"), "--web-dir", str(d / "corpus"),
              "--robots", str(d / "robots.parquet"),
              "--out", str(tmp_path / "out"), "--config", "num_parts:4",
              "--export-shards", str(shards)], capsys)
    exp = s["export"]
    assert exp["shards"] > 0 and exp["rows"] > 0 and exp["skipped"] == 0
    total = sum(pq.read_table(p).num_rows for p in shards.glob("*.parquet"))
    assert total == exp["rows"] <= s["fetched"]


def test_cli_gen_corpus(tmp_path, ray_session, capsys):
    rc = cli.main(["--gen-corpus", "4", "40", str(tmp_path / "c")])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["pages"] == 40
    assert pq.read_table(tmp_path / "c" / "web").num_rows == 40


def test_cli_status(cli_inputs, tmp_path, capsys):
    d = cli_inputs
    out = tmp_path / "out"
    s = _run(["--seeds", str(d / "seeds.txt"), "--web-dir", str(d / "corpus"),
              "--out", str(out), "--config", "num_parts:4",
              "--checkpoint-every", "2"], capsys)
    st = _run(["--status", str(out)], capsys)
    assert st["totals"]["fetched"] == s["fetched"]
    assert st["totals"]["appended"] == s["appended"]
    assert st["gens"] == s["gens"]
    assert st["last_checkpoint"]["fetched_total"] == s["fetched"]
    assert st["tables"]["fetched"] >= 1


def test_cli_crawl_from_yaml_configfile(cli_inputs, tmp_path, capsys):
    # reference launch parity: crawl.py --configfile config.yml
    # --config Crawl.MaxDepth:N — file drives the crawl, dotted CLI
    # overrides win over the file
    d = cli_inputs
    cfgfile = tmp_path / "config.yml"
    cfgfile.write_text(
        "Crawl:\n"
        "  MaxDepth: 2\n"
        "  MaxWorkers: 2\n"          # reference alias -> fetch_concurrency
        "System:\n"
        "  NumParts: 4\n"
        "Fetcher:\n"
        "  CookieJar: Defective\n"   # reference value -> policy "none"
        "Logging:\n"
        "  LoggingLevel: 2\n"        # unmodeled section -> extras
    )
    s = _run(["--seeds", str(d / "seeds.txt"), "--web-dir", str(d / "corpus"),
              "--robots", str(d / "robots.parquet"),
              "--out", str(tmp_path / "out"),
              "--configfile", str(cfgfile),
              "--config", "Crawl.MaxDepth:1"], capsys)
    assert s["fetched"] > 0
    # MaxDepth:1 override beat the file's 2: only seeds + depth-1 pages
    assert s["gens"] <= 3


def test_config_yaml_semantics(tmp_path):
    from cocrawler_ray.config import CrawlConfig
    f = tmp_path / "c.yml"
    f.write_text(
        "Crawl:\n"
        "  MaxDepth: 3\n"
        "  MaxCrawledUrls: 1000\n"
        "  MaxTries: 2\n"
        "Fetcher:\n"
        "  CookieJar: Defective\n"
        "GeoIP:\n"
        "  DataDir: /nope\n"
    )
    cfg = CrawlConfig.from_yaml(str(f), "Crawl.MaxDepth:5", seed=7)
    assert cfg.max_depth == 5          # override beats file
    assert cfg.max_urls == 1000        # reference alias
    assert cfg.max_tries == 2
    assert cfg.cookie_policy == "none"  # Defective -> no-op jar
    assert cfg.seed == 7               # kwargs beat everything
    assert cfg.extras == {"GeoIP.DataDir": "/nope"}


def test_config_overrides_accept_dotted_and_flat():
    from cocrawler_ray.config import CrawlConfig
    cfg = CrawlConfig.from_overrides(
        "max_depth:3", "Crawl.MaxWorkers:9",
        "Fetcher.CookieJar:per_host", "log_rejects:true")
    assert cfg.max_depth == 3
    assert cfg.fetch_concurrency == 9
    assert cfg.cookie_policy == "per_host"
    assert cfg.log_rejects is True
    import pytest as _pt
    with _pt.raises(KeyError):
        CrawlConfig.from_overrides("max_depht:3")  # flat typo still raises

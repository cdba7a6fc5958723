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

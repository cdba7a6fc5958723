"""T8 memory monitor (SURVEY §2 T8, ``cocrawler/memory.py``): RSS
sampling, biggest-holder debug dump, limit-triggered shedding, and the
crawl loop's persisted ``mem.*`` metrics rows."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from cocrawler_ray import synth
from cocrawler_ray.memory import MemoryMonitor, object_store_usage, rss_bytes


def test_rss_and_object_store_probe(ray_session):
    rss = rss_bytes()
    assert rss > 10 * 1024 * 1024  # a live Python+Ray process
    used, total = object_store_usage()
    assert total > 0 and 0 <= used <= total


def test_debug_dump_sorted_and_sample_keys():
    mon = MemoryMonitor()
    mon.register("small", lambda: 100)
    mon.register("big", lambda: 10_000)
    assert mon.debug_dump() == [("big", 10_000), ("small", 100)]
    s = mon.sample(rss=123)
    assert s["mem.rss"] == 123
    assert s["mem.c.big"] == 10_000 and s["mem.c.small"] == 100
    assert "mem.shed" not in s  # no limit configured


def test_shed_largest_first_until_under_limit():
    freed_order = []
    state = {"a": 600, "b": 900, "c": 50}

    def shed(name):
        def f():
            n = state[name]
            state[name] = 0
            freed_order.append(name)
            return n
        return f

    mon = MemoryMonitor(soft_limit_bytes=1000)
    for n in state:
        mon.register(n, lambda n=n: state[n], shed(n))
    # rss 2000, limit 1000: shedding b (900) leaves projected 1100 — still
    # over; then a (600) → 500 under; c never shed
    s = mon.sample(rss=2000)
    assert freed_order == ["b", "a"]
    assert s["mem.shed"] == 1500
    assert [e["component"] for e in mon.shed_events] == ["b", "a"]


def test_shed_skips_components_without_hook():
    mon = MemoryMonitor(soft_limit_bytes=10)
    mon.register("viewonly", lambda: 1_000_000)  # no shed_fn
    s = mon.sample(rss=100)
    assert s["mem.shed"] == 0  # nothing sheddable — no crash, recorded 0


def test_crawl_persists_mem_metrics(tmp_path, ray_session):
    from cocrawler_ray import cli

    d = tmp_path
    synth.write_web_dataset(str(d / "c"), 4, 60, seed=11)
    pq.write_table(synth.gen_robots_table(4), d / "robots.parquet")
    (d / "seeds.txt").write_text(
        "\n".join(synth.gen_seed_lines(4, 60, num_seeds=2, seed=11)))
    rc = cli.main(["--seeds", str(d / "seeds.txt"), "--web-dir", str(d / "c"),
                   "--robots", str(d / "robots.parquet"),
                   "--out", str(d / "out"), "--config", "num_parts:2",
                   "--checkpoint-every", "2"])
    assert rc == 0
    from cocrawler_ray.storage import Storage
    m = Storage(str(d / "out")).read_table("metrics").to_pandas()
    mem = m[m["name"].str.startswith("mem.")]
    assert {"mem.rss", "mem.obj_used", "mem.obj_total"} <= set(mem["name"])
    assert (mem.loc[mem["name"] == "mem.rss", "value"] > 0).all()
    # checkpoint cadence: one full sample per checkpointed generation
    per_gen = mem.groupby("gen")["name"].nunique()
    assert (per_gen >= 3).all()

"""Unit tests for the stateful partitions (seen / frontier / robots) — plain
classes, no Ray needed (pipeline wiring is tested in test_crawl.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from cocrawler_ray.hashing import hash64, rand_for_surt
from cocrawler_ray.state import FrontierPartition, RobotsPartition, SeenPartition
from cocrawler_ray.state.seen import CuckooFilter


# -- seen -------------------------------------------------------------------

def test_seen_first_wins_and_dupes():
    s = SeenPartition(part=0)
    keys = hash64(["a", "b", "a", "c", "b"])
    new = s.check_and_add(keys)
    assert new.tolist() == [True, True, False, True, False]
    again = s.check_and_add(hash64(["a", "d"]))
    assert again.tolist() == [False, True]
    assert s.size() == 4


def test_seen_snapshot_restore():
    s = SeenPartition(part=2)
    s.check_and_add(hash64([f"k{i}" for i in range(100)]))
    snap = s.snapshot()
    s2 = SeenPartition(part=2)
    s2.restore(snap)
    assert s2.size() == 100
    assert s2.check_and_add(hash64(["k5", "new"])).tolist() == [False, True]


def test_cuckoo_no_false_negatives_low_fp():
    cf = CuckooFilter(capacity=5000)
    keys = hash64([f"u{i}" for i in range(4000)])
    cf.insert_batch(keys)
    assert not cf.overflowed
    assert cf.contains_batch(keys).all()  # no false negatives
    probe = hash64([f"absent{i}" for i in range(4000)])
    fp_rate = cf.contains_batch(probe).mean()
    assert fp_rate < 0.01, fp_rate


def test_seen_cuckoo_only_mode():
    s = SeenPartition(part=0, capacity=1 << 14, exact=False)
    keys = hash64([f"x{i}" for i in range(1000)])
    new = s.check_and_add(keys)
    assert new.all()
    assert not s.check_and_add(keys).any()
    assert s.false_positive_count(hash64(["zz1", "zz2"])) <= 2


# -- frontier ---------------------------------------------------------------

def _mk_rows(surts, hosts, priorities, depths=None):
    n = len(surts)
    return {
        "surt": np.array(surts, dtype=object),
        "url": np.array(["http://" + h + "/" + s for s, h in zip(surts, hosts)], dtype=object),
        "host": np.array(hosts, dtype=object),
        "priority": np.array(priorities, dtype=np.int32),
        "rand": rand_for_surt(surts),
        "depth": np.array(depths or [0] * n, dtype=np.int32),
        "retries": np.zeros(n, dtype=np.int32),
        "seed_id": np.arange(n, dtype=np.int64),
    }


def test_frontier_priority_order_and_budget():
    f = FrontierPartition(part=0)
    rows = _mk_rows(
        ["s1", "s2", "s3", "s4", "s5"],
        ["a.test", "a.test", "a.test", "b.test", "b.test"],
        [2, 1, 1, 1, 3],
    )
    f.append(rows)
    out = f.drain(gen=0, budget_per_host=2)
    # a.test: two priority-1 entries (s2,s3 by rand order) before priority-2
    got = out.column("surt").to_pylist()
    a_got = [s for s, h in zip(got, out.column("host").to_pylist()) if h == "a.test"]
    assert set(a_got) == {"s2", "s3"}
    # b.test: both fit in budget
    assert sum(1 for h in out.column("host").to_pylist() if h == "b.test") == 2
    # burrowed remainder drains next gen
    out2 = f.drain(gen=1, budget_per_host=2)
    assert out2.column("surt").to_pylist() == ["s1"]
    assert f.is_empty()


def test_frontier_deterministic_order():
    rows = _mk_rows([f"s{i}" for i in range(20)], ["h.test"] * 20, [1] * 20)
    f1, f2 = FrontierPartition(0), FrontierPartition(0)
    f1.append(rows)
    # append in reversed order to f2 — same drain order must come out
    rev = {k: v[::-1].copy() for k, v in rows.items()}
    f2.append(rev)
    o1 = f1.drain(0, 100).column("surt").to_pylist()
    o2 = f2.drain(0, 100).column("surt").to_pylist()
    assert o1 == o2 and len(o1) == 20


def test_frontier_max_rows_cap_requeues():
    f = FrontierPartition(part=0)
    f.append(_mk_rows([f"s{i}" for i in range(10)], [f"h{i}.test" for i in range(10)], [1] * 10))
    out = f.drain(0, budget_per_host=5, max_rows=4)
    assert out.num_rows == 4
    assert f.ready_count() == 6
    out2 = f.drain(1, budget_per_host=5, max_rows=100)
    assert out2.num_rows == 6


def test_frontier_requeue_demotes():
    f = FrontierPartition(part=0)
    f.append(_mk_rows(["s1"], ["a.test"], [1]))
    t = f.drain(0, 10)
    f.requeue(t.select(["surt", "url", "host", "priority", "rand", "depth", "retries", "seed_id"]))
    t2 = f.drain(1, 10)
    assert t2.column("retries").to_pylist() == [1]
    assert t2.column("priority").to_pylist() == [2]


def test_frontier_snapshot_restore_identical_order():
    f = FrontierPartition(part=1)
    f.append(_mk_rows([f"s{i}" for i in range(30)], [f"h{i%3}.test" for i in range(30)], [i % 4 for i in range(30)]))
    snap = f.snapshot()
    g = FrontierPartition(part=1)
    g.restore(snap)
    assert f.drain(5, 7).equals(g.drain(5, 7))


def test_frontier_spill_roundtrip(tmp_path):
    f = FrontierPartition(part=0, spill_threshold=100, spill_dir=str(tmp_path))
    f.append(_mk_rows([f"s{i:04d}" for i in range(300)], ["h.test"] * 300, [1] * 300))
    assert f.spilled_files, "should have spilled"
    assert f.ready_count() < 300
    seen = []
    for g in range(40):
        t = f.drain(g, budget_per_host=10)
        seen += t.column("surt").to_pylist()
        if f.is_empty():
            break
    assert sorted(seen) == [f"s{i:04d}" for i in range(300)]
    assert f.is_empty()


def test_frontier_snapshot_includes_spilled(tmp_path):
    """A checkpoint taken after a cold-tail spill must carry the spilled
    rows — restore into a fresh partition must see all of them."""
    f = FrontierPartition(part=0, spill_threshold=100, spill_dir=str(tmp_path))
    f.append(_mk_rows([f"s{i:04d}" for i in range(300)], ["h.test"] * 300, [1] * 300))
    assert f.spilled_files
    snap = f.snapshot()
    assert snap.num_rows == 300
    g = FrontierPartition(part=0)
    g.restore(snap)
    seen = []
    for gen in range(40):
        seen += g.drain(gen, budget_per_host=50).column("surt").to_pylist()
        if g.is_empty():
            break
    assert sorted(seen) == [f"s{i:04d}" for i in range(300)]


def test_frontier_restore_into_spilling_partition(tmp_path):
    """Regression: restoring a folded snapshot into a partition whose
    spill_threshold is below the snapshot size must not drop rows. The old
    restore() reset spilled_files AFTER append() — append() re-spilled the
    oversized restored table into a band file that the stale reset then
    forgot, silently losing half the frontier."""
    f = FrontierPartition(part=0)
    f.append(_mk_rows([f"s{i:04d}" for i in range(200)], ["h.test"] * 200, [1] * 200))
    snap = f.snapshot()
    g = FrontierPartition(part=0, spill_threshold=100, spill_dir=str(tmp_path / "g"))
    g.restore(snap)
    seen = []
    for gen in range(40):
        seen += g.drain(gen, budget_per_host=50).column("surt").to_pylist()
        if g.is_empty():
            break
    assert sorted(seen) == [f"s{i:04d}" for i in range(200)]


# -- robots -----------------------------------------------------------------

def test_robots_partition_cache_and_decisions():
    bodies = {"a.test": "User-agent: *\nDisallow: /no\n", "b.test": ""}
    r = RobotsPartition(part=0, bodies=bodies, ttl_gens=2)
    hosts = ["a.test", "a.test", "b.test", "c.test"]
    paths = ["/ok", "/no/x", "/no", "/anything"]
    out = r.check_batch(hosts, paths, gen=0)
    assert out.tolist() == [True, False, True, True]  # missing host -> allow
    assert r.stats()["fetches"] == 3
    r.check_batch(["a.test"], ["/y"], gen=1)  # cache hit
    assert r.stats()["fetches"] == 3
    r.check_batch(["a.test"], ["/y"], gen=5)  # TTL expired -> refetch
    assert r.stats()["fetches"] == 4


@pytest.mark.skipif(__import__("importlib").util.find_spec("lance") is None,
                    reason="lance not installed in this sandbox")
def test_lance_cell_roundtrip(tmp_path, ray_session):
    """Exercises the import-gated Lance codec branch the moment pylance
    appears: write_cell -> read_cell -> read_ray_dataset must round-trip
    a fetched-shaped table bit-for-bit (storage.py dispatches the codec
    at import; the Parquet shim is the only branch this sandbox runs)."""
    import pyarrow as pa

    from cocrawler_ray import storage as st

    assert st.CELL_FORMAT == "lance"
    t = pa.table({
        "image_id": pa.array(["img0001", "img0002"], pa.string()),
        "bytes": pa.array([b"\x00\x01", b"\x02\x03"], pa.binary()),
        "w": pa.array([16, 32], pa.int32()),
        "h": pa.array([16, 16], pa.int32()),
        "fmt": pa.array(["raw16", "qnt"], pa.string()),
        "caption": pa.array(["a cat", "a dog"], pa.string()),
        "phash": pa.array([1, 2], pa.int64()),
    })
    s = st.Storage(tmp_path)
    path = s.write_cell(t, "imgcells", gen=0, part=0, validate=False)
    assert path.endswith(".lance")
    back = s.read_cell("imgcells", 0, 0)
    assert back.equals(t) or back.cast(t.schema).equals(t)
    ds = st.read_ray_dataset(s.table_files("imgcells"))
    got = ds.to_arrow_refs()
    import ray
    merged = pa.concat_tables([ray.get(r) for r in got])
    assert merged.sort_by("image_id").cast(t.schema).equals(t)

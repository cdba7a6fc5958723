"""HyperLogLog sketch: accuracy bounds, exact merge semantics, and the
Ray combiner stage (stages/sketch.py)."""

from __future__ import annotations

import numpy as np

from cocrawler_ray.stages import sketch


def _vals(n: int, prefix: str = "v") -> list[str]:
    return [f"{prefix}{i:07d}" for i in range(n)]


def test_clz64_matches_python():
    rng = np.random.default_rng(7)
    xs = rng.integers(1, 2**63, size=500, dtype=np.int64).astype(np.uint64)
    xs = np.concatenate([xs, np.array([1, 2**63, 2**62, 3], np.uint64)])
    got = sketch._clz64(xs)
    want = np.array([64 - int(x).bit_length() for x in xs], np.uint64)
    assert (got == want).all()


def test_estimate_within_bounds():
    # p=12 -> sigma ~ 1.04/sqrt(4096) = 1.6%; allow 5% (3 sigma)
    for n in (100, 5_000, 50_000):
        regs = sketch.hll_init(12)
        sketch.hll_add(regs, _vals(n))
        est = sketch.hll_estimate(regs)
        assert abs(est - n) / n < 0.05, (n, est)


def test_empty_and_tiny():
    regs = sketch.hll_init(12)
    assert sketch.hll_estimate(regs) == 0.0
    sketch.hll_add(regs, ["a", "b", "c", "a"])
    assert round(sketch.hll_estimate(regs)) == 3  # linear-counting range


def test_merge_equals_single_pass():
    vals = _vals(20_000)
    one = sketch.hll_init(12)
    sketch.hll_add(one, vals)
    merged = sketch.hll_init(12)
    for chunk in np.array_split(np.asarray(vals), 7):
        part = sketch.hll_init(12)
        sketch.hll_add(part, chunk)
        merged = sketch.hll_merge(merged, part)
    assert (merged == one).all()  # registers identical, not just close


def test_idempotent_and_order_insensitive():
    a = sketch.hll_init(10)
    sketch.hll_add(a, _vals(1000))
    sketch.hll_add(a, _vals(1000))  # re-adding changes nothing
    b = sketch.hll_init(10)
    sketch.hll_add(b, _vals(1000)[::-1])
    assert (a == b).all()


def test_cms_never_underestimates():
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 500, size=20_000).astype(str)
    cms = sketch.CountMinSketch(w=2048, d=4)
    cms.add(keys)
    u, true = np.unique(keys, return_counts=True)
    est = cms.query(u)
    assert (est >= true).all()                      # structural guarantee
    assert (est - true).mean() < 0.01 * len(keys)   # e/w bound with slack


def test_cms_merge_is_additive():
    a, b = sketch.CountMinSketch(64, 3), sketch.CountMinSketch(64, 3)
    a.add(["x", "y", "x"])
    b.add(["x", "z"])
    m = a.merge(b)
    assert m.query(np.array(["x"]))[0] >= 3
    one = sketch.CountMinSketch(64, 3)
    one.add(["x", "y", "x", "x", "z"])
    assert (m.table == one.table).all()             # counts are linear


def test_approx_topk_stage(ray_session):
    import pandas as pd
    import ray.data as rd

    # zipf-ish: key i appears (200 - i) times
    keys = np.repeat([f"k{i:03d}" for i in range(200)],
                     np.arange(200, 0, -1))
    ds = rd.from_pandas(pd.DataFrame({"h": keys})).repartition(6)
    top = sketch.approx_topk(ds, "h", k=5, w=4096, d=4)
    assert list(top["h"]) == [f"k{i:03d}" for i in range(5)]
    assert (top["est"].to_numpy() >= np.arange(200, 195, -1)).all()


def test_approx_distinct_stage(ray_session):
    import pandas as pd
    import ray.data as rd

    n, dup = 8_000, 3
    df = pd.DataFrame({"k": _vals(n) * dup})
    ds = rd.from_pandas(df).repartition(8)
    est = sketch.approx_distinct(ds, "k", p=12)
    assert abs(est - n) / n < 0.05
    # deterministic: same input -> identical estimate
    assert est == sketch.approx_distinct(rd.from_pandas(df).repartition(3),
                                         "k", p=12)


# ---------------------------------------------------------------- KLL

def test_kll_rank_error_bound():
    rng = np.random.default_rng(3)
    data = rng.lognormal(3, 1.5, 200_000)
    s = sketch.QuantileSketch(256)
    for chunk in np.array_split(data, 37):
        s.add(chunk)
    for q in (0.01, 0.25, 0.5, 0.9, 0.99):
        err = abs((data <= s.quantile(q)).mean() - q)
        assert err < 0.02, (q, err)  # KLL k=256: observed ~0.5%, bound 2%


def test_kll_merge_accuracy_and_size():
    rng = np.random.default_rng(11)
    data = rng.normal(0, 1, 120_000)
    a, b = sketch.QuantileSketch(128), sketch.QuantileSketch(128)
    a.add(data[:60_000]); b.add(data[60_000:])
    m = a.merge(b)
    assert m.n == len(data)
    assert abs((data <= m.quantile(0.5)).mean() - 0.5) < 0.03
    # bounded size: O(k log(n/k)) floats, nowhere near n
    assert sum(len(l) for l in m.levels) < 20 * 128


def test_kll_deterministic_and_exact_when_small():
    s1, s2 = sketch.QuantileSketch(256), sketch.QuantileSketch(256)
    vals = np.arange(100, dtype=float)
    s1.add(vals); s2.add(vals[:50]); s2.add(vals[50:])
    assert s1.quantile(0.5) == s2.quantile(0.5)
    # below capacity nothing compacts: quantiles are exact nearest-rank
    assert s1.quantile(0.5) == 49.0
    assert s1.rank(49.0) == 0.5
    import pytest
    with pytest.raises(ValueError):
        sketch.QuantileSketch(256).quantile(0.5)


def test_kll_dataset_stage(ray_session):
    import pandas as pd
    import ray.data as rd

    rng = np.random.default_rng(5)
    vals = rng.exponential(10.0, 50_000)
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(8)
    s = sketch.quantile_sketch_from_dataset(ds, "v", k=256)
    assert s.n == len(vals)
    for q in (0.1, 0.5, 0.95):
        assert abs((vals <= s.quantile(q)).mean() - q) < 0.03


# ---------------------------------------------------------------------------
# ThetaSketch (KMV distinct + set algebra)
# ---------------------------------------------------------------------------

def test_theta_exact_below_k():
    s = sketch.ThetaSketch(64)
    s.add(_vals(40))
    s.add(_vals(40))  # duplicates must not grow the sketch
    assert len(s.hashes) == 40
    assert s.theta() == 1.0
    assert s.estimate() == 40.0


def test_theta_estimate_accuracy():
    # k=256 -> RSE ~ 1/sqrt(k-2) ~ 6.3%; allow 3 sigma
    for n in (5_000, 50_000):
        s = sketch.ThetaSketch(256)
        s.add(_vals(n))
        assert abs(s.estimate() - n) / n < 0.19, (n, s.estimate())


def test_theta_merge_equals_single_pass():
    a = sketch.ThetaSketch(128)
    b = sketch.ThetaSketch(128)
    a.add(_vals(3_000, "x"))
    b.add(_vals(3_000, "y"))
    both = sketch.ThetaSketch(128)
    both.add(_vals(3_000, "x"))
    both.add(_vals(3_000, "y"))
    m = a.merge(b)
    assert (m.hashes == both.hashes).all()
    # merge is commutative
    assert (b.merge(a).hashes == m.hashes).all()


def test_theta_intersection_estimate():
    # |A| = |B| = 20k, |A ∩ B| = 10k (shared suffix)
    a = sketch.ThetaSketch(512)
    b = sketch.ThetaSketch(512)
    a.add(_vals(20_000, "s"))                      # s0..s19999
    b.add([f"s{i:07d}" for i in range(10_000, 30_000)])
    u = a.merge(b)
    in_both = (a.contains(u.hashes) & b.contains(u.hashes)).sum()
    est_inter = in_both / len(u.hashes) * u.estimate()
    assert abs(est_inter - 10_000) / 10_000 < 0.25, est_inter


def test_theta_dataset_build(ray_session):
    import pandas as pd
    import ray.data as rd

    vals = _vals(8_000)
    ds = rd.from_pandas(pd.DataFrame({"v": vals * 2})).repartition(8)
    s = sketch.theta_from_dataset(ds, "v", k=128)
    one = sketch.ThetaSketch(128)
    one.add(vals)
    assert (s.hashes == one.hashes).all()

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

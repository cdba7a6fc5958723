"""stages.exchange: the vectorized hash exchange that replaces Ray Data's
native groupby/join on hot paths (see exchange.py module docstring for the
measured motivation).

Invariants under test:
- co-location: a grouped_shuffle reduce sees EVERY row of each key it
  receives (a per-partition groupby equals the global pandas groupby);
- determinism: the same input produces the same multiset of rows for any
  partition count, including P=1 (bare-ref edge) and heavy key skew;
- hash_join == pandas merge on the same keys (values-only hashing, so
  differently-named join columns still co-locate).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from cocrawler_ray.stages import exchange


def _norm(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
    return (df.sort_values(keys, kind="stable").reset_index(drop=True)
            .reindex(sorted(df.columns), axis=1))


@pytest.fixture(scope="module")
def mixed_ds(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    n = 4000
    df = pd.DataFrame({
        "host": [f"h{int(i):03d}.test" for i in rng.integers(0, 300, n)],
        "kind": rng.choice(["a", "b", "c"], n),
        "v": rng.integers(0, 1000, n).astype(np.int64),
    })
    return rd.from_pandas(df).repartition(16), df


def test_grouped_shuffle_matches_pandas(mixed_ds):
    ds, df = mixed_ds

    def combine(part: pd.DataFrame) -> pd.DataFrame:
        return (part.groupby(["host", "kind"], sort=False, observed=True)
                .agg(n=("v", "size"), s=("v", "sum")).reset_index())

    got = exchange.grouped_shuffle(ds, ["host", "kind"], combine).to_pandas()
    want = combine(df)
    got, want = _norm(got, ["host", "kind"]), _norm(want, ["host", "kind"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("P", [1, 3, 32])
def test_grouped_shuffle_colocates_every_key(mixed_ds, P):
    # If any key's rows were split across partitions, the per-partition
    # count for that key would under-count vs the global groupby.
    ds, df = mixed_ds

    def counts(part: pd.DataFrame) -> pd.DataFrame:
        return (part.groupby("host", sort=False).size().rename("n")
                .reset_index())

    got = exchange.grouped_shuffle(ds, ["host"], counts,
                                   num_partitions=P).to_pandas()
    assert len(got) == df["host"].nunique()  # one output row per key
    want = df.groupby("host").size().rename("n").reset_index()
    pd.testing.assert_frame_equal(_norm(got, ["host"]), _norm(want, ["host"]),
                                  check_dtype=False)


def test_grouped_shuffle_hot_key_skew(ray_session):
    import ray.data as rd

    # 90% of rows share one key: the hot key must land whole in a single
    # partition and still reduce correctly.
    df = pd.DataFrame({"k": ["hot"] * 900 + [f"k{i}" for i in range(100)],
                       "v": np.arange(1000, dtype=np.int64)})
    ds = rd.from_pandas(df).repartition(8)
    got = exchange.grouped_shuffle(
        ds, ["k"],
        lambda p: p.groupby("k", sort=False)["v"].sum().reset_index(),
        num_partitions=6).to_pandas()
    want = df.groupby("k")["v"].sum().reset_index()
    pd.testing.assert_frame_equal(_norm(got, ["k"]), _norm(want, ["k"]),
                                  check_dtype=False)


def test_grouped_shuffle_winner_rule(mixed_ds):
    # drop_duplicates-style reduce (the exact_dedup / q_dedup_first shape):
    # first row per key by a stable order.
    ds, df = mixed_ds

    def first(part: pd.DataFrame) -> pd.DataFrame:
        return (part.sort_values("v", kind="stable")
                .drop_duplicates("host", keep="first"))

    got = exchange.grouped_shuffle(ds, ["host"], first).to_pandas()
    want = first(df)
    pd.testing.assert_frame_equal(_norm(got, ["host"]), _norm(want, ["host"]),
                                  check_dtype=False)


def test_hash_join_matches_pandas_merge(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(5)
    left = pd.DataFrame({"id": rng.integers(0, 500, 2000).astype(np.int64),
                         "lv": rng.integers(0, 9, 2000).astype(np.int64)})
    # right: unique keys, half overlapping
    right = pd.DataFrame({"rid": np.arange(250, 750, dtype=np.int64),
                          "rv": np.arange(500, dtype=np.int64)})
    got = exchange.hash_join(
        rd.from_pandas(left).repartition(7),
        rd.from_pandas(right).repartition(3),
        on=["id"], right_on=["rid"], how="inner").to_pandas()
    want = left.merge(right, left_on="id", right_on="rid").drop(columns=["rid"])
    assert len(got) == len(want)
    got = _norm(got, ["id", "lv", "rv"])
    want = _norm(want, ["id", "lv", "rv"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_hash_join_no_matches(ray_session):
    import ray.data as rd

    left = pd.DataFrame({"id": np.arange(10, dtype=np.int64), "a": 1})
    right = pd.DataFrame({"id": np.arange(100, 110, dtype=np.int64), "b": 2})
    got = exchange.hash_join(rd.from_pandas(left), rd.from_pandas(right),
                             on=["id"], how="inner").to_pandas()
    assert len(got) == 0


def test_asof_join_matches_global_merge_asof(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    left = pd.DataFrame({
        "k": rng.integers(0, 40, 500).astype(np.int64),
        "t": rng.integers(0, 10_000, 500).astype(np.int64),
        "eid": np.arange(500, dtype=np.int64)})
    right = (pd.DataFrame({
        "rk": rng.integers(0, 50, 300).astype(np.int64),
        "rt": rng.integers(0, 10_000, 300).astype(np.int64),
        "v": np.arange(300, dtype=np.int64)})
        .drop_duplicates(["rk", "rt"]))  # unique (by, on): deterministic ties
    got = exchange.asof_join(
        rd.from_pandas(left).repartition(5),
        rd.from_pandas(right).repartition(4),
        ["k"], ["rk"], "t", "rt").to_pandas()
    want = pd.merge_asof(left.sort_values("t", kind="stable"),
                         right.sort_values("rt", kind="stable"),
                         left_on="t", right_on="rt", left_by="k",
                         right_by="rk", direction="backward")
    want = want[want["rt"].notna()]
    cols = ["eid", "k", "t", "rt", "v"]
    pd.testing.assert_frame_equal(
        _norm(got[cols], ["eid"]), _norm(want[cols], ["eid"]),
        check_dtype=False)


def test_asof_join_empty_right(ray_session):
    import ray.data as rd

    left = pd.DataFrame({"k": np.arange(5, dtype=np.int64),
                         "t": np.arange(5, dtype=np.int64)})
    right = pd.DataFrame({"rk": pd.Series([], dtype=np.int64),
                          "rt": pd.Series([], dtype=np.int64),
                          "v": pd.Series([], dtype=np.int64)})
    got = exchange.asof_join(rd.from_pandas(left), rd.from_pandas(right),
                             ["k"], ["rk"], "t", "rt").to_pandas()
    assert len(got) == 0


def test_popcount64():
    from cocrawler_ray.stages.dedup import popcount64

    rng = np.random.default_rng(9)
    xs = rng.integers(-2**63, 2**63 - 1, 200, dtype=np.int64)
    xs = np.concatenate([xs, np.array([0, -1, 1, 2**62], dtype=np.int64)])
    want = np.array([bin(int(x) & (2**64 - 1)).count("1") for x in xs])
    np.testing.assert_array_equal(popcount64(xs), want)


def test_heavy_hitters_exact(ray_session):
    import ray.data as rd
    from cocrawler_ray.stages.agg import heavy_hitters

    rng = np.random.default_rng(11)
    # hot keys 0..2 spread across many blocks + a long uniform tail
    key = np.concatenate([np.repeat([0, 1, 2], [4000, 2500, 1200]),
                          rng.integers(10, 5000, 12000)]).astype(np.int64)
    rng.shuffle(key)
    df = pd.DataFrame({"k": key})
    phi = 0.05
    got = heavy_hitters(lambda: rd.from_pandas(df).repartition(13),
                        ["k"], phi).sort_values("k").reset_index(drop=True)
    vc = df["k"].value_counts()
    want = (vc[vc > phi * len(df)].rename("n").rename_axis("k")
            .reset_index().sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_heavy_hitters_no_heavy_keys(ray_session):
    import ray.data as rd
    from cocrawler_ray.stages.agg import heavy_hitters

    # uniform: nobody exceeds phi*N; tied block counts hit the zero-info
    # carrier-row path (every key appears once per block)
    df = pd.DataFrame({"k": np.arange(400, dtype=np.int64) % 100})
    got = heavy_hitters(lambda: rd.from_pandas(df).repartition(4),
                        ["k"], 0.05)
    assert len(got) == 0


def test_heavy_hitters_multikey(ray_session):
    import ray.data as rd
    from cocrawler_ray.stages.agg import heavy_hitters

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "a": np.concatenate([np.zeros(3000, np.int64),
                             rng.integers(0, 50, 7000)]),
        "b": np.concatenate([np.full(3000, 7, np.int64),
                             rng.integers(0, 50, 7000)])})
    phi = 0.1
    got = (heavy_hitters(lambda: rd.from_pandas(df).repartition(8),
                         ["a", "b"], phi)
           .sort_values(["a", "b"]).reset_index(drop=True))
    vc = df.groupby(["a", "b"]).size().rename("n").reset_index()
    want = (vc[vc["n"] > phi * len(df)]
            .sort_values(["a", "b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_range_join_matches_bruteforce(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(21)
    left = pd.DataFrame({"x": rng.uniform(-500, 1500, 800),
                         "lid": np.arange(800, dtype=np.int64)})
    lo = rng.uniform(-600, 1400, 120)
    right = pd.DataFrame({"lo": lo, "hi": lo + rng.uniform(0, 350, 120),
                          "rid": np.arange(120, dtype=np.int64)})
    got = exchange.range_join(
        rd.from_pandas(left).repartition(5),
        rd.from_pandas(right).repartition(3),
        "x", "lo", "hi", bucket_width=100.0).to_pandas()
    lx = left["x"].to_numpy()[:, None]
    m = (lx >= right["lo"].to_numpy()[None, :]) \
        & (lx <= right["hi"].to_numpy()[None, :])
    li, ri = np.nonzero(m)
    want = pd.DataFrame({"x": left["x"].to_numpy()[li],
                         "lid": left["lid"].to_numpy()[li],
                         "lo": right["lo"].to_numpy()[ri],
                         "hi": right["hi"].to_numpy()[ri],
                         "rid": right["rid"].to_numpy()[ri]})
    cols = ["lid", "rid", "x", "lo", "hi"]
    pd.testing.assert_frame_equal(
        _norm(got[cols], ["lid", "rid"]), _norm(want[cols], ["lid", "rid"]),
        check_dtype=False)


def test_range_join_broadcast_matches_exchange(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(33)
    left = pd.DataFrame({"x": rng.uniform(-500, 1500, 800),
                         "lid": np.arange(800, dtype=np.int64)})
    lo = rng.uniform(-600, 1400, 60)
    right = pd.DataFrame({"lo": lo, "hi": lo + rng.uniform(0, 350, 60),
                          "rid": np.arange(60, dtype=np.int64)})
    got = exchange.range_join_broadcast(
        rd.from_pandas(left).repartition(5), right,
        "x", "lo", "hi").to_pandas()
    want = exchange.range_join(
        rd.from_pandas(left).repartition(5), rd.from_pandas(right),
        "x", "lo", "hi", bucket_width=100.0).to_pandas()
    cols = ["lid", "rid", "x", "lo", "hi"]
    pd.testing.assert_frame_equal(
        _norm(got[cols], ["lid", "rid"]), _norm(want[cols], ["lid", "rid"]),
        check_dtype=False)


def test_range_join_empty_right(ray_session):
    import ray.data as rd

    left = pd.DataFrame({"x": np.arange(5, dtype=np.float64)})
    right = pd.DataFrame({"lo": pd.Series([], dtype=np.float64),
                          "hi": pd.Series([], dtype=np.float64)})
    got = exchange.range_join(rd.from_pandas(left), rd.from_pandas(right),
                              "x", "lo", "hi", 10.0).to_pandas()
    assert len(got) == 0


def test_range_join_broadcast_empty_right(ray_session):
    import ray.data as rd

    left = pd.DataFrame({"x": np.arange(5, dtype=np.float64)})
    right = pd.DataFrame({"lo": pd.Series([], dtype=np.float64),
                          "hi": pd.Series([], dtype=np.float64),
                          "rid": pd.Series([], dtype=np.int64)})
    got = exchange.range_join_broadcast(
        rd.from_pandas(left), right, "x", "lo", "hi").to_pandas()
    assert len(got) == 0


def test_range_join_broadcast_constant_width_bands(ray_session):
    """The sf1 regression shape: many same-width bands tiling one value
    domain. The probe must stay window-bounded (density-proportional) and
    exact — every x matches exactly the bands within width of it."""
    import ray.data as rd

    rng = np.random.default_rng(7)
    lo = rng.uniform(0, 10_000, 2_000)
    right = pd.DataFrame({"lo": lo, "hi": lo + 200.0,
                          "rid": np.arange(2_000, dtype=np.int64)})
    left = pd.DataFrame({"x": rng.uniform(0, 10_000, 500),
                         "lid": np.arange(500, dtype=np.int64)})
    got = exchange.range_join_broadcast(
        rd.from_pandas(left).repartition(4), right,
        "x", "lo", "hi").to_pandas()
    lx = left["x"].to_numpy()[:, None]
    m = (lx >= right["lo"].to_numpy()[None, :]) \
        & (lx <= right["hi"].to_numpy()[None, :])
    li, ri = np.nonzero(m)
    want = pd.DataFrame({"lid": left["lid"].to_numpy()[li],
                         "rid": right["rid"].to_numpy()[ri]})
    cols = ["lid", "rid"]
    pd.testing.assert_frame_equal(
        _norm(got[cols], cols), _norm(want[cols], cols), check_dtype=False)


def test_stratified_sample_partition_invariant(ray_session):
    import ray.data as rd
    from cocrawler_ray.stages.sample import stratified_sample

    rng = np.random.default_rng(31)
    df = pd.DataFrame({"id": np.arange(2000, dtype=np.int64),
                       "s": rng.integers(0, 12, 2000).astype(np.int64)})
    outs = []
    for parts in (3, 11):
        got = (stratified_sample(rd.from_pandas(df).repartition(parts),
                                 ["s"], 7, "id").to_pandas()
               .sort_values(["s", "id"]).reset_index(drop=True))
        outs.append(got)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    sizes = outs[0].groupby("s").size()
    assert (sizes == 7).all()  # every stratum has >7 rows here
    # hash-random, not first-n: the sample is not simply the smallest ids
    assert not outs[0].groupby("s")["id"].max().le(200).all()


def test_pagerank_matches_dense_iteration(ray_session):
    import ray.data as rd
    from cocrawler_ray.stages.graph import pagerank

    rng = np.random.default_rng(41)
    N, E = 60, 300
    src = rng.integers(0, N, E).astype(np.int64)  # node 59 likely dangling
    dst = rng.integers(0, N, E).astype(np.int64)
    src = src[src != 59]; dst = dst[:len(src)]
    nodes = pd.DataFrame({"node": np.arange(N, dtype=np.int64)})
    edges = pd.DataFrame({"src": src, "dst": dst})
    got = (pagerank(rd.from_pandas(nodes).repartition(4),
                    rd.from_pandas(edges).repartition(3),
                    iters=3, damping=0.85).to_pandas()
           .sort_values("node").reset_index(drop=True))
    # dense reference: contributions / outdeg, dangling mass dropped
    deg = np.bincount(src, minlength=N).astype(float)
    r = np.full(N, 1.0 / N)
    for _ in range(3):
        contrib = np.zeros(N)
        np.add.at(contrib, dst, 0.85 * r[src] / deg[src])
        r = 0.15 / N + contrib
    np.testing.assert_allclose(got["r"].to_numpy(), r, rtol=0, atol=1e-12)


def test_min_label_components_exact(ray_session):
    import ray.data as rd
    from cocrawler_ray.stages.graph import min_label_components

    # two chains + a triangle + isolated nodes; diameter 4 < iters
    edges = pd.DataFrame({"src": np.array([1, 2, 3, 4, 10, 11, 20, 21, 22],
                                          dtype=np.int64),
                          "dst": np.array([2, 3, 4, 5, 11, 12, 21, 22, 20],
                                          dtype=np.int64)})
    nodes = pd.DataFrame({"node": np.arange(30, dtype=np.int64)})
    got = (min_label_components(rd.from_pandas(nodes).repartition(3),
                                rd.from_pandas(edges).repartition(2),
                                iters=6).to_pandas()
           .sort_values("node").reset_index(drop=True))
    want = nodes["node"].to_numpy().copy()
    want[[1, 2, 3, 4, 5]] = 1
    want[[10, 11, 12]] = 10
    want[[20, 21, 22]] = 20
    np.testing.assert_array_equal(got["label"].to_numpy(), want)


def test_hierarchical_shuffle_matches_flat(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(17)
    df = pd.DataFrame({"k": rng.integers(0, 200, 5000).astype(np.int64),
                       "v": rng.normal(size=5000)})

    # reapplicable reduce (schema-stable semigroup), per the operator's
    # documented contract
    def red(d: pd.DataFrame) -> pd.DataFrame:
        return (d.groupby("k", sort=False)
                .agg(v=("v", "sum"), mx=("mx", "max")).reset_index())

    df["mx"] = df["v"]

    ds = rd.from_pandas(df).repartition(24)
    flat = (exchange.grouped_shuffle(ds, ["k"], red).to_pandas()
            .sort_values("k").reset_index(drop=True))
    hier = (exchange.grouped_shuffle_hierarchical(
                rd.from_pandas(df).repartition(24), ["k"], red, group_size=5)
            .to_pandas().sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(_norm(flat, ["k"]), _norm(hier, ["k"]))


def test_hierarchical_concat_only_matches_flat(ray_session):
    """reapply=False round 1 is pure ref compaction — identical output for
    a reduce_fn that is NOT a semigroup on its own output (a count)."""
    import ray.data as rd

    rng = np.random.default_rng(23)
    df = pd.DataFrame({"k": rng.integers(0, 150, 4000).astype(np.int64),
                       "v": rng.normal(size=4000)})

    def red(d: pd.DataFrame) -> pd.DataFrame:
        # count-of-rows per key: reapplying this to its own output would
        # yield 1 per key — only correct if applied exactly once
        return d.groupby("k", sort=False).size().rename("n").reset_index()

    flat = (exchange.grouped_shuffle(rd.from_pandas(df).repartition(20),
                                     ["k"], red)
            .to_pandas())
    hier = (exchange.grouped_shuffle_hierarchical(
                rd.from_pandas(df).repartition(20), ["k"], red,
                group_size=4, reapply=False)
            .to_pandas())
    pd.testing.assert_frame_equal(_norm(flat, ["k"]), _norm(hier, ["k"]))
    truth = df.groupby("k").size().rename("n").reset_index()
    pd.testing.assert_frame_equal(_norm(flat, ["k"]), _norm(truth, ["k"]))


def test_flat_exchange_auto_engages_hierarchical(ray_session, monkeypatch):
    """Above the ref budget, grouped_shuffle takes the two-round path
    automatically and still matches the ground truth."""
    import ray.data as rd

    rng = np.random.default_rng(29)
    df = pd.DataFrame({"k": rng.integers(0, 80, 3000).astype(np.int64),
                       "v": rng.integers(0, 9, 3000).astype(np.int64)})

    def red(d: pd.DataFrame) -> pd.DataFrame:
        return d.groupby("k", sort=False).size().rename("n").reset_index()

    calls = []
    orig = exchange.grouped_shuffle_hierarchical

    def spy(*a, **kw):
        calls.append(kw)
        return orig(*a, **kw)

    monkeypatch.setattr(exchange, "_FLAT_REF_BUDGET", 8)
    monkeypatch.setattr(exchange, "_GROUP_SIZE", 4)
    monkeypatch.setattr(exchange, "grouped_shuffle_hierarchical", spy)
    out = (exchange.grouped_shuffle(rd.from_pandas(df).repartition(24),
                                    ["k"], red)
           .to_pandas())
    assert calls and calls[0].get("reapply") is False
    truth = df.groupby("k").size().rename("n").reset_index()
    pd.testing.assert_frame_equal(_norm(out, ["k"]), _norm(truth, ["k"]))


def test_hash_join_empty_right_side(ray_session):
    """Zero-block sides flow through the reduce: left-outer keeps every
    left row null-extended; inner returns empty WITH both sides' schema."""
    import ray.data as rd

    left = pd.DataFrame({"k": np.arange(5, dtype=np.int64),
                         "lv": np.arange(5, dtype=np.int64) * 10})
    right = pd.DataFrame({"k": np.array([], dtype=np.int64),
                          "rv": np.array([], dtype=np.int64)})
    lds = rd.from_pandas(left).repartition(2)
    # filter to zero blocks while keeping the schema
    rds = rd.from_pandas(right)

    outer = exchange.hash_join(lds, rds, ["k"], how="left outer").to_pandas()
    assert len(outer) == 5
    assert set(outer.columns) == {"k", "lv", "rv"}
    assert outer["rv"].isna().all()

    inner = exchange.hash_join(lds, rds, ["k"], how="inner")
    assert inner.count() == 0
    # (all-empty Datasets lose columns through to_pandas — assert on the
    # block schema, which the reduce tasks preserve)
    import ray
    blocks = [ray.get(r) for r in inner.to_arrow_refs()]
    assert blocks and set(blocks[0].schema.names) == {"k", "lv", "rv"}

    anti = exchange.hash_join(lds, rds, ["k"], how="left anti").to_pandas()
    assert sorted(anti["k"]) == [0, 1, 2, 3, 4]


def test_hash_join_auto_compacts_over_budget(ray_session, monkeypatch):
    """Past the ref budget, hash_join compacts each side's blocks with
    concat-only rounds and still equals the pandas merge."""
    import ray.data as rd

    rng = np.random.default_rng(31)
    left = pd.DataFrame({"k": rng.integers(0, 50, 800).astype(np.int64),
                         "lv": rng.integers(0, 9, 800).astype(np.int64)})
    right = pd.DataFrame({"k": np.arange(50, dtype=np.int64),
                          "rv": np.arange(50, dtype=np.int64) * 2})
    monkeypatch.setattr(exchange, "_FLAT_REF_BUDGET", 8)
    monkeypatch.setattr(exchange, "_GROUP_SIZE", 4)
    out = (exchange.hash_join(rd.from_pandas(left).repartition(16),
                              rd.from_pandas(right).repartition(4),
                              ["k"], num_partitions=2)
           .to_pandas())
    want = left.merge(right, on="k")
    pd.testing.assert_frame_equal(_norm(out, ["k", "lv"]),
                                  _norm(want, ["k", "lv"]))


def test_auto_join_broadcast_and_hash_paths_agree(ray_session):
    import numpy as np

    from cocrawler_ray.stages.joins import auto_join

    rng = np.random.default_rng(11)
    left = pd.DataFrame({"k": rng.integers(0, 20, 300),
                         "v": np.arange(300, dtype=np.int64)})
    right = pd.DataFrame({"k": np.arange(0, 25, dtype=np.int64),
                          "w": np.arange(25, dtype=np.int64) * 10})
    want = left.merge(right, on="k").sort_values(["v"]).reset_index(drop=True)
    for gate in (0, 1_000):  # 0 forces the hash exchange, 1000 broadcast
        got = (auto_join(rd.from_pandas(left).repartition(4),
                         rd.from_pandas(right).repartition(2), "k",
                         broadcast_rows_max=gate)
               .to_pandas().sort_values(["v"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got[["k", "v", "w"]], want[["k", "v", "w"]])


def test_auto_join_left_outer_broadcast(ray_session):
    from cocrawler_ray.stages.joins import auto_join

    left = pd.DataFrame({"k": [1, 2, 9], "v": [10, 20, 90]})
    right = pd.DataFrame({"k": [1, 2], "w": [100, 200]})
    got = (auto_join(rd.from_pandas(left), rd.from_pandas(right), "k",
                     how="left outer")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert got["w"].tolist()[:2] == [100, 200] and pd.isna(got["w"][2])


def test_auto_join_empty_right_side(ray_session):
    import pandas as pd
    import ray.data as rd
    from cocrawler_ray.stages.joins import auto_join

    left = rd.from_pandas(pd.DataFrame(
        {"k": [1, 2, 3], "a": ["x", "y", "z"]}))
    # a filter that matches nothing produces empty (possibly null-typed)
    # blocks — the broadcast path must not see them
    right = rd.from_pandas(pd.DataFrame(
        {"k": [9], "b": [1.0]})).filter(lambda r: r["k"] < 0)
    out = auto_join(left, right, "k", how="inner").to_pandas()
    assert len(out) == 0
    out2 = auto_join(left, right, "k", how="left outer").to_pandas()
    assert sorted(out2["k"]) == [1, 2, 3]
    # a filtered-to-empty Dataset is SCHEMA-LESS (Ray drops its columns
    # entirely), so the right side's columns are unknowable: the join
    # degrades to left rows, with b either absent or all-null
    if "b" in out2.columns:
        assert out2["b"].isna().all()


def test_auto_join_skips_empty_blocks_in_broadcast(ray_session):
    import pandas as pd
    import ray.data as rd
    from cocrawler_ray.stages.joins import auto_join

    left = rd.from_pandas(pd.DataFrame({"k": [1, 2, 2], "a": [10, 20, 30]}))
    # 4 blocks, most empty after the filter
    right = (rd.from_pandas(pd.DataFrame({"k": range(8), "b": range(8)}))
             .repartition(4).filter(lambda r: r["k"] in (1, 2)))
    out = auto_join(left, right, "k", how="inner").to_pandas()
    assert sorted(out["b"]) == [1, 2, 2]


def test_partial_groupby_agg_distributed_empty(ray_session):
    import pandas as pd
    import ray.data as rd
    from cocrawler_ray.stages.agg import partial_groupby_agg

    ds = rd.from_pandas(pd.DataFrame({"k": [1], "v": [2.0]})).filter(
        lambda r: False)
    out = partial_groupby_agg(ds, ["k"], {"s": ("v", "sum")},
                              distributed=True)
    assert len(out) == 0 and list(out.columns) == ["k", "s"]


def test_kmeans_seeded_empty_centroids_raises(ray_session):
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd
    from cocrawler_ray.stages.similarity import kmeans_assign_seeded

    # ids far above stride*max_centroids select zero seeds
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(100_000, 100_010),
        "embedding": [np.ones(4).tolist()] * 10}))
    with pytest.raises(ValueError, match="no seeded centroids"):
        kmeans_assign_seeded(ds, stride=37, max_centroids=8)


def test_budget_fallback_pairwise_concat(ray_session, monkeypatch):
    import pandas as pd
    import ray.data as rd
    from cocrawler_ray.stages import exchange

    # force the few-blocks-huge-P budget gap: 8 blocks, P=4, budget 16
    # -> 8*4=32 > 16 and 8 <= group_size, so the pairwise path must
    # engage and the result must still match pandas
    monkeypatch.setattr(exchange, "_FLAT_REF_BUDGET", 16)
    df = pd.DataFrame({"k": list(range(6)) * 8, "v": range(48)})
    ds = rd.from_pandas(df).repartition(8)

    def reduce_fn(part: pd.DataFrame) -> pd.DataFrame:
        return (part.groupby("k", sort=False, observed=True)["v"]
                .sum().reset_index(name="s"))

    out = (exchange.grouped_shuffle(ds, ["k"], reduce_fn,
                                    num_partitions=4)
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = (df.groupby("k")["v"].sum().reset_index(name="s")
            .sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_hash_join_budget_targets_match_pandas(ray_session, monkeypatch):
    import pandas as pd
    import ray.data as rd
    from cocrawler_ray.stages import exchange

    monkeypatch.setattr(exchange, "_FLAT_REF_BUDGET", 32)
    l = pd.DataFrame({"k": list(range(10)) * 6, "a": range(60)})
    r = pd.DataFrame({"k": list(range(10)) * 3, "b": range(30)})
    out = exchange.hash_join(
        rd.from_pandas(l).repartition(6), rd.from_pandas(r).repartition(6),
        ["k"], ["k"], how="inner", num_partitions=4).to_pandas()
    want = l.merge(r, on="k", how="inner")
    assert len(out) == len(want)
    assert sorted(out["a"] * 1000 + out["b"]) == sorted(
        want["a"] * 1000 + want["b"])


def test_detect_hot_keys_pigeonhole_recall(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from cocrawler_ray.stages import exchange

    # key 42: 13 rows in each of 8 blocks (104 > threshold 100) -> hot,
    # even though no single block is dominated by it; key 7: 12 per block
    # (96 <= 100) -> candidate at the local bar but rejected by the exact
    # second-pass count; unique keys stay cold.
    blocks = []
    uid = 1000
    for b in range(8):
        ks = [42] * 13 + [7] * 12 + list(range(uid, uid + 20))
        uid += 20
        blocks.append(pd.DataFrame({"k": ks}))
    ds = rd.from_pandas(blocks)
    hot = exchange.detect_hot_keys(ds, "k", 100)
    assert list(hot) == [42]


def test_skew_hybrid_join_matches_hash_join(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from cocrawler_ray.stages import exchange

    rng = np.random.default_rng(11)
    l = pd.DataFrame({
        "k": np.where(rng.random(4000) < 0.3, 5,
                      rng.integers(0, 500, 4000)).astype(np.int64),
        "a": np.arange(4000, dtype=np.int64)})
    r = pd.DataFrame({"k": np.arange(0, 500, dtype=np.int64),
                      "b": np.arange(0, 5000, 10, dtype=np.int64)})
    out = exchange.skew_hybrid_join(
        rd.from_pandas(l).repartition(8), rd.from_pandas(r).repartition(4),
        "k", hot_threshold=300, num_partitions=4).to_pandas()
    want = l.merge(r, on="k", how="inner")
    assert len(out) == len(want)
    assert sorted(out["a"] * 10_000 + out["b"]) == sorted(
        want["a"] * 10_000 + want["b"])
    # the hot key must really have been detected (hybrid path taken)
    assert list(exchange.detect_hot_keys(
        rd.from_pandas(l).repartition(8), "k", 300)) == [5]


def test_detect_hot_keys_string_keys(ray_session):
    import pandas as pd
    import ray.data as rd
    from cocrawler_ray.stages import exchange

    # the motivating skew case is host/URL-keyed — keys must not be
    # coerced to int64
    blocks = [pd.DataFrame({"host": ["big.com"] * 40
                            + [f"h{i}-{j}.net" for j in range(10)]})
              for i in range(4)]
    hot = exchange.detect_hot_keys(rd.from_pandas(blocks), "host", 100)
    assert list(hot) == ["big.com"]


def test_bfs_layers_exact(ray_session):
    import ray.data as rd
    from cocrawler_ray.stages.graph import bfs_layers

    # directed chain 0->1->2->3->4->5, a shortcut 0->3, a back edge
    # 5->0, and unreachable nodes 6..9
    edges = pd.DataFrame({"src": np.array([0, 1, 2, 3, 4, 0, 5],
                                          dtype=np.int64),
                          "dst": np.array([1, 2, 3, 4, 5, 3, 0],
                                          dtype=np.int64)})
    nodes = pd.DataFrame({"node": np.arange(10, dtype=np.int64)})
    got = (bfs_layers(rd.from_pandas(nodes).repartition(3),
                      rd.from_pandas(edges).repartition(2),
                      lambda nd: nd == 0, iters=3).to_pandas()
           .sort_values("node").reset_index(drop=True))
    # dist: 0->0, 1->1, 2->2, 3->1 (shortcut), 4->2, 5->3; 6..9 dropped
    np.testing.assert_array_equal(got["node"].to_numpy(),
                                  np.array([0, 1, 2, 3, 4, 5]))
    np.testing.assert_array_equal(got["dist"].to_numpy(),
                                  np.array([0, 1, 2, 1, 2, 3]))


def test_bfs_layers_depth_bound(ray_session):
    import ray.data as rd
    from cocrawler_ray.stages.graph import bfs_layers

    # a pure chain: iters=2 must keep exactly hops 0..2
    n = 8
    edges = pd.DataFrame({"src": np.arange(n - 1, dtype=np.int64),
                          "dst": np.arange(1, n, dtype=np.int64)})
    nodes = pd.DataFrame({"node": np.arange(n, dtype=np.int64)})
    got = (bfs_layers(rd.from_pandas(nodes).repartition(2),
                      rd.from_pandas(edges).repartition(2),
                      lambda nd: nd == 0, iters=2).to_pandas()
           .sort_values("node").reset_index(drop=True))
    np.testing.assert_array_equal(got["node"].to_numpy(), [0, 1, 2])
    np.testing.assert_array_equal(got["dist"].to_numpy(), [0, 1, 2])


def test_hash_join_fused_reduce_equivalence(ray_session):
    import ray.data as rd
    from cocrawler_ray.stages.exchange import hash_join

    rng = np.random.default_rng(17)
    left = pd.DataFrame({"k": rng.integers(0, 50, 400).astype(np.int64),
                         "v": rng.integers(0, 9, 400).astype(np.int64)})
    right = pd.DataFrame({"k": np.arange(50, dtype=np.int64),
                          "w": np.arange(50, dtype=np.int64) * 10})

    def red(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"k": pd.Series(dtype=np.int64),
                                 "s": pd.Series(dtype=np.int64)})
        g = df.groupby("k", sort=False).apply(
            lambda x: int((x["v"] + x["w"]).sum()), include_groups=False)
        return pd.DataFrame({"k": g.index.to_numpy(np.int64),
                             "s": g.to_numpy(np.int64)})

    fused = (hash_join(rd.from_pandas(left).repartition(4),
                       rd.from_pandas(right).repartition(3),
                       on=["k"], num_partitions=4, reduce_fn=red)
             .to_pandas().sort_values("k").reset_index(drop=True))
    plain = (hash_join(rd.from_pandas(left).repartition(4),
                       rd.from_pandas(right).repartition(3),
                       on=["k"], num_partitions=4).to_pandas())
    want = red(plain).sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(fused, want)


def test_bfs_layers_no_seeds(ray_session):
    import ray.data as rd
    from cocrawler_ray.stages.graph import bfs_layers

    edges = pd.DataFrame({"src": np.array([0, 1], dtype=np.int64),
                          "dst": np.array([1, 2], dtype=np.int64)})
    nodes = pd.DataFrame({"node": np.arange(5, dtype=np.int64)})
    got = bfs_layers(rd.from_pandas(nodes).repartition(2),
                     rd.from_pandas(edges).repartition(2),
                     lambda nd: np.zeros(len(nd), dtype=bool),
                     iters=3).to_pandas()
    assert len(got) == 0


def test_sssp_exact(ray_session):
    import ray.data as rd
    from cocrawler_ray.stages.graph import sssp

    # weighted diamond: 0->1 (w=1), 0->2 (w=5), 1->2 (w=1), 2->3 (w=1),
    # 1->3 (w=10): best 0->3 is 0-1-2-3 = 3 (three hops beats the
    # two-hop 0-1-3 = 11 and 0-2-3 = 6) — distinguishes Bellman-Ford
    # from hop-count BFS
    edges = pd.DataFrame({"src": np.array([0, 0, 1, 2, 1], dtype=np.int64),
                          "dst": np.array([1, 2, 2, 3, 3], dtype=np.int64),
                          "w": np.array([1, 5, 1, 1, 10], dtype=np.int64)})
    nodes = pd.DataFrame({"node": np.arange(6, dtype=np.int64)})
    got = (sssp(rd.from_pandas(nodes).repartition(3),
                rd.from_pandas(edges).repartition(2),
                lambda nd: nd == 0, iters=3).to_pandas()
           .sort_values("node").reset_index(drop=True))
    np.testing.assert_array_equal(got["node"].to_numpy(),
                                  np.array([0, 1, 2, 3]))
    np.testing.assert_array_equal(got["dist"].to_numpy(),
                                  np.array([0, 1, 2, 3]))
    # depth bound: with iters=2 the 3-edge path is not yet available,
    # so node 3 reads the 2-hop optimum 6 (via 0-2-3)
    got2 = (sssp(rd.from_pandas(nodes).repartition(3),
                 rd.from_pandas(edges).repartition(2),
                 lambda nd: nd == 0, iters=2).to_pandas()
            .sort_values("node").reset_index(drop=True))
    assert got2.loc[got2["node"] == 3, "dist"].item() == 6


def test_label_propagation_two_cliques(ray_session):
    import ray.data as rd
    from cocrawler_ray.stages.graph import label_propagation

    # two 4-cliques joined by ONE bridge edge: components would merge
    # them into one label; LPA keeps two communities (each node's
    # neighbor majority stays inside its clique)
    def clique(base):
        ii, jj = np.meshgrid(np.arange(4), np.arange(4))
        m = ii < jj
        return base + ii[m], base + jj[m]

    s1, d1 = clique(0)
    s2, d2 = clique(10)
    edges = pd.DataFrame({
        "src": np.concatenate([s1, s2, [3]]).astype(np.int64),
        "dst": np.concatenate([d1, d2, [10]]).astype(np.int64)})
    nodes = pd.DataFrame(
        {"node": np.array([0, 1, 2, 3, 10, 11, 12, 13], dtype=np.int64)})
    got = (label_propagation(rd.from_pandas(nodes).repartition(3),
                             rd.from_pandas(edges).repartition(2),
                             iters=4).to_pandas()
           .sort_values("node").reset_index(drop=True))
    labs = got["label"].to_numpy()
    assert (labs[:4] == 0).all()          # clique 1 converges to min id 0
    assert (labs[4:] == labs[4]).all()    # clique 2 is ONE community...
    assert labs[4] != 0                   # ...separate from clique 1


def test_opic_matches_dense_iteration_and_conserves_cash(ray_session):
    import ray.data as rd
    from cocrawler_ray.stages.graph import opic

    rng = np.random.default_rng(43)
    N, E = 50, 240
    src = rng.integers(0, N, E).astype(np.int64)
    dst = rng.integers(0, N, E).astype(np.int64)
    # ensure NO dangling nodes so cash is conserved exactly
    missing = np.setdiff1d(np.arange(N), np.unique(src))
    src = np.concatenate([src, missing])
    dst = np.concatenate([dst, (missing + 1) % N])
    nodes = pd.DataFrame({"node": np.arange(N, dtype=np.int64)})
    edges = pd.DataFrame({"src": src, "dst": dst})
    got = (opic(rd.from_pandas(nodes).repartition(4),
                rd.from_pandas(edges).repartition(3), iters=3)
           .to_pandas().sort_values("node").reset_index(drop=True))
    # dense reference: cash flows c -> c' along edges; imp = sum of the
    # cash sequence c0..c3
    deg = np.bincount(src, minlength=N).astype(float)
    c = np.full(N, 1.0 / N)
    imp = c.copy()
    for _ in range(3):
        nxt = np.zeros(N)
        np.add.at(nxt, dst, c[src] / deg[src])
        c = nxt
        imp += c
    np.testing.assert_allclose(got["imp"].to_numpy(), np.round(imp, 6),
                               rtol=0, atol=1e-9)
    # cash conservation: total importance = (iters + 1) * total cash
    # (tolerance: N values each rounded to 6dp -> up to N*5e-7 drift)
    assert abs(got["imp"].sum() - 4.0) < 5e-5

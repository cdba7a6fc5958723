"""Edge-case units for the seventh-session operators, each checked
against a brute-force reference on a handcrafted adversarial table —
cases the conformance fixtures may not exercise: blocking-key ties
straddling rank-bucket boundaries (sorted-neighborhood), intervals
crossing tile edges (overlap join), self-loops in the constructed graph
(common neighbors), and a vocabulary smaller than the Zipf head."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write(tmp_path, name: str, table: pa.Table) -> str:
    pq.write_table(table, f"{tmp_path}/{name}.parquet")
    return str(tmp_path)


def test_sorted_neighborhood_bucket_boundaries(ray_session, tmp_path):
    # 37 customers, acctbal ties everywhere (cents in {0, 1, 2}) — with
    # N=37 and 8 test CPUs the bucket width is small, so most windows
    # cross a bucket edge; the owner rule must still count each pair
    # exactly once.
    from cocrawler_ray.queries import QUERIES
    rng = np.random.default_rng(7)
    n, w = 37, 4
    cents = rng.integers(0, 3, n).astype(np.int64)
    nat = rng.integers(0, 4, n).astype(np.int64)
    sf = _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n, dtype=np.int64)),
        "c_acctbal": pa.array(cents / 100.0, pa.float64()),
        "c_nationkey": pa.array(nat)}))
    got = QUERIES["q_sorted_neighborhood"](sf).set_index("d")

    order = np.lexsort((np.arange(n), cents))
    sc, sn = cents[order], nat[order]
    for d in range(1, w + 1):
        a, b = np.arange(n - d), np.arange(d, n)
        assert got.loc[d, "n_pairs"] == n - d
        assert got.loc[d, "n_match"] == int((sn[a] == sn[b]).sum())
        assert got.loc[d, "gap_cents"] == int((sc[b] - sc[a]).sum())


def test_interval_overlap_tile_edges(ray_session, tmp_path):
    # order dates planted AT tile boundaries (multiples of 16 days) so
    # every interval pair that overlaps does so across a tile edge; the
    # max(a.lo, b.lo)-ownership rule must dedup the 2x replication.
    from cocrawler_ray.queries import QUERIES
    days = np.array([14, 15, 16, 17, 30, 31, 32, 33, 47, 48], np.int64)
    keys = np.arange(1, len(days) * 2 + 1, dtype=np.int64)
    pri = np.where(keys % 2 == 0, "1-URGENT", "2-HIGH")
    day = np.repeat(days, 2)
    sf = _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array(keys),
        "o_orderpriority": pa.array(pri.tolist(), pa.string()),
        "o_orderdate": pa.array(
            (day * 86_400_000_000).view("datetime64[us]")),
    }))
    got = QUERIES["q_interval_overlap"](sf)

    a_lo = day[keys % 2 == 0]
    a_hi = a_lo + keys[keys % 2 == 0] % 7 + 1
    b_lo = day[keys % 2 == 1]
    b_hi = b_lo + keys[keys % 2 == 1] % 5 + 1
    ov = []
    for i in range(len(a_lo)):
        for j in range(len(b_lo)):
            if a_lo[i] <= b_hi[j] and b_lo[j] <= a_hi[i]:
                ov.append(min(a_hi[i], b_hi[j]) - max(a_lo[i], b_lo[j]) + 1)
    want = pd.Series(ov).value_counts().sort_index()
    assert got.set_index("overlap_days")["n_pairs"].to_dict() == \
        want.to_dict()


def test_common_neighbors_excludes_self_loops(ray_session, tmp_path):
    # n=7 makes (d*7+1) % 7 == 1 for d=1 — a self-loop the undirected
    # builder must drop before wedge enumeration.
    from cocrawler_ray.queries import QUERIES
    n = 7
    sf = _write(tmp_path, "documents", pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(["x"] * n)}))
    got = QUERIES["q_common_neighbors"](sf)

    edges = set()
    for d in range(n):
        for dst in ((d * 7 + 1) % n, (d * 13 + 3) % n):
            if dst != d:
                edges.add((min(d, dst), max(d, dst)))
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    from collections import Counter
    pair_k: Counter = Counter()
    for c, nbs in adj.items():
        s = sorted(nbs)
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                pair_k[(s[i], s[j])] += 1
    want = Counter(pair_k.values())
    assert got.set_index("k")["n_pairs"].to_dict() == dict(want)


def test_zipf_slope_small_vocab(ray_session, tmp_path):
    # vocabulary smaller than the K=64 head: the fit must use exactly
    # the distinct-term count, with the (count desc, term asc) order.
    from cocrawler_ray.queries import QUERIES
    docs = ["a a a a b b c", "a a b c d", "a b"]
    sf = _write(tmp_path, "documents", pa.table({
        "doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
        "text": pa.array(docs)}))
    got = QUERIES["q_zipf_slope"](sf)
    counts = np.array([7, 4, 2, 1], np.float64)  # a,b,c,d
    x = np.log(np.arange(1, 5, dtype=np.float64))
    y = np.log(counts)
    slope = ((x - x.mean()) * (y - y.mean())).sum() / \
        ((x - x.mean()) ** 2).sum()
    assert int(got["k"].iloc[0]) == 4
    assert got["slope"].iloc[0] == pytest.approx(round(slope, 6), abs=1e-9)

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


def test_otsu_threshold_bimodal_and_constant():
    from cocrawler_ray.stages.multimodal import OtsuThreshold
    from cocrawler_ray import codecs
    # constant frame: one occupied bin, den = 0 everywhere -> no row
    const = np.full((16, 16, 3), 100, np.uint8)
    # clean bimodal frame: half pixels at gray-sum 0 (bin 0), half at
    # 765 (bin 63) -> any t in 0..62 separates perfectly; the exact
    # tie-break picks the smallest t with max num/den, which for a
    # symmetric two-spike histogram is t = 0
    bim = np.zeros((16, 16, 3), np.uint8)
    bim[8:, :, :] = 255

    def batch(imgs):
        return pa.table({
            "image_id": pa.array([f"t{i}" for i in range(len(imgs))]),
            "bytes": pa.array([codecs.encode(im, "raw16") for im in imgs],
                              pa.binary()),
            "w": pa.array(np.array([im.shape[1] for im in imgs], np.int32)),
            "h": pa.array(np.array([im.shape[0] for im in imgs], np.int32)),
            "fmt": pa.array(["raw16"] * len(imgs))})

    out = OtsuThreshold()(batch([const, bim]))
    assert out.column("image_id").to_pylist() == ["t1"]
    n = 16 * 16
    assert out.column("n_fg").to_pylist() == [n // 2]
    # two equal spikes at bins 0 and 63: num = (cums*N - S*cnt)^2 with
    # cnt = N/2, cums = 0, S = 63*N/2 -> num = (63*N^2/4)^2, den = N^2/4
    t = out.column("otsu_bin").to_pylist()[0]
    assert 0 <= t < 63
    num = out.column("sep_num").to_pylist()[0]
    den = out.column("sep_den").to_pylist()[0]
    assert den == (n // 2) ** 2
    assert num == (63 * n * n // 4) ** 2


def test_otsu_exact_argmax_matches_bruteforce():
    from cocrawler_ray.stages.multimodal import OtsuThreshold
    from cocrawler_ray import codecs
    rng = np.random.default_rng(11)
    imgs = [rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
            for _ in range(6)]
    t = pa.table({
        "image_id": pa.array([f"r{i}" for i in range(len(imgs))]),
        "bytes": pa.array([codecs.encode(im, "raw16") for im in imgs],
                          pa.binary()),
        "w": pa.array(np.array([16] * 6, np.int32)),
        "h": pa.array(np.array([16] * 6, np.int32)),
        "fmt": pa.array(["raw16"] * 6)})
    out = OtsuThreshold()(t)
    got = dict(zip(out.column("image_id").to_pylist(),
                   out.column("otsu_bin").to_pylist()))
    from fractions import Fraction
    for i, im in enumerate(imgs):
        bins = im.astype(np.int64).sum(axis=2) // 12
        hist = np.bincount(bins.ravel(), minlength=64)
        N, S = int(hist.sum()), int((hist * np.arange(64)).sum())
        best, bf = -1, Fraction(-1)
        for tt in range(63):
            cnt = int(hist[:tt + 1].sum())
            cums = int((hist[:tt + 1] * np.arange(tt + 1)).sum())
            den = cnt * (N - cnt)
            if den == 0:
                continue
            f = Fraction((cums * N - S * cnt) ** 2, den)
            if f > bf:
                best, bf = tt, f
        assert got[f"r{i}"] == best


def test_blob_bbox_tiebreak_and_geometry():
    from cocrawler_ray.stages.multimodal import BlobBbox
    from cocrawler_ray import codecs
    # two blobs of EQUAL size: the winner must be the smaller label
    # (the top-left one, since labels are linear indices)
    tie = np.zeros((16, 16, 3), np.uint8)
    tie[1:3, 1:3] = 255      # 4 px, label ~ 17
    tie[10:12, 10:12] = 255  # 4 px, label ~ 170
    # one dominant L-shaped blob plus a speck
    dom = np.zeros((16, 16, 3), np.uint8)
    dom[2:4, 2:12] = 255
    dom[2:12, 2:4] = 255
    dom[14, 14] = 255

    def batch(imgs):
        return pa.table({
            "image_id": pa.array([f"t{i}" for i in range(len(imgs))]),
            "bytes": pa.array([codecs.encode(im, "raw16") for im in imgs],
                              pa.binary()),
            "w": pa.array(np.array([16] * len(imgs), np.int32)),
            "h": pa.array(np.array([16] * len(imgs), np.int32)),
            "fmt": pa.array(["raw16"] * len(imgs))})

    out = BlobBbox(threshold=640)(batch([tie, dom]))
    rows = {out.column("image_id")[i].as_py():
            {c: out.column(c)[i].as_py() for c in
             ("blob_px", "x0", "x1", "y0", "y1")}
            for i in range(out.num_rows)}
    assert rows["t0"] == {"blob_px": 4, "x0": 1, "x1": 2, "y0": 1, "y1": 2}
    assert rows["t1"] == {"blob_px": 20 + 16, "x0": 2, "x1": 11,
                          "y0": 2, "y1": 11}


def test_audio_gain_flat_and_fullscale():
    from cocrawler_ray.stages.multimodal import AudioGain
    flat = bytes([128] * 64)            # peak 0 -> gain 0
    full = bytes([0, 255] * 32)         # peak 128 -> gain 992
    t = pa.table({
        "image_id": pa.array(["a", "b"]),
        "bytes": pa.array([flat, full], pa.binary())})
    out = AudioGain()(t)
    assert out.column("peak").to_pylist() == [0, 128]
    assert out.column("gain_permille").to_pylist() == [0, 127000 // 128]
    assert out.column("sum_dc").to_pylist() == [0, (-128 + 127) * 32]
    assert out.column("n_samples").to_pylist() == [64, 64]


def test_matryoshka_overlap_candidate_union(ray_session):
    # the per-batch candidate-union rule must reproduce the global
    # brute-force overlap even with many tiny blocks (forcing merges)
    import ray.data as rd
    from cocrawler_ray.stages.similarity import (int8_quantize,
                                                 matryoshka_overlap)
    rng = np.random.default_rng(3)
    n, dim, nq, k = 120, 32, 4, 5
    V = rng.normal(size=(n, dim))
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [v.tolist() for v in V]})).repartition(10)
    got = matryoshka_overlap(ds, prefix_dim=8, k=k, n_queries=nq)
    Q = int8_quantize(V[:nq]).astype(np.int64)
    M = int8_quantize(V[nq:]).astype(np.int64)
    ids = np.arange(nq, n, dtype=np.int64)
    for q in range(nq):
        sf = M @ Q[q]
        sp = M[:, :8] @ Q[q, :8]
        tf = set(ids[np.lexsort((ids, -sf))[:k]])
        tp = set(ids[np.lexsort((ids, -sp))[:k]])
        assert int(got.set_index("query_id").loc[q, "overlap10"]) == \
            len(tf & tp)


def test_ring_rebalance_moves_only_to_new_node(ray_session, tmp_path):
    # consistent-hashing invariant: every moved key's NEW owner is the
    # joining shard (16) — plain-modulo resharding would scatter them.
    from cocrawler_ray.hashing import splitmix64
    from cocrawler_ray.queries import QUERIES
    n = 500
    sf = _write(tmp_path, "events", pa.table({
        "user_id": pa.array(np.arange(n, dtype=np.int64)),
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.zeros(n).astype("datetime64[us]")),
        "event_type": pa.array(["x"] * n),
        "value": pa.array(np.ones(n)),
        "props": pa.array(["{}"] * n)}))
    got = QUERIES["q_ring_rebalance"](sf)
    # brute force
    P, V = 16, 8
    idx = np.arange((P + 1) * V, dtype=np.uint64)
    pos = splitmix64(idx // np.uint64(V) * np.uint64(64)
                     + idx % np.uint64(V))
    shard = (idx // np.uint64(V)).astype(np.int64)

    def owner(h, mask):
        p, s = pos[mask], shard[mask]
        o = np.argsort(p, kind="stable")
        p, s = p[o], s[o]
        i = np.searchsorted(p, h, side="right") - 1
        return s[np.where(i < 0, len(p) - 1, i)]

    h = splitmix64(np.arange(n, dtype=np.uint64))
    b = owner(h, shard < P)
    a = owner(h, np.ones(len(shard), bool))
    moved = a != b
    assert (a[moved] == P).all()           # only to the new node
    want = pd.DataFrame({"shard": b, "m": moved.astype(np.int64)}) \
        .groupby("shard").agg(n_before=("m", "size"), n_moved=("m", "sum"))
    g = got.set_index("shard")
    assert g["n_before"].to_dict() == want["n_before"].to_dict()
    assert g["n_moved"].to_dict() == want["n_moved"].to_dict()
    # the ring moves a small slice, not (P-1)/P like modulo would
    assert got["n_moved"].sum() < 0.25 * got["n_before"].sum()


def test_ycc_subsample_audit_matches_bruteforce():
    """YCbCrSubsampleAudit vs a per-pixel brute force on RANDOM pixels
    (the conformance oracle runs formula images; this covers arbitrary
    content) — fixed-point sums exact, busy census exact, and the
    chroma planes stay in [0, 255]."""
    from cocrawler_ray import codecs
    from cocrawler_ray.stages.multimodal import YCbCrSubsampleAudit

    rng = np.random.default_rng(5)
    imgs = [rng.integers(0, 256, (12, 16, 3)).astype(np.uint8),
            np.zeros((8, 8, 3), np.uint8),
            np.full((8, 10, 3), 255, np.uint8)]
    batch = pa.table({
        "image_id": pa.array([f"t{i}" for i in range(len(imgs))]),
        "bytes": pa.array([codecs.encode(im, "raw16") for im in imgs],
                          pa.binary()),
        "w": pa.array(np.array([im.shape[1] for im in imgs], np.int32)),
        "h": pa.array(np.array([im.shape[0] for im in imgs], np.int32)),
        "fmt": pa.array(["raw16"] * len(imgs))})
    out = YCbCrSubsampleAudit(busy_range=16)(batch)
    for i, im in enumerate(imgs):
        r = im[:, :, 0].astype(np.int64)
        g = im[:, :, 1].astype(np.int64)
        b = im[:, :, 2].astype(np.int64)
        yy = (77 * r + 150 * g + 29 * b) // 256
        cb = (-43 * r - 85 * g + 128 * b + 32768) // 256
        cr = (128 * r - 107 * g - 21 * b + 32768) // 256
        assert 0 <= cb.min() and cb.max() <= 255
        assert 0 <= cr.min() and cr.max() <= 255
        assert out.column("sum_y")[i].as_py() == yy.sum()
        assert out.column("sum_cb")[i].as_py() == cb.sum()
        assert out.column("sum_cr")[i].as_py() == cr.sum()
        h2, w2 = im.shape[0] // 2, im.shape[1] // 2
        busy = 0
        for by in range(h2):
            for bx in range(w2):
                sl = np.s_[2 * by:2 * by + 2, 2 * bx:2 * bx + 2]
                if (cb[sl].max() - cb[sl].min() > 16
                        or cr[sl].max() - cr[sl].min() > 16):
                    busy += 1
        assert out.column("n_busy")[i].as_py() == busy
        assert out.column("n_blocks")[i].as_py() == h2 * w2
    # gray image: constant-chroma (128) planes, zero busy blocks
    assert out.column("n_busy")[2].as_py() == 0

"""ANN correctness: approximate paths vs the brute-force baseline.

Deterministic guarantees (no flaky recall thresholds):
- IVF probing ALL cells degenerates to the exact scan == brute force.
- A query that IS a corpus row always finds itself (identical vector ->
  identical LSH key / same IVF cell), so approx recall@1 == 1 for
  self-queries.
- Approximate results can never beat the exact kth similarity.
"""

from __future__ import annotations

import numpy as np
import pytest

import ray.data as rd

from cocrawler_ray.stages import similarity as sim

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(ray_session):
    ds = rd.read_parquet(f"{SF}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    rows = ds.take(50)
    return ds, rows


def test_ivf_full_probe_equals_brute_force(emb):
    ds, rows = emb
    q = np.asarray(rows[3]["embedding"], dtype=np.float64)
    exact = sim.cosine_topk(ds, q, k=10)
    ivf = sim.ivf_topk(ds, q, k=10, nlist=8, nprobe=8)
    assert ivf["vec_id"].tolist() == exact["vec_id"].tolist()
    assert np.allclose(ivf["sim"], exact["sim"])


def test_self_query_found_by_all_paths(emb):
    ds, rows = emb
    for r in rows[:5]:
        q = np.asarray(r["embedding"], dtype=np.float64)
        assert sim.cosine_topk(ds, q, k=1)["vec_id"].iloc[0] == r["vec_id"]
        assert sim.lsh_topk(ds, q, k=1, n_bits=8)["vec_id"].iloc[0] == r["vec_id"]
        assert sim.ivf_topk(ds, q, k=1, nlist=8, nprobe=2)["vec_id"].iloc[0] == r["vec_id"]


def test_ivf_seeded_full_probe_equals_brute_force(emb):
    ds, rows = emb
    q = np.asarray(rows[3]["embedding"], dtype=np.float64)
    exact = sim.cosine_topk(ds, q, k=10)
    n_cent = sum(1 for r in ds.take_all() if r["vec_id"] % 37 == 1)
    ivf = sim.ivf_topk_seeded(ds, q, k=10, stride=37, nprobe=n_cent)
    assert ivf["vec_id"].tolist() == exact["vec_id"].tolist()
    assert np.allclose(ivf["sim"], exact["sim"])


def test_embedding_neardup_block_pairs_exact(emb):
    """Distributed block-pair cartesian == naive all-pairs on the driver."""
    from cocrawler_ray.stages import dedup
    ds, _ = emb
    got = dedup.embedding_neardup_pairs(ds, threshold=0.4)
    rows = ds.take_all()
    ids = np.array([r["vec_id"] for r in rows])
    M = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    sims = M @ M.T
    want = sorted((int(min(ids[i], ids[j])), int(max(ids[i], ids[j])))
                  for i in range(len(ids)) for j in range(i + 1, len(ids))
                  if sims[i, j] >= 0.4)
    assert list(zip(got["vec_a"], got["vec_b"])) == want


def test_embedding_neardup_lsh_subset_of_exact(emb):
    """Bucketed pairs are a subset of the exact pair set with equal sims
    (and the op returns a streaming Dataset, never driver pandas)."""
    import ray.data as rd

    from cocrawler_ray.stages import dedup
    ds, _ = emb
    exact = dedup.embedding_neardup_pairs(ds, threshold=0.4)
    lsh_ds = dedup.embedding_neardup_lsh_pairs(ds, threshold=0.4)
    assert isinstance(lsh_ds, rd.Dataset)
    lsh = lsh_ds.to_pandas()
    ex = {(a, b): s for a, b, s in zip(exact["vec_a"], exact["vec_b"], exact["sim"])}
    assert len(lsh) > 0
    # distributed pair dedup: each (a, b) exactly once despite n_tables
    assert not lsh.duplicated(["vec_a", "vec_b"]).any()
    for a, b, s in zip(lsh["vec_a"], lsh["vec_b"], lsh["sim"]):
        assert (a, b) in ex and abs(ex[(a, b)] - s) < 1e-9


def test_embedding_neardup_lsh_skewed_hot_bucket(ray_session):
    """One bucket >> others (a giant near-dup cluster): the tiled
    in-bucket matmul must still produce the complete, deduped pair set.
    tile is set below the hot-bucket size so the tiling path is actually
    exercised."""
    import ray.data as rd

    from cocrawler_ray.stages import dedup

    rng = np.random.default_rng(11)
    base = rng.normal(size=8)
    base /= np.linalg.norm(base)
    rows = []
    # 40 near-identical vectors -> one hot bucket in every table
    for i in range(40):
        v = base + rng.normal(scale=1e-3, size=8)
        rows.append({"vec_id": i, "embedding": (v / np.linalg.norm(v)).tolist()})
    # plus scattered singletons
    for i in range(40, 60):
        v = rng.normal(size=8)
        rows.append({"vec_id": i, "embedding": (v / np.linalg.norm(v)).tolist()})
    ds = rd.from_items(rows).repartition(4)
    got = (dedup.embedding_neardup_lsh_pairs(ds, threshold=0.98, tile=7)
           .to_pandas().sort_values(["vec_a", "vec_b"]).reset_index(drop=True))
    # the hot cluster is mutually >= 0.98 similar: all 40*39/2 pairs,
    # each exactly once
    hot = got[(got["vec_a"] < 40) & (got["vec_b"] < 40)]
    assert len(hot) == 40 * 39 // 2
    assert not got.duplicated(["vec_a", "vec_b"]).any()
    # sims agree with the exact block-pair path
    exact = dedup.embedding_neardup_pairs(ds, threshold=0.98)
    ex = {(a, b): s for a, b, s in zip(exact["vec_a"], exact["vec_b"],
                                       exact["sim"])}
    for a, b, s in zip(got["vec_a"], got["vec_b"], got["sim"]):
        assert (a, b) in ex and abs(ex[(a, b)] - s) < 1e-9


def test_approx_never_beats_exact(emb):
    ds, rows = emb
    q = np.asarray(rows[7]["embedding"], dtype=np.float64)
    exact = sim.cosine_topk(ds, q, k=10)
    for approx in (sim.lsh_topk(ds, q, k=10, n_bits=8),
                   sim.ivf_topk(ds, q, k=10, nlist=8, nprobe=2)):
        assert len(approx) <= 10
        # rank-wise: approximate sims are bounded by the exact sims
        for i in range(len(approx)):
            assert approx["sim"].iloc[i] <= exact["sim"].iloc[i] + 1e-9


def test_int8_quantize_floor_and_clip():
    x = np.array([[0.0, 0.5, -0.5, 3.0, -3.0, 1/64, 1/64 - 1e-12]])
    q = sim.int8_quantize(x, scale=64.0)[0]
    # floor semantics: 0.5*64=32; -0.5*64=-32; clip at +-127;
    # 1/64*64=1.0 -> 1; just-below -> 0
    np.testing.assert_array_equal(q, np.array([0, 32, -32, 127, -127, 1, 0],
                                              dtype=np.int8))


def test_int8_topk_matches_local_int_dot(emb):
    ds, rows = emb
    q = np.asarray(rows[0]["embedding"], dtype=np.float64)
    got = sim.int8_topk(ds, q, k=10, exclude_ids={rows[0]["vec_id"]})
    # local reference: quantize everything, exact integer dots
    import pyarrow.parquet as pq
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    M = np.stack([np.asarray(v, dtype=np.float64)
                  for v in t["embedding"].to_pylist()])
    ids = t["vec_id"].to_numpy()
    qd = sim.int8_quantize(M).astype(np.int64) @ \
        sim.int8_quantize(q[None, :])[0].astype(np.int64)
    import pandas as pd
    ref = (pd.DataFrame({"vec_id": ids, "score": qd})
           [lambda d: d["vec_id"] != rows[0]["vec_id"]]
           .sort_values(["score", "vec_id"], ascending=[False, True])
           .head(10).reset_index(drop=True))
    np.testing.assert_array_equal(got["vec_id"].to_numpy(),
                                  ref["vec_id"].to_numpy())
    np.testing.assert_array_equal(got["score"].to_numpy(),
                                  ref["score"].to_numpy())
    assert got["score"].dtype.kind == "i"  # integer-exact scores

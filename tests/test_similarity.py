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
    """Bucketed pairs are a subset of the exact pair set with equal sims."""
    from cocrawler_ray.stages import dedup
    ds, _ = emb
    exact = dedup.embedding_neardup_pairs(ds, threshold=0.4)
    lsh = dedup.embedding_neardup_lsh_pairs(ds, threshold=0.4)
    ex = {(a, b): s for a, b, s in zip(exact["vec_a"], exact["vec_b"], exact["sim"])}
    assert len(lsh) > 0
    for a, b, s in zip(lsh["vec_a"], lsh["vec_b"], lsh["sim"]):
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

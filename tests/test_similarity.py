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

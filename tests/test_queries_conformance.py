"""Every queries() entry vs its DuckDB oracle at sf0.001 — the same
row-count + column-set + order-insensitive value comparison the driver
runs at sf0.01, folded into `pytest -x -q` so the conformance gate is
self-contained (north rule: "validated ... checked by python -m pytest").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd
    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: v.hex()
                              if isinstance(v, (bytes, bytearray)) else str(v))
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


@pytest.fixture(scope="module")
def duck():
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS "
                    f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    yield con
    con.close()


def _query_names():
    from cocrawler_ray.queries import ORACLE, QUERIES
    assert set(ORACLE) == set(QUERIES), "every query must carry an oracle"
    return sorted(QUERIES)


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(name, ray_session, duck):
    from cocrawler_ray.queries import ORACLE, QUERIES
    try:
        raw = _to_pandas(QUERIES[name](SF_DIR))
    except Exception as e:
        # Late in a long single-session suite, Ray Data actor-pool stages
        # can die on the actor-restart hazard of ray#53727 (constructor
        # args evicted from the object store -> restart fails) — an infra
        # crash, not an engine defect. Retry ONCE, but only for that
        # known infra signature (Ray worker/actor death) — any other
        # exception, including a nondeterministic engine bug, propagates
        # immediately. The retried name is printed so flaky engine
        # failures stay visible in the report.
        import traceback
        infra = ("RayTaskError", "ActorDiedError", "ActorUnavailableError",
                 "WorkerCrashedError", "OwnerDiedError",
                 "ObjectLostError", "RayActorError")
        chain_types = set()
        exc = e
        while exc is not None:
            chain_types.add(type(exc).__name__)
            exc = exc.__cause__ or exc.__context__
        if not chain_types & set(infra):
            raise
        traceback.print_exc()
        print(f"[conformance] infra-retry after {sorted(chain_types)}: "
              f"{name}")
        raw = _to_pandas(QUERIES[name](SF_DIR))
    got = _normalize(raw)
    want = _normalize(duck.execute(ORACLE[name]).fetchdf())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        if pd.api.types.is_float_dtype(got[c]):
            assert np.allclose(got[c], want[c], rtol=0, atol=0,
                               equal_nan=True), f"column {c} differs"
        else:
            assert got[c].equals(want[c]), f"column {c} differs"


def test_priority_window_covers_every_family():
    """The first 50 registered queries (the driver's hard-check window)
    must stay one-per-family complete and fully SQL-oracled."""
    from cocrawler_ray.queries import ORACLE, QUERIES, _PRIORITY

    names = list(QUERIES)
    assert len(_PRIORITY) == 50
    assert names[:50] == _PRIORITY
    # every window query has a full value-hash oracle (not rows-only)
    assert all(n in ORACLE for n in names[:50])
    # spot-pin one representative per family; the round-4 rotations add
    # the never-driver-proven families the round-3 verdict called out
    # (q_token_pack/q_tfidf/q_pagerank/q_clip_score_gate etc. rotated
    # OUT in the final round-4 rotation — r01-r03-driver-proven, still
    # green in this suite)
    for must in ("q_decontaminate",
                 # sixth-session rotation: q_minhash_dedup / q_ann_ivf /
                 # q_approx_distinct / q_bloom rotated OUT (driver-proven
                 # r01-r03, still green here); first driver rows for the
                 # four sixth-session operators
                 "q_sssp", "q_label_prop", "q_int8_ann", "q_winnow_overlap",
                 # round-4 rotation: families gaining their first driver row
                 "q_substring_dup", "q_hits", "q_kcore", "q_triangle_count",
                 "q_local_supplier_volume", "q_nation_volume", "q_custdist",
                 "q_supplier_cnt", "q_window_frame", "q_rank_events",
                 "q_hot_keys", "q_bm25", "q_bloom_semijoin",
                 "q_watermark_late", "q_quantile_rank",
                 "q_latency_percentile",
                 # final round-4 rotation: the late-round operators
                 "q_sharpness_gate", "q_edge_density",
                 "q_augment_checksum", "q_mip_pyramid", "q_gamma_hist",
                 "q_winsorize", "q_shingle_containment",
                 # fifth-session rotation: this session's 12 new
                 # operators each gain their first driver row
                 # (q_semantic_dedup/q_curate_corpus/q_tfidf/
                 # q_sessionize etc. rotated OUT — driver-proven
                 # r01-r03, still green in this suite)
                 "q_rfm_segments", "q_blob_count", "q_rle_runs",
                 "q_mirror_hosts", "q_gap_fill", "q_random_projection",
                 "q_kmeans_update", "q_vocab_drift", "q_attribution",
                 "q_unchanged_revisits", "q_conversion_lag",
                 "q_budget_alloc",
                 # late fifth-session swaps: three more first driver
                 # rows (q_source_mix/q_curate_images/q_skew_hybrid_join
                 # rotated OUT — driver-proven r01-r03, still green)
                 "q_tail_slo", "q_rrf_fusion", "q_selfjoin_size"):
        assert must in names[:50], must

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
    must stay fully SQL-oracled and match _PRIORITY exactly. ROUND-5
    ROTATION: the window is 50 queries that have NEVER had a driver row
    in rounds 1-4 (cumulative driver coverage 123/269 before this
    round); every rotated-out query is driver-proven in a prior
    CORRECTNESS_r0x.json and stays green in this suite + the local
    sweep."""
    import json
    from pathlib import Path

    from cocrawler_ray.queries import ORACLE, QUERIES, _PRIORITY

    names = list(QUERIES)
    assert len(_PRIORITY) == 50
    assert names[:50] == _PRIORITY
    # every window query has a full value-hash oracle (not rows-only)
    assert all(n in ORACLE for n in names[:50])
    # the rotation contract itself: NO window entry appears in any prior
    # round's driver correctness record
    prior = set()
    for f in sorted(Path("/root/repo").glob("CORRECTNESS_r0[1-4].json")):
        try:
            prior |= set(json.loads(f.read_text()).keys())
        except Exception:
            pass
    if prior:
        overlap = [n for n in names[:50] if n in prior]
        assert not overlap, f"window entries already driver-proven: {overlap}"
    # representatives of each family in the round-5 window, including
    # the round-5-rewritten Dataset-pair dedup paths and the new PSL /
    # Otsu / hill-tail surfaces
    for must in ("q_dense_rank", "q_topk_per_group", "q_full_outer_join",
                 "q_rollup_revenue", "q_grouping_sets", "q_pmi_bigrams",
                 "q_pii_redact", "q_bpe_merges", "q_caption_phash_dedup",
                 "q_cluster_sizes", "q_text_clusters", "q_pq_topk",
                 "q_maxsim", "q_dhash", "q_scene_cut", "q_otsu_threshold",
                 "q_sitemap_extract", "q_url_trap", "q_hill_tail"):
        assert must in names[:50], must

"""End-to-end tests for pipelines/curate.py — the composed curation
pipeline (ppl gate -> quality gate -> decontaminate -> exact dedup ->
sequence pack -> resumable shards) over the sf0.001 documents table."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def curated(ray_session, tmp_path_factory):
    from cocrawler_ray.pipelines.curate import curate_documents
    dest = tmp_path_factory.mktemp("curated")
    res = curate_documents(SF, str(dest), num_shards=4, pack_budget=512)
    return res, dest


def test_counts_monotone_and_nonempty(curated):
    res, _ = curated
    c = res["counts"]
    assert 0 < c["output"] < c["input"]
    assert c["contaminated"] > 0  # the holdout overlaps by construction


def test_manifest_matches_files(curated):
    res, dest = curated
    m = res["manifest"]
    assert not m["skipped"].any()
    total = 0
    seen_ids: set[int] = set()
    for _, row in m.iterrows():
        t = pq.read_table(row["path"])
        assert t.num_rows == row["rows"]
        ids = set(t.column("doc_id").to_pylist())
        assert not (ids & seen_ids)  # shards partition the doc set
        seen_ids |= ids
        total += t.num_rows
        df = t.to_pandas()
        assert (df["ppl"] <= res["ppl_threshold"] + 1e-9).all()
        assert (df["n_tokens"] > 0).all()
        # packs are budget-bounded by FIRST-token assignment: every doc in
        # a pack starts inside the pack's token window
        assert (df["pack_id"] >= 0).all()
    assert total == res["counts"]["output"]


def test_rerun_skips_existing_shards(curated, ray_session):
    from cocrawler_ray.pipelines.curate import curate_documents
    res, dest = curated
    res2 = curate_documents(SF, str(dest), num_shards=4, pack_budget=512)
    assert res2["manifest"]["skipped"].all()
    assert res2["counts"]["output"] == res["counts"]["output"]
    assert res2["ppl_threshold"] == res["ppl_threshold"]


def test_no_contaminated_docs_survive(curated, ray_session):
    res, dest = curated
    # rebuild the holdout gram set and assert no surviving doc hits it
    from cocrawler_ray.stages.text import ContaminationCheck
    import pyarrow as pa
    chk = ContaminationCheck(bench_path=f"{SF}/documents.parquet",
                             holdout_mod=50)
    survivors = pd.concat([pq.read_table(p).to_pandas()
                           for p in res["manifest"]["path"]])
    out = chk(pa.Table.from_pandas(survivors[["doc_id", "text"]],
                                   preserve_index=False))
    assert out.num_rows == 0

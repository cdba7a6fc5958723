"""PipelineStep protocol (SURVEY §2.10 user-extension surface):
declarative chain validation + a real three-step pipeline over the
documents table composed from existing engine kernels."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from cocrawler_ray.pipeline import (FilterStep, MapBatchesStep,
                                    PipelineStep, SelectStep,
                                    StepValidationError,
                                    run_pipeline, validate_pipeline)

SF_DIR = "/root/testdata/sf0.001"


def _steps():
    from cocrawler_ray.stages import text as textops
    return [
        MapBatchesStep(name="token_count", fn=textops.token_count_batch,
                       _requires={"doc_id", "text"},
                       _provides={"n_tokens"}),
        FilterStep(name="min_tokens",
                   mask_fn=lambda t: pc.greater(t["n_tokens"], 5),
                   _requires={"n_tokens"}),
        SelectStep(columns=["doc_id", "n_tokens"]),
    ]


def test_steps_satisfy_protocol():
    for s in _steps():
        assert isinstance(s, PipelineStep)
        assert isinstance(s.name, str)


def test_validate_pipeline_threads_columns():
    out = validate_pipeline({"doc_id", "text"}, _steps())
    assert out == {"doc_id", "n_tokens"}


def test_validate_rejects_missing_requirement():
    with pytest.raises(StepValidationError, match="min_tokens"):
        validate_pipeline({"doc_id", "text"},
                          _steps()[1:])  # filter before token_count


def test_validate_rejects_use_after_projection():
    steps = _steps() + [
        FilterStep(name="needs_text",
                   mask_fn=lambda t: pc.greater(t["n_tokens"], 0),
                   _requires={"text"})]  # text was projected away
    with pytest.raises(StepValidationError, match="needs_text"):
        validate_pipeline({"doc_id", "text"}, steps)


def test_run_pipeline_end_to_end(ray_session):
    from cocrawler_ray.queries import read
    ds = read(SF_DIR, "documents", ["doc_id", "text"])
    out = run_pipeline(ds, _steps())
    t = pa.concat_tables(
        [b for b in out.iter_batches(batch_format="pyarrow")])
    assert set(t.schema.names) == {"doc_id", "n_tokens"}
    assert t.num_rows > 0
    assert pc.min(t["n_tokens"]).as_py() > 5

    import duckdb
    expect = duckdb.sql(f"""
        SELECT count(*) FROM (
          SELECT CASE WHEN trim(text) = '' THEN 0
                 ELSE length(regexp_split_to_array(trim(text), '\\s+'))
                 END AS n
          FROM read_parquet('{SF_DIR}/documents.parquet')) WHERE n > 5
        """).fetchone()[0]
    assert t.num_rows == expect

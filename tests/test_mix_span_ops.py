"""Unit tests for the round-3 curation additions: corpus-level span dedup
(boilerplate removal), source mixing, token entropy, the linear quality
classifier, and DuckDB-compatible half-away rounding. (Query-vs-oracle
conformance lives in test_queries_conformance.py; these pin stage
semantics directly.)"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from cocrawler_ray.hashing import splitmix64
from cocrawler_ray.stages import dedup, text as textops
from cocrawler_ray.stages.sample import source_mix


# ------------------------------------------------------------ span dedup

def test_span_dedup_first_occurrence_wins(ray_session):
    # span "B" appears in docs 1, 2 and twice in doc 3; only (1, 0) keeps it
    rows = pd.DataFrame({
        "doc_id": [1, 1, 2, 2, 3, 3, 3],
        "ord":    [0, 1, 0, 1, 0, 1, 2],
        "span":   ["B", "x y", "B", "p q", "B", "r s", "B"],
    })
    out = (dedup.span_dedup(rd.from_pandas(rows), "doc_id", "ord", "span")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [1, 2, 3]
    assert out["n_kept"].tolist() == [2, 1, 1]
    assert out["n_dropped"].tolist() == [0, 1, 2]
    assert out["clean_text"].tolist() == ["B x y", "p q", "r s"]


def test_span_dedup_doc_losing_everything_yields_empty_text(ray_session):
    rows = pd.DataFrame({
        "doc_id": [1, 2], "ord": [0, 0], "span": ["dup", "dup"]})
    out = (dedup.span_dedup(rd.from_pandas(rows), "doc_id", "ord", "span")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out.loc[1, "doc_id"] == 2
    assert out.loc[1, "n_kept"] == 0
    assert out.loc[1, "clean_text"] == ""


def test_span_dedup_partition_invariant(ray_session):
    rng = np.random.default_rng(7)
    n = 400
    rows = pd.DataFrame({
        "doc_id": rng.integers(0, 40, n),
        "ord": np.arange(n),
        "span": [f"s{v}" for v in rng.integers(0, 25, n)],
    })
    outs = []
    for blocks in (1, 7):
        ds = rd.from_pandas(rows).repartition(blocks)
        outs.append(dedup.span_dedup(ds, "doc_id", "ord", "span")
                    .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])


# ------------------------------------------------------------ source mix

def _mix_input(n=3000):
    rng = np.random.default_rng(3)
    return pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "src": np.array(["a", "b", "c"])[rng.integers(0, 3, n)]})


def test_source_mix_hits_target_proportions(ray_session):
    df = _mix_input()
    weights = {"a": 1, "b": 2, "c": 1}
    out = source_mix(rd.from_pandas(df), "src", "id", weights).to_pandas()
    got = out["src"].value_counts()
    # Bernoulli around need_s: each source within 15% of its target share
    total = len(out)
    for s, w in weights.items():
        assert abs(got[s] / total - w / 4) < 0.15 * (w / 4) + 0.02, (s, got)


def test_source_mix_deterministic_and_partition_invariant(ray_session):
    df = _mix_input()
    weights = {"a": 3, "b": 1, "c": 2}
    outs = []
    for blocks in (1, 5):
        ds = rd.from_pandas(df).repartition(blocks)
        outs.append(source_mix(ds, "src", "id", weights)
                    .to_pandas().sort_values("id").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_source_mix_drops_unlisted_sources(ray_session):
    df = _mix_input()
    out = source_mix(rd.from_pandas(df), "src", "id", {"a": 1}).to_pandas()
    assert set(out["src"]) <= {"a"}
    # weight covers only "a": capacity is bounded by a's own count, so the
    # gate threshold saturates and (almost) every "a" row survives
    assert len(out) > 0.9 * (df["src"] == "a").sum()


def test_source_mix_gate_is_splitmix_threshold():
    # restate the gate for one source by hand
    df = _mix_input()
    cnt = int((df["src"] == "a").sum())
    T = cnt * 1 // 1
    th = min(1 << 20, (1 * T // 1) * (1 << 20) // cnt)
    ids = df.loc[df["src"] == "a", "id"].to_numpy().astype(np.int64)
    expect = ids[(splitmix64(ids.view(np.uint64))
                  % np.uint64(1 << 20)).astype(np.int64) < th]
    assert th == 1 << 20 and len(expect) == cnt  # saturated by construction


# ------------------------------------------------- entropy / classifier

def test_token_entropy_values():
    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["a a a a", "a b a b", "  "]})
    out = textops.token_entropy_batch(df)
    assert out["doc_id"].tolist() == [1, 2]  # blank doc skipped
    assert out["entropy"].tolist() == [0.0, 1.0]
    assert out["n_tokens"].tolist() == [4, 4]


def test_quality_classifier_gate_consistent_with_score():
    df = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["the of to and in is", "zq zq zq zq", "alpha beta gamma",
                 "x", "", "the quick brown fox jumps over the lazy dog"]})
    out = textops.quality_classifier_batch(df)
    assert 4 not in out["doc_id"].tolist()  # empty doc skipped
    assert ((out["score"] > 0).astype(np.int64) == out["keep"]).all()
    b, wn, wt, wl, ws = textops._CLS_W
    row = out[out["doc_id"] == 2].iloc[0]  # "alpha beta gamma"
    assert row["n_tokens"] == 3 and row["ttr"] == 1.0
    assert row["avg_len"] == pytest.approx((5 + 4 + 5) / 3, abs=1e-6)


def test_round_half_away_matches_duckdb():
    import duckdb
    x = np.array([0.0356875, -0.0356875, 1.2345665, 0.5e-6, -0.5e-6, 0.0])
    got = textops.round_half_away(x, 6)
    want = duckdb.sql(
        "SELECT round(x, 6) FROM (SELECT unnest(?::DOUBLE[]) AS x)",
        params=[list(x)]).fetchnumpy()
    np.testing.assert_array_equal(got, list(want.values())[0])


# ------------------------------------------------------------ CLIP gate

def test_clip_score_gate_threshold_and_schema(ray_session):
    import pyarrow as pa

    from cocrawler_ray import oracles
    from cocrawler_ray.stages.multimodal import ClipScoreGate

    t = oracles.conformance_captioned_images(16)
    gate = ClipScoreGate(threshold=0.93)
    out = gate(t)
    assert out.column_names == ["image_id", "caption", "clip_score"]
    assert (out.column("clip_score").to_numpy() > 0.93).all()
    # lowering the threshold keeps strictly more pairs
    assert ClipScoreGate(threshold=0.0)(t).num_rows >= out.num_rows
    assert ClipScoreGate(threshold=0.0)(t).num_rows == 16


def test_clip_score_gate_zero_norm_caption_dropped():
    import pyarrow as pa

    from cocrawler_ray import oracles
    from cocrawler_ray.stages.multimodal import ClipScoreGate

    t = oracles.conformance_captioned_images(2)
    # caption with no color words -> zero-norm embedding -> dropped
    t = t.set_column(t.schema.get_field_index("caption"), "caption",
                     pa.array(["no colors here", "red only"], pa.string()))
    out = ClipScoreGate(threshold=-1.0)(t)
    assert out.num_rows == 1 and out.column("image_id")[0].as_py() == "img0001"


def test_cdc_chunks_resynchronize_after_insertion():
    """The CDC property: prepending bytes shifts early boundaries but the
    chunking re-synchronizes — most chunk hashes of the original payload
    reappear for the edited payload (a fixed-size chunker would share 0)."""
    import numpy as np
    import pyarrow as pa
    from cocrawler_ray.stages.dedup import cdc_chunk_payloads
    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, 4000, dtype=np.uint8).tobytes()
    edited = b"INSERTED-PREFIX-BYTES!" + base
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "payload": pa.array([base, edited], pa.binary())})
    out = cdc_chunk_payloads(t)
    df = out.to_pandas()
    h1 = set(df[df.doc_id == 1]["chunk_hash"])
    h2 = set(df[df.doc_id == 2]["chunk_hash"])
    shared = len(h1 & h2) / len(h1)
    assert shared > 0.8, f"only {shared:.0%} of chunks survived the edit"
    # chunk geometry is self-consistent
    for _, g in df.groupby("doc_id"):
        g = g.sort_values("chunk_ix")
        assert (g["start"].to_numpy()[1:]
                == (g["start"] + g["length"]).to_numpy()[:-1]).all()
        assert int(g["length"].sum()) == len(base) + (
            0 if g["doc_id"].iloc[0] == 1 else len(b"INSERTED-PREFIX-BYTES!"))


def test_cdc_chunks_empty_and_tiny_payloads():
    import pyarrow as pa
    from cocrawler_ray.stages.dedup import cdc_chunk_payloads
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "payload": pa.array([b"ab", b"x" * 10], pa.binary())})
    df = cdc_chunk_payloads(t).to_pandas()
    # payloads shorter than the window still emit exactly their one chunk
    assert df[df.doc_id == 1]["length"].tolist() == [2]
    assert int(df[df.doc_id == 2]["length"].sum()) == 10


def test_shingle_containment_asymmetry():
    # a short doc wholly quoted inside a long one: containment of the
    # short side is 1.0 while Jaccard is diluted by the long side
    import numpy as np

    from cocrawler_ray.stages import dedup
    short = "alpha beta gamma delta epsilon zeta"
    long = ("intro words here " + short + " and a very long tail "
            "of unrelated filler tokens stretching onward")
    sa = dedup.shingle_hashes(short, k=3)
    sb = dedup.shingle_hashes(long, k=3)
    inter = len(np.intersect1d(sa, sb))
    assert inter == len(sa)  # short fully contained
    cont_ab = inter * 1_000_000 // len(sa)
    cont_ba = inter * 1_000_000 // len(sb)
    assert cont_ab == 1_000_000
    assert cont_ba < 500_000
    jac = dedup.ngram_jaccard(short, long, k=3)
    assert jac < 0.5  # the signal containment keeps and Jaccard loses

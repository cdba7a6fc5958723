"""Unit tests for the curation addendum: Bloom filter, decontamination,
repetition gate, text normalization, exact quantile, k-means assignment.
(The query-vs-oracle conformance for each lives in
test_queries_conformance.py; these pin the stage semantics directly.)"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from cocrawler_ray.stages import sketch, text as textops
from cocrawler_ray.stages.agg import exact_quantile_cont


# ---------------------------------------------------------------- Bloom

def _keys(n: int, prefix: str = "k") -> list[str]:
    return [f"{prefix}{i:07d}" for i in range(n)]


def test_bloom_no_false_negatives():
    bf = sketch.BloomFilter(1 << 16, k=7)
    keys = _keys(3000)
    bf.add(keys)
    assert bf.contains(keys).all()


def test_bloom_fpr_within_bound():
    # m=2^16 bits, n=3000, k=7 -> theoretical FPR ~ (1-e^{-kn/m})^k ~ 0.4%
    bf = sketch.BloomFilter(1 << 16, k=7)
    bf.add(_keys(3000))
    fresh = _keys(20000, prefix="x")
    fpr = bf.contains(fresh).mean()
    assert fpr < 0.02, fpr


def test_bloom_merge_equals_single_pass():
    a, b = sketch.BloomFilter(1 << 12, 5), sketch.BloomFilter(1 << 12, 5)
    one = sketch.BloomFilter(1 << 12, 5)
    a.add(_keys(100, "a"))
    b.add(_keys(100, "b"))
    one.add(_keys(100, "a"))
    one.add(_keys(100, "b"))
    assert (a.merge(b).bits == one.bits).all()


def test_bloom_from_dataset(ray_session):
    import ray.data as rd
    df = pd.DataFrame({"u": _keys(500)})
    bf = sketch.bloom_from_dataset(
        rd.from_pandas(df).repartition(4), "u", n_bits=1 << 14, k=5)
    assert bf.contains(np.asarray(_keys(500), object)).all()
    assert bf.contains(np.asarray(_keys(200, "z"), object)).mean() < 0.05


# ----------------------------------------------------- decontamination

def test_distinct_ngrams_small_docs():
    di, grams = textops._distinct_ngrams(["a b", "a b c d", ""], 3)
    # doc 0 (<3 toks) and doc 2 (empty) contribute nothing
    assert (di == 1).all()
    assert sorted(grams) == ["a b c", "b c d"]


def test_contamination_check_counts_distinct_hits(ray_session):
    import ray
    bench = np.asarray(["b c d", "x y z"], object)
    ref = ray.put(bench)
    chk = textops.ContaminationCheck(ref, n=3)
    batch = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "a b c d e b c d",   # 'b c d' appears twice -> 1 DISTINCT hit
            "x y z w x y z",     # 'x y z' twice -> 1
            "p q r s"])})        # clean -> dropped
    out = chk(batch).to_pandas()
    assert out["doc_id"].tolist() == [1, 2]
    assert out["n_hits"].tolist() == [1, 1]


# ---------------------------------------------------- repetition stats

def test_repetition_stats_values():
    df = pd.DataFrame({
        "doc_id": [7, 8],
        "text": ["a a a a b",        # 5 toks, 2 distinct, top 4/5
                 "a b c d e f g h i j"]})
    out = textops.repetition_stats_batch(df).set_index("doc_id")
    assert out.loc[7, "n_tok"] == 5
    assert out.loc[7, "distinct_ratio"] == pytest.approx(0.4)
    assert out.loc[7, "top_tok_frac"] == pytest.approx(0.8)
    assert out.loc[7, "keep_doc"] == 0          # top_tok_frac > 0.2
    assert out.loc[8, "keep_doc"] == 1
    # empty docs vanish
    assert textops.repetition_stats_batch(
        pd.DataFrame({"doc_id": [1], "text": [" "]})).empty


# ------------------------------------------------------- normalization

def test_normalize_text_batch():
    t = pa.table({"text": pa.array(
        ["  Hello,   WORLD!! ", "a\tb\nc", "", "..."])})
    out = textops.normalize_text_batch(t).to_pandas()
    assert out["norm"].tolist() == ["hello world", "a b c", "", ""]
    assert out["norm_len"].tolist() == [11, 5, 0, 0]


# ------------------------------------------------------- edit distance

def _lev_ref(a: str, b: str) -> int:
    # textbook O(nm) reference
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_levenshtein_matches_reference():
    cases = [("", ""), ("a", ""), ("", "abc"), ("kitten", "sitting"),
             ("flaw", "lawn"), ("abc", "abc"), ("abc", "cba"),
             ("intention", "execution"), ("aaaa", "aa"),
             ("the fast key", "the fats key")]
    for a, b in cases:
        assert textops.levenshtein(a, b) == _lev_ref(a, b), (a, b)


def test_levenshtein_random_agreement():
    rng = np.random.default_rng(5)
    alpha = list("abcd ")
    for _ in range(50):
        a = "".join(rng.choice(alpha, rng.integers(0, 15)))
        b = "".join(rng.choice(alpha, rng.integers(0, 15)))
        assert textops.levenshtein(a, b) == _lev_ref(a, b), (a, b)


# ------------------------------------------------------ exact quantile

@pytest.mark.parametrize("q", [0.0, 0.25, 0.5, 0.75, 0.9, 1.0])
def test_exact_quantile_matches_numpy(ray_session, q):
    import ray.data as rd
    rng = np.random.default_rng(11)
    vals = rng.integers(0, 300, size=5000)
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(8)
    got = exact_quantile_cont(ds, "v", q)
    assert got == pytest.approx(np.quantile(vals, q, method="linear"))


# ------------------------------------------------- k-means assignment

def test_kmeans_assign_matches_numpy(ray_session):
    import ray.data as rd
    from cocrawler_ray.oracles import quantize_vecs
    from cocrawler_ray.stages.similarity import kmeans_assign_seeded
    rng = np.random.default_rng(3)
    n, d, stride = 120, 16, 11
    M = rng.normal(size=(n, d)).astype(np.float32)
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [list(map(float, r)) for r in M]})).repartition(4)
    out = (kmeans_assign_seeded(ds, stride=stride).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    X = quantize_vecs(M.astype(np.float64))
    cids = np.arange(n)[np.arange(n) % stride == 1]
    C = X[cids]
    dd = ((X * X).sum(1)[:, None] - 2 * (X @ C.T) + (C * C).sum(1)[None, :])
    j = np.argmin(dd, axis=1)
    assert (out["cid"].to_numpy() == cids[j]).all()
    assert (out["d2"].to_numpy() == dd[np.arange(n), j]).all()
    # every centroid assigns to itself at distance 0
    self_rows = out.set_index("vec_id").loc[cids]
    assert (self_rows["cid"].to_numpy() == cids).all()
    assert (self_rows["d2"] == 0).all()


# -------------------------------------------------- ordered prefix sum

def test_ordered_prefix_sum_matches_pandas(ray_session):
    import ray.data as rd
    from cocrawler_ray.stages.window import ordered_prefix_sum, token_pack
    rng = np.random.default_rng(9)
    n = 3000
    df = pd.DataFrame({"k": rng.permutation(n).astype(np.int64),
                       "v": rng.integers(0, 50, n).astype(np.int64)})
    ds = rd.from_pandas(df).repartition(7)  # shuffled input, many blocks
    got = (ordered_prefix_sum(ds, "k", "v").to_pandas()
           .sort_values("k").reset_index(drop=True))
    want = df.sort_values("k").reset_index(drop=True)
    want["cum"] = want["v"].cumsum()
    pd.testing.assert_frame_equal(got[["k", "v", "cum"]], want,
                                  check_dtype=False)
    # packing: pack of a row == chunk index of its first token
    packed = (token_pack(ds, "k", "v", budget=100).to_pandas()
              .sort_values("k").reset_index(drop=True))
    assert (packed["pack_id"].to_numpy()
            == (want["cum"].to_numpy() - want["v"].to_numpy()) // 100).all()
    # pack ids are nondecreasing in k order and start at 0
    assert packed["pack_id"].iloc[0] == 0
    assert (np.diff(packed["pack_id"].to_numpy()) >= 0).all()


def test_ts_us_normalizes_arrow_units(ray_session):
    """timestamp[ns]/[s] Arrow columns must yield the same epoch-us as the
    pandas path — a straight int64 cast would be off by 1000x/1e6x."""
    import pyarrow as pa
    from cocrawler_ray.stages.window import _ts_us

    base = pd.to_datetime(["2026-01-01 00:00:01", "2026-01-01 00:02:03"])
    want = base.to_numpy().astype("datetime64[us]").view("int64")
    for unit in ("s", "ms", "us", "ns"):
        arr = pa.chunked_array([base.to_numpy().astype(f"datetime64[{unit}]")])
        np.testing.assert_array_equal(_ts_us(arr), want)


def test_exact_quantile_cont_empty_raises(ray_session):
    import ray.data as rd
    from cocrawler_ray.stages.agg import exact_quantile_cont

    ds = (rd.from_pandas(pd.DataFrame({"v": np.arange(5, dtype=np.int64)}))
          .filter(lambda r: False))
    with pytest.raises(ValueError, match="empty input"):
        exact_quantile_cont(ds, "v", 0.5)


def test_pii_redact_ordering_and_counts():
    """Emails redact before IPs (domain dots), IPs before phones (dotted
    quads contain phone-shaped digit runs)."""
    df = pd.DataFrame({"doc_id": [0, 1, 2],
                       "text": ["a@b.io and 1.2.3.4 and 555-1234",
                                "no pii here",
                                "call 555-123 at 10.0.0.1"]})
    out = textops.pii_redact_batch(df)
    assert list(out["redacted"]) == ["<EMAIL> and <IP> and <PHONE>",
                                     "no pii here",
                                     "call <PHONE> at <IP>"]
    assert list(out["n_email"]) == [1, 0, 0]
    assert list(out["n_ip"]) == [1, 0, 1]
    assert list(out["n_phone"]) == [1, 0, 1]


def test_chunk_docs_boundaries():
    df = pd.DataFrame({"doc_id": [0, 1, 2],
                       "text": ["", "a b c", " ".join(f"t{i}" for i in range(32))]})
    out = textops.chunk_docs_batch(df, window=32, stride=24)
    # empty doc contributes nothing; short doc -> one chunk; exactly-one-
    # window doc -> chunks at 0 and 24 (range(0, 32, 24) == [0, 24])
    assert list(out["doc_id"]) == [1, 2, 2]
    assert list(out["start_tok"]) == [0, 0, 24]
    assert list(out["n_tok"]) == [3, 32, 8]
    assert out["chunk"].iloc[2] == " ".join(f"t{i}" for i in range(24, 32))


# ------------------------------------------------- perplexity gate

def test_unigram_lp_micro_matches_closed_form():
    terms = np.array(["a", "b", "c"], dtype=object)
    counts = np.array([6, 3, 1], dtype=np.int64)
    vocab, lp = textops.unigram_lp_micro(terms, counts)
    assert list(vocab) == ["a", "b", "c"]
    total, v = 10.0, 3.0
    for t, c in zip(["a", "b", "c"], [6, 3, 1]):
        expect = np.log((c + 1.0) / (total + v)) * 1e6
        got = lp[list(vocab).index(t)]
        assert abs(got - expect) <= 0.5  # half-away int quantization


def test_perplexity_batch_exact_int_sums_and_gate():
    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["a a b", "c c c c", "   "]})
    vocab, lp = textops.unigram_lp_micro(
        np.array(["a", "b", "c"], dtype=object),
        np.array([2, 1, 4], dtype=np.int64))
    lpm = dict(zip(vocab, lp))
    out = textops.perplexity_batch(df, (vocab, lp), threshold := 1e9)
    # empty doc dropped (mirrors the oracle's trim filter)
    assert list(out["doc_id"]) == [1, 2]
    assert out["nll_micro"].tolist() == [
        -(2 * lpm["a"] + lpm["b"]), -4 * lpm["c"]]
    expect_ppl = np.exp(np.array(out["nll_micro"], dtype=np.float64)
                        / out["n_tokens"].to_numpy() / 1e6)
    assert np.allclose(out["ppl"].to_numpy(), expect_ppl, atol=1e-6)
    assert (out["keep"] == 1).all()  # threshold huge -> all kept


def test_perplexity_batch_oov_floor():
    vocab, lp = textops.unigram_lp_micro(
        np.array(["a"], dtype=object), np.array([5], dtype=np.int64))
    df = pd.DataFrame({"doc_id": [7], "text": ["zzz a"]})
    out = textops.perplexity_batch(df, (vocab, lp), 1e9)
    assert out["nll_micro"].iloc[0] == -(textops._OOV_LP_FLOOR + lp[0])


def test_bpe_merges_overlap_run_parity(ray_session, tmp_path):
    # the l == r regime: greedy left-to-right must merge the odd-ranked
    # members of each run ("aaaa" -> [aa, aa], "aaa" -> [aa, a]) and the
    # conformance corpus never hits it — craft one that does, and check
    # engine and oracle agree on it end to end
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cocrawler_ray.queries import QUERIES, ORACLE
    docs = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                     "text": pa.array(["aaaa aaa", "baa aaaa"],
                                      pa.string())})
    pq.write_table(docs, tmp_path / "documents.parquet")
    got = QUERIES["q_bpe_merges"](str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    want = con.execute(ORACLE["q_bpe_merges"]).fetchdf()
    got = got.sort_values("round").reset_index(drop=True)
    want = want.sort_values("round").reset_index(drop=True)
    assert got.astype(str).equals(want[got.columns].astype(str))
    # hand-check round 0: pair (a,a) counted overlapping
    # ("aaaa" x2 -> 3 each, "aaa" -> 2, "baa" -> 1 = 9), and greedy
    # application leaves 2+2+2+2 = 8 tokens
    r0 = got.iloc[0]
    assert (r0["left_sym"], r0["right_sym"]) == ("a", "a")
    assert r0["pair_n"] == 9
    assert r0["tokens_after"] == 8


def test_winnow_overlap_pairs_exact(ray_session):
    import ray.data as rd
    import pyarrow as pa
    from cocrawler_ray.stages.dedup import winnow_overlap_pairs
    from cocrawler_ray.stages.text import winnow_grams_batch

    # identical docs share ALL selected grams; a disjoint-vocab doc
    # shares none; a doc sharing a long span shares some
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " \
           "lam mu nu xi omicron pi rho sigma tau upsilon"
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([base, base,
                          "one two three four five six seven eight nine "
                          "ten eleven twelve thirteen fourteen fifteen",
                          base + " extra tail words here now"]),
    })
    grams = winnow_grams_batch(t).to_pandas()
    per_doc = {d: set(g["gram"]) for d, g in grams.groupby("doc_id")}
    # reference pair counts from the per-doc selected sets
    want = {}
    ids = sorted(per_doc)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            n = len(per_doc[a] & per_doc[b])
            if n >= 2:
                want[(a, b)] = n
    got = winnow_overlap_pairs(rd.from_arrow(t).repartition(3),
                               min_shared=2).to_pandas()
    got_map = {(r.doc_a, r.doc_b): r.shared for r in got.itertuples()}
    assert got_map == want
    assert got_map[(1, 2)] == len(per_doc[1])  # identical docs: full share
    assert (3 not in {a for a, _ in got_map}
            and 3 not in {b for _, b in got_map})  # disjoint vocab
    assert (1, 4) in got_map  # span overlap detected

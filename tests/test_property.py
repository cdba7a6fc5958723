"""Property-based tests (hypothesis) for the engine's core invariants.

These pin the algebraic contracts the distributed design relies on —
idempotence of canonicalization, model-equivalence of the seen filter,
no-false-negatives of the cuckoo filter, the dedup winner rule, and
frontier politeness/determinism — under randomized inputs, complementing
the table-driven cases (SURVEY §5: the reference's test strategy is
case-table-heavy; properties catch the corners tables miss).

Pure-python units: no Ray session needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from cocrawler_ray import urls
from cocrawler_ray.hashing import hash64, rand_for_surt
from cocrawler_ray.stages.process import winner_indices
from cocrawler_ray.state.frontier import FrontierPartition, _ranges
from cocrawler_ray.state.seen import CuckooFilter, SeenPartition, _ExactSet

# ---------------------------------------------------------------------------
# URL canonicalizer: idempotence + scheme/host sanity
# ---------------------------------------------------------------------------

_hosts = st.from_regex(r"[a-z]{1,8}(\.[a-z]{2,6}){1,2}", fullmatch=True)
_paths = st.lists(
    st.sampled_from(["a", "b", "seg", ".", "..", "p%20q", "x.y"]),
    max_size=5).map(lambda segs: "/" + "/".join(segs))
_urls = st.builds(
    lambda sch, h, port, path, q, frag: f"{sch}://{h}{port}{path}{q}{frag}",
    st.sampled_from(["http", "https", "HTTP", "Https"]),
    _hosts,
    st.sampled_from(["", ":80", ":443", ":8080"]),
    _paths,
    st.sampled_from(["", "?q=1", "?a=b&c=d"]),
    st.sampled_from(["", "#frag", "#"]),
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_urls, min_size=1, max_size=20))
def test_canonicalize_idempotent(raws):
    res = urls.canonicalize_batch(raws)
    valid = res["valid"]
    if not valid.any():
        return
    once = [str(u) for u in res["url"][valid]]
    res2 = urls.canonicalize_batch(once)
    assert res2["valid"].all(), "canonical output must re-validate"
    assert list(res2["url"]) == once, "canonicalization must be idempotent"
    assert list(res2["surt"]) == [str(s) for s in res["surt"][valid]]
    assert list(res2["host"]) == [str(h) for h in res["host"][valid]]


@settings(max_examples=100, deadline=None)
@given(st.lists(_urls, min_size=1, max_size=20))
def test_canonicalize_surt_host_consistent(raws):
    res = urls.canonicalize_batch(raws)
    for ok, u, s, h in zip(res["valid"], res["url"], res["surt"], res["host"]):
        if not ok:
            continue
        assert u.startswith(("http://", "https://"))
        # surt host = reversed, comma-joined, www-stripped host
        hh = h[4:] if h.startswith("www.") else h
        surt_host = s.split(")", 1)[0].split(":", 1)[0]
        assert surt_host == ",".join(reversed(hh.split(".")))


# ---------------------------------------------------------------------------
# Seen filter: model equivalence vs a Python set (exact mode)
# ---------------------------------------------------------------------------

@settings(max_examples=60, deadline=None)
@given(st.lists(st.lists(st.integers(0, 400), min_size=0, max_size=120),
                min_size=1, max_size=8))
def test_seen_exact_matches_set_model(batches):
    sp = SeenPartition(0, capacity=1 << 12, exact=True)
    model: set[int] = set()
    for batch in batches:
        keys = np.array(batch, dtype=np.uint64)
        got = sp.check_and_add(keys)
        exp = np.zeros(len(keys), dtype=bool)
        for i, k in enumerate(batch):
            if k not in model:
                model.add(k)
                exp[i] = True
        assert (got == exp).all()
        if len(keys):
            assert sp.contains(keys).all()
    assert sp.size() == len(model)
    # snapshot keys == model keys
    snap = sp.snapshot().column("surt_hash").to_pylist()
    assert sorted(snap) == sorted(model)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(0, 2**63), min_size=1, max_size=300, unique=True))
def test_exact_set_merge_boundary(keys):
    """Force pending->base merges with a tiny threshold; membership must be
    unaffected by internal layout."""
    class _TinyMerge(_ExactSet):
        __slots__ = ()
        _MERGE_AT = 4

    es = _ExactSet()
    es_small = _TinyMerge()
    arr = np.array(keys, dtype=np.uint64)
    for i in range(0, len(arr), 7):
        chunk = arr[i:i + 7]
        es.add_new(chunk)
        es_small.add_new(chunk)
    probe = np.concatenate([arr, arr + np.uint64(1)])
    assert (es.contains(probe) == es_small.contains(probe)).all()
    assert len(es) == len(es_small) == len(arr)
    assert (es.to_sorted() == es_small.to_sorted()).all()


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(0, 2**63 - 1), min_size=1, max_size=500,
                unique=True))
def test_cuckoo_no_false_negatives(keys):
    cf = CuckooFilter(2048)
    arr = np.array(keys, dtype=np.uint64)
    cf.insert_batch(arr)
    assert cf.contains_batch(arr).all()


@settings(max_examples=30, deadline=None)
@given(st.lists(st.lists(st.integers(0, 300), min_size=1, max_size=80),
                min_size=1, max_size=6))
def test_seen_cuckoo_mode_never_readmits(batches):
    """Cuckoo-only mode may DROP keys (false positives) but must never mark
    the same key new twice — the at-most-once enqueue invariant."""
    sp = SeenPartition(0, capacity=1 << 12, exact=False)
    seen_new: set[int] = set()
    for batch in batches:
        keys = np.array(batch, dtype=np.uint64)
        got = sp.check_and_add(keys)
        for k, is_new in zip(batch, got):
            if is_new:
                assert k not in seen_new
                seen_new.add(k)


# ---------------------------------------------------------------------------
# Dedup winner rule: vectorized winner_indices == pandas reference
# ---------------------------------------------------------------------------

@settings(max_examples=60, deadline=None)
@given(st.lists(
    st.tuples(st.integers(0, 12),          # dst index (forces collisions)
              st.integers(0, 3),           # priority
              st.integers(0, 8),           # src index
              st.sampled_from(["embed", "href"])),
    min_size=1, max_size=60))
def test_winner_indices_matches_pandas_rule(rows):
    t = pa.table({
        "dst_surt": pa.array([f"com,d{d})/x" for d, _, _, _ in rows]),
        "priority": pa.array([p for _, p, _, _ in rows], pa.int32()),
        "src_surt": pa.array([f"com,s{s})/y" for _, _, s, _ in rows]),
        "kind": pa.array([k for _, _, _, k in rows]),
    })
    h = hash64(t.column("dst_surt").to_pylist())
    uniq_h, winner = winner_indices(t, h)
    got = (t.take(pa.array(np.sort(winner), pa.int64())).to_pandas()
           .sort_values("dst_surt").reset_index(drop=True))
    df = t.to_pandas()
    exp = (df.sort_values(["dst_surt", "priority", "src_surt", "kind"],
                          kind="stable")
             .drop_duplicates("dst_surt", keep="first")
             .sort_values("dst_surt").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)
    assert len(uniq_h) == df["dst_surt"].nunique()


# ---------------------------------------------------------------------------
# Frontier: politeness budget + determinism under append-order permutation
# ---------------------------------------------------------------------------

def _frontier_rows(surts, hosts, priorities):
    n = len(surts)
    return {
        "surt": np.array(surts, dtype=object),
        "url": np.array([f"http://{h}/{s}" for h, s in zip(hosts, surts)],
                        dtype=object),
        "host": np.array(hosts, dtype=object),
        "priority": np.array(priorities, dtype=np.int32),
        "rand": rand_for_surt(surts, seed=7),
        "depth": np.zeros(n, dtype=np.int32),
        "retries": np.zeros(n, dtype=np.int32),
        "seed_id": np.full(n, -1, dtype=np.int64),
    }


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 40),     # page id
                          st.integers(0, 4),      # host id
                          st.integers(0, 3)),     # priority
                min_size=1, max_size=60, unique_by=lambda t: t[0]),
       st.integers(1, 4),                          # budget per host
       st.randoms())
def test_frontier_budget_and_append_order_invariance(items, budget, rnd):
    surts = [f"test,h{h})/p{p}" for p, h, _ in items]
    hosts = [f"h{h}.test" for _, h, _ in items]
    prios = [pr for _, _, pr in items]

    f1 = FrontierPartition(0)
    f1.append(_frontier_rows(surts, hosts, prios))
    out1 = f1.drain(0, budget)

    # same rows appended in shuffled order, in two chunks
    idx = list(range(len(items)))
    rnd.shuffle(idx)
    cut = len(idx) // 2
    f2 = FrontierPartition(0)
    for part in (idx[:cut], idx[cut:]):
        if part:
            f2.append(_frontier_rows([surts[i] for i in part],
                                     [hosts[i] for i in part],
                                     [prios[i] for i in part]))
    out2 = f2.drain(0, budget)

    assert out1.column("surt").to_pylist() == out2.column("surt").to_pylist()

    # politeness: at most `budget` rows per host
    hc = pd.Series(out1.column("host").to_pylist()).value_counts()
    assert (hc <= budget).all()

    # drained rows are each host's best by (priority, rand, surt)
    df = pd.DataFrame({"surt": surts, "host": hosts, "priority": prios,
                       "rand": rand_for_surt(surts, seed=7)})
    exp = (df.sort_values(["host", "priority", "rand", "surt"], kind="stable")
             .groupby("host", sort=True).head(budget))
    assert sorted(out1.column("surt").to_pylist()) == sorted(exp["surt"])

    # conservation: drained + remaining == appended
    assert out1.num_rows + f1.ready_count() == len(items)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.lists(st.sampled_from(["a", "bb", "w1", "tok", "zz9"]),
                         max_size=40), min_size=1, max_size=12))
def test_fingerprint_matches_per_doc_reference(token_lists):
    """Batch-vectorized winnowing fingerprint == the per-doc definition
    (exact uint64 window minima, distinct-min xor fold)."""
    from cocrawler_ray.hashing import shingle_hash_batch, splitmix64
    from cocrawler_ray.stages.text import fingerprint_batch

    texts = [" ".join(toks) for toks in token_lists]
    k, window = 5, 8

    def ref(text):
        sh, c = shingle_hash_batch([text], k)
        if c[0] == 0:
            return 0
        if c[0] <= window:
            return int(sh.min())
        mins = np.array([sh[j:j + window].min()
                         for j in range(len(sh) - window + 1)], dtype=np.uint64)
        fp = np.uint64(0)
        for m in np.unique(mins):
            fp ^= splitmix64(np.array([m], dtype=np.uint64))[0]
        return int(fp)

    got = (fingerprint_batch(pa.table({"text": texts}))
           .column("fingerprint").to_pylist())
    assert got == [ref(t) for t in texts]


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 6)),
                min_size=1, max_size=20))
def test_ranges_matches_naive(pairs):
    starts = np.array([s for s, _ in pairs], dtype=np.int64)
    counts = np.array([c for _, c in pairs], dtype=np.int64)
    got = _ranges(starts, counts)
    exp = [s + j for s, c in pairs for j in range(c)]
    assert got.tolist() == exp


# ---------------------------------------------------------------------------
# Levenshtein: metric axioms + known bounds vs the vectorized DP
# ---------------------------------------------------------------------------

_words = st.text(alphabet="abcde ", max_size=12)


@settings(max_examples=150, deadline=None)
@given(_words, _words)
def test_levenshtein_metric_axioms(a, b):
    from cocrawler_ray.stages.text import levenshtein
    d = levenshtein(a, b)
    assert d == levenshtein(b, a)                      # symmetry
    assert (d == 0) == (a == b)                        # identity
    assert abs(len(a) - len(b)) <= d <= max(len(a), len(b))  # bounds


@settings(max_examples=80, deadline=None)
@given(_words, _words, _words)
def test_levenshtein_triangle(a, b, c):
    from cocrawler_ray.stages.text import levenshtein
    assert levenshtein(a, c) <= levenshtein(a, b) + levenshtein(b, c)


@settings(max_examples=100, deadline=None)
@given(_words, st.text(alphabet="abcde", min_size=1, max_size=3))
def test_levenshtein_single_append(a, suffix):
    from cocrawler_ray.stages.text import levenshtein
    assert levenshtein(a, a + suffix) == len(suffix)


# ---------------------------------------------------------------------------
# Repetition stats: definitional invariants
# ---------------------------------------------------------------------------

@settings(max_examples=100, deadline=None)
@given(st.lists(st.lists(st.sampled_from(["a", "b", "c", "dd"]),
                         max_size=20), min_size=1, max_size=6))
def test_repetition_stats_definitions(token_lists):
    from cocrawler_ray.stages.text import repetition_stats_batch
    df = pd.DataFrame({
        "doc_id": np.arange(len(token_lists), dtype=np.int64),
        "text": [" ".join(t) for t in token_lists]})
    out = repetition_stats_batch(df).set_index("doc_id")
    for i, toks in enumerate(token_lists):
        if not toks:
            assert i not in out.index  # empty docs vanish
            continue
        from collections import Counter
        c = Counter(toks)
        assert out.loc[i, "n_tok"] == len(toks)
        assert out.loc[i, "distinct_ratio"] == round(len(c) / len(toks), 6)
        assert out.loc[i, "top_tok_frac"] == round(
            max(c.values()) / len(toks), 6)


# ---------------------------------------------------------------------------
# round-3 window/stats kernels vs brute-force models (pure python, no Ray)
# ---------------------------------------------------------------------------

_event_frames = st.lists(
    st.tuples(st.integers(0, 5),           # user
              st.integers(0, 50),          # ts
              st.integers(-100, 100)),     # value (micro already)
    min_size=1, max_size=60)


@settings(max_examples=150, deadline=None)
@given(_event_frames)
def test_path_trap_matches_set_model(rows):
    # reuse the tuple stream as random path segments
    paths = ["/" + "/".join(f"s{u % 3}{t % 4}" for t in range(abs(v) % 6))
             for u, t, v in rows]
    st_ = urls.path_trap_stats(paths)
    for p, n_seg, n_dup, trap in zip(paths, st_["n_seg"], st_["n_dup"],
                                     st_["trap"]):
        segs = [s for s in p.split("/") if s]
        assert n_seg == len(segs)
        assert n_dup == len(segs) - len(set(segs))
        assert trap == (n_dup >= 2)


@settings(max_examples=100, deadline=None)
@given(_event_frames)
def test_rank_reduce_matches_bruteforce(rows):
    from cocrawler_ray.stages.window import rank_reduce
    df = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
    df["event_id"] = np.arange(len(df))
    df["value"] = df["value"].astype(float) / 1e6
    out = rank_reduce(df)
    for _, grp in out.groupby("user_id"):
        v = grp["v_micro"].to_numpy()
        r = grp["rnk"].to_numpy()
        d = grp["drnk"].to_numpy()
        for i in range(len(v)):
            assert r[i] == 1 + (v > v[i]).sum()
            assert d[i] == 1 + len(np.unique(v[v > v[i]]))


@settings(max_examples=100, deadline=None)
@given(_event_frames)
def test_frame_sums_reduce_matches_rolling(rows):
    from cocrawler_ray.stages.window import frame_sums_reduce
    df = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
    df["event_id"] = np.arange(len(df))
    df["value"] = df["value"].astype(float) / 1e6
    out = frame_sums_reduce(df)
    want = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
    vm = np.round(want["value"].to_numpy() * 1e6).astype(np.int64)
    w = want.assign(vm=vm)
    roll = w.groupby("user_id", sort=False)["vm"].rolling(
        5, min_periods=1).sum().to_numpy().astype(np.int64)
    got = out.set_index("event_id").loc[want["event_id"]]
    assert (got["win_sum_micro"].to_numpy() == roll).all()
    assert (got["win_n"].to_numpy() <= 5).all()


@settings(max_examples=100, deadline=None)
@given(_event_frames)
def test_mad_reduce_matches_numpy(rows):
    from cocrawler_ray.stages.agg import mad_outliers_reduce
    df = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
    df["value"] = df["value"].astype(float) / 1e6
    out = mad_outliers_reduce(df).set_index("user_id")
    from cocrawler_ray.stages.text import round_half_away
    vm = np.round(df["value"].to_numpy() * 1e6).astype(np.int64)
    for uid, grp in df.assign(vm=vm).groupby("user_id"):
        v = grp["vm"].to_numpy().astype(float)
        med = np.median(v)
        dev = np.abs(v - med)
        madv = np.median(dev)
        row = out.loc[uid]
        assert row["n"] == len(v)
        # model rounds with the SAME half-away helper: python round() is
        # decimal-correct and diverges at .5-in-double edges where the
        # engine and the DuckDB oracle (same float product) agree
        assert row["med"] == round_half_away(np.array([med / 1e6]), 6)[0]
        assert row["mad"] == round_half_away(np.array([madv / 1e6]), 6)[0]
        assert row["n_outliers"] == int((dev > 3.0 * madv).sum())


@settings(max_examples=60, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=600), min_size=1,
                max_size=8))
def test_cdc_chunks_partition_payload_exactly(payloads):
    from cocrawler_ray.stages.dedup import cdc_chunk_payloads
    t = pa.table({"doc_id": pa.array(range(len(payloads)), pa.int64()),
                  "payload": pa.array(payloads, pa.binary())})
    df = cdc_chunk_payloads(t).to_pandas()
    for i, p in enumerate(payloads):
        g = df[df.doc_id == i].sort_values("chunk_ix")
        if not len(p):
            assert len(g) == 0
            continue
        assert int(g["length"].sum()) == len(p)
        assert g["start"].iloc[0] == 0
        assert (g["start"].to_numpy()[1:]
                == (g["start"] + g["length"]).to_numpy()[:-1]).all()


# ---------------------------------------------------------------------------
# funnel / gaps-islands / co-occurrence reduces: brute-force models +
# the partitioning contract the exchange callers rely on
# ---------------------------------------------------------------------------

_funnel_frames = st.lists(
    st.tuples(st.integers(0, 5),                       # user
              st.sampled_from(["view", "click", "purchase", "other"]),
              st.integers(0, 40)),                     # ts (seconds-ish)
    min_size=1, max_size=60)


def _funnel_model(rows, steps):
    """Per-user earliest-completion funnel, brute force over dicts."""
    counts = []
    cur = {}
    for u, t, ts in rows:
        if t == steps[0]:
            cur[u] = min(cur.get(u, ts), ts)
    counts.append(len(cur))
    for step in steps[1:]:
        nxt = {}
        for u, t, ts in rows:
            if t == step and u in cur and ts > cur[u]:
                nxt[u] = min(nxt.get(u, ts), ts)
        cur = nxt
        counts.append(len(cur))
    return counts


@settings(max_examples=100, deadline=None)
@given(_funnel_frames)
def test_funnel_reduce_matches_bruteforce(rows):
    from cocrawler_ray.stages.window import funnel_reduce
    steps = ["view", "click", "purchase"]
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "ts"])
    df["ts"] = df["ts"].to_numpy("int64").astype("datetime64[us]")
    out = funnel_reduce(steps)(df)
    want = _funnel_model(rows, steps)
    assert list(out["step"]) == [1, 2, 3]
    assert list(out["n_users"]) == want


@settings(max_examples=100, deadline=None)
@given(_funnel_frames)
def test_funnel_reduce_partition_sum_contract(rows):
    # the caller co-locates each user's events, then SUMS the tiny
    # per-partition (step, n_users) tables — splitting BY USER must be
    # exact under that sum
    from cocrawler_ray.stages.window import funnel_reduce
    steps = ["view", "click", "purchase"]
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "ts"])
    df["ts"] = df["ts"].to_numpy("int64").astype("datetime64[us]")
    f = funnel_reduce(steps)
    whole = f(df).set_index("step")["n_users"]
    parts = [f(g) for _, g in df.groupby(df["user_id"] % 3)]
    summed = (pd.concat(parts).groupby("step")["n_users"].sum()
              .reindex([1, 2, 3], fill_value=0))
    assert (whole.reindex([1, 2, 3], fill_value=0) == summed).all()


@settings(max_examples=100, deadline=None)
@given(_event_frames)
def test_islands_reduce_matches_bruteforce(rows):
    from cocrawler_ray.stages.window import islands_reduce
    df = pd.DataFrame(rows, columns=["o_custkey", "day", "value"])
    out = islands_reduce(df[["o_custkey", "day"]], key_col="o_custkey",
                         day_col="day")
    # model: per key, maximal consecutive runs over the distinct days
    want = []
    for k, g in df.groupby("o_custkey"):
        days = sorted(set(g["day"]))
        run = [days[0]]
        for d in days[1:]:
            if d == run[-1] + 1:
                run.append(d)
            else:
                want.append((k, run[0], run[-1], len(run)))
                run = [d]
        want.append((k, run[0], run[-1], len(run)))
    got = sorted(zip(out["o_custkey"], out["start_day"],
                     out["end_day"], out["n_days"]))
    assert got == sorted(want)
    # islands tile the distinct-day domain exactly
    assert int(out["n_days"].sum()) == len(
        df[["o_custkey", "day"]].drop_duplicates())


@settings(max_examples=100, deadline=None)
@given(_funnel_frames)
def test_cooccur_reduce_matches_set_model(rows):
    from cocrawler_ray.stages.agg import cooccur_pairs_reduce
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "ts"])
    out = cooccur_pairs_reduce(df[["user_id", "event_type"]])
    from collections import Counter
    want = Counter()
    for _, items in df.groupby("user_id")["event_type"]:
        s = sorted(set(items))
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                want[(s[i], s[j])] += 1
    got = {(a, b): int(n) for a, b, n
           in zip(out["t1"], out["t2"], out["n"])}
    assert got == dict(want)


def test_regex_extract_all_batch_ordinals_and_nulls():
    from cocrawler_ray.stages.text import regex_extract_all_batch
    t = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                  "text": pa.array(["the tall tree", "no hils here? to",
                                    None, ""], pa.string())})
    out = regex_extract_all_batch(t, r"t[a-z]+")
    assert out.column("doc_id").to_pylist() == [1, 1, 1, 2]
    assert out.column("ord").to_pylist() == [1, 2, 3, 1]
    assert out.column("tok").to_pylist() == ["the", "tall", "tree", "to"]


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 6), st.integers(0, 6)),
                min_size=0, max_size=50))
def test_skyline_min_max_matches_bruteforce(pts):
    from cocrawler_ray.stages.agg import skyline_min_max
    df = pd.DataFrame(pts, columns=["lo", "hi"])
    df["id"] = np.arange(len(df))
    got = skyline_min_max(df, "lo", "hi")
    keep = []
    for i, p in df.iterrows():
        dom = any(q["lo"] <= p["lo"] and q["hi"] >= p["hi"]
                  and (q["lo"] < p["lo"] or q["hi"] > p["hi"])
                  for _, q in df.iterrows())
        if not dom:
            keep.append(i)
    assert list(got["id"]) == keep
    # two-phase decomposition: skyline(local skylines) == skyline(all)
    if len(df) > 3:
        half = len(df) // 2
        cand = pd.concat([skyline_min_max(df.iloc[:half], "lo", "hi"),
                          skyline_min_max(df.iloc[half:], "lo", "hi")])
        two_phase = skyline_min_max(cand, "lo", "hi")
        assert sorted(two_phase["id"]) == keep


@settings(max_examples=100, deadline=None)
@given(_event_frames)
def test_percent_cume_reduce_matches_bruteforce(rows):
    from cocrawler_ray.stages.window import percent_cume_reduce
    df = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
    df["event_id"] = np.arange(len(df))
    df["value"] = df["value"].astype(float) / 1e6
    out = percent_cume_reduce(df)
    for _, grp in out.groupby("user_id"):
        v = grp["v_micro"].to_numpy()
        n = len(v)
        for i in range(n):
            rnk = 1 + (v < v[i]).sum()
            cle = (v <= v[i]).sum()
            want_prk = 0 if n == 1 else (rnk - 1) * 1_000_000 // (n - 1)
            assert grp["prk_micro"].to_numpy()[i] == want_prk
            assert grp["cume_micro"].to_numpy()[i] == cle * 1_000_000 // n


# ---------------------------------------------------------------------------
# BSP superstep halves (graph.py::_contrib_split/_fold, pure functions):
# a local P-partition loop must equal naive python Bellman-Ford / LPA
# ---------------------------------------------------------------------------

def _local_bsp(mode, nodes_df, edges_df, iters, P=3):
    """Drive graph.py's superstep halves without Ray: same hash split,
    same send/fold code, messages routed by hand."""
    from cocrawler_ray.stages.graph import _contrib_split, _fold
    from cocrawler_ray.stages.exchange import _split_by_hash

    state = _split_by_hash(pa.Table.from_pandas(nodes_df), ["node"], P)
    eparts = _split_by_hash(pa.Table.from_pandas(edges_df), ["src"], P)
    for i in range(iters):
        outs = [_contrib_split(mode, 0.0, P, eparts[p], state[p], i)
                for p in range(P)]
        state = [_fold(mode, 0.0, state[p], *[outs[q][p] for q in range(P)])
                 for p in range(P)]
    return (pa.concat_tables(state).to_pandas()
            .sort_values("node").reset_index(drop=True))


_graph_edges = st.lists(
    st.tuples(st.integers(0, 11), st.integers(0, 11), st.integers(1, 9)),
    min_size=1, max_size=30)


@settings(max_examples=60, deadline=None)
@given(_graph_edges, st.integers(1, 4))
def test_sssp_fold_matches_bellman_ford(ew, iters):
    n = 12
    nodes = pd.DataFrame({
        "node": np.arange(n, dtype=np.int64),
        "label": np.where(np.arange(n) % 5 == 0, 0, 1 << 62).astype(np.int64)})
    edges = pd.DataFrame({"src": np.array([e[0] for e in ew], np.int64),
                          "dst": np.array([e[1] for e in ew], np.int64),
                          "w": np.array([e[2] for e in ew], np.int64)})
    got = _local_bsp("sssp", nodes, edges, iters)

    INF = 1 << 62
    dist = [0 if v % 5 == 0 else INF for v in range(n)]
    for _ in range(iters):  # synchronous relaxation (previous round's dist)
        prev = list(dist)
        for s, d, w in ew:
            if prev[s] < INF:
                dist[d] = min(dist[d], prev[s] + w)
    np.testing.assert_array_equal(got["label"].to_numpy(), np.array(dist))


@settings(max_examples=60, deadline=None)
@given(_graph_edges, st.integers(1, 3))
def test_lpa_fold_matches_naive_sync_lpa(ew, iters):
    n = 12
    nodes = pd.DataFrame({"node": np.arange(n, dtype=np.int64),
                          "label": np.arange(n, dtype=np.int64)})
    # directed edges as given (the public wrapper adds reverses; the fold
    # contract itself is direction-agnostic)
    edges = pd.DataFrame({"src": np.array([e[0] for e in ew], np.int64),
                          "dst": np.array([e[1] for e in ew], np.int64)})
    got = _local_bsp("lpa", nodes, edges, iters)

    lab = list(range(n))
    for _ in range(iters):
        prev = list(lab)
        incoming: dict[int, dict[int, int]] = {}
        for s, d, _w in ew:
            incoming.setdefault(d, {})
            incoming[d][prev[s]] = incoming[d].get(prev[s], 0) + 1
        for v, cnt in incoming.items():
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            lab[v] = best[0]
    np.testing.assert_array_equal(got["label"].to_numpy(), np.array(lab))

"""Link-graph analytics — fixed-iteration PageRank and connected
components over (src, dst) edges.

The reference prioritizes fetches by a static per-URL score
(`cocrawler/urls.py` priority semantics per SURVEY §2.2 M8); a corpus-scale
crawl wants link-structure scores, which means iterative distributed
computation the reference never does.

Execution is a Pregel-style BSP loop built on the engine's hash-exchange
primitives, designed so the STATIC data never moves twice:

- edges are split by ``hash(src) % P`` ONCE before iterating; nodes (and
  the per-node state rows that evolve with them) are split by
  ``hash(node) % P`` ONCE. Both use the same hash, so the per-partition
  join of edges with current state is local — no per-iteration re-split of
  the (dominant) edge table.
- each superstep ships ONLY contribution rows: a per-partition task joins
  its edge block with its state block, emits (dst, value) messages already
  split by ``hash(dst) % P``, and a second per-partition task folds the
  incoming messages into the node state. One all-to-all of message rows
  per iteration — the information-theoretic minimum for synchronous
  propagation.
- all blocks live in the object store as Arrow tables; the driver holds
  only ObjectRefs, so node count scales with cluster memory.

P adapts to state size (``rows / 100k`` capped at cluster CPUs) so small
graphs don't pay wide-exchange fixed costs while 10^10-edge graphs use the
full cluster.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from cocrawler_ray.stages.exchange import _split_by_hash


def _pick_p(n_rows: int, num_partitions: int | None) -> int:
    if num_partitions:
        return num_partitions
    cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(2, min(cpus, n_rows // 100_000 + 1))


def _merge(*tables: pa.Table) -> pa.Table:
    return pa.concat_tables([t for t in tables if t.num_rows] or tables[:1])


def _presplit(ds: rd.Dataset, keys: list[str], P: int) -> list:
    """Hash-split a Dataset's blocks and merge to ONE table ref per
    partition (done once; reused every iteration)."""
    refs = ds.to_arrow_refs()
    split = ray.remote(num_returns=P)(_split_by_hash)
    merge = ray.remote(_merge)
    if P == 1:
        return [merge.remote(*refs)]
    subs = [split.remote(r, keys, P) for r in refs]
    return [merge.remote(*[s[p] for s in subs]) for p in range(P)]


_BFS_INF = np.int64(1) << np.int64(62)  # "unreached" BFS distance


def _contrib_split(mode: str, damping: float, P: int, E: pa.Table,
                   S: pa.Table, rnd: int = 0) -> list[pa.Table]:
    """Superstep send half: join the partition's edges with its node state
    (both hashed here by the SAME key hash) and emit (node, c) messages
    pre-split by destination hash."""
    e = E.to_pandas()
    s = S.to_pandas()
    if mode == "dist":
        # BFS relaxation: only the CURRENT FRONTIER sends — nodes first
        # reached in the previous superstep (label == rnd; labels only
        # decrease and a reached node's label is final, so every older
        # sender's message was already folded — pruning them is exact).
        # Message volume tracks the frontier, not the reached set.
        s = s[s["label"].to_numpy() == np.int64(rnd)]
    j = e.merge(s, left_on="src", right_on="node", how="inner")
    if mode in ("sum", "psum", "opic"):
        c = damping * j["r"].to_numpy() / j["outdeg"].to_numpy()
    elif mode == "dist":
        c = j["label"].to_numpy() + 1
    elif mode == "sssp":
        # weighted relaxation (Bellman-Ford superstep): every REACHED
        # node re-sends dist+w each round — unlike BFS, a later round can
        # improve an already-reached node, so the frontier prune above
        # would be wrong here; the unreached (INF) senders are pruned.
        j = j[j["label"].to_numpy() < _BFS_INF]
        c = j["label"].to_numpy() + j["w"].to_numpy()
    else:  # min-label / lpa: the message is the sender's current label
        c = j["label"].to_numpy()
    msgs = pa.table({"node": pa.array(j["dst"].to_numpy(), pa.int64()),
                     "c": pa.array(c)})
    return _split_by_hash(msgs, ["node"], P)


def _fold(mode: str, base: float, S: pa.Table, *subs: pa.Table) -> pa.Table:
    """Superstep receive half: fold incoming messages into this
    partition's node state (messages were split by the same node hash, so
    every message for these nodes is here)."""
    s = S.to_pandas()
    m = _merge(*subs).to_pandas() if subs else pd.DataFrame(
        {"node": [], "c": []})
    if mode == "opic":
        # OPIC superstep: history banks the cash the node held THIS
        # round, then the node's new cash is exactly what flowed in
        # (cash is conserved along edges; no teleport, damping = 1)
        r_new = np.zeros(len(s))
        if len(m):
            agg = m.groupby("node", sort=False)["c"].sum()
            pos = s.set_index("node").index.get_indexer(agg.index)
            r_new[pos[pos >= 0]] += agg.to_numpy()[pos >= 0]
        return pa.Table.from_pandas(pd.DataFrame({
            "node": s["node"].to_numpy(),
            "r": r_new,
            "h": (s["h"].to_numpy(np.float64)
                  + s["r"].to_numpy(np.float64))}), preserve_index=False)
    if mode in ("sum", "psum"):
        agg = m.groupby("node", sort=False)["c"].sum() if len(m) else None
        # "psum" (personalized): the teleport base is PER-NODE, carried
        # in the state's b column — seed-biased PageRank's only change
        r = (s["b"].to_numpy(np.float64).copy() if mode == "psum"
             else np.full(len(s), base))
        if agg is not None:
            pos = s.set_index("node").index.get_indexer(agg.index)
            r[pos[pos >= 0]] += agg.to_numpy()[pos >= 0]
        cols = {"node": s["node"].to_numpy(), "r": r}
        if mode == "psum":
            cols["b"] = s["b"].to_numpy(np.float64)
        return pa.Table.from_pandas(pd.DataFrame(cols),
                                    preserve_index=False)
    lab = s["label"].to_numpy().copy()
    if mode == "lpa" and len(m):
        # synchronous label propagation: new label = the most frequent
        # label among incoming neighbor messages, ties broken by the
        # SMALLEST label (deterministic — no RNG); nodes with no messages
        # keep their label. Multi-edges count multiply on both oracle
        # sides (one message per edge row).
        cnt = (m.groupby(["node", "c"], sort=False).size()
               .reset_index(name="n")
               .sort_values(["node", "n", "c"],
                            ascending=[True, False, True], kind="stable")
               .drop_duplicates("node"))
        pos = s.set_index("node").index.get_indexer(cnt["node"].to_numpy())
        ok = pos >= 0
        lab[pos[ok]] = cnt["c"].to_numpy()[ok].astype(np.int64)
    elif len(m):
        agg = m.groupby("node", sort=False)["c"].min()
        pos = s.set_index("node").index.get_indexer(agg.index)
        ok = pos >= 0
        lab[pos[ok]] = np.minimum(lab[pos[ok]],
                                  agg.to_numpy()[ok].astype(np.int64))
    return pa.Table.from_pandas(
        pd.DataFrame({"node": s["node"].to_numpy(), "label": lab}),
        preserve_index=False)


def _bsp(nodes_parts: list, edges_parts: list, mode: str, iters: int,
         damping: float, base: float, P: int) -> rd.Dataset:
    send = ray.remote(num_returns=P)(_contrib_split)
    fold = ray.remote(_fold)
    state = nodes_parts
    for i in range(iters):
        outs = [send.remote(mode, damping, P, edges_parts[p], state[p], i)
                for p in range(P)]
        if P == 1:
            outs = [[o] for o in outs]
        state = [fold.remote(mode, base, state[p],
                             *[outs[q][p] for q in range(P)])
                 for p in range(P)]
    return rd.from_arrow_refs(state)


def pagerank(nodes: rd.Dataset, edges: rd.Dataset, iters: int = 3,
             damping: float = 0.85,
             num_partitions: int | None = None,
             n_total: int | None = None) -> rd.Dataset:
    """``nodes``: (node:int64) — every vertex, exactly once. ``edges``:
    (src, dst) int64 rows, parallel edges allowed (each contributes).
    Returns (node, r:float64) after ``iters`` synchronous iterations from
    a uniform start; dangling mass is dropped (teleport base only), the
    convention of the unrolled SQL oracle. ``n_total``: caller-known
    node count (skips one extra execution of the nodes lineage)."""
    if n_total is None:
        n_total = nodes.count()
    base = (1.0 - damping) / n_total
    P = _pick_p(n_total, num_partitions)

    # per-edge out-degree: per-block combiner partials -> one small
    # exchange -> joined onto edges ONCE before the pre-split
    from cocrawler_ray.stages.exchange import grouped_shuffle, hash_join
    deg_ds = rd.from_arrow_refs(
        [ray.remote(_degree_table).remote(r) for r in edges.to_arrow_refs()])
    deg_full = grouped_shuffle(
        deg_ds, ["src"],
        lambda df: (df.groupby("src", sort=False)["outdeg"].sum()
                    .astype(np.float64).reset_index()),
        num_partitions=P)
    edges_w = hash_join(edges, deg_full, on=["src"], num_partitions=P)

    def init(t: pa.Table) -> pa.Table:
        return t.append_column(
            "r", pa.array(np.full(t.num_rows, 1.0 / n_total), pa.float64()))

    state0 = nodes.map_batches(init, batch_format="pyarrow")
    out = _bsp(_presplit(state0, ["node"], P),
               _presplit(edges_w, ["src"], P),
               "sum", iters, damping, base, P)
    return out.map_batches(lambda t: t.select(["node", "r"]),
                           batch_format="pyarrow")


def opic(nodes: rd.Dataset, edges: rd.Dataset, iters: int = 3,
         num_partitions: int | None = None,
         n_total: int | None = None) -> rd.Dataset:
    """On-line Page Importance Computation (Abiteboul, Preda & Cobena,
    WWW 2003) — the crawl-frontier importance measure designed to be
    computed WHILE crawling: each page holds "cash", distributes it
    equally to its out-links each superstep, and banks its held cash
    into "history"; importance after K rounds is history + cash
    (∝ Σ of the cash sequence — converges to PageRank-like importance
    without damping/teleport, and unlike PageRank the partial result is
    meaningful at every round, which is what lets an online crawler
    prioritize from it). Batch-synchronous restatement on the same BSP
    as :func:`pagerank` (edges pre-split ONCE, only cash messages
    move); cash leaks at dangling nodes (no virtual node), the
    convention the unrolled SQL oracle restates. Returns
    (node, imp:float64 rounded 6)."""
    if n_total is None:
        n_total = nodes.count()
    P = _pick_p(n_total, num_partitions)

    from cocrawler_ray.stages.exchange import grouped_shuffle, hash_join
    deg_ds = rd.from_arrow_refs(
        [ray.remote(_degree_table).remote(r) for r in edges.to_arrow_refs()])
    deg_full = grouped_shuffle(
        deg_ds, ["src"],
        lambda df: (df.groupby("src", sort=False)["outdeg"].sum()
                    .astype(np.float64).reset_index()),
        num_partitions=P)
    edges_w = hash_join(edges, deg_full, on=["src"], num_partitions=P)

    def init(t: pa.Table) -> pa.Table:
        return (t.append_column(
            "r", pa.array(np.full(t.num_rows, 1.0 / n_total), pa.float64()))
            .append_column(
            "h", pa.array(np.zeros(t.num_rows), pa.float64())))

    state0 = nodes.map_batches(init, batch_format="pyarrow")
    out = _bsp(_presplit(state0, ["node"], P),
               _presplit(edges_w, ["src"], P),
               "opic", iters, 1.0, 0.0, P)

    def finish(t: pa.Table) -> pa.Table:
        imp = np.round(t.column("h").to_numpy()
                       + t.column("r").to_numpy(), 6)
        return pa.table({"node": t.column("node"),
                         "imp": pa.array(imp, pa.float64())})

    return out.map_batches(finish, batch_format="pyarrow")


def _degree_table(t: pa.Table) -> pa.Table:
    """Per-block partial out-degree counts (combiner before the exchange)."""
    df = t.to_pandas()
    g = (df.groupby("src", sort=False).size().astype(np.float64)
         .rename("outdeg").reset_index())
    return pa.Table.from_pandas(g, preserve_index=False)


def min_label_components(nodes: rd.Dataset, edges: rd.Dataset,
                         iters: int = 8,
                         num_partitions: int | None = None) -> rd.Dataset:
    """Connected components by ``iters`` rounds of synchronous min-label
    propagation — the clustering step after a near-dup pair scan (pairs ->
    components -> keep one representative per cluster). ``nodes``:
    (node:int64); ``edges``: (src, dst) undirected pairs (one direction is
    enough — both are propagated). Returns (node, label) where label is the
    minimum node id reachable within ``iters`` hops: fixed-depth semantics,
    identical on both oracle sides whether or not labels converged; size
    ``iters`` >= graph diameter for full components."""
    n_total = nodes.count()
    P = _pick_p(n_total, num_partitions)

    def both_dirs(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        return pa.table({"src": pa.array(np.concatenate([s, d]), pa.int64()),
                         "dst": pa.array(np.concatenate([d, s]), pa.int64())})

    und = edges.map_batches(both_dirs, batch_format="pyarrow")
    labels = nodes.map_batches(
        lambda t: t.append_column("label", t.column("node")),
        batch_format="pyarrow")
    return _bsp(_presplit(labels, ["node"], P), _presplit(und, ["src"], P),
                "min", iters, 0.0, 0.0, P)


def label_propagation(nodes: rd.Dataset, edges: rd.Dataset,
                      iters: int = 2,
                      num_partitions: int | None = None) -> rd.Dataset:
    """Community detection by ``iters`` rounds of SYNCHRONOUS label
    propagation (Raghavan et al. 2007, the near-linear community
    baseline) over undirected (src, dst) edges — the host-community
    primitive behind "which site clusters link together" crawl analyses
    that components can't answer (components merge everything connected;
    LPA keeps densely-linked groups apart). Update rule: each node adopts
    the MOST FREQUENT label among its neighbors, ties to the smallest
    label — fully deterministic (no RNG), so a fixed ``iters`` gives
    identical results on the engine and the unrolled SQL oracle. Same
    one-exchange-per-superstep BSP as pagerank; messages are (dst,
    sender_label) int rows."""
    n_total = nodes.count()
    P = _pick_p(n_total, num_partitions)

    def both_dirs(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        return pa.table({"src": pa.array(np.concatenate([s, d]), pa.int64()),
                         "dst": pa.array(np.concatenate([d, s]), pa.int64())})

    und = edges.map_batches(both_dirs, batch_format="pyarrow")
    labels = nodes.map_batches(
        lambda t: t.append_column("label", t.column("node")),
        batch_format="pyarrow")
    return _bsp(_presplit(labels, ["node"], P), _presplit(und, ["src"], P),
                "lpa", iters, 0.0, 0.0, P)


def sssp(nodes: rd.Dataset, edges: rd.Dataset, seed_mask_fn,
         iters: int = 3, num_partitions: int | None = None,
         n_total: int | None = None) -> rd.Dataset:
    """Weighted single-source(-set) shortest paths: ``iters`` synchronous
    Bellman-Ford relaxations over DIRECTED (src, dst, w:int) edges — the
    weighted generalization of :func:`bfs_layers` (crawl semantics: cost
    budget to reach a URL where w models politeness delay / depth cost).
    Fixed-depth semantics: returns the exact min-cost over paths of at
    most ``iters`` edges, so engine and unrolled oracle agree whether or
    not distances converged. Unlike BFS, every reached node re-sends each
    round (a longer-hop path may be cheaper), so message volume is the
    reached set — the price of weighted exactness; set ``iters`` >= the
    hop diameter of the cost-relevant region."""
    if n_total is None:
        n_total = nodes.count()
    P = _pick_p(n_total, num_partitions)

    def init(t: pa.Table) -> pa.Table:
        nd = t.column("node").to_numpy(zero_copy_only=False)
        lab = np.where(seed_mask_fn(nd), np.int64(0), _BFS_INF)
        return t.append_column("label", pa.array(lab, pa.int64()))

    state0 = nodes.map_batches(init, batch_format="pyarrow")
    out = _bsp(_presplit(state0, ["node"], P), _presplit(edges, ["src"], P),
               "sssp", iters, 0.0, 0.0, P)

    def finish(t: pa.Table) -> pa.Table:
        lab = t.column("label").to_numpy(zero_copy_only=False)
        keep = lab < _BFS_INF
        return pa.table({
            "node": pa.array(
                t.column("node").to_numpy(zero_copy_only=False)[keep],
                pa.int64()),
            "dist": pa.array(lab[keep], pa.int64())})

    return out.map_batches(finish, batch_format="pyarrow")


def bfs_layers(nodes: rd.Dataset, edges: rd.Dataset, seed_mask_fn,
               iters: int = 4,
               num_partitions: int | None = None,
               n_total: int | None = None) -> rd.Dataset:
    """Hop distance from a seed set over a DIRECTED graph — ``iters``
    synchronous BFS supersteps (the crawl-analysis primitive: "which URLs
    are within k hops of the seed list", reference semantics =
    cocrawler's seed-depth crawl frontier). ``seed_mask_fn(node_array)
    -> bool mask`` marks distance-0 nodes inside the init map (no seed
    list ships to the driver). Same BSP machinery as pagerank/components:
    edges pre-split ONCE, per-superstep messages are (dst, sender_dist+1)
    from the CURRENT FRONTIER only — nodes whose label equals the
    superstep number, i.e. first reached in the previous round (labels
    are final once set, so pruning older senders is exact) — folded by
    min; message volume tracks the frontier, not the reached set.
    Returns (node, dist:int64) for nodes reached within ``iters`` hops;
    fixed-depth semantics, identical on both oracle sides whether or not
    the BFS converged. ``n_total``: caller-known node count (skips one
    extra execution of the nodes lineage)."""
    if n_total is None:
        n_total = nodes.count()
    P = _pick_p(n_total, num_partitions)

    def init(t: pa.Table) -> pa.Table:
        nd = t.column("node").to_numpy(zero_copy_only=False)
        lab = np.where(seed_mask_fn(nd), np.int64(0), _BFS_INF)
        return t.append_column("label", pa.array(lab, pa.int64()))

    state0 = nodes.map_batches(init, batch_format="pyarrow")
    out = _bsp(_presplit(state0, ["node"], P), _presplit(edges, ["src"], P),
               "dist", iters, 0.0, 0.0, P)

    def finish(t: pa.Table) -> pa.Table:
        lab = t.column("label").to_numpy(zero_copy_only=False)
        keep = lab <= iters
        return pa.table({
            "node": pa.array(
                t.column("node").to_numpy(zero_copy_only=False)[keep],
                pa.int64()),
            "dist": pa.array(lab[keep], pa.int64())})

    return out.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# exact triangle counting (degree orientation + wedge closure)
# ---------------------------------------------------------------------------

def _canon_edges(t: pa.Table) -> pa.Table:
    """(src, dst) -> canonical undirected (a=min, b=max), self-loops out."""
    s = t.column("src").to_numpy(zero_copy_only=False)
    d = t.column("dst").to_numpy(zero_copy_only=False)
    a = np.minimum(s, d)
    b = np.maximum(s, d)
    keep = a != b
    return pa.table({"a": pa.array(a[keep], pa.int64()),
                     "b": pa.array(b[keep], pa.int64())})


def _wedges_reduce(df: pd.DataFrame) -> pd.DataFrame:
    """Per-partition wedge generation from degree-oriented edges
    (s, t, dt): for each apex s, every ORDERED pair of out-neighbors by
    the orientation's total order (degree, id). A pandas self-merge on
    the apex — one C-path join, no per-apex loop. Degree orientation
    caps out-degree at O(sqrt(m)), so per-apex pair fan-out is bounded
    (Suri & Vassilvitskii's 'curse of the last reducer' fix)."""
    if not len(df):
        return pd.DataFrame({"v": pd.Series([], dtype=np.int64),
                             "w": pd.Series([], dtype=np.int64)})
    m = df.merge(df, on="s", suffixes=("_1", "_2"))
    lt = (m["dt_1"] < m["dt_2"]) | ((m["dt_1"] == m["dt_2"])
                                    & (m["t_1"] < m["t_2"]))
    m = m[lt]
    return pd.DataFrame({"v": m["t_1"].to_numpy(np.int64),
                         "w": m["t_2"].to_numpy(np.int64)})


def triangle_count(edges: rd.Dataset,
                   num_partitions: int | None = None,
                   est_bytes: int | None = None) -> dict[str, int]:
    """Exact triangle count over an undirected edge list (src, dst) via
    degree orientation + wedge closure — the MapReduce formulation of
    Suri & Vassilvitskii (WWW'11), re-expressed on the hash exchange:

    1. canonicalize + dedup edges: one (a, b)-keyed exchange;
    2. per-node degrees: one node-keyed exchange over edge endpoints —
       the degree table stays a DATASET (object-store blocks), never a
       driver gather, so node domain scales with cluster memory;
    3. orient each edge from its (degree, id)-smaller endpoint to the
       larger via two size-dispatched degree joins (broadcast when the
       degree table is dimension-sized, hash exchange beyond), carrying
       the head's degree so wedge enumeration needs no third join;
    4. wedges: one apex-keyed exchange; ordered out-neighbor pairs per
       apex (``_wedges_reduce``). Orientation bounds out-degree at
       O(sqrt(m)) — total wedge volume O(m^1.5) worst case, the known
       optimum for exact one-round counting;
    5. closure: hash-join wedges against oriented edges on (v, w).
       Because orientation follows a strict TOTAL order, the closing
       edge of an ordered wedge can only be oriented v->w — one equi-
       join, no direction disjunction.

    Returns {n_nodes, n_edges, n_triangles}. Each triangle is counted
    exactly once (its unique apex = the (degree, id)-minimal vertex).
    """
    from cocrawler_ray.stages.exchange import (grouped_shuffle, hash_join,
                                               materialize_if_small)
    from cocrawler_ray.stages.joins import auto_join

    # multi-consumer edge tables (canon: count + exchange; und:
    # endpoints + join; ori: wedges + closing edges) are SIZE-GATED
    # pins: edges scale with the corpus, and above the budget a re-run
    # of the short lineage beats holding the graph in the object store
    # (``est_bytes``: caller's edge-volume estimate, e.g. rows x 24 B).
    canon = materialize_if_small(
        edges.map_batches(_canon_edges, batch_format="pyarrow"), est_bytes)
    # adapt exchange width to edge volume (the _pick_p rule): a small
    # graph at cluster-CPU width pays ~P^2 split/reduce fixed costs per
    # exchange with nothing to parallelize
    num_partitions = _pick_p(canon.count(), num_partitions)
    und = materialize_if_small(grouped_shuffle(
        canon, ["a", "b"], lambda df: df.drop_duplicates(),
        num_partitions=num_partitions), est_bytes)

    def endpoints(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(np.concatenate([a, b]), pa.int64())})

    deg = grouped_shuffle(
        und.map_batches(endpoints, batch_format="pyarrow"), ["node"],
        lambda df: (df.groupby("node", sort=False).size().rename("dg")
                    .reset_index()) if len(df) else
        pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                      "dg": pd.Series([], dtype=np.int64)}),
        num_partitions=num_partitions)
    # deg is node-scaled and consumed by BOTH degree attachments below —
    # size-gate its pin like the other triangle_count intermediates
    deg = materialize_if_small(deg, est_bytes)

    dega = deg.map_batches(lambda t: t.rename_columns(["node", "da"]),
                           batch_format="pyarrow")
    degb = deg.map_batches(lambda t: t.rename_columns(["node", "db"]),
                           batch_format="pyarrow")
    j = auto_join(auto_join(und, dega, "a", "node"), degb, "b", "node")

    def orient(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        da = t.column("da").to_numpy(zero_copy_only=False)
        db = t.column("db").to_numpy(zero_copy_only=False)
        lt = (da < db) | ((da == db) & (a < b))
        return pa.table({
            "s": pa.array(np.where(lt, a, b), pa.int64()),
            "t": pa.array(np.where(lt, b, a), pa.int64()),
            "dt": pa.array(np.where(lt, db, da), pa.int64())})

    ori = materialize_if_small(
        j.map_batches(orient, batch_format="pyarrow"), est_bytes)
    wedges = grouped_shuffle(ori, ["s"], _wedges_reduce,
                             num_partitions=num_partitions)
    ori_vw = ori.map_batches(
        lambda t: pa.table({"v": t.column("s"), "w": t.column("t")}),
        batch_format="pyarrow")
    closed = hash_join(wedges, ori_vw, on=["v", "w"],
                       num_partitions=num_partitions)
    return {"n_nodes": deg.count(), "n_edges": und.count(),
            "n_triangles": closed.count()}


def _hits_send(join_key: str, msg_key: str, score_col: str, P: int,
               E: pa.Table, S: pa.Table) -> list[pa.Table]:
    """HITS superstep send half: join this partition's edges (pre-split by
    ``join_key``'s hash — the same hash the node state uses, so the join
    is local) with the current score column and emit (node, c) integer
    messages pre-split by the receiving end's hash."""
    e = E.to_pandas()
    s = S.to_pandas()
    j = e.merge(s[["node", score_col]], left_on=join_key, right_on="node",
                how="inner")
    msgs = pa.table({
        "node": pa.array(j[msg_key].to_numpy(), pa.int64()),
        "c": pa.array(j[score_col].to_numpy().astype(np.int64), pa.int64())})
    return _split_by_hash(msgs, ["node"], P)


def _hits_fold(score_col: str, S: pa.Table, *subs: pa.Table) -> pa.Table:
    """HITS superstep receive half: REPLACE the score column with the sum
    of incoming messages (nodes receiving none score 0 — synchronous
    update, not accumulation)."""
    s = S.to_pandas()
    m = _merge(*subs).to_pandas() if subs else pd.DataFrame(
        {"node": [], "c": []})
    v = np.zeros(len(s), np.int64)
    if len(m):
        agg = m.groupby("node", sort=False)["c"].sum()
        pos = s.set_index("node").index.get_indexer(agg.index)
        ok = pos >= 0
        v[pos[ok]] = agg.to_numpy()[ok].astype(np.int64)
    s = s.copy()
    s[score_col] = v
    return pa.Table.from_pandas(s, preserve_index=False)


def hits(nodes: rd.Dataset, edges: rd.Dataset, iters: int = 2,
         num_partitions: int | None = None) -> rd.Dataset:
    """Fixed-iteration UNNORMALIZED HITS (Kleinberg hubs/authorities):
    from h0 = 1 at every node, alternate a := A^T h (authority = sum of
    pointing hubs) and h := A a (hub = sum of pointed authorities).
    Skipping the usual per-iteration normalization keeps every score an
    exact int64 — normalization is a single downstream scalar divide, and
    rankings are scale-invariant — so the whole computation is
    SQL-restatable (oracles.hits_sql unrolls the same iterations).

    Same BSP discipline as ``pagerank``: edges pre-split ONCE in each
    direction (by hash(src) for the authority step, by hash(dst) for the
    hub step — the hub step's messages flow dst -> src), node state
    pre-split once by the same hash; each superstep ships only (node, c)
    message rows. Returns (node, auth, hub) int64."""
    n_total = nodes.count()
    P = _pick_p(n_total, num_partitions)

    def init(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({"node": t.column("node"),
                         "h": pa.array(np.ones(n, np.int64)),
                         "a": pa.array(np.zeros(n, np.int64))})

    state = _presplit(nodes.map_batches(init, batch_format="pyarrow"),
                      ["node"], P)
    edges = edges.materialize()  # two pre-splits below — without this the
    # edge lineage (the dominant input) would execute once per direction
    fwd = _presplit(edges, ["src"], P)
    rev = _presplit(edges, ["dst"], P)

    send = ray.remote(num_returns=P)(_hits_send)
    fold = ray.remote(_hits_fold)

    def superstep(parts, jk, mk, col, outcol, state):
        outs = [send.remote(jk, mk, col, P, parts[p], state[p])
                for p in range(P)]
        if P == 1:
            outs = [[o] for o in outs]
        return [fold.remote(outcol, state[p], *[outs[q][p]
                                                for q in range(P)])
                for p in range(P)]

    for _ in range(iters):
        state = superstep(fwd, "src", "dst", "h", "a", state)
        state = superstep(rev, "dst", "src", "a", "h", state)
    return rd.from_arrow_refs(state)


def kcore_peel(nodes: rd.Dataset, edges: rd.Dataset, k: int = 4,
               rounds: int = 3,
               num_partitions: int | None = None) -> rd.Dataset:
    """Fixed-round k-core peeling (link-farm / spam-cluster detection:
    nodes that survive repeated degree-k pruning form densely linked
    cores). Each round recomputes degrees over the surviving subgraph
    (per-block combiner -> one grouped exchange) and drops nodes with
    degree < k; edges survive only if BOTH endpoints do (two semi-join
    exchanges per round — the exclusion set scales with the graph, so no
    broadcast). Fixed ``rounds`` keeps semantics identical on both
    oracle sides whether or not the peel converged. Returns
    (node, in_core:bool, deg:int64 — final-round degree, 0 if peeled)."""
    from cocrawler_ray.stages.exchange import grouped_shuffle, hash_join

    def both_dirs(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        return pa.table({"src": pa.array(np.concatenate([s, d]), pa.int64()),
                         "dst": pa.array(np.concatenate([d, s]), pa.int64())})

    und = edges.map_batches(both_dirs, batch_format="pyarrow").materialize()

    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"src": pd.Series(dtype=np.int64),
                                 "deg": pd.Series(dtype=np.int64)})
        return (df.groupby("src", sort=False).size().rename("deg")
                .reset_index())

    def deg_finish(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"src": pd.Series(dtype=np.int64),
                                 "deg": pd.Series(dtype=np.int64)})
        return (df.groupby("src", sort=False)["deg"].sum().reset_index()
                .astype({"deg": np.int64}))

    deg = None
    for _ in range(rounds):
        deg = grouped_shuffle(
            und.map_batches(deg_partial, batch_format="pandas"),
            ["src"], deg_finish, num_partitions=num_partitions)
        alive = deg.map_batches(
            lambda t: t.filter(pc.greater_equal(t["deg"],
                                                pa.scalar(k)))
            .select(["src"]),
            batch_format="pyarrow").materialize()
        und = hash_join(und, alive, on=["src"], how="left semi",
                        num_partitions=num_partitions)
        und = hash_join(und, alive.map_batches(
            lambda t: t.rename_columns(["dst_k"]), batch_format="pyarrow"),
            on=["dst"], right_on=["dst_k"], how="left semi",
            num_partitions=num_partitions).materialize()
    final_deg = grouped_shuffle(
        und.map_batches(deg_partial, batch_format="pandas"),
        ["src"], deg_finish, num_partitions=num_partitions)
    out = hash_join(nodes, final_deg, on=["node"], right_on=["src"],
                    how="left outer", num_partitions=num_partitions)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        d = df["deg"].fillna(0).to_numpy(np.int64) if len(df) else \
            np.array([], np.int64)
        return pd.DataFrame({"node": df["node"].to_numpy(np.int64)
                             if len(df) else np.array([], np.int64),
                             "in_core": d >= k, "deg": d})

    return out.map_batches(finish, batch_format="pandas")


def pagerank_personalized(nodes: rd.Dataset, edges: rd.Dataset,
                          seed_mod: int = 20, iters: int = 3,
                          damping: float = 0.85,
                          num_partitions: int | None = None,
                          n_total: int | None = None) -> rd.Dataset:
    """Personalized (seed-biased) PageRank — the topic-sensitive variant
    a crawl uses to prioritize pages near its seed list: the teleport
    mass lands ONLY on seed nodes (here ``node % seed_mod == 0``, so the
    seed set is restatable in SQL) instead of uniformly. Identical BSP
    discipline to ``pagerank``; the only change is a per-node base
    column carried in the state (mode "psum"). Start state r0 = b
    (teleport distribution), the unrolled-oracle convention."""
    if n_total is None:
        n_total = nodes.count()
    n_seeds = (n_total + seed_mod - 1) // seed_mod  # nodes 0,20,40,...
    P = _pick_p(n_total, num_partitions)

    from cocrawler_ray.stages.exchange import grouped_shuffle, hash_join
    deg_ds = rd.from_arrow_refs(
        [ray.remote(_degree_table).remote(r) for r in edges.to_arrow_refs()])
    deg_full = grouped_shuffle(
        deg_ds, ["src"],
        lambda df: (df.groupby("src", sort=False)["outdeg"].sum()
                    .astype(np.float64).reset_index()),
        num_partitions=P)
    edges_w = hash_join(edges, deg_full, on=["src"], num_partitions=P)

    base = (1.0 - damping) / n_seeds

    def init(t: pa.Table) -> pa.Table:
        node = t.column("node").to_numpy()
        b = np.where(node % seed_mod == 0, base, 0.0)
        return pa.table({"node": t.column("node"),
                         "r": pa.array(b, pa.float64()),
                         "b": pa.array(b, pa.float64())})

    state0 = nodes.map_batches(init, batch_format="pyarrow")
    out = _bsp(_presplit(state0, ["node"], P),
               _presplit(edges_w, ["src"], P),
               "psum", iters, damping, 0.0, P)
    return out.map_batches(lambda t: t.select(["node", "r"]),
                           batch_format="pyarrow")

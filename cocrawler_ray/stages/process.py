"""Fused post-drain processing shared by both crawl execution paths.

One generation's per-batch work is: robots-gate -> fetch -> persist fetched
cell -> extract links -> canonicalize -> priority-score -> in-batch dedup
(combiner) -> route candidates to seen partitions. The same functions here
back BOTH physical forms:

- the Ray Data ``map_batches(process)`` pipeline (pipelines/crawl.py) used
  for huge waves, where streaming execution + backpressure matter, and
- the fused per-actor path (``ShardHost.run_gen_local``) used for modest
  waves, where one RPC per actor per generation beats task scheduling.

Reference semantics: cocrawler/parse.py (link extraction),
cocrawler/urls.py (canonicalize), Crawler.add_url (priority + MaxDepth).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from cocrawler_ray import parse, schemas, urls
from cocrawler_ray.hashing import hash64


def extract_and_score(batch: pa.Table, max_depth: int,
                      collect_rejects: bool = False
                      ) -> pa.Table | tuple[pa.Table, pa.Table]:
    """fetched(+html) batch -> candidate link rows: extract, canonicalize,
    validity-filter, priority-score (child = parent priority + 1, drop
    depth>max). Reference: parse.py + urls.py + Crawler.add_url (M4,M1,M8).

    With ``collect_rejects`` the dropped URLs come back as a second table
    (src_surt, raw_url, reason in {invalid, too_deep}) — the reference's
    Logging.rejected_url_log sink (S5)."""
    htmls = batch.column("html").to_pylist()
    page_urls = batch.column("url").to_pylist()
    src_surts = batch.column("surt").to_pylist()
    prio = batch.column("priority").to_numpy()
    depth = batch.column("depth").to_numpy()

    ex = parse.extract_links_batch(htmls, page_urls)
    res = urls.canonicalize_batch(ex["raw"], ex["base"])
    keep = res["valid"]
    si = ex["src_idx"][keep]
    child_depth = depth[si] + 1
    keep2 = child_depth <= max_depth
    links = pa.table({
        "src_surt": pa.array([src_surts[i] for i in si[keep2]], pa.string()),
        "dst_url": pa.array(res["url"][keep][keep2], pa.string()),
        "dst_surt": pa.array(res["surt"][keep][keep2], pa.string()),
        "dst_host": pa.array(res["host"][keep][keep2], pa.string()),
        "kind": pa.array(ex["kind"][keep][keep2], pa.string()),
        "priority": pa.array((prio[si[keep2]] + 1).astype(np.int32)),
        "depth": pa.array((depth[si[keep2]] + 1).astype(np.int32)),
    })
    if not collect_rejects:
        return links
    raw = np.asarray(ex["raw"], dtype=object)
    src_all = np.asarray([src_surts[i] for i in ex["src_idx"]], dtype=object)
    rej_src = np.concatenate([src_all[~keep], src_all[keep][~keep2]])
    rej_url = np.concatenate([raw[~keep], raw[keep][~keep2]])
    rej_why = np.concatenate([np.full((~keep).sum(), "invalid", dtype=object),
                              np.full((~keep2).sum(), "too_deep", dtype=object)])
    rejects = pa.table({
        "src_surt": pa.array(rej_src, pa.string()),
        "raw_url": pa.array(rej_url, pa.string()),
        "reason": pa.array(rej_why, pa.string()),
    })
    return links, rejects


def winner_indices(batch: pa.Table, h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized in-batch dedup: given candidate rows and their
    ``hash64(dst_surt)`` keys, return ``(uniq_h, winner_row_idx)`` where
    ``winner_row_idx[i]`` is the row winning group ``uniq_h[i]`` under the
    engine's canonical rule min ``(priority, src_surt, kind)`` per dst.

    Grouping is by the 64-bit surt hash — exactly the identity the seen
    filter itself uses — so most groups are singletons and only the small
    duplicate subset pays the string sort (the previous pandas
    sort_values over every row was the finalize hot spot)."""
    uniq_h, first_idx, inv, counts = np.unique(
        h, return_index=True, return_inverse=True, return_counts=True)
    winner = first_idx
    if counts.size and counts.max() > 1:
        winner = first_idx.copy()
        sub = np.flatnonzero(counts[inv] > 1)
        take = pa.array(sub, pa.int64())
        pri = batch.column("priority").to_numpy()[sub]
        src = np.asarray(batch.column("src_surt").take(take).to_pylist(),
                         dtype=object)
        kind = np.asarray(batch.column("kind").take(take).to_pylist(),
                          dtype=object)
        hs = h[sub]
        order = np.lexsort((kind, src, pri, hs))
        sh = hs[order]
        firsts = np.concatenate(([True], sh[1:] != sh[:-1]))
        # sh's distinct values ascend, matching uniq_h[counts>1] ascending
        winner[np.flatnonzero(counts > 1)] = sub[order[firsts]]
    return uniq_h, winner


def dedup_links_batch(batch: pa.Table) -> pa.Table:
    """Partial in-batch dedup (combiner) before routing to the seen
    partitions: keeps the best (priority, src_surt, kind) row per dst_surt
    within the batch. The per-partition finalize applies the same rule
    globally (via the same winner_indices helper)."""
    if batch.num_rows == 0:
        return batch
    batch = batch.combine_chunks()
    h = hash64(batch.column("dst_surt").to_pylist())
    _, winner = winner_indices(batch, h)
    return batch.take(pa.array(np.sort(winner), pa.int64()))


def persist_rejects_cell(storage, rejects: pa.Table, fetched: pa.Table,
                         gen: int) -> None:
    """Rejected-URL log cells (S5), content-keyed like fetched cells so
    task replays overwrite idempotently."""
    if rejects is None or rejects.num_rows == 0:
        return
    first_surt = fetched.column("surt")[0].as_py()
    suffix = f"{int(hash64([first_surt])[0]) & 0xFFFFFFFF:08x}"
    part0 = int(fetched.column("part")[0].as_py())
    storage.write_cell_named(rejects, "rejectlog", gen,
                             f"part={part0:05d}-{suffix}")


def persist_fetched_cell(storage, fetched: pa.Table, gen: int) -> None:
    """Write one fetched cell (Lance-shaped Parquet). File name is
    content-keyed (first surt is unique per batch within a gen) so a task
    replay overwrites rather than duplicates — idempotent under retries."""
    cell = schemas.validate(fetched.drop_columns(["html"]), "fetched")
    first_surt = fetched.column("surt")[0].as_py()
    suffix = f"{int(hash64([first_surt])[0]) & 0xFFFFFFFF:08x}"
    part0 = int(fetched.column("part")[0].as_py())
    storage.write_cell_named(cell, "fetched", gen, f"part={part0:05d}-{suffix}")


def redirect_candidates(fetched: pa.Table) -> pa.Table:
    """3xx rows -> candidate rows for the redirect TARGET (reference
    post_fetch.py::handle_redirect: canonicalize Location against the
    redirecting URL, then through seen-gate -> frontier like any link).
    The target inherits the redirecting row's priority and depth (a hop is
    not a deeper page); kind='redirect' feeds the same winner dedup rule."""
    st = fetched.column("status")
    is3xx = pa.compute.and_(pa.compute.greater_equal(st, 300),
                            pa.compute.less(st, 400))
    rows = fetched.filter(is3xx)
    if rows.num_rows == 0:
        return pa.table({f.name: pa.array([], f.type)
                         for f in schemas.LINKS})
    res = urls.canonicalize_batch(rows.column("location").to_pylist(),
                                  rows.column("url").to_pylist())
    keep = res["valid"]
    src_surts = np.asarray(rows.column("surt").to_pylist(), dtype=object)[keep]
    prio = rows.column("priority").to_numpy()[keep]
    depth = rows.column("depth").to_numpy()[keep]
    return pa.table({
        "src_surt": pa.array(src_surts, pa.string()),
        "dst_url": pa.array(res["url"][keep], pa.string()),
        "dst_surt": pa.array(res["surt"][keep], pa.string()),
        "dst_host": pa.array(res["host"][keep], pa.string()),
        "kind": pa.array(["redirect"] * int(keep.sum()), pa.string()),
        "priority": pa.array(prio.astype(np.int32)),
        "depth": pa.array(depth.astype(np.int32)),
    })


def retry_rows(gated: pa.Table, statuses: pa.ChunkedArray | pa.Array,
               max_tries: int) -> pa.Table:
    """5xx rows -> frontier-schema rows to requeue (scheduler.py::
    requeue_work + fetcher MaxTries). ``gated`` is the pre-fetch batch
    (fetch output is positionally aligned with its input); rows whose NEXT
    attempt would exceed max_tries are dropped. The frontier's requeue()
    applies the retries+1 bump and priority demotion."""
    st = np.asarray(statuses)
    mask = (st >= 500) & (st < 600)
    mask &= gated.column("retries").to_numpy() + 1 < max_tries
    cols = ("surt", "url", "host", "priority", "rand", "depth", "retries", "seed_id")
    return gated.select(list(cols)).filter(pa.array(mask))


def links_to_candidates(fetched: pa.Table, max_depth: int,
                        collect_rejects: bool = False
                        ) -> pa.Table | tuple[pa.Table, pa.Table]:
    """200-rows -> deduped candidate link rows (the combiner output),
    merged with 3xx redirect-target candidates."""
    ok = pa.compute.equal(fetched.column("status"), 200)
    out = extract_and_score(fetched.filter(ok), max_depth,
                            collect_rejects=collect_rejects)
    links, rejects = out if collect_rejects else (out, None)
    redirs = redirect_candidates(fetched)
    if redirs.num_rows:
        links = pa.concat_tables([links, redirs]).combine_chunks()
    links = dedup_links_batch(links)
    return (links, rejects) if collect_rejects else links

"""Deterministic synthetic web corpus generator (FIXTURES.md F1/F2/F4).

Builds the Lance-shaped ``web`` table (image_id, bytes, w, h, fmt, caption,
phash per BASELINE.json:input_hint), the synthetic HTML bodies that the
*real* link extractor runs on, per-host robots.txt bodies, and a seed list.

Deterministic: everything derives from (seed, num_hosts, num_pages). Hosts
follow a Zipf(a=1.3) popularity so a few hosts are hot (exercises the
hot-host skew handling). Each page links to k in [0,8] other pages via
seeded preferential attachment, serialized as <a href> / <img src> so
parse.py does actual extraction work.

Two generators: `gen_web_tables` (single-process, tests) and
`write_web_dataset` (Ray-parallel, bench scale) — identical output for the
same parameters.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from cocrawler_ray import codecs

_ADJ = ["quick", "lazy", "bright", "dark", "tiny", "huge", "calm", "wild"]
_NOUN = ["fox", "dog", "river", "stone", "cloud", "tree", "bird", "road"]

SIZES = np.array([16, 32, 64], dtype=np.int32)


def host_name(h: int) -> str:
    return f"h{h:04d}.test"


def page_url(h: int, p: int) -> str:
    return f"http://{host_name(h)}/p{p:06d}"


def assign_hosts(num_pages: int, num_hosts: int, seed: int = 42) -> np.ndarray:
    """Zipf(1.3) host popularity; page p -> host id (deterministic)."""
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, num_hosts + 1, dtype=np.float64)
    probs = ranks ** -1.3
    probs /= probs.sum()
    return rng.choice(num_hosts, size=num_pages, p=probs)


def link_targets(num_pages: int, seed: int = 42, out_deg_max: int = 8
                 ) -> list[np.ndarray]:
    """Per-page out-link target page ids, k in [0,out_deg_max], preferential
    attachment (targets biased toward low page ids), no self-links."""
    rng = np.random.default_rng(seed + 1)
    ks = rng.integers(0, out_deg_max + 1, size=num_pages)
    out = []
    for p in range(num_pages):
        k = int(ks[p])
        if k == 0 or num_pages < 2:
            out.append(np.empty(0, dtype=np.int64))
            continue
        # preferential-ish: square a uniform to bias toward small ids
        t = (rng.random(k) ** 2 * num_pages).astype(np.int64) % num_pages
        t = t[t != p]
        out.append(np.unique(t))
    return out


def page_html(p: int, hosts: np.ndarray, targets: np.ndarray, caption: str,
              filler: int = 0, alias_every: int = 0) -> str:
    """Synthetic HTML for page p: title + links (same-host relative, cross-host
    absolute) + every third target as an <img src> embed. ``filler`` adds
    that many bytes of text between links so parse cost resembles real pages
    (real HTML is tens of KB of prose around the anchors). ``alias_every``
    > 0 rewrites links to qualifying targets (t % alias_every == 3) as
    alias paths ``/aNNNNNN`` which the fetcher 301-redirects to the real
    page — the redirect-handling path of the crawl loop (M7)."""
    parts = [f"<html><head><title>{caption}</title>"
             '<meta name="generator" content="synthweb/1.0"></head><body>']
    me = hosts[p]
    pad = ""
    if filler:
        per = max(32, filler // max(1, len(targets)))
        pad = "<p>" + (caption + " ") * (per // (len(caption) + 1) + 1) + "</p>"
    for j, t in enumerate(targets):
        seg = "a" if alias_every and t % alias_every == 3 else "p"
        href = (f"/{seg}{t:06d}" if hosts[t] == me
                else f"http://{host_name(int(hosts[t]))}/{seg}{t:06d}")
        if pad:
            parts.append(pad)
        if j % 3 == 2:
            parts.append(f'<img src="{href}">')
        else:
            parts.append(f'<a href="{href}">link {t}</a>')
    parts.append("</body></html>")
    return "".join(parts)


def _page_rows(page_ids: np.ndarray, hosts: np.ndarray, all_targets: list[np.ndarray],
               seed: int, filler: int = 0, alias_every: int = 0) -> dict[str, list]:
    rng = np.random.default_rng(seed + 2)
    cols: dict[str, list] = {k: [] for k in
                             ("image_id", "bytes", "w", "h", "fmt", "caption", "phash", "html", "url")}
    for p in page_ids:
        hid = int(hosts[p])
        image_id = f"h{hid:04d}/p{p:06d}"
        w = int(SIZES[int(codecs.hash64([image_id + "w"])[0]) % 3])
        hh = int(SIZES[int(codecs.hash64([image_id + "h"])[0]) % 3])
        img = codecs.make_image(image_id, w, hh)
        fmt = codecs.fmt_for(image_id)
        adj = _ADJ[int(codecs.hash64([image_id + "a"])[0]) % len(_ADJ)]
        noun = _NOUN[int(codecs.hash64([image_id + "n"])[0]) % len(_NOUN)]
        caption = f"caption {image_id} {adj} {noun}"
        cols["image_id"].append(image_id)
        cols["bytes"].append(codecs.encode(img, fmt))
        cols["w"].append(w)
        cols["h"].append(hh)
        cols["fmt"].append(fmt)
        cols["caption"].append(caption)
        cols["phash"].append(codecs.average_phash(img))
        cols["html"].append(page_html(int(p), hosts, all_targets[p], caption,
                                      filler=filler, alias_every=alias_every))
        cols["url"].append(page_url(hid, int(p)))
    _ = rng
    return cols


def gen_web_tables(num_hosts: int = 20, num_pages: int = 500, seed: int = 42,
                   out_deg_max: int = 8, filler: int = 0, alias_every: int = 0
                   ) -> tuple[pa.Table, pa.Table]:
    """(web, web_html) Arrow tables — single-process path for tests."""
    hosts = assign_hosts(num_pages, num_hosts, seed)
    targets = link_targets(num_pages, seed, out_deg_max=out_deg_max)
    cols = _page_rows(np.arange(num_pages), hosts, targets, seed, filler=filler,
                      alias_every=alias_every)
    web = pa.table(
        {
            "image_id": pa.array(cols["image_id"], pa.string()),
            "bytes": pa.array(cols["bytes"], pa.binary()),
            "w": pa.array(cols["w"], pa.int32()),
            "h": pa.array(cols["h"], pa.int32()),
            "fmt": pa.array(cols["fmt"], pa.string()),
            "caption": pa.array(cols["caption"], pa.string()),
            "phash": pa.array(cols["phash"], pa.int64()),
        }
    )
    web_html = pa.table(
        {
            "image_id": pa.array(cols["image_id"], pa.string()),
            "html": pa.array(cols["html"], pa.string()),
        }
    )
    return web, web_html


def gen_robots_table(num_hosts: int, with_delays: bool = False) -> pa.Table:
    """Per-host robots bodies (F4): every 5th host disallows a page-prefix,
    every 11th denies all, every 7th has a UA-specific section. With
    ``with_delays``, every 13th host declares ``Crawl-delay`` (2s or 4s) —
    kept off by default so the golden/bench corpora are unchanged."""
    hosts, bodies, ttls = [], [], []
    for h in range(num_hosts):
        name = host_name(h)
        if h % 11 == 3:
            body = "User-agent: *\nDisallow: /\n"
        elif h % 5 == 0:
            body = f"User-agent: *\nDisallow: /p00000\n"  # blocks pages 0..9
        elif h % 7 == 2:
            body = "User-agent: evilbot\nDisallow: /\n\nUser-agent: *\nAllow: /\n"
        elif with_delays and h % 13 == 4:
            d = 2 if h % 2 == 0 else 4
            body = f"User-agent: *\nCrawl-delay: {d}\nDisallow: /p00002\n"
        else:
            body = ""
        hosts.append(name)
        bodies.append(body)
        ttls.append(3600)
    return pa.table(
        {
            "host": pa.array(hosts, pa.string()),
            "body": pa.array(bodies, pa.string()),
            "ttl_s": pa.array(ttls, pa.int32()),
        }
    )


def gen_seed_lines(num_hosts: int, num_pages: int, num_seeds: int = 20, seed: int = 42
                   ) -> list[str]:
    """Seed file lines (F2): comments, blanks, schemeless + full URLs."""
    hosts = assign_hosts(num_pages, num_hosts, seed)
    rng = np.random.default_rng(seed + 3)
    pages = rng.choice(num_pages, size=min(num_seeds, num_pages), replace=False)
    lines = ["# synthetic seed list", ""]
    for i, p in enumerate(sorted(pages.tolist())):
        h = int(hosts[p])
        if i % 3 == 0:
            lines.append(f"{host_name(h)}/p{p:06d}")  # schemeless
        else:
            lines.append(page_url(h, p))
    return lines


def write_web_dataset(out_dir: str, num_hosts: int, num_pages: int, seed: int = 42,
                      pages_per_block: int = 2000, out_deg_max: int = 8,
                      filler: int = 0, alias_every: int = 0) -> None:
    """Ray-parallel generator for bench scale: shards page ranges across
    map_batches tasks, writes web/ and web_html/ parquet under out_dir.
    Output is identical to gen_web_tables for the same parameters."""
    import pyarrow.parquet as pq
    import ray.data as rd

    hosts = assign_hosts(num_pages, num_hosts, seed)
    targets = link_targets(num_pages, seed, out_deg_max=out_deg_max)
    import ray

    hosts_ref = ray.put(hosts)
    targets_ref = ray.put(targets)
    n_blocks = (num_pages + pages_per_block - 1) // pages_per_block

    def build_block(batch):
        import os
        h = ray.get(hosts_ref)
        tg = ray.get(targets_ref)
        for b in batch["block"]:
            b = int(b)
            lo, hi = b * pages_per_block, min((b + 1) * pages_per_block, num_pages)
            cols = _page_rows(np.arange(lo, hi), h, tg, seed, filler=filler,
                              alias_every=alias_every)
            web = pa.table({
                "image_id": pa.array(cols["image_id"], pa.string()),
                "bytes": pa.array(cols["bytes"], pa.binary()),
                "w": pa.array(cols["w"], pa.int32()),
                "h": pa.array(cols["h"], pa.int32()),
                "fmt": pa.array(cols["fmt"], pa.string()),
                "caption": pa.array(cols["caption"], pa.string()),
                "phash": pa.array(cols["phash"], pa.int64()),
            })
            html = pa.table({
                "image_id": pa.array(cols["image_id"], pa.string()),
                "html": pa.array(cols["html"], pa.string()),
            })
            os.makedirs(f"{out_dir}/web", exist_ok=True)
            os.makedirs(f"{out_dir}/web_html", exist_ok=True)
            pq.write_table(web, f"{out_dir}/web/block-{b:05d}.parquet", compression="zstd")
            pq.write_table(html, f"{out_dir}/web_html/block-{b:05d}.parquet", compression="zstd")
        return {"block": batch["block"]}

    (rd.range(n_blocks)
       .map_batches(lambda b: {"block": b["id"]}, batch_format="numpy")
       .map_batches(build_block, batch_format="numpy", batch_size=1)
       .materialize())

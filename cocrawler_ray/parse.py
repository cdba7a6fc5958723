"""HTML link extraction — regex-first, like the reference (SURVEY §2.2 M4).

Behavioral analogue of ``cocrawler/parse.py`` (find_html_links_re /
find_body_links_re / find_css_links_re): compiled regexes pull ``href`` /
``src`` attribute values out of anchors, links, scripts, images, iframes,
and ``url(...)`` references out of CSS. Anchors/links become *links*;
src-ish references become *embeds*. All raw strings are then cleaned and
joined against the page's base URL by urls.canonicalize.

Regexes are compiled at import time; extraction is per-document but each
document is processed with C-speed finditer — no per-character Python.
"""

from __future__ import annotations

import re

import numpy as np

# href= on <a> and <link>; case-insensitive, tolerant of quoting styles
_HREF = re.compile(
    r"""<(?:a|link)\b[^>]*?\bhref\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""",
    re.IGNORECASE | re.DOTALL,
)
# src= on img/script/iframe/embed/source/video/audio
_SRC = re.compile(
    r"""<(?:img|script|iframe|embed|source|video|audio|frame)\b[^>]*?\bsrc\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""",
    re.IGNORECASE | re.DOTALL,
)
# CSS url(...) references
_CSS_URL = re.compile(r"""url\(\s*(?:"([^"]*)"|'([^']*)'|([^)'"\s]+))\s*\)""", re.IGNORECASE)

_BASE = re.compile(
    r"""<base\b[^>]*?\bhref\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""", re.IGNORECASE
)


# one fused alternation of _HREF|_SRC|_CSS_URL: a realistic page is tens
# of KB, and scanning it once instead of three times roughly halves the
# parse stage's memory traffic — the crawl loop's dominant compute. Group
# layout: 1-3 href (link), 4-6 src (embed), 7-9 css url (embed).
_ALL = re.compile(
    r"""<(?:a|link)\b[^>]*?\bhref\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))"""
    r"""|<(?:img|script|iframe|embed|source|video|audio|frame)\b[^>]*?"""
    r"""\bsrc\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))"""
    r"""|url\(\s*(?:"([^"]*)"|'([^']*)'|([^)'"\s]+))\s*\)"""
    r"""|<base\b[^>]*?\bhref\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""",
    re.IGNORECASE | re.DOTALL,
)


def parse_page(html: str) -> tuple[str | None, list[str], list[str]]:
    """(base_href, links, embeds) in ONE scan — the batch path's kernel
    (find_base + find_html_links fused; first <base> wins, like a browser).
    """
    base: str | None = None
    links: list[str] = []
    embeds: list[str] = []
    for m in _ALL.finditer(html):
        g = m.groups()
        if g[0] is not None or g[1] is not None or g[2] is not None:
            links.append(g[0] if g[0] is not None else g[1] if g[1] is not None else g[2])
        elif g[9] is not None or g[10] is not None or g[11] is not None:
            if base is None:
                base = next(x for x in g[9:] if x is not None)
        else:
            embeds.append(next(x for x in g[3:9] if x is not None))
    return base, links, embeds


def _first_group(m: re.Match) -> str:
    return next(g for g in m.groups() if g is not None)


def find_html_links(html: str) -> tuple[list[str], list[str]]:
    """Return (links, embeds) raw strings from an HTML body.

    links = <a>/<link> hrefs; embeds = src attributes + css url() refs.
    Mirrors the reference's split (cocrawler/parse.py returns links & embeds
    separately so embeds can get different priority). Single fused scan;
    each list keeps document order (css refs interleave with src embeds by
    position — consumers are order-insensitive past the per-list split).
    """
    _, links, embeds = parse_page(html)
    return links, embeds


def find_base(html: str, default: str) -> str:
    """Effective base URL: <base href=...> if present, else the page URL."""
    m = _BASE.search(html)
    return _first_group(m) if m else default


def extract_links_batch(htmls, page_urls) -> dict[str, np.ndarray]:
    """Batch link extraction -> flat arrays (src_idx, raw, kind).

    src_idx indexes the input batch row; the caller joins back to page
    metadata and runs canonicalize_batch on `raw` with per-row base URLs.
    """
    src_idx: list[int] = []
    raw: list[str] = []
    kind: list[str] = []
    bases: list[str] = []
    for i, html in enumerate(htmls):
        if not html:
            continue
        base0, links, embeds = parse_page(html)
        base = base0 if base0 is not None else page_urls[i]
        for u in links:
            src_idx.append(i)
            raw.append(u)
            kind.append("href")
            bases.append(base)
        for u in embeds:
            src_idx.append(i)
            raw.append(u)
            kind.append("embed")
            bases.append(base)
    return {
        "src_idx": np.array(src_idx, dtype=np.int64),
        "raw": np.array(raw, dtype=object),
        "kind": np.array(kind, dtype=object),
        "base": np.array(bases, dtype=object),
    }


# sitemap XML: <loc> targets inside <urlset> (leaf) or <sitemapindex>
# (index of further sitemaps) — the crawl ecosystem's seed-expansion
# side-channel next to robots.txt's "Sitemap:" directive. Regex-first
# like the link extractor: sitemap files are machine-generated XML, and
# the two shapes a crawler must distinguish are "these are page URLs"
# vs "these are MORE SITEMAPS to fetch" (the index recursion).
_SITEMAP_LOC = re.compile(r"<loc>\s*([^<]*?)\s*</loc>", re.IGNORECASE)
_SITEMAP_INDEX = re.compile(r"<sitemapindex\b", re.IGNORECASE)


def find_sitemap_urls(xml: str) -> tuple[list[str], bool]:
    """(locs, is_index) of one sitemap document. ``is_index`` means the
    locs are further sitemap files (a <sitemapindex>), not page URLs —
    the caller feeds them back to the fetch stage instead of the
    frontier. Whitespace inside <loc> is trimmed per the protocol."""
    locs = [m.group(1) for m in _SITEMAP_LOC.finditer(xml)]
    return locs, _SITEMAP_INDEX.search(xml) is not None


def extract_sitemaps_batch(xmls) -> dict[str, np.ndarray]:
    """Batch sitemap extraction -> flat (src_idx, loc, is_index) arrays;
    src_idx indexes the input batch row (same join-back contract as
    extract_links_batch)."""
    src_idx: list[int] = []
    locs: list[str] = []
    is_index: list[bool] = []
    for i, xml in enumerate(xmls):
        if not xml:
            continue
        ls, idx = find_sitemap_urls(xml)
        for u in ls:
            src_idx.append(i)
            locs.append(u)
            is_index.append(idx)
    return {
        "src_idx": np.array(src_idx, dtype=np.int64),
        "loc": np.array(locs, dtype=object),
        "is_index": np.array(is_index, dtype=bool),
    }

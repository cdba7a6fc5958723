"""Facet extraction from HTML heads/bodies (SURVEY §2.2 M5).

Behavioral analogue of ``cocrawler/facet.py``: from the <head> take the
title, meta robots/generator, opengraph/twitter tags and
link rel=canonical/amp; plus grep-style body facets. Returned as a flat
(k, v) list per document, exploded to rows by the stage wrapper.
"""

from __future__ import annotations

import re

_TITLE = re.compile(r"<title[^>]*>(.*?)</title>", re.IGNORECASE | re.DOTALL)
_META = re.compile(
    r"""<meta\b[^>]*?\b(?:name|property)\s*=\s*["']([^"']+)["'][^>]*?\bcontent\s*=\s*["']([^"']*)["']""",
    re.IGNORECASE | re.DOTALL,
)
_LINK_REL = re.compile(
    r"""<link\b[^>]*?\brel\s*=\s*["']([^"']+)["'][^>]*?\bhref\s*=\s*["']([^"']*)["']""",
    re.IGNORECASE | re.DOTALL,
)

_INTERESTING_META = {
    "robots",
    "generator",
    "description",
    "keywords",
    "referrer",
}
_INTERESTING_REL = {"canonical", "amphtml", "alternate"}


def find_head_facets(html: str) -> list[tuple[str, str]]:
    """Title + interesting meta/opengraph/twitter + canonical links."""
    facets: list[tuple[str, str]] = []
    m = _TITLE.search(html)
    if m:
        facets.append(("title", m.group(1).strip()))
    for name, content in _META.findall(html):
        lname = name.lower()
        if lname in _INTERESTING_META or lname.startswith(("og:", "twitter:")):
            facets.append((lname, content))
    for rel, href in _LINK_REL.findall(html):
        lrel = rel.lower()
        if lrel in _INTERESTING_REL:
            facets.append(("link-rel-" + lrel, href))
    return facets


def facets_grep(html: str, patterns: dict[str, re.Pattern]) -> list[tuple[str, str]]:
    """Configurable grep facets over the body (cocrawler config 'Facets')."""
    out = []
    for name, pat in patterns.items():
        m = pat.search(html)
        if m:
            out.append((name, m.group(0)))
    return out


def facets_from_response_headers(headers: dict[str, str]) -> list[tuple[str, str]]:
    """Header-derived facets (server, content-type...) — cocrawler/facet.py."""
    out = []
    for k in ("server", "content-type", "x-powered-by", "last-modified"):
        if k in headers:
            out.append(("header-" + k, headers[k]))
    return out

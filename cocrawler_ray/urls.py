"""URL canonicalization, SURT keys, validity and special-redirect classes.

Behavioral re-implementation of ``cocrawler/urls.py::URL``,
``::clean_webpage_links`` and ``::special_redirect`` (SURVEY.md §2.2 M1-M3).
The reference's semantics, reconstructed from public knowledge of upstream
cocrawler (the reference tree was empty — SURVEY.md §0):

- clean raw link text: strip surrounding whitespace/control chars, unescape
  HTML entities;
- resolve relative links against the base URL (RFC 3986 merge +
  remove_dot_segments);
- lowercase scheme and host, strip trailing host dot, drop the fragment,
  strip default ports (http:80 / https:443), empty path -> "/";
- normalize percent-encoding: decode unreserved characters, uppercase the
  remaining hex digits;
- SURT (Sort-friendly URI Reordering Transform) key: reversed host labels
  comma-joined, leading "www" label dropped, then ")/" + path + "?" + query.
  (The surt library is not installed; this is a self-contained subset whose
  exact shape is pinned by tests/test_canonicalize.py.)
- registered domain: PSL-less two-label heuristic with a small common-2LD
  list (tldextract is not installed; flagged in SURVEY §Appendix).

Hot path: ``canonicalize_batch`` is called from ``map_batches``; the cheap
checks are vectorized, the per-string parse is a compiled-regex fast path
with a urllib fallback for unusual URLs.
"""

from __future__ import annotations

import html
import re
from functools import lru_cache
from urllib.parse import urljoin, urlsplit

import numpy as np

VALID_SCHEMES = ("http", "https")
MAX_URL_LEN = 2048

_CTRL = re.compile(r"[\x00-\x20\x7f]+")
_PCT = re.compile(r"%([0-9a-fA-F]{2})")
# fast-path: scheme://host[:port]/path[?query][#frag] with a simple host
_FAST = re.compile(
    r"^(?P<scheme>[a-zA-Z][a-zA-Z0-9+.-]*)://(?P<host>[^/?#:@\\]+)"
    r"(?::(?P<port>\d*))?(?P<path>/[^?#]*)?(?:\?(?P<query>[^#]*))?(?:#.*)?$"
)

_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)

# Common second-level public-suffix labels for the registered-domain
# heuristic (NOT a full PSL — documented limitation).
_COMMON_2LD = {"co", "com", "net", "org", "gov", "ac", "edu"}

DEFAULT_PORTS = {"http": "80", "https": "443"}


def clean_link_text(raw: str) -> str:
    """Strip whitespace/control chars and unescape HTML entities.

    Mirrors cocrawler/urls.py link-text cleanup before parsing.
    """
    s = raw.strip()
    if "&" in s:
        s = html.unescape(s)
    # embedded newlines/tabs inside URLs are dropped, runs of spaces removed
    if _CTRL.search(s):
        s = _CTRL.sub("", s)
    return s


def _pct_norm(s: str) -> str:
    """Percent-encoding normalization: decode unreserved, uppercase rest."""
    if "%" not in s:
        return s

    def fix(m: re.Match) -> str:
        ch = chr(int(m.group(1), 16))
        if ch in _UNRESERVED:
            return ch
        return "%" + m.group(1).upper()

    return _PCT.sub(fix, s)


def remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1] != "":
                out.pop()
                if not out:
                    out = [""]
            continue
        out.append(seg)
    # re-add trailing slash semantics for ./.. endings
    if path.endswith(("/.", "/..")) and (not out or out[-1] != ""):
        out.append("")
    res = "/".join(out)
    if not res.startswith("/"):
        res = "/" + res.lstrip("/")
    return res


class Canonical:
    """Result of canonicalization — the fields cocrawler's URL object carries."""

    __slots__ = ("url", "surt", "host", "registered_domain", "scheme", "path", "query")

    def __init__(self, url: str, surt: str, host: str, registered_domain: str,
                 scheme: str, path: str, query: str):
        self.url = url
        self.surt = surt
        self.host = host
        self.registered_domain = registered_domain
        self.scheme = scheme
        self.path = path
        self.query = query


def canonicalize(raw: str, base: str | None = None) -> Canonical | None:
    """Clean + resolve + normalize one URL. None if invalid/non-fetchable.

    Reference: cocrawler/urls.py::URL construction (clean -> urljoin ->
    normalize -> surt).
    """
    s = clean_link_text(raw)
    if not s:
        return None
    if base is not None and s.startswith("/") and not s.startswith("//"):
        # root-relative — the dominant link shape; skip the urllib urljoin
        # stack (urlparse+urlunsplit ≈ 40% of canonicalize time)
        prefix = _base_origin(base)
        s = prefix + s if prefix else urljoin(base, s)
    elif base and "://" not in s.split("?", 1)[0].split("#", 1)[0][:16]:
        # other relative (or scheme-relative //host/...) — full resolve
        s = urljoin(base, s)
    if len(s) > MAX_URL_LEN:
        return None

    m = _FAST.match(s)
    if m:
        scheme = m.group("scheme").lower()
        host = m.group("host").lower().rstrip(".")
        port = m.group("port")
        path = m.group("path") or "/"
        query = m.group("query")
    else:
        try:
            sp = urlsplit(s)
        except ValueError:
            return None
        scheme = sp.scheme.lower()
        host = (sp.hostname or "").rstrip(".")
        port = None
        try:
            if sp.port is not None:
                port = str(sp.port)
        except ValueError:
            return None
        path = sp.path or "/"
        query = sp.query or None

    if scheme not in VALID_SCHEMES or not host:
        return None

    if port == "" or port == DEFAULT_PORTS.get(scheme):
        port = None
    if "/." in path:  # "." / ".." segments only — skip the split/join else
        path = remove_dot_segments(path)
    if "%" in path:
        path = _pct_norm(path)
    query = _pct_norm(query) if query else None

    netloc = host if port is None else f"{host}:{port}"
    url = f"{scheme}://{netloc}{path}"
    if query is not None:
        url += "?" + query
    return Canonical(
        url=url,
        surt=make_surt(host, port, path, query),
        host=host,
        registered_domain=registered_domain(host),
        scheme=scheme,
        path=path,
        query=query or "",
    )


@lru_cache(maxsize=1 << 16)
def _base_origin(base: str) -> str | None:
    """scheme://host[:port] prefix of a simple base URL (None = not simple)."""
    m = _FAST.match(base)
    if m is None:
        return None
    port = m.group("port")
    origin = m.group("scheme") + "://" + m.group("host")
    return origin + ":" + port if port else origin


@lru_cache(maxsize=1 << 16)
def _surt_prefix(host: str, port: str | None) -> str:
    """Reversed-label host part of the SURT key (hosts repeat heavily)."""
    labels = host.split(".")
    if labels and labels[0] == "www":
        labels = labels[1:] or labels
    rev = ",".join(reversed(labels))
    if port is not None:
        rev += ":" + port
    return rev


def make_surt(host: str, port: str | None, path: str, query: str | None) -> str:
    """SURT key: com,example)/path?query — scheme-free, www-stripped."""
    s = _surt_prefix(host, port) + ")" + path
    if query:
        s += "?" + query
    return s


@lru_cache(maxsize=1 << 16)
def registered_domain(host: str) -> str:
    """Two-label heuristic with common-2LD list (tldextract stand-in)."""
    labels = host.split(".")
    if len(labels) <= 2:
        return host
    if labels[-2] in _COMMON_2LD and len(labels) >= 3:
        return ".".join(labels[-3:])
    return ".".join(labels[-2:])


# -- special redirects (cocrawler/urls.py::special_redirect) ----------------


def special_redirect(url: str, next_url: str) -> str | None:
    """Classify a redirect as trivial ('same', 'tohttps', 'towww',
    'tohttps+towww', 'addslash', 'removeslash', ...) or None if substantive.

    A trivial redirect's target is treated as the same URL for seen/dedup
    purposes (SURVEY §2.2 M2).
    """
    if url == next_url:
        return "same"
    a, b = canonicalize(url), canonicalize(next_url)
    if a is None or b is None:
        return None
    parts = []
    if a.scheme != b.scheme:
        if b.scheme == "https":
            parts.append("tohttps")
        else:
            parts.append("tohttp")
    ah, bh = a.host, b.host
    if ah != bh:
        if bh == "www." + ah:
            parts.append("towww")
        elif ah == "www." + bh:
            parts.append("tounwww")
        else:
            return None
    if (a.path, a.query) != (b.path, b.query):
        if a.query == b.query and b.path == a.path + "/":
            parts.append("addslash")
        elif a.query == b.query and a.path == b.path + "/":
            parts.append("removeslash")
        else:
            return None
    if not parts:
        return "same"
    return "+".join(parts)


# -- vectorized batch front-end (map_batches hot path) ----------------------


def canonicalize_batch(raws, bases=None) -> dict[str, np.ndarray]:
    """Canonicalize a batch of raw link strings against per-row base URLs.

    Returns dict of numpy arrays: url, surt, host, registered_domain, valid.
    Invalid rows have empty strings and valid=False. The per-string parse is
    a compiled-regex fast path; caller filters on `valid`.
    """
    n = len(raws)
    url = np.empty(n, dtype=object)
    surt = np.empty(n, dtype=object)
    host = np.empty(n, dtype=object)
    rdom = np.empty(n, dtype=object)
    valid = np.zeros(n, dtype=bool)
    if bases is None:
        bases = [None] * n
    elif isinstance(bases, str):
        bases = [bases] * n
    for i in range(n):
        c = canonicalize(raws[i], bases[i])
        if c is None:
            url[i] = ""
            surt[i] = ""
            host[i] = ""
            rdom[i] = ""
        else:
            url[i] = c.url
            surt[i] = c.surt
            host[i] = c.host
            rdom[i] = c.registered_domain
            valid[i] = True
    return {"url": url, "surt": surt, "host": host, "registered_domain": rdom, "valid": valid}


def path_trap_stats(paths) -> dict:
    """Crawler-trap heuristic over URL paths: a path whose segments
    repeat (``/calendar/2024/calendar/2024/...``, session-id mirrors,
    symlink loops) signals a spider trap; classic crawlers cap or reject
    them (cocrawler rejects over-long/over-deep URLs in urls.py's
    validity gate — this is the repeated-segment refinement of that
    gate).

    Vectorized across the batch: all segments explode into one flat
    array tagged with their row index, one lexsort groups (row, segment),
    and a shifted-compare counts distinct segments per row — no Python
    loop over rows. Returns ``n_seg``, ``n_dup`` (= n_seg - distinct)
    and ``trap`` (n_dup >= 2) arrays.

    Per-row by construction -> one streaming scan at any corpus size."""
    segs, seg_counts = [], []
    for p in paths:
        parts = [s for s in p.split("/") if s]
        segs.extend(parts)
        seg_counts.append(len(parts))
    n_seg = np.asarray(seg_counts, dtype=np.int64)
    flat = np.asarray(segs, dtype=object)
    rows = np.repeat(np.arange(len(n_seg), dtype=np.int64), n_seg)
    order = np.lexsort((flat, rows))
    f, r = flat[order], rows[order]
    new = np.ones(len(f), dtype=bool)
    if len(f) > 1:
        new[1:] = (r[1:] != r[:-1]) | (f[1:] != f[:-1])
    distinct = np.bincount(r[new], minlength=len(n_seg)).astype(np.int64)
    n_dup = n_seg - distinct
    return {"n_seg": n_seg, "n_dup": n_dup,
            "trap": (n_dup >= 2).astype(np.int64)}


def registrable_domain_batch(hosts, include_private: bool = True
                             ) -> np.ndarray:
    """Registrable domain (PLD / eTLD+1) per host — the grouping key for
    per-site politeness, dedup, and domain-level quality stats (hosts of
    one site must roll up together: sub1.example.co.uk and
    www.example.co.uk are the same registrant).

    Delegates to the embedded Public Suffix List snapshot
    (``cocrawler_ray.psl`` — the published PSL algorithm with exact,
    wildcard, and exception rules, matching the reference's tldextract
    behavior per ``cocrawler/urls.py::URL.registered_domain``).
    Vectorized (rpartition chains + np.isin); hosts at or below a
    public suffix return themselves unchanged."""
    from cocrawler_ray import psl
    return psl.registrable_domain_batch(hosts,
                                        include_private=include_private)

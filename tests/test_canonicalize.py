"""Table-driven URL canonicalization cases (FIXTURES.md F3).

Models the shape of the reference's tests/unit/test_urls.py (the crown
jewel of its test corpus — SURVEY.md §5). The reference tree was empty this
session, so these are hand-written cases pinning OUR documented semantics;
swap in the real corpus rows when /root/reference/tests appears.
"""

from __future__ import annotations

import numpy as np
import pytest

from cocrawler_ray import urls

BASE = "http://www.example.com/dir/page.html"

# (raw, base, expected_url, expected_surt, expected_host) — None url = rejected
CASES = [
    # absolute, already canonical
    ("http://example.com/", None, "http://example.com/", "com,example)/", "example.com"),
    # host/scheme case
    ("HTTP://EXAMPLE.COM/Path", None, "http://example.com/Path", "com,example)/Path", "example.com"),
    # default port strip
    ("http://example.com:80/a", None, "http://example.com/a", "com,example)/a", "example.com"),
    ("https://example.com:443/a", None, "https://example.com/a", "com,example)/a", "example.com"),
    ("http://example.com:8080/a", None, "http://example.com:8080/a", "com,example:8080)/a", "example.com"),
    # fragment dropped
    ("http://example.com/a#frag", None, "http://example.com/a", "com,example)/a", "example.com"),
    ("http://example.com/a?q=1#frag", None, "http://example.com/a?q=1", "com,example)/a?q=1", "example.com"),
    # empty path
    ("http://example.com", None, "http://example.com/", "com,example)/", "example.com"),
    # trailing host dot
    ("http://example.com./a", None, "http://example.com/a", "com,example)/a", "example.com"),
    # www stripped in surt only
    ("http://www.example.com/a", None, "http://www.example.com/a", "com,example)/a", "www.example.com"),
    # dot segments
    ("http://example.com/a/b/../c", None, "http://example.com/a/c", "com,example)/a/c", "example.com"),
    ("http://example.com/a/./b", None, "http://example.com/a/b", "com,example)/a/b", "example.com"),
    ("http://example.com/../a", None, "http://example.com/a", "com,example)/a", "example.com"),
    ("http://example.com/a/b/..", None, "http://example.com/a/", "com,example)/a/", "example.com"),
    # relative resolution against base
    ("sub/page2.html", BASE, "http://www.example.com/dir/sub/page2.html",
     "com,example)/dir/sub/page2.html", "www.example.com"),
    ("/rooted", BASE, "http://www.example.com/rooted", "com,example)/rooted", "www.example.com"),
    ("../up", BASE, "http://www.example.com/up", "com,example)/up", "www.example.com"),
    ("?q=2", BASE, "http://www.example.com/dir/page.html?q=2",
     "com,example)/dir/page.html?q=2", "www.example.com"),
    ("//other.com/x", BASE, "http://other.com/x", "com,other)/x", "other.com"),
    ("https://other.com/x", BASE, "https://other.com/x", "com,other)/x", "other.com"),
    # whitespace / control chars / entities
    ("  http://example.com/a  ", None, "http://example.com/a", "com,example)/a", "example.com"),
    ("http://example.com/a\n", None, "http://example.com/a", "com,example)/a", "example.com"),
    ("http://example.com/a?x=1&amp;y=2", None, "http://example.com/a?x=1&y=2",
     "com,example)/a?x=1&y=2", "example.com"),
    # percent-encoding normalization
    ("http://example.com/%7euser", None, "http://example.com/~user", "com,example)/~user", "example.com"),
    ("http://example.com/a%2fb", None, "http://example.com/a%2Fb", "com,example)/a%2Fb", "example.com"),
    ("http://example.com/%41bc", None, "http://example.com/Abc", "com,example)/Abc", "example.com"),
    # rejected schemes
    ("javascript:void(0)", BASE, None, None, None),
    ("mailto:a@b.com", BASE, None, None, None),
    ("data:text/plain,hi", BASE, None, None, None),
    ("ftp://example.com/f", None, None, None, None),
    ("tel:+123456", BASE, None, None, None),
    # junk
    ("", BASE, None, None, None),
    ("   ", BASE, None, None, None),
    ("http://", None, None, None, None),
]


@pytest.mark.parametrize("raw,base,want_url,want_surt,want_host", CASES)
def test_canonicalize_case(raw, base, want_url, want_surt, want_host):
    c = urls.canonicalize(raw, base)
    if want_url is None:
        assert c is None, f"{raw!r} should be rejected, got {c and c.url}"
    else:
        assert c is not None, f"{raw!r} unexpectedly rejected"
        assert c.url == want_url
        assert c.surt == want_surt
        assert c.host == want_host


def test_overlong_rejected():
    assert urls.canonicalize("http://example.com/" + "a" * 3000) is None


def test_registered_domain():
    assert urls.registered_domain("example.com") == "example.com"
    assert urls.registered_domain("a.b.example.com") == "example.com"
    assert urls.registered_domain("foo.co.uk") == "foo.co.uk"
    assert urls.registered_domain("x.foo.co.uk") == "foo.co.uk"


SPECIAL = [
    ("http://a.com/x", "http://a.com/x", "same"),
    ("http://a.com/x", "https://a.com/x", "tohttps"),
    ("https://a.com/x", "http://a.com/x", "tohttp"),
    ("http://a.com/x", "http://www.a.com/x", "towww"),
    ("http://www.a.com/x", "http://a.com/x", "tounwww"),
    ("http://a.com/x", "https://www.a.com/x", "tohttps+towww"),
    ("http://a.com/x", "http://a.com/x/", "addslash"),
    ("http://a.com/x/", "http://a.com/x", "removeslash"),
    ("http://a.com/x", "http://b.com/x", None),
    ("http://a.com/x", "http://a.com/y", None),
]


@pytest.mark.parametrize("u1,u2,want", SPECIAL)
def test_special_redirect(u1, u2, want):
    assert urls.special_redirect(u1, u2) == want


def test_batch_matches_scalar():
    raws = [c[0] for c in CASES]
    bases = [c[1] for c in CASES]
    out = urls.canonicalize_batch(raws, bases)
    for i, (raw, base, want_url, _, _) in enumerate(CASES):
        if want_url is None:
            assert not out["valid"][i]
        else:
            assert out["valid"][i]
            assert out["url"][i] == want_url
    assert isinstance(out["valid"], np.ndarray)


# --- Public Suffix List extraction (cocrawler_ray/psl.py; reference:
# cocrawler/urls.py::URL.registered_domain via tldextract) -------------

def test_psl_two_part_suffixes():
    from cocrawler_ray.urls import registrable_domain_batch as rdb
    hosts = ["sub1.example.co.uk", "a.b.c.example.com.au",
             "www.example.org.uk", "x.y.news.ac.jp", "shop.co.nz",
             "cdn.static.firm.co.za"]
    want = ["example.co.uk", "example.com.au", "example.org.uk",
            "news.ac.jp", "shop.co.nz", "firm.co.za"]
    assert list(rdb(hosts)) == want


def test_psl_wildcard_and_exception_rules():
    from cocrawler_ray.urls import registrable_domain_batch as rdb
    # *.ck: every 2-label suffix under ck is public — EXCEPT www.ck
    assert list(rdb(["a.shop.ck", "x.a.shop.ck", "www.ck", "sub.www.ck"])) \
        == ["a.shop.ck", "a.shop.ck", "www.ck", "www.ck"]
    # *.kawasaki.jp with !city.kawasaki.jp
    assert list(rdb(["b.ward.kawasaki.jp", "city.kawasaki.jp",
                     "sub.city.kawasaki.jp"])) \
        == ["b.ward.kawasaki.jp", "city.kawasaki.jp", "city.kawasaki.jp"]


def test_psl_host_at_or_below_suffix_returns_itself():
    from cocrawler_ray.urls import registrable_domain_batch as rdb
    assert list(rdb(["co.uk", "uk", "localhost", "k12.ca.us"])) \
        == ["co.uk", "uk", "localhost", "k12.ca.us"]


def test_psl_private_section_toggle():
    from cocrawler_ray.urls import registrable_domain_batch as rdb
    hosts = ["www.user.github.io", "myblog.blogspot.com"]
    assert list(rdb(hosts)) == ["user.github.io", "myblog.blogspot.com"]
    assert list(rdb(hosts, include_private=False)) \
        == ["github.io", "blogspot.com"]


def test_psl_politeness_rollup_collapses_subdomains():
    # the property the crawl loop needs: all hosts of one registrant
    # map to ONE politeness key
    from cocrawler_ray.urls import registrable_domain_batch as rdb
    hosts = ["www.example.co.uk", "cdn.example.co.uk",
             "a.b.example.co.uk", "example.co.uk"]
    assert len(set(rdb(hosts))) == 1

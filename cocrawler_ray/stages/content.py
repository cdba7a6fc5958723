"""Content gate + charset detection + size cap (SURVEY §2.2 M6).

Behavioral analogue of ``cocrawler/post_fetch.py``: only ``text/html``
responses are parsed; the body is decoded using the Content-Type header
charset when present, else a ``<meta charset=...>`` sniff of the body head,
else a default; bodies over MaxPageSize are truncated and flagged.
Vectorized over batches (compiled regexes, bytes-level ops) for use inside
``map_batches``.
"""

from __future__ import annotations

import re

import numpy as np

_HDR_CHARSET = re.compile(r"charset=([a-zA-Z0-9_-]+)", re.I)
_META_CHARSET = re.compile(rb"<meta[^>]+charset=[\"']?([a-zA-Z0-9_-]+)", re.I)
SNIFF_BYTES = 1024


def content_gate_batch(content_types: list[str], bodies: list[bytes],
                       max_size: int = 1 << 20,
                       default_charset: str = "utf-8") -> dict[str, np.ndarray]:
    """Gate + decode a batch of (content_type, body) pairs.

    Returns dict of arrays: keep (text/html only), charset (resolved),
    text (decoded, size-capped), truncated.
    """
    n = len(bodies)
    keep = np.zeros(n, dtype=bool)
    truncated = np.zeros(n, dtype=bool)
    charset = np.empty(n, dtype=object)
    text = np.empty(n, dtype=object)
    for i in range(n):
        ct = content_types[i] or ""
        if not ct.startswith("text/html"):
            charset[i] = ""
            text[i] = ""
            continue
        keep[i] = True
        m = _HDR_CHARSET.search(ct)
        if m:
            cs = m.group(1).lower()
        else:
            ms = _META_CHARSET.search(bodies[i][:SNIFF_BYTES])
            cs = ms.group(1).decode("ascii", "replace").lower() if ms else default_charset
        body = bodies[i]
        if len(body) > max_size:
            body = body[:max_size]
            truncated[i] = True
        try:
            text[i] = body.decode(cs, errors="replace")
        except LookupError:  # unknown charset name -> default
            cs = default_charset
            text[i] = body.decode(cs, errors="replace")
        charset[i] = cs
    return {"keep": keep, "charset": charset, "text": text, "truncated": truncated}

"""Distributed post-crawl output audit — the north-star acceptance check
(``BASELINE.json:input_hint``: every fetched row must satisfy decoded-pixel
allclose, PSNR >= 40 dB for lossy formats, plus caption equality against
the reference) run as a streaming Ray Data stage instead of a driver loop.

Scale shape: fetched cells are read as a Dataset (only the audited
columns); the reference web table is broadcast ONCE via ``ray.put`` and
each actor builds its image_id index in ``__init__`` (the fetcher's
broadcast-table convention, stages/fetch.py). Each batch decodes its
payloads (per-image decode is inherently per-row, like
stages/multimodal.py::ImageDecodeStats), compares against the reference
decode and caption, and emits ONLY violation rows — the result is empty on
a healthy crawl, so the driver never materializes audited data. A failed
audit names the offending (url, image_id, reason) rows for targeted
re-crawl of those cells (the resumable-output story).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

AUDIT_COLUMNS = ["url", "image_id", "status", "bytes", "w", "h", "fmt",
                 "caption", "phash"]


class FetchedAuditor:
    """Actor-pool map_batches callable: verify fetched rows against the
    broadcast reference web table."""

    def __init__(self, web_ref, min_psnr: float = 40.0):
        web: pa.Table = ray.get(web_ref)
        if any(web.column(c).num_chunks > 1 for c in web.column_names):
            web = web.combine_chunks()
        self.web = web
        self.idx = pd.Index(web.column("image_id").to_pylist())
        self.min_psnr = min_psnr

    def __call__(self, batch: pa.Table) -> pa.Table:
        from cocrawler_ray import codecs
        ok200 = batch.filter(pa.compute.equal(batch.column("status"), 200))
        urls = ok200.column("url").to_pylist()
        ids = ok200.column("image_id").to_pylist()
        pos = self.idx.get_indexer(ids)
        caps = ok200.column("caption").to_pylist()
        phs = ok200.column("phash").to_pylist()
        vio_u, vio_i, vio_r = [], [], []

        def flag(i: int, reason: str) -> None:
            vio_u.append(urls[i]); vio_i.append(ids[i]); vio_r.append(reason)

        for i, p in enumerate(pos):
            if p < 0:
                flag(i, "image_id not in reference")
                continue
            src = {c: self.web.column(c)[int(p)].as_py()
                   for c in ("bytes", "w", "h", "fmt", "caption", "phash")}
            if caps[i] != src["caption"]:
                flag(i, "caption mismatch")
                continue
            if phs[i] != src["phash"]:
                flag(i, "phash mismatch")
                continue
            row = ok200.slice(i, 1)
            try:
                dec = codecs.decode(row.column("bytes")[0].as_py(),
                                    row.column("w")[0].as_py(),
                                    row.column("h")[0].as_py(),
                                    row.column("fmt")[0].as_py())
                ref = codecs.decode(src["bytes"], src["w"], src["h"],
                                    src["fmt"])
            except Exception:
                flag(i, "decode error")
                continue
            if dec.shape != ref.shape or not np.array_equal(dec, ref):
                flag(i, "pixel mismatch vs reference decode")
                continue
            orig = codecs.make_image(ids[i], src["w"], src["h"])
            if codecs.psnr(orig, dec) < self.min_psnr:
                flag(i, f"psnr < {self.min_psnr}")
        return pa.table({"url": pa.array(vio_u, pa.string()),
                         "image_id": pa.array(vio_i, pa.string()),
                         "reason": pa.array(vio_r, pa.string())})


def audit_fetched(files: list[str], web: pa.Table, min_psnr: float = 40.0,
                  concurrency: int = 4) -> pd.DataFrame:
    """Audit fetched cells against the reference ``web`` table. Returns the
    violation rows (url, image_id, reason) — empty means every fetched 200
    row satisfies the input_hint invariant."""
    from cocrawler_ray import storage as storage_mod
    if not files:
        return pd.DataFrame({"url": pd.Series([], dtype=str),
                             "image_id": pd.Series([], dtype=str),
                             "reason": pd.Series([], dtype=str)})
    web_ref = ray.put(web.combine_chunks())
    ds = storage_mod.read_ray_dataset(files, columns=AUDIT_COLUMNS)
    out = ds.map_batches(FetchedAuditor,
                         fn_constructor_kwargs=dict(web_ref=web_ref,
                                                    min_psnr=min_psnr),
                         batch_format="pyarrow", batch_size=256,
                         concurrency=concurrency).to_pandas()
    if out.empty:  # Ray Data drops all-empty block schemas; rebuild
        out = pd.DataFrame({"url": pd.Series([], dtype=str),
                            "image_id": pd.Series([], dtype=str),
                            "reason": pd.Series([], dtype=str)})
    return out

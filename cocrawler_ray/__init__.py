"""cocrawler_ray — a Ray-Data-native rebuild of CoCrawler's crawl engine.

A brand-new, from-scratch data-processing engine with the query and
data-processing capabilities of racerthunder/cocrawler (an asyncio web
crawler), re-expressed as Ray Data pipelines:

- ``ray.data.Dataset`` + ``map_batches`` over zero-copy Arrow batches for
  every per-record transform (canonicalize, parse, score, filter).
- Actor pools for the stateful stages: sharded URL frontier with per-host
  politeness (burrow/ratelimit semantics from ``cocrawler/scheduler.py``),
  partitioned cuckoo-filter URL-seen set keyed by SURT hash
  (``cocrawler/datalayer.py``), per-partition robots cache
  (``cocrawler/robots.py``).
- groupby / sort / repartition for the wide steps (in-generation dedup,
  hot-host detection, ordering conformance).
- Lance-shaped tables (image_id, bytes, w, h, fmt, caption, phash) written
  through a Parquet storage shim (lance is not installed in this sandbox).

Nothing here is a port: the reference is a single-process asyncio event
loop; this engine is a generation-at-a-time streaming batch pipeline
designed for a multi-node Ray cluster and a 10^10-URL frontier.

Reference citations use ``module::symbol`` form (e.g.
``cocrawler/urls.py::URL``) because /root/reference was empty when the
survey was made — see SURVEY.md §0.
"""

from cocrawler_ray import schemas, hashing, codecs, urls, seeds, parse, facet, robots

__version__ = "0.1.0"

__all__ = [
    "schemas",
    "hashing",
    "codecs",
    "urls",
    "seeds",
    "parse",
    "facet",
    "robots",
]

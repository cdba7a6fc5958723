#!/usr/bin/env python
"""Print Ray Data execution stats (``ds.stats()``) for a query — the
measure-don't-guess loop used to tune batch sizes / concurrency per stage
(BASELINE.md protocol). Dataset-returning queries show per-operator wall,
block counts and memory; driver-side (pandas/Table) queries report wall
only.

Usage: python tools/pipeline_stats.py q_fetch_join [q_minhash_dedup ...]
       [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    import logging

    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from cocrawler_ray.queries import QUERIES

    for name in args.queries:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        res = fn(args.sf)
        if isinstance(res, rd.Dataset):
            res = res.materialize()
            wall = time.perf_counter() - t0
            print(f"\n===== {name} ({wall:.2f}s, {res.count()} rows) =====")
            print(res.stats())
        else:
            wall = time.perf_counter() - t0
            n = len(res) if hasattr(res, "__len__") else res.num_rows
            print(f"\n===== {name} ({wall:.2f}s, {n} rows) ====="
                  f"\n(driver-side result: {type(res).__name__}; no Dataset "
                  f"stats — stages already consumed)")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Per-generation phase profile of the headline crawl at a given CPU count.

Usage: python tools/profile_scaling.py <cpus> [--heavy]
Prints per-gen wall.pipeline_s / wall.finalize_s plus totals — the data
for deciding which barrier to attack for scaling efficiency.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    cpus = int(sys.argv[1])
    if "--heavy" in sys.argv:
        os.environ["GRAFT_BENCH_HOSTS"] = str(bench.SCALE_HOSTS)
        os.environ["GRAFT_BENCH_PAGES"] = str(bench.SCALE_PAGES)
        os.environ["GRAFT_BENCH_SEEDS"] = str(bench.SCALE_SEEDS)
        os.environ["GRAFT_BENCH_OUTDEG"] = str(bench.SCALE_OUTDEG)
        os.environ["GRAFT_BENCH_FILLER"] = str(bench.SCALE_FILLER)
        # re-read module-level knobs
        import importlib
        importlib.reload(bench)
    bench.init_ray(cpus)
    import tempfile

    import pyarrow.parquet as pq

    out_dir = tempfile.mkdtemp(prefix="cocrawler_prof_",
                               dir=os.environ.get("PROF_DIR"))
    try:
        t0 = time.perf_counter()
        res = bench.run_crawl_keep(cpus, out_dir) if hasattr(bench, "run_crawl_keep") \
            else _run_keep(out_dir)
        wall = time.perf_counter() - t0
        import glob
        rows = []
        for f in glob.glob(f"{out_dir}/metrics/**/*.parquet", recursive=True):
            rows.append(pq.read_table(f))
        import pyarrow as pa
        m = pa.concat_tables(rows).to_pandas() if rows else None
        phases = {}
        if m is not None:
            for name in ("wall.pipeline_s", "wall.finalize_s"):
                sub = m[m["name"] == name].sort_values("gen")
                phases[name] = [round(v, 3) for v in sub["value"]]
        print(json.dumps({"cpus": cpus, "wall_s": round(wall, 2),
                          "crawl": res, "phases": phases}))
    finally:
        import shutil
        shutil.rmtree(out_dir, ignore_errors=True)


def _run_keep(out_dir: str) -> dict:
    """bench.run_crawl minus the rmtree (we need the metrics cells)."""
    from cocrawler_ray import synth
    from cocrawler_ray.config import CrawlConfig
    from cocrawler_ray.pipelines.crawl import CrawlJob

    d = bench.ensure_corpus()
    web, html = bench.load_corpus(d)
    robots_t = synth.gen_robots_table(bench.CORPUS_HOSTS)
    robots_bodies = dict(zip(robots_t.column("host").to_pylist(),
                             robots_t.column("body").to_pylist()))
    seeds = synth.gen_seed_lines(bench.CORPUS_HOSTS, bench.CORPUS_PAGES,
                                 num_seeds=bench.CORPUS_SEEDS, seed=bench.CORPUS_SEED)
    cfg = CrawlConfig(out_dir=out_dir, num_parts=32, budget_per_host=1_000_000,
                      max_depth=30, max_gens=40, seed=bench.CORPUS_SEED,
                      fetch_batch_size=512, exact_seen=True)
    job = CrawlJob(cfg, web, html, robots_bodies)
    t0 = time.perf_counter()
    r = job.run(seeds)
    r["wall_s"] = round(time.perf_counter() - t0, 3)
    r["pages_per_sec"] = round(r["fetched"] / r["wall_s"], 1)
    return r


if __name__ == "__main__":
    main()

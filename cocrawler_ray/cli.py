"""CLI entry point — the Ray-native analogue of the reference's ``crawl.py``.

The reference is launched as ``crawl.py --configfile config.yml --config
Crawl.MaxDepth:3 --load savefile`` (SURVEY §3.1/§3.2). Ours:

    python -m cocrawler_ray --seeds seeds.txt --web-dir CORPUS --out OUT \\
        [--config max_depth:3 --config num_parts:32 ...] [--resume] \\
        [--write-logs] [--checkpoint-every N] [--num-cpus N]

and is ``ray job submit``-compatible (north_rule): on a cluster, submit
with ``ray job submit --working-dir . -- python -m cocrawler_ray ...`` —
the CLI attaches to the running cluster (``ray.init()`` auto-detects; a
local session is created when standalone). The library itself never calls
ray.init; only this CLI, bench.py and the test fixture own a session.

Inputs:
- ``--seeds``: text file of seed URLs/hosts (seeds.py::expand_seeds_batch
  semantics — blank lines and # comments ignored).
- ``--web-dir``: directory holding the Lance-shaped ``web`` and
  ``web_html`` Parquet tables (the sandbox's synthetic "network";
  ``python -m cocrawler_ray --gen-corpus`` writes one). A real-web
  deployment swaps FetcherPartition's table lookup for an HTTP pool.
- ``--robots``: optional Parquet file/dir with (host, body) robots.txt
  rows; omitted = allow-all.

Output: the partitioned Parquet tables under --out (fetched cells,
checkpoints, metrics, manifest) + a one-line JSON summary on stdout.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="python -m cocrawler_ray",
        description="Ray-Data-native crawl over a Lance-shaped web corpus")
    ap.add_argument("--seeds", help="seed list file (one URL/host per line)")
    ap.add_argument("--web-dir", help="corpus dir with web/ + web_html/ parquet")
    ap.add_argument("--robots", help="optional (host, body) robots parquet")
    ap.add_argument("--out", default="/tmp/cocrawler_ray_out")
    ap.add_argument("--configfile", metavar="YAML",
                    help="YAML config tree (reference crawl.py "
                         "--configfile parity: Section:/Key: nesting, "
                         "CamelCase reference names accepted); --config "
                         "overrides apply on top")
    ap.add_argument("--config", action="append", default=[],
                    metavar="KEY:VALUE",
                    help="CrawlConfig override, e.g. max_depth:3 (repeatable)")
    ap.add_argument("--resume", action="store_true",
                    help="restore the newest complete checkpoint under --out")
    ap.add_argument("--checkpoint-every", type=int, default=0)
    ap.add_argument("--write-warc", action="store_true",
                    help="export fetched rows as WARC/1.0 request+response pairs")
    ap.add_argument("--write-logs", action="store_true",
                    help="export crawllog/robotslog after the crawl")
    ap.add_argument("--export-shards", metavar="DIR",
                    help="post-crawl training export: curated (status-200, "
                         "captioned, digest-deduped) rows written as "
                         "hash-bucketed shard parquets under DIR; resumable "
                         "(existing shard files are skipped)")
    ap.add_argument("--audit", action="store_true",
                    help="distributed post-crawl audit: every fetched 200 "
                         "row must decode pixel-equal to the reference "
                         "(PSNR>=40dB vs source) with caption equality")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="CPUs for a standalone local session (ignored when "
                         "attached to a cluster)")
    ap.add_argument("--gen-corpus", nargs=3, metavar=("HOSTS", "PAGES", "DIR"),
                    help="generate a deterministic synthetic corpus and exit")
    ap.add_argument("--status", metavar="OUT_DIR",
                    help="print a JSON status summary of a crawl output dir "
                         "(the reference webserver's info surface: totals, "
                         "per-gen rates, hot hosts, checkpoint lineage — "
                         "from persisted state, no Ray session) and exit")
    ap.add_argument("--serve-status", metavar="OUT_DIR",
                    help="serve the live status page over HTTP (the "
                         "reference's webserver.py surface: / HTML, "
                         "/status.json, /healthz) for a crawl output dir; "
                         "each request re-reads the persisted metrics, so "
                         "it tracks a running crawl checkpoint-by-"
                         "checkpoint; blocks until interrupted")
    ap.add_argument("--status-port", type=int, default=8443,
                    help="port for --serve-status (0 = ephemeral)")
    ap.add_argument("--curate", nargs=2, metavar=("SRC", "DEST"),
                    help="run the end-to-end curation pipeline (perplexity "
                         "gate -> quality gate -> decontaminate -> exact "
                         "dedup -> sequence pack -> resumable shards) over "
                         "SRC (a dir with documents.parquet, or a parquet "
                         "file) into DEST, print the JSON manifest and exit")
    ap.add_argument("--pack-budget", type=int, default=2048,
                    help="tokens per training pack for --curate")
    ap.add_argument("--curate-shards", type=int, default=16,
                    help="output shard count for --curate / --curate-images / "
                         "--transcode")
    ap.add_argument("--curate-images", nargs=2, metavar=("SRC", "DEST"),
                    help="image-corpus curation: fetched cells/parquet -> "
                         "PSNR + flat gates -> dhash near-dup removal -> "
                         "resumable image shards")
    ap.add_argument("--transcode", nargs=2, metavar=("SRC", "DEST"),
                    help="bulk format migration: fetched cells/parquet -> "
                         "qntz re-encode with an integer loss gate "
                         "(originals kept over budget) -> resumable "
                         "shards")
    ap.add_argument("--max-mse-milli", type=int, default=6500,
                    help="loss budget for --transcode: migrate iff "
                         "sse*1000 <= budget*npx (6500 = PSNR>=40dB)")
    return ap


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    if args.gen_corpus:
        from cocrawler_ray import synth

        hosts, pages, out_dir = (int(args.gen_corpus[0]),
                                 int(args.gen_corpus[1]), args.gen_corpus[2])
        synth.write_web_dataset(out_dir, hosts, pages, seed=42)
        print(json.dumps({"corpus": out_dir, "hosts": hosts, "pages": pages}))
        return 0

    if args.status:
        from cocrawler_ray.pipelines.crawl import crawl_status
        print(json.dumps(crawl_status(args.status)))
        return 0

    if args.serve_status:
        from cocrawler_ray.status_server import StatusServer

        srv = StatusServer(args.serve_status, port=args.status_port).start()
        print(json.dumps({"serving": f"http://{srv.host}:{srv.port}/",
                          "out": args.serve_status}), flush=True)
        try:
            import threading
            threading.Event().wait()  # serve until SIGINT
        except KeyboardInterrupt:
            pass
        finally:
            srv.stop()
        return 0

    if args.curate:
        import ray

        if not ray.is_initialized():  # standalone; ray job submit attaches
            kw = {"num_cpus": args.num_cpus} if args.num_cpus else {}
            ray.init(address="local", include_dashboard=False,
                     logging_level="ERROR", **kw)
        from cocrawler_ray.pipelines.curate import curate_documents

        res = curate_documents(args.curate[0], args.curate[1],
                               pack_budget=args.pack_budget,
                               num_shards=args.curate_shards)
        print(json.dumps({
            "counts": res["counts"],
            "ppl_threshold": res["ppl_threshold"],
            "shards": res["manifest"].to_dict("records")}))
        return 0

    if args.curate_images:
        import os

        import ray

        if not ray.is_initialized():  # standalone; ray job submit attaches
            kw = {"num_cpus": args.num_cpus} if args.num_cpus else {}
            ray.init(address="local", include_dashboard=False,
                     logging_level="ERROR", **kw)
        from cocrawler_ray.pipelines.curate_images import curate_image_shards
        from cocrawler_ray.storage import Storage

        src = args.curate_images[0]
        files = Storage(src).table_files("fetched") \
            if os.path.isdir(src) else [src]
        res = curate_image_shards(files, args.curate_images[1],
                                  num_shards=args.curate_shards)
        print(json.dumps({
            "counts": res["counts"],
            "shards": res["manifest"].to_dict("records")}))
        return 0

    if args.transcode:
        import os

        import ray

        if not ray.is_initialized():  # standalone; ray job submit attaches
            kw = {"num_cpus": args.num_cpus} if args.num_cpus else {}
            ray.init(address="local", include_dashboard=False,
                     logging_level="ERROR", **kw)
        from cocrawler_ray.pipelines.transcode import transcode_shards
        from cocrawler_ray.storage import Storage

        src = args.transcode[0]
        files = Storage(src).table_files("fetched") \
            if os.path.isdir(src) else [src]
        res = transcode_shards(files, args.transcode[1],
                               num_shards=args.curate_shards,
                               max_mse_milli=args.max_mse_milli)
        print(json.dumps({
            "counts": res["counts"],
            "shards": res["manifest"].to_dict("records")}))
        return 0

    if not args.seeds or not args.web_dir:
        build_parser().error("--seeds and --web-dir are required (or --gen-corpus)")

    import pyarrow.parquet as pq

    import ray

    if not ray.is_initialized():   # standalone; ray job submit attaches
        kw = {"num_cpus": args.num_cpus} if args.num_cpus else {}
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR", **kw)

    from cocrawler_ray.config import CrawlConfig
    from cocrawler_ray.pipelines.crawl import CrawlJob

    web = pq.read_table(f"{args.web_dir}/web")
    html = pq.read_table(f"{args.web_dir}/web_html")
    robots_bodies: dict[str, str] = {}
    if args.robots:
        rt = pq.read_table(args.robots)
        robots_bodies = dict(zip(rt.column("host").to_pylist(),
                                 rt.column("body").to_pylist()))
    seed_lines = [ln for ln in open(args.seeds).read().splitlines()]

    if args.configfile:
        cfg = CrawlConfig.from_yaml(
            args.configfile, *args.config, out_dir=args.out,
            checkpoint_every=args.checkpoint_every)
    else:
        cfg = CrawlConfig.from_overrides(
            *args.config, out_dir=args.out,
            checkpoint_every=args.checkpoint_every)
    job = CrawlJob(cfg, web, html, robots_bodies)

    resumed_from = None
    if args.resume:
        resumed_from = job.restore_latest()
    t0 = time.perf_counter()
    if resumed_from is None:
        res = job.run(seed_lines)
    else:
        res = job.run()   # frontier/seen restored; no re-seeding
    wall = time.perf_counter() - t0

    summary = {"gens": res["gens"], "fetched": res["fetched"],
               "appended": res["appended"], "wall_s": round(wall, 3),
               "pages_per_sec": round(res["fetched"] / max(wall, 1e-9), 1),
               "out": args.out, "resumed_from_gen": resumed_from}
    if args.write_logs:
        summary["logs"] = job.write_logs()
    if args.write_warc:
        summary["warc"] = job.write_warcs()
    if args.export_shards:
        from cocrawler_ray.pipelines.export import export_training_shards
        manifest = export_training_shards(
            job.storage.table_files("fetched"), args.export_shards)
        summary["export"] = {"shards": int(len(manifest)),
                             "rows": int(manifest["rows"].sum()),
                             "skipped": int(manifest["skipped"].sum()),
                             "dir": args.export_shards}
    if args.audit:
        from cocrawler_ray.stages.verify import audit_fetched
        vio = audit_fetched(job.storage.table_files("fetched"), web)
        summary["audit"] = {"violations": int(len(vio)),
                            "sample": vio.head(5).to_dict("records")}
    print(json.dumps(summary))
    return 0 if not (args.audit and len(vio)) else 2


if __name__ == "__main__":
    sys.exit(main())

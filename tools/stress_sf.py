"""Scale-stress runner: the bench query suite at an arbitrary sf dir,
with per-query wall time and driver peak-RSS tracking.

The point (VERDICT r3 #6): per-query wall should grow ≲ linearly from
sf0.1 to sf1 (10x rows) and driver memory must stay flat — any
superlinear query or RSS blowup is a hidden gather / materialize.

Usage: python tools/stress_sf.py [sf_dir] [num_cpus]
Prints one JSON line: {"sf_dir":..., "queries": {name: sec},
"total_s":..., "driver_peak_rss_mb":..., "cpu_probe_hps":...}
"""

from __future__ import annotations

import json
import resource
import sys
import time


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    sys.path.insert(0, "/root/repo")  # script runs from tools/ too
    import bench
    probe = bench.cpu_probe()
    bench.init_ray(num_cpus)
    bench.warm_workers(num_cpus)

    from cocrawler_ray.queries import QUERIES
    times: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in (bench.BENCH_QUERIES + bench.BENCH_QUERIES_R2
                 + bench.BENCH_QUERIES_R3 + bench.BENCH_QUERIES_R4
                 + bench.BENCH_QUERIES_R5):
        t0 = time.perf_counter()
        n = bench.consume(QUERIES[name](sf_dir))
        times[name] = round(time.perf_counter() - t0, 3)
        rows[name] = n
        rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
        print(f"{name}: {times[name]}s ({n} rows, rss {rss:.0f}MB)",
              file=sys.stderr)

    peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    # output rows ride along so a superlinear wall can be attributed to
    # genuinely superlinear OUTPUT (dedup pair clusters) vs engine cost
    print(json.dumps({
        "sf_dir": sf_dir, "num_cpus": num_cpus,
        "total_s": round(sum(times.values()), 3),
        "queries": times,
        "out_rows": rows,
        "driver_peak_rss_mb": round(peak_mb, 1),
        "cpu_probe_hps": probe,
    }))
    import ray
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())

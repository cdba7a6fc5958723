"""Memory monitor: RSS/object-store tracking, limits, shed callbacks.

SURVEY §2 T8 (``cocrawler/memory.py``): the reference samples process
RSS, prints debug dumps of the biggest holders, and enforces a limit by
calling registered trim hooks. In the Ray engine most of that job is
subsumed by the object store (blocks live in plasma and spill to disk
under pressure, streaming execution applies backpressure) — what remains
driver-side is exactly what this module does:

- :func:`rss_bytes` — the driver/worker process RSS from
  ``/proc/self/status`` (no psutil dependency).
- :func:`object_store_usage` — cluster object-store used/total from Ray
  resource accounting (0 when no session, so callers never gate on it).
- :class:`MemoryMonitor` — named components register a ``size_fn``
  (current bytes held) and an optional ``shed_fn`` (release memory,
  return bytes freed). ``sample()`` returns a flat metrics dict the
  crawl loop persists per generation (``mem.*`` rows → visible on the
  S6 status page); when RSS exceeds the soft limit, ``sample()`` invokes
  shed hooks largest-holder-first until under the limit or exhausted —
  the reference's limit semantics, with the frontier's cold-tail parquet
  spill (state/frontier.py) as the canonical hook.
- :meth:`MemoryMonitor.debug_dump` — the reference's "biggest objects"
  debug surface: per-component byte sizes, sorted descending.
"""

from __future__ import annotations

from typing import Callable


def rss_bytes() -> int:
    """Resident set size of THIS process, from /proc (Linux)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) * 1024
    except OSError:
        pass
    return 0


def object_store_usage() -> tuple[int, int]:
    """(used_bytes, total_bytes) of the Ray object store; (0, 0) when no
    Ray session is up, so metrics code never needs to gate on it."""
    try:
        import ray
        if not ray.is_initialized():
            return 0, 0
        total = ray.cluster_resources().get("object_store_memory", 0)
        avail = ray.available_resources().get("object_store_memory", 0)
        return int(total - avail), int(total)
    except Exception:
        return 0, 0


class MemoryMonitor:
    """Driver-side memory accounting with limit-triggered shedding.

    ``soft_limit_bytes=None`` disables shedding (pure metrics). Shed
    hooks run largest-holder-first and each reports bytes freed; the
    pass stops as soon as the projected RSS is back under the limit.
    Components without a shed hook still show up in samples and dumps.
    """

    def __init__(self, soft_limit_bytes: int | None = None):
        self.soft_limit_bytes = soft_limit_bytes
        self._components: dict[str, tuple[Callable[[], int],
                                          Callable[[], int] | None]] = {}
        self.shed_events: list[dict] = []

    def register(self, name: str, size_fn: Callable[[], int],
                 shed_fn: Callable[[], int] | None = None) -> None:
        self._components[name] = (size_fn, shed_fn)

    def unregister(self, name: str) -> None:
        self._components.pop(name, None)

    def debug_dump(self) -> list[tuple[str, int]]:
        """(component, bytes) sorted largest first — the reference's
        biggest-holders debug print, as data."""
        sizes = [(n, int(fns[0]())) for n, fns in self._components.items()]
        return sorted(sizes, key=lambda x: -x[1])

    def sample(self, rss: int | None = None) -> dict[str, float]:
        """One monitoring step: measure, maybe shed, return metrics.

        Keys are flat ``mem.*`` names so the crawl loop can persist them
        verbatim as metrics rows."""
        rss = rss_bytes() if rss is None else rss
        used, total = object_store_usage()
        out: dict[str, float] = {"mem.rss": float(rss),
                                 "mem.obj_used": float(used),
                                 "mem.obj_total": float(total)}
        for name, (size_fn, _) in self._components.items():
            out[f"mem.c.{name}"] = float(size_fn())
        if self.soft_limit_bytes is not None and rss > self.soft_limit_bytes:
            freed_total = 0
            for name, _sz in self.debug_dump():
                if rss - freed_total <= self.soft_limit_bytes:
                    break
                shed = self._components[name][1]
                if shed is None:
                    continue
                freed = int(shed())
                freed_total += max(0, freed)
                self.shed_events.append(
                    {"component": name, "freed": freed, "rss": rss})
            out["mem.shed"] = float(freed_total)
        return out

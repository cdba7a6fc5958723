"""DNS resolver cache (SURVEY §2.3 T4 — ``cocrawler/dns.py`` semantics).

The reference prefetches DNS for queued hosts and caches (host -> addr)
with a TTL so fetch coroutines never block on a resolver. The batch-engine
image: each FetcherPartition owns a ``DnsCache`` and resolves a batch's
hosts (vectorized over the unique hosts, one resolver call per cache miss)
before touching the fetch backend; unresolvable hosts fail the fetch with
a connect-error status without hitting the backend.

The resolver is pluggable: the sandbox default derives a deterministic
fake address from the host name (hash-based, stable across processes);
a real deployment passes ``socket.getaddrinfo`` (or an async resolver)
behind the same ``resolve(host) -> addr | None`` signature.
"""

from __future__ import annotations

import numpy as np

from cocrawler_ray.hashing import hash64


def stdlib_resolver(host: str) -> str | None:
    """Real DNS over ``socket.getaddrinfo`` — the live-crawl resolver
    (first A/AAAA address, NXDOMAIN/any resolver error -> None). Used
    automatically by HttpFetcherBackend when its live default client is
    in play; the synthetic resolver below remains the closed-world
    default for injected test clients."""
    import socket
    try:
        infos = socket.getaddrinfo(host, None, proto=socket.IPPROTO_TCP)
        return infos[0][4][0] if infos else None
    except OSError:
        return None


def synthetic_resolver(host: str) -> str | None:
    """Deterministic fake A-record for the synthetic web: *.test hosts
    resolve to 10.x.y.z derived from the host hash; everything else is
    NXDOMAIN (mirrors the sandbox's closed world)."""
    if not host.endswith(".test"):
        return None
    h = int(hash64([host])[0])
    return f"10.{(h >> 16) & 0xFF}.{(h >> 8) & 0xFF}.{h & 0xFF}"


class DnsCache:
    def __init__(self, resolver=synthetic_resolver, ttl_gens: int = 50):
        self.resolver = resolver
        self.ttl_gens = ttl_gens
        self.cache: dict[str, tuple[str | None, int]] = {}
        self.lookups = 0     # resolver calls (cache misses)
        self.hits = 0

    def resolve_batch(self, hosts, gen: int = 0) -> np.ndarray:
        """bool mask of resolvable hosts; one resolver call per unique
        uncached host (the batch image of the reference's prefetcher)."""
        arr = np.asarray(hosts, dtype=object)
        uniq, inv = np.unique(arr, return_inverse=True)
        ok_u = np.zeros(len(uniq), dtype=bool)
        for i, h in enumerate(uniq):
            hit = self.cache.get(h)
            if hit is not None and gen - hit[1] < self.ttl_gens:
                self.hits += 1
                ok_u[i] = hit[0] is not None
                continue
            self.lookups += 1
            addr = self.resolver(str(h))
            self.cache[h] = (addr, gen)
            ok_u[i] = addr is not None
        return ok_u[inv]

    def addr_of(self, host: str) -> str | None:
        hit = self.cache.get(host)
        return hit[0] if hit else None

    def stats(self) -> dict[str, int]:
        return {"lookups": self.lookups, "hits": self.hits,
                "cached_hosts": len(self.cache)}

"""Partitioned URL-seen filter: cuckoo filter + exact shadow set.

Replaces the reference's single in-memory set (cocrawler/datalayer.py::
seen/add_seen) with K hash(surt)-sharded partitions (north_rule). Each
partition holds:

- a **cuckoo filter** (4-slot buckets, 16-bit fingerprints ≈ 18 bits/key at
  95% load) — the scale path: at 10^10 URLs the exact set cannot fit in RAM
  (SURVEY §4.3), the cuckoo (~23 GB total across the cluster) can;
- an **exact shadow set** of uint64 key hashes — authoritative at test
  scale; conformance tests reconcile cuckoo false positives against it.

``check_and_add`` is the batch API called once per map_batches batch per
partition — at-most-once enqueue semantics (SURVEY §2.9).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_U64 = np.uint64
_MAX_KICKS = 500


class CuckooFilter:
    """4-way bucketized cuckoo filter over uint16 fingerprints (0 = empty)."""

    def __init__(self, capacity: int, seed: int = 99):
        # buckets sized to next power of two of capacity/4 at ~95% load
        n = max(8, int(2 ** np.ceil(np.log2(capacity / 4 / 0.95 + 1))))
        self.num_buckets = n
        self.mask = _U64(n - 1)
        self.table = np.zeros((n, 4), dtype=np.uint16)
        self.seed = _U64(seed * 0x9E3779B9)
        self.count = 0
        self.overflowed = False

    def _fp_and_buckets(self, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        keys = keys.astype(_U64)
        fp = ((keys >> _U64(48)) & _U64(0xFFFF)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)  # 0 is the empty marker
        i1 = (keys & self.mask).astype(np.int64)
        # partner bucket: i ^ hash(fp) — the cuckoo identity
        with np.errstate(over="ignore"):
            fph = (fp.astype(_U64) * _U64(0x5BD1E9955BD1E995)) ^ self.seed
        i2 = ((i1.astype(_U64) ^ fph) & self.mask).astype(np.int64)
        return fp, i1, i2

    def contains_batch(self, keys: np.ndarray) -> np.ndarray:
        if keys.size == 0:
            return np.zeros(0, dtype=bool)
        fp, i1, i2 = self._fp_and_buckets(keys)
        in1 = (self.table[i1] == fp[:, None]).any(axis=1)
        in2 = (self.table[i2] == fp[:, None]).any(axis=1)
        return in1 | in2

    def insert_batch(self, keys: np.ndarray) -> None:
        """Vectorized bulk insert: try every key's primary bucket in one
        scatter round, failures try the partner bucket, the (rare at <95%
        load) remainder falls back to the scalar eviction loop. Within a
        round, same-bucket keys get distinct slots via rank-within-bucket,
        so the scatter writes never collide."""
        if len(keys) == 0:
            return
        fp, i1, i2 = self._fp_and_buckets(keys)
        pend = np.arange(len(keys))
        for buckets in (i1, i2):
            if pend.size == 0:
                break
            b = buckets[pend]
            order = np.argsort(b, kind="stable")
            bs = b[order]
            fill = (self.table[bs] != 0).sum(axis=1)
            firsts = np.flatnonzero(np.concatenate(([True], bs[1:] != bs[:-1])))
            group_of = np.repeat(firsts, np.diff(np.append(firsts, len(bs))))
            slot = fill + (np.arange(len(bs)) - group_of)
            ok = slot < 4
            self.table[bs[ok], slot[ok]] = fp[pend][order][ok]
            self.count += int(ok.sum())
            pend = pend[order][~ok]
        if pend.size:
            rng = np.random.default_rng(int(self.seed & _U64(0xFFFF)))
            for k in pend:
                self._insert_one(int(fp[k]), int(i1[k]), int(i2[k]), rng)

    def _insert_one(self, fp: int, i1: int, i2: int, rng) -> None:
        for i in (i1, i2):
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = fp
                self.count += 1
                return
        # evict loop
        i = i1 if rng.integers(2) else i2
        for _ in range(_MAX_KICKS):
            slot = int(rng.integers(4))
            fp, self.table[i, slot] = int(self.table[i, slot]), fp
            with np.errstate(over="ignore"):
                fph = (_U64(fp) * _U64(0x5BD1E9955BD1E995)) ^ self.seed
            i = int((_U64(i) ^ fph) & self.mask)
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = fp
                self.count += 1
                return
        self.overflowed = True  # degraded: caller should resize; flagged

    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, capacity: int, seed: int = 99) -> "CuckooFilter":
        cf = cls(capacity, seed)
        cf.table = np.frombuffer(data, dtype=np.uint16).reshape(cf.num_buckets, 4).copy()
        cf.count = int((cf.table != 0).sum())
        return cf


class _ExactSet:
    """Exact uint64 key set as sorted-base array + small pending chunks —
    membership and insert are fully vectorized (searchsorted + np.isin);
    the previous Python ``set`` cost a per-key interpreter loop."""

    __slots__ = ("base", "pending", "pending_n")
    _MERGE_AT = 1 << 16

    def __init__(self, keys: np.ndarray | None = None):
        self.base = (np.sort(np.asarray(keys, dtype=_U64))
                     if keys is not None and len(keys)
                     else np.empty(0, dtype=_U64))
        self.pending: list[np.ndarray] = []
        self.pending_n = 0

    def contains(self, keys: np.ndarray) -> np.ndarray:
        out = np.zeros(len(keys), dtype=bool)
        if self.base.size:
            idx = np.searchsorted(self.base, keys)
            valid = idx < self.base.size
            out[valid] = self.base[idx[valid]] == keys[valid]
        if self.pending_n:
            pend = (self.pending[0] if len(self.pending) == 1
                    else np.concatenate(self.pending))
            out |= np.isin(keys, pend)
        return out

    def add_new(self, keys: np.ndarray) -> None:
        """Add keys the caller knows are unique and not yet present."""
        if len(keys) == 0:
            return
        self.pending.append(np.asarray(keys, dtype=_U64))
        self.pending_n += len(keys)
        if self.pending_n >= self._MERGE_AT:
            self.base = np.sort(np.concatenate([self.base, *self.pending]))
            self.pending = []
            self.pending_n = 0

    def __len__(self) -> int:
        return int(self.base.size) + self.pending_n

    def to_sorted(self) -> np.ndarray:
        if not self.pending:
            return self.base
        return np.sort(np.concatenate([self.base, *self.pending]))


class SeenPartition:
    """One hash(surt)%K shard of the URL-seen set.

    Besides the plain ``check_and_add`` batch API, the partition acts as the
    in-generation dedup point (SURVEY §2.7 D1): because candidate links are
    hash(dst_surt)-routed here, ALL duplicates of a surt land in the same
    partition — so the winner-per-surt groupby needs no Ray Data sort
    shuffle. Stages buffer candidates via ``accept_candidates`` (idempotent
    under task replay: duplicates collapse at finalize); the driver calls
    ``finalize_gen`` once per generation, which picks the deterministic
    winner per surt (min (priority, src_surt, kind) — 'first add_url wins'
    under generation order), seen-gates the winners, and pushes survivors
    straight to the hash(host)-sharded frontier actors.
    """

    def __init__(self, part: int, capacity: int = 1 << 16, exact: bool = True):
        self.part = part
        self.capacity = capacity
        self.exact = exact
        self.shadow = _ExactSet()
        self.cuckoo = CuckooFilter(capacity)
        self._cand: list[pa.Table] = []

    # -- in-generation candidate flow (dedup + seen gate) --------------------

    def accept_candidates(self, links: pa.Table) -> int:
        """Buffer candidate link rows (dst_surt, dst_url, dst_host, priority,
        depth, src_surt, kind) for the current generation."""
        self._cand.append(links)
        return links.num_rows

    def finalize_local(self, seed: int) -> dict:
        """Dedup buffered candidates (winner = min (priority, src_surt, kind)
        per dst_surt — vectorized via ``winner_indices``), seen-gate the
        winners, return survivor frontier rows as an Arrow table for the
        host-partition shuffle (done by the hosting ShardHost). The surt
        hash is computed ONCE and reused for grouping, the seen gate and the
        rand tiebreak (rand_for_surt == splitmix64(hash64(surt) ^
        splitmix64(seed)))."""
        import pyarrow.compute as pc

        from cocrawler_ray.hashing import hash64, splitmix64
        from cocrawler_ray.stages.process import winner_indices

        if not self._cand:
            return {"candidates": 0, "new": 0, "rows": None}
        t = (pa.concat_tables(self._cand).combine_chunks()
             if len(self._cand) > 1 else self._cand[0].combine_chunks())
        self._cand.clear()
        n_cand = t.num_rows
        h = hash64(t.column("dst_surt").to_pylist())
        uniq_h, winner = winner_indices(t, h)
        fresh = self._check_and_add_unique(uniq_h)
        sel = winner[fresh]
        n_new = int(sel.size)
        if n_new == 0:
            return {"candidates": n_cand, "new": 0, "rows": None}
        w = t.take(pa.array(sel, pa.int64()))
        s = splitmix64(np.array([seed], dtype=_U64))[0]
        rand = splitmix64(uniq_h[fresh] ^ s)
        rows = pa.table({
            "surt": w.column("dst_surt"),
            "url": w.column("dst_url"),
            "host": w.column("dst_host"),
            "priority": pc.cast(w.column("priority"), pa.int32()),
            "rand": pa.array(rand, pa.uint64()),
            "depth": pc.cast(w.column("depth"), pa.int32()),
            "retries": pa.array(np.zeros(n_new, dtype=np.int32)),
            "seed_id": pa.array(np.full(n_new, -1, dtype=np.int64)),
        })
        return {"candidates": n_cand, "new": n_new, "rows": rows}

    def check_and_add(self, keys: np.ndarray) -> np.ndarray:
        """uint64 surt-hashes -> bool mask of NEW keys (first occurrence wins,
        in array order). Adds all new keys. Fully vectorized: in-batch
        first-occurrence via np.unique, membership via the sorted-array
        shadow (exact) or the cuckoo filter (scale path, FPs drop URLs at
        ~2^-14 rate)."""
        keys = np.asarray(keys, dtype=_U64)
        new = np.zeros(len(keys), dtype=bool)
        if len(keys) == 0:
            return new
        uniq, first_idx = np.unique(keys, return_index=True)
        fresh = self._check_and_add_unique(uniq)
        new[first_idx[fresh]] = True
        return new

    def _check_and_add_unique(self, keys: np.ndarray) -> np.ndarray:
        """check_and_add fast path for keys already unique within the batch."""
        if self.exact:
            fresh = ~self.shadow.contains(keys)
            self.shadow.add_new(keys[fresh])
        else:
            fresh = ~self.cuckoo.contains_batch(keys)
        self.cuckoo.insert_batch(keys[fresh])
        return fresh

    def contains(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=_U64)
        if self.exact:
            return self.shadow.contains(keys)
        return self.cuckoo.contains_batch(keys)

    def size(self) -> int:
        return len(self.shadow) if self.exact else self.cuckoo.count

    def false_positive_count(self, probe_keys: np.ndarray) -> int:
        """Cuckoo-vs-shadow reconciliation for conformance tests."""
        maybe = self.cuckoo.contains_batch(np.asarray(probe_keys, dtype=_U64))
        truth = self.contains(probe_keys)
        return int((maybe & ~truth).sum())

    # -- checkpoint ---------------------------------------------------------

    def snapshot(self) -> pa.Table:
        keys = self.shadow.to_sorted()
        return pa.table({
            "surt_hash": pa.array(keys, pa.uint64()),
            "part": pa.array(np.full(len(keys), self.part, dtype=np.int32)),
        })

    def restore(self, table: pa.Table) -> None:
        keys = table.column("surt_hash").to_numpy(zero_copy_only=False).astype(_U64)
        self.shadow = _ExactSet(keys)
        self.cuckoo = CuckooFilter(self.capacity)
        self.cuckoo.insert_batch(keys)

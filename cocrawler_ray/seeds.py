"""Seed-list expansion (SURVEY.md §2.1 S1; cocrawler/seeds.py::expand_seeds).

Input: text, one URL per line; ``#`` comment lines and blank lines skipped.
Schemeless entries get ``http://`` prepended. Seeds enter the frontier at
priority 1 with a seed ridealong (here: seed_id + depth 0).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from cocrawler_ray import urls
from cocrawler_ray.hashing import rand_for_surt


def parse_seed_lines(lines) -> list[str]:
    """Filter comments/blanks and add a default scheme; preserves order."""
    out: list[str] = []
    for line in lines:
        s = line.strip()
        if not s or s.startswith("#"):
            continue
        if "://" not in s:
            s = "http://" + s
        out.append(s)
    return out


def expand_seeds_batch(batch: pa.Table, seed: int = 42, id_offset: int = 0) -> pa.Table:
    """map_batches fn: text lines -> frontier-schema rows (priority 1, depth 0).

    Invalid seeds (bad scheme/host after canonicalization) are dropped, as
    cocrawler rejects them at add_url time.
    """
    lines = batch.column(batch.column_names[0]).to_pylist()
    expanded = parse_seed_lines(lines)
    res = urls.canonicalize_batch(expanded)
    keep = res["valid"]
    surts = res["surt"][keep]
    rand = rand_for_surt(surts, seed=seed)
    n = int(keep.sum())
    return pa.table(
        {
            "surt": pa.array(surts, type=pa.string()),
            "url": pa.array(res["url"][keep], type=pa.string()),
            "host": pa.array(res["host"][keep], type=pa.string()),
            "priority": pa.array(np.full(n, 1, dtype=np.int32)),
            "rand": pa.array(rand, type=pa.uint64()),
            "depth": pa.array(np.zeros(n, dtype=np.int32)),
            "retries": pa.array(np.zeros(n, dtype=np.int32)),
            "seed_id": pa.array(np.arange(id_offset, id_offset + n, dtype=np.int64)),
            "gen": pa.array(np.zeros(n, dtype=np.int32)),
            "part": pa.array(np.zeros(n, dtype=np.int32)),
        }
    )

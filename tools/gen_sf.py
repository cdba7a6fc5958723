"""Scale-up generator for scale-stress runs (sf0.1 -> sf1 and beyond).

Replicates a driver-generated sf directory FACTOR times with
per-entity key offsets so every foreign-key relationship stays
consistent across copies (copy i's orders reference copy i's
customers, etc.).  Fixed-size dimensions (region, nation) are copied
once.  Document text gets a per-copy suffix token so exact-dedup
selectivity stays realistic while the 10 copies of each document
remain a near-dup cluster — a deliberate skew stress for the
MinHash/SimHash banding paths.  Events keep their timestamp window
(same stream period, 10x the event density) but user/event ids shift.

Events copies are shifted in TIME (each copy lands one whole stream
span later) instead of densified: a 10x corpus is a 10x-longer event
stream, not 10x the events per second — keeping the window fixed
makes every interval/as-of/window join quadratically denser, which
measures the synthetic artifact rather than the engine (observed:
q_range_join 0.98 s -> 87 s, 192M output rows, on a densified sf1).

For the same reason, supplier.s_acctbal and events.value shift
together by one shared per-copy delta (the union of both value
domains, + slack): copy i's events land only in copy i's account-
balance bands, so interval-join DENSITY stays constant and output
scales 10x, not 100x. The shift preserves intra-copy structure
(z-scores, percentiles, band joins are translation-covariant), and
oracles stay exact because DuckDB reads the same shifted files.

Deterministic: output depends only on (src, factor).  Usage:

    python tools/gen_sf.py /root/testdata/sf0.1 /tmp/sf1 10
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# entity -> the key columns (table, column) that must share one stride
ENTITIES = {
    "cust": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "ord": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "part": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "supp": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "event": [("events", "event_id")],
    "user": [("events", "user_id")],
    "doc": [("documents", "doc_id")],
    "vec": [("embeddings", "vec_id")],
}

COPY_ONCE = {"region", "nation"}

# columns that join by VALUE CONTAINMENT (range/band joins): shift them
# by one shared per-copy delta so band density stays constant (see
# module docstring)
VALUE_SHIFT = [("supplier", "s_acctbal"), ("events", "value")]

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _strides(tabs: dict[str, pa.Table]) -> dict[tuple[str, str], int]:
    """One stride per entity: max over every column that carries the
    entity's key, +1 — so shifted copies never collide and both join
    sides move together."""
    out: dict[tuple[str, str], int] = {}
    for cols in ENTITIES.values():
        mx = 0
        for tab, col in cols:
            mx = max(mx, pc.max(tabs[tab][col]).as_py() or 0)
        for tab, col in cols:
            out[(tab, col)] = mx + 1
    return out


def _value_delta(tabs: dict[str, pa.Table]) -> float:
    """One shared shift step spanning the union of every VALUE_SHIFT
    column's domain (+ slack) — both sides of a band join move together."""
    lo = min(pc.min(tabs[t][c]).as_py() for t, c in VALUE_SHIFT)
    hi = max(pc.max(tabs[t][c]).as_py() for t, c in VALUE_SHIFT)
    return float(hi - lo) + 500.0


def scale_table(name: str, t: pa.Table, factor: int,
                strides: dict[tuple[str, str], int],
                value_delta: float) -> pa.Table:
    if name in COPY_ONCE or factor <= 1:
        return t
    copies = []
    for i in range(factor):
        c = t
        for j, col in enumerate(c.column_names):
            stride = strides.get((name, col))
            if stride is not None and i > 0:
                shifted = pc.add(c[col], pa.scalar(i * stride, c[col].type))
                c = c.set_column(j, col, shifted)
            if (name, col) in VALUE_SHIFT and i > 0:
                shifted = pc.add(c[col],
                                 pa.scalar(i * value_delta, c[col].type))
                c = c.set_column(j, col, shifted)
        if name == "events" and i > 0:
            # copy i starts one span after copy i-1 ends: constant
            # event density, 10x stream length
            ts = c["ts"]
            lo_us = pc.min(t["ts"]).cast(pa.int64()).as_py()
            hi_us = pc.max(t["ts"]).cast(pa.int64()).as_py()
            span = (hi_us - lo_us) + 3_600_000_000  # +1 h gap
            shifted = pc.add(ts.cast(pa.int64()),
                             pa.scalar(i * span, pa.int64()))
            c = c.set_column(c.column_names.index("ts"), "ts",
                             shifted.cast(pa.timestamp("us")))
        if name == "documents" and i > 0:
            # per-copy suffix: copies stay a near-dup cluster (high
            # Jaccard) but are no longer byte-identical
            txt = pc.binary_join_element_wise(
                c["text"], pa.scalar(f" rep{i:02d}"), "")
            c = c.set_column(c.column_names.index("text"), "text", txt)
            c = c.set_column(c.column_names.index("n_chars"), "n_chars",
                             pc.cast(pc.utf8_length(txt), pa.int64()))
        copies.append(c)
    return pa.concat_tables(copies)


def main() -> int:
    src, dest = sys.argv[1], sys.argv[2]
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dest, exist_ok=True)
    tabs = {n: pq.read_table(os.path.join(src, f"{n}.parquet"))
            for n in TABLES}
    strides = _strides(tabs)
    vdelta = _value_delta(tabs)
    for n in TABLES:
        out = scale_table(n, tabs[n], factor, strides, vdelta)
        # ~128k-row row groups so downstream reads split into blocks
        pq.write_table(out, os.path.join(dest, f"{n}.parquet"),
                       row_group_size=131072)
        print(f"{n}: {tabs[n].num_rows} -> {out.num_rows}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Lance-backed partitioned storage (SURVEY §1.2, §7.1) with a Parquet
fallback.

Every table is written as partitioned cells with the exact schemas from
schemas.py — the layout (`root/{table}/gen={g}/part={p}.<ext>` + a manifest
of completed partitions) is what "resumable from checkpoint with
per-partition lineage" means for a batch pipeline: a rerun lists the
manifest and skips finished (gen, part) cells.

The cell codec is dispatched at import: when the ``lance`` package is
importable each cell is a Lance dataset directory
(``lance.write_dataset`` / ``lance.dataset(...).to_table``); otherwise —
including this sandbox, where lance is not installed — cells are zstd
Parquet files. The layout, schemas, manifest and every caller are
format-agnostic; parquet-cell writes are atomic (temp file + rename), lance
cells are atomic by the format's own manifest commit.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

from cocrawler_ray import schemas

try:  # optional Lance codec — the north-star table format
    import lance as _lance
except ImportError:  # sandbox: fall back to Parquet cells
    _lance = None

CELL_FORMAT = "lance" if _lance is not None else "parquet"
_EXT = ".lance" if _lance is not None else ".parquet"


def _write_cell_file(t: pa.Table, tmp_name: str, path: Path) -> None:
    if _lance is not None:
        _lance.write_dataset(t, str(path), mode="overwrite")
    else:
        tmp = path.with_suffix(tmp_name)
        pq.write_table(t, tmp, compression="zstd")
        os.replace(tmp, path)


def _read_cell_file(path: Path, columns: list[str] | None = None) -> pa.Table:
    if _lance is not None:
        ds = _lance.dataset(str(path))
        return ds.to_table(columns=columns)
    return pq.read_table(path, columns=columns)


class Storage:
    def __init__(self, root: str | os.PathLike):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    # -- partitioned table cells -------------------------------------------

    def cell_path(self, table: str, gen: int, part: int) -> Path:
        return self.root / table / f"gen={gen:05d}" / f"part={part:05d}{_EXT}"

    def write_cell(self, t: pa.Table, table: str, gen: int, part: int,
                   validate: bool = True) -> str:
        if validate and table in schemas.ALL_SCHEMAS:
            t = schemas.validate(t, table)
        path = self.cell_path(table, gen, part)
        path.parent.mkdir(parents=True, exist_ok=True)
        _write_cell_file(t, ".tmp", path)
        return str(path)

    def write_cell_named(self, t: pa.Table, table: str, gen: int, name: str) -> str:
        """Write a cell with a caller-chosen (content-keyed) file name —
        used by parallel stage tasks so replays overwrite idempotently."""
        path = self.root / table / f"gen={gen:05d}" / f"{name}{_EXT}"
        path.parent.mkdir(parents=True, exist_ok=True)
        _write_cell_file(t, f".{os.getpid()}.tmp", path)
        return str(path)

    def read_cell(self, table: str, gen: int, part: int) -> pa.Table:
        return _read_cell_file(self.cell_path(table, gen, part))

    def cell_exists(self, table: str, gen: int, part: int) -> bool:
        return self.cell_path(table, gen, part).exists()

    def read_table(self, table: str, columns: list[str] | None = None) -> pa.Table:
        """Read all cells of a table (small tables / tests only)."""
        files = sorted((self.root / table).rglob(f"*{_EXT}"))
        if not files:
            sch = schemas.ALL_SCHEMAS.get(table)
            return sch.empty_table() if sch is not None else pa.table({})
        tabs = [_read_cell_file(f, columns=columns) for f in files]
        return pa.concat_tables(tabs, promote_options="default")

    def table_files(self, table: str) -> list[str]:
        return [str(f) for f in sorted((self.root / table).rglob(f"*{_EXT}"))]

    # -- manifest / lineage -------------------------------------------------

    def manifest_path(self) -> Path:
        return self.root / "MANIFEST.jsonl"

    def append_manifest(self, rec: dict) -> None:
        with open(self.manifest_path(), "a") as f:
            f.write(json.dumps(rec, sort_keys=True) + "\n")

    def read_manifest(self) -> list[dict]:
        p = self.manifest_path()
        if not p.exists():
            return []
        with open(p) as f:
            return [json.loads(line) for line in f if line.strip()]

    def completed_generations(self, num_parts: int) -> list[int]:
        """Generations whose checkpoint has all `num_parts` partitions present
        for both frontier and seen state (the all-partitions-present rule)."""
        recs = self.read_manifest()
        by_gen: dict[int, set[tuple[str, int]]] = {}
        for r in recs:
            if r.get("kind") == "checkpoint":
                by_gen.setdefault(r["gen"], set()).add((r["table"], r["part"]))
        done = []
        for g, cells in sorted(by_gen.items()):
            need = {(t, p) for t in ("frontier_ckpt", "seen_ckpt") for p in range(num_parts)}
            if need <= cells:
                done.append(g)
        return done


def read_ray_dataset(files: list[str], columns: list[str] | None = None):
    """Format-agnostic Ray Data reader over storage cell paths (the
    streaming counterpart of ``Storage.read_table``): Parquet cells read as
    one ``read_parquet`` over all files; Lance cells are one dataset each,
    unioned lazily."""
    import ray.data as rd
    if _lance is not None:
        dss = [rd.read_lance(f, columns=columns) for f in files]
        out = dss[0]
        for d in dss[1:]:
            out = out.union(d)
        return out
    # size the split by actual rows (queries.read doc: Ray's default
    # parallelism shatters small cell files into near-empty blocks and
    # every downstream stage pays per-block fixed costs)
    import pyarrow.parquet as pq
    import ray
    rows = sum(pq.read_metadata(f).num_rows for f in files)
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    blocks = max(len(files), min(2 * cpus, rows // 32_000 + 1))
    return rd.read_parquet(files, columns=columns, override_num_blocks=blocks)

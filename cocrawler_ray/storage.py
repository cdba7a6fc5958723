"""Lance-shaped storage shim over Parquet (SURVEY §1.2, §7.1).

lance/pylance is not installed in this sandbox, so every table is written
as partitioned Parquet with the exact schemas from schemas.py — the layout
(`root/{table}/gen={g}/part={p}.parquet` + a manifest of completed
partitions) is what "resumable from checkpoint with per-partition lineage"
means for a batch pipeline: a rerun lists the manifest and skips finished
(gen, part) cells. Swap `_write_file/_read_file` for lance when available.

Writes are atomic: temp file + rename.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

from cocrawler_ray import schemas


class Storage:
    def __init__(self, root: str | os.PathLike):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    # -- partitioned table cells -------------------------------------------

    def cell_path(self, table: str, gen: int, part: int) -> Path:
        return self.root / table / f"gen={gen:05d}" / f"part={part:05d}.parquet"

    def write_cell(self, t: pa.Table, table: str, gen: int, part: int,
                   validate: bool = True) -> str:
        if validate and table in schemas.ALL_SCHEMAS:
            t = schemas.validate(t, table)
        path = self.cell_path(table, gen, part)
        path.parent.mkdir(parents=True, exist_ok=True)
        tmp = path.with_suffix(".tmp")
        pq.write_table(t, tmp, compression="zstd")
        os.replace(tmp, path)
        return str(path)

    def write_cell_named(self, t: pa.Table, table: str, gen: int, name: str) -> str:
        """Write a cell with a caller-chosen (content-keyed) file name —
        used by parallel stage tasks so replays overwrite idempotently."""
        path = self.root / table / f"gen={gen:05d}" / f"{name}.parquet"
        path.parent.mkdir(parents=True, exist_ok=True)
        tmp = path.with_suffix(f".{os.getpid()}.tmp")
        pq.write_table(t, tmp, compression="zstd")
        os.replace(tmp, path)
        return str(path)

    def read_cell(self, table: str, gen: int, part: int) -> pa.Table:
        return pq.read_table(self.cell_path(table, gen, part))

    def cell_exists(self, table: str, gen: int, part: int) -> bool:
        return self.cell_path(table, gen, part).exists()

    def read_table(self, table: str, columns: list[str] | None = None) -> pa.Table:
        """Read all cells of a table (small tables / tests only)."""
        files = sorted((self.root / table).rglob("*.parquet"))
        if not files:
            sch = schemas.ALL_SCHEMAS.get(table)
            return sch.empty_table() if sch is not None else pa.table({})
        tabs = [pq.read_table(f, columns=columns) for f in files]
        return pa.concat_tables(tabs, promote_options="default")

    def table_files(self, table: str) -> list[str]:
        return [str(f) for f in sorted((self.root / table).rglob("*.parquet"))]

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

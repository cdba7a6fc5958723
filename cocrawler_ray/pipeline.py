"""User-extension surface: the PipelineStep protocol (SURVEY §2.10).

The reference's extension points are a YAML config tree, the per-URL
``ridealong`` payload dict, and configurable grep facets
(cocrawler/config.py, crawl.py argparse). Our engine-side analogue is a
typed step protocol so user pipelines are PLAIN LISTS of steps over a
``ray.data.Dataset`` — each step declares the columns it requires,
adds, and removes, and ``run_pipeline`` validates the whole chain
DECLARATIVELY before anything executes (a mis-wired pipeline fails in
milliseconds on the driver, not an hour into a 100 TB scan; the lazy
Dataset is never forced just to discover a missing column).

UDF hooks stay plain ``map_batches`` callables — ``MapBatchesStep``
lifts any batch function (or stateful actor-pool class) into a step.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Protocol, runtime_checkable

import ray.data as rd


@runtime_checkable
class PipelineStep(Protocol):
    """A named, schema-declared transform over a Dataset."""

    name: str

    def requires(self) -> set[str]:
        """Columns that must exist before this step runs."""

    def provides(self) -> set[str]:
        """Columns guaranteed present after this step runs."""

    def removes(self) -> set[str]:
        """Columns this step drops (subset of the incoming set)."""

    def apply(self, ds: rd.Dataset) -> rd.Dataset:
        """The transform itself — must stay lazy (no materialize)."""


class StepValidationError(ValueError):
    """A step's requires() is not satisfiable at its chain position."""


def validate_pipeline(input_columns: set[str],
                      steps: list) -> set[str]:
    """Thread the declared column set through the chain; raise with the
    failing step name and the missing columns. Returns the declared
    output column set (what the final Dataset is guaranteed to carry)."""
    cols = set(input_columns)
    for s in steps:
        missing = set(s.requires()) - cols
        if missing:
            raise StepValidationError(
                f"step {s.name!r} requires columns {sorted(missing)} "
                f"not present at its position (have {sorted(cols)})")
        if getattr(s, "projection", False):
            # a projection REPLACES the column set — anything not in
            # provides() is gone, so downstream requires() against it
            # must fail here, not an hour into the scan
            cols = set(s.provides())
        else:
            cols = (cols - set(s.removes())) | set(s.provides())
    return cols


def run_pipeline(ds: rd.Dataset, steps: list) -> rd.Dataset:
    """Validate the chain against the Dataset's input schema, then fold
    the steps left to right. Validation reads ONLY parquet/Arrow
    metadata (Dataset.schema() on a fresh read is a metadata fetch) —
    the pipeline stays lazy end to end."""
    validate_pipeline(set(ds.schema().names), steps)
    for s in steps:
        ds = s.apply(ds)
    return ds


@dataclass
class MapBatchesStep:
    """Lift any map_batches callable (function or stateful actor-pool
    class) into a PipelineStep. ``fn_kwargs``/``map_kwargs`` pass
    through to Dataset.map_batches (batch_format defaults to pyarrow —
    the zero-copy path)."""

    name: str
    fn: Callable
    _requires: set[str] = field(default_factory=set)
    _provides: set[str] = field(default_factory=set)
    _removes: set[str] = field(default_factory=set)
    batch_format: str = "pyarrow"
    map_kwargs: dict = field(default_factory=dict)

    def requires(self) -> set[str]:
        return self._requires

    def provides(self) -> set[str]:
        return self._provides

    def removes(self) -> set[str]:
        return self._removes

    def apply(self, ds: rd.Dataset) -> rd.Dataset:
        return ds.map_batches(self.fn, batch_format=self.batch_format,
                              **self.map_kwargs)


@dataclass
class SelectStep:
    """Column projection as a step — prunes everything not selected.
    ``projection = True`` tells the validator the column set is
    REPLACED by provides(), so a downstream step requiring a dropped
    column fails validation instead of failing mid-scan."""

    columns: list[str]
    name: str = "select"
    projection: bool = True

    def requires(self) -> set[str]:
        return set(self.columns)

    def provides(self) -> set[str]:
        return set(self.columns)

    def removes(self) -> set[str]:
        return set()

    def apply(self, ds: rd.Dataset) -> rd.Dataset:
        cols = list(self.columns)
        return ds.map_batches(lambda t: t.select(cols),
                              batch_format="pyarrow")


@dataclass
class FilterStep:
    """Row filter from a batch-level boolean mask function
    ``mask_fn(table) -> pyarrow.BooleanArray`` — stays vectorized."""

    name: str
    mask_fn: Callable
    _requires: set[str] = field(default_factory=set)

    def requires(self) -> set[str]:
        return self._requires

    def provides(self) -> set[str]:
        return set()

    def removes(self) -> set[str]:
        return set()

    def apply(self, ds: rd.Dataset) -> rd.Dataset:
        fn = self.mask_fn
        return ds.map_batches(lambda t: t.filter(fn(t)),
                              batch_format="pyarrow")

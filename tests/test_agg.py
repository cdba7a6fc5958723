"""partial_groupby_agg: driver-combine vs distributed-combine equivalence.

The distributed path (ADVICE r1: high-cardinality keys must not combine
partials on the driver) has to produce the exact same result as the
small-domain driver combine for every supported agg kind.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from cocrawler_ray.stages.agg import partial_groupby_agg


def _norm(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
    return (df.sort_values(keys).reset_index(drop=True)
            .reindex(sorted(df.columns), axis=1))


@pytest.fixture(scope="module")
def events_ds(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    n = 5000
    df = pd.DataFrame({
        "k": rng.integers(0, 400, n),          # 400 groups across 8 blocks
        "v": rng.normal(10.0, 3.0, n).round(4),
    })
    return rd.from_pandas(df).repartition(8), df


def test_distributed_combine_matches_driver(events_ds):
    ds, _ = events_ds
    aggs = {"n": (None, "count"), "s": ("v", "sum"), "mn": ("v", "min"),
            "mx": ("v", "max"), "avg": ("v", "mean")}
    a = _norm(partial_groupby_agg(ds, ["k"], aggs), ["k"])
    b = _norm(partial_groupby_agg(ds, ["k"], aggs, distributed=True), ["k"])
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b) == 400
    for c in a.columns:
        np.testing.assert_allclose(a[c].to_numpy(float), b[c].to_numpy(float),
                                   rtol=1e-12)
    assert b["n"].dtype == np.int64


def test_distributed_combine_matches_pandas_groundtruth(events_ds):
    ds, df = events_ds
    got = _norm(partial_groupby_agg(
        ds, ["k"], {"n": (None, "count"), "avg": ("v", "mean")},
        distributed=True), ["k"])
    want = (df.groupby("k").agg(n=("v", "size"), avg=("v", "mean"))
            .reset_index())
    want = _norm(want, ["k"])
    np.testing.assert_array_equal(got["n"].to_numpy(), want["n"].to_numpy())
    np.testing.assert_allclose(got["avg"].to_numpy(), want["avg"].to_numpy(),
                               rtol=1e-12)

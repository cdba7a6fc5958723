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


def test_window_frame_sums_match_pandas(ray_session):
    import numpy as np
    import pandas as pd
    from cocrawler_ray import queries
    df = queries.QUERIES["q_window_frame"]("/root/testdata/sf0.001").to_pandas()
    # pandas rolling ground truth on the quantized values
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])
    from cocrawler_ray.stages.text import round_half_away
    ev["v"] = round_half_away(ev["value"].to_numpy() * 1e6, 0).astype("int64")
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="stable")
    g = ev.groupby("user_id", sort=False)["v"]
    ev["win_sum"] = g.rolling(5, min_periods=1).sum().to_numpy().astype("int64")
    ev["win_n"] = g.rolling(5, min_periods=1).count().to_numpy().astype("int64")
    got = df.sort_values("event_id").reset_index(drop=True)
    want = ev.sort_values("event_id").reset_index(drop=True)
    assert (got["win_sum_micro"].to_numpy() == want["win_sum"].to_numpy()).all()
    assert (got["win_n"].to_numpy() == want["win_n"].to_numpy()).all()


def test_rank_events_tie_semantics(ray_session):
    import numpy as np
    from cocrawler_ray import queries
    df = queries.QUERIES["q_rank_events"]("/root/testdata/sf0.001").to_pandas()
    # rank semantics: within a user, equal v_micro share a rank; the rank
    # equals 1 + number of strictly greater values; dense_rank is the
    # number of distinct >= values
    for uid, grp in df.groupby("user_id"):
        v = grp["v_micro"].to_numpy()
        rnk = grp["rnk"].to_numpy()
        drnk = grp["drnk"].to_numpy()
        for i in range(len(v)):
            assert rnk[i] == 1 + (v > v[i]).sum()
            assert drnk[i] == 1 + len(np.unique(v[v > v[i]]))


def test_mad_outliers_matches_numpy(ray_session):
    import numpy as np
    import pandas as pd
    from cocrawler_ray import queries
    from cocrawler_ray.stages.text import round_half_away
    df = queries.QUERIES["q_mad_outliers"]("/root/testdata/sf0.001").to_pandas()
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet",
                         columns=["user_id", "value"])
    v = round_half_away(ev["value"].to_numpy() * 1e6, 0).astype("int64")
    ev = ev.assign(v=v)
    for uid, grp in ev.groupby("user_id"):
        row = df[df["user_id"] == uid].iloc[0]
        med = np.median(grp["v"].to_numpy().astype(float))
        dev = np.abs(grp["v"].to_numpy().astype(float) - med)
        madv = np.median(dev)
        assert row["n"] == len(grp)
        assert abs(row["med"] - round(med / 1e6, 6)) < 1e-9
        assert abs(row["mad"] - round(madv / 1e6, 6)) < 1e-9
        assert row["n_outliers"] == int((dev > 3.0 * madv).sum())


def test_grouped_winsorized_mean_exact(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cocrawler_ray.stages import agg
    rng = np.random.RandomState(7)
    g = rng.randint(0, 3, 500)
    v = rng.randint(-50, 200, 500).astype(np.int64)
    ds = rd.from_pandas(pd.DataFrame({"g": g, "v": v})).repartition(6)
    out = (agg.grouped_winsorized_mean(ds, ["g"], "v", 10, 90)
           .set_index("g").sort_index())
    for k in range(3):
        vals = np.sort(v[g == k])
        n = len(vals)
        lo = vals[(n - 1) * 10 // 100]
        hi = vals[(n - 1) * 90 // 100]
        assert out.loc[k, "lo_micro"] == lo
        assert out.loc[k, "hi_micro"] == hi
        assert out.loc[k, "n"] == n
        assert out.loc[k, "wsum_micro"] == int(np.clip(vals, lo, hi).sum())


def test_grouped_winsorized_mean_ties_and_tiny_group(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cocrawler_ray.stages import agg
    # all-equal group: bounds collapse to the value, sum = n*value;
    # single-row group: rank formulas hit index 0 on both sides
    df = pd.DataFrame({"g": ["a"] * 9 + ["b"],
                       "v": np.array([7] * 9 + [42], np.int64)})
    out = (agg.grouped_winsorized_mean(rd.from_pandas(df).repartition(3),
                                       ["g"], "v").set_index("g"))
    assert (out.loc["a", "lo_micro"], out.loc["a", "hi_micro"]) == (7, 7)
    assert out.loc["a", "wsum_micro"] == 63
    assert (out.loc["b", "n"], out.loc["b", "wsum_micro"]) == (1, 42)

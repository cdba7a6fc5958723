"""Edge-case units for the fifth-session operators — cases the
conformance fixtures may not exercise: empty masks, flat frames,
single-event entities, user-boundary carries. Stage classes are plain
callables over Arrow tables, so no Ray session is needed here."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from cocrawler_ray import codecs


def _img_batch(imgs: list[np.ndarray], fmt: str = "raw16") -> pa.Table:
    return pa.table({
        "image_id": pa.array([f"t{i:04d}" for i in range(len(imgs))]),
        "bytes": pa.array([codecs.encode(im, fmt) for im in imgs],
                          pa.binary()),
        "w": pa.array(np.array([im.shape[1] for im in imgs], np.int32)),
        "h": pa.array(np.array([im.shape[0] for im in imgs], np.int32)),
        "fmt": pa.array([fmt] * len(imgs)),
    })


def test_blob_count_geometry_and_empty_mask():
    from cocrawler_ray.stages.multimodal import BlobCount
    black = np.zeros((16, 16, 3), np.uint8)          # no foreground -> no row
    two = np.zeros((16, 16, 3), np.uint8)            # two separated squares
    two[2:5, 2:5] = 255
    two[10:14, 10:13] = 255
    ell = np.zeros((16, 16, 3), np.uint8)            # one L-shaped blob
    ell[2:4, 2:10] = 255
    ell[2:10, 2:4] = 255
    out = BlobCount(threshold=640)(_img_batch([black, two, ell]))
    ids = out.column("image_id").to_pylist()
    assert ids == ["t0001", "t0002"]                 # all-black emits no row
    assert out.column("n_blobs").to_pylist() == [2, 1]
    assert out.column("n_fg").to_pylist() == [9 + 12, 16 + 16 - 4]


def test_rle_runs_flat_and_striped():
    from cocrawler_ray.stages.multimodal import RleRuns
    flat = np.zeros((16, 16, 3), np.uint8)           # one run per row
    stripe = np.zeros((16, 16, 3), np.uint8)         # alternate columns
    stripe[:, 1::2] = 255
    out = RleRuns(threshold=380)(_img_batch([flat, stripe]))
    assert out.column("n_runs").to_pylist() == [16, 16 * 16]
    assert out.column("rle_saves").to_pylist() == [True, False]


def test_haar_energy_constant_and_checker():
    from cocrawler_ray.stages.multimodal import HaarDetailEnergy
    const = np.full((16, 16, 3), 100, np.uint8)      # all details zero
    checker = np.zeros((16, 16, 3), np.uint8)        # x-parity checkerboard
    checker[:, 1::2] = 80                            # gray diff 240 per pair
    out = HaarDetailEnergy()(_img_batch([const, checker]))
    assert out.column("e_hh").to_pylist()[0] == 0
    assert out.column("e_lh").to_pylist()[0] == 0
    assert out.column("e_hl").to_pylist()[0] == 0
    # checker: per 2x2 block a=c=0, b=d=240 -> hh=0, lh=0, hl=-480
    n_blocks = 8 * 8
    assert out.column("e_hh").to_pylist()[1] == 0
    assert out.column("e_lh").to_pylist()[1] == 0
    assert out.column("e_hl").to_pylist()[1] == n_blocks * 480 ** 2


def test_orientation_census_vertical_edge():
    from cocrawler_ray.stages.multimodal import OrientationCensus
    img = np.zeros((16, 16, 3), np.uint8)
    img[:, 8:] = 255                                 # hard vertical edge
    out = OrientationCensus(mag_threshold=800)(_img_batch([img]))
    b = [out.column(f"b{k}").to_pylist()[0] for k in range(4)]
    # gradient points +x only (gy == 0 everywhere): quadrant 2*(gx>0)+0
    assert b[1] == b[3] == 0
    assert b[2] > 0 and b[0] == 0                    # edge pixels all gx>0
    # interior edge band: gx nonzero in the two columns flanking x=8
    assert sum(b) == 2 * 14


def test_audio_decimate_phase_and_length():
    from cocrawler_ray.stages.multimodal import AudioDecimate
    v = np.arange(7, dtype=np.uint8) + 100           # odd length
    t = pa.table({"image_id": pa.array(["a"]),
                  "bytes": pa.array([v.tobytes()], pa.binary())})
    out = AudioDecimate()(t)
    kept = v[0::2].astype(np.int64)
    assert out.column("n_out").to_pylist() == [4]
    assert out.column("energy").to_pylist() == [
        int(((kept - 128) ** 2).sum())]
    assert out.column("chk").to_pylist() == [
        int((kept * (1 + np.arange(4))).sum())]


def test_gap_fill_closed_form_single_and_gap(ray_session):
    from cocrawler_ray.queries import QUERIES

    # tiny events table: user 1 has hours 0 and 3 (two empty buckets
    # carrying v=200 cents), user 2 a single event (span 1, no fill)
    df = pd.DataFrame({
        "event_id": [1, 2, 3],
        "ts": pd.to_datetime([0, 3 * 3600 * 1_000_000, 1_000], unit="us"),
        "user_id": [1, 1, 2],
        "event_type": ["view"] * 3,
        "value": [2.0, 9.0, 5.0],
        "props": ["{}"] * 3,
    })
    import os
    import tempfile
    d = tempfile.mkdtemp(prefix="gapfill_")
    df.to_parquet(os.path.join(d, "events.parquet"))
    out = QUERIES["q_gap_fill"](d).to_pandas().sort_values("user_id")
    assert out["n_buckets"].tolist() == [4, 1]
    assert out["n_filled"].tolist() == [2, 0]
    assert out["filled_sum"].tolist() == [2 * 200, 0]


def test_selfjoin_size_exact(ray_session):
    from cocrawler_ray.queries import QUERIES
    out = QUERIES["q_selfjoin_size"]("/root/testdata/sf0.001")
    import duckdb
    f2, mx, n, k = duckdb.sql(
        "SELECT sum(c*c), max(c), sum(c), count(*) FROM (SELECT count(*) c "
        "FROM '/root/testdata/sf0.001/events.parquet' GROUP BY user_id)"
    ).fetchone()
    assert out["f2"].iloc[0] == f2
    assert out["max_key"].iloc[0] == mx
    assert out["n_rows"].iloc[0] == n
    assert out["n_keys"].iloc[0] == k


def _events_parquet(tmpdir_prefix: str, rows: dict) -> str:
    import os
    import tempfile
    d = tempfile.mkdtemp(prefix=tmpdir_prefix)
    pd.DataFrame(rows).to_parquet(os.path.join(d, "events.parquet"))
    return d


def test_range_frame_tie_peers(ray_session):
    """SQL RANGE frames include ALL peers of the current timestamp —
    an event sharing its ts must see the other peer in its frame."""
    from cocrawler_ray.queries import QUERIES
    base = 1_000_000_000
    d = _events_parquet("rangefr_", {
        "event_id": [1, 2, 3, 4],
        "ts": pd.to_datetime(
            [base, base, base + 3_600_000_000 + 1, base + 7_200_000_000],
            unit="us"),
        "user_id": [1, 1, 1, 1],
        "event_type": ["view"] * 4,
        "value": [1.0, 2.0, 4.0, 8.0],
        "props": ["{}"] * 4,
    })
    out = (QUERIES["q_range_frame"](d).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    # events 1,2 share ts: each sees BOTH (peer rule) -> sum 3e6, n 2
    assert out["w_sum"].tolist() == [3_000_000, 3_000_000,
                                     4_000_000, 12_000_000]
    assert out["w_n"].tolist() == [2, 2, 1, 2]


def test_attribution_first_event_conversion_excluded(ray_session):
    """A purchase with no prior touch (user's first event) gets no
    credit row; a prior touch from ANOTHER user must not leak."""
    from cocrawler_ray.queries import QUERIES
    d = _events_parquet("attr_", {
        "event_id": [1, 2, 3],
        "ts": pd.to_datetime([1, 2, 3], unit="us"),
        "user_id": [9, 9, 10],
        "event_type": ["view", "purchase", "purchase"],
        "value": [0.0] * 3,
        "props": ["{}"] * 3,
    })
    out = QUERIES["q_attribution"](d)
    assert out["channel"].tolist() == ["view"]
    assert out["n_conversions"].tolist() == [1]


def test_burstiness_poisson_boundary(ray_session):
    """The Fano test is STRICT (variance > mean): user 1 with one
    event in each of two hours sits exactly at variance == mean
    (h=2, s1=2, s2=2 -> 2*2 - 4 = 0, not > 2) and must read False;
    user 2 with a 5-event burst + a single straggler (h=2, s1=6,
    s2=26 -> 52 - 36 = 16 > 12) must read True."""
    from cocrawler_ray.queries import QUERIES
    HR = 3_600_000_000
    d = _events_parquet("burst_", {
        "event_id": list(range(1, 9)),
        "ts": pd.to_datetime([0, HR, 0, 1, 2, 3, 4, 2 * HR], unit="us"),
        "user_id": [1, 1, 2, 2, 2, 2, 2, 2],
        "event_type": ["view"] * 8,
        "value": [0.0] * 8,
        "props": ["{}"] * 8,
    })
    out = (QUERIES["q_burstiness"](d).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    assert out["bursty"].tolist() == [False, True]
    assert out["n_hours"].tolist() == [2, 2]
    assert out["s2"].tolist() == [2, 26]


def test_interarrival_median_rank(ray_session):
    """Even-count gaps take the LOWER middle (PERCENTILE_DISC rank
    ceil(n/2)), not the interpolated mean."""
    from cocrawler_ray.queries import QUERIES
    # gaps for user 1: 10us, 20us, 40us, 80us -> median = rank 2 = 20
    t = np.cumsum([0, 10, 20, 40, 80])
    d = _events_parquet("gap2_", {
        "event_id": list(range(1, 6)),
        "ts": pd.to_datetime(t, unit="us"),
        "user_id": [1] * 5,
        "event_type": ["view"] * 5,
        "value": [0.0] * 5,
        "props": ["{}"] * 5,
    })
    out = QUERIES["q_interarrival"](d).to_pandas()
    assert out["p50_gap_us"].tolist() == [20]
    assert out["max_gap_us"].tolist() == [80]
    assert out["n_gaps"].tolist() == [4]


def test_gray_gate_pure_gray_and_saturated():
    from cocrawler_ray.stages.multimodal import GrayscaleGate
    gray = np.full((16, 16, 3), 77, np.uint8)        # r == g == b
    red = np.zeros((16, 16, 3), np.uint8)
    red[:, :, 0] = 200                               # spread 200 > 24
    out = GrayscaleGate()(_img_batch([gray, red]))
    assert out.column("n_colorful").to_pylist() == [0, 256]
    assert out.column("grayscalish").to_pylist() == [True, False]

"""Gap-fill resampling: dense per-key grid, forward fill, observed flags."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from certified_dogs_and_cats_spark.operators import resample_ffill


def _df(spark):
    rows = [
        # key "a": events in hours 0, 0 (two in-bucket), 3  -> gaps 1, 2
        ("a", datetime(2024, 1, 1, 0, 10), 1.0),
        ("a", datetime(2024, 1, 1, 0, 50), 2.0),
        ("a", datetime(2024, 1, 1, 3, 5), 9.0),
        # key "b": single event -> single-row grid
        ("b", datetime(2024, 1, 1, 5, 0), 7.0),
    ]
    return spark.createDataFrame(rows, ["k", "ts", "v"])


def test_grid_is_dense_and_forward_filled(spark):
    out = resample_ffill(_df(spark), "k", "ts", "v", step_seconds=3600)
    rows = {
        (r.k, r.bucket_start.hour): (r.value, r.is_observed)
        for r in out.collect()
    }
    # key a: hours 0..3 present, 1 and 2 are carried-forward gaps.
    assert rows[("a", 0)] == (2.0, True)  # latest in-bucket wins
    assert rows[("a", 1)] == (2.0, False)
    assert rows[("a", 2)] == (2.0, False)
    assert rows[("a", 3)] == (9.0, True)
    assert rows[("b", 5)] == (7.0, True)
    assert len(rows) == 5  # no grid beyond each key's span


def test_no_cross_key_leakage(spark):
    out = resample_ffill(_df(spark), "k", "ts", "v", step_seconds=3600)
    b_rows = out.filter(F.col("k") == "b").collect()
    assert len(b_rows) == 1 and b_rows[0].value == 7.0


def test_latest_in_bucket_tie_break_is_deterministic(spark):
    rows = [
        ("x", datetime(2024, 1, 1, 0, 30), 5.0),
        ("x", datetime(2024, 1, 1, 0, 30), 3.0),  # same ts: max value wins
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    out = resample_ffill(df, "k", "ts", "v", step_seconds=3600).collect()
    assert len(out) == 1 and out[0].value == 5.0


def test_interpolate_linear_gap_values(spark):
    """Gap between observed (b=0, v=10.0) and (b=4, v=30.0) interpolates
    at exactly 15/20/25; edges stay observed; is_observed marks gaps."""
    from certified_dogs_and_cats_spark.operators.resample import (
        resample_interpolate,
    )
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base, 10.0),
        (1, base + dt.timedelta(hours=4), 30.0),
    ]
    df = spark.createDataFrame(rows, "k int, ts timestamp, v double")
    out = resample_interpolate(df, "k", "ts", "v", step_seconds=3600)
    got = [
        (r.value, r.is_observed)
        for r in out.orderBy("bucket_start").collect()
    ]
    assert got == [
        (10.0, True),
        (15.0, False),
        (20.0, False),
        (25.0, False),
        (30.0, True),
    ]


def test_interpolate_null_valued_observed_bucket_is_not_an_anchor(spark):
    """A bucket whose only event carries a NULL value must neither anchor
    the slope nor keep NULL: observed (b0, 0.0), (b2, NULL), (b4, 4.0)
    interpolates b1=1.0, b2=2.0, b3=3.0 — the NULL observation fills
    like pandas NaN, and the b3 slope uses the b0/b4 anchors, never the
    NULL bucket's position."""
    from certified_dogs_and_cats_spark.operators.resample import (
        resample_interpolate,
    )
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base, 0.0),
        (1, base + dt.timedelta(hours=2), None),
        (1, base + dt.timedelta(hours=4), 4.0),
    ]
    df = spark.createDataFrame(rows, "k int, ts timestamp, v double")
    out = resample_interpolate(df, "k", "ts", "v", step_seconds=3600)
    got = [
        (r.value, r.is_observed)
        for r in out.orderBy("bucket_start").collect()
    ]
    assert got == [
        (0.0, True),
        (1.0, False),
        (2.0, True),   # observed event, value interpolated over the NULL
        (3.0, False),
        (4.0, True),
    ]

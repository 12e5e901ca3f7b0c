"""Time-series resampling: dense per-key time grids with forward fill
or linear interpolation.

The missing-gap problem every metrics/warehouse pipeline hits: events
arrive irregularly, dashboards and joins need one row per (key, bucket)
— including buckets with no event, carrying the last known value.

Plan shape (scale contract): bucketing is a map-side projection; the
last-value-per-bucket reduction is one hash aggregate on (key, bucket);
the grid is an explode of ``sequence(min_bucket, max_bucket)`` per key —
rows materialize at the grid size, never joined against raw events; the
fill is one window pass per key ordered by bucket. Two shuffles total,
both on the key. Grid width is bounded by (span / step) per key — at
100 TB, step and retention bound the blowup, and the per-key window
never sees raw event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _per_bucket_grid(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int,
) -> DataFrame:
    """Shared stage of both resamplers: latest-in-bucket reduction plus
    the dense per-key grid, left-joined — (key, __b, __v, __obs) with
    ``__obs`` NULL on gap rows. One copy so the bucket math and the
    tie-break can never drift between the ffill and interpolate
    variants."""
    step = F.lit(step_seconds)
    # floor, not a truncating cast: pre-1970 timestamps have negative
    # epoch seconds, and truncation toward zero would merge the two
    # buckets either side of the epoch.
    bucket = F.floor(F.unix_timestamp(F.col(ts_col)) / step).cast("bigint")
    per_bucket = (
        df.select(
            F.col(key_col),
            bucket.alias("__b"),
            # In-bucket "latest" ties on (ts, value) take the greater
            # value for determinism.
            F.struct(
                F.col(ts_col).alias("ts"), F.col(value_col).alias("v")
            ).alias("__tv"),
        )
        .groupBy(key_col, "__b")
        .agg(F.max("__tv").alias("__tv"))
        .select(
            key_col,
            "__b",
            F.col("__tv.v").alias("__v"),
            # Presence marker: a bucket whose only event carries a NULL
            # value is still OBSERVED (is_observed must mean "an event
            # happened here", not "the value was non-null").
            F.lit(True).alias("__obs"),
        )
    )
    spans = per_bucket.groupBy(key_col).agg(
        F.min("__b").alias("__lo"), F.max("__b").alias("__hi")
    )
    grid = spans.select(
        F.col(key_col),
        F.explode(F.sequence("__lo", "__hi")).alias("__b"),
    )
    return grid.join(per_bucket, [key_col, "__b"], "left")


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int = 3600,
) -> DataFrame:
    """One row per (key, bucket) from the key's first to last event
    bucket, carrying the latest in-bucket value, forward-filled across
    empty buckets.

    Output: (key, bucket_start TIMESTAMP, value, is_observed BOOLEAN) —
    ``is_observed`` FALSE marks gap rows whose value was carried forward.
    """
    step = F.lit(step_seconds)
    joined = _per_bucket_grid(df, key_col, ts_col, value_col, step_seconds)
    w = (
        Window.partitionBy(key_col)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.col(key_col),
        F.timestamp_seconds(F.col("__b") * step).alias("bucket_start"),
        F.last("__v", ignorenulls=True).over(w).alias("value"),
        F.coalesce(F.col("__obs"), F.lit(False)).alias("is_observed"),
    )


def resample_interpolate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int = 3600,
) -> DataFrame:
    """Like :func:`resample_ffill` but gap values LINEARLY INTERPOLATE
    between the neighboring ANCHOR buckets (pandas
    ``Series.interpolate('linear')`` semantics on a per-key grid):
    ``v = v0 + (v1 - v0) * (b - b0) / (b1 - b0)``.

    An anchor is an observed bucket with a NON-NULL value — a bucket
    whose only events carry NULL values is not an anchor and its value
    interpolates too (exactly pandas: NaN observations are themselves
    filled), though ``is_observed`` stays true for it. Value and bucket
    anchors are taken from the same rows by construction, so a
    NULL-valued observed bucket can never skew a neighboring gap's
    slope. Grid edges hold by span definition at least one observed
    bucket, but if the EDGE bucket's value is NULL there is no anchor on
    that side and the affected rows stay NULL (pandas' leading/trailing
    NaN behavior).

    The interpolation arithmetic is IEEE-exact (+,-,*,/ on doubles and
    integer bucket indices), so results are bit-identical across
    engines and partitionings. One shuffle (the key-wise window sort);
    the backward- and forward-looking frames share it.
    """
    step = F.lit(step_seconds)
    joined = _per_bucket_grid(df, key_col, ts_col, value_col, step_seconds)
    back = (
        Window.partitionBy(key_col)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy(key_col)
        .orderBy("__b")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    v = F.col("__v").cast("double")
    b = F.col("__b").cast("double")
    # Anchor = observed AND non-null value; the bucket anchor uses the
    # SAME predicate as the value anchor so pb/pv (and nb/nv) always
    # come from one row.
    is_anchor = F.col("__obs") & F.col("__v").isNotNull()
    ob = F.when(is_anchor, F.col("__b")).cast("double")
    av = F.when(is_anchor, v)
    pv = F.last(av, ignorenulls=True).over(back)
    pb = F.last(ob, ignorenulls=True).over(back)
    nv = F.first(av, ignorenulls=True).over(fwd)
    nb = F.first(ob, ignorenulls=True).over(fwd)
    interp = pv + (nv - pv) * (b - pb) / (nb - pb)
    return joined.select(
        F.col(key_col),
        F.timestamp_seconds(F.col("__b") * step).alias("bucket_start"),
        F.when(is_anchor, v).otherwise(interp).alias("value"),
        F.coalesce(F.col("__obs"), F.lit(False)).alias("is_observed"),
    )

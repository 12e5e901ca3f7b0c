"""Interval (range) join via time-binning.

Spark turns a bare ``p.ts BETWEEN i.lo AND i.hi`` join into a nested-loop
over every (point, interval) pair — O(N*M), the classic range-join trap.
The scale-correct rewrite: quantize time into fixed-width bins, explode
each interval to the bins it overlaps, bin each point (exactly one bin),
and equi-join on the bin before verifying the exact predicate.

Cost: |intervals| * (span/bin_width) exploded rows + one shuffle keyed on
the bin; each (point, interval) pair meets in exactly the point's bin, so
no post-join dedup is needed. Pick ``bin_width`` on the order of the
typical interval span: too small explodes intervals, too large degrades
back toward all-pairs within a bin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# Join types whose semantics survive the interval explosion: the points
# side is never replicated (each point lands in exactly one bin), so
# point-preserving joins are exact. right/full would emit one unmatched
# copy of an interval PER exploded bin — silently wrong — so they raise.
_VALID_HOW = {"inner", "left", "left_outer", "left_semi", "semi", "left_anti", "anti"}


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    lo_ts: str,
    hi_ts: str,
    bin_width: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row containing it
    (``lo_ts <= point_ts <= hi_ts``), bin-partitioned as described above.

    ``how`` may be any point-preserving join: inner, left (unmatched
    points survive null-extended), left_semi (points inside any interval),
    left_anti (points inside none). The exact BETWEEN predicate is part of
    the join condition — not a post-filter — so outer null-extended rows
    survive. Interval-preserving joins (right/full) are rejected: the
    explosion replicates intervals across bins, which would duplicate
    their unmatched rows.

    Column names must be disjoint between the two inputs (rename first).
    """
    if how not in _VALID_HOW:
        raise ValueError(
            f"interval_join supports point-preserving joins {sorted(_VALID_HOW)}, "
            f"got {how!r}"
        )
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"overlapping column names: {sorted(overlap)}")
    # Interval width in microseconds, derived JVM-side (epoch + interval).
    # timestamp_seconds(0) is the tz-INDEPENDENT epoch: a string literal
    # cast would parse in the session timezone, skewing the width by the
    # zone offset (and dividing by zero outright at UTC+1 with the
    # default 1-hour bins).
    width_us = F.unix_micros(
        F.timestamp_seconds(F.lit(0)) + F.expr(f"INTERVAL {bin_width}")
    )
    p_bin = F.floor(F.unix_micros(F.col(point_ts)) / width_us)
    lo_bin = F.floor(F.unix_micros(F.col(lo_ts)) / width_us)
    hi_bin = F.floor(F.unix_micros(F.col(hi_ts)) / width_us)
    p = points.withColumn("__bin", p_bin)
    i = intervals.withColumn(
        "__bin", F.explode(F.sequence(lo_bin, hi_bin))
    )
    cond = (p["__bin"] == i["__bin"]) & F.col(point_ts).between(
        F.col(lo_ts), F.col(hi_ts)
    )
    return p.join(i, cond, how).drop("__bin")

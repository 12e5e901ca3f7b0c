"""Event-funnel and cohort-retention queries over the `events` table —
the product-analytics staples (conversion, retention matrix) every
warehouse engine ships.

Cross-engine determinism: time arithmetic uses epoch microseconds
(``unix_micros`` / ``epoch_us``) — never second-truncating helpers —
and averages are written as explicit ``CAST(sum AS DOUBLE)/count`` so
both engines divide the same exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import t
from .registry import query


@query(
    "funnel_conversion",
    oracle="""
    WITH s AS (
      SELECT user_id, min(ts) AS signup_ts FROM events
      WHERE event_type = 'signup' GROUP BY 1
    ),
    p AS (
      SELECT s.user_id, s.signup_ts,
             min(CASE WHEN e.ts >= s.signup_ts THEN e.ts END)
               AS first_purchase_ts
      FROM s LEFT JOIN events e
        ON e.user_id = s.user_id AND e.event_type = 'purchase'
      GROUP BY s.user_id, s.signup_ts
    )
    SELECT CAST(date_trunc('month', signup_ts) AS DATE) AS cohort_month,
           CAST(count(*) AS BIGINT) AS n_signups,
           CAST(count(first_purchase_ts) AS BIGINT) AS n_converted,
           round(100.0::DOUBLE * count(first_purchase_ts) / count(*), 2)
             AS conversion_pct,
           round(CAST(sum(epoch_us(first_purchase_ts)
                          - epoch_us(signup_ts)) AS DOUBLE)
                 / count(first_purchase_ts) / 86400000000.0, 4)
             AS avg_days_to_convert
    FROM p
    GROUP BY 1
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase funnel by signup-month cohort: conversion rate and
    mean days-to-convert. Per-user firsts are one hash aggregate each; the
    signup frame aggregates to |users| before the join, so event payloads
    join against a user-sized (broadcast-able) side — at warehouse scale
    AQE picks broadcast vs shuffle by the cohort's actual size."""
    e = t(spark, sf_dir, "events")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    pur = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts")
    )
    per_user = (
        s.join(pur, "user_id", "left")
        .groupBy("user_id", "signup_ts")
        .agg(
            F.min(
                F.when(F.col("ts") >= F.col("signup_ts"), F.col("ts"))
            ).alias("first_purchase_ts")
        )
    )
    lag_us = F.unix_micros("first_purchase_ts") - F.unix_micros("signup_ts")
    return (
        per_user.groupBy(
            F.date_trunc("month", "signup_ts")
            .cast("date")
            .alias("cohort_month")
        )
        .agg(
            F.count("*").cast("long").alias("n_signups"),
            F.count("first_purchase_ts").cast("long").alias("n_converted"),
            F.round(
                F.lit(100.0)
                * F.count("first_purchase_ts")
                / F.count("*"),
                2,
            ).alias("conversion_pct"),
            F.round(
                F.sum(lag_us).cast("double")
                / F.count("first_purchase_ts")
                / F.lit(86400000000.0),
                4,
            ).alias("avg_days_to_convert"),
        )
    )


@query(
    "retention_cohorts",
    oracle="""
    WITH wk AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS DATE) AS week
      FROM events
    ),
    first_wk AS (
      SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY 1
    )
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, wk.week) / 7 AS INTEGER)
             AS week_offset,
           CAST(count(DISTINCT wk.user_id) AS BIGINT) AS n_active
    FROM wk JOIN first_wk f USING (user_id)
    GROUP BY 1, 2
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention matrix: users bucketed by first-active week,
    counted in each subsequent week they return — the (cohort, offset)
    triangle behind every retention chart. Distinct (user, week) pairs
    first (collapses event volume to user-weeks), then one user-keyed
    aggregate and one cohort-keyed aggregate; event payloads are never
    joined, only user-week pairs."""
    e = t(spark, sf_dir, "events")
    wk = e.select(
        "user_id",
        F.date_trunc("week", "ts").cast("date").alias("week"),
    ).distinct()
    first_wk = wk.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        wk.join(first_wk, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").cast("long").alias("n_active"))
    )

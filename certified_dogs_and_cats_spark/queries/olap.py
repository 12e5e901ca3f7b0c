"""OLAP breadth queries: range-frame sliding windows, ROLLUP grouping
sets, exact interpolated percentiles, ordered string aggregation.

Not used by the reference's notebooks but standard warehouse surface a
migrating user expects; each shape has distinct physical-plan behavior
(range frames need sorted windows, rollup multiplies grouping sets
map-side, exact percentiles need per-group sorted collection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .common import t
from .registry import query


@query(
    "trailing_range_avg",
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority,
             CAST(CAST(date_trunc('day', o_orderdate) AS DATE)
                  - DATE '1970-01-01' AS INTEGER) AS epoch_day,
             count(*) AS cnt
      FROM orders GROUP BY 1, 2
    )
    SELECT o_orderpriority, epoch_day, cnt,
           round(avg(cnt) OVER (
             PARTITION BY o_orderpriority ORDER BY epoch_day
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS avg_7d
    FROM daily
    """,
)
def trailing_range_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day trailing average of daily order counts per priority — a RANGE
    frame over a numeric day index, so gaps in the calendar shrink the
    window (unlike a 7-ROW frame). Pre-aggregated to days before the
    window: the frame slides over ~|days| rows per group, not raw orders."""
    o = t(spark, sf_dir, "orders").select("o_orderpriority", "o_orderdate")
    daily = (
        o.withColumn(
            "epoch_day",
            F.datediff(
                F.date_trunc("day", F.col("o_orderdate")), F.lit("1970-01-01")
            ),
        )
        .groupBy("o_orderpriority", "epoch_day")
        .agg(F.count("*").alias("cnt"))
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.col("epoch_day").asc())
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "o_orderpriority",
        "epoch_day",
        "cnt",
        F.round(F.avg("cnt").over(w), 6).alias("avg_7d"),
    )


@query(
    "rollup_order_counts",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           count(*) AS cnt,
           CAST(GROUPING(o_orderpriority, o_orderstatus) AS INTEGER)
             AS grouping_lvl
    FROM orders
    GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
    """,
)
def rollup_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets: (priority, status), (priority), () totals in
    one pass — Spark expands the sets map-side, one shuffle total."""
    o = t(spark, sf_dir, "orders").select("o_orderpriority", "o_orderstatus")
    return o.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("cnt"),
        F.grouping_id().cast("int").alias("grouping_lvl"),
    )


@query(
    "percentile_by_group",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
           round(max(o_totalprice), 4) AS p100
    FROM orders GROUP BY 1
    """,
)
def percentile_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles per group (Spark `percentile`
    == DuckDB `quantile_cont`; rounded to absorb float formula ordering).
    Exact percentiles need the group's values collected and sorted — at
    100 TB prefer approx_percentile unless the contract demands exactness."""
    o = t(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        F.round(F.max("o_totalprice"), 4).alias("p100"),
    )


@query(
    "string_agg_by_group",
    oracle="""
    SELECT o_orderpriority,
           string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
             AS statuses,
           CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses
    FROM orders GROUP BY 1
    """,
)
def string_agg_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered distinct string aggregation — collect_set then array_sort
    then join, so the output is deterministic regardless of partitioning
    (bare LISTAGG/collect_list order is not)."""
    o = t(spark, sf_dir, "orders").select("o_orderpriority", "o_orderstatus")
    return o.groupBy("o_orderpriority").agg(
        F.array_join(
            F.array_sort(F.collect_set("o_orderstatus")), ","
        ).alias("statuses"),
        F.count_distinct("o_orderstatus").alias("n_statuses"),
    )


@query(
    "semi_join_active_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_totalprice > 100000)
    """,
)
def semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS-subquery as a left-semi join: emits each customer at most
    once no matter how many orders match (a plain inner join + distinct
    would shuffle the multiplicity first; semi short-circuits per key)."""
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 100000)
        .select("o_custkey")
    )
    return c.join(
        o, c["c_custkey"] == o["o_custkey"], "left_semi"
    )


@query(
    "set_ops_customer_keys",
    oracle="""
    SELECT c_custkey, 'both' AS bucket FROM (
      SELECT c_custkey FROM customer WHERE c_acctbal > 0
      INTERSECT
      SELECT o_custkey FROM orders
    )
    UNION ALL
    SELECT c_custkey, 'no_orders' AS bucket FROM (
      SELECT c_custkey FROM customer WHERE c_acctbal > 0
      EXCEPT
      SELECT o_custkey FROM orders
    )
    """,
)
def set_ops_customer_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL with Spark's distinct-set semantics
    (each compiles to an aggregate or semi/anti join — no nested loops)."""
    pos = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0)
        .select("c_custkey")
    )
    ordered = t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    both = pos.intersect(ordered).withColumn("bucket", F.lit("both"))
    none = pos.subtract(ordered).withColumn("bucket", F.lit("no_orders"))
    return both.unionAll(none)


@query(
    "pivot_status_matrix",
    oracle="""
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                AS BIGINT) AS F,
           CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
                AS BIGINT) AS O,
           CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)
                AS BIGINT) AS P
    FROM orders GROUP BY 1
    """,
)
def pivot_status_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native pivot with the value list pinned (no discovery pass over the
    data — an unpinned pivot runs an extra distinct job AND makes the
    output schema data-dependent, both wrong at scale)."""
    o = t(spark, sf_dir, "orders").select("o_orderpriority", "o_orderstatus")
    p = o.groupBy("o_orderpriority").pivot(
        "o_orderstatus", ["F", "O", "P"]
    ).count()
    return p.select(
        "o_orderpriority",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in ("F", "O", "P")],
    )

"""Gold-view-shaped composite queries (SURVEY.md §3.3) over the testdata.

Each query mirrors one of the reference's gold analytics views, re-keyed to
the TPC-H-ish tables: (Year, ANIMAL_TYPE) -> (order year, priority/status),
breed -> part type/brand, FSA -> nation/region.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.windows import pivot_top_k, top_k_per_group
from .common import t
from .registry import query


# --- v_totals_by_year_type (notebooks/gold.py:32-73): counts + windowed
# share + row_number rank, deterministic tiebreak. FLAGSHIP query. ----------
@query(
    "totals_by_year_type",
    oracle="""
    WITH cnts AS (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, o_orderpriority,
             count(*) AS cnt
      FROM orders GROUP BY 1, 2
    )
    SELECT o_year, o_orderpriority, cnt,
           round(100.0::DOUBLE * cnt / sum(cnt) OVER (PARTITION BY o_year), 2)
             AS share_pct,
           CAST(row_number() OVER (PARTITION BY o_year
                                   ORDER BY cnt DESC, o_orderpriority ASC)
                AS INTEGER) AS rnk
    FROM cnts
    """,
)
def totals_by_year_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("o_year"), "o_orderpriority"
    )
    cnts = o.groupBy("o_year", "o_orderpriority").agg(F.count("*").alias("cnt"))
    wshare = Window.partitionBy("o_year")
    wrank = Window.partitionBy("o_year").orderBy(
        F.col("cnt").desc(), F.col("o_orderpriority").asc()
    )
    return cnts.select(
        "o_year",
        "o_orderpriority",
        "cnt",
        F.round(F.lit(100.0) * F.col("cnt") / F.sum("cnt").over(wshare), 2).alias(
            "share_pct"
        ),
        F.row_number().over(wrank).alias("rnk"),
    )


# --- v_breed_stats YoY (notebooks/gold.py:88-136): LAG over year ------------
@query(
    "yoy_lag_stats",
    oracle="""
    WITH cnts AS (
      SELECT o_orderpriority, CAST(year(o_orderdate) AS INTEGER) AS o_year,
             count(*) AS cnt
      FROM orders GROUP BY 1, 2
    )
    SELECT o_orderpriority, o_year, cnt,
           lag(cnt) OVER (PARTITION BY o_orderpriority ORDER BY o_year)
             AS prev_cnt,
           cnt - lag(cnt) OVER (PARTITION BY o_orderpriority ORDER BY o_year)
             AS yoy_diff,
           round(100.0::DOUBLE *
                 (cnt - lag(cnt) OVER (PARTITION BY o_orderpriority
                                       ORDER BY o_year))
                 / lag(cnt) OVER (PARTITION BY o_orderpriority ORDER BY o_year),
                 2) AS yoy_pct
    FROM cnts
    """,
)
def yoy_lag_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select(
        "o_orderpriority", F.year("o_orderdate").alias("o_year")
    )
    cnts = o.groupBy("o_orderpriority", "o_year").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("o_orderpriority").orderBy("o_year")
    prev = F.lag("cnt").over(w)
    return cnts.select(
        "o_orderpriority",
        "o_year",
        "cnt",
        prev.alias("prev_cnt"),
        (F.col("cnt") - prev).alias("yoy_diff"),
        F.round(F.lit(100.0) * (F.col("cnt") - prev) / prev, 2).alias("yoy_pct"),
    )


# --- v_fsa_top3_breeds pivot (notebooks/gold.py:149-208):
# rank -> MAX(CASE WHEN rnk=k) wide columns ---------------------------------
@query(
    "top3_pivot_by_brand",
    oracle="""
    WITH cnts AS (
      SELECT p_brand, p_type, count(*) AS cnt FROM part GROUP BY 1, 2
    ), ranked AS (
      SELECT p_brand, p_type, cnt,
             row_number() OVER (PARTITION BY p_brand
                                ORDER BY cnt DESC, p_type ASC) AS rnk
      FROM cnts
    )
    SELECT p_brand,
           max(CASE WHEN rnk = 1 THEN p_type END) AS top1_p_type,
           max(CASE WHEN rnk = 1 THEN cnt END) AS top1_cnt,
           max(CASE WHEN rnk = 2 THEN p_type END) AS top2_p_type,
           max(CASE WHEN rnk = 2 THEN cnt END) AS top2_cnt,
           max(CASE WHEN rnk = 3 THEN p_type END) AS top3_p_type,
           max(CASE WHEN rnk = 3 THEN cnt END) AS top3_cnt
    FROM ranked WHERE rnk <= 3
    GROUP BY p_brand
    """,
)
def top3_pivot_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").select("p_brand", "p_type")
    cnts = p.groupBy("p_brand", "p_type").agg(F.count("*").alias("cnt"))
    ranked = top_k_per_group(
        cnts, ["p_brand"], [F.col("cnt").desc(), F.col("p_type").asc()], k=3
    )
    return pivot_top_k(ranked, ["p_brand"], "rnk", ["p_type", "cnt"], k=3)


# --- v_daily_totals (notebooks/gold.py:323-329): day-truncated counts -------
@query(
    "daily_totals",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           count(*) AS cnt,
           count(DISTINCT user_id) AS n_users,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1
    """,
)
def daily_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select("ts", "user_id", "value")
    return e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").alias("cnt"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
            "total_value"
        ),
    )


# --- licensed_pets_gold_quality (notebooks/gold.py:287-309): per-group
# quality metrics with conditional sums + guarded ratio ----------------------
@query(
    "quality_summary",
    oracle="""
    SELECT event_type,
           count(*) AS cnt,
           CAST(sum(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT)
             AS high_value_cnt,
           CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS null_props_cnt,
           round(100.0::DOUBLE *
                 sum(CASE WHEN value > 100 THEN 1 ELSE 0 END) / count(*), 2)
             AS pct_high,
           max(CAST(ts AS TIMESTAMP)) AS freshness_ts
    FROM events GROUP BY event_type
    """,
)
def quality_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select("event_type", "value", "props", "ts")
    high = F.sum(F.when(F.col("value") > 100, 1).otherwise(0))
    return e.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        high.alias("high_value_cnt"),
        F.sum(F.when(F.col("props").isNull(), 1).otherwise(0)).alias(
            "null_props_cnt"
        ),
        F.round(F.lit(100.0) * high / F.count("*"), 2).alias("pct_high"),
        F.max("ts").alias("freshness_ts"),
    )

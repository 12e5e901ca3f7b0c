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


# --- v_totals_by_year_type EXACT OUTPUT SHAPE (notebooks/gold.py:32-73):
# the reference's flagship view emits totals x ranked top-10 breeds in ONE
# 7-column relation. Re-keyed: Year -> order year, ANIMAL_TYPE ->
# o_orderstatus, breed_standard -> o_orderpriority. The Spark side gets
# total_count from a window over the breed-count aggregate (one scan, one
# shuffle) where the reference scans twice and joins — same rows, better
# plan. ----------------------------------------------------------------
@query(
    "totals_top_breeds_joined",
    oracle="""
    WITH breed_counts AS (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             o_orderstatus, o_orderpriority, count(*) AS breed_count
      FROM orders GROUP BY 1, 2, 3
    ),
    totals AS (
      SELECT o_year, o_orderstatus, sum(breed_count) AS total_count
      FROM breed_counts GROUP BY 1, 2
    ),
    ranked AS (
      SELECT o_year, o_orderstatus, o_orderpriority, breed_count,
             CAST(row_number() OVER (
               PARTITION BY o_orderstatus, o_year
               ORDER BY breed_count DESC, o_orderpriority ASC
             ) AS INTEGER) AS popularity
      FROM breed_counts
    )
    SELECT t.o_year, t.o_orderstatus,
           CAST(t.total_count AS BIGINT) AS total_count,
           r.popularity,
           r.o_orderpriority AS top_breed,
           r.breed_count,
           round(100.0::DOUBLE * r.breed_count / t.total_count, 2)
             AS top_breed_pct
    FROM totals t JOIN ranked r
      ON t.o_year = r.o_year AND t.o_orderstatus = r.o_orderstatus
    WHERE r.popularity <= 10
    """,
)
def totals_top_breeds_joined(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("o_year"),
        "o_orderstatus",
        "o_orderpriority",
    )
    breed_counts = o.groupBy("o_year", "o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("breed_count")
    )
    wtot = Window.partitionBy("o_orderstatus", "o_year")
    wrank = wtot.orderBy(
        F.col("breed_count").desc(), F.col("o_orderpriority").asc()
    )
    return (
        breed_counts.select(
            "o_year",
            "o_orderstatus",
            F.sum("breed_count").over(wtot).alias("total_count"),
            F.row_number().over(wrank).alias("popularity"),
            F.col("o_orderpriority").alias("top_breed"),
            "breed_count",
        )
        .filter(F.col("popularity") <= 10)
        .select(
            "o_year",
            "o_orderstatus",
            "total_count",
            "popularity",
            "top_breed",
            "breed_count",
            F.round(
                F.lit(100.0) * F.col("breed_count") / F.col("total_count"), 2
            ).alias("top_breed_pct"),
        )
    )


# --- S11 data side (pipeline/export.py:latest_year_fsa_counts, reference
# README.md:84-86): latest-year per-FSA counts for one type — the exact
# frame the choropleth renders. Re-keyed: FSA -> nation name (via customer),
# ANIMAL_TYPE -> o_orderstatus, Year -> order year. Calls the REAL export
# helper so the driver's oracle pins the production code path. ----------
@query(
    "fsa_choropleth_data",
    oracle="""
    WITH src AS (
      SELECT n_name AS FSA, CAST(year(o_orderdate) AS INTEGER) AS Year
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE o_orderstatus = 'F'
    ),
    agg AS (SELECT Year, FSA, count(*) AS cnt FROM src GROUP BY 1, 2)
    SELECT FSA, CAST(cnt AS BIGINT) AS cnt
    FROM agg WHERE Year = (SELECT max(Year) FROM agg)
    ORDER BY FSA
    """,
)
def fsa_choropleth_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..pipeline.export import latest_year_fsa_counts

    o = t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderstatus", F.year("o_orderdate").alias("Year")
    )
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    src = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .select(
            F.col("n_name").alias("FSA"),
            F.col("o_orderstatus").alias("ANIMAL_TYPE"),
            "Year",
        )
    )
    return latest_year_fsa_counts(src, "F")

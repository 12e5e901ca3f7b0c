"""Gold analytics stage: the reference's view stack over OUR silver table.

Capability parity with ``notebooks/gold.py:12-380`` plus the health views
(``notebooks/bronze.py:151-158``, ``notebooks/silver.py:166-175``): every
view is a DataFrame builder over the engine's own Bronze/Silver catalog
tables, and :func:`gold_stage` registers the whole stack as temp views (the
reference's gold task is likewise DDL-only — views evaluate lazily).

Scale posture: every view pre-aggregates to (group, cnt) BEFORE windows or
joins, so shuffles move grouped counts, never raw rows; share denominators
use windowed sums over the aggregated frame instead of a second scan+join
(the reference re-scans for its totals CTE at gold.py:169-177 — SURVEY.md §4
flags it; we deliberately do not copy that). Rankings pin deterministic
tie-breaks (cnt DESC, breed ASC — reference gold.py:58,105; README.md:138).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from ..functions.scalar import pct, safe_ratio
from ..operators.windows import pivot_top_k, top_k_per_group
from .catalog import Catalog
from .schemas import ANIMAL_TYPES
from .ingest import StageResult


def gold_src(silver: DataFrame) -> DataFrame:
    """Filtered/projected base for all gold views (gold.py:12-25): rows with
    a usable Year and whitelisted ANIMAL_TYPE; analytics columns only."""
    return silver.filter(
        F.col("Year").isNotNull() & F.col("ANIMAL_TYPE").isin(*ANIMAL_TYPES)
    ).select("Year", "ANIMAL_TYPE", "FSA", "FSA_VALID", "breed_standard",
             "breed_mapped", "ingestion_ts", "processed_ts")


def totals_by_year_type(src: DataFrame) -> DataFrame:
    """v_totals_by_year_type (gold.py:32-73): counts per (Year, type) with
    share-of-year and deterministic rank."""
    cnts = src.groupBy("Year", "ANIMAL_TYPE").agg(F.count("*").alias("cnt"))
    wshare = Window.partitionBy("Year")
    wrank = Window.partitionBy("Year").orderBy(
        F.col("cnt").desc(), F.col("ANIMAL_TYPE").asc()
    )
    return cnts.select(
        "Year",
        "ANIMAL_TYPE",
        "cnt",
        pct(F.col("cnt"), F.sum("cnt").over(wshare)).alias("share_pct"),
        F.row_number().over(wrank).alias("rnk"),
    )


def breed_stats(src: DataFrame) -> DataFrame:
    """v_breed_stats (gold.py:88-136): per (Year, type, breed) counts, share
    via windowed sum, RANK (ties share), and LAG year-over-year deltas."""
    cnts = src.groupBy("Year", "ANIMAL_TYPE", "breed_standard").agg(
        F.count("*").alias("cnt")
    )
    wtot = Window.partitionBy("Year", "ANIMAL_TYPE")
    wrank = Window.partitionBy("Year", "ANIMAL_TYPE").orderBy(
        F.col("cnt").desc(), F.col("breed_standard").asc()
    )
    wyoy = Window.partitionBy("ANIMAL_TYPE", "breed_standard").orderBy("Year")
    prev = F.lag("cnt").over(wyoy)
    return cnts.select(
        "Year",
        "ANIMAL_TYPE",
        "breed_standard",
        "cnt",
        pct(F.col("cnt"), F.sum("cnt").over(wtot)).alias("share_pct"),
        F.rank().over(wrank).alias("breed_rank"),
        prev.alias("prev_cnt"),
        (F.col("cnt") - prev).alias("yoy_diff"),
        pct(F.col("cnt") - prev, prev).alias("yoy_pct"),
    )


def _topk_breeds_by_area(src: DataFrame, area: F.Column, area_name: str,
                         k: int = 3) -> DataFrame:
    """Shared shape of v_fsa_top3_breeds / v_fsa2_top3_breeds
    (gold.py:149-208, 219-278): per-(Year,type,area) breed counts -> top-k
    row_number pivot to wide columns + area total via windowed sum."""
    cnts = (
        src.filter(area.isNotNull())
        .groupBy(F.col("Year"), F.col("ANIMAL_TYPE"), area.alias(area_name),
                 F.col("breed_standard"))
        .agg(F.count("*").alias("cnt"))
    )
    wtot = Window.partitionBy("Year", "ANIMAL_TYPE", area_name)
    cnts = cnts.withColumn("area_total", F.sum("cnt").over(wtot))
    ranked = top_k_per_group(
        cnts,
        ["Year", "ANIMAL_TYPE", area_name],
        [F.col("cnt").desc(), F.col("breed_standard").asc()],
        k=k,
    )
    wide = pivot_top_k(
        ranked, ["Year", "ANIMAL_TYPE", area_name, "area_total"], "rnk",
        ["breed_standard", "cnt"], k=k,
    )
    return wide


def fsa_top3_breeds(src: DataFrame) -> DataFrame:
    return _topk_breeds_by_area(src, F.col("FSA"), "FSA")


def fsa2_top3_breeds(src: DataFrame) -> DataFrame:
    """FSA2 = substr(FSA,1,2) district granularity (gold.py:219-278)."""
    # No length pre-filter: Silver nulls any FSA not matching the 3-char
    # pattern, and NULL areas are excluded inside the helper.
    return _topk_breeds_by_area(src, F.substring("FSA", 1, 2), "FSA2")


def daily_totals(src: DataFrame) -> DataFrame:
    """v_daily_totals (gold.py:323-329): ingestion-day counts."""
    return src.groupBy(F.to_date("ingestion_ts").alias("day")).agg(
        F.count("*").alias("cnt"),
        F.countDistinct("ANIMAL_TYPE").alias("n_types"),
    )


def breed_share_citywide(src: DataFrame) -> DataFrame:
    """v_breed_share_citywide (gold.py:341-353): breed count vs citywide
    total per (Year, type) — windowed-sum denominator, no second scan."""
    cnts = src.groupBy("Year", "ANIMAL_TYPE", "breed_standard").agg(
        F.count("*").alias("cnt")
    )
    wtot = Window.partitionBy("Year", "ANIMAL_TYPE")
    return cnts.select(
        "Year",
        "ANIMAL_TYPE",
        "breed_standard",
        "cnt",
        F.sum("cnt").over(wtot).alias("citywide_cnt"),
        pct(F.col("cnt"), F.sum("cnt").over(wtot), 4).alias("share_pct"),
    )


def breed_rank_citywide(src: DataFrame) -> DataFrame:
    """v_breed_rank_citywide (gold.py:364-373): deterministic row_number."""
    cnts = src.groupBy("Year", "ANIMAL_TYPE", "breed_standard").agg(
        F.count("*").alias("cnt")
    )
    w = Window.partitionBy("Year", "ANIMAL_TYPE").orderBy(
        F.col("cnt").desc(), F.col("breed_standard").asc()
    )
    return cnts.withColumn("rnk", F.row_number().over(w))


def gold_quality(silver: DataFrame) -> DataFrame:
    """licensed_pets_gold_quality (gold.py:287-309): per-(Year,type) quality
    metrics — conditional sums + guarded ratio + freshness."""
    mapped = F.sum(F.when(F.col("breed_mapped"), 1).otherwise(0))
    return silver.groupBy("Year", "ANIMAL_TYPE").agg(
        F.count("*").alias("cnt"),
        F.sum(F.when(~F.col("FSA_VALID"), 1).otherwise(0)).alias(
            "invalid_fsa_cnt"
        ),
        F.sum(F.when(F.col("FSA").isNull(), 1).otherwise(0)).alias(
            "null_fsa_rows"
        ),
        mapped.alias("mapped_cnt"),
        F.round(F.lit(100.0) * safe_ratio(mapped, F.count("*")), 2).alias(
            "pct_mapped"
        ),
        F.max("processed_ts").alias("freshness_ts"),
    )


def bronze_health(bronze: DataFrame) -> DataFrame:
    """v_bronze_health (bronze.py:151-158): one-row global health metrics."""
    return bronze.agg(
        F.count("*").alias("row_cnt"),
        F.countDistinct("_id").alias("distinct_ids"),
        F.countDistinct("Year").alias("n_years"),
        F.sum(F.when(~F.col("FSA_VALID"), 1).otherwise(0)).alias(
            "invalid_fsa_cnt"
        ),
        F.max("ingestion_ts").alias("max_ingestion_ts"),
    )


def silver_health(silver: DataFrame) -> DataFrame:
    """v_silver_health (silver.py:166-175): one-row global health metrics."""
    mapped = F.sum(F.when(F.col("breed_mapped"), 1).otherwise(0))
    return silver.agg(
        F.count("*").alias("row_cnt"),
        F.countDistinct("_id").alias("distinct_ids"),
        mapped.alias("mapped_cnt"),
        (F.count("*") - mapped).alias("unmapped_cnt"),
        F.round(F.lit(100.0) * safe_ratio(mapped, F.count("*")), 2).alias(
            "pct_mapped"
        ),
        F.max("processed_ts").alias("max_processed_ts"),
    )


GOLD_VIEWS = {
    "v_totals_by_year_type": totals_by_year_type,
    "v_breed_stats": breed_stats,
    "v_fsa_top3_breeds": fsa_top3_breeds,
    "v_fsa2_top3_breeds": fsa2_top3_breeds,
    "v_daily_totals": daily_totals,
    "v_breed_share_citywide": breed_share_citywide,
    "v_breed_rank_citywide": breed_rank_citywide,
}


def build_views(catalog: Catalog) -> dict[str, DataFrame]:
    """Materialize the whole gold view stack as DataFrames (lazy)."""
    # Idempotent registration: gold must be buildable (as empty views) even
    # when upstream stages skipped before ever writing a table.
    from .ingest import register_tables as register_bronze_tables
    from .refine import register_tables as register_silver_tables

    register_bronze_tables(catalog)
    register_silver_tables(catalog)
    silver = catalog.table("core.licensed_pets_silver")
    bronze = catalog.table("core.licensed_pets_bronze")
    src = gold_src(silver)
    views = {name: fn(src) for name, fn in GOLD_VIEWS.items()}
    views["gold_quality"] = gold_quality(silver)
    views["v_bronze_health"] = bronze_health(bronze)
    views["v_silver_health"] = silver_health(silver)
    return views


def gold_stage(catalog: Catalog) -> StageResult:
    """The runner's 4th task (Workflow yaml:48-53): (re)create the view
    stack. DDL-only — no data moves until a view is queried."""
    views = build_views(catalog)
    for name, df in views.items():
        df.createOrReplaceTempView(f"pets_gold_{name}")
    return StageResult("done", rows=len(views))

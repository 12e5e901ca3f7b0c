"""Interchange-format coverage under the oracle gate (round-5 tail —
registered after governance so these queue behind the driver window).
"""

from __future__ import annotations

import os
import shutil
import tempfile
from datetime import date

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import t
from .registry import query


@query(
    "export_roundtrip_orc",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
             AS total_price,
           CAST(min(o_orderdate) AS DATE) AS first_day
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def export_roundtrip_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink round trip: write orders through the ORC export
    (zstd-compressed columnar, stripe-statistics footers), read the
    export BACK with Spark's ORC reader, and aggregate the round-tripped
    rows — a green row proves the columnar encode/decode is lossless for
    numeric, string, and date types alike. The money sum is
    DECIMAL-exact on both sides so the hash can't wobble on fold
    order."""
    from ..pipeline.export import export_view_orc

    orders = t(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_totalprice",
        # store a true DATE column in the ORC (the source testdata column
        # is a timestamp) so the round trip covers the date type
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
    )
    root = tempfile.mkdtemp(prefix="orc_export_rt_")
    try:
        out = export_view_orc(
            orders, root, "orders_feed", date(2026, 1, 1)
        )
        back = spark.read.orc(out)
        agg = back.groupBy("o_orderpriority").agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
            .cast("double")
            .alias("total_price"),
            F.min("o_orderdate").alias("first_day"),
        )
        return spark.createDataFrame(agg.collect(), agg.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "fuzzy_name_pairs",
    oracle="""
    WITH p AS (SELECT p_partkey, p_name, p_brand, p_size FROM part),
    pairs AS (
      SELECT a.p_brand,
             levenshtein(a.p_name, b.p_name) AS dist
      FROM p a JOIN p b
        ON a.p_brand = b.p_brand AND a.p_size = b.p_size
       AND a.p_partkey < b.p_partkey
       AND abs(len(a.p_name) - len(b.p_name)) <= 12
      WHERE levenshtein(a.p_name, b.p_name) <= 12
    )
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(min(dist) AS INTEGER) AS min_dist,
           CAST(sum(dist) AS BIGINT) AS dist_sum
    FROM pairs GROUP BY 1
    """,
)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-tolerant fuzzy matching at scale (extensions.dedup.
    blocked_edit_distance_pairs): Levenshtein refinement over
    (brand, size)-blocked candidates — never all-pairs; the
    length-difference bound prunes inside the join condition before the
    quadratic distance runs. Levenshtein is integer-exact on both
    engines, so the oracle hash-pins every distance."""
    from ..extensions.dedup import blocked_edit_distance_pairs

    p = t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("pid"), "p_name", "p_brand", "p_size"
    )
    pairs = blocked_edit_distance_pairs(
        p, "pid", "p_name", ["p_brand", "p_size"], max_dist=12
    )
    # the block key rides along on every pair — no re-join needed
    return (
        pairs.groupBy("p_brand")
        .agg(
            F.count("*").alias("n_pairs"),
            F.min("dist").cast("int").alias("min_dist"),
            F.sum("dist").cast("bigint").alias("dist_sum"),
        )
    )

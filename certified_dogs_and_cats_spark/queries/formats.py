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

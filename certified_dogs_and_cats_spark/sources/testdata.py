"""Catalog for the driver-generated testdata parquet tables.

Tables (see /root/repo/TESTDATA.md): region nation customer supplier part
orders lineitem events documents embeddings, one parquet file each under
``/root/testdata/sf{0.001,0.01,0.1}/``.

At 100 TB these would be partitioned/bucketed managed tables; locally each is
a single parquet file. All access goes through :func:`load_table` so that
column pruning + predicate pushdown reach the scan (callers `.select()` and
`.filter()` immediately on the returned DataFrame).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown testdata table {name!r}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's schema
        # converter rejects. Read nanos as raw INT64 (legacy conf scoped to
        # this read — the conf is captured when the DataFrame is created, so
        # restoring it immediately is safe; validated) and floor-divide to
        # microseconds in exact integer arithmetic. Floor (not
        # truncate-toward-zero) so hypothetical pre-epoch timestamps land on
        # the earlier microsecond, matching time-truncation semantics;
        # for the non-negative testdata both agree, and DuckDB's
        # CAST(ts AS TIMESTAMP) matches bit-for-bit (validated).
        key = "spark.sql.legacy.parquet.nanosAsLong"
        prev = spark.conf.get(key, None)
        spark.conf.set(key, "true")
        try:
            df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
        floor_div = "(ts DIV 1000) - (CASE WHEN ts % 1000 < 0 THEN 1 ELSE 0 END)"
        return df.withColumn(
            "ts", F.expr(f"timestamp_micros(CAST({floor_div} AS BIGINT))")
        )
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql queries)."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

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


# Physical type of events.ts per sf_dir, read once from the parquet footer
# (pyarrow, no Spark job). The driver has shipped the column as both
# TIMESTAMP(NANOS) and TIMESTAMP(MICROS) across rounds, so the reader
# adapts instead of assuming either.
_EVENTS_TS_KIND: dict[str, str] = {}


def events_ts_kind(sf_dir: str) -> str:
    """'nanos' | 'other' for events.ts in this sf_dir (footer-sniffed)."""
    kind = _EVENTS_TS_KIND.get(sf_dir)
    if kind is None:
        import pyarrow.parquet as pq

        path = os.path.join(sf_dir, "events.parquet")
        if os.path.isdir(path):
            # Spark writes datasets as DIRECTORIES of part files; the
            # footer sniff needs one concrete file (schemas are uniform
            # across parts of one write).
            parts = sorted(
                f for f in os.listdir(path) if f.endswith(".parquet")
            )
            if parts:
                path = os.path.join(path, parts[0])
        t = str(pq.read_schema(path).field("ts").type)
        kind = "nanos" if t == "timestamp[ns]" else "other"
        _EVENTS_TS_KIND[sf_dir] = kind
    return kind


def _normalize_ts(df: DataFrame) -> DataFrame:
    """Pin events.ts to session-tz TIMESTAMP regardless of source type.

    - nanos-as-long INT64: exact integer floor-division to microseconds
      (floor, not truncate-toward-zero, so hypothetical pre-epoch stamps
      land on the earlier microsecond — time-truncation semantics;
      DuckDB's CAST(ts AS TIMESTAMP) matches bit-for-bit, validated).
    - TIMESTAMP_NTZ (micros file under inferTimestampNTZ): cast to LTZ —
      wall-clock-preserving under the pinned UTC session timezone, so the
      digits match DuckDB's naive TIMESTAMP exactly.
    """
    dt = dict(df.dtypes)["ts"]
    if dt == "bigint":
        floor_div = (
            "(ts DIV 1000) - (CASE WHEN ts % 1000 < 0 THEN 1 ELSE 0 END)"
        )
        return df.withColumn(
            "ts", F.expr(f"timestamp_micros(CAST({floor_div} AS BIGINT))")
        )
    if dt == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


# Per-session scan memo: (sf_dir, name) -> (session, DataFrame). A scan
# DataFrame holds METADATA only (the parquet footer schema, the file
# listing) — data is re-read from the files at every execution, so this
# caches no results, only the ~0.1 s footer-read + Dataset-analysis cost
# every load_table call pays through Py4J (measured 126 s aggregate
# plan-construction time across the 270-query roster before the memo,
# r12 — the single largest driver-side cost in the bench). Safe because
# testdata dirs are immutable within a process (the read-only
# /root/testdata mounts; scripts that synthesize a dir do so before
# their first load). A different or restarted session misses the
# identity check and reloads.
_SCAN_MEMO: dict[tuple[str, str], tuple[SparkSession, DataFrame]] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown testdata table {name!r}")
    hit = _SCAN_MEMO.get((sf_dir, name))
    if hit is not None and hit[0] is spark:
        return hit[1]
    df = _load_table(spark, sf_dir, name)
    _SCAN_MEMO[(sf_dir, name)] = (spark, df)
    return df


def _load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        path = os.path.join(sf_dir, "events.parquet")
        if events_ts_kind(sf_dir) == "nanos":
            # TIMESTAMP(NANOS) is rejected by Spark's schema converter;
            # read nanos as raw INT64 (legacy conf scoped to this read —
            # the conf is captured when the DataFrame is created, so
            # restoring it immediately is safe; validated).
            key = "spark.sql.legacy.parquet.nanosAsLong"
            prev = spark.conf.get(key, None)
            spark.conf.set(key, "true")
            try:
                df = spark.read.parquet(path)
            finally:
                if prev is None:
                    spark.conf.unset(key)
                else:
                    spark.conf.set(key, prev)
        else:
            df = spark.read.parquet(path)
        return _normalize_ts(df)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql queries)."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

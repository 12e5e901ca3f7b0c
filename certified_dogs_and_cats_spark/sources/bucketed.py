"""Bucketed managed tables: shuffle-free co-located joins.

Hive-style bucketing pre-shuffles a table ON WRITE: rows are hash-assigned
to a fixed number of buckets on the bucket columns, optionally sorted
within each bucket. Two tables bucketed the same way join with NO exchange
(and, if sorted, no sort) — the 100 TB pattern for a fact table that is
repeatedly joined on the same key (pay the shuffle once at ingest, never
again). This is the write-side complement of `broadcast()` (for dims) and
`salted_join` (for skew): use bucketing when BOTH sides are big and the
join key is stable across workloads.

Bucketed writes go through ``saveAsTable`` (bucket metadata lives in the
session catalog; plain ``parquet(path)`` cannot record it).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a managed parquet table bucketed on ``bucket_cols``.

    ``n_buckets`` must match on every table that should co-join; size it so
    one bucket of the biggest table fits an executor's memory
    (rows_per_bucket = N / n_buckets).
    """
    writer = df.write.format("parquet").mode(mode).bucketBy(
        n_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a managed table; bucket metadata flows into the plan, so joins
    and aggregations on the bucket columns skip their exchange."""
    return spark.table(table)

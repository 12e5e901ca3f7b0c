"""Corrupt-record quarantine ingest (Databricks ``badRecordsPath`` analog).

The bronze pipeline's contract is guard-FAIL: a drop with malformed rows
aborts and writes nothing (reference semantics). Production feeds often
need the complementary mode — land the parseable rows, quarantine the rest
with a reason, never lose either. This reader provides that split:

- PERMISSIVE parse with ``columnNameOfCorruptRecord``: malformed rows come
  back as NULL-filled rows carrying the RAW line, in the same single pass
  as the good rows (no second read of the drop).
- ``good``: rows that parsed completely (corrupt column NULL), without the
  corrupt column.
- ``bad``: the raw offending lines + source file + a machine-checkable
  reason, ready to append to a quarantine table for replay after the
  producer is fixed.

Both frames come from ONE cached parse, so a 100 TB drop is read once;
the split is two filters over it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_csv_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """(good, bad): schema-conformant rows vs quarantined raw lines.

    ``bad`` columns: ``raw`` (the offending line verbatim), ``src_file``
    (lineage for replay), ``reason``. A row is bad when Spark's PERMISSIVE
    parser populated the corrupt-record column — wrong arity or an
    uncastable value for a declared type. NOTE (Spark contract): filtering
    on the corrupt column requires the parsed frame to be cached first —
    Spark refuses the referenced-only-corrupt-column query otherwise;
    the cache is also what makes good/bad one read instead of two.

    The cached parse is registered with :mod:`cache`'s tracked registry:
    long-lived sessions that ingest many drops call
    ``cache.release_cached()`` after consuming good/bad to free each
    parse, instead of accumulating cached relations for the session
    lifetime.
    """
    from ..cache import tracked_persist

    full = T.StructType(
        [*schema.fields, T.StructField(CORRUPT_COL, T.StringType(), True)]
    )
    parsed = tracked_persist(
        spark.read.schema(full)
        .option("header", header)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
        .withColumn("__src__", F.col("_metadata.file_path"))
    )
    good = (
        parsed.filter(F.col(CORRUPT_COL).isNull())
        .drop(CORRUPT_COL, "__src__")
    )
    bad = parsed.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw"),
        F.col("__src__").alias("src_file"),
        F.lit("malformed: arity or type mismatch vs declared schema").alias(
            "reason"
        ),
    )
    return good, bad

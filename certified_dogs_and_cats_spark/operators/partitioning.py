"""Input-spread helper for CPU-expansion operators.

Operators that multiply per-row work inside the scan stage — k-gram /
shingle explodes, per-row md5 hashing, regex redaction, JSON parsing,
per-pair vector folds — inherit the SCAN's parallelism, because Spark
fuses the expansion into the same whole-stage-codegen stage as the read.
A small input that arrives as one partition (locally: a single-row-group
parquet file, which byte-range splitting cannot parallelize — the one
row group lands in one task and every other split is empty) therefore
serializes the entire expansion on one core.

:func:`spread` round-robin-repartitions the input up to the session's
default parallelism, but ONLY when the input has fewer partitions — at
warehouse scale inputs already carry >= parallelism partitions/files and
the helper is a NO-OP (checking the physical partition count reads plan
metadata, never data). When it does engage, the thing being shuffled is by
construction small (it fit in that few partitions), so the round-robin
exchange is trivial next to the expansion it parallelizes: measured 5x on
winnowing fingerprints at sf0.1 (4.0s -> 0.74s on local[32]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` to ``min_partitions`` (default: the session's
    ``sparkContext.defaultParallelism``) iff it currently has fewer
    partitions; no-op otherwise (and on streaming frames, whose
    partitioning the source controls)."""
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = int(min_partitions or sc.defaultParallelism)
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)

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


def _physical_num_partitions(df: DataFrame) -> int | None:
    """Partition count of ``df``'s physical plan WITHOUT the
    DataFrame->RDD conversion ``df.rdd`` pays (a Python RDD wrapper plus
    an extra deserializer plan per probe). Reads the JVM QueryExecution
    handle directly; ``executedPlan`` is a cached lazy val on the frame's
    own QueryExecution, so the planning work is shared with the frame's
    eventual execution, not duplicated.

    Returns None — "already wide enough, leave it alone" — when the plan
    contains any exchange: a shuffle output already carries
    ``spark.sql.shuffle.partitions`` partitions, and under AQE the
    executed plan is an AdaptiveSparkPlanExec whose ``execute()`` would
    MATERIALIZE the query stages (a real job), which a partition-count
    probe must never do. On the exchange-free scan plans spread() exists
    for, ``execute().getNumPartitions()`` is pure metadata (file splits),
    never a job.
    """
    jplan = df._jdf.queryExecution().executedPlan()
    if _probe_would_execute(jplan):
        return None
    return jplan.execute().getNumPartitions()


def _probe_would_execute(node) -> bool:
    """Structural walk of the JVM plan tree (class names, not the plan's
    rendered string — a column or table identifier containing 'Exchange'
    must not disable spread()). True when probing partition count could
    do real work: any exchange node (post-shuffle width is already the
    shuffle config's), an AdaptiveSparkPlanExec root (execute() would
    materialize query stages), or an expression subquery (execute() waits
    for subquery jobs)."""
    name = node.getClass().getSimpleName()
    if name == "AdaptiveSparkPlanExec" or "Exchange" in name:
        return True
    if node.subqueries().nonEmpty():
        return True
    kids = node.children()
    return any(
        _probe_would_execute(kids.apply(i)) for i in range(kids.size())
    )


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` to ``min_partitions`` (default: the session's
    ``sparkContext.defaultParallelism``) iff it currently has fewer
    partitions; no-op otherwise (and on streaming frames, whose
    partitioning the source controls, and on post-shuffle frames, whose
    width the shuffle config already set)."""
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = int(min_partitions or sc.defaultParallelism)
    current = _physical_num_partitions(df)
    if current is None or current >= target:
        return df
    return df.repartition(target)

"""HLL sketch properties: estimate accuracy and mergeability (the property
that lets per-partition/per-day sketches roll up without raw data)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_hll_estimate_close_to_exact(spark):
    df = spark.range(10000).select(
        (F.col("id") % 5).alias("g"), (F.col("id") % 1357).alias("u")
    )
    rows = (
        df.groupBy("g")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("u")).alias("approx"),
            F.count_distinct("u").alias("exact"),
        )
        .collect()
    )
    for r in rows:
        assert abs(r.approx - r.exact) / r.exact < 0.05


def test_hll_sketches_merge_to_global(spark):
    """union_agg of per-group sketches must estimate the GLOBAL distinct
    set (not the sum of per-group counts — users overlap across groups)."""
    df = spark.range(20000).select(
        (F.col("id") % 4).alias("g"), (F.col("id") % 997).alias("u")
    )
    per_group = df.groupBy("g").agg(F.hll_sketch_agg("u").alias("sk"))
    merged = per_group.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx")
    ).collect()[0].approx
    exact = df.select("u").distinct().count()  # 997
    assert abs(merged - exact) / exact < 0.05
    # Naive per-group sum would be ~4x the truth — mergeability matters.
    summed = sum(
        r.e
        for r in df.groupBy("g")
        .agg(F.count_distinct("u").alias("e"))
        .collect()
    )
    assert summed > 2 * exact

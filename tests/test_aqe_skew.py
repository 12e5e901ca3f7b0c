"""AQE skew-join splitting: the runtime complement to the explicit
salted_join operator — when one shuffle partition dwarfs the others, AQE
splits it across tasks mid-query instead of letting a straggler hold the
stage. Production thresholds detect multi-hundred-MB partitions; these
tests lower them so the toy skew triggers the same machinery."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

CONF = {
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def skew_conf(spark):
    old = {k: spark.conf.get(k, None) for k in CONF}
    for k, v in CONF.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _skewed_rels(spark):
    # 95% of fact rows share key 7; the dim is uniform.
    left = spark.range(0, 100_000).select(
        F.when(F.col("id") % 20 != 0, F.lit(7))
        .otherwise(F.col("id") % 1000)
        .alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    return left, right


def test_aqe_splits_the_skewed_partition(skew_conf):
    left, right = _skewed_rels(skew_conf)
    # A GLOBAL aggregate downstream: a per-key aggregation would demand
    # hash partitioning on k, and AQE declines to split a skewed join
    # whose output partitioning a consumer depends on.
    j = left.join(right, "k").groupBy().agg(
        F.count("*").alias("n"), F.sum("v").alias("sv")
    )
    n = j.collect()[0].n
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan  # the hot partition was split at runtime
    assert n == 100_000


def test_skew_split_result_identical_to_unsplit(skew_conf):
    def agg(spark):
        left, right = _skewed_rels(spark)
        return sorted(
            (r.k, r.n)
            for r in left.join(right, "k")
            .groupBy("k")
            .agg(F.count("*").alias("n"))
            .collect()
        )

    with_split = agg(skew_conf)
    skew_conf.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    assert with_split == agg(skew_conf)

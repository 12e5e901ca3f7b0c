"""spread() contract: engages only on under-partitioned inputs (local
single-row-group files), NO-OP at warehouse partitioning — and never on
streaming frames."""

from __future__ import annotations

from certified_dogs_and_cats_spark.operators.partitioning import spread


def test_spread_engages_on_single_partition_input(spark):
    df = spark.range(0, 1000).coalesce(1)
    out = spread(df)
    assert df.rdd.getNumPartitions() == 1
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert out.count() == 1000


def test_spread_is_noop_on_well_partitioned_input(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(0, 1000).repartition(target)
    out = spread(df)
    assert out is df  # same object: no extra exchange added to the plan
    wide = spark.range(0, 1000).repartition(target * 2)
    assert spread(wide) is wide  # more than enough partitions: untouched


def test_spread_respects_explicit_minimum(spark):
    df = spark.range(0, 100).coalesce(1)
    assert spread(df, min_partitions=4).rdd.getNumPartitions() == 4


def test_spread_noop_on_streaming_frames(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    spark.range(0, 10).write.parquet(src)
    sdf = spark.readStream.schema("id LONG").parquet(src)
    assert spread(sdf) is sdf


def test_spread_probe_never_converts_to_rdd(spark, monkeypatch):
    """The partition probe must read plan metadata, not build a Python
    RDD: df.rdd would add a deserializer plan per call and, under AQE,
    detach from the adaptive plan. Poison the .rdd property to prove
    spread() never touches it."""
    from pyspark.sql import DataFrame

    def boom(self):
        raise AssertionError("spread() must not convert DataFrame -> RDD")

    monkeypatch.setattr(DataFrame, "rdd", property(boom))
    df = spark.range(0, 1000).coalesce(1)
    out = spread(df)
    assert out.count() == 1000
    wide = spark.range(0, 1000).repartition(4)
    assert spread(wide) is wide  # exchange in plan: hands-off no-op


def test_spread_not_fooled_by_exchange_named_column(spark, tmp_path):
    """The probe inspects plan-node CLASSES, not the rendered plan string:
    a parquet scan projecting a column literally named 'ExchangeRate'
    (whose name appears in the plan text) is still an exchange-FREE plan
    and spread() must engage on it."""
    src = str(tmp_path / "fx")
    spark.range(0, 100).selectExpr(
        "id", "CAST(id AS DOUBLE) / 7 AS ExchangeRate"
    ).coalesce(1).write.parquet(src)
    df = spark.read.parquet(src).select("ExchangeRate")
    assert "Exchange" in df._jdf.queryExecution().executedPlan().toString()
    out = spread(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert out.count() == 100

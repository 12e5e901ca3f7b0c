"""configure_for_queries must repair a DRIVER-OWNED session: the driver
hands over its own SparkSession (shuffle.partitions at the 200 default),
and stateful streaming fixes its state-store partition count at plan
time from that conf — 200 Python-worker state partitions per micro-batch
on a 32-core box (the round-9 driver bench showed 16.9 s vs 2.2 s for
streaming_running_totals from exactly this). Batch queries are rescued
by AQE coalescing; streaming is not, so the pin is load-bearing."""

from __future__ import annotations

from certified_dogs_and_cats_spark.session import configure_for_queries


def test_pins_shuffle_partitions_on_foreign_session(spark):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "200")
        configure_for_queries(spark)
        assert spark.conf.get("spark.sql.shuffle.partitions") == str(
            spark.sparkContext.defaultParallelism
        )
        assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_explicit_shuffle_partitions_survive(spark):
    """A deliberately small explicit setting (the repo's own cpus=4
    test sessions) must NOT be stomped back up to the machine's core
    count — only the untouched 200 default is repaired."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        configure_for_queries(spark)
        assert spark.conf.get("spark.sql.shuffle.partitions") == "4"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

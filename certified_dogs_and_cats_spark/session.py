"""SparkSession construction.

Local testing runs a single JVM (``local[N]``); the confs below are chosen to
also be sane on a real multi-executor cluster:

- AQE on: runtime coalescing, skew-join splitting, dynamic join strategy —
  the 100 TB safety net for skewed keys and mis-estimated shuffles.
- ``spark.sql.shuffle.partitions`` sized to the local core count; on a real
  cluster AQE coalesces from a deliberately high initial number instead.
- Session timezone pinned to UTC so timestamp-derived columns (year/day
  truncation) are deterministic and oracle-comparable.
- Arrow enabled for any pandas interchange (extensions use Pandas UDFs).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "certified_dogs_and_cats_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = cpus or default_parallelism()
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # Managed-table warehouse (bucketed tables) out of the repo tree.
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_warehouse"),
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def configure_for_queries(spark: SparkSession) -> SparkSession:
    """Make a driver-provided session deterministic for oracle comparison.

    Only touches runtime-mutable confs (safe on an existing session).

    Documented trade-off (VERDICT r10/r11): ``shuffle.partitions`` is
    repaired only when it reads exactly ``'200'``. The conf API cannot
    distinguish an EXPLICIT user 200 from the untouched default, so a
    caller who deliberately wants 200 must pick a neighboring value
    (199/201) or re-set the conf after calling this; every repo-internal
    session passes an explicit non-200 value, so in practice the repair
    only ever fires on the driver's default session.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # Runtime-mutable and decisive for stateful streaming: the state-store
    # partition count is fixed at plan time from shuffle.partitions, so a
    # driver session left at the 200 default runs 200 Python-worker state
    # partitions per micro-batch on a 32-core box (batch queries are rescued
    # by AQE coalescing; streaming is not). Repair ONLY the untouched
    # default — an explicit setting (the repo's own test/script sessions
    # pass shuffle_partitions=4/8) is a deliberate choice and must survive.
    if spark.conf.get("spark.sql.shuffle.partitions") == "200":
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(spark.sparkContext.defaultParallelism),
        )
    return spark

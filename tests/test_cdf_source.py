"""Python data source streaming the catalog change feed: incremental
AvailableNow drains, change-commit contract, partitioned tables, and
exactly-once resumption from the stream checkpoint."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T
from pyspark.sql.utils import StreamingQueryException

from certified_dogs_and_cats_spark.streaming import run_available_now_memory
from certified_dogs_and_cats_spark.streaming.cdf_source import (
    stream_table_changes,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.IntegerType()),
        T.StructField("v", T.StringType()),
    ]
)


def _drain(catalog, name, ckpt, **kw):
    df = stream_table_changes(catalog, name, **kw)
    return run_available_now_memory(df, ckpt, output_mode="append")


def test_streams_appends_as_inserts(catalog, spark, tmp_path):
    catalog.register("t.feed", SCHEMA)
    catalog.append("t.feed", spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA))
    catalog.append("t.feed", spark.createDataFrame([(3, "c")], SCHEMA))
    got = _drain(catalog, "t.feed", str(tmp_path / "ck")).collect()
    rows = sorted((r.k, r.v, r._change_type, r._commit_version) for r in got)
    assert rows == [
        (1, "a", "insert", 1),
        (2, "b", "insert", 1),
        (3, "c", "insert", 2),
    ]


def test_checkpoint_resumes_incrementally(catalog, spark, tmp_path):
    """A second drain with the SAME checkpoint processes only commits made
    after the first drain — the exactly-once streaming contract (file
    sink: the memory sink cannot recover a checkpoint)."""
    from certified_dogs_and_cats_spark.streaming import run_available_now

    catalog.register("t.inc", SCHEMA)
    catalog.append("t.inc", spark.createDataFrame([(1, "a")], SCHEMA))
    ck, sink = str(tmp_path / "ck"), str(tmp_path / "sink")
    run_available_now(stream_table_changes(catalog, "t.inc"), sink, ck)
    assert [r.k for r in spark.read.parquet(sink).collect()] == [1]
    catalog.append("t.inc", spark.createDataFrame([(2, "b")], SCHEMA))
    run_available_now(stream_table_changes(catalog, "t.inc"), sink, ck)
    got = spark.read.parquet(sink).collect()
    # No duplicate of k=1: the checkpoint advanced past version 1.
    assert sorted(r.k for r in got) == [1, 2]
    assert all(r._commit_version == 2 for r in got if r.k == 2)


def test_starting_version_skips_history(catalog, spark, tmp_path):
    catalog.register("t.sv", SCHEMA)
    catalog.append("t.sv", spark.createDataFrame([(1, "a")], SCHEMA))
    catalog.append("t.sv", spark.createDataFrame([(2, "b")], SCHEMA))
    got = _drain(
        catalog, "t.sv", str(tmp_path / "ck"), starting_version=1
    ).collect()
    assert [(r.k, r._commit_version) for r in got] == [(2, 2)]


def test_change_commit_fails_stream_by_default(catalog, spark, tmp_path):
    catalog.register("t.chg", SCHEMA)
    catalog.append("t.chg", spark.createDataFrame([(1, "a")], SCHEMA))
    catalog.overwrite("t.chg", spark.createDataFrame([(9, "z")], SCHEMA))
    with pytest.raises(StreamingQueryException, match="skipChangeCommits"):
        _drain(catalog, "t.chg", str(tmp_path / "ck"))


def test_skip_change_commits_keeps_tailing(catalog, spark, tmp_path):
    catalog.register("t.skip", SCHEMA)
    catalog.append("t.skip", spark.createDataFrame([(1, "a")], SCHEMA))
    catalog.overwrite("t.skip", spark.createDataFrame([(9, "z")], SCHEMA))
    catalog.append("t.skip", spark.createDataFrame([(2, "b")], SCHEMA))
    got = _drain(
        catalog, "t.skip", str(tmp_path / "ck"), skip_change_commits=True
    ).collect()
    # v1 append + v3 append stream; the v2 overwrite is skipped.
    assert sorted((r.k, r._commit_version) for r in got) == [(1, 1), (2, 3)]


def test_partitioned_table_streams_partition_values(catalog, spark, tmp_path):
    part_schema = T.StructType(
        [*SCHEMA.fields, T.StructField("part", T.StringType())]
    )
    catalog.register("t.pfeed", part_schema, partition_by=("part",))
    catalog.append(
        "t.pfeed",
        spark.createDataFrame([(1, "a", "x"), (2, "b", "y")], part_schema),
    )
    got = _drain(catalog, "t.pfeed", str(tmp_path / "ck")).collect()
    assert sorted((r.k, r.part) for r in got) == [(1, "x"), (2, "y")]


def test_empty_table_streams_nothing(catalog, spark, tmp_path):
    catalog.register("t.empty", SCHEMA)
    got = _drain(catalog, "t.empty", str(tmp_path / "ck")).collect()
    assert got == []


def test_cdc_replication_source_to_replica(catalog, spark, tmp_path):
    """End-to-end CDC replication composed from the engine's own pieces:
    change-feed stream (this source) -> streaming MERGE upsert sink ->
    replica table converges to the source across incremental drains."""
    from certified_dogs_and_cats_spark.streaming import stream_merge_upsert

    catalog.register("t.src_rep", SCHEMA)
    catalog.register("t.replica", SCHEMA)
    catalog.append(
        "t.src_rep", spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA)
    )
    ck = str(tmp_path / "ck")

    def replicate():
        feed = stream_table_changes(catalog, "t.src_rep").select("k", "v")
        stream_merge_upsert(
            feed, catalog, "t.replica", ("k",), ("v",), ck, "replicator"
        )

    replicate()
    assert sorted((r.k, r.v) for r in catalog.table("t.replica").collect()) == [
        (1, "a"),
        (2, "b"),
    ]
    # Incremental: a late append (including a key rewrite arriving as a
    # fresh insert) merges into the replica on the next drain.
    catalog.append(
        "t.src_rep", spark.createDataFrame([(2, "B2"), (3, "c")], SCHEMA)
    )
    replicate()
    assert sorted((r.k, r.v) for r in catalog.table("t.replica").collect()) == [
        (1, "a"),
        (2, "B2"),
        (3, "c"),
    ]


def test_max_versions_per_trigger_bounds_batches(catalog, spark, tmp_path):
    """Rate limiting: with maxVersionsPerTrigger=1 a catch-up over 3
    committed versions splits into one micro-batch per version instead
    of one unbounded batch (offset log files count the batches), and a
    checkpointed restart keeps working."""
    import os

    from certified_dogs_and_cats_spark.streaming import run_available_now
    from certified_dogs_and_cats_spark.streaming.cdf_source import (
        FORMAT_NAME,
        register,
    )

    catalog.register("t.rate", SCHEMA)
    for i in range(3):
        catalog.append(
            "t.rate", spark.createDataFrame([(i, f"r{i}")], SCHEMA)
        )
    register(spark)
    spec = catalog.tables["t.rate"]
    schema = T.StructType(
        [
            *spec.schema.fields,
            T.StructField("_change_type", T.StringType(), False),
            T.StructField("_commit_version", T.IntegerType(), False),
        ]
    )

    def feed():
        return (
            spark.readStream.format(FORMAT_NAME)
            .schema(schema)
            .option("warehouse", catalog.root)
            .option("table", "t.rate")
            .option("maxVersionsPerTrigger", "1")
            .load()
        )

    ck, sink = str(tmp_path / "ck"), str(tmp_path / "sink")
    q = (
        feed()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ck)
        .trigger(processingTime="0 seconds")
        .start()
    )
    import time as _time

    deadline = _time.time() + 60
    while _time.time() < deadline:
        done = False
        try:
            done = (
                spark.read.parquet(sink).count() == 3
            )
        except Exception:
            pass
        if done:
            break
        _time.sleep(0.5)
    q.stop()
    got = sorted(r.k for r in spark.read.parquet(sink).collect())
    assert got == [0, 1, 2]
    # One offset entry per micro-batch: the capped stream needed >= 3.
    offsets = [
        f for f in os.listdir(os.path.join(ck, "offsets"))
        if not f.startswith(".")
    ]
    assert len(offsets) >= 3
    # Restart from the checkpoint still drains new commits.
    catalog.append("t.rate", spark.createDataFrame([(9, "z")], SCHEMA))
    run_available_now(feed(), sink, ck)
    got2 = sorted(r.k for r in spark.read.parquet(sink).collect())
    assert got2 == [0, 1, 2, 9]


def test_partitioned_stream_unescapes_and_nulls(catalog, spark, tmp_path):
    """Escaped partition values stream decoded, and NULL-partition rows
    stream as NULL — not as the Hive sentinel string."""
    part_schema = T.StructType(
        [*SCHEMA.fields, T.StructField("city", T.StringType())]
    )
    catalog.register("t.esc", part_schema, partition_by=("city",))
    catalog.append(
        "t.esc",
        spark.createDataFrame(
            [(1, "a", "New York"), (2, "b", None)], part_schema
        ),
    )
    got = {r.k: r.city for r in _drain(catalog, "t.esc", str(tmp_path / "ck")).collect()}
    assert got == {1: "New York", 2: None}

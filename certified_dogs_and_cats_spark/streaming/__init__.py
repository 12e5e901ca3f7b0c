"""Structured Streaming equivalents of the reference's incremental batch.

The reference (SURVEY §2.9) is daily batch with streaming-shaped
guarantees; this module expresses each of them natively:

- at-most-once per ``ingestion_date`` via control-table check
  (reference ``notebooks/bronze.py:49-56``) → file-source **checkpoint
  offsets**: a re-run with the same checkpoint processes zero new files
  (:func:`available_now_ingest`).
- exactly-once row delivery via ``_id`` anti-join
  (``notebooks/bronze.py:111-115``) → **stateful streaming
  ``dropDuplicates``** keyed on the id (:func:`dedup_stream`).
- latest-wins in-batch dedup (``notebooks/silver.py:81-85``) →
  ``dropDuplicatesWithinWatermark`` semantics (:func:`dedup_stream` with
  a watermark bound so state is reclaimable).
- event-time rollups → watermarked tumbling-window aggregation
  (:func:`windowed_counts`), the streaming face of the gold daily-totals
  view.

Everything runs under ``Trigger.AvailableNow`` — bounded catch-up runs
that drain whatever files exist and stop, which is exactly the
reference's daily-cron shape and also how a 100 TB backfill would be
driven (checkpointed, restartable, no reprocessing). State stores are
per-key and bounded (watermarks bound dedup/window state), so the same
topology runs continuous at scale by swapping the trigger.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_file_stream(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    fmt: str = "csv",
    max_files_per_trigger: int | None = None,
    path_glob: str | None = None,
) -> DataFrame:
    """File-source stream with an explicit schema (never inferred —
    reference reads CSV with a declared StructType, bronze.py:11-19)."""
    reader = spark.readStream.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if path_glob is not None:
        reader = reader.option("pathGlobFilter", path_glob)
    return reader.format(fmt).load(source_dir)


def run_available_now(
    df: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    output_mode: str = "append",
    fmt: str = "parquet",
) -> None:
    """Drain the stream once (Trigger.AvailableNow) into a file sink.

    The checkpoint carries source offsets, so calling this again with the
    same ``checkpoint_dir`` after new files land processes ONLY the new
    files — the streaming analog of the reference's control-table
    at-most-once guard.
    """
    q = (
        df.writeStream.format(fmt)
        .outputMode(output_mode)
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_available_now_memory(
    df: DataFrame, checkpoint_dir: str, output_mode: str = "complete"
) -> DataFrame:
    """Drain the stream into an in-memory table and return it as a
    DataFrame (bounded result surface for verification/queries)."""
    name = "s_" + uuid.uuid4().hex
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = df.sparkSession
    # Pin the (bounded) result and drop the memory-sink registration so
    # repeated drains in one long session don't accumulate result sets
    # in driver memory.
    out = spark.table(name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    return out


def dedup_stream(
    df: DataFrame,
    keys: list[str],
    event_time_col: str | None = None,
    watermark_delay: str = "1 day",
) -> DataFrame:
    """Exactly-once row delivery: stateful dropDuplicates on the key.

    Streaming analog of the reference's ``_id`` anti-join
    (notebooks/bronze.py:111-115). Keep rule: the FIRST row processed
    per key survives (dropDuplicates semantics) — for payload-carrying
    rows where the LATEST must win, dedup in the sink instead
    (operators/windows.py window_dedup_latest over a batch, or
    stream_merge_upsert which updates keys in place). With ``event_time_col`` set, the
    watermark bounds how long a key is remembered
    (``dropDuplicatesWithinWatermark``), keeping state finite on an
    unbounded stream — the scale-safe default. Without it, state grows
    with distinct keys (fine for bounded AvailableNow catch-up runs).
    """
    if event_time_col is not None:
        return df.withWatermark(event_time_col, watermark_delay) \
            .dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


def windowed_counts(
    df: DataFrame,
    event_time_col: str,
    window_duration: str = "1 hour",
    watermark_delay: str = "1 hour",
    group_cols: list[str] | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Watermarked tumbling-window aggregation over event time.

    Late data beyond ``watermark_delay`` is dropped and per-window state
    is finalized — bounded state on an unbounded stream. Counts and a
    DECIMAL-summed value (order-independent, engine-portable totals).
    """
    keys = [
        F.window(F.col(event_time_col), window_duration).start.alias("window_start")
    ] + [F.col(c) for c in (group_cols or [])]
    return (
        df.withWatermark(event_time_col, watermark_delay)
        .groupBy(*keys)
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col(value_col).cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
    )


def stream_append_exactly_once(
    df: DataFrame,
    catalog,
    table: str,
    checkpoint_dir: str,
    stream_id: str,
) -> None:
    """Drain the stream (AvailableNow) into a catalog table with
    exactly-once batches: a ``foreachBatch`` writer that skips any batch
    whose (stream_id, batch_id) txn marker is already in the table's
    commit manifest — Delta's ``txn``/appId+version idempotent-writer
    mechanism over this catalog's log. Structured Streaming re-delivers a
    batch after failure/restart with the SAME batch_id, so the marker
    check turns at-least-once delivery into exactly-once appends.

    Known divergence from Delta: the data write and the manifest commit
    are two steps here, not one atomic log entry, so a crash BETWEEN them
    can duplicate that batch on retry (Delta closes this window by
    committing data + txn action atomically). The offsets checkpoint
    additionally guarantees a COMPLETED batch is never re-read.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if catalog.txn_committed(table, stream_id, batch_id):
            return
        catalog.append(
            table,
            batch_df,
            txn={"stream_id": stream_id, "batch_id": batch_id},
        )

    q = (
        df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_merge_upsert(
    df: DataFrame,
    catalog,
    table: str,
    keys,
    update_cols,
    checkpoint_dir: str,
    stream_id: str,
) -> None:
    """Streaming MERGE: drain the stream (AvailableNow) and upsert each
    micro-batch into a catalog table by key — the foreachBatch + MERGE
    pattern every Delta CDC/upsert pipeline runs, over this catalog's
    join-rewrite merge. Late keys update in place; new keys insert.

    Micro-batches are deduped on the merge keys first (the merge
    contract requires unique source keys) with a DETERMINISTIC pick: the
    max of the non-key columns as a struct — arrival order within a
    batch is undefined, and dropDuplicates' arbitrary keep would let a
    crash-retry of the same batch pick a DIFFERENT row, breaking the
    re-merge-idempotency the exactly-once story relies on. Exactly-once
    via (stream_id, batch_id) txn markers committed ATOMICALLY with the
    merged snapshot (one overwrite commit carries both), so there is no
    window where the data landed but the marker did not.
    """
    from ..operators.joins import merge_upsert

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if catalog.txn_committed(table, stream_id, batch_id):
            return
        key_list = list(keys)
        others = [c for c in batch_df.columns if c not in key_list]
        if others:
            src = (
                batch_df.groupBy(*key_list)
                .agg(F.max(F.struct(*others)).alias("__row"))
                .select(*key_list, "__row.*")
            )
        else:
            src = batch_df.dropDuplicates(key_list)
        # overwrite() stages the new version to a side directory before
        # swapping, so a plan reading the current version is safe; the
        # txn marker rides the same commit.
        merged = merge_upsert(catalog.table(table), src, keys, update_cols)
        catalog.overwrite(
            table,
            merged,
            txn={"stream_id": stream_id, "batch_id": batch_id},
        )

    q = (
        df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

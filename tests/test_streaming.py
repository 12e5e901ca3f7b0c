"""Streaming module: checkpointed exactly-once ingest (at-most-once per
drop, the control-table analog), stateful dedup across micro-batches, and
watermarked windowed aggregation == batch aggregation on bounded input."""

from __future__ import annotations

import csv
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from certified_dogs_and_cats_spark.streaming import (
    dedup_stream,
    read_file_stream,
    run_available_now,
    run_available_now_memory,
    windowed_counts,
)

SCHEMA = T.StructType(
    [
        T.StructField("_id", T.IntegerType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("kind", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def write_csv(src_dir: str, fname: str, rows: list[tuple]) -> None:
    os.makedirs(src_dir, exist_ok=True)
    with open(os.path.join(src_dir, fname), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["_id", "ts", "kind", "value"])
        w.writerows(rows)


ROWS1 = [
    (1, "2026-01-01 10:00:00", "a", 1.0),
    (2, "2026-01-01 10:30:00", "b", 2.0),
    (3, "2026-01-01 11:15:00", "a", 3.0),
]
ROWS2 = [
    (3, "2026-01-01 11:15:00", "a", 3.0),  # duplicate _id from drop 1
    (4, "2026-01-01 12:05:00", "b", 4.0),
]


def test_available_now_ingest_is_exactly_once_per_file(spark, tmp_path):
    src, sink, ck = (str(tmp_path / d) for d in ("src", "sink", "ck"))
    write_csv(src, "d1.csv", ROWS1)

    stream = lambda: read_file_stream(spark, src, SCHEMA, fmt="csv")  # noqa: E731
    run_available_now(stream(), sink, ck)
    assert spark.read.parquet(sink).count() == 3

    # Re-run with the same checkpoint and no new files: nothing reprocessed.
    run_available_now(stream(), sink, ck)
    assert spark.read.parquet(sink).count() == 3

    # A new drop is picked up incrementally — only the new file's rows land.
    write_csv(src, "d2.csv", ROWS2)
    run_available_now(stream(), sink, ck)
    out = spark.read.parquet(sink)
    assert out.count() == 5
    assert out.filter(F.col("_id") == 3).count() == 2  # sink saw the dup row


def test_dedup_stream_is_stateful_across_microbatches(spark, tmp_path):
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    write_csv(src, "d1.csv", ROWS1)
    write_csv(src, "d2.csv", ROWS2)

    # One file per micro-batch forces the duplicate _id=3 into a LATER
    # batch than its first sighting — only cross-batch state can drop it.
    stream = read_file_stream(
        spark, src, SCHEMA, fmt="csv", max_files_per_trigger=1
    )
    out = run_available_now_memory(
        dedup_stream(stream.select("_id"), ["_id"]), ck, output_mode="append"
    )
    assert sorted(r._id for r in out.collect()) == [1, 2, 3, 4]


def test_dedup_stream_with_watermark_bounds_state(spark, tmp_path):
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    write_csv(src, "d1.csv", ROWS1 + ROWS2)
    stream = read_file_stream(spark, src, SCHEMA, fmt="csv")
    out = run_available_now_memory(
        dedup_stream(stream, ["_id"], event_time_col="ts", watermark_delay="1 hour"),
        ck,
        output_mode="append",
    )
    assert sorted(r._id for r in out.collect()) == [1, 2, 3, 4]


def test_windowed_counts_equal_batch_groupby(spark, tmp_path):
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    write_csv(src, "d1.csv", ROWS1 + [r for r in ROWS2 if r[0] != 3])
    stream = read_file_stream(spark, src, SCHEMA, fmt="csv")
    agg = windowed_counts(
        stream, "ts", window_duration="1 hour", group_cols=["kind"]
    )
    got = {
        (str(r.window_start), r.kind): (r.cnt, r.total_value)
        for r in run_available_now_memory(agg, ck, output_mode="complete").collect()
    }
    assert got == {
        ("2026-01-01 10:00:00", "a"): (1, 1.0),
        ("2026-01-01 10:00:00", "b"): (1, 2.0),
        ("2026-01-01 11:00:00", "a"): (1, 3.0),
        ("2026-01-01 12:00:00", "b"): (1, 4.0),
    }


def test_running_totals_state_survives_microbatches(spark, tmp_path):
    """applyInPandasWithState: per-key state must accumulate ACROSS
    micro-batches (one file per trigger), and the last emission per key
    must equal the batch-world aggregate."""
    from certified_dogs_and_cats_spark.streaming.stateful import (
        running_totals,
    )

    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    write_csv(src, "d1.csv", ROWS1)                       # keys 1,2,3
    write_csv(src, "d2.csv", [r for r in ROWS2 if r[0] == 4] * 2)  # key 4 twice
    stream = read_file_stream(
        spark, src, SCHEMA, fmt="csv", max_files_per_trigger=1
    ).select(F.col("_id").cast("long").alias("_id"), "value")
    out = run_available_now_memory(
        running_totals(stream, "_id", "value"), ck, output_mode="update"
    )
    rows = {r._id: (r.n, r.total) for r in out.collect()}
    assert rows[1] == (1, 1.0)
    assert rows[4] == (2, 8.0)  # two rows folded into one key's state


def test_stream_append_exactly_once_batches(spark, catalog, tmp_path):
    """foreachBatch + manifest txn markers: a drained batch appends once;
    re-draining the same checkpoint adds nothing; a re-delivered batch_id
    (simulated retry) is skipped by the txn check."""
    import os

    from pyspark.sql import types as T

    from certified_dogs_and_cats_spark.streaming import (
        read_file_stream,
        stream_append_exactly_once,
    )

    schema = T.StructType(
        [
            T.StructField("k", T.IntegerType()),
            T.StructField("v", T.StringType()),
        ]
    )
    catalog.register("s.sink", schema)
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.csv").write_text("k,v\n1,a\n2,b\n")
    ck = str(tmp_path / "ck")

    stream = read_file_stream(spark, str(src), schema)
    stream_append_exactly_once(stream, catalog, "s.sink", ck, "ingest1")
    assert catalog.table("s.sink").count() == 2

    # Same checkpoint, no new files: nothing re-processed.
    stream_append_exactly_once(
        read_file_stream(spark, str(src), schema),
        catalog,
        "s.sink",
        ck,
        "ingest1",
    )
    assert catalog.table("s.sink").count() == 2

    # Simulated at-least-once retry: batch 0 re-delivered is skipped...
    assert catalog.txn_committed("s.sink", "ingest1", 0)
    before = catalog.current_version("s.sink")
    batch = spark.createDataFrame([(9, "dup")], schema)
    if not catalog.txn_committed("s.sink", "ingest1", 0):
        catalog.append("s.sink", batch, txn={"stream_id": "ingest1", "batch_id": 0})
    assert catalog.table("s.sink").count() == 2
    assert catalog.current_version("s.sink") == before

    # ...while new files through the same checkpoint append exactly once.
    (src / "b.csv").write_text("k,v\n3,c\n")
    stream_append_exactly_once(
        read_file_stream(spark, str(src), schema),
        catalog,
        "s.sink",
        ck,
        "ingest1",
    )
    assert sorted(r.k for r in catalog.table("s.sink").collect()) == [1, 2, 3]


def test_stream_merge_upsert_updates_and_inserts(spark, catalog, tmp_path):
    """foreachBatch + join-rewrite MERGE: streamed keys update matching
    rows and insert new ones; a second drain over the same checkpoint
    changes nothing; in-batch duplicate keys are deduped before merging."""
    from pyspark.sql import types as T

    from certified_dogs_and_cats_spark.streaming import (
        read_file_stream,
        stream_merge_upsert,
    )

    schema = T.StructType(
        [
            T.StructField("k", T.IntegerType()),
            T.StructField("v", T.StringType()),
        ]
    )
    catalog.register("s.dim", schema)
    catalog.append(
        "s.dim", spark.createDataFrame([(1, "old"), (2, "keep")], schema)
    )
    src = tmp_path / "msrc"
    src.mkdir()
    # k=1 updates, k=3 inserts, k=3 duplicated in-batch (deduped pre-merge).
    (src / "a.csv").write_text("k,v\n1,new\n3,ins\n3,ins\n")
    ck = str(tmp_path / "mck")

    stream_merge_upsert(
        read_file_stream(spark, str(src), schema),
        catalog,
        "s.dim",
        keys=["k"],
        update_cols=["v"],
        checkpoint_dir=ck,
        stream_id="merge1",
    )
    rows = {r.k: r.v for r in catalog.table("s.dim").collect()}
    assert rows == {1: "new", 2: "keep", 3: "ins"}

    # Re-drain: offsets checkpoint + txn markers -> no change.
    v_before = catalog.current_version("s.dim")
    stream_merge_upsert(
        read_file_stream(spark, str(src), schema),
        catalog,
        "s.dim",
        keys=["k"],
        update_cols=["v"],
        checkpoint_dir=ck,
        stream_id="merge1",
    )
    assert catalog.current_version("s.dim") == v_before
    assert {r.k: r.v for r in catalog.table("s.dim").collect()} == rows

    # A later file through the same checkpoint merges exactly once.
    (src / "b.csv").write_text("k,v\n2,upd\n")
    stream_merge_upsert(
        read_file_stream(spark, str(src), schema),
        catalog,
        "s.dim",
        keys=["k"],
        update_cols=["v"],
        checkpoint_dir=ck,
        stream_id="merge1",
    )
    assert {r.k: r.v for r in catalog.table("s.dim").collect()} == {
        1: "new",
        2: "upd",
        3: "ins",
    }


def test_stateful_topk_survives_microbatches(spark, tmp_path):
    """stateful_topk (impl='auto'): per-key named state must accumulate
    across micro-batches; the final emission per key equals the
    batch-world top-k. Routed to transformWithStateInPandas where
    protobuf is importable and to the dependency-free
    applyInPandasWithState engine otherwise — the semantics run as a
    REAL assertion in every environment (no skip)."""
    from certified_dogs_and_cats_spark.streaming.stateful import (
        _has_protobuf,
        stateful_topk,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    if _has_protobuf():  # the tws engine requires the RocksDB provider
        spark.conf.set(
            key,
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    try:
        src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
        write_csv(src, "d1.csv", [(1, "a", "2026-01-01 10:00:00", 5.0),
                                  (1, "a", "2026-01-01 10:01:00", 1.0),
                                  (2, "b", "2026-01-01 10:02:00", 7.0)])
        write_csv(src, "d2.csv", [(1, "a", "2026-01-01 11:00:00", 9.0),
                                  (1, "a", "2026-01-01 11:01:00", 3.0),
                                  (2, "b", "2026-01-01 11:02:00", 2.0)])
        stream = read_file_stream(
            spark, src, SCHEMA, fmt="csv", max_files_per_trigger=1
        ).select(F.col("_id").cast("long").alias("_id"), "value")
        out = run_available_now_memory(
            stateful_topk(stream, "_id", "value", k=2), ck,
            output_mode="update",
        )
        # Last emission per key wins (update semantics; collect order is
        # append order, so fold to the final state per key).
        last = {}
        for r in out.collect():
            last[r._id] = list(r.topk)
        assert last[1] == [9.0, 5.0]   # across batches, not within one
        assert last[2] == [7.0, 2.0]
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def test_stateful_topk_tws_dependency_gate(spark):
    """Forcing the transformWithState engine without protobuf raises the
    documented plan-time NotImplementedError (and with protobuf present
    the forced path must plan cleanly) — a real assertion either way."""
    import pytest

    from certified_dogs_and_cats_spark.streaming.stateful import (
        _has_protobuf,
        stateful_topk,
    )

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .selectExpr("value AS _id", "CAST(value AS DOUBLE) AS value")
    )
    if _has_protobuf():
        stateful_topk(stream, "_id", "value", impl="tws")
    else:
        with pytest.raises(NotImplementedError, match="protobuf"):
            stateful_topk(stream, "_id", "value", impl="tws")
    with pytest.raises(ValueError, match="unknown impl"):
        stateful_topk(stream, "_id", "value", impl="magic")


def test_state_store_tracks_keys_not_rows(spark):
    """State-size contract (the STREAMING_STATE.md property, enforced):
    a watermarked tumbling aggregate's state rows equal its GROUP count
    (windows x types — stream-length independent) and streaming dedup's
    state rows equal its distinct KEY count — neither tracks raw input
    rows."""
    import json
    import shutil
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from certified_dogs_and_cats_spark.queries.streaming import (
        _events_stream,
        _with_nanos_conf,
    )
    from certified_dogs_and_cats_spark.streaming import (
        dedup_stream,
        windowed_counts,
    )

    sf = "/root/testdata/sf0.001"

    def drain(df, mode):
        name = "st_" + uuid.uuid4().hex
        ck = tempfile.mkdtemp(prefix="ck_statetest_")
        try:
            q = (
                df.writeStream.format("memory")
                .queryName(name)
                .outputMode(mode)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            progs = [json.loads(p.json) for p in q.recentProgress]
        finally:
            spark.catalog.dropTempView(name)
            shutil.rmtree(ck, ignore_errors=True)
        inp = sum(p.get("numInputRows", 0) for p in progs)
        ops = [p["stateOperators"] for p in progs if p.get("stateOperators")]
        return inp, sum(int(o.get("numRowsTotal", 0)) for o in ops[-1])

    batch = spark.read.parquet(f"{sf}/events.parquet")
    n_rows = batch.count()
    n_groups = (
        batch.select(
            F.window(F.col("ts").cast("timestamp"), "1 hour").start,
            "event_type",
        )
        .distinct()
        .count()
    )
    n_users = batch.select("user_id").distinct().count()

    def run():
        agg = windowed_counts(
            _events_stream(spark, sf),
            "ts",
            window_duration="1 hour",
            watermark_delay="1 hour",
            group_cols=["event_type"],
        )
        inp, state = drain(agg, "complete")
        assert inp == n_rows
        assert state == n_groups < n_rows
        ids = dedup_stream(
            _events_stream(spark, sf).select("user_id"), ["user_id"]
        )
        inp2, state2 = drain(ids, "append")
        assert inp2 == n_rows
        assert state2 == n_users < n_rows

    _with_nanos_conf(spark, run, sf)


def test_timeout_sessions_emit_rules_across_microbatches(spark, tmp_path):
    """timeout_sessions (custom append-mode apws session assembly):
    sessions closed by a later same-key event emit immediately — even
    across micro-batch boundaries (state carry) — while each key's LAST
    open session emits iff the final watermark strictly passes its
    last+gap timer (ms floor), and unclosed tail sessions stay buffered.
    Gap 1h, watermark delay 30min; file mtimes pin the batch order."""
    import time as _time

    from certified_dogs_and_cats_spark.streaming.stateful import (
        timeout_sessions,
    )

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("cents", T.LongType()),
        ]
    )
    src = str(tmp_path / "src")
    os.makedirs(src)

    def write(fname, rows):
        with open(os.path.join(src, fname), "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["user_id", "ts", "cents"])
            w.writerows(rows)

    # batch 1: key 1 opens a session (2 events); key 2 opens one.
    write("b1.csv", [
        (1, "2026-01-01 10:00:00", 5),
        (1, "2026-01-01 10:20:00", 7),
        (2, "2026-01-01 10:00:00", 9),
    ])
    _time.sleep(0.05)
    # batch 2: key 1's 13:00 event is > 1h after 10:20 -> closes the
    # batch-1 session (STATE CARRY: the closed session's bounds come
    # from batch 1); key 2 extends within the gap. max_ts = 13:10.
    # Final watermark = 13:10 - 30min = 12:40.
    #   key 1 open session last=13:00, timer 14:00 > 12:40 -> buffered.
    #   key 2 open session last=10:40, timer 11:40 < 12:40 -> timed out.
    write("b2.csv", [
        (1, "2026-01-01 13:00:00", 11),
        (2, "2026-01-01 10:40:00", 1),
        (1, "2026-01-01 13:10:00", 2),
    ])
    os.utime(os.path.join(src, "b1.csv"), (1000, 1000))
    os.utime(os.path.join(src, "b2.csv"), (2000, 2000))
    stream = read_file_stream(
        spark, src, schema, fmt="csv", max_files_per_trigger=1
    )
    sess = timeout_sessions(
        stream, "user_id", "ts", "cents",
        gap_seconds=3600, watermark_delay="30 minutes",
    )
    out = run_available_now_memory(
        sess, str(tmp_path / "ck"), output_mode="append"
    ).collect()
    got = sorted(
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events,
         r.total_cents)
        for r in out
    )
    us = lambda s: int(  # noqa: E731
        __import__("datetime").datetime.fromisoformat(s)
        .replace(tzinfo=__import__("datetime").timezone.utc)
        .timestamp() * 1_000_000
    )
    assert got == [
        # key 1's batch-1 session, closed by the 13:00 event in batch 2
        (1, us("2026-01-01 10:00:00"), us("2026-01-01 10:20:00"), 2, 12),
        # key 2's session, closed by the event-time timer
        (2, us("2026-01-01 10:00:00"), us("2026-01-01 10:40:00"), 2, 10),
    ]


def test_merge_session_intervals_fold_semantics():
    """The pure fold both timeout_sessions engines share: gap merge,
    close-on-gap-exceeded, late interval forming its own earlier
    session, and the empty/singleton edges."""
    from certified_dogs_and_cats_spark.streaming.stateful import (
        _merge_session_intervals,
    )

    gap = 100
    assert _merge_session_intervals([], gap) == ([], None)
    assert _merge_session_intervals([(5, 5, 1, 2)], gap) == (
        [], (5, 5, 1, 2)
    )
    # within-gap events merge; a later-than-gap event closes and reopens
    closed, open_s = _merge_session_intervals(
        [(0, 0, 1, 1), (50, 50, 1, 2), (300, 300, 1, 4)], gap
    )
    assert closed == [(0, 50, 2, 3)]
    assert open_s == (300, 300, 1, 4)
    # a late event older than the carried open interval sorts first and
    # closes as its OWN session when the open interval arrives
    closed, open_s = _merge_session_intervals(
        [(1000, 1200, 3, 9), (10, 10, 1, 5)], gap
    )
    assert closed == [(10, 10, 1, 5)]
    assert open_s == (1000, 1200, 3, 9)


def test_timeout_sessions_tws_twin_gate_and_equivalence(spark, tmp_path):
    """The transformWithStateInPandas twin of timeout_sessions (VERDICT
    r11 #5): same shared interval fold, timer semantics ported to
    registerTimer/deleteTimer/handleExpiredTimer. Without protobuf the
    forced tws path raises the documented plan-time NotImplementedError
    and impl='auto' builds the apws plan; with protobuf present the twin
    RUNS the emit-rules fixture on the RocksDB provider and must emit
    exactly the rows the apws engine emits — a real assertion in every
    environment, no skips."""
    import time as _time

    import pytest

    from certified_dogs_and_cats_spark.streaming.stateful import (
        _has_protobuf,
        timeout_sessions,
    )

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("cents", T.LongType()),
        ]
    )
    src = str(tmp_path / "src")
    os.makedirs(src)

    def write(fname, rows):
        with open(os.path.join(src, fname), "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["user_id", "ts", "cents"])
            w.writerows(rows)

    # Same shape as the emit-rules fixture: one session closed by a
    # later event (state carry), one closed by the event-time timer,
    # one left buffered.
    write("b1.csv", [
        (1, "2026-01-01 10:00:00", 5),
        (1, "2026-01-01 10:20:00", 7),
        (2, "2026-01-01 10:00:00", 9),
    ])
    _time.sleep(0.05)
    write("b2.csv", [
        (1, "2026-01-01 13:00:00", 11),
        (2, "2026-01-01 10:40:00", 1),
        (1, "2026-01-01 13:10:00", 2),
    ])
    os.utime(os.path.join(src, "b1.csv"), (1000, 1000))
    os.utime(os.path.join(src, "b2.csv"), (2000, 2000))

    def run(impl, ck_name):
        stream = read_file_stream(
            spark, src, schema, fmt="csv", max_files_per_trigger=1
        )
        sess = timeout_sessions(
            stream, "user_id", "ts", "cents",
            gap_seconds=3600, watermark_delay="30 minutes", impl=impl,
        )
        out = run_available_now_memory(
            sess, str(tmp_path / ck_name), output_mode="append"
        ).collect()
        return sorted(
            (r.user_id, r.session_start_us, r.session_end_us, r.n_events,
             r.total_cents)
            for r in out
        )

    apws_rows = run("apws", "ck_apws")
    assert len(apws_rows) == 2  # the emit-rules fixture's known shape

    with pytest.raises(ValueError, match="unknown impl"):
        timeout_sessions(
            spark.readStream.format("rate").load(), "value", "timestamp",
            "value", 60, impl="magic",
        )

    if not _has_protobuf():
        with pytest.raises(NotImplementedError, match="protobuf"):
            run("tws", "ck_tws_gate")
        # auto routes to the dependency-free engine: same rows
        assert run("auto", "ck_auto") == apws_rows
        return
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        assert run("tws", "ck_tws") == apws_rows
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def test_timeout_sessions_late_event_forms_own_session(spark, tmp_path):
    """A cross-batch event OLDER than the open session's start - gap
    (but still above the watermark) must form its own earlier session,
    not stretch the open one — the interval-merge rule in the fold."""
    import time as _time

    from certified_dogs_and_cats_spark.streaming.stateful import (
        timeout_sessions,
    )

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("cents", T.LongType()),
        ]
    )
    src = str(tmp_path / "src")
    os.makedirs(src)

    def write(fname, rows):
        with open(os.path.join(src, fname), "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["user_id", "ts", "cents"])
            w.writerows(rows)

    write("b1.csv", [
        (1, "2026-01-01 10:00:00", 5),
        (1, "2026-01-01 10:30:00", 7),
    ])
    _time.sleep(0.05)
    # 04:00 is 6h before the open session's start (gap 1h) but the
    # 12h watermark delay keeps it above the watermark, so it reaches
    # the fold — and must close as its OWN session, leaving the open
    # session's bounds untouched (it stays buffered: timer 11:30 is
    # never passed by the final watermark 10:30 - 12h).
    write("b2.csv", [(1, "2026-01-01 04:00:00", 3)])
    os.utime(os.path.join(src, "b1.csv"), (1000, 1000))
    os.utime(os.path.join(src, "b2.csv"), (2000, 2000))
    stream = read_file_stream(
        spark, src, schema, fmt="csv", max_files_per_trigger=1
    )
    sess = timeout_sessions(
        stream, "user_id", "ts", "cents",
        gap_seconds=3600, watermark_delay="12 hours",
    )
    out = run_available_now_memory(
        sess, str(tmp_path / "ck"), output_mode="append"
    ).collect()
    assert [(r.n_events, r.total_cents) for r in out] == [(1, 3)]
    assert out[0].session_start_us == out[0].session_end_us

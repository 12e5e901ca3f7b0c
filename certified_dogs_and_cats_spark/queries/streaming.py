"""Structured Streaming queries over the `events` table.

Each query drains a bounded AvailableNow run into a memory sink and
returns the result table, so the driver can verify streaming semantics
against a plain batch SQL oracle: with all data present and a fresh
checkpoint, watermarked streaming aggregation == batch aggregation.

events.ts has shipped as both TIMESTAMP(NANOS) and TIMESTAMP(MICROS)
across driver rounds; like sources.testdata.load_table, the stream
footer-sniffs the file and either reads nanos as raw INT64 (legacy conf
scoped to the bounded run) with an exact floor-division to microseconds,
or declares TIMESTAMP_NTZ and casts to the UTC-pinned session timestamp —
both match DuckDB's CAST(ts AS TIMESTAMP) digits for the testdata.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import configure_for_queries
from ..streaming import (
    dedup_stream,
    read_file_stream,
    run_available_now_memory,
    windowed_counts,
)
from .registry import query

# Checkpoints are throwaway (fresh per call); tmpfs when available keeps
# the WAL/offset fsyncs off disk.
_CK_ROOT = "/dev/shm" if os.path.isdir("/dev/shm") else None

# State-store partition count for the BOUNDED probe streams. The state
# stage spawns one Arrow Python worker (pandas/pyarrow import and all)
# per state partition at stream start, and shuffle.partitions-many state
# partitions is sized for a real cluster, not a bounded local drain over
# O(1000) keys — on a cold 32-partition session the worker spin-up
# dominates the whole query (VERDICT r10 #2). A real deployment sizes
# this to its executor count; the probe pins a small constant. Scoped to
# the stream via _with_stream_partitions (plan reads the conf at start).
_PROBE_STATE_PARTITIONS = 8


def _with_stream_partitions(spark: SparkSession, fn):
    """Run fn (which starts AND drains a bounded stream) with
    shuffle.partitions pinned to the probe's state-partition count,
    restoring the session value after. Safe because
    run_available_now_memory blocks until the drain completes, and the
    partition count never changes results — only where state lives."""
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    spark.conf.set(key, str(_PROBE_STATE_PARTITIONS))
    try:
        return fn()
    finally:
        spark.conf.set(key, prev)


def _drain(stream_df: DataFrame, prefix: str, output_mode: str) -> DataFrame:
    """Run a bounded AvailableNow drain on a throwaway checkpoint and
    remove the checkpoint afterwards (the memory-sink result is held in
    memory, not the checkpoint, so cleanup is safe once the run blocks to
    completion) — repeated bench/correctness sweeps must not accumulate
    tmpfs checkpoints. Every drain runs under the probe state-partition
    pin (_with_stream_partitions): the plan reads shuffle.partitions at
    stream start, and 32 state-store/Python-worker inits per bounded
    probe is session-init cost, not query cost."""
    ck = tempfile.mkdtemp(prefix=prefix, dir=_CK_ROOT)
    try:
        return _with_stream_partitions(
            stream_df.sparkSession,
            lambda: run_available_now_memory(
                stream_df, ck, output_mode=output_mode
            ),
        )
    finally:
        shutil.rmtree(ck, ignore_errors=True)

def _events_schema(sf_dir: str) -> T.StructType:
    from ..sources.testdata import events_ts_kind

    ts_type = (
        T.LongType()  # nanos-as-long
        if events_ts_kind(sf_dir) == "nanos"
        else T.TimestampNTZType()
    )
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.testdata import _normalize_ts

    raw = read_file_stream(
        spark,
        sf_dir,
        _events_schema(sf_dir),
        fmt="parquet",
        path_glob="events.parquet",
    )
    return _normalize_ts(raw)


def _with_nanos_conf(spark: SparkSession, fn, sf_dir: str = None):
    """Run fn with the nanos-as-long legacy conf set when the file needs
    it, restoring the conf after.

    Safe for bounded AvailableNow runs: the conf is read when the stream
    starts, and run_available_now_memory blocks until it finishes.
    """
    if sf_dir is not None:
        from ..sources.testdata import events_ts_kind

        if events_ts_kind(sf_dir) != "nanos":
            return fn()
    key = "spark.sql.legacy.parquet.nanosAsLong"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "true")
    try:
        return fn()
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


@query(
    "streaming_windowed_counts",
    oracle="""
    SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def streaming_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window rollup, drained with AvailableNow.

    Complete output mode: every window is emitted at end of run, so the
    bounded streaming result equals the batch group-by — which is exactly
    the invariant worth pinning (late-data drop only kicks in on data
    later than the watermark, and a bounded replay has none).
    """
    configure_for_queries(spark)

    def run() -> DataFrame:
        agg = windowed_counts(
            _events_stream(spark, sf_dir),
            "ts",
            window_duration="1 hour",
            watermark_delay="1 hour",
            group_cols=["event_type"],
        )
        return _drain(agg, "ck_win_", "complete")

    return _with_nanos_conf(spark, run)


@query(
    "streaming_dedup_ids",
    oracle="SELECT DISTINCT user_id FROM events",
)
def streaming_dedup_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dropDuplicates — exactly-once row delivery per
    key (the streaming analog of bronze's _id anti-join)."""
    configure_for_queries(spark)

    def run() -> DataFrame:
        ids = dedup_stream(
            _events_stream(spark, sf_dir).select("user_id"), ["user_id"]
        )
        return _drain(ids, "ck_dedup_", "append")

    return _with_nanos_conf(spark, run)


@query(
    "streaming_running_totals",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM events GROUP BY user_id
    """,
)
def streaming_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState) oracle-checked:
    per-user running (count, total) folded in per-key state across
    micro-batches; the final emission per key must equal the batch
    aggregate. Values are fixed-pointed to integer cents BEFORE the fold
    so the running float sum is a sum of integers — exact, associative,
    and bit-identical to DuckDB's BIGINT sum regardless of fold order
    (raw float accumulation order differs between engines).
    tests/test_streaming.py covers the multi-batch state-carry path; this
    entry pins end-result correctness."""
    from ..streaming.stateful import running_totals

    configure_for_queries(spark)

    def run() -> DataFrame:
        ev = _events_stream(spark, sf_dir).select(
            "user_id", F.round(F.col("value") * 100).alias("value")
        )
        totals = running_totals(ev, "user_id", "value")
        drained = _drain(totals, "ck_tot_", "update")
        # Update mode emits one row per key per batch it appears in; the
        # final state per key is the row with the largest n (monotone).
        w = Window.partitionBy("user_id").orderBy(F.col("n").desc())
        return (
            drained.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "user_id",
                F.col("n").alias("n_events"),
                F.col("total").cast("bigint").alias("total_cents"),
            )
        )

    return _with_nanos_conf(spark, run)


@query(
    "streaming_enriched_counts",
    oracle="""
    SELECT c.c_mktsegment,
           count(*) AS cnt,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users,
           CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1
    """,
)
def streaming_enriched_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: enrich the event stream with the customer dim
    (stateless — the static side is re-read per micro-batch and broadcast,
    no streaming state), then aggregate per segment in complete mode.
    The canonical shape for dimension lookup on a live stream; fixed-point
    cents keep the total engine-portable."""
    from .common import t as load_table

    configure_for_queries(spark)
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey"), "c_mktsegment"
    )

    def run() -> DataFrame:
        ev = _events_stream(spark, sf_dir).select(
            "user_id", F.round(F.col("value") * 100).alias("cents")
        )
        enriched = ev.join(
            F.broadcast(dim), ev["user_id"] == dim["c_custkey"], "inner"
        )
        # Exact count_distinct is unsupported in streaming aggregation, so
        # pre-aggregate per (segment, user) in the stream and finish the
        # distinct count over the drained (tiny) result.
        pre = enriched.groupBy("c_mktsegment", "user_id").agg(
            F.count("*").alias("cnt"),
            F.sum("cents").cast("long").alias("cents"),
        )
        drained = _drain(pre, "ck_enrich_", "complete")
        return drained.groupBy("c_mktsegment").agg(
            F.sum("cnt").alias("cnt"),
            F.count_distinct("user_id").alias("n_users"),
            F.sum("cents").cast("long").alias("total_cents"),
        )

    return _with_nanos_conf(spark, run)


@query(
    "streaming_session_stats",
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
    ),
    flag AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts > lag(ts) OVER w + INTERVAL 4 HOUR
                  THEN 1 ELSE 0 END AS is_new
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    s AS (
      SELECT user_id, ts, value,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM flag
    )
    SELECT user_id,
           min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM s GROUP BY user_id, session_idx
    """,
)
def streaming_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time session windows (``F.session_window``, 4-hour inactivity
    gap) — the streaming twin of the batch ``sessionize`` operator and the
    one stateful shape the surface lacked: state is a per-key set of open
    sessions that MERGE when a late event bridges two of them, not a fixed
    keyed accumulator. Drained with AvailableNow in complete mode so the
    bounded run must reproduce the batch gap-sessionization exactly; the
    oracle replays it with the same lag/cumsum SQL as `sessionize_stats`.
    Spark's session_window end is last-event-time + gap, so session_end is
    window.end - gap (== max event ts), keeping both engines aligned."""
    configure_for_queries(spark)

    def run() -> DataFrame:
        ev = _events_stream(spark, sf_dir).select(
            "user_id", "ts", "value"
        ).withWatermark("ts", "4 hours")
        agg = ev.groupBy(
            F.session_window("ts", "4 hours"), F.col("user_id")
        ).agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        drained = _drain(agg, "ck_sess_", "complete")
        return drained.select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            (
                F.col("session_window.end") - F.expr("INTERVAL 4 HOURS")
            ).alias("session_end"),
            "n_events",
            "total_value",
        )

    return _with_nanos_conf(spark, run)


@query(
    "streaming_stream_join",
    oracle="""
    WITH v AS (
      SELECT user_id, event_id AS view_id, CAST(ts AS TIMESTAMP) AS view_ts
      FROM events WHERE event_type = 'view'
    ),
    p AS (
      SELECT user_id, event_id AS purchase_id,
             CAST(ts AS TIMESTAMP) AS purchase_ts
      FROM events WHERE event_type = 'purchase'
    ),
    pairs AS (
      SELECT v.user_id, v.view_id, p.purchase_id
      FROM v JOIN p ON p.user_id = v.user_id
       AND p.purchase_ts >= v.view_ts
       AND p.purchase_ts <= v.view_ts + INTERVAL 4 HOUR
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT purchase_id) AS BIGINT) AS n_purchases
    FROM pairs GROUP BY user_id
    """,
)
def streaming_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM inner join — view->purchase attribution within a
    4-hour window, both sides unbounded streams. The state-management
    shape batch can't express: each side buffers rows until the other
    side's watermark passes the join-condition time bound, so state is
    provably reclaimable (the time-range predicate is what makes the
    buffer finite — an unbounded-condition stream-stream join would grow
    forever). Inner joins emit on match, so a bounded AvailableNow drain
    equals the batch join, which the oracle replays."""
    configure_for_queries(spark)

    def run() -> DataFrame:
        views = (
            _events_stream(spark, sf_dir)
            .filter(F.col("event_type") == "view")
            .select(
                F.col("user_id").alias("v_user"),
                F.col("event_id").alias("view_id"),
                F.col("ts").alias("view_ts"),
            )
            .withWatermark("view_ts", "4 hours")
        )
        purchases = (
            _events_stream(spark, sf_dir)
            .filter(F.col("event_type") == "purchase")
            .select(
                F.col("user_id").alias("p_user"),
                F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("purchase_ts"),
            )
            .withWatermark("purchase_ts", "4 hours")
        )
        pairs = views.join(
            purchases,
            F.expr(
                "v_user = p_user AND purchase_ts >= view_ts "
                "AND purchase_ts <= view_ts + INTERVAL 4 HOURS"
            ),
        )
        drained = _drain(pairs, "ck_ssj_", "append")
        return drained.groupBy(F.col("v_user").alias("user_id")).agg(
            F.count("*").alias("n_pairs"),
            F.count_distinct("purchase_id").alias("n_purchases"),
        )

    return _with_nanos_conf(spark, run)


@query(
    "hopping_window_counts",
    oracle="""
    SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP))
             - o * INTERVAL 1 HOUR AS window_start,
           event_type,
           count(*) AS cnt
    FROM events, UNNEST([0, 1]) AS u(o)
    GROUP BY 1, 2
    """,
)
def hopping_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) windows: 2-hour windows every 1 hour, so each
    event lands in exactly length/slide = 2 windows — F.window with a
    slideDuration expands map-side (no self-join), one shuffle of grouped
    counts. The oracle replays the expansion with an explicit 2-offset
    unnest. Batch twin of the streaming tumbling-window query; the same
    expression streams unchanged."""
    from ..sources.testdata import load_table

    ev = load_table(spark, sf_dir, "events").select("ts", "event_type")
    return ev.groupBy(
        F.window("ts", "2 hours", "1 hour").start.alias("window_start"),
        "event_type",
    ).agg(F.count("*").alias("cnt"))


@query(
    "resample_ffill_6h",
    oracle="""
    WITH ev AS (
      SELECT user_id,
             CAST(floor(floor(epoch(ts)) / 21600) AS BIGINT) AS b,
             ts, value
      FROM events WHERE user_id < 5
    ),
    latest AS (
      SELECT user_id, b, value AS v FROM (
        SELECT user_id, b, value,
               row_number() OVER (
                 PARTITION BY user_id, b
                 ORDER BY ts DESC, value DESC
               ) AS rn
        FROM ev
      ) WHERE rn = 1
    ),
    spans AS (
      SELECT user_id, min(b) AS lo, max(b) AS hi FROM latest GROUP BY 1
    ),
    grid AS (
      SELECT s.user_id, gs.g AS b
      FROM spans s, LATERAL (
        SELECT unnest(generate_series(s.lo, s.hi)) AS g
      ) gs
    )
    SELECT g.user_id,
           CAST(g.b * 21600 AS BIGINT) AS bucket_epoch,
           last_value(l.v IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.b
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS value,
           l.user_id IS NOT NULL AS is_observed
    FROM grid g LEFT JOIN latest l ON g.user_id = l.user_id AND g.b = l.b
    """,
)
def resample_ffill_6h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill resampling under the oracle: dense 6-hour grid per user
    (sequence-explode, never an event join), latest-in-bucket reduction,
    forward fill with observed flags — the operator every metrics
    pipeline needs, replayed value-for-value in SQL (generate_series
    grid + IGNORE NULLS window). Two key-wise shuffles total."""
    from ..operators.resample import resample_ffill
    from .common import t

    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("user_id") < 5)
        .select("user_id", "ts", "value")
    )
    out = resample_ffill(ev, "user_id", "ts", "value", step_seconds=21600)
    return out.select(
        "user_id",
        F.col("bucket_start").cast("long").alias("bucket_epoch"),
        "value",
        "is_observed",
    )


@query(
    "streaming_stream_join_outer",
    oracle="""
    WITH v AS (
      SELECT user_id, event_id AS view_id, CAST(ts AS TIMESTAMP) AS view_ts
      FROM events WHERE event_type = 'view'
    ),
    p AS (
      SELECT user_id, event_id AS purchase_id,
             CAST(ts AS TIMESTAMP) AS purchase_ts
      FROM events WHERE event_type = 'purchase'
    ),
    th AS (
      SELECT least((SELECT max(view_ts) FROM v),
                   (SELECT max(purchase_ts) FROM p))
             - INTERVAL 9 HOUR AS cutoff
    ),
    j AS (
      SELECT v.user_id, v.view_id, p.purchase_id
      FROM v LEFT JOIN p ON p.user_id = v.user_id
       AND p.purchase_ts >= v.view_ts
       AND p.purchase_ts <= v.view_ts + INTERVAL 4 HOUR
      WHERE v.view_ts < (SELECT cutoff FROM th)
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(purchase_id) AS BIGINT) AS n_matched,
           CAST(count(*) FILTER (WHERE purchase_id IS NULL) AS BIGINT)
             AS n_unconverted
    FROM j GROUP BY user_id
    """,
)
def streaming_stream_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM LEFT OUTER join: views that never convert within the
    4-hour window must still emit (with NULL purchase) — but only AFTER
    the watermark proves no future purchase can match. That makes outer
    emission watermark-gated: with a bounded AvailableNow drain, the final
    watermark is min(max view_ts, max purchase_ts) - 4h delay, so only
    views whose entire match window closed before it are GUARANTEED to
    have emitted. Both engine and oracle therefore restrict to views older
    than that data-derived cutoff (9h = 4h join bound + 4h delay + 1h
    boundary margin) — the deterministic-comparable slice of an
    inherently watermark-dependent result. The cutoff is computed from the
    batch table in a single tiny pre-aggregate (guard-style driver
    action, not a data-path collect)."""
    from ..sources.testdata import load_table

    configure_for_queries(spark)
    ev = load_table(spark, sf_dir, "events").select("ts", "event_type")
    bounds = (
        ev.groupBy()
        .agg(
            F.max(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
                "mv"
            ),
            F.max(
                F.when(F.col("event_type") == "purchase", F.col("ts"))
            ).alias("mp"),
        )
        .collect()[0]
    )
    cutoff = min(bounds.mv, bounds.mp) - __import__("datetime").timedelta(
        hours=9
    )

    def run() -> DataFrame:
        views = (
            _events_stream(spark, sf_dir)
            .filter(F.col("event_type") == "view")
            .select(
                F.col("user_id").alias("v_user"),
                F.col("event_id").alias("view_id"),
                F.col("ts").alias("view_ts"),
            )
            .withWatermark("view_ts", "4 hours")
        )
        purchases = (
            _events_stream(spark, sf_dir)
            .filter(F.col("event_type") == "purchase")
            .select(
                F.col("user_id").alias("p_user"),
                F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("purchase_ts"),
            )
            .withWatermark("purchase_ts", "4 hours")
        )
        pairs = views.join(
            purchases,
            F.expr(
                "v_user = p_user AND purchase_ts >= view_ts "
                "AND purchase_ts <= view_ts + INTERVAL 4 HOURS"
            ),
            "left_outer",
        )
        drained = _drain(pairs, "ck_ssjo_", "append")
        return (
            drained.filter(F.col("view_ts") < F.lit(cutoff))
            .groupBy(F.col("v_user").alias("user_id"))
            .agg(
                F.count("*").alias("n_rows"),
                F.count("purchase_id").alias("n_matched"),
                F.count(
                    F.when(F.col("purchase_id").isNull(), F.lit(1))
                ).alias("n_unconverted"),
            )
        )

    return _with_nanos_conf(spark, run, sf_dir)


@query(
    "streaming_late_drop",
    oracle="""
    WITH e AS (
      SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events
    ),
    bounds AS (
      SELECT max(ts) - INTERVAL 2 DAY AS wm,
             max(ts) - INTERVAL 23 DAY AS strag_cut
      FROM e
    ),
    ontime AS (
      SELECT ts, event_type FROM e, bounds
      WHERE NOT (event_id % 11 = 0 AND ts < bounds.strag_cut)
    )
    SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS cnt
    FROM ontime, bounds
    WHERE CAST(CAST(ts AS DATE) AS TIMESTAMP) + INTERVAL 1 DAY <= bounds.wm
    GROUP BY 1, 2
    """,
)
def streaming_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The watermark behavior none of the single-batch drains can show:
    LATE DATA IS DROPPED. Events are split into four files replayed as
    four ordered micro-batches (maxFilesPerTrigger=1, modification times
    pinned ascending): three on-time tranches in event-time order, then a
    straggler file whose rows are all >23 days older than the stream's
    maximum event time — old enough that EVERY prefix of the replay has
    already closed their windows, so the result does not depend on how
    the runtime lags watermark updates across micro-batches. With a 2-day watermark in APPEND mode, every
    straggler arrives after its day-window's state was finalized and is
    discarded, and only windows the final watermark closed are emitted.
    The oracle replays BOTH rules in closed form — counts exclude the
    straggler subset, windows cut at max(ts) - 2 days — so a stream that
    leaks late rows into finalized windows, or emits unclosed windows,
    fails rows+hash."""
    import glob as _glob
    from datetime import timedelta

    from ..sources.testdata import load_table

    configure_for_queries(spark)
    e = load_table(spark, sf_dir, "events").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "event_type"
    )
    mx = e.agg(F.max("ts")).first()[0]
    strag_cut = mx - timedelta(days=23)
    t1 = mx - timedelta(days=20)
    t2 = mx - timedelta(days=10)
    strag = (F.col("event_id") % 11 == 0) & (F.col("ts") < F.lit(strag_cut))
    tranches = [
        ~strag & (F.col("ts") < F.lit(t1)),
        ~strag & (F.col("ts") >= F.lit(t1)) & (F.col("ts") < F.lit(t2)),
        ~strag & (F.col("ts") >= F.lit(t2)),
        strag,
    ]
    src = tempfile.mkdtemp(prefix="cdc_late_src_")
    try:
        base_t = 1_700_000_000
        for i, cond in enumerate(tranches):
            part_dir = os.path.join(src, f"_stage{i}")
            e.filter(cond).coalesce(1).write.parquet(part_dir)
            part = _glob.glob(os.path.join(part_dir, "part-*.parquet"))[0]
            dst = os.path.join(src, f"f{i}.parquet")
            os.replace(part, dst)
            shutil.rmtree(part_dir, ignore_errors=True)
            # The file source orders new files by modification time: pin
            # an ascending sequence so the replay order is the design,
            # not filesystem luck.
            os.utime(dst, (base_t + i, base_t + i))
        schema = T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                T.StructField("ts", T.TimestampType()),
                T.StructField("event_type", T.StringType()),
            ]
        )
        stream = read_file_stream(
            spark,
            src,
            schema,
            fmt="parquet",
            max_files_per_trigger=1,
            path_glob="f*.parquet",
        )
        agg = (
            stream.withWatermark("ts", "2 days")
            .groupBy(F.window("ts", "1 day"), "event_type")
            .agg(F.count("*").cast("bigint").alias("cnt"))
        )
        res = _drain(agg, "ck_late_", "append")
        out = res.select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "cnt",
        )
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(src, ignore_errors=True)


# timeout_sessions probe constants: 4-hour inactivity gap (the session
# family's), 2-hour watermark delay.
_SESS_GAP_S = 4 * 3600
_SESS_DELAY_MS = 2 * 3600 * 1000


@query(
    "streaming_timeout_sessions",
    oracle=f"""
    WITH e AS (
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    mx AS (SELECT max(us) AS max_us FROM e),
    flag AS (
      SELECT user_id, us, cents,
             CASE WHEN lag(us) OVER w IS NULL
                    OR us - lag(us) OVER w > {_SESS_GAP_S * 1_000_000}
                  THEN 1 ELSE 0 END AS is_new
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)
    ),
    s AS (
      SELECT user_id, us, cents,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY us
                               ROWS UNBOUNDED PRECEDING) AS idx
      FROM flag
    ),
    sess AS (
      SELECT user_id, idx,
             min(us) AS session_start_us, max(us) AS session_end_us,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(cents) AS BIGINT) AS total_cents
      FROM s GROUP BY 1, 2
    ),
    ranked AS (
      SELECT sess.*, row_number() OVER (PARTITION BY user_id
                                        ORDER BY idx DESC) AS rk
      FROM sess
    )
    SELECT user_id, session_start_us, session_end_us, n_events, total_cents
    FROM ranked, mx
    WHERE rk > 1
       OR (session_end_us + {_SESS_GAP_S * 1_000_000}) // 1000
            < (mx.max_us // 1000) - {_SESS_DELAY_MS}
    """,
)
def streaming_timeout_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom APPEND-mode session assembly with event-time-timeout
    eviction (streaming/stateful.py:timeout_sessions) — the operator a
    team writes when session CLOSE is the trigger for side effects,
    where `session_window` (streaming_session_stats) only yields
    aggregate rows in complete mode. The oracle replays BOTH emission
    rules in closed form, pinned by boundary probes against the real
    engine: a session followed by a later same-key session closes
    in-batch unconditionally; each key's LAST session emits iff its
    event-time timer fired, i.e. (last_us + gap)//1000 ms is STRICTLY
    below the final watermark floor(max_us/1000) ms - delay. A run that
    leaks unclosed tail sessions, or drops batch-closed ones, fails
    rows+hash. State is one open session per key (4 longs); per
    micro-batch cost is one key shuffle.

    SINGLE-DATA-BATCH ASSUMPTION (ADVICE r11): the oracle replays every
    event, but applyInPandasWithState drops rows below the watermark —
    the in-batch close rule matches only because the whole table arrives
    in ONE micro-batch (one events.parquet file, no maxFilesPerTrigger
    split). A multi-file or out-of-order source would drop late events
    the oracle still counts; the precondition is asserted below instead
    of diverging silently if the testdata layout ever changes."""
    from ..streaming.stateful import timeout_sessions

    configure_for_queries(spark)
    assert os.path.isfile(os.path.join(sf_dir, "events.parquet")), (
        "streaming_timeout_sessions' oracle assumes a single-file "
        "events source (one data micro-batch); got a multi-file layout"
    )

    def run() -> DataFrame:
        ev = _events_stream(spark, sf_dir).select(
            "user_id",
            F.col("ts").cast("timestamp").alias("ts"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        sess = timeout_sessions(
            ev, "user_id", "ts", "cents", gap_seconds=_SESS_GAP_S
        )
        return _drain(sess, "ck_tosess_", "append")

    return _with_nanos_conf(spark, run, sf_dir)

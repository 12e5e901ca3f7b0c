"""Lakehouse metadata scaling probe (VERDICT r7 ask #5).

The catalog's claims — file-level CDF resolution, metadata-sized commit
claims, O(change) incremental-MV refresh, stacked-DV reads — are
pytest-proven for small histories but were never growth-probed. This
script drives ONE table through two commit-history lengths (N and 4N)
and reports how each metadata path's cost scales with commit count:

- append commit overhead (the non-Spark part of a 1-row append) early
  vs late in the history — flat means the log write is O(change);
- head snapshot read planning (``table()``) vs history length;
- CDF tail (``changes`` over the last 10 commits) vs history length —
  the file-level-resolution claim: cost ∝ change, not history;
- CDF full replay (``changes(0)``) — linear in commits by definition,
  reported as the baseline;
- OCC txn idempotency check (``txn_committed``) vs history length;
- time travel to an early version vs history length;
- stacked deletion vectors: read cost at 0 vs K stacked DVs;
- IncrementalAggregate.refresh after a 10-commit delta vs history.

Each measurement is wall-clock over a real action (df.count() for
reads). Ratios close to 1.0 between the N and 4N runs mean
history-length independence; the commit-overhead and full-replay rows
are expected to grow and say so.

Usage: python scripts/scaling_lakehouse.py [N] >> SCALING.md
(default N=250, so the long run is ~1000 commits).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T

from certified_dogs_and_cats_spark.pipeline.catalog import Catalog
from certified_dogs_and_cats_spark.pipeline.incremental import (
    IncrementalAggregate,
)
from certified_dogs_and_cats_spark.session import get_spark

SCHEMA = T.StructType(
    [
        T.StructField("k", T.IntegerType()),
        T.StructField("grp", T.StringType()),
        T.StructField("amt", T.DoubleType()),
    ]
)


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def drive(spark, n_commits: int) -> dict[str, float]:
    root = tempfile.mkdtemp(prefix=f"lh_probe_{n_commits}_")
    try:
        cat = Catalog(spark, root)
        cat.register("p.t", SCHEMA)
        batch = spark.createDataFrame(
            [(i, f"g{i % 5}", float(i)) for i in range(10)], SCHEMA
        ).coalesce(1)
        # --- append overhead, early vs late ---------------------------
        early = timed(
            lambda: [cat.append("p.t", batch) for _ in range(10)]
        ) / 10
        for _ in range(n_commits - 20):
            cat.append("p.t", batch)
        late = timed(
            lambda: [cat.append("p.t", batch) for _ in range(10)]
        ) / 10
        v = cat.current_version("p.t")
        out: dict[str, float] = {
            "append_early_s": early,
            "append_late_s": late,
            "versions": v,
        }
        # --- snapshot / time travel / CDF / txn ------------------------
        out["head_read_s"] = timed(lambda: cat.table("p.t").count())
        out["time_travel_v5_s"] = timed(
            lambda: cat.table("p.t", version=5).count()
        )
        out["cdf_tail10_s"] = timed(
            lambda: cat.changes("p.t", from_version=v - 10).count()
        )
        out["cdf_full_s"] = timed(
            lambda: cat.changes("p.t", from_version=0).count()
        )
        out["txn_check_s"] = timed(
            lambda: [
                cat.txn_committed("p.t", "probe", i) for i in range(100)
            ]
        ) / 100
        out["load_log_s"] = timed(
            lambda: [cat._load_log("p.t") for _ in range(100)]
        ) / 100
        # --- stacked deletion vectors ----------------------------------
        for i in range(10):
            cat.delete_where("p.t", f"k = {i}")
        out["read_10_dvs_s"] = timed(lambda: cat.table("p.t").count())
        # --- incremental MV refresh over a 10-commit delta --------------
        cat.register(
            "p.mv",
            T.StructType(
                [
                    T.StructField("grp", T.StringType()),
                    T.StructField("cnt", T.LongType()),
                    T.StructField("total", T.DoubleType()),
                ]
            ),
        )
        mv = IncrementalAggregate(cat, "p.t", "p.mv", ("grp",), "amt")
        mv.refresh()  # initial full build (not measured)
        for _ in range(10):
            cat.append("p.t", batch)
        out["mv_refresh_10_commits_s"] = timed(mv.refresh)
        # --- log size on disk -------------------------------------------
        def _meta_bytes() -> int:
            total = 0
            for dirpath, _dirs, files in os.walk(cat._meta_dir("p.t")):
                total += sum(
                    os.path.getsize(os.path.join(dirpath, f)) for f in files
                )
            return total

        out["log_bytes"] = _meta_bytes()
        # --- checkpoint-bounded hot paths after retention expiry --------
        # Once vacuum ages the pre-checkpoint commit files out, the hot
        # log view (commit claiming, head reads, txn checks) is bounded
        # by checkpoint_interval, not history — the Delta checkpoint +
        # log-cleanup contract.
        cat.vacuum("p.t", 0)
        out["load_log_post_vacuum_s"] = timed(
            lambda: [cat._load_log("p.t") for _ in range(100)]
        ) / 100
        out["txn_check_post_vacuum_s"] = timed(
            lambda: [
                cat.txn_committed("p.t", "probe", i) for i in range(100)
            ]
        ) / 100
        out["log_bytes_post_vacuum"] = _meta_bytes()
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 250
    spark = get_spark("lakehouse_probe", cpus=4, shuffle_partitions=4)
    a = drive(spark, n)
    b = drive(spark, 4 * n)
    print()
    print(f"## Lakehouse metadata scaling: {n} vs {4 * n} commits")
    print()
    print("One table driven through two commit-history lengths"
          " (scripts/scaling_lakehouse.py); ratio = long/short — ~1.0"
          " means history-length independent, 4.0 tracks the 4x commit"
          " count. `append_late` within each run vs `append_early` shows"
          " in-run growth of the commit path itself.")
    print()
    print("| metric | short | long | ratio |")
    print("|---|---|---|---|")
    for key in (
        "append_early_s",
        "append_late_s",
        "head_read_s",
        "time_travel_v5_s",
        "cdf_tail10_s",
        "cdf_full_s",
        "txn_check_s",
        "load_log_s",
        "read_10_dvs_s",
        "mv_refresh_10_commits_s",
        "log_bytes",
        "load_log_post_vacuum_s",
        "txn_check_post_vacuum_s",
        "log_bytes_post_vacuum",
    ):
        ratio = b[key] / a[key] if a[key] else float("inf")
        fmt = (
            (lambda x: f"{x:,.0f}")
            if key.startswith("log_bytes")
            else (lambda x: f"{x:.4f}")
        )
        print(f"| {key} | {fmt(a[key])} | {fmt(b[key])} | {ratio:.2f}x |")
    spark.stop()


if __name__ == "__main__":
    main()

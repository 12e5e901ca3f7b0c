"""Focused bench: time a subset of registered queries with the SAME
methodology as bench.py (sf0.001 warmup, noop sink, interleaved best-of-N)
plus optional extra session confs — the inner loop of an optimization
round, where re-running all ~250 queries per experiment would waste hours.

Usage:
  python scripts/bench_subset.py [-r N] [-c k=v ...] query [query ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from certified_dogs_and_cats_spark.cache import BUILD_SECONDS, release_cached
from certified_dogs_and_cats_spark.queries import QUERIES
from certified_dogs_and_cats_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-r", "--repeats", type=int, default=3)
    ap.add_argument("-c", "--conf", action="append", default=[])
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench_subset")
    for kv in args.conf:
        k, v = kv.split("=", 1)
        spark.conf.set(k, v)
    spark.sparkContext.setLogLevel("ERROR")
    names = args.queries
    for name in names:
        QUERIES[name](spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()
        release_cached()
    spark.catalog.clearCache()
    BUILD_SECONDS.clear()
    best = {n: float("inf") for n in names}
    for _ in range(args.repeats):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_subset:{name}")
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best[name] = min(best[name], time.time() - t0)
            release_cached()
            spark.catalog.clearCache()
    for name in names:
        print(f"{best[name]:8.3f}  {name}")
    if BUILD_SECONDS:
        print("builds:", {k: round(v, 3) for k, v in BUILD_SECONDS.items()})
    print(f"{sum(best.values()):8.3f}  TOTAL")


if __name__ == "__main__":
    main()

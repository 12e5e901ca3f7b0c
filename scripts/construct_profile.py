"""Split each registered query's wall time into DataFrame CONSTRUCTION
(Python-side plan building — Py4J round-trips, analysis) vs EXECUTION
(the noop-sink write). Construction cost is pure driver/Python-boundary
overhead (guide §4/§5): it scales with expression-tree size, not data,
and is the dominant term for small-sf bench entries built from hundreds
of Column-object calls.

Usage: python scripts/construct_profile.py [sf_dir] [query ...]
Writes nothing; prints one line per query sorted by construct seconds.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from certified_dogs_and_cats_spark.cache import BUILD_SECONDS, release_cached
from certified_dogs_and_cats_spark.queries import QUERIES
from certified_dogs_and_cats_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = sys.argv[2:]
    names = only or list(QUERIES)
    spark = get_spark("construct_profile")
    spark.sparkContext.setLogLevel("ERROR")
    # Warmup pass (JIT + codegen caches), same as bench.py.
    for name in names:
        try:
            QUERIES[name](spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception:  # noqa: BLE001
            pass
        release_cached()
    spark.catalog.clearCache()
    BUILD_SECONDS.clear()
    rows = []
    for name in names:
        best_c, best_e = float("inf"), float("inf")
        for _ in range(2):
            t0 = time.time()
            try:
                df = QUERIES[name](spark, sf_dir)
                t1 = time.time()
                df.write.format("noop").mode("overwrite").save()
                t2 = time.time()
            except Exception as exc:  # noqa: BLE001
                print(f"{name}: ERROR {exc}")
                break
            finally:
                release_cached()
                spark.catalog.clearCache()
            best_c = min(best_c, t1 - t0)
            best_e = min(best_e, t2 - t1)
        else:
            rows.append((best_c, best_e, name))
    rows.sort(reverse=True)
    tot_c = sum(r[0] for r in rows)
    tot_e = sum(r[1] for r in rows)
    print(f"TOTAL construct={tot_c:.1f}s exec={tot_e:.1f}s n={len(rows)}")
    for c, e, name in rows:
        print(f"{c:7.3f} {e:7.3f}  {name}")


if __name__ == "__main__":
    main()

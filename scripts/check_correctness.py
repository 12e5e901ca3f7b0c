"""Local stand-in for the driver's correctness gate.

Runs every registered query on Spark and its oracle on DuckDB at the given
sf dir, compares row count, column names, and order-insensitive values
(exact equality after stringify-and-sort — stricter than a hash, same idea).

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from certified_dogs_and_cats_spark.cache import release_cached
from certified_dogs_and_cats_spark.queries import ORACLE, QUERIES
from certified_dogs_and_cats_spark.session import get_spark
from certified_dogs_and_cats_spark.sources.testdata import TESTDATA_TABLES


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = repr(v)
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check_correctness", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            # Release any frames the query persist()ed (dedup shingles):
            # a full-registry sweep must not accumulate executor cache.
            release_cached()
            spark.catalog.clearCache()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in ORACLE:
            print(f"skip  {name}: no oracle ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(ORACLE[name])
            dcols = list(rel.columns)
            drows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        ok = True
        msgs = []
        if sorted(scols) != sorted(dcols):
            ok = False
            msgs.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            ok = False
            msgs.append(f"rows spark={len(srows)} duck={len(drows)}")
        if ok:
            _, sn = normalize(srows, scols)
            _, dn = normalize(drows, dcols)
            if sn != dn:
                ok = False
                diff = [
                    (a, b) for a, b in zip(sn, dn) if a != b
                ][:3]
                msgs.append(f"values differ, first diffs: {diff}")
        status = "ok   " if ok else "FAIL "
        if not ok:
            failures.append(name)
        print(f"{status} {name} ({len(srows)} rows, {time.time()-t0:.1f}s)"
              + ("  " + "; ".join(msgs) if msgs else ""))
    print(f"\n{len(QUERIES) - len(failures)}/{len(QUERIES)} queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

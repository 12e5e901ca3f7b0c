"""Dump `.explain("formatted")` snapshots + a one-line plan-shape summary
(Exchange count, join strategies, Python-eval nodes, codegen spans) for the
named queries — the before/after evidence artifacts of an optimization
round.

Usage: python scripts/plan_snapshot.py <out_dir> <suffix> <query> [...]
e.g.   python scripts/plan_snapshot.py plans/r12 before bfs_depth_histogram
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from certified_dogs_and_cats_spark.cache import release_cached
from certified_dogs_and_cats_spark.plans import plan_text, wholestage_codegen_count
from certified_dogs_and_cats_spark.queries import QUERIES
from certified_dogs_and_cats_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def summarize(txt: str) -> str:
    n_ex = len(re.findall(r"\bExchange\b", txt))
    joins = re.findall(
        r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)\b",
        txt,
    )
    py = re.findall(
        r"\b(BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|"
        r"FlatMapGroupsInPandas)\b",
        txt,
    )
    aggs = len(re.findall(r"\bHashAggregate\b", txt))
    sorts = len(re.findall(r"\bSort\b", txt))
    return (
        f"exchanges={n_ex} joins={','.join(joins) or '-'} "
        f"python={','.join(py) or '-'} hashagg={aggs} sort={sorts}"
    )


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan_snapshot")
    for name in names:
        try:
            df = QUERIES[name](spark, SF_DIR)
            txt = plan_text(df, "formatted")
            cg = wholestage_codegen_count(df)
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {exc}")
            continue
        finally:
            release_cached()
            spark.catalog.clearCache()
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"{name}: codegen_spans={cg} {summarize(txt)}")


if __name__ == "__main__":
    main()

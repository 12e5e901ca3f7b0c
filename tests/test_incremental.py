"""Incremental materialized-view maintenance: delta application must be
equivalent to full re-aggregation across appends, overwrites (deletes),
idle refreshes, and crash replays."""

from __future__ import annotations

from pyspark.sql import types as T

from certified_dogs_and_cats_spark.pipeline.catalog import Catalog
from certified_dogs_and_cats_spark.pipeline.incremental import (
    IncrementalAggregate,
)

SCHEMA = T.StructType(
    [
        T.StructField("grp", T.StringType(), False),
        T.StructField("amt", T.DoubleType(), True),
    ]
)


def _mk(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.register("core.src", SCHEMA)
    return cat


def _rows(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _snapshot(cat):
    return sorted(
        (r.grp, r.cnt, round(r.total, 6))
        for r in cat.table("core.agg").collect()
    )


def _expected(cat):
    from pyspark.sql import functions as F

    return sorted(
        (r.grp, r.cnt, round(r.total, 6))
        for r in cat.table("core.src")
        .groupBy("grp")
        .agg(F.count("*").alias("cnt"), F.sum("amt").alias("total"))
        .collect()
    )


def test_incremental_matches_full_reaggregation(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    view = IncrementalAggregate(cat, "core.src", "core.agg", ("grp",), "amt")
    cat.append("core.src", _rows(spark, [("a", 1.0), ("a", 2.0), ("b", 5.0)]))
    assert view.refresh() == 3
    assert _snapshot(cat) == _expected(cat) == [("a", 2, 3.0), ("b", 1, 5.0)]
    # Idle refresh applies nothing.
    assert view.refresh() == 0
    # More appends accumulate.
    cat.append("core.src", _rows(spark, [("b", 1.0), ("c", 7.0)]))
    assert view.refresh() == 2
    assert _snapshot(cat) == _expected(cat)
    # An overwrite (delete+insert changes) subtracts groups that shrank
    # and drops groups that emptied.
    cat.overwrite("core.src", _rows(spark, [("a", 2.0), ("c", 7.0)]))
    assert view.refresh() > 0
    assert _snapshot(cat) == _expected(cat) == [("a", 1, 2.0), ("c", 1, 7.0)]


def test_crash_between_commit_and_ack_is_repaired(spark, tmp_path):
    """If the aggregate snapshot committed but the cursor ack was lost,
    the next refresh must fast-forward, not double-apply the delta."""
    cat = _mk(spark, tmp_path)
    view = IncrementalAggregate(cat, "core.src", "core.agg", ("grp",), "amt")
    cat.append("core.src", _rows(spark, [("a", 1.0)]))
    view.refresh()
    cat.append("core.src", _rows(spark, [("a", 1.0)]))
    view.refresh()
    assert _snapshot(cat) == [("a", 2, 2.0)]
    # Simulate the crash: roll the cursor back to before the last refresh
    # (the committed cdc_applied watermark stays at the later version).
    import json
    import os

    path = cat._cursor_path("core.src", view.consumer)
    with open(path, "w") as f:
        json.dump({"version": 1, "ts_ns": 0}, f)
    fresh = IncrementalAggregate(cat, "core.src", "core.agg", ("grp",), "amt")
    assert fresh.refresh() == 0  # repaired: nothing re-applied
    assert _snapshot(cat) == [("a", 2, 2.0)]
    # New source commits still flow after the repair.
    cat.append("core.src", _rows(spark, [("b", 3.0)]))
    assert fresh.refresh() == 1
    assert _snapshot(cat) == _expected(cat)


def test_two_views_over_one_source(spark, tmp_path):
    """Maintenance cursors are keyed by destination, so two views over the
    same source tail the feed independently — neither starves the other."""
    from pyspark.sql import functions as F

    cat = _mk(spark, tmp_path)
    v1 = IncrementalAggregate(cat, "core.src", "core.agg", ("grp",), "amt")
    v2 = IncrementalAggregate(cat, "core.src", "core.agg2", ("grp",), "amt")
    cat.append("core.src", _rows(spark, [("a", 1.0), ("b", 2.0)]))
    assert v1.refresh() == 2
    assert v2.refresh() == 2  # v1's refresh must not consume v2's feed
    assert _snapshot(cat) == _expected(cat)
    assert sorted(
        (r.grp, r.cnt, round(r.total, 6))
        for r in cat.table("core.agg2").collect()
    ) == _expected(cat)


def test_randomized_op_sequence_stays_equivalent(spark, tmp_path):
    """A pseudo-random interleaving of appends, shrinking overwrites, and
    refreshes must keep the incremental view identical to a full
    re-aggregation at every refresh point."""
    import random

    rng = random.Random(7)
    cat = _mk(spark, tmp_path)
    view = IncrementalAggregate(cat, "core.src", "core.agg", ("grp",), "amt")
    live: list[tuple[str, float]] = []
    for step in range(8):
        op = rng.choice(["append", "append", "overwrite", "refresh"])
        if op == "append":
            batch = [
                (rng.choice("abcd"), float(rng.randint(1, 9)))
                for _ in range(rng.randint(1, 4))
            ]
            live += batch
            cat.append("core.src", _rows(spark, batch))
        elif op == "overwrite" and live:
            live = [r for r in live if rng.random() > 0.4]
            cat.overwrite("core.src", _rows(spark, live))
        else:
            view.refresh()
            assert _snapshot(cat) == _expected(cat), f"diverged at step {step}"
    view.refresh()
    assert _snapshot(cat) == _expected(cat)


def test_null_group_key_accumulates_not_duplicates(catalog, spark):
    """NULL is a real GROUP BY group: two refreshes each inserting a
    NULL-keyed row must accumulate into ONE (NULL, 2) row — SQL equality
    in the merge join would never match NULL=NULL and duplicate it."""
    import pyspark.sql.types as T

    from certified_dogs_and_cats_spark.pipeline.incremental import (
        IncrementalAggregate,
    )

    schema = T.StructType(
        [
            T.StructField("grp", T.StringType()),
            T.StructField("amt", T.DoubleType()),
        ]
    )
    catalog.register("t.nullsrc", schema)
    agg = IncrementalAggregate(
        catalog, "t.nullsrc", "t.nulldst", ("grp",), "amt"
    )
    catalog.append("t.nullsrc", spark.createDataFrame([(None, 1.0)], schema))
    agg.refresh()
    catalog.append("t.nullsrc", spark.createDataFrame([(None, 2.0)], schema))
    agg.refresh()
    rows = [(r.grp, r.cnt, r.total) for r in catalog.table("t.nulldst").collect()]
    assert rows == [(None, 2, 3.0)]


def test_no_net_change_commit_advances_cursor(catalog, spark):
    """A compact (no row changes) must be acked, not re-diffed forever."""
    import pyspark.sql.types as T

    from certified_dogs_and_cats_spark.pipeline.incremental import (
        IncrementalAggregate,
    )

    schema = T.StructType(
        [
            T.StructField("grp", T.StringType()),
            T.StructField("amt", T.DoubleType()),
        ]
    )
    catalog.register("t.cmsrc", schema)
    agg = IncrementalAggregate(catalog, "t.cmsrc", "t.cmdst", ("grp",), "amt")
    catalog.append(
        "t.cmsrc", spark.createDataFrame([("a", 1.0), ("a", 2.0)], schema)
    )
    agg.refresh()
    pos = agg._cursor.position()
    catalog.compact("t.cmsrc")
    assert agg.refresh() == 0
    assert agg._cursor.position() > pos  # acked past the compact commit
    # And idempotent thereafter.
    assert agg.refresh() == 0

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


# -- IncrementalExtrema: MIN/MAX with delete-triggered group recompute --------


def _ext_snapshot(cat):
    return sorted(
        (r.grp, r.cnt, r.vmin, r.vmax)
        for r in cat.table("core.ext").collect()
    )


def _ext_expected(cat):
    from pyspark.sql import functions as F

    return sorted(
        (r.grp, r.cnt, r.vmin, r.vmax)
        for r in cat.table("core.src")
        .groupBy("grp")
        .agg(
            F.count("*").alias("cnt"),
            F.min("amt").alias("vmin"),
            F.max("amt").alias("vmax"),
        )
        .collect()
    )


def test_extrema_insert_only_cheap_path(spark, tmp_path):
    from certified_dogs_and_cats_spark.pipeline.incremental import (
        IncrementalExtrema,
    )

    cat = _mk(spark, tmp_path)
    view = IncrementalExtrema(cat, "core.src", "core.ext", ("grp",), "amt")
    cat.append("core.src", _rows(spark, [("a", 1.0), ("a", 5.0), ("b", 3.0)]))
    assert view.refresh() == 3
    assert _ext_snapshot(cat) == _ext_expected(cat) == [
        ("a", 2, 1.0, 5.0),
        ("b", 1, 3.0, 3.0),
    ]
    cat.append("core.src", _rows(spark, [("a", 0.5), ("b", 9.0)]))
    view.refresh()
    assert _ext_snapshot(cat) == _ext_expected(cat) == [
        ("a", 3, 0.5, 5.0),
        ("b", 2, 3.0, 9.0),
    ]
    assert view.refresh() == 0


def test_extrema_delete_of_min_recomputes_group(spark, tmp_path):
    """Deleting the stored minimum must surface the NEXT-smallest value —
    the case a subtract-style merge cannot handle."""
    from certified_dogs_and_cats_spark.pipeline.incremental import (
        IncrementalExtrema,
    )

    cat = _mk(spark, tmp_path)
    view = IncrementalExtrema(cat, "core.src", "core.ext", ("grp",), "amt")
    cat.append(
        "core.src",
        _rows(spark, [("a", 1.0), ("a", 5.0), ("a", 3.0), ("b", 2.0)]),
    )
    view.refresh()
    # overwrite drops a's min (1.0) and b entirely
    cat.overwrite("core.src", _rows(spark, [("a", 5.0), ("a", 3.0)]))
    view.refresh()
    assert _ext_snapshot(cat) == _ext_expected(cat) == [("a", 2, 3.0, 5.0)]


def test_extrema_delete_and_insert_same_refresh(spark, tmp_path):
    """One refresh carrying both deletes and inserts for the same group:
    the recompute at the watermark snapshot must reflect both."""
    from certified_dogs_and_cats_spark.pipeline.incremental import (
        IncrementalExtrema,
    )

    cat = _mk(spark, tmp_path)
    view = IncrementalExtrema(cat, "core.src", "core.ext", ("grp",), "amt")
    cat.append("core.src", _rows(spark, [("a", 1.0), ("a", 7.0)]))
    view.refresh()
    cat.overwrite("core.src", _rows(spark, [("a", 7.0), ("a", 4.0), ("c", 2.0)]))
    view.refresh()
    assert _ext_snapshot(cat) == _ext_expected(cat) == [
        ("a", 2, 4.0, 7.0),
        ("c", 1, 2.0, 2.0),
    ]


def test_extrema_watermark_version_not_newer_snapshot(spark, tmp_path):
    """A commit AFTER the polled range must not leak into the recompute
    (recompute reads the source AT the watermark, else its rows would
    apply twice — once early via the recompute, once via their own
    delta on the next refresh)."""
    from certified_dogs_and_cats_spark.pipeline.incremental import (
        IncrementalExtrema,
    )

    cat = _mk(spark, tmp_path)
    view = IncrementalExtrema(cat, "core.src", "core.ext", ("grp",), "amt")
    cat.append("core.src", _rows(spark, [("a", 1.0), ("a", 5.0)]))
    view.refresh()
    cat.overwrite("core.src", _rows(spark, [("a", 5.0)]))  # delete the min
    view.refresh()
    assert _ext_snapshot(cat) == [("a", 1, 5.0, 5.0)]
    # next commit after the applied watermark
    cat.append("core.src", _rows(spark, [("a", 0.1)]))
    view.refresh()
    assert _ext_snapshot(cat) == _ext_expected(cat) == [("a", 2, 0.1, 5.0)]


def test_extrema_mv_through_ddl_with_rewrite(spark, tmp_path):
    """CREATE MATERIALIZED VIEW ... MIN/MAX shape through the SQL front
    door, REFRESH applies deltas, and the matching SELECT is served from
    the MV when (and only when) its watermark is current."""
    from certified_dogs_and_cats_spark.pipeline import Catalog, DdlSession

    cat = _mk(spark, tmp_path)
    ddl = DdlSession(cat)
    ddl.execute("USE SCHEMA core")
    cat.append("core.src", _rows(spark, [("a", 1.0), ("a", 5.0), ("b", 2.0)]))
    ddl.execute(
        "CREATE MATERIALIZED VIEW ext AS SELECT grp, COUNT(*) AS cnt, "
        "MIN(amt) AS vmin, MAX(amt) AS vmax FROM src GROUP BY grp"
    )
    rows = sorted(
        (r.grp, r.cnt, r.vmin, r.vmax)
        for r in ddl.execute(
            "SELECT grp, COUNT(*) AS cnt, MIN(amt) AS vmin, "
            "MAX(amt) AS vmax FROM src GROUP BY grp"
        )[-1].collect()
    )
    assert rows == [("a", 2, 1.0, 5.0), ("b", 1, 2.0, 2.0)]
    # stale MV must fall through to the real aggregation, then refresh
    cat.overwrite("core.src", _rows(spark, [("a", 5.0)]))
    rows = sorted(
        (r.grp, r.cnt, r.vmin, r.vmax)
        for r in ddl.execute(
            "SELECT grp, COUNT(*) AS cnt, MIN(amt) AS vmin, "
            "MAX(amt) AS vmax FROM src GROUP BY grp"
        )[-1].collect()
    )
    assert rows == [("a", 1, 5.0, 5.0)]
    ddl.execute("REFRESH MATERIALIZED VIEW ext")
    assert _ext_snapshot_named(cat, "core.ext") == [("a", 1, 5.0, 5.0)]


def _ext_snapshot_named(cat, name):
    return sorted(
        (r.grp, r.cnt, r.vmin, r.vmax) for r in cat.table(name).collect()
    )


def test_mv_rewrite_bails_under_governance(spark, tmp_path):
    """A current MV must NOT serve a matching SELECT once the source has
    a row filter or column mask: the backing table was built ungoverned,
    so the rewrite would leak policy-hidden rows / unmasked values. The
    query must fall through to the governed scan (same gate as the
    count(*) fast path)."""
    from certified_dogs_and_cats_spark.pipeline import DdlSession

    cat = _mk(spark, tmp_path)
    ddl = DdlSession(cat)
    ddl.execute("USE SCHEMA core")
    cat.append(
        "core.src", _rows(spark, [("a", 1.0), ("a", 5.0), ("b", 2.0)])
    )
    ddl.execute(
        "CREATE MATERIALIZED VIEW agg AS SELECT grp, COUNT(*) AS cnt, "
        "SUM(amt) AS total FROM src GROUP BY grp"
    )
    sel = "SELECT grp, COUNT(*) AS cnt, SUM(amt) AS total FROM src GROUP BY grp"
    # MV current, no policy: rewrite serves the full aggregate.
    rows = sorted((r.grp, r.cnt, r.total) for r in ddl.execute(sel)[-1].collect())
    assert rows == [("a", 2, 6.0), ("b", 1, 2.0)]
    # Row filter set: the same SELECT must reflect only policy-visible rows.
    ddl.execute("ALTER TABLE src SET ROW FILTER (grp = 'a')")
    rows = sorted((r.grp, r.cnt, r.total) for r in ddl.execute(sel)[-1].collect())
    assert rows == [("a", 2, 6.0)]
    ddl.execute("ALTER TABLE src DROP ROW FILTER")
    # Column mask on the value column: aggregates must see masked values.
    ddl.execute("ALTER TABLE src ALTER COLUMN amt SET MASK (0.0)")
    rows = sorted((r.grp, r.cnt, r.total) for r in ddl.execute(sel)[-1].collect())
    assert rows == [("a", 2, 0.0), ("b", 1, 0.0)]
    ddl.execute("ALTER TABLE src ALTER COLUMN amt DROP MASK")
    # Policies dropped: the rewrite is sound again and serves the MV.
    rows = sorted((r.grp, r.cnt, r.total) for r in ddl.execute(sel)[-1].collect())
    assert rows == [("a", 2, 6.0), ("b", 1, 2.0)]

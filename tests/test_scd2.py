"""SCD Type 2 dimension maintenance (pipeline/scd.py): validity chains,
update pairs, deletes, multi-version batches, point-in-time reads, and
crash repair."""

from __future__ import annotations

from pyspark.sql import types as T

from certified_dogs_and_cats_spark.pipeline.catalog import Catalog
from certified_dogs_and_cats_spark.pipeline.scd import Scd2Dimension

SCHEMA = T.StructType(
    [
        T.StructField("k", T.IntegerType(), False),
        T.StructField("city", T.StringType(), True),
    ]
)


def _mk(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.register("core.src", SCHEMA)
    return cat


def _rows(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _dim(cat):
    return sorted(
        (r.k, r.city, r.valid_from, r.valid_to, r.is_current)
        for r in cat.table("core.dim").collect()
    )


def test_initial_load_then_update_closes_and_opens(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    dim = Scd2Dimension(cat, "core.src", "core.dim", ("k",), ("city",))
    cat.append("core.src", _rows(spark, [(1, "nyc"), (2, "sf")]))  # v1
    assert dim.refresh() == 2
    assert _dim(cat) == [
        (1, "nyc", 1, None, True),
        (2, "sf", 1, None, True),
    ]
    # update k=1 via overwrite (delete+insert pair at v2)
    cat.overwrite("core.src", _rows(spark, [(1, "boston"), (2, "sf")]))
    dim.refresh()
    assert _dim(cat) == [
        (1, "boston", 2, None, True),
        (1, "nyc", 1, 2, False),
        (2, "sf", 1, None, True),
    ]


def test_delete_closes_without_opening(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    dim = Scd2Dimension(cat, "core.src", "core.dim", ("k",), ("city",))
    cat.append("core.src", _rows(spark, [(1, "nyc")]))
    dim.refresh()
    cat.overwrite("core.src", _rows(spark, []))  # delete k=1 at v2
    dim.refresh()
    assert _dim(cat) == [(1, "nyc", 1, 2, False)]


def test_multi_version_batch_builds_full_chain(spark, tmp_path):
    """Three source commits applied in ONE refresh must produce the same
    validity chain as three separate refreshes (the set-based lead
    window, not a per-commit loop)."""
    cat = _mk(spark, tmp_path)
    dim = Scd2Dimension(cat, "core.src", "core.dim", ("k",), ("city",))
    cat.append("core.src", _rows(spark, [(1, "nyc")]))           # v1
    cat.overwrite("core.src", _rows(spark, [(1, "boston")]))      # v2
    cat.overwrite("core.src", _rows(spark, [(1, "chicago")]))     # v3
    dim.refresh()
    assert _dim(cat) == [
        (1, "boston", 2, 3, False),
        (1, "chicago", 3, None, True),
        (1, "nyc", 1, 2, False),
    ]


def test_point_in_time_view(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    dim = Scd2Dimension(cat, "core.src", "core.dim", ("k",), ("city",))
    cat.append("core.src", _rows(spark, [(1, "nyc")]))           # v1
    cat.overwrite("core.src", _rows(spark, [(1, "boston")]))      # v2
    dim.refresh()
    assert [(r.k, r.city) for r in dim.at_version(1).collect()] == [
        (1, "nyc")
    ]
    assert [(r.k, r.city) for r in dim.at_version(2).collect()] == [
        (1, "boston")
    ]


def test_incremental_equals_batch_rebuild(spark, tmp_path):
    """Refresh-per-commit and one-shot refresh over the same history
    must produce identical dimensions."""
    cat = _mk(spark, tmp_path)
    inc = Scd2Dimension(cat, "core.src", "core.dim", ("k",), ("city",))
    cat.append("core.src", _rows(spark, [(1, "nyc"), (2, "sf")]))
    inc.refresh()
    cat.overwrite("core.src", _rows(spark, [(1, "boston"), (2, "sf")]))
    inc.refresh()
    cat.overwrite("core.src", _rows(spark, [(1, "boston"), (3, "la")]))
    inc.refresh()
    batch = Scd2Dimension(cat, "core.src", "core.dim2", ("k",), ("city",))
    batch.refresh()
    a = _dim(cat)
    b = sorted(
        (r.k, r.city, r.valid_from, r.valid_to, r.is_current)
        for r in cat.table("core.dim2").collect()
    )
    assert a == b


def test_crash_between_commit_and_ack_is_repaired(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    dim = Scd2Dimension(cat, "core.src", "core.dim", ("k",), ("city",))
    cat.append("core.src", _rows(spark, [(1, "nyc")]))
    dim.refresh()
    # simulate crash: rewind the cursor below the committed watermark
    cat.change_cursor("core.src", dim.consumer).ack(0)
    dim2 = Scd2Dimension(cat, "core.src", "core.dim", ("k",), ("city",))
    assert dim2.refresh() == 0  # fast-forward, no double-apply
    assert _dim(cat) == [(1, "nyc", 1, None, True)]

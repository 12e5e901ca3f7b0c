"""Merge-on-read DELETE via deletion vectors: no data-file rewrite,
stacked deletes, time travel, change-feed integration, compaction
materialization, and partial-rewrite survival."""

from __future__ import annotations

import os

from pyspark.sql import types as T

from certified_dogs_and_cats_spark.pipeline.catalog import Catalog

SCHEMA = T.StructType(
    [
        T.StructField("k", T.IntegerType(), False),
        T.StructField("grp", T.StringType(), True),
        T.StructField("v", T.DoubleType(), True),
    ]
)


def _mk(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.register("core.t", SCHEMA)
    return cat


def _rows(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _ks(df):
    return sorted(r.k for r in df.collect())


def test_delete_where_is_merge_on_read(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    cat.append(
        "core.t", _rows(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "a", 3.0)])
    )
    files_before = set(cat._data_files(cat.tables["core.t"].path))
    n = cat.delete_where("core.t", "grp = 'a'")
    assert n == 2
    assert _ks(cat.table("core.t")) == [2]
    # MERGE-ON-READ: not a single data file was rewritten or removed.
    assert set(cat._data_files(cat.tables["core.t"].path)) == files_before
    # The delete is a normal version: time travel reads the pre-delete rows.
    assert _ks(cat.table("core.t", version=1)) == [1, 2, 3]
    assert _ks(cat.table("core.t", version=2)) == [2]


def test_stacked_deletes_and_noop(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    cat.append(
        "core.t",
        _rows(spark, [(i, "g", float(i)) for i in range(1, 6)]),
    )
    assert cat.delete_where("core.t", "k = 1") == 1
    assert cat.delete_where("core.t", "k <= 3") == 2  # 1 already gone
    assert _ks(cat.table("core.t")) == [4, 5]
    # No matches: no commit, no version bump.
    v = cat.current_version("core.t")
    assert cat.delete_where("core.t", "k = 99") == 0
    assert cat.current_version("core.t") == v


def test_deletes_survive_appends(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    cat.append("core.t", _rows(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
    cat.delete_where("core.t", "k = 1")
    cat.append("core.t", _rows(spark, [(3, "c", 3.0)]))
    # The tombstone still applies after the append commit.
    assert _ks(cat.table("core.t")) == [2, 3]


def test_delete_appears_in_change_feed(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    cat.append("core.t", _rows(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
    cat.delete_where("core.t", "k = 1")
    feed = sorted(
        (r.k, r._change_type, r._commit_version)
        for r in cat.changes("core.t", from_version=1).collect()
    )
    assert feed == [(1, "delete", 2)]


def test_compact_materializes_and_resets_dv(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    cat.append(
        "core.t", _rows(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "a", 3.0)])
    )
    cat.delete_where("core.t", "grp = 'a'")
    cat.compact("core.t")
    assert _ks(cat.table("core.t")) == [2]
    m = cat._load_manifest("core.t")
    assert m[-1]["action"] == "overwrite"
    assert m[-1].get("dv", []) == []  # DV set reset by the full rewrite


def test_copy_on_write_path_still_available(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    cat.append("core.t", _rows(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
    files_before = set(cat._data_files(cat.tables["core.t"].path))
    n = cat.delete_where("core.t", "k = 1", rewrite=True)
    assert n == 1
    assert _ks(cat.table("core.t")) == [2]
    assert set(cat._data_files(cat.tables["core.t"].path)) != files_before


def test_dv_on_partitioned_table_and_partial_overwrite(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.register("core.p", SCHEMA, partition_by=("grp",))
    cat.append(
        "core.p",
        _rows(
            spark,
            [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0), (4, "b", 4.0)],
        ),
    )
    cat.delete_where("core.p", "k = 3")
    assert _ks(cat.table("core.p")) == [1, 2, 4]
    # Replace only partition 'a': the tombstone on untouched partition 'b'
    # must survive the partial rewrite.
    cat.overwrite_partitions("core.p", _rows(spark, [(9, "a", 9.0)]))
    assert _ks(cat.table("core.p")) == [4, 9]


def test_tblproperties_routes_delete_to_dv(spark, tmp_path):
    """Delta's own spelling: a table created with
    TBLPROPERTIES ('delta.enableDeletionVectors' = 'true') takes the
    merge-on-read path for DELETE FROM; without it, copy-on-write."""
    from certified_dogs_and_cats_spark.pipeline import DdlSession

    cat = Catalog(spark, str(tmp_path / "wh"))
    ddl = DdlSession(cat)
    ddl.execute(
        "USE SCHEMA core;"
        "CREATE TABLE dvt (k INT, grp STRING) USING DELTA "
        "TBLPROPERTIES ('delta.enableDeletionVectors' = 'true');"
        "INSERT INTO dvt VALUES (1, 'a'), (2, 'b'), (3, 'a');"
    )
    files_before = set(cat._data_files(cat.tables["core.dvt"].path))
    ddl.execute("DELETE FROM dvt WHERE grp = 'a'")
    assert sorted(r.k for r in cat.table("core.dvt").collect()) == [2]
    # Merge-on-read: data files untouched, delete is a DV commit.
    assert set(cat._data_files(cat.tables["core.dvt"].path)) == files_before
    assert cat._load_manifest("core.dvt")[-1]["action"] == "delete"
    # Unconditional DELETE through the DV path empties the table too.
    ddl.execute("DELETE FROM dvt")
    assert cat.table("core.dvt").count() == 0


def test_update_where_is_merge_on_read(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    cat.append(
        "core.t", _rows(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "a", 3.0)])
    )
    files_before = set(cat._data_files(cat.tables["core.t"].path))
    n = cat.update_where("core.t", {"v": "v * 10"}, "grp = 'a'")
    assert n == 2
    got = {r.k: r.v for r in cat.table("core.t").collect()}
    assert got == {1: 10.0, 2: 2.0, 3: 30.0}
    # Old files untouched; only the updated copies were added.
    assert files_before < set(cat._data_files(cat.tables["core.t"].path))
    m = cat._load_manifest("core.t")
    assert m[-1]["action"] == "update"
    # One atomic commit: pre-update snapshot intact, feed = delete+insert.
    assert {r.k: r.v for r in cat.table("core.t", version=1).collect()} == {
        1: 1.0,
        2: 2.0,
        3: 3.0,
    }
    feed = sorted(
        (r.k, r.v, r._change_type)
        for r in cat.changes("core.t", from_version=1).collect()
    )
    assert feed == [
        (1, 1.0, "delete"),
        (1, 10.0, "insert"),
        (3, 3.0, "delete"),
        (3, 30.0, "insert"),
    ]
    # Simultaneous-SET semantics + no-match no-op.
    assert cat.update_where("core.t", {"v": "v + 1"}, "k = 99") == 0


def test_update_where_respects_prior_tombstones_and_constraints(
    spark, tmp_path
):
    import pytest as _pytest

    from certified_dogs_and_cats_spark.pipeline.catalog import (
        ConstraintViolation,
    )

    cat = _mk(spark, tmp_path)
    cat.append("core.t", _rows(spark, [(1, "a", 1.0), (2, "a", 2.0)]))
    cat.delete_where("core.t", "k = 1")
    # The tombstoned row must not resurrect as an updated copy.
    assert cat.update_where("core.t", {"v": "v * 10"}, "grp = 'a'") == 1
    assert {r.k: r.v for r in cat.table("core.t").collect()} == {2: 20.0}
    cat.add_constraint("core.t", "v_pos", "v >= 0")
    with _pytest.raises(ConstraintViolation):
        cat.update_where("core.t", {"v": "-1.0"}, "k = 2")
    assert {r.k: r.v for r in cat.table("core.t").collect()} == {2: 20.0}


def test_ddl_update_routes_to_dv(spark, tmp_path):
    from certified_dogs_and_cats_spark.pipeline import DdlSession

    cat = Catalog(spark, str(tmp_path / "wh"))
    ddl = DdlSession(cat)
    ddl.execute(
        "USE SCHEMA core;"
        "CREATE TABLE dvu (k INT, v DOUBLE) USING DELTA "
        "TBLPROPERTIES ('delta.enableDeletionVectors' = 'true');"
        "INSERT INTO dvu VALUES (1, 1.0), (2, 2.0);"
    )
    ddl.execute("UPDATE dvu SET v = v + 0.5 WHERE k = 1")
    assert {r.k: r.v for r in cat.table("core.dvu").collect()} == {
        1: 1.5,
        2: 2.0,
    }
    assert cat._load_manifest("core.dvu")[-1]["action"] == "update"


def test_vacuum_prunes_unreferenced_dv_sidecars(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    cat.append("core.t", _rows(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
    cat.delete_where("core.t", "k = 1")
    dvdir = cat._dv_dir("core.t")
    assert len(os.listdir(dvdir)) == 1
    # Live (head-referenced) sidecars survive any retention.
    cat.vacuum("core.t", retain_hours=0)
    assert len(os.listdir(dvdir)) == 1
    # A full rewrite resets the DV set; the orphaned sidecar then expires.
    cat.compact("core.t")
    cat.vacuum("core.t", retain_hours=1)  # inside the window: kept
    assert len(os.listdir(dvdir)) == 1
    cat.vacuum("core.t", retain_hours=0)  # expired: pruned
    assert os.listdir(dvdir) == []
    assert sorted(r.k for r in cat.table("core.t").collect()) == [2]


def test_dv_delete_by_partition_predicate(spark, tmp_path):
    """Tombstoning via a partition-column predicate (rows live in Hive
    directories; the predicate resolves against inferred partition cols)."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.register("core.p2", SCHEMA, partition_by=("grp",))
    cat.append(
        "core.p2",
        _rows(spark, [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0)]),
    )
    assert cat.delete_where("core.p2", "grp = 'a'") == 2
    assert _ks(cat.table("core.p2")) == [3]
    assert _ks(cat.table("core.p2", version=1)) == [1, 2, 3]


def test_incremental_view_sees_dv_deletes(spark, tmp_path):
    from certified_dogs_and_cats_spark.pipeline.incremental import (
        IncrementalAggregate,
    )

    cat = _mk(spark, tmp_path)
    view = IncrementalAggregate(cat, "core.t", "core.agg", ("grp",), "v")
    cat.append(
        "core.t", _rows(spark, [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 5.0)])
    )
    view.refresh()
    cat.delete_where("core.t", "k = 1")
    view.refresh()
    got = sorted(
        (r.grp, r.cnt, r.total) for r in cat.table("core.agg").collect()
    )
    assert got == [("a", 1, 2.0), ("b", 1, 5.0)]

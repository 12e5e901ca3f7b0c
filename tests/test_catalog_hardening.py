"""Regressions for the catalog-review hardening: log-defined liveness,
row-level write conflicts, DV retention vs time travel, identity metadata
through copy-on-write column changes."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from certified_dogs_and_cats_spark.pipeline.catalog import (
    ConcurrentWriteConflict,
    ConstraintViolation,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.IntegerType()),
        T.StructField("v", T.StringType()),
    ]
)


def test_uncommitted_orphan_files_invisible(catalog, spark):
    """Liveness is defined by the log: a file that lands in the table
    directory without a commit (crashed append's staging residue) must
    not appear in reads."""
    catalog.register("t.orphan", SCHEMA)
    catalog.append("t.orphan", spark.createDataFrame([(1, "a")], SCHEMA))
    spec = catalog.tables["t.orphan"]
    # Simulate a crashed append: write a parquet file into the live dir
    # with no commit entry.
    orphan_src = spec.path + "__orphan_stage"
    spark.createDataFrame([(99, "zz")], SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(orphan_src)
    for fn in os.listdir(orphan_src):
        if fn.endswith(".parquet"):
            os.replace(
                os.path.join(orphan_src, fn),
                os.path.join(spec.path, "orphan-" + fn),
            )
    assert sorted(r.k for r in catalog.table("t.orphan").collect()) == [1]


def test_concurrent_update_where_conflicts_not_corrupts(catalog, spark):
    """A racing commit between an update's snapshot and its commit must
    raise ConcurrentWriteConflict — rebasing would duplicate the row."""
    catalog.register("t.uconf", SCHEMA)
    catalog.append("t.uconf", spark.createDataFrame([(1, "a")], SCHEMA))
    real_commit = catalog._commit
    calls = {"n": 0}

    def racing_commit(name, action, **kw):
        if action == "update" and calls["n"] == 0:
            calls["n"] = 1
            # A concurrent append lands first, stealing the version.
            catalog.append(
                "t.uconf", spark.createDataFrame([(2, "b")], SCHEMA)
            )
        return real_commit(name, action, **kw)

    catalog._commit = racing_commit
    try:
        with pytest.raises(ConcurrentWriteConflict):
            catalog.update_where("t.uconf", {"v": "'A'"}, "k = 1")
    finally:
        catalog._commit = real_commit


def test_update_where_rejects_identity_assignment(catalog, spark):
    schema = T.StructType(
        [
            T.StructField("rid", T.LongType()),
            T.StructField("v", T.StringType()),
        ]
    )
    spec = catalog.register("t.uid", schema)
    spec.identity["rid"] = {"start": 1, "step": 1}
    catalog.append(
        "t.uid",
        spark.createDataFrame(
            [("a",)], T.StructType([T.StructField("v", T.StringType())])
        ),
    )
    with pytest.raises(ConstraintViolation, match="IDENTITY"):
        catalog.update_where("t.uid", {"rid": "42"}, "v = 'a'")


def test_vacuum_keeps_dv_referenced_by_recent_versions(catalog, spark):
    """A DV that left the live set via a rewrite must survive vacuum as
    long as versions inside the retention window reference it."""
    catalog.register("t.dvret", SCHEMA)
    catalog.append(
        "t.dvret", spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA)
    )
    catalog.delete_where("t.dvret", "k = 2")  # v2 carries the DV
    catalog.overwrite(
        "t.dvret", spark.createDataFrame([(9, "z")], SCHEMA)
    )  # v3 resets the DV set
    # Retention window still covers v2 (committed seconds ago): the
    # sidecar must survive even though it is old-looking and not in HEAD.
    catalog.vacuum("t.dvret", retain_hours=1.0)
    assert [r.k for r in catalog.table("t.dvret", version=2).collect()] == [1]


def test_cow_rename_of_identity_column(catalog, spark):
    """Copy-on-write rename of an identity column must move the
    registration AND the allocation watermark."""
    schema = T.StructType(
        [
            T.StructField("rid", T.LongType()),
            T.StructField("v", T.StringType()),
        ]
    )
    spec = catalog.register("t.idren", schema)
    spec.identity["rid"] = {"start": 1, "step": 1}
    v_only = T.StructType([T.StructField("v", T.StringType())])
    catalog.append("t.idren", spark.createDataFrame([("a",)], v_only))
    catalog.rename_column("t.idren", "rid", "row_id")
    assert "row_id" in spec.identity and "rid" not in spec.identity
    before = {r.v: r.row_id for r in catalog.table("t.idren").collect()}
    catalog.append("t.idren", spark.createDataFrame([("b",)], v_only))
    rows = {r.v: r.row_id for r in catalog.table("t.idren").collect()}
    # Watermark carried over: the new id allocates above the old block.
    assert rows["b"] > before["a"]
    assert len(set(rows.values())) == 2


def test_cow_rename_of_generated_column(catalog, spark):
    schema = T.StructType(
        [
            T.StructField("k", T.IntegerType()),
            T.StructField("k2", T.IntegerType()),
        ]
    )
    spec = catalog.register("t.genren", schema)
    spec.generated["k2"] = "k * 2"
    catalog.append(
        "t.genren",
        spark.createDataFrame(
            [(3,)], T.StructType([T.StructField("k", T.IntegerType())])
        ),
    )
    catalog.rename_column("t.genren", "k2", "twice")
    assert spec.generated == {"twice": "k * 2"}
    catalog.append(
        "t.genren",
        spark.createDataFrame(
            [(5,)], T.StructType([T.StructField("k", T.IntegerType())])
        ),
    )
    rows = sorted((r.k, r.twice) for r in catalog.table("t.genren").collect())
    assert rows == [(3, 6), (5, 10)]

"""CLONE (shallow/deep, VERSION AS OF, DV carry-over), SHOW CREATE TABLE
replayability, and schema evolution (mergeSchema append, MERGE WITH SCHEMA
EVOLUTION) — Delta-parity features of the manifest catalog."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from certified_dogs_and_cats_spark.pipeline import DdlSession
from certified_dogs_and_cats_spark.pipeline.ddl import DdlError

SCHEMA = T.StructType(
    [
        T.StructField("k", T.IntegerType()),
        T.StructField("v", T.StringType()),
    ]
)


def _rows(catalog, name, version=None):
    return sorted(
        (r.k, r.v) for r in catalog.table(name, version=version).collect()
    )


# --- Catalog.clone ----------------------------------------------------------


def test_shallow_clone_is_zero_copy_and_independent(catalog, spark):
    catalog.register("t.src", SCHEMA)
    catalog.append("t.src", spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA))
    catalog.clone("t.src", "t.dst", shallow=True)

    assert _rows(catalog, "t.dst") == [(1, "a"), (2, "b")]
    # Zero-copy: every cloned data file shares its inode with the source.
    src_spec, dst_spec = catalog.tables["t.src"], catalog.tables["t.dst"]
    for rel in catalog._load_manifest("t.dst")[-1]["files"]:
        s = os.stat(os.path.join(src_spec.path, rel))
        d = os.stat(os.path.join(dst_spec.path, rel))
        assert s.st_ino == d.st_ino
    # The clone starts its own log at version 1.
    assert [h["version"] for h in catalog.history("t.dst")] == [1]

    # Writes diverge in both directions.
    catalog.append("t.dst", spark.createDataFrame([(3, "c")], SCHEMA))
    catalog.append("t.src", spark.createDataFrame([(9, "z")], SCHEMA))
    assert _rows(catalog, "t.dst") == [(1, "a"), (2, "b"), (3, "c")]
    assert _rows(catalog, "t.src") == [(1, "a"), (2, "b"), (9, "z")]


def test_shallow_clone_survives_source_vacuum(catalog, spark):
    """The hard link keeps bytes alive even after the source overwrites
    and vacuums away its copy — a shallow clone cannot be orphaned."""
    catalog.register("t.vsrc", SCHEMA)
    catalog.append("t.vsrc", spark.createDataFrame([(1, "a")], SCHEMA))
    catalog.clone("t.vsrc", "t.vdst", shallow=True)
    catalog.overwrite("t.vsrc", spark.createDataFrame([(2, "b")], SCHEMA))
    catalog.vacuum("t.vsrc", retain_hours=0.0)
    assert _rows(catalog, "t.vdst") == [(1, "a")]


def test_deep_clone_copies_bytes(catalog, spark):
    catalog.register("t.dsrc", SCHEMA)
    catalog.append("t.dsrc", spark.createDataFrame([(1, "a")], SCHEMA))
    catalog.clone("t.dsrc", "t.ddst", shallow=False)
    src_spec, dst_spec = catalog.tables["t.dsrc"], catalog.tables["t.ddst"]
    for rel in catalog._load_manifest("t.ddst")[-1]["files"]:
        s = os.stat(os.path.join(src_spec.path, rel))
        d = os.stat(os.path.join(dst_spec.path, rel))
        assert s.st_ino != d.st_ino
    assert _rows(catalog, "t.ddst") == [(1, "a")]


def test_clone_version_as_of_reaches_into_trash(catalog, spark):
    """Cloning an OLD version resolves retired files from _trash, exactly
    like a time-travel read."""
    catalog.register("t.hist", SCHEMA)
    catalog.append("t.hist", spark.createDataFrame([(1, "a")], SCHEMA))
    catalog.overwrite("t.hist", spark.createDataFrame([(2, "b")], SCHEMA))
    catalog.clone("t.hist", "t.old", shallow=True, version=1)
    assert _rows(catalog, "t.old") == [(1, "a")]


def test_clone_carries_deletion_vectors(catalog, spark):
    """A shallow clone of a table with live DVs keeps the deletes applied
    without materializing them (sidecars travel with the clone)."""
    catalog.register("t.dvsrc", SCHEMA)
    catalog.append(
        "t.dvsrc", spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], SCHEMA)
    )
    catalog.delete_where("t.dvsrc", "k = 2")
    catalog.clone("t.dvsrc", "t.dvdst", shallow=True)
    assert _rows(catalog, "t.dvdst") == [(1, "a"), (3, "c")]
    assert catalog._load_manifest("t.dvdst")[-1].get("dv")


def test_clone_refuses_existing_target(catalog, spark):
    catalog.register("t.a", SCHEMA)
    catalog.register("t.b", SCHEMA)
    with pytest.raises(ValueError, match="exists"):
        catalog.clone("t.a", "t.b")


def test_clone_sql_front_door(catalog, spark):
    ddl = DdlSession(catalog)
    ddl.execute("CREATE TABLE core.src (k INT, v STRING) USING parquet")
    ddl.execute("INSERT INTO core.src VALUES (1, 'a'), (2, 'b')")
    ddl.execute("CREATE TABLE core.dup SHALLOW CLONE core.src")
    assert _rows(catalog, "core.dup") == [(1, "a"), (2, "b")]
    # IF NOT EXISTS no-ops on an existing clone target.
    ddl.execute("CREATE TABLE IF NOT EXISTS core.dup SHALLOW CLONE core.src")
    with pytest.raises(DdlError, match="exists"):
        ddl.execute("CREATE TABLE core.dup DEEP CLONE core.src")


def test_clone_sql_version_as_of(catalog, spark):
    ddl = DdlSession(catalog)
    ddl.execute("CREATE TABLE core.vs (k INT, v STRING) USING parquet")
    ddl.execute("INSERT INTO core.vs VALUES (1, 'a')")
    ddl.execute("INSERT INTO core.vs VALUES (2, 'b')")
    ddl.execute("CREATE TABLE core.v1 DEEP CLONE core.vs VERSION AS OF 1")
    assert _rows(catalog, "core.v1") == [(1, "a")]


# --- SHOW CREATE TABLE ------------------------------------------------------


def test_show_create_table_replays(catalog, spark):
    """The emitted statement must round-trip: executing it in a fresh
    session recreates an equivalent table (schema, partitioning,
    properties, generated columns, constraints)."""
    ddl = DdlSession(catalog)
    ddl.execute(
        "CREATE TABLE core.sc (k INT NOT NULL, v STRING,"
        " y INT GENERATED ALWAYS AS (k + 1))"
        " USING parquet PARTITIONED BY (v)"
        " TBLPROPERTIES ('delta.enableDeletionVectors' = 'true');"
        "ALTER TABLE core.sc ADD CONSTRAINT pos CHECK (k > 0)"
    )
    [df] = ddl.execute("SHOW CREATE TABLE core.sc")
    stmt = df.collect()[0]["createtab_stmt"]
    assert "GENERATED ALWAYS AS (k + 1)" in stmt
    assert "NOT NULL" in stmt
    assert "PARTITIONED BY (v)" in stmt
    assert "'delta.enableDeletionVectors' = 'true'" in stmt

    from certified_dogs_and_cats_spark.pipeline import Catalog

    other = Catalog(spark, catalog.root + "_replay")
    ddl2 = DdlSession(other)
    ddl2.execute(stmt)
    spec0, spec1 = catalog.tables["core.sc"], other.tables["core.sc"]
    assert spec1.schema == spec0.schema
    assert spec1.partition_by == spec0.partition_by
    assert spec1.properties == spec0.properties
    assert spec1.generated == spec0.generated
    assert spec1.constraints == spec0.constraints


def test_show_create_table_missing(catalog):
    ddl = DdlSession(catalog)
    with pytest.raises(DdlError, match="not found"):
        ddl.execute("SHOW CREATE TABLE core.nope")


# --- schema evolution -------------------------------------------------------


def test_append_merge_schema_widens(catalog, spark):
    """A wider frame with merge_schema=True adds the new column as
    nullable metadata; pre-evolution files read it back as NULL."""
    catalog.register("t.ev", SCHEMA)
    catalog.append("t.ev", spark.createDataFrame([(1, "a")], SCHEMA))
    wide = T.StructType(
        [*SCHEMA.fields, T.StructField("extra", T.DoubleType())]
    )
    catalog.append(
        "t.ev",
        spark.createDataFrame([(2, "b", 1.5)], wide),
        merge_schema=True,
    )
    got = sorted(
        (r.k, r.v, r.extra) for r in catalog.table("t.ev").collect()
    )
    assert got == [(1, "a", None), (2, "b", 1.5)]
    assert [f.name for f in catalog.tables["t.ev"].schema.fields] == [
        "k",
        "v",
        "extra",
    ]


def test_append_merge_schema_fills_missing_nullable(catalog, spark):
    """The symmetric direction: a NARROW frame appends with typed NULLs
    for absent nullable columns."""
    catalog.register("t.nar", SCHEMA)
    narrow = T.StructType([T.StructField("k", T.IntegerType())])
    catalog.append(
        "t.nar", spark.createDataFrame([(7,)], narrow), merge_schema=True
    )
    assert _rows(catalog, "t.nar") == [(7, None)]


def test_append_without_merge_schema_stays_strict(catalog, spark):
    catalog.register("t.strict", SCHEMA)
    wide = T.StructType(
        [*SCHEMA.fields, T.StructField("extra", T.DoubleType())]
    )
    # Default behavior unchanged: extra columns are simply not written
    # (projection to the declared schema), never silently widened.
    catalog.append("t.strict", spark.createDataFrame([(1, "a", 9.9)], wide))
    assert [f.name for f in catalog.tables["t.strict"].schema.fields] == [
        "k",
        "v",
    ]


def test_merge_with_schema_evolution_sql(catalog, spark):
    ddl = DdlSession(catalog)
    ddl.execute("CREATE TABLE core.mt (k INT, v STRING) USING parquet")
    ddl.execute("INSERT INTO core.mt VALUES (1, 'a'), (2, 'b')")
    ddl.execute(
        "CREATE TABLE core.ms (k INT, v STRING, score DOUBLE) USING parquet"
    )
    ddl.execute("INSERT INTO core.ms VALUES (2, 'B', 0.5), (3, 'c', 0.9)")
    ddl.execute(
        "MERGE WITH SCHEMA EVOLUTION INTO core.mt AS t"
        " USING core.ms AS s ON t.k = s.k"
        " WHEN MATCHED THEN UPDATE SET v = s.v, score = s.score"
        " WHEN NOT MATCHED THEN INSERT (k, v, score)"
        " VALUES (s.k, s.v, s.score)"
    )
    got = sorted(
        (r.k, r.v, r.score) for r in catalog.table("core.mt").collect()
    )
    assert got == [(1, "a", None), (2, "B", 0.5), (3, "c", 0.9)]


def test_merge_without_evolution_rejects_new_column(catalog, spark):
    ddl = DdlSession(catalog)
    ddl.execute("CREATE TABLE core.mt2 (k INT, v STRING) USING parquet")
    ddl.execute("INSERT INTO core.mt2 VALUES (1, 'a')")
    ddl.execute(
        "CREATE TABLE core.ms2 (k INT, v STRING, score DOUBLE) USING parquet"
    )
    ddl.execute("INSERT INTO core.ms2 VALUES (1, 'A', 0.1)")
    with pytest.raises(DdlError, match="unknown column"):
        ddl.execute(
            "MERGE INTO core.mt2 AS t USING core.ms2 AS s ON t.k = s.k"
            " WHEN MATCHED THEN UPDATE SET v = s.v, score = s.score"
        )

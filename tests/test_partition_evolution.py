"""Partition evolution (Iceberg-style, beyond Delta): change the layout
for future writes without touching existing files; mixed-layout reads
group by each file's path signature; compact() normalizes."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from certified_dogs_and_cats_spark.pipeline import Catalog

SCHEMA = T.StructType(
    [
        T.StructField("k", T.IntegerType()),
        T.StructField("v", T.StringType()),
        T.StructField("part", T.StringType()),
    ]
)

ROWS1 = [(1, "a", "x"), (2, "b", "y")]
ROWS2 = [(3, "c", "x"), (4, "d", "y")]


def _all(catalog, name, version=None):
    return sorted(
        (r.k, r.v, r.part)
        for r in catalog.table(name, version=version).collect()
    )


def test_evolve_unpartitioned_to_partitioned(catalog, spark):
    catalog.register("t.ev1", SCHEMA)  # unpartitioned
    catalog.append("t.ev1", spark.createDataFrame(ROWS1, SCHEMA))
    old_files = catalog._load_manifest("t.ev1")[-1]["files"]

    catalog.set_partitioning("t.ev1", ("part",))
    catalog.append("t.ev1", spark.createDataFrame(ROWS2, SCHEMA))

    files = catalog._load_manifest("t.ev1")[-1]["files"]
    # Old files untouched; new files under part= dirs.
    assert set(old_files) <= set(files)
    assert any(f.startswith("part=") for f in files)
    assert any(not f.startswith("part=") for f in files)
    # Both eras read, with correct part values from data AND directory.
    assert _all(catalog, "t.ev1") == sorted(ROWS1 + ROWS2)
    # Filtering on the evolved column works across eras.
    got = sorted(
        r.k for r in catalog.table("t.ev1").filter("part = 'x'").collect()
    )
    assert got == [1, 3]


def test_evolve_partitioned_to_unpartitioned(catalog, spark):
    catalog.register("t.ev2", SCHEMA, partition_by=("part",))
    catalog.append("t.ev2", spark.createDataFrame(ROWS1, SCHEMA))
    catalog.set_partitioning("t.ev2", ())
    catalog.append("t.ev2", spark.createDataFrame(ROWS2, SCHEMA))
    assert _all(catalog, "t.ev2") == sorted(ROWS1 + ROWS2)


def test_scan_prunes_both_eras(catalog, spark):
    """Old-era files prune on the column's FOOTER stats (it is a data
    column there); new-era files prune on the directory value."""
    catalog.register("t.ev3", SCHEMA)
    catalog.append(
        "t.ev3", spark.createDataFrame([(1, "a", "x")], SCHEMA).coalesce(1)
    )
    catalog.set_partitioning("t.ev3", ("part",))
    catalog.append(
        "t.ev3", spark.createDataFrame([(2, "b", "y")], SCHEMA).coalesce(1)
    )
    kept, total = catalog.pruned_files("t.ev3", "part = 'zzz'")
    assert total >= 2 and kept == 0
    got = sorted(r.k for r in catalog.scan("t.ev3", "part = 'x'").collect())
    assert got == [1]


def test_compact_normalizes_mixed_layout(catalog, spark):
    catalog.register("t.ev4", SCHEMA)
    catalog.append("t.ev4", spark.createDataFrame(ROWS1, SCHEMA))
    catalog.set_partitioning("t.ev4", ("part",))
    catalog.append("t.ev4", spark.createDataFrame(ROWS2, SCHEMA))
    # Partition-scoped maintenance refuses while mixed...
    with pytest.raises(ValueError, match="mixed"):
        catalog.overwrite_partitions(
            "t.ev4", spark.createDataFrame(ROWS1, SCHEMA)
        )
    with pytest.raises(ValueError, match="mixed"):
        catalog.delete_where("t.ev4", "k = 1")
    catalog.compact("t.ev4")
    files = catalog._load_manifest("t.ev4")[-1]["files"]
    assert all(f.startswith("part=") for f in files)
    assert _all(catalog, "t.ev4") == sorted(ROWS1 + ROWS2)
    # ...and works again once normalized.
    assert catalog.delete_where("t.ev4", "k = 1") == 1


def test_time_travel_across_evolution(catalog, spark):
    catalog.register("t.ev5", SCHEMA)
    catalog.append("t.ev5", spark.createDataFrame(ROWS1, SCHEMA))
    catalog.set_partitioning("t.ev5", ("part",))
    catalog.append("t.ev5", spark.createDataFrame(ROWS2, SCHEMA))
    assert _all(catalog, "t.ev5", version=1) == sorted(ROWS1)
    # History records the layout change as its own version.
    assert [h["action"] for h in catalog.history("t.ev5")] == [
        "append",
        "set_partitioning",
        "append",
    ]


def test_layout_survives_reregistration(catalog, spark):
    catalog.register("t.ev6", SCHEMA)
    catalog.append("t.ev6", spark.createDataFrame(ROWS1, SCHEMA))
    catalog.set_partitioning("t.ev6", ("part",))
    fresh = Catalog(catalog.spark, catalog.root)
    spec = fresh.register("t.ev6", SCHEMA)  # registered as unpartitioned
    assert spec.partition_by == ("part",)
    fresh.append("t.ev6", fresh.spark.createDataFrame(ROWS2, SCHEMA))
    files = fresh._load_manifest("t.ev6")[-1]["files"]
    assert any(f.startswith("part=") for f in files)


def test_set_partitioning_validates_columns(catalog, spark):
    catalog.register("t.ev7", SCHEMA)
    with pytest.raises(ValueError, match="not in schema"):
        catalog.set_partitioning("t.ev7", ("nope",))


def test_ddl_set_partition_spec(catalog, spark):
    from certified_dogs_and_cats_spark.pipeline import DdlSession

    ddl = DdlSession(catalog)
    ddl.execute(
        "CREATE TABLE core.pe (k INT, v STRING, part STRING) USING parquet;"
        "INSERT INTO core.pe VALUES (1, 'a', 'x')"
    )
    ddl.execute("ALTER TABLE core.pe SET PARTITION SPEC (part)")
    assert catalog.tables["core.pe"].partition_by == ("part",)
    ddl.execute("INSERT INTO core.pe VALUES (2, 'b', 'y')")
    files = catalog._load_manifest("core.pe")[-1]["files"]
    assert any(f.startswith("part=") for f in files)
    [df] = ddl.execute("SELECT k, part FROM core.pe")
    assert sorted((r.k, r.part) for r in df.collect()) == [
        (1, "x"),
        (2, "y"),
    ]


def test_clone_inherits_evolved_layout_across_sessions(catalog, spark):
    """A clone of a partition-evolved table keeps the evolved layout even
    after re-registration in a fresh catalog session."""
    catalog.register("t.ev8", SCHEMA)
    catalog.append("t.ev8", spark.createDataFrame(ROWS1, SCHEMA))
    catalog.set_partitioning("t.ev8", ("part",))
    catalog.clone("t.ev8", "t.ev8c", shallow=True)
    fresh = Catalog(catalog.spark, catalog.root)
    spec = fresh.register("t.ev8c", SCHEMA)  # registered unpartitioned
    assert spec.partition_by == ("part",)

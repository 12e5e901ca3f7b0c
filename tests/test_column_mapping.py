"""Column mapping (Delta columnMapping.mode=name): metadata-only RENAME /
DROP COLUMN — zero files rewritten, reads translate physical->logical,
dropped physical names can never resurface, mapping survives sessions."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from certified_dogs_and_cats_spark.pipeline import Catalog, DdlSession

SCHEMA = T.StructType(
    [
        T.StructField("k", T.IntegerType()),
        T.StructField("v", T.StringType()),
    ]
)


def _mapped(catalog, name):
    spec = catalog.register(name, SCHEMA)
    spec.properties["delta.columnMapping.mode"] = "name"
    return spec


def _files(catalog, name):
    return catalog._load_manifest(name)[-1]["files"]


def test_rename_is_metadata_only(catalog, spark):
    _mapped(catalog, "t.map")
    catalog.append("t.map", spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA))
    before = _files(catalog, "t.map")
    mtimes = {
        f: os.path.getmtime(os.path.join(catalog.tables["t.map"].path, f))
        for f in before
    }
    catalog.rename_column("t.map", "v", "label")
    # Same physical files, byte-for-byte untouched.
    assert _files(catalog, "t.map") == before
    for f, mt in mtimes.items():
        assert (
            os.path.getmtime(os.path.join(catalog.tables["t.map"].path, f))
            == mt
        )
    got = sorted((r.k, r.label) for r in catalog.table("t.map").collect())
    assert got == [(1, "a"), (2, "b")]


def test_rename_then_append_and_filter(catalog, spark):
    """New writes store the OLD physical name; reads and predicates work
    on the new logical name across old and new files alike."""
    _mapped(catalog, "t.rw")
    catalog.append("t.rw", spark.createDataFrame([(1, "a")], SCHEMA))
    catalog.rename_column("t.rw", "v", "label")
    new_schema = T.StructType(
        [
            T.StructField("k", T.IntegerType()),
            T.StructField("label", T.StringType()),
        ]
    )
    catalog.append("t.rw", spark.createDataFrame([(2, "b")], new_schema))
    df = catalog.table("t.rw")
    assert sorted((r.k, r.label) for r in df.collect()) == [(1, "a"), (2, "b")]
    assert df.filter("label = 'b'").count() == 1
    # scan() prunes on the logical name through the map.
    kept, total = catalog.pruned_files("t.rw", "label = 'zzz'")
    assert total >= 2 and kept == 0


def test_mapped_delete_and_update(catalog, spark):
    """Merge-on-read DELETE/UPDATE still work after a rename (DV paths
    read physical columns and evaluate logical predicates)."""
    _mapped(catalog, "t.dml")
    catalog.append(
        "t.dml",
        spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], SCHEMA),
    )
    catalog.rename_column("t.dml", "v", "label")
    assert catalog.delete_where("t.dml", "label = 'b'") == 1
    assert catalog.update_where("t.dml", {"label": "'C'"}, "label = 'c'") == 1
    got = sorted((r.k, r.label) for r in catalog.table("t.dml").collect())
    assert got == [(1, "a"), (3, "C")]


def test_drop_column_metadata_only_and_no_resurrection(catalog, spark):
    _mapped(catalog, "t.drop")
    catalog.append("t.drop", spark.createDataFrame([(1, "secret")], SCHEMA))
    before = _files(catalog, "t.drop")
    catalog.drop_column("t.drop", "v")
    assert _files(catalog, "t.drop") == before  # no rewrite
    assert catalog.table("t.drop").columns == ["k"]
    # Re-adding a column with the dropped name maps to a FRESH physical
    # name: the old bytes stay buried.
    catalog.add_column("t.drop", T.StructField("v", T.StringType(), True))
    rows = catalog.table("t.drop").collect()
    assert [(r.k, r.v) for r in rows] == [(1, None)]


def test_mapping_survives_reregistration(catalog, spark):
    """A new session re-registers the schema; the persisted map must
    rehydrate or renamed columns would silently read NULL."""
    _mapped(catalog, "t.sess")
    catalog.append("t.sess", spark.createDataFrame([(1, "a")], SCHEMA))
    catalog.rename_column("t.sess", "v", "label")
    fresh = Catalog(catalog.spark, catalog.root)
    spec = fresh.register(
        "t.sess",
        T.StructType(
            [
                T.StructField("k", T.IntegerType()),
                T.StructField("label", T.StringType()),
            ]
        ),
    )
    assert spec.column_map == {"label": "v"}
    assert [(r.k, r.label) for r in fresh.table("t.sess").collect()] == [
        (1, "a")
    ]


def test_without_property_rename_still_rewrites(catalog, spark):
    catalog.register("t.cow", SCHEMA)
    catalog.append("t.cow", spark.createDataFrame([(1, "a")], SCHEMA))
    before = _files(catalog, "t.cow")
    catalog.rename_column("t.cow", "v", "label")
    assert _files(catalog, "t.cow") != before  # copy-on-write rewrote
    assert catalog.tables["t.cow"].column_map == {}
    assert [(r.k, r.label) for r in catalog.table("t.cow").collect()] == [
        (1, "a")
    ]


def test_rename_referenced_by_generated_refuses(catalog, spark):
    spec = _mapped(catalog, "t.gen")
    spec.generated["v"] = "upper(cast(k as string))"
    with pytest.raises(ValueError, match="generated"):
        catalog.rename_column("t.gen", "k", "kk")


def test_time_travel_across_rename(catalog, spark):
    """Old versions read fine after a metadata-only rename — physical
    names in old files never changed (current logical schema applies)."""
    _mapped(catalog, "t.tt")
    catalog.append("t.tt", spark.createDataFrame([(1, "a")], SCHEMA))
    catalog.rename_column("t.tt", "v", "label")
    catalog.append(
        "t.tt",
        spark.createDataFrame(
            [(2, "b")],
            T.StructType(
                [
                    T.StructField("k", T.IntegerType()),
                    T.StructField("label", T.StringType()),
                ]
            ),
        ),
    )
    v1 = catalog.table("t.tt", version=1)
    assert [(r.k, r.label) for r in v1.collect()] == [(1, "a")]


def test_ddl_rename_routes_by_property(catalog, spark):
    ddl = DdlSession(catalog)
    ddl.execute(
        "CREATE TABLE core.cm (k INT, v STRING) USING parquet"
        " TBLPROPERTIES ('delta.columnMapping.mode' = 'name');"
        "INSERT INTO core.cm VALUES (1, 'a')"
    )
    before = _files(catalog, "core.cm")
    ddl.execute("ALTER TABLE core.cm RENAME COLUMN v TO label")
    assert _files(catalog, "core.cm") == before
    [df] = ddl.execute("SELECT k, label FROM core.cm")
    assert [(r.k, r.label) for r in df.collect()] == [(1, "a")]

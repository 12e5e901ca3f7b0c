"""Declared clustering (Delta liquid CLUSTER BY parity): metadata-only to
set/alter, every OPTIMIZE clusters by it unprompted, persists across
sessions, SHOW CREATE TABLE replays it."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from certified_dogs_and_cats_spark.pipeline import DdlError, DdlSession
from certified_dogs_and_cats_spark.pipeline.catalog import Catalog

SCHEMA = T.StructType(
    [
        T.StructField("k", T.IntegerType()),
        T.StructField("s", T.StringType()),
    ]
)


def _shuffled(catalog, spark, name):
    catalog.register(name, SCHEMA)
    rows = [(i * 37 % 100, f"s{i}") for i in range(100)]
    catalog.append(name, spark.createDataFrame(rows, SCHEMA).coalesce(2))


def _file_ranges(catalog, name):
    stats = catalog.file_stats(name)
    return [
        (st["cols"]["k"][0], st["cols"]["k"][1])
        for st in stats.values()
        if "k" in st.get("cols", {})
    ]


def test_optimize_uses_declared_clustering(catalog, spark):
    _shuffled(catalog, spark, "core.lc")
    catalog.set_clustering("core.lc", ("k",))
    # OPTIMIZE with no explicit key: must cluster by the declared key so
    # the rewritten files carry DISJOINT k ranges.
    catalog.compact("core.lc", target_files_per_partition=4)
    ranges = sorted(_file_ranges(catalog, "core.lc"))
    assert len(ranges) > 1
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping ranges {ranges}"
    # Data intact.
    assert catalog.table("core.lc").count() == 100


def test_set_clustering_is_metadata_only_until_optimize(catalog, spark):
    import os

    _shuffled(catalog, spark, "core.lm")
    spec = catalog.tables["core.lm"]
    manifest_files = set(
        os.path.join(spec.path, f)
        for f in catalog._load_manifest("core.lm")[-1]["files"]
    )
    mtimes = {f: os.path.getmtime(f) for f in manifest_files}
    catalog.set_clustering("core.lm", ("k",))
    assert {f: os.path.getmtime(f) for f in manifest_files} == mtimes


def test_clustering_validation(catalog, spark):
    catalog.register(
        "core.lv",
        T.StructType(
            [
                T.StructField("k", T.IntegerType()),
                T.StructField("p", T.StringType()),
            ]
        ),
        partition_by=("p",),
    )
    with pytest.raises(ValueError, match="not in schema"):
        catalog.set_clustering("core.lv", ("nope",))
    with pytest.raises(ValueError, match="partition columns"):
        catalog.set_clustering("core.lv", ("p",))


def test_clustering_persists_across_sessions(catalog, spark):
    _shuffled(catalog, spark, "core.lp")
    catalog.set_clustering("core.lp", ("k",))
    cat2 = Catalog(spark, catalog.root)
    cat2.register("core.lp", SCHEMA)
    assert cat2.tables["core.lp"].cluster_by == ("k",)


def test_cluster_by_sql_lifecycle(catalog, spark):
    ddl = DdlSession(catalog)
    ddl.execute("""
      USE CATALOG pets; USE SCHEMA core;
      CREATE TABLE pets.core.lq (k INT, s STRING) USING DELTA CLUSTER BY (k);
      INSERT INTO pets.core.lq VALUES (3, 'c'), (1, 'a'), (2, 'b');
    """)
    assert catalog.tables["core.lq"].cluster_by == ("k",)
    stmt = ddl.execute("SHOW CREATE TABLE pets.core.lq")[0].collect()[0][0]
    assert "CLUSTER BY (k)" in stmt
    ddl.execute("OPTIMIZE pets.core.lq")  # no ZORDER clause needed
    assert catalog.table("core.lq").count() == 3
    ddl.execute("ALTER TABLE pets.core.lq CLUSTER BY NONE")
    assert catalog.tables["core.lq"].cluster_by == ()
    ddl.execute("ALTER TABLE pets.core.lq CLUSTER BY (s)")
    assert catalog.tables["core.lq"].cluster_by == ("s",)
    with pytest.raises(DdlError, match="not in schema"):
        ddl.execute("ALTER TABLE pets.core.lq CLUSTER BY (zz)")


def test_explicit_zorder_overrides_declared(catalog, spark):
    """An explicit OPTIMIZE ... ZORDER BY wins over the declared key."""
    _shuffled(catalog, spark, "core.lo")
    catalog.set_clustering("core.lo", ("s",))
    catalog.compact("core.lo", target_files_per_partition=3, cluster_by=("k",))
    ranges = sorted(_file_ranges(catalog, "core.lo"))
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2

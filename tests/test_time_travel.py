"""Catalog versioned reads: manifest versions, snapshot isolation across
overwrites, append history, partitioned time travel, and vacuum retention
making old versions unreadable (Delta time-travel parity)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("k", T.IntegerType()),
        T.StructField("v", T.StringType()),
    ]
)

PART_SCHEMA = T.StructType(
    [
        T.StructField("k", T.IntegerType()),
        T.StructField("v", T.StringType()),
        T.StructField("part", T.StringType()),
    ]
)


def _rows(catalog, name, version=None):
    return sorted(
        (r.k, r.v) for r in catalog.table(name, version=version).collect()
    )


def test_version_counter_and_history(catalog, spark):
    catalog.register("t.versions", SCHEMA)
    assert catalog.current_version("t.versions") == 0
    catalog.append("t.versions", spark.createDataFrame([(1, "a")], SCHEMA))
    catalog.overwrite("t.versions", spark.createDataFrame([(2, "b")], SCHEMA))
    hist = catalog.history("t.versions")
    assert [(h["version"], h["action"]) for h in hist] == [
        (1, "append"),
        (2, "overwrite"),
    ]
    assert catalog.current_version("t.versions") == 2


def test_snapshot_isolation_across_overwrite(catalog, spark):
    """Reading v1 AFTER an overwrite produced v2 must return v1's rows —
    the overwritten files are resolved from _trash, exactly like Delta
    reading pre-compaction files that VACUUM has not yet removed."""
    catalog.register("t.snap", SCHEMA)
    catalog.append("t.snap", spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA))
    catalog.overwrite("t.snap", spark.createDataFrame([(3, "c")], SCHEMA))

    assert _rows(catalog, "t.snap") == [(3, "c")]
    assert _rows(catalog, "t.snap", version=1) == [(1, "a"), (2, "b")]
    assert _rows(catalog, "t.snap", version=2) == [(3, "c")]


def test_append_history_reads_exact_file_sets(catalog, spark):
    """Version N of an append-only table excludes files appended after N,
    even though they share the live directory."""
    catalog.register("t.appends", SCHEMA)
    catalog.append("t.appends", spark.createDataFrame([(1, "a")], SCHEMA))
    catalog.append("t.appends", spark.createDataFrame([(2, "b")], SCHEMA))
    catalog.append("t.appends", spark.createDataFrame([(3, "c")], SCHEMA))
    assert _rows(catalog, "t.appends", version=1) == [(1, "a")]
    assert _rows(catalog, "t.appends", version=2) == [(1, "a"), (2, "b")]
    assert _rows(catalog, "t.appends") == [(1, "a"), (2, "b"), (3, "c")]


def test_partitioned_time_travel_keeps_partition_columns(catalog, spark):
    """basePath-grouped resolution must reconstruct partition-column values
    for snapshots spanning live and trashed files."""
    catalog.register("t.part", PART_SCHEMA, partition_by=("part",))
    catalog.append(
        "t.part",
        spark.createDataFrame([(1, "a", "p1"), (2, "b", "p2")], PART_SCHEMA),
    )
    # Replace only p2; v1 must still see the old p2 rows with part='p2'.
    catalog.overwrite_partitions(
        "t.part", spark.createDataFrame([(9, "z", "p2")], PART_SCHEMA)
    )
    v1 = sorted(
        (r.k, r.v, r.part)
        for r in catalog.table("t.part", version=1).collect()
    )
    assert v1 == [(1, "a", "p1"), (2, "b", "p2")]
    live = sorted(
        (r.k, r.v, r.part) for r in catalog.table("t.part").collect()
    )
    assert live == [(1, "a", "p1"), (9, "z", "p2")]


def test_vacuum_expires_time_travel(catalog, spark):
    """vacuum(retain=0) purges retired versions; reading them must fail
    loudly with the retention explanation, and the live table is intact."""
    catalog.register("t.vac", SCHEMA)
    catalog.append("t.vac", spark.createDataFrame([(1, "a")], SCHEMA))
    catalog.overwrite("t.vac", spark.createDataFrame([(2, "b")], SCHEMA))
    assert _rows(catalog, "t.vac", version=1) == [(1, "a")]
    assert catalog.vacuum("t.vac", retain_hours=0) == 1
    with pytest.raises(ValueError, match="vacuumed"):
        catalog.table("t.vac", version=1).collect()
    assert _rows(catalog, "t.vac") == [(2, "b")]


def test_unknown_version_raises(catalog, spark):
    catalog.register("t.unknown", SCHEMA)
    catalog.append("t.unknown", spark.createDataFrame([(1, "a")], SCHEMA))
    with pytest.raises(ValueError, match="does not exist"):
        catalog.table("t.unknown", version=7)


def test_ddl_version_as_of_and_history(catalog, spark):
    """Delta SQL spellings through the front door: SELECT ... VERSION AS OF
    reads the snapshot, DESCRIBE HISTORY lists the version log."""
    from certified_dogs_and_cats_spark.pipeline import DdlSession

    ddl = DdlSession(catalog)
    ddl.execute(
        """
        CREATE SCHEMA IF NOT EXISTS tt;
        CREATE TABLE pets.tt.t (k INT, v STRING);
        INSERT INTO pets.tt.t VALUES (1, 'a'), (2, 'b');
        """
    )
    catalog.overwrite(
        "tt.t", spark.createDataFrame([(3, "c")], catalog.tables["tt.t"].schema)
    )
    (old,) = ddl.execute(
        "SELECT count(*) AS n FROM pets.tt.t VERSION AS OF 1;"
    )
    assert old.collect()[0]["n"] == 2
    (live,) = ddl.execute("SELECT count(*) AS n FROM pets.tt.t;")
    assert live.collect()[0]["n"] == 1
    (hist,) = ddl.execute("DESCRIBE HISTORY pets.tt.t;")
    assert [(r.version, r.action) for r in hist.collect()] == [
        (2, "overwrite"),
        (1, "append"),
    ]


def test_history_operation_metrics(catalog, spark):
    """DESCRIBE HISTORY reports the file-set delta per version (Delta's
    numAddedFiles/numRemovedFiles)."""
    catalog.register("t.metrics", SCHEMA)
    catalog.append(
        "t.metrics",
        spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA).coalesce(1),
    )
    catalog.append(
        "t.metrics", spark.createDataFrame([(3, "c")], SCHEMA).coalesce(1)
    )
    catalog.overwrite("t.metrics", spark.createDataFrame([(9, "z")], SCHEMA))
    h = catalog.history("t.metrics")
    assert h[0]["n_added"] == 1 and h[0]["n_removed"] == 0
    assert h[1]["n_added"] == 1 and h[1]["n_removed"] == 0
    assert h[2]["action"] == "overwrite"
    assert h[2]["n_removed"] == 2 and h[2]["n_added"] >= 1


def test_timestamp_as_of_resolution(catalog, spark):
    """TIMESTAMP AS OF resolves the latest version committed at or
    before the timestamp (ts_ns in the manifest is the clock)."""
    import datetime as dt

    catalog.register("t.ts", SCHEMA)
    catalog.append("t.ts", spark.createDataFrame([(1, "a")], SCHEMA))
    mid = dt.datetime.utcnow()
    import time as _time

    _time.sleep(0.05)
    catalog.append("t.ts", spark.createDataFrame([(2, "b")], SCHEMA))
    v = catalog.version_at_timestamp("t.ts", mid.isoformat(sep=" "))
    assert v == 1
    now = dt.datetime.utcnow().isoformat(sep=" ")
    assert catalog.version_at_timestamp("t.ts", now) == 2
    with pytest.raises(ValueError, match="no version"):
        catalog.version_at_timestamp("t.ts", "2000-01-01 00:00:00")
    with pytest.raises(ValueError, match="bad TIMESTAMP"):
        catalog.version_at_timestamp("t.ts", "not-a-time")


def test_sql_timestamp_as_of_and_restore(catalog, spark):
    import datetime as dt
    import time as _time

    from certified_dogs_and_cats_spark.pipeline import DdlSession

    ddl = DdlSession(catalog)
    ddl.execute(
        "CREATE TABLE core.tt (k INT, v STRING) USING parquet;"
        "INSERT INTO core.tt VALUES (1, 'a')"
    )
    mid = dt.datetime.utcnow().isoformat(sep=" ")
    _time.sleep(0.05)
    ddl.execute("INSERT INTO core.tt VALUES (2, 'b')")
    [df] = ddl.execute(f"SELECT k FROM core.tt TIMESTAMP AS OF '{mid}'")
    assert [r.k for r in df.collect()] == [1]
    ddl.execute(f"RESTORE TABLE core.tt TO TIMESTAMP AS OF '{mid}'")
    assert [r.k for r in catalog.table("core.tt").collect()] == [1]


def test_tags_pin_versions_and_survive_vacuum(catalog, spark):
    """Named tags (Iceberg refs): pin a version by name, read it back by
    tag, and retention NEVER deletes a tagged version's files — drop the
    tag and the same vacuum reclaims them."""
    import pytest
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("k", T.IntegerType())])
    catalog.register("t.tags", schema)
    catalog.append("t.tags", spark.createDataFrame([(1,)], schema))
    v1 = catalog.set_tag("t.tags", "run-a")  # defaults to head
    catalog.overwrite("t.tags", spark.createDataFrame([(2,)], schema))
    assert catalog.resolve_tag("t.tags", "run-a") == v1
    assert [r.k for r in catalog.table("t.tags", version="run-a").collect()] == [1]
    # Zero-retention vacuum spares the tagged snapshot...
    catalog.vacuum("t.tags", retain_hours=0)
    assert [r.k for r in catalog.table("t.tags", version="run-a").collect()] == [1]
    # ...re-pointing without dropping raises...
    with pytest.raises(ValueError, match="drop it before re-pointing"):
        catalog.set_tag("t.tags", "run-a", catalog.current_version("t.tags"))
    # ...and dropping the tag releases the files to the next vacuum.
    catalog.drop_tag("t.tags", "run-a")
    assert catalog.vacuum("t.tags", retain_hours=0) >= 1
    with pytest.raises(ValueError, match="no tag"):
        catalog.resolve_tag("t.tags", "run-a")


def test_tag_sql_surface(catalog, spark):
    from certified_dogs_and_cats_spark.pipeline.ddl import DdlSession

    ddl = DdlSession(catalog)
    ddl.execute("USE SCHEMA core")
    ddl.execute(
        "CREATE TABLE tt (k INT);"
        "INSERT INTO tt VALUES (1);"
        "ALTER TABLE tt CREATE TAG 'baseline';"
        "INSERT INTO tt VALUES (2)"
    )
    rows = ddl.execute("SELECT * FROM tt VERSION AS OF 'baseline'")[-1].collect()
    assert [r.k for r in rows] == [1]
    ddl.execute("ALTER TABLE tt DROP TAG 'baseline'")
    ddl.execute("ALTER TABLE tt CREATE TAG 'v2' AS OF VERSION 2")
    assert catalog.resolve_tag("core.tt", "v2") == 2


def test_show_tags_sql(catalog, spark):
    from certified_dogs_and_cats_spark.pipeline.ddl import DdlSession

    ddl = DdlSession(catalog)
    ddl.execute("USE SCHEMA core")
    ddl.execute(
        "CREATE TABLE tshow (k INT);"
        "INSERT INTO tshow VALUES (1);"
        "ALTER TABLE tshow CREATE TAG 'a';"
        "INSERT INTO tshow VALUES (2);"
        "ALTER TABLE tshow CREATE TAG 'b'"
    )
    rows = ddl.execute("SHOW TAGS FOR tshow")[-1].collect()
    assert [(r.tag, r.version) for r in rows] == [("a", 1), ("b", 2)]

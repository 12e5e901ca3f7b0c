"""replace_where (Delta replaceWhere parity): atomic row-range replacement
via one DV+files commit, predicate containment, and NOT NULL write
enforcement."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from certified_dogs_and_cats_spark.pipeline.catalog import ConstraintViolation

SCHEMA = T.StructType(
    [
        T.StructField("month", T.StringType()),
        T.StructField("amt", T.IntegerType()),
    ]
)


def _rows(catalog, name, version=None):
    return sorted(
        (r.month, r.amt)
        for r in catalog.table(name, version=version).collect()
    )


def test_replace_where_swaps_exactly_the_range(catalog, spark):
    catalog.register("t.rw2", SCHEMA)
    catalog.append(
        "t.rw2",
        spark.createDataFrame(
            [("jan", 1), ("jan", 2), ("feb", 3)], SCHEMA
        ),
    )
    n = catalog.replace_where(
        "t.rw2",
        "month = 'jan'",
        spark.createDataFrame([("jan", 10)], SCHEMA),
    )
    assert n == 2
    assert _rows(catalog, "t.rw2") == [("feb", 3), ("jan", 10)]
    # ONE commit: history grew by exactly one version, carrying both the
    # tombstones and the new files.
    hist = catalog.history("t.rw2")
    assert [h["action"] for h in hist] == ["append", "replace_where"]
    # Time travel still sees the pre-replace state.
    assert _rows(catalog, "t.rw2", version=1) == [
        ("feb", 3),
        ("jan", 1),
        ("jan", 2),
    ]


def test_replace_where_rejects_stray_rows(catalog, spark):
    catalog.register("t.stray", SCHEMA)
    catalog.append("t.stray", spark.createDataFrame([("jan", 1)], SCHEMA))
    with pytest.raises(ConstraintViolation, match="do not satisfy"):
        catalog.replace_where(
            "t.stray",
            "month = 'jan'",
            spark.createDataFrame([("feb", 9)], SCHEMA),
        )
    assert _rows(catalog, "t.stray") == [("jan", 1)]


def test_replace_where_empty_match_still_inserts(catalog, spark):
    catalog.register("t.nomatch", SCHEMA)
    catalog.append("t.nomatch", spark.createDataFrame([("feb", 3)], SCHEMA))
    n = catalog.replace_where(
        "t.nomatch",
        "month = 'mar'",
        spark.createDataFrame([("mar", 7)], SCHEMA),
    )
    assert n == 0
    assert _rows(catalog, "t.nomatch") == [("feb", 3), ("mar", 7)]


def test_replace_where_change_feed_shows_delete_insert(catalog, spark):
    catalog.register("t.cf", SCHEMA)
    catalog.append("t.cf", spark.createDataFrame([("jan", 1)], SCHEMA))
    catalog.replace_where(
        "t.cf", "month = 'jan'", spark.createDataFrame([("jan", 5)], SCHEMA)
    )
    ch = catalog.changes("t.cf", from_version=1).collect()
    kinds = sorted((r.month, r.amt, r._change_type) for r in ch)
    assert kinds == [("jan", 1, "delete"), ("jan", 5, "insert")]


def test_not_null_enforced_on_write(catalog, spark):
    nn = T.StructType(
        [
            T.StructField("k", T.IntegerType(), nullable=False),
            T.StructField("v", T.StringType(), nullable=True),
        ]
    )
    catalog.register("t.nn", nn)
    catalog.append(
        "t.nn", spark.createDataFrame([(1, None)], "k int, v string")
    )
    with pytest.raises(ConstraintViolation, match="__not_null_k"):
        catalog.append(
            "t.nn", spark.createDataFrame([(None, "x")], "k int, v string")
        )
    assert [r.k for r in catalog.table("t.nn").collect()] == [1]


def test_insert_replace_where_sql(catalog, spark):
    from certified_dogs_and_cats_spark.pipeline import DdlSession

    ddl = DdlSession(catalog)
    ddl.execute(
        "CREATE TABLE core.sales (month STRING, amt INT) USING parquet;"
        "INSERT INTO core.sales VALUES ('jan', 1), ('jan', 2), ('feb', 3)"
    )
    ddl.execute(
        "INSERT INTO core.sales REPLACE WHERE month = 'jan'"
        " VALUES ('jan', 10), ('jan', 20)"
    )
    got = sorted(
        (r.month, r.amt) for r in catalog.table("core.sales").collect()
    )
    assert got == [("feb", 3), ("jan", 10), ("jan", 20)]

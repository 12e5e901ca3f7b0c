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


# --- review-fix regressions -------------------------------------------------


def test_or_predicate_with_string_literals_never_prunes(catalog, spark):
    """An OR-disjunction must parse to NO prunable conjunct — a greedy
    literal parse once swallowed \"'x' OR b = 'y'\" into one garbage
    equality and silently dropped matching files."""
    from certified_dogs_and_cats_spark.pipeline.skipping import (
        parse_conjuncts,
    )

    assert parse_conjuncts("a = 'x' OR b = 'y'") == []
    assert parse_conjuncts("a IN ('x') OR (b = 'y')") == []

    catalog.register("t.orp", SCHEMA)
    catalog.append(
        "t.orp",
        spark.createDataFrame([("zzz", 1), ("jan", 2)], SCHEMA).coalesce(1),
    )
    pred = "month = 'nope' OR amt = 2"
    got = sorted(r.amt for r in catalog.scan("t.orp", pred).collect())
    want = sorted(
        r.amt for r in catalog.table("t.orp").filter(pred).collect()
    )
    assert got == want == [2]


def test_identity_survives_compact_and_rewrite_paths(catalog, spark):
    """Maintenance rewrites must round-trip engine-assigned identity
    values, not reject them as writer-provided."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("rid", T.LongType()),
            T.StructField("v", T.StringType()),
        ]
    )
    spec = catalog.register("t.idm", schema)
    spec.identity["rid"] = {"start": 1, "step": 1}
    v_only = T.StructType([T.StructField("v", T.StringType())])
    catalog.append("t.idm", spark.createDataFrame([("a",), ("b",)], v_only))
    before = sorted((r.rid, r.v) for r in catalog.table("t.idm").collect())
    catalog.compact("t.idm")
    after = sorted((r.rid, r.v) for r in catalog.table("t.idm").collect())
    assert after == before
    # Copy-on-write delete also rewrites the survivors unchanged.
    catalog.delete_where("t.idm", "v = 'a'", rewrite=True)
    left = [(r.rid, r.v) for r in catalog.table("t.idm").collect()]
    assert left == [x for x in before if x[1] == "b"]
    # merge_schema appends still get engine-assigned ids (no NULL fill).
    catalog.append(
        "t.idm",
        spark.createDataFrame([("c",)], v_only),
        merge_schema=True,
    )
    rids = [r.rid for r in catalog.table("t.idm").collect()]
    assert None not in rids and len(set(rids)) == 2


def test_optimize_where_between_predicate(catalog, spark):
    from pyspark.sql import types as T

    part_schema = T.StructType(
        [*SCHEMA.fields, T.StructField("yr", T.IntegerType())]
    )
    catalog.register("t.btw", part_schema, partition_by=("yr",))
    rows = [("jan", i, 2020 + i % 3) for i in range(9)]
    catalog.append("t.btw", spark.createDataFrame(rows, part_schema))
    catalog.compact("t.btw", where="yr BETWEEN 2020 AND 2021")
    assert catalog.table("t.btw").count() == 9

"""Column DEFAULTs (Delta CURRENT DEFAULT parity): write-time
materialization for writers that omit the column; explicit values —
including explicit NULLs — taken as written; existing files never
rewritten."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from certified_dogs_and_cats_spark.pipeline.ddl import DdlError, DdlSession

SCHEMA = T.StructType(
    [
        T.StructField("k", T.IntegerType()),
        T.StructField("src", T.StringType()),
    ]
)


def test_omitted_column_gets_default(catalog, spark):
    catalog.register("t.dflt", SCHEMA)
    catalog.set_default("t.dflt", "src", "'manual'")
    narrow = spark.createDataFrame(
        [(1,)], T.StructType([T.StructField("k", T.IntegerType())])
    )
    catalog.append("t.dflt", narrow, merge_schema=True)
    full = spark.createDataFrame([(2, "api"), (3, None)], SCHEMA)
    catalog.append("t.dflt", full)
    rows = {r.k: r.src for r in catalog.table("t.dflt").collect()}
    assert rows == {1: "manual", 2: "api", 3: None}  # explicit NULL stays


def test_add_column_with_default_old_rows_read_null(catalog, spark):
    catalog.register("t.dflt2", SCHEMA)
    catalog.append("t.dflt2", spark.createDataFrame([(1, "a")], SCHEMA))
    catalog.add_column("t.dflt2", T.StructField("score", T.IntegerType(), True))
    catalog.set_default("t.dflt2", "score", "7")
    catalog.append(
        "t.dflt2", spark.createDataFrame([(2, "b")], SCHEMA), merge_schema=True
    )
    rows = {r.k: r.score for r in catalog.table("t.dflt2").collect()}
    # Pre-default files are NOT rewritten: they read NULL; new writes
    # that omit the column materialize the default.
    assert rows == {1: None, 2: 7}


def test_default_survives_session_rehydration(catalog, spark):
    from certified_dogs_and_cats_spark.pipeline.catalog import Catalog

    catalog.register("t.dflt3", SCHEMA)
    catalog.set_default("t.dflt3", "src", "'x'")
    cat2 = Catalog(spark, catalog.root)
    cat2.register("t.dflt3", SCHEMA)
    assert cat2.tables["t.dflt3"].defaults == {"src": "'x'"}


def test_default_rejected_on_generated_or_identity(catalog, spark):
    catalog.register("t.dflt4", SCHEMA)
    catalog.tables["t.dflt4"].generated["src"] = "concat('g', k)"
    with pytest.raises(ValueError, match="generated/identity"):
        catalog.set_default("t.dflt4", "src", "'x'")


def test_sql_front_door_defaults(catalog, spark):
    ddl = DdlSession(catalog)
    ddl.execute("USE SCHEMA core")
    ddl.execute(
        "CREATE TABLE dt (k INT, src STRING DEFAULT 'manual');"
        "INSERT INTO dt (k) VALUES (1);"
        "INSERT INTO dt VALUES (2, 'api')"
    )
    rows = {r.k: r.src for r in ddl.execute("SELECT * FROM dt")[-1].collect()}
    assert rows == {1: "manual", 2: "api"}
    # ALTER COLUMN SET / DROP DEFAULT.
    ddl.execute("ALTER TABLE dt ALTER COLUMN src SET DEFAULT 'bulk'")
    ddl.execute("INSERT INTO dt (k) VALUES (3)")
    ddl.execute("ALTER TABLE dt ALTER COLUMN src DROP DEFAULT")
    rows = {r.k: r.src for r in ddl.execute("SELECT * FROM dt")[-1].collect()}
    assert rows[3] == "bulk"
    # ADD COLUMN ... DEFAULT fills future writes only.
    ddl.execute("ALTER TABLE dt ADD COLUMN n INT DEFAULT 5")
    ddl.execute("INSERT INTO dt (k, src) VALUES (4, 'z')")
    rows = {r.k: r.n for r in ddl.execute("SELECT * FROM dt")[-1].collect()}
    assert rows[4] == 5 and rows[1] is None
    # SHOW CREATE TABLE replays the clause.
    stmt = ddl.execute("SHOW CREATE TABLE dt")[-1].collect()[0][0]
    assert "DEFAULT 5" in stmt
    with pytest.raises(DdlError):
        ddl.execute("ALTER TABLE nope ALTER COLUMN x SET DEFAULT 1")


def test_insert_values_default_keyword(catalog, spark):
    """SQL-standard INSERT ... VALUES (1, DEFAULT): the keyword
    substitutes the column's default expression positionally; a column
    without a default raises instead of silently writing NULL."""
    ddl = DdlSession(catalog)
    ddl.execute("USE SCHEMA core")
    ddl.execute(
        "CREATE TABLE dk (k INT, src STRING DEFAULT 'manual');"
        "INSERT INTO dk VALUES (1, DEFAULT), (2, 'api');"
        "INSERT INTO dk (k, src) VALUES (3, DEFAULT)"
    )
    rows = {r.k: r.src for r in ddl.execute("SELECT * FROM dk")[-1].collect()}
    assert rows == {1: "manual", 2: "api", 3: "manual"}
    with pytest.raises(DdlError, match="no DEFAULT"):
        ddl.execute("INSERT INTO dk VALUES (DEFAULT, 'x')")


def test_add_column_function_call_default_keeps_parens(catalog, spark):
    """ADD COLUMN with an EXPRESSION default whose text ends in ')' —
    both the bare and the parenthesized ADD COLUMNS (...) forms must
    store the expression intact (a paren-greedy parse used to truncate
    upper('x') to upper('x' and fail at write time)."""
    ddl = DdlSession(catalog)
    ddl.execute("USE SCHEMA core")
    ddl.execute("CREATE TABLE fd (k INT)")
    ddl.execute("ALTER TABLE fd ADD COLUMN a STRING DEFAULT upper('x')")
    ddl.execute(
        "ALTER TABLE fd ADD COLUMNS (b STRING DEFAULT concat('a', 'b'))"
    )
    spec = catalog.tables["core.fd"]
    assert spec.defaults["a"] == "upper('x')"
    assert spec.defaults["b"] == "concat('a', 'b')"
    ddl.execute("INSERT INTO fd (k) VALUES (1)")
    row = ddl.execute("SELECT * FROM fd")[-1].collect()[0]
    assert (row.a, row.b) == ("X", "ab")

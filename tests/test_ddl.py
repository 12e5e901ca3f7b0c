"""SQL DDL front door: the reference's own DDL statements must execute
against the local catalog (schema mgmt, table registration with partition/
collation/location clauses, views over catalog tables, drops, SHOW/DESCRIBE).
"""

from __future__ import annotations

import pytest

from certified_dogs_and_cats_spark.pipeline import DdlError, DdlSession

# Verbatim shape of the reference DDL (notebooks/bronze.py:131-146,
# sql/breed_mapping.py:2-11, sql/register_bronze.sql).
BRONZE_DDL = """
USE CATALOG pets; USE SCHEMA core;
CREATE TABLE IF NOT EXISTS pets.core.licensed_pets_bronze (
  _id INT NOT NULL,
  Year INT,
  FSA STRING,
  FSA_VALID BOOLEAN,
  ANIMAL_TYPE STRING,
  PRIMARY_BREED STRING,
  ingestion_ts TIMESTAMP,
  ingestion_date DATE
)
USING DELTA
PARTITIONED BY (Year, ANIMAL_TYPE)
DEFAULT COLLATION UTF8_BINARY
LOCATION 's3://your-bucket/bronze_v2/licensed_pets';
"""

REF_SCHEMA_DDL = """
CREATE SCHEMA IF NOT EXISTS pets.ref COMMENT 'Reference data';
CREATE TABLE IF NOT EXISTS pets.ref.breed_mapping (
  breed_variant_key STRING,      -- normalized key
  breed_standard    STRING       -- canonical label
)
USING DELTA;
"""


@pytest.fixture
def ddl(catalog):
    return DdlSession(catalog)


def test_create_table_registers_schema_and_partitions(ddl, catalog):
    ddl.execute(BRONZE_DDL)
    spec = catalog.tables["core.licensed_pets_bronze"]
    assert spec.partition_by == ("Year", "ANIMAL_TYPE")
    assert spec.fmt == "parquet"  # DELTA maps to the local parquet catalog
    fields = {f.name: f for f in spec.schema.fields}
    assert fields["_id"].nullable is False
    assert fields["ingestion_date"].dataType.simpleString() == "date"
    # IF NOT EXISTS: re-running the same DDL is a no-op, not an error.
    ddl.execute(BRONZE_DDL)


def test_create_schema_and_unqualified_resolution(ddl, catalog):
    ddl.execute(REF_SCHEMA_DDL)
    assert "ref" in ddl.schemas
    assert "ref.breed_mapping" in catalog.tables
    ddl.execute("USE SCHEMA ref")
    assert ddl.resolve("breed_mapping") == "ref.breed_mapping"


def test_view_over_catalog_table(ddl, catalog, spark):
    ddl.execute(BRONZE_DDL)
    from datetime import date, datetime

    ddl_schema = catalog.tables["core.licensed_pets_bronze"].schema
    catalog.append(
        "core.licensed_pets_bronze",
        spark.createDataFrame(
            [
                (1, 2024, "M1A", True, "DOG", "POODLE",
                 datetime(2026, 1, 1), date(2026, 1, 1)),
                (2, 2024, "bad", False, "CAT", "SIAMESE",
                 datetime(2026, 1, 1), date(2026, 1, 1)),
            ],
            ddl_schema,
        ),
    )
    # The reference's bronze health view, verbatim shape (bronze.py:152-158).
    [df] = ddl.execute("""
        CREATE OR REPLACE VIEW pets.core.v_bronze_health AS
        SELECT COUNT(*) AS total_rows,
               SUM(CASE WHEN FSA_VALID THEN 0 ELSE 1 END) AS invalid_fsa_rows,
               COUNT(DISTINCT Year) AS years,
               MAX(ingestion_ts) AS last_commit_ts
        FROM pets.core.licensed_pets_bronze
    """)
    row = df.collect()[0]
    assert (row.total_rows, row.invalid_fsa_rows, row.years) == (2, 1, 1)
    # Registered for direct spark.sql use under the sanitized name.
    assert spark.sql(
        "SELECT total_rows FROM core_v_bronze_health"
    ).collect()[0].total_rows == 2


def test_show_describe_and_drop(ddl, catalog, spark):
    ddl.execute(BRONZE_DDL + REF_SCHEMA_DDL)
    [schemas] = ddl.execute("SHOW SCHEMAS")
    assert {r.schema_name for r in schemas.collect()} >= {"core", "ref"}
    [tables] = ddl.execute("SHOW TABLES")
    assert {r.table_name for r in tables.collect()} == {
        "licensed_pets_bronze", "breed_mapping",
    }
    [desc] = ddl.execute("DESCRIBE pets.core.licensed_pets_bronze")
    by_col = {r.col_name: r for r in desc.collect()}
    assert by_col["Year"].is_partition and not by_col["FSA"].is_partition
    ddl.execute("DROP TABLE pets.ref.breed_mapping")
    assert "ref.breed_mapping" not in catalog.tables
    ddl.execute("DROP TABLE IF EXISTS pets.ref.breed_mapping")  # no error
    with pytest.raises(DdlError):
        ddl.execute("DROP TABLE pets.ref.breed_mapping")


def test_errors(ddl):
    with pytest.raises(DdlError, match="unsupported type"):
        ddl.execute("CREATE TABLE t (x BLOB)")
    with pytest.raises(DdlError, match="unsupported statement"):
        ddl.execute("ALTER TABLE t ADD COLUMN y INT")
    ddl.execute("CREATE TABLE t (x INT)")
    with pytest.raises(DdlError, match="exists"):
        ddl.execute("CREATE TABLE t (x INT)")


def test_select_and_explain_passthrough(ddl, catalog, spark):
    """DdlSession is a full SQL front door: SELECTs over qualified catalog
    names run directly, EXPLAIN returns the physical plan."""
    ddl.execute(BRONZE_DDL)
    ddl_schema = catalog.tables["core.licensed_pets_bronze"].schema
    from datetime import date, datetime

    catalog.append(
        "core.licensed_pets_bronze",
        spark.createDataFrame(
            [(1, 2024, "M1A", True, "DOG", "POODLE",
              datetime(2026, 1, 1), date(2026, 1, 1))],
            ddl_schema,
        ),
    )
    [df] = ddl.execute(
        "SELECT Year, count(*) AS cnt FROM pets.core.licensed_pets_bronze "
        "GROUP BY Year"
    )
    assert df.collect()[0].cnt == 1
    [plan] = ddl.execute(
        "EXPLAIN SELECT * FROM pets.core.licensed_pets_bronze WHERE Year = 2024"
    )
    text = "\n".join(r.plan for r in plan.collect())
    assert "Scan parquet" in text or "Scan " in text

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
        ddl.execute("GRANT SELECT ON t TO somebody")
    ddl.execute("CREATE TABLE t (x INT)")
    with pytest.raises(DdlError, match="exists"):
        ddl.execute("CREATE TABLE t (x INT)")


def test_alter_table_add_column_schema_evolution(ddl, catalog, spark):
    """ALTER TABLE ADD COLUMN is metadata-only: files written before the
    column was added read back with NULLs, new appends carry values."""
    ddl.execute("CREATE TABLE t.ev (k STRING, v INT)")
    catalog.append("t.ev", spark.createDataFrame([("a", 1)], "k string, v int"))
    ddl.execute("ALTER TABLE t.ev ADD COLUMN score DOUBLE")
    catalog.append(
        "t.ev",
        spark.createDataFrame(
            [("b", 2, 0.5)], "k string, v int, score double"
        ),
    )
    got = {r.k: (r.v, r.score) for r in catalog.table("t.ev").collect()}
    assert got == {"a": (1, None), "b": (2, 0.5)}
    [desc] = ddl.execute("DESCRIBE t.ev")
    assert [r.col_name for r in desc.collect()] == ["k", "v", "score"]
    # DROP COLUMN is a copy-on-write rewrite (round-4 addition).
    ddl.execute("ALTER TABLE t.ev DROP COLUMN v")
    assert catalog.table("t.ev").columns == ["k", "score"]
    with pytest.raises(DdlError, match="unsupported ALTER"):
        ddl.execute("ALTER TABLE t.ev SET TBLPROPERTIES ('a'='b')")


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


# --- DML: the reference's INSERT INTO / MERGE INTO spellings -----------------

LOAD_CONTROL_DDL = """
CREATE TABLE IF NOT EXISTS pets.core.load_control (
  dataset STRING,
  ingestion_date DATE,
  loaded_ts TIMESTAMP
) USING DELTA;
"""


def test_insert_into_reference_spelling(ddl, catalog):
    """notebooks/bronze.py:119-122 verbatim shape."""
    ddl.execute(LOAD_CONTROL_DDL)
    ddl.execute("""
      INSERT INTO pets.core.load_control
      VALUES ('licensed_pets', DATE('2025-03-01'), current_timestamp())
    """)
    rows = catalog.table("core.load_control").collect()
    assert len(rows) == 1
    assert rows[0].dataset == "licensed_pets"
    assert rows[0].ingestion_date.isoformat() == "2025-03-01"
    assert rows[0].loaded_ts is not None
    # Second insert appends (INSERT has no idempotency — that's the
    # anti-join's job, reference architecture.md:16-17).
    ddl.execute(
        "INSERT INTO pets.core.load_control "
        "VALUES ('licensed_pets', DATE('2025-03-02'), current_timestamp())"
    )
    assert catalog.table("core.load_control").count() == 2


def test_insert_into_column_list_and_select(ddl, catalog):
    ddl.execute(LOAD_CONTROL_DDL)
    ddl.execute(
        "INSERT INTO pets.core.load_control (dataset, ingestion_date) "
        "VALUES ('partial', DATE('2025-04-01'))"
    )
    row = catalog.table("core.load_control").collect()[0]
    assert row.dataset == "partial" and row.loaded_ts is None
    ddl.execute(
        "INSERT INTO pets.core.load_control "
        "SELECT dataset, ingestion_date, current_timestamp() "
        "FROM pets.core.load_control"
    )
    assert catalog.table("core.load_control").count() == 2
    with pytest.raises(DdlError, match="values for"):
        ddl.execute("INSERT INTO pets.core.load_control VALUES ('x')")


# sql/breed_mapping.py:560-618 shape: CTE-seeded MERGE with both clauses.
SEED_MERGE = """
WITH v(key, val) AS (
  VALUES
    ('Golden Retriever', 'GOLDEN RETRIEVER'),
    ('golden  retriever', 'GOLDEN RETRIEVER'),
    ('Lab', 'LABRADOR RETRIEVER')
),
norm AS (
  SELECT
    regexp_replace(upper(trim(key)), '[^A-Z0-9]', '') AS breed_variant_key,
    val AS breed_standard
  FROM v
),
dedup AS (
  SELECT breed_variant_key, max(breed_standard) AS breed_standard
  FROM norm
  GROUP BY breed_variant_key
)
MERGE INTO pets.ref.breed_mapping AS t
USING dedup AS s
ON t.breed_variant_key = s.breed_variant_key
WHEN MATCHED THEN
  UPDATE SET t.breed_standard = s.breed_standard
WHEN NOT MATCHED THEN
  INSERT (breed_variant_key, breed_standard)
  VALUES (s.breed_variant_key, s.breed_standard);
"""


def test_merge_into_reference_seed_upsert(ddl, catalog):
    ddl.execute(REF_SCHEMA_DDL)
    ddl.execute(SEED_MERGE)
    got = {
        r.breed_variant_key: r.breed_standard
        for r in catalog.table("ref.breed_mapping").collect()
    }
    assert got == {
        "GOLDENRETRIEVER": "GOLDEN RETRIEVER",
        "LAB": "LABRADOR RETRIEVER",
    }
    # Re-running the same MERGE is idempotent (matched rows update to the
    # same values, nothing inserts).
    ddl.execute(SEED_MERGE)
    assert catalog.table("ref.breed_mapping").count() == 2
    # A changed seed updates in place and inserts the new key.
    ddl.execute(SEED_MERGE.replace(
        "('Lab', 'LABRADOR RETRIEVER')",
        "('Lab', 'LAB RETRIEVER'), ('Pug!', 'PUG')",
    ))
    got = {
        r.breed_variant_key: r.breed_standard
        for r in catalog.table("ref.breed_mapping").collect()
    }
    assert got == {
        "GOLDENRETRIEVER": "GOLDEN RETRIEVER",
        "LAB": "LAB RETRIEVER",
        "PUG": "PUG",
    }


def test_merge_into_update_only_with_subquery_source(ddl, catalog, spark):
    """sql/breed_mapping.py:608-618 shape: USING (subquery), UPDATE SET with
    a literal, no NOT MATCHED clause — unmatched target rows must survive
    unchanged and unmatched source rows must NOT insert."""
    ddl.execute(REF_SCHEMA_DDL)
    ddl.execute("""
      CREATE TABLE pets.core.silver_mini (
        _id INT, breed_variant_key STRING,
        breed_standard STRING, breed_mapped BOOLEAN
      ) USING DELTA;
      INSERT INTO pets.core.silver_mini VALUES
        (1, 'LAB', 'LAB', false),
        (2, 'UNKNOWNBREED', 'UNKNOWNBREED', false);
      INSERT INTO pets.ref.breed_mapping VALUES
        ('LAB', 'LABRADOR RETRIEVER'), ('PUG', 'PUG');
    """)
    ddl.execute("""
      MERGE INTO pets.core.silver_mini s
      USING (
        SELECT breed_variant_key, max(breed_standard) AS breed_standard
        FROM pets.ref.breed_mapping
        GROUP BY breed_variant_key
      ) m
      ON s.breed_variant_key = m.breed_variant_key
      WHEN MATCHED THEN UPDATE SET
        s.breed_standard = m.breed_standard,
        s.breed_mapped   = TRUE;
    """)
    rows = {r._id: r for r in catalog.table("core.silver_mini").collect()}
    assert len(rows) == 2  # PUG did not insert
    assert rows[1].breed_standard == "LABRADOR RETRIEVER"
    assert rows[1].breed_mapped is True
    assert rows[2].breed_standard == "UNKNOWNBREED"
    assert rows[2].breed_mapped is False


def test_quote_aware_split_comments_and_resolution(ddl, catalog):
    """';' and '--' inside string literals must not split/truncate the
    statement, and a table name inside a literal must not be rewritten."""
    ddl.execute("CREATE TABLE pets.core.notes (k STRING, v STRING)")
    ddl.execute(
        "INSERT INTO pets.core.notes VALUES "
        "('semi;colon', 'a--b'), ('ref', 'see pets.core.notes; -- really')"
    )
    got = {r.k: r.v for r in catalog.table("core.notes").collect()}
    assert got == {
        "semi;colon": "a--b",
        "ref": "see pets.core.notes; -- really",
    }
    [df] = ddl.execute(
        "SELECT v FROM pets.core.notes WHERE k = 'ref' -- trailing comment"
    )
    assert df.collect()[0].v == "see pets.core.notes; -- really"


def test_optimize_vacuum_reference_spellings(ddl, catalog, spark):
    """docs/runbook.md:55-58,103-104 verbatim maintenance statements."""
    ddl.execute(BRONZE_DDL)
    ddl_schema = catalog.tables["core.licensed_pets_bronze"].schema
    from datetime import date, datetime

    rows = [
        (i, 2024, "M1A", True, "DOG", "POODLE",
         datetime(2026, 1, 1), date(2026, 1, 1))
        for i in range(20)
    ]
    catalog.append(
        "core.licensed_pets_bronze",
        spark.createDataFrame(rows, ddl_schema).repartition(4),
    )
    ddl.execute("""
      OPTIMIZE pets.core.licensed_pets_bronze;
      OPTIMIZE pets.core.licensed_pets_bronze ZORDER BY (_id, FSA);
      VACUUM pets.core.licensed_pets_bronze RETAIN 168 HOURS;
    """)
    assert catalog.table("core.licensed_pets_bronze").count() == 20
    # RETAIN 0 purges the versions the two OPTIMIZE rewrites retired.
    ddl.execute("VACUUM pets.core.licensed_pets_bronze RETAIN 0 HOURS")
    with pytest.raises(DdlError, match="not found"):
        ddl.execute("OPTIMIZE pets.core.nope")


def test_merge_ambiguous_source_match_raises(ddl, catalog):
    """Delta MERGE contract: several source rows matching one target row is
    an error, not a silent row duplication (the full-outer rewrite would
    otherwise grow the table)."""
    ddl.execute(REF_SCHEMA_DDL)
    ddl.execute(SEED_MERGE)
    before = catalog.table("ref.breed_mapping").count()
    dup_merge = """
    WITH v(breed_variant_key, breed_standard) AS (
      VALUES ('LAB', 'LABRADOR RETRIEVER'), ('LAB', 'LAB RETRIEVER')
    )
    MERGE INTO pets.ref.breed_mapping AS t
    USING v AS s
    ON t.breed_variant_key = s.breed_variant_key
    WHEN MATCHED THEN UPDATE SET t.breed_standard = s.breed_standard
    WHEN NOT MATCHED THEN
      INSERT (breed_variant_key, breed_standard)
      VALUES (s.breed_variant_key, s.breed_standard);
    """
    with pytest.raises(DdlError, match="multiple source rows"):
        ddl.execute(dup_merge)
    assert catalog.table("ref.breed_mapping").count() == before


def test_ctas_creates_and_populates(ddl, catalog):
    ddl.execute("USE SCHEMA core")
    ddl.execute(
        "CREATE TABLE src (k INT, v STRING, y INT);"
        "INSERT INTO src VALUES (1, 'a', 2024), (2, 'b', 2024),"
        " (3, 'c', 2025)"
    )
    ddl.execute(
        "CREATE TABLE snap PARTITIONED BY (y) AS "
        "SELECT k, v, y FROM src WHERE k >= 2"
    )
    assert catalog.tables["core.snap"].partition_by == ("y",)
    rows = sorted(
        (r.k, r.y) for r in ddl.execute("SELECT k, y FROM snap")[0].collect()
    )
    assert rows == [(2, 2024), (3, 2025)]


def test_ctas_or_replace_and_if_not_exists(ddl, catalog):
    ddl.execute("USE SCHEMA core")
    ddl.execute(
        "CREATE TABLE s2 (k INT); INSERT INTO s2 VALUES (1), (2)"
    )
    ddl.execute("CREATE TABLE c2 AS SELECT k FROM s2")
    # IF NOT EXISTS: no-op on existing target.
    ddl.execute("CREATE TABLE IF NOT EXISTS c2 AS SELECT k FROM s2 WHERE k=1")
    assert ddl.execute("SELECT count(*) AS n FROM c2")[0].collect()[0].n == 2
    # OR REPLACE: swaps the contents.
    ddl.execute("CREATE OR REPLACE TABLE c2 AS SELECT k FROM s2 WHERE k = 1")
    assert ddl.execute("SELECT count(*) AS n FROM c2")[0].collect()[0].n == 1
    # Plain CREATE on an existing table still errors.
    import pytest as _pytest

    from certified_dogs_and_cats_spark.pipeline import DdlError as _E

    with _pytest.raises(_E):
        ddl.execute("CREATE TABLE c2 AS SELECT k FROM s2")


def test_ctas_bad_partition_column_raises(ddl):
    ddl.execute("USE SCHEMA core")
    ddl.execute("CREATE TABLE s3 (k INT); INSERT INTO s3 VALUES (1)")
    with pytest.raises(DdlError):
        ddl.execute(
            "CREATE TABLE c3 PARTITIONED BY (nope) AS SELECT k FROM s3"
        )


def test_delete_from_is_copy_on_write(ddl, catalog):
    ddl.execute("USE SCHEMA core")
    ddl.execute(
        "CREATE TABLE d1 (k INT, v STRING);"
        "INSERT INTO d1 VALUES (1, 'a'), (2, 'b'), (3, NULL)"
    )
    ddl.execute("DELETE FROM d1 WHERE k >= 2")
    rows = sorted(r.k for r in catalog.table("core.d1").collect())
    assert rows == [1]
    # Prior version still time-travel-readable (copy-on-write).
    v_before = catalog.current_version("core.d1") - 1
    old = sorted(
        r.k for r in catalog.table("core.d1", version=v_before).collect()
    )
    assert old == [1, 2, 3]
    # Unconditional DELETE empties the table but keeps the registration.
    ddl.execute("DELETE FROM d1")
    assert catalog.table("core.d1").count() == 0


def test_delete_null_condition_rows_survive(ddl, catalog):
    ddl.execute("USE SCHEMA core")
    ddl.execute(
        "CREATE TABLE d2 (k INT, v STRING);"
        "INSERT INTO d2 VALUES (1, 'x'), (2, NULL)"
    )
    # WHERE v = 'x' is NULL (not TRUE) for row 2 -> row 2 must survive,
    # matching standard SQL DELETE semantics.
    ddl.execute("DELETE FROM d2 WHERE v = 'x'")
    assert [r.k for r in catalog.table("core.d2").collect()] == [2]


def test_update_applies_simultaneously_and_casts(ddl, catalog):
    ddl.execute("USE SCHEMA core")
    ddl.execute(
        "CREATE TABLE u1 (k INT, a INT, b INT);"
        "INSERT INTO u1 VALUES (1, 10, 20), (2, 30, 40)"
    )
    # a and b swap: proves both SETs see the PRE-update row.
    ddl.execute("UPDATE u1 SET a = b, b = a WHERE k = 1")
    rows = {r.k: (r.a, r.b) for r in catalog.table("core.u1").collect()}
    assert rows[1] == (20, 10)
    assert rows[2] == (30, 40)  # non-matching row untouched
    # Assignment result casts to the declared type (INT).
    ddl.execute("UPDATE u1 SET a = a * 1.5 WHERE k = 2")
    rows = {r.k: r.a for r in catalog.table("core.u1").collect()}
    assert rows[2] == 45


def test_truncate_keeps_schema(ddl, catalog):
    ddl.execute("USE SCHEMA core")
    ddl.execute("CREATE TABLE tr1 (k INT); INSERT INTO tr1 VALUES (1), (2)")
    ddl.execute("TRUNCATE TABLE tr1")
    assert catalog.table("core.tr1").count() == 0
    ddl.execute("INSERT INTO tr1 VALUES (9)")
    assert [r.k for r in catalog.table("core.tr1").collect()] == [9]


def test_update_unknown_column_raises(ddl):
    ddl.execute("USE SCHEMA core")
    ddl.execute("CREATE TABLE u2 (k INT)")
    with pytest.raises(DdlError):
        ddl.execute("UPDATE u2 SET nope = 1")


def test_check_constraint_blocks_bad_writes(ddl, catalog):
    from certified_dogs_and_cats_spark.pipeline.catalog import (
        ConstraintViolation,
    )

    ddl.execute("USE SCHEMA core")
    ddl.execute("CREATE TABLE cc1 (k INT, amt DOUBLE)")
    ddl.execute("INSERT INTO cc1 VALUES (1, 5.0)")
    ddl.execute("ALTER TABLE cc1 ADD CONSTRAINT amt_pos CHECK (amt >= 0)")
    # Valid rows pass; NULL fails the check (predicate must be TRUE).
    ddl.execute("INSERT INTO cc1 VALUES (2, 1.0)")
    import pytest as _p

    with _p.raises(ConstraintViolation):
        ddl.execute("INSERT INTO cc1 VALUES (3, -4.0)")
    with _p.raises(ConstraintViolation):
        ddl.execute("INSERT INTO cc1 VALUES (4, NULL)")
    # Failed write must not have landed.
    assert catalog.table("core.cc1").count() == 2
    # Copy-on-write UPDATE is also gated.
    with _p.raises(ConstraintViolation):
        ddl.execute("UPDATE cc1 SET amt = -1.0 WHERE k = 1")
    # DROP CONSTRAINT re-opens the gate.
    ddl.execute("ALTER TABLE cc1 DROP CONSTRAINT amt_pos")
    ddl.execute("INSERT INTO cc1 VALUES (5, -9.0)")
    assert catalog.table("core.cc1").count() == 3


def test_add_constraint_validates_existing_rows(ddl, catalog):
    from certified_dogs_and_cats_spark.pipeline.catalog import (
        ConstraintViolation,
    )

    ddl.execute("USE SCHEMA core")
    ddl.execute("CREATE TABLE cc2 (k INT); INSERT INTO cc2 VALUES (-1)")
    with pytest.raises(ConstraintViolation):
        ddl.execute("ALTER TABLE cc2 ADD CONSTRAINT k_pos CHECK (k > 0)")
    # Rejected constraint must not be registered.
    ddl.execute("INSERT INTO cc2 VALUES (-2)")


def test_show_partitions_and_describe_detail(ddl, catalog):
    ddl.execute("USE SCHEMA core")
    ddl.execute(
        "CREATE TABLE pt (k INT, y INT) PARTITIONED BY (y);"
        "INSERT INTO pt VALUES (1, 2024), (2, 2025), (3, 2024)"
    )
    parts = [r.partition for r in ddl.execute("SHOW PARTITIONS pt")[0].collect()]
    assert parts == ["y=2024", "y=2025"]
    detail = ddl.execute("DESCRIBE DETAIL pt")[0].collect()[0]
    assert detail.partition_columns == "y"
    assert detail.num_files >= 2  # one dir per partition value
    assert detail.version == 1
    with pytest.raises(DdlError):
        ddl.execute("SHOW PARTITIONS nope")


def test_restore_table_rolls_back_and_is_a_new_version(ddl, catalog):
    ddl.execute("USE SCHEMA core")
    ddl.execute("CREATE TABLE rt (k INT); INSERT INTO rt VALUES (1), (2)")
    ddl.execute("UPDATE rt SET k = k * 10")
    assert sorted(r.k for r in catalog.table("core.rt").collect()) == [10, 20]
    v_good = 1  # the original insert
    ddl.execute(f"RESTORE TABLE rt TO VERSION AS OF {v_good}")
    assert sorted(r.k for r in catalog.table("core.rt").collect()) == [1, 2]
    # History is append-only: the restore created a THIRD version, and the
    # pre-restore state is still readable.
    assert catalog.current_version("core.rt") == 3
    assert sorted(
        r.k for r in catalog.table("core.rt", version=2).collect()
    ) == [10, 20]


def test_copy_into_is_file_level_exactly_once(ddl, catalog, tmp_path):
    ddl.execute("USE SCHEMA core")
    ddl.execute("CREATE TABLE ci (k INT, v STRING)")
    src = tmp_path / "drop"
    src.mkdir()
    (src / "a.csv").write_text("k,v\n1,a\n2,b\n")
    out = ddl.execute(
        f"COPY INTO ci FROM '{src}' FILEFORMAT = CSV"
        " FORMAT_OPTIONS ('header' = 'true')"
    )[0].collect()[0]
    assert (out.num_files_loaded, out.num_rows_inserted) == (1, 2)
    # Re-run: nothing new -> no-op.
    out2 = ddl.execute(f"COPY INTO ci FROM '{src}'")[0].collect()[0]
    assert (out2.num_files_loaded, out2.num_rows_inserted) == (0, 0)
    assert catalog.table("core.ci").count() == 2
    # A new file loads exactly the delta.
    (src / "b.csv").write_text("k,v\n3,c\n")
    out3 = ddl.execute(f"COPY INTO ci FROM '{src}'")[0].collect()[0]
    assert (out3.num_files_loaded, out3.num_rows_inserted) == (1, 1)
    assert sorted(r.k for r in catalog.table("core.ci").collect()) == [1, 2, 3]


def test_rename_and_drop_column_copy_on_write(ddl, catalog):
    ddl.execute("USE SCHEMA core")
    ddl.execute(
        "CREATE TABLE rc (k INT, old_name STRING, extra INT);"
        "INSERT INTO rc VALUES (1, 'x', 10), (2, 'y', 20)"
    )
    ddl.execute("ALTER TABLE rc RENAME COLUMN old_name TO new_name")
    rows = {r.k: r.new_name for r in catalog.table("core.rc").collect()}
    assert rows == {1: "x", 2: "y"}
    assert "old_name" not in catalog.table("core.rc").columns
    ddl.execute("ALTER TABLE rc DROP COLUMN extra")
    assert catalog.table("core.rc").columns == ["k", "new_name"]
    # Data survives both rewrites.
    assert {r.k for r in catalog.table("core.rc").collect()} == {1, 2}


def test_alter_column_guards(ddl, catalog):
    ddl.execute("USE SCHEMA core")
    ddl.execute(
        "CREATE TABLE rg (k INT, y INT, amt DOUBLE) PARTITIONED BY (y);"
        "INSERT INTO rg VALUES (1, 2024, 5.0)"
    )
    ddl.execute("ALTER TABLE rg ADD CONSTRAINT amt_pos CHECK (amt >= 0)")
    with pytest.raises(DdlError):  # partition column
        ddl.execute("ALTER TABLE rg RENAME COLUMN y TO year")
    with pytest.raises(DdlError):  # constraint-referenced column
        ddl.execute("ALTER TABLE rg DROP COLUMN amt")
    with pytest.raises(DdlError):  # unknown column
        ddl.execute("ALTER TABLE rg DROP COLUMN nope")


def test_table_changes_tvf(ddl, catalog):
    """SELECT over table_changes('t', from[, to]) — the CDF feed through
    the SQL front door, with bare-name schema resolution."""
    ddl.execute("USE SCHEMA core")
    ddl.execute(
        "CREATE TABLE cdf (k INT, v STRING);"
        "INSERT INTO cdf VALUES (1, 'a');"
        "INSERT INTO cdf VALUES (2, 'b')"
    )
    rows = ddl.execute(
        "SELECT k, v, _change_type, _commit_version "
        "FROM table_changes('cdf', 1) ORDER BY k"
    )[-1].collect()
    assert [(r.k, r.v, r._change_type, r._commit_version) for r in rows] == [
        (2, "b", "insert", 2)
    ]
    # Bounded range + qualified name.
    rows = ddl.execute(
        "SELECT count(*) AS n FROM table_changes('pets.core.cdf', 0, 2)"
    )[-1].collect()
    assert rows[0].n == 2


def test_materialized_view_lifecycle(ddl, catalog):
    """CREATE MATERIALIZED VIEW populates a real table; REFRESH applies
    only the source commits since the last refresh (CDC deltas)."""
    ddl.execute("USE SCHEMA core")
    ddl.execute(
        "CREATE TABLE mv_src (grp STRING, amt DOUBLE);"
        "INSERT INTO mv_src VALUES ('a', 1.0), ('a', 2.0), ('b', 5.0);"
        "CREATE MATERIALIZED VIEW mv_agg AS "
        "SELECT grp, COUNT(*) AS cnt, SUM(amt) AS total "
        "FROM mv_src GROUP BY grp"
    )
    rows = ddl.execute("SELECT * FROM mv_agg ORDER BY grp")[-1].collect()
    assert [(r.grp, r.cnt, r.total) for r in rows] == [
        ("a", 2, 3.0),
        ("b", 1, 5.0),
    ]
    ddl.execute(
        "INSERT INTO mv_src VALUES ('b', 1.0), ('c', 7.0);"
        "REFRESH MATERIALIZED VIEW mv_agg"
    )
    rows = ddl.execute("SELECT * FROM mv_agg ORDER BY grp")[-1].collect()
    assert [(r.grp, r.cnt, r.total) for r in rows] == [
        ("a", 2, 3.0),
        ("b", 2, 6.0),
        ("c", 1, 7.0),
    ]
    with pytest.raises(DdlError):
        ddl.execute("REFRESH MATERIALIZED VIEW nope")
    with pytest.raises(DdlError):  # unsupported shape (MAX is not algebraic)
        ddl.execute(
            "CREATE MATERIALIZED VIEW bad AS SELECT grp, MAX(amt) AS m "
            "FROM mv_src GROUP BY grp"
        )


def test_show_tblproperties(ddl, catalog):
    ddl.execute("USE SCHEMA core")
    ddl.execute(
        "CREATE TABLE props (k INT) "
        "TBLPROPERTIES ('delta.enableDeletionVectors' = 'true', 'team' = 'data')"
    )
    rows = ddl.execute("SHOW TBLPROPERTIES props")[-1].collect()
    assert [(r.key, r.value) for r in rows] == [
        ("delta.enableDeletionVectors", "true"),
        ("team", "data"),
    ]
    with pytest.raises(DdlError):
        ddl.execute("SHOW TBLPROPERTIES nope")


def test_generated_columns_lifecycle(ddl, catalog):
    """GENERATED ALWAYS AS: computed when omitted, validated when
    provided, re-derived on UPDATE of source columns."""
    from certified_dogs_and_cats_spark.pipeline.catalog import (
        ConstraintViolation,
    )

    ddl.execute("USE SCHEMA core")
    ddl.execute(
        "CREATE TABLE gen (amt DOUBLE, yr INT, "
        "bucket STRING GENERATED ALWAYS AS "
        "(CASE WHEN amt >= 10 THEN 'big' ELSE 'small' END))"
    )
    # Column-list INSERT omits the generated column: computed.
    ddl.execute("INSERT INTO gen (amt, yr) VALUES (3.0, 2024), (12.0, 2025)")
    rows = {r.amt: r.bucket for r in catalog.table("core.gen").collect()}
    assert rows == {3.0: "small", 12.0: "big"}
    # Providing a CORRECT value passes; a wrong one raises.
    ddl.execute("INSERT INTO gen VALUES (20.0, 2025, 'big')")
    with pytest.raises(ConstraintViolation):
        ddl.execute("INSERT INTO gen VALUES (1.0, 2025, 'big')")
    assert catalog.table("core.gen").count() == 3
    # UPDATE of the source column re-derives the generated one.
    ddl.execute("UPDATE gen SET amt = 50.0 WHERE amt = 3.0")
    rows = {r.amt: r.bucket for r in catalog.table("core.gen").collect()}
    assert rows[50.0] == "big"


def test_generated_column_api_append(spark, tmp_path):
    import pyspark.sql.types as T

    from certified_dogs_and_cats_spark.pipeline.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "wh"))
    spec = cat.register(
        "core.g",
        T.StructType(
            [
                T.StructField("x", T.IntegerType(), False),
                T.StructField("x2", T.IntegerType(), True),
            ]
        ),
    )
    spec.generated["x2"] = "x * x"
    cat.append("core.g", spark.createDataFrame([(3,)], "x INT"))
    assert [(r.x, r.x2) for r in cat.table("core.g").collect()] == [(3, 9)]


# -- Delta full MERGE clause surface ------------------------------------------

ACCOUNTS_DDL = """
CREATE SCHEMA IF NOT EXISTS pets.fin;
CREATE TABLE pets.fin.accounts (id INT, bal DOUBLE, status STRING) USING DELTA;
INSERT INTO pets.fin.accounts VALUES
  (1, 10.0, 'open'), (2, 20.0, 'open'), (3, 30.0, 'frozen'), (4, 40.0, 'open');
"""


def _accounts(catalog):
    return {
        r.id: (r.bal, r.status)
        for r in catalog.table("fin.accounts").collect()
    }


def test_merge_matched_delete_clause(ddl, catalog):
    """WHEN MATCHED ... DELETE removes matched rows; unmatched survive."""
    ddl.execute(ACCOUNTS_DDL)
    ddl.execute("""
      MERGE INTO pets.fin.accounts AS t
      USING (SELECT 1 AS id UNION ALL SELECT 3 AS id) AS s
      ON t.id = s.id
      WHEN MATCHED THEN DELETE;
    """)
    assert set(_accounts(catalog)) == {2, 4}


def test_merge_conditional_matched_clauses_first_wins(ddl, catalog):
    """Two MATCHED clauses: the first whose AND-condition holds applies —
    frozen rows delete, open rows update (Delta clause-order contract)."""
    ddl.execute(ACCOUNTS_DDL)
    ddl.execute("""
      MERGE INTO pets.fin.accounts AS t
      USING (SELECT 1 AS id, 5.0 AS amt UNION ALL SELECT 3, 5.0) AS s
      ON t.id = s.id
      WHEN MATCHED AND t.status = 'frozen' THEN DELETE
      WHEN MATCHED THEN UPDATE SET bal = t.bal + s.amt;
    """)
    got = _accounts(catalog)
    assert 3 not in got               # frozen -> first clause deleted it
    assert got[1] == (15.0, "open")   # open -> second clause updated
    assert got[2] == (20.0, "open")   # untouched


def test_merge_not_matched_by_source_delete(ddl, catalog):
    """CDC full-sync shape: rows absent from the source retire in the same
    statement (Delta WHEN NOT MATCHED BY SOURCE parity)."""
    ddl.execute(ACCOUNTS_DDL)
    ddl.execute("""
      MERGE INTO pets.fin.accounts AS t
      USING (SELECT 1 AS id, 11.0 AS bal, 'open' AS status
             UNION ALL SELECT 5, 50.0, 'open') AS s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *
      WHEN NOT MATCHED BY SOURCE THEN DELETE;
    """)
    assert _accounts(catalog) == {1: (11.0, "open"), 5: (50.0, "open")}


def test_merge_not_matched_by_source_conditional_update(ddl, catalog):
    """BY SOURCE UPDATE touches only rows passing its AND-condition; other
    unmatched target rows stay untouched."""
    ddl.execute(ACCOUNTS_DDL)
    ddl.execute("""
      MERGE INTO pets.fin.accounts AS t
      USING (SELECT 1 AS id) AS s
      ON t.id = s.id
      WHEN NOT MATCHED BY SOURCE AND t.status = 'open'
        THEN UPDATE SET status = 'stale';
    """)
    got = _accounts(catalog)
    assert got[1] == (10.0, "open")     # matched: untouched (no MATCHED clause)
    assert got[2] == (20.0, "stale")
    assert got[3] == (30.0, "frozen")   # condition false: untouched
    assert got[4] == (40.0, "stale")


def test_merge_insert_star_and_conditional_insert(ddl, catalog):
    """INSERT * maps source columns by name; a conditional NOT MATCHED
    clause drops source rows whose condition fails instead of inserting."""
    ddl.execute(ACCOUNTS_DDL)
    ddl.execute("""
      MERGE INTO pets.fin.accounts AS t
      USING (SELECT 7 AS id, 70.0 AS bal, 'open' AS status
             UNION ALL SELECT 8, -1.0, 'open') AS s
      ON t.id = s.id
      WHEN NOT MATCHED AND s.bal > 0 THEN INSERT *;
    """)
    got = _accounts(catalog)
    assert got[7] == (70.0, "open")
    assert 8 not in got                  # failed the insert condition
    assert len(got) == 5


def test_merge_update_star_requires_source_columns_by_name(ddl, catalog):
    ddl.execute(ACCOUNTS_DDL)
    # Source carries only (id, bal): UPDATE SET * updates bal, leaves status.
    ddl.execute("""
      MERGE INTO pets.fin.accounts AS t
      USING (SELECT 2 AS id, 99.0 AS bal) AS s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *;
    """)
    assert _accounts(catalog)[2] == (99.0, "open")


def test_merge_nmbs_update_star_rejected(ddl, catalog):
    ddl.execute(ACCOUNTS_DDL)
    with pytest.raises(DdlError, match="BY SOURCE"):
        ddl.execute("""
          MERGE INTO pets.fin.accounts AS t
          USING (SELECT 1 AS id, 2.0 AS bal, 'x' AS status) AS s
          ON t.id = s.id
          WHEN NOT MATCHED BY SOURCE THEN UPDATE SET *;
        """)


def test_merge_case_when_inside_update_set(ddl, catalog):
    """A top-level CASE WHEN inside UPDATE SET must not be mistaken for a
    merge-clause boundary by the WHEN splitter."""
    ddl.execute(ACCOUNTS_DDL)
    ddl.execute("""
      MERGE INTO pets.fin.accounts AS t
      USING (SELECT 1 AS id UNION ALL SELECT 3 AS id) AS s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET
        status = CASE WHEN t.bal >= 30.0 THEN 'vip' ELSE 'basic' END;
    """)
    got = _accounts(catalog)
    assert got[1] == (10.0, "basic")
    assert got[3] == (30.0, "vip")


def test_mv_query_rewrite_serves_fresh_view(ddl, catalog):
    """A SELECT matching a registered MV's definition is served from the
    MV's backing table — but ONLY while the MV reflects every committed
    source version; a stale MV falls through to the real aggregation, so
    results are always those of the query as written."""
    ddl.execute("USE SCHEMA core")
    ddl.execute(
        "CREATE TABLE rw_src (grp STRING, amt DOUBLE);"
        "INSERT INTO rw_src VALUES ('a', 1.0), ('a', 2.0), ('b', 5.0);"
        "CREATE MATERIALIZED VIEW rw_mv AS "
        "SELECT grp, COUNT(*) AS cnt, SUM(amt) AS total "
        "FROM rw_src GROUP BY grp"
    )
    q = (
        "SELECT grp, COUNT(*) AS cnt, SUM(amt) AS total "
        "FROM rw_src GROUP BY grp"
    )
    # Fresh: the rewrite fires — the plan reads the MV's backing table,
    # not rw_src.
    df = ddl.execute(q)[-1]
    plan = df._jdf.queryExecution().executedPlan().toString()
    # Rewritten plan is a bare scan of the MV table (grp, cnt, total
    # already materialized) — no aggregation runs.
    assert "HashAggregate" not in plan
    assert "cnt" in plan and "total" in plan
    assert sorted((r.grp, r.cnt, r.total) for r in df.collect()) == [
        ("a", 2, 3.0),
        ("b", 1, 5.0),
    ]
    # Stale (source advanced, MV not refreshed): falls through to the
    # real aggregation and the NEW rows are visible.
    ddl.execute("INSERT INTO rw_src VALUES ('c', 7.0)")
    df = ddl.execute(q)[-1]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan  # the real aggregation ran
    assert ("c", 1, 7.0) in {(r.grp, r.cnt, r.total) for r in df.collect()}
    # Refresh restores the rewrite.
    ddl.execute("REFRESH MATERIALIZED VIEW rw_mv")
    plan = ddl.execute(q)[-1]._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" not in plan
    # A different shape (other aggregate list) never rewrites.
    other = ddl.execute(
        "SELECT grp, SUM(amt) AS s FROM rw_src GROUP BY grp"
    )[-1]
    assert "HashAggregate" in other._jdf.queryExecution().executedPlan().toString()


# -- SQL-language functions (scalar + table-valued) ---------------------------


def test_create_scalar_function_and_call(ddl, catalog, spark):
    ddl.execute(
        "CREATE FUNCTION taxed(amount DOUBLE, rate DOUBLE) "
        "RETURNS DOUBLE RETURN amount * (1.0 + rate)"
    )
    assert "core.taxed" in ddl.functions
    [row] = spark.sql("SELECT taxed(100.0, 0.10) AS v").collect()
    assert abs(row.v - 110.0) < 1e-9
    # function-call default: paren-terminated body survives intact
    ddl.execute(
        "CREATE FUNCTION shout(s STRING) RETURNS STRING "
        "RETURN upper(concat(s, '!'))"
    )
    [row] = spark.sql("SELECT shout('hi') AS v").collect()
    assert row.v == "HI!"


def test_create_function_replace_exists_and_drop(ddl, spark):
    ddl.execute("CREATE FUNCTION one() RETURNS INT RETURN 1")
    with pytest.raises(DdlError, match="function exists"):
        ddl.execute("CREATE FUNCTION one() RETURNS INT RETURN 2")
    # IF NOT EXISTS: silent no-op keeps the original body
    ddl.execute("CREATE FUNCTION IF NOT EXISTS one() RETURNS INT RETURN 3")
    assert spark.sql("SELECT one() AS v").collect()[0].v == 1
    ddl.execute("CREATE OR REPLACE FUNCTION one() RETURNS INT RETURN 2")
    assert spark.sql("SELECT one() AS v").collect()[0].v == 2
    shown = ddl.execute("SHOW USER FUNCTIONS")[0].collect()
    assert [r.function for r in shown] == ["core.one"]
    ddl.execute("DROP FUNCTION one")
    assert ddl.functions == {}
    with pytest.raises(DdlError, match="function not found"):
        ddl.execute("DROP FUNCTION one")
    ddl.execute("DROP FUNCTION IF EXISTS one")  # no-op


def test_cross_schema_bare_name_clash_is_error(ddl):
    ddl.execute("CREATE SCHEMA IF NOT EXISTS pets.ref")
    ddl.execute("CREATE FUNCTION core.twice(x INT) RETURNS INT RETURN x * 2")
    with pytest.raises(DdlError, match="already bound"):
        ddl.execute(
            "CREATE FUNCTION ref.twice(x INT) RETURNS INT RETURN x + x"
        )


def test_table_function_over_catalog_table(ddl, catalog, spark):
    ddl.execute(BRONZE_DDL)
    from datetime import date, datetime

    catalog.append(
        "core.licensed_pets_bronze",
        spark.createDataFrame(
            [
                (1, 2023, "M5V", True, "Dog", "POODLE",
                 datetime(2023, 1, 1), date(2023, 1, 1)),
                (2, 2023, "M5V", True, "Cat", "TABBY",
                 datetime(2023, 1, 1), date(2023, 1, 1)),
            ],
            catalog.tables["core.licensed_pets_bronze"].schema,
        ),
    )
    ddl.execute(
        "CREATE FUNCTION pets_of(kind STRING) "
        "RETURNS TABLE(_id INT, breed STRING) "
        "RETURN SELECT _id, PRIMARY_BREED FROM pets.core.licensed_pets_bronze "
        "WHERE ANIMAL_TYPE = kind"
    )
    rows = spark.sql("SELECT * FROM pets_of('Dog')").collect()
    assert [(r._id, r.breed) for r in rows] == [(1, "POODLE")]


def test_function_body_parse_error_is_ddl_error(ddl):
    with pytest.raises(DdlError, match="CREATE FUNCTION"):
        ddl.execute(
            "CREATE FUNCTION bad(x INT) RETURNS INT RETURN x +* 2"
        )


# -- read-time governance: row filters + column masks -------------------------


@pytest.fixture
def governed(ddl, catalog, spark):
    ddl.execute(BRONZE_DDL)
    from datetime import date, datetime

    catalog.append(
        "core.licensed_pets_bronze",
        spark.createDataFrame(
            [
                (1, 2023, "M5V", True, "Dog", "POODLE",
                 datetime(2023, 1, 1), date(2023, 1, 1)),
                (2, 2023, "M4C", True, "Cat", "TABBY",
                 datetime(2023, 1, 1), date(2023, 1, 1)),
                (3, 2022, "M5V", True, "Dog", "LAB",
                 datetime(2023, 1, 1), date(2023, 1, 1)),
            ],
            catalog.tables["core.licensed_pets_bronze"].schema,
        ),
    )
    return ddl


def test_row_filter_applies_to_sql_reads_not_raw(governed, catalog):
    governed.execute(
        "ALTER TABLE licensed_pets_bronze SET ROW FILTER (Year >= 2023)"
    )
    [sql_rows] = governed.execute(
        "SELECT count(*) AS n FROM licensed_pets_bronze"
    )
    assert sql_rows.collect()[0].n == 2
    # maintenance door unaffected
    assert catalog.table("core.licensed_pets_bronze").count() == 3
    governed.execute("ALTER TABLE licensed_pets_bronze DROP ROW FILTER")
    [sql_rows] = governed.execute(
        "SELECT count(*) AS n FROM licensed_pets_bronze"
    )
    assert sql_rows.collect()[0].n == 3


def test_column_mask_preserves_schema_and_sees_raw_values(governed, catalog):
    governed.execute(
        "ALTER TABLE licensed_pets_bronze ALTER COLUMN FSA "
        "SET MASK (concat(substr(FSA, 1, 1), '**'))"
    )
    df = catalog.governed_table("core.licensed_pets_bronze")
    assert df.schema == catalog.table("core.licensed_pets_bronze").schema
    assert {r.FSA for r in df.select("FSA").collect()} == {"M**"}
    # masks + filter compose; filter evaluates on RAW values
    governed.execute(
        "ALTER TABLE licensed_pets_bronze SET ROW FILTER (FSA = 'M5V')"
    )
    rows = governed.execute(
        "SELECT _id, FSA FROM licensed_pets_bronze ORDER BY _id"
    )[0].collect()
    assert [(r._id, r.FSA) for r in rows] == [(1, "M**"), (3, "M**")]
    governed.execute(
        "ALTER TABLE licensed_pets_bronze ALTER COLUMN FSA DROP MASK"
    )
    assert catalog.tables["core.licensed_pets_bronze"].column_masks == {}


def test_governance_persists_and_rehydrates(governed, catalog, spark):
    governed.execute(
        "ALTER TABLE licensed_pets_bronze SET ROW FILTER (Year = 2022);"
        "ALTER TABLE licensed_pets_bronze ALTER COLUMN PRIMARY_BREED "
        "SET MASK ('REDACTED')"
    )
    from certified_dogs_and_cats_spark.pipeline import Catalog

    fresh = Catalog(spark, catalog.root)
    spec0 = catalog.tables["core.licensed_pets_bronze"]
    fresh.register(
        "core.licensed_pets_bronze", spec0.schema,
        partition_by=spec0.partition_by,
    )
    df = fresh.governed_table("core.licensed_pets_bronze")
    rows = df.select("_id", "PRIMARY_BREED").collect()
    assert [(r._id, r.PRIMARY_BREED) for r in rows] == [(3, "REDACTED")]


def test_bad_policy_expressions_raise(governed):
    with pytest.raises(DdlError, match="bad row filter"):
        governed.execute(
            "ALTER TABLE licensed_pets_bronze SET ROW FILTER (nope > 1)"
        )
    with pytest.raises(DdlError, match="bad mask"):
        governed.execute(
            "ALTER TABLE licensed_pets_bronze ALTER COLUMN FSA "
            "SET MASK (no_such_col)"
        )
    with pytest.raises(DdlError, match="no such column"):
        governed.execute(
            "ALTER TABLE licensed_pets_bronze ALTER COLUMN ghost "
            "SET MASK ('x')"
        )


def test_table_changes_tvf_is_governed(governed, catalog):
    """The CDC audit surface must not leak what the table's own reads
    hide: table_changes() applies the row filter and masks."""
    governed.execute(
        "ALTER TABLE licensed_pets_bronze SET ROW FILTER (Year >= 2023);"
        "ALTER TABLE licensed_pets_bronze ALTER COLUMN PRIMARY_BREED "
        "SET MASK ('HIDDEN')"
    )
    rows = governed.execute(
        "SELECT _id, PRIMARY_BREED, _change_type "
        "FROM table_changes('licensed_pets_bronze', 0)"
    )[0].collect()
    assert {r._id for r in rows} == {1, 2}  # Year=2022 row filtered out
    assert {r.PRIMARY_BREED for r in rows} == {"HIDDEN"}
    assert {r._change_type for r in rows} == {"insert"}


def test_table_function_sees_fresh_data_and_policies(ddl, catalog, spark):
    """A table-function call whose statement names no catalog table must
    still read the table's CURRENT rows under CURRENT policies — the
    alias views re-bind at call time, not once at CREATE time."""
    ddl.execute(BRONZE_DDL)
    from datetime import date, datetime

    def row(i, year, fsa):
        return (i, year, fsa, True, "Dog", "POODLE",
                datetime(2023, 1, 1), date(2023, 1, 1))

    schema = catalog.tables["core.licensed_pets_bronze"].schema
    catalog.append(
        "core.licensed_pets_bronze",
        spark.createDataFrame([row(1, 2023, "M5V")], schema),
    )
    ddl.execute(
        "CREATE FUNCTION dogs() RETURNS TABLE(_id INT) "
        "RETURN SELECT _id FROM pets.core.licensed_pets_bronze "
        "WHERE ANIMAL_TYPE = 'Dog'"
    )
    assert ddl.execute("SELECT count(*) AS n FROM dogs()")[0].collect()[0].n == 1
    # data committed AFTER the function existed must be visible
    catalog.append(
        "core.licensed_pets_bronze",
        spark.createDataFrame([row(2, 2022, "M4C")], schema),
    )
    assert ddl.execute("SELECT count(*) AS n FROM dogs()")[0].collect()[0].n == 2
    # a policy declared AFTER the function existed must apply
    ddl.execute(
        "ALTER TABLE licensed_pets_bronze SET ROW FILTER (Year >= 2023)"
    )
    assert ddl.execute("SELECT count(*) AS n FROM dogs()")[0].collect()[0].n == 1


def test_count_star_fast_path_metadata_only(governed, catalog, spark):
    """Bare COUNT(*) answers from footer sums (no scan job over data) and
    matches the real count; WHERE, row filters, and deletion vectors all
    fall back to the scan path."""
    [r] = governed.execute(
        "SELECT COUNT(*) AS n FROM licensed_pets_bronze"
    )[0].collect()
    assert r.n == 3
    assert catalog.fast_row_count("core.licensed_pets_bronze") == 3
    # WHERE must not hit the fast path
    [r] = governed.execute(
        "SELECT COUNT(*) AS n FROM licensed_pets_bronze WHERE Year = 2023"
    )[0].collect()
    assert r.n == 2
    # a governance row filter disables the fast path (policy-hidden rows
    # must not be counted)
    governed.execute(
        "ALTER TABLE licensed_pets_bronze SET ROW FILTER (Year >= 2023)"
    )
    [r] = governed.execute(
        "SELECT COUNT(*) AS n FROM licensed_pets_bronze"
    )[0].collect()
    assert r.n == 2


def test_count_star_fast_path_bails_on_deletion_vectors(spark, tmp_path):
    from certified_dogs_and_cats_spark.pipeline import Catalog, DdlSession

    cat = Catalog(spark, str(tmp_path / "wh"))
    ddl = DdlSession(cat)
    ddl.execute("USE SCHEMA core")
    ddl.execute(
        "CREATE TABLE dv_t (k INT, v DOUBLE) "
        "TBLPROPERTIES ('delta.enableDeletionVectors' = 'true')"
    )
    ddl.execute("INSERT INTO dv_t VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
    ddl.execute("DELETE FROM dv_t WHERE k = 2")  # merge-on-read tombstone
    assert cat.fast_row_count("core.dv_t") is None  # footers would lie
    [r] = ddl.execute("SELECT COUNT(*) AS n FROM dv_t")[0].collect()
    assert r.n == 2

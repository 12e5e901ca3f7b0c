"""Bronze-stage invariants (reference notebooks/bronze.py semantics):
standardization, idempotency (control table + anti-join), and guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from certified_dogs_and_cats_spark.pipeline.expectations import (
    GuardError,
    assert_flag_consistency,
)
from certified_dogs_and_cats_spark.pipeline.ingest import bronze_stage

from conftest import CLOCK1, CLOCK2, D1, D2, DROP1, DROP2, write_drop


def test_bronze_loads_and_standardizes(catalog, raw_root):
    write_drop(raw_root, D1, DROP1)
    res = bronze_stage(catalog, raw_root, D1, CLOCK1)
    assert res.status == "loaded"
    assert res.rows == 6
    rows = {
        r["_id"]: r
        for r in catalog.table("core.licensed_pets_bronze").collect()
    }
    assert len(rows) == 6
    # upper/trim standardization (bronze.py:84-95 parity)
    assert rows[1]["ANIMAL_TYPE"] == "DOG"
    assert rows[1]["FSA"] == "M1A"
    assert rows[3]["PRIMARY_BREED"] == "SIAMESE"
    # FSA regex validity flag: 'BAD' fails ^[A-Z][0-9][A-Z]$
    assert rows[4]["FSA_VALID"] is False
    assert rows[1]["FSA_VALID"] is True
    # pinned clock & date
    assert rows[1]["ingestion_ts"] == CLOCK1
    assert rows[1]["ingestion_date"] == D1


def test_bronze_rerun_same_date_skips(catalog, raw_root):
    write_drop(raw_root, D1, DROP1)
    assert bronze_stage(catalog, raw_root, D1, CLOCK1).status == "loaded"
    # Control-table idempotency: the same date never loads twice
    # (bronze.py:49-56).
    res = bronze_stage(catalog, raw_root, D1, CLOCK2)
    assert res.status == "skipped_already_loaded"
    assert catalog.table("core.licensed_pets_bronze").count() == 6


def test_bronze_same_batch_new_date_inserts_zero(catalog, raw_root):
    write_drop(raw_root, D1, DROP1)
    bronze_stage(catalog, raw_root, D1, CLOCK1)
    # Same rows land under a NEW date: the _id anti-join must insert 0
    # (bronze.py:111-115, README.md:128-133).
    write_drop(raw_root, D2, DROP1)
    res = bronze_stage(catalog, raw_root, D2, CLOCK2)
    assert res.status == "skipped_no_new_rows"
    assert catalog.table("core.licensed_pets_bronze").count() == 6
    # ...and the skipped date is NOT marked loaded, so a corrected drop can
    # still be retried for it.
    ctrl = catalog.table("core.load_control")
    assert ctrl.filter(F.col("ingestion_date") == F.lit(D2)).count() == 0


def test_bronze_partial_overlap_inserts_only_new(catalog, raw_root):
    write_drop(raw_root, D1, DROP1)
    bronze_stage(catalog, raw_root, D1, CLOCK1)
    write_drop(raw_root, D2, DROP2)
    res = bronze_stage(catalog, raw_root, D2, CLOCK2)
    assert res.status == "loaded"
    assert res.rows == 2  # _id 6 already present; 7 and 8 are new
    bronze = catalog.table("core.licensed_pets_bronze")
    assert bronze.count() == 8
    # Earliest-sighting policy: _id 6 keeps its day-1 ingestion_date
    # (README.md:58,137).
    r6 = bronze.filter(F.col("_id") == 6).collect()[0]
    assert r6["ingestion_date"] == D1


def test_bronze_no_files_skips(catalog, raw_root):
    res = bronze_stage(catalog, raw_root, D1, CLOCK1)
    assert res.status == "skipped_no_files"


def test_guard_null_id_raises(catalog, raw_root):
    rows = DROP1 + [("", 2024, "M9A", "DOG", "POODLE")]  # empty _id -> NULL
    write_drop(raw_root, D1, rows)
    with pytest.raises(GuardError, match="NULL values in _id"):
        bronze_stage(catalog, raw_root, D1, CLOCK1)
    # Failed batch must not write anything.
    assert catalog.table("core.licensed_pets_bronze").count() == 0


def test_guard_duplicate_id_raises(catalog, raw_root):
    rows = DROP1 + [(1, 2025, "M9A", "DOG", "POODLE")]
    write_drop(raw_root, D1, rows)
    with pytest.raises(GuardError, match="duplicate values in _id"):
        bronze_stage(catalog, raw_root, D1, CLOCK1)


def test_guard_bad_animal_type_raises(catalog, raw_root):
    rows = DROP1 + [(9, 2025, "M9A", "HAMSTER", "SYRIAN")]
    write_drop(raw_root, D1, rows)
    with pytest.raises(GuardError, match="outside domain for ANIMAL_TYPE"):
        bronze_stage(catalog, raw_root, D1, CLOCK1)


def test_flag_consistency_guard(spark):
    ok = spark.createDataFrame(
        [("M1A", True), (None, False)], "v STRING, f BOOLEAN"
    )
    assert_flag_consistency(ok, "v", "f")  # must not raise
    bad = spark.createDataFrame(
        [("M1A", False), (None, True)], "v STRING, f BOOLEAN"
    )
    with pytest.raises(GuardError, match="flag consistency"):
        assert_flag_consistency(bad, "v", "f")


def test_malformed_csv_rows_are_caught_by_guards(catalog, raw_root):
    """PERMISSIVE CSV parsing turns unparseable fields into nulls; the
    null-_id guard then fails the batch rather than silently loading
    garbage — the safety net for corrupt drops."""
    import os

    from certified_dogs_and_cats_spark.pipeline.ingest import bronze_stage

    drop = os.path.join(raw_root, f"ingestion_date={D1.isoformat()}")
    os.makedirs(drop, exist_ok=True)
    with open(os.path.join(drop, "data.csv"), "w") as f:
        f.write("_id,Year,FSA,ANIMAL_TYPE,PRIMARY_BREED\n")
        f.write("1,2024,M1A,DOG,POODLE\n")
        f.write("not_a_number,garbage,,,\n")  # unparseable _id -> null
    with pytest.raises(GuardError, match="NULL values in _id"):
        bronze_stage(catalog, raw_root, D1, clock=CLOCK1)


def test_stray_non_csv_file_in_drop_is_ignored(catalog, raw_root):
    """A notes.txt beside the CSV must not be parsed as CSV (its lines
    would fail the schema and trip the NULL-_id guard, failing the day)."""
    import os

    write_drop(raw_root, D1, DROP1)
    drop = os.path.join(raw_root, f"ingestion_date={D1.isoformat()}")
    with open(os.path.join(drop, "notes.txt"), "w") as f:
        f.write("operator notes, definitely not csv\nsecond line\n")
    res = bronze_stage(catalog, raw_root, D1, CLOCK1)
    assert res.status == "loaded" and res.rows == 6
    assert catalog.table("core.licensed_pets_bronze").count() == 6

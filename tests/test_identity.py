"""Identity columns: engine-assigned unique ids (Delta GENERATED ALWAYS AS
IDENTITY parity) — uniqueness across appends and concurrent block claims,
ALWAYS contract enforcement, DDL round trip, clone watermark carry-over."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from certified_dogs_and_cats_spark.pipeline import DdlSession
from certified_dogs_and_cats_spark.pipeline.catalog import ConstraintViolation
from certified_dogs_and_cats_spark.pipeline.ddl import DdlError

SCHEMA = T.StructType(
    [
        T.StructField("rid", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)

V_ONLY = T.StructType([T.StructField("v", T.StringType())])


def _with_identity(catalog, name, start=1, step=1):
    spec = catalog.register(name, SCHEMA)
    spec.identity["rid"] = {"start": start, "step": step}
    return spec


def test_ids_unique_across_appends(catalog, spark):
    _with_identity(catalog, "t.id")
    catalog.append("t.id", spark.createDataFrame([("a",), ("b",)], V_ONLY))
    catalog.append("t.id", spark.createDataFrame([("c",), ("d",)], V_ONLY))
    rows = catalog.table("t.id").collect()
    ids = [r.rid for r in rows]
    assert len(set(ids)) == 4
    assert all(r.rid >= 1 for r in rows)
    # Later appends allocate strictly above earlier blocks.
    by_v = {r.v: r.rid for r in rows}
    assert min(by_v["c"], by_v["d"]) > max(by_v["a"], by_v["b"])


def test_start_and_step_respected(catalog, spark):
    _with_identity(catalog, "t.step", start=100, step=5)
    catalog.append(
        "t.step", spark.createDataFrame([("a",), ("b",), ("c",)], V_ONLY)
    )
    ids = sorted(r.rid for r in catalog.table("t.step").collect())
    # Gaps are allowed (Delta contract): ids start AT or above `start`
    # and always land on the step grid.
    assert ids[0] >= 100
    assert all((i - 100) % 5 == 0 for i in ids)
    assert len(set(ids)) == 3


def test_always_rejects_provided_values(catalog, spark):
    _with_identity(catalog, "t.rej")
    with pytest.raises(ConstraintViolation, match="IDENTITY"):
        catalog.append(
            "t.rej", spark.createDataFrame([(7, "a")], SCHEMA)
        )


def test_ddl_create_and_show_round_trip(catalog, spark):
    ddl = DdlSession(catalog)
    ddl.execute(
        "CREATE TABLE core.ev (rid BIGINT GENERATED ALWAYS AS IDENTITY"
        " (START WITH 10 INCREMENT BY 2), v STRING) USING parquet"
    )
    spec = catalog.tables["core.ev"]
    assert spec.identity == {"rid": {"start": 10, "step": 2}}
    ddl.execute("INSERT INTO core.ev (v) VALUES ('x'), ('y')")
    ids = sorted(r.rid for r in catalog.table("core.ev").collect())
    assert ids[0] >= 10 and len(set(ids)) == 2
    assert all((i - 10) % 2 == 0 for i in ids)
    [df] = ddl.execute("SHOW CREATE TABLE core.ev")
    stmt = df.collect()[0]["createtab_stmt"]
    assert "GENERATED ALWAYS AS IDENTITY (START WITH 10 INCREMENT BY 2)" in stmt
    # Replays into a fresh catalog.
    from certified_dogs_and_cats_spark.pipeline import Catalog

    other = Catalog(spark, catalog.root + "_replay")
    DdlSession(other).execute(stmt)
    assert other.tables["core.ev"].identity == spec.identity


def test_ddl_identity_requires_integer_type(catalog):
    ddl = DdlSession(catalog)
    with pytest.raises(DdlError, match="BIGINT"):
        ddl.execute(
            "CREATE TABLE core.bad (rid STRING GENERATED ALWAYS AS IDENTITY,"
            " v STRING)"
        )


def test_concurrent_claims_disjoint(catalog, spark):
    """Two racing appends claim different blocks — no id collides even
    when both writers start from the same observed watermark."""
    import threading

    _with_identity(catalog, "t.race")
    df = spark.createDataFrame([(f"r{i}",) for i in range(20)], V_ONLY)
    errs = []

    def go():
        try:
            catalog.append("t.race", df)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=go) for _ in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    ids = [r.rid for r in catalog.table("t.race").collect()]
    assert len(ids) == 80 and len(set(ids)) == 80


def test_clone_carries_identity_watermark(catalog, spark):
    """A clone's next append allocates above every id in the cloned data
    (the block claims travel with the clone)."""
    _with_identity(catalog, "t.csrc")
    catalog.append("t.csrc", spark.createDataFrame([("a",), ("b",)], V_ONLY))
    catalog.clone("t.csrc", "t.cdst", shallow=True)
    catalog.append("t.cdst", spark.createDataFrame([("c",)], V_ONLY))
    rows = catalog.table("t.cdst").collect()
    assert len({r.rid for r in rows}) == 3
    by_v = {r.v: r.rid for r in rows}
    assert by_v["c"] > max(by_v["a"], by_v["b"])

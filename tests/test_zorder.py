"""True Z-order keys: exact Morton interleave, quadrant locality, and the
compact(zorder_by=) maintenance path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from certified_dogs_and_cats_spark.functions.zorder import (
    interleave_bits,
    zorder_key,
)


def _morton2(x: int, y: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_interleave_matches_reference_morton(spark):
    rows = [(x, y) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", interleave_bits([F.col("x"), F.col("y")], bits=2).alias("z")
        ).collect()
    }
    # interleave_bits puts cols[0] at even bit positions -> x is the
    # low-order dimension, matching _morton2(x, y).
    assert got == {(x, y): _morton2(x, y, 2) for x, y in rows}


def test_zorder_key_quadrant_locality(spark):
    """Top bits of the key = quadrant of the (col1, col2) box: all points
    in one quadrant sort together — the property lexicographic sort lacks
    for the second column."""
    rows = [(float(x), float(y)) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "a double, b double")
    key = zorder_key(df, ["a", "b"], bits=4, bounds={"a": (0, 16), "b": (0, 16)})
    out = df.select("a", "b", key.alias("z")).collect()
    for r in out:
        quadrant = (int(r.a >= 8), int(r.b >= 8))
        top2 = (int(r.z) >> 6) & 0b11  # top bit of each interleaved nibble
        assert (top2 & 1, (top2 >> 1) & 1) == quadrant, (r.a, r.b, bin(int(r.z)))


def test_compact_zorder_by_roundtrip(spark, catalog):
    schema = T.StructType(
        [
            T.StructField("x", T.IntegerType()),
            T.StructField("y", T.IntegerType()),
            T.StructField("v", T.StringType()),
        ]
    )
    catalog.register("t.z", schema)
    rows = [(x, y, f"{x}-{y}") for x in range(20) for y in range(20)]
    catalog.append("t.z", spark.createDataFrame(rows, schema))
    catalog.compact("t.z", zorder_by=("x", "y"))
    back = catalog.table("t.z")
    assert back.count() == 400
    assert back.filter("x = 3 AND y = 7").count() == 1
    with pytest.raises(ValueError, match="not both"):
        catalog.compact("t.z", cluster_by=("x",), zorder_by=("y",))


def test_ddl_optimize_zorder_routes_to_morton(spark, catalog, monkeypatch):
    """OPTIMIZE ... ZORDER BY (two numeric cols) must take the true
    Z-order path; a string column falls back to lexicographic cluster."""
    from certified_dogs_and_cats_spark.pipeline import DdlSession

    ddl = DdlSession(catalog)
    ddl.execute(
        """
        CREATE TABLE pets.core.zt (x INT, y INT, s STRING);
        INSERT INTO pets.core.zt VALUES (1, 2, 'a'), (3, 4, 'b');
        """
    )
    calls = []
    orig = catalog.compact

    def spy(name, **kw):
        calls.append(kw)
        return orig(name, **kw)

    monkeypatch.setattr(catalog, "compact", spy)
    ddl.execute("OPTIMIZE pets.core.zt ZORDER BY (x, y);")
    ddl.execute("OPTIMIZE pets.core.zt ZORDER BY (s, x);")
    assert calls[0].get("zorder_by") == ("x", "y")
    assert calls[1].get("cluster_by") == ("s", "x")
    assert catalog.table("core.zt").count() == 2

"""Bloom-filter file index (Delta BLOOMFILTER INDEX parity): point-lookup
file skipping where min/max ranges overlap, no false negatives, append
maintenance, SQL front door, and scan == table+filter row identity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from certified_dogs_and_cats_spark.pipeline import DdlError, DdlSession
from certified_dogs_and_cats_spark.pipeline.skipping import (
    bloom_might_contain,
    bloom_params,
    pack_bloom,
)

SCHEMA = T.StructType(
    [
        T.StructField("uid", T.StringType()),
        T.StructField("n", T.IntegerType()),
    ]
)


def _interleaved(catalog, spark, name, n_files=4, per_file=50):
    """Files whose uid VALUES interleave so every file's [min, max] spans
    the whole domain — footer stats can never prune an equality probe."""
    catalog.register(name, SCHEMA)
    for f in range(n_files):
        rows = [
            (f"u{i * n_files + f:05d}", i * n_files + f)
            for i in range(per_file)
        ]
        catalog.append(name, spark.createDataFrame(rows, SCHEMA).coalesce(1))
    return [f"u{v:05d}" for v in range(n_files * per_file)]


def test_bloom_prunes_where_minmax_cannot(catalog, spark):
    _interleaved(catalog, spark, "core.t")
    # Footer stats alone: every file's uid range covers u00000..u00199.
    kept, total = catalog.pruned_files("core.t", "uid = 'u00042'")
    assert kept == total == 4
    built = catalog.create_bloom_index("core.t", "uid", fpp=0.01)
    assert built == 4
    kept, total = catalog.pruned_files("core.t", "uid = 'u00042'")
    assert kept == 1  # u00042 lives in exactly one file
    # Row identity: the pruned read returns exactly the matching row.
    got = catalog.scan("core.t", "uid = 'u00042'").collect()
    assert [(r.uid, r.n) for r in got] == [("u00042", 42)]


def test_bloom_no_false_negatives_over_all_values(catalog, spark):
    uids = _interleaved(catalog, spark, "core.nf", n_files=3, per_file=40)
    catalog.create_bloom_index("core.nf", "uid", fpp=0.05)
    for uid in uids:  # every present value must still be found
        assert catalog.scan("core.nf", f"uid = '{uid}'").count() == 1


def test_bloom_absent_value_can_skip_everything(catalog, spark):
    _interleaved(catalog, spark, "core.ab")
    catalog.create_bloom_index("core.ab", "uid", fpp=0.001)
    kept, total = catalog.pruned_files("core.ab", "uid = 'nope'")
    assert kept <= 1  # fpp may admit a stray file, never the fleet
    assert catalog.scan("core.ab", "uid = 'nope'").count() == 0


def test_bloom_in_list_unions_membership(catalog, spark):
    _interleaved(catalog, spark, "core.inq")
    catalog.create_bloom_index("core.inq", "uid")
    kept, _ = catalog.pruned_files(
        "core.inq", "uid IN ('u00000', 'u00001')"
    )
    assert kept == 2  # consecutive uids land in different files
    got = catalog.scan("core.inq", "uid IN ('u00000', 'u00001')")
    assert got.count() == 2


def test_append_maintains_index(catalog, spark):
    _interleaved(catalog, spark, "core.ap", n_files=2)
    catalog.create_bloom_index("core.ap", "uid")
    catalog.append(
        "core.ap",
        spark.createDataFrame([("zz-new", 999)], SCHEMA).coalesce(1),
    )
    # The new file got an entry in-line: a probe for its value keeps ONLY
    # that file, so the index stayed complete without a re-create.
    kept, total = catalog.pruned_files("core.ap", "uid = 'zz-new'")
    assert total == 3 and kept == 1
    assert catalog.scan("core.ap", "uid = 'zz-new'").count() == 1


def test_compact_rewritten_files_keep_conservatively(catalog, spark):
    _interleaved(catalog, spark, "core.cp", n_files=2)
    catalog.create_bloom_index("core.cp", "uid")
    catalog.compact("core.cp")
    # Rewritten files have no entries -> conservative keep, still correct.
    assert catalog.scan("core.cp", "uid = 'u00005'").count() == 1
    # Re-running the create backfills the rewritten files incrementally.
    assert catalog.create_bloom_index("core.cp", "uid") >= 1
    kept, total = catalog.pruned_files("core.cp", "uid = 'u00005'")
    assert kept <= total


def test_bloom_rejects_float_and_partition_columns(catalog, spark):
    catalog.register(
        "core.bad",
        T.StructType(
            [
                T.StructField("x", T.DoubleType()),
                T.StructField("p", T.StringType()),
            ]
        ),
        partition_by=("p",),
    )
    with pytest.raises(ValueError, match="string/integer"):
        catalog.create_bloom_index("core.bad", "x")
    with pytest.raises(ValueError, match="partition column"):
        catalog.create_bloom_index("core.bad", "p")
    with pytest.raises(KeyError):
        catalog.create_bloom_index("core.bad", "missing")


def test_bloom_integer_column_and_null_handling(catalog, spark):
    catalog.register("core.ints", SCHEMA)
    catalog.append(
        "core.ints",
        spark.createDataFrame([("a", 1), ("b", 2)], SCHEMA).coalesce(1),
    )
    catalog.append(
        "core.ints",
        spark.createDataFrame(
            [(None, None), (None, None)], SCHEMA
        ).coalesce(1),
    )
    catalog.create_bloom_index("core.ints", "n")
    # All-NULL file gets an explicit empty bloom -> equality skips it.
    kept, total = catalog.pruned_files("core.ints", "n = 1")
    assert total == 2 and kept == 1
    assert catalog.scan("core.ints", "n = 1").count() == 1


def test_bloom_sql_front_door(catalog, spark):
    ddl = DdlSession(catalog)
    ddl.execute("""
      USE CATALOG pets; USE SCHEMA core;
      CREATE TABLE pets.core.ev (uid STRING, n INT) USING DELTA;
      INSERT INTO pets.core.ev VALUES ('a', 1), ('b', 2);
    """)
    ddl.execute(
        "CREATE BLOOMFILTER INDEX ON TABLE pets.core.ev"
        " FOR COLUMNS (uid OPTIONS (fpp = 0.05))"
    )
    assert "uid" in catalog.bloom_indexes("core.ev")
    assert catalog.bloom_indexes("core.ev")["uid"]["fpp"] == 0.05
    ddl.execute("DROP BLOOMFILTER INDEX ON TABLE pets.core.ev FOR COLUMNS (uid)")
    assert catalog.bloom_indexes("core.ev") == {}
    with pytest.raises(DdlError, match="fpp must be"):
        ddl.execute(
            "CREATE BLOOMFILTER INDEX ON TABLE pets.core.ev"
            " FOR COLUMNS (n OPTIONS (fpp = 2.0))"
        )


def test_bloom_dv_deletes_stay_correct(catalog, spark):
    """Deleted rows linger in the bitset — pure false positives, never a
    wrong row: the DV anti-join still drops them from the pruned read."""
    _interleaved(catalog, spark, "core.dv", n_files=2, per_file=10)
    catalog.create_bloom_index("core.dv", "uid")
    catalog.delete_where("core.dv", "uid = 'u00004'")
    assert catalog.scan("core.dv", "uid = 'u00004'").count() == 0
    assert catalog.scan("core.dv", "uid = 'u00005'").count() == 1


def test_bloom_unit_pack_and_query_roundtrip():
    from certified_dogs_and_cats_spark.pipeline.skipping import bloom_hash60

    vals = [f"v{i}" for i in range(200)]
    entry = pack_bloom([bloom_hash60(v) for v in vals], len(vals), 0.01)
    assert all(bloom_might_contain(entry, v) for v in vals)
    misses = sum(
        bloom_might_contain(entry, f"absent{i}") for i in range(1000)
    )
    assert misses <= 40  # ~1% fpp with slack
    m, k = bloom_params(200, 0.01)
    assert entry["m"] == m and entry["k"] == k and 1 <= k <= 16

"""KMV sketch (extensions/sketches.py): binary round-trip fidelity,
lossless mergeability (merged sketch == single-pass sketch), exact-
below-k short-circuit, estimate accuracy, and shard invariance."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from certified_dogs_and_cats_spark.extensions.sketches import (
    kmv_estimate,
    kmv_from_binary,
    kmv_merge,
    kmv_rollup,
    kmv_sketch,
    kmv_to_binary,
)

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_binary_round_trip_is_identity(spark):
    sk = kmv_sketch(
        spark.read.parquet(f"{SF}/orders.parquet"),
        ["o_orderpriority"],
        "o_custkey",
        k=32,
    )
    back = sk.select(
        "kmv", kmv_from_binary(kmv_to_binary(F.col("kmv"))).alias("back")
    ).collect()
    assert all(r.kmv == r.back for r in back) and back


def test_merge_equals_single_pass(spark):
    """The shard/merge path must produce the IDENTICAL sketch (arrays,
    not just estimates) as one global pass — KMV's lossless-union
    property, for any shard count."""
    o = spark.read.parquet(f"{SF}/orders.parquet")
    direct = {
        r.o_orderpriority: r.kmv
        for r in kmv_sketch(o, ["o_orderpriority"], "o_custkey", k=64).collect()
    }
    for n_shards in (2, 16):
        sharded = kmv_sketch(
            o, ["o_orderpriority"], "o_custkey", k=64, n_shards=n_shards
        )
        merged = {
            r.o_orderpriority: r.kmv
            for r in kmv_merge(sharded, ["o_orderpriority"], k=64).collect()
        }
        assert merged == direct


def test_exact_below_k_and_python_model(spark):
    """With k above the distinct count, the sketch IS the sorted distinct
    hash set and the estimate is the exact count."""
    rows = [(1, f"u{i % 7}") for i in range(50)]
    df = spark.createDataFrame(rows, ["g", "item"])
    sk = kmv_sketch(df, ["g"], "item", k=100)
    got = sk.select(
        "kmv",
        "n_seen",
        kmv_estimate(F.col("kmv"), F.col("n_seen"), 100).alias("est"),
    ).collect()[0]
    assert got.kmv == sorted(_h60(f"u{i}") for i in range(7))
    assert got.n_seen == 7 and got.est == 7


def test_rollup_estimate_accuracy(spark):
    """At k=256 the relative error is ~1/sqrt(k) ~ 6%; assert a loose
    3-sigma band, plus the self-reported err_permille consistency."""
    o = spark.read.parquet(f"{SF}/orders.parquet")
    for r in kmv_rollup(o, ["o_orderpriority"], "o_custkey", k=256).collect():
        assert abs(r.kmv_estimate - r.exact_distinct) <= 0.2 * r.exact_distinct
        x = (r.kmv_estimate - r.exact_distinct) * 1000.0 / r.exact_distinct
        # Spark F.round is HALF-AWAY-FROM-ZERO; Python round() is
        # banker's — replay the engine's rule, not the stdlib's.
        import math

        half_away = math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)
        assert r.err_permille == half_away

def test_null_items_are_ignored(spark):
    """NULL items hash to NULL; without the pre-filter they would claim
    a rank slot (NULLs sort first asc) and inflate n_seen while being
    dropped from the collect_list array — k-1 elements with n_seen==k
    makes element_at(kmv, k) NULL. A NULL item must contribute nothing
    (ADVICE r10)."""
    rows = [(1, None)] * 5 + [(1, f"u{i}") for i in range(3)]
    df = spark.createDataFrame(rows, "g int, item string")
    got = kmv_sketch(df, ["g"], "item", k=3).collect()[0]
    assert got.kmv == sorted(_h60(f"u{i}") for i in range(3))
    assert got.n_seen == 3
    # All-NULL group: no sketch row at all (nothing distinct to count).
    only_null = spark.createDataFrame([(2, None)], "g int, item string")
    assert kmv_sketch(only_null, ["g"], "item", k=3).count() == 0

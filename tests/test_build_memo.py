"""Build-once memoization (cache.memoized_build / memoized_parquet):
expensive deterministic artifacts — trained ANN indexes, components
labelings — build once per (key) and are re-read by every later consumer,
surviving clearCache()/release_cached() (which drop executor-memory cache,
not files)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from certified_dogs_and_cats_spark import cache


def test_memoized_build_runs_builder_once_and_survives_clearcache(spark):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        df = spark.range(5).selectExpr("id", "id * 2 AS v")
        return {"main": df}, {"model": [1, 2, 3]}

    key = ("test_memo", "unit", 1)
    frames1, payload1 = cache.memoized_build(spark, key, build, "unit_memo")
    assert calls["n"] == 1
    assert payload1 == {"model": [1, 2, 3]}
    got1 = sorted((r.id, r.v) for r in frames1["main"].collect())
    assert got1 == [(i, 2 * i) for i in range(5)]
    assert cache.BUILD_SECONDS.get("unit_memo", -1) >= 0

    # clearCache + release drop memory cache, not the memo files.
    cache.release_cached()
    spark.catalog.clearCache()
    frames2, payload2 = cache.memoized_build(spark, key, build, "unit_memo")
    assert calls["n"] == 1  # builder NOT re-run
    assert payload2 == payload1
    assert sorted((r.id, r.v) for r in frames2["main"].collect()) == got1

    # A different key builds independently.
    cache.memoized_build(spark, ("test_memo", "unit", 2), build, "unit_memo")
    assert calls["n"] == 2


def test_memoized_parquet_single_frame_wrapper(spark):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(3).selectExpr("id AS k")

    key = ("test_memo_parquet", 1)
    a = cache.memoized_parquet(spark, key, build, "unit_memo_pq")
    b = cache.memoized_parquet(spark, key, build, "unit_memo_pq")
    assert calls["n"] == 1
    assert sorted(r.k for r in a.collect()) == [0, 1, 2]
    assert sorted(r.k for r in b.collect()) == [0, 1, 2]

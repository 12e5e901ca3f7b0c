"""Runtime bloom-filter join pruning (Spark's runtime row-level filtering).

The engine's big-fact x filtered-dim joins qualify for bloom-filter
injection: Catalyst aggregates a bloom filter over the filtered side's join
keys and probes it on the fact scan, dropping non-matching rows BEFORE the
shuffle. The production thresholds (creation side <= 10 MB stats, huge
application side) are sized for real clusters; these tests lower them to
exercise the path on toy data and pin both the plan shape and result
equality.
"""

from __future__ import annotations

import pytest

from certified_dogs_and_cats_spark.plans import (
    assert_runtime_bloom_filter,
    runtime_bloom_filter_count,
)

SF_DIR = "/root/testdata/sf0.001"

CONF = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # Toy-data overrides: let any filtered side build the filter and any
    # scan accept it.
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    # Force a shuffle join: broadcast joins don't need (or get) the filter.
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def bloom_conf(spark):
    old = {k: spark.conf.get(k, None) for k in CONF}
    for k, v in CONF.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _join(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
        "o_orderpriority = '1-URGENT'"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .count()
    )


def test_selective_dim_join_gets_bloom_probe(bloom_conf):
    j = _join(bloom_conf)
    assert_runtime_bloom_filter(j)
    assert runtime_bloom_filter_count(j) >= 1


def test_bloom_filtered_result_identical(bloom_conf):
    with_filter = _join(bloom_conf).collect()
    bloom_conf.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
    )
    without = _join(bloom_conf).collect()
    assert sorted(map(tuple, with_filter)) == sorted(map(tuple, without))


def test_no_probe_without_selective_filter(bloom_conf):
    # An unfiltered join side offers nothing to prune with.
    li = bloom_conf.read.parquet(f"{SF_DIR}/lineitem.parquet")
    o = bloom_conf.read.parquet(f"{SF_DIR}/orders.parquet")
    j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy().count()
    assert runtime_bloom_filter_count(j) == 0

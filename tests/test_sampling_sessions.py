"""Deterministic sampling/split and gap sessionization invariants."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from certified_dogs_and_cats_spark.extensions.sampling import (
    hash_split,
    per_group_sample,
)
from certified_dogs_and_cats_spark.operators.windows import sessionize


def test_hash_split_is_stable_under_corpus_growth(spark):
    """A row's split assignment must not change when more rows arrive —
    the property randomSplit does NOT have."""
    small = spark.range(100).withColumnRenamed("id", "doc_id")
    big = spark.range(1000).withColumnRenamed("id", "doc_id")
    s_small = {r.doc_id: r.split for r in hash_split(small, "doc_id").collect()}
    s_big = {r.doc_id: r.split for r in hash_split(big, "doc_id").collect()}
    assert all(s_big[k] == v for k, v in s_small.items())
    # Rough proportions on the larger corpus (hash-uniform, 80/10/10).
    from collections import Counter

    c = Counter(s_big.values())
    assert c["train"] > 700 and 50 < c["val"] < 160 and 50 < c["test"] < 160


def test_hash_split_rejects_bad_weights(spark):
    df = spark.range(5).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="sum to 100"):
        hash_split(df, "doc_id", {"train": 90, "val": 5})


def test_per_group_sample_deterministic_and_bounded(spark):
    df = spark.range(500).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).alias("src")
    )
    a = sorted(
        (r.src, r.doc_id)
        for r in per_group_sample(df, ["src"], "doc_id", 7).collect()
    )
    b = sorted(
        (r.src, r.doc_id)
        for r in per_group_sample(
            df.repartition(13), ["src"], "doc_id", 7
        ).collect()
    )
    assert a == b  # partitioning-independent
    from collections import Counter

    assert all(v == 7 for v in Counter(s for s, _ in a).values())


def test_sessionize_gap_semantics(spark):
    rows = [
        (1, datetime(2026, 1, 1, 10, 0)),
        (1, datetime(2026, 1, 1, 10, 20)),   # same session (gap 20m)
        (1, datetime(2026, 1, 1, 11, 0)),    # gap 40m > 30m -> new session
        (1, datetime(2026, 1, 1, 11, 30)),   # gap exactly 30m -> SAME session
        (2, datetime(2026, 1, 1, 9, 0)),     # separate key restarts at 1
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        (r.user_id, r.ts): r.session_idx
        for r in sessionize(df, ["user_id"], "ts", gap="30 minutes").collect()
    }
    assert out[(1, rows[0][1])] == 1
    assert out[(1, rows[1][1])] == 1
    assert out[(1, rows[2][1])] == 2
    assert out[(1, rows[3][1])] == 2  # boundary is inclusive (gap > , not >=)
    assert out[(2, rows[4][1])] == 1

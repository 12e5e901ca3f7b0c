"""Training-shard export: deterministic assignment, physical layout,
manifest attestation, and partition-pruned single-shard reads."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from certified_dogs_and_cats_spark.extensions.shards import (
    export_training_shards,
    read_shard,
    shard_assign,
)
from certified_dogs_and_cats_spark.plans import assert_partition_pruned

N = 200
N_SHARDS = 4


@pytest.fixture
def docs(spark):
    return spark.range(N).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok "), F.col("id").cast("string")).alias("text"),
        (F.col("id") % 7 + 1).cast("int").alias("n_toks"),
    )


def test_export_layout_and_manifest(docs, tmp_path):
    out = str(tmp_path / "shards")
    manifest = export_training_shards(
        docs, out, "doc_id", N_SHARDS, token_count_col="n_toks"
    )
    # Every shard directory exists and the manifest covers all rows.
    dirs = sorted(
        d for d in os.listdir(os.path.join(out, "data"))
        if d.startswith("shard=")
    )
    assert len(dirs) == len(manifest["shards"]) <= N_SHARDS
    assert manifest["n_rows"] == N
    assert sum(s["n_rows"] for s in manifest["shards"]) == N
    # The manifest on disk equals the returned one.
    with open(os.path.join(out, "manifest.json")) as f:
        assert json.load(f)["n_rows"] == N
    # Token totals attest the written data.
    spark = docs.sparkSession
    total = spark.read.parquet(out + "/data").agg(
        F.sum("n_toks")
    ).collect()[0][0]
    assert sum(s["n_tokens"] for s in manifest["shards"]) == total


def test_membership_matches_assignment(docs, tmp_path):
    """Each written row sits in the directory its hash says — the loader
    can recompute membership without the manifest."""
    out = str(tmp_path / "shards")
    export_training_shards(docs, out, "doc_id", N_SHARDS)
    spark = docs.sparkSession
    written = spark.read.parquet(out + "/data").select(
        "doc_id", F.col("shard").cast("int").alias("shard")
    )
    expected = shard_assign(docs, "doc_id", N_SHARDS).select(
        "doc_id", "shard"
    )
    assert written.exceptAll(expected).count() == 0
    assert expected.exceptAll(written).count() == 0


def test_export_is_deterministic(docs, tmp_path):
    """Re-export of the same corpus (different input partitioning) yields
    the identical manifest — training runs are reproducible."""
    a = export_training_shards(
        docs, str(tmp_path / "a"), "doc_id", N_SHARDS, token_count_col="n_toks"
    )
    b = export_training_shards(
        docs.repartition(13),
        str(tmp_path / "b"),
        "doc_id",
        N_SHARDS,
        token_count_col="n_toks",
    )
    ka = sorted((s["shard"], s["n_rows"], s["min_id"], s["max_id"]) for s in a["shards"])
    kb = sorted((s["shard"], s["n_rows"], s["min_id"], s["max_id"]) for s in b["shards"])
    assert ka == kb


def test_read_shard_is_partition_pruned(docs, tmp_path):
    out = str(tmp_path / "shards")
    export_training_shards(docs, out, "doc_id", N_SHARDS)
    spark = docs.sparkSession
    one = read_shard(spark, out, 2)
    assert_partition_pruned(one, "shard")
    got = sorted(r.doc_id for r in one.collect())
    want = sorted(
        r.doc_id
        for r in shard_assign(docs, "doc_id", N_SHARDS)
        .filter(F.col("shard") == 2)
        .collect()
    )
    assert got == want and got


def test_rows_sorted_within_shard(docs, tmp_path):
    """Within one shard the id column is nondecreasing in file order —
    deterministic byte layout for resumable loaders."""
    out = str(tmp_path / "shards")
    export_training_shards(docs, out, "doc_id", N_SHARDS)
    spark = docs.sparkSession
    sdir = os.path.join(out, "data", "shard=1")
    parts = sorted(
        os.path.join(sdir, f)
        for f in os.listdir(sdir)
        if f.endswith(".parquet")
    )
    for p in parts:
        ids = [r.doc_id for r in spark.read.parquet(p).collect()]
        assert ids == sorted(ids)


def test_bad_n_shards_raises(docs):
    with pytest.raises(ValueError, match="n_shards"):
        shard_assign(docs, "doc_id", 0)

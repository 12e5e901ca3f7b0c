"""Deterministic training-shard export.

The last mile of a training-data pipeline: lay a prepared corpus out as N
fixed shards a data loader can consume — each shard a parquet directory,
assignment a pure function of the document id (the md5 idiom shared with
extensions.sampling), rows sorted within each shard, and a manifest that
attests exactly what landed on disk.

Scale posture: shard assignment is a map-side expression; the single
shuffle is ``repartition(n_shards, shard)`` so each write task owns whole
shards (no tiny-file explosion: files-per-shard == 1 task's output).
``partitionBy(shard)`` makes every shard its own directory, so a loader
reading shard k is a partition-pruned scan — no job-level filter needed.
The manifest is computed by reading BACK the written files (attesting the
physical export, not the intent) with one hash aggregate over the shard
column — metadata-sized output regardless of corpus size.

Determinism: same corpus -> same shard membership, same within-shard
order, same manifest, independent of cluster size or input partitioning —
the property that makes training runs reproducible and resumable.
"""

from __future__ import annotations

import json
import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sampling import hash_bucket

MANIFEST_NAME = "manifest.json"


def shard_assign(df: DataFrame, id_col: str, n_shards: int) -> DataFrame:
    """Add a deterministic ``shard`` column in [0, n_shards): first 32 md5
    bits of the id, mod n_shards — reproducible across engines (DuckDB
    replays it as ('0x' || substr(md5(id),1,8))::BIGINT % n)."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1: {n_shards}")
    return df.withColumn(
        "shard", hash_bucket(id_col, n_shards).cast("int")
    )


def export_training_shards(
    df: DataFrame,
    out_dir: str,
    id_col: str,
    n_shards: int,
    sort_cols: Sequence[str] = (),
    token_count_col: str | None = None,
) -> dict:
    """Write ``df`` as ``out_dir/data/shard=K/*.parquet`` plus
    ``out_dir/manifest.json``; returns the manifest dict.

    One shuffle (repartition on the shard id) + one write; rows within a
    shard are sorted by ``sort_cols`` (default: the id) so output files
    are deterministic byte layouts. The manifest is written with LOCAL
    filesystem IO — for an object-store/HDFS ``out_dir``, write the
    returned dict through your own store client (the parquet data write
    itself goes through Hadoop FS and works anywhere). The manifest records per-shard row
    counts, id range, and (when ``token_count_col`` names a numeric
    column) token totals — the numbers a training scheduler needs to plan
    epochs without scanning data files.
    """
    assigned = shard_assign(df, id_col, n_shards)
    order = list(sort_cols) if sort_cols else [id_col]
    data_dir = os.path.join(out_dir, "data")
    (
        assigned.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", *order)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(data_dir)
    )
    manifest = build_shard_manifest(
        df.sparkSession, out_dir, id_col, n_shards, token_count_col
    )
    tmp = os.path.join(out_dir, f".{MANIFEST_NAME}.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, MANIFEST_NAME))
    return manifest


def build_shard_manifest(
    spark: SparkSession,
    out_dir: str,
    id_col: str,
    n_shards: int,
    token_count_col: str | None = None,
) -> dict:
    """Aggregate the WRITTEN shard files into the manifest structure —
    reading back what landed, so the manifest can never disagree with the
    physical export."""
    stats = shard_stats(
        spark.read.parquet(os.path.join(out_dir, "data")),
        id_col,
        token_count_col,
    )
    shards = [r.asDict() for r in stats.collect()]
    return {
        "id_col": id_col,
        "n_shards": n_shards,
        "n_rows": sum(s["n_rows"] for s in shards),
        "shards": shards,
    }


def shard_stats(
    df: DataFrame, id_col: str, token_count_col: str | None = None
) -> DataFrame:
    """Per-shard rollup (shard, n_rows, min/max id [, n_tokens]) — the
    manifest body as a DataFrame, usable standalone under the oracle."""
    aggs = [
        F.count("*").alias("n_rows"),
        F.min(id_col).alias("min_id"),
        F.max(id_col).alias("max_id"),
    ]
    if token_count_col is not None:
        aggs.append(
            F.sum(token_count_col).cast("bigint").alias("n_tokens")
        )
    return df.groupBy(F.col("shard").cast("int").alias("shard")).agg(*aggs)


def read_shard(spark: SparkSession, out_dir: str, shard: int) -> DataFrame:
    """Load ONE shard: the shard=K predicate prunes to a single directory
    (PartitionFilters in the scan — a loader never pays for the other
    N-1 shards)."""
    return (
        spark.read.option("basePath", os.path.join(out_dir, "data"))
        .parquet(os.path.join(out_dir, "data"))
        .filter(F.col("shard") == shard)
    )

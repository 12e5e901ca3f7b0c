"""Deterministic sampling / splitting for training-data pipelines.

Every operation keys on a content hash (md5) rather than RNG state, so the
assignment of any row is a pure function of its id: reproducible across
runs, engines, partitionings, and cluster sizes — the property a 100 TB
training pipeline needs so that re-runs, backfills, and incremental loads
never reshuffle examples between train and holdout splits.

All expressions are JVM-side built-ins (md5/conv/pmod/window): no RNG, no
UDFs, no driver-side state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(id_col: str, n_buckets: int = 100) -> F.Column:
    """Stable bucket in [0, n_buckets): first 32 md5 bits of the id."""
    return F.pmod(
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("bigint"),
        F.lit(n_buckets),
    )


def hash_split(
    df: DataFrame, id_col: str, weights: dict[str, int] | None = None
) -> DataFrame:
    """Deterministic train/val/test assignment by id-hash percentile.

    ``weights`` maps split name -> percent (must sum to 100); default
    80/10/10. A row's split never changes as the corpus grows — unlike
    randomSplit, whose assignment depends on partitioning and seed plumbing.
    """
    weights = weights or {"train": 80, "val": 10, "test": 10}
    if sum(weights.values()) != 100:
        raise ValueError(f"split weights must sum to 100: {weights}")
    bucket = hash_bucket(id_col, 100)
    expr = None
    lo = 0
    for name, pct in weights.items():
        cond = bucket < lo + pct
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += pct
    return df.withColumn("split", expr)


def per_group_sample(
    df: DataFrame, group_cols: Sequence[str], id_col: str, n: int
) -> DataFrame:
    """Deterministic n-per-group subsample: rank by (md5(id), id) within
    each group and keep the first n. Hash order is uniform but fixed, so
    the sample is unbiased yet fully reproducible; one window shuffle on
    the group key (no global sort, no RNG)."""
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(
        F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def stratified_split(
    df: DataFrame,
    group_cols: Sequence[str],
    id_col: str,
    weights: dict[str, int] | None = None,
) -> DataFrame:
    """EXACT per-stratum train/val/test split: within each stratum, rank
    rows by (md5(id), id) and cut at the weight percentiles of the stratum
    size, so every stratum lands within 1 row of the target proportions —
    vs :func:`hash_split`, whose proportions are only statistical and can
    starve small strata.

    Cut test is pure integer math ((rn-1)*100 < cut*n — no float
    percentile edge cases), deterministic, and stable for a FIXED corpus;
    unlike hash_split, growing a stratum re-ranks it, so use this for
    frozen snapshots and hash_split for incrementally growing corpora.
    One window shuffle on the stratum key.
    """
    weights = weights or {"train": 80, "val": 10, "test": 10}
    if sum(weights.values()) != 100:
        raise ValueError(f"split weights must sum to 100: {weights}")
    grp = [F.col(c) for c in group_cols]
    w = Window.partitionBy(*grp).orderBy(
        F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
    )
    wall = Window.partitionBy(*grp)
    rn = F.row_number().over(w)
    n = F.count(F.lit(1)).over(wall)
    scaled = (rn - F.lit(1)) * F.lit(100)
    expr = None
    hi = 0
    for name, pct in weights.items():
        hi += pct
        cond = scaled < F.lit(hi) * n
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr)

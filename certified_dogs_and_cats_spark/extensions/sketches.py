"""KMV (k-minimum-values) distinct-count sketches — mergeable,
deterministic, and byte-serializable.

Why KMV next to Spark's built-in Datasketches HLL
(``F.hll_sketch_agg``, pinned by tests/test_sketches.py): HLL's
register layout is engine-private, so an HLL estimate can never be
replayed by another engine — it fails the repo's DuckDB oracle gate by
construction. KMV's state is just the k smallest distinct values of a
deterministic 60-bit md5 grid hash (extensions.reservoir.hash60), so
the SKETCH ITSELF — not only the estimate — is reproducible bit-for-bit
anywhere, and the estimator ``(k-1) * 2^60 / h_(k)`` (Bar-Yossef et al.,
RANDOM'02) is one exact-product + one correctly-rounded division.

Mergeability (the property that lets per-partition / per-day sketches
roll up without raw data): the union of two KMV sketches truncated to
its k smallest is EXACTLY the sketch of the union of the inputs —
losslessly associative, any tree shape. ``kmv_rollup`` demonstrates the
full distributed life cycle: shard-level sketches built independently,
serialized to BINARY (the wire/storage format a lakehouse state table
would hold), deserialized, and merged to the global sketch — with the
estimate self-verified against the exact distinct count.

Scale posture: the input reduction is ``distinct (group, hash)`` — a
map-side-combinable aggregate — after which per-shard k-min is a
row_number window over an already-reduced frame, and everything
downstream is k rows per (group, shard). No collect, no all-pairs, no
unbounded state; at 100 TB the only data-sized stage is the distinct.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .reservoir import GRID_BITS, hash60

#: Hash domain size as an exact double (2^60 is a power of two).
_DOMAIN = float(1 << GRID_BITS)


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    k: int,
    n_shards: int | None = None,
) -> DataFrame:
    """Per-(group [, shard]) KMV sketch: sorted array of the k smallest
    distinct item hashes plus ``n_seen`` = min(distinct hashes, k) —
    the sketch's own cardinality, which equals the exact distinct count
    only while it is below k (exactly the short-circuit
    :func:`kmv_estimate` needs; it is NOT an uncapped distinct count).
    With ``n_shards``, the hash
    domain is partitioned by ``h mod n_shards`` and one sketch is built
    per (group, shard) — the deterministic stand-in for independent
    per-partition/per-day builders (hash-derived, so shards partition
    the DISTINCT domain — no hash ever appears in two shards)."""
    if k <= 1:
        raise ValueError(f"KMV needs k >= 2, got {k}")
    keys = [F.col(c) for c in group_cols]
    # NULL items hash to NULL: they would occupy a row_number rank slot
    # (NULLs sort first ascending) and inflate n_seen while collect_list
    # silently drops them from the array — k-1 elements with n_seen==k
    # makes element_at(kmv, k) NULL downstream. A NULL item contributes
    # nothing to a distinct count, so drop it before the sketch.
    sel = df.select(
        *keys, hash60(F.col(item_col)).alias("_h")
    ).filter(F.col("_h").isNotNull())
    if n_shards is not None:
        sel = sel.withColumn(
            "_shard", F.pmod(F.col("_h"), F.lit(n_shards)).cast("int")
        )
        part = [*group_cols, "_shard"]
    else:
        part = list(group_cols)
    distinct = sel.distinct()
    w = Window.partitionBy(*part).orderBy(F.col("_h").asc())
    return (
        distinct.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy(*part)
        .agg(
            F.sort_array(F.collect_list("_h")).alias("kmv"),
            F.count("*").cast("bigint").alias("n_seen"),
        )
    )


def kmv_to_binary(arr: Column) -> Column:
    """Serialize a sketch array to BINARY: the hashes as concatenated
    8-byte big-endian words — the storage format a checkpointed state
    table would persist (order-preserving bytewise, so the blob is also
    directly comparable)."""
    return F.aggregate(
        arr,
        F.lit(b""),
        lambda acc, x: F.concat(acc, F.unhex(F.lpad(F.hex(x), 16, "0"))),
    )


def kmv_from_binary(blob: Column) -> Column:
    """Inverse of :func:`kmv_to_binary`: BINARY back to array<bigint>.
    Sketches are never empty (a group exists only if it has rows), so
    the word count is always >= 1."""
    words = (F.length(blob) / 8).cast("int")
    return F.transform(
        F.sequence(F.lit(0), words - 1),
        lambda i: F.conv(
            F.hex(F.substring(blob, i * 8 + 1, F.lit(8))), 16, 10
        ).cast("bigint"),
    )


def kmv_merge(
    sketches: DataFrame, group_cols: list[str], k: int
) -> DataFrame:
    """Merge per-shard sketches to one sketch per group: union the
    hash arrays (exact — hashes, not estimates, are merged) and keep
    the k smallest. ``n_seen`` is RECOMPUTED from the merged array
    (min(union cardinality, k)) — never summed across shards, whose
    own n_seen values are k-capped."""
    exploded = sketches.select(
        *[F.col(c) for c in group_cols],
        F.explode("kmv").alias("_h"),
    ).distinct()
    w = Window.partitionBy(*group_cols).orderBy(F.col("_h").asc())
    return (
        exploded.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy(*group_cols)
        .agg(
            F.sort_array(F.collect_list("_h")).alias("kmv"),
            F.count("*").cast("bigint").alias("n_seen"),
        )
    )


def kmv_estimate(kmv: Column, n_seen: Column, k: int) -> Column:
    """Distinct-count estimate: exact when fewer than k distinct hashes
    exist (the sketch IS the distinct set), else ``(k-1) * 2^60 /
    h_(k)`` floored to BIGINT. Every operation is IEEE-exact or
    correctly rounded, so any engine reproduces the integer."""
    kth = F.element_at(kmv, k).cast("double")
    est = F.floor(F.lit(float(k - 1)) * F.lit(_DOMAIN) / kth).cast("bigint")
    return F.when(n_seen < k, n_seen.cast("bigint")).otherwise(est)


def kmv_rollup(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    k: int,
    n_shards: int = 16,
) -> DataFrame:
    """Full distributed KMV life cycle, self-verified:

    1. shard rows by a hash-derived key (deterministic stand-in for
       "which partition/day built this sketch");
    2. build one sketch per (group, shard);
    3. serialize each to BINARY and back (the wire round-trip a state
       table implies — byte-lossless by construction, and enforced here
       by merging the DECODED arrays);
    4. merge shards to one sketch per group;
    5. estimate, next to the exact distinct count.

    Returns group cols + ``kmv_estimate``, ``exact_distinct``,
    ``err_permille`` (signed, rounded)."""
    shards = kmv_sketch(df, group_cols, item_col, k, n_shards=n_shards)
    wire = shards.select(
        *[F.col(c) for c in group_cols],
        kmv_to_binary(F.col("kmv")).alias("blob"),
    )
    decoded = wire.select(
        *[F.col(c) for c in group_cols],
        kmv_from_binary(F.col("blob")).alias("kmv"),
    )
    merged = kmv_merge(decoded, group_cols, k)
    exact = (
        df.select(*[F.col(c) for c in group_cols], F.col(item_col))
        .distinct()
        .groupBy(*group_cols)
        .agg(F.count("*").cast("bigint").alias("exact_distinct"))
    )
    est = merged.select(
        *[F.col(c) for c in group_cols],
        kmv_estimate(F.col("kmv"), F.col("n_seen"), k).alias("kmv_estimate"),
    )
    return est.join(exact, group_cols).select(
        *[F.col(c) for c in group_cols],
        "kmv_estimate",
        "exact_distinct",
        F.round(
            (F.col("kmv_estimate") - F.col("exact_distinct")).cast("double")
            * F.lit(1000.0)
            / F.col("exact_distinct").cast("double")
        )
        .cast("bigint")
        .alias("err_permille"),
    )

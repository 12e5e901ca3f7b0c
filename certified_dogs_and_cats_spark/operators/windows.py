"""Window/ranking operators (SURVEY.md §2.5, §2.4 A7).

Deterministic tie-breaks are mandatory: every ordering ends in a unique key
so results are stable under parallelism (reference pins `cnt DESC, breed ASC`
— notebooks/gold.py:58,105; README.md:138).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[Column]
) -> DataFrame:
    """Latest-record-wins dedup: row_number over (keys, order_by desc), keep
    rn=1 (reference notebooks/silver.py:81-85).

    Scale: one shuffle on the dedup key. If the key is near-unique (ids),
    this is the cheapest exact dedup Spark has; for heavy skew, AQE skew
    handling applies because it is a plain window shuffle.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rnk",
    method: str = "row_number",
) -> DataFrame:
    """Top-k per group via window rank + filter — never LIMIT-after-sort
    (reference notebooks/gold.py:56-73). `method` row_number|rank matches the
    reference's deliberate choice per view (ROW_NUMBER at gold.py:56 vs RANK
    at gold.py:105 — they differ under ties)."""
    if method not in ("row_number", "rank"):
        raise ValueError(
            f"method must be 'row_number' or 'rank': {method!r}"
        )
    fn = F.row_number if method == "row_number" else F.rank
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return df.withColumn(rank_col, fn().over(w)).filter(F.col(rank_col) <= k)


def pivot_top_k(
    ranked: DataFrame,
    group_cols: Sequence[str],
    rank_col: str,
    value_cols: Sequence[str],
    k: int,
) -> DataFrame:
    """Wide top-1..top-k columns per group from a ranked long table —
    the reference's MAX(CASE WHEN rnk=i) pivot (notebooks/gold.py:191-208).

    Expressed as groupBy().agg(max(when(...))) which Catalyst executes as a
    single hash aggregate (one shuffle); identical shape to SQL MAX-CASE.
    """
    aggs = []
    for i in range(1, k + 1):
        for v in value_cols:
            aggs.append(
                F.max(F.when(F.col(rank_col) == i, F.col(v))).alias(f"top{i}_{v}")
            )
    return ranked.groupBy(*group_cols).agg(*aggs)


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap: str = "30 minutes",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the previous event for the same key exceeds ``gap``.

    Adds ``session_idx`` (1-based per key, chronological). One window pass
    per key — a single shuffle on the key, linear per partition, the batch
    twin of Structured Streaming's session_window. Callers needing a global
    id concatenate (keys..., session_idx).

    Determinism: requires a unique (keys, ts_col) — append a tie-break to
    ``ts_col`` ordering upstream if event times can collide.
    """
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc())
    prev_ts = F.lag(F.col(ts_col)).over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (F.col(ts_col) > prev_ts + F.expr(f"INTERVAL {gap}")),
        1,
    ).otherwise(0)
    run = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_idx", F.sum(is_new).over(run))

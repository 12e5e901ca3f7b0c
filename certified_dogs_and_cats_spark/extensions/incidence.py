"""Adaptive incidence budget for exact-overlap candidate generation.

The exact set-similarity / decontamination family (shared-shingle or
shared-fingerprint equi-self-joins) has candidate incidence
``sum_key df*(df-1)/2`` — quadratic in per-key document frequency. On a
topically-coherent corpus df grows with corpus size, so the candidate
stage grows SUPER-linearly even though every other stage is linear
(measured 21-45x per 10x rows in SHUFFLE.md r10; flagged by VERDICT r10
#4). A fixed df-cap (the 1000 ceiling already in
:func:`extensions.dedup.jaccard_pairs`) bounds skew bombs but never
binds at realistic df, so it does not bound GROWTH.

This module adds the scale-bounding knob: an adaptive document-frequency
cap chosen from the data so that the candidate stage stays LINEAR in the
postings it reads —

    cap = max { d : sum_{key: df_key <= d} df*(df-1)/2 <= (num/den) * |postings| }

i.e. the pair stage may emit at most ``num/den`` candidate rows per
posting row, at ANY corpus size. Keys above the cap are dropped from the
candidate universe entirely (they are corpus boilerplate — the same
drop-don't-sample semantics as the fixed cap, so sizes and intersections
stay internally consistent). The cap is a deterministic function of the
df histogram, every comparison is exact-integer (``den*cum <= num*post``
— no float threshold), and the DuckDB oracle replays the identical
construction (:func:`cap_ctes_sql`), so capped results stay value-hash
provable cross-engine.

At sf0.01 the budget does not bind for word-3-shingles (max df 7, raw
incidence already under budget) — results there are bit-identical to the
uncapped computation, which the equivalence pytest pins; at sf0.1 it
binds at cap~8, holding the family's incidence growth to ~14x per 10x
rows (vs 90x uncapped).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: Default budget: the candidate stage may move at most 3 rows per 4
#: posting rows. Rational on purpose — the cap decision multiplies
#: integers cross-wise, never compares against a float.
BUDGET_NUM = 3
BUDGET_DEN = 4


def adaptive_df_cap(
    postings: DataFrame,
    key_col: str,
    num: int = BUDGET_NUM,
    den: int = BUDGET_DEN,
) -> DataFrame:
    """1-row frame ``(cap bigint)``: the largest df whose cumulative pair
    incidence fits the linear budget (module docstring). ``cap`` is at
    least 1 (df-1 keys carry zero incidence and always qualify).

    Cost: one aggregate to the df histogram (|keys| -> <= max_df rows),
    then windows over that HISTOGRAM — dimension-scale at any corpus
    size, the sanctioned global-window shape. Sums are exact BIGINT;
    overflow would need ~3e18 cumulative candidates, far beyond anything
    a cluster would ever materialize.
    """
    freq = postings.groupBy(key_col).agg(F.count("*").alias("df"))
    return _cap_from_freq(freq, num, den)


def _cap_from_freq(freq: DataFrame, num: int, den: int) -> DataFrame:
    """:func:`adaptive_df_cap` from a pre-computed ``(key, df)`` frame —
    split out so :func:`budget_filter` aggregates the posting frame into
    ``freq`` ONCE and derives both the cap and the join side from it
    (the cap decision is a pure function of the df histogram, so the
    result is identical)."""
    hist = freq.groupBy("df").agg(F.count("*").alias("n"))
    w_cum = Window.orderBy("df").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy("df").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # Integer division end to end (`div`, not `/`): df*(df-1) is even so
    # the quotient is exact, and no double intermediate caps precision.
    inc = F.col("n") * F.expr("df * (df - 1) div 2")
    scored = hist.select(
        F.col("df"),
        F.sum(inc).over(w_cum).alias("cum_inc"),
        F.sum(F.col("n") * F.col("df")).over(w_all).alias("postings"),
    )
    qualifies = F.lit(den) * F.col("cum_inc") <= F.lit(num) * F.col("postings")
    return scored.agg(
        F.coalesce(F.max(F.when(qualifies, F.col("df"))), F.lit(1))
        .cast("bigint")
        .alias("cap")
    )


def budget_filter(
    postings: DataFrame,
    key_col: str,
    num: int = BUDGET_NUM,
    den: int = BUDGET_DEN,
) -> DataFrame:
    """Drop every posting whose key's document frequency exceeds the
    adaptive cap. Same columns out as in; downstream sizes/intersections
    are computed post-filter, exactly like the fixed df-cap path. The
    1-row cap frame rides in on a broadcast scalar combine (the
    ratio_cross_join pattern) — no driver collect, plan stays lazy.

    Plan shape (r12, guide §5): the posting frame is consumed by the
    frequency aggregate AND the filter join, and its upstream is the
    expensive part of every caller (a corpus-scale shingle explode or
    signature projection), so it is persisted here instead of being
    recomputed per consumer — previously the cap aggregate, the freq
    aggregate and the join side each re-ran the upstream (three full
    corpus passes per candidate build, visible as three identical scan
    branches in the physical plan). The freq aggregate itself is shared
    between the cap decision and the join (``_cap_from_freq``). Callers
    that run many queries per session release via
    :func:`certified_dogs_and_cats_spark.cache.release_cached`."""
    from ..cache import tracked_persist

    postings = tracked_persist(postings)
    freq = postings.groupBy(key_col).agg(F.count("*").alias("__df__"))
    cap = _cap_from_freq(
        freq.select(F.col("__df__").alias("df")), num, den
    )
    return (
        postings.join(freq, key_col)
        .crossJoin(F.broadcast(cap))
        .filter(F.col("__df__") <= F.col("cap"))
        .select(*postings.columns)
    )


def adaptive_cap_py(dfs: list[int], num: int = BUDGET_NUM, den: int = BUDGET_DEN) -> int:
    """Python replay of :func:`adaptive_df_cap` for tests: given the
    per-key document frequencies, return the cap."""
    from collections import Counter

    hist = Counter(dfs)
    postings = sum(dfs)
    cum = 0
    cap = 1
    for d in sorted(hist):
        cum += hist[d] * d * (d - 1) // 2
        if den * cum <= num * postings:
            cap = max(cap, d)
    return cap


def cap_ctes_sql(
    rel: str,
    key_col: str,
    id_col: str,
    num: int = BUDGET_NUM,
    den: int = BUDGET_DEN,
    prefix: str = "",
    ceiling: int | None = None,
) -> str:
    """DuckDB CTE chain replaying :func:`budget_filter` over relation
    ``rel(id_col, key_col)``: emits ``{prefix}freq``, ``{prefix}hist``,
    ``{prefix}scored``, ``{prefix}cap`` and the filtered postings
    ``{prefix}shc`` — append after the relation's own CTE. ``ceiling``
    folds in a fixed df hard cap (the jaccard_pairs/containment_pairs
    ``max_shingle_df`` gate applied downstream of the budget filter —
    sound to fold here because the budget drops whole posting lists, so
    per-key df is unchanged by it)."""
    p = prefix
    ceil_pred = f" AND {p}freq.df <= {ceiling}" if ceiling is not None else ""
    return f"""
    {p}freq AS (SELECT {key_col}, count(*) AS df FROM {rel} GROUP BY 1),
    {p}hist AS (SELECT df, count(*) AS n FROM {p}freq GROUP BY 1),
    {p}scored AS (
      SELECT df,
             sum(n * (df * (df - 1) // 2)) OVER (ORDER BY df) AS cum_inc,
             sum(n * df) OVER () AS postings
      FROM {p}hist
    ),
    {p}cap AS (
      SELECT coalesce(max(CASE WHEN {den} * cum_inc <= {num} * postings
                               THEN df END), 1) AS cap
      FROM {p}scored
    ),
    {p}shc AS (
      SELECT {rel}.{id_col}, {rel}.{key_col}
      FROM {rel} JOIN {p}freq USING ({key_col}), {p}cap
      WHERE {p}freq.df <= {p}cap.cap{ceil_pred}
    )"""

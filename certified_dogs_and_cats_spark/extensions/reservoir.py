"""Deterministic weighted sampling without replacement (A-ES).

Efraimidis-Spirtakis: give every row the key ``u^(1/w)`` for a uniform
``u`` in (0,1) and keep the top-k keys — the classic one-pass weighted
reservoir. The distributed form needs no reservoir at all: the key is a
pure per-row expression, and top-k over it is Spark's TakeOrdered
(map-side partial top-k per partition, tiny merge at the driver-side
limit) — no shuffle of the corpus, no state, the same plan at any
partitioning.

Determinism contract (what makes this registrable against a DuckDB
oracle, the repo's correctness gate): ``u`` is not random — it derives
from ``md5(id [, salt])`` mapped into (0,1), so the "draw" is a pure
function of the row identity, replayable bit-for-bit by any engine that
can compute md5 and the same arithmetic. Rank ties (astronomically
unlikely beyond identical (u, w) pairs) break on the id, keeping the
selection total. We rank by the monotone-equivalent ``ln(u)/w``
(descending) instead of ``u^(1/w)`` — one transcendental instead of
two — and that one transcendental is the repo's ``functions.detln``
series-ln, NOT the engine's ``ln``: JVM and libm ``log`` can differ in
the final ulp, which would make the selection engine-dependent near a
rank boundary. With ``u = (2h+1)/2^61`` for the 60-bit md5 prefix
``h``, ``ln u = -series_ln(2^61, 2h+1)`` is a pure integer-argument
call, so every engine (Spark, DuckDB, a Python replay) computes the
IDENTICAL double key. Pinned by tests/test_reservoir.py.

Weights must be positive; rows with ``w <= 0`` or NULL are excluded
(they cannot be drawn — matching the A-ES definition).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.detln import series_ln_sql

#: 60-bit hash grid: md5's first 15 hex chars. u = (2h + 1) / 2^61 in
#: the open interval (0,1) — the odd numerator keeps u away from both
#: endpoints (u = 0 would send ln(u) to -inf; u = 1 would zero the key).
GRID_BITS = 60


def hash60(id_col: Column, salt: str | None = None) -> Column:
    """Deterministic 60-bit BIGINT hash of the row identity.

    The salt is joined with a ``|`` delimiter so distinct (id, salt)
    pairs can never collide by concatenation (id='1', salt='2x' vs
    id='12', salt='x'); unsalted hashes use the bare id, so they are
    stable whether or not a caller ever salts."""
    ident = id_col.cast("string")
    if salt is not None:
        ident = F.concat(ident, F.lit("|"), F.lit(salt))
    return F.conv(F.substring(F.md5(ident), 1, 15), 16, 10).cast("bigint")


def unit_uniform(id_col: Column, salt: str | None = None) -> Column:
    """Deterministic u in (0,1): (2 * md5_60bit(id [, salt]) + 1) / 2^61."""
    h2 = 2 * hash60(id_col, salt) + 1
    return h2.cast("double") / F.lit(float(1 << (GRID_BITS + 1)))


def aes_key(weight: Column) -> Column:
    """The A-ES rank key ``ln(u)/w`` as a cross-engine-exact double,
    computed from a pre-projected 60-bit hash column named ``_h60``
    (:func:`_keyed` provides it — the series expression references the
    hash ~30 times, so projecting it once keeps md5 out of every term).

    ``ln u = -series_ln(2^61, 2h+1)`` — integer arguments into the
    detln IEEE DAG, then one correctly-rounded division by ``w``; every
    intermediate double is identical on Spark, DuckDB, and the Python
    replay. Larger keys are preferred (keys are negative; heavier
    weights pull them toward zero)."""
    df_expr = series_ln_sql(str(1 << (GRID_BITS + 1)), "(2 * _h60 + 1)", "spark")
    return -F.expr(df_expr) / weight


def _keyed(
    df: DataFrame, id_col: str, weight_col: str, k: int, salt: str | None
) -> DataFrame:
    """Shared sampler front half: validate k, drop non-positive/NULL
    weights, project the A-ES key. Both samplers select from THIS frame
    so their keys can never drift apart."""
    if k <= 0:
        raise ValueError(f"sample size k must be positive, got {k}")
    w = F.col(weight_col).cast("double")
    # A NULL id hashes to a NULL key; under desc ordering NULLs sort
    # last, so such rows could still surface once k exceeds the non-null
    # eligible population. NULL ids are ineligible, same as w <= 0.
    return (
        df.filter(w > 0)
        .filter(F.col(id_col).isNotNull())
        .withColumn("_h60", hash60(F.col(id_col), salt))
        .withColumn("sample_key", aes_key(w))
        .drop("_h60")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str | None = None,
) -> DataFrame:
    """Top-k weighted sample without replacement (A-ES), deterministic
    in (id, salt). Returns the sampled rows plus their ``sample_key``
    (ln(u)/w — larger is more preferred), ordered by the selection
    order. Rows with non-positive or NULL weight are excluded."""
    return (
        _keyed(df, id_col, weight_col, k, salt)
        .orderBy(F.col("sample_key").desc(), F.col(id_col).asc())
        .limit(k)
    )


def weighted_sample_per_group(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    weight_col: str,
    k: int,
    salt: str | None = None,
) -> DataFrame:
    """Stratified A-ES: an independent k-item weighted sample WITHIN
    each group (the per-language / per-source quota draw a corpus mix
    needs). Same per-row key as :func:`weighted_sample`; selection is a
    rank window partitioned by the group key — one shuffle on the
    group key, k rows per group out, no global ordering anywhere. Adds
    ``sample_rank`` (1 = most preferred draw in its group)."""
    from pyspark.sql.window import Window

    win = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(
        F.col("sample_key").desc(), F.col(id_col).asc()
    )
    return (
        _keyed(df, id_col, weight_col, k, salt)
        .withColumn("sample_rank", F.row_number().over(win))
        .filter(F.col("sample_rank") <= k)
    )

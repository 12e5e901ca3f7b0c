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
two. Cross-engine float caveat, documented for the round-10 oracle
registration: JVM and DuckDB ``ln`` may differ in final ulps; for a
hash-green oracle row either accept the ~1e-16-relative tie window
(2^-60-grid u values make a cross-engine rank flip need two keys within
ulps — not observed on the fixtures) or swap ``F.log`` for the repo's
``functions.detln`` series-ln, which both engines evaluate as one
identical IEEE DAG.

Weights must be positive; rows with ``w <= 0`` or NULL are excluded
(they cannot be drawn — matching the A-ES definition).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 60-bit hash grid: md5's first 15 hex chars, exactly representable in
#: a DOUBLE (< 2^53 after the division's rounding is irrelevant — the
#: VALUE only needs to be a deterministic point of (0,1), not exact).
_GRID = float(1 << 60)


def unit_uniform(id_col: Column, salt: str | None = None) -> Column:
    """Deterministic u in (0,1): (md5_60bit(id [, salt]) + 0.5) / 2^60.

    The +0.5 keeps u strictly inside the open interval (u = 0 would send
    ln(u) to -inf — a legal but degenerate key; u = 1 would make every
    weight identical)."""
    ident = F.concat(id_col.cast("string"), F.lit(salt or ""))
    h = F.conv(F.substring(F.md5(ident), 1, 15), 16, 10).cast("double")
    return (h + F.lit(0.5)) / F.lit(_GRID)


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
    if k <= 0:
        raise ValueError(f"sample size k must be positive, got {k}")
    w = F.col(weight_col).cast("double")
    keyed = (
        df.filter(w > 0)
        .withColumn(
            "sample_key", F.log(unit_uniform(F.col(id_col), salt)) / w
        )
    )
    return keyed.orderBy(
        F.col("sample_key").desc(), F.col(id_col).asc()
    ).limit(k)

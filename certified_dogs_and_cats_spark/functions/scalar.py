"""Scalar-function library — pure built-in ``pyspark.sql.functions``.

No Python UDFs anywhere here: every helper composes JVM-side expressions so
Catalyst keeps whole-stage codegen and pushdown. These are the engine-level
equivalents of the reference's inline expression idioms:

- key normalization ``regexp_replace(upper(trim(x)), '[^A-Z0-9]', '')``
  (reference notebooks/silver.py:48-49, sql/breed_mapping.py:583)
- regex-validated code columns with validity flag + nulling
  (reference notebooks/bronze.py:83-91, notebooks/silver.py:42-43)
- exact money aggregation: sum in DECIMAL then cast to DOUBLE, so results
  are order-independent and bit-identical across engines (important both
  for the DuckDB oracle and for deterministic re-runs on a real cluster,
  where partition order varies run to run).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_key(col: Column | str) -> Column:
    """Uppercase, trim, strip non-alphanumerics — canonical join key."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.upper(F.trim(c)), "[^A-Z0-9]", "")


def pattern_valid(col: Column | str, pattern: str) -> Column:
    """Boolean regex-validity flag (null input -> false, like the reference's
    FSA_VALID which treats null FSA as invalid)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.rlike(pattern), F.lit(False))


def null_if_invalid(col: Column | str, valid: Column) -> Column:
    """Null-out a value that failed validation but keep the flag elsewhere
    (reference notebooks/silver.py:42-43)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(valid, c).otherwise(F.lit(None))


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Exact sum of a money-like double column.

    Cast each value to DECIMAL(18, scale) (exact for inputs with <= `scale`
    fractional digits), sum exactly, cast the total back to DOUBLE. The
    result is independent of partitioning / aggregation order — the property
    a 1000-executor run needs for reproducible results, and the property the
    DuckDB oracle comparison needs for bit-equal hashes.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def safe_ratio(num: Column, den: Column) -> Column:
    """num/den as DOUBLE with divide-by-zero guard -> NULL
    (reference notebooks/gold.py:306 CASE WHEN total=0)."""
    return F.when(den != 0, num.cast("double") / den.cast("double"))


def pct(num: Column, den: Column, digits: int = 2) -> Column:
    """100*num/den rounded, NULL when den = 0 — the reference's share/
    percentage idiom (notebooks/gold.py:69,115) with the same
    divide-by-zero guard as :func:`safe_ratio` (Spark 4 runs ANSI mode
    by default, where an unguarded /0 kills the job)."""
    return F.round(F.lit(100.0) * safe_ratio(num, den), digits)

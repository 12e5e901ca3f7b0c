"""Deterministic cross-engine natural log of a rational ``num/den``.

Problem: the repo's correctness gate hashes query results computed by
Spark (JVM) against DuckDB (libm), and the two engines' ``ln`` can
differ in the last ulp — enough to flip a round(.,6) boundary or a
tie-break. Every other score in the engine is therefore log-free
(rational idf, lift instead of PMI), but *textbook* BM25 is defined
with ``ln`` and users comparing against Lucene/Elasticsearch expect it.

Solution: evaluate ln ourselves as a FIXED SEQUENCE of IEEE-754 double
operations that both engines execute identically. +, -, *, / on doubles
are exactly specified by IEEE 754 (correctly rounded), so the same
operation DAG produces bit-identical results on the JVM and in DuckDB —
unlike libm ``log``, whose rounding is implementation-defined.

For ``x = num/den`` with integer ``num >= den >= 1``:

1. Range-reduce with EXACT integer arithmetic: ``e = bitlen(num) -
   bitlen(den)`` (``length(bin(i)) = floor(log2 i) + 1`` in both SQL
   dialects), so ``m = (num/den) / 2^e`` lies in (1/2, 2). ``2^e`` is an
   exact power of two (integer shift, then an exact int->double cast for
   e <= 52), and dividing a double by a power of two is EXACT — m's bits
   are fully determined by the one correctly-rounded num/den division.
2. ``ln m = 2 * atanh(z)`` with ``z = (m-1)/(m+1)`` in (-1/3, 1/3),
   evaluated as the odd series ``2z * (1 + z^2/3 + z^4/5 + ... +
   z^18/19)`` in Horner form — 10 terms; the truncated tail is
   ``< 2*(1/3)^21 / 21 ~ 9e-12`` absolute; measured max relative error
   vs libm ln is ~1e-11 (7.3e-12 over a 200k-pair sweep of num/den up
   to 1e12 — consistent with the truncated-tail bound above; a narrow
   20k-pair sweep reads 1.3e-12). The bound only has to clear the
   round(., 6) comparison margin, which it does by five orders of
   magnitude; cross-engine bit-identity is unaffected either way (both
   engines execute the same IEEE DAG).
3. ``ln x = e * ln2 + ln m`` with ln2 as the correctly-rounded double
   literal ``6931471805599453e-16`` (exponent-form: Spark parses
   ``0.69...`` decimal-typed, ``...e-16`` double-typed in BOTH engines).

The generated text differs per dialect only where syntax forces it
(Spark ``shiftleft(1L, e)`` vs DuckDB ``1::BIGINT << e``); the
arithmetic DAG — and therefore every intermediate double — is
identical. Pinned bit-exact across engines by
``tests/test_retrieval.py::test_series_ln_bit_identical_cross_engine``.
"""

from __future__ import annotations

#: Correctly-rounded double nearest ln 2, as an exponent-form literal
#: (parsed as DOUBLE, not DECIMAL, by both Spark and DuckDB).
LN2_LITERAL = "6931471805599453e-16"

#: Largest odd series exponent: z, z^3, ..., z^19 (10 terms).
SERIES_TERMS = (19, 17, 15, 13, 11, 9, 7, 5, 3)


def series_ln_sql(num: str, den: str, dialect: str) -> str:
    """SQL expression for ``ln(num/den)`` with ``num >= den >= 1``
    (integer-typed SQL sub-expressions), bit-identical across Spark and
    DuckDB. ``dialect`` is ``"spark"`` or ``"duck"``. For arguments
    below 1, swap and negate at the call site."""
    if dialect not in ("spark", "duck"):
        raise ValueError(f"unknown dialect {dialect!r}")
    e = (
        f"(CAST(length(bin({num})) AS INTEGER)"
        f" - CAST(length(bin({den})) AS INTEGER))"
    )
    if dialect == "duck":
        pow2 = f"CAST((CAST(1 AS BIGINT) << {e}) AS DOUBLE)"
    else:
        pow2 = f"CAST(shiftleft(CAST(1 AS BIGINT), {e}) AS DOUBLE)"
    m = f"((CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE)) / {pow2})"
    z = f"(({m} - 1e0) / ({m} + 1e0))"
    horner = f"(1e0/{SERIES_TERMS[0]}e0)"
    for c in SERIES_TERMS[1:]:
        horner = f"((1e0/{c}e0) + (Z2 * {horner}))"
    horner = f"(1e0 + (Z2 * {horner}))"
    lnm = f"(2e0 * (Z * {horner}))"
    # Substitute placeholders AFTER building the nesting so z / z*z are
    # written once per use site — the op sequence stays identical in
    # both dialects because only the placeholder text differs.
    lnm = lnm.replace("Z2", "(Z * Z)").replace("Z", z)
    return f"((CAST({e} AS DOUBLE) * {LN2_LITERAL}) + {lnm})"


def series_ln_py(num: int, den: int) -> float:
    """Python replay of the EXACT IEEE-754 operation DAG emitted by
    :func:`series_ln_sql` — CPython floats are the same C doubles, and
    +, -, *, / are correctly rounded there too, so this is bit-identical
    to what Spark and DuckDB compute (unlike ``math.log``, whose final
    ulp is libm-dependent). Lets tests and oracles replay engine keys
    without a tolerance."""
    if not (num >= den >= 1):
        raise ValueError(f"series_ln_py requires num >= den >= 1, got {num}/{den}")
    e = num.bit_length() - den.bit_length()
    m = (float(num) / float(den)) / float(1 << e)
    z = (m - 1.0) / (m + 1.0)
    horner = 1.0 / float(SERIES_TERMS[0])
    for c in SERIES_TERMS[1:]:
        horner = (1.0 / float(c)) + ((z * z) * horner)
    horner = 1.0 + ((z * z) * horner)
    lnm = 2.0 * (z * horner)
    return (float(e) * float(LN2_LITERAL)) + lnm

"""True Z-order (Morton) keys for multi-column data clustering.

The reference's ``OPTIMIZE ... ZORDER BY (a, b)`` (docs/runbook.md:55-58)
interleaves the bits of per-column buckets so rows close in BOTH columns
land close in the sort order — which is what makes parquet row-group
min/max skipping effective for multi-column box predicates. Lexicographic
sort (``compact(cluster_by=...)``) only clusters the leading column;
Z-order trades a little per-column locality for locality in every keyed
column at once.

All pure codegen expressions: bucket via ``width_bucket`` against
caller-supplied (or one-pass-computed) bounds, interleave via shift/or
terms. No UDFs, no sampling jobs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(cols: Sequence[Column], bits: int = 16) -> Column:
    """Morton-interleave ``bits`` low bits of each integral column: output
    bit (i * n_cols + j) = bit i of cols[j]. For two 16-bit buckets this
    yields the classic 32-bit Z-curve key. Expression-only (shift/and/or
    terms, n_cols * bits of them), so it inlines into whole-stage codegen.

    Requires ``n_cols * bits <= 63``: bit 63 is the long's sign bit
    (negative keys would sort the TOP bucket first) and Java shifts wrap
    mod 64 beyond it (silent bucket-bit collisions). :func:`zorder_key`
    auto-shrinks bits to fit; direct callers get a loud error.
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError(
            f"interleave_bits: {n} cols x {bits} bits = {n * bits} output"
            " bits exceeds the 63 usable bits of a signed long — lower"
            " bits (zorder_key does this automatically)"
        )
    terms = []
    for i in range(bits):
        for j, c in enumerate(cols):
            src = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(src, i * n + j))
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    bounds: dict[str, tuple[float, float]] | None = None,
) -> Column:
    """Z-order key column over numeric ``cols``: equal-width bucket each
    column into [0, 2^bits) with ``width_bucket`` against (min, max)
    bounds, then Morton-interleave the buckets.

    ``bounds`` maps col -> (min, max); omitted bounds are computed with
    ONE aggregate pass over ``df`` (driver-side scalars — at 100 TB reuse
    table-level stats instead of re-scanning). Equal-width bucketing is
    the standard Z-order choice: rank-based (equal-depth) buckets need a
    global sort or quantile sketch and buy little for clustering.
    """
    # Fit within the 63 usable bits of a signed long: 2 cols keep the
    # full 16-bit default (32 output bits); 4 cols drop to 15 bits each;
    # 5 cols to 12 — resolution trades off against column count exactly
    # as in Delta's OPTIMIZE ZORDER.
    bits = min(bits, 63 // max(len(cols), 1))
    n_buckets = 1 << bits
    bounds = dict(bounds or {})
    missing = [c for c in cols if c not in bounds]
    if missing:
        aggs = []
        for c in missing:
            aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}")]
        row = df.agg(*aggs).collect()[0]
        for c in missing:
            if row[f"__mn_{c}"] is None or row[f"__mx_{c}"] is None:
                raise ValueError(
                    f"zorder_key: no non-NULL values to derive bounds for"
                    f" column {c!r} (empty table or all-NULL column) —"
                    " pass explicit bounds"
                )
            bounds[c] = (float(row[f"__mn_{c}"]), float(row[f"__mx_{c}"]))
    buckets = []
    for c in cols:
        lo, hi = bounds[c]
        if hi <= lo:
            hi = lo + 1.0
        # width_bucket returns 1..n+1; clamp into [0, n_buckets).
        b = F.width_bucket(
            F.col(c).cast("double"), F.lit(lo), F.lit(hi), F.lit(n_buckets)
        ) - F.lit(1)
        buckets.append(F.least(F.greatest(b, F.lit(0)), F.lit(n_buckets - 1)))
    return interleave_bits(buckets, bits=bits)

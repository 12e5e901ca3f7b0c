"""Round-9 query-family properties: TPC-H shapes, skyline dominance,
NTILE banding, KMV calibration, quantized-mean ANOVA, and JS-divergence
bounds — the invariants the DuckDB hash gate cannot state (it proves
equality, not MEANING)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_pareto_frontier_dominance(spark):
    """Every returned part is undominated within its brand; every
    omitted part is dominated by some returned part (frontier
    completeness — the property the window formulation must preserve)."""
    from certified_dogs_and_cats_spark.queries.advanced import (
        pareto_frontier_brand,
    )

    parts = {
        (r.p_brand, r.p_partkey): (r.p_size, r.p_retailprice)
        for r in spark.read.parquet(f"{SF}/part.parquet").collect()
    }
    frontier = {
        (r.brand, r.partkey) for r in pareto_frontier_brand(spark, SF).collect()
    }

    def dominates(a, b):  # a dominates b: cheaper-or-equal AND
        # bigger-or-equal, strict somewhere
        sa, pa = a
        sb, pb = b
        return pa <= pb and sa >= sb and (pa < pb or sa > sb)

    by_brand: dict[str, list] = {}
    for (brand, key), sp in parts.items():
        by_brand.setdefault(brand, []).append((key, sp))
    for brand, rows in by_brand.items():
        for key, sp in rows:
            dominated = any(
                dominates(osp, sp) for okey, osp in rows if okey != key
            )
            assert ((brand, key) in frontier) == (not dominated), (
                brand,
                key,
                sp,
                dominated,
            )


def test_ntile_bands_are_balanced(spark):
    """NTILE(4) invariant: within each segment, band sizes differ by at
    most 1 and cover every customer that has orders."""
    from certified_dogs_and_cats_spark.queries.advanced import (
        ntile_spend_bands,
    )

    rows = ntile_spend_bands(spark, SF).collect()
    seg_counts: dict[str, list[int]] = {}
    for r in rows:
        seg_counts.setdefault(r.segment, []).append(r.n_customers)
    c = spark.read.parquet(f"{SF}/customer.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    active = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    expected = {r.c_mktsegment: r["count"] for r in active}
    for seg, counts in seg_counts.items():
        assert max(counts) - min(counts) <= 1, (seg, counts)
        assert sum(counts) == expected[seg]


def test_supplier_return_blame_counts_qualifying_orders(spark):
    """Total blame count == number of multi-supplier orders with exactly
    one returned-line supplier (the Q21 condition restated from raw
    data)."""
    from certified_dogs_and_cats_spark.queries.tpch import (
        supplier_return_blame,
    )

    blames = sum(
        r.blame_count for r in supplier_return_blame(spark, SF).collect()
    )
    l = spark.read.parquet(f"{SF}/lineitem.parquet")
    per_os = l.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias(
            "has_r"
        )
    )
    per_o = per_os.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"), F.sum("has_r").alias("n_r")
    )
    qualifying = per_o.filter(
        (F.col("n_supp") > 1) & (F.col("n_r") == 1)
    ).count()
    assert blames == qualifying > 0


def test_kmv_overlap_layout_independent_and_calibrated(spark):
    """The KMV estimate is a pure function of the data (identical at any
    shuffle-partition setting) and lands within the stated bound of the
    exact Jaccard."""
    from certified_dogs_and_cats_spark.queries.advanced import (
        kmv_user_overlap,
    )

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    got = []
    try:
        for parts in ("2", "17"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            got.append(kmv_user_overlap(spark, SF).collect()[0])
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    a, b = got
    assert a == b
    assert a.within_bound
    assert abs(a.est_jaccard - a.exact_jaccard) <= 0.2


def test_label_feature_anova_matches_numpy(spark):
    """The quantized-mean ANOVA tracks the float reference within the
    quantization error, and the sums of squares are nonnegative."""
    import numpy as np

    from certified_dogs_and_cats_spark.queries.advanced import (
        label_feature_anova,
    )

    row = label_feature_anova(spark, SF).collect()[0]
    assert row.ss_between >= 0 and row.ss_within >= 0
    vecs = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    by_label: dict[int, list[float]] = {}
    for r in vecs:
        by_label.setdefault(r.label, []).append(float(r.embedding[0]))
    k = len(by_label)
    n = sum(len(v) for v in by_label.values())
    grand = sum(sum(v) for v in by_label.values()) / n
    ssb = sum(len(v) * (np.mean(v) - grand) ** 2 for v in by_label.values())
    ssw = sum(
        sum((x - np.mean(v)) ** 2 for x in v) for v in by_label.values()
    )
    f_ref = (ssb / (k - 1)) / (ssw / (n - k))
    assert row.n_labels == k and row.n_vectors == n
    assert row.ss_between == pytest.approx(ssb, rel=1e-3, abs=1e-6)
    assert row.ss_within == pytest.approx(ssw, rel=1e-3)
    assert row.f_stat == pytest.approx(f_ref, rel=1e-2, abs=1e-3)


def test_js_divergence_bounded_and_matches_float_reference(spark):
    """JS divergence lies in [0, ln 2] and the deterministic-series
    computation tracks a float reference within the series + quantization
    error."""
    from certified_dogs_and_cats_spark.queries.advanced import (
        token_js_divergence_by_source,
    )

    rows = {
        r.source: r
        for r in token_js_divergence_by_source(spark, SF).collect()
    }
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    counts: dict[str, dict[str, int]] = {}
    for d in docs:
        c = counts.setdefault(d.source, {})
        for tok in d.text.split(" "):
            c[tok] = c.get(tok, 0) + 1
    vocab = set().union(*counts.values())
    totals = {s: sum(c.values()) for s, c in counts.items()}
    g_tot = sum(totals.values())
    for s, row in rows.items():
        assert -1e-9 <= row.js_divergence <= math.log(2) + 1e-9
        p_tot, q_tot = totals[s], g_tot - totals[s]
        js = 0.0
        for tok in vocab:
            c = counts[s].get(tok, 0)
            d = sum(counts[o].get(tok, 0) for o in counts if o != s)
            p = c / p_tot
            q = d / q_tot
            m = (p + q) / 2
            if p > 0:
                js += 0.5 * p * math.log(p / m)
            if q > 0:
                js += 0.5 * q * math.log(q / m)
        assert row.js_divergence == pytest.approx(js, rel=1e-4, abs=1e-6)
        assert row.n_tokens == p_tot

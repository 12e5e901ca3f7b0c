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


# --- second TPC-H batch (Q5/Q6/Q10/Q12/Q13/Q15/Q19 shapes) ---------------


def _rev(price, disc):
    from decimal import Decimal

    p = Decimal(str(price)).quantize(Decimal("0.01"))
    d = Decimal(str(disc)).quantize(Decimal("0.01"))
    return p * (1 - d)


def test_local_supplier_revenue_requires_same_nation(spark):
    """Every (nation, revenue) row equals a brute recomputation that
    keeps ONLY lines whose supplier nation == customer nation inside
    ASIA — the Q5 twist the join condition must encode."""
    from certified_dogs_and_cats_spark.queries.tpch import (
        local_supplier_revenue,
    )

    got = {
        r.nation: (r.n_lines, r.revenue)
        for r in local_supplier_revenue(spark, SF).collect()
    }
    n = {
        r.n_nationkey: (r.n_name, r.n_regionkey)
        for r in spark.read.parquet(f"{SF}/nation.parquet").collect()
    }
    asia = {
        r.r_regionkey
        for r in spark.read.parquet(f"{SF}/region.parquet").collect()
        if r.r_name == "ASIA"
    }
    cust = {
        r.c_custkey: r.c_nationkey
        for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
    }
    supp = {
        r.s_suppkey: r.s_nationkey
        for r in spark.read.parquet(f"{SF}/supplier.parquet").collect()
    }
    orders = {
        r.o_orderkey: r.o_custkey
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect()
        if "1996-01-01" <= str(r.o_orderdate) < "1997-01-01"
    }
    exp: dict[str, list] = {}
    for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
        ck = orders.get(r.l_orderkey)
        if ck is None:
            continue
        cn = cust[ck]
        if supp[r.l_suppkey] != cn or n[cn][1] not in asia:
            continue
        e = exp.setdefault(n[cn][0], [0, 0])
        e[0] += 1
        e[1] += _rev(r.l_extendedprice, r.l_discount)
    assert set(got) == set(exp)
    for nation, (cnt, rev) in exp.items():
        assert got[nation][0] == cnt
        assert got[nation][1] == pytest.approx(float(rev), rel=1e-12)


def test_forecast_revenue_change_matches_brute_decimal(spark):
    """The Q6 aggregate equals an exact-decimal brute sum over the raw
    rows satisfying the scan-local predicate."""
    from decimal import Decimal

    from certified_dogs_and_cats_spark.queries.tpch import (
        forecast_revenue_change,
    )

    row = forecast_revenue_change(spark, SF).collect()[0]
    n = 0
    total = Decimal(0)
    for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
        if not ("1997-01-01" <= str(r.l_shipdate) < "1998-01-01"):
            continue
        if not (0.04 <= r.l_discount <= 0.06) or not (r.l_quantity < 24):
            continue
        n += 1
        total += Decimal(str(r.l_extendedprice)).quantize(
            Decimal("0.01")
        ) * Decimal(str(r.l_discount)).quantize(Decimal("0.01"))
    assert row.n_lines == n > 0
    assert row.discount_revenue == pytest.approx(float(total), rel=1e-12)


def test_returned_item_customers_topk_is_total_ordered(spark):
    """Q10: at most 20 unique customers, ordered by (lost_revenue desc,
    custkey asc), and each row's revenue equals the brute per-customer
    returned-line sum for the quarter."""
    from certified_dogs_and_cats_spark.queries.tpch import (
        returned_item_customers,
    )

    rows = returned_item_customers(spark, SF).collect()
    assert len(rows) <= 20
    keys = [r.custkey for r in rows]
    assert len(set(keys)) == len(keys)
    for a, b in zip(rows, rows[1:]):
        assert (a.lost_revenue, -a.custkey) >= (b.lost_revenue, -b.custkey)
    orders = {
        r.o_orderkey: r.o_custkey
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect()
        if "1998-01-01" <= str(r.o_orderdate) < "1998-04-01"
    }
    exp: dict[int, object] = {}
    for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
        if r.l_returnflag != "R" or r.l_orderkey not in orders:
            continue
        ck = orders[r.l_orderkey]
        exp[ck] = exp.get(ck, 0) + _rev(r.l_extendedprice, r.l_discount)
    for r in rows:
        assert r.lost_revenue == pytest.approx(
            float(exp[r.custkey]), rel=1e-12
        )
    # the cutoff is correct: nothing omitted beats the last returned row
    if len(rows) == 20:
        floor = (rows[-1].lost_revenue, -rows[-1].custkey)
        for ck, rev in exp.items():
            if ck not in set(keys):
                assert (float(rev), -ck) <= floor


def test_late_shipment_priority_mix_partition_counts(spark):
    """Q12 adaptation: per linestatus, high+low == total late lines and
    the high bucket counts exactly the URGENT/HIGH orders' lines."""
    from certified_dogs_and_cats_spark.queries.tpch import (
        late_shipment_priority_mix,
    )

    got = {
        r.linestatus: (r.high_line_count, r.low_line_count)
        for r in late_shipment_priority_mix(spark, SF).collect()
    }
    import datetime

    orders = {
        r.o_orderkey: (r.o_orderdate, r.o_orderpriority)
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect()
    }
    exp: dict[str, list] = {}
    for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
        if not ("1998-01-01" <= str(r.l_shipdate) < "1999-01-01"):
            continue
        odate, prio = orders[r.l_orderkey]
        if r.l_shipdate < odate + datetime.timedelta(days=60):
            continue
        e = exp.setdefault(r.l_linestatus, [0, 0])
        e[prio not in ("1-URGENT", "2-HIGH")] += 1
    assert got == {k: tuple(v) for k, v in exp.items()}
    assert sum(h + lo for h, lo in got.values()) > 0


def test_customer_order_count_distribution_conserves_mass(spark):
    """Q13: the histogram's customer mass equals the customer table and
    its order mass equals the qualifying-order count — the two identities
    a broken LEFT OUTER (dropped 0-bucket / duplicated matches) breaks."""
    from certified_dogs_and_cats_spark.queries.tpch import (
        customer_order_count_distribution,
    )

    rows = customer_order_count_distribution(spark, SF).collect()
    n_cust = spark.read.parquet(f"{SF}/customer.parquet").count()
    qualifying = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .count()
    )
    assert sum(r.n_customers for r in rows) == n_cust
    assert sum(r.n_orders * r.n_customers for r in rows) == qualifying


def test_top_quarter_supplier_returns_every_tie(spark):
    """Q15: the result is EXACTLY the argmax set of the brute
    per-supplier quarter revenue (every tie present, nothing else)."""
    from certified_dogs_and_cats_spark.queries.tpch import (
        top_quarter_supplier,
    )

    rows = top_quarter_supplier(spark, SF).collect()
    exp: dict[int, object] = {}
    for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
        if not ("1997-01-01" <= str(r.l_shipdate) < "1997-04-01"):
            continue
        exp[r.l_suppkey] = exp.get(r.l_suppkey, 0) + _rev(
            r.l_extendedprice, r.l_discount
        )
    mx = max(exp.values())
    winners = {k for k, v in exp.items() if v == mx}
    assert {r.suppkey for r in rows} == winners
    for r in rows:
        assert r.total_rev == pytest.approx(float(mx), rel=1e-12)


def test_brand_size_band_revenue_matches_brute_disjunction(spark):
    """Q19: the aggregate equals a brute evaluation of the full
    OR-of-conjunctions on raw rows (so Catalyst's factoring of the
    pushable envelope changed the PLAN, not the predicate)."""
    from certified_dogs_and_cats_spark.queries.tpch import (
        brand_size_band_revenue,
    )

    row = brand_size_band_revenue(spark, SF).collect()[0]
    part = {
        r.p_partkey: (r.p_brand, r.p_size)
        for r in spark.read.parquet(f"{SF}/part.parquet").collect()
    }
    n = 0
    total = 0
    for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
        brand, size = part[r.l_partkey]
        q = r.l_quantity
        if (
            (brand == "Brand#12" and 1 <= size <= 5 and 1 <= q <= 11)
            or (brand == "Brand#23" and 1 <= size <= 10 and 10 <= q <= 20)
            or (brand == "Brand#3" and 1 <= size <= 15 and 20 <= q <= 30)
        ):
            n += 1
            total += _rev(r.l_extendedprice, r.l_discount)
    assert row.n_lines == n > 0
    assert row.revenue == pytest.approx(float(total), rel=1e-12)


# --- first TPC-H batch, brute-force properties (Q3/Q8/Q14/Q17/Q18/Q22) ---


def test_top_unshipped_orders_cutoff_and_values(spark):
    """Q3: every returned order's revenue equals the brute sum of its
    qualifying lines, and no omitted qualifying order beats the cutoff
    under the total (revenue, orderdate, orderkey) order."""
    from certified_dogs_and_cats_spark.queries.tpch import (
        top_unshipped_orders,
    )

    rows = top_unshipped_orders(spark, SF).collect()
    assert len(rows) <= 10
    orders = {
        r.o_orderkey: (r.o_orderdate, r.o_custkey)
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect()
        if str(r.o_orderdate) < "1997-01-01"
    }
    building = {
        r.c_custkey
        for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
        if r.c_mktsegment == "BUILDING"
    }
    exp: dict[int, object] = {}
    for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
        if str(r.l_shipdate) <= "1997-01-01 00:00:00":
            continue
        od = orders.get(r.l_orderkey)
        if od is None or od[1] not in building:
            continue
        exp[r.l_orderkey] = exp.get(r.l_orderkey, 0) + _rev(
            r.l_extendedprice, r.l_discount
        )
    for r in rows:
        assert r.revenue == pytest.approx(float(exp[r.orderkey]), rel=1e-12)
    if len(rows) == 10:
        kept = {r.orderkey for r in rows}
        last = rows[-1]
        floor = (last.revenue, str(last.orderdate), last.orderkey)
        for ok, rev in exp.items():
            if ok not in kept:
                od = str(orders[ok][0])[:10]
                # omitted must NOT sort strictly before the cutoff row
                # under (revenue DESC, orderdate ASC, orderkey ASC)
                beats_cutoff = float(rev) > floor[0] or (
                    float(rev) == floor[0]
                    and (od, ok) < (str(floor[1]), floor[2])
                )
                assert not beats_cutoff, (ok, rev, floor)


def test_market_share_is_a_share(spark):
    """Q8: 0 <= share <= 1 per year, and the numerator/denominator
    reconstruction from raw rows matches total_volume."""
    from certified_dogs_and_cats_spark.queries.tpch import (
        market_share_by_year,
    )

    rows = market_share_by_year(spark, SF).collect()
    assert rows, "EUROPE volume exists in the fixture"
    nat = {
        r.n_nationkey: (r.n_name, r.n_regionkey)
        for r in spark.read.parquet(f"{SF}/nation.parquet").collect()
    }
    europe = {
        r.r_regionkey
        for r in spark.read.parquet(f"{SF}/region.parquet").collect()
        if r.r_name == "EUROPE"
    }
    cust = {
        r.c_custkey: r.c_nationkey
        for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
    }
    supp = {
        r.s_suppkey: r.s_nationkey
        for r in spark.read.parquet(f"{SF}/supplier.parquet").collect()
    }
    orders = {
        r.o_orderkey: (int(str(r.o_orderdate)[:4]), r.o_custkey)
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect()
    }
    tot: dict[int, object] = {}
    num: dict[int, object] = {}
    for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
        year, ck = orders[r.l_orderkey]
        if nat[cust[ck]][1] not in europe:
            continue
        v = _rev(r.l_extendedprice, r.l_discount)
        tot[year] = tot.get(year, 0) + v
        if nat[supp[r.l_suppkey]][0] == "NATION_3":
            num[year] = num.get(year, 0) + v
    assert {r.o_year for r in rows} == set(tot)
    for r in rows:
        assert 0.0 <= r.mkt_share <= 1.0
        assert r.total_volume == pytest.approx(
            float(tot[r.o_year]), rel=1e-12
        )
        share = float(num.get(r.o_year, 0)) / float(tot[r.o_year])
        assert r.mkt_share == pytest.approx(round(share, 6), abs=5e-7)


def test_promo_revenue_share_bounds_and_brute(spark):
    """Q14: the percent is in [0, 100] and matches the brute promo/total
    split for the month."""
    from certified_dogs_and_cats_spark.queries.tpch import (
        promo_revenue_share,
    )

    row = promo_revenue_share(spark, SF).collect()[0]
    part = {
        r.p_partkey: r.p_type
        for r in spark.read.parquet(f"{SF}/part.parquet").collect()
    }
    n = 0
    promo = 0
    total = 0
    for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
        if not ("1998-03-01" <= str(r.l_shipdate) < "1998-04-01"):
            continue
        n += 1
        v = _rev(r.l_extendedprice, r.l_discount)
        total += v
        if part[r.l_partkey] == "PROMO":
            promo += v
    assert row.n_lines == n > 0
    assert 0.0 <= row.promo_pct <= 100.0
    assert row.promo_pct == pytest.approx(
        round(100.0 * float(promo) / float(total), 6), abs=5e-7
    )


def test_small_quantity_revenue_threshold_semantics(spark):
    """Q17: counted lines are exactly those below 80% of their part's
    average quantity, within the two target brands."""
    from certified_dogs_and_cats_spark.queries.tpch import (
        small_quantity_revenue,
    )

    got = {
        r.brand: (r.n_lines, r.revenue)
        for r in small_quantity_revenue(spark, SF).collect()
    }
    part = {
        r.p_partkey: r.p_brand
        for r in spark.read.parquet(f"{SF}/part.parquet").collect()
    }
    lines = spark.read.parquet(f"{SF}/lineitem.parquet").collect()
    qsum: dict[int, list] = {}
    for r in lines:
        e = qsum.setdefault(r.l_partkey, [0, 0])
        e[0] += float(r.l_quantity)
        e[1] += 1
    from decimal import Decimal

    exp: dict[str, list] = {}
    for r in lines:
        brand = part[r.l_partkey]
        if brand not in ("Brand#3", "Brand#4"):
            continue
        s, c = qsum[r.l_partkey]
        if float(r.l_quantity) < 0.8 * (s / c):
            e = exp.setdefault(brand, [0, Decimal(0)])
            e[0] += 1
            e[1] += Decimal(str(r.l_extendedprice)).quantize(
                Decimal("0.01")
            )
    assert set(got) == set(exp)
    for brand, (cnt, rev) in exp.items():
        assert got[brand][0] == cnt
        assert got[brand][1] == pytest.approx(float(rev), rel=1e-12)


def test_large_volume_customers_have_threshold_quantity(spark):
    """Q18: exactly the orders whose total quantity exceeds 250 qualify,
    and the returned top-20 total_qty values match brute sums."""
    from certified_dogs_and_cats_spark.queries.tpch import (
        large_volume_customers,
    )

    rows = large_volume_customers(spark, SF).collect()
    qty: dict[int, float] = {}
    for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
        qty[r.l_orderkey] = qty.get(r.l_orderkey, 0.0) + float(r.l_quantity)
    qualifying = {k: v for k, v in qty.items() if v > 250}
    assert len(rows) == min(20, len(qualifying))
    for r in rows:
        assert r.total_qty == pytest.approx(qualifying[r.orderkey])
    top = sorted(qualifying.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [r.orderkey for r in rows] == [k for k, _ in top[: len(rows)]]


def test_idle_rich_customers_partition(spark):
    """Q22: counted customers are above the positive-balance average AND
    have no orders on/after the cutoff — reconstructed exactly."""
    from certified_dogs_and_cats_spark.queries.tpch import (
        idle_rich_customers,
    )

    got = {
        r.segment: (r.n_customers, r.total_acctbal)
        for r in idle_rich_customers(spark, SF).collect()
    }
    cust = spark.read.parquet(f"{SF}/customer.parquet").collect()
    pos = [c.c_acctbal for c in cust if c.c_acctbal > 0]
    avg = sum(pos) / len(pos)
    recent = {
        r.o_custkey
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect()
        if str(r.o_orderdate) >= "2000-08-01"
    }
    from decimal import Decimal

    exp: dict[str, list] = {}
    for c in cust:
        if c.c_acctbal > avg and c.c_custkey not in recent:
            e = exp.setdefault(c.c_mktsegment, [0, Decimal(0)])
            e[0] += 1
            e[1] += Decimal(str(c.c_acctbal)).quantize(Decimal("0.01"))
    assert set(got) == set(exp)
    for seg, (cnt, bal) in exp.items():
        assert got[seg][0] == cnt
        assert got[seg][1] == pytest.approx(float(bal), rel=1e-12)


def test_tpch_suite_is_partition_layout_independent(spark):
    """Every TPC-H-shape query returns IDENTICAL rows at different
    shuffle-partition settings — the guarantee that the exact-DECIMAL
    money idiom and total top-k orderings exist to provide (a
    partitioning-dependent result would be nondeterministic on a real
    cluster where layout is not chosen by the query)."""
    from certified_dogs_and_cats_spark.queries import tpch

    names = [
        "top_unshipped_orders",
        "market_share_by_year",
        "promo_revenue_share",
        "small_quantity_revenue",
        "large_volume_customers",
        "supplier_return_blame",
        "idle_rich_customers",
        "local_supplier_revenue",
        "forecast_revenue_change",
        "returned_item_customers",
        "late_shipment_priority_mix",
        "customer_order_count_distribution",
        "top_quarter_supplier",
        "brand_size_band_revenue",
    ]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for parts in ("2", "17"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            for n in names:
                rows = getattr(tpch, n)(spark, SF).collect()
                # ordered queries compare as sequences, the rest as sets
                key = (
                    list
                    if n in ("top_unshipped_orders", "returned_item_customers",
                             "large_volume_customers")
                    else sorted
                )
                results.setdefault(n, []).append(key(map(tuple, rows)))
        for n, (a, b) in results.items():
            assert a == b, f"{n} depends on partition layout"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


# --- OLAP/sketch round-9 additions: brute-force semantic properties -----


def test_running_distinct_users_is_true_cumulative_distinct(spark):
    """Each hour's cum_users equals |distinct users seen up to that
    hour| — the quantity the linear first-seen form claims to equal —
    and the curve is monotone, ending at the total distinct count."""
    from certified_dogs_and_cats_spark.queries.advanced import (
        running_distinct_users,
    )

    rows = sorted(
        running_distinct_users(spark, SF).collect(), key=lambda r: r.hour
    )
    events = spark.read.parquet(f"{SF}/events.parquet").collect()
    import datetime

    def hour(ts):
        return ts.replace(minute=0, second=0, microsecond=0)

    for r in rows:
        seen = {e.user_id for e in events if hour(e.ts) <= r.hour}
        assert r.cum_users == len(seen), r.hour
    cums = [r.cum_users for r in rows]
    assert cums == sorted(cums)
    assert cums[-1] == len({e.user_id for e in events})


def test_winsorized_mean_bounds_and_robustness(spark):
    """The winsorized mean lies within [p05, p95], the bounds are real
    in-group prices at the DISC ranks, and the mean equals a brute clamp
    over raw prices."""
    from certified_dogs_and_cats_spark.queries.advanced import (
        winsorized_mean_prices,
    )

    import math
    from decimal import Decimal

    got = {r.brand: r for r in winsorized_mean_prices(spark, SF).collect()}
    parts: dict[str, list] = {}
    for p in spark.read.parquet(f"{SF}/part.parquet").collect():
        parts.setdefault(p.p_brand, []).append(
            (p.p_retailprice, p.p_partkey)
        )
    assert set(got) == set(parts)
    for brand, rows in parts.items():
        rows.sort()
        n = len(rows)
        lo = rows[max(1, math.ceil(n * 0.05)) - 1][0]
        hi = rows[math.ceil(n * 0.95) - 1][0]
        r = got[brand]
        assert (r.p05, r.p95, r.n_parts) == (lo, hi, n)
        clamped = sum(
            Decimal(str(min(max(price, lo), hi))).quantize(Decimal("0.01"))
            for price, _ in rows
        )
        assert r.winsorized_mean == pytest.approx(
            round(float(clamped) / n, 6), abs=5e-7
        )
        assert lo <= r.winsorized_mean <= hi


def test_mode_order_priority_is_the_argmax(spark):
    """Each segment's modal priority has the strictly-highest count (or
    wins the pinned priority-ascending tiebreak), with the exact share."""
    from certified_dogs_and_cats_spark.queries.advanced import (
        mode_order_priority,
    )

    got = {r.segment: r for r in mode_order_priority(spark, SF).collect()}
    cust = {
        c.c_custkey: c.c_mktsegment
        for c in spark.read.parquet(f"{SF}/customer.parquet").collect()
    }
    counts: dict[str, dict[str, int]] = {}
    for o in spark.read.parquet(f"{SF}/orders.parquet").collect():
        seg = cust[o.o_custkey]
        d = counts.setdefault(seg, {})
        d[o.o_orderpriority] = d.get(o.o_orderpriority, 0) + 1
    assert set(got) == set(counts)
    for seg, d in counts.items():
        winner = min(d.items(), key=lambda kv: (-kv[1], kv[0]))
        r = got[seg]
        assert (r.modal_priority, r.n_orders) == winner
        assert r.share == pytest.approx(
            round(winner[1] / sum(d.values()), 6), abs=5e-7
        )


def test_spend_gini_bounds_and_formula(spark):
    """Gini lies in [0, 1) and equals the rank formula over brute
    per-customer spends; a constant-spend segment would read 0."""
    from certified_dogs_and_cats_spark.queries.advanced import (
        spend_gini_by_segment,
    )

    from decimal import Decimal

    got = {r.segment: r for r in spend_gini_by_segment(spark, SF).collect()}
    cust = {
        c.c_custkey: c.c_mktsegment
        for c in spark.read.parquet(f"{SF}/customer.parquet").collect()
    }
    spend: dict[str, dict[int, Decimal]] = {}
    for o in spark.read.parquet(f"{SF}/orders.parquet").collect():
        seg = cust[o.o_custkey]
        d = spend.setdefault(seg, {})
        d[o.o_custkey] = d.get(o.o_custkey, Decimal(0)) + Decimal(
            str(o.o_totalprice)
        ).quantize(Decimal("0.01"))
    for seg, d in spend.items():
        xs = sorted((v, k) for k, v in d.items())
        n = len(xs)
        tot = sum(v for v, _ in xs)
        acc = sum((i + 1) * v for i, (v, _) in enumerate(xs))
        gini = 2.0 * float(acc) / (n * float(tot)) - (n + 1.0) / n
        r = got[seg]
        assert 0.0 <= r.gini < 1.0
        assert r.gini == pytest.approx(round(gini, 6), abs=5e-7)
        assert r.n_customers == n
        assert r.total_spend == pytest.approx(float(tot), rel=1e-12)


def test_second_max_price_gap_semantics(spark):
    """top_price is the true brand max, runner_up the max strictly
    below it, and only brands with two distinct prices appear."""
    from certified_dogs_and_cats_spark.queries.advanced import (
        second_max_price_gap,
    )

    got = {r.brand: r for r in second_max_price_gap(spark, SF).collect()}
    prices: dict[str, list] = {}
    for p in spark.read.parquet(f"{SF}/part.parquet").collect():
        prices.setdefault(p.p_brand, []).append(p.p_retailprice)
    for brand, ps in prices.items():
        top = max(ps)
        below = [x for x in ps if x < top]
        if not below:
            assert brand not in got
            continue
        r = got[brand]
        assert (r.top_price, r.runner_up) == (top, max(below))
        assert float(r.gap) == pytest.approx(
            round(top - max(below), 2), abs=5e-3
        )


def test_simhash_histogram_pigeonhole_is_lossless(spark):
    """The UNBUDGETED band join equals a BRUTE all-pairs hamming
    histogram over the package's own signatures for every distance <= 3
    — the 4-band pigeonhole guarantee (a pair within 3 flips shares
    >= 1 of 4 bands) measured, not assumed. The REGISTERED query runs
    under the adaptive incidence budget (round 12), which DROPS
    boilerplate-hot band buckets on this dense sf0.001 fixture — lossy
    by design and replayed in its oracle — so it is asserted separately
    as a pointwise lower bound of the lossless histogram."""
    import pyspark.sql.functions as F

    from certified_dogs_and_cats_spark.extensions.dedup import (
        simhash64_text,
        simhash_near_dup_pairs,
    )
    from certified_dogs_and_cats_spark.queries.advanced import (
        simhash_hamming_histogram,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sig = simhash64_text(docs, "doc_id", "text")
    lossless = {
        r.hamming: r.n_pairs
        for r in simhash_near_dup_pairs(sig, "doc_id")
        .groupBy("hamming")
        .agg(F.count("*").alias("n_pairs"))
        .collect()
    }
    sigs = [int(r.simhash, 16) for r in sig.collect()]
    brute: dict[int, int] = {}
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            h = bin(sigs[i] ^ sigs[j]).count("1")
            if h <= 3:
                brute[h] = brute.get(h, 0) + 1
    assert lossless == brute
    budgeted = {
        r.hamming: r.n_pairs
        for r in simhash_hamming_histogram(spark, SF).collect()
    }
    assert set(budgeted) <= set(brute)
    for h, n in budgeted.items():
        assert 0 < n <= brute[h]

"""Round-9 tail: the remaining classic TPC-H query shapes expressible on
the fixture schema (no partsupp table, so Q2/Q11/Q16/Q20 are out of
scope): shipping-priority top-k (Q3), market share (Q8), promo revenue
(Q14), small-quantity revenue (Q17), large-volume customers (Q18),
sole-blame supplier attribution (Q21, reformulated as one aggregation),
and idle rich customers (Q22); second batch completes the partsupp-free
suite — local-supplier volume (Q5 with the supplier-nation =
customer-nation twist), forecast revenue change (Q6), returned-item
reporting (Q10), late-shipment priority mix (Q12, adapted: the fixture
has no shipmode/receiptdate, so "late" is shipdate 60+ days after the
order date), customer order-count distribution (Q13), top supplier for
a quarter (Q15), and disjunctive brand/size/quantity revenue (Q19).
Each is the canonical warehouse formulation with the repo's
cross-engine determinism conventions: money through the exact
DECIMAL-product/DECIMAL-sum idiom (order-independent at any
partitioning — the property a 1000-executor run needs), top-k under
TOTAL orderings (unique key last), scalar thresholds computed as one
identical IEEE expression on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import t
from .registry import query

#: Exact decimal revenue term: extendedprice * (1 - discount), computed
#: in DECIMAL so the group sum is associative (see nation_pair_trade_flows).
_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"


def _rev_col() -> F.Column:
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )


@query(
    "top_unshipped_orders",
    oracle=f"""
    SELECT l.l_orderkey AS orderkey,
           CAST(sum({_REV}) AS DOUBLE) AS revenue,
           CAST(o.o_orderdate AS DATE) AS orderdate,
           o.o_orderpriority AS priority
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < DATE '1997-01-01'
      AND l.l_shipdate > TIMESTAMP '1997-01-01'
    GROUP BY 1, 3, 4
    ORDER BY revenue DESC, orderdate ASC, orderkey ASC
    LIMIT 10
    """,
)
def top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority report (TPC-H Q3 shape): the 10 highest-value
    orders placed before a date whose goods had not shipped by it, for
    one market segment. Scale posture: both selective filters sit on the
    fact scans (PushedFilters on o_orderdate and l_shipdate), the
    customer join only carries the segment predicate, and the top-10
    runs as a TakeOrdered over the aggregated (already small) result —
    the ordering is total (revenue, date, unique orderkey) so the limit
    is deterministic on any partitioning."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (
        l.filter(F.col("l_shipdate") > F.lit("1997-01-01"))
        .join(
            o.filter(F.col("o_orderdate") < F.lit("1997-01-01")),
            l.l_orderkey == o.o_orderkey,
        )
        .join(
            c.filter(F.col("c_mktsegment") == "BUILDING"),
            o.o_custkey == c.c_custkey,
        )
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.col("o_orderdate").cast("date").alias("orderdate"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.sum(_rev_col()).cast("double").alias("revenue"))
        .select("orderkey", "revenue", "orderdate", "priority")
        .orderBy(
            F.col("revenue").desc(),
            F.col("orderdate").asc(),
            F.col("orderkey").asc(),
        )
        .limit(10)
    )


@query(
    "market_share_by_year",
    oracle=f"""
    WITH vol AS (
      SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             sn.n_name AS supp_nation,
             {_REV} AS v
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      JOIN region r ON cn.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    )
    SELECT o_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_3'
                               THEN v ELSE CAST(0 AS DECIMAL(18,2)) END)
                      AS DOUBLE)
                 / CAST(sum(v) AS DOUBLE), 6) AS mkt_share,
           CAST(sum(v) AS DOUBLE) AS total_volume
    FROM vol GROUP BY 1
    """,
)
def market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (TPC-H Q8 shape): NATION_3 suppliers' share
    of revenue from EUROPE customers, per order year. Scale posture:
    nation and region broadcast (two nation roles, like Q7); the share
    is a conditional-sum ratio over ONE aggregate — never two scans; the
    numerator/denominator are exact DECIMAL sums and the share is a
    single rounded IEEE division, identical on both engines."""
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    sn = F.broadcast(
        n.select(
            F.col("n_nationkey").alias("sn_key"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    cn = F.broadcast(
        n.join(
            r.filter(F.col("r_name") == "EUROPE"),
            n.n_regionkey == r.r_regionkey,
        ).select(F.col("n_nationkey").alias("cn_key"))
    )
    vol = (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(sn, F.col("s_nationkey") == F.col("sn_key"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(cn, F.col("c_nationkey") == F.col("cn_key"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            "supp_nation",
            _rev_col().alias("v"),
        )
    )
    zero = F.lit(0).cast("decimal(18,2)")
    return vol.groupBy("o_year").agg(
        F.round(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", F.col("v"))
                .otherwise(zero)
            ).cast("double")
            / F.sum("v").cast("double"),
            6,
        ).alias("mkt_share"),
        F.sum("v").cast("double").alias("total_volume"),
    )


@query(
    "promo_revenue_share",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
           round(100e0
                 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                                 THEN {_REV}
                                 ELSE CAST(0 AS DECIMAL(18,2)) END)
                        AS DOUBLE)
                 / CAST(sum({_REV}) AS DOUBLE), 6) AS promo_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1998-03-01'
      AND l.l_shipdate < TIMESTAMP '1998-04-01'
    """,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion effect (TPC-H Q14 shape): percent of one month's
    revenue from promo-type parts. Scale posture: the month predicate
    pushes to the lineitem scan, part joins broadcast-or-shuffle as AQE
    sizes it, and the percent is one conditional-sum ratio — exact
    DECIMAL sums, one rounded IEEE expression."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1998-03-01"))
            & (F.col("l_shipdate") < F.lit("1998-04-01"))
        )
        .join(p, l.l_partkey == p.p_partkey)
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.round(
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", _rev_col())
                    .otherwise(zero)
                ).cast("double")
                / F.sum(_rev_col()).cast("double"),
                6,
            ).alias("promo_pct"),
        )
    )


@query(
    "small_quantity_revenue",
    oracle="""
    WITH pavg AS (
      SELECT l_partkey,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS avg_qty
      FROM lineitem GROUP BY 1
    )
    SELECT p.p_brand AS brand,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN pavg ON pavg.l_partkey = l.l_partkey
    WHERE p.p_brand IN ('Brand#3', 'Brand#4')
      AND CAST(l.l_quantity AS DOUBLE) < 8e-1 * pavg.avg_qty
    GROUP BY 1
    """,
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17 shape): revenue from
    lines whose quantity is below 80% of that part's average — the
    per-group-average correlated subquery, decorrelated into one
    aggregate + re-join (what every planner rewrites Q17 into). Scale
    posture: the per-part average is one hash aggregate on the join key
    (no window over raw lines), the threshold is a single IEEE
    expression (exact DECIMAL sum / count, one multiply) computed
    identically on both engines, and the brand filter prunes the part
    side before the join."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#3", "Brand#4")
    )
    pavg = l.groupBy("l_partkey").agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
            / F.count("*").cast("double")
        ).alias("avg_qty")
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(pavg.withColumnRenamed("l_partkey", "pk"), F.col("l_partkey") == F.col("pk"))
        .filter(
            F.col("l_quantity").cast("double")
            < F.lit(0.8) * F.col("avg_qty")
        )
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


@query(
    "large_volume_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS total_qty
      FROM lineitem GROUP BY 1
      HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 250
    )
    SELECT c.c_name AS c_name, o.o_orderkey AS orderkey,
           CAST(o.o_orderdate AS DATE) AS orderdate,
           o.o_totalprice AS totalprice, big.total_qty AS total_qty
    FROM big
    JOIN orders o ON big.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY total_qty DESC, orderkey ASC
    LIMIT 20
    """,
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers (TPC-H Q18 shape): orders whose total
    quantity exceeds a threshold, with their customers — the
    HAVING-on-aggregate semi-join. Scale posture: the quantity rollup is
    one hash aggregate on the fact's own key (map-side partials), the
    HAVING prunes before any dimension joins, the threshold comparison
    is exact DECIMAL, and the top-20 ordering is total (qty, unique
    orderkey)."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q")
        )
        .filter(F.col("q") > 250)
        .select("l_orderkey", F.col("q").cast("double").alias("total_qty"))
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").cast("date").alias("orderdate"),
            F.col("o_totalprice").alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.col("total_qty").desc(), F.col("orderkey").asc())
        .limit(20)
    )


@query(
    "supplier_return_blame",
    oracle="""
    WITH per_os AS (
      SELECT l_orderkey, l_suppkey,
             max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_r
      FROM lineitem GROUP BY 1, 2
    ),
    blamed AS (
      SELECT l_orderkey,
             max(CASE WHEN has_r = 1 THEN l_suppkey END) AS suppkey
      FROM per_os GROUP BY 1
      HAVING count(*) > 1 AND sum(has_r) = 1
    )
    SELECT s.s_name AS s_name,
           CAST(count(*) AS BIGINT) AS blame_count
    FROM blamed b JOIN supplier s ON b.suppkey = s.s_suppkey
    GROUP BY 1
    """,
)
def supplier_return_blame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sole-blame supplier attribution (TPC-H Q21 shape, adapted to the
    fixture's return flags): on multi-supplier orders where EXACTLY ONE
    supplier's lines were returned, blame that supplier; count blames
    per supplier. The textbook formulation is EXISTS + NOT EXISTS over
    correlated lineitem pairs; the scalable Spark form is two hash
    aggregates — per (order, supplier) then per order — never a
    self-join. The fact is repartitioned ONCE by l_orderkey: hash
    clustering on the prefix key satisfies BOTH aggregates' required
    distributions, so the narrow 3-column projection crosses the wire
    exactly once and the second aggregate runs exchange-free (the
    round-9 two-exchange form shuffled the per-(order,supplier)
    partials AGAIN keyed by order, with partial-combine duplication
    that floated with AQE's coalesce count — the 15.4x SHUFFLE flag)."""
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    per_os = (
        l.select("l_orderkey", "l_suppkey", "l_returnflag")
        .repartition(F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("has_r")
        )
    )
    blamed = (
        per_os.groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_supp"),
            F.sum("has_r").alias("n_r"),
            F.max(
                F.when(F.col("has_r") == 1, F.col("l_suppkey"))
            ).alias("suppkey"),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_r") == 1))
    )
    return (
        blamed.join(s, blamed.suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").cast("bigint").alias("blame_count"))
    )


@query(
    "idle_rich_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS a
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_mktsegment AS segment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS total_acctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-08-01')
    GROUP BY 1
    """,
)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idle rich customers (TPC-H Q22 shape): above-average-balance
    customers with no orders in the final year of history — the
    scalar-subquery threshold + NOT EXISTS anti-join. Scale posture: the global average is one
    aggregate broadcast as a 1x1 cross join (exact DECIMAL sum / count,
    one IEEE division identical on both engines); the NOT EXISTS is a
    LEFT ANTI join on the customer key; the final rollup is segments."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                .cast("double")
                / F.count("*").cast("double")
            ).alias("a")
        )
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(
            o.filter(
                F.col("o_orderdate") >= F.lit("2000-08-01")
            ).select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_acctbal"),
        )
    )


@query(
    "local_supplier_revenue",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum({_REV}) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
)
def local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local supplier volume (TPC-H Q5 proper): revenue per nation from
    lines where the SUPPLIER sits in the customer's own nation — the Q5
    twist regional_revenue_5way (queries/core.py) deliberately omits.
    The nation-equality is part of the lineitem-supplier join condition,
    not a post-filter, so the join output never widens past qualifying
    lines. Scale posture: the year predicate pushes to the orders scan;
    nation x region prune to one region BEFORE touching facts (the
    pruned nation list broadcasts into the customer join); supplier is
    the smallest fact and broadcast-or-shuffles as AQE sizes it; money
    is the exact DECIMAL idiom."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    asia_nations = F.broadcast(
        n.join(
            r.filter(F.col("r_name") == "ASIA"),
            n.n_regionkey == r.r_regionkey,
        ).select("n_nationkey", F.col("n_name").alias("nation"))
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(asia_nations, c.c_nationkey == F.col("n_nationkey"))
        .join(
            s,
            (l.l_suppkey == s.s_suppkey)
            & (s.s_nationkey == c.c_nationkey),
        )
        .groupBy("nation")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum(_rev_col()).cast("double").alias("revenue"),
        )
    )


@query(
    "forecast_revenue_change",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
             AS discount_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount >= 0.04 AND l_discount <= 0.06
      AND l_quantity < 24
    """,
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecasting revenue change (TPC-H Q6 shape): the revenue that
    would have been kept had discounts in a band been eliminated for one
    ship year. Scale posture: the whole predicate — year range, discount
    band, quantity cap — is scan-local and pushes to the parquet reader
    (PushedFilters on all three columns); no join, no shuffle beyond the
    single-row final aggregate; the discount product is exact DECIMAL so
    the sum is associative on any partitioning."""
    l = t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_discount").cast("decimal(18,2)")
            )
            .cast("double")
            .alias("discount_revenue"),
        )
    )


@query(
    "returned_item_customers",
    oracle=f"""
    SELECT c.c_custkey AS custkey, c.c_name AS c_name,
           n.n_name AS nation, c.c_acctbal AS acctbal,
           CAST(sum({_REV}) AS DOUBLE) AS lost_revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1998-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-04-01'
    GROUP BY 1, 2, 3, 4
    ORDER BY lost_revenue DESC, custkey ASC
    LIMIT 20
    """,
)
def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting (TPC-H Q10 shape): the 20 customers who
    returned the most revenue in one quarter. Scale posture: the quarter
    predicate pushes to the orders scan and the returnflag predicate to
    the lineitem scan BEFORE the fact-fact join; nation broadcasts; the
    top-20 is a TakeOrdered over the aggregated per-customer result with
    a total ordering (revenue, unique custkey)."""
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-04-01"))
    )
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("c_name"),
            F.col("n_name").alias("nation"),
            F.col("c_acctbal").alias("acctbal"),
        )
        .agg(F.sum(_rev_col()).cast("double").alias("lost_revenue"))
        .orderBy(F.col("lost_revenue").desc(), F.col("custkey").asc())
        .limit(20)
    )


@query(
    "late_shipment_priority_mix",
    oracle="""
    SELECT l.l_linestatus AS linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= o.o_orderdate + INTERVAL 60 DAY
      AND l.l_shipdate >= TIMESTAMP '1998-01-01'
      AND l.l_shipdate <  TIMESTAMP '1999-01-01'
    GROUP BY 1
    """,
)
def late_shipment_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority mix of late lines (TPC-H Q12 shape, adapted:
    the fixture has no l_shipmode/l_receiptdate, so the group key is
    l_linestatus and "late" means shipped 60+ days after the order
    date). Scale posture: the ship-year range is scan-local and pushes
    to the lineitem reader; the lateness comparison is a join-time
    predicate between the two facts' own columns (no widening); the
    priority split is the canonical pair of conditional sums in ONE
    aggregate — never two scans."""
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01"))
        & (F.col("l_shipdate") < F.lit("1999-01-01"))
    )
    o = t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(
            F.col("l_shipdate")
            >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .groupBy(F.col("l_linestatus").alias("linestatus"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1))
            .cast("bigint")
            .alias("low_line_count"),
        )
    )


@query(
    "customer_order_count_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey,
             CAST(count(o.o_orderkey) AS BIGINT) AS n_orders
      FROM customer c
      LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey
       AND o.o_orderpriority IN ('1-URGENT', '2-HIGH')
      GROUP BY 1
    )
    SELECT n_orders, CAST(count(*) AS BIGINT) AS n_customers
    FROM per_cust GROUP BY 1
    """,
)
def customer_order_count_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Customer order-count distribution (TPC-H Q13 shape): how many
    customers placed 0, 1, 2, ... qualifying orders — the LEFT OUTER
    join whose unmatched side must survive into the 0-bucket (the
    fixture gives every customer at least one order, so the qualifying
    predicate — urgent/high priority, standing in for Q13's comment
    filter — is what makes the 0-bucket real). Scale posture: the
    priority filter prunes orders BEFORE the join (pushed to the scan,
    legal because it's on the preserved-row side's input, not the outer
    result); both aggregates are hash aggregates on their own grouping
    keys; count(o_orderkey) counts matches only, exactly as the outer
    join contract requires."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(
        F.count("*").cast("bigint").alias("n_customers")
    )


@query(
    "top_quarter_supplier",
    oracle=f"""
    WITH srev AS (
      SELECT l_suppkey, sum({_REV}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY 1
    )
    SELECT s.s_suppkey AS suppkey, s.s_name AS s_name,
           CAST(srev.total_rev AS DOUBLE) AS total_rev
    FROM srev
    JOIN supplier s ON srev.l_suppkey = s.s_suppkey
    WHERE srev.total_rev = (SELECT max(total_rev) FROM srev)
    """,
)
def top_quarter_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier (TPC-H Q15 shape): the supplier(s) with the highest
    revenue for one ship quarter — the scalar-max subquery that must
    return EVERY tied supplier, not an arbitrary one. Scale posture: the
    quarter predicate pushes to the scan; per-supplier revenue is one
    hash aggregate; the max is a 1-row aggregate broadcast back as a
    cross join; the tie comparison is DECIMAL equality on the exact sums
    (bit-identical on both engines — a DOUBLE max-equality would be
    partitioning-dependent), presented as DOUBLE."""
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    s = t(spark, sf_dir, "supplier")
    srev = l.groupBy("l_suppkey").agg(
        F.sum(_rev_col()).alias("total_rev_dec")
    )
    mx = srev.agg(F.max("total_rev_dec").alias("mx"))
    return (
        srev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev_dec") == F.col("mx"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("s_name"),
            F.col("total_rev_dec").cast("double").alias("total_rev"),
        )
    )


@query(
    "brand_size_band_revenue",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum({_REV}) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
)
def brand_size_band_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue under a disjunction of brand/size/quantity
    bands (TPC-H Q19 shape) — the OR-of-conjunctions predicate planners
    must split across the two join inputs. Scale posture: Catalyst
    factors the part-only terms (brand IN (...) AND size <= 15) and the
    lineitem-only envelope (quantity BETWEEN 1 AND 30) out of the
    disjunction and pushes each to its scan, so both inputs shrink
    before the join; the full disjunction re-applies post-join; money is
    the exact DECIMAL idiom."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & sz.between(1, 5)
            & (q >= 1)
            & (q <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & sz.between(1, 10)
            & (q >= 10)
            & (q <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & sz.between(1, 15)
            & (q >= 20)
            & (q <= 30)
        )
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(band)
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum(_rev_col()).cast("double").alias("revenue"),
        )
    )

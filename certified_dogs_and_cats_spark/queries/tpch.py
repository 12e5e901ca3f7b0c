"""Round-9 tail: the remaining classic TPC-H query shapes expressible on
the fixture schema (no partsupp table, so Q2/Q11/Q16/Q20 are out of
scope): shipping-priority top-k (Q3), market share (Q8), promo revenue
(Q14), small-quantity revenue (Q17), large-volume customers (Q18),
sole-blame supplier attribution (Q21, reformulated as one aggregation),
and idle rich customers (Q22). Each is the canonical warehouse
formulation with the repo's cross-engine determinism conventions: money
through the exact DECIMAL-product/DECIMAL-sum idiom (order-independent
at any partitioning — the property a 1000-executor run needs), top-k
under TOTAL orderings (unique key last), scalar thresholds computed as
one identical IEEE expression on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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
    aggregates — per (order, supplier) then per order — with the
    exactly-one condition as plain aggregate arithmetic, so the fact
    shuffles twice on its own keys and never self-joins."""
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    per_os = l.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
        ).alias("has_r")
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

"""Core relational operators (SURVEY.md §2.2-2.8) over the driver testdata.

Each query re-expresses a reference operator shape on the TPC-H-ish tables.
Reference citations are in each docstring; oracle SQL is the DuckDB twin with
types pinned (BIGINT counts, INTEGER ranks/years, DOUBLE ratios).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import dsum, normalize_key
from ..operators.joins import dim_lookup, idempotent_new_rows, merge_upsert
from ..operators.windows import latest_per_key, top_k_per_group
from .common import t
from .registry import query


# --- A1: group-by count (reference notebooks/gold.py:33-39) -----------------
@query(
    "group_count",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS cnt
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus")
    return li.groupBy("l_returnflag", "l_linestatus").agg(F.count("*").alias("cnt"))


# --- A2/A3/A6: global health aggregate (notebooks/bronze.py:152-158) --------
@query(
    "global_health",
    oracle="""
    SELECT count(*) AS total_rows,
           count(DISTINCT l_orderkey) AS n_orders,
           count(DISTINCT l_partkey) AS n_parts,
           min(l_shipdate) AS min_ship,
           max(l_shipdate) AS max_ship
    FROM lineitem
    """,
)
def global_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_shipdate")
    return li.agg(
        F.count("*").alias("total_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )


# --- A3: count distinct per group (notebooks/bronze.py:156) -----------------
@query(
    "count_distinct_by_group",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS cnt,
           count(DISTINCT o_custkey) AS n_customers
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def count_distinct_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select("o_orderstatus", "o_custkey")
    return o.groupBy("o_orderstatus").agg(
        F.count("*").alias("cnt"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


# --- A4: distinct projection (notebooks/bronze.py:102) ----------------------
@query(
    "distinct_projection",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    return c.select("c_mktsegment", "c_nationkey").distinct()


# --- A5: conditional sum + exact money agg (notebooks/gold.py:295-296) ------
@query(
    "conditional_sum",
    oracle="""
    SELECT l_returnflag,
           count(*) AS cnt,
           CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT)
             AS discounted_cnt,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def conditional_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_discount", "l_extendedprice"
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("cnt"),
        F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0)).alias(
            "discounted_cnt"
        ),
        F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"),
    )


# --- A6: min/max freshness per group (notebooks/bronze.py:157) --------------
@query(
    "minmax_freshness",
    oracle="""
    SELECT event_type, count(*) AS cnt,
           min(CAST(ts AS TIMESTAMP)) AS first_ts,
           max(CAST(ts AS TIMESTAMP)) AS last_ts,
           min(value) AS min_value, max(value) AS max_value
    FROM events GROUP BY event_type
    """,
)
def minmax_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select("event_type", "ts", "value")
    return e.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


# --- W4: windowed share without join (notebooks/gold.py:104) ----------------
@query(
    "windowed_share",
    oracle="""
    WITH cnts AS (
      SELECT l_returnflag, l_linestatus, count(*) AS cnt
      FROM lineitem GROUP BY 1, 2
    )
    SELECT l_returnflag, l_linestatus, cnt,
           round(100.0::DOUBLE * cnt / sum(cnt) OVER (PARTITION BY l_returnflag), 2)
             AS share_pct
    FROM cnts
    """,
)
def windowed_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus")
    cnts = li.groupBy("l_returnflag", "l_linestatus").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("l_returnflag")
    return cnts.withColumn(
        "share_pct",
        F.round(F.lit(100.0) * F.col("cnt") / F.sum("cnt").over(w), 2),
    )


# --- W1: latest-record-wins window dedup (notebooks/silver.py:81-85) --------
@query(
    "window_dedup_latest",
    oracle="""
    SELECT user_id, event_id, event_type, ts, value FROM (
      SELECT user_id, event_id, event_type,
             CAST(ts AS TIMESTAMP) AS ts, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP) DESC,
                                         event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def window_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts", "value"
    )
    return latest_per_key(
        e, ["user_id"], [F.col("ts").desc(), F.col("event_id").desc()]
    )


# --- W2: top-k per group via row_number (notebooks/gold.py:56-73) -----------
@query(
    "topk_per_group",
    oracle="""
    WITH cnts AS (
      SELECT l_returnflag, l_partkey, count(*) AS cnt
      FROM lineitem GROUP BY 1, 2
    )
    SELECT l_returnflag, l_partkey, cnt, rnk FROM (
      SELECT l_returnflag, l_partkey, cnt,
             CAST(row_number() OVER (PARTITION BY l_returnflag
                                     ORDER BY cnt DESC, l_partkey ASC) AS INTEGER)
               AS rnk
      FROM cnts
    ) WHERE rnk <= 5
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select("l_returnflag", "l_partkey")
    cnts = li.groupBy("l_returnflag", "l_partkey").agg(F.count("*").alias("cnt"))
    return top_k_per_group(
        cnts,
        ["l_returnflag"],
        [F.col("cnt").desc(), F.col("l_partkey").asc()],
        k=5,
    )


# --- W3: RANK with shared ties (notebooks/gold.py:105) ----------------------
@query(
    "rank_with_ties",
    oracle="""
    WITH cnts AS (
      SELECT p_brand, p_size, count(*) AS cnt FROM part GROUP BY 1, 2
    )
    SELECT p_brand, p_size, cnt, rnk FROM (
      SELECT p_brand, p_size, cnt,
             CAST(rank() OVER (PARTITION BY p_brand ORDER BY cnt DESC) AS INTEGER)
               AS rnk
      FROM cnts
    ) WHERE rnk <= 3
    """,
)
def rank_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").select("p_brand", "p_size")
    cnts = p.groupBy("p_brand", "p_size").agg(F.count("*").alias("cnt"))
    return top_k_per_group(
        cnts, ["p_brand"], [F.col("cnt").desc()], k=3, method="rank"
    )


# --- J1: left-anti join (notebooks/bronze.py:111-112) -----------------------
@query(
    "anti_join_new_rows",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
    )
    """,
)
def anti_join_new_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    # "rows not yet in the target" — here: customers with no order since
    # 1998. The filter on the existing side is pushed below the anti join.
    c = t(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_name"), F.col("c_custkey").alias("o_custkey")
    )
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
    )
    return idempotent_new_rows(c, o, ["o_custkey"]).select("c_custkey", "c_name")


# --- J2: broadcast dim lookup w/ fallback + mapped flag (silver.py:53-68) ---
@query(
    "dim_lookup_fallback",
    oracle="""
    SELECT c.c_custkey, c.c_nationkey,
           COALESCE(r.r_name, 'UNKNOWN') AS region_name,
           r.r_regionkey IS NOT NULL AS region_mapped
    FROM customer c LEFT JOIN region r ON r.r_regionkey = c.c_nationkey
    """,
)
def dim_lookup_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        t(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .withColumn("r_regionkey", F.col("c_nationkey"))
    )
    r = t(spark, sf_dir, "region").withColumnRenamed("r_name", "region_name")
    out = dim_lookup(
        c,
        r,
        key="r_regionkey",
        value_cols=["region_name"],
        fallback={"region_name": F.lit("UNKNOWN")},
        mapped_flag="region_mapped",
    )
    return out.select("c_custkey", "c_nationkey", "region_name", "region_mapped")


# --- J3: inner equi-join on multiple keys (notebooks/gold.py:70-73) ---------
@query(
    "inner_join_multikey",
    oracle="""
    WITH a AS (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, o_orderstatus,
             count(*) AS cnt
      FROM orders GROUP BY 1, 2
    ), b AS (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, o_orderstatus,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
      FROM orders GROUP BY 1, 2
    )
    SELECT a.o_year, a.o_orderstatus, a.cnt, b.total_price
    FROM a JOIN b ON a.o_year = b.o_year AND a.o_orderstatus = b.o_orderstatus
    """,
)
def inner_join_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("o_year"), "o_orderstatus", "o_totalprice"
    )
    a = o.groupBy("o_year", "o_orderstatus").agg(F.count("*").alias("cnt"))
    b = o.groupBy("o_year", "o_orderstatus").agg(
        dsum("o_totalprice").alias("total_price")
    )
    return a.join(b, ["o_year", "o_orderstatus"], "inner").select(
        "o_year", "o_orderstatus", "cnt", "total_price"
    )


# --- J4 + A8: cross-join scalar combine (sql/breed_mapping.py:636-648) ------
@query(
    "ratio_cross_join",
    oracle="""
    WITH per AS (
      SELECT c_nationkey, count(*) AS cust_cnt FROM customer GROUP BY 1
    ), tot AS (
      SELECT count(*) AS total_cnt FROM customer
    )
    SELECT n.n_name, per.cust_cnt, tot.total_cnt,
           round(100.0::DOUBLE * per.cust_cnt / tot.total_cnt, 2) AS pct
    FROM per CROSS JOIN tot
    JOIN nation n ON n.n_nationkey = per.c_nationkey
    """,
)
def ratio_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select("c_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per = c.groupBy("c_nationkey").agg(F.count("*").alias("cust_cnt"))
    tot = c.agg(F.count("*").alias("total_cnt"))
    return (
        per.crossJoin(F.broadcast(tot))
        .join(F.broadcast(n), per.c_nationkey == n.n_nationkey, "inner")
        .withColumn(
            "pct",
            F.round(F.lit(100.0) * F.col("cust_cnt") / F.col("total_cnt"), 2),
        )
        .select("n_name", "cust_cnt", "total_cnt", "pct")
    )


# --- J5: MERGE upsert via join-rewrite (sql/breed_mapping.py:596-603) -------
@query(
    "merge_upsert_balances",
    oracle="""
    WITH tgt AS (SELECT c_custkey, c_acctbal AS bal FROM customer),
    src AS (SELECT s_suppkey + 1450 AS c_custkey, s_acctbal AS bal FROM supplier)
    SELECT COALESCE(tgt.c_custkey, src.c_custkey) AS c_custkey,
           CASE WHEN src.c_custkey IS NOT NULL THEN src.bal ELSE tgt.bal END AS bal,
           CASE WHEN src.c_custkey IS NOT NULL AND tgt.c_custkey IS NOT NULL
                  THEN 'updated'
                WHEN src.c_custkey IS NOT NULL THEN 'inserted'
                ELSE 'kept' END AS merge_action
    FROM tgt FULL OUTER JOIN src ON tgt.c_custkey = src.c_custkey
    """,
)
def merge_upsert_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    target = t(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_acctbal").alias("bal")
    )
    source = t(spark, sf_dir, "supplier").select(
        (F.col("s_suppkey") + 1450).alias("c_custkey"),
        F.col("s_acctbal").alias("bal"),
    )
    return merge_upsert(target, source, keys=["c_custkey"], update_cols=["bal"])


# --- P5/P6/§2.8 strings: normalize key, regex, substr, case -----------------
@query(
    "scalar_string_funcs",
    oracle="""
    SELECT c_custkey,
           regexp_replace(upper(trim(c_name)), '[^A-Z0-9]', '', 'g') AS name_key,
           CAST(length(c_name) AS INTEGER) AS name_len,
           substr(c_name, 1, 8) AS prefix8,
           regexp_matches(c_name, '[0-9]$') AS ends_digit,
           CASE WHEN c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
                THEN c_mktsegment ELSE 'OTHER' END AS seg_group
    FROM customer
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        normalize_key("c_name").alias("name_key"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("prefix8"),
        F.col("c_name").rlike("[0-9]$").alias("ends_digit"),
        F.when(
            F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"),
            F.col("c_mktsegment"),
        )
        .otherwise(F.lit("OTHER"))
        .alias("seg_group"),
    )


# --- §2.8 date/time: trunc, format, parse roundtrip -------------------------
@query(
    "scalar_date_funcs",
    oracle="""
    SELECT CAST(o_orderdate AS DATE) AS o_day,
           strftime(o_orderdate, '%Y-%m-%d') AS o_day_str,
           CAST(year(o_orderdate) AS INTEGER) AS o_year,
           CAST(month(o_orderdate) AS INTEGER) AS o_month,
           count(*) AS cnt
    FROM orders
    GROUP BY 1, 2, 3, 4
    """,
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select("o_orderdate")
    return (
        o.select(
            F.to_date("o_orderdate").alias("o_day"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_day_str"),
            F.year("o_orderdate").alias("o_year"),
            F.month("o_orderdate").alias("o_month"),
        )
        .groupBy("o_day", "o_day_str", "o_year", "o_month")
        .agg(F.count("*").alias("cnt"))
    )


# --- semi-structured: JSON field extraction over events.props ---------------
@query(
    "json_extract_agg",
    oracle="""
    SELECT event_type, count(*) AS cnt,
           CAST(sum(CAST(props->>'k' AS INTEGER)) AS BIGINT) AS sum_k,
           CAST(sum(CAST(props->>'k' AS INTEGER)) AS DOUBLE) / count(*) AS avg_k
    FROM events
    GROUP BY event_type
    """,
)
def json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select("event_type", "props")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.sum(k).alias("sum_k"),
        (F.sum(k).cast("double") / F.count("*")).alias("avg_k"),
    )


# --- O1/O2: global top-n via sort+limit (notebooks/gold.py:317) -------------
@query(
    "order_by_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20
    """,
)
def order_by_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    # Spark compiles orderBy+limit to TakeOrderedAndProject: per-partition
    # top-20 then a single-driver merge — no global sort at any scale.
    return o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc()).limit(20)


# --- custom operator: backward as-of join (operators/joins.py:asof_join) ----
@query(
    "asof_join_last_view",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
      FROM events WHERE event_type = 'purchase'
    ),
    v AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
      FROM events WHERE event_type = 'view'
    )
    SELECT p.event_id, p.user_id, p.ts, p.value,
           v.ts AS ts_asof, v.value AS value_asof
    FROM p ASOF LEFT JOIN v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def asof_join_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the latest view at-or-before it per user —
    union + one window pass per key (no range join), vs DuckDB ASOF JOIN.
    Timestamps are micro-truncated on BOTH sides before the comparison so
    the >= boundary agrees across engines."""
    from ..operators.joins import asof_join

    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "value"
    )
    return asof_join(
        purchases, views, on=["user_id"], value_cols=["value"]
    )


# --- custom operator: gap sessionization (operators/windows.py:sessionize) --
@query(
    "sessionize_stats",
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
    ),
    flag AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts > lag(ts) OVER w + INTERVAL 4 HOUR
                  THEN 1 ELSE 0 END AS is_new
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    s AS (
      SELECT user_id, ts, value,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS session_idx
      FROM flag
    )
    SELECT user_id, session_idx,
           min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM s GROUP BY 1, 2
    """,
)
def sessionize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(user, session) rollup under a 4-hour inactivity gap — the batch
    twin of streaming session windows; one window pass + one aggregation,
    both shuffling on user_id only."""
    from ..operators.windows import sessionize

    ev = t(spark, sf_dir, "events").select("user_id", "ts", "value")
    s = sessionize(ev, ["user_id"], "ts", gap="4 hours")
    return s.groupBy("user_id", "session_idx").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("total_value"),
    )


# --- sketches: mergeable HLL distinct-count (DataSketches) ------------------
# DuckDB's HLL implementation differs, so the raw estimate can't hash-match
# across engines. Instead the query verifies ITSELF: it emits the exact
# count plus a boolean asserting the sketch estimate lands within 5%
# relative error (HLL lgK=12 is ~1.6% typical), and the oracle reproduces
# the exact count with a literal TRUE — a real hash-compared row, not a
# rows-only check. tests/test_sketches.py additionally pins accuracy and
# sketch mergeability inside Spark.
@query(
    "sketch_distinct_users",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           TRUE AS within_rel_err
    FROM events
    GROUP BY event_type
    """,
)
def sketch_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type approximate distinct users via HLL sketches. The sketch
    column is the point at 100 TB: per-partition sketches merge (one tiny
    shuffle) and pre-aggregated sketches can be stored per day/partition
    and re-merged for any rollup without touching raw data."""
    e = t(spark, sf_dir, "events").select("event_type", "user_id")
    agg = e.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg(F.col("user_id"))).alias(
            "approx_users"
        ),
        F.count_distinct(F.col("user_id")).alias("exact_users"),
    )
    rel_err = F.abs(F.col("approx_users") - F.col("exact_users")) / F.col(
        "exact_users"
    )
    return agg.select(
        "event_type", "exact_users", (rel_err <= F.lit(0.05)).alias("within_rel_err")
    )


# --- custom operator: interval join via binning (operators/range_join.py) ---
@query(
    "interval_join_windows",
    oracle="""
    WITH w AS (
      SELECT event_id AS anchor_id,
             CAST(ts AS TIMESTAMP) - INTERVAL 10 MINUTE AS lo,
             CAST(ts AS TIMESTAMP) + INTERVAL 10 MINUTE AS hi
      FROM events WHERE event_type = 'purchase'
      ORDER BY value DESC, event_id ASC LIMIT 20
    )
    SELECT w.anchor_id, p.event_id, p.event_type
    FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
          FROM events) p
    JOIN w ON p.ts BETWEEN w.lo AND w.hi
    """,
)
def interval_join_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All events inside +/-10-minute windows around the top-20 purchases:
    bin-quantized equi-join + exact BETWEEN verify — never the O(N*M)
    nested loop a naive range predicate compiles to."""
    from ..operators.range_join import interval_join

    ev = t(spark, sf_dir, "events")
    windows = (
        ev.filter(F.col("event_type") == "purchase")
        .orderBy(F.col("value").desc(), F.col("event_id").asc())
        .limit(20)
        .select(
            F.col("event_id").alias("anchor_id"),
            (F.col("ts") - F.expr("INTERVAL 10 MINUTES")).alias("lo"),
            (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("hi"),
        )
    )
    points = ev.select("event_id", "ts", "event_type")
    return interval_join(
        points, windows, "ts", "lo", "hi", bin_width="20 minutes"
    ).select("anchor_id", "event_id", "event_type")


# --- forward as-of join (operators/joins.py:asof_join, direction=forward) ---
@query(
    "asof_join_next_purchase",
    oracle="""
    WITH v AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'view'
    ),
    p AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             max(value) AS value
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1, 2
    )
    SELECT v.event_id, v.user_id, v.ts,
           p.ts AS ts_asof, p.value AS value_asof
    FROM v ASOF LEFT JOIN p
      ON v.user_id = p.user_id AND v.ts <= p.ts
    """,
)
def asof_join_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every view, the NEXT purchase at-or-after it per user (forward
    as-of) — the same single-shuffle union+window scan as the backward
    join, over reversed time order; vs DuckDB ASOF LEFT JOIN on <=.
    Purchases are deduped to one row per (user, ts) first: as-of match on
    a timestamp with multiple rows is tie-broken by nothing in either
    engine."""
    from ..operators.joins import asof_join

    ev = t(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    return asof_join(
        views, purchases, on=["user_id"], value_cols=["value"],
        direction="forward",
    )


# --- 5-table join pipeline (TPC-H Q5 shape): the join-reorder showcase ------
@query(
    "regional_revenue_5way",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation,
           count(*) AS n_items,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY 1, 2
    """,
)
def regional_revenue_5way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per (region, nation) through a 5-table join chain — the
    TPC-H Q5 shape. Scale posture: the status filter lands on the orders
    scan (pushed); lineitem joins orders on a shuffle key; customer ALSO
    scales with the data (100M rows at warehouse scale) so it gets NO
    broadcast hint — AQE broadcasts it when it happens to fit, shuffles
    otherwise; only the genuinely constant-size dims (nation: 25 rows,
    region: 5) are hinted. Money summed exactly in DECIMAL, presented as
    DOUBLE."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_custkey")
    )
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_items"),
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"),
        )
    )


@query(
    "sketch_union_rollup",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           TRUE AS merged_within_rel_err
    FROM events GROUP BY event_type
    """,
)
def sketch_union_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level mergeable-sketch rollup — the pattern sketch_distinct_users
    points at for 100 TB, exercised end-to-end: per-(event_type, day)
    PARTIAL HLL sketches (the shape you'd persist alongside each daily
    partition) are re-merged with hll_union_agg for the per-type rollup,
    and the merged estimate must land within 5% of the exact distinct
    computed in the same plan. At scale the daily sketches are a few KB
    each, so any date-range rollup is a metadata-sized scan + union
    instead of touching raw events; the oracle hash-pins the exact counts
    and the VERDICT, not the sketch internals."""
    e = t(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day"), "user_id"
    )
    daily = e.groupBy("event_type", "day").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
        F.count("*").alias("n_days"),
    )
    exact = e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    rel_err = (
        F.abs(F.col("approx_users") - F.col("exact_users"))
        / F.col("exact_users")
    )
    return merged.join(exact, "event_type").select(
        "event_type",
        "exact_users",
        "n_days",
        (rel_err <= F.lit(0.05)).alias("merged_within_rel_err"),
    )

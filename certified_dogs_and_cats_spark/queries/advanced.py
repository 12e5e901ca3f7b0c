"""Round-7 tail: warehouse analytics + training-pipeline governance queries.

Marketing attribution, GROUPING SETS subtotals, weighted medians, interval
concurrency, CUSUM changepoints, n-gram split decontamination, and
embedding-centroid drift — each the canonical formulation of an operation a
production warehouse or LLM-data pipeline runs, each oracle-verified against
DuckDB with the repo's cross-engine determinism conventions (integer-scaled
sums, sequential-fold dot products, pinned tie-breaks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import dsum
from .common import t
from .dedup import MAX_SHINGLE_DF, _CAP_CTES, _SHINGLES_CTE
from .registry import query


@query(
    "attribution_last_touch",
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
             event_type, value
      FROM events
    ),
    a AS (
      SELECT user_id, ts, event_id, event_type, value,
             last_value(CASE WHEN event_type != 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS channel
      FROM e
    )
    SELECT coalesce(channel, 'none') AS channel,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             AS attributed_value
    FROM a WHERE event_type = 'purchase' GROUP BY 1
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: every purchase credits the most
    recent PRECEDING non-purchase event of the same user (the channel),
    'none' when the purchase is the user's first event. One partitioned
    window pass (the ignore-nulls last_value carry-forward — the same
    forward-fill primitive as resample_ffill) + one small aggregate; at
    100 TB this is a single shuffle on user_id and the carried channel
    column never leaves the row. Tie-break pinned on (ts, event_id);
    revenue uses the exact DECIMAL-sum-then-DOUBLE pattern."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    e = t(spark, sf_dir, "events")
    a = e.withColumn(
        "channel",
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        ).over(w),
    )
    return (
        a.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("channel", F.lit("none")).alias("channel"))
        .agg(
            F.count("*").cast("bigint").alias("n_purchases"),
            dsum("value", scale=6).alias("attributed_value"),
        )
    )


@query(
    "grouping_sets_revenue",
    oracle="""
    WITH o AS (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             o_orderstatus, o_totalprice
      FROM orders
    )
    SELECT coalesce(o_year, -1) AS o_year,
           coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
           CAST(2 * grouping(o_year) + grouping(o_orderstatus) AS INTEGER)
             AS gid,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM o
    GROUP BY GROUPING SETS ((o_year, o_orderstatus), (o_year),
                            (o_orderstatus), ())
    """,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form closing the rollup/cube
    family): detail, each single-key subtotal, and the grand total in ONE
    aggregation pass — Spark expands the sets map-side and shuffles once,
    exactly what four separate GROUP BYs would each pay. Subtotal keys
    are disambiguated by grouping() bits (gid), then coalesced to
    sentinel values so every output cell stays a sortable scalar for the
    driver's canonicalizer (both key columns are non-null in the data,
    so the sentinels are unambiguous)."""
    o = t(spark, sf_dir, "orders").select(
        F.year("o_orderdate").cast("int").alias("o_year"),
        "o_orderstatus",
        "o_totalprice",
    )
    g = o.groupingSets(
        [["o_year", "o_orderstatus"], ["o_year"], ["o_orderstatus"], []],
        "o_year",
        "o_orderstatus",
    ).agg(
        (2 * F.grouping("o_year") + F.grouping("o_orderstatus"))
        .cast("int")
        .alias("gid"),
        F.count("*").cast("bigint").alias("n_orders"),
        dsum("o_totalprice", scale=2).alias("revenue"),
    )
    return g.select(
        F.coalesce("o_year", F.lit(-1)).alias("o_year"),
        F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
        "gid",
        "n_orders",
        "revenue",
    )


@query(
    "weighted_median_price",
    oracle="""
    WITH li AS (
      SELECT l_returnflag AS flag, l_extendedprice AS price,
             CAST(floor(l_quantity + 0.5) AS BIGINT) AS w,
             l_orderkey, l_linenumber
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
    ),
    c AS (
      SELECT flag, price, w,
             sum(w) OVER (PARTITION BY flag
                          ORDER BY price ASC, l_orderkey ASC,
                                   l_linenumber ASC
                          ROWS UNBOUNDED PRECEDING) AS cw,
             sum(w) OVER (PARTITION BY flag) AS tw
      FROM li
    )
    SELECT flag, min(price) AS weighted_median_price,
           CAST(min(tw) AS BIGINT) AS total_weight
    FROM c WHERE 2 * cw >= tw GROUP BY 1
    """,
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median unit price per return flag — the
    'median price a unit actually sold at', robust where the row-median
    ignores volume. DISC selection (the median is one of the input
    prices bit-for-bit, the cross-engine-exact variant — interpolated
    medians differ across engines). Scale shape: a per-flag window in
    raw price order would sort the corpus inside 3 partitions, so this
    uses the repo's TWO-LEVEL prefix-sum form (packing_fill_rates):
    weights aggregate to bounded price BUCKETS first, a bucket-scale
    window locates the bucket holding the median and its preceding
    cumulative weight, and only that one bucket's rows (price-pruned at
    the scan by the broadcast-joined bucket bound) pay an exact in-
    bucket cumulative window. Weights are exact integers; ties pinned
    on (price, okey, line)."""
    bucket_width = 100.0
    li = t(spark, sf_dir, "lineitem").filter(
        # NULL price would order differently across engines (NULLS
        # FIRST vs LAST) inside the cumulative windows; exclude rows
        # that carry no price/weight signal at all.
        F.col("l_extendedprice").isNotNull()
        & F.col("l_quantity").isNotNull()
    ).select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("price"),
        F.floor(F.col("l_quantity") + 0.5).cast("bigint").alias("w"),
        "l_orderkey",
        "l_linenumber",
    ).withColumn(
        "bkt", F.floor(F.col("price") / bucket_width).cast("bigint")
    )
    bw = li.groupBy("flag", "bkt").agg(F.sum("w").alias("bw"))
    wb = (
        Window.partitionBy("flag")
        .orderBy(F.asc("bkt"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = bw.select(
        "flag",
        "bkt",
        "bw",
        F.sum("bw").over(wb).alias("cumb"),
        F.sum("bw").over(Window.partitionBy("flag")).alias("tw"),
    )
    # First bucket whose end-cumulative crosses half the total weight:
    # the qualifying set is a suffix in bkt order, so the struct-min
    # picks exactly that bucket (and carries its stats along).
    mb = (
        cum.filter(2 * F.col("cumb") >= F.col("tw"))
        .groupBy("flag")
        .agg(F.min(F.struct("bkt", "cumb", "bw", "tw")).alias("m"))
        .select(
            F.col("flag").alias("mflag"),
            F.col("m.bkt").alias("mbkt"),
            (F.col("m.cumb") - F.col("m.bw")).alias("prev_cum"),
            F.col("m.tw").alias("tw"),
        )
    )
    inb = li.join(
        F.broadcast(mb),
        (li["flag"] == mb["mflag"]) & (li["bkt"] == mb["mbkt"]),
    ).select("flag", "price", "w", "l_orderkey", "l_linenumber",
             "prev_cum", "tw")
    wcum = (
        Window.partitionBy("flag")
        .orderBy(F.asc("price"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = inb.select(
        "flag",
        "price",
        "tw",
        (F.col("prev_cum") + F.sum("w").over(wcum)).alias("cw"),
    )
    return (
        c.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("flag")
        .agg(
            F.min("price").alias("weighted_median_price"),
            F.min("tw").cast("bigint").alias("total_weight"),
        )
    )


@query(
    "concurrent_orders_peak",
    oracle="""
    WITH spans AS (
      SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS d0,
             CAST(max(l.l_shipdate) AS DATE) AS d1
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate IS NOT NULL
      GROUP BY 1, 2
    ),
    deltas AS (
      SELECT d0 AS day, 1 AS delta FROM spans
      UNION ALL
      SELECT d1 + 1, -1 FROM spans
    ),
    daily AS (SELECT day, sum(delta) AS net FROM deltas GROUP BY 1),
    run AS (
      SELECT day,
             sum(net) OVER (ORDER BY day ASC ROWS UNBOUNDED PRECEDING)
               AS open_orders
      FROM daily
    )
    SELECT CAST(year(day) AS INTEGER) AS o_year,
           CAST(month(day) AS INTEGER) AS o_month,
           CAST(max(open_orders) AS BIGINT) AS peak_open
    FROM run GROUP BY 1, 2
    """,
)
def concurrent_orders_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak interval concurrency per month: how many orders were OPEN
    (placed, not yet fully shipped) simultaneously — the classic
    sweep-line +1/-1 delta encoding. Scale shape: intervals collapse to
    two delta events each, deltas aggregate to DAY grain first (one
    corpus-scale shuffle), and only the day-scale series (~thousands of
    rows regardless of order count) crosses the unpartitioned running
    window — the audit-sanctioned aggregate-below-global-window form.
    Never materializes order x day rows (the explode-a-sequence
    alternative is |orders| * avg_duration rows — quadratic waste)."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    # Pre-aggregate lineitem to its per-order max ship date BEFORE the
    # fact-fact join (guide §2, partial/map-side aggregation): the
    # groupBy's map-side partial max collapses the ~4 lines per order
    # before the exchange, so the join shuffles |orders| aggregated rows
    # instead of |lineitem| raw rows, and the old post-join re-aggregate
    # disappears. Identical result: d0 is functionally dependent on
    # o_orderkey (one orders row per key), so grouping the joined stream
    # by (o_orderkey, d0) computed the same per-order max.
    li_max = (
        # NULL ship dates would put a NULL day into the running
        # window, whose sort position differs across engines.
        li.filter(F.col("l_shipdate").isNotNull())
        .groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(F.max(F.to_date("l_shipdate")).alias("d1"))
    )
    spans = o.select(
        "o_orderkey", F.to_date("o_orderdate").alias("d0")
    ).join(li_max, "o_orderkey")
    deltas = spans.select(
        F.col("d0").alias("day"), F.lit(1).alias("delta")
    ).unionByName(
        spans.select(
            F.date_add("d1", 1).alias("day"), F.lit(-1).alias("delta")
        )
    )
    daily = deltas.groupBy("day").agg(F.sum("delta").alias("net"))
    wrun = Window.orderBy(F.asc("day")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    run = daily.select("day", F.sum("net").over(wrun).alias("open_orders"))
    return run.groupBy(
        F.year("day").cast("int").alias("o_year"),
        F.month("day").cast("int").alias("o_month"),
    ).agg(F.max("open_orders").cast("bigint").alias("peak_open"))


@query(
    "cusum_changepoint",
    oracle="""
    WITH d AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(year(o_orderdate) AS INTEGER) AS o_year,
             sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
      FROM orders GROUP BY 1, 2
    ),
    s AS (
      SELECT o_year, day, cents,
             sum(cents) OVER (PARTITION BY o_year ORDER BY day ASC
                              ROWS UNBOUNDED PRECEDING) AS cum,
             row_number() OVER (PARTITION BY o_year ORDER BY day ASC) AS i,
             sum(cents) OVER (PARTITION BY o_year) AS tot,
             count(*) OVER (PARTITION BY o_year) AS k
      FROM d
    ),
    c AS (
      SELECT o_year, day, k,
             (k * cum - i * tot) AS scaled
      FROM s
    )
    SELECT o_year, day AS change_day,
           CAST(scaled AS DOUBLE) / k AS cusum_cents
    FROM (
      SELECT o_year, day, k, scaled,
             row_number() OVER (PARTITION BY o_year
                                ORDER BY abs(scaled) DESC, day ASC) AS r
      FROM c
    ) WHERE r = 1
    """,
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on daily revenue, per year: the day
    where the cumulative deviation from the year's mean peaks in
    magnitude — where the level shift happened, the standard offline
    CUSUM estimator. Exactness: S_i = cum_i - i*mean is kept INTEGER by
    scaling through k (k*S_i = k*cum_i - i*total, all bigint cents), so
    the argmax is decided on exact integers and only the final reported
    value pays one deterministic int->double division. All windows are
    day-scale (aggregate below); ties pinned to the earliest day."""
    o = t(spark, sf_dir, "orders")
    d = o.groupBy(
        F.to_date("o_orderdate").alias("day"),
        F.year("o_orderdate").cast("int").alias("o_year"),
    ).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
        ).alias("cents")
    )
    wy = Window.partitionBy("o_year")
    wcum = wy.orderBy(F.asc("day")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    worder = wy.orderBy(F.asc("day"))
    s = d.select(
        "o_year",
        "day",
        F.sum("cents").over(wcum).alias("cum"),
        F.row_number().over(worder).alias("i"),
        F.sum("cents").over(wy).alias("tot"),
        F.count("*").over(wy).alias("k"),
    )
    c = s.select(
        "o_year",
        "day",
        "k",
        (F.col("k") * F.col("cum") - F.col("i") * F.col("tot")).alias(
            "scaled"
        ),
    )
    wpick = Window.partitionBy("o_year").orderBy(
        F.abs("scaled").desc(), F.asc("day")
    )
    return (
        c.withColumn("r", F.row_number().over(wpick))
        .filter(F.col("r") == 1)
        .select(
            "o_year",
            F.col("day").alias("change_day"),
            (F.col("scaled").cast("double") / F.col("k")).alias(
                "cusum_cents"
            ),
        )
    )


# Word-5-gram shingle CTE (the decontamination grain: 5-grams are the
# shortest span where verbatim train/eval overlap stops being chance at
# small corpora; production pipelines use 8-13 on web scale). Same
# md5-top-15-hex 60-bit hashing as word_shingles(as_hash=True).
_SHINGLES5_CTE = """
    toks AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
    sh5 AS (
      SELECT DISTINCT doc_id,
             ('0x' || substr(md5(a[i+1] || ' ' || a[i+2] || ' ' || a[i+3]
                             || ' ' || a[i+4] || ' ' || a[i+5]), 1, 15))
               ::BIGINT AS shingle
      FROM toks, UNNEST(range(0, len(a) - 4)) AS u(i)
      WHERE len(a) >= 5
    )
"""


_EVAL_PRED = (
    "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100)"
    " < 10"
)


@query(
    "split_contamination_ngrams",
    oracle=f"""
    WITH {_SHINGLES5_CTE},
    train_sh AS (
      SELECT DISTINCT shingle FROM sh5 WHERE NOT ({_EVAL_PRED})
    ),
    contaminated AS (
      SELECT DISTINCT s.doc_id
      FROM sh5 s JOIN train_sh USING (shingle)
      WHERE {_EVAL_PRED.replace("doc_id", "s.doc_id")}
    )
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_eval,
           CAST(count(c.doc_id) AS BIGINT) AS n_contaminated,
           CAST(count(c.doc_id) AS DOUBLE) / count(*)
             AS contamination_rate
    FROM documents d
    LEFT JOIN contaminated c ON c.doc_id = d.doc_id
    WHERE {_EVAL_PRED.replace("doc_id", "d.doc_id")}
    GROUP BY 1
    """,
)
def split_contamination_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval split decontamination report: which held-out documents
    share a verbatim word-5-gram with ANY training document — the
    benchmark-contamination check every LLM data pipeline runs before
    trusting an eval split. The split is the repo's id-hash-percentile
    convention (hash_bucket(doc_id) < 10 is eval — the same buckets
    sample_hash_split uses), a pure function of doc_id that is backfill-
    stable AND uncorrelated with any data column — a raw `doc_id % k`
    split silently correlates with source in round-robin-keyed corpora,
    exactly the leak this report exists to catch. Plan: the
    hashed shingle relation splits into eval/train sides, a LEFT SEMI
    join on the 8-byte shingle key marks contaminated eval docs (no pair
    fan-out — semi joins short-circuit per key, so a common shingle
    never multiplies rows), then one per-source aggregate. At 100 TB
    this is the shingle-table shuffle the dedup family already pays,
    reused for governance."""
    from ..cache import tracked_persist
    from ..extensions.dedup import word_shingles
    from ..extensions.sampling import hash_bucket

    docs = t(spark, sf_dir, "documents")
    # Branched twice (train-side distinct, eval-side semi join): persist
    # so the tokenize+explode+distinct shuffle runs once, not per branch.
    sh5 = tracked_persist(
        word_shingles(docs, "doc_id", "text", n=5, as_hash=True)
    )
    is_eval = hash_bucket("doc_id", 100) < 10
    train_sh = sh5.filter(~is_eval).select("shingle").distinct()
    contaminated = (
        sh5.filter(is_eval)
        .join(train_sh, "shingle", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("__hit__", F.lit(1))
    )
    ev = docs.filter(is_eval).select("doc_id", "source")
    return (
        ev.join(contaminated, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_eval"),
            F.count("__hit__").cast("bigint").alias("n_contaminated"),
            (
                F.count("__hit__").cast("double") / F.count("*")
            ).alias("contamination_rate"),
        )
    )


@query(
    "label_centroid_similarity",
    oracle="""
    WITH x AS (
      SELECT label, generate_subscripts(embedding, 1) AS pos,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                        * 1000000000 + 0.5) AS BIGINT) AS iv
      FROM embeddings
    ),
    c AS (
      SELECT label, pos, sum(iv) AS s, count(*) AS n FROM x GROUP BY 1, 2
    ),
    cent AS (
      SELECT label, list(CAST(s AS DOUBLE) / n ORDER BY pos) AS ce
      FROM c GROUP BY 1
    ),
    nc AS (
      SELECT label, ce, sqrt(list_dot_product(ce, ce)) AS nrm FROM cent
    )
    SELECT CAST(a.label AS INTEGER) AS label_a,
           CAST(b.label AS INTEGER) AS label_b,
           round(list_dot_product(a.ce, b.ce) / (a.nrm * b.nrm), 6)
             AS cos_sim
    FROM nc a JOIN nc b ON a.label < b.label
    WHERE a.nrm > 0 AND b.nrm > 0
    """,
)
def label_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine similarity between per-label embedding CENTROIDS —
    the cluster-separation / source-drift report read before trusting a
    labeling or merging data sources. Summation-order trap (the reason
    naive avg() centroids can't hash-pin): each component is accumulated
    as 1e9-scaled BIGINTs (exact, order-independent — the established
    embedding integerization), and the centroid pays one deterministic
    int->double division per dimension; dot products then run as
    sequential folds in dimension order on both engines. Per-dimension
    aggregation rows keep every buffer bounded (|labels| x dim), and the
    pairwise stage touches only |labels|^2/2 centroid pairs — trivially
    broadcast at any corpus size."""
    from ..extensions.similarity import dot

    emb = t(spark, sf_dir, "embeddings")
    x = emb.select(
        "label",
        F.posexplode(
            F.transform("embedding", lambda v: v.cast("double"))
        ).alias("pos", "v"),
    ).select(
        "label",
        "pos",
        F.floor(F.col("v") * 1000000000 + 0.5).cast("bigint").alias("iv"),
    )
    c = x.groupBy("label", "pos").agg(
        F.sum("iv").alias("s"), F.count("*").alias("n")
    )
    cent = c.groupBy("label").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    "pos", (F.col("s").cast("double") / F.col("n")).alias("cv")
                )
            )
        )
        .getField("cv")
        .alias("ce")
    )
    nc = cent.select(
        "label", "ce", F.sqrt(dot(F.col("ce"), F.col("ce"))).alias("nrm")
    )
    a = nc.select(
        F.col("label").alias("label_a"),
        F.col("ce").alias("cea"),
        F.col("nrm").alias("nrma"),
    )
    b = nc.select(
        F.col("label").alias("label_b"),
        F.col("ce").alias("ceb"),
        F.col("nrm").alias("nrmb"),
    )
    return (
        a.join(F.broadcast(b), F.col("label_a") < F.col("label_b"))
        # Components can cancel: a zero-norm centroid would turn the
        # division into NaN/Inf (and differently across engines) — the
        # same degenerate-vector guard the exact cosine paths use.
        .filter((F.col("nrma") > 0) & (F.col("nrmb") > 0))
        .select(
            F.col("label_a").cast("int").alias("label_a"),
            F.col("label_b").cast("int").alias("label_b"),
            F.round(
                dot(F.col("cea"), F.col("ceb"))
                / (F.col("nrma") * F.col("nrmb")),
                6,
            ).alias("cos_sim"),
        )
    )


@query(
    "cohort_ltv_curve",
    oracle="""
    WITH fe AS (
      SELECT user_id,
             min(CAST(date_trunc('week', ts) AS DATE)) AS cohort_week
      FROM events GROUP BY 1
    ),
    p AS (
      SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS week,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    a AS (
      SELECT f.cohort_week,
             CAST(date_diff('day', f.cohort_week, p.week) // 7 AS INTEGER)
               AS week_offset,
             count(*) AS n_purchases, sum(cents) AS cents
      FROM p JOIN fe f USING (user_id)
      GROUP BY 1, 2
    )
    SELECT cohort_week,
           week_offset,
           CAST(n_purchases AS BIGINT) AS n_purchases,
           CAST(sum(cents) OVER (PARTITION BY cohort_week
                                 ORDER BY week_offset ASC
                                 ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 100
             AS cum_revenue
    FROM a
    """,
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: users grouped by first-active week
    (retention_cohorts' week grain), purchase revenue accumulated over
    weeks-since-signup — the LTV triangle finance reads next to the
    retention triangle (this adds the MONETARY axis). Revenue stays
    BIGINT cents through the per-cohort cumulative window (exact,
    order-independent) and pays one division at the output. The window
    runs over the (cohort, offset) AGGREGATE — weeks, not events — so
    the corpus-scale work is two hash aggregates and the user-keyed
    first-touch join."""
    e = t(spark, sf_dir, "events")
    fe = e.groupBy("user_id").agg(
        F.min(F.date_trunc("week", "ts").cast("date")).alias("cohort_week")
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.date_trunc("week", "ts").cast("date").alias("week"),
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    a = (
        p.join(fe, "user_id")
        .groupBy(
            "cohort_week",
            F.expr("datediff(week, cohort_week) div 7")
            .cast("int")
            .alias("week_offset"),
        )
        .agg(
            F.count("*").alias("n_purchases"), F.sum("cents").alias("cents")
        )
    )
    wcum = (
        Window.partitionBy("cohort_week")
        .orderBy(F.asc("week_offset"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return a.select(
        "cohort_week",
        "week_offset",
        F.col("n_purchases").cast("bigint").alias("n_purchases"),
        (F.sum("cents").over(wcum).cast("double") / 100).alias(
            "cum_revenue"
        ),
    )


_PROFILE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)

_PROFILE_ORACLE = "\n    UNION ALL\n".join(
    f"""    SELECT '{c}' AS column_name,
           CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct
    FROM orders"""
    for c in _PROFILE_COLS
)


@query("column_profile_orders", oracle=_PROFILE_ORACLE)
def column_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profile (null count + exact NDV per column)
    in ONE scan: Spark plans the multi-column count-distinct through a
    single Expand (rows x |columns|, each tagged with one column's
    value) feeding one aggregate — the same pass a warehouse's ANALYZE
    TABLE ... COMPUTE STATISTICS runs, vs the oracle's 6 separate scans.
    The Expand multiplies rows by |profiled columns|, the known and
    accepted ANALYZE cost; per-column results unpivot via stack() into
    the (column, stat) shape catalogs store."""
    o = t(spark, sf_dir, "orders")
    total = F.count("*")
    aggs = [total.alias("__total__")]
    for c in _PROFILE_COLS:
        aggs.append(F.count(c).alias(f"__nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"__nd_{c}"))
    wide = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __total__ - __nn_{c}, __nd_{c}" for c in _PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args})"
            " AS (column_name, n_nulls, n_distinct)"
        )
    ).select(
        "column_name",
        F.col("n_nulls").cast("bigint").alias("n_nulls"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
    )


@query(
    "flesch_reading_scores",
    oracle="""
    WITH s AS (
      SELECT source,
             len(string_split(coalesce(text, ''), ' ')) AS w,
             greatest(1, len(regexp_extract_all(coalesce(text, ''),
                                                '[.!?]'))) AS snt,
             len(regexp_extract_all(lower(coalesce(text, '')),
                                    '[aeiou]+')) AS syl
      FROM documents
    ),
    a AS (
      SELECT source, count(*) AS n_docs, sum(w) AS tw, sum(snt) AS ts,
             sum(syl) AS ty
      FROM s GROUP BY 1
    )
    SELECT source,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(tw AS BIGINT) AS total_words,
           206.835 - 1.015 * (CAST(tw AS DOUBLE) / ts)
                   - 84.6 * (CAST(ty AS DOUBLE) / tw) AS flesch_score
    FROM a
    """,
)
def flesch_reading_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level Flesch Reading Ease per source — the readability
    gate a training-data curator uses to drop boilerplate-heavy or
    telegraphic sources. Syllables approximate as vowel GROUPS (the
    standard regex heuristic), sentences as terminal-punctuation runs
    with a floor of 1. Determinism: scores are computed from per-source
    INTEGER sums (words/sentences/syllables) — a per-document score
    averaged in floating point would be summation-order-dependent — so
    the only float work is two divisions and the fixed Flesch constants,
    identical IEEE on both engines. One map + one aggregate; nothing
    here shuffles more than |sources| rows after the scan."""
    docs = t(spark, sf_dir, "documents")
    # coalesce once: NULL text would otherwise thread engine-specific
    # NULL semantics through greatest()/size() (Spark ignores NULL args
    # in greatest, other engines propagate).
    txt = F.coalesce(F.col("text"), F.lit(""))
    s = docs.select(
        "source",
        F.size(F.split(txt, " ")).cast("bigint").alias("w"),
        F.greatest(
            F.lit(1).cast("bigint"),
            F.size(F.regexp_extract_all(txt, F.lit("[.!?]"), 0)).cast(
                "bigint"
            ),
        ).alias("snt"),
        F.size(
            F.regexp_extract_all(F.lower(txt), F.lit("[aeiou]+"), 0)
        ).cast("bigint").alias("syl"),
    )
    a = s.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("w").alias("tw"),
        F.sum("snt").alias("ts"),
        F.sum("syl").alias("ty"),
    )
    return a.select(
        "source",
        "n_docs",
        F.col("tw").cast("bigint").alias("total_words"),
        (
            F.lit(206.835)
            - F.lit(1.015) * (F.col("tw").cast("double") / F.col("ts"))
            - F.lit(84.6) * (F.col("ty").cast("double") / F.col("tw"))
        ).alias("flesch_score"),
    )


@query(
    "repeat_purchase_latency",
    oracle="""
    WITH g AS (
      SELECT o_custkey,
             date_diff('day',
               lag(CAST(o_orderdate AS DATE))
                 OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate ASC, o_orderkey ASC),
               CAST(o_orderdate AS DATE)) AS gap_days
      FROM orders
    )
    SELECT CAST(gap_days // 7 AS INTEGER) AS gap_week_bucket,
           CAST(count(*) AS BIGINT) AS n_gaps
    FROM g WHERE gap_days IS NOT NULL GROUP BY 1
    """,
)
def repeat_purchase_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reorder-latency histogram: days between a customer's consecutive
    orders, bucketed by week — the purchase-cadence distribution behind
    replenishment and churn models. One lag window partitioned by
    customer (high-cardinality key, healthy partitions at any scale),
    integer day arithmetic, floor-division bucketing (Spark `div` ==
    DuckDB `//` on the non-negative gaps), one small aggregate."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.asc("o_orderdate"), F.asc("o_orderkey")
    )
    g = o.select(
        F.datediff(
            F.to_date("o_orderdate"),
            F.lag(F.to_date("o_orderdate")).over(w),
        ).alias("gap_days")
    )
    return (
        g.filter(F.col("gap_days").isNotNull())
        .groupBy(
            F.expr("gap_days div 7").cast("int").alias("gap_week_bucket")
        )
        .agg(F.count("*").cast("bigint").alias("n_gaps"))
    )


# k-NN classification check constants (the self-evaluation a curator runs
# before trusting `label` for mixture sampling): same bounded query set
# and k as the similarity family — imported so a retuned fixture bound
# changes both families in one place.
from .similarity import K as _KNN_K  # noqa: E402
from .similarity import QUERY_PRED as _KNN_PRED  # noqa: E402


@query(
    "knn_label_accuracy",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
    ),
    lab AS (SELECT vec_id, label FROM embeddings),
    q AS (SELECT vec_id AS query_id, e AS qe, nrm AS qnrm FROM v
          WHERE {_KNN_PRED}),
    pairs AS (
      SELECT q.query_id, v.vec_id AS neighbor_id,
             round(list_dot_product(q.qe, v.e) / (q.qnrm * v.nrm), 6)
               AS cos_sim
      FROM q CROSS JOIN v WHERE v.vec_id != q.query_id
    ),
    top AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, neighbor_id ASC)
                 AS rnk
        FROM pairs
      ) WHERE rnk <= {_KNN_K}
    ),
    votes AS (
      SELECT t.query_id, l.label, count(*) AS c
      FROM top t JOIN lab l ON l.vec_id = t.neighbor_id
      GROUP BY 1, 2
    ),
    pred AS (
      SELECT query_id, label AS pred_label FROM (
        SELECT query_id, label,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY c DESC, label ASC) AS r
        FROM votes
      ) WHERE r = 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_queries,
           CAST(count(*) FILTER (WHERE p.pred_label = l2.label) AS BIGINT)
             AS n_correct,
           CAST(count(*) FILTER (WHERE p.pred_label = l2.label) AS DOUBLE)
             / count(*) AS accuracy
    FROM pred p JOIN lab l2 ON l2.vec_id = p.query_id
    """,
)
def knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN label-vote accuracy: predict each held-out query vector's
    label by majority vote of its top-k cosine neighbors and score
    against the true label — the embedding-quality / label-coherence
    check a curator runs before trusting cluster labels for mixture
    sampling. Reuses the exact broadcast top-k (bounded |Q| contract)
    from the similarity family; votes and the verdict are two
    |Q|*k-sized aggregates. Vote ties break (count DESC, label ASC) on
    both engines; accuracy is exact counting + one IEEE division."""
    from .similarity import exact_topk_memo

    emb = t(spark, sf_dir, "embeddings")
    # Same (sf_dir, k, pred) ground-truth set the ANN self-checks score
    # against — built once per process, read back as parquet here.
    top = exact_topk_memo(spark, sf_dir, k=_KNN_K, pred=_KNN_PRED)
    lab = emb.select("vec_id", "label")
    votes = (
        top.join(lab, top["neighbor_id"] == lab["vec_id"])
        .groupBy("query_id", "label")
        .agg(F.count("*").alias("c"))
    )
    wpick = Window.partitionBy("query_id").orderBy(
        F.col("c").desc(), F.asc("label")
    )
    pred = (
        votes.withColumn("r", F.row_number().over(wpick))
        .filter(F.col("r") == 1)
        .select("query_id", F.col("label").alias("pred_label"))
    )
    truth = emb.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    )
    scored = pred.join(truth, "query_id")
    hit = (F.col("pred_label") == F.col("true_label")).cast("long")
    return scored.agg(
        F.count("*").cast("bigint").alias("n_queries"),
        F.sum(hit).cast("bigint").alias("n_correct"),
        (F.sum(hit).cast("double") / F.count("*")).alias("accuracy"),
    )


@query(
    "ngram_novelty_curve",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    first AS (SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY 1),
    mx AS (SELECT max(doc_id) AS mid FROM documents)
    SELECT CAST(first_doc * 10 // (mid + 1) AS INTEGER) AS corpus_decile,
           CAST(count(*) AS BIGINT) AS n_novel_shingles
    FROM first CROSS JOIN mx
    GROUP BY 1
    """,
)
def ngram_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty curve: how many shingles appear for the FIRST time
    in each decile of the corpus (by doc_id, the ingest order) — flat
    means new data still contributes new content, a collapsing tail
    means the crawl is saturating and dedup should get more aggressive.
    One aggregate over the shared memoized shingle table (min doc_id per
    shingle — map-side partial mins), one broadcast scalar for the id
    range, one 10-row aggregate. Spark `div` == DuckDB `//` integer
    bucketing."""
    from .dedup import shingles3

    docs = t(spark, sf_dir, "documents")
    sh = shingles3(spark, sf_dir)
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    mx = docs.agg(F.max("doc_id").alias("mid"))
    return (
        first.crossJoin(F.broadcast(mx))
        .groupBy(
            F.expr("(first_doc * 10) div (mid + 1)")
            .cast("int")
            .alias("corpus_decile")
        )
        .agg(F.count("*").cast("bigint").alias("n_novel_shingles"))
    )


@query(
    "dedup_threshold_sweep",
    oracle=f"""
    WITH {_SHINGLES_CTE},{_CAP_CTES},
    sizes AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY 1),
    pairs AS (
      SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*) AS inter
      FROM shc x JOIN shc y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
      GROUP BY 1, 2
    ),
    j AS (
      SELECT CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jac
      FROM pairs
      JOIN sizes sa ON sa.doc_id = a_id
      JOIN sizes sb ON sb.doc_id = b_id
    )
    SELECT CAST(floor(jac * 10) AS INTEGER) AS jaccard_band,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM j GROUP BY 1
    """,
)
def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold calibration sweep: candidate-pair counts per Jaccard
    band (floor(j*10): 0 = the shared-shingle noise floor, 9-10 = the
    dup cluster) from ONE pass over the pair pipeline — the separation
    a corpus owner reads to pick the dedup threshold, vs re-running the
    join once per candidate threshold. Reuses the memoized shingle table and the same
    df-capped candidate generator as dedup_ngram_jaccard; the band
    decision floor(j*10) is one IEEE multiply on the exact-integer
    division, identical both engines."""
    from ..extensions.dedup import jaccard_pairs
    from .dedup import budgeted_shingles3

    sh = budgeted_shingles3(spark, sf_dir)
    pairs = jaccard_pairs(sh, "doc_id", 0.0, max_shingle_df=MAX_SHINGLE_DF)
    return pairs.groupBy(
        F.floor(F.col("jaccard") * 10).cast("int").alias("jaccard_band")
    ).agg(F.count("*").cast("bigint").alias("n_pairs"))


@query(
    "supplier_pareto_8020",
    oracle="""
    WITH r AS (
      SELECT l_suppkey,
             sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
               AS cents
      FROM lineitem GROUP BY 1
    ),
    c AS (
      SELECT l_suppkey, cents,
             sum(cents) OVER (ORDER BY cents DESC, l_suppkey ASC
                              ROWS UNBOUNDED PRECEDING) AS cum,
             sum(cents) OVER () AS tot,
             row_number() OVER (ORDER BY cents DESC, l_suppkey ASC) AS rnk,
             count(*) OVER () AS n_suppliers
      FROM r
    )
    SELECT CAST(min(rnk) AS BIGINT) AS suppliers_to_80pct,
           CAST(min(n_suppliers) AS BIGINT) AS n_suppliers,
           CAST(min(rnk) AS DOUBLE) / min(n_suppliers)
             AS supplier_share,
           CAST(min(cum) AS DOUBLE) / min(tot) AS revenue_share
    FROM c WHERE 5 * cum >= 4 * tot
    """,
)
def supplier_pareto_8020(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration (the 80/20 read): how many top suppliers
    carry 80% of revenue — the procurement-risk number next to the Gini
    the token side already reports. The ranking window runs over the
    SUPPLIER AGGREGATE (|suppliers| rows, dimension-scale at any corpus
    size — the sanctioned global-window shape), the crossing test
    5*cum >= 4*tot stays in exact integers (no 0.8 float literal), and
    the first crossing row is the suffix minimum — same selection trick
    as weighted_median_price. Lineitem pays one hash-aggregate shuffle,
    nothing else touches corpus-scale data."""
    li = t(spark, sf_dir, "lineitem")
    r = li.groupBy("l_suppkey").agg(
        F.sum(
            F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint")
        ).alias("cents")
    )
    worder = Window.orderBy(F.col("cents").desc(), F.asc("l_suppkey"))
    wcum = worder.rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    c = r.select(
        "cents",
        F.sum("cents").over(wcum).alias("cum"),
        F.sum("cents").over(wall).alias("tot"),
        F.row_number().over(worder).alias("rnk"),
        F.count("*").over(wall).alias("n_suppliers"),
    )
    return c.filter(5 * F.col("cum") >= 4 * F.col("tot")).agg(
        F.min("rnk").cast("bigint").alias("suppliers_to_80pct"),
        F.min("n_suppliers").cast("bigint").alias("n_suppliers"),
        (F.min("rnk").cast("double") / F.min("n_suppliers")).alias(
            "supplier_share"
        ),
        (F.min("cum").cast("double") / F.min("tot")).alias("revenue_share"),
    )


@query(
    "embedding_dim_variance",
    oracle="""
    WITH x AS (
      SELECT generate_subscripts(embedding, 1) AS dim,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                        * 1000000 + 0.5) AS BIGINT) AS iv
      FROM embeddings
    ),
    a AS (
      SELECT dim, count(*) AS n, sum(iv) AS sx,
             sum(iv * iv) AS sxx
      FROM x GROUP BY 1
    )
    SELECT CAST(dim AS INTEGER) AS dim,
           CAST(sx AS DOUBLE) / n / 1000000 AS mean_val,
           CAST(n * sxx - sx * sx AS DOUBLE) / n / n / 1000000000000
             AS variance
    FROM a
    """,
)
def embedding_dim_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean/variance of the embedding corpus — the feature
    -health profile that catches dead dimensions (variance ~ 0, wasted
    index capacity) and exploding ones (dominating every distance)
    before an ANN index is trained on them. Exactness: components are
    1e6-scaled BIGINTs, so n*sxx - sx^2 is exact integer arithmetic
    (population variance without a float mean subtraction — the
    numerically-unstable textbook pitfall AND a summation-order hazard);
    the only float work is the final descale divisions. 1e6 scaling
    bounds sum(iv^2) ~ |corpus| * 3.4e11 — inside BIGINT beyond 1e6
    vectors (at larger corpora, shard the sum or widen to DECIMAL).
    One posexplode + one (dim)-keyed aggregate; |dims| output rows."""
    emb = t(spark, sf_dir, "embeddings")
    x = emb.select(
        F.posexplode(
            F.transform("embedding", lambda v: v.cast("double"))
        ).alias("dim0", "v")
    ).select(
        # DuckDB's generate_subscripts is 1-based; mirror it.
        (F.col("dim0") + 1).alias("dim"),
        F.floor(F.col("v") * 1000000 + 0.5).cast("bigint").alias("iv"),
    )
    a = x.groupBy("dim").agg(
        F.count("*").alias("n"),
        F.sum("iv").alias("sx"),
        F.sum(F.col("iv") * F.col("iv")).alias("sxx"),
    )
    return a.select(
        F.col("dim").cast("int").alias("dim"),
        (F.col("sx").cast("double") / F.col("n") / 1000000).alias(
            "mean_val"
        ),
        (
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
            .cast("double")
            / F.col("n")
            / F.col("n")
            / 1000000000000
        ).alias("variance"),
    )


@query(
    "weekday_revenue_index",
    oracle="""
    WITH d AS (
      SELECT dayofweek(CAST(o_orderdate AS DATE)) AS dow,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    ),
    a AS (
      SELECT dow, count(*) AS n, sum(cents) AS cents FROM d GROUP BY 1
    ),
    tot AS (SELECT sum(cents) AS tc, sum(n) AS tn FROM a)
    SELECT CAST(dow AS INTEGER) AS dow,
           CAST(n AS BIGINT) AS n_orders,
           CAST(cents AS DOUBLE) / 100 AS revenue,
           (CAST(cents AS DOUBLE) / tc) / (CAST(n AS DOUBLE) / tn)
             AS per_order_index
    FROM a CROSS JOIN tot
    """,
)
def weekday_revenue_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday seasonality index: each weekday's share of revenue
    relative to its share of orders (>1 = bigger baskets that day) —
    the day-of-week profile behind staffing and campaign timing.
    Engine trap pinned: Spark's dayofweek() is 1-7 Sunday-first while
    DuckDB's is 0-6 Sunday-first — the Spark side subtracts 1 so both
    emit the same 0-6 keys. Integer-cent sums, two exact divisions per
    output row, 7-row broadcast of the grand total."""
    o = t(spark, sf_dir, "orders")
    d = o.select(
        (F.dayofweek(F.to_date("o_orderdate")) - 1).alias("dow"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias(
            "cents"
        ),
    )
    a = d.groupBy("dow").agg(
        F.count("*").alias("n"), F.sum("cents").alias("cents")
    )
    tot = a.agg(
        F.sum("cents").alias("tc"), F.sum("n").alias("tn")
    )
    return a.crossJoin(F.broadcast(tot)).select(
        F.col("dow").cast("int").alias("dow"),
        F.col("n").cast("bigint").alias("n_orders"),
        (F.col("cents").cast("double") / 100).alias("revenue"),
        (
            (F.col("cents").cast("double") / F.col("tc"))
            / (F.col("n").cast("double") / F.col("tn"))
        ).alias("per_order_index"),
    )


@query(
    "nation_pair_trade_flows",
    oracle="""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    WHERE sn.n_name <> cn.n_name
    GROUP BY 1, 2
    """,
)
def nation_pair_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-border trade-flow matrix (TPC-H Q7 shape): revenue between
    every (supplier nation, customer nation) pair, the query that joins
    the SAME dimension twice in two roles — the self-aliased-dim pattern
    a join optimizer must not collapse. Scale posture: nation (25 rows)
    broadcasts on both sides; supplier and customer scale with the data
    so they take no hint (AQE decides); the one unavoidable fact-fact
    shuffle is lineitem x orders on the order key. Revenue uses the
    exact DECIMAL-sum idiom so the total is partitioning-independent."""
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    sn = F.broadcast(n.select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
    ))
    cn = F.broadcast(n.select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_name").alias("cust_nation"),
    ))
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(sn, F.col("s_nationkey") == F.col("sn_key"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(cn, F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation")
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.sum(rev).cast("double").alias("revenue"),
        )
    )


@query(
    "order_priority_return_rate",
    oracle="""
    WITH r AS (
      SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
    ),
    a AS (
      SELECT o.o_orderpriority AS priority,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CASE WHEN r.l_orderkey IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_with_return
      FROM orders o LEFT JOIN r ON o.o_orderkey = r.l_orderkey
      GROUP BY 1
    )
    SELECT priority, n_orders, n_with_return,
           round(100.0 * n_with_return / n_orders, 2) AS return_pct
    FROM a
    """,
)
def order_priority_return_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders containing at least one returned line, per order priority
    (the TPC-H Q4 EXISTS-subquery shape re-keyed to the return flag):
    the existence test is a LEFT SEMI join — the plan every EXISTS
    should compile to, never a count-then-filter that materializes all
    matches. Scale posture: the returnflag filter is pushed into the
    lineitem scan, the semi join ships only distinct order keys, and the
    priority rollup is a 5-group aggregate."""
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    returned = (
        l.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o_orderkey"))
    )
    flagged = o.select("o_orderkey", "o_orderpriority").join(
        returned, "o_orderkey", "left_semi"
    )
    per = (
        o.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count("*").cast("bigint").alias("n_orders"))
    )
    hits = (
        flagged.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count("*").cast("bigint").alias("n_with_return"))
    )
    out = per.join(hits, "priority", "left").fillna(
        0, subset=["n_with_return"]
    )
    return out.select(
        "priority",
        "n_orders",
        F.col("n_with_return").cast("bigint").alias("n_with_return"),
        F.round(
            F.lit(100.0) * F.col("n_with_return") / F.col("n_orders"), 2
        ).alias("return_pct"),
    )


@query(
    "cross_source_duplicate_matrix",
    oracle="""
    WITH h AS (
      SELECT md5(substr(text, 1, 120)) AS hsh, source,
             CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY 1, 2
    ),
    cross_pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(sum(a.c * b.c) AS BIGINT) AS dup_pairs
      FROM h a JOIN h b ON a.hsh = b.hsh AND a.source < b.source
      GROUP BY 1, 2
    ),
    self_pairs AS (
      SELECT source AS source_a, source AS source_b,
             CAST(sum(c * (c - 1) / 2) AS BIGINT) AS dup_pairs
      FROM h WHERE c >= 2 GROUP BY 1, 2
    )
    SELECT * FROM cross_pairs WHERE dup_pairs > 0
    UNION ALL
    SELECT * FROM self_pairs WHERE dup_pairs > 0
    """,
)
def cross_source_duplicate_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which sources copy from which: exact-duplicate pair counts per
    (source, source) cell, keyed on the md5 of the 120-char document
    prefix (the boilerplate fingerprint: full-text md5 misses documents
    that share openings but diverge in tails, and the prefix key is
    what a survivor-priority pass blocks on) — the provenance
    diagnostic run before deciding survivor priority in cross-source
    dedup (keep the curated source, kill the scrape). One md5
    hash-aggregate over the corpus,
    then a self-join of the (hash, source, count) table on the hash —
    co-partitioned by the groupBy, so no second corpus shuffle; the
    duplicate-hash relation is corpus-shrunk before any pairing.
    Within-source pairs are C(c,2); cross-source pairs multiply counts.
    All-integer math."""
    from ..cache import tracked_persist

    h = tracked_persist(
        t(spark, sf_dir, "documents")
        .select(
            "source",
            F.md5(F.substring("text", 1, 120).cast("binary")).alias("hsh"),
        )
        .groupBy("hsh", "source")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    a = h.select(
        "hsh", F.col("source").alias("source_a"), F.col("c").alias("ca")
    )
    b = h.select(
        "hsh", F.col("source").alias("source_b"), F.col("c").alias("cb")
    )
    cross = (
        a.join(b, "hsh")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("bigint").alias("dup_pairs"))
    )
    self_p = (
        h.filter(F.col("c") >= 2)
        .groupBy(
            F.col("source").alias("source_a"),
            F.col("source").alias("source_b"),
        )
        .agg(
            F.sum(F.col("c") * (F.col("c") - 1) / 2)
            .cast("bigint")
            .alias("dup_pairs")
        )
    )
    return cross.filter(F.col("dup_pairs") > 0).unionByName(
        self_p.filter(F.col("dup_pairs") > 0)
    )


from ..functions.detln import series_ln_sql as _series_ln_sql

# ln(T/c) for the entropy sum, generated once per dialect from ONE
# definition so the Spark expression and the DuckDB oracle can never
# drift (functions/detln.py: deterministic fixed-IEEE-sequence series,
# bit-identical across engines).
_ENT_LN_SPARK = _series_ln_sql("n_total", "c", "spark")
_ENT_LN_DUCK = _series_ln_sql("n_total", "c", "duck")


@query(
    "token_entropy_by_source",
    oracle=f"""
    WITH tk AS (
      SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    cnt AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
            FROM tk GROUP BY 1, 2),
    tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_total,
                   CAST(count(*) AS BIGINT) AS vocab
            FROM cnt GROUP BY 1),
    term AS (
      SELECT cnt.source, tot.n_total, tot.vocab,
             cnt.c * CAST(floor({_ENT_LN_DUCK} * 1e9 + 0.5e0) AS BIGINT)
               AS contrib
      FROM cnt JOIN tot USING (source)
    )
    SELECT source, min(n_total) AS n_tokens, min(vocab) AS vocab_size,
           round((CAST(sum(CAST(contrib AS DECIMAL(38,0))) AS DOUBLE)
                  / CAST(min(n_total) AS DOUBLE)) / 1e9, 6)
             AS entropy_nats
    FROM term GROUP BY 1
    """,
)
def token_entropy_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (nats) of each source's unigram distribution —
    the vocabulary-diversity score that separates natural text (high)
    from templated/boilerplate sources (low) in corpus curation.
    H = sum (c/T) ln(T/c) needs a logarithm, which the repo otherwise
    bans (libm ln differs last-ulp across engines): here ln(T/c) is the
    deterministic fixed-IEEE-sequence series over the INTEGER rational
    (functions/detln.py), each term is quantized to a 1e9-scaled BIGINT
    and summed as DECIMAL(38,0) — integer addition is associative, so
    the sum is partitioning-independent and the final two divisions are
    single IEEE ops. Scale shape: one token hash-aggregate, a tiny
    per-source totals broadcast, one vocabulary-sized aggregate — the
    corpus text never re-shuffles."""
    docs = t(spark, sf_dir, "documents")
    tk = docs.select(
        "source", F.explode(F.split("text", " ")).alias("tok")
    )
    cnt = tk.groupBy("source", "tok").agg(
        F.count("*").cast("bigint").alias("c")
    )
    tot = cnt.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_total"),
        F.count("*").cast("bigint").alias("vocab"),
    )
    term = cnt.join(F.broadcast(tot), "source").select(
        "source",
        "n_total",
        "vocab",
        (
            F.col("c")
            * F.expr(
                f"CAST(floor({_ENT_LN_SPARK} * 1e9 + 0.5e0) AS BIGINT)"
            )
        ).alias("contrib"),
    )
    return term.groupBy("source").agg(
        F.min("n_total").alias("n_tokens"),
        F.min("vocab").alias("vocab_size"),
        F.round(
            (
                F.sum(F.col("contrib").cast("decimal(38,0)")).cast("double")
                / F.min("n_total").cast("double")
            )
            / F.lit(1e9),
            6,
        ).alias("entropy_nats"),
    )


# --- round-9 tail: window/band analytics, sketch calibration, ---------
# --- log-domain divergence ---------------------------------------------


@query(
    "pareto_frontier_brand",
    oracle="""
    WITH s AS (
      SELECT p_brand, p_partkey, p_size, p_retailprice,
             max(p_size) OVER (
               PARTITION BY p_brand
               ORDER BY p_retailprice ASC, p_size DESC, p_partkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS prev_max
      FROM part
    )
    SELECT p_brand AS brand, p_partkey AS partkey,
           CAST(p_size AS INTEGER) AS size, p_retailprice AS price
    FROM s WHERE prev_max IS NULL OR p_size > prev_max
    """,
)
def pareto_frontier_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier (skyline) per brand: parts not dominated on
    (cheaper, bigger) by any other part of the brand. The naive skyline
    is a quadratic NOT EXISTS self-join; the scalable form is ONE
    partitioned window pass — sort by (price asc, size desc, key asc)
    and keep a row iff its size beats the running max of everything
    cheaper (ties resolved by the sort itself: at equal price the
    bigger part precedes and dominates). One shuffle on the partition
    key, no self-join at any scale."""
    p = t(spark, sf_dir, "part")
    w = (
        Window.partitionBy("p_brand")
        .orderBy(
            F.col("p_retailprice").asc(),
            F.col("p_size").desc(),
            F.col("p_partkey").asc(),
        )
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    s = p.select(
        F.col("p_brand").alias("brand"),
        F.col("p_partkey").alias("partkey"),
        F.col("p_size").cast("int").alias("size"),
        F.col("p_retailprice").alias("price"),
        F.max("p_size").over(w).alias("prev_max"),
    )
    return s.filter(
        F.col("prev_max").isNull() | (F.col("size") > F.col("prev_max"))
    ).drop("prev_max")


@query(
    "running_distinct_users",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, min(date_trunc('hour', ts)) AS hour
      FROM events GROUP BY 1
    ),
    per_hour AS (
      SELECT hour, CAST(count(*) AS BIGINT) AS new_users
      FROM first_seen GROUP BY 1
    )
    SELECT hour, new_users,
           CAST(sum(new_users) OVER (
             ORDER BY hour ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_users
    FROM per_hour
    """,
)
def running_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per hour — the growth curve every
    product dashboard wants, which a naive COUNT(DISTINCT) OVER
    cumulative frame cannot express scalably (per-day re-dedup of all
    history). The linear form: distinct collapses to each user's FIRST
    hour (one hash aggregate on the user key), then a running sum over
    the tiny hour-level series — the only unpartitioned window sits
    above an aggregate, per the repo's global-window convention."""
    e = t(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.min(F.date_trunc("hour", F.col("ts"))).alias("hour")
    )
    per_hour = first_seen.groupBy("hour").agg(
        F.count("*").cast("bigint").alias("new_users")
    )
    w = (
        Window.orderBy(F.col("hour").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return per_hour.select(
        "hour",
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("cum_users"),
    )


@query(
    "winsorized_mean_prices",
    oracle="""
    WITH r AS (
      SELECT p_brand, p_partkey, p_retailprice,
             row_number() OVER (
               PARTITION BY p_brand
               ORDER BY p_retailprice ASC, p_partkey ASC
             ) AS rn,
             count(*) OVER (PARTITION BY p_brand) AS n
      FROM part
    ),
    b AS (
      SELECT p_brand,
             max(CASE WHEN rn = greatest(CAST(1 AS BIGINT),
                        CAST(ceil(n * 5e-2) AS BIGINT))
                      THEN p_retailprice END) AS lo,
             max(CASE WHEN rn = CAST(ceil(n * 95e-2) AS BIGINT)
                      THEN p_retailprice END) AS hi,
             CAST(min(n) AS BIGINT) AS n_parts
      FROM r GROUP BY 1
    )
    SELECT r.p_brand AS brand, b.n_parts, b.lo AS p05, b.hi AS p95,
           round(CAST(sum(CAST(least(greatest(r.p_retailprice, b.lo), b.hi)
                               AS DECIMAL(18,2))) AS DOUBLE)
                 / CAST(b.n_parts AS DOUBLE), 6) AS winsorized_mean
    FROM r JOIN b ON r.p_brand = b.p_brand
    GROUP BY 1, 2, 3, 4
    """,
)
def winsorized_mean_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean price per brand (the outlier-robust mean every
    pricing/quality report wants): clamp to the in-group 5th/95th
    discrete percentiles, then average. DISC selection (an existing
    value at a rank), not interpolation — selection is bit-exact
    cross-engine where interpolated percentiles hit engine-specific
    float expressions. The rank pass is one partitioned window; the
    bound lookup collapses to a per-brand aggregate re-joined (tiny,
    broadcast); the clamped mean is an exact DECIMAL sum with one IEEE
    division."""
    p = t(spark, sf_dir, "part")
    wo = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").asc(), F.col("p_partkey").asc()
    )
    wall = Window.partitionBy("p_brand")
    r = p.select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        F.row_number().over(wo).alias("rn"),
        F.count("*").over(wall).alias("n"),
    )
    lo_rank = F.greatest(
        F.lit(1).cast("bigint"),
        F.ceil(F.col("n") * F.lit(0.05)).cast("bigint"),
    )
    hi_rank = F.ceil(F.col("n") * F.lit(0.95)).cast("bigint")
    b = r.groupBy("p_brand").agg(
        F.max(
            F.when(F.col("rn") == lo_rank, F.col("p_retailprice"))
        ).alias("lo"),
        F.max(
            F.when(F.col("rn") == hi_rank, F.col("p_retailprice"))
        ).alias("hi"),
        F.min("n").cast("bigint").alias("n_parts"),
    )
    clamped = F.least(
        F.greatest(F.col("p_retailprice"), F.col("lo")), F.col("hi")
    )
    return (
        r.join(F.broadcast(b), "p_brand")
        .groupBy(
            F.col("p_brand").alias("brand"),
            "n_parts",
            F.col("lo").alias("p05"),
            F.col("hi").alias("p95"),
        )
        .agg(
            F.round(
                F.sum(clamped.cast("decimal(18,2)")).cast("double")
                / F.col("n_parts").cast("double"),
                6,
            ).alias("winsorized_mean")
        )
        .select("brand", "n_parts", "p05", "p95", "winsorized_mean")
    )


@query(
    "ntile_spend_bands",
    oracle="""
    WITH spend AS (
      SELECT c.c_custkey, c.c_mktsegment AS segment,
             CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS spend
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    banded AS (
      SELECT segment, c_custkey, spend,
             ntile(4) OVER (
               PARTITION BY segment
               ORDER BY spend DESC, c_custkey ASC
             ) AS band
      FROM spend
    )
    SELECT segment, CAST(band AS INTEGER) AS band,
           CAST(count(*) AS BIGINT) AS n_customers,
           min(spend) AS min_spend, max(spend) AS max_spend,
           CAST(sum(CAST(spend AS DECIMAL(18,2))) AS DOUBLE) AS band_spend
    FROM banded GROUP BY 1, 2
    """,
)
def ntile_spend_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer spend quartiles per market segment (NTILE banding — the
    missing member of the repo's window-rank family): per-customer spend
    rollup, NTILE(4) under a TOTAL ordering (spend desc, unique custkey),
    then band-level stats. Scale posture: the window partitions by
    segment so band assignment parallelizes; its input is already the
    per-customer aggregate, never raw orders; spends are exact 2-decimal
    values so the band re-sum stays in DECIMAL."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    spend = (
        c.join(o, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", F.col("c_mktsegment").alias("segment"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("spend")
        )
    )
    w = Window.partitionBy("segment").orderBy(
        F.col("spend").desc(), F.col("c_custkey").asc()
    )
    banded = spend.withColumn("band", F.ntile(4).over(w))
    return banded.groupBy("segment", F.col("band").cast("int").alias("band")).agg(
        F.count("*").cast("bigint").alias("n_customers"),
        F.min("spend").alias("min_spend"),
        F.max("spend").alias("max_spend"),
        F.sum(F.col("spend").cast("decimal(18,2)"))
        .cast("double")
        .alias("band_spend"),
    )


@query(
    "mode_order_priority",
    oracle="""
    WITH cnt AS (
      SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority,
             CAST(count(*) AS BIGINT) AS n
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT segment, priority, n,
             CAST(sum(n) OVER (PARTITION BY segment) AS BIGINT) AS total,
             row_number() OVER (
               PARTITION BY segment ORDER BY n DESC, priority ASC
             ) AS rn
      FROM cnt
    )
    SELECT segment, priority AS modal_priority, n AS n_orders,
           round(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share
    FROM ranked WHERE rn = 1
    """,
)
def mode_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modal order priority per market segment — the MODE() aggregate,
    expressed portably as count + rank (engines disagree on native
    mode()'s tie rules; count desc + value asc is a pinned total
    order). Scale posture: one hash aggregate over the fact, then the
    window runs on the tiny (segment x priority) rollup."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    cnt = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    wt = Window.partitionBy("segment")
    wr = Window.partitionBy("segment").orderBy(
        F.col("n").desc(), F.col("priority").asc()
    )
    return (
        cnt.withColumn("total", F.sum("n").over(wt).cast("bigint"))
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "segment",
            F.col("priority").alias("modal_priority"),
            F.col("n").alias("n_orders"),
            F.round(
                F.col("n").cast("double") / F.col("total").cast("double"), 6
            ).alias("share"),
        )
    )


KMV_K = 256


@query(
    "kmv_user_overlap",
    oracle=f"""
    WITH a AS (
      SELECT DISTINCT md5(concat(CAST(user_id AS VARCHAR), '_',
                                 CAST(CAST(ts AS DATE) AS VARCHAR))) AS h
      FROM events WHERE event_type = 'view'
    ),
    b AS (
      SELECT DISTINCT md5(concat(CAST(user_id AS VARCHAR), '_',
                                 CAST(CAST(ts AS DATE) AS VARCHAR))) AS h
      FROM events WHERE event_type = 'purchase'
    ),
    ska AS (SELECT h FROM a ORDER BY h ASC LIMIT {KMV_K}),
    skb AS (SELECT h FROM b ORDER BY h ASC LIMIT {KMV_K}),
    sku AS (
      SELECT h FROM (SELECT h FROM ska UNION SELECT h FROM skb)
      ORDER BY h ASC LIMIT {KMV_K}
    ),
    hits AS (
      SELECT count(*) AS m FROM sku
      WHERE h IN (SELECT h FROM ska) AND h IN (SELECT h FROM skb)
    ),
    exact AS (
      SELECT CAST((SELECT count(*) FROM a WHERE h IN (SELECT h FROM b))
                  AS BIGINT) AS inter,
             CAST((SELECT count(*)
                   FROM (SELECT h FROM a UNION SELECT h FROM b))
                  AS BIGINT) AS uni
    )
    SELECT CAST({KMV_K} AS INTEGER) AS k,
           round(CAST(hits.m AS DOUBLE) / CAST({KMV_K} AS DOUBLE), 6)
             AS est_jaccard,
           round(CAST(exact.inter AS DOUBLE) / CAST(exact.uni AS DOUBLE), 6)
             AS exact_jaccard,
           CAST(abs(CAST(hits.m AS DOUBLE) / CAST({KMV_K} AS DOUBLE)
                    - CAST(exact.inter AS DOUBLE) / CAST(exact.uni AS DOUBLE))
                <= 2e-1 AS BOOLEAN) AS within_bound
    FROM hits, exact
    """,
)
def kmv_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) sketch Jaccard between the (user, day)
    activity sets of two event types, calibrated against the exact
    answer — the mergeable bottom-k sketch a warehouse keeps per
    partition so cross-corpus overlap never joins the full key sets.
    Determinism: the 'hash' is md5 of the canonical key string (both
    engines emit identical lowercase hex), the sketch is the k
    lexicographically-smallest hashes (a total order — no RNG), and the
    estimate |minK(A u B) ^ minK(A) ^ minK(B)| / k is integer/k. Scale
    posture: each sketch is a TakeOrdered(k) over a hash-distinct
    stream (k rows cross the wire per side); only the exactness
    calibration — the thing this query exists to measure — touches the
    full sets."""
    e = t(spark, sf_dir, "events")

    def hashes(ev: str) -> DataFrame:
        return (
            e.filter(F.col("event_type") == ev)
            .select(
                F.md5(
                    F.concat(
                        F.col("user_id").cast("string"),
                        F.lit("_"),
                        F.col("ts").cast("date").cast("string"),
                    ).cast("binary")
                ).alias("h")
            )
            .distinct()
        )

    a, b = hashes("view"), hashes("purchase")
    ska = a.orderBy(F.col("h").asc()).limit(KMV_K)
    skb = b.orderBy(F.col("h").asc()).limit(KMV_K)
    sku = (
        ska.union(skb).distinct().orderBy(F.col("h").asc()).limit(KMV_K)
    )
    m = (
        sku.join(ska, "h", "left_semi")
        .join(skb, "h", "left_semi")
        .agg(F.count("*").alias("m"))
    )
    exact = (
        a.join(b, "h", "left_semi")
        .agg(F.count("*").cast("bigint").alias("inter"))
        .crossJoin(
            a.union(b)
            .distinct()
            .agg(F.count("*").cast("bigint").alias("uni"))
        )
    )
    est = F.col("m").cast("double") / F.lit(float(KMV_K))
    ex = F.col("inter").cast("double") / F.col("uni").cast("double")
    return m.crossJoin(F.broadcast(exact)).select(
        F.lit(KMV_K).cast("int").alias("k"),
        F.round(est, 6).alias("est_jaccard"),
        F.round(ex, 6).alias("exact_jaccard"),
        (F.abs(est - ex) <= F.lit(0.2)).alias("within_bound"),
    )


@query(
    "spend_gini_by_segment",
    oracle="""
    WITH spend AS (
      SELECT c.c_mktsegment AS segment, c.c_custkey,
             sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS sp
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT segment, sp,
             CAST(row_number() OVER (
               PARTITION BY segment ORDER BY sp ASC, c_custkey ASC
             ) AS BIGINT) AS i
      FROM spend
    )
    SELECT segment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(sp) AS DOUBLE) AS total_spend,
           round(2e0 * CAST(sum(i * sp) AS DOUBLE)
                   / (CAST(count(*) AS DOUBLE) * CAST(sum(sp) AS DOUBLE))
                 - (CAST(count(*) AS DOUBLE) + 1e0)
                   / CAST(count(*) AS DOUBLE), 6) AS gini
    FROM ranked GROUP BY 1
    """,
)
def spend_gini_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend per market segment — the
    inequality index (0 = equal, ->1 = concentrated) computed by the
    rank formula G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n over spends
    sorted ascending. Scale posture: the window ranks the per-customer
    AGGREGATE (never raw orders) partitioned by segment; i*x_i stays in
    exact DECIMAL so both aggregate sums are order-independent, and the
    final Gini is one fixed IEEE expression on identical inputs."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    spend = (
        c.join(o, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), "c_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("sp")
        )
    )
    w = Window.partitionBy("segment").orderBy(
        F.col("sp").asc(), F.col("c_custkey").asc()
    )
    ranked = spend.select(
        "segment", "sp", F.row_number().over(w).cast("bigint").alias("i")
    )
    n = F.count("*").cast("bigint")
    nd = F.count("*").cast("double")
    s0 = F.sum("sp")
    s1 = F.sum(F.col("i") * F.col("sp"))
    return ranked.groupBy("segment").agg(
        n.alias("n_customers"),
        s0.cast("double").alias("total_spend"),
        F.round(
            F.lit(2.0) * s1.cast("double") / (nd * s0.cast("double"))
            - (nd + F.lit(1.0)) / nd,
            6,
        ).alias("gini"),
    )


def _js_term_sql(dialect: str) -> tuple[str, str]:
    """SQL for the two quantized Jensen-Shannon contributions over the
    BIGINT columns (c, d, p_tot, q_tot): with p_i = c/P and q_i = d/Q,
    the mixture ratio p_i/m_i = 2cQ/(cQ+dP) and q_i/m_i = 2dP/(cQ+dP)
    are INTEGER rationals, so each ln goes through the deterministic
    series (functions/detln.py — bit-identical cross-engine), is
    quantized to a 1e9-scaled BIGINT, and weighted by the integer count
    — the same log-domain idiom token_entropy_by_source proved. Ratios
    below 1 swap-and-negate (the series needs num >= den >= 1)."""

    def signed_ln(num: str, den: str) -> str:
        pos = _series_ln_sql(num, den, dialect)
        neg = _series_ln_sql(den, num, dialect)
        return (
            f"(CASE WHEN {num} >= {den} THEN {pos} ELSE -({neg}) END)"
        )

    den = "(c * q_tot + d * p_tot)"
    t_p = (
        "(CASE WHEN c > 0 THEN c * CAST(floor("
        + signed_ln("(2 * c * q_tot)", den)
        + " * 1e9 + 0.5e0) AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    )
    t_q = (
        "(CASE WHEN d > 0 THEN d * CAST(floor("
        + signed_ln("(2 * d * p_tot)", den)
        + " * 1e9 + 0.5e0) AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    )
    return t_p, t_q


_JS_P_SPARK, _JS_Q_SPARK = _js_term_sql("spark")
_JS_P_DUCK, _JS_Q_DUCK = _js_term_sql("duck")

#: Final JS score from the two DECIMAL term sums — ONE textual formula
#: so both engines execute the identical IEEE sequence.
_JS_SCORE = (
    "round((CAST({sp} AS DOUBLE) / (2e0 * CAST({p} AS DOUBLE))"
    " + CAST({sq} AS DOUBLE) / (2e0 * CAST({q} AS DOUBLE))) / 1e9, 6)"
)


@query(
    "token_js_divergence_by_source",
    oracle=f"""
    WITH tk AS (
      SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    cnt AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
            FROM tk GROUP BY 1, 2),
    g AS (SELECT tok, CAST(sum(c) AS BIGINT) AS gc FROM cnt GROUP BY 1),
    tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS p_tot
            FROM cnt GROUP BY 1),
    gt AS (SELECT CAST(sum(gc) AS BIGINT) AS g_tot FROM g),
    rows_ AS (
      SELECT tot.source, tot.p_tot,
             gt.g_tot - tot.p_tot AS q_tot,
             coalesce(cnt.c, CAST(0 AS BIGINT)) AS c,
             g.gc - coalesce(cnt.c, CAST(0 AS BIGINT)) AS d
      FROM tot CROSS JOIN gt CROSS JOIN g
      LEFT JOIN cnt ON cnt.source = tot.source AND cnt.tok = g.tok
      WHERE gt.g_tot > tot.p_tot
    ),
    terms AS (
      SELECT source, p_tot, q_tot,
             {_JS_P_DUCK} AS tp, {_JS_Q_DUCK} AS tq
      FROM rows_
    )
    SELECT source, CAST(min(p_tot) AS BIGINT) AS n_tokens,
           {_JS_SCORE.format(
               sp="sum(CAST(tp AS DECIMAL(38,0)))",
               sq="sum(CAST(tq AS DECIMAL(38,0)))",
               p="min(p_tot)", q="min(q_tot)")} AS js_divergence
    FROM terms GROUP BY 1
    """,
)
def token_js_divergence_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Jensen-Shannon divergence (nats) between each source's unigram
    distribution and the REST of the corpus — the symmetric, bounded
    drift score curation pipelines use to flag a source whose text
    stopped looking like the rest (JS, unlike KL, tolerates tokens the
    other side lacks). Every logarithm is the deterministic series over
    an integer rational, quantized to 1e9-scaled BIGINTs and summed in
    DECIMAL — associative, so partitioning-independent — with the final
    score one fixed IEEE formula (see token_entropy_by_source). Scale
    posture: one token hash-aggregate, a vocab-sized global rollup, and
    a (sources x vocab) enumeration joined on (source, tok) — the
    corpus text itself is read once and never re-shuffles; BIGINT
    products c*Q hold to ~1e18 (past that the quantized contributions
    move to DECIMAL, same plan)."""
    docs = t(spark, sf_dir, "documents")
    tk = docs.select(
        "source", F.explode(F.split("text", " ")).alias("tok")
    )
    cnt = tk.groupBy("source", "tok").agg(
        F.count("*").cast("bigint").alias("c")
    )
    from ..cache import tracked_persist

    g = tracked_persist(
        cnt.groupBy("tok").agg(F.sum("c").cast("bigint").alias("gc"))
    )
    tot = cnt.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("p_tot")
    )
    g_tot = g.agg(F.sum("gc").cast("bigint").alias("g_tot"))
    rows = (
        tot.crossJoin(F.broadcast(g_tot))
        .filter(F.col("g_tot") > F.col("p_tot"))
        .crossJoin(g)
        .join(cnt, ["source", "tok"], "left")
        .select(
            "source",
            "p_tot",
            (F.col("g_tot") - F.col("p_tot")).alias("q_tot"),
            F.coalesce(F.col("c"), F.lit(0).cast("bigint")).alias("c"),
            (
                F.col("gc")
                - F.coalesce(F.col("c"), F.lit(0).cast("bigint"))
            ).alias("d"),
        )
    )
    terms = rows.select(
        "source",
        "p_tot",
        "q_tot",
        F.expr(_JS_P_SPARK).alias("tp"),
        F.expr(_JS_Q_SPARK).alias("tq"),
    )
    return terms.groupBy("source").agg(
        F.min("p_tot").cast("bigint").alias("n_tokens"),
        F.expr(
            _JS_SCORE.format(
                sp="sum(CAST(tp AS DECIMAL(38,0)))",
                sq="sum(CAST(tq AS DECIMAL(38,0)))",
                p="min(p_tot)",
                q="min(q_tot)",
            )
        ).alias("js_divergence"),
    )


from .dedup import (  # noqa: E402
    _SIMHASH_BAND_BUDGET_CTE,
    _SIMHASH_SIG_CTE,
    SIMHASH_BANDS,
    SIMHASH_BUDGET_DEN,
    SIMHASH_BUDGET_NUM,
)

SIMHASH_HIST_BANDS = SIMHASH_BANDS  # 16-bit bands -> pigeonhole to hamming 3


@query(
    "simhash_hamming_histogram",
    oracle=f"""
    WITH {_SIMHASH_SIG_CTE},
    {_SIMHASH_BAND_BUDGET_CTE}
    SELECT hamming, CAST(count(*) AS BIGINT) AS n_pairs
    FROM dist WHERE hamming <= {SIMHASH_HIST_BANDS - 1}
    GROUP BY 1
    """,
)
def simhash_hamming_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-distance distribution of SimHash candidate pairs — the
    calibration report that tells an operator where to SET the near-dup
    threshold (a cliff in the histogram separates true near-dups from
    the background). Banding at 4x16-bit keeps the lossless pigeonhole
    window at hamming <= 3 with ~N/65536 per bucket (the 8x8-bit draft's
    256-value bands put ~N/256 rows in every bucket — measured 93 s at
    sf1 vs 3 s re-banded), one band-keyed equi-join under the adaptive
    incidence budget (queries/dedup.py SIMHASH_BUDGET note — no bind at
    sf0.01, candidate growth capped to ~10x per 10x rows beyond), exact
    16-nibble JVM popcount verify — identical machinery to
    dedup_simhash_pairs, pointed at observability instead of filtering."""
    from ..extensions.dedup import simhash64_text, simhash_near_dup_pairs

    docs = t(spark, sf_dir, "documents")
    sig = simhash64_text(docs, "doc_id", "text")
    pairs = simhash_near_dup_pairs(
        sig,
        "doc_id",
        max_hamming=SIMHASH_HIST_BANDS - 1,
        n_bands=SIMHASH_HIST_BANDS,
        budget=(SIMHASH_BUDGET_NUM, SIMHASH_BUDGET_DEN),
    )
    return pairs.groupBy("hamming").agg(
        F.count("*").cast("bigint").alias("n_pairs")
    )


@query(
    "second_max_price_gap",
    oracle="""
    WITH m1 AS (
      SELECT p_brand, max(p_retailprice) AS top_price FROM part GROUP BY 1
    ),
    m2 AS (
      SELECT p.p_brand, max(p.p_retailprice) AS runner_up
      FROM part p JOIN m1 ON p.p_brand = m1.p_brand
      WHERE p.p_retailprice < m1.top_price
      GROUP BY 1
    )
    SELECT m1.p_brand AS brand, m1.top_price, m2.runner_up,
           CAST(round(CAST(m1.top_price AS DECIMAL(18,2))
                      - CAST(m2.runner_up AS DECIMAL(18,2)), 2)
                AS DOUBLE) AS gap
    FROM m1 JOIN m2 ON m1.p_brand = m2.p_brand
    """,
)
def second_max_price_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1 vs runner-up price gap per brand (the margin-to-next
    leaderboard question) WITHOUT a rank window over raw rows: two hash
    aggregates — max, then max-below-max after a broadcast re-join —
    both map-side combinable, where the window formulation sorts every
    group. DISTINCT-safe: ties at the top make the runner-up the next
    strictly-lower price, a pinned definition both engines replay."""
    p = t(spark, sf_dir, "part")
    m1 = p.groupBy("p_brand").agg(F.max("p_retailprice").alias("top_price"))
    m2 = (
        p.join(F.broadcast(m1), "p_brand")
        .filter(F.col("p_retailprice") < F.col("top_price"))
        .groupBy("p_brand")
        .agg(F.max("p_retailprice").alias("runner_up"))
    )
    return (
        m1.join(m2, "p_brand")
        .select(
            F.col("p_brand").alias("brand"),
            "top_price",
            "runner_up",
            F.round(
                F.col("top_price").cast("decimal(18,2)")
                - F.col("runner_up").cast("decimal(18,2)"),
                2,
            )
            .cast("double")
            .alias("gap"),
        )
    )


@query(
    "label_feature_anova",
    oracle="""
    WITH v AS (
      SELECT label,
             CAST(floor(CAST(embedding[1] AS DOUBLE) * 1e9 + 0.5e0)
                  AS BIGINT) AS x
      FROM embeddings
    ),
    g AS (
      SELECT label, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS DECIMAL(38,0)) AS sx,
             CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx
      FROM v GROUP BY 1
    ),
    gm AS (
      SELECT label, n, sx, sxx,
             CAST(floor(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT)
               AS m
      FROM g
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n) AS BIGINT) AS n_all,
             CAST(floor(CAST(sum(sx) AS DOUBLE)
                        / CAST(sum(n) AS DOUBLE)) AS BIGINT) AS m_all
      FROM gm
    ),
    parts AS (
      SELECT gm.n, gm.m, tot.k, tot.n_all, tot.m_all,
             CAST(gm.n AS DECIMAL(38,0)) * (gm.m - tot.m_all)
               * (gm.m - tot.m_all) AS ssb_i,
             gm.sxx - 2 * CAST(gm.m AS DECIMAL(38,0)) * gm.sx
               + CAST(gm.n AS DECIMAL(38,0)) * gm.m * gm.m AS ssw_i
      FROM gm CROSS JOIN tot
    )
    SELECT CAST(min(k) AS INTEGER) AS n_labels,
           min(n_all) AS n_vectors,
           round(CAST(sum(ssb_i) AS DOUBLE) / 1e18, 6) AS ss_between,
           round(CAST(sum(ssw_i) AS DOUBLE) / 1e18, 6) AS ss_within,
           round((CAST(sum(ssb_i) AS DOUBLE) / (CAST(min(k) AS DOUBLE) - 1e0))
                 / (CAST(sum(ssw_i) AS DOUBLE)
                    / (CAST(min(n_all) AS DOUBLE)
                       - CAST(min(k) AS DOUBLE))), 6) AS f_stat
    FROM parts
    """,
)
def label_feature_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of a scalar embedding feature (the first
    dimension; the norm is degenerate on unit-normalized vectors)
    across labels — the screening statistic for "does this feature
    separate the classes at all" (F >> 1 = between-label variance
    dominates). Cross-engine determinism: values quantize to
    1e9-scaled BIGINTs, group means
    quantize to the integer grid via one identical floor(double)
    division, and BOTH sums of squares are then pure integer (DECIMAL)
    arithmetic — associative, partitioning-independent — where the
    textbook ss_groups - correction form subtracts two ~1e24 doubles
    whose float-summation order differs per engine (catastrophic
    cancellation; the first draft of this query proved it). One
    aggregate over the vectors, one over the label rollup."""
    from ..extensions.similarity import dot

    e = t(spark, sf_dir, "embeddings")
    v = e.select(
        "label",
        F.floor(
            F.col("embedding")[0].cast("double") * F.lit(1e9) + F.lit(0.5)
        )
        .cast("bigint")
        .alias("x"),
    )
    g = v.groupBy("label").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
        .cast("decimal(38,0)")
        .alias("sxx"),
    )
    gm = g.withColumn(
        "m",
        F.floor(F.col("sx").cast("double") / F.col("n").cast("double"))
        .cast("bigint"),
    )
    tot = gm.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("n_all"),
        F.floor(
            F.sum("sx").cast("double") / F.sum("n").cast("double")
        )
        .cast("bigint")
        .alias("m_all"),
    )
    parts = gm.crossJoin(F.broadcast(tot)).select(
        "k",
        "n_all",
        (
            F.col("n").cast("decimal(38,0)")
            * (F.col("m") - F.col("m_all"))
            * (F.col("m") - F.col("m_all"))
        ).alias("ssb_i"),
        (
            F.col("sxx")
            - F.lit(2) * F.col("m").cast("decimal(38,0)") * F.col("sx")
            + F.col("n").cast("decimal(38,0)") * F.col("m") * F.col("m")
        ).alias("ssw_i"),
    )
    kd = F.min("k").cast("double")
    nd = F.min("n_all").cast("double")
    return parts.agg(
        F.min("k").cast("int").alias("n_labels"),
        F.min("n_all").alias("n_vectors"),
        F.round(F.sum("ssb_i").cast("double") / F.lit(1e18), 6).alias(
            "ss_between"
        ),
        F.round(F.sum("ssw_i").cast("double") / F.lit(1e18), 6).alias(
            "ss_within"
        ),
        F.round(
            (F.sum("ssb_i").cast("double") / (kd - F.lit(1.0)))
            / (F.sum("ssw_i").cast("double") / (nd - kd)),
            6,
        ).alias("f_stat"),
    )

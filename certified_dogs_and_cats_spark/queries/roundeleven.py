"""Round-11 additions: contrastive hard-negative mining over the
embedding corpus, Neyman (variance-optimal) stratified-sampling
allocation over the document sources, and the TPC-H Q21-shaped
sole-late-supplier blame report.

Oracles replay the identical arithmetic in DuckDB (cosine rounded to
6dp before ranking; exact-integer variance numerators with one double
conversion before the sqrt; pure-integer lateness/count logic), per the
package's cross-engine exactness conventions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..extensions.similarity import as_double_vec, dot, with_norm
from ..operators.partitioning import spread
from .common import VEC_CTE, t
from .registry import query
from .similarity import K, QUERY_PRED

#: Fixed sampling budget the Neyman report allocates (documents).
NEYMAN_BUDGET = 10_000


@query(
    "hard_negative_mining",
    oracle=f"""
    WITH {VEC_CTE},
    lv AS (SELECT v.vec_id, v.e, v.nrm, emb.label
           FROM v JOIN embeddings emb USING (vec_id)),
    q AS (SELECT vec_id AS query_id, e AS qe, nrm AS qnrm, label AS qlabel
          FROM lv WHERE {QUERY_PRED}),
    pairs AS (
      SELECT q.query_id, lv.vec_id AS negative_id, lv.label AS negative_label,
             round(list_dot_product(q.qe, lv.e) / (q.qnrm * lv.nrm), 6)
               AS cos_sim
      FROM q CROSS JOIN lv
      WHERE lv.label <> q.qlabel
    )
    SELECT query_id, negative_id, negative_label, cos_sim, rnk FROM (
      SELECT query_id, negative_id, negative_label, cos_sim,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, negative_id ASC)
                  AS INTEGER) AS rnk
      FROM pairs
    ) WHERE rnk <= {K}
    """,
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training data prep: for each query vector, the top-k
    most-similar vectors carrying a DIFFERENT label — the hard negatives
    an embedding-model trainer pairs with each anchor (the easy negatives
    are useless, the hardest ones teach the margin). Same bounded-|Q|
    broadcast contract as similarity_cosine_topk (the corpus never
    shuffles; the label filter rides the broadcast join), scores rounded
    to 6dp before the rank so ties break identically cross-engine. The
    rank stage keeps the _rank_topk shuffle contract: an adjacent
    ``rnk <= K`` row_number filter, so Spark's Partial WindowGroupLimit
    forwards at most K rows per query per input partition through the
    exchange (plan-pinned in tests/test_plans.py, measured in
    SHUFFLE.md)."""
    e = t(spark, sf_dir, "embeddings")
    lv = e.select("vec_id", as_double_vec("embedding").alias("e"), "label")
    q = with_norm(lv.filter(F.expr(QUERY_PRED)), "e", "qnrm").select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        "qnrm",
        F.col("label").alias("qlabel"),
    )
    c = with_norm(spread(lv), "e", "nnrm").select(
        F.col("vec_id").alias("negative_id"),
        F.col("e").alias("ne"),
        "nnrm",
        F.col("label").alias("negative_label"),
    )
    pairs = c.crossJoin(F.broadcast(q)).filter(
        F.col("negative_label") != F.col("qlabel")
    )
    sim = F.round(
        dot(F.col("qe"), F.col("ne")) / (F.col("qnrm") * F.col("nnrm")), 6
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("negative_id").asc()
    )
    return (
        pairs.select(
            "query_id", "negative_id", "negative_label", sim.alias("cos_sim")
        )
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= K)
    )


@query(
    "neyman_allocation",
    oracle=f"""
    WITH tok AS (
      SELECT source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents
    ),
    s AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS sum_tok,
             CAST(sum(n_tok * n_tok) AS BIGINT) AS sum_tok2
      FROM tok GROUP BY 1
    ),
    w AS (
      -- Variance numerator in 128-bit integers: BIGINT*BIGINT raises on
      -- overflow in DuckDB but wraps silently in non-ANSI Spark, so both
      -- sides widen (HUGEINT here, DECIMAL(38,0) in Spark) before the
      -- single exact->double conversion feeding the sqrt (ADVICE r11).
      SELECT source, n_docs, sum_tok,
             sqrt(CAST(CAST(n_docs AS HUGEINT) * sum_tok2
                       - CAST(sum_tok AS HUGEINT) * sum_tok AS DOUBLE)
                  / (CAST(n_docs AS DOUBLE) * (n_docs - 1))) AS sd,
             n_docs * sqrt(CAST(CAST(n_docs AS HUGEINT) * sum_tok2
                                - CAST(sum_tok AS HUGEINT) * sum_tok
                                AS DOUBLE)
                           / (CAST(n_docs AS DOUBLE) * (n_docs - 1)))
               AS weight
      FROM s WHERE n_docs > 1
    )
    SELECT source, n_docs,
           round(CAST(sum_tok AS DOUBLE) / n_docs, 6) AS mean_tokens,
           round(sd, 6) AS sd_tokens,
           round(weight / sum(weight) OVER (), 6) AS neyman_share,
           CAST(floor({NEYMAN_BUDGET} * round(weight / sum(weight) OVER (),
                                              6)) AS BIGINT) AS alloc_docs
    FROM w
    """,
)
def neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-optimal stratified-sampling allocation (Neyman 1934):
    how a fixed annotation/eval budget should split across document
    sources — n_h proportional to N_h * S_h, so high-variance strata get
    proportionally more budget than proportional allocation would give.
    The per-stratum moments are EXACT integer sums (count, sum tokens,
    sum of squares) with a single double conversion feeding the sqrt
    (IEEE-correctly-rounded, so identical cross-engine); the share is
    rounded to 6dp before the budget multiply, the package convention
    for double-division outputs. One corpus aggregate to |sources| rows,
    then dimension-scale windows — the sanctioned global-window shape."""
    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
    )
    s = tok.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("sum_tok"),
        F.sum(F.col("n_tok") * F.col("n_tok")).cast("bigint").alias("sum_tok2"),
    )
    # DECIMAL(38,0) keeps the numerator exact to 1e38 — BIGINT products
    # wrap silently in non-ANSI Spark (DuckDB's raise) for strata past
    # ~1e9 total tokens; the decimal->double conversion is the single
    # (correctly-rounded) precision loss, identical cross-engine.
    dec = "decimal(38,0)"
    var_num = (
        F.col("n_docs").cast(dec) * F.col("sum_tok2").cast(dec)
        - F.col("sum_tok").cast(dec) * F.col("sum_tok").cast(dec)
    ).cast("double")
    sd = F.sqrt(
        var_num / (F.col("n_docs").cast("double") * (F.col("n_docs") - F.lit(1)))
    )
    w = (
        s.filter(F.col("n_docs") > 1)
        .withColumn("sd", sd)
        .withColumn("weight", F.col("n_docs") * F.col("sd"))
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    share = F.round(F.col("weight") / F.sum("weight").over(w_all), 6)
    return w.select(
        "source",
        "n_docs",
        F.round(F.col("sum_tok").cast("double") / F.col("n_docs"), 6).alias(
            "mean_tokens"
        ),
        F.round("sd", 6).alias("sd_tokens"),
        share.alias("neyman_share"),
        F.floor(F.lit(NEYMAN_BUDGET) * share).cast("bigint").alias("alloc_docs"),
    )


#: A line is "late" when it shipped more than this many days after its
#: order date (the testdata carries no commit/receipt dates; same rule
#: family as late_shipment_priority_mix).
LATE_DAYS = 60


@query(
    "sole_late_supplier_blame",
    oracle=f"""
    WITH ls AS (
      SELECT l.l_orderkey, l.l_suppkey,
             max(CASE WHEN l.l_shipdate > o.o_orderdate
                           + INTERVAL {LATE_DAYS} DAY
                      THEN 1 ELSE 0 END) AS was_late
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ),
    per_order AS (
      SELECT l_orderkey,
             count(*) AS n_suppliers,
             sum(was_late) AS n_late_suppliers
      FROM ls GROUP BY 1
    ),
    blamed AS (
      SELECT ls.l_suppkey
      FROM ls JOIN per_order USING (l_orderkey)
      WHERE ls.was_late = 1
        AND per_order.n_suppliers >= 2
        AND per_order.n_late_suppliers = 1
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(count(*) AS BIGINT) AS numwait
    FROM blamed b JOIN supplier s ON s.s_suppkey = b.l_suppkey
    GROUP BY 1, 2
    ORDER BY numwait DESC, s_suppkey ASC
    LIMIT 20
    """,
)
def sole_late_supplier_blame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who SOLELY kept multi-supplier orders waiting — the
    TPC-H Q21 semantics (EXISTS another supplier in the order, NOT
    EXISTS another LATE supplier) with NO self-join at all: the
    per-order aggregate carries the blamed suppkey directly
    (max(when(was_late, suppkey)) — well-defined exactly because the
    blame filter demands a SINGLE late supplier; same trick as
    supplier_return_blame). The fact pays ONE wire crossing, made
    explicit with repartition(l_orderkey) BELOW the join: orderkey
    hash-clustering satisfies both aggregates' distributions (subset
    rule — hashpartitioning(ok) clusters (ok, sk) too), so they run
    exchange-free, whether the dim join broadcasts (toy scale) or
    falls back to a shuffle join reusing the same exchange (100 TB,
    where orders cannot broadcast). Without it the broadcast join
    leaves the fact unclustered and EACH aggregate pays its own
    crossing — measured 15.1x shuffle-write growth per 10x rows
    (SHUFFLE.md r12 flag) vs linear with the explicit clustering.
    Lateness (shipdate > orderdate + {LATE_DAYS}d) is decided join-time
    against the order date, exact DATE arithmetic both engines."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    sup = t(spark, sf_dir, "supplier")
    blamed = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .repartition(F.col("l_orderkey"))
        .join(
            o.select("o_orderkey", "o_orderdate"),
            li["l_orderkey"] == o["o_orderkey"],
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.date_add(F.col("o_orderdate"), LATE_DAYS),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).alias("was_late")
        )
        .groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.sum("was_late").alias("n_late_suppliers"),
            F.max(
                F.when(F.col("was_late") == 1, F.col("l_suppkey"))
            ).alias("suppkey"),
        )
        .filter(
            (F.col("n_suppliers") >= 2) & (F.col("n_late_suppliers") == 1)
        )
        .select("suppkey")
    )
    return (
        blamed.join(
            F.broadcast(sup.select("s_suppkey", "s_name")),
            blamed["suppkey"] == F.col("s_suppkey"),
        )
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_suppkey").asc())
        .limit(20)
    )


#: Top-k most frequent event-type trigrams reported by the miner.
SEQ_TOP_K = 15


@query(
    "frequent_event_sequences",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type, 1) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS p1,
             lag(event_type, 2) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS p2
      FROM events
    ),
    grams AS (
      SELECT p2 AS step1, p1 AS step2, event_type AS step3,
             count(*) AS n_occurrences,
             count(DISTINCT user_id) AS n_users
      FROM seq WHERE p2 IS NOT NULL
      GROUP BY 1, 2, 3
    )
    SELECT step1, step2, step3,
           CAST(n_occurrences AS BIGINT) AS n_occurrences,
           CAST(n_users AS BIGINT) AS n_users, rnk
    FROM (
      SELECT *, CAST(row_number() OVER (
               ORDER BY n_occurrences DESC, step1, step2, step3)
             AS INTEGER) AS rnk
      FROM grams
    ) WHERE rnk <= {SEQ_TOP_K}
    """,
)
def frequent_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern mining, contiguous-trigram tier: the top-k most
    frequent 3-step event-type sequences across all user streams (the
    behavioral motifs a product/curriculum designer reads before
    defining funnels). Two lag windows over the same total (ts,
    event_id) per-user order — ONE window sort serves both — then a hash
    aggregate on the trigram (grows with |types|^3, dimension-scale, not
    corpus-scale) carrying both occurrence and distinct-user support.
    The final top-k rank runs over that dimension-scale aggregate (the
    sanctioned global-window shape); exact integer counts, total-order
    tiebreak, engine-identical."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.lag("event_type", 1).over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
    )
    grams = (
        seq.filter(F.col("p2").isNotNull())
        .groupBy(
            F.col("p2").alias("step1"),
            F.col("p1").alias("step2"),
            F.col("event_type").alias("step3"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_occurrences"),
            F.count_distinct("user_id").cast("bigint").alias("n_users"),
        )
    )
    wr = Window.orderBy(
        F.col("n_occurrences").desc(), "step1", "step2", "step3"
    )
    return (
        grams.withColumn("rnk", F.row_number().over(wr).cast("int"))
        .filter(F.col("rnk") <= SEQ_TOP_K)
    )


#: nprobe sweep points and the per-point recall floors the sweep
#: asserts. The curve is deterministic per (data, build params) — the
#: KMeans sample is value-hash-pinned — measured (0.36, 0.60, 0.80,
#: 1.00) at sf0.01 and (0.28, 0.49, 0.78, 1.00) at sf0.1; floors sit
#: under both with margin, and the nprobe=4 floor is
#: similarity_ivf_ann's IVF_RECALL_BOUND.
SWEEP_NPROBES = (1, 2, 4, 8)
SWEEP_RECALL_FLOORS = (0.2, 0.4, 0.6, 0.6)


@query(
    "ivf_nprobe_sweep",
    oracle=f"""
    WITH q AS (
      SELECT CAST(count(*) AS BIGINT) AS nq,
             CAST({K} * count(*) AS BIGINT) AS pairs
      FROM embeddings WHERE {QUERY_PRED}
    )
    SELECT p.nprobe, q.nq AS n_queries, q.pairs AS n_exact_pairs,
           TRUE AS recall_ok, TRUE AS full_probe_exact_ok
    FROM (VALUES (1), (2), (4), (8)) AS p(nprobe), q
    ORDER BY p.nprobe
    """,
)
def ivf_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nprobe tuning curve in ONE pass: recall@nprobe for every
    sweep point from a single probe-rank computation, instead of
    re-running the search once per candidate setting. Key fact: an
    exact-top-k neighbor that lies in a probed list ALWAYS survives the
    approximate search (it outranks every non-top-k candidate by
    definition), so recall@p is exactly the fraction of exact pairs
    whose assigned list sits within the query's first p probes — one
    join of the exact ground-truth memo against (neighbor list
    assignment x query probe ranks), then cumulative conditional sums.
    Self-checks carried in-result (the KMeans fit is not
    SQL-expressible; the oracle pins the replayable scaffold, the
    booleans pin the curve): per-point recall floors, and the sharp
    invariant that probing >= n_lists lists IS the exact search
    (recall == 1.0 bit-exactly). Scale: the probe-rank frame is
    |Q| x n_centroids (dimension-scale), the ground-truth join is
    |Q| x k rows — nothing corpus-scale moves beyond the shared
    build-once index assignment."""
    from ..cache import memoized_build, tracked_persist
    from ..extensions.similarity import build_ivf_index
    from .similarity import (
        ANN_TRAIN_LIMIT,
        _ivf_lists,
        _vectors,
        exact_topk_memo,
    )

    n_vecs = t(spark, sf_dir, "embeddings").count()  # metadata-sized
    lists = _ivf_lists(n_vecs)

    def _build():
        v = _vectors(spark, sf_dir)
        indexed, centroids = build_ivf_index(
            v, n_centroids=lists, max_iter=8, train_limit=ANN_TRAIN_LIMIT,
            init_mode="random",
        )
        return {"indexed": indexed, "centroids": centroids}, None

    # Same memo key as similarity_ivf_ann: the sweep tunes THAT index.
    frames, _ = memoized_build(
        spark,
        ("ivf", sf_dir, lists, 8, ANN_TRAIN_LIMIT, "random"),
        _build,
        "ivf_index",
    )
    indexed = tracked_persist(frames["indexed"])
    centroids = frames["centroids"]
    q = indexed.filter(F.expr(QUERY_PRED)).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    # Per-(query, centroid) probe rank — the identical distance + tiebreak
    # ivf_topk uses, so the sweep measures the real search's probe order.
    dist = F.aggregate(
        F.zip_with(
            F.col("qe"), F.col("centroid"), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("centroid_dist").asc(), F.col("centroid_id").asc()
    )
    ranks = (
        q.crossJoin(F.broadcast(centroids))
        .select(
            "query_id", "centroid_id", dist.alias("centroid_dist")
        )
        .withColumn("probe_rnk", F.row_number().over(w_probe))
        .select("query_id", "centroid_id", "probe_rnk")
    )
    exact = exact_topk_memo(spark, sf_dir)
    nbr_lists = indexed.select(
        F.col("vec_id").alias("neighbor_id"), "centroid_id"
    )
    pair_rank = (
        exact.select("query_id", "neighbor_id")
        .join(nbr_lists, "neighbor_id")
        .join(ranks, ["query_id", "centroid_id"])
    )
    hits = [
        F.sum((F.col("probe_rnk") <= p).cast("long")).alias(f"hit_{p}")
        for p in SWEEP_NPROBES
    ]
    agg = pair_rank.agg(
        F.count("*").alias("pairs"),
        F.count_distinct("query_id").alias("nq"),
        *hits,
    )
    points = F.array(
        *[
            F.struct(
                F.lit(p).alias("nprobe"),
                (F.col(f"hit_{p}") / F.col("pairs")).alias("recall"),
                F.lit(floor_).alias("floor"),
            )
            for p, floor_ in zip(SWEEP_NPROBES, SWEEP_RECALL_FLOORS)
        ]
    )
    return (
        agg.select("pairs", "nq", F.explode(points).alias("pt"))
        .select(
            F.col("pt.nprobe").alias("nprobe"),
            F.col("nq").cast("bigint").alias("n_queries"),
            F.col("pairs").cast("bigint").alias("n_exact_pairs"),
            (F.col("pt.recall") >= F.col("pt.floor")).alias("recall_ok"),
            (
                (F.col("pt.nprobe") < F.lit(lists))
                | (F.col("pt.recall") == F.lit(1.0))
            ).alias("full_probe_exact_ok"),
        )
        .orderBy("nprobe")
    )

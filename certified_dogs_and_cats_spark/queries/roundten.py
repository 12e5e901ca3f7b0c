"""Round-10 registrations (SURVEY §7.5a queue): A-ES weighted
reservoir sampling, the mergeable KMV sketch rollup round-trip,
incremental-arrival decontamination, and the fill-forward gap report.

Each follows the repo's cross-engine determinism conventions: hashes
from the md5 60-bit grid, transcendentals through functions.detln (one
IEEE DAG both engines execute identically), timestamps at microsecond
precision (``unix_micros`` / ``epoch_us``), and every computed column
aliased identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..extensions.incidence import budget_filter, cap_ctes_sql
from ..extensions.reservoir import GRID_BITS, weighted_sample
from ..extensions.sampling import hash_split
from ..extensions.sketches import kmv_rollup
from ..extensions.text import winnow_fingerprints
from ..functions.detln import series_ln_sql
from .common import t
from .registry import query
from .winnow import _FP_CTE, K, MIN_SHARED, W

RESERVOIR_K = 25

#: DuckDB replay of extensions.reservoir.aes_key: h = md5-60bit(id),
#: u = (2h+1)/2^61, key = ln(u)/w = -series_ln(2^61, 2h+1)/w — the same
#: detln IEEE DAG Spark executes, so the double keys are bit-identical.
_DUCK_KEY = (
    "-("
    + series_ln_sql(str(1 << (GRID_BITS + 1)), "_den", "duck")
    + ") / weight"
)


@query(
    "weighted_reservoir_sample",
    oracle=f"""
    WITH h AS (
      SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS weight,
             (2 * ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)),
                                  1, 15))::BIGINT + 1) AS _den
      FROM customer WHERE c_acctbal > 0
    ),
    keyed AS (
      SELECT c_custkey, weight, {_DUCK_KEY} AS sample_key FROM h
    )
    SELECT c_custkey AS custkey, weight, sample_key
    FROM keyed
    ORDER BY sample_key DESC, c_custkey ASC
    LIMIT {RESERVOIR_K}
    """,
)
def weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ES weighted sampling without replacement (Efraimidis-Spirtakis):
    keep the k largest ``ln(u)/w`` keys, u a deterministic md5-grid
    uniform per row. The distributed plan is the whole point: the key is
    a pure per-row projection and top-k is TakeOrdered — per-partition
    partial top-k, driver-side merge of k rows per partition — NO corpus
    shuffle, no reservoir state, identical output at any partitioning
    (pinned by tests/test_reservoir.py). The key's one transcendental is
    the detln series-ln, so the double keys — not just the selection —
    hash-match DuckDB bit-for-bit."""
    c = t(spark, sf_dir, "customer")
    return weighted_sample(
        c, "c_custkey", "c_acctbal", RESERVOIR_K
    ).select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_acctbal").cast("double").alias("weight"),
        "sample_key",
    )


KMV_K = 256
KMV_SHARDS = 16
#: 2^60 and (k-1)*2^60 are exact doubles (mantissa k-1, exponent 60).
_KMV_EST = (
    f"CAST(floor({KMV_K - 1}e0 * {float(1 << GRID_BITS)!r} "
    f"/ CAST(kth AS DOUBLE)) AS BIGINT)"
)


@query(
    "kmv_distinct_rollup",
    oracle=f"""
    WITH ex AS (
      SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS exact_distinct
      FROM (SELECT DISTINCT o_orderpriority, o_custkey FROM orders)
      GROUP BY 1
    ),
    h AS (
      SELECT DISTINCT o_orderpriority,
             ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)),
                             1, 15))::BIGINT AS h
      FROM orders
    ),
    r AS (
      SELECT o_orderpriority, h,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY h ASC) AS rn
      FROM h
    ),
    agg AS (
      SELECT o_orderpriority,
             CAST(count(*) AS BIGINT) AS n_distinct,
             max(CASE WHEN rn = {KMV_K} THEN h END) AS kth
      FROM r GROUP BY 1
    ),
    est AS (
      SELECT o_orderpriority,
             CASE WHEN n_distinct < {KMV_K} THEN n_distinct
                  ELSE {_KMV_EST} END AS kmv_estimate
      FROM agg
    )
    SELECT est.o_orderpriority AS priority, kmv_estimate,
           ex.exact_distinct,
           CAST(round(CAST(kmv_estimate - ex.exact_distinct AS DOUBLE)
                      * 1000e0 / CAST(ex.exact_distinct AS DOUBLE))
                AS BIGINT) AS err_permille
    FROM est JOIN ex USING (o_orderpriority)
    """,
)
def kmv_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketch round-trip, self-verified against
    exact: per-shard KMV sketches (k smallest md5-grid hashes of
    o_custkey per priority, 16 hash-derived shards standing in for
    per-partition/per-day builders), serialized to BINARY and decoded
    back (the state-table wire format), merged losslessly, estimated
    with the (k-1)*2^60/h_(k) estimator. The oracle computes the SAME
    estimate directly from the k-th smallest distinct hash (and the
    exact count from distinct raw ITEMS — the two differ if the 60-bit
    grid ever collides, so the oracle must not conflate them) — a green
    row therefore proves the shard/serialize/decode/merge pipeline is
    exactly the identity KMV theory says it is. Complements the two
    existing sketch registrations: sketch_union_rollup (queries/core.py)
    merges the engine's HLL but can only hash-pin a VERDICT (HLL state
    is engine-private), and kmv_user_overlap (queries/advanced.py) is a
    global string-ordered bottom-k for Jaccard — this one pins the
    grouped integer ESTIMATOR and the BINARY wire format themselves.
    Scale shape: one distinct on (group, hash) — map-side combinable —
    then k rows per (group, shard) onward."""
    o = t(spark, sf_dir, "orders")
    return kmv_rollup(
        o, ["o_orderpriority"], "o_custkey", k=KMV_K, n_shards=KMV_SHARDS
    ).select(
        F.col("o_orderpriority").alias("priority"),
        "kmv_estimate",
        "exact_distinct",
        "err_permille",
    )


DECON_BATCHES = 4
DECON_CURRENT_BATCH = 3
#: Arrival-batch assignment: salted md5 bucket, independent of the
#: train/eval split hash (different preimage prefix).
_BATCH_SQL = (
    "(('0x' || substr(md5('b|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"
    f" % {DECON_BATCHES})"
)


def decon_batch_col(id_col) -> "F.Column":
    """Spark twin of ``_BATCH_SQL`` — THE arrival-batch assignment,
    shared with scripts/shuffle_report.py's incidence accounting so the
    probe can never measure a different batch than the query checks."""
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("b|"), id_col.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint"),
        F.lit(DECON_BATCHES),
    )


@query(
    "incremental_decontamination",
    oracle=f"""
    WITH
    {_FP_CTE},
    split AS (
      SELECT doc_id,
             CASE WHEN (('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                        1, 8))::BIGINT % 100) < 80
                  THEN 'train' ELSE 'eval' END AS split
      FROM documents
    ),
    tfp AS (
      SELECT fp.fingerprint, fp.doc_id FROM fp
      JOIN split USING (doc_id) WHERE split = 'train'
    ),{cap_ctes_sql("tfp", "fingerprint", "doc_id", prefix="t")},
    arriving AS (
      SELECT doc_id FROM split
      WHERE split <> 'train'
        AND {_BATCH_SQL} = {DECON_CURRENT_BATCH}
    ),
    efp AS (
      SELECT fp.fingerprint, fp.doc_id FROM fp
      JOIN arriving USING (doc_id)
    ),
    hits AS (
      SELECT e.doc_id AS eval_doc_id,
             count(DISTINCT e.fingerprint) AS n_shared,
             count(DISTINCT t.doc_id) AS n_train_docs
      FROM efp e JOIN tshc t USING (fingerprint)
      GROUP BY 1
    )
    SELECT eval_doc_id, CAST(n_shared AS BIGINT) AS n_shared,
           CAST(n_train_docs AS BIGINT) AS n_train_docs
    FROM hits WHERE n_shared >= {MIN_SHARED}
    """,
)
def incremental_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-arrival decontamination: the NEWEST eval batch only,
    checked against the frozen train fingerprint index — the production
    cadence where eval suites arrive over time but the train corpus is
    fixed at cut time. The arriving batch is filtered BEFORE
    fingerprinting, so per-batch cost is proportional to the BATCH, and
    the frozen train index is memoized-materialized exactly as
    production would persist it (first call builds it; every later call
    — every batch — pays only a scan). Same
    fingerprint machinery and thresholds as decontaminate_eval_split
    (queries/winnow.py) — the delta is the arrival semantics."""
    docs = t(spark, sf_dir, "documents")
    split = hash_split(docs.select("doc_id"), "doc_id")
    batch = decon_batch_col(F.col("doc_id"))
    train_ids = split.filter(F.col("split") == "train").select("doc_id")
    arriving_ids = (
        split.filter(F.col("split") != "train")
        .filter(batch == DECON_CURRENT_BATCH)
        .select("doc_id")
    )

    def _build_train_index() -> DataFrame:
        # Posting lists are capped at INDEX BUILD time with the adaptive
        # incidence budget (extensions/incidence.py) — boilerplate
        # fingerprints never enter the frozen index, so every arriving
        # batch's join fan-out is <= cap x batch postings, linear in the
        # batch at any corpus size (VERDICT r10 #4).
        return budget_filter(
            winnow_fingerprints(
                docs.join(train_ids, "doc_id"), "doc_id", "text", k=K, w=W
            ),
            "fingerprint",
        ).select("fingerprint", F.col("doc_id").alias("train_doc_id"))

    # The frozen index is BUILD-ONCE (cache.memoized_parquet): production
    # materializes the train fingerprints at corpus cut time and every
    # arriving batch only scans it — so the per-run cost here is the
    # batch fingerprinting + the index join, exactly the incremental
    # contract (first call pays the build, recorded under bench builds).
    from ..cache import memoized_parquet

    tfp = memoized_parquet(
        spark,
        ("decon_train_index", sf_dir, K, W, "budget-3-4"),
        _build_train_index,
        "decon_train_index",
    )
    efp = winnow_fingerprints(
        docs.join(arriving_ids, "doc_id"), "doc_id", "text", k=K, w=W
    ).select("fingerprint", F.col("doc_id").alias("eval_doc_id"))
    return (
        efp.join(tfp, "fingerprint")
        .groupBy("eval_doc_id")
        .agg(
            F.count_distinct("fingerprint").alias("n_shared"),
            F.count_distinct("train_doc_id").alias("n_train_docs"),
        )
        .filter(F.col("n_shared") >= MIN_SHARED)
    )


GAP_US = 6 * 3600 * 1_000_000  # fill-forward audit threshold: 6 hours


@query(
    "ffill_gap_report",
    oracle=f"""
    WITH r AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us
      FROM events WHERE event_type = 'view'
    ),
    d AS (
      SELECT user_id, ts_us,
             ts_us - lag(ts_us) OVER (PARTITION BY user_id
                                      ORDER BY ts_us ASC, event_id ASC)
               AS gap_us
      FROM r
    ),
    g AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_readings,
             CAST(count(CASE WHEN gap_us > {GAP_US} THEN 1 END)
                  AS BIGINT) AS n_gaps,
             CAST(coalesce(max(gap_us), 0) AS BIGINT) AS max_gap_us,
             CAST(coalesce(sum(CASE WHEN gap_us > {GAP_US}
                                    THEN gap_us END), 0)
                  AS BIGINT) AS total_gap_us,
             max(ts_us) - min(ts_us) AS span_us
      FROM d GROUP BY 1
    )
    SELECT user_id, n_readings, n_gaps, max_gap_us, total_gap_us,
           CAST(CASE WHEN span_us > 0
                     THEN (total_gap_us * 1000) // span_us
                     ELSE 0 END AS BIGINT) AS gap_permille
    FROM g
    """,
)
def ffill_gap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-forward audit over sensor-style readings ('view' events as
    the reading stream): per series, how many inter-reading intervals
    exceed the carry threshold, the worst interval, and what share of
    the series span a forward-fill (resample_ffill_6h) would fabricate
    rather than measure — the data-quality report that must accompany
    any ffill-resampled export. Microsecond-exact integer arithmetic
    end-to-end (no floats), one window pass partitioned by the series
    key, one hash aggregate: linear, shuffle bounded by the reading
    count."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts_us").asc(), F.col("event_id").asc()
    )
    r = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "view")
        .select("user_id", "event_id", F.unix_micros("ts").alias("ts_us"))
    )
    d = r.withColumn("gap_us", F.col("ts_us") - F.lag("ts_us").over(w))
    over = F.when(F.col("gap_us") > GAP_US, F.col("gap_us"))
    g = d.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_readings"),
        F.count(over).cast("bigint").alias("n_gaps"),
        F.coalesce(F.max("gap_us"), F.lit(0)).cast("bigint").alias("max_gap_us"),
        F.coalesce(F.sum(over), F.lit(0)).cast("bigint").alias("total_gap_us"),
        (F.max("ts_us") - F.min("ts_us")).alias("span_us"),
    )
    return g.select(
        "user_id",
        "n_readings",
        "n_gaps",
        "max_gap_us",
        "total_gap_us",
        F.when(
            F.col("span_us") > 0,
            F.expr("(total_gap_us * 1000) div span_us"),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("gap_permille"),
    )


STRAT_K = 5


@query(
    "stratified_weighted_sample",
    oracle=f"""
    WITH h AS (
      SELECT c_mktsegment AS segment, c_custkey,
             CAST(c_acctbal AS DOUBLE) AS weight,
             (2 * ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)),
                                  1, 15))::BIGINT + 1) AS _den
      FROM customer WHERE c_acctbal > 0
    ),
    keyed AS (
      SELECT segment, c_custkey, weight, {_DUCK_KEY} AS sample_key FROM h
    ),
    ranked AS (
      SELECT segment, c_custkey, weight, sample_key,
             row_number() OVER (PARTITION BY segment
                                ORDER BY sample_key DESC,
                                         c_custkey ASC) AS sample_rank
      FROM keyed
    )
    SELECT segment, c_custkey AS custkey, weight, sample_key,
           CAST(sample_rank AS INTEGER) AS sample_rank
    FROM ranked WHERE sample_rank <= {STRAT_K}
    """,
)
def stratified_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified A-ES: an independent weighted sample per market
    segment — the per-stratum quota draw a corpus-mixing pipeline runs
    per language/source. One rank window partitioned by the stratum (no
    global order, k rows per stratum out); keys through the same detln
    DAG as weighted_reservoir_sample, so even the double keys
    hash-match across engines."""
    from ..extensions.reservoir import weighted_sample_per_group

    c = t(spark, sf_dir, "customer").withColumn(
        "segment", F.col("c_mktsegment")
    )
    return weighted_sample_per_group(
        c, ["segment"], "c_custkey", "c_acctbal", STRAT_K
    ).select(
        "segment",
        F.col("c_custkey").alias("custkey"),
        F.col("c_acctbal").cast("double").alias("weight"),
        "sample_key",
        F.col("sample_rank").cast("int").alias("sample_rank"),
    )


RRF_N = 20  # per-list depth
RRF_K = 10  # fused output depth
RRF_C = 60  # the standard RRF constant (Cormack et al., SIGIR'09)


def _rrf_oracle() -> str:
    from .common import VEC_CTE
    from .terms import _BM25_CTES

    return f"""
    WITH {_BM25_CTES},{VEC_CTE},
    la AS (
      SELECT doc_id, CAST(rnk AS INTEGER) AS bm25_rnk
      FROM r WHERE rnk <= {RRF_N}
    ),
    qv AS (
      SELECT v.e AS qe, v.nrm AS qnrm
      FROM v JOIN la ON v.vec_id = la.doc_id WHERE la.bm25_rnk = 1
    ),
    cos AS (
      SELECT v.vec_id AS doc_id,
             round(list_dot_product(v.e, qv.qe) / (v.nrm * qv.qnrm), 6)
               AS cs
      FROM v CROSS JOIN qv
    ),
    lb0 AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY cs DESC, doc_id ASC)
                  AS INTEGER) AS cos_rnk
      FROM cos
    ),
    lb AS (SELECT doc_id, cos_rnk FROM lb0 WHERE cos_rnk <= {RRF_N}),
    f AS (
      SELECT doc_id, bm25_rnk, cos_rnk,
             coalesce(1e0 / ({RRF_C} + bm25_rnk), 0e0)
             + coalesce(1e0 / ({RRF_C} + cos_rnk), 0e0) AS rrf_score
      FROM la FULL JOIN lb USING (doc_id)
    ),
    rk AS (
      SELECT doc_id, bm25_rnk, cos_rnk, rrf_score,
             CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id ASC)
                  AS INTEGER) AS fused_rank
      FROM f
    )
    SELECT doc_id, bm25_rnk, cos_rnk, rrf_score, fused_rank
    FROM rk WHERE fused_rank <= {RRF_K}
    """


@query("reciprocal_rank_fusion", oracle=_rrf_oracle())
def reciprocal_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal rank fusion of a lexical and a dense retrieval list —
    the OTHER standard hybrid-retrieval combiner next to
    hybrid_bm25_rerank's two-stage rerank: both lists retrieve
    independently and scores fuse as sum 1/(60 + rank) (Cormack et al.,
    SIGIR'09), so a document strong in either modality surfaces without
    score calibration between BM25 points and cosine values. Lists: the
    BM25 top-20 (single corpus scan, TakeOrdered) and the cosine top-20
    to the pseudo-relevance query vector (embedding of the lexical
    top-1 — deterministic, no model in the loop; one broadcast
    cross-join over the corpus, TakeOrdered). The fusion itself touches
    2 x 20 rows regardless of corpus size; ranks through the repo's
    round-6 cosine convention, the RRF terms are exact integer-rational
    divisions — bit-identical cross-engine."""
    from ..cache import tracked_persist
    from ..extensions.similarity import as_double_vec, dot, with_norm
    from .terms import _bm25_scored

    # Two consumers (list A + the anchor's query vector): one BM25 pass.
    la = tracked_persist(
        _bm25_scored(spark, sf_dir, RRF_N).select(
            "doc_id", F.col("rnk").cast("int").alias("bm25_rnk")
        )
    )
    v = with_norm(
        t(spark, sf_dir, "embeddings").select(
            "vec_id", as_double_vec("embedding").alias("e")
        ),
        "e",
        "nrm",
    )
    qv = F.broadcast(
        v.join(
            F.broadcast(la.filter(F.col("bm25_rnk") == 1)),
            v.vec_id == F.col("doc_id"),
        ).select(F.col("e").alias("qe"), F.col("nrm").alias("qnrm"))
    )
    cos = v.crossJoin(qv).select(
        F.col("vec_id").alias("doc_id"),
        F.round(
            dot(F.col("e"), F.col("qe")) / (F.col("nrm") * F.col("qnrm")), 6
        ).alias("cs"),
    )
    top = cos.orderBy(F.col("cs").desc(), F.col("doc_id").asc()).limit(RRF_N)
    w_cos = Window.orderBy(F.col("cs").desc(), F.col("doc_id").asc())
    lb = top.withColumn(
        "cos_rnk", F.row_number().over(w_cos).cast("int")
    ).select("doc_id", "cos_rnk")
    f = la.join(lb, "doc_id", "full_outer").select(
        "doc_id",
        "bm25_rnk",
        "cos_rnk",
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(RRF_C) + F.col("bm25_rnk")), F.lit(0.0)
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(RRF_C) + F.col("cos_rnk")), F.lit(0.0)
            )
        ).alias("rrf_score"),
    )
    w_f = Window.orderBy(F.col("rrf_score").desc(), F.col("doc_id").asc())
    return f.withColumn(
        "fused_rank", F.row_number().over(w_f).cast("int")
    ).filter(F.col("fused_rank") <= RRF_K)

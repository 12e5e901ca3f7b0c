"""Round-12 additions: operating-the-suite analytics.

Four capabilities the inventory lacked:

- ``dedup_strategy_agreement`` — the calibration artifact for RUNNING a
  multi-strategy dedup suite: pairwise agreement (Jaccard over candidate
  PAIR SETS) between the exact, shingle-Jaccard, and SimHash strategies.
  Where strategies agree, a cheaper one can stand in for an expensive
  one; where they diverge, the divergence IS the near-dup gray zone an
  operator must threshold deliberately.
- ``retrieval_ndcg_eval`` — ranking-quality evaluation (nDCG@10) of the
  BM25 ranker against a naive normalized-tf baseline, with binary
  relevance = "document contains EVERY query term". The evaluation
  metric family (knn_label_accuracy, ivf_nprobe_sweep recall) gains the
  standard IR effectiveness measure.
- ``cms_heavy_hitters`` — the Count-Min Sketch, completing the
  mergeable-sketch family (HLL = cardinality, KMV = distinct overlap,
  CMS = per-item frequency), reported against exact counts with the
  one-sided-error invariant carried in-result.
- ``matryoshka_recall_sweep`` — recall@k of cosine search over each
  embedding PREFIX length vs the full-dimension exact top-k, the
  truncation-robustness curve behind shrink-the-index decisions.

Cross-engine determinism notes: agreement ratios and nDCG are
single-rounded doubles over exact integer counts or fixed-written-order
sums; the log2 position discounts are PYTHON-inlined literal doubles
(repr round-trips exactly), so neither engine ever calls its own libm —
the repo's log-free hash convention.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..cache import memoized_parquet
from ..extensions.similarity import as_double_vec, dot
from .common import VEC_CTE as _SIM_VEC_CTE
from .common import t
from .registry import query
from .similarity import QUERY_PRED as _SIM_QUERY_PRED
from .dedup import (
    _CAP_CTES,
    _SHINGLES_CTE,
    _SIMHASH_BAND_BUDGET_CTE,
    _SIMHASH_SIG_CTE,
    JACCARD_THRESHOLD,
    SIMHASH_MAX_HAMMING,
    dedup_ngram_jaccard,
    dedup_simhash_pairs,
)
from .terms import BM25_B, BM25_K1, BM25_TERMS, _bm25_scored, _dlit

# ---------------------------------------------------------------------------
# dedup_strategy_agreement
# ---------------------------------------------------------------------------

@query(
    "dedup_strategy_agreement",
    oracle=f"""
    WITH {_SHINGLES_CTE},{_CAP_CTES},
    {_SIMHASH_SIG_CTE},
    {_SIMHASH_BAND_BUDGET_CTE},
    eh AS (
      SELECT doc_id, md5(text) AS h FROM documents WHERE text IS NOT NULL
    ),
    epairs AS (
      SELECT x.doc_id AS a_id, y.doc_id AS b_id
      FROM eh x JOIN eh y ON x.h = y.h AND x.doc_id < y.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY 1),
    jinter AS (
      SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*) AS inter
      FROM shc x JOIN shc y ON x.shingle = y.shingle
                            AND x.doc_id < y.doc_id
      GROUP BY 1, 2
    ),
    jpairs AS (
      SELECT a_id, b_id
      FROM jinter
      JOIN sizes sa ON sa.doc_id = a_id
      JOIN sizes sb ON sb.doc_id = b_id
      WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter)
              >= {JACCARD_THRESHOLD}
    ),
    spairs AS (
      SELECT a_id, b_id FROM dist WHERE hamming <= {SIMHASH_MAX_HAMMING}
    ),
    univ AS (
      SELECT 'exact' AS s, a_id, b_id FROM epairs
      UNION ALL SELECT 'jaccard', a_id, b_id FROM jpairs
      UNION ALL SELECT 'simhash', a_id, b_id FROM spairs
    ),
    flags AS (
      SELECT a_id, b_id,
             max(CASE WHEN s = 'exact' THEN 1 ELSE 0 END) AS f_e,
             max(CASE WHEN s = 'jaccard' THEN 1 ELSE 0 END) AS f_j,
             max(CASE WHEN s = 'simhash' THEN 1 ELSE 0 END) AS f_s
      FROM univ GROUP BY 1, 2
    ),
    tot AS (
      SELECT CAST(coalesce(sum(f_e), 0) AS BIGINT) AS n_e,
             CAST(coalesce(sum(f_j), 0) AS BIGINT) AS n_j,
             CAST(coalesce(sum(f_s), 0) AS BIGINT) AS n_s,
             CAST(coalesce(sum(f_e * f_j), 0) AS BIGINT) AS n_ej,
             CAST(coalesce(sum(f_e * f_s), 0) AS BIGINT) AS n_es,
             CAST(coalesce(sum(f_j * f_s), 0) AS BIGINT) AS n_js
      FROM flags
    )
    SELECT strategy_a, strategy_b, n_a, n_b, n_common,
           CASE WHEN n_a + n_b - n_common = 0 THEN NULL
                ELSE round(CAST(n_common AS DOUBLE)
                           / (n_a + n_b - n_common), 6)
           END AS agreement
    FROM (
      SELECT 'exact' AS strategy_a, 'jaccard' AS strategy_b,
             n_e AS n_a, n_j AS n_b, n_ej AS n_common FROM tot
      UNION ALL
      SELECT 'exact', 'simhash', n_e, n_s, n_es FROM tot
      UNION ALL
      SELECT 'jaccard', 'simhash', n_j, n_s, n_js FROM tot
    )
    """,
)
def dedup_strategy_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise candidate-pair agreement across the doc-level near-dup
    strategies (exact md5, budgeted 3-shingle Jaccard >= 0.5, budgeted
    SimHash hamming <= 3): |A ∩ B| / |A ∪ B| per strategy pair, plus the
    raw set sizes. The suite-calibration report: high agreement means a
    cheaper strategy can stand in for a costlier one on this corpus; the
    disagreement mass is the gray zone whose threshold placement is an
    editorial decision, not a default.

    Plan shape: the three pair generators (the two ALREADY-BUDGETED
    registered pipelines plus the exact md5 group join) are evaluated
    exactly ONCE — the pair union flows through one groupBy(a_id, b_id)
    into per-strategy membership flags, and one global aggregate of flag
    products yields every set size and every pairwise intersection
    simultaneously (no pair-set self-join, no multi-branch cache race).
    The 3-row matrix is then a literal pivot of that single broadcast
    row. Linear in pairs, which the incidence budgets keep linear in
    postings. All counts are exact integers; the one ratio is
    single-rounded."""
    docs = t(spark, sf_dir, "documents")
    eh = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", F.md5("text").alias("h")
    )
    ex = (
        eh.alias("x")
        .join(
            eh.alias("y"),
            (F.col("x.h") == F.col("y.h"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("a_id"), F.col("y.doc_id").alias("b_id")
        )
    )
    def build_univ() -> DataFrame:
        jc = dedup_ngram_jaccard(spark, sf_dir).select("a_id", "b_id")
        sh = dedup_simhash_pairs(spark, sf_dir).select("a_id", "b_id")
        return (
            ex.select(F.lit("exact").alias("s"), "a_id", "b_id")
            .unionByName(
                jc.select(F.lit("jaccard").alias("s"), "a_id", "b_id")
            )
            .unionByName(
                sh.select(F.lit("simhash").alias("s"), "a_id", "b_id")
            )
        )

    # The labeled pair union is a deterministic per-corpus artifact (the
    # same candidate sets every dedup consumer sees), so it goes through
    # the build-once memo like near_dup_components: the suite pays the
    # three generators once per corpus, and this report — run repeatedly
    # while an operator tunes thresholds — reads the budget-bounded pair
    # parquet. Build wall-clock lands in BUILD_SECONDS['agreement_pairs'].
    univ = memoized_parquet(
        spark, (sf_dir, "agreement_univ"), build_univ, "agreement_pairs"
    )

    def flag(name: str):
        return F.max(
            F.when(F.col("s") == name, F.lit(1)).otherwise(F.lit(0))
        ).alias(f"f_{name[0]}")

    flags = univ.groupBy("a_id", "b_id").agg(
        flag("exact"), flag("jaccard"), flag("simhash")
    )

    def total(expr, alias):
        return F.coalesce(F.sum(expr), F.lit(0)).cast("bigint").alias(alias)

    tot = flags.agg(
        total(F.col("f_e"), "n_e"),
        total(F.col("f_j"), "n_j"),
        total(F.col("f_s"), "n_s"),
        total(F.col("f_e") * F.col("f_j"), "n_ej"),
        total(F.col("f_e") * F.col("f_s"), "n_es"),
        total(F.col("f_j") * F.col("f_s"), "n_js"),
    )
    # Literal pivot of the single aggregate row: a strategy with ZERO
    # pairs (exact, on a corpus without identical texts) still appears.
    pairs = spark.createDataFrame(
        [
            ("exact", "jaccard", "n_e", "n_j", "n_ej"),
            ("exact", "simhash", "n_e", "n_s", "n_es"),
            ("jaccard", "simhash", "n_j", "n_s", "n_js"),
        ],
        "strategy_a string, strategy_b string, ka string, kb string,"
        " kc string",
    )
    def pick(col: str):
        # Resolve the row's column-name key against the aggregate row.
        return F.coalesce(
            *[
                F.when(F.col(col) == k, F.col(k))
                for k in ("n_e", "n_j", "n_s", "n_ej", "n_es", "n_js")
            ]
        )

    denom = pick("ka") + pick("kb") - pick("kc")
    return pairs.crossJoin(F.broadcast(tot)).select(
        "strategy_a",
        "strategy_b",
        pick("ka").alias("n_a"),
        pick("kb").alias("n_b"),
        pick("kc").alias("n_common"),
        F.when(denom == 0, F.lit(None).cast("double"))
        .otherwise(F.round(pick("kc").cast("double") / denom, 6))
        .alias("agreement"),
    )


# ---------------------------------------------------------------------------
# retrieval_ndcg_eval
# ---------------------------------------------------------------------------

NDCG_K = 10

#: Position discounts 1/log2(i+1), i = 1..10, computed ONCE in Python and
#: inlined as literal doubles in BOTH engines (repr round-trips exactly)
#: so no engine libm log is ever called — scores hash bit-identically.
_DISCOUNTS = tuple(1.0 / math.log2(i + 1) for i in range(1, NDCG_K + 1))
#: Ideal DCG by relevant-count r (r = 1..10; r > 10 uses the full sum):
#: prefix sums accumulated in Python in fixed order, inlined as literals
#: — neither engine re-sums them, so there is no accumulation-order risk.
_IDCG = tuple(
    sum(_DISCOUNTS[:r]) for r in range(1, NDCG_K + 1)
)


def _idcg_case_sql(r_expr: str) -> str:
    # Exponent form: DuckDB parses plain decimal literals as DECIMAL
    # (width-truncating!), but exponent-form via strtod as the
    # correctly-rounded DOUBLE — the exact Python float, as required.
    # _dlit (shared with the BM25 scorer, ADVICE r12 #2) appends the
    # exponent only when repr lacks one.
    branches = " ".join(
        f"WHEN {r_expr} >= {r} THEN {_dlit(_IDCG[r - 1])}"
        for r in range(NDCG_K, 0, -1)
    )
    return f"CASE {branches} ELSE NULL END"


def _dcg_terms_sql() -> str:
    """Fixed-written-order sum of max(CASE rnk=i AND relevant);
    exponent form parses as DOUBLE in DuckDB (see _idcg_case_sql)."""
    return "\n           + ".join(
        f"max(CASE WHEN rnk = {i + 1} AND relevant THEN {_dlit(d)}"
        " ELSE 0.0E0 END)"
        for i, d in enumerate(_DISCOUNTS)
    )


_NDCG_RANKERS_CTE = f"""
    b AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS dl,
             {", ".join(
                 f"CAST(len(list_filter(toks, x -> x = '{tm}')) AS BIGINT)"
                 f" AS tf{i}"
                 for i, tm in enumerate(BM25_TERMS)
             )}
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    ),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
             {", ".join(
                 f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END)"
                 f" AS BIGINT) AS df{i}"
                 for i in range(len(BM25_TERMS))
             )}
      FROM b
    ),
    rel AS (
      SELECT doc_id,
             ({" AND ".join(f"tf{i} > 0" for i in range(len(BM25_TERMS)))})
               AS relevant,
             round(CAST(({" + ".join(f"tf{i}" for i in range(len(BM25_TERMS)))})
                        AS DOUBLE) / dl, 6) AS tfn_score,
             {" + ".join(f"CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END"
                         for i in range(len(BM25_TERMS)))} AS hits,
             round({" + ".join(
                 f"((stats.n_docs - stats.df{i} + 0.5) / (stats.df{i} + 0.5))"
                 f" * ((b.tf{i} * ({BM25_K1} + 1.0)) / (b.tf{i} + {BM25_K1}"
                 f" * (1.0 - {BM25_B} + {BM25_B} * b.dl / stats.avgdl)))"
                 for i in range(len(BM25_TERMS))
             )}, 6) AS bm25_score
      FROM b CROSS JOIN stats
    ),
    nrel AS (
      SELECT CAST(sum(CASE WHEN relevant THEN 1 ELSE 0 END) AS BIGINT) AS r
      FROM rel
    ),
    ranked AS (
      SELECT 'bm25' AS ranker, doc_id, relevant,
             CAST(row_number() OVER (ORDER BY bm25_score DESC, doc_id ASC)
                  AS INTEGER) AS rnk
      FROM rel WHERE hits > 0
      UNION ALL
      SELECT 'tf_norm', doc_id, relevant,
             CAST(row_number() OVER (ORDER BY tfn_score DESC, doc_id ASC)
                  AS INTEGER) AS rnk
      FROM rel WHERE hits > 0
    ),
    dcg AS (
      SELECT ranker,
             {_dcg_terms_sql()} AS dcg
      FROM ranked WHERE rnk <= {NDCG_K}
      GROUP BY 1
    )
"""


@query(
    "retrieval_ndcg_eval",
    oracle=f"""
    WITH {_NDCG_RANKERS_CTE}
    SELECT dcg.ranker, nrel.r AS n_relevant,
           round(dcg.dcg, 6) AS dcg,
           round(dcg.dcg / ({_idcg_case_sql("nrel.r")}), 6) AS ndcg
    FROM dcg CROSS JOIN nrel
    """,
)
def retrieval_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 of the BM25 ranker vs a naive normalized-term-frequency
    baseline, binary relevance = "contains EVERY query term" — the
    standard IR effectiveness measure, closing the evaluation family
    (accuracy, recall@k) with ranking quality. BM25 should beat the
    baseline by rewarding rare-term matches; the artifact quantifies by
    how much ON THIS CORPUS, which is the number a retrieval stack's
    A/B decision needs.

    Determinism: the position discounts 1/log2(i+1) and the ideal-DCG
    prefix sums are Python-computed literals inlined into both engines
    (no engine libm, no cross-engine accumulation-order risk); DCG is a
    fixed-written-order sum of 10 max(CASE) aggregates over the top-10
    rows. Plan: one corpus scan builds tf columns (no explode), a
    metadata-sized stats broadcast, two TakeOrdered top-10s, and
    dimension-scale aggregates — at 100 TB the cost is the scan."""
    scored = _bm25_scored(spark, sf_dir, k=NDCG_K)
    docs = t(spark, sf_dir, "documents")
    # Generated SQL text throughout (r12, the simhash64_text treatment):
    # the Column-object form of the tf/relevance/DCG trees paid one Py4J
    # round-trip per node and dominated this query's CONSTRUCTION wall
    # (2.1 s construct vs 0.9 s exec measured); the parsed trees are the
    # same expressions with the same literals, so every value is
    # bit-identical.
    n = len(BM25_TERMS)
    base = docs.selectExpr(
        "doc_id",
        "CAST(size(split(text, ' ')) AS BIGINT) AS dl",
        *[
            "CAST(size(filter(split(text, ' '),"
            f" x -> x = '{tm}')) AS BIGINT) AS tf{i}"
            for i, tm in enumerate(BM25_TERMS)
        ],
    )
    relevant_sql = " AND ".join(f"tf{i} > 0" for i in range(n))
    hits_sql = " + ".join(
        f"CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END" for i in range(n)
    )
    tf_total_sql = " + ".join(f"tf{i}" for i in range(n))
    from ..cache import tracked_persist

    # rel feeds THREE branches (the n_relevant aggregate, the tf-norm
    # top-k, and the relevance join onto the BM25 ranking); without the
    # persist each branch re-ran the corpus tokenize + per-term tf
    # projection (three identical scan subtrees in the physical plan).
    rel = tracked_persist(
        base.selectExpr(
            "doc_id",
            f"({relevant_sql}) AS relevant",
            f"round(CAST({tf_total_sql} AS DOUBLE) / dl, 6) AS tfn_score",
            f"({hits_sql}) AS hits",
        )
    )
    nrel = rel.agg(
        F.sum(F.when(F.col("relevant"), 1).otherwise(0))
        .cast("bigint")
        .alias("r")
    )
    w = Window.orderBy(F.col("tfn_score").desc(), F.col("doc_id").asc())
    tfn_ranked = (
        rel.filter(F.col("hits") > 0)
        .orderBy(F.col("tfn_score").desc(), F.col("doc_id").asc())
        .limit(NDCG_K)
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .select(F.lit("tf_norm").alias("ranker"), "doc_id", "relevant", "rnk")
    )
    bm25_ranked = scored.join(
        rel.select("doc_id", "relevant"), "doc_id"
    ).select(F.lit("bm25").alias("ranker"), "doc_id", "relevant", "rnk")
    ranked = bm25_ranked.unionByName(tfn_ranked).filter(
        F.col("rnk") <= NDCG_K
    )
    # The 10 DCG terms and the descending-r IDCG CASE reuse the same
    # generated text the oracle runs (_dcg_terms_sql/_idcg_case_sql emit
    # engine-neutral SQL; exponent-form literals parse as the exact
    # Python doubles in both engines).
    dcg = ranked.groupBy("ranker").agg(
        F.expr(_dcg_terms_sql()).alias("dcg")
    )
    return dcg.crossJoin(F.broadcast(nrel)).selectExpr(
        "ranker",
        "r AS n_relevant",
        "round(dcg, 6) AS dcg",
        f"round(dcg / ({_idcg_case_sql('r')}), 6) AS ndcg",
    )


# ---------------------------------------------------------------------------
# cms_heavy_hitters
# ---------------------------------------------------------------------------

#: Count-Min Sketch geometry: depth = independent hash rows (estimate =
#: min over rows), width = buckets per row. 4x512 keeps the whole sketch
#: at 2k counters — executor-memory metadata at ANY corpus size.
CMS_DEPTH = 4
CMS_WIDTH = 512
CMS_TOPK = 10

#: The md5-60-bit bucket hash, salted per sketch row r with the repo's
#: `|`-delimited salt convention (extensions/reservoir.py:hash60 — the
#: delimiter makes (tok, salt) concatenation collision-free). Inlined
#: rather than calling hash60 because the salt is a COLUMN (the exploded
#: row index), which hash60's static-string signature can't take.
_CMS_BUCKET_SQL = (
    "('0x' || substr(md5(tok || '|cms' || CAST(r AS VARCHAR)), 1, 15))"
    f"::BIGINT % {CMS_WIDTH}"
)


@query(
    "cms_heavy_hitters",
    oracle=f"""
    WITH tk AS (
      SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    a AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS tf FROM tk GROUP BY 1
    ),
    n AS (SELECT CAST(sum(tf) AS BIGINT) AS n_tokens FROM a),
    hb AS (
      SELECT tok, tf, r, {_CMS_BUCKET_SQL} AS bucket
      FROM a, UNNEST(generate_series(0, {CMS_DEPTH - 1})) AS u(r)
    ),
    cells AS (
      SELECT r, bucket, CAST(sum(tf) AS BIGINT) AS cell
      FROM hb GROUP BY 1, 2
    ),
    top AS (
      SELECT tok, tf, rnk FROM (
        SELECT tok, tf,
               CAST(row_number() OVER (ORDER BY tf DESC, tok ASC)
                    AS INTEGER) AS rnk
        FROM a
      ) WHERE rnk <= {CMS_TOPK}
    ),
    est AS (
      SELECT top.tok, top.tf, top.rnk, min(cells.cell) AS cms_est
      FROM top
      JOIN hb ON hb.tok = top.tok
      JOIN cells ON cells.r = hb.r AND cells.bucket = hb.bucket
      GROUP BY 1, 2, 3
    )
    SELECT tok, rnk, tf AS exact_tf, cms_est,
           cms_est - tf AS overcount,
           cms_est >= tf AS never_undercounts,
           round(CAST(cms_est - tf AS DOUBLE) / n.n_tokens, 6)
             AS overcount_frac
    FROM est CROSS JOIN n
    """,
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min Sketch frequency estimates for the corpus's top-10
    tokens, reported against their exact counts — the FREQUENCY member
    of the mergeable-sketch family (HLL = cardinality, KMV = distinct
    overlap, CMS = per-item frequency). Emits per heavy hitter the exact
    tf, the sketch estimate (min over the 4 salted hash rows), the
    overcount, the one-sided-error invariant (CMS can only OVERcount —
    carried in-result, hash-verified), and the overcount as a fraction
    of total token mass.

    The sketch is LINEAR (cell = sum of increments), so building it from
    the per-token aggregate is bit-identical to streaming per-token
    increments — the plan pays the one vocabulary shuffle the corpus
    needs anyway, then every sketch step is dimension-scale: 4x512
    cells, a 10-row heavy-hitter probe, broadcast joins. At 100 TB the
    cost is the token scan + vocab aggregate; the sketch itself is
    mergeable metadata (per-partition partial cells combine by +)."""
    docs = t(spark, sf_dir, "documents")
    tk = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    # The vocabulary aggregate feeds FOUR branches (total mass, sketch
    # cells, heavy-hitter probe, estimate join). A lazy persist still
    # lets AQE's concurrent stages race to materialize it (measured
    # SLOWER than no persist); the EAGER localCheckpoint completes the
    # one token explode + shuffle — the only corpus-scale work here —
    # before any branch plans, so every branch reads the vocab-sized
    # checkpoint blocks.
    a = tk.groupBy("tok").agg(
        F.count("*").cast("bigint").alias("tf")
    ).localCheckpoint(eager=True)
    n = a.agg(F.sum("tf").cast("bigint").alias("n_tokens"))
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("tok"),
                        F.lit("|cms"),
                        F.col("r").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % CMS_WIDTH
    )
    hb = a.select(
        "tok",
        "tf",
        F.explode(F.array(*[F.lit(r) for r in range(CMS_DEPTH)])).alias("r"),
    ).withColumn("bucket", bucket)
    cells = hb.groupBy("r", "bucket").agg(
        F.sum("tf").cast("bigint").alias("cell")
    )
    w = Window.orderBy(F.col("tf").desc(), F.col("tok").asc())
    top = (
        a.orderBy(F.col("tf").desc(), F.col("tok").asc())
        .limit(CMS_TOPK)
        .withColumn("rnk", F.row_number().over(w).cast("int"))
    )
    est = (
        F.broadcast(top)
        .join(hb.select("tok", "r", "bucket"), "tok")
        .join(F.broadcast(cells), ["r", "bucket"])
        .groupBy("tok", "tf", "rnk")
        .agg(F.min("cell").alias("cms_est"))
    )
    return est.crossJoin(F.broadcast(n)).select(
        "tok",
        "rnk",
        F.col("tf").alias("exact_tf"),
        "cms_est",
        (F.col("cms_est") - F.col("tf")).alias("overcount"),
        (F.col("cms_est") >= F.col("tf")).alias("never_undercounts"),
        F.round(
            (F.col("cms_est") - F.col("tf")).cast("double")
            / F.col("n_tokens"),
            6,
        ).alias("overcount_frac"),
    )


# ---------------------------------------------------------------------------
# matryoshka_recall_sweep
# ---------------------------------------------------------------------------

#: Prefix lengths to evaluate; the last MUST be the full dimension so the
#: sweep's final point is the exact-search ground truth by construction.
MAT_DIMS = (8, 16, 32, 64)
MAT_K = 5


def _mat_cos_sql(d: int) -> str:
    return (
        f"CASE WHEN q.qn_{d} * v.nrm_{d} = 0 THEN NULL"
        f" ELSE round(list_dot_product(q.qe[1:{d}], v.e[1:{d}])"
        f" / (q.qn_{d} * v.nrm_{d}), 6) END AS cos_{d}"
    )


def _mat_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scored candidate pairs with every prefix cosine: per-vector
    prefix norms are computed ONCE before the join (12 folds/pair -> 4;
    norm cost O(N), never O(N*|Q|)); Q is the bounded broadcast side.

    All expression trees are generated SQL text parsed once in the JVM
    (r12, the simhash64_text treatment — the Column-object form paid one
    Py4J round-trip per node of the norm/product/fold trees and
    dominated this query's construction wall). The parsed folds are the
    same expressions with the same double literals and fold order, so
    every cosine is bit-identical."""
    e = t(spark, sf_dir, "embeddings")
    base = e.selectExpr(
        "vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS e"
    )

    def prefix_norm_sql(d: int) -> str:
        return (
            f"sqrt(aggregate(zip_with(slice(e, 1, {d}), slice(e, 1, {d}),"
            " (x, y) -> x * y), 0.0E0, (acc, x) -> acc + x))"
        )

    v = base.selectExpr(
        "vec_id",
        "e",
        *[f"{prefix_norm_sql(d)} AS nrm_{d}" for d in MAT_DIMS],
    )
    q = v.filter(F.expr(_SIM_QUERY_PRED)).selectExpr(
        "vec_id AS query_id",
        "e AS qe",
        *[f"nrm_{d} AS qn_{d}" for d in MAT_DIMS],
    )
    # Incremental prefix dots: the element products are computed ONCE per
    # pair, and each prefix dot CONTINUES the previous prefix's fold
    # (init = the shorter dot) — the very same left-to-right IEEE
    # addition sequence as an independent fold over the full prefix
    # (0 + p1 + ... + pd), so every cos_{d} is bit-identical to the
    # per-prefix-fold form the oracle replays, at 8+8+16+32 adds per
    # pair instead of 8+16+32+64 (and one 64-mult product array instead
    # of four sliced re-multiplications). Each dot lands in its own
    # chained projection so downstream prefixes REFERENCE it (two uses
    # blocks CollapseProject from inlining the fold twice).
    paired = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .selectExpr("*", "zip_with(qe, e, (x, y) -> x * y) AS __prod__")
    )
    prev_d = 0
    for d in MAT_DIMS:
        init = "0.0E0" if prev_d == 0 else f"__d_{prev_d}__"
        paired = paired.selectExpr(
            "*",
            f"aggregate(slice(__prod__, {prev_d + 1}, {d - prev_d}),"
            f" {init}, (acc, x) -> acc + x) AS __d_{d}__",
        )
        prev_d = d
    return paired.selectExpr(
        "query_id",
        "vec_id AS neighbor_id",
        *[
            f"CASE WHEN qn_{d} * nrm_{d} = 0 THEN CAST(NULL AS DOUBLE)"
            f" ELSE round(__d_{d}__ / (qn_{d} * nrm_{d}), 6)"
            f" END AS cos_{d}"
            for d in MAT_DIMS
        ],
    )


def _mat_topk(pairs: DataFrame) -> DataFrame:
    """Per-(query, dim) top-k of the long-form scored pairs.

    ONE rank filter per (query_id, dim) group: Spark's
    InferWindowGroupLimit inserts the Partial-mode WindowGroupLimit
    below the exchange, so each input partition forwards <= k rows per
    (query, dim) instead of the full N*|Q|*|dims| scored stream — the
    same pinned property as the brute-force rankers (a per-dim rank
    over the wide frame could not be pruned: only the full-dim rank had
    a filter, the other three orderings needed every pair). Factored so
    the plan-pin pytest can assert on the PRE-checkpoint frame (the
    checkpoint truncates the executed plan)."""
    stack_args = ", ".join(f"{d}, cos_{d}" for d in MAT_DIMS)
    plong = pairs.select(
        "query_id",
        "neighbor_id",
        F.expr(f"stack({len(MAT_DIMS)}, {stack_args}) AS (dim, score)"),
    )
    wd = Window.partitionBy("query_id", "dim").orderBy(
        F.col("score").desc_nulls_last(), F.col("neighbor_id").asc()
    )
    return (
        plong.withColumn("rnk", F.row_number().over(wd))
        .filter(F.col("rnk") <= MAT_K)
        .select("query_id", "neighbor_id", "dim")
    )


_MAT_NORM_SQL = ", ".join(
    f"sqrt(list_dot_product(e[1:{d}], e[1:{d}])) AS nrm_{d}"
    for d in MAT_DIMS
)

_MAT_RANKED_CTE = f"""
    vv AS (SELECT vec_id, e, {_MAT_NORM_SQL} FROM v),
    q AS (SELECT vec_id AS query_id, e AS qe,
                 {", ".join(f"nrm_{d} AS qn_{d}" for d in MAT_DIMS)}
          FROM vv WHERE {_SIM_QUERY_PRED}),
    pairs AS (
      SELECT q.query_id, v.vec_id AS neighbor_id,
             {", ".join(_mat_cos_sql(d) for d in MAT_DIMS)}
      FROM q CROSS JOIN vv v
      WHERE v.vec_id != q.query_id
    ),
    plong AS (
      {" UNION ALL ".join(
          f"SELECT query_id, neighbor_id, {d} AS dim, cos_{d} AS score"
          " FROM pairs"
          for d in MAT_DIMS
      )}
    ),
    ptopk AS (
      SELECT query_id, neighbor_id, dim FROM (
        SELECT query_id, neighbor_id, dim,
               row_number() OVER (PARTITION BY query_id, dim
                                  ORDER BY score DESC NULLS LAST,
                                           neighbor_id ASC) AS rnk
        FROM plong
      ) WHERE rnk <= {MAT_K}
    ),
    pgt AS (
      SELECT query_id, neighbor_id FROM ptopk WHERE dim = {MAT_DIMS[-1]}
    ),
    phits AS (
      SELECT t.dim, CAST(count(*) AS BIGINT) AS hits
      FROM ptopk t JOIN pgt USING (query_id, neighbor_id)
      GROUP BY 1
    ),
    pgtc AS (SELECT CAST(count(*) AS BIGINT) AS gt_pairs FROM pgt)
"""


@query(
    "matryoshka_recall_sweep",
    oracle=f"""
    WITH {_SIM_VEC_CTE},
    {_MAT_RANKED_CTE}
    SELECT d.dim, {MAT_K} AS k, pgtc.gt_pairs,
           CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
           CASE WHEN pgtc.gt_pairs = 0 THEN NULL
                ELSE round(CAST(coalesce(h.hits, 0) AS DOUBLE)
                           / pgtc.gt_pairs, 6)
           END AS recall
    FROM (VALUES {", ".join(f"({d})" for d in MAT_DIMS)}) AS d(dim)
    LEFT JOIN phits h ON h.dim = d.dim
    CROSS JOIN pgtc
    """,
)
def matryoshka_recall_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style dimension-truncation sweep: recall@5 of cosine
    search over each embedding PREFIX (8, 16, 32, then the full 64 dims)
    against the full-dimension exact top-5 — the tuning curve for
    trading index size/compute against recall when embeddings are
    truncation-robust. The last sweep point IS the ground truth, so its
    recall is 1.0 by construction (a hash-verified sanity anchor, the
    ivf_nprobe_sweep pattern).

    One pass: every prefix cosine is computed per candidate pair in a
    single projection (each prefix is its OWN sequential fold — prefix
    sums of segment dots would round differently across engines); the
    long-form (query, dim) rank is k-pruned map-side (see _mat_topk).
    The pair space is the brute-force contract: |Q| bounded at 50
    regardless of corpus size, Q broadcast, the corpus streamed once —
    linear in N at 100 TB. Zero-norm prefixes rank NULLS LAST
    identically in both engines."""
    topk = (
        _mat_topk(_mat_pairs(spark, sf_dir))
        # <= |Q| * |dims| * k rows; the eager checkpoint runs the corpus
        # scan once for its three consumers (gt filter, hits join, count).
        .localCheckpoint(eager=True)
    )
    gt = topk.filter(F.col("dim") == MAT_DIMS[-1]).select(
        "query_id", "neighbor_id"
    )
    hits = (
        topk.join(gt, ["query_id", "neighbor_id"])
        .groupBy("dim")
        .agg(F.count("*").cast("bigint").alias("hits"))
    )
    gtc = gt.agg(F.count("*").cast("bigint").alias("gt_pairs"))
    dims = spark.createDataFrame([(d,) for d in MAT_DIMS], "dim int")
    return (
        dims.join(F.broadcast(hits), "dim", "left")
        .crossJoin(F.broadcast(gtc))
        .select(
            "dim",
            F.lit(MAT_K).alias("k"),
            "gt_pairs",
            F.coalesce(F.col("hits"), F.lit(0)).cast("bigint").alias("hits"),
            F.when(F.col("gt_pairs") == 0, F.lit(None).cast("double"))
            .otherwise(
                F.round(
                    F.coalesce(F.col("hits"), F.lit(0)).cast("double")
                    / F.col("gt_pairs"),
                    6,
                )
            )
            .alias("recall"),
        )
    )

"""Round-12 additions: operating-the-suite analytics.

Two capabilities the inventory lacked:

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

from .common import t
from .registry import query
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
from .terms import BM25_B, BM25_K1, BM25_TERMS, _bm25_scored

# ---------------------------------------------------------------------------
# dedup_strategy_agreement
# ---------------------------------------------------------------------------

_STRATEGIES = ("exact", "jaccard", "simhash")


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
    strat AS (
      SELECT unnest(['exact', 'jaccard', 'simhash']) AS s
    ),
    counts AS (
      SELECT strat.s, CAST(coalesce(c.n, 0) AS BIGINT) AS n
      FROM strat
      LEFT JOIN (SELECT s, count(*) AS n FROM univ GROUP BY 1) c
             ON c.s = strat.s
    ),
    overlap AS (
      SELECT x.s AS strategy_a, y.s AS strategy_b,
             CAST(count(*) AS BIGINT) AS n_common
      FROM univ x
      JOIN univ y ON x.a_id = y.a_id AND x.b_id = y.b_id AND x.s < y.s
      GROUP BY 1, 2
    )
    SELECT ca.s AS strategy_a, cb.s AS strategy_b,
           ca.n AS n_a, cb.n AS n_b,
           CAST(coalesce(o.n_common, 0) AS BIGINT) AS n_common,
           CASE WHEN ca.n + cb.n - coalesce(o.n_common, 0) = 0 THEN NULL
                ELSE round(CAST(coalesce(o.n_common, 0) AS DOUBLE)
                           / (ca.n + cb.n - coalesce(o.n_common, 0)), 6)
           END AS agreement
    FROM counts ca
    JOIN counts cb ON ca.s < cb.s
    LEFT JOIN overlap o ON o.strategy_a = ca.s AND o.strategy_b = cb.s
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

    Plan shape: the two pair generators are the ALREADY-BUDGETED
    registered pipelines (shared shingle memo, persisted band frame), so
    this adds only equi-joins keyed on (a_id, b_id) over candidate-pair
    frames — linear in pairs, which the incidence budgets keep linear in
    postings; the exact tier joins on the md5 group key. All counts are
    exact integers; the one ratio is single-rounded."""
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
    jc = dedup_ngram_jaccard(spark, sf_dir).select("a_id", "b_id")
    sh = dedup_simhash_pairs(spark, sf_dir).select("a_id", "b_id")
    univ = (
        ex.select(F.lit("exact").alias("s"), "a_id", "b_id")
        .unionByName(jc.select(F.lit("jaccard").alias("s"), "a_id", "b_id"))
        .unionByName(sh.select(F.lit("simhash").alias("s"), "a_id", "b_id"))
    )
    raw_counts = univ.groupBy("s").agg(
        F.count("*").cast("bigint").alias("__n")
    )
    # Complete strategy universe: a strategy with ZERO pairs (exact, on a
    # corpus without identical texts) must still appear in the matrix.
    strat = spark.createDataFrame([(s,) for s in _STRATEGIES], "s string")
    counts = strat.join(raw_counts, "s", "left").select(
        "s", F.coalesce(F.col("__n"), F.lit(0)).cast("bigint").alias("n")
    )
    overlap = (
        univ.alias("x")
        .join(
            univ.alias("y"),
            (F.col("x.a_id") == F.col("y.a_id"))
            & (F.col("x.b_id") == F.col("y.b_id"))
            & (F.col("x.s") < F.col("y.s")),
        )
        .groupBy(
            F.col("x.s").alias("strategy_a"), F.col("y.s").alias("strategy_b")
        )
        .agg(F.count("*").cast("bigint").alias("n_common"))
    )
    ca = counts.alias("ca")
    cb = counts.alias("cb")
    common = F.coalesce(F.col("n_common"), F.lit(0)).cast("bigint")
    denom = F.col("ca.n") + F.col("cb.n") - common
    return (
        ca.join(cb, F.col("ca.s") < F.col("cb.s"))
        .join(
            overlap,
            (F.col("strategy_a") == F.col("ca.s"))
            & (F.col("strategy_b") == F.col("cb.s")),
            "left",
        )
        .select(
            F.col("ca.s").alias("strategy_a"),
            F.col("cb.s").alias("strategy_b"),
            F.col("ca.n").alias("n_a"),
            F.col("cb.n").alias("n_b"),
            common.alias("n_common"),
            F.when(denom == 0, F.lit(None).cast("double"))
            .otherwise(F.round(common.cast("double") / denom, 6))
            .alias("agreement"),
        )
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
    # `e0` exponent form: DuckDB parses plain decimal literals as
    # DECIMAL (width-truncating!), but exponent-form via strtod as the
    # correctly-rounded DOUBLE — the exact Python float, as required.
    branches = " ".join(
        f"WHEN {r_expr} >= {r} THEN {_IDCG[r - 1]!r}e0"
        for r in range(NDCG_K, 0, -1)
    )
    return f"CASE {branches} ELSE NULL END"


def _dcg_terms_sql() -> str:
    """Fixed-written-order sum of max(CASE rnk=i AND relevant); `e0`
    exponent form parses as DOUBLE in DuckDB (see _idcg_case_sql)."""
    return "\n           + ".join(
        f"max(CASE WHEN rnk = {i + 1} AND relevant THEN {d!r}e0"
        " ELSE 0.0e0 END)"
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
    toks = F.split("text", " ")

    def tf_col(tm: str):
        return F.size(F.filter(toks, lambda x: x == tm)).cast("bigint")

    base = docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("dl"),
        *[tf_col(tm).alias(f"tf{i}") for i, tm in enumerate(BM25_TERMS)],
    )
    relevant = None
    for i in range(len(BM25_TERMS)):
        c = F.col(f"tf{i}") > 0
        relevant = c if relevant is None else (relevant & c)
    hits = sum(
        F.when(F.col(f"tf{i}") > 0, 1).otherwise(0)
        for i in range(len(BM25_TERMS))
    )
    tf_total = sum(F.col(f"tf{i}") for i in range(len(BM25_TERMS)))
    rel = base.select(
        "doc_id",
        relevant.alias("relevant"),
        F.round(tf_total.cast("double") / F.col("dl"), 6).alias("tfn_score"),
        hits.alias("hits"),
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
    dcg_expr = None
    for i, d in enumerate(_DISCOUNTS):
        term = F.max(
            F.when(
                (F.col("rnk") == i + 1) & F.col("relevant"), F.lit(d)
            ).otherwise(F.lit(0.0))
        )
        dcg_expr = term if dcg_expr is None else (dcg_expr + term)
    dcg = ranked.groupBy("ranker").agg(dcg_expr.alias("dcg"))
    # IDCG CASE in descending-r order, exactly like the SQL.
    idcg = None
    for r in range(NDCG_K, 0, -1):
        if idcg is None:
            idcg = F.when(F.col("r") >= r, F.lit(_IDCG[r - 1]))
        else:
            idcg = idcg.when(F.col("r") >= r, F.lit(_IDCG[r - 1]))
    idcg = idcg.otherwise(F.lit(None))
    return dcg.crossJoin(F.broadcast(nrel)).select(
        "ranker",
        F.col("r").alias("n_relevant"),
        F.round(F.col("dcg"), 6).alias("dcg"),
        F.round(F.col("dcg") / idcg, 6).alias("ndcg"),
    )

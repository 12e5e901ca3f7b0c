"""Winnowing-fingerprint queries over the `documents` table.

True winnowing (per-window minima, not a single global min) — the oracle
replays the exact same pipeline in SQL: a 60-bit integer hash (top 15 md5
hex chars, base-16-parsed) over every k-gram, sliding ROWS-window min per
document, distinct, then the df-capped fingerprint self-join for
shared-overlap pairs. md5 output is identical across engines, the hex
parse yields the same positive 64-bit value, and window-frame semantics
(ROWS BETWEEN w-1 PRECEDING AND CURRENT ROW) agree, so both sides are
replayable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..extensions.incidence import cap_ctes_sql
from ..extensions.text import winnow_fingerprints, winnow_shared_pairs
from .common import t
from .registry import query

K = 12
W = 6
MIN_SHARED = 5
MAX_FP_DF = 10

# Shared SQL prefix: k-gram hashes -> per-window minima -> distinct set.
_FP_CTE = f"""
    pos AS (
      SELECT doc_id, text,
             unnest(generate_series(1, len(text) - {K - 1})) AS p
      FROM documents
    ),
    kg AS (
      SELECT doc_id, p,
             ('0x' || substr(md5(substr(text, p, {K})), 1, 15))::BIGINT AS h
      FROM pos
    ),
    wm AS (
      SELECT doc_id, p,
             min(h) OVER (PARTITION BY doc_id ORDER BY p
                          ROWS BETWEEN {W - 1} PRECEDING AND CURRENT ROW)
               AS fingerprint
      FROM kg
    ),
    fp AS (
      SELECT DISTINCT doc_id, fingerprint FROM wm WHERE p >= {W}
    )
"""

# Adaptive incidence budget over the fingerprint universe (decon family
# — VERDICT r10 #4): emits the capped postings relation `fshc`. Same
# 3-per-4 linear budget as the shingle family (queries/dedup.py).
_FP_CAP_CTES = cap_ctes_sql("fp", "fingerprint", "doc_id", prefix="f")


@query(
    "winnow_fingerprints",
    oracle=f"""
    WITH
    {_FP_CTE}
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_fingerprints,
           min(fingerprint) AS min_fp,
           max(fingerprint) AS max_fp
    FROM fp GROUP BY doc_id
    """,
)
def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc winnowed fingerprint summary (count + set extrema): a green
    hash row proves the full per-window-min fingerprint SET matches the
    SQL replay, compressed to one row per doc for the driver compare."""
    docs = t(spark, sf_dir, "documents")
    fp = winnow_fingerprints(docs, "doc_id", "text", k=K, w=W)
    return fp.groupBy("doc_id").agg(
        F.count("*").alias("n_fingerprints"),
        F.min("fingerprint").alias("min_fp"),
        F.max("fingerprint").alias("max_fp"),
    )


@query(
    "winnow_shared_pairs",
    oracle=f"""
    WITH
    {_FP_CTE},
    rare AS (
      SELECT fingerprint FROM fp
      GROUP BY fingerprint HAVING count(*) <= {MAX_FP_DF}
    ),
    rfp AS (
      SELECT fp.doc_id, fp.fingerprint FROM fp
      JOIN rare USING (fingerprint)
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM rfp a JOIN rfp b USING (fingerprint)
    WHERE a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= {MIN_SHARED}
    """,
)
def q_winnow_shared_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy/boilerplate candidate pairs: docs sharing >= MIN_SHARED
    winnowed fingerprints after the df cap (see winnow_shared_pairs scale
    contract)."""
    docs = t(spark, sf_dir, "documents")
    return winnow_shared_pairs(
        docs,
        "doc_id",
        "text",
        k=K,
        w=W,
        min_shared=MIN_SHARED,
        max_fp_df=MAX_FP_DF,
    )


@query(
    "decontaminate_eval_split",
    oracle=f"""
    WITH
    {_FP_CTE},{_FP_CAP_CTES},
    split AS (
      SELECT doc_id,
             CASE WHEN (('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                        1, 8))::BIGINT % 100) < 80
                  THEN 'train' ELSE 'eval' END AS split
      FROM documents
    ),
    tfp AS (
      SELECT fshc.fingerprint, fshc.doc_id FROM fshc
      JOIN split USING (doc_id) WHERE split = 'train'
    ),
    efp AS (
      SELECT fshc.fingerprint, fshc.doc_id FROM fshc
      JOIN split USING (doc_id) WHERE split <> 'train'
    ),
    hits AS (
      SELECT e.doc_id AS eval_doc_id,
             count(DISTINCT e.fingerprint) AS n_shared,
             count(DISTINCT t.doc_id) AS n_train_docs
      FROM efp e JOIN tfp t USING (fingerprint)
      GROUP BY 1
    )
    SELECT eval_doc_id, CAST(n_shared AS BIGINT) AS n_shared,
           CAST(n_train_docs AS BIGINT) AS n_train_docs
    FROM hits WHERE n_shared >= {MIN_SHARED}
    """,
)
def decontaminate_eval_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: which EVAL documents share winnowed
    fingerprints with ANY train document — the leakage check every
    train/eval split needs before evaluation numbers mean anything.
    Composes the deterministic hash split (so the split itself is
    replayable in SQL) with the winnowing fingerprint set; an eval doc
    with >= MIN_SHARED shared fingerprints overlaps some train doc by at
    least one guaranteed substring run and should be quarantined. Join is
    fingerprint-keyed (train side pre-filtered), never eval x train.
    The fingerprint universe carries the adaptive incidence budget
    (extensions/incidence.py): a fingerprint shared by enough docs to
    blow the linear candidate budget is boilerplate, not leakage signal,
    and is dropped identically in both engines."""
    from ..extensions.incidence import budget_filter
    from ..extensions.sampling import hash_split

    from ..cache import tracked_persist

    docs = t(spark, sf_dir, "documents")
    split = hash_split(docs.select("doc_id"), "doc_id")
    # The fingerprint frame feeds both the train and eval branches; persist
    # so the explode + window min runs once (see cache contract).
    fps = tracked_persist(
        budget_filter(
            winnow_fingerprints(docs, "doc_id", "text", k=K, w=W),
            "fingerprint",
        ).join(split, "doc_id")
    )
    train = fps.filter(F.col("split") == "train").select(
        "fingerprint", F.col("doc_id").alias("train_doc_id")
    )
    ev = fps.filter(F.col("split") != "train").select(
        "fingerprint", F.col("doc_id").alias("eval_doc_id")
    )
    return (
        ev.join(train, "fingerprint")
        .groupBy("eval_doc_id")
        .agg(
            F.count_distinct("fingerprint").alias("n_shared"),
            F.count_distinct("train_doc_id").alias("n_train_docs"),
        )
        .filter(F.col("n_shared") >= MIN_SHARED)
    )

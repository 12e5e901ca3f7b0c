"""Winnowing-fingerprint queries over the `documents` table.

True winnowing (per-window minima, not a single global min) — the oracle
replays the exact same pipeline in SQL: md5 over every k-gram, sliding
ROWS-window min per document, distinct, then the df-capped fingerprint
self-join for shared-overlap pairs. md5 output is identical across engines
and window-frame semantics (ROWS BETWEEN w-1 PRECEDING AND CURRENT ROW)
agree, so both sides are replayable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
      SELECT doc_id, p, md5(substr(text, p, {K})) AS h FROM pos
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

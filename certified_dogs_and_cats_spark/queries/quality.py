"""Corpus-quality queries over the `documents` table (round-4 additions)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..extensions.text import ngram_repetition
from .common import t
from .registry import query


@query(
    "text_repetition_ratio",
    oracle="""
    WITH tk AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    g AS (
      SELECT doc_id,
             concat_ws(' ', toks[i+1], toks[i+2], toks[i+3]) AS ng
      FROM tk, UNNEST(range(0, len(toks) - 2)) AS u(i)
      WHERE len(toks) >= 3
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_ngrams,
           CAST(count(DISTINCT ng) AS BIGINT) AS n_distinct,
           round(1.0 - count(DISTINCT ng) * 1.0 / count(*), 6)
             AS repetition_ratio
    FROM g GROUP BY doc_id
    """,
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc trigram repetition (1 - distinct/total) — the intra-doc twin
    of the cross-doc dedup family: same n-gram machinery, pointed at
    template spam instead of near-duplicates."""
    docs = t(spark, sf_dir, "documents")
    return ngram_repetition(docs, "doc_id", "text", n=3)

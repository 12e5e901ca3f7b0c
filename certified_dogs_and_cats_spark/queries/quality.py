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


@query(
    "text_normalize_keys",
    oracle="""
    WITH n AS (
      SELECT doc_id,
             trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
               ' +', ' ', 'g')) AS norm
      FROM documents
    )
    SELECT doc_id,
           CAST(len(norm) AS BIGINT) AS n_chars,
           md5(norm) AS norm_key,
           CAST(len(string_split(norm, ' ')) AS BIGINT) AS n_tokens
    FROM n
    """,
)
def text_normalize_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical normalization (lower / strip punct / collapse space) with
    an md5 dedup key per doc — the preprocessing step every exact-dedup
    and matching pipeline runs first; portable character-class regexes
    replay identically in RE2."""
    from pyspark.sql import functions as F

    from ..extensions.text import normalize_text

    docs = t(spark, sf_dir, "documents")
    norm = normalize_text("text")
    return docs.select(
        "doc_id",
        F.length(norm).cast("long").alias("n_chars"),
        F.md5(norm).alias("norm_key"),
        F.size(F.split(norm, " ")).cast("long").alias("n_tokens"),
    )

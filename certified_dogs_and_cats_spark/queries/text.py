"""Text-analysis queries over the `documents` table (north-star extensions)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..extensions.text import (
    BPE_ISH_PATTERN,
    min_window_fingerprint,
    stopword_ratio,
    token_stats,
)
from .common import t
from .registry import query


@query(
    "text_token_stats",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    agg AS (
      SELECT doc_id, count(*) AS n_tokens,
             count(DISTINCT tok) AS n_distinct,
             CAST(sum(length(tok)) AS DOUBLE) / count(*) AS avg_token_len
      FROM tk GROUP BY 1
    )
    SELECT agg.doc_id, n_tokens, n_distinct, avg_token_len,
           CAST(len(regexp_extract_all(d.text, '{BPE_ISH_PATTERN}')) AS BIGINT)
             AS n_bpe_tokens
    FROM agg JOIN documents d ON d.doc_id = agg.doc_id
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return token_stats(docs, "doc_id", "text")


@query(
    "text_quality_score",
    oracle="""
    WITH tk AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    r AS (
      SELECT doc_id, count(*) AS n_tokens,
             CAST(sum(CASE WHEN tok IN ('a', 'the') THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*) AS stop_ratio
      FROM tk GROUP BY 1
    )
    SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars,
           r.n_tokens, r.stop_ratio,
           CASE WHEN r.n_tokens >= 20 AND r.stop_ratio <= 0.2 THEN 'good'
                WHEN r.n_tokens >= 10 THEN 'fair'
                ELSE 'low' END AS quality_class
    FROM documents d JOIN r ON r.doc_id = d.doc_id
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    r = stopword_ratio(docs, "doc_id", "text")
    base = docs.select(
        "doc_id", F.length("text").cast("long").alias("n_chars")
    )
    quality = (
        F.when(
            (F.col("n_tokens") >= 20) & (F.col("stop_ratio") <= 0.2), "good"
        )
        .when(F.col("n_tokens") >= 10, "fair")
        .otherwise("low")
    )
    return base.join(r, "doc_id").select(
        "doc_id",
        "n_chars",
        "n_tokens",
        "stop_ratio",
        quality.alias("quality_class"),
    )


@query(
    "text_lang_id",
    oracle="""
    WITH tk AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    r AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN tok IN ('a', 'the') THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*) AS marker_ratio
      FROM tk GROUP BY 1
    )
    SELECT d.doc_id, d.lang,
           CASE WHEN r.marker_ratio >= 0.08 THEN 'en'
                WHEN r.marker_ratio >= 0.04 THEN 'fr'
                ELSE 'other' END AS lang_pred,
           (CASE WHEN r.marker_ratio >= 0.08 THEN 'en'
                 WHEN r.marker_ratio >= 0.04 THEN 'fr'
                 ELSE 'other' END) = d.lang AS is_match
    FROM documents d JOIN r ON r.doc_id = d.doc_id
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    r = stopword_ratio(docs, "doc_id", "text").withColumnRenamed(
        "stop_ratio", "marker_ratio"
    )
    pred = (
        F.when(F.col("marker_ratio") >= 0.08, "en")
        .when(F.col("marker_ratio") >= 0.04, "fr")
        .otherwise("other")
    )
    return (
        docs.select("doc_id", "lang")
        .join(r.select("doc_id", "marker_ratio"), "doc_id")
        .select(
            "doc_id",
            "lang",
            pred.alias("lang_pred"),
            (pred == F.col("lang")).alias("is_match"),
        )
    )


@query(
    "text_fingerprint",
    oracle="""
    WITH w AS (
      SELECT doc_id,
             ('0x' || substr(md5(substr(text, CAST(p AS INTEGER), 12)),
                             1, 15))::BIGINT AS wh
      FROM documents, UNNEST(range(1, length(text) - 10, 4)) AS u(p)
    )
    SELECT doc_id, min(wh) AS fingerprint FROM w GROUP BY doc_id
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return min_window_fingerprint(docs, "doc_id", "text", k=12, stride=4)


@query(
    "text_lm_fluency",
    oracle="""
    WITH tk AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    pairs AS (
      SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
      FROM tk, UNNEST(range(1, len(toks))) AS u(i)
      WHERE len(toks) >= 2
    ),
    big AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY 1, 2),
    ctx AS (SELECT w1, sum(c12) AS c1 FROM big GROUP BY 1),
    vocab AS (
      SELECT count(DISTINCT tok) AS v
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    )
    SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(CAST(sum(c12 + 1) AS DOUBLE) / sum(c1 + v), 6) AS fluency
    FROM pairs p
    JOIN big USING (w1, w2)
    JOIN ctx USING (w1)
    CROSS JOIN vocab
    GROUP BY 1
    """,
)
def text_lm_fluency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram LM fluency (perplexity-proxy quality gate):
    micro-averaged add-one conditional probability of each doc's word
    transitions under the corpus's own bigram counts — pooled integer
    sums, one final division, so both engines agree bit-for-bit."""
    from ..extensions.text import bigram_fluency

    docs = t(spark, sf_dir, "documents")
    return bigram_fluency(docs, "doc_id", "text")


@query(
    "langid_confusion_matrix",
    oracle="""
    WITH tk AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    r AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN tok IN ('a', 'the') THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*) AS marker_ratio
      FROM tk GROUP BY 1
    ),
    p AS (
      SELECT d.lang,
             CASE WHEN r.marker_ratio >= 0.08 THEN 'en'
                  WHEN r.marker_ratio >= 0.04 THEN 'fr'
                  ELSE 'other' END AS lang_pred
      FROM documents d JOIN r ON r.doc_id = d.doc_id
    )
    SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n_docs
    FROM p GROUP BY 1, 2
    """,
)
def langid_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The language-ID QC report: predicted-vs-labeled confusion counts
    for the n-gram-marker classifier (text_lang_id) — the table a corpus
    owner reads to decide whether the cheap lang filter is safe to run
    at 100 TB, and which language pairs it confuses. One aggregate on
    top of the per-doc prediction; |langs|^2 output rows at any scale."""
    return (
        text_lang_id(spark, sf_dir)
        .groupBy("lang", "lang_pred")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
    )


PREFIX_TOKENS = 5


@query(
    "common_prefix_boilerplate",
    oracle=f"""
    WITH p AS (
      SELECT doc_id,
             array_to_string(
               list_slice(string_split(text, ' '), 1, {PREFIX_TOKENS}),
               ' ') AS prefix
      FROM documents
      WHERE len(string_split(text, ' ')) >= {PREFIX_TOKENS}
    )
    SELECT prefix,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS first_doc_id
    FROM p GROUP BY 1 HAVING count(*) >= 2
    """,
)
def common_prefix_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-opening detection: documents that BEGIN with the same
    {PREFIX_TOKENS}-token prefix are template/boilerplate suspects
    (headers, licence blurbs, scraped navigation) even when their bodies
    diverge too far for near-dup thresholds. Group on the prefix string
    itself — one narrow map + one hash aggregate; at 100 TB you'd group
    on a hash of the prefix, identical plan shape."""
    toks = F.split("text", " ")
    p = (
        t(spark, sf_dir, "documents")
        .filter(F.size(toks) >= PREFIX_TOKENS)
        .select(
            "doc_id",
            F.concat_ws(" ", F.slice(toks, 1, PREFIX_TOKENS)).alias(
                "prefix"
            ),
        )
    )
    return (
        p.groupBy("prefix")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("first_doc_id"),
        )
        .filter(F.col("n_docs") >= 2)
    )

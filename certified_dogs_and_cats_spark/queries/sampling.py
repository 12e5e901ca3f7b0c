"""Deterministic sampling/splitting queries over the `documents` table.

md5-keyed assignment replays exactly in DuckDB (hex-prefix -> integer
bucket), so split membership is verified value-for-value across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..extensions.sampling import hash_split, per_group_sample
from .common import t
from .registry import query

SAMPLE_PER_SOURCE = 10

_BUCKET = "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100)"


@query(
    "sample_hash_split",
    oracle=f"""
    SELECT CASE WHEN {_BUCKET} < 80 THEN 'train'
                WHEN {_BUCKET} < 90 THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS cnt,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1
    """,
)
def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return (
        hash_split(docs, "doc_id")
        .groupBy("split")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@query(
    "sample_per_group",
    oracle=f"""
    SELECT source, doc_id FROM (
      SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
             ) AS rn
      FROM documents
    ) WHERE rn <= {SAMPLE_PER_SOURCE}
    """,
)
def sample_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("source", "doc_id")
    return per_group_sample(
        docs, ["source"], "doc_id", n=SAMPLE_PER_SOURCE
    )


@query(
    "corpus_prep_summary",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    r AS (SELECT doc_id, count(*) AS n_tokens FROM tk GROUP BY 1),
    keep AS (
      SELECT d.doc_id, d.text, d.source, d.n_chars
      FROM documents d JOIN r USING (doc_id)
      WHERE r.n_tokens >= 10
    ),
    ded AS (
      SELECT * FROM (
        SELECT keep.*, min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
        FROM keep
      ) WHERE doc_id = keep_id
    )
    SELECT CASE WHEN {_BUCKET} < 80 THEN 'train'
                WHEN {_BUCKET} < 90 THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources
    FROM ded
    GROUP BY 1
    """,
)
def corpus_prep_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus prep: quality filter (min token count) ->
    exact dedup (earliest doc per text hash wins) -> deterministic
    train/val/test split -> per-split rollup. The composition every 100 TB
    pipeline runs nightly; all stages are the same operators verified
    individually, chained in one declarative plan (Catalyst fuses the
    filters/projections; two shuffles total — the dedup window and the
    final aggregation — plus the token-count aggregation)."""
    from pyspark.sql import Window

    from ..extensions.text import stopword_ratio

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", "text", "source", "n_chars"
    )
    ntok = stopword_ratio(docs, "doc_id", "text").select("doc_id", "n_tokens")
    keep = docs.join(ntok, "doc_id").filter(F.col("n_tokens") >= 10)
    w = Window.partitionBy(F.md5(F.col("text")))
    ded = keep.withColumn("keep_id", F.min("doc_id").over(w)).filter(
        F.col("doc_id") == F.col("keep_id")
    )
    return (
        hash_split(ded, "doc_id")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
        )
    )


@query(
    "sample_stratified_split",
    oracle="""
    WITH ranked AS (
      SELECT source, n_chars,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
             ) AS rn,
             count(*) OVER (PARTITION BY source) AS n
      FROM documents
    ),
    s AS (
      SELECT source, n_chars,
             CASE WHEN (rn - 1) * 100 < 80 * n THEN 'train'
                  WHEN (rn - 1) * 100 < 90 * n THEN 'val'
                  ELSE 'test' END AS split
      FROM ranked
    )
    SELECT source, split, count(*) AS cnt,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM s GROUP BY 1, 2
    """,
)
def sample_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-stratum 80/10/10 (every source within 1 row of target —
    hash_split's proportions are only statistical and can starve small
    strata); integer-math percentile cuts replayed identically in SQL."""
    from ..extensions.sampling import stratified_split

    docs = t(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    )
    return stratified_split(docs, ["source"], "doc_id").groupBy(
        "source", "split"
    ).agg(
        F.count("*").alias("cnt"),
        F.sum("n_chars").alias("total_chars"),
    )


@query(
    "token_budget_sample",
    oracle="""
    WITH toks AS (
      SELECT source, doc_id,
             len(string_split(text, ' ')) AS n_tok,
             md5(CAST(doc_id AS VARCHAR)) AS hkey
      FROM documents
    ),
    cum AS (
      SELECT source, doc_id, n_tok,
             sum(n_tok) OVER (PARTITION BY source
                              ORDER BY hkey, doc_id) AS running,
             sum(n_tok) OVER (PARTITION BY source) AS src_total
      FROM toks
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs_kept,
           CAST(sum(n_tok) AS BIGINT) AS tokens_kept,
           CAST(max(src_total) AS BIGINT) AS tokens_available
    FROM cum
    WHERE running <= CAST(floor(src_total * 0.5) AS BIGINT)
    GROUP BY source
    """,
)
def token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKEN-BUDGET mixture sampling — the other half of corpus mixing
    (mixture_sample reweights by RATE; training runs are provisioned by
    TOKENS): each source keeps documents, in deterministic md5-of-id
    order, until 50% of its token mass is spent. The hash order makes the
    selection a pure function of the ids — re-runs and backfills keep
    exactly the same docs — and the greedy prefix is replayed in SQL as a
    running-sum window. One shuffle on source; at 100 TB the window
    partitions by source, so budget accounting never concentrates beyond
    a source's own rows (salt the running sum per shard and pre-aggregate
    if a single source dominates the corpus)."""
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents").select("source", "doc_id", "text")
    toks = docs.select(
        "source",
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tok"),
        F.md5(F.col("doc_id").cast("string")).alias("hkey"),
    )
    w = Window.partitionBy("source").orderBy("hkey", "doc_id")
    wall = Window.partitionBy("source")
    cum = toks.select(
        "source",
        "n_tok",
        F.sum("n_tok").over(w).alias("running"),
        F.sum("n_tok").over(wall).alias("src_total"),
    )
    # floor() on BOTH sides: Spark's cast(double->bigint) truncates while
    # DuckDB's CAST rounds-to-nearest, so an odd src_total (threshold
    # ending in .5) with a doc landing exactly on the boundary would
    # diverge cross-engine. floor is identical in both.
    kept = cum.filter(
        F.col("running")
        <= F.floor(F.col("src_total") * F.lit(0.5)).cast("bigint")
    )
    return kept.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs_kept"),
        F.sum("n_tok").cast("bigint").alias("tokens_kept"),
        F.max("src_total").cast("bigint").alias("tokens_available"),
    )

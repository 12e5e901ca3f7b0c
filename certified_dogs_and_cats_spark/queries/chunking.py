"""Chunking / sequence-packing queries over the `documents` table —
the layout steps between a cleaned corpus and a training run."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..extensions.text import chunk_tokens, pack_token_stream
from .common import t
from .registry import query

CHUNK = 64
OVERLAP = 16
STRIDE = CHUNK - OVERLAP
BUDGET = 256


@query(
    "chunk_documents_overlap",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    c AS (
      SELECT doc_id,
             CAST((s - 1) / {STRIDE} + 1 AS INTEGER) AS chunk_idx,
             CAST(s AS INTEGER) AS token_start,
             list_slice(toks, s, least(s + {CHUNK} - 1, len(toks))) AS chunk
      FROM d, UNNEST(generate_series(1, greatest(len(toks), 1), {STRIDE}))
               AS u(s)
      WHERE s = 1 OR s + {OVERLAP} <= len(toks)
    )
    SELECT doc_id, chunk_idx, token_start,
           CAST(len(chunk) AS INTEGER) AS n_tokens,
           array_to_string(chunk, ' ') AS chunk_text
    FROM c
    """,
)
def chunk_documents_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token chunking with overlap (64-token chunks, 16 carried over) —
    the pre-embedding / pre-training split, with full provenance (doc id,
    chunk index, token offset) for lineage joins. The oracle replays the
    slicing with DuckDB list functions, including the short final chunk."""
    docs = t(spark, sf_dir, "documents")
    return chunk_tokens(
        docs, "doc_id", "text", chunk_size=CHUNK, overlap=OVERLAP
    )


@query(
    "pack_sequences_budget",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens,
             sum(n_tokens) OVER (ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS e
      FROM d
    )
    SELECT CAST(b AS BIGINT) AS bin_id, doc_id,
           CAST(least(e, (b + 1) * {BUDGET})
                - greatest(e - n_tokens, b * {BUDGET}) AS BIGINT)
             AS tokens_in_bin
    FROM c, UNNEST(generate_series(
               CAST(floor((e - n_tokens) / {BUDGET}) AS BIGINT),
               CAST(floor((e - 1) / {BUDGET}) AS BIGINT))) AS u(b)
    """,
)
def pack_sequences_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-and-cut sequence packing at a 256-token budget: the
    zero-padding-waste layout LLM pretraining uses; emits (bin, doc,
    contributed tokens) with straddling docs split across bins. Oracle
    replays the running-sum + boundary math exactly."""
    docs = t(spark, sf_dir, "documents")
    return pack_token_stream(docs, "doc_id", "text", budget=BUDGET)


TRUNC_BUDGET = 128


@query(
    "truncation_loss_report",
    oracle=f"""
    WITH d AS (
      SELECT source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n
      FROM documents
    ),
    a AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN n > {TRUNC_BUDGET} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_truncated,
             CAST(sum(n) AS BIGINT) AS tokens_total,
             CAST(sum(least(n, {TRUNC_BUDGET})) AS BIGINT) AS tokens_kept
      FROM d GROUP BY 1
    )
    SELECT source, n_docs, n_truncated, tokens_total, tokens_kept,
           tokens_total - tokens_kept AS tokens_lost,
           CAST((1000 * (tokens_total - tokens_kept)) // tokens_total
                AS BIGINT) AS loss_permille
    FROM a
    """,
)
def truncation_loss_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What a fixed context budget throws away: per source, how many
    documents exceed the {budget}-token cutoff and what fraction of the
    token mass truncation would discard — the report that decides
    between truncate / chunk / drop for each source before training.
    Integer-exact (counts and a permille floor-division); one narrow
    map + one hash aggregate, no shuffle of text."""
    d = t(spark, sf_dir, "documents").select(
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n"),
    )
    a = d.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("n") > TRUNC_BUDGET, 1).otherwise(0))
        .cast("bigint")
        .alias("n_truncated"),
        F.sum("n").cast("bigint").alias("tokens_total"),
        F.sum(F.least(F.col("n"), F.lit(TRUNC_BUDGET)))
        .cast("bigint")
        .alias("tokens_kept"),
    )
    return a.select(
        "source",
        "n_docs",
        "n_truncated",
        "tokens_total",
        "tokens_kept",
        (F.col("tokens_total") - F.col("tokens_kept")).alias("tokens_lost"),
        F.expr("(1000 * (tokens_total - tokens_kept)) div tokens_total")
        .cast("bigint")
        .alias("loss_permille"),
    )


@query(
    "token_length_log2_histogram",
    oracle="""
    WITH d AS (
      SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n
      FROM documents
    )
    SELECT CAST(length(bin(n)) - 1 AS INTEGER) AS log2_bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n) AS BIGINT) AS tokens_in_bucket,
           CAST(min(n) AS BIGINT) AS min_tokens,
           CAST(max(n) AS BIGINT) AS max_tokens
    FROM d GROUP BY 1
    """,
)
def token_length_log2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length distribution in power-of-two buckets — the shape
    that sizes chunking, packing budgets and padding waste before a
    training run. The log2 bucket is floor(log2(n)) computed INTEGER-exactly
    as length(bin(n)) - 1 (bit width), never a float log2 whose
    rounding at exact powers of two differs across libms. One narrow
    map + one 30-ish-group hash aggregate at any corpus size."""
    d = t(spark, sf_dir, "documents").select(
        F.size(F.split("text", " ")).cast("bigint").alias("n")
    )
    return d.groupBy(
        (F.length(F.bin("n")) - 1).cast("int").alias("log2_bucket")
    ).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n").cast("bigint").alias("tokens_in_bucket"),
        F.min("n").cast("bigint").alias("min_tokens"),
        F.max("n").cast("bigint").alias("max_tokens"),
    )


PACK_BUDGETS = (128, 256, 512)


@query(
    "packing_fill_rates",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n
      FROM documents
    ),
    c AS (
      SELECT doc_id, n,
             sum(n) OVER (ORDER BY doc_id ASC
                          ROWS UNBOUNDED PRECEDING) AS fin,
             sum(n) OVER (ORDER BY doc_id ASC
                          ROWS UNBOUNDED PRECEDING) - n AS st
      FROM d
    ),
    b AS (SELECT unnest(ARRAY{list(PACK_BUDGETS)}) AS budget)
    SELECT b.budget,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(max(fin) AS BIGINT) AS total_tokens,
           CAST((max(fin) + b.budget - 1) // b.budget AS BIGINT) AS n_bins,
           CAST((1000 * max(fin)) //
                (((max(fin) + b.budget - 1) // b.budget) * b.budget)
                AS BIGINT) AS fill_permille,
           CAST(sum(CASE WHEN (fin - 1) // b.budget > st // b.budget
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers
    FROM c CROSS JOIN b GROUP BY 1
    """,
)
def packing_fill_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing planning across candidate budgets: for each
    context budget, how many bins the doc_id-ordered token stream packs
    into (straddling docs split across bin boundaries, the
    pack_token_stream semantics), the overall fill rate, and how many
    documents get split. Closed form from ONE running-sum window over
    doc order — each doc's stream interval [start, end) crosses
    (end-1) div B - (start div B) boundaries — so the report never
    materializes the packed bins themselves. All-integer math.

    The prefix sum is TWO-LEVEL, never a global window over doc rows
    (the shape the plan audit forbids): docs cumsum WITHIN contiguous
    doc_id buckets (a partitioned window), bucket totals — an
    aggregate-scale relation — take the only unpartitioned window, and
    each doc's global offset is local cumsum + broadcast bucket offset.
    Mathematically identical to the oracle's single global cumsum
    (integer sums associate), structurally scalable: per-bucket sorts
    plus one tiny offsets pass."""
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n"),
        F.expr("doc_id div 100000").alias("bkt"),
    )
    w_loc = (
        Window.partitionBy("bkt")
        .orderBy(F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    loc = d.select("doc_id", "n", "bkt", F.sum("n").over(w_loc).alias("lfin"))
    # Exclusive running offset per bucket: unpartitioned window ONLY over
    # the bucket-totals aggregate (bounded rows at any corpus size).
    w_off = (
        Window.orderBy(F.col("bkt").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = (
        d.groupBy("bkt")
        .agg(F.sum("n").alias("btot"))
        .select(
            "bkt",
            F.coalesce(F.sum("btot").over(w_off), F.lit(0)).alias("boff"),
        )
    )
    c = loc.join(F.broadcast(off), "bkt").select(
        "doc_id",
        "n",
        (F.col("lfin") + F.col("boff")).alias("fin"),
        (F.col("lfin") + F.col("boff") - F.col("n")).alias("st"),
    )
    budgets = F.explode(
        F.array(*[F.lit(b) for b in PACK_BUDGETS])
    ).alias("budget")
    return (
        c.select("doc_id", "n", "fin", "st", budgets)
        .groupBy("budget")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.max("fin").cast("bigint").alias("total_tokens"),
            F.expr("(max(fin) + budget - 1) div budget")
            .cast("bigint")
            .alias("n_bins"),
            F.expr(
                "(1000 * max(fin)) div"
                " (((max(fin) + budget - 1) div budget) * budget)"
            )
            .cast("bigint")
            .alias("fill_permille"),
            F.sum(
                F.when(
                    F.expr("(fin - 1) div budget > st div budget"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_straddlers"),
        )
    )

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

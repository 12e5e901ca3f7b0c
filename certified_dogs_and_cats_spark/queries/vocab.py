"""Vocabulary / corpus-preparation queries over the `documents` table —
the tokenizer-side steps of a training-data pipeline (vocabulary
heavy-hitters, id encoding, boilerplate pruning, segment-level exact
dedup). North-star extensions; no reference counterpart (the reference
stops at SQL analytics views, notebooks/gold.py:12-380)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..extensions.vocab import (
    build_vocab,
    encode_docs,
    prune_hot_tokens,
    segment_dedup_stats,
    token_zipf,
)
from .common import t
from .registry import query

ZIPF_K = 30
VOCAB_SIZE = 20
IDS_HEAD = 8
HOT_DF_FRAC = 0.78
SEG_TOKENS = 3


@query(
    "token_zipf_topk",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    a AS (
      SELECT tok, count(*) AS tf, count(DISTINCT doc_id) AS df
      FROM tk GROUP BY 1
    ),
    r AS (
      SELECT tok, tf, df,
             row_number() OVER (ORDER BY tf DESC, tok) AS rnk
      FROM a
    )
    SELECT tok, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           CAST(rnk AS INTEGER) AS rnk
    FROM r WHERE rnk <= {ZIPF_K}
    """,
)
def token_zipf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy-hitters: top-30 tokens by term frequency with document
    frequency and Zipf rank — the first step of vocabulary building. The
    Spark plan is one hash aggregate then TakeOrderedAndProject (each task
    keeps k rows), never a full-vocabulary sort."""
    docs = t(spark, sf_dir, "documents")
    return token_zipf(docs, "doc_id", "text", k=ZIPF_K)


@query(
    "vocab_encode_docs",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    tk AS (
      SELECT doc_id, i AS pos, toks[i] AS tok
      FROM d, UNNEST(generate_series(1, len(toks))) AS u(i)
    ),
    v AS (
      SELECT tok, count(*) AS tf FROM tk GROUP BY 1
    ),
    topv AS (
      SELECT tok, row_number() OVER (ORDER BY tf DESC, tok) AS tok_id
      FROM v ORDER BY tf DESC, tok LIMIT {VOCAB_SIZE}
    ),
    e AS (
      SELECT tk.doc_id, tk.pos, COALESCE(topv.tok_id, 0) AS tok_id
      FROM tk LEFT JOIN topv ON tk.tok = topv.tok
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN tok_id = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           array_to_string(
             list_slice(list(tok_id ORDER BY pos), 1, {IDS_HEAD}), '-')
             AS ids_head
    FROM e GROUP BY doc_id
    """,
)
def vocab_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize-to-ids: build a frequency-ranked top-20 vocabulary, then
    encode every document positionally against it (OOV -> 0), returning
    per-doc length, OOV count, and the first 8 ids as a '-'-joined prefix
    that hash-pins the positional encode. The vocabulary is top-V by
    construction, so the encode join is a broadcast."""
    docs = t(spark, sf_dir, "documents")
    vocab = build_vocab(docs, "doc_id", "text", size=VOCAB_SIZE)
    return encode_docs(docs, "doc_id", "text", vocab, head=IDS_HEAD)


@query(
    "boilerplate_token_prune",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    tk AS (
      SELECT doc_id, i AS pos, toks[i] AS tok
      FROM d, UNNEST(generate_series(1, len(toks))) AS u(i)
    ),
    nd AS (SELECT count(*) AS n FROM documents),
    dfreq AS (
      SELECT tok, count(DISTINCT doc_id) AS df FROM tk GROUP BY 1
    ),
    hot AS (SELECT tok FROM dfreq, nd WHERE df > {HOT_DF_FRAC} * n),
    k AS (
      SELECT tk.doc_id, tk.pos, tk.tok, (h.tok IS NOT NULL) AS is_hot
      FROM tk LEFT JOIN hot h ON tk.tok = h.tok
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN is_hot THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dropped,
           COALESCE(string_agg(tok, ' ' ORDER BY pos)
                      FILTER (WHERE NOT is_hot), '') AS kept_text
    FROM k GROUP BY doc_id
    """,
)
def boilerplate_token_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style corpus-frequency pruning: tokens present in more than
    78% of documents are boilerplate and get stripped from every doc; the
    surviving text is reassembled in token order. The hot list is
    constant-size by pigeonhole and broadcast, so pruning never shuffles
    token payloads."""
    docs = t(spark, sf_dir, "documents")
    return prune_hot_tokens(docs, "doc_id", "text", max_df_frac=HOT_DF_FRAC)


@query(
    "segment_exact_dedup",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    c AS (
      SELECT doc_id,
             CAST((s - 1) / {SEG_TOKENS} + 1 AS INTEGER) AS chunk_idx,
             list_slice(toks, s, least(s + {SEG_TOKENS} - 1, len(toks)))
               AS chunk
      FROM d, UNNEST(generate_series(1, greatest(len(toks), 1),
                                     {SEG_TOKENS})) AS u(s)
      WHERE s <= len(toks)
    ),
    hsh AS (
      SELECT doc_id, chunk_idx, len(chunk) AS n_tokens,
             md5(array_to_string(chunk, ' ')) AS h
      FROM c
    ),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY h
                                   ORDER BY doc_id, chunk_idx) AS rn
      FROM hsh
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments,
           CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_segments,
           CAST(sum(CASE WHEN rn = 1 THEN n_tokens ELSE 0 END) AS BIGINT)
             AS kept_tokens
    FROM r GROUP BY doc_id
    """,
)
def segment_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document exact dedup at segment granularity (the tractable
    Spark form of suffix-array ExactSubstr): 3-token segments are hashed
    corpus-wide and only the first occurrence survives; per-doc counts of
    duplicate segments and retained tokens come back. One shuffle on the
    segment hash; the oracle replays the segmentation and keeper choice
    in DuckDB."""
    docs = t(spark, sf_dir, "documents")
    return segment_dedup_stats(docs, "doc_id", "text", seg_tokens=SEG_TOKENS)


# Fixed 20-rule merge table for bpe_apply_fixed, in training order (later
# rules reference symbols earlier rules created: th->the, an->and, in->ing).
# A LITERAL table makes the inherently-iterative tokenizer's APPLY path
# SQL-replayable — the same move vocab_encode_docs made for id encoding.
BPE_MERGES = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("e", "r"), ("a", "n"),
    ("an", "d"), ("o", "n"), ("r", "e"), ("a", "t"), ("e", "s"),
    ("o", "r"), ("t", "i"), ("s", "t"), ("l", "e"), ("o", "u"),
    ("a", "r"), ("e", "d"), ("i", "s"), ("in", "g"), ("c", "o"),
]
BPE_DOC_MOD = 10


def _bpe_nested_replace(expr: str) -> str:
    """The merge-table replay as nested string replaces over a
    delimiter-wrapped symbol string ('|t| |h| |e|' -> '|th| |e|' ->
    '|the|'): replace() is left-to-right NON-OVERLAPPING in both engines,
    which is exactly reference BPE's greedy overlap semantics
    ('aaaa' under (a,a) -> 'aa','aa'), and the |..| wrapping makes a rule
    match whole symbols only (never the tail of 'xa' or the head of
    'bx')."""
    for a, b in BPE_MERGES:
        expr = f"replace({expr}, '|{a}| |{b}|', '|{a}{b}|')"
    return expr


@query(
    "bpe_apply_fixed",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             regexp_replace(lower(text), '[^a-z ]', ' ', 'g') AS t
      FROM documents WHERE doc_id % {BPE_DOC_MOD} = 0
    ),
    w0 AS (
      SELECT doc_id,
             generate_subscripts(string_split(t, ' '), 1) AS pos,
             unnest(string_split(t, ' ')) AS w
      FROM d
    ),
    w AS (SELECT doc_id, pos, w FROM w0 WHERE w != ''),
    sym AS (
      SELECT doc_id, pos,
             array_to_string(
               list_transform(string_split(w, ''), c -> '|' || c || '|'),
               ' ') AS s
      FROM w
    ),
    m AS (
      SELECT doc_id, pos, {{merged}} AS s FROM sym
    ),
    tok AS (
      SELECT doc_id, pos,
             list_transform(string_split(s, ' '),
                            x -> replace(x, '|', '')) AS toks
      FROM m
    )
    SELECT doc_id,
           CAST(sum(len(toks)) AS BIGINT) AS n_tokens,
           string_agg(array_to_string(toks, ' '), ' ' ORDER BY pos)
             AS tokens_str
    FROM tok GROUP BY doc_id
    """.format(merged=_bpe_nested_replace("s")),
)
def bpe_apply_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer APPLICATION with a fixed literal 20-rule merge table
    (extensions.bpe.apply_bpe_replace — the trained-merge replay under
    the [a-z ] charset contract; training itself is iterative and
    pytest-pinned, but application with frozen rules is a pure JVM
    string replay and therefore oracle-checkable). Text is lowercased
    and restricted to [a-z ] first, which both engines' delimiter-
    wrapped replace replay requires. Plan: ZERO shuffles — the whole
    tokenize is one codegen'd projection per document (r12: the prior
    per-word fold paid 20 interpreted aggregate() lambdas per word plus
    a per-doc reassembly shuffle); the 20 merge rules ride in the plan
    as literals; at 100 TB this is the map-side tokenize stage of shard
    export, and the broadcastable merge table is the whole model."""
    from pyspark.sql import functions as F

    from ..extensions.bpe import apply_bpe_replace

    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % BPE_DOC_MOD == 0)
        .select(
            "doc_id",
            F.regexp_replace(F.lower("text"), "[^a-z ]", " ").alias("t"),
        )
    )
    out = apply_bpe_replace(docs, "doc_id", "t", BPE_MERGES)
    return out.select(
        "doc_id",
        F.size("tokens").cast("bigint").alias("n_tokens"),
        F.concat_ws(" ", "tokens").alias("tokens_str"),
    )

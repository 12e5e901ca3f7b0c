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


def winnow_fingerprints(
    df: DataFrame, id_col: str, text_col: str, k: int = 8, w: int = 4
) -> DataFrame:
    """True winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03): hash every
    k-gram, slide a window of ``w`` consecutive k-gram hashes, keep the
    minimum of EACH window, return the distinct (id, fingerprint) set.

    Unlike :func:`min_window_fingerprint` (one global min per doc — cheap
    but only detects near-identical docs), the per-window minima carry the
    winnowing guarantee: any substring match of length >= w + k - 1 between
    two documents produces at least one SHARED fingerprint, so local
    overlaps (quotes, boilerplate, partial copies) are detectable, not just
    whole-doc duplicates.

    Plan shape: one explode to k-gram rows (|text| rows per doc — winnowing
    is inherently per-position), one shuffle partitioning by doc for the
    sliding-window min, one distinct. The md5 k-gram hashing stays in
    whole-stage codegen. Docs shorter than w + k - 1 chars yield no
    fingerprints (no full window exists).

    Measured alternative, rejected: computing the sliding minima entirely
    array-side (transform + array_min(slice(...)), zero pre-distinct
    shuffle) benched ~1.8x SLOWER at sf0.1 — Spark evaluates higher-order
    lambdas interpreted, while the window min stays in compiled codegen,
    and the doc-partitioned shuffle it saves is small (hashes, not text).
    """
    from pyspark.sql import Window

    pos = F.explode(
        F.sequence(F.lit(1), F.length(F.col(text_col)) - (k - 1))
    ).alias("p")
    kgrams = df.select(F.col(id_col), F.col(text_col), pos).select(
        F.col(id_col),
        F.col("p"),
        F.md5(F.expr(f"substr({text_col}, p, {k})")).alias("h"),
    )
    win = Window.partitionBy(id_col).orderBy("p").rowsBetween(-(w - 1), 0)
    return (
        kgrams.select(
            F.col(id_col),
            F.col("p"),
            F.min("h").over(win).alias("fingerprint"),
        )
        .filter(F.col("p") >= w)  # only full windows
        .select(id_col, "fingerprint")
        .distinct()
    )


def winnow_shared_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    w: int = 4,
    min_shared: int = 3,
    max_fp_df: int = 50,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowed fingerprints —
    the pair-generation step of a copy/boilerplate detector.

    Scale contract (same shape as jaccard_pairs): fingerprints occurring in
    more than ``max_fp_df`` docs are dropped before the self-join — a
    corpus-wide boilerplate fingerprint would otherwise fan out
    quadratically; dropping it loses pairs only for overlaps ALSO covered
    by rarer fingerprints, and caps per-key join width at max_fp_df. The
    join shuffles on the fingerprint value; output is (id_a, id_b,
    n_shared) with id_a < id_b.
    """
    from ..cache import tracked_persist

    fp = tracked_persist(winnow_fingerprints(df, id_col, text_col, k=k, w=w))
    rare = fp.join(
        fp.groupBy("fingerprint")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= max_fp_df)
        .select("fingerprint"),
        "fingerprint",
    )
    left = rare.select(F.col("fingerprint"), F.col(id_col).alias("id_a"))
    right = rare.select(F.col("fingerprint"), F.col(id_col).alias("id_b"))
    return (
        left.join(right, "fingerprint")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def ngram_repetition(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Intra-document repetition: 1 - distinct/total word n-grams — the
    Gopher-style quality gate that catches boilerplate loops, keyboard
    mash, and template spam (high ratio = the doc repeats itself).
    Per-doc aggregate over a non-distinct n-gram explode; one shuffle on
    the doc id, all expressions in codegen. Docs with < n tokens yield no
    rows (no n-grams to judge)."""
    toks = F.split(F.col(text_col), " ")
    parts = ", ".join(f"__toks__[i+{j}]" for j in range(n))
    grams = F.expr(
        f"transform(sequence(0, size(__toks__)-{n}), i -> concat_ws(' ', {parts}))"
    )
    g = (
        df.select(F.col(id_col), toks.alias("__toks__"))
        .filter(F.size("__toks__") >= n)
        .select(F.col(id_col), F.explode(grams).alias("ng"))
    )
    return g.groupBy(id_col).agg(
        F.count("*").alias("n_ngrams"),
        F.countDistinct("ng").alias("n_distinct"),
        F.round(
            F.lit(1.0) - F.countDistinct("ng") / F.count("*"), 6
        ).alias("repetition_ratio"),
    )


def normalize_text(col: str | Column) -> Column:
    """Canonical text normalization for dedup keys and matching: lowercase,
    non-alphanumerics to spaces, whitespace collapsed, trimmed. Simple
    character classes only, so the regexes behave identically under Java
    regex (Spark) and RE2 (DuckDB) — the portability constraint for
    oracle-checked dedup keys."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(c), "[^a-z0-9 ]", " "), " +", " "
        )
    )

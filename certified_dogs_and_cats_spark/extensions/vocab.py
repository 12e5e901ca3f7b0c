"""Vocabulary / corpus-preparation operators over the `documents` table:
the steps between a cleaned corpus and a tokenized training set.

North-star extensions beyond the reference's operator set (the reference
pipeline stops at SQL analytics views, `notebooks/gold.py:12-380`); these
are the corpus-side siblings of extensions/text.py's per-doc statistics.

Scale contracts (100 TB posture):

- ``token_zipf`` — one shuffle for the (token -> tf, df) aggregate, then a
  per-partition top-k (``orderBy().limit()`` compiles to
  TakeOrderedAndProject: each task keeps k rows, the driver merges k per
  partition — never the full vocabulary).
- ``build_vocab`` / ``encode_docs`` — the vocabulary is top-V by
  construction, so the encode join broadcasts it; token positions never
  shuffle (the per-doc aggregate groups on the already-co-located doc id).
- ``prune_hot_tokens`` — document frequency is one shuffle; the hot list
  (df > frac * n_docs) is bounded by avg_distinct_tokens_per_doc / frac
  (pigeonhole over sum-of-df) — independent of CORPUS SIZE, though not of
  document length; size the broadcast for L/frac entries.
- ``segment_dedup_stats`` — one shuffle on the segment hash (uniform by
  construction), segment payloads are fixed-width; first-occurrence pick
  is a row_number over (hash) — no global sort, no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..operators.partitioning import spread
from .text import chunk_tokens


def pos_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, tok) — whitespace tokenization with 0-based position."""
    df = spread(df)
    return df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok"),
    )


def token_zipf(
    df: DataFrame, id_col: str, text_col: str, k: int = 30
) -> DataFrame:
    """Corpus vocabulary heavy-hitters: top-k tokens by term frequency
    with document frequency and dense Zipf rank (ties broken by token so
    the result is deterministic). The first step of vocabulary building.

    Plan: hash-aggregate (one shuffle) -> TakeOrderedAndProject (each task
    retains k rows) -> row_number over the k survivors only.
    """
    agg = (
        pos_tokens(df, id_col, text_col)
        .groupBy("tok")
        .agg(
            F.count("*").alias("tf"),
            F.countDistinct(id_col).alias("df"),
        )
    )
    top = agg.orderBy(F.col("tf").desc(), F.col("tok")).limit(k)
    w = Window.orderBy(F.col("tf").desc(), F.col("tok"))
    return top.select(
        "tok",
        F.col("tf").cast("long").alias("tf"),
        F.col("df").cast("long").alias("df"),
        F.row_number().over(w).cast("int").alias("rnk"),
    )


def build_vocab(
    df: DataFrame, id_col: str, text_col: str, size: int
) -> DataFrame:
    """(tok, tok_id) — frequency-ranked vocabulary of the top ``size``
    tokens; tok_id starts at 1 (0 is reserved for out-of-vocabulary)."""
    tk = pos_tokens(df, id_col, text_col)
    top = (
        tk.groupBy("tok")
        .agg(F.count("*").alias("tf"))
        .orderBy(F.col("tf").desc(), F.col("tok"))
        .limit(size)
    )
    w = Window.orderBy(F.col("tf").desc(), F.col("tok"))
    return top.select(
        "tok", F.row_number().over(w).cast("int").alias("tok_id")
    )


def encode_docs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab: DataFrame,
    head: int = 8,
) -> DataFrame:
    """Encode each document as a token-id sequence against ``vocab``
    (unknown tokens -> id 0). Emits per-doc length, OOV count, and the
    first ``head`` ids serialized as a '-'-joined string (a hashable
    prefix that pins the full positional encode cross-engine).

    The vocabulary is broadcast (top-V by construction); ids are
    reassembled in token order with one per-doc aggregate.
    """
    tk = pos_tokens(df, id_col, text_col)
    enc = tk.join(F.broadcast(vocab), "tok", "left").select(
        F.col(id_col),
        "pos",
        F.coalesce("tok_id", F.lit(0)).alias("tok_id"),
    )
    ids_sorted = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "tok_id"))),
        lambda x: x["tok_id"].cast("string"),
    )
    return enc.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("tok_id") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_oov"),
        F.concat_ws("-", F.slice(ids_sorted, 1, head)).alias("ids_head"),
    )


def prune_hot_tokens(
    df: DataFrame, id_col: str, text_col: str, max_df_frac: float
) -> DataFrame:
    """Corpus-frequency boilerplate pruning (CCNet-style): tokens whose
    document frequency exceeds ``max_df_frac`` of the corpus are dropped
    from every document; the surviving text is reassembled in order.

    The hot list is bounded by L / max_df_frac entries where L is the
    average DISTINCT tokens per document (pigeonhole over sum-of-df <=
    n_docs * L): independent of corpus size, but NOT of document length —
    with 10k-distinct-token docs and max_df_frac=0.001 that is up to 10M
    entries, so size the broadcast (or raise max_df_frac) accordingly.
    The prune itself never shuffles token payloads.
    """
    tk = pos_tokens(df, id_col, text_col)
    n_docs = df.agg(F.count("*").alias("n"))
    hot = (
        tk.groupBy("tok")
        .agg(F.countDistinct(id_col).alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .filter(F.col("df") > max_df_frac * F.col("n"))
        .select("tok", F.lit(True).alias("is_hot"))
    )
    j = tk.join(F.broadcast(hot), "tok", "left").withColumn(
        "is_hot", F.coalesce("is_hot", F.lit(False))
    )
    kept_sorted = F.transform(
        F.array_sort(
            F.collect_list(
                F.when(~F.col("is_hot"), F.struct("pos", "tok"))
            )
        ),
        lambda x: x["tok"],
    )
    return j.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("is_hot"), 1).otherwise(0))
        .cast("long")
        .alias("n_dropped"),
        F.concat_ws(" ", kept_sorted).alias("kept_text"),
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Top-``k`` characteristic terms per document by tf-idf.

    Uses the log-free rational idf ``(N + 1) / (df + 1)`` instead of the
    classic ``ln(N / df)``: it induces the same "frequent here, rare
    corpus-wide" ordering for fixed tf, and — unlike ``ln`` — IEEE
    division/multiplication are exactly specified, so scores are
    bit-identical across engines (ln differs in the last ulp between
    libm implementations, which would poison value-hash comparison and,
    worse, tie-breaking).

    Plan: one shuffle for the per-(doc, tok) tf aggregate, one for the
    per-token df aggregate, a broadcast of the single-row corpus count,
    and a per-doc row_number top-k. The df side aggregates to vocabulary
    size (≪ corpus size), so the tf→df join shuffles token counts, never
    text.
    """
    tk = pos_tokens(df, id_col, text_col)
    tf = tk.groupBy(id_col, "tok").agg(F.count("*").alias("tf"))
    dfreq = tk.groupBy("tok").agg(F.countDistinct(id_col).alias("df"))
    n_docs = df.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf")
            * (F.col("n_docs") + F.lit(1.0))
            / (F.col("df") + F.lit(1.0)),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("tok").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            F.col(id_col),
            F.col("rnk").cast("int").alias("rnk"),
            "tok",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.round("tfidf", 6).alias("tfidf"),
        )
    )


def bigram_lift(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_count: int = 5,
    k: int = 20,
) -> DataFrame:
    """Top-``k`` collocations by lift — the log-free core of PMI
    (``PMI = ln(lift)``; ln is monotone, so the ranking is identical and
    the score stays bit-reproducible across engines, same rationale as
    :func:`tfidf_top_terms`).

    ``lift = p(xy) / (p(x) p(y))`` over adjacent-token bigrams; > 1 means
    the pair co-occurs more than independence predicts. ``min_count``
    suppresses the low-frequency noise that dominates raw PMI rankings.

    Plan: bigram and unigram hash-aggregates (the corpus-wide totals ride
    along as single-row broadcasts), two broadcast-able joins on the
    aggregated vocabulary, then TakeOrderedAndProject for the global
    top-k — full counts never sort globally.
    """
    df = spread(df)
    tk = pos_tokens(df, id_col, text_col)
    uni = tk.groupBy("tok").agg(F.count("*").alias("c"))
    total = tk.agg(F.count("*").alias("t"))
    toks = F.split(F.col(text_col), " ")
    grams = F.expr(
        "transform(sequence(0, size(__toks__) - 2),"
        " i -> struct(__toks__[i] as x, __toks__[i+1] as y))"
    )
    bi = (
        df.select(F.col(id_col), toks.alias("__toks__"))
        .filter(F.size("__toks__") >= 2)
        .select(F.explode(grams).alias("g"))
        .select(F.col("g.x").alias("x"), F.col("g.y").alias("y"))
        .groupBy("x", "y")
        .agg(F.count("*").alias("c_xy"))
        .filter(F.col("c_xy") >= min_count)
    )
    n_bi = (
        df.select(toks.alias("__toks__"))
        .select(
            F.greatest(F.size("__toks__") - 1, F.lit(0)).alias("nb")
        )
        .agg(F.sum("nb").alias("b"))
    )
    cx = uni.select(F.col("tok").alias("x"), F.col("c").alias("c_x"))
    cy = uni.select(F.col("tok").alias("y"), F.col("c").alias("c_y"))
    scored = (
        bi.join(cx, "x")
        .join(cy, "y")
        .crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(n_bi))
        .withColumn(
            "lift",
            (F.col("c_xy") / F.col("b"))
            / ((F.col("c_x") / F.col("t")) * (F.col("c_y") / F.col("t"))),
        )
    )
    top = scored.orderBy(
        F.col("lift").desc(), F.col("x").asc(), F.col("y").asc()
    ).limit(k)
    w = Window.orderBy(F.col("lift").desc(), F.col("x").asc(), F.col("y").asc())
    return top.select(
        F.row_number().over(w).cast("int").alias("rnk"),
        "x",
        "y",
        F.col("c_xy").cast("long").alias("c_xy"),
        F.round("lift", 6).alias("lift"),
    )


def segment_dedup_stats(
    df: DataFrame, id_col: str, text_col: str, seg_tokens: int
) -> DataFrame:
    """Segment-level exact dedup (ExactSubstr at fixed granularity): each
    document is cut into non-overlapping ``seg_tokens``-token segments,
    segments are hashed, and only the first occurrence corpus-wide (by
    (doc_id, segment index)) survives. Emits per-doc segment counts and
    the token count the doc retains after cross-document segment dedup.

    One shuffle on the segment hash; the keeper choice is a row_number
    within each hash group — duplicate groups are typically tiny, and a
    pathological all-equal corpus degrades to one skewed group, which AQE
    skew-split handles (values beyond rn=1 are only counted, not kept).
    """
    segs = chunk_tokens(
        df, id_col, text_col, chunk_size=seg_tokens, overlap=0
    )
    h = segs.withColumn("h", F.md5("chunk_text"))
    w = Window.partitionBy("h").orderBy(id_col, "chunk_idx")
    r = h.withColumn("rn", F.row_number().over(w))
    return r.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_segments"),
        F.sum(F.when(F.col("rn") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_dup_segments"),
        F.sum(F.when(F.col("rn") == 1, F.col("n_tokens")).otherwise(0))
        .cast("long")
        .alias("kept_tokens"),
    )

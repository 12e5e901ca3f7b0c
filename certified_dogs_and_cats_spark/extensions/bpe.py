"""Distributed BPE tokenizer training (Sennrich et al., ACL 2016).

The classic scale structure, Spark-first:

1. Collapse the corpus to a WORD HISTOGRAM first — BPE statistics only
   depend on (distinct word, count), and the histogram is orders of
   magnitude smaller than the corpus (Zipf), so the iterative phase never
   touches raw text again. One shuffle.
2. Iterate: count adjacent symbol pairs weighted by word count (explode +
   hash aggregate), take the single most frequent pair (TakeOrdered-1 with
   a deterministic lexicographic tie-break — full counts never sort
   globally), broadcast it, and re-segment every word map-side with a
   left-to-right greedy fold (the reference BPE semantics, including
   overlapping-pair behavior: 'aaaa' under (a,a) -> 'aa','aa').
   Per round: one shuffle (the pair count) + one scalar collect (the
   winning pair — the same driver-side broadcast-state pattern as KMeans
   centroids); lineage is truncated periodically so the plan stays flat.

The merge fold stays in JVM codegen (SQL ``aggregate`` over the symbol
array) — no Python touches a row. At 100 TB the histogram is millions of
rows; every per-round operation is a hash aggregate over it.

``apply_bpe`` replays the learned merge table rule-by-rule (training-
faithful, good for validation and small rule counts). A production
tokenizer-server would compile the rules into a linear-time trie encoder;
that is an application-side concern, not a corpus-statistics one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.partitioning import spread

def _merge_expr(col: F.Column, a: str, b: str) -> F.Column:
    """Left-to-right greedy merge of adjacent (a, b) -> a+b in a symbol
    array, as a codegen-able fold: the accumulator is the partially-merged
    array; each step either fuses with the previous element or appends.
    The greedy left-to-right order reproduces reference BPE on
    overlapping pairs ('aaaa' under (a,a) -> 'aa','aa')."""
    m = a + b
    empty = F.array().cast("array<string>")

    def step(acc: F.Column, x: F.Column) -> F.Column:
        fuse = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b))
        )
        return F.when(
            fuse,
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(m))),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(col, empty, step)


def word_histogram(df: DataFrame, text_col: str) -> DataFrame:
    """(symbols: array<string>, n: long) — distinct whitespace words with
    corpus frequency, pre-split into character symbols. The one pass that
    reads raw text."""
    return (
        spread(df)
        .select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .select(F.split(F.col("w"), "").alias("symbols"), F.col("n"))
    )


def train_bpe(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    min_pair_count: int = 2,
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merge rules from the corpus; stops
    early when no adjacent pair reaches ``min_pair_count``. Returns the
    ordered merge table [(a, b), ...] (rule i merges a+b into one symbol;
    order IS the tokenizer)."""
    words = word_histogram(df, text_col).persist()
    words.count()  # materialize before iterating
    merges: list[tuple[str, str]] = []
    current = words
    for i in range(n_merges):
        pairs = (
            # size >= 2: single-symbol words carry no pairs, and Spark's
            # sequence(1, 0) would DESCEND [1, 0] and index out of bounds.
            current.filter(F.size("symbols") >= 2)
            .select(
                F.col("n"),
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(symbols) - 1), "
                        "i -> struct(symbols[i-1] as a, symbols[i] as b))"
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("n").alias("cnt"))
        )
        top = pairs.orderBy(
            F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc()
        ).limit(1).collect()
        if not top or top[0]["cnt"] < min_pair_count:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        nxt = current.select(
            _merge_expr(F.col("symbols"), a, b).alias("symbols"), F.col("n")
        )
        # Truncate lineage periodically: each round nests another fold
        # expression; unchecked, the plan (and codegen) grows linearly.
        if (i + 1) % checkpoint_every == 0:
            nxt = nxt.localCheckpoint(eager=True)
        current = nxt
    words.unpersist()
    return merges


def apply_bpe(
    df: DataFrame, id_col: str, text_col: str, merges: list[tuple[str, str]]
) -> DataFrame:
    """(id, tokens: array<string>) — tokenize text with a learned merge
    table, replaying rules in training order per word (reference BPE
    application). All JVM folds; merges ride in the plan as literals."""
    toks = (
        spread(df)
        .select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "w"),
        )
        .filter(F.col("w") != "")
        .select(F.col(id_col), "pos", F.split(F.col("w"), "").alias("sym"))
    )
    col = F.col("sym")
    for a, b in merges:
        col = _merge_expr(col, a, b)
    per_word = toks.select(F.col(id_col), "pos", col.alias("sym"))
    return (
        per_word.groupBy(id_col)
        .agg(
            F.flatten(
                F.array_sort(
                    F.collect_list(F.struct("pos", "sym"))
                ).getField("sym")
            ).alias("tokens")
        )
    )


import re as _re  # noqa: E402


def apply_bpe_replace(
    df: DataFrame, id_col: str, text_col: str, merges: list[tuple[str, str]]
) -> DataFrame:
    """(id, tokens: array<string>) — bit-identical to :func:`apply_bpe`
    under a charset contract (validated here): every merge symbol matches
    ``[a-z]+`` and the text column contains only ``[a-z ]``.

    Under that contract the rule-by-rule replay runs as NESTED STRING
    REPLACES over a '|'-wrapped symbol string ('|t| |h| |e|' ->
    '|th| |e|' -> '|the|') with '#' separating words — replace() is
    left-to-right non-overlapping in the JVM exactly like reference
    BPE's greedy application, the '|..|' wrapping makes a rule match
    whole symbols only, and '#' (impossible in the charset) keeps rules
    from spanning word boundaries. The whole document tokenizes in ONE
    codegen'd projection: zero shuffles, zero interpreted array folds —
    versus :func:`apply_bpe`'s |merges| chained aggregate() lambdas per
    word plus a per-document reassembly shuffle (measured 1.24 s ->
    0.33 s on the bench corpus, r12). This is the exact formula the
    ``bpe_apply_fixed`` DuckDB oracle replays; fold-vs-replace
    equivalence is pinned by pytest on the general operator.
    """
    for a, b in merges:
        if not (_re.fullmatch(r"[a-z]+", a) and _re.fullmatch(r"[a-z]+", b)):
            raise ValueError(
                f"apply_bpe_replace: merge symbols must match [a-z]+ "
                f"(delimiter charset contract); got {(a, b)!r}"
            )
    sym = (
        f"array_join(transform(filter(split({text_col}, ' '), "
        "__w__ -> __w__ != ''), "
        "__w__ -> array_join(transform(split(__w__, ''), "
        "__c__ -> concat('|', __c__, '|')), ' ')), '#')"
    )
    merged = sym
    for a, b in merges:
        merged = f"replace({merged}, '|{a}| |{b}|', '|{a}{b}|')"
    tokens = (
        f"filter(split(replace(replace({merged}, '#', ' '), '|', ''), ' '), "
        "__x__ -> __x__ != '')"
    )
    # Docs with no words produce an empty token array here but NO group
    # at all through apply_bpe's explode path — drop them for parity.
    return (
        spread(df)
        .selectExpr(id_col, f"{tokens} AS tokens")
        .filter(F.size("tokens") > 0)
    )

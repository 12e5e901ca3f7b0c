"""Text-analysis operators for document corpora.

Language ID (stopword-marker heuristic), quality scoring (length / token /
stopword ratios), token counting (whitespace + BPE-ish regex), and document
fingerprinting (winnowing-style min-of-window hash). All built-in exprs —
the heavy per-char work (regexp, md5 windows) stays inside whole-stage
codegen; nothing crosses into Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..operators.partitioning import spread

# Tiny deterministic marker sets (the corpus is synthetic word-soup; the
# heuristic's *determinism* is what the oracle checks, not linguistics).
EN_MARKERS = ("a", "the")
BPE_ISH_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, tok) — whitespace tokenization, non-distinct."""
    df = spread(df)
    return df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc token statistics: counts, distinct, avg length, BPE-ish count.

    ZERO shuffles: the grouping key (the doc id) is the row key, so the
    explode+groupBy shape re-aggregates rows that were never apart — every
    metric is a per-row ARRAY expression instead (size / array_distinct /
    aggregate fold), pure map-side whole-stage codegen. At 100 TB this is
    a narrow scan; the old shape shuffled the exploded token stream (10-
    100x the corpus row count). NULL texts drop, matching the explode
    semantics (no token rows -> no output row)."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    return (
        spread(df)
        .where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            n.cast("long").alias("n_tokens"),
            F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
            (
                F.aggregate(
                    toks, F.lit(0), lambda acc, x: acc + F.length(x)
                ).cast("double")
                / n
            ).alias("avg_token_len"),
            F.size(
                F.expr(
                    f"regexp_extract_all({text_col}, '{BPE_ISH_PATTERN}', 0)"
                )
            )
            .cast("long")
            .alias("n_bpe_tokens"),
        )
    )


def stopword_ratio(
    df: DataFrame, id_col: str, text_col: str, markers=EN_MARKERS
) -> DataFrame:
    """(id, n_tokens, stop_ratio) — fraction of tokens in the marker set.

    Map-side (same reasoning as :func:`token_stats`): the per-row token
    array filters against the marker set in one codegen expression, no
    explode, no shuffle."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda x: x.isin(*markers)))
    return (
        spread(df)
        .where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            n.cast("long").alias("n_tokens"),
            (hits.cast("double") / n).alias("stop_ratio"),
        )
    )


def _md5_prefix60(col: "F.Column") -> "F.Column":
    """The ONE fixed-width fingerprint hash: top 15 md5 hex chars parsed
    base-16 into a positive 60-bit long (see winnow_fingerprints for the
    width rationale). Both fingerprint operators and their DuckDB oracles
    must stay bit-identical to this construction."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def min_window_fingerprint(
    df: DataFrame, id_col: str, text_col: str, k: int = 12, stride: int = 4
) -> DataFrame:
    """Winnowing-style fingerprint: min 60-bit window hash (top 15 md5
    hex chars, base-16 — see winnow_fingerprints for the fixed-width
    rationale) over k-char windows every `stride` chars. Near-identical
    docs share fingerprints; the min is order-insensitive so the
    aggregate parallelizes freely."""
    # Docs shorter than k chars have no window: filter them BEFORE the
    # sequence (an empty/negative sequence bound is a runtime error, and
    # the oracle's empty range yields no row for such docs either).
    df = spread(df).filter(F.length(F.col(text_col)) >= k)
    positions = F.explode(
        F.sequence(F.lit(1), F.length(F.col(text_col)) - (k - 1), F.lit(stride))
    ).alias("p")
    windows = df.select(F.col(id_col), F.col(text_col), positions).select(
        F.col(id_col),
        _md5_prefix60(F.expr(f"substr({text_col}, p, {k})")).alias("wh"),
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

    Plan shape: ZERO shuffles before the output explode — the per-position
    k-gram hashes are one array column, each window minimum is a
    ``least()`` of ``w`` shifted element accesses (flat expressions, no
    nested fold), and the per-doc distinct is ``array_distinct``. The
    per-position row explosion, the doc-partitioned window-min shuffle,
    and the distinct shuffle of the previous shape all disappear
    (measured 0.74s -> 0.45s at sf0.1; an earlier array-side attempt
    via ``array_min(slice(...))`` per window lost ~1.8x to interpreted
    nested-fold evaluation — the least-of-shifts form is what wins).
    Docs shorter than w + k - 1 chars yield no fingerprints (no full
    window exists).

    Fingerprints are fixed-width 60-bit integers (the top 15 hex chars of
    the md5, parsed base-16): at 100 TB the fingerprint set itself is
    billions of rows, and an 8-byte long shuffles/compares ~4x cheaper
    than a 32-char digest string. 60 bits (not 64) keeps the value
    positive under both engines' signed 64-bit parse, so the min/ordering
    semantics replay identically in the oracle.
    """
    # Enforce the documented short-doc contract up front (no full window
    # exists below w + k - 1 chars) and pin the sequence step bounds so
    # they can never descend.
    df = spread(df).filter(F.length(F.col(text_col)) >= w + k - 1)
    hashes = F.expr(
        f"transform(sequence(1, length({text_col}) - {k - 1}), "
        f"p -> cast(conv(substr(md5(substr({text_col}, p, {k})), 1, 15),"
        f" 16, 10) as bigint))"
    )
    # least() needs >= 2 args; w=1 degenerates to the hash itself.
    shifted = [f"__h__[i-{j}-1]" for j in range(w)]
    mins = f"least({', '.join(shifted)})" if w > 1 else shifted[0]
    fp = F.expr(f"transform(sequence({w}, size(__h__)), i -> {mins})")
    return (
        df.select(F.col(id_col), hashes.alias("__h__"))
        .select(
            F.col(id_col),
            F.explode(F.array_distinct(fp)).alias("fingerprint"),
        )
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
    # fp feeds the df-count and the cap join; rare feeds BOTH self-join
    # sides — persist each so the fingerprint explode and the cap join run
    # once apiece.
    rare = tracked_persist(
        fp.join(
            fp.groupBy("fingerprint")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_fp_df)
            .select("fingerprint"),
            "fingerprint",
        )
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
        spread(df).select(F.col(id_col), toks.alias("__toks__"))
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


def chunk_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split each document into token chunks of ``chunk_size`` with
    ``overlap`` tokens of context carried between consecutive chunks —
    the pre-embedding / pre-training chunking step. Chunk starts advance
    by ``chunk_size - overlap``; the final chunk may be short (never
    empty) but always carries at least one token BEYOND the previous
    chunk — a trailing start landing within ``overlap`` tokens of the
    end would re-emit a pure sub-span of the prior chunk (duplicate
    training content), so it is suppressed. One explode; slicing and
    re-joining stay in codegen; chunk provenance (doc id + 1-based
    chunk_idx + token offset) survives for lineage joins back to the
    source doc."""
    if not 0 <= overlap < chunk_size:
        raise ValueError(f"need 0 <= overlap < chunk_size: {overlap}")
    stride = chunk_size - overlap
    toks = F.split(F.col(text_col), " ")
    d = spread(df).select(F.col(id_col), toks.alias("__toks__"))
    starts = F.explode(
        F.expr(f"sequence(1, greatest(size(__toks__), 1), {stride})")
    ).alias("start")
    c = d.select(F.col(id_col), F.col("__toks__"), starts)
    chunk = F.slice(F.col("__toks__"), F.col("start"), chunk_size)
    return (
        c.filter(
            (F.col("start") == 1)
            | (F.col("start") + overlap <= F.size("__toks__"))
        )
        .select(
            F.col(id_col),
            ((F.col("start") - 1) / stride + 1).cast("int").alias("chunk_idx"),
            F.col("start").alias("token_start"),
            F.size(chunk).alias("n_tokens"),
            F.concat_ws(" ", chunk).alias("chunk_text"),
        )
    )


def pack_token_stream(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget: int = 256,
    bucket_size: int = 100_000,
) -> DataFrame:
    """Concatenate-and-cut sequence packing: documents are laid out in a
    deterministic stream (ordered by integer id), and the stream is cut
    at every ``budget`` tokens — exactly how LLM pretraining packs short
    documents into fixed-length sequences with zero padding waste. Emits
    one row per (bin, doc) overlap with the token count the doc
    contributes to that bin; docs straddling a boundary appear in both
    bins.

    Plan: the running sum over doc token counts is TWO-LEVEL, never a
    global-ordered window over doc rows (which would single-partition
    -sort the corpus at scale — the shape the plan audit forbids): docs
    cumsum WITHIN contiguous ``id div bucket_size`` buckets (a
    partitioned window), bucket totals — an aggregate-scale relation —
    take the only unpartitioned window, and each doc's global offset is
    local cumsum + broadcast bucket offset. Integer sums associate, so
    the result is identical to the single global cumsum; structurally
    it is per-bucket sorts plus one tiny offsets pass, then a per-doc
    explode over the bins the doc spans. No shuffle of token data —
    only (id, count) pairs move."""
    toks = F.size(F.split(F.col(text_col), " "))
    d = df.select(
        F.col(id_col),
        toks.cast("bigint").alias("n_tokens"),
        F.expr(f"{id_col} div {bucket_size}").alias("__bkt__"),
    )
    w_loc = (
        Window.partitionBy("__bkt__")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    loc = d.select(
        F.col(id_col),
        "n_tokens",
        "__bkt__",
        F.sum("n_tokens").over(w_loc).alias("__lend__"),
    )
    w_off = Window.orderBy(F.col("__bkt__").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    off = (
        d.groupBy("__bkt__")
        .agg(F.sum("n_tokens").alias("__btot__"))
        .select(
            "__bkt__",
            F.coalesce(F.sum("__btot__").over(w_off), F.lit(0)).alias(
                "__boff__"
            ),
        )
    )
    d = loc.join(F.broadcast(off), "__bkt__").select(
        F.col(id_col),
        "n_tokens",
        (F.col("__lend__") + F.col("__boff__") - F.col("n_tokens")).alias(
            "start"
        ),
        (F.col("__lend__") + F.col("__boff__")).alias("end"),
    )
    bins = F.explode(
        F.expr(f"sequence(floor(start / {budget}), floor((end - 1) / {budget}))")
    ).alias("bin_id")
    b = F.col("bin_id")
    contrib = F.least(F.col("end"), (b + 1) * budget) - F.greatest(
        F.col("start"), b * budget
    )
    return d.select(F.col(id_col), F.col("start"), F.col("end"), bins).select(
        F.col("bin_id").cast("long").alias("bin_id"),
        F.col(id_col),
        contrib.cast("long").alias("tokens_in_bin"),
    )


def bigram_fluency(
    df: DataFrame, id_col: str, text_col: str, round_digits: int = 6
) -> DataFrame:
    """Corpus-trained bigram language-model fluency score per document —
    the perplexity-proxy quality gate: documents whose word transitions
    are common in the corpus score high, word-soup and shuffled
    boilerplate score low.

    The model is the corpus itself (KenLM-style counting, no external
    artifact): C(w1,w2) bigram counts and C(w1) context counts over ALL
    documents, vocabulary size V for add-one smoothing. Per document the
    score is the MICRO-AVERAGED smoothed conditional probability

        fluency = sum(C(w1,w2) + 1) / sum(C(w1) + V)

    over its bigrams — pooled integer sums with ONE final division, so
    the value is bit-reproducible across engines/partitionings (a mean of
    per-bigram ratios would sum doubles in nondeterministic order; the
    log-domain variant would additionally inherit libm differences).

    Plan shape: bigram pairs are built MAP-SIDE (zip of the token array
    with its own tail) and exploded once; one hash-aggregate each for
    bigram counts, context counts (derived from bigram counts — no second
    pass over the corpus), and V; the per-doc score is two shuffle joins
    (on the bigram, then the context word) + one per-doc aggregate.
    Nothing is driver-side except the scalar V, which rides a broadcast
    cross join. Docs with < 2 tokens yield no row (no transitions to
    judge). The tokenized base and the pair stream each feed two
    branches (model counts + scoring / vocabulary), so both persist —
    the corpus is scanned and tokenized exactly once.
    """
    from ..cache import tracked_persist

    toks = F.split(F.col(text_col), " ")
    base = tracked_persist(
        spread(df).select(F.col(id_col), toks.alias("__toks__"))
    )
    tarr = F.col("__toks__")
    pairs_arr = F.zip_with(
        F.slice(tarr, 1, F.greatest(F.size(tarr) - 1, F.lit(0))),
        F.slice(tarr, 2, F.greatest(F.size(tarr) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    pairs = tracked_persist(
        base.filter(F.size(tarr) >= 2)
        .select(F.col(id_col), F.explode(pairs_arr).alias("bg"))
        .select(
            F.col(id_col),
            F.col("bg.w1").alias("w1"),
            F.col("bg.w2").alias("w2"),
        )
    )
    # Corpus model: C(w1,w2); C(w1) as a rollup of the bigram counts
    # (context counts of bigram FIRST words — exactly the denominator the
    # conditional probability needs).
    big = tracked_persist(
        pairs.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    )
    ctx = big.groupBy("w1").agg(F.sum("c12").alias("c1"))
    # V = distinct tokens anywhere (including document-final tokens that
    # never open a bigram).
    vocab = base.select(F.explode(tarr).alias("tok")).agg(
        F.countDistinct("tok").alias("v")
    )
    # Attach both counts with ONE pair-stream join: the model sides join
    # each other first (big |><| ctx — both model-sized, vocab-scale), so
    # the corpus-scale pair stream crosses a single equi-join instead of
    # two (at 100 TB those are two sort-merge exchanges of every bigram
    # occurrence; here one). Same (c12, c1) per pair — c1 is functionally
    # dependent on w1 — so sums and the final division are unchanged.
    model = big.join(ctx, "w1")
    scored = (
        pairs.join(model, ["w1", "w2"])
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            (
                F.sum(F.col("c12") + 1).cast("double")
                / F.sum(F.col("c1") + F.col("v"))
            ).alias("__f__"),
        )
    )
    return scored.select(
        F.col(id_col),
        F.col("n_bigrams"),
        F.round(F.col("__f__"), round_digits).alias("fluency"),
    )

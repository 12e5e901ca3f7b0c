"""Corpus-quality queries over the `documents` table (round-4 additions)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..extensions.text import ngram_repetition
from .common import t
from .registry import query


@query(
    "text_repetition_ratio",
    oracle="""
    WITH tk AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    g AS (
      SELECT doc_id,
             concat_ws(' ', toks[i+1], toks[i+2], toks[i+3]) AS ng
      FROM tk, UNNEST(range(0, len(toks) - 2)) AS u(i)
      WHERE len(toks) >= 3
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_ngrams,
           CAST(count(DISTINCT ng) AS BIGINT) AS n_distinct,
           round(1.0 - count(DISTINCT ng) * 1.0 / count(*), 6)
             AS repetition_ratio
    FROM g GROUP BY doc_id
    """,
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc trigram repetition (1 - distinct/total) — the intra-doc twin
    of the cross-doc dedup family: same n-gram machinery, pointed at
    template spam instead of near-duplicates."""
    docs = t(spark, sf_dir, "documents")
    return ngram_repetition(docs, "doc_id", "text", n=3)


@query(
    "text_normalize_keys",
    oracle="""
    WITH n AS (
      SELECT doc_id,
             trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
               ' +', ' ', 'g')) AS norm
      FROM documents
    )
    SELECT doc_id,
           CAST(len(norm) AS BIGINT) AS n_chars,
           md5(norm) AS norm_key,
           CAST(len(string_split(norm, ' ')) AS BIGINT) AS n_tokens
    FROM n
    """,
)
def text_normalize_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical normalization (lower / strip punct / collapse space) with
    an md5 dedup key per doc — the preprocessing step every exact-dedup
    and matching pipeline runs first; portable character-class regexes
    replay identically in RE2."""
    from pyspark.sql import functions as F

    from ..extensions.text import normalize_text

    docs = t(spark, sf_dir, "documents")
    norm = normalize_text("text")
    return docs.select(
        "doc_id",
        F.length(norm).cast("long").alias("n_chars"),
        F.md5(norm).alias("norm_key"),
        F.size(F.split(norm, " ")).cast("long").alias("n_tokens"),
    )


@query(
    "key_skew_report",
    oracle="""
    WITH k AS (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS cnt
      FROM orders GROUP BY 1
    ),
    ranked AS (
      SELECT cnt, row_number() OVER (ORDER BY cnt DESC, o_custkey ASC) AS rn
      FROM k
    )
    SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(max(cnt) AS BIGINT) AS top1_cnt,
           CAST(sum(CASE WHEN rn <= 5 THEN cnt ELSE 0 END) AS BIGINT)
             AS top5_cnt,
           round(max(cnt) * count(*) * 1.0 / sum(cnt), 6) AS skew_ratio
    FROM ranked
    """,
)
def key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/shuffle-key skew diagnostic: hottest-key mass and the
    top1/average ratio that decides whether a key needs salting or AQE
    skew-join handling BEFORE the expensive join runs. Two aggregates over
    grouped counts (never raw rows); pure integer math + one ratio, so
    the report hashes identically cross-engine (entropy-style float folds
    deliberately avoided — their sum order is engine-dependent)."""
    from pyspark.sql import Window, functions as F

    k = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("o_custkey").asc())
    ranked = k.withColumn("rn", F.row_number().over(w))
    return ranked.agg(
        F.sum("cnt").alias("n_rows"),
        F.count("*").alias("n_keys"),
        F.max("cnt").alias("top1_cnt"),
        F.sum(F.when(F.col("rn") <= 5, F.col("cnt")).otherwise(0)).alias(
            "top5_cnt"
        ),
        F.round(
            F.max("cnt") * F.count("*") / F.sum("cnt"), 6
        ).alias("skew_ratio"),
    )


@query(
    "k_anonymity_report",
    oracle="""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment,
             count(*) AS grp_n,
             count(DISTINCT c_acctbal) AS n_sensitive
      FROM customer GROUP BY 1, 2
    )
    SELECT CAST(count(*) AS BIGINT) AS n_groups,
           CAST(min(grp_n) AS BIGINT) AS min_group_size,
           CAST(sum(CASE WHEN grp_n < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS k_violating_groups,
           CAST(sum(CASE WHEN grp_n < 5 THEN grp_n ELSE 0 END) AS BIGINT)
             AS rows_at_risk,
           CAST(sum(CASE WHEN n_sensitive < 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS l_violating_groups
    FROM g
    """,
)
def k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy audit for releasable datasets: k-anonymity (every
    quasi-identifier combination must describe >= k individuals — a
    smaller group re-identifies its members by joining public attributes)
    and l-diversity (a group whose sensitive attribute takes < l distinct
    values leaks it even at k-anonymous size). One hash aggregate over
    the quasi-identifier columns, one rollup — the shape scales to any
    corpus, and the report is what a release gate asserts on before a
    training corpus ships. Here: quasi = (nation, market segment),
    sensitive = account balance, k=5, l=2."""
    c = t(spark, sf_dir, "customer")
    g = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("grp_n"),
        F.countDistinct("c_acctbal").alias("n_sensitive"),
    )
    return g.agg(
        F.count("*").alias("n_groups"),
        F.min("grp_n").alias("min_group_size"),
        F.sum(F.when(F.col("grp_n") < 5, 1).otherwise(0))
        .cast("bigint")
        .alias("k_violating_groups"),
        F.sum(F.when(F.col("grp_n") < 5, F.col("grp_n")).otherwise(0))
        .cast("bigint")
        .alias("rows_at_risk"),
        F.sum(F.when(F.col("n_sensitive") < 2, 1).otherwise(0))
        .cast("bigint")
        .alias("l_violating_groups"),
    )


# Ordered quality-gate stack for the funnel report. Each gate is applied
# ON TOP of the previous survivors — the funnel semantics dashboards and
# ablation writeups use ("how many docs did gate k alone remove?").
FUNNEL_MIN_CHARS = 150
FUNNEL_LANGS = ("en", "de", "fr")
FUNNEL_MAX_TOP_TOKEN_FRAC = 0.12


@query(
    "quality_gate_funnel",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, n_chars, lang,
             string_split(text, ' ') AS toks
      FROM documents
    ),
    top_tok AS (
      SELECT doc_id,
             max(c) AS top_c,
             sum(c) AS n_tok
      FROM (
        SELECT doc_id, tok, count(*) AS c
        FROM (SELECT doc_id, unnest(toks) AS tok FROM d)
        GROUP BY 1, 2
      ) GROUP BY doc_id
    ),
    g AS (
      SELECT d.doc_id,
             d.n_chars >= {FUNNEL_MIN_CHARS} AS g1,
             d.lang IN {FUNNEL_LANGS!r} AS g2,
             CAST(top_tok.top_c AS DOUBLE) / top_tok.n_tok
               <= {FUNNEL_MAX_TOP_TOKEN_FRAC} AS g3
      FROM d JOIN top_tok USING (doc_id)
    ),
    stages AS (
      SELECT 0 AS stage, 'ingested' AS gate, count(*) AS survivors FROM g
      UNION ALL
      SELECT 1, 'min_chars', count(*) FROM g WHERE g1
      UNION ALL
      SELECT 2, 'lang_allowlist', count(*) FROM g WHERE g1 AND g2
      UNION ALL
      SELECT 3, 'top_token_frac', count(*) FROM g WHERE g1 AND g2 AND g3
    )
    SELECT CAST(stage AS INTEGER) AS stage, gate,
           CAST(survivors AS BIGINT) AS survivors,
           CAST(first_value(survivors) OVER (ORDER BY stage)
                - survivors AS BIGINT) AS dropped_total
    FROM stages
    """,
)
def quality_gate_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged quality-gate funnel over the corpus — the observability
    report every filtering pipeline ships: survivors after each gate
    applied cumulatively (length floor, language allowlist, single-token
    dominance cap — a cheap template-spam proxy). One token aggregate
    feeds the dominance gate; the stage counts are conditional sums in a
    SINGLE global aggregate (no per-stage rescans), unpivoted to the
    4-row funnel. At 100 TB: one scan, one (doc,token) hash aggregate,
    map-side partials everywhere, 4-row output."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", "lang", "text"
    )
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    top = tok.groupBy("doc_id").agg(
        F.max("c").alias("top_c"), F.sum("c").alias("n_tok")
    )
    g = d.join(top, "doc_id").select(
        (F.col("n_chars") >= FUNNEL_MIN_CHARS).alias("g1"),
        F.col("lang").isin(list(FUNNEL_LANGS)).alias("g2"),
        (
            F.col("top_c").cast("double") / F.col("n_tok")
            <= FUNNEL_MAX_TOP_TOKEN_FRAC
        ).alias("g3"),
    )
    counts = g.agg(
        F.count("*").alias("s0"),
        F.sum(F.col("g1").cast("long")).alias("s1"),
        F.sum((F.col("g1") & F.col("g2")).cast("long")).alias("s2"),
        F.sum((F.col("g1") & F.col("g2") & F.col("g3")).cast("long")).alias(
            "s3"
        ),
    )
    stages = counts.selectExpr(
        "stack(4, 0, 'ingested', s0, 1, 'min_chars', s1, "
        "2, 'lang_allowlist', s2, 3, 'top_token_frac', s3) "
        "AS (stage, gate, survivors)"
    )
    return stages.select(
        F.col("stage").cast("int").alias("stage"),
        "gate",
        F.col("survivors").cast("bigint").alias("survivors"),
        (
            F.first("survivors").over(
                Window.orderBy("stage").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
            - F.col("survivors")
        )
        .cast("bigint")
        .alias("dropped_total"),
    )

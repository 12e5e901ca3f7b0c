"""Term-statistics queries: tf-idf characteristic terms and collocation
mining over the `documents` table — the corpus-analysis siblings of the
vocabulary block in queries/vocab.py.

Both scores are deliberately log-free (rational idf, lift instead of
PMI): ln differs in the last ulp between libm implementations, while IEEE
division/multiplication are exactly specified — so scores, and therefore
tie-breaks and value hashes, replay bit-identically in the oracle. The
induced rankings are unchanged (the dropped ln is monotone).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..extensions.vocab import bigram_lift, tfidf_top_terms
from .common import t
from .registry import query

TFIDF_K = 3
LIFT_MIN_COUNT = 5
LIFT_K = 20


@query(
    "tfidf_top_terms",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk GROUP BY 1, 2),
    dfq AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tk GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    s AS (
      SELECT tf.doc_id, tf.tok, tf.tf, dfq.df,
             tf.tf * (n.n_docs + 1.0) / (dfq.df + 1.0) AS tfidf
      FROM tf JOIN dfq USING (tok) CROSS JOIN n
    ),
    r AS (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, tok ASC
      ) AS rnk FROM s
    )
    SELECT doc_id, CAST(rnk AS INTEGER) AS rnk, tok,
           CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           round(tfidf, 6) AS tfidf
    FROM r WHERE rnk <= {TFIDF_K}
    """,
)
def tfidf_top_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by tf-idf (rational idf
    ``(N+1)/(df+1)``). Two hash aggregates + a vocabulary-sized join +
    a per-doc top-k window; the document text itself never re-shuffles."""
    docs = t(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, "doc_id", "text", k=TFIDF_K)


@query(
    "bigram_lift_topk",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    tk AS (
      SELECT doc_id, toks[i] AS tok
      FROM d, UNNEST(generate_series(1, len(toks))) AS u(i)
    ),
    uni AS (SELECT tok, count(*) AS c FROM tk GROUP BY 1),
    total AS (SELECT count(*) AS t FROM tk),
    bi AS (
      SELECT toks[i] AS x, toks[i + 1] AS y, count(*) AS c_xy
      FROM d, UNNEST(generate_series(1, len(toks) - 1)) AS u(i)
      WHERE len(toks) >= 2
      GROUP BY 1, 2
      HAVING count(*) >= {LIFT_MIN_COUNT}
    ),
    nb AS (
      SELECT sum(CASE WHEN len(toks) >= 1 THEN len(toks) - 1 ELSE 0 END)
        AS b FROM d
    ),
    s AS (
      SELECT bi.x, bi.y, bi.c_xy,
             (bi.c_xy / nb.b) /
               ((cx.c / total.t) * (cy.c / total.t)) AS lift
      FROM bi
      JOIN uni cx ON bi.x = cx.tok
      JOIN uni cy ON bi.y = cy.tok
      CROSS JOIN total CROSS JOIN nb
    ),
    r AS (
      SELECT *, row_number() OVER (
        ORDER BY lift DESC, x ASC, y ASC
      ) AS rnk FROM s
    )
    SELECT CAST(rnk AS INTEGER) AS rnk, x, y,
           CAST(c_xy AS BIGINT) AS c_xy, round(lift, 6) AS lift
    FROM r WHERE rnk <= {LIFT_K}
    """,
)
def bigram_lift_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 adjacent-token collocations by lift (the log-free core of
    PMI), with a min-count floor suppressing low-frequency noise. Bigram
    and unigram aggregates shuffle token counts only; the global top-k is
    TakeOrderedAndProject, never a full sort."""
    docs = t(spark, sf_dir, "documents")
    return bigram_lift(
        docs, "doc_id", "text", min_count=LIFT_MIN_COUNT, k=LIFT_K
    )


# BM25 constants (Robertson et al., TREC-3): k1 saturates term frequency,
# b normalizes by document length. The idf keeps the repo's LOG-FREE
# convention (module docstring): the rational Robertson idf core
# (N - df + 0.5) / (df + 0.5) WITHOUT the ln wrapper — ln differs in the
# last ulp across libm implementations while IEEE division replays
# bit-identically, so scores and tie-breaks hash-match cross-engine.
# (Unlike per-term tf-idf ranking, dropping the monotone ln does change
# the multi-term SUM's ranking vs textbook BM25 — this is the engine's
# deterministic variant, documented as such.)
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ("join", "hash", "window")
BM25_K = 10


@query(
    "bm25_topk",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    dl AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
      FROM documents
    ),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
      FROM dl
    ),
    dfq AS (
      SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      FROM tk WHERE tok IN {BM25_TERMS!r}
      GROUP BY 1
    ),
    tf AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
      FROM tk WHERE tok IN {BM25_TERMS!r}
      GROUP BY 1, 2
    ),
    term_scores AS (
      SELECT tf.doc_id, tf.tok,
             ((stats.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
             * ((tf.tf * ({BM25_K1} + 1.0))
                / (tf.tf + {BM25_K1}
                   * (1.0 - {BM25_B} + {BM25_B} * dl.dl / stats.avgdl)))
               AS s
      FROM tf
      JOIN dfq ON tf.tok = dfq.tok
      JOIN dl ON tf.doc_id = dl.doc_id
      CROSS JOIN stats
    ),
    agg AS (
      SELECT doc_id,
             CAST(count(*) AS INTEGER) AS n_terms_hit,
             list_reduce(list(s ORDER BY tok), (a, b) -> a + b) AS score
      FROM term_scores GROUP BY doc_id
    ),
    r AS (
      SELECT doc_id, n_terms_hit, round(score, 6) AS score,
             CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC)
                  AS INTEGER) AS rnk
      FROM agg
    )
    SELECT doc_id, n_terms_hit, score, rnk FROM r WHERE rnk <= {BM25_K}
    """,
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval over the corpus for a literal 3-term query: the
    ranking function every lexical-search / hybrid-RAG retrieval stack
    runs, as one Spark plan. Term contributions are summed in a
    SORTED-by-term sequential fold (float addition is order-dependent;
    an unordered SUM would flake the hash against the oracle — the same
    move cosine_topk makes for dot products). Plan: one token explode
    filtered to the query terms (the filter lands before the shuffle, so
    only query-term postings move), a 3-row df aggregate broadcast back,
    a per-doc fold, and TakeOrderedAndProject for the top-10 — the
    corpus text shuffles nothing. At 100 TB the df/avgdl stats frame is
    metadata-sized and the per-term postings join is the inverted-index
    access path."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    terms = list(BM25_TERMS)
    dl = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("dl")
    )
    stats = dl.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    tk = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok").isin(terms))
    dfq = tk.groupBy("tok").agg(
        F.countDistinct("doc_id").cast("bigint").alias("df")
    )
    tf = tk.groupBy("doc_id", "tok").agg(
        F.count("*").cast("bigint").alias("tf")
    )
    k1, b = F.lit(BM25_K1), F.lit(BM25_B)
    scored = (
        tf.join(F.broadcast(dfq), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "tok",
            (
                (
                    (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (
                    (F.col("tf") * (k1 + F.lit(1.0)))
                    / (
                        F.col("tf")
                        + k1
                        * (
                            F.lit(1.0)
                            - b
                            + b * F.col("dl") / F.col("avgdl")
                        )
                    )
                )
            ).alias("s"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_terms_hit"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("tok", "s"))).getField("s"),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("score"),
    )
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        agg.select(
            "doc_id",
            "n_terms_hit",
            F.round("score", 6).alias("score"),
        )
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= BM25_K)
    )


@query(
    "token_gini_by_source",
    oracle="""
    WITH m AS (
      SELECT source,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tok_mass
      FROM documents GROUP BY source
    ),
    r AS (
      SELECT source, tok_mass,
             row_number() OVER (ORDER BY tok_mass ASC, source ASC) AS i,
             count(*) OVER () AS n,
             sum(tok_mass) OVER () AS total
      FROM m
    )
    SELECT CAST(max(n) AS BIGINT) AS n_sources,
           CAST(max(total) AS BIGINT) AS total_tokens,
           round(
             CAST(2 * sum(i * tok_mass) - (max(n) + 1) * max(total)
                  AS DOUBLE) / (max(n) * max(total)), 9) AS gini
    FROM r
    """,
)
def token_gini_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-mass concentration across sources as a Gini coefficient —
    the corpus-mixing diagnostic that says whether one crawl dominates
    the training mix (0 = perfectly balanced, ->1 = one source owns the
    tokens). All sums stay INTEGER until the single final division
    (G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) over ascending-sorted
    masses), so the value replays bit-identically; rank ties can permute
    equal masses but the formula is invariant under that. One hash
    aggregate per source + a sources-sized window — the heavy table
    contributes one shuffle of per-source partial sums only."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    m = (
        t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.sum(F.size(F.split("text", " ")))
            .cast("bigint")
            .alias("tok_mass")
        )
    )
    wr = Window.orderBy(F.col("tok_mass").asc(), F.col("source").asc())
    wall = Window.partitionBy()
    r = m.select(
        "tok_mass",
        F.row_number().over(wr).alias("i"),
        F.count("*").over(wall).alias("n"),
        F.sum("tok_mass").over(wall).alias("total"),
    )
    return r.agg(
        F.max("n").cast("bigint").alias("n_sources"),
        F.max("total").cast("bigint").alias("total_tokens"),
        F.round(
            (
                F.lit(2) * F.sum(F.col("i") * F.col("tok_mass"))
                - (F.max("n") + F.lit(1)) * F.max("total")
            ).cast("double")
            / (F.max("n") * F.max("total")),
            9,
        ).alias("gini"),
    )

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

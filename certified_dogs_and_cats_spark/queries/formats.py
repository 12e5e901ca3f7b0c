"""Interchange-format coverage under the oracle gate (round-5 tail —
registered after governance so these queue behind the driver window).
"""

from __future__ import annotations

import os
import shutil
import tempfile
from datetime import date

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import t
from .registry import query


@query(
    "export_roundtrip_orc",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
             AS total_price,
           CAST(min(o_orderdate) AS DATE) AS first_day
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def export_roundtrip_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink round trip: write orders through the ORC export
    (zstd-compressed columnar, stripe-statistics footers), read the
    export BACK with Spark's ORC reader, and aggregate the round-tripped
    rows — a green row proves the columnar encode/decode is lossless for
    numeric, string, and date types alike. The money sum is
    DECIMAL-exact on both sides so the hash can't wobble on fold
    order."""
    from ..pipeline.export import export_view_orc

    orders = t(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_totalprice",
        # store a true DATE column in the ORC (the source testdata column
        # is a timestamp) so the round trip covers the date type
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
    )
    root = tempfile.mkdtemp(prefix="orc_export_rt_")
    try:
        out = export_view_orc(
            orders, root, "orders_feed", date(2026, 1, 1)
        )
        back = spark.read.orc(out)
        agg = back.groupBy("o_orderpriority").agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
            .cast("double")
            .alias("total_price"),
            F.min("o_orderdate").alias("first_day"),
        )
        return spark.createDataFrame(agg.collect(), agg.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "fuzzy_name_pairs",
    oracle="""
    WITH p AS (SELECT p_partkey, p_name, p_brand, p_size FROM part),
    pairs AS (
      SELECT a.p_brand,
             levenshtein(a.p_name, b.p_name) AS dist
      FROM p a JOIN p b
        ON a.p_brand = b.p_brand AND a.p_size = b.p_size
       AND a.p_partkey < b.p_partkey
       AND abs(len(a.p_name) - len(b.p_name)) <= 12
      WHERE levenshtein(a.p_name, b.p_name) <= 12
    )
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(min(dist) AS INTEGER) AS min_dist,
           CAST(sum(dist) AS BIGINT) AS dist_sum
    FROM pairs GROUP BY 1
    """,
)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-tolerant fuzzy matching at scale (extensions.dedup.
    blocked_edit_distance_pairs): Levenshtein refinement over
    (brand, size)-blocked candidates — never all-pairs; the
    length-difference bound prunes inside the join condition before the
    quadratic distance runs. Levenshtein is integer-exact on both
    engines, so the oracle hash-pins every distance."""
    from ..extensions.dedup import blocked_edit_distance_pairs

    p = t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("pid"), "p_name", "p_brand", "p_size"
    )
    pairs = blocked_edit_distance_pairs(
        p, "pid", "p_name", ["p_brand", "p_size"], max_dist=12
    )
    # the block key rides along on every pair — no re-join needed
    return (
        pairs.groupBy("p_brand")
        .agg(
            F.count("*").alias("n_pairs"),
            F.min("dist").cast("int").alias("min_dist"),
            F.sum("dist").cast("bigint").alias("dist_sum"),
        )
    )


# Shared with queries/dedup.py's oracles: distinct word-3-gram shingles
# hashed to the same 60-bit integers the Spark side emits. (Lives here,
# not in queries/dedup.py, because this module registers AFTER the
# driver-window tail — see queries/__init__.py's rotation note.)
_SHINGLES_CTE = """
    toks AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             ('0x' || substr(md5(a[i+1] || ' ' || a[i+2] || ' ' || a[i+3]),
                             1, 15))::BIGINT AS shingle
      FROM toks, UNNEST(range(0, len(a) - 2)) AS u(i)
      WHERE len(a) >= 3
    )
"""

PPJOIN_THRESHOLD = 0.5


@query(
    "dedup_prefix_filter_jaccard",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    pairs AS (
      SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*) AS inter
      FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
      GROUP BY 1, 2
    )
    SELECT a_id, b_id,
           CAST(inter AS BIGINT) AS inter,
           CAST(sa.n + sb.n - inter AS BIGINT) AS "union",
           CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
    FROM pairs
    JOIN sizes sa ON sa.doc_id = a_id
    JOIN sizes sb ON sb.doc_id = b_id
    WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter)
          >= {PPJOIN_THRESHOLD}
    """,
)
def dedup_prefix_filter_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPJoin-family set-similarity join (extensions.dedup.
    prefix_filter_jaccard_pairs): prefix filtering is LOSSLESS — unlike
    dedup_ngram_jaccard's df-cap heuristic, the oracle here is the
    uncapped exact all-pairs computation, and the prefix-filtered plan
    must reproduce it row-for-row. Candidates join only on each set's
    rarest tokens (prefix length n - ceil(t*n) + 1), the integer size
    bound prunes inside the join, and survivors verify with one map-side
    array_intersect."""
    from ..extensions.dedup import prefix_filter_jaccard_pairs, word_shingles
    from ..cache import tracked_persist

    docs = t(spark, sf_dir, "documents")
    sh = tracked_persist(
        word_shingles(docs, "doc_id", "text", n=3, as_hash=True)
    )
    return prefix_filter_jaccard_pairs(sh, "doc_id", PPJOIN_THRESHOLD)

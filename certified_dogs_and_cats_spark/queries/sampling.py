"""Deterministic sampling/splitting queries over the `documents` table.

md5-keyed assignment replays exactly in DuckDB (hex-prefix -> integer
bucket), so split membership is verified value-for-value across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..extensions.sampling import hash_split, per_group_sample
from .common import t
from .registry import query

SAMPLE_PER_SOURCE = 10

_BUCKET = "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100)"


@query(
    "sample_hash_split",
    oracle=f"""
    SELECT CASE WHEN {_BUCKET} < 80 THEN 'train'
                WHEN {_BUCKET} < 90 THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS cnt,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1
    """,
)
def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return (
        hash_split(docs, "doc_id")
        .groupBy("split")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@query(
    "sample_per_group",
    oracle=f"""
    SELECT source, doc_id FROM (
      SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
             ) AS rn
      FROM documents
    ) WHERE rn <= {SAMPLE_PER_SOURCE}
    """,
)
def sample_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("source", "doc_id")
    return per_group_sample(
        docs, ["source"], "doc_id", n=SAMPLE_PER_SOURCE
    )

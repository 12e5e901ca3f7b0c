"""Multimodal-column queries over the `documents` table.

The payload is the UTF-8 encoding of ``text`` and metadata derives
deterministically from ``doc_id`` (extensions.multimodal.pack_payload), so
DuckDB can replay both the packing and the decode features exactly:
documents.text is pure ASCII in this corpus (validated: octet_length ==
length for every row), making byte-level features equal to char-level SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..extensions.multimodal import decode_features, metadata_stats, pack_payload
from .common import t
from .registry import query


@query(
    "multimodal_metadata_agg",
    oracle="""
    SELECT CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                WHEN doc_id % 3 = 1 THEN 'image/jpeg'
                ELSE 'audio/wav' END AS format,
           count(*) AS n_assets,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes,
           CAST(max(CASE WHEN doc_id % 3 < 2
                         THEN 16 + (doc_id % 48) * 4 END) AS INTEGER)
             AS max_width
    FROM documents
    GROUP BY 1
    """,
)
def multimodal_metadata_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return metadata_stats(pack_payload(docs))


@query(
    "multimodal_decode_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           CAST(CASE WHEN length(text) = 0 THEN -1
                     ELSE ascii(substring(text, 1, 1)) END AS INTEGER)
             AS first_byte,
           CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT)
             AS space_count
    FROM documents
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return decode_features(pack_payload(docs))


@query(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST(i AS INTEGER) AS frame_idx,
           substring(text, CAST(i * 16 + 1 AS INTEGER), 16) AS frame_text,
           CAST(length(substring(text, CAST(i * 16 + 1 AS INTEGER), 16))
                AS INTEGER) AS frame_len
    FROM documents,
         UNNEST(range(0, CAST(ceil(length(text) / 16.0) AS BIGINT), 4))
           AS u(i)
    WHERE length(text) > 0
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every 4th 16-byte frame of each payload via the row-expanding
    mapInPandas decode path; frames decoded back to UTF-8 so DuckDB can
    replay with substring (ASCII corpus: byte slicing == char slicing)."""
    from ..extensions.multimodal import frame_sample

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    frames = frame_sample(pack_payload(docs), frame_bytes=16, every_n=4)
    return frames.select(
        "doc_id",
        "frame_idx",
        F.decode(F.col("frame"), "UTF-8").alias("frame_text"),
        "frame_len",
    )

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


AUDIO_FRAME = 64
AUDIO_HOP = 32
AUDIO_LOUD = 150_000


@query(
    "audio_frame_energy_stats",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, CAST(s // {AUDIO_HOP} AS INTEGER) AS frame_idx, s
      FROM documents,
           UNNEST(range(0, greatest(length(text) - {AUDIO_FRAME} + 1, 0),
                        {AUDIO_HOP})) AS u(s)
    ),
    e AS (
      SELECT f.doc_id, f.frame_idx,
             CAST(sum((ascii(substr(documents.text,
                                    CAST(f.s + j + 1 AS INTEGER), 1)) - 128)
                      * (ascii(substr(documents.text,
                                      CAST(f.s + j + 1 AS INTEGER), 1)) - 128))
                  AS BIGINT) AS energy
      FROM f
      JOIN documents USING (doc_id),
           UNNEST(range(0, {AUDIO_FRAME})) AS v(j)
      GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_frames,
           CAST(sum(energy) AS BIGINT) AS total_energy,
           CAST(max(energy) AS BIGINT) AS max_energy,
           CAST(sum(CASE WHEN energy > {AUDIO_LOUD} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_loud
    FROM e GROUP BY 1
    """,
)
def audio_frame_energy_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-shaped pipeline end to end: pack the corpus into binary
    payloads, run the Arrow-batched windowed-energy decode
    (extensions.multimodal.audio_frame_energy — bytes as 8-bit PCM,
    64-sample frames, 32-sample hop), and aggregate the per-frame
    energies per document (frame count, total/max energy, frames above
    the loudness gate) — the silence-trim / voice-activity report. The
    oracle replays the exact integer energies from the ASCII text the
    payload packs, so the whole Python-kernel path is hash-verified, not
    just row-counted. Energies are exact integers; one mapInPandas fan-out
    + one hash aggregate."""
    from ..extensions.multimodal import audio_frame_energy, pack_payload

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    frames = audio_frame_energy(
        pack_payload(docs), frame=AUDIO_FRAME, hop=AUDIO_HOP
    )
    return frames.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_frames"),
        F.sum("energy").cast("bigint").alias("total_energy"),
        F.max("energy").cast("bigint").alias("max_energy"),
        F.sum(F.when(F.col("energy") > AUDIO_LOUD, 1).otherwise(0))
        .cast("bigint")
        .alias("n_loud"),
    )

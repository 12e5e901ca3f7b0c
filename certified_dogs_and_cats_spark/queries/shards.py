"""Training-shard export under the oracle gate.

Runs the REAL export (extensions.shards.export_training_shards) to a temp
directory — one shuffle, partitioned parquet layout, manifest attested by
reading back the written files — then returns the per-shard manifest body
as the query result. The oracle replays the md5 shard assignment and token
counting in DuckDB over the same source rows, so a green row proves both
the assignment math AND that the exported files carry exactly the source
corpus (any lost/duplicated row would skew a shard's count or id range).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import t
from .registry import query

N_SHARDS = 8

_SHARD = (
    f"(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"
    f" % {N_SHARDS})"
)


@query(
    "shard_export_manifest",
    oracle=f"""
    WITH s AS (
      SELECT CAST({_SHARD} AS INTEGER) AS shard,
             doc_id,
             len(string_split(text, ' ')) AS n_toks
      FROM documents
    )
    SELECT shard,
           count(*) AS n_rows,
           min(doc_id) AS min_id,
           max(doc_id) AS max_id,
           CAST(sum(n_toks) AS BIGINT) AS n_tokens
    FROM s GROUP BY 1
    """,
)
def shard_export_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.shards import export_training_shards, shard_stats

    docs = (
        t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .withColumn("n_toks", F.size(F.split(F.col("text"), " ")))
    )
    out_dir = tempfile.mkdtemp(prefix="shard_export_")
    try:
        export_training_shards(
            docs, out_dir, "doc_id", N_SHARDS, token_count_col="n_toks"
        )
        # Stats recomputed from the WRITTEN files — the result hashes the
        # physical export, not the in-memory frame.
        written = spark.read.parquet(out_dir + "/data")
        return (
            shard_stats(written, "doc_id", token_count_col="n_toks")
            .select("shard", "n_rows", "min_id", "max_id", "n_tokens")
            # Materialize before the temp dir disappears.
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


WDS_SHARDS = 4

# export_webdataset assigns md5(id) over the FIRST 15 hex chars (60 bits);
# mirror exactly (shards.py's parquet exporter uses 8 — keep them distinct).
_WDS_SHARD = (
    f"(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT"
    f" % {WDS_SHARDS})"
)


@query(
    "webdataset_export_manifest",
    oracle=f"""
    WITH s AS (
      SELECT CAST({_WDS_SHARD} AS INTEGER) AS shard, doc_id
      FROM documents
    )
    SELECT shard,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(2 * count(*) AS BIGINT) AS n_members,
           min(doc_id) AS min_id,
           max(doc_id) AS max_id
    FROM s GROUP BY 1
    """,
)
def webdataset_export_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset tar-shard sink (extensions.webdataset.export_webdataset)
    under the oracle gate: pack documents into (payload, media), write
    shard-NNNNN.tar files with deterministic member bytes, then build the
    result from the READ-BACK manifest — per-shard sample counts, member
    counts (payload + .json pairing attested by reopening every tar), and
    id ranges. The oracle replays the md5 shard assignment in DuckDB, so
    a green row proves the assignment math AND that the tars carry
    exactly the source corpus."""
    import glob as _glob
    import os as _os
    import tarfile as _tarfile

    from ..extensions.multimodal import pack_payload
    from ..extensions.webdataset import export_webdataset

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    out_dir = tempfile.mkdtemp(prefix="wds_export_")
    try:
        export_webdataset(pack_payload(docs), out_dir, n_shards=WDS_SHARDS)
        rows = []
        for tar_path in sorted(_glob.glob(_os.path.join(out_dir, "shard-*.tar"))):
            shard = int(_os.path.basename(tar_path)[6:-4])
            with _tarfile.open(tar_path) as tf:
                names = tf.getnames()
            ids = {int(_os.path.splitext(n)[0]) for n in names}
            rows.append((shard, len(ids), len(names), min(ids), max(ids)))
        return spark.createDataFrame(
            rows, "shard INT, n_samples BIGINT, n_members BIGINT, min_id BIGINT, max_id BIGINT"
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)

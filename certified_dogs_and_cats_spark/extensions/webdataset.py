"""WebDataset-style tar shard export for multimodal corpora.

Training loaders for image/audio corpora stream POSIX tars whose members
group by basename (``00000042.jpg`` + ``00000042.json`` form one sample —
the WebDataset convention): sequential reads, no per-sample filesystem
metadata, shard-level shuffling. This sink writes the packed
(payload, media) representation (see :mod:`extensions.multimodal`) into
that layout.

Plan shape: md5-hash shard assignment (same deterministic scheme as
:mod:`extensions.shards`), ONE shuffle (``repartition(n, shard)``) so each
write task owns whole shards, rows sorted within the partition so tar
member order is reproducible. The tar packing itself runs in
``foreachPartition`` — a SINK boundary (tarfile has no JVM expression
equivalent), the same justification as the Arrow decode boundary; each
executor streams its shards to the shared filesystem without ever
materializing a shard in memory (member-at-a-time writes).

Determinism: fixed tar metadata (mtime 0, uid/gid 0, ustar format) and
id-sorted members make shard bytes identical across runs and
partitionings; the manifest is attested by READING BACK the written tars
(member counts and ids come from the files, not from what the writer
thinks it wrote).
"""

from __future__ import annotations

import glob
import io
import json
import os
import tarfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EXT = {
    "image/png": "png",
    "image/jpeg": "jpg",
    "audio/wav": "wav",
}


def export_webdataset(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    meta_col: str = "media",
) -> dict:
    """Write ``df`` as ``shard-NNNNN.tar`` files under ``path`` and return
    the read-back-attested manifest.

    Each sample contributes two members named by its zero-padded id: the
    payload (extension from the metadata format, ``bin`` for unknown) and
    a ``.json`` with the metadata struct. Shard assignment is
    ``md5(id) mod n_shards`` — deterministic and engine-replayable.
    """
    os.makedirs(path, exist_ok=True)
    shard = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % n_shards
    ).alias("__shard__")
    rows = (
        df.select(
            F.col(id_col).alias("__id__"),
            F.col(payload_col).alias("__payload__"),
            F.to_json(F.col(meta_col)).alias("__meta__"),
            F.col(meta_col)["format"].alias("__fmt__"),
            shard,
        )
        .repartition(n_shards, "__shard__")
        .sortWithinPartitions("__shard__", "__id__")
    )

    def write_partition(it) -> None:
        tar = None
        cur = None

        def close() -> None:
            nonlocal tar
            if tar is not None:
                tar.close()
                tar = None

        for row in it:
            if row["__shard__"] != cur:
                close()
                cur = row["__shard__"]
                tar = tarfile.open(
                    os.path.join(path, f"shard-{cur:05d}.tar"),
                    "w",
                    format=tarfile.USTAR_FORMAT,
                )
            base = f"{row['__id__']:08d}"
            ext = _EXT.get(row["__fmt__"], "bin")
            for name, data in (
                (f"{base}.{ext}", bytes(row["__payload__"])),
                (f"{base}.json", row["__meta__"].encode("utf-8")),
            ):
                info = tarfile.TarInfo(name=name)
                info.size = len(data)
                info.mtime = 0
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tar.addfile(info, io.BytesIO(data))
        close()

    rows.foreachPartition(write_partition)
    return read_back_manifest(path)


def read_back_manifest(path: str) -> dict:
    """Attest what actually landed: reopen every tar and report per-shard
    sample counts, byte sizes, and id ranges from the FILES."""
    shards = []
    for tar_path in sorted(glob.glob(os.path.join(path, "shard-*.tar"))):
        ids = set()
        with tarfile.open(tar_path) as tf:
            for m in tf.getmembers():
                ids.add(int(os.path.splitext(m.name)[0]))
        shards.append(
            {
                "shard": os.path.basename(tar_path),
                "n_samples": len(ids),
                "size_bytes": os.path.getsize(tar_path),
                "min_id": min(ids) if ids else None,
                "max_id": max(ids) if ids else None,
            }
        )
    manifest = {
        "n_shards": len(shards),
        "n_samples": sum(s["n_samples"] for s in shards),
        "shards": shards,
    }
    with open(os.path.join(path, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1)
    return manifest


def read_webdataset(spark, path: str) -> DataFrame:
    """Load exported shards back into the packed (id, payload, meta_json)
    shape via Spark's binaryFile source + a mapInPandas untar — the
    loader-side round trip that proves the layout."""
    import pandas as pd  # noqa: F401
    from pyspark.sql import types as T

    bins = spark.read.format("binaryFile").load(
        os.path.join(path, "shard-*.tar")
    )

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("meta_json", T.StringType()),
        ]
    )

    def untar(batches):
        import pandas as pd

        for pdf in batches:
            for blob in pdf["content"]:
                samples: dict[int, dict] = {}
                with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tf:
                    for m in tf.getmembers():
                        sid = int(os.path.splitext(m.name)[0])
                        data = tf.extractfile(m).read()
                        rec = samples.setdefault(sid, {})
                        if m.name.endswith(".json"):
                            rec["meta_json"] = data.decode("utf-8")
                        else:
                            rec["payload"] = data
                yield pd.DataFrame(
                    {
                        "doc_id": list(samples),
                        "payload": [samples[i].get("payload") for i in samples],
                        "meta_json": [
                            samples[i].get("meta_json") for i in samples
                        ],
                    }
                )

    return bins.select("content").mapInPandas(untar, out_schema)

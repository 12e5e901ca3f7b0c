"""WebDataset tar shard export (extensions/webdataset.py)."""

from __future__ import annotations

import hashlib
import os
import tarfile

from certified_dogs_and_cats_spark.extensions.multimodal import pack_payload
from certified_dogs_and_cats_spark.extensions.webdataset import (
    export_webdataset,
    read_webdataset,
)


def _packed(spark, n=30):
    rows = [(i, f"doc {i} text body") for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    return pack_payload(df)


def test_export_layout_and_manifest(spark, tmp_path):
    out = str(tmp_path / "wds")
    man = export_webdataset(_packed(spark, 30), out, n_shards=4)
    assert man["n_samples"] == 30
    assert man["n_shards"] >= 1
    # Members pair up: payload + .json per sample, basename-grouped.
    tar_files = [f for f in os.listdir(out) if f.endswith(".tar")]
    assert tar_files
    with tarfile.open(os.path.join(out, tar_files[0])) as tf:
        names = tf.getnames()
    bases = {os.path.splitext(n)[0] for n in names}
    assert len(names) == 2 * len(bases)
    for b in bases:
        assert f"{b}.json" in names


def test_shard_bytes_deterministic_across_runs(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    export_webdataset(_packed(spark, 40), a, n_shards=3)
    export_webdataset(_packed(spark, 40).repartition(7), b, n_shards=3)

    def digest(root):
        out = {}
        for f in sorted(os.listdir(root)):
            if f.endswith(".tar"):
                with open(os.path.join(root, f), "rb") as fh:
                    out[f] = hashlib.md5(fh.read()).hexdigest()
        return out

    da, db = digest(a), digest(b)
    assert da and da == db  # identical bytes regardless of partitioning


def test_round_trip_recovers_payloads(spark, tmp_path):
    out = str(tmp_path / "wds_rt")
    src = _packed(spark, 25)
    export_webdataset(src, out, n_shards=2)
    back = read_webdataset(spark, out)
    got = {r.doc_id: bytes(r.payload) for r in back.collect()}
    want = {r.doc_id: bytes(r.payload) for r in src.collect()}
    assert got == want
    assert all('"format"' in r.meta_json for r in back.collect())

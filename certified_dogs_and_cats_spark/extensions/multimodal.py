"""Multimodal columns: opaque binary payloads + typed metadata.

The reference corpus is text-only, so this extension is specified by the
builder brief rather than a reference file: treat image/audio/video as
opaque ``binary`` columns carrying a typed metadata struct, and run
decode / feature-extraction through Arrow-batched ``mapInPandas`` so the
Python boundary is paid once per batch, never per row.

Design for 100 TB:

- The payload never leaves the executor: packing, sniffing, and metadata
  propagation are all JVM-side column expressions; only the explicit
  ``decode_*`` feature extractors cross into Python, and they cross via
  Arrow record batches (``mapInPandas``), preserving partitioning (no
  shuffle — it is a narrow transformation).
- Feature extraction projects the payload away immediately, so the wide
  binary column does not survive past the decode stage.
- The Spark-side plumbing is real and tested for all four decode shapes:
  per-payload features (:func:`decode_features`, 1 row -> 1 row),
  frame sampling (:func:`frame_sample`, 1 row -> k rows), resize
  (:func:`resize_nearest`, numpy kernel per Arrow batch), and metadata
  rollups. The real codec path (:func:`decode_image`) is gated on an
  optional Pillow dependency: with Pillow present it decodes through the
  same Arrow boundary (poison-safe, per-batch); without it, it raises
  with the dependency spelled out rather than pretending.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

try:  # real image decode requires Pillow — not installed in this container
    from PIL import Image  # type: ignore[import-not-found]  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

#: Typed metadata carried next to every opaque payload.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType(), False),
        T.StructField("size_bytes", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)

#: Output schema of :func:`decode_features` (stable contract for sinks).
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), False),
        T.StructField("first_byte", T.IntegerType(), False),
        T.StructField("space_count", T.LongType(), False),
    ]
)

_FORMATS = ("image/png", "image/jpeg", "audio/wav")


def pack_payload(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Attach an opaque ``payload: binary`` column + ``media`` metadata struct.

    The testdata has no real media bytes, so the payload is the UTF-8
    encoding of ``text_col`` and the metadata is derived deterministically
    from ``id_col`` — a stand-in with the same schema, sizes, and
    distribution properties a real corpus would have. Everything here is a
    JVM-side column expression (no Python boundary).
    """
    doc_id = F.col(id_col)
    fmt = (
        F.when(doc_id % 3 == 0, _FORMATS[0])
        .when(doc_id % 3 == 1, _FORMATS[1])
        .otherwise(_FORMATS[2])
    )
    is_image = doc_id % 3 < 2
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        fmt.alias("format"),
        F.octet_length(payload).cast("long").alias("size_bytes"),
        F.when(is_image, (16 + F.pmod(doc_id, 48) * 4).cast("int")).alias("width"),
        F.when(is_image, (16 + F.pmod(doc_id, 32) * 4).cast("int")).alias("height"),
        F.when(~is_image, F.lit(16000)).alias("sample_rate"),
    )
    return df.withColumn("payload", payload).withColumn("media", meta)


def sniff_format(payload: F.Column) -> F.Column:
    """Magic-byte sniffing, JVM-side: map leading bytes to a format label.

    ``hex()`` on a binary column gives us the leading bytes without a UDF;
    real magic numbers (PNG ``89504E47``, JPEG ``FFD8``, RIFF/WAV
    ``52494646``) are matched first, anything else is ``application/octet-
    stream``.
    """
    head = F.upper(F.hex(F.substring(payload, 1, 4)))
    return (
        F.when(head.startswith("89504E47"), "image/png")
        .when(head.startswith("FFD8"), "image/jpeg")
        .when(head.startswith("52494646"), "audio/wav")
        .otherwise("application/octet-stream")
    )


def metadata_stats(df: DataFrame) -> DataFrame:
    """Per-format rollup over the typed metadata (pure JVM aggregation)."""
    return (
        df.groupBy(F.col("media.format").alias("format"))
        .agg(
            F.count("*").alias("n_assets"),
            F.sum("media.size_bytes").alias("total_bytes"),
            F.max("media.size_bytes").alias("max_bytes"),
            F.max("media.width").alias("max_width"),
        )
    )


def decode_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Extract per-payload features through Arrow-batched ``mapInPandas``.

    This is the canonical decode boundary: payload bytes arrive in pandas
    batches, a plain-Python extractor runs once per batch, and only the
    (narrow) feature columns come back. A real image/audio decoder slots
    into ``extract`` without touching the Spark plan. Partitioning is
    preserved — ``mapInPandas`` is a narrow transformation, so a decode
    after a ``repartition(N)`` keeps all N partitions.
    """
    src = df.select(F.col(id_col).cast("long").alias("doc_id"), "payload")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd  # executor-side import

        for pdf in batches:
            payload = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": payload.map(len).astype("int64"),
                    "first_byte": payload.map(
                        lambda b: b[0] if len(b) else -1
                    ).astype("int32"),
                    "space_count": payload.map(
                        lambda b: b.count(b" ")
                    ).astype("int64"),
                }
            )

    return src.mapInPandas(extract, schema=FEATURE_SCHEMA)


def decode_features_arrow(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """:func:`decode_features` on the ``mapInArrow`` boundary: the
    extractor consumes ``pyarrow.RecordBatch`` directly — no
    Arrow-to-pandas materialization on either side of the Python
    crossing, which skips a per-batch copy of every payload byte string
    into Python objects (pandas object-dtype) and back. Same output
    schema and values as the pandas variant; pick this one when the
    per-batch work is itself Arrow/numpy-friendly, the pandas one when
    the extractor wants Series ergonomics.
    """
    import pyarrow as pa  # noqa: F401

    src = df.select(F.col(id_col).cast("long").alias("doc_id"), "payload")

    def extract(batches):
        import pyarrow as pa

        for batch in batches:
            payloads = batch.column("payload").to_pylist()
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pa.array([len(b) for b in payloads], pa.int64()),
                    pa.array(
                        [b[0] if len(b) else -1 for b in payloads],
                        pa.int32(),
                    ),
                    pa.array(
                        [b.count(b" ") for b in payloads], pa.int64()
                    ),
                ],
                names=["doc_id", "byte_len", "first_byte", "space_count"],
            )

    return src.mapInArrow(extract, schema=FEATURE_SCHEMA)


#: Output schema of :func:`decode_image` (real codec path, Pillow-gated).
IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mode", T.StringType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def decode_image(
    df: DataFrame, id_col: str = "doc_id", codec: str = "auto"
) -> DataFrame:
    """Decode image payloads to (width, height, mode).

    Codec routing — the Spark plumbing (Arrow-batched ``mapInPandas``,
    one Python crossing per batch, payload projected away, partitioning
    preserved) is identical either way:

    - ``"auto"`` (default): Pillow where installed (full format
      coverage); otherwise the stdlib PNG decoder
      (:mod:`extensions.minipng` — validating IHDR + IDAT-length
      decode, no dependencies), under which non-PNG payloads decode as
      ``decode_ok=false`` like any other undecodable bytes.
    - ``"pillow"``: force Pillow; raises NotImplementedError at plan
      time with the dependency spelled out when it is absent.
    - ``"minipng"``: force the stdlib decoder (deterministic regardless
      of environment).

    Undecodable payloads yield ``decode_ok=false`` nulls instead of
    failing the task (at corpus scale a poisoned byte string must never
    kill the job).
    """
    if codec not in ("auto", "pillow", "minipng"):
        raise ValueError(f"unknown codec {codec!r}")
    if codec == "pillow" and not _HAS_PIL:
        raise NotImplementedError(
            "decode_image(codec='pillow') requires Pillow (`pip install "
            "Pillow`); this container has no image codecs. Use the "
            "default codec='auto' for the stdlib PNG fallback, or "
            "decode_features for the codec-free feature path."
        )
    use_pil = codec == "pillow" or (codec == "auto" and _HAS_PIL)
    src = df.select(F.col(id_col).cast("long").alias("doc_id"), "payload")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        import pandas as pd  # executor-side import

        if use_pil:
            from PIL import Image

            def one(raw: bytes) -> tuple[int, int, str]:
                with Image.open(io.BytesIO(raw)) as im:
                    return im.width, im.height, im.mode

        else:
            from .minipng import decode_png as one

        for pdf in batches:
            widths, heights, modes, oks = [], [], [], []
            for raw in pdf["payload"]:
                try:
                    w, h, mode = one(bytes(raw))
                    widths.append(w)
                    heights.append(h)
                    modes.append(mode)
                    oks.append(True)
                except Exception:  # noqa: BLE001 — poisoned payload
                    widths.append(None)
                    heights.append(None)
                    modes.append(None)
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                    "mode": modes,
                    "decode_ok": oks,
                }
            )

    return src.mapInPandas(decode, schema=IMAGE_SCHEMA)


#: Output schema of :func:`frame_sample` (one row per sampled frame).
FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
        T.StructField("frame_len", T.IntegerType(), False),
    ]
)


def frame_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    frame_bytes: int = 16,
    every_n: int = 4,
) -> DataFrame:
    """Sample every ``every_n``-th fixed-size frame from each payload.

    The row-expanding decode shape: one input row fans out to
    ceil(len/frame_bytes)/every_n output rows inside the same Arrow batch
    (``mapInPandas`` generators may yield more rows than they consume —
    no explode/join needed, partitioning preserved). The "codec" here is a
    deterministic fixed-width chunker standing in for a real frame
    decoder; a PyAV/ffmpeg demuxer slots into ``frames()`` with the same
    one-row-in/k-rows-out contract (real codecs are not in this
    container — see :func:`decode_image`).
    """
    src = df.select(F.col(id_col).cast("long").alias("doc_id"), "payload")

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd  # executor-side import

        for pdf in batches:
            ids, idxs, chunks = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = (len(payload) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    idxs.append(i)
                    chunks.append(
                        bytes(payload[i * frame_bytes:(i + 1) * frame_bytes])
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": pd.Series(chunks, dtype=object),
                    "frame_len": pd.Series(
                        [len(c) for c in chunks], dtype="int32"
                    ),
                }
            )

    return src.mapInPandas(frames, schema=FRAME_SCHEMA)


#: Output schema of :func:`resize_nearest`.
RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("pixels", T.BinaryType(), False),
    ]
)


def resize_nearest(
    df: DataFrame,
    out_w: int,
    out_h: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Nearest-neighbor resize of grayscale images to (out_w, out_h).

    Input rows carry ``payload`` (raw bytes) and ``media.width/height``;
    the payload is truncated/zero-padded to width*height bytes — the
    deterministic stand-in for a real pixel decode. The kernel is numpy
    fancy-indexing per Arrow batch (index grids computed once per distinct
    shape), the same mapInPandas boundary as :func:`decode_features`; a
    real image backend swaps the np.frombuffer line for a decoded array.
    """
    src = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        "payload",
        F.col("media.width").alias("w"),
        F.col("media.height").alias("h"),
    ).filter(F.col("w").isNotNull())

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as pd  # executor-side imports

        grids: dict[tuple[int, int], tuple] = {}
        for pdf in batches:
            out = []
            for payload, w, h in zip(pdf["payload"], pdf["w"], pdf["h"]):
                w, h = int(w), int(h)
                buf = np.zeros(w * h, dtype=np.uint8)
                raw = np.frombuffer(bytes(payload), dtype=np.uint8)[: w * h]
                buf[: len(raw)] = raw
                img = buf.reshape(h, w)
                if (w, h) not in grids:
                    rows = (np.arange(out_h) * h) // out_h
                    cols = (np.arange(out_w) * w) // out_w
                    grids[(w, h)] = (rows[:, None], cols[None, :])
                r, c = grids[(w, h)]
                out.append(img[r, c].tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.Series([out_w] * len(out), dtype="int32"),
                    "height": pd.Series([out_h] * len(out), dtype="int32"),
                    "pixels": pd.Series(out, dtype=object),
                }
            )

    return src.mapInPandas(kernel, schema=RESIZED_SCHEMA)


def ingest_binary_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Ingest a directory of real media files through Spark's built-in
    ``binaryFile`` source into the packed multimodal schema: one row per
    file with ``media_id`` (the relative file name), opaque ``payload``
    bytes, and the typed ``media`` metadata struct with the format
    sniffed from the payload's magic bytes (:func:`sniff_format`).

    Scale posture: ``binaryFile`` is a real distributed file source —
    listing parallelizes, each executor reads its own files, and
    ``pathGlobFilter``/``max_bytes`` bound what is even opened. Width/
    height stay NULL here; decoding them is exactly the Arrow-batched
    :func:`decode_features` boundary downstream.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.filter(F.col("length") <= max_bytes)
    payload = F.col("content")
    # Same media struct shape as pack_payload, so every downstream op
    # (metadata_stats, decode_features, frame_sample) takes either source.
    return df.select(
        F.regexp_extract(F.col("path"), r"([^/]+)$", 1).alias("media_id"),
        payload.alias("payload"),
        F.struct(
            sniff_format(payload).alias("format"),
            F.col("length").cast("long").alias("size_bytes"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("media"),
    )


#: Output schema of :func:`audio_frame_energy`.
AUDIO_ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("energy", T.LongType(), False),
    ]
)


def audio_frame_energy(
    df: DataFrame,
    id_col: str = "doc_id",
    frame: int = 64,
    hop: int = 32,
    center: int = 128,
) -> DataFrame:
    """Windowed audio ENERGY over packed payloads: each payload byte is
    an unsigned 8-bit PCM sample (the deterministic stand-in for a real
    codec decode — audio libs are not in this container, same contract as
    :func:`frame_sample`'s chunker; a soundfile/librosa decoder slots
    into ``kernel()`` unchanged), framed at ``frame`` samples with
    ``hop``-sample overlap, energy = sum((sample - center)^2) per FULL
    frame — the voice-activity / silence-trim primitive of an audio
    training pipeline.

    Arrow-batched mapInPandas, numpy-vectorized per batch, never per-row
    Python; one row fans out to its frame count inside the same batch,
    partitioning preserved. Energies are exact integers, so downstream
    aggregates hash-pin cross-engine.
    """
    src = df.select(F.col(id_col).cast("long").alias("doc_id"), "payload")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as pd  # executor-side import

        for pdf in batches:
            ids, idxs, ens = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(bytes(payload), dtype=np.uint8).astype(
                    np.int64
                )
                d = arr - center
                for k, s in enumerate(range(0, len(d) - frame + 1, hop)):
                    seg = d[s : s + frame]
                    ids.append(doc_id)
                    idxs.append(k)
                    ens.append(int(np.dot(seg, seg)))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "energy": pd.Series(ens, dtype="int64"),
                }
            )

    return src.mapInPandas(kernel, schema=AUDIO_ENERGY_SCHEMA)

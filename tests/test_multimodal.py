"""Multimodal extension: binary payload packing, metadata schema,
mapInPandas decode boundary (batch shape + partition preservation), magic-
byte sniffing, and the honest stubs for codec-requiring paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from certified_dogs_and_cats_spark.extensions.multimodal import (
    FEATURE_SCHEMA,
    decode_features,
    decode_image,
    frame_sample,
    metadata_stats,
    pack_payload,
    sniff_format,
)


@pytest.fixture
def docs(spark):
    rows = [
        (0, "alpha beta gamma"),
        (1, "delta epsilon"),
        (2, "zeta"),
        (3, "eta theta iota kappa"),
        (4, ""),
        (5, "lambda mu"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pack_payload_schema_and_determinism(docs):
    packed = pack_payload(docs)
    assert dict(packed.dtypes)["payload"] == "binary"
    media = packed.schema["media"].dataType
    assert isinstance(media, T.StructType)
    assert [f.name for f in media.fields] == [
        "format", "size_bytes", "width", "height", "sample_rate",
    ]
    rows = {r.doc_id: r.media for r in packed.collect()}
    assert rows[0].format == "image/png" and rows[0].sample_rate is None
    assert rows[1].format == "image/jpeg" and rows[1].width == 16 + 1 * 4
    assert rows[2].format == "audio/wav" and rows[2].width is None
    assert rows[2].sample_rate == 16000
    assert rows[3].size_bytes == len("eta theta iota kappa")


def test_decode_features_values_and_schema(docs):
    feats = decode_features(pack_payload(docs))
    assert feats.schema == FEATURE_SCHEMA
    by_id = {r.doc_id: r for r in feats.collect()}
    assert by_id[0].byte_len == 16
    assert by_id[0].first_byte == ord("a")
    assert by_id[0].space_count == 2
    assert by_id[4].byte_len == 0
    assert by_id[4].first_byte == -1  # empty payload sentinel


def test_decode_preserves_partitioning(docs):
    packed = pack_payload(docs).repartition(3)
    feats = decode_features(packed)
    # mapInPandas is narrow: no exchange is introduced, partitions survive.
    assert feats.rdd.getNumPartitions() == 3
    plan = feats._jdf.queryExecution().executedPlan().toString()
    # The only exchanges in the plan are the explicit repartition itself.
    assert plan.count("Exchange") == plan.count("Exchange RoundRobinPartitioning")


def test_sniff_format_magic_bytes(spark):
    payloads = [
        (1, bytearray(b"\x89PNG\r\n\x1a\n....")),
        (2, bytearray(b"\xff\xd8\xff\xe0JFIF")),
        (3, bytearray(b"RIFF\x24\x00\x00\x00WAVE")),
        (4, bytearray(b"plain text")),
    ]
    df = spark.createDataFrame(payloads, "id long, payload binary")
    got = {
        r.id: r.fmt
        for r in df.select("id", sniff_format(F.col("payload")).alias("fmt")).collect()
    }
    assert got == {
        1: "image/png",
        2: "image/jpeg",
        3: "audio/wav",
        4: "application/octet-stream",
    }


def test_metadata_stats_rollup(docs):
    stats = {r.format: r for r in metadata_stats(pack_payload(docs)).collect()}
    assert stats["image/png"].n_assets == 2  # doc_id 0, 3
    assert stats["image/png"].total_bytes == 16 + 20
    assert stats["audio/wav"].max_width is None


def test_codec_gate_raises_without_pillow(docs):
    """codec='pillow' keeps the documented plan-time dependency raise;
    runs as a REAL assertion in either environment (no skip)."""
    from certified_dogs_and_cats_spark.extensions import multimodal

    if multimodal._HAS_PIL:
        # Pillow present: the forced path must NOT raise at plan time.
        decode_image(pack_payload(docs), codec="pillow")
    else:
        with pytest.raises(NotImplementedError, match="Pillow"):
            decode_image(pack_payload(docs), codec="pillow")
    with pytest.raises(ValueError, match="unknown codec"):
        decode_image(pack_payload(docs), codec="webp")


def test_decode_image_real_codec_path(spark):
    """decode_image reads REAL image bytes through the Arrow boundary and
    survives poisoned payloads — in every environment: the bytes are a
    genuine PNG synthesized by the stdlib encoder (extensions/minipng),
    decoded by Pillow where installed and by the validating stdlib PNG
    decoder otherwise (no skip either way)."""
    from certified_dogs_and_cats_spark.extensions.minipng import encode_png

    png = encode_png(7, 5, bytes(range(7 * 5 * 3)), mode="RGB")
    truncated = png[: len(png) // 2]  # valid signature, broken body
    df = spark.createDataFrame(
        [
            (0, bytearray(png)),
            (1, bytearray(b"not an image")),
            (2, bytearray(truncated)),
        ],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in decode_image(df).collect()}
    assert (rows[0].width, rows[0].height, rows[0].decode_ok) == (7, 5, True)
    assert rows[0].mode == "RGB"
    assert rows[1].decode_ok is False and rows[1].width is None
    assert rows[2].decode_ok is False


def test_minipng_roundtrip_and_validation():
    """The stdlib codec round-trips every supported mode and REJECTS
    structurally broken payloads (it is a validating decoder, not an
    IHDR sniffer)."""
    import zlib

    from certified_dogs_and_cats_spark.extensions.minipng import (
        decode_png,
        encode_png,
    )

    for mode, samples in (("L", 1), ("LA", 2), ("RGB", 3), ("RGBA", 4)):
        data = encode_png(4, 3, bytes(4 * 3 * samples), mode=mode)
        assert decode_png(data) == (4, 3, mode)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"GIF89a notapng")
    # IDAT whose decompressed length disagrees with IHDR dims
    good = encode_png(4, 3, bytes(36), mode="RGB")
    import struct as _s

    # splice in an IDAT of the wrong pixel count (2x2 instead of 4x3)
    bad_raw = b"".join(b"\x00" + bytes(6) for _ in range(2))
    bad_idat = zlib.compress(bad_raw)
    sig_ihdr = good[: 8 + 12 + 13]
    chunk = (
        _s.pack(">I", len(bad_idat))
        + b"IDAT"
        + bad_idat
        + _s.pack(">I", zlib.crc32(b"IDAT" + bad_idat) & 0xFFFFFFFF)
    )
    iend = good[-12:]
    with pytest.raises(ValueError, match="IDAT length"):
        decode_png(sig_ihdr + chunk + iend)


def test_frame_sample_row_expansion(docs):
    """One payload row fans out to one row per sampled fixed-width frame
    (frame 0, 4, 8, ... of 4-byte frames), empty payloads to zero rows."""
    out = frame_sample(
        pack_payload(docs), frame_bytes=4, every_n=2
    ).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 0: "alpha beta gamma" = 16 bytes -> frames 0..3, sampled 0 and 2.
    f0 = sorted(by_doc[0], key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in f0] == [0, 2]
    assert bytes(f0[0].frame) == b"alph"
    assert bytes(f0[1].frame) == b"ta g"  # bytes 8..11 of the payload
    # doc 2: "zeta" = 4 bytes -> exactly one frame.
    assert [r.frame_idx for r in by_doc[2]] == [0]
    assert 4 not in by_doc  # empty payload -> no frames


def test_resize_nearest_kernel(spark):
    """4x4 image of bytes 0..15 resized to 2x2 nearest-neighbor must pick
    pixels (0,0),(0,2),(2,0),(2,2) = 0,2,8,10; short payloads zero-pad."""
    from certified_dogs_and_cats_spark.extensions.multimodal import (
        RESIZED_SCHEMA,
        resize_nearest,
    )

    rows = [
        (0, bytearray(range(16)), (4, 4)),
        (1, bytearray(range(6)), (4, 4)),  # padded with zeros
    ]
    df = spark.createDataFrame(
        [
            (i, p, {"format": "image/png", "size_bytes": len(p),
                    "width": wh[0], "height": wh[1], "sample_rate": None})
            for i, p, wh in rows
        ],
        "doc_id long, payload binary, media struct<format:string,"
        "size_bytes:bigint,width:int,height:int,sample_rate:int>",
    )
    out = resize_nearest(df, 2, 2)
    assert out.schema == RESIZED_SCHEMA
    got = {r.doc_id: bytes(r.pixels) for r in out.collect()}
    assert got[0] == bytes([0, 2, 8, 10])
    assert got[1] == bytes([0, 2, 0, 0])  # rows 2+ were padding
    assert out.collect()[0].width == 2


def test_ingest_binary_dir(spark, tmp_path):
    """binaryFile ingest: real files on disk land in the packed schema
    with sniffed formats, and compose with metadata_stats unchanged."""
    from certified_dogs_and_cats_spark.extensions.multimodal import (
        ingest_binary_dir,
        metadata_stats,
    )

    d = tmp_path / "media"
    d.mkdir()
    (d / "a.png").write_bytes(b"\x89PNG\r\n\x1a\n" + b"x" * 10)
    (d / "b.jpg").write_bytes(b"\xff\xd8\xff\xe0" + b"y" * 20)
    (d / "c.wav").write_bytes(b"RIFF" + b"z" * 30)
    (d / "d.bin").write_bytes(b"\x00\x01\x02\x03")

    df = ingest_binary_dir(spark, str(d))
    rows = {r.media_id: r for r in df.collect()}
    assert rows["a.png"].media.format == "image/png"
    assert rows["b.jpg"].media.format == "image/jpeg"
    assert rows["c.wav"].media.format == "audio/wav"
    assert rows["d.bin"].media.format == "application/octet-stream"
    assert rows["a.png"].media.size_bytes == 18
    assert bytes(rows["d.bin"].payload) == b"\x00\x01\x02\x03"

    stats = {r.format: r.n_assets for r in metadata_stats(df).collect()}
    assert stats["image/png"] == 1 and len(stats) == 4

    # Glob + size bound restrict what is even opened.
    only_png = ingest_binary_dir(spark, str(d), glob="*.png")
    assert [r.media_id for r in only_png.collect()] == ["a.png"]
    small = ingest_binary_dir(spark, str(d), max_bytes=10)
    assert {r.media_id for r in small.collect()} == {"d.bin"}


def test_arrow_decode_matches_pandas_decode(spark):
    """mapInArrow variant: value-identical to the mapInPandas boundary
    (same schema, same features) with no pandas materialization."""
    from certified_dogs_and_cats_spark.extensions.multimodal import (
        decode_features,
        decode_features_arrow,
        pack_payload,
    )

    df = pack_payload(
        spark.createDataFrame(
            [(i, f"text body {i} with spaces") for i in range(40)],
            "doc_id BIGINT, text STRING",
        )
    )
    a = {
        r.doc_id: (r.byte_len, r.first_byte, r.space_count)
        for r in decode_features(df).collect()
    }
    b = {
        r.doc_id: (r.byte_len, r.first_byte, r.space_count)
        for r in decode_features_arrow(df).collect()
    }
    assert a == b and len(a) == 40


def test_audio_frame_energy_exact_and_short_payloads(spark):
    """Windowed energy kernel: frames are FULL 64-sample windows at hop
    32 (a payload shorter than one frame yields no rows), and energies
    equal the exact integer sum((b-128)^2) per window."""
    from certified_dogs_and_cats_spark.extensions.multimodal import (
        audio_frame_energy,
    )

    short = b"x" * 63
    exact = bytes(range(96))  # 96 samples -> frames at s=0 and s=32
    df = spark.createDataFrame(
        [(1, bytearray(short)), (2, bytearray(exact))],
        "doc_id BIGINT, payload BINARY",
    )
    rows = audio_frame_energy(df, frame=64, hop=32).collect()
    got = {(r.doc_id, r.frame_idx): r.energy for r in rows}

    def energy(b):
        return sum((x - 128) ** 2 for x in b)

    assert set(got) == {(2, 0), (2, 1)}  # doc 1 too short: no frames
    assert got[(2, 0)] == energy(exact[0:64])
    assert got[(2, 1)] == energy(exact[32:96])


def test_minipng_rejects_decompression_bombs():
    """Attacker-controlled payloads must fail the ROW, never the
    executor: a tiny zlib bomb declaring a huge IHDR is rejected on the
    declared size before inflating, and a stream inflating PAST its
    declared size is cut off at one extra byte."""
    import struct
    import zlib

    from certified_dogs_and_cats_spark.extensions import minipng
    from certified_dogs_and_cats_spark.extensions.minipng import (
        _chunk,
        _SIGNATURE,
        decode_png,
        encode_png,
    )

    # 1) Declared size over budget: rejected pre-inflate.
    big_ihdr = struct.pack(">IIBBBBB", 50_000, 50_000, 8, 2, 0, 0, 0)
    bomb = (
        _SIGNATURE
        + _chunk(b"IHDR", big_ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 10))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="decode budget"):
        decode_png(bomb)

    # 2) Small declared size, stream inflates far past it: the inflater
    # is capped at expected+1 bytes, so the 16 MiB payload never
    # materializes.
    small_ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    lying = (
        _SIGNATURE
        + _chunk(b"IHDR", small_ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * (16 * 1024 * 1024)))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="IDAT length"):
        decode_png(lying)

    # 3) An honest image at the same dims still decodes.
    assert decode_png(encode_png(2, 2, bytes(4), mode="L")) == (2, 2, "L")


def test_minipng_rejects_illegal_bit_depth_and_truncated_stream():
    """Two header/stream forgeries that previously decoded with bogus
    metadata (ADVICE r8): an IHDR bit depth outside the PNG spec's
    per-color-type legal set (bit_depth=0 makes expected = height*1, so
    a tiny matching IDAT 'decodes'), and a TRUNCATED zlib stream that
    inflates to exactly the expected byte count but never reaches the
    zlib end marker (d.eof False, empty flush)."""
    import struct
    import zlib

    from certified_dogs_and_cats_spark.extensions.minipng import (
        _chunk,
        _SIGNATURE,
        decode_png,
        encode_png,
    )

    # bit_depth=0 for grayscale: expected = 3 rows * (1 + 0) = 3 bytes.
    zero_depth = (
        _SIGNATURE
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 3, 0, 0, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 3))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="illegal bit depth"):
        decode_png(zero_depth)

    # bit_depth=4 is legal for grayscale/palette but NOT for RGB.
    with pytest.raises(ValueError, match="illegal bit depth"):
        decode_png(
            _SIGNATURE
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 4, 2, 0, 0, 0))
            + _chunk(b"IDAT", zlib.compress(b"\x00" * 8))
            + _chunk(b"IEND", b"")
        )

    # Truncated stream: compress the exact raw scanlines, then chop the
    # zlib end marker + adler32 off. decompress() still yields exactly
    # `expected` bytes, but eof never fires -> must be rejected.
    raw = b"".join(b"\x00" + bytes(2) for _ in range(2))  # 2x2 L, 8-bit
    full = zlib.compress(raw)
    truncated = full[:-5]
    d = zlib.decompressobj()
    assert d.decompress(truncated) == raw and not d.eof  # forgery premise
    bad = (
        _SIGNATURE
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
        + _chunk(b"IDAT", truncated)
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="IDAT length"):
        decode_png(bad)

    # The honest equivalents still decode.
    assert decode_png(encode_png(2, 2, bytes(4), mode="L")) == (2, 2, "L")

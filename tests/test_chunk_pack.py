"""Chunking and sequence packing invariants: coverage, overlap carry,
token conservation, and full bins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from certified_dogs_and_cats_spark.extensions.text import (
    chunk_tokens,
    pack_token_stream,
)


def test_chunks_cover_doc_with_overlap(spark):
    text = " ".join(f"t{i}" for i in range(100))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        chunk_tokens(df, "doc_id", "text", chunk_size=40, overlap=10).collect(),
        key=lambda r: r.chunk_idx,
    )
    # stride 30: candidate starts 1, 31, 61, 91 — but 91+overlap > 100,
    # so that trailing chunk would be a pure sub-span of chunk 3 (tokens
    # 91-100 are already covered by 61-100) and is suppressed.
    assert [r.token_start for r in rows] == [1, 31, 61]
    assert [r.n_tokens for r in rows] == [40, 40, 40]
    # overlap carry: last 10 tokens of chunk k = first 10 of chunk k+1
    for a, b in zip(rows, rows[1:]):
        assert a.chunk_text.split()[-10:] == b.chunk_text.split()[:10]
    # every token appears in at least one chunk
    seen = set()
    for r in rows:
        seen.update(r.chunk_text.split())
    assert len(seen) == 100


def test_chunk_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="overlap"):
        chunk_tokens(df, "doc_id", "text", chunk_size=8, overlap=8)


def test_packing_conserves_tokens_and_fills_bins(spark):
    rows = [(i, " ".join(f"w{j}" for j in range(7 + (i * 13) % 23)))
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    budget = 64
    packed = pack_token_stream(df, "doc_id", "text", budget=budget)
    per_doc = {
        r.doc_id: r.s
        for r in packed.groupBy("doc_id")
        .agg(F.sum("tokens_in_bin").alias("s"))
        .collect()
    }
    expected = {i: len(t.split()) for i, t in rows}
    assert per_doc == expected  # every token lands in exactly one bin
    per_bin = {
        r.bin_id: r.s
        for r in packed.groupBy("bin_id")
        .agg(F.sum("tokens_in_bin").alias("s"))
        .collect()
    }
    last = max(per_bin)
    total = sum(expected.values())
    for b, s in per_bin.items():
        assert s == (budget if b != last else total - budget * last)


def test_no_redundant_trailing_chunk(spark):
    """A doc whose size lands the last stride start within `overlap` of
    the end must NOT emit a chunk that is a pure sub-span of the prior
    chunk (duplicated training content)."""
    text = " ".join(f"t{i}" for i in range(64))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = chunk_tokens(
        df, "doc_id", "text", chunk_size=64, overlap=16
    ).collect()
    assert [r.token_start for r in rows] == [1]
    # Short docs still chunk (single chunk, never empty).
    tiny = spark.createDataFrame([(2, "a b c")], "doc_id long, text string")
    got = chunk_tokens(tiny, "doc_id", "text", chunk_size=64, overlap=16)
    assert [r.n_tokens for r in got.collect()] == [3]

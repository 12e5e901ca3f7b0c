"""Distributed BPE training: equivalence with a pure-Python reference
implementation (Sennrich-style), classic-corpus sanity, overlap
semantics, early stop, and tokenization round-trip."""

from __future__ import annotations

import pytest

from collections import Counter

from certified_dogs_and_cats_spark.extensions.bpe import (
    apply_bpe,
    train_bpe,
    word_histogram,
)


# --- pure-Python reference (the textbook algorithm) -----------------------


def ref_train(texts: list[str], n_merges: int, min_pair_count: int = 2):
    hist = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                hist[w] += 1
    words = {w: list(w) for w in hist}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += hist[w]
        if not pairs:
            break
        # max count, ties broken lexicographically (same rule as Spark).
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_pair_count:
            break
        merges.append((a, b))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def ref_apply(text: str, merges) -> list[str]:
    toks = []
    for w in text.split(" "):
        if not w:
            continue
        syms = list(w)
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        toks.extend(syms)
    return toks


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest widest",
    "widest widest low lower",
]


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id INT, text STRING"
    )


def test_training_matches_python_reference(spark):
    df = _docs(spark, CORPUS)
    got = train_bpe(df, "text", n_merges=12)
    want = ref_train(CORPUS, 12)
    assert got == want
    assert len(got) > 3  # the corpus supports a non-trivial merge table


def test_apply_matches_python_reference(spark):
    df = _docs(spark, CORPUS)
    merges = train_bpe(df, "text", n_merges=8)
    toks = {
        r.doc_id: list(r.tokens)
        for r in apply_bpe(df, "doc_id", "text", merges).collect()
    }
    for i, t in enumerate(CORPUS):
        assert toks[i] == ref_apply(t, merges), f"doc {i}"


def test_overlapping_pair_greedy_semantics(spark):
    df = _docs(spark, ["aaaa aaaa aaaa"])
    merges = train_bpe(df, "text", n_merges=1, min_pair_count=1)
    assert merges == [("a", "a")]
    toks = apply_bpe(df, "doc_id", "text", merges).collect()[0].tokens
    # greedy left-to-right: 'aaaa' -> aa, aa (never a, aa, a)
    assert list(toks) == ["aa", "aa"] * 3


def test_early_stop_below_min_pair_count(spark):
    # Every adjacent pair occurs exactly once: nothing reaches the floor.
    df = _docs(spark, ["abc def"])
    assert train_bpe(df, "text", n_merges=5, min_pair_count=2) == []


def test_word_histogram_shapes(spark):
    df = _docs(spark, ["a bb a", "bb  a"])
    rows = {
        "".join(r.symbols): r.n for r in word_histogram(df, "text").collect()
    }
    assert rows == {"a": 3, "bb": 2}


def test_checkpointed_training_is_identical(spark):
    df = _docs(spark, CORPUS)
    assert train_bpe(df, "text", n_merges=10, checkpoint_every=2) == train_bpe(
        df, "text", n_merges=10, checkpoint_every=100
    )


def test_apply_replace_matches_fold(spark):
    """apply_bpe_replace (nested-string-replace replay, r12) is
    bit-identical to apply_bpe's per-word fold on charset-valid input —
    including overlap greediness, empty-word drops, and word-boundary
    isolation."""
    from certified_dogs_and_cats_spark.extensions.bpe import apply_bpe_replace

    corpus = CORPUS + ["aaaa aaaa  aaaa", "  padded   words  ", "x"]
    df = _docs(spark, corpus)
    merges = train_bpe(df, "text", n_merges=8)
    fold = {
        r.doc_id: list(r.tokens)
        for r in apply_bpe(df, "doc_id", "text", merges).collect()
    }
    rep = {
        r.doc_id: list(r.tokens)
        for r in apply_bpe_replace(df, "doc_id", "text", merges).collect()
    }
    assert rep == fold


def test_apply_replace_rejects_delimiter_charset(spark):
    from certified_dogs_and_cats_spark.extensions.bpe import apply_bpe_replace

    df = _docs(spark, ["ab ab"])
    with pytest.raises(ValueError, match="charset contract"):
        apply_bpe_replace(df, "doc_id", "text", [("a", "|")])
    with pytest.raises(ValueError, match="charset contract"):
        apply_bpe_replace(df, "doc_id", "text", [("a b", "c")])

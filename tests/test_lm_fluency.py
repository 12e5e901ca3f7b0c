"""Bigram LM fluency scoring (extensions/text.py:bigram_fluency)."""

from __future__ import annotations

from certified_dogs_and_cats_spark.extensions.text import bigram_fluency


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


def test_hand_computed_scores(spark):
    # Corpus: C(a,b)=2, C(b,a)=1; contexts C(a)=2, C(b)=1; V=2.
    df = _docs(spark, [(1, "a b"), (2, "a b"), (3, "b a")])
    got = {
        r["doc_id"]: (r["n_bigrams"], r["fluency"])
        for r in bigram_fluency(df, "doc_id", "text").collect()
    }
    assert got[1] == (1, round((2 + 1) / (2 + 2), 6))   # 0.75
    assert got[2] == got[1]
    assert got[3] == (1, round((1 + 1) / (1 + 2), 6))   # 0.666667


def test_common_transitions_outscore_rare_ones(spark):
    # Nine fluent docs repeat the same transition; the shuffled doc's
    # transitions are each seen once -> strictly lower score.
    rows = [(i, "the cat sat") for i in range(9)] + [(99, "sat the cat")]
    out = {
        r["doc_id"]: r["fluency"]
        for r in bigram_fluency(_docs(spark, rows), "doc_id", "text").collect()
    }
    assert out[99] < out[0]


def test_short_and_null_docs_drop(spark):
    df = _docs(spark, [(1, "a b"), (2, "solo"), (3, None), (4, "")])
    ids = {
        r["doc_id"] for r in bigram_fluency(df, "doc_id", "text").collect()
    }
    assert ids == {1}


def test_score_bounded_in_unit_interval(spark):
    rows = [(i, f"w{i} w{(i * 7) % 5} w{(i * 3) % 4}") for i in range(30)]
    for r in bigram_fluency(_docs(spark, rows), "doc_id", "text").collect():
        assert 0.0 < r["fluency"] <= 1.0

"""Linear classifier inference: python-reference equality, OOV/bias
behavior, normalization, and the broadcast plan shape."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from certified_dogs_and_cats_spark.extensions.classify import (
    feature_bucket,
    hashed_features,
    score_linear,
)

N_BUCKETS = 1 << 18


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id INT, text STRING"
    )


def _bucket_of(spark, tok):
    return (
        spark.range(1)
        .select(feature_bucket(F.lit(tok), N_BUCKETS).alias("b"))
        .collect()[0]
        .b
    )


def _weights(spark, vocab_weights):
    rows = [
        (_bucket_of(spark, tok), w) for tok, w in vocab_weights.items()
    ]
    return spark.createDataFrame(rows, "bucket INT, weight DOUBLE")


def test_scores_match_python_reference(spark):
    vocab = {"good": 2.0, "great": 1.5, "bad": -2.0, "the": 0.1}
    texts = [
        "the good good movie",
        "bad bad bad",
        "great",
        "unseen words only",
    ]
    out = {
        r.doc_id: (r.score, r.prob)
        for r in score_linear(
            _docs(spark, texts),
            _weights(spark, vocab),
            "doc_id",
            "text",
            bias=0.25,
            n_buckets=N_BUCKETS,
        ).collect()
    }
    for i, t in enumerate(texts):
        toks = [w for w in t.split(" ") if w]
        dot = sum(vocab.get(w, 0.0) for w in toks)
        want = 0.25 + dot / len(toks)
        got_score, got_prob = out[i]
        assert abs(got_score - want) < 1e-9, (i, t)
        assert abs(got_prob - 1 / (1 + math.exp(-want))) < 1e-9


def test_unnormalized_and_empty_doc(spark):
    vocab = {"x": 1.0}
    df = _docs(spark, ["x x x", ""])
    out = {
        r.doc_id: r.score
        for r in score_linear(
            df,
            _weights(spark, vocab),
            "doc_id",
            "text",
            bias=0.5,
            n_buckets=N_BUCKETS,
            normalize=False,
        ).collect()
    }
    assert abs(out[0] - 3.5) < 1e-9  # 0.5 + 3 * 1.0, no length division
    assert abs(out[1] - 0.5) < 1e-9  # token-free doc scores bias-only


def test_hashed_features_counts(spark):
    df = _docs(spark, ["a b a", "b"])
    feats = hashed_features(df, "doc_id", "text", n_buckets=N_BUCKETS)
    a, b = _bucket_of(spark, "a"), _bucket_of(spark, "b")
    got = {(r.doc_id, r.bucket): r.tf for r in feats.collect()}
    assert got == {(0, a): 2, (0, b): 1, (1, b): 1}


def test_weights_join_is_broadcast(spark):
    from certified_dogs_and_cats_spark.plans import assert_broadcast_join

    df = _docs(spark, ["a b", "c"])
    assert_broadcast_join(
        score_linear(
            df, _weights(spark, {"a": 1.0}), "doc_id", "text"
        )
    )

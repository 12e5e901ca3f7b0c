"""Round-12 queries: dedup strategy-agreement matrix and nDCG@10
ranking evaluation — structural invariants plus handcrafted-corpus
sharp values (the registry's DuckDB gate pins the full fixture)."""

from __future__ import annotations

import math
import os

from pyspark.sql import functions as F


def _mini_corpus(spark, tmp_path, rows):
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        [
            (i, text, "en", "src", len(text))
            for i, text in enumerate(rows, start=1)
        ],
        "doc_id long, text string, lang string, source string, n_chars int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    return sf


def test_strategy_agreement_matrix_shape_and_bounds(spark, tmp_path):
    """An identical-text duplicate is found by EVERY strategy (jaccard 1,
    hamming 0), so all three pairwise agreements have n_common >= 1; the
    matrix is complete (3 strategy pairs) and every ratio is a valid
    Jaccard."""
    from certified_dogs_and_cats_spark.queries.roundtwelve import (
        dedup_strategy_agreement,
    )

    base = "the quick brown fox jumps over the lazy dog " * 4
    sf = _mini_corpus(
        spark,
        tmp_path,
        [
            base,
            base,  # exact duplicate of doc 1
            base.replace("lazy", "sleepy"),  # near-dup of 1/2
            "completely different tokens about spark shuffles and joins",
        ],
    )
    got = {
        (r.strategy_a, r.strategy_b): r
        for r in dedup_strategy_agreement(spark, sf).collect()
    }
    assert set(got) == {
        ("exact", "jaccard"),
        ("exact", "simhash"),
        ("jaccard", "simhash"),
    }
    for r in got.values():
        assert r.n_common <= min(r.n_a, r.n_b)
        assert 0.0 <= r.agreement <= 1.0
        assert r.n_common >= 1  # the identical pair is in every set
    # exact found exactly the identical pair
    assert got[("exact", "jaccard")].n_a == 1


def test_ndcg_perfect_ranking_is_exactly_one(spark, tmp_path):
    """One document contains every query term and tops both rankers;
    with it as the single relevant doc, nDCG@10 == 1.0 exactly for both
    (discount at rank 1 is the literal 1.0 both engines inline)."""
    from certified_dogs_and_cats_spark.queries.roundtwelve import (
        retrieval_ndcg_eval,
    )

    sf = _mini_corpus(
        spark,
        tmp_path,
        [
            "join hash window",  # all three terms, dl 3 -> tops tf_norm too
            "join alpha beta gamma delta epsilon zeta",
            "hash alpha beta gamma delta epsilon zeta",
            "window alpha beta gamma delta epsilon zeta",
            "nothing relevant here at all",
        ],
    )
    rows = {r.ranker: r for r in retrieval_ndcg_eval(spark, sf).collect()}
    assert set(rows) == {"bm25", "tf_norm"}
    for r in rows.values():
        assert r.n_relevant == 1
        assert r.dcg == 1.0
        assert r.ndcg == 1.0


def test_ndcg_discount_literals_match_math(spark):
    """The inlined discount/IDCG literals are the exact Python log2
    values (the determinism contract: no engine libm call)."""
    from certified_dogs_and_cats_spark.queries.roundtwelve import (
        _DISCOUNTS,
        _IDCG,
        NDCG_K,
    )

    assert len(_DISCOUNTS) == len(_IDCG) == NDCG_K
    assert _DISCOUNTS[0] == 1.0
    for i, d in enumerate(_DISCOUNTS, start=1):
        assert d == 1.0 / math.log2(i + 1)
    acc = 0.0
    for r, v in enumerate(_IDCG, start=1):
        acc += _DISCOUNTS[r - 1]
        assert v == acc


def test_ndcg_imperfect_ranking_below_one(spark, tmp_path):
    """Two relevant docs, one buried below an irrelevant-but-scoring doc
    for tf_norm: nDCG reflects the burial (< 1) while staying in (0, 1];
    bm25 (idf-weighted) must score >= the naive baseline here."""
    from certified_dogs_and_cats_spark.queries.roundtwelve import (
        retrieval_ndcg_eval,
    )

    sf = _mini_corpus(
        spark,
        tmp_path,
        [
            "join hash window padded with many extra tokens here today "
            "and even more filler words to dilute term frequency",
            "join join join join",  # hits only 'join', dense -> tf_norm bait
            "join hash window",  # relevant, compact
            "hash hash hash hash",
            "window window window",
        ],
    )
    rows = {r.ranker: r for r in retrieval_ndcg_eval(spark, sf).collect()}
    assert rows["bm25"].n_relevant == 2
    for r in rows.values():
        assert 0.0 < r.ndcg <= 1.0
    assert rows["bm25"].ndcg >= rows["tf_norm"].ndcg

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


def test_cms_never_undercounts_and_ranks(spark, tmp_path):
    """A handcrafted zipf-ish corpus: the heavy hitter is unambiguous,
    every estimate is >= its exact count (the CMS one-sided guarantee),
    and ranks are the exact-count ranking."""
    from certified_dogs_and_cats_spark.queries.roundtwelve import (
        cms_heavy_hitters,
    )

    sf = _mini_corpus(
        spark,
        tmp_path,
        [
            "alpha alpha alpha alpha alpha beta beta gamma",
            "alpha alpha beta delta epsilon",
            "alpha zeta eta theta",
        ],
    )
    rows = sorted(cms_heavy_hitters(spark, sf).collect(), key=lambda r: r.rnk)
    assert rows[0].tok == "alpha" and rows[0].exact_tf == 8
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        assert r.never_undercounts
        assert r.cms_est >= r.exact_tf
        assert r.overcount == r.cms_est - r.exact_tf
        assert r.overcount_frac >= 0.0


def _mini_embeddings(spark, tmp_path, rows):
    sf = str(tmp_path / "sfe")
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        [(i, [float(x) for x in vec], 0) for i, vec in rows],
        "vec_id long, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{sf}/embeddings.parquet"
    )
    return sf


def test_matryoshka_full_dim_anchor_and_prefix_degradation(spark, tmp_path):
    """The last sweep point (full dim) has recall 1.0 by construction.
    A corpus whose first 8 dims are IDENTICAL across candidates while
    the tail separates them gives the 8-dim prefix no signal — its
    ranking falls back to the id tie-break, and recall@8 < 1 because
    the tail-defined true neighbors aren't the lowest ids."""
    from certified_dogs_and_cats_spark.queries.roundtwelve import (
        MAT_DIMS,
        MAT_K,
        matryoshka_recall_sweep,
    )

    def vec(tail_pos, mag):
        # First 8 dims constant; one distinguishing coordinate later.
        v = [1.0] * 8 + [0.0] * 56
        v[8 + tail_pos] = mag
        return v

    rows = [(100, vec(0, 9.0)), (200, vec(5, 9.0))]
    # Neighbors: ids 1..10; the HIGH ids are the true neighbors of 100
    # (same tail direction), so the id tie-break at dim 8 misses them.
    rows += [(i, vec(3, 5.0)) for i in range(1, 6)]
    rows += [(i, vec(0, 5.0 + i)) for i in range(6, 11)]
    sf = _mini_embeddings(spark, tmp_path, rows)
    got = {r.dim: r for r in matryoshka_recall_sweep(spark, sf).collect()}
    assert set(got) == set(MAT_DIMS)
    full = got[MAT_DIMS[-1]]
    assert full.recall == 1.0 and full.hits == full.gt_pairs
    n_queries = 2
    assert full.gt_pairs == n_queries * MAT_K
    for r in got.values():
        assert 0.0 <= r.recall <= 1.0
        assert r.k == MAT_K and r.hits <= r.gt_pairs
    assert got[8].recall < 1.0


def test_matryoshka_partial_topk_plan_pin(spark):
    """The long-form (query, dim) rank is k-pruned map-side: a
    Partial-mode WindowGroupLimit sits below the rank exchange
    (InferWindowGroupLimit), so each input partition forwards <= k rows
    per (query, dim) instead of the full N*|Q|*|dims| scored stream.
    Asserted on the pre-checkpoint frame — the checkpoint truncates the
    executed plan."""
    from certified_dogs_and_cats_spark.plans import (
        assert_partial_topk_below_shuffle,
    )
    from certified_dogs_and_cats_spark.queries.roundtwelve import (
        MAT_K,
        _mat_pairs,
        _mat_topk,
    )

    frame = _mat_topk(_mat_pairs(spark, "/root/testdata/sf0.001"))
    assert_partial_topk_below_shuffle(frame, MAT_K)

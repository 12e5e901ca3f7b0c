"""Edge cases for the round-6 retrieval/profile operators: BM25 scoring,
hybrid rerank, Gini concentration, quality funnel. The happy paths are
oracle-checked (scripts/check_correctness.py); these pin the degenerate
inputs an oracle fixture can't reach."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars INT"
    )


def test_bm25_no_hits_returns_empty(spark, tmp_path, monkeypatch):
    """A corpus containing none of the query terms produces an EMPTY
    result — not a divide-by-zero or a row of nulls."""
    from certified_dogs_and_cats_spark.queries import terms as terms_mod

    df = _docs(spark, [(1, "alpha beta", "en", "s", 10),
                       (2, "gamma delta", "en", "s", 11)])
    monkeypatch.setattr(terms_mod, "t", lambda _s, _d, _n: df)
    out = terms_mod.bm25_topk(spark, "unused")
    assert out.count() == 0


def test_bm25_single_hit_doc_scores_and_ranks(spark, monkeypatch):
    from certified_dogs_and_cats_spark.queries import terms as terms_mod

    df = _docs(spark, [(1, "join the club", "en", "s", 13),
                       (2, "nothing here", "en", "s", 12)])
    monkeypatch.setattr(terms_mod, "t", lambda _s, _d, _n: df)
    rows = terms_mod.bm25_topk(spark, "unused").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_id, r.n_terms_hit, r.rnk) == (1, 1, 1)
    assert r.score > 0


def test_gini_single_source_is_zero(spark, monkeypatch):
    from certified_dogs_and_cats_spark.queries import terms as terms_mod

    df = _docs(spark, [(1, "a b c", "en", "only", 5),
                       (2, "d e", "en", "only", 3)])
    monkeypatch.setattr(terms_mod, "t", lambda _s, _d, _n: df)
    r = terms_mod.token_gini_by_source(spark, "unused").collect()[0]
    assert (r.n_sources, r.total_tokens, r.gini) == (1, 5, 0.0)


def test_gini_total_concentration_approaches_one(spark, monkeypatch):
    """One source holding ~all token mass drives gini toward (n-1)/n."""
    from certified_dogs_and_cats_spark.queries import terms as terms_mod

    rows = [(1, " ".join(["x"] * 1000), "en", "big", 1000)]
    rows += [(10 + i, "y", "en", f"tiny{i}", 1) for i in range(9)]
    df = _docs(spark, rows)
    monkeypatch.setattr(terms_mod, "t", lambda _s, _d, _n: df)
    r = terms_mod.token_gini_by_source(spark, "unused").collect()[0]
    assert r.n_sources == 10
    assert r.gini > 0.85  # (n-1)/n = 0.9 minus the tiny sources' mass


def test_quality_funnel_survivors_monotone(spark, monkeypatch):
    from certified_dogs_and_cats_spark.queries import quality as qmod

    rows = [
        (1, " ".join(f"w{i}" for i in range(40)), "en", "s", 200),
        (2, "short", "en", "s", 5),                      # fails min_chars
        (3, " ".join(f"v{i}" for i in range(40)), "zh", "s", 200),  # lang
        (4, " ".join(["spam"] * 40), "en", "s", 200),    # dominance
    ]
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars INT"
    )
    monkeypatch.setattr(qmod, "t", lambda _s, _d, _n: df)
    out = {r.stage: r for r in qmod.quality_gate_funnel(spark, "unused").collect()}
    surv = [out[i].survivors for i in range(4)]
    assert surv == [4, 3, 2, 1]
    assert [out[i].dropped_total for i in range(4)] == [0, 1, 2, 3]
    assert surv == sorted(surv, reverse=True)

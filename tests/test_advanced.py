"""Degenerate-input pins for the round-7 advanced queries — shapes the
oracle fixtures can't reach (first-event purchases, exact half-weight
medians, boundary-day intervals, constant CUSUM series, shingle-free eval
docs, identical/orthogonal centroids). Happy paths are oracle-checked by
scripts/check_correctness.py."""

from __future__ import annotations

import datetime as dt

import pytest

from certified_dogs_and_cats_spark.queries import advanced as adv


def _events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
        " event_type STRING, value DOUBLE, props STRING",
    )


def _docs(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id BIGINT, text STRING, lang STRING, source STRING,"
        " n_chars BIGINT",
    )


def test_attribution_first_event_purchase_is_none(spark, monkeypatch):
    """A purchase with NO preceding event credits 'none'; a later purchase
    credits the latest preceding NON-purchase even when another purchase
    sits in between (purchases never self-attribute)."""
    t0 = dt.datetime(2024, 1, 1)

    def step(s):
        return t0 + dt.timedelta(minutes=s)

    rows = [
        (1, step(0), 7, "purchase", 10.0, "{}"),   # first event: none
        (2, step(1), 7, "view", 0.0, "{}"),
        (3, step(2), 7, "purchase", 20.0, "{}"),   # -> view
        (4, step(3), 7, "purchase", 30.0, "{}"),   # still -> view
        (5, step(4), 8, "click", 0.0, "{}"),
        (6, step(5), 8, "error", 0.0, "{}"),
        (7, step(6), 8, "purchase", 5.0, "{}"),    # -> error (latest)
    ]
    monkeypatch.setattr(adv, "t", lambda *_: _events(spark, rows))
    got = {
        r.channel: (r.n_purchases, r.attributed_value)
        for r in adv.attribution_last_touch(spark, "unused").collect()
    }
    assert got == {
        "none": (1, 10.0),
        "view": (2, 50.0),
        "error": (1, 5.0),
    }


def test_grouping_sets_four_strata_and_gid_bits(spark, monkeypatch):
    """One order fans into exactly 4 output rows — detail (gid 0),
    year subtotal (gid 1: status grouped away), status subtotal (gid 2),
    grand total (gid 3) — with sentinel keys on the grouped-away cols."""
    orders = spark.createDataFrame(
        [(1, 10, "O", 100.0, dt.datetime(2024, 3, 1), "1-URGENT")],
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,"
        " o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING",
    )
    monkeypatch.setattr(adv, "t", lambda *_: orders)
    rows = {
        (r.o_year, r.o_orderstatus): (r.gid, r.n_orders, r.revenue)
        for r in adv.grouping_sets_revenue(spark, "unused").collect()
    }
    assert rows == {
        (2024, "O"): (0, 1, 100.0),
        (2024, "ALL"): (1, 1, 100.0),
        (-1, "O"): (2, 1, 100.0),
        (-1, "ALL"): (3, 1, 100.0),
    }


def test_weighted_median_half_weight_boundary_takes_lower(spark, monkeypatch):
    """With equal weights on two prices, 2*cum == total exactly at the
    lower price — the DISC rule selects it (never interpolates); a heavy
    weight on the high price pulls the median up to that input value."""
    li = spark.createDataFrame(
        [
            # flag A: w=1 @10, w=1 @20 -> boundary -> 10
            (1, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "A", "O", dt.datetime(2024, 1, 1)),
            (1, 1, 1, 2, 1.0, 20.0, 0.0, 0.0, "A", "O", dt.datetime(2024, 1, 1)),
            # flag B: w=1 @10, w=9 @20 -> median 20
            (2, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "B", "O", dt.datetime(2024, 1, 1)),
            (2, 1, 1, 2, 9.0, 20.0, 0.0, 0.0, "B", "O", dt.datetime(2024, 1, 1)),
        ],
        "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT,"
        " l_linenumber INTEGER, l_quantity DOUBLE, l_extendedprice DOUBLE,"
        " l_discount DOUBLE, l_tax DOUBLE, l_returnflag STRING,"
        " l_linestatus STRING, l_shipdate TIMESTAMP",
    )
    monkeypatch.setattr(adv, "t", lambda *_: li)
    got = {
        r.flag: (r.weighted_median_price, r.total_weight)
        for r in adv.weighted_median_price(spark, "unused").collect()
    }
    assert got == {"A": (10.0, 2), "B": (20.0, 10)}


def test_concurrent_orders_inclusive_ship_day_and_cross_month(
    spark, monkeypatch
):
    """An order is open THROUGH its last ship date (-1 lands the day
    after), and an order spanning a month boundary raises the peak of
    both months."""
    orders = spark.createDataFrame(
        [
            (1, 1, "O", 1.0, dt.datetime(2024, 1, 30), "p"),
            (2, 1, "O", 1.0, dt.datetime(2024, 1, 31), "p"),
        ],
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,"
        " o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING",
    )
    li = spark.createDataFrame(
        [
            (1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "A", "O",
             dt.datetime(2024, 2, 2)),
            (2, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "A", "O",
             dt.datetime(2024, 1, 31)),
        ],
        "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT,"
        " l_linenumber INTEGER, l_quantity DOUBLE, l_extendedprice DOUBLE,"
        " l_discount DOUBLE, l_tax DOUBLE, l_returnflag STRING,"
        " l_linestatus STRING, l_shipdate TIMESTAMP",
    )
    tables = {"orders": orders, "lineitem": li}
    monkeypatch.setattr(adv, "t", lambda _s, _d, name: tables[name])
    got = {
        (r.o_year, r.o_month): r.peak_open
        for r in adv.concurrent_orders_peak(spark, "unused").collect()
    }
    # Jan 31: both orders open -> peak 2. Feb 1-2: only order 1 open
    # (order 2 shipped Jan 31, closes Feb 1... inclusive through ship day
    # means its -1 delta lands Feb 1) -> Feb peak 1.
    assert got[(2024, 1)] == 2
    assert got[(2024, 2)] == 1


def test_cusum_constant_series_ties_to_earliest_day(spark, monkeypatch):
    """A constant daily series has S_i == 0 everywhere — the tie-break
    pins the earliest day; a step series flags the last day of the old
    level (where |S| peaks)."""
    orders = spark.createDataFrame(
        [
            # year 2024: constant 10.00/day over 3 days
            (1, 1, "O", 10.0, dt.datetime(2024, 1, 1), "p"),
            (2, 1, "O", 10.0, dt.datetime(2024, 1, 2), "p"),
            (3, 1, "O", 10.0, dt.datetime(2024, 1, 3), "p"),
            # year 2025: 10, 10, 40, 40 -> mean 25; |S| peaks at day 2
            (4, 1, "O", 10.0, dt.datetime(2025, 1, 1), "p"),
            (5, 1, "O", 10.0, dt.datetime(2025, 1, 2), "p"),
            (6, 1, "O", 40.0, dt.datetime(2025, 1, 3), "p"),
            (7, 1, "O", 40.0, dt.datetime(2025, 1, 4), "p"),
        ],
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,"
        " o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING",
    )
    monkeypatch.setattr(adv, "t", lambda *_: orders)
    got = {
        r.o_year: (r.change_day, r.cusum_cents)
        for r in adv.cusum_changepoint(spark, "unused").collect()
    }
    assert got[2024] == (dt.date(2024, 1, 1), 0.0)
    assert got[2025][0] == dt.date(2025, 1, 2)
    # S_2 = (1000 + 1000) - 2*2500 = -3000 cents
    assert got[2025][1] == pytest.approx(-3000.0)


def test_contamination_short_eval_doc_never_contaminated(spark, monkeypatch):
    """An eval doc with < 5 tokens yields no shingles — counted in
    n_eval, never in n_contaminated; a verbatim train copy is flagged.
    (ids 2/9/10 hash into the eval decile — md5 first-8-hex % 100 gives
    5/6/0; id 3 gives 10, train.)"""
    rows = [
        (2, "a b c d e f", "en", "srcA", 11),           # eval, contaminated
        (9, "tiny doc", "en", "srcA", 8),               # eval, shingle-free
        (3, "a b c d e f and extra words", "en", "srcB", 27),  # train
        (10, "unrelated text entirely different words here", "en",
         "srcB", 45),                                   # eval srcB, clean
    ]
    monkeypatch.setattr(adv, "t", lambda *_: _docs(spark, rows))
    got = {
        r.source: (r.n_eval, r.n_contaminated, r.contamination_rate)
        for r in adv.split_contamination_ngrams(spark, "unused").collect()
    }
    assert got["srcA"] == (2, 1, 0.5)
    assert got["srcB"] == (1, 0, 0.0)


def test_centroid_similarity_identical_and_orthogonal(spark, monkeypatch):
    """Two labels with identical centroids score 1.0; orthogonal
    centroids score 0.0 — and averaging is exact (integer-scaled sums),
    so 1.0 is exact, not approximately-1."""
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [3.0, 0.0], 0),   # centroid (2, 0)
            (3, [2.0, 0.0], 1),   # centroid (2, 0) == label 0's
            (4, [0.0, 5.0], 2),   # centroid (0, 5): orthogonal
        ],
        "vec_id BIGINT, embedding ARRAY<FLOAT>, label INTEGER",
    )
    monkeypatch.setattr(adv, "t", lambda *_: emb)
    got = {
        (r.label_a, r.label_b): r.cos_sim
        for r in adv.label_centroid_similarity(spark, "unused").collect()
    }
    assert got[(0, 1)] == 1.0
    assert got[(0, 2)] == 0.0
    assert got[(1, 2)] == 0.0


def test_cohort_ltv_accumulates_and_uses_first_touch_week(
    spark, monkeypatch
):
    """Cohort week comes from the user's FIRST event (any type), and
    revenue accumulates across week offsets within the cohort."""
    t0 = dt.datetime(2024, 1, 1)  # a Monday
    rows = [
        (1, t0, 7, "view", 0.0, "{}"),                     # cohort wk0
        (2, t0 + dt.timedelta(days=2), 7, "purchase", 10.0, "{}"),  # off 0
        (3, t0 + dt.timedelta(days=8), 7, "purchase", 5.0, "{}"),   # off 1
        (4, t0 + dt.timedelta(days=15), 7, "purchase", 1.0, "{}"),  # off 2
    ]
    monkeypatch.setattr(adv, "t", lambda *_: _events(spark, rows))
    got = {
        r.week_offset: (r.n_purchases, r.cum_revenue)
        for r in adv.cohort_ltv_curve(spark, "unused").collect()
    }
    assert got == {0: (1, 10.0), 1: (1, 15.0), 2: (1, 16.0)}


def test_column_profile_counts_nulls_and_exact_ndv(spark, monkeypatch):
    orders = spark.createDataFrame(
        [
            (1, 10, "O", 5.0, dt.datetime(2024, 1, 1), None),
            (2, 10, None, 5.0, dt.datetime(2024, 1, 1), "P1"),
            (3, 20, "F", 7.0, dt.datetime(2024, 1, 2), "P1"),
        ],
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,"
        " o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING",
    )
    monkeypatch.setattr(adv, "t", lambda *_: orders)
    got = {
        r.column_name: (r.n_nulls, r.n_distinct)
        for r in adv.column_profile_orders(spark, "unused").collect()
    }
    assert got["o_orderkey"] == (0, 3)
    assert got["o_custkey"] == (0, 2)
    assert got["o_orderstatus"] == (1, 2)
    assert got["o_totalprice"] == (0, 2)
    assert got["o_orderpriority"] == (1, 1)


def test_flesch_sentence_floor_and_integer_sums(spark, monkeypatch):
    """A doc with no terminal punctuation counts as ONE sentence; the
    score derives from per-source integer sums (here exactly checkable
    by hand)."""
    rows = [
        # 4 words, 1 sentence (floored), syllable groups: he-llo->2? No:
        # vowel GROUPS: "go to the zoo" -> o,o,e,oo = 4 groups
        (1, "go to the zoo", "en", "s", 13),
    ]
    monkeypatch.setattr(adv, "t", lambda *_: _docs(spark, rows))
    r = adv.flesch_reading_scores(spark, "unused").collect()[0]
    assert (r.n_docs, r.total_words) == (1, 4)
    assert r.flesch_score == pytest.approx(
        206.835 - 1.015 * (4 / 1) - 84.6 * (4 / 4)
    )


def test_repeat_purchase_single_order_customer_excluded(spark, monkeypatch):
    """A one-order customer produces no gap; 6-day gaps land in bucket 0
    and exactly-7-day gaps in bucket 1."""
    orders = spark.createDataFrame(
        [
            (1, 1, "O", 1.0, dt.datetime(2024, 1, 1), "p"),   # single
            (2, 2, "O", 1.0, dt.datetime(2024, 1, 1), "p"),
            (3, 2, "O", 1.0, dt.datetime(2024, 1, 7), "p"),   # gap 6 -> b0
            (4, 2, "O", 1.0, dt.datetime(2024, 1, 14), "p"),  # gap 7 -> b1
        ],
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,"
        " o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING",
    )
    monkeypatch.setattr(adv, "t", lambda *_: orders)
    got = {
        r.gap_week_bucket: r.n_gaps
        for r in adv.repeat_purchase_latency(spark, "unused").collect()
    }
    assert got == {0: 1, 1: 1}


def test_knn_vote_tie_breaks_to_smaller_label(spark, monkeypatch):
    """All-identical vectors force cosine ties, so top-5 = lowest
    neighbor ids; their labels [1,1,2,2,3] tie 1-vs-2 and the vote
    breaks to label 1 == the query's true label -> accuracy 1.0."""
    vec = [1.0, 0.0]
    emb = spark.createDataFrame(
        [
            (0, vec, 1),   # query (vec_id % 100 == 0)
            (1, vec, 1),
            (2, vec, 1),
            (3, vec, 2),
            (4, vec, 2),
            (5, vec, 3),
            (6, vec, 9),   # outside top-5 by id tie-break
        ],
        "vec_id BIGINT, embedding ARRAY<FLOAT>, label INTEGER",
    )
    monkeypatch.setattr(adv, "t", lambda *_: emb)
    # knn_label_accuracy reads its exact top-k through the SHARED memo
    # (queries.similarity.exact_topk_memo), whose builder loads the
    # embeddings via queries.similarity's own table loader — patch that
    # too, and key the memo uniquely so the fabricated fixture can never
    # be read back by another test's (sf_dir, k, pred) lookup.
    from certified_dogs_and_cats_spark.queries import similarity as sim

    monkeypatch.setattr(sim, "t", lambda *_: emb)
    r = adv.knn_label_accuracy(spark, "unused-knn-tie").collect()[0]
    assert (r.n_queries, r.n_correct, r.accuracy) == (1, 1, 1.0)


def test_centroid_zero_norm_label_excluded(spark, monkeypatch):
    """A label whose components cancel to the zero centroid is excluded
    from every pair (the division guard) instead of emitting NaN."""
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [-1.0, 0.0], 0),   # label 0 centroid == (0, 0)
            (3, [1.0, 0.0], 1),
            (4, [0.0, 1.0], 2),
        ],
        "vec_id BIGINT, embedding ARRAY<FLOAT>, label INTEGER",
    )
    monkeypatch.setattr(adv, "t", lambda *_: emb)
    got = {
        (r.label_a, r.label_b): r.cos_sim
        for r in adv.label_centroid_similarity(spark, "unused").collect()
    }
    assert got == {(1, 2): 0.0}


def test_ngram_novelty_first_appearance_decile(spark, monkeypatch):
    """A shingle repeated later still counts only in the decile of its
    FIRST appearance; a shingle unique to the last doc lands in the top
    decile."""
    rows = [
        (0, "x y z", "en", "s", 5),      # shingle A first at doc 0
        (5, "x y z", "en", "s", 5),      # repeat of A: not novel
        (9, "p q r", "en", "s", 5),      # shingle B first at doc 9
    ]
    monkeypatch.setattr(adv, "t", lambda *_: _docs(spark, rows))
    # bypass the process-wide memo (keyed on sf_dir, which is fake here)
    import certified_dogs_and_cats_spark.queries.dedup as qd
    from certified_dogs_and_cats_spark.extensions.dedup import word_shingles

    monkeypatch.setattr(
        qd, "shingles3",
        lambda spark_, sf_: word_shingles(
            _docs(spark, rows), "doc_id", "text", n=3, as_hash=True
        ),
    )
    got = {
        r.corpus_decile: r.n_novel_shingles
        for r in adv.ngram_novelty_curve(spark, "unused").collect()
    }
    # max doc_id 9 -> decile = first_doc * 10 div 10 = first_doc
    assert got == {0: 1, 9: 1}


def test_threshold_sweep_bands_exact_and_noise(spark, monkeypatch):
    """Exact duplicate docs land in band 10 (jaccard == 1.0); docs
    sharing one of many shingles land in a low band."""
    rows = [
        (1, "a b c d e", "en", "s", 9),      # 3 shingles
        (2, "a b c d e", "en", "s", 9),      # exact dup of 1 -> band 10
        (3, "a b c x y z w", "en", "s", 13), # shares 1 of 5 w/ doc 1,2
    ]
    import certified_dogs_and_cats_spark.queries.dedup as qd
    from certified_dogs_and_cats_spark.extensions.dedup import word_shingles

    monkeypatch.setattr(
        qd, "shingles3",
        lambda spark_, sf_: word_shingles(
            _docs(spark, rows), "doc_id", "text", n=3, as_hash=True
        ),
    )
    got = {
        r.jaccard_band: r.n_pairs
        for r in adv.dedup_threshold_sweep(spark, "unused").collect()
    }
    # (1,2): jac 1.0 -> band 10. (1,3)/(2,3): inter 1, union 3+5-1=7 ->
    # jac ~0.142 -> band 1.
    assert got == {10: 1, 1: 2}


def test_flesch_null_text_counts_as_empty(spark, monkeypatch):
    """NULL text coalesces to '' (1 empty token, 1 floored sentence, 0
    syllables) instead of threading engine-specific NULL semantics."""
    rows = [
        (1, None, "en", "s", 0),
        (2, "go to the zoo", "en", "s", 13),
    ]
    monkeypatch.setattr(adv, "t", lambda *_: _docs(spark, rows))
    r = adv.flesch_reading_scores(spark, "unused").collect()[0]
    # sums: w = 1 + 4, snt = 1 + 1, syl = 0 + 4
    assert (r.n_docs, r.total_words) == (2, 5)
    assert r.flesch_score == pytest.approx(
        206.835 - 1.015 * (5 / 2) - 84.6 * (4 / 5)
    )


def test_pareto_crossing_is_exact_integer(spark, monkeypatch):
    """Revenue 80/20 crossing uses 5*cum >= 4*tot in exact integers:
    with suppliers at 80/10/10 the FIRST supplier alone crosses exactly
    (5*80 == 4*100); ranking ties break by suppkey."""
    li = spark.createDataFrame(
        [
            (1, 1, 10, 1, 1.0, 80.0, 0.0, 0.0, "A", "O",
             dt.datetime(2024, 1, 1)),
            (2, 1, 20, 1, 1.0, 10.0, 0.0, 0.0, "A", "O",
             dt.datetime(2024, 1, 1)),
            (3, 1, 30, 1, 1.0, 10.0, 0.0, 0.0, "A", "O",
             dt.datetime(2024, 1, 1)),
        ],
        "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT,"
        " l_linenumber INTEGER, l_quantity DOUBLE, l_extendedprice DOUBLE,"
        " l_discount DOUBLE, l_tax DOUBLE, l_returnflag STRING,"
        " l_linestatus STRING, l_shipdate TIMESTAMP",
    )
    monkeypatch.setattr(adv, "t", lambda *_: li)
    r = adv.supplier_pareto_8020(spark, "unused").collect()[0]
    assert (r.suppliers_to_80pct, r.n_suppliers) == (1, 3)
    assert r.revenue_share == pytest.approx(0.8)


def test_dim_variance_dead_dimension_is_zero(spark, monkeypatch):
    """A constant dimension has EXACTLY zero variance (integer
    sufficient statistics — no float-cancellation residue); a varying
    dimension matches the population formula."""
    emb = spark.createDataFrame(
        [(1, [0.5, 0.1], 0), (2, [0.5, 0.3], 0)],
        "vec_id BIGINT, embedding ARRAY<FLOAT>, label INTEGER",
    )
    monkeypatch.setattr(adv, "t", lambda *_: emb)
    got = {
        r.dim: (r.mean_val, r.variance)
        for r in adv.embedding_dim_variance(spark, "unused").collect()
    }
    assert got[1] == (0.5, 0.0)
    assert got[2][0] == pytest.approx(0.2)
    assert got[2][1] == pytest.approx(0.01)  # population var of {0.1,0.3}


def test_weekday_index_keys_are_duckdb_convention(spark, monkeypatch):
    """Spark dayofweek is 1-7 Sunday-first; the query emits DuckDB's 0-6
    keys. 2024-01-07 is a Sunday -> dow 0; equal baskets -> index 1.0."""
    orders = spark.createDataFrame(
        [
            (1, 1, "O", 10.0, dt.datetime(2024, 1, 7), "p"),   # Sunday
            (2, 1, "O", 10.0, dt.datetime(2024, 1, 8), "p"),   # Monday
        ],
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,"
        " o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING",
    )
    monkeypatch.setattr(adv, "t", lambda *_: orders)
    got = {
        r.dow: (r.n_orders, r.revenue, r.per_order_index)
        for r in adv.weekday_revenue_index(spark, "unused").collect()
    }
    assert got == {0: (1, 10.0, 1.0), 1: (1, 10.0, 1.0)}

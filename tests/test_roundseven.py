"""Degenerate-input pins for the round-7 queries — shapes the oracle
fixtures can't reach (single-event users, exact-boundary packing, identical
docs). Happy paths are oracle-checked by scripts/check_correctness.py."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
        " event_type STRING, value DOUBLE, props STRING"
    )


def _docs(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id BIGINT, text STRING, lang STRING, source STRING,"
        " n_chars BIGINT",
    )


def test_twa_single_event_user_excluded_and_constant_series(
    spark, monkeypatch
):
    """A user with ONE event has no holding interval — excluded entirely
    (never a null/zero row); a constant-value series has TWA equal to
    that value in cents regardless of gap lengths."""
    from certified_dogs_and_cats_spark.queries import olap as olap_mod

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 7, "view", 5.25, "{}"),  # user 7: single event
        (2, t0, 8, "view", 2.50, "{}"),
        (3, t0 + dt.timedelta(seconds=10), 8, "view", 2.50, "{}"),
        (4, t0 + dt.timedelta(seconds=999), 8, "view", 2.50, "{}"),
    ]
    monkeypatch.setattr(olap_mod, "t", lambda *_: _events(spark, rows))
    got = {
        r.user_id: (r.n_intervals, r.twa_cents)
        for r in olap_mod.time_weighted_average(spark, "unused").collect()
    }
    assert 7 not in got
    assert got[8] == (2, 250)


def test_ohlc_single_event_bucket_collapses(spark, monkeypatch):
    from certified_dogs_and_cats_spark.queries import olap as olap_mod

    rows = [(1, dt.datetime(2024, 1, 1, 1), 5, "view", 9.75, "{}")]
    monkeypatch.setattr(olap_mod, "t", lambda *_: _events(spark, rows))
    r = olap_mod.ohlc_resample_6h(spark, "unused").collect()[0]
    assert (r.n_events, r.open, r.high, r.low, r.close) == (
        1, 9.75, 9.75, 9.75, 9.75
    )


def test_rolling_median_warmup_rows_use_short_windows(spark, monkeypatch):
    """The first rows of each user's series take the lower median of the
    however-many rows exist so far (n_in_window < 5), matching the
    oracle's (len+1)//2 selection."""
    from certified_dogs_and_cats_spark.queries import olap as olap_mod

    t0 = dt.datetime(2024, 1, 1)
    vals = [5.0, 1.0, 9.0, 3.0]
    rows = [
        (i, t0 + dt.timedelta(seconds=i), 1, "view", v, "{}")
        for i, v in enumerate(vals)
    ]
    monkeypatch.setattr(olap_mod, "t", lambda *_: _events(spark, rows))
    got = {
        r.event_id: (r.med_disc, r.n_in_window)
        for r in olap_mod.rolling_median_smooth(spark, "unused").collect()
    }
    # windows: [5]->5; [1,5]->1 (lower); [1,5,9]->5; [1,3,5,9]->3 (lower)
    assert got == {0: (5.0, 1), 1: (1.0, 2), 2: (5.0, 3), 3: (3.0, 4)}


def test_packing_exact_boundary_doc_is_not_a_straddler(spark, monkeypatch):
    """A doc whose interval ends or starts exactly ON a bin boundary
    crosses nothing: three 128-token docs at budget 128 are 3 full bins,
    fill 1000, ZERO straddlers (and still none at 256/512 since every
    interval edge sits on a 128 multiple). Three 100-token docs at
    budget 128 make docs 2 and 3 genuine straddlers ([100,200) and
    [200,300) each cross one 128-boundary)."""
    from certified_dogs_and_cats_spark.queries import chunking as ch

    aligned = [(i, " ".join(["w"] * 128), "en", "s", 0) for i in range(3)]
    monkeypatch.setattr(ch, "t", lambda *_: _docs(spark, aligned))
    got = {
        r.budget: (r.n_bins, r.fill_permille, r.n_straddlers)
        for r in ch.packing_fill_rates(spark, "unused").collect()
    }
    assert got[128] == (3, 1000, 0)
    assert got[256] == (2, 750, 0)
    assert got[512] == (1, 750, 0)

    uneven = [(i, " ".join(["w"] * 100), "en", "s", 0) for i in range(3)]
    monkeypatch.setattr(ch, "t", lambda *_: _docs(spark, uneven))
    got = {
        r.budget: (r.n_bins, r.fill_permille, r.n_straddlers)
        for r in ch.packing_fill_rates(spark, "unused").collect()
    }
    # total 300: 3 bins of 128 -> fill 300000/(3*128) = 781 permille.
    assert got[128] == (3, 781, 2)


def test_minhash_calibration_identical_docs_zero_error(spark, monkeypatch):
    """Two identical documents: every signature component matches
    (est = 1.0), exact Jaccard = 1.0, abs_err = 0 — the calibration
    fixed point."""
    from certified_dogs_and_cats_spark.queries import dedup as dd

    text = "alpha beta gamma delta epsilon zeta"
    rows = [(1, text, "en", "s", 0), (2, text, "en", "s", 0)]
    monkeypatch.setattr(dd, "t", lambda *_: _docs(spark, rows))
    out = dd.minhash_estimate_calibration(spark, "unused").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.a_id, r.b_id, r.n_hash_matches) == (1, 2, 8)
    assert r.est_jaccard == 1.0 and r.exact_jaccard == 1.0
    assert r.abs_err == 0.0


def test_token_savings_no_components_means_zero_drops(spark, monkeypatch):
    """A corpus with no near-dup pairs drops nothing: every source rows
    out with zero dropped docs/tokens (LEFT join semantics, not inner)."""
    from certified_dogs_and_cats_spark.queries import dedup as dd

    docs = _docs(
        spark,
        [(0, "one two three", "en", "sA", 0),
         (1, "four five six", "en", "sB", 0)],
    )
    comp = spark.createDataFrame([], "node BIGINT, component BIGINT")
    monkeypatch.setattr(dd, "t", lambda *_: docs)
    monkeypatch.setattr(dd, "_near_dup_components", lambda *_: comp)
    got = {
        r.source: (r.n_docs_dropped, r.tokens_dropped, r.saved_permille)
        for r in dd.dedup_token_savings(spark, "unused").collect()
    }
    assert got == {"sA": (0, 0, 0), "sB": (0, 0, 0)}

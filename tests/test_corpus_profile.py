"""Corpus-profiling queries (queries/corpus_profile.py): the invariants
each operator exists for, pinned on handcrafted frames."""

from __future__ import annotations

from pyspark.sql import functions as F

from certified_dogs_and_cats_spark.queries.corpus_profile import CDC_MOD


def _chunk_count(spark, text: str) -> int:
    from certified_dogs_and_cats_spark.extensions.text import _md5_prefix60

    toks = F.split(F.lit(text), " ")
    n = F.lit(1) + F.size(
        F.filter(toks, lambda x: _md5_prefix60(x) % CDC_MOD == 0)
    )
    return spark.range(1).select(n.alias("n")).collect()[0].n


def _boundaries(spark, text: str) -> list[str]:
    from certified_dogs_and_cats_spark.extensions.text import _md5_prefix60

    toks = F.split(F.lit(text), " ")
    b = F.filter(toks, lambda x: _md5_prefix60(x) % CDC_MOD == 0)
    return spark.range(1).select(b.alias("b")).collect()[0].b


def test_cdc_boundaries_are_content_defined(spark):
    """THE content-defined property: prepending a token leaves every
    existing boundary token a boundary (boundaries depend on token
    content only, never position) — the invariant fixed-size chunking
    lacks and the reason CDC survives prefix edits."""
    base = " ".join(f"tok{i}" for i in range(400))
    before = _boundaries(spark, base)
    assert before, "need at least one boundary for the property to bite"
    after = _boundaries(spark, "INSERTED " + base)
    # every original boundary token still bounds a chunk
    assert before == [t for t in after if t != "INSERTED"]
    # and the insertion changed the count by at most its own boundary-ness
    assert abs(len(after) - len(before)) <= 1


def test_cdc_chunk_count_is_boundaries_plus_one(spark):
    base = " ".join(f"tok{i}" for i in range(400))
    assert _chunk_count(spark, base) == len(_boundaries(spark, base)) + 1


def test_activity_islands_handcrafted(spark):
    """Two users: u1 active 3 consecutive days + 1 isolated day (streaks
    3 and 1), u2 active 2 consecutive days twice with a gap (two streaks
    of 2); duplicate same-day events must not inflate streaks."""
    from certified_dogs_and_cats_spark.queries import QUERIES
    import datetime as dt

    rows = []
    eid = 0

    def ev(u, day):
        nonlocal eid
        eid += 1
        return (eid, dt.datetime(2024, 1, day, 12, 0, 0), u, "view", 1.0, "{}")

    for d in (1, 2, 3, 10):
        rows.append(ev(1, d))
    rows.append(ev(1, 2))  # duplicate-day event
    for d in (5, 6, 20, 21):
        rows.append(ev(2, d))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    import tempfile, shutil, os

    tmp = tempfile.mkdtemp(prefix="islands_")
    try:
        # testdata tables are single parquet FILES, not directories
        df.toPandas().to_parquet(os.path.join(tmp, "events.parquet"))
        out = {
            (r.streak_len): (r.n_islands, r.n_users)
            for r in QUERIES["activity_islands"](spark, tmp).collect()
        }
        assert out == {3: (1, 1), 1: (1, 1), 2: (2, 1)}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_chi2_drift_zero_for_identical_distributions(spark):
    """Chi-squared drift must be exactly 0.0 when both hash-splits see
    the same token multiset — each term's (p-q) is identically zero, no
    float residue (the IEEE-exactness the query's design leans on)."""
    from certified_dogs_and_cats_spark.queries import QUERIES
    import tempfile, shutil, os

    # find doc_ids landing in split 0 and split 1, give them identical text
    import hashlib

    def split_of(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 2

    a = next(i for i in range(100) if split_of(i) == 0)
    b = next(i for i in range(100) if split_of(i) == 1)
    df = spark.createDataFrame(
        [(a, "x y z x", "en", "s", 7), (b, "x y z x", "en", "s", 7)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    tmp = tempfile.mkdtemp(prefix="chi2_")
    try:
        df.toPandas().to_parquet(os.path.join(tmp, "documents.parquet"))
        [r] = QUERIES["token_chi2_drift"](spark, tmp).collect()
        assert r.chi2_drift == 0.0
        assert r.vocab_size == 3
        assert r.n_tokens_a == 4 and r.n_tokens_b == 4
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

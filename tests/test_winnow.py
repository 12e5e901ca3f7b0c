"""Winnowing fingerprints: the SIGMOD'03 guarantee (shared substring of
length >= w + k - 1 => shared fingerprint), shift robustness, and the
short-doc edge."""

from __future__ import annotations

from certified_dogs_and_cats_spark.extensions.text import (
    winnow_fingerprints,
    winnow_shared_pairs,
)

K = 8
W = 4
GUARANTEE_LEN = W + K - 1  # 11 chars


def _fps(spark, rows, k=K, w=W):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return winnow_fingerprints(df, "doc_id", "text", k=k, w=w)


def test_shared_substring_produces_shared_fingerprint(spark):
    shared = "abcdefghijklmnop"  # 16 >= GUARANTEE_LEN
    rows = [
        (1, f"zzzz{shared}qqqqqqq"),
        (2, f"totally other prefix {shared} and suffix"),
    ]
    fp = _fps(spark, rows)
    a = {r.fingerprint for r in fp.filter("doc_id = 1").collect()}
    b = {r.fingerprint for r in fp.filter("doc_id = 2").collect()}
    assert a & b, "winnowing guarantee violated: no shared fingerprint"


def test_identical_docs_share_full_fingerprint_set(spark):
    text = "the quick brown fox jumps over the lazy dog again and again"
    fp = _fps(spark, [(1, text), (2, text)])
    a = {r.fingerprint for r in fp.filter("doc_id = 1").collect()}
    b = {r.fingerprint for r in fp.filter("doc_id = 2").collect()}
    assert a == b and len(a) > 0


def test_winnow_strictly_richer_than_global_min(spark):
    """The per-window set must contain the global min k-gram hash and (for
    any non-trivial doc) more besides — the upgrade over a single global
    fingerprint. The global min is recomputed in pure Python with the same
    60-bit top-of-md5 hash, pinning the hash construction itself."""
    import hashlib

    text = "a long enough document body with plenty of distinct windows here"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    wset = {
        r.fingerprint
        for r in winnow_fingerprints(df, "doc_id", "text", k=K, w=W).collect()
    }
    gmin = min(
        int(
            hashlib.md5(text[i : i + K].encode()).hexdigest()[:15], 16
        )
        for i in range(len(text) - K + 1)
    )
    assert gmin in wset
    assert len(wset) > 1


def test_short_doc_yields_no_fingerprints(spark):
    # len < w + k - 1: no full window of k-gram hashes exists.
    fp = _fps(spark, [(1, "tiny")])
    assert fp.count() == 0


def test_shared_pairs_finds_the_copied_pair_only(spark):
    shared = "this sentence was copied verbatim between two documents"
    rows = [
        (1, f"first doc intro. {shared}. first doc outro padding text"),
        (2, f"second doc header -- {shared} -- second doc footer words"),
        (3, "an entirely unrelated body of text with no overlap at all xyz"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = winnow_shared_pairs(
        df, "doc_id", "text", k=K, w=W, min_shared=2, max_fp_df=10
    ).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}
    assert all(r.n_shared >= 2 for r in pairs)


def test_fingerprints_short_doc_contracts(spark):
    """Docs below the window threshold yield NO fingerprints (and never
    crash): min_window needs k chars, winnowing needs w + k - 1."""
    from certified_dogs_and_cats_spark.extensions.text import (
        min_window_fingerprint,
        winnow_fingerprints,
    )

    df = spark.createDataFrame(
        [(1, "tiny"), (2, "x" * 40)], "doc_id long, text string"
    )
    mw = min_window_fingerprint(df, "doc_id", "text", k=12)
    assert [r.doc_id for r in mw.collect()] == [2]
    wf = winnow_fingerprints(df, "doc_id", "text", k=8, w=1)
    assert {r.doc_id for r in wf.collect()} == {2}

"""Unit tests for the scrub (PII / URL / mixture) and term-statistics
operators — edge cases the oracle queries don't isolate."""

from __future__ import annotations

from pyspark.sql import functions as F

from certified_dogs_and_cats_spark.extensions.scrub import (
    mixture_sample,
    redact_pii,
    url_parts,
)
from certified_dogs_and_cats_spark.extensions.vocab import (
    bigram_lift,
    tfidf_top_terms,
)


def test_redact_pii_counts_and_replaces(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at bob.smith@corp.io or call 555-0199 now"),
            (2, "server 192.168.0.1 and 10.0.0.2 are up"),
            (3, "nothing sensitive here"),
        ],
        ["id", "text"],
    )
    rows = {
        r["id"]: r for r in redact_pii(df, "id", "text").collect()
    }
    assert (rows[1]["n_email"], rows[1]["n_phone"], rows[1]["n_ip"]) == (
        1,
        1,
        0,
    )
    assert rows[1]["redacted"] == "mail me at <EMAIL> or call <PHONE> now"
    assert rows[2]["n_ip"] == 2
    assert rows[2]["redacted"] == "server <IP> and <IP> are up"
    assert rows[3]["redacted"] == "nothing sensitive here"


def test_url_parts_absent_components_are_empty(spark):
    df = spark.createDataFrame(
        [
            (1, "https://a.example.com/x/y?q=1"),
            (2, "http://b.example.com"),
            (3, "https://c.example.com/solo"),
        ],
        ["id", "url"],
    )
    rows = {r["id"]: r for r in url_parts(df, "url").collect()}
    assert rows[1]["host"] == "a.example.com"
    assert rows[1]["path"] == "/x/y"
    assert rows[1]["query"] == "q=1"
    assert rows[2]["path"] == "" and rows[2]["query"] == ""
    assert rows[3]["path"] == "/solo" and rows[3]["query"] == ""


def test_mixture_sample_rate_bounds_and_determinism(spark):
    df = spark.range(200).withColumnRenamed("id", "doc_id")
    none = mixture_sample(df, "doc_id", F.lit(0))
    everything = mixture_sample(df, "doc_id", F.lit(1000))
    assert none.count() == 0
    assert everything.count() == 200
    half_a = sorted(
        r["doc_id"]
        for r in mixture_sample(df, "doc_id", F.lit(500)).collect()
    )
    half_b = sorted(
        r["doc_id"]
        for r in mixture_sample(df, "doc_id", F.lit(500)).collect()
    )
    assert half_a == half_b  # pure function of the id
    assert 0 < len(half_a) < 200


def test_tfidf_prefers_rare_terms(spark):
    # "apple" appears in one doc, "the" in all three: for equal tf the
    # rare term must outrank the common one.
    df = spark.createDataFrame(
        [
            (1, "the apple the apple"),
            (2, "the pear the plum"),
            (3, "the plum the pear"),
        ],
        ["id", "text"],
    )
    res = tfidf_top_terms(df, "id", "text", k=2).collect()
    doc1 = sorted(
        (r for r in res if r["id"] == 1), key=lambda r: r["rnk"]
    )
    # Equal tf (2 each), but df(apple)=1 vs df(the)=3.
    assert [r["tok"] for r in doc1] == ["apple", "the"]
    assert doc1[0]["tfidf"] > doc1[1]["tfidf"]


def test_bigram_lift_finds_collocation(spark):
    # "san francisco" repeats in every doc; every other bigram varies
    # (unique filler words per doc), so only the collocation clears the
    # min_count floor and it must rank first.
    rows = [
        (i, f"w{i}a san francisco w{i}b san w{i}c francisco w{i}d")
        for i in range(5)
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    top = bigram_lift(df, "id", "text", min_count=5, k=3).collect()
    assert (top[0]["x"], top[0]["y"]) == ("san", "francisco")
    assert top[0]["rnk"] == 1
    assert top[0]["lift"] > 1.0


def test_redaction_is_idempotent_and_leaves_no_pii(spark):
    """Redacting already-redacted text is a no-op, and no PII pattern
    survives a single pass (the two invariants a scrubber must hold)."""
    df = spark.createDataFrame(
        [
            (1, "a@b.io c@d.org 555-1234 1.2.3.4 10.20.30.40 x@y.co"),
            (2, "<EMAIL> already clean <IP>"),
        ],
        ["id", "text"],
    )
    once = redact_pii(df, "id", "text").select(
        "id", F.col("redacted").alias("text")
    )
    leftover = redact_pii(once, "id", "text")
    assert leftover.filter(
        (F.col("n_email") > 0) | (F.col("n_phone") > 0) | (F.col("n_ip") > 0)
    ).count() == 0
    again = {r["id"]: r["redacted"] for r in leftover.collect()}
    first = {r["id"]: r["text"] for r in once.collect()}
    assert again == first


def test_mixture_keep_set_is_monotone_in_rate(spark):
    """Raising the rate must only ADD rows (hash-threshold sampling is
    nested) — the property that makes mixture re-weighting backfillable."""
    df = spark.range(300).withColumnRenamed("id", "doc_id")
    kept = {}
    for rate in (200, 500, 900):
        kept[rate] = {
            r["doc_id"]
            for r in mixture_sample(df, "doc_id", F.lit(rate)).collect()
        }
    assert kept[200] <= kept[500] <= kept[900]


# --- plan_mixture: alpha-smoothed source rebalancing ----------------------


def _mix_corpus(spark):
    rows = (
        [(f"w{i}", "web") for i in range(80)]
        + [(f"b{i}", "books") for i in range(15)]
        + [(f"c{i}", "code") for i in range(5)]
    )
    return spark.createDataFrame(rows, "doc_id STRING, source STRING")


def test_plan_mixture_alpha_one_is_proportional(spark):
    from certified_dogs_and_cats_spark.extensions.scrub import plan_mixture

    plan = {
        r.source: r
        for r in plan_mixture(
            _mix_corpus(spark), "source", alpha=1.0, budget_frac=0.5
        ).collect()
    }
    # alpha=1: target == natural, so every source keeps ~budget_frac.
    for s in ("web", "books", "code"):
        assert plan[s].target_share == plan[s].natural_share
        assert plan[s].rate_permille == 500


def test_plan_mixture_alpha_zero_is_uniform(spark):
    from certified_dogs_and_cats_spark.extensions.scrub import plan_mixture

    plan = {
        r.source: r
        for r in plan_mixture(
            _mix_corpus(spark), "source", alpha=0.0, budget_frac=0.3
        ).collect()
    }
    # alpha=0: equal target shares (1/3 each); rare sources upweight until
    # the keep-everything cap bites.
    assert all(abs(plan[s].target_share - 1 / 3) < 1e-6 for s in plan)
    assert plan["web"].rate_permille < plan["books"].rate_permille
    assert plan["code"].rate_permille == 1000  # capped: can't mint data


def test_plan_mixture_matches_python_reference_and_feeds_sampler(spark):
    import pyspark.sql.functions as F

    from certified_dogs_and_cats_spark.extensions.scrub import (
        mixture_sample,
        plan_mixture,
    )

    df = _mix_corpus(spark)
    alpha, budget = 0.5, 0.4
    plan = plan_mixture(df, "source", alpha=alpha, budget_frac=budget)
    rows = {r.source: r for r in plan.collect()}
    counts = {"web": 80, "books": 15, "code": 5}
    total = sum(counts.values())
    smoothed = {s: (c / total) ** alpha for s, c in counts.items()}
    z = sum(smoothed.values())
    for s, c in counts.items():
        target = smoothed[s] / z
        want = min(round(budget * target / (c / total) * 1000), 1000)
        assert rows[s].rate_permille == want, s
    # The plan drives the deterministic sampler via a broadcast join.
    kept = mixture_sample(
        df.join(F.broadcast(plan.select("source", "rate_permille")), "source"),
        "doc_id",
        F.col("rate_permille"),
    )
    n = kept.count()
    assert 0 < n < total
    # Determinism: the same plan keeps exactly the same rows.
    assert sorted(r.doc_id for r in kept.collect()) == sorted(
        r.doc_id for r in kept.collect()
    )


def test_plan_mixture_weight_col_and_validation(spark):
    import pytest as _pytest

    from certified_dogs_and_cats_spark.extensions.scrub import plan_mixture

    df = spark.createDataFrame(
        [("a", "s1", 100), ("b", "s1", 100), ("c", "s2", 800)],
        "doc_id STRING, source STRING, n_tokens INT",
    )
    plan = {
        r.source: r
        for r in plan_mixture(
            df, "source", weight_col="n_tokens", alpha=1.0, budget_frac=1.0
        ).collect()
    }
    # Token-weighted: s1 holds 200/1000 of the mass.
    assert abs(plan["s1"].natural_share - 0.2) < 1e-6
    with _pytest.raises(ValueError):
        plan_mixture(df, "source", alpha=1.5)
    with _pytest.raises(ValueError):
        plan_mixture(df, "source", budget_frac=0.0)


def test_pii_counts_agree_with_replacements(spark):
    """A phone/IP-shaped run inside an email local part is consumed by
    the email redaction and must count as email ONLY."""
    from certified_dogs_and_cats_spark.extensions.scrub import redact_pii

    df = spark.createDataFrame(
        [(1, "call 555-1234@corp.com now")], "doc_id long, text string"
    )
    r = redact_pii(df, "doc_id", "text").collect()[0]
    assert r.n_email == 1 and r.n_phone == 0 and r.n_ip == 0
    assert "<EMAIL>" in r.redacted and "<PHONE>" not in r.redacted


def test_url_query_not_matched_inside_fragment(spark):
    from certified_dogs_and_cats_spark.extensions.scrub import url_parts

    df = spark.createDataFrame(
        [(1, "https://h.com/path#section?tab=1"),
         (2, "https://h.com/p?a=1#frag")],
        "doc_id long, url string",
    )
    got = {r.doc_id: r.query for r in url_parts(df, "url").collect()}
    assert got == {1: "", 2: "a=1"}


def test_mixture_sample_rate_scales_with_buckets(spark):
    from pyspark.sql import functions as F

    from certified_dogs_and_cats_spark.extensions.scrub import mixture_sample

    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    kept = mixture_sample(df, "doc_id", F.lit(300), n_buckets=100).count()
    # ~30% regardless of bucket resolution (md5 is uniform).
    assert 0.2 * 2000 < kept < 0.4 * 2000


def test_canonicalize_urls_edge_cases(spark):
    from certified_dogs_and_cats_spark.extensions.scrub import (
        canonicalize_urls,
    )

    urls = [
        (1, "HTTP://Host.COM:80/a/"),                 # default port + case
        (2, "http://host.com:8080/a"),                # non-default port kept
        (3, "https://h.com/x?b=2&a=1#frag"),          # param sort + fragment
        (4, "https://h.com/x?utm_source=s&gclid=g&a=1"),  # tracking strip
        (5, "https://h.com/x?utm_source=z&a=1&b=2"),  # collapses with 3
        (6, "https://h.com"),                         # no path, no query
        (7, "https://h.com/x?utm_source=only"),       # all params stripped
    ]
    df = spark.createDataFrame(urls, "id BIGINT, url STRING")
    got = {
        r.id: r.canonical_url
        for r in canonicalize_urls(df, "url").collect()
    }
    assert got[1] == "http://host.com/a"
    assert got[2] == "http://host.com:8080/a"
    assert got[3] == "https://h.com/x?a=1&b=2"
    assert got[4] == "https://h.com/x?a=1"
    assert got[5] == got[3]
    assert got[6] == "https://h.com"
    assert got[7] == "https://h.com/x"


def test_canonicalize_urls_param_name_boundary(spark):
    """Exact-name tracking entries strip only the exact param name:
    'fbclidx=1' and 'gclid_src=2' are NOT tracking params and must keep
    their URLs distinct dedup keys; prefix entries ('utm_') still match
    any utm_* name."""
    from certified_dogs_and_cats_spark.extensions.scrub import (
        canonicalize_urls,
    )

    urls = [
        (1, "https://h.com/x?fbclid=abc&a=1"),    # exact name: stripped
        (2, "https://h.com/x?fbclidx=1&a=1"),     # boundary: kept
        (3, "https://h.com/x?gclid_src=2&a=1"),   # boundary: kept
        (4, "https://h.com/x?utm_campaign=c&a=1"),  # prefix: stripped
    ]
    df = spark.createDataFrame(urls, "id BIGINT, url STRING")
    got = {
        r.id: r.canonical_url
        for r in canonicalize_urls(df, "url").collect()
    }
    assert got[1] == "https://h.com/x?a=1"
    assert got[2] == "https://h.com/x?a=1&fbclidx=1"
    assert got[3] == "https://h.com/x?a=1&gclid_src=2"
    assert got[4] == "https://h.com/x?a=1"


def test_canonicalize_urls_empty_tracking_prefixes_keeps_all(spark):
    """tracking_prefixes=() means "strip nothing": every param survives
    (sorted), instead of the reduce-over-empty-iterable TypeError the
    un-short-circuited fold raised."""
    from certified_dogs_and_cats_spark.extensions.scrub import (
        canonicalize_urls,
    )

    df = spark.createDataFrame(
        [(1, "https://h.com/x?utm_source=s&b=2&a=1")], "id BIGINT, url STRING"
    )
    got = canonicalize_urls(df, "url", tracking_prefixes=()).collect()[0]
    assert got.canonical_url == "https://h.com/x?a=1&b=2&utm_source=s"

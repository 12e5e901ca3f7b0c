"""PII-scrubbing / URL-normalization / mixture-sampling queries.

The `documents` testdata is synthetic word-soup with no real PII or URLs,
so each query first derives a deterministic fixture column from existing
fields (identical ``concat`` on both engines) and then runs the REAL
operator over it — the operator under test is generic; only the fixture
is synthetic. Redaction equality is pinned by md5 of the redacted text,
so a single differing byte anywhere in any row fails the hash row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..extensions.scrub import mixture_sample, redact_pii, url_parts
from .common import t
from .registry import query

# Deterministic PII-bearing line appended to each doc: one email, one
# phone for every third doc, one IP for every fourth.
_PII_FIXTURE_SPARK = (
    "concat(substr(text, 1, 60), ' contact u', doc_id, '@mail-', source,"
    " '.com', CASE WHEN doc_id % 3 = 0 THEN concat(' call 555-',"
    " lpad(CAST(doc_id % 10000 AS STRING), 4, '0')) ELSE '' END,"
    " CASE WHEN doc_id % 4 = 0 THEN concat(' from 10.0.', doc_id % 256,"
    " '.', doc_id % 100) ELSE '' END)"
)
_PII_FIXTURE_DUCK = (
    "substr(text, 1, 60) || ' contact u' || doc_id || '@mail-' || source"
    " || '.com' || (CASE WHEN doc_id % 3 = 0 THEN ' call 555-' ||"
    " lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END)"
    " || (CASE WHEN doc_id % 4 = 0 THEN ' from 10.0.' || doc_id % 256"
    " || '.' || doc_id % 100 ELSE '' END)"
)

_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PHONE_RE = "555-[0-9]{4}"
_IPV4_RE = "([0-9]{1,3}\\.){3}[0-9]{1,3}"


@query(
    "pii_redaction_counts",
    oracle=f"""
    WITH fx AS (
      SELECT doc_id, {_PII_FIXTURE_DUCK} AS raw FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(raw, '{_EMAIL_RE}')) AS BIGINT)
             AS n_email,
           CAST(len(regexp_extract_all(raw, '{_PHONE_RE}')) AS BIGINT)
             AS n_phone,
           CAST(len(regexp_extract_all(raw, '{_IPV4_RE}')) AS BIGINT)
             AS n_ip,
           md5(regexp_replace(regexp_replace(regexp_replace(raw,
                 '{_EMAIL_RE}', '<EMAIL>', 'g'),
                 '{_PHONE_RE}', '<PHONE>', 'g'),
                 '{_IPV4_RE}', '<IP>', 'g')) AS redacted_key
    FROM fx
    """,
)
def pii_redaction_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over a deterministic fixture corpus: per-class hit counts
    plus an md5 of the redacted text (byte-identical redaction is what the
    hash row proves). Pure narrow projection — the 100 TB shape is a map
    over the scan with nothing shuffled."""
    docs = t(spark, sf_dir, "documents")
    fx = docs.select("doc_id", F.expr(_PII_FIXTURE_SPARK).alias("raw"))
    red = redact_pii(fx, "doc_id", "raw")
    return red.select(
        "doc_id",
        "n_email",
        "n_phone",
        "n_ip",
        F.md5("redacted").alias("redacted_key"),
    )


_URL_FIXTURE_SPARK = (
    "concat('https://h', doc_id % 7, '.example.com',"
    " CASE WHEN doc_id % 5 != 0 THEN concat('/', source, '/p', doc_id % 13)"
    " ELSE '' END,"
    " CASE WHEN doc_id % 3 = 0 THEN concat('?q=', lang) ELSE '' END)"
)
_URL_FIXTURE_DUCK = (
    "'https://h' || doc_id % 7 || '.example.com'"
    " || (CASE WHEN doc_id % 5 != 0 THEN '/' || source || '/p' ||"
    " doc_id % 13 ELSE '' END)"
    " || (CASE WHEN doc_id % 3 = 0 THEN '?q=' || lang ELSE '' END)"
)

_HOST_RE = "^https?://([^/?#]+)"
_PATH_RE = "^https?://[^/?#]+(/[^?#]*)"
_QUERY_RE = "[?]([^#]*)"


@query(
    "url_host_stats",
    oracle=f"""
    WITH fx AS (
      SELECT doc_id, {_URL_FIXTURE_DUCK} AS url FROM documents
    ),
    p AS (
      SELECT doc_id,
             coalesce(regexp_extract(url, '{_HOST_RE}', 1), '') AS host,
             coalesce(regexp_extract(url, '{_PATH_RE}', 1), '') AS path,
             coalesce(regexp_extract(url, '{_QUERY_RE}', 1), '') AS query
      FROM fx
    )
    SELECT host,
           CAST(count(*) AS BIGINT) AS n_urls,
           CAST(count(DISTINCT path) AS BIGINT) AS n_paths,
           CAST(sum(CASE WHEN query != '' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_with_query,
           CAST(sum(CASE WHEN path = '' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bare
    FROM p GROUP BY host
    """,
)
def url_host_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + host-level rollup — the shape of a crawl
    frontier / blocklist prep: parse host/path/query (regex-portable, ''
    when absent) and aggregate per host. One hash-aggregate shuffle on
    the host key."""
    docs = t(spark, sf_dir, "documents")
    fx = docs.select("doc_id", F.expr(_URL_FIXTURE_SPARK).alias("url"))
    p = url_parts(fx, "url")
    return p.groupBy("host").agg(
        F.count("*").cast("long").alias("n_urls"),
        F.countDistinct("path").cast("long").alias("n_paths"),
        F.sum(F.when(F.col("query") != "", 1).otherwise(0))
        .cast("long")
        .alias("n_with_query"),
        F.sum(F.when(F.col("path") == "", 1).otherwise(0))
        .cast("long")
        .alias("n_bare"),
    )


_BUCKET_1000 = (
    "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000)"
)
# Per-source mixture rate in permille: src index cycles 5 tiers
# 1000, 850, 700, 550, 400.
_RATE_DUCK = (
    "(1000 - 150 * (CAST(substr(source, 4) AS BIGINT) % 5))"
)


@query(
    "sample_mixture_weights",
    oracle=f"""
    WITH kept AS (
      SELECT source, n_chars FROM documents
      WHERE {_BUCKET_1000} < {_RATE_DUCK}
    ),
    tot AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1)
    SELECT t.source,
           CAST(t.n_docs AS BIGINT) AS n_docs,
           CAST(count(k.source) AS BIGINT) AS n_kept,
           CAST(coalesce(sum(k.n_chars), 0) AS BIGINT) AS kept_chars
    FROM tot t LEFT JOIN kept k ON t.source = k.source
    GROUP BY t.source, t.n_docs
    """,
)
def sample_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture re-weighting: each source is downsampled to a
    per-source permille rate (here derived arithmetically from the source
    id; in production the rate column comes from a tiny broadcast weights
    dim). Keep/drop is a pure function of doc_id, so backfills and re-runs
    keep exactly the same rows. Zero pre-aggregation shuffles on the kept
    branch; one hash-aggregate per branch + a broadcast-able join of two
    per-source aggregates."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    rate = F.lit(1000) - F.lit(150) * (
        F.substring("source", 4, 10).cast("bigint") % 5
    )
    kept = mixture_sample(
        docs.withColumn("__rate", rate), "doc_id", F.col("__rate")
    )
    k = kept.groupBy("source").agg(
        F.count("*").alias("n_kept"),
        F.sum("n_chars").alias("kept_chars"),
    )
    tot = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    return tot.join(k, "source", "left").select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce("kept_chars", F.lit(0)).cast("long").alias("kept_chars"),
    )


_MESSY_URL_SPARK = (
    "concat(CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END, '://',"
    " 'H', doc_id % 7, '.Example.COM',"
    " CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE '' END,"
    " '/', source, '/p', doc_id % 13,"
    " CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END,"
    " '?utm_source=u', doc_id % 5, '&q=', lang,"
    " '#s', doc_id % 4)"
)


@query(
    "url_canonical_dedup",
    oracle="""
    WITH fx AS (
      SELECT doc_id,
             'https://h' || doc_id % 7 || '.example.com/' || source ||
             '/p' || doc_id % 13 || '?q=' || lang AS canonical_url
      FROM documents
    )
    SELECT canonical_url,
           CAST(count(*) AS BIGINT) AS n_urls,
           CAST(min(doc_id) AS BIGINT) AS min_doc_id
    FROM fx GROUP BY canonical_url
    """,
)
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization -> exact dedup, the crawl-frontier collapse
    step: the fixture URLs vary in scheme/host CASE, default :443 port,
    trailing slash, utm_* tracking params, and fragment — all noise the
    canonicalizer must strip. The ORACLE derives each canonical form in
    CLOSED FORM from the fixture's generative parts (never running the
    canonicalizer), so the operator must REDISCOVER the clean key from
    the messy string: any mishandled case/port/param/fragment splits a
    group and fails rows+hash. Narrow projection + one hash aggregate."""
    from ..extensions.scrub import canonicalize_urls

    docs = t(spark, sf_dir, "documents")
    fx = docs.select("doc_id", F.expr(_MESSY_URL_SPARK).alias("url"))
    canon = canonicalize_urls(fx, "url")
    return canon.groupBy("canonical_url").agg(
        F.count("*").cast("long").alias("n_urls"),
        F.min("doc_id").cast("long").alias("min_doc_id"),
    )


LEAK_TRAIN_CUT = 800  # permille: buckets < 800 train, >= 800 held out


@query(
    "split_host_leakage_report",
    oracle=f"""
    WITH fx AS (
      SELECT doc_id,
             'h' || doc_id % 7 || '.example.com' AS host,
             'https://h' || doc_id % 7 || '.example.com/' || source ||
             '/p' || doc_id % 13 || '?q=' || lang AS canonical_url,
             CASE WHEN {_BUCKET_1000} < {LEAK_TRAIN_CUT}
                  THEN 1 ELSE 0 END AS is_train
      FROM documents
    ),
    per_url AS (
      SELECT host, canonical_url,
             max(is_train) AS has_train,
             max(1 - is_train) AS has_test,
             sum(is_train) AS n_train,
             sum(1 - is_train) AS n_test
      FROM fx GROUP BY 1, 2
    )
    SELECT host,
           CAST(count(*) AS BIGINT) AS n_urls,
           CAST(sum(CASE WHEN has_train = 1 AND has_test = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_leaked_urls,
           CAST(sum(n_train) AS BIGINT) AS n_train_docs,
           CAST(sum(n_test) AS BIGINT) AS n_test_docs
    FROM per_url GROUP BY 1
    """,
)
def split_host_leakage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/held-out CONTAMINATION audit at the URL level: canonicalize
    the messy fixture URLs (case/port/slash/tracking/fragment noise — the
    operator must rediscover the clean key), assign the deterministic
    md5-bucket split every sampler in this repo uses, and report per host
    how many canonical URLs appear on BOTH sides — the leak a
    dedup-before-split pipeline exists to prevent. The ORACLE derives the
    canonical form in closed form from the fixture's generative parts
    (never running the canonicalizer). Two hash aggregates; the URL
    table never joins anything bigger than itself."""
    from ..extensions.sampling import hash_bucket
    from ..extensions.scrub import canonicalize_urls, url_parts

    docs = t(spark, sf_dir, "documents")
    fx = docs.select("doc_id", F.expr(_MESSY_URL_SPARK).alias("url"))
    canon = canonicalize_urls(fx, "url")
    host = url_parts(canon.select("doc_id", "canonical_url"),
                     "canonical_url").select(
        "doc_id", "host", F.col("canonical_url")
    )
    is_train = (
        F.when(hash_bucket("doc_id", 1000) < LEAK_TRAIN_CUT, 1).otherwise(0)
    )
    per_url = (
        host.select("host", "canonical_url", is_train.alias("is_train"))
        .groupBy("host", "canonical_url")
        .agg(
            F.max("is_train").alias("has_train"),
            F.max(1 - F.col("is_train")).alias("has_test"),
            F.sum("is_train").alias("n_train"),
            F.sum(1 - F.col("is_train")).alias("n_test"),
        )
    )
    return per_url.groupBy("host").agg(
        F.count("*").cast("bigint").alias("n_urls"),
        F.sum(
            F.when(
                (F.col("has_train") == 1) & (F.col("has_test") == 1), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_leaked_urls"),
        F.sum("n_train").cast("bigint").alias("n_train_docs"),
        F.sum("n_test").cast("bigint").alias("n_test_docs"),
    )

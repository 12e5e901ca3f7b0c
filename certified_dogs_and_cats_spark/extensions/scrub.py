"""PII scrubbing and URL normalization for web-scale corpora.

A training-data pipeline has to strip contact information before a corpus
ships, and has to canonicalize URLs before host-level dedup / blocklist
joins. Both are pure per-row string transforms: they stay inside
whole-stage codegen (regexp_replace / regexp_extract / regexp_count are
JVM built-ins), shuffle nothing, and scale linearly with input bytes —
the 100 TB posture is "narrow map over the scan, filters still push
down".

Pattern portability contract: every regex here uses only literal
character classes, bounded repetition, and a single capture group —
the subset that behaves identically under Java regex (Spark) and RE2
(DuckDB), which is what lets the oracle replay redaction byte-for-byte.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Order matters: emails are redacted before IPs/phones so digit runs
# inside a local-part are never double-counted. The fixture-free contract
# is simply "non-overlapping patterns"; these three cannot overlap.
EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
PHONE_RE = "555-[0-9]{4}"
IPV4_RE = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

PII_PATTERNS = (
    ("email", EMAIL_RE, "<EMAIL>"),
    ("phone", PHONE_RE, "<PHONE>"),
    ("ip", IPV4_RE, "<IP>"),
)


def redact_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, redacted, n_email, n_phone, n_ip) — replace each PII class
    with a typed placeholder and count the hits per class.

    Each class is COUNTED on the text as already redacted by the earlier
    classes, so counts always agree with the replacements actually
    performed: a phone-shaped or IP-shaped run INSIDE an email local
    part ('555-1234@corp.com') is consumed by the email redaction and
    counts as email only — counting every class on the original text
    would report a phone hit that no <PHONE> token ever replaced.
    One projection, zero shuffles.
    """
    redacted: Column = F.col(text_col)
    cols = [F.col(id_col)]
    for name, pat, token in PII_PATTERNS:
        cols.append(
            F.regexp_count(redacted, F.lit(pat))
            .cast("long")
            .alias(f"n_{name}")
        )
        redacted = F.regexp_replace(redacted, pat, token)
    return df.select(*cols, redacted.alias("redacted"))


# URL part extraction — single-capture regexes, '' when absent (both
# engines return empty string for a non-matching regexp_extract).
URL_HOST_RE = "^https?://([^/?#]+)"
URL_PATH_RE = "^https?://[^/?#]+(/[^?#]*)"
# The query must be matched BEFORE any fragment: a '?' inside '#frag?x'
# is fragment content, not a query string.
URL_QUERY_RE = "^[^#]*[?]([^#]*)"


def url_parts(df: DataFrame, url_col: str) -> DataFrame:
    """Append (host, path, query) parsed from ``url_col``.

    regexp_extract-based rather than parse_url so the exact same
    semantics replay in the oracle; '' means the part is absent.
    """
    u = F.col(url_col)
    return df.withColumns(
        {
            "host": F.regexp_extract(u, URL_HOST_RE, 1),
            "path": F.regexp_extract(u, URL_PATH_RE, 1),
            "query": F.regexp_extract(u, URL_QUERY_RE, 1),
        }
    )


def canonicalize_urls(
    df: DataFrame,
    url_col: str,
    out_col: str = "canonical_url",
    tracking_prefixes: tuple[str, ...] = ("utm_", "fbclid", "gclid"),
) -> DataFrame:
    """Append the canonical form of ``url_col`` — the dedup key a crawl
    pipeline groups on before fetching/storing, where raw URLs differ
    only in noise:

    - scheme and host lowercased; default ports (:80 http, :443 https)
      stripped;
    - fragment dropped (regexes below never cross ``#``);
    - tracking parameters removed — an entry ending in ``_`` (e.g.
      ``utm_``) matches any param NAME with that prefix; any other entry
      (``fbclid``, ``gclid``) matches the param name exactly, so an
      unrelated ``fbclidx=1`` or ``gclid_src=2`` survives and keeps its
      URL a distinct dedup key. Remaining params SORTED so parameter
      order never splits a group;
    - trailing slashes stripped from the path ('' = root).

    Pure narrow projection (regex + array ops, no shuffle) with
    regexp/array semantics chosen to replay identically in ANSI-SQL
    oracles.
    """
    u = F.col(url_col)
    # Scheme matching must be case-insensitive here (the whole point is
    # that raw URLs arrive in mixed case); the shared URL_*_RE constants
    # stay case-sensitive for the already-normalized parsing paths.
    ci_scheme = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
    ci_host = r"^(?i:[a-z][a-z0-9+.-]*)://([^/?#]+)"
    ci_path = r"^(?i:[a-z][a-z0-9+.-]*)://[^/?#]+(/[^?#]*)"
    scheme = F.lower(F.regexp_extract(u, ci_scheme, 1))
    hostport = F.lower(F.regexp_extract(u, ci_host, 1))
    host = (
        F.when(
            scheme == "https", F.regexp_replace(hostport, ":443$", "")
        )
        .when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .otherwise(hostport)
    )
    path = F.regexp_replace(F.regexp_extract(u, ci_path, 1), "/+$", "")
    rawq = F.regexp_extract(u, URL_QUERY_RE, 1)
    def _is_tracking(p):
        # Match on the param NAME (substring before '='): prefix-style
        # entries (trailing '_') use startswith, exact entries use
        # equality — bare startswith on the whole param would also strip
        # 'fbclidx=1' / 'gclid_src=2'. An EMPTY prefix list means "strip
        # nothing": short-circuit to false (reduce over [] would raise).
        if not tracking_prefixes:
            return F.lit(False)
        name = F.substring_index(p, "=", 1)
        return reduce(
            lambda a, b: a | b,
            [
                name.startswith(pre) if pre.endswith("_") else name == pre
                for pre in tracking_prefixes
            ],
        )

    keep = F.filter(
        F.split(rawq, "&"),
        lambda p: (p != "") & ~_is_tracking(p),
    )
    qs = F.array_join(F.array_sort(keep), "&")
    return df.withColumn(
        out_col,
        F.concat(
            scheme,
            F.lit("://"),
            host,
            path,
            F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
        ),
    )


def mixture_sample(
    df: DataFrame,
    id_col: str,
    rate_permille: Column,
    n_buckets: int = 1000,
) -> DataFrame:
    """Deterministic mixture sampling: keep a row iff its id-hash bucket
    falls below ``rate_permille`` (a per-row Column, normally derived from
    a domain/source column or joined in from a tiny broadcast weights
    dim). This is how corpus mixtures are re-weighted for training —
    e.g. downsample crawl dumps to 30% while keeping reference text at
    100% — with assignment a pure function of the id: re-runs and
    backfills keep or drop exactly the same rows.

    Zero shuffles; the bucket is the same md5-prefix construction as
    sampling.hash_bucket so mixture decisions compose with split
    assignment (independent bits of the same hash would correlate — use
    a distinct hash salt per decision if composing many).
    """
    from .sampling import hash_bucket

    # The threshold is PERMILLE regardless of bucket resolution: scale it
    # to the bucket domain, or a non-default n_buckets would silently
    # re-interpret the rate (300 permille over 100 buckets must keep
    # ~30%, not 100%).
    threshold = rate_permille * F.lit(n_buckets) / F.lit(1000.0)
    return df.filter(hash_bucket(id_col, n_buckets) < threshold)


def plan_mixture(
    df: DataFrame,
    source_col: str,
    weight_col: str | None = None,
    alpha: float = 0.5,
    budget_frac: float = 0.5,
) -> DataFrame:
    """Alpha-smoothed mixture planning (the multilingual-training
    rebalancing rule, XLM-R style): target source shares are
    ``p_i ∝ share_i ** alpha`` — ``alpha = 1`` keeps natural proportions,
    ``alpha -> 0`` flattens toward uniform, between the two it upweights
    low-resource sources at the expense of dominant ones. ``budget_frac``
    scales the whole plan so the expected kept mass is that fraction of
    the corpus.

    Returns one row per source: ``(source, weight, natural_share,
    target_share, rate_permille)`` where rate_permille is the per-source
    keep rate to feed :func:`mixture_sample` (capped at 1000 — a source
    whose target exceeds its natural mass keeps everything; sampling
    cannot mint data, so true upsampling is an epoch-repeat concern, not
    a filter's).

    One aggregate over the corpus (weights = row counts, or a size
    column such as token counts via ``weight_col``) plus driver-free
    window math: the plan is a tiny frame, broadcast-joinable back onto
    the corpus to derive each row's ``rate_permille``.
    """
    from pyspark.sql import Window

    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1]: {alpha}")
    if not 0.0 < budget_frac <= 1.0:
        raise ValueError(f"budget_frac must be in (0, 1]: {budget_frac}")
    w = (
        F.sum(F.col(weight_col)) if weight_col else F.count(F.lit(1))
    ).cast("double")
    per = df.groupBy(source_col).agg(w.alias("weight"))
    tot = Window.partitionBy()
    per = per.withColumn(
        "natural_share", F.col("weight") / F.sum("weight").over(tot)
    )
    smoothed = F.pow(F.col("natural_share"), F.lit(float(alpha)))
    per = per.withColumn(
        "target_share", smoothed / F.sum(smoothed).over(tot)
    )
    # Keep-rate: fraction of source i retained so kept mass lands on
    # budget_frac * total distributed by target_share.
    rate = (
        F.lit(float(budget_frac))
        * F.col("target_share")
        / F.col("natural_share")
    )
    return per.select(
        source_col,
        "weight",
        F.round("natural_share", 6).alias("natural_share"),
        F.round("target_share", 6).alias("target_share"),
        F.least(F.round(rate * 1000).cast("int"), F.lit(1000)).alias(
            "rate_permille"
        ),
    )

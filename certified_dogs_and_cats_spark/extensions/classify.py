"""Linear document classification at corpus scale (fastText-style
inference): hashed bag-of-words features, a broadcast weight table, one
map-side pass — the shape of every production "quality classifier"
filtering step (e.g. scoring crawl text against a learned quality model).

Training happens elsewhere (a GPU box, scikit-learn, fastText itself);
what a 100 TB pipeline needs from the engine is INFERENCE that scales:
features are hashed to a fixed bucket space (no vocabulary shuffle, OOV
is just an unweighted bucket), the weight table is dimension-bounded
(n_buckets rows max, usually far sparser) and broadcast, and the per-doc
score is one aggregation — cost is a single pass over the tokens with a
map-side join, no corpus-sized shuffle of anything but (doc, bucket)
pairs.

Determinism: the feature hash is the same md5-prefix construction as the
rest of the engine, so scores are bit-stable across runs, partitionings,
and engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.partitioning import spread


def feature_bucket(col: str | Column, n_buckets: int, salt: str = "feat") -> Column:
    """Deterministic feature-hash bucket for a token (md5-prefix mod
    n_buckets, salted so it is independent of the engine's other hash
    decisions on the same strings)."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + "#"), c)), 1, 15), 16, 10
    ).cast("bigint")
    return (h % n_buckets).cast("int")


def hashed_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 1 << 18,
) -> DataFrame:
    """(id, bucket, tf) — hashed bag-of-words term frequencies per doc.
    One explode + one hash aggregate; collisions are the standard hashing-
    trick trade and are part of the model's own training-time geometry."""
    toks = spread(df).select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    return (
        toks.select(
            F.col(id_col), feature_bucket("tok", n_buckets).alias("bucket")
        )
        .groupBy(id_col, "bucket")
        .agg(F.count("*").cast("long").alias("tf"))
    )


def score_linear(
    df: DataFrame,
    weights: DataFrame,
    id_col: str,
    text_col: str,
    bias: float = 0.0,
    n_buckets: int = 1 << 18,
    normalize: bool = True,
) -> DataFrame:
    """(id, score, prob) — linear classifier inference over hashed
    features: ``score = bias + sum_b weight_b * tf_b [/ n_tokens]``,
    ``prob = sigmoid(score)``. ``weights`` is a (bucket, weight) frame —
    dimension-bounded, broadcast — produced by hashing a trained model's
    vocabulary through :func:`feature_bucket` with the same salt and
    ``n_buckets``. Unweighted (OOV) buckets contribute zero, exactly the
    hashing-trick inference fastText-style models run. ``normalize``
    divides by the doc's token count (mean-of-features — fastText's
    default) so long documents do not dominate by length alone.

    Docs with no tokens in the weight table still score (bias only): the
    feature join is left-outer from the docs' feature rows, and the final
    aggregate groups over every doc id present in the input."""
    feats = hashed_features(df, id_col, text_col, n_buckets=n_buckets)
    contrib = feats.join(
        F.broadcast(weights.select("bucket", "weight")), "bucket", "left"
    ).select(
        F.col(id_col),
        "tf",
        (F.coalesce(F.col("weight"), F.lit(0.0)) * F.col("tf")).alias("wtf"),
    )
    agg = contrib.groupBy(id_col).agg(
        F.sum("wtf").alias("dot"), F.sum("tf").alias("n_tokens")
    )
    denom = F.col("n_tokens") if normalize else F.lit(1.0)
    score = F.lit(float(bias)) + F.col("dot") / denom
    # Docs whose every token hashed nowhere still appear (tf rows exist
    # for every non-empty doc); truly token-free docs have no feature
    # rows and are re-attached bias-only via the left join below.
    base = df.select(F.col(id_col)).distinct()
    return (
        base.join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(score, F.lit(float(bias))).alias("score"),
        )
        .withColumn("prob", F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("score"))))
    )

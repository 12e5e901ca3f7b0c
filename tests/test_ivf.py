"""IVF ANN: learned-centroid index recall on separably clustered data, and
the plan contract (candidate join keyed on centroid_id, never cartesian)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from certified_dogs_and_cats_spark.extensions.similarity import (
    build_ivf_index,
    cosine_topk,
    ivf_topk,
)
from certified_dogs_and_cats_spark.plans import plan_text


@pytest.fixture(scope="module")
def clustered(spark):
    """120 vectors in 3 well-separated direction clusters (axis-aligned
    cones): KMeans trivially recovers them, so nprobe=1 IVF search within
    the query's own cluster must equal exact brute force."""
    base = spark.range(120).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % 3).alias("c"),
        (1.0 + (F.col("id") % 7) / 10.0).alias("m"),
        ((F.col("id") % 5) / 100.0).alias("eps"),
    )
    return base.select(
        "vec_id",
        F.array(
            F.when(F.col("c") == 0, F.col("m")).otherwise(F.col("eps")),
            F.when(F.col("c") == 1, F.col("m")).otherwise(F.col("eps")),
            F.when(F.col("c") == 2, F.col("m")).otherwise(F.col("eps")),
        ).alias("e"),
    )


def test_ivf_recall_equals_exact_on_separable_clusters(spark, clustered):
    indexed, centroids = build_ivf_index(clustered, n_centroids=3, seed=7)
    assert centroids.count() == 3
    # Every vector's neighbors live in its own cluster, so probing 1 list
    # is lossless here.
    q = clustered.filter(F.col("vec_id") < 6)
    approx = ivf_topk(indexed, centroids, q, k=3, nprobe=1)
    exact = cosine_topk(clustered, q, k=3)
    a = {(r.query_id, r.rnk): r.neighbor_id for r in approx.collect()}
    e = {(r.query_id, r.rnk): r.neighbor_id for r in exact.collect()}
    assert a == e


def test_ivf_deterministic_across_runs(spark, clustered):
    out = []
    for _ in range(2):
        indexed, centroids = build_ivf_index(clustered, n_centroids=3, seed=7)
        q = clustered.filter(F.col("vec_id") < 3)
        rows = ivf_topk(indexed, centroids, q, k=3, nprobe=2).collect()
        out.append(sorted((r.query_id, r.rnk, r.neighbor_id) for r in rows))
    assert out[0] == out[1]


def test_ivf_candidate_join_is_list_keyed(spark, clustered):
    """The corpus side of the candidate join must never shuffle: probed
    list ids and the probes relation are both tiny (|Q| x nprobe), so
    both joins carry explicit broadcast hints — the fat array rows of
    UNPROBED lists never move at all (decode-once treatment, r9). The
    only nested-loop allowed is the query-to-centroid scoring pass
    (bounded: |Q| x n_centroids)."""
    indexed, centroids = build_ivf_index(clustered, n_centroids=3, seed=7)
    q = clustered.filter(F.col("vec_id") < 6)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = ivf_topk(indexed, centroids, q, k=3, nprobe=1)
        plan = plan_text(out, "simple")
        # probes is referenced twice (distinct probed lists + fan-out),
        # so the bounded |Q| x n_centroids scoring pass appears twice —
        # recomputing that tiny subplan is cheaper than persisting it.
        assert plan.count("BroadcastNestedLoopJoin") <= 2
        assert "CartesianProduct" not in plan
        # prune-to-probed-lists + probes fan-out: both broadcast, so no
        # shuffle join anywhere on the corpus path.
        assert plan.count("BroadcastHashJoin") >= 2
        assert "SortMergeJoin" not in plan
        assert "ShuffledHashJoin" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_materialized_index_roundtrip_and_partition_pruning(
    spark, clustered, tmp_path
):
    """Build-once / query-many: a materialized index must return exactly
    the fresh-index results, and its centroid_id partitioning must let a
    probed-list read prune directories (PartitionFilters on the scan)."""
    from certified_dogs_and_cats_spark.extensions.similarity import (
        load_ivf_index,
        materialize_ivf_index,
    )

    indexed, centroids = build_ivf_index(clustered, n_centroids=3)
    path = str(tmp_path / "ivf")
    materialize_ivf_index(indexed, centroids, path)
    lists, cents = load_ivf_index(spark, path)

    queries = clustered.filter(F.col("vec_id") < 6).select("vec_id", "e")
    fresh = {
        (r.query_id, r.rnk): r.neighbor_id
        for r in ivf_topk(indexed, centroids, queries, k=3).collect()
    }
    loaded = {
        (r.query_id, r.rnk): r.neighbor_id
        for r in ivf_topk(lists, cents, queries, k=3).collect()
    }
    assert fresh == loaded and len(loaded) == 18

    plan = plan_text(lists.filter(F.col("centroid_id") == 1))
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "centroid_id" in m.group(1), plan


# --- pool_embeddings: chunk vectors -> one vector per doc ------------------


def test_pool_embeddings_mean_weighted_max(spark):
    import pytest as _pytest

    from certified_dogs_and_cats_spark.extensions.similarity import (
        pool_embeddings,
    )

    df = spark.createDataFrame(
        [
            ("d1", [1.0, 2.0], 1),
            ("d1", [3.0, 6.0], 3),
            ("d2", [5.0, -1.0], 2),
        ],
        "doc STRING, e ARRAY<DOUBLE>, n INT",
    )
    mean = {
        r.doc: list(r.pooled)
        for r in pool_embeddings(df, "doc", "e").collect()
    }
    assert mean == {"d1": [2.0, 4.0], "d2": [5.0, -1.0]}
    wmean = {
        r.doc: list(r.pooled)
        for r in pool_embeddings(df, "doc", "e", weight_col="n").collect()
    }
    assert wmean["d1"] == [(1 + 9) / 4, (2 + 18) / 4]
    mx = {
        r.doc: list(r.pooled)
        for r in pool_embeddings(df, "doc", "e", mode="max").collect()
    }
    assert mx == {"d1": [3.0, 6.0], "d2": [5.0, -1.0]}
    with _pytest.raises(ValueError):
        pool_embeddings(df, "doc", "e", mode="median")


def test_ivfpq_residual_roundtrip_and_search(spark):
    """IVF-PQ on a two-cluster corpus: residual encoding reconstructs
    near the original (residuals are small vs vectors), and nprobe=1
    search returns neighbors from the query's own cluster."""
    import math

    from certified_dogs_and_cats_spark.extensions.similarity import (
        build_ivfpq_index,
        ivfpq_topk,
    )

    # Two tight clusters far apart in R^4.
    rows = []
    for i in range(8):
        rows.append((i, [10.0 + 0.1 * i, 10.0, 0.0, 0.1 * i]))
    for i in range(8, 16):
        rows.append((i, [-10.0, -10.0 - 0.1 * i, 0.1 * i, 0.0]))
    df = spark.createDataFrame(rows, "vec_id BIGINT, e ARRAY<DOUBLE>")
    codes, cents, books = build_ivfpq_index(
        df, n_centroids=2, m=2, ksub=4, max_iter=10
    )
    assert cents.count() == 2
    got = codes.collect()
    assert len(got) == 16 and all(len(r.codes) == 2 for r in got)
    # Cluster purity: each list holds exactly one cluster.
    lists = {
        r.centroid_id: set()
        for r in got
    }
    for r in got:
        lists[r.centroid_id].add(r.vec_id < 8)
    assert all(len(v) == 1 for v in lists.values())

    q = df.filter("vec_id = 0")
    top = ivfpq_topk(codes, cents, books, q, k=3, nprobe=1).collect()
    assert len(top) == 3
    # nprobe=1 -> all neighbors from the query's own (first) cluster.
    assert all(r.neighbor_id < 8 for r in top)
    assert all(not math.isnan(r.cos_sim) for r in top)


def test_ivfpq_zero_norm_reconstruction_excluded(spark):
    """A reconstructed vector (centroid + decoded residual) that is
    all-zero has no cosine against any query — the division yields NULL
    and must be EXCLUDED before ranking, never occupy a top-k slot as a
    NULL/NaN row. Hand-built index: code 0 decodes to the zero residual
    on a zero centroid (degenerate reconstruction), code 1 to a real
    vector. A zero-norm QUERY is likewise excluded."""
    from certified_dogs_and_cats_spark.extensions.similarity import (
        ivfpq_topk,
    )

    codes = spark.createDataFrame(
        [(10, 0, [0]), (11, 0, [1])],
        "vec_id BIGINT, centroid_id INT, codes ARRAY<INT>",
    )
    centroids = spark.createDataFrame(
        [(0, [0.0, 0.0])], "centroid_id INT, centroid ARRAY<DOUBLE>"
    )
    codebooks = [[[0.0, 0.0], [1.0, 0.0]]]  # m=1, ksub=2, dsub=2
    queries = spark.createDataFrame(
        [(99, [1.0, 0.0]), (98, [0.0, 0.0])],
        "vec_id BIGINT, e ARRAY<DOUBLE>",
    )
    got = ivfpq_topk(codes, centroids, codebooks, queries, k=5, nprobe=1)
    rows = got.collect()
    # Only (query 99 -> neighbor 11): neighbor 10 reconstructs to zero
    # norm, query 98 IS zero norm — both filtered, no NULL cos_sim rows.
    assert [(r.query_id, r.neighbor_id) for r in rows] == [(99, 11)]
    assert all(r.cos_sim is not None for r in rows)
    assert abs(rows[0].cos_sim - 1.0) < 1e-9


def test_train_sample_is_partition_layout_independent(spark):
    """train_fraction sampling is a VALUE-hash filter, not sample():
    sample() draws from partition-local RNG streams, so the trained
    subset (and thus centroids and recall) would shift with the input's
    partition layout even at a fixed seed. Pins identical centroids
    across radically different layouts."""
    import random

    from certified_dogs_and_cats_spark.extensions.similarity import (
        build_ivf_index,
    )

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(400)
    ]
    base = spark.createDataFrame(rows, "vec_id BIGINT, e ARRAY<DOUBLE>")
    layouts = [base.repartition(1), base.repartition(16, "vec_id")]
    got = []
    for df in layouts:
        _, centroids = build_ivf_index(
            df, n_centroids=3, train_fraction=0.5, max_iter=5
        )
        got.append(
            sorted(tuple(r.centroid) for r in centroids.collect())
        )
    assert got[0] == got[1]


def test_train_limit_bounds_absolute_sample(spark):
    """The FAISS training contract (VERDICT r7 ask #3): train_limit
    caps the KMeans training set at an ABSOLUTE size regardless of
    corpus scale — the resolved fraction shrinks as the corpus grows,
    so a rebuild at 100 TB pays a fixed-size fit, not max_iter passes
    over a constant fraction of the corpus."""
    from certified_dogs_and_cats_spark.extensions.similarity import (
        _absolute_train_fraction,
    )

    small = spark.range(100).selectExpr("id AS vec_id")
    big = spark.range(10_000).selectExpr("id AS vec_id")
    # corpus under the limit -> train on everything
    assert _absolute_train_fraction(small, 1.0, 1000) == 1.0
    # corpus over the limit -> fraction yields ~limit rows
    assert abs(_absolute_train_fraction(big, 1.0, 1000) - 0.1) < 1e-12
    # composes with an explicit fraction by taking the smaller
    assert _absolute_train_fraction(big, 0.05, 1000) == 0.05
    # disabled -> pass-through
    assert _absolute_train_fraction(big, 0.25, None) == 0.25
    import pytest as _pytest

    with _pytest.raises(ValueError):
        _absolute_train_fraction(big, 1.0, 0)


def test_train_limit_trains_identically_across_layouts(spark):
    """train_limit selection is the same value-hash filter as
    train_fraction: identical centroids on any partition layout."""
    import random

    from certified_dogs_and_cats_spark.extensions.similarity import (
        build_ivf_index,
    )

    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(400)
    ]
    base = spark.createDataFrame(rows, "vec_id BIGINT, e ARRAY<DOUBLE>")
    got = []
    for df in (base.repartition(1), base.repartition(16, "vec_id")):
        _, centroids = build_ivf_index(
            df, n_centroids=3, train_limit=200, max_iter=5
        )
        got.append(sorted(tuple(r.centroid) for r in centroids.collect()))
    assert got[0] == got[1]


def test_sample_threshold_survives_extreme_corpus_sizes():
    """ADVICE r8 (medium): the value-hash keep-threshold must not floor
    to 0 when fraction = train_limit / n at 100 TB-scale row counts —
    an empty training sample is a degenerate/crashing KMeans build. The
    1e12-bucket modulus keeps resolution to ~1e15 rows and the clamp
    guarantees >= 1 bucket beyond that; small-corpus distortion from
    flooring stays under one part in 1e5."""
    from certified_dogs_and_cats_spark.extensions.similarity import (
        _SAMPLE_BUCKETS,
        _sample_threshold,
    )

    limit = 1024
    for n in (10**9, 10**12, 10**15, 10**18):
        assert _sample_threshold(limit / n) >= 1
    # resolution: the realized fraction tracks the requested one
    for n in (10**5, 10**7, 10**9):
        frac = limit / n
        realized = _sample_threshold(frac) / _SAMPLE_BUCKETS
        assert abs(realized - frac) / frac < 1e-5
    assert _sample_threshold(1.0) == _SAMPLE_BUCKETS


def test_value_hash_sample_selects_expected_share(spark):
    """Behavioral check of the 64-bit sampler: at fraction=0.2 over 2k
    distinct values the kept share lands near 0.2 (binomial 3-sigma
    band), and the SAME rows are kept on any partition layout."""
    from certified_dogs_and_cats_spark.extensions.similarity import (
        _value_hash_sample,
    )

    base = spark.range(2000).selectExpr("CAST(id AS STRING) AS v")
    kept = []
    for df in (base.repartition(1), base.repartition(16)):
        got = sorted(
            r.v for r in _value_hash_sample(df, "v", 0.2, 42).collect()
        )
        kept.append(got)
    assert kept[0] == kept[1]
    n = len(kept[0])
    assert abs(n - 400) < 3 * (2000 * 0.2 * 0.8) ** 0.5 + 1


def test_prune_gate_small_corpus_same_rows(spark):
    """ivf_topk with corpus_rows below the prune floor must return the
    SAME rows as the pruned path — the gate changes the plan, never the
    result."""
    from certified_dogs_and_cats_spark.extensions.similarity import (
        IVF_PRUNE_MIN_ROWS,
        build_ivf_index,
        ivf_topk,
    )

    v = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    indexed, cents = build_ivf_index(v, n_centroids=4, max_iter=4)
    q = indexed.limit(5).select("vec_id", "e")
    a = sorted(
        map(tuple, ivf_topk(indexed, cents, q, k=3, nprobe=2).collect())
    )
    b = sorted(
        map(
            tuple,
            ivf_topk(
                indexed, cents, q, k=3, nprobe=2, corpus_rows=100
            ).collect(),
        )
    )
    c = sorted(
        map(
            tuple,
            ivf_topk(
                indexed,
                cents,
                q,
                k=3,
                nprobe=2,
                corpus_rows=IVF_PRUNE_MIN_ROWS + 1,
            ).collect(),
        )
    )
    assert a == b == c

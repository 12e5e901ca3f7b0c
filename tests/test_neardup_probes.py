"""Multi-probe embedding near-dup: recall vs brute force improves with
probes, and every emitted pair is exact-verified (precision 1.0)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from certified_dogs_and_cats_spark.extensions.dedup import (
    embedding_near_dup_pairs,
)
from certified_dogs_and_cats_spark.extensions.similarity import (
    as_double_vec,
    dot,
    with_norm,
)

SF_DIR = "/root/testdata/sf0.001"
THRESHOLD = 0.3
BITS = 4

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def vectors(spark):
    df = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", as_double_vec("embedding").alias("e"))
        .persist()
    )
    yield df
    df.unpersist()


def brute_force_pairs(vectors):
    b = with_norm(vectors, "e", "nrm")
    left = b.select(
        F.col("vec_id").alias("id_a"), F.col("e").alias("ea"),
        F.col("nrm").alias("nrm_a"),
    )
    right = b.select(
        F.col("vec_id").alias("id_b"), F.col("e").alias("eb"),
        F.col("nrm").alias("nrm_b"),
    )
    cos = F.round(
        dot(F.col("ea"), F.col("eb")) / (F.col("nrm_a") * F.col("nrm_b")), 6
    )
    return (
        left.crossJoin(right)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= THRESHOLD)
    )


def test_multi_probe_recall_improves(vectors):
    truth = {(r.id_a, r.id_b) for r in brute_force_pairs(vectors).collect()}
    assert truth, "threshold too high for fixture data"
    one = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(
            vectors, THRESHOLD, bits=BITS, n_probes=1
        ).collect()
    }
    two = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(
            vectors, THRESHOLD, bits=BITS, n_probes=2
        ).collect()
    }
    # Exact verify => no false positives, ever.
    assert one <= truth and two <= truth
    # OR-ing a second independent bucketing can only add candidates, and on
    # real data it recovers pairs probe 0's sign boundaries split.
    assert one <= two
    assert len(two) > len(one)
    assert len(two) / len(truth) > len(one) / len(truth)


def test_multi_probe_pairs_are_distinct(vectors):
    out = embedding_near_dup_pairs(
        vectors, THRESHOLD, bits=BITS, n_probes=2
    )
    n = out.count()
    assert out.select("id_a", "id_b").distinct().count() == n


def test_connected_components_shapes(spark):
    """Chain (transitivity), clique, and a disjoint pair must each collapse
    to min-id components; nodes not in any edge are absent."""
    from certified_dogs_and_cats_spark.extensions.dedup import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [
            # chain 1-2-3-4 (no direct 1-4 edge)
            (1, 2), (2, 3), (3, 4),
            # clique 10-11-12
            (10, 11), (11, 12), (10, 12),
            # disjoint pair
            (20, 21),
        ],
        "id_a long, id_b long",
    )
    got = {
        r.node: r.component for r in connected_components(edges).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }


def test_probe_bits_beyond_dim_raise(vectors):
    """n_probes*bits > vector dim must fail loudly at execution — silent
    NULL components would collapse later probes into near-constant buckets
    (quadratic candidates, zero recall gain)."""
    out = embedding_near_dup_pairs(vectors, THRESHOLD, bits=16, n_probes=5)
    with pytest.raises(Exception, match="exceeds vector dim"):
        out.count()


def test_connected_components_nonconvergence_raises(spark):
    from certified_dogs_and_cats_spark.extensions.dedup import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=1)

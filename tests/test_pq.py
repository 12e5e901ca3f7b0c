"""Product-quantization (train/encode/decode/search) unit tests.

Codebooks are plain nested lists, so most tests bypass KMeans entirely and
pin exact behavior against handcrafted codebooks; one test exercises the
trained path end to end.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from certified_dogs_and_cats_spark.extensions.similarity import (
    pq_decode,
    pq_encode,
    pq_topk,
    train_pq_codebooks,
)

# m=2 subspaces of 2 dims; nearest-centroid assignment is obvious by eye.
BOOKS = [
    [[0.0, 0.0], [10.0, 10.0]],          # subspace 0: origin vs far
    [[1.0, 0.0], [0.0, 1.0], [5.0, 5.0]],  # subspace 1: 3 centroids
]


def _vec_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id BIGINT, e ARRAY<DOUBLE>")


def test_encode_matches_python_argmin(spark):
    rows = [
        (1, [0.2, -0.1, 0.9, 0.1]),   # sub0 -> 0, sub1 -> 0 (near [1,0])
        (2, [9.0, 11.0, 4.0, 6.0]),   # sub0 -> 1, sub1 -> 2
        (3, [0.0, 0.0, 0.4, 0.6]),    # sub0 -> 0, sub1 -> 1 (near [0,1])
    ]
    got = {
        r["vec_id"]: r["codes"]
        for r in pq_encode(_vec_df(spark, rows), BOOKS).collect()
    }
    # Python reference argmin with first-min tie-break.
    for vid, e in rows:
        want = []
        for j, book in enumerate(BOOKS):
            sub = e[j * 2 : j * 2 + 2]
            dists = [
                sum((x - y) ** 2 for x, y in zip(sub, c)) for c in book
            ]
            want.append(dists.index(min(dists)))
        assert got[vid] == want, vid


def test_encode_tie_breaks_to_lowest_code(spark):
    # Equidistant from both subspace-0 centroids -> code 0 (array_position
    # finds the FIRST minimum).
    df = _vec_df(spark, [(1, [5.0, 5.0, 1.0, 0.0])])
    assert pq_encode(df, BOOKS).collect()[0]["codes"][0] == 0


def test_decode_reconstructs_selected_centroids(spark):
    df = _vec_df(spark, [(1, [9.0, 11.0, 4.0, 6.0])])
    out = pq_decode(pq_encode(df, BOOKS), BOOKS).collect()[0]
    assert out["e_hat"] == [10.0, 10.0, 5.0, 5.0]


def test_decode_dim_matches_input(spark):
    df = _vec_df(spark, [(1, [0.1] * 4), (2, [0.9] * 4)])
    for r in pq_decode(pq_encode(df, BOOKS), BOOKS).collect():
        assert len(r["e_hat"]) == 4


def test_pq_topk_exact_when_codebook_holds_the_vectors(spark):
    # Vectors that ARE centroids reconstruct losslessly, so PQ search
    # equals exact search.
    rows = [
        (1, [0.0, 0.0, 1.0, 0.0]),
        (2, [10.0, 10.0, 5.0, 5.0]),
        (3, [0.0, 0.0, 0.0, 1.0]),
    ]
    corpus = _vec_df(spark, rows)
    codes = pq_encode(corpus, BOOKS).select("vec_id", "codes")
    out = pq_topk(codes, BOOKS, corpus, k=1).collect()
    got = {r["query_id"]: r["neighbor_id"] for r in out}
    # Cosine: 1 and 3 are orthogonal (cos 0), both see 2 at cos
    # 5/15.81 ~ 0.316 -> nearest is 2 for both; 2 ties between 1 and 3
    # (0.316 each) -> id-asc tie-break picks 1.
    assert got[1] == 2 and got[3] == 2 and got[2] == 1


def test_train_shared_codebook_replicates_one_book(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(60)
    ]
    books = train_pq_codebooks(
        _vec_df(spark, rows), m=4, ksub=2, max_iter=3, shared=True
    )
    assert len(books) == 4
    assert all(b == books[0] for b in books)
    assert len(books[0]) == 2 and len(books[0][0]) == 2


def test_train_rejects_indivisible_dim(spark):
    df = _vec_df(spark, [(1, [0.1, 0.2, 0.3])])
    with pytest.raises(ValueError, match="not divisible"):
        train_pq_codebooks(df, m=2, ksub=2)


def test_finer_subspaces_reduce_reconstruction_error(spark):
    # More subspaces = finer quantization: squared reconstruction error
    # must not grow when m doubles (same ksub, same training data).
    import random

    rng = random.Random(11)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(80)
    ]
    df = _vec_df(spark, rows)

    def err(m):
        books = train_pq_codebooks(
            df, m=m, ksub=4, max_iter=5, shared=True
        )
        rec = pq_decode(pq_encode(df, books), books)
        return rec.select(
            F.aggregate(
                F.zip_with("e", "e_hat", lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda a, x: a + x,
            ).alias("se")
        ).agg(F.sum("se")).collect()[0][0]

    e2, e8 = err(2), err(8)
    assert e8 <= e2 + 1e-9, (e2, e8)
    assert not math.isnan(e8)

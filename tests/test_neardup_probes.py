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


def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_alternating_beats_minlabel_rounds_on_chain(spark):
    """Label propagation needs ~diameter rounds on a path; the alternating
    large-star/small-star algorithm collapses it in O(log^2 n) — the round-4
    upgrade for power-law / long-chain dedup graphs."""
    from certified_dogs_and_cats_spark.extensions.dedup import (
        connected_components,
    )

    path = [(i, i + 1) for i in range(16)]  # diameter 16
    df = spark.createDataFrame(path, "id_a long, id_b long")

    alt_stats, ml_stats = {}, {}
    alt = {
        r.node: r.component
        for r in connected_components(
            df, algorithm="alternating", stats=alt_stats
        ).collect()
    }
    ml = {
        r.node: r.component
        for r in connected_components(
            df, algorithm="minlabel", max_iter=50, stats=ml_stats
        ).collect()
    }
    expected = dict.fromkeys(range(17), 0)
    assert alt == expected and ml == expected
    assert alt_stats["rounds"] < ml_stats["rounds"], (alt_stats, ml_stats)


def test_alternating_powerlaw_graph_and_reliable_checkpoint(spark, tmp_path):
    """Preferential-attachment-ish tangle (hubs + chains + cliques): result
    must match a union-find oracle; reliable checkpointing must not change
    the answer (durability option for executor-loss survival)."""
    from certified_dogs_and_cats_spark.extensions.dedup import (
        connected_components,
    )

    edges = []
    # hub 0 with spokes, chained sub-hubs, a clique, and a disjoint chain
    edges += [(0, i) for i in range(1, 12)]
    edges += [(3, 20 + i) for i in range(6)]
    edges += [(25, 40), (40, 41), (41, 42)]
    edges += [(100, 101), (100, 102), (101, 102), (102, 103)]
    edges += [(200, 201), (201, 202), (202, 203), (203, 204)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    expected = _union_find_components(edges)

    got = {
        r.node: r.component for r in connected_components(df).collect()
    }
    assert got == expected

    ckpt = {
        r.node: r.component
        for r in connected_components(
            df, reliable_checkpoint_dir=str(tmp_path / "ckpt")
        ).collect()
    }
    assert ckpt == expected


def test_connected_components_empty_and_selfloop_edges(spark):
    from certified_dogs_and_cats_spark.extensions.dedup import (
        connected_components,
    )

    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(empty).count() == 0
    # Self-loops carry no connectivity but their node must still label
    # itself (it appeared in the edge list).
    loops = spark.createDataFrame([(7, 7), (1, 2)], "id_a long, id_b long")
    got = {r.node: r.component for r in connected_components(loops).collect()}
    assert got == {1: 1, 2: 1, 7: 7}


def test_blocked_edit_distance_pairs(spark):
    """Blocking: cross-block pairs never form even at distance 0; the
    length-difference prune cannot drop a true pair (edit distance is
    lower-bounded by the length difference)."""
    from certified_dogs_and_cats_spark.extensions.dedup import (
        blocked_edit_distance_pairs,
    )

    df = spark.createDataFrame(
        [
            (1, "kitten", "x"),
            (2, "sitting", "x"),
            (3, "kitten", "y"),  # same text, other block
            (4, "kit", "x"),     # len diff 3 from kitten, dist 3
            (5, "a" * 40, "x"),  # len diff too large for any partner
        ],
        "id long, name string, blk string",
    )
    out = sorted(
        (r.blk, r.id_a, r.id_b, r.dist)
        for r in blocked_edit_distance_pairs(
            df, "id", "name", ["blk"], max_dist=3
        ).collect()
    )
    assert out == [("x", 1, 2, 3), ("x", 1, 4, 3)]


def test_prefix_filter_jaccard_is_lossless(spark):
    """Prefix filtering must find EXACTLY the pairs the uncapped
    all-pairs computation finds — it is a lossless bound, not a
    heuristic like the df cap."""
    from certified_dogs_and_cats_spark.extensions.dedup import (
        jaccard_pairs,
        prefix_filter_jaccard_pairs,
        word_shingles,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy cat today"),
        (3, "an entirely different document about spark plans"),
        (4, "the quick brown fox jumps over the lazy dog today"),
        (5, "an entirely different document about spark engines"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = word_shingles(df, "doc_id", "text", n=3, as_hash=True)
    exact = {
        (r.a_id, r.b_id, round(r.jaccard, 9))
        for r in jaccard_pairs(sh, "doc_id", 0.5, max_shingle_df=None).collect()
    }
    pf = {
        (r.a_id, r.b_id, round(r.jaccard, 9))
        for r in prefix_filter_jaccard_pairs(sh, "doc_id", 0.5).collect()
    }
    assert pf == exact and exact  # non-empty and identical


def test_sorted_neighborhood_pairs_semantics(spark):
    """Candidates are exactly each record's `window` successors in
    (text, id)-sorted order within the block; matches respect max_dist;
    candidate count is linear (N*W - tail), never quadratic."""
    from certified_dogs_and_cats_spark.extensions.dedup import (
        sorted_neighborhood_pairs,
    )

    rows = [
        # block A sorts as: abc(1), abd(2), abe(3), xyz(4)
        (1, "abc", "A"),
        (2, "abd", "A"),
        (3, "abe", "A"),
        (4, "xyz", "A"),
        # block B: single record -> no candidates
        (5, "zzz", "B"),
    ]
    df = spark.createDataFrame(rows, "id BIGINT, name STRING, blk STRING")
    got = {
        (r.id_a, r.id_b): r.dist
        for r in sorted_neighborhood_pairs(
            df, "id", "name", ["blk"], window=2, max_dist=2
        ).collect()
    }
    # window=2 candidates in A: (1,2),(1,3),(2,3),(2,4),(3,4);
    # dist<=2 keeps the abc/abd/abe triangle, drops the xyz pairs.
    assert got == {(1, 2): 1, (1, 3): 1, (2, 3): 1}

    # Linear candidate bound: N=40 in one block, window=3 ->
    # 3*40 - (3+2+1) = 114 candidates, not C(40,2)=780.
    big = spark.createDataFrame(
        [(i, f"name{i:03d}", "A") for i in range(40)],
        "id BIGINT, name STRING, blk STRING",
    )
    cand = sorted_neighborhood_pairs(
        big, "id", "name", ["blk"], window=3, max_dist=10**9
    )
    assert cand.count() == 3 * 40 - 6


def test_sorted_neighborhood_null_sort_keys_pinned_last(spark):
    """The neighborhood window must sort NULLS LAST explicitly: Spark's
    bare asc() is NULLS FIRST while the DuckDB oracles' ORDER BY ... ASC
    defaults to NULLS LAST, so a nullable sort column would silently
    produce different candidate sets cross-engine. Pins the window spec
    in the optimized plan and that null-text rows never yield matches."""
    from certified_dogs_and_cats_spark.extensions.dedup import (
        sorted_neighborhood_pairs,
    )

    rows = [
        (1, "abc", "A"),
        (2, "abd", "A"),
        (3, None, "A"),
        (4, None, "A"),
    ]
    df = spark.createDataFrame(rows, "id BIGINT, name STRING, blk STRING")
    pairs = sorted_neighborhood_pairs(
        df, "id", "name", ["blk"], window=2, max_dist=3
    )
    plan = pairs._jdf.queryExecution().optimizedPlan().toString()
    assert "ASC NULLS LAST" in plan and "ASC NULLS FIRST" not in plan
    got = {(r.id_a, r.id_b): r.dist for r in pairs.collect()}
    # Nulls-last order: abc(1), abd(2), null(3), null(4) — the only
    # non-null-text candidate within the window is (1,2); null-text
    # candidates produce NULL distances and are filtered.
    assert got == {(1, 2): 1}


def test_blocked_edit_distance_max_block_caps_candidates(spark):
    """max_block sub-blocking bounds the quadratic in-block self-join:
    candidates form only within sorted sub-blocks of <= max_block rows,
    so per-block work is n * max_block (linear), not n^2. Blocks smaller
    than the cap are untouched (identical output to the uncapped path);
    an oversized block's pair count drops from C(n,2) to
    ceil(n/K) sub-blocks' worth."""
    from certified_dogs_and_cats_spark.extensions.dedup import (
        blocked_edit_distance_pairs,
    )

    # One 30-row block of names sharing a long common prefix: every pair
    # is within dist<=12, so pair counts measure candidates exactly.
    rows = [(i, f"commonprefix{i:02d}", "A") for i in range(30)]
    df = spark.createDataFrame(rows, "id BIGINT, name STRING, blk STRING")
    uncapped = blocked_edit_distance_pairs(
        df, "id", "name", ["blk"], max_dist=12
    )
    assert uncapped.count() == 30 * 29 // 2  # 435
    capped = blocked_edit_distance_pairs(
        df, "id", "name", ["blk"], max_dist=12, max_block=10
    )
    # 3 sorted sub-blocks of 10 -> 3 * C(10,2) = 135 pairs, and every
    # capped pair is an uncapped pair (sub-blocking only prunes).
    assert capped.count() == 3 * 45
    cap_set = {(r.id_a, r.id_b) for r in capped.collect()}
    unc_set = {(r.id_a, r.id_b) for r in uncapped.collect()}
    assert cap_set < unc_set

    # Cap >= block size: identical output to the uncapped path.
    wide = blocked_edit_distance_pairs(
        df, "id", "name", ["blk"], max_dist=12, max_block=30
    )
    assert {(r.id_a, r.id_b) for r in wide.collect()} == unc_set


def test_containment_pairs_directions_and_threshold(spark):
    """containment(A in B) = |A∩B|/|A| is DIRECTED: a small set inside a
    big one scores ~1 as src and low as dst — the asymmetry Jaccard
    collapses. Pins both directions and the threshold gate."""
    from certified_dogs_and_cats_spark.extensions.dedup import (
        containment_pairs,
    )

    # doc 1: {10, 20}; doc 2: {10, 20, 30, 40, 50} -> containment(1 in 2)
    # = 2/2 = 1.0, containment(2 in 1) = 2/5 = 0.4.
    rows = [(1, 10), (1, 20)] + [(2, s) for s in (10, 20, 30, 40, 50)]
    sh = spark.createDataFrame(rows, "doc_id BIGINT, shingle BIGINT")
    got = {
        (r.src_id, r.dst_id): (r.inter, r.src_n, r.containment)
        for r in containment_pairs(sh, "doc_id", 0.6).collect()
    }
    assert got == {(1, 2): (2, 2, 1.0)}  # 0.4 direction gated out
    both = {
        (r.src_id, r.dst_id): r.containment
        for r in containment_pairs(sh, "doc_id", 0.0).collect()
    }
    assert both == {(1, 2): 1.0, (2, 1): 0.4}

"""Fixed-point PageRank (extensions/graph.py)."""

from __future__ import annotations

from certified_dogs_and_cats_spark.extensions.graph import (
    SCALE,
    pagerank_fixed_point,
)

TELEPORT = 15 * SCALE // 100


def _g(spark, nodes, edges):
    n = spark.createDataFrame([(x,) for x in nodes], "node BIGINT")
    e = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    return n, e


def test_two_node_cycle_is_symmetric(spark):
    n, e = _g(spark, [1, 2], [(1, 2), (2, 1)])
    r = {x.node: x.rank_fp for x in pagerank_fixed_point(n, e, 5).collect()}
    assert r[1] == r[2]
    assert r[1] > TELEPORT  # cycle keeps circulating mass above teleport


def test_hub_outranks_leaves(spark):
    # Leaves 2..5 all point at 1; 1 points back at 2.
    n, e = _g(spark, [1, 2, 3, 4, 5], [(2, 1), (3, 1), (4, 1), (5, 1), (1, 2)])
    r = {x.node: x.rank_fp for x in pagerank_fixed_point(n, e, 5).collect()}
    assert r[1] > max(r[k] for k in (2, 3, 4, 5))
    # 2 receives 1's damped mass; 3-5 receive nothing (bare teleport).
    assert r[2] > r[3] == r[4] == r[5] == TELEPORT


def test_out_degree_splits_contribution(spark):
    # 1 fans out to 2 and 3: each gets (r DIV 2) damped; with 4 getting
    # 1's full mass via a second source of the same rank, 4 > 2.
    n, e = _g(spark, [1, 2, 3, 4, 5], [(1, 2), (1, 3), (5, 4)])
    r = {x.node: x.rank_fp for x in pagerank_fixed_point(n, e, 1).collect()}
    assert r[2] == r[3]
    assert r[4] > r[2]
    assert r[4] == TELEPORT + SCALE * 85 // 100


def test_deterministic_across_partitionings(spark):
    nodes = list(range(1, 101))
    edges = [(k, (k * 7) % 100 + 1) for k in nodes]
    n1, e1 = _g(spark, nodes, edges)
    a = sorted(
        (x.node, x.rank_fp) for x in pagerank_fixed_point(n1, e1, 4).collect()
    )
    n2 = spark.createDataFrame([(x,) for x in nodes], "node BIGINT").repartition(7)
    e2 = spark.createDataFrame(edges, "src BIGINT, dst BIGINT").repartition(3)
    b = sorted(
        (x.node, x.rank_fp) for x in pagerank_fixed_point(n2, e2, 4).collect()
    )
    assert a == b


def test_label_propagation_star_collapses_to_hub_min_label(spark):
    from certified_dogs_and_cats_spark.extensions.graph import (
        label_propagation,
    )

    # Undirected star around 1 plus an isolated node 9.
    nodes = spark.createDataFrame([(x,) for x in (1, 2, 3, 4, 9)], "node BIGINT")
    star = [(1, 2), (1, 3), (1, 4)]
    edges = spark.createDataFrame(
        star + [(b, a) for a, b in star], "src BIGINT, dst BIGINT"
    )
    out = {r.node: r.label for r in label_propagation(nodes, edges, 2).collect()}
    # Round 1: leaves adopt 1 (their only neighbor); hub adopts min leaf 2.
    # Round 2: leaves see hub's label 2... after two synchronous rounds
    # every star member carries a label from {1, 2}; the isolated node
    # keeps its own forever.
    assert out[9] == 9
    assert set(out[n] for n in (1, 2, 3, 4)) <= {1, 2}


def test_label_propagation_deterministic_across_partitionings(spark):
    from certified_dogs_and_cats_spark.extensions.graph import (
        label_propagation,
    )

    nodes = list(range(1, 81))
    edges = [(k, k // 2) for k in nodes if k >= 2]
    edges = edges + [(b, a) for a, b in edges]
    n1 = spark.createDataFrame([(x,) for x in nodes], "node BIGINT")
    e1 = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    a = sorted(
        (r.node, r.label) for r in label_propagation(n1, e1, 3).collect()
    )
    b = sorted(
        (r.node, r.label)
        for r in label_propagation(
            n1.repartition(5), e1.repartition(3), 3
        ).collect()
    )
    assert a == b


def test_hits_authority_concentrates_at_sinks(spark):
    from certified_dogs_and_cats_spark.extensions.graph import (
        hits_fixed_point,
    )

    # Star pointing INTO node 1: 1 is the only authority, leaves the hubs.
    nodes = spark.createDataFrame([(x,) for x in (1, 2, 3, 4)], "node BIGINT")
    edges = spark.createDataFrame(
        [(2, 1), (3, 1), (4, 1)], "src BIGINT, dst BIGINT"
    )
    out = {r.node: (r.hub, r.auth) for r in hits_fixed_point(nodes, edges, 2).collect()}
    assert out[1][1] > 0 and all(out[k][1] == 0 for k in (2, 3, 4))
    assert all(out[k][0] > 0 for k in (2, 3, 4)) and out[1][0] == 0
    assert out[2] == out[3] == out[4]  # symmetric hubs


def test_hits_deterministic_across_partitionings(spark):
    from certified_dogs_and_cats_spark.extensions.graph import (
        hits_fixed_point,
    )

    nodes = list(range(1, 61))
    edges = [(k, k // 2) for k in nodes if k >= 2]
    n1 = spark.createDataFrame([(x,) for x in nodes], "node BIGINT")
    e1 = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    a = sorted(
        (r.node, r.hub, r.auth)
        for r in hits_fixed_point(n1, e1, 3).collect()
    )
    b = sorted(
        (r.node, r.hub, r.auth)
        for r in hits_fixed_point(
            n1.repartition(7), e1.repartition(4), 3
        ).collect()
    )
    assert a == b


def test_bfs_depths_on_path_with_branch(spark):
    from certified_dogs_and_cats_spark.extensions.graph import bfs_depths

    # 1 -> 2 -> 3 -> 4 plus a branch 2 -> 5; node 9 is unreachable.
    nodes = spark.createDataFrame(
        [(x,) for x in (1, 2, 3, 4, 5, 9)], "node BIGINT"
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (2, 5)], "src BIGINT, dst BIGINT"
    )
    out = {r.node: r.depth for r in bfs_depths(nodes, edges, 1).collect()}
    assert out == {1: 0, 2: 1, 3: 2, 4: 3, 5: 2}  # 9 absent


def test_bfs_early_exit_and_max_depth_cap(spark):
    from certified_dogs_and_cats_spark.extensions.graph import bfs_depths

    nodes = spark.createDataFrame([(x,) for x in (1, 2, 3)], "node BIGINT")
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src BIGINT, dst BIGINT")
    # max_depth=1 would silently truncate (node 3 lives at depth 2):
    # the traversal must refuse rather than return a partial answer.
    import pytest

    with pytest.raises(RuntimeError, match="frontier still expanding"):
        bfs_depths(nodes, edges, 1, max_depth=1).collect()
    # Cap exactly at the true depth: drained, no raise, full answer.
    exact = {
        r.node: r.depth
        for r in bfs_depths(nodes, edges, 1, max_depth=2).collect()
    }
    assert exact == {1: 0, 2: 1, 3: 2}
    # Cycle: revisiting 1 must not loop or relabel it.
    cyc = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src BIGINT, dst BIGINT"
    )
    out = {r.node: r.depth for r in bfs_depths(nodes, cyc, 1, max_depth=10).collect()}
    assert out == {1: 0, 2: 1, 3: 2}


def test_sssp_shortcut_beats_longer_tree_path(spark):
    from certified_dogs_and_cats_spark.extensions.graph import sssp_distances

    # Chain 1-2-3-4 with weight 5 each, plus a shortcut 1->4 of weight 6:
    # the relaxation must prefer 6 over 15, and 3 keeps its chain dist.
    nodes = spark.createDataFrame([(x,) for x in (1, 2, 3, 4)], "node BIGINT")
    edges = spark.createDataFrame(
        [(1, 2, 5), (2, 3, 5), (3, 4, 5), (1, 4, 6)],
        "src BIGINT, dst BIGINT, weight BIGINT",
    )
    out = {r.node: r.dist for r in sssp_distances(nodes, edges, 1).collect()}
    assert out == {1: 0, 2: 5, 3: 10, 4: 6}


def test_sssp_later_round_improves_visited_node(spark):
    from certified_dogs_and_cats_spark.extensions.graph import sssp_distances

    # 1->3 weight 10 settles 3 in round 1; the 1->2->3 path (4+4=8) must
    # still overwrite it in round 2 — the case plain BFS state can't fix.
    nodes = spark.createDataFrame([(x,) for x in (1, 2, 3)], "node BIGINT")
    edges = spark.createDataFrame(
        [(1, 3, 10), (1, 2, 4), (2, 3, 4)],
        "src BIGINT, dst BIGINT, weight BIGINT",
    )
    out = {r.node: r.dist for r in sssp_distances(nodes, edges, 1).collect()}
    assert out == {1: 0, 2: 4, 3: 8}


def test_sssp_raises_when_rounds_exhausted(spark):
    import pytest

    from certified_dogs_and_cats_spark.extensions.graph import sssp_distances

    nodes = spark.createDataFrame([(x,) for x in (1, 2, 3, 4)], "node BIGINT")
    edges = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (3, 4, 1)],
        "src BIGINT, dst BIGINT, weight BIGINT",
    )
    with pytest.raises(RuntimeError, match="max_rounds"):
        sssp_distances(nodes, edges, 1, max_rounds=2)


def test_iterative_graph_ops_reliable_checkpoint(spark, tmp_path):
    """Every iterative graph op survives rounds under durable (reliable)
    checkpointing with values identical to the executor-local default —
    checkpointing is a lineage/durability choice, never a semantics one."""
    from certified_dogs_and_cats_spark.extensions.graph import (
        bfs_depths,
        label_propagation,
        pagerank_fixed_point,
        sssp_distances,
    )

    nodes = spark.createDataFrame([(x,) for x in range(1, 9)], "node BIGINT")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (2, 6), (6, 7), (7, 8)],
        "src BIGINT, dst BIGINT",
    )
    wedges = edges.selectExpr("src", "dst", "CAST(src + dst AS BIGINT) AS weight")
    ck = str(tmp_path / "gckpt")

    base_bfs = {r.node: r.depth for r in bfs_depths(nodes, edges, 1).collect()}
    rel_bfs = {
        r.node: r.depth
        for r in bfs_depths(
            nodes, edges, 1, reliable_checkpoint_dir=ck
        ).collect()
    }
    assert rel_bfs == base_bfs and base_bfs[8] == 4

    base_sp = {r.node: r.dist for r in sssp_distances(nodes, wedges, 1).collect()}
    rel_sp = {
        r.node: r.dist
        for r in sssp_distances(
            nodes, wedges, 1, reliable_checkpoint_dir=ck
        ).collect()
    }
    assert rel_sp == base_sp

    base_pr = {
        r.node: r.rank_fp for r in pagerank_fixed_point(nodes, edges).collect()
    }
    rel_pr = {
        r.node: r.rank_fp
        for r in pagerank_fixed_point(
            nodes, edges, reliable_checkpoint_dir=ck, checkpoint_every=2
        ).collect()
    }
    assert rel_pr == base_pr

    sym = edges.union(edges.selectExpr("dst AS src", "src AS dst"))
    base_lp = {
        r.node: r.label for r in label_propagation(nodes, sym).collect()
    }
    rel_lp = {
        r.node: r.label
        for r in label_propagation(
            nodes, sym, reliable_checkpoint_dir=ck, checkpoint_every=1
        ).collect()
    }
    assert rel_lp == base_lp

"""Iterative graph algorithms as DataFrame loops.

Complements the pairs-to-clusters connected components in
:mod:`extensions.dedup` with the fixed-iteration message-passing family —
PageRank (damped diffusion), synchronous label propagation (community
detection), and HITS (hubs/authorities) — all on one template: contribute
along edges -> aggregate at the target -> update, O(N) loop state, exact
integer/deterministic update rules so unrolled-SQL oracles hash-match.

All rank arithmetic is FIXED-POINT INTEGER (rank x 10^12 as BIGINT):
multiply by the damping factor is integer multiply + floor division, sums
are exact, so results are bit-identical across partitionings, engines, and
runs — an unrolled plain-SQL replay of the same iterations hash-matches
(floating-point PageRank never would: per-node sums accumulate in
partition order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12

# Rows below which a traversal-loop state frame gets a broadcast hint
# ((bigint, int/bigint) rows -> ~32 MB at the cap, well under the 8 GB
# broadcast hard limit and typical executor headroom).
_BCAST_ROWS = 2_000_000


def _round_ckpt(spark, reliable_checkpoint_dir: str | None):
    """LAZY per-round lineage truncation for the traversal loops.

    Returns a function that marks a frame for checkpointing WITHOUT
    launching the materialization job: the caller's next action (the
    convergence probe, always a full-scan count/aggregate here) computes
    every partition, which materializes the checkpoint as a side effect —
    one job per round where the old eager-checkpoint + limit(1).count()
    pair paid two. With ``reliable_checkpoint_dir`` set, rounds persist to
    a durable store and survive executor loss (the option a 1000-executor
    run needs; executor-local blocks die with their executor).
    """
    if reliable_checkpoint_dir is None:
        return lambda df: df.localCheckpoint(eager=False)
    spark.sparkContext.setCheckpointDir(reliable_checkpoint_dir)
    return lambda df: df.checkpoint(eager=False)


def pagerank_fixed_point(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 5,
    damping_pct: int = 85,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    reliable_checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
) -> DataFrame:
    """(node, rank_fp): PageRank after ``iterations`` rounds, ranks in
    fixed point (true rank x 10^12, un-normalized: teleport mass is
    (100-damping_pct)% of SCALE per node rather than divided by N, which
    only rescales the ranking).

    Each iteration: contribution = rank DIV out_degree along every edge,
    damped by ``damping_pct`` (integer multiply, floor division — exact),
    summed per target, teleport added; nodes with no in-edges keep the
    bare teleport mass. Dangling nodes (no out-edges) leak their mass —
    acceptable for ranking; add a sink redistribution if mass
    conservation matters.

    Plan shape per iteration: one join of the rank frame with the edge
    frame on the source (both shuffle on their keys; at scale,
    pre-partition/bucket BOTH by node id so iterations reuse the layout)
    + ONE hash aggregate on the target over the union of the raw
    contributions and a zero row per node — the union replaces the old
    per-round left join back onto the node list (same integer sums,
    partial map-side aggregation still applies to both union legs, one
    fewer exchange + join per round; measured r12). The edge frame and
    out-degrees are computed once and persisted; the loop only iterates
    the (node, rank) frame — O(N) state per round, never edge-count
    state.

    ``checkpoint_every=k`` truncates the rank frame's lineage every k
    rounds (0 = never: at the default 5 iterations the unrolled plan is
    small; at 20+ iterations on a cluster, pass k=2-5 and a
    ``reliable_checkpoint_dir`` so analysis cost stays flat and rounds
    survive executor loss). Checkpointing never changes values — the
    arithmetic is exact integer, so oracle hashes are unaffected.
    """
    from ..cache import tracked_persist

    ckpt = (
        _round_ckpt(nodes.sparkSession, reliable_checkpoint_dir)
        if checkpoint_every > 0 or reliable_checkpoint_dir is not None
        else None
    )
    every = checkpoint_every or 1
    teleport = (100 - damping_pct) * SCALE // 100
    deg = edges.groupBy(src_col).agg(F.count("*").alias("__deg__"))
    ed = tracked_persist(
        edges.join(deg, src_col).select(
            F.col(src_col).alias("__src__"),
            F.col(dst_col).alias("__dst__"),
            F.col("__deg__"),
        )
    )
    base = tracked_persist(nodes.select(F.col(node_col).alias("__n__")))
    zero = base.select(
        "__n__", F.lit(0).cast("bigint").alias("__c__")
    )
    ranks = base.select("__n__", F.lit(SCALE).cast("bigint").alias("__r__"))
    for it in range(iterations):
        contrib = ranks.join(ed, ranks["__n__"] == ed["__src__"]).select(
            F.col("__dst__").alias("__n__"),
            F.expr(f"(__r__ DIV __deg__) * {damping_pct} DIV 100").alias(
                "__c__"
            ),
        )
        ranks = (
            contrib.unionByName(zero)
            .groupBy("__n__")
            .agg(
                (F.lit(teleport).cast("bigint") + F.sum("__c__")).alias(
                    "__r__"
                )
            )
        )
        if ckpt is not None and (it + 1) % every == 0:
            ranks = ckpt(ranks)
    return ranks.select(
        F.col("__n__").alias(node_col), F.col("__r__").alias("rank_fp")
    )


def label_propagation(
    nodes: DataFrame,
    edges: DataFrame,
    rounds: int = 3,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    reliable_checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
) -> DataFrame:
    """(node, label) after ``rounds`` SYNCHRONOUS label-propagation
    steps: every node simultaneously adopts the most frequent label among
    its neighbors, ties broken to the SMALLEST label — fully
    deterministic (the classic async/random variant is not), so the
    rounds replay exactly in plain SQL. Labels start as the node ids;
    dense regions converge to shared labels (communities), and a node
    with no neighbors keeps its own.

    Pass symmetric edges for undirected semantics (union both
    directions) — the operator propagates along ``src -> dst`` as given.

    Plan shape per round: one join of the label frame with the edge frame
    on the source, one (dst, label) count aggregate, then ONE argmax
    hash aggregate per node — ``max(struct(cnt, -label))`` replays the
    count-desc/label-asc tie-break exactly (labels are node ids, so the
    negation is total-order-safe), replacing the old row_number window
    (a sort exchange) with a sort-free aggregate; a per-node fallback row
    with count -1 unioned in replaces the old left join back onto the
    node list (any real neighbor row outranks it; an isolated node keeps
    its own label through it). O(N) loop state, same scale contract as
    :func:`pagerank_fixed_point`, including the same
    ``checkpoint_every`` / ``reliable_checkpoint_dir`` lineage and
    durability options (value-neutral: the update rule is deterministic).
    """
    ckpt = (
        _round_ckpt(nodes.sparkSession, reliable_checkpoint_dir)
        if checkpoint_every > 0 or reliable_checkpoint_dir is not None
        else None
    )
    every = checkpoint_every or 1
    from ..cache import tracked_persist

    # Both frames are touched every round (the edge frame by the join,
    # the fallback by the argmax union): persist once so rounds rescan
    # cache instead of source files.
    ed = tracked_persist(
        edges.select(
            F.col(src_col).alias("__src__"), F.col(dst_col).alias("__dst__")
        )
    )
    base = nodes.select(F.col(node_col).alias("__n__"))
    fallback = tracked_persist(
        base.select(
            "__n__",
            F.col("__n__").alias("__l__"),
            F.lit(-1).cast("bigint").alias("__cnt__"),
        )
    )
    labels = base.select("__n__", F.col("__n__").alias("__l__"))
    for rd in range(rounds):
        counted = (
            labels.join(ed, labels["__n__"] == ed["__src__"])
            .groupBy(F.col("__dst__").alias("__n__"), "__l__")
            .agg(F.count("*").cast("bigint").alias("__cnt__"))
        )
        labels = (
            counted.unionByName(fallback)
            .groupBy("__n__")
            .agg(
                F.max(
                    F.struct(F.col("__cnt__"), (-F.col("__l__")).alias("__nl__"))
                ).alias("__best__")
            )
            .select("__n__", (-F.col("__best__.__nl__")).alias("__l__"))
        )
        if ckpt is not None and (rd + 1) % every == 0:
            labels = ckpt(labels)
    return labels.select(
        F.col("__n__").alias(node_col), F.col("__l__").alias("label")
    )


def hits_fixed_point(
    nodes: DataFrame,
    edges: DataFrame,
    rounds: int = 3,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, hub, auth) after ``rounds`` HITS iterations (Kleinberg's
    hubs-and-authorities) in EXACT integer arithmetic: auth'(v) = sum of
    hub over in-neighbors, hub'(v) = sum of auth' over out-neighbors,
    starting from all-ones — pure integer sums, so the rounds replay
    bit-identically in plain SQL.

    UNNORMALIZED by contract: the classic per-round L2 normalization only
    rescales the ranking but costs a global scalar per round; without it
    scores grow ~(max degree)^rounds, so keep ``rounds`` small on
    high-degree graphs (or rescale the RESULT). Bounded-degree graphs
    (trees, k-NN graphs) are safe for any practical round count.

    Plan shape per round: two join+aggregate passes over the edge frame
    (persisted once by the caller if reused) — the sum-over-neighbors
    aggregates run over the union of the raw per-edge rows and a zero
    row per node, which replaces the old per-round left joins back onto
    the node list (same integer sums, one fewer exchange + join per
    half-round; measured r12) — O(N) loop state like the other iterative
    operators here.
    """
    from ..cache import tracked_persist

    # Both frames are touched every round (the edge frame by two joins,
    # the zero frame by two aggregate unions): persist once so rounds
    # rescan cache instead of source files.
    ed = tracked_persist(
        edges.select(
            F.col(src_col).alias("__src__"), F.col(dst_col).alias("__dst__")
        )
    )
    base = nodes.select(F.col(node_col).alias("__n__"))
    zero = tracked_persist(
        base.select("__n__", F.lit(0).cast("bigint").alias("__v__"))
    )
    hub = base.select("__n__", F.lit(1).cast("bigint").alias("__h__"))
    auth = None
    for _ in range(rounds):
        auth = (
            hub.join(ed, hub["__n__"] == ed["__src__"])
            .select(F.col("__dst__").alias("__n__"), F.col("__h__").alias("__v__"))
            .unionByName(zero)
            .groupBy("__n__")
            .agg(F.sum("__v__").alias("__a__"))
        )
        hub = (
            auth.join(ed, auth["__n__"] == ed["__dst__"])
            .select(F.col("__src__").alias("__n__"), F.col("__a__").alias("__v__"))
            .unionByName(zero)
            .groupBy("__n__")
            .agg(F.sum("__v__").alias("__h__"))
        )
    return (
        hub.join(auth, "__n__")
        .select(
            F.col("__n__").alias(node_col),
            F.col("__h__").alias("hub"),
            F.col("__a__").alias("auth"),
        )
    )


def bfs_depths(
    nodes: DataFrame,
    edges: DataFrame,
    source: int,
    max_depth: int = 16,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    reliable_checkpoint_dir: str | None = None,
) -> DataFrame:
    """(node, depth): breadth-first shortest-path depth from ``source``
    along directed edges (pass symmetric edges for undirected), bounded
    by ``max_depth``; unreached nodes are absent. Loop state is ONE
    consolidated VISITED frame maintained as a MIN-DEPTH FOLD: each hop
    unions the raw (neighbor, depth) candidates into the state and one
    ``groupBy(node).min(depth)`` keeps first discoveries — the aggregate
    IS the dedup + already-visited filter, replacing the old
    distinct + left-anti-join pair (two exchanges per hop) with one
    (min(depth) is the BFS invariant: a re-reached node keeps its
    earlier depth; measured 4.0 -> 2.9 s at sf0.1, r12 — a two-hops-per-
    round fusion variant was also measured and REJECTED: re-evaluating
    the mid-state under the second hop doubles the per-job map work and
    erases the halved job count). One job per round: the lazy
    checkpoint's ``count()`` both materializes the state and, compared
    against the previous round's count, is the convergence probe.
    State keeps a CONSTANT partition count across rounds; the
    checkpoint-the-frontier-only alternative accumulates partitions
    linearly in depth (quadratic per-round task count over the
    traversal). If ``max_depth`` hops pass with the frontier still
    expandable, raises rather than returning silently-truncated depths
    (the bounded-result-with-absent-nodes contract only holds when the
    traversal actually drained).
    """
    from ..cache import tracked_persist

    spark = nodes.sparkSession
    ckpt = _round_ckpt(spark, reliable_checkpoint_dir)
    # The edge frame is touched every round: persist it ONCE, hash-
    # partitioned on the join key, so each round's frontier join reuses
    # the cached layout (InMemoryRelation reports its outputPartitioning)
    # instead of re-shuffling the edges per hop — the frontier side is
    # the only thing that moves.
    ed = tracked_persist(
        edges.select(
            F.col(src_col).alias("__src__"), F.col(dst_col).alias("__dst__")
        ).repartition(F.col("__src__"))
    )
    visited = spark.createDataFrame(
        [(source, 0)], "__n__ BIGINT, __d__ INT"
    ).localCheckpoint(eager=True)

    def hop(vis: DataFrame, depth: int) -> DataFrame:
        """State after expanding ``vis``'s depth-1 layer: union the raw
        neighbor candidates, keep min depth per node."""
        frontier = vis.filter(F.col("__d__") == depth - 1).select("__n__")
        cand = frontier.join(ed, frontier["__n__"] == ed["__src__"]).select(
            F.col("__dst__").alias("__n__"),
            F.lit(depth).cast("int").alias("__d__"),
        )
        return (
            vis.unionByName(cand)
            .groupBy("__n__")
            .agg(F.min("__d__").alias("__d__"))
        )

    prev_n = 1
    depth = 0
    grew = True
    while depth < max_depth and grew:
        depth += 1
        visited = ckpt(hop(visited, depth))
        n = visited.count()
        grew = n != prev_n
        prev_n = n
    if grew:
        # Cap reached with the last layer non-empty: one extra probe
        # hop distinguishes "exactly max_depth deep" from truncation.
        probe = hop(visited, max_depth + 1).filter(
            F.col("__d__") == max_depth + 1
        )
        if probe.limit(1).count() > 0:
            raise RuntimeError(
                f"bfs_depths: frontier still expanding after max_depth="
                f"{max_depth} rounds; raise max_depth (deeper nodes would"
                " be silently absent otherwise)"
            )
    return visited.join(
        nodes.select(F.col(node_col).alias("__n__")), "__n__"
    ).select(F.col("__n__").alias(node_col), F.col("__d__").alias("depth"))


def sssp_distances(
    nodes: DataFrame,
    edges: DataFrame,
    source: int,
    max_rounds: int = 20,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "weight",
    reliable_checkpoint_dir: str | None = None,
) -> DataFrame:
    """(node, dist): weighted single-source shortest-path distances from
    ``source`` by Bellman-Ford relaxation (integer weights — sums stay
    exact, so the result is deterministic across partitionings and an
    independent oracle can hash-match it). Each round relaxes EVERY edge
    from the currently-settled frame: candidate = dist(src) + weight,
    then a min-aggregate per node folds candidates into the running
    distances — O(N) loop state like the other message-passing
    operators, NOT the O(frontier) state of :func:`bfs_depths`, because
    a weighted graph can improve an already-visited node's distance in
    a later round. The improved-this-round flag is folded INTO the
    min-aggregate — the pre-relaxation rows ride the union tagged as
    old, so one aggregate yields both the new distance and min-over-old
    to compare against, replacing the old per-round join-back (one fewer
    exchange + join per relaxation; ~20% per round in an isolated A/B at
    sf0.1, r12; a two-relaxations-per-round fusion variant was measured
    and REJECTED for the same reason as in :func:`bfs_depths`). One job
    per round:
    the flagged frame is LAZILY checkpointed and a full-scan sum of the
    flag both materializes the checkpoint and decides convergence —
    exits as soon as a relaxation changes nothing (<= diameter
    relaxations on any graph, not ``max_rounds``); exhausting
    ``max_rounds`` with improvements still pending raises rather than
    returning wrong distances. Unreached
    nodes are absent from the result. ``reliable_checkpoint_dir``
    switches round checkpoints to a durable store (see
    :func:`_round_ckpt`).
    """
    from ..cache import tracked_persist

    spark = nodes.sparkSession
    ckpt = _round_ckpt(spark, reliable_checkpoint_dir)
    # Same once-per-traversal edge persist as bfs_depths: hash-partition
    # on the join key so only the O(N) distance frame moves per round.
    ed = tracked_persist(
        edges.select(
            F.col(src_col).alias("__src__"),
            F.col(dst_col).alias("__dst__"),
            F.col(weight_col).cast("bigint").alias("__w__"),
        ).repartition(F.col("__src__"))
    )
    dist = spark.createDataFrame(
        [(source, 0, 1)], "__n__ BIGINT, __d__ BIGINT, __imp__ INT"
    )

    def relax(d0: DataFrame) -> DataFrame:
        """One flagged relaxation: (n, d, imp) where d = min over the
        union of candidates and current rows, imp = strictly improved
        (current row absent or shrunk) — the flag computed inside the
        aggregate instead of a join back onto ``d0``. Only the FRONTIER
        (rows improved by the previous round) is joined against the
        edge frame (r12, the SPFA refinement of Bellman-Ford): an
        unimproved node re-emits exactly the candidates it already
        emitted, which cannot create new minima, so the fixed point —
        and the round count: every <=r-edge shortest path is settled
        after round r either way — is unchanged while the per-round
        join shrinks from ALL settled nodes to the wave that actually
        moved (the total rows joined across a traversal drop from
        rounds x N to ~N on wave-like graphs)."""
        frontier = d0.filter(F.col("__imp__") == 1)
        cand = frontier.join(ed, frontier["__n__"] == ed["__src__"]).select(
            F.col("__dst__").alias("__n__"),
            (F.col("__d__") + F.col("__w__")).alias("__d__"),
            F.lit(0).alias("__old__"),
        )
        return (
            cand.unionByName(
                d0.select("__n__", "__d__", F.lit(1).alias("__old__"))
            )
            .groupBy("__n__")
            .agg(
                F.min("__d__").alias("__d__"),
                F.min(
                    F.when(F.col("__old__") == 1, F.col("__d__"))
                ).alias("__po__"),
            )
            .select(
                "__n__",
                "__d__",
                (
                    F.col("__po__").isNull()
                    | (F.col("__d__") < F.col("__po__"))
                )
                .cast("int")
                .alias("__imp__"),
            )
        )

    done = 0
    improved = 1
    while done < max_rounds and improved:
        flagged = ckpt(relax(dist))
        done += 1
        improved = flagged.agg(F.sum("__imp__")).first()[0]
        dist = flagged
    if improved:
        raise RuntimeError(
            f"sssp_distances: still relaxing after {max_rounds} rounds;"
            " raise max_rounds (graph has a longer shortest-path chain)"
        )
    dist = dist.select("__n__", "__d__")
    return dist.join(
        nodes.select(F.col(node_col).alias("__n__")), "__n__"
    ).select(F.col("__n__").alias(node_col), F.col("__d__").alias("dist"))

"""Plan-inspection helpers: make "the plan is the one you'd want at 100x"
an enforced property instead of a docstring claim.

Used by the pytest suite to pin physical-plan shapes: the breed-mapping dim
join must be a BroadcastHashJoin, parquet scans must show pushed filters and
pruned schemas, and nothing may degenerate into a cartesian product. These
checks read the EXPLAIN output of the final (post-Catalyst, pre-execution)
plan, so regressions surface before any data runs.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


class PlanAssertionError(AssertionError):
    """A physical plan does not have the required shape."""


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    """EXPLAIN output as a string (modes: simple|extended|formatted|cost)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def assert_broadcast_join(df: DataFrame) -> str:
    """The plan must contain a broadcast hash join (small-dim lookup path:
    the fact side never shuffles)."""
    plan = plan_text(df)
    if "BroadcastHashJoin" not in plan:
        raise PlanAssertionError(
            "expected a BroadcastHashJoin in the plan:\n" + plan
        )
    return plan


def assert_no_cartesian(df: DataFrame) -> str:
    """No CartesianProduct / BroadcastNestedLoopJoin may appear — the
    O(N*M) shapes that kill a 100 TB run silently."""
    plan = plan_text(df)
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        if bad in plan:
            raise PlanAssertionError(f"forbidden {bad} in the plan:\n" + plan)
    return plan


def assert_pushed_filter(df: DataFrame, *column_names: str) -> str:
    """Every named column must appear in a scan's PushedFilters list —
    i.e. the predicate reaches the parquet reader instead of a post-scan
    Filter over full row groups."""
    plan = plan_text(df)
    pushed = [
        line for line in plan.splitlines() if "PushedFilters" in line
    ]
    blob = "\n".join(pushed)
    missing = [c for c in column_names if c not in blob]
    if missing:
        raise PlanAssertionError(
            f"filters on {missing} not pushed to any scan. "
            f"PushedFilters lines:\n{blob}\nfull plan:\n{plan}"
        )
    return plan


def assert_pruned_schema(df: DataFrame, max_columns: int) -> str:
    """Every parquet scan must read at most `max_columns` columns
    (column pruning reached the reader)."""
    plan = plan_text(df)
    for line in plan.splitlines():
        if "ReadSchema" in line:
            _, _, schema = line.partition("struct<")
            ncols = len(schema.split(",")) if schema else 0
            if ncols > max_columns:
                raise PlanAssertionError(
                    f"scan reads {ncols} columns (> {max_columns}): {line}"
                )
    return plan


def wholestage_codegen_count(df: DataFrame) -> int:
    """Number of distinct WholeStageCodegen spans — 0 means the plan fell
    off the codegen path entirely.

    Under AQE the pre-execution plan carries no codegen markers (subtrees
    are planned per-stage at runtime), so: execute the frame first (any
    action on the same DataFrame object) and this reads the final adaptive
    plan's ``[codegen id : N]`` markers; with AQE off it falls back to the
    ``codegen`` explain mode's subtree count.
    """
    plan = plan_text(df, mode="formatted")
    ids = set(re.findall(r"\[codegen id : (\d+)\]", plan))
    if ids:
        return len(ids)
    m = re.search(
        r"Found (\d+) WholeStageCodegen subtrees",
        plan_text(df, mode="codegen"),
    )
    return int(m.group(1)) if m else 0


def assert_partition_pruned(df: DataFrame, *column_names: str) -> str:
    """Every named column must appear in a scan's PartitionFilters — i.e.
    the predicate prunes whole partition directories instead of scanning
    and filtering rows. The difference between reading one Year=2024
    directory and reading 100 TB."""
    plan = plan_text(df)
    m = re.search(r"PartitionFilters: \[(?P<f>[^\]]*)\]", plan)
    filters = m.group("f") if m else ""
    for col in column_names:
        if col not in filters:
            raise PlanAssertionError(
                f"no partition filter on {col!r} "
                f"(PartitionFilters: [{filters}]):\n" + plan
            )
    return plan


def runtime_bloom_filter_count(df: DataFrame) -> int:
    """How many runtime bloom-filter probes (`might_contain`) Catalyst
    injected into the plan.

    Runtime row-level filtering (Spark 3.3+): when one join side carries a
    selective filter, the optimizer can aggregate a bloom filter over its
    join keys and probe it on the OTHER side's scan — rows that cannot
    match are dropped before the shuffle, which is the difference between
    shuffling a 100 TB fact table and shuffling the fraction that
    survives the dim filter. Governed by
    ``spark.sql.optimizer.runtime.bloomFilter.enabled`` and the
    creation/application-side size thresholds (tuned for real clusters —
    tests lower them to exercise the path on toy data).
    """
    return plan_text(df, mode="simple").count("might_contain")


def assert_runtime_bloom_filter(df: DataFrame) -> str:
    """The plan must probe at least one runtime bloom filter."""
    plan = plan_text(df, mode="simple")
    if "might_contain" not in plan:
        raise PlanAssertionError(
            "expected a runtime bloom-filter probe (might_contain) in the"
            " plan:\n" + plan
        )
    return plan


# Logical nodes that PROVE their output is aggregate-scale (a bounded or
# heavily-reduced row count), so an unpartitioned window over them cannot
# become a single-partition sort of the corpus: aggregates (GROUP BY and
# the rewritten distinct()), global limits/top-k, and literal relations.
_ROW_REDUCERS = frozenset(
    {"Aggregate", "GlobalLimit", "LocalRelation", "OneRowRelation"}
)


def _walk_jnodes(node):
    yield node
    kids = node.children()
    for i in range(kids.size()):
        yield from _walk_jnodes(kids.apply(i))


def global_window_violations(df: DataFrame) -> list[str]:
    """Unpartitioned windows over event-scale inputs — the silent
    scale-killer this repo's convention forbids.

    A window with an empty PARTITION BY sorts its whole input in ONE
    task: fine on aggregate-scale data (day-level series, top-k replays —
    thousands of rows at any corpus size), fatal on event-scale data
    (single-partition sort of the corpus at 100 TB). The convention was
    previously only prose; this walks the optimized logical plan and
    returns a description for every ``Window`` node with an empty
    partitionSpec whose input subtree contains NO row-reducing node
    (:data:`_ROW_REDUCERS`). Empty list = the plan honors the convention.
    Structural (JVM node classes), not string-matching — a column named
    'Aggregate' cannot fool it."""
    root = df._jdf.queryExecution().optimizedPlan()
    out = []
    for node in _walk_jnodes(root):
        if node.getClass().getSimpleName() != "Window":
            continue
        if node.partitionSpec().nonEmpty():
            continue
        reduced = any(
            kid.getClass().getSimpleName() in _ROW_REDUCERS
            for kid in _walk_jnodes(node.child())
        )
        if not reduced:
            out.append(node.simpleString(8))
    return out


def assert_no_global_window_over_events(df: DataFrame) -> str:
    """The plan must contain no unpartitioned window over an un-reduced
    (event-scale) input; see :func:`global_window_violations`."""
    violations = global_window_violations(df)
    if violations:
        raise PlanAssertionError(
            "unpartitioned Window over event-scale input (no aggregate/"
            "limit/literal relation below it):\n" + "\n".join(violations)
        )
    return plan_text(df)


def assert_partial_topk_below_shuffle(df: DataFrame, k: int) -> str:
    """The plan must carry Spark's map-side partial top-k: a
    ``WindowGroupLimit`` in **Partial** mode below the rank exchange
    (InferWindowGroupLimit, SPARK-37099 — fires for a
    ``row_number()/rank()/dense_rank() <= k`` filter adjacent to its
    window when ``k <= spark.sql.optimizer.windowGroupLimitThreshold``).

    This is THE property that makes brute-force top-k rankers
    shuffle-safe at scale: each input partition forwards at most k rows
    per partition key through the exchange (|partitions| * |Q| * k rows)
    instead of the full N * |Q| scored-pair stream. The pattern is
    fragile to refactors — an intermediate projection between the filter
    and its window, a non-rank-family function, or a raised k all
    silently drop back to the full-stream shuffle — so plan-pin it."""
    plan = plan_text(df)
    if not re.search(rf"\(\)\, {k}, Partial", plan):
        raise PlanAssertionError(
            f"expected a Partial-mode WindowGroupLimit with limit {k} "
            "(map-side partial top-k) in the plan:\n" + plan
        )
    return plan

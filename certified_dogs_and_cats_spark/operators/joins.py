"""Join operators the reference exercises (SURVEY.md §2.3).

All shapes are declared with the DataFrame API so Catalyst picks the physical
join. Scale posture per operator is documented inline.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def idempotent_new_rows(
    batch: DataFrame, existing: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Left-anti join: keep only batch rows whose key is not in `existing`.

    The reference's exactly-once append core (notebooks/bronze.py:111-112,
    notebooks/silver.py:124-125). At scale: `existing` is projected to the
    key columns only (column pruning reaches the scan) and the anti join
    shuffles on the key; AQE converts to broadcast when the existing key set
    is small (e.g. incremental loads into a fresh partition).

    The comparison is NULL-SAFE: a NULL-keyed batch row that already
    exists must not re-append on every run (plain equality never matches
    NULL = NULL, silently duplicating such rows each incremental load).
    """
    b = batch.alias("b")
    e = existing.select(*keys).alias("e")
    cond = None
    for k in keys:
        c = F.col(f"b.{k}").eqNullSafe(F.col(f"e.{k}"))
        cond = c if cond is None else (cond & c)
    return b.join(e, cond, "left_anti").select("b.*")


def dim_lookup(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    value_cols: Sequence[str],
    fallback: dict[str, Column] | None = None,
    mapped_flag: str | None = None,
) -> DataFrame:
    """Broadcast left-join a small dimension and flag/fallback misses.

    Reference semantics (notebooks/silver.py:53-68): the `mapped` flag must
    come from the join *hit* (probe a non-null dim column), never from
    fallback equality (docs/runbook.md:113 trap). The dim is explicitly
    broadcast — at 100 TB the fact side never shuffles for a ~1e3-row dim.
    """
    probe = "__dim_hit__"
    small = dim.select(key, *value_cols).withColumn(probe, F.lit(True))
    out = facts.join(F.broadcast(small), on=key, how="left")
    hit = F.coalesce(F.col(probe), F.lit(False))
    if mapped_flag:
        out = out.withColumn(mapped_flag, hit)
    if fallback:
        for col_name, fb in fallback.items():
            out = out.withColumn(col_name, F.when(hit, F.col(col_name)).otherwise(fb))
    return out.drop(probe)


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    update_cols: Sequence[str],
) -> DataFrame:
    """MERGE semantics (matched -> update, not matched -> insert) as a
    pure-DataFrame rewrite, for when Delta's ``MERGE INTO`` is unavailable
    (reference sql/breed_mapping.py:596-603; SURVEY.md §7.5 risk 4).

    Implementation: full-outer join on the keys; matched rows take source
    values, unmatched-target rows keep target values, unmatched-source rows
    insert. Deterministic and idempotent (re-merging the same source is a
    no-op). At scale this is one shuffle on the merge keys — identical cost
    to Delta MERGE's join phase — and should be followed by a partitioned
    overwrite of only the touched partitions.

    Divergence from Delta MERGE: if the SOURCE carries duplicate keys, each
    duplicate matches the same target row and the output keeps one row per
    (target, source) match, where Delta raises on the ambiguity. Callers
    needing Delta's contract should dedupe the source on the merge keys
    first (``window_dedup_latest``) or use the SQL front door
    (``DdlSession`` MERGE INTO), which enforces the raise.
    """
    keys = list(keys)
    src = source.select(*keys, *update_cols)
    # Side-presence markers, NOT keys[0].isNotNull(): the join condition
    # is null-safe, so a NULL-keyed source row can legitimately match a
    # NULL-keyed target row and must still count as a hit.
    t = target.withColumn("__t_hit", F.lit(True)).alias("t")
    s = src.withColumn("__s_hit", F.lit(True)).alias("s")
    cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys]
    joined = t.join(s, cond, "full_outer")
    src_hit = F.col("s.__s_hit").isNotNull()
    tgt_hit = F.col("t.__t_hit").isNotNull()
    cols = []
    for k in keys:
        cols.append(F.coalesce(F.col(f"t.{k}"), F.col(f"s.{k}")).alias(k))
    non_key_target = [
        c for c in target.columns if c not in keys and c != "__t_hit"
    ]
    for c in non_key_target:
        if c in update_cols:
            cols.append(
                F.when(src_hit, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            )
        else:
            cols.append(F.col(f"t.{c}").alias(c))
    for c in update_cols:
        if c not in non_key_target:
            cols.append(F.col(f"s.{c}").alias(c))
    action = (
        F.when(src_hit & tgt_hit, F.lit("updated"))
        .when(src_hit, F.lit("inserted"))
        .otherwise(F.lit("kept"))
    )
    return joined.select(*cols, action.alias("merge_action"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: attach, to every left row, the nearest right row for
    the same key — ``direction='backward'`` (default) takes the latest
    right with ``right_ts <= left_ts``, ``direction='forward'`` the
    earliest right with ``right_ts >= left_ts``. Left-join semantics:
    unmatched left rows keep nulls.

    Spark has no native ASOF JOIN; the naive rewrite is a range join
    (quadratic per key). This implementation is the scale-correct shape:
    tag and union both sides, then one window pass per key ordered by
    (time, side) carrying the last non-null right value forward — a single
    shuffle on the key, linear scan per partition, no range explosion.
    Right rows at exactly left_ts sort before left rows, so the match is
    inclusive (>= / <= semantics), matching DuckDB's ``ASOF LEFT JOIN``
    on ``l.ts >= r.ts`` (backward) / ``l.ts <= r.ts`` (forward; the
    forward pass is the same scan over reversed time order).

    Determinism: callers must ensure the right side has at most one row per
    (key, right_ts) — dedup first (e.g. window_dedup latest-wins) — else
    which same-timestamp row wins is tie-broken by nothing.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = list(on)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in on + [right_ts]]
    l2 = left.withColumn("__t", F.col(left_ts)).withColumn(
        "__is_left", F.lit(1)
    )
    r2 = right.select(
        *on,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.col(right_ts).alias(f"__r_{right_ts}"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    u = l2.unionByName(r2, allowMissingColumns=True)
    t_order = (
        F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(t_order, F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        # A NULL-timestamp left row matches NOTHING in either direction:
        # under the forward (desc) ordering NULLs sort last and would
        # otherwise be handed the earliest right row's values.
        F.when(
            F.col("__t").isNotNull(),
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w),
        ).alias(f"{c}{suffix}")
        for c in [right_ts, *value_cols]
    ]
    return (
        u.select("*", *carried)
        .filter(F.col("__is_left") == 1)
        .drop("__t", "__is_left", f"__r_{right_ts}",
              *[f"__r_{c}" for c in value_cols])
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-spread equi-join: identical result to ``big.join(small, key)``,
    but a hot key's rows land in ``n_salts`` partitions instead of one.

    The big side gets a deterministic salt in [0, n_salts) hashed from its
    whole row; the small side is replicated n_salts times (explode of a
    sequence — cost n_salts * |small|). The join keys on (key, salt), so
    the shuffle spreads each hot key across n_salts reducers. Use when the
    small side is too big to broadcast AND the key distribution is skewed
    beyond what AQE's skew-join splitting handles (AQE splits oversized
    partitions of sort-merge joins, but can't split a single giant key
    group mid-aggregation).

    Only big-side-preserving joins are valid: the small side is replicated
    n_salts ways, so right/full/outer would emit every unmatched small row
    n_salts times — those `how` values raise.
    """
    if how not in {"inner", "left", "left_outer", "left_semi", "semi",
                   "left_anti", "anti"}:
        raise ValueError(
            "salted_join replicates the small side n_salts times; only "
            f"big-side-preserving joins (inner/left/semi/anti) are exact, got {how!r}"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), n_salts)
    b = big.withColumn("__salt", salt)
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    return b.join(s, on=[key, "__salt"], how=how).drop("__salt")

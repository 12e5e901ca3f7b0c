"""Slowly-changing-dimension (SCD Type 2) maintenance over the change feed.

``Scd2Dimension`` keeps a versioned dimension table in sync with a source:
every attribute change CLOSES the key's current row (``valid_to`` = the
commit version that changed it, ``is_current`` = false) and OPENS a new
one, so any past state is recoverable with a validity-interval predicate
(``valid_from <= v AND (valid_to IS NULL OR v < valid_to)``) — the
warehouse pattern for auditable dimensions.

The refresh is SET-BASED over the whole polled batch, not a per-commit
loop: one window (``lead`` of the next event version per key) assigns
every opened row its closing version in a single pass, and the keys'
pre-batch current rows close at their FIRST in-batch event version. Cost
scales with changed keys + a pass-through of unchanged rows (the simple
correct overwrite; a MERGE-only variant that rewrites just changed keys
is the scale optimization, at the price of tombstone bookkeeping).

Update pairs: the source feed emits updates as delete+insert at the same
``_commit_version`` (no declared primary key upstream — see
``Catalog.changes``); grouping events by (key, version) collapses the
pair into one "change" event, which both closes the prior row and opens
the new one. CONTRACT: the source holds at most one live row per key; if
two inserts for a key land in one commit, the lexicographically greatest
tracked-attribute struct wins (deterministic, documented, not an error).

Exactly-once: same one-commit snapshot + ``{"cdc_applied": version}``
txn-marker scheme as :mod:`incremental` — a crash between commit and
cursor-ack repairs by fast-forwarding, never re-applying.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .catalog import Catalog
from .incremental import CdcMaintenance


@dataclass
class Scd2Dimension(CdcMaintenance):
    catalog: Catalog
    src: str
    dst: str
    key_cols: tuple[str, ...]
    tracked_cols: tuple[str, ...]

    @property
    def consumer(self) -> str:
        return f"__scd2__{self.dst}"

    def __post_init__(self) -> None:
        if self.dst not in self.catalog.tables:
            src_schema = self.catalog.tables[self.src].schema
            by_name = {f.name: f for f in src_schema.fields}
            fields = [
                T.StructField(c, by_name[c].dataType, True)
                for c in (*self.key_cols, *self.tracked_cols)
            ]
            fields.append(T.StructField("valid_from", T.IntegerType(), False))
            fields.append(T.StructField("valid_to", T.IntegerType(), True))
            fields.append(T.StructField("is_current", T.BooleanType(), False))
            self.catalog.register(self.dst, T.StructType(fields))
        self._cursor = self.catalog.change_cursor(self.src, self.consumer)

    def at_version(self, version: int):
        """Point-in-time view of the dimension as of source ``version`` —
        the validity-interval predicate every PIT join uses."""
        d = self.catalog.table(self.dst)
        return d.filter(
            (F.col("valid_from") <= version)
            & (
                F.col("valid_to").isNull()
                | (F.lit(version) < F.col("valid_to"))
            )
        ).drop("valid_from", "valid_to", "is_current")

    def refresh(self) -> int:
        changes, end, n = self._begin_refresh()
        if n == 0:
            return 0
        evs = None
        try:
            keys = list(self.key_cols)
            tracked = list(self.tracked_cols)
            is_ins = F.col("_change_type") == "insert"
            # One event per (key, commit version): an update pair
            # collapses to a single change event carrying the inserted
            # attributes; a delete-only version carries NULL attributes.
            events = (
                changes.groupBy(
                    *keys, F.col("_commit_version").alias("__v")
                ).agg(
                    F.max(
                        F.when(is_ins, F.struct(*tracked))
                    ).alias("__new"),
                )
            )
            w = Window.partitionBy(*keys).orderBy("__v")
            nxt = F.lead("__v").over(w)
            evs = events.select(
                *keys,
                "__v",
                "__new",
                nxt.alias("__next_v"),
            ).persist()
            opened = evs.filter(F.col("__new").isNotNull()).select(
                *keys,
                *[F.col(f"__new.{c}").alias(c) for c in tracked],
                F.col("__v").cast("int").alias("valid_from"),
                F.col("__next_v").cast("int").alias("valid_to"),
                F.col("__next_v").isNull().alias("is_current"),
            )
            first_ev = evs.groupBy(*keys).agg(
                F.min("__v").cast("int").alias("__first_v")
            )
            cur = self.catalog.table(self.dst)
            fk = first_ev.select(
                *[F.col(c).alias(f"__k_{c}") for c in keys], "__first_v"
            )
            cond = None
            for c in keys:
                e = cur[c].eqNullSafe(fk[f"__k_{c}"])
                cond = e if cond is None else (cond & e)
            joined = cur.join(F.broadcast(fk), cond, "left")
            untouched_or_closed = joined.select(
                *[cur[c] for c in (*keys, *tracked)],
                cur["valid_from"],
                # A live row of a touched key closes at the key's first
                # in-batch event; historical rows and untouched keys pass
                # through unchanged.
                F.when(
                    F.col("is_current") & F.col("__first_v").isNotNull(),
                    F.col("__first_v"),
                )
                .otherwise(cur["valid_to"])
                .alias("valid_to"),
                (
                    F.col("is_current") & F.col("__first_v").isNull()
                ).alias("is_current"),
            )
            new_dim = untouched_or_closed.unionByName(opened)
            self._commit_refresh(new_dim, end)
            return n
        finally:
            changes.unpersist()
            if evs is not None:
                evs.unpersist()

"""Incremental materialized-view maintenance over the change feed.

``IncrementalAggregate`` keeps a GROUP BY count/sum table in sync with a
source table by applying CDC deltas instead of re-aggregating the source:
inserts contribute +1/+value, deletes -1/-value (count and sum are
algebraic and subtractable, which is exactly why classic incremental view
maintenance restricts itself to them — avg derives as sum/cnt; min/max
are NOT subtractable and would need a full per-group recompute on
delete). At warehouse scale this is the difference between touching the
rows that changed and re-reading 100 TB per refresh.

Exactly-once: each refresh commits the new aggregate snapshot with a
``{"cdc_applied": <version>}`` txn marker in the destination's own
manifest — the applied watermark and the data are one atomic commit, so a
crash between commit and cursor-ack is repaired on the next refresh by
fast-forwarding the cursor to the committed watermark instead of
re-applying the delta.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .catalog import Catalog


class CdcMaintenance:
    """Shared exactly-once machinery for CDC-maintained destination
    tables (:class:`IncrementalAggregate`, :class:`IncrementalExtrema`,
    :class:`~certified_dogs_and_cats_spark.pipeline.scd.Scd2Dimension`).

    The contract lives in ONE place so a protocol fix cannot silently
    miss a consumer: the applied watermark is read from the
    destination's own committed txn markers (crash-safe truth);
    ``_begin_refresh`` fast-forwards a cursor that died between commit
    and ack, polls, persists the batch, and acks no-net-change ranges;
    ``_commit_refresh`` writes the new snapshot and the watermark in one
    atomic commit, then acks. Subclasses provide ``catalog``, ``dst``,
    and ``_cursor``.
    """

    def _applied_watermark(self) -> int:
        """Highest source version whose delta is COMMITTED into dst (the
        txn markers in dst's own manifest — crash-safe truth)."""
        return max(
            (
                e["txn"]["cdc_applied"]
                for e in self.catalog._load_manifest(self.dst)
                if e.get("txn", {}).get("cdc_applied") is not None
            ),
            default=0,
        )

    def _begin_refresh(self):
        """Crash repair + poll. Returns ``(changes, end, n)``; the batch
        is persisted iff ``n > 0`` (the caller owns the unpersist).
        ``n == 0`` means nothing to apply — a no-net-change source
        commit (compact, no-op rewrite) still advances the cursor, or
        every future refresh would re-diff the same versions forever."""
        applied = self._applied_watermark()
        if applied > self._cursor.position():
            # A prior refresh committed its snapshot but died before
            # acking the cursor — fast-forward, don't re-apply.
            self._cursor.ack(applied)
        changes, end = self._cursor.poll()
        # One evaluation of the feed backs every downstream use (for
        # rewrite commits the feed is a two-sided snapshot diff —
        # reading it twice would double a real cost).
        changes = changes.persist()
        n = changes.count()
        if n == 0:
            changes.unpersist()
            if end > self._cursor.position():
                self._cursor.ack(end)
        return changes, end, n

    def _commit_refresh(self, new_frame, end: int) -> None:
        """Snapshot + applied-watermark in ONE commit, then ack."""
        self.catalog.overwrite(
            self.dst, new_frame, txn={"cdc_applied": end}
        )
        self._cursor.ack(end)


@dataclass
class IncrementalAggregate(CdcMaintenance):
    """Incrementally-maintained ``SELECT group_cols, count(*), sum(value)
    FROM src GROUP BY group_cols`` table.

    ``refresh()`` applies everything committed to ``src`` since the last
    refresh and returns the number of source-change rows applied (0 = the
    view was already current). The destination table is registered (and
    created empty) on first use.

    Documented divergences from a full re-aggregation: a group whose rows
    are all NULL in ``value_col`` carries total 0.0 (SQL SUM would yield
    NULL), and totals accumulate as incremental double additions, so very
    long insert/delete histories can drift in the last float bits
    relative to a fresh DECIMAL-summed re-aggregation; rebuild the view
    (full re-aggregate) when bit-exact totals matter.
    """

    catalog: Catalog
    src: str
    dst: str
    group_cols: tuple[str, ...]
    value_col: str

    @property
    def consumer(self) -> str:
        # Keyed by destination: independent views over the same source
        # each tail the feed at their own pace.
        return f"__incremental_aggregate__{self.dst}"

    def __post_init__(self) -> None:
        if self.dst not in self.catalog.tables:
            src_schema = self.catalog.tables[self.src].schema
            by_name = {f.name: f for f in src_schema.fields}
            fields = [
                T.StructField(c, by_name[c].dataType, True)
                for c in self.group_cols
            ]
            fields.append(T.StructField("cnt", T.LongType(), False))
            fields.append(T.StructField("total", T.DoubleType(), True))
            self.catalog.register(self.dst, T.StructType(fields))
        self._cursor = self.catalog.change_cursor(self.src, self.consumer)

    def refresh(self) -> int:
        changes, end, n = self._begin_refresh()
        if n == 0:
            return 0
        try:
            sign = F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
            keys = list(self.group_cols)
            delta = changes.groupBy(*keys).agg(
                F.sum(sign).cast("long").alias("_dcnt"),
                F.sum(sign * F.col(self.value_col)).alias("_dtotal"),
            )
            cur = self.catalog.table(self.dst)
            # NULL-safe merge on the group keys: NULL is a real group in
            # GROUP BY semantics, but SQL equality would never match it
            # (same reason operators/joins.merge_upsert uses eqNullSafe),
            # duplicating NULL-keyed rows on every refresh.
            d = delta.select(
                *[F.col(c).alias(f"__d_{c}") for c in keys],
                "_dcnt",
                "_dtotal",
            )
            cond = None
            for c in keys:
                e = cur[c].eqNullSafe(d[f"__d_{c}"])
                cond = e if cond is None else (cond & e)
            merged = (
                cur.join(d, cond, "full_outer")
                .select(
                    *[
                        F.coalesce(cur[c], d[f"__d_{c}"]).alias(c)
                        for c in keys
                    ],
                    (
                        F.coalesce(F.col("cnt"), F.lit(0))
                        + F.coalesce(F.col("_dcnt"), F.lit(0))
                    ).alias("cnt"),
                    (
                        F.coalesce(F.col("total"), F.lit(0.0))
                        + F.coalesce(F.col("_dtotal"), F.lit(0.0))
                    ).alias("total"),
                )
                .filter(F.col("cnt") > 0)
            )
            self._commit_refresh(merged, end)
            return n
        finally:
            changes.unpersist()


@dataclass
class IncrementalExtrema(CdcMaintenance):
    """Incrementally-maintained ``SELECT group_cols, count(*), min(value),
    max(value) FROM src GROUP BY group_cols`` table.

    MIN/MAX are insert-monotone but NOT subtractable, so maintenance is
    two-path (the classic IVM treatment):

    - **insert-only groups**: cheap algebraic merge — ``least``/
      ``greatest`` against the stored extrema, never touching the source.
    - **delete-touched groups**: the stored extremum may have been the
      deleted row, so those groups — and ONLY those — recompute from the
      source snapshot **time-traveled to the applied watermark** (a newer
      snapshot would pre-apply later commits whose deltas then re-apply
      on the next refresh = double-count). The recompute is a semi-join
      on the affected keys: cost scales with the touched groups' rows,
      not the table.

    Shares the exactly-once txn-watermark scheme with
    :class:`IncrementalAggregate` (snapshot + ``cdc_applied`` marker in
    one commit; crash between commit and ack repairs by fast-forward).
    """

    catalog: Catalog
    src: str
    dst: str
    group_cols: tuple[str, ...]
    value_col: str

    @property
    def consumer(self) -> str:
        return f"__incremental_extrema__{self.dst}"

    def __post_init__(self) -> None:
        if self.dst not in self.catalog.tables:
            src_schema = self.catalog.tables[self.src].schema
            by_name = {f.name: f for f in src_schema.fields}
            fields = [
                T.StructField(c, by_name[c].dataType, True)
                for c in self.group_cols
            ]
            vtype = by_name[self.value_col].dataType
            fields.append(T.StructField("cnt", T.LongType(), False))
            fields.append(T.StructField("vmin", vtype, True))
            fields.append(T.StructField("vmax", vtype, True))
            self.catalog.register(self.dst, T.StructType(fields))
        self._cursor = self.catalog.change_cursor(self.src, self.consumer)

    def refresh(self) -> int:
        changes, end, n = self._begin_refresh()
        if n == 0:
            return 0
        affected = None
        try:
            keys = list(self.group_cols)
            is_ins = F.col("_change_type") == "insert"
            # Groups any delete touched: their stored extrema are suspect.
            affected = (
                changes.filter(~is_ins).select(*keys).distinct().persist()
            )
            kp = [f"__d_{c}" for c in keys]

            def keyed(df, names):
                return df.select(
                    *[F.col(c).alias(a) for c, a in zip(keys, names)],
                    *[c for c in df.columns if c not in keys],
                )

            def null_safe_cond(left, right, names):
                cond = None
                for c, a in zip(keys, names):
                    e = left[c].eqNullSafe(right[a])
                    cond = e if cond is None else (cond & e)
                return cond

            ins = changes.filter(is_ins).groupBy(*keys).agg(
                F.count("*").cast("long").alias("_dcnt"),
                F.min(self.value_col).alias("_dmin"),
                F.max(self.value_col).alias("_dmax"),
            )
            d = keyed(ins, kp)
            cur = self.catalog.table(self.dst)
            merged = (
                cur.join(d, null_safe_cond(cur, d, kp), "full_outer")
                .select(
                    *[
                        F.coalesce(cur[c], d[a]).alias(c)
                        for c, a in zip(keys, kp)
                    ],
                    (
                        F.coalesce(F.col("cnt"), F.lit(0))
                        + F.coalesce(F.col("_dcnt"), F.lit(0))
                    ).alias("cnt"),
                    F.least(F.col("vmin"), F.col("_dmin")).alias("vmin"),
                    F.greatest(F.col("vmax"), F.col("_dmax")).alias("vmax"),
                )
            )
            if affected.limit(1).count() > 0:
                # Recompute ONLY the delete-touched groups, from the
                # snapshot at the applied range's END (see class doc).
                src_at = self.catalog.table(self.src, version=end)
                a = keyed(affected, kp)
                recomputed = (
                    src_at.join(
                        F.broadcast(a),
                        null_safe_cond(src_at, a, kp),
                        "left_semi",
                    )
                    .groupBy(*keys)
                    .agg(
                        F.count("*").cast("long").alias("cnt"),
                        F.min(self.value_col).alias("vmin"),
                        F.max(self.value_col).alias("vmax"),
                    )
                )
                ab = keyed(affected, kp)
                merged = (
                    merged.join(
                        F.broadcast(ab),
                        null_safe_cond(merged, ab, kp),
                        "left_anti",
                    )
                    .unionByName(recomputed)
                )
            merged = merged.filter(F.col("cnt") > 0)
            self._commit_refresh(merged, end)
            return n
        finally:
            changes.unpersist()
            if affected is not None:
                affected.unpersist()

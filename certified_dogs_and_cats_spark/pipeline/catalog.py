"""Local table catalog: name -> (path, format, partition columns).

Stands in for Unity Catalog + Delta in the reference (SURVEY.md §1.1).
Tables are partitioned parquet directories; `append` writes through
``DataFrameWriter.partitionBy`` so partition pruning works on read exactly
as it would on a cluster. On a real deployment, set ``fmt="delta"`` and
every operation maps 1:1 (plus ACID).

Design notes for 100 TB:
- partition columns are part of registration, so writers can't silently
  produce unpartitioned tables;
- `overwrite` replaces the whole table only for small dims; fact tables are
  append-only + anti-join idempotency (reference semantics);
- reads go through one place, so column pruning/pushdown hints and future
  bucketing are centralized.
"""

from __future__ import annotations

import os
import shutil
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


@dataclass
class TableSpec:
    name: str
    path: str
    schema: T.StructType
    partition_by: tuple[str, ...] = ()
    fmt: str = "parquet"


@dataclass
class Catalog:
    spark: SparkSession
    root: str
    tables: dict[str, TableSpec] = field(default_factory=dict)

    def register(
        self,
        name: str,
        schema: T.StructType,
        partition_by: tuple[str, ...] = (),
        fmt: str = "parquet",
    ) -> TableSpec:
        spec = TableSpec(
            name=name,
            path=os.path.join(self.root, name.replace(".", "/")),
            schema=schema,
            partition_by=partition_by,
            fmt=fmt,
        )
        self.tables[name] = spec
        return spec

    def exists(self, name: str) -> bool:
        spec = self.tables[name]
        return os.path.isdir(spec.path) and any(
            not f.startswith((".", "_")) for f in os.listdir(spec.path)
        )

    def table(self, name: str) -> DataFrame:
        """Read a table; empty (never-written) tables yield an empty frame
        with the declared schema, so downstream anti-joins/aggregations work
        on first run without special-casing.

        The declared schema is passed to the reader, so files written
        before a column was added (:meth:`add_column`) read back with
        nulls for it — parquet schema evolution without rewriting data.
        """
        spec = self.tables[name]
        if not self.exists(name):
            return self.spark.createDataFrame([], spec.schema)
        df = self.spark.read.format(spec.fmt).schema(spec.schema).load(spec.path)
        # Partition columns come back typed by directory inference; project
        # to the declared column order and types.
        cols = [
            df[f.name].cast(f.dataType).alias(f.name) for f in spec.schema.fields
        ]
        return df.select(*cols)

    def add_column(self, name: str, field: T.StructField) -> None:
        """ALTER TABLE ADD COLUMN: extend the declared schema in place.

        The new column must be nullable (existing files don't carry it and
        read back as NULL) and must not be a partition column. No data is
        rewritten — at 100 TB that's the entire point: schema evolution is
        a metadata operation, old files stay valid.
        """
        spec = self.tables[name]
        if not field.nullable:
            raise ValueError(
                f"added column {field.name!r} must be nullable: existing "
                "files read it back as NULL"
            )
        if any(f.name == field.name for f in spec.schema.fields):
            raise ValueError(f"column exists: {field.name}")
        spec.schema = T.StructType([*spec.schema.fields, field])

    def append(self, name: str, df: DataFrame) -> None:
        spec = self.tables[name]
        writer = df.select(*[f.name for f in spec.schema.fields]).write.format(
            spec.fmt
        ).mode("append")
        if spec.partition_by:
            writer = writer.partitionBy(*spec.partition_by)
        writer.save(spec.path)

    def overwrite_partitions(self, name: str, df: DataFrame) -> int:
        """Dynamic partition overwrite: replace ONLY the partitions present
        in ``df``, leaving all others untouched (Spark's
        ``partitionOverwriteMode=dynamic`` / Delta ``replaceWhere``).

        The incremental-refresh primitive: a daily gold rebuild overwrites
        the touched (Year, ANIMAL_TYPE) directories instead of the whole
        table — at 100 TB that is the difference between rewriting
        gigabytes and rewriting everything. Replaced partition versions are
        retired to _trash (vacuum applies retention). Returns the number of
        partitions replaced.
        """
        spec = self.tables[name]
        if not spec.partition_by:
            raise ValueError(
                f"{name} is unpartitioned — use overwrite() instead"
            )
        # Stage the write first: Spark itself generates the partition
        # directory names (Hive-style escaping, __HIVE_DEFAULT_PARTITION__
        # for NULL, lowercase booleans, date/ts formatting), so the set of
        # directories retired below is BY CONSTRUCTION the set the write
        # produced — no Python re-derivation of the encoding, and df is
        # evaluated exactly once (a nondeterministic df can't write
        # partitions that were never retired).
        tmp = spec.path + "__inc_staging"
        shutil.rmtree(tmp, ignore_errors=True)
        writer = df.select(*[f.name for f in spec.schema.fields]).write.format(
            spec.fmt
        ).mode("overwrite").partitionBy(*spec.partition_by)
        writer.save(tmp)
        stamp = str(time.time_ns())
        moved = 0
        for rel in self._staged_partition_dirs(tmp, len(spec.partition_by)):
            dst = os.path.join(spec.path, rel)
            if os.path.isdir(dst):
                trash = os.path.join(self._trash_dir(name), stamp, rel)
                os.makedirs(os.path.dirname(trash), exist_ok=True)
                os.replace(dst, trash)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.replace(os.path.join(tmp, rel), dst)
            moved += 1
        shutil.rmtree(tmp, ignore_errors=True)
        return moved

    @staticmethod
    def _staged_partition_dirs(root: str, depth: int) -> list[str]:
        """Relative ``col=value/...`` leaf partition dirs of a staged
        partitioned write, exactly as Spark named them."""
        rels = [""]
        for _ in range(depth):
            nxt = []
            for rel in rels:
                base = os.path.join(root, rel)
                for entry in sorted(os.listdir(base)):
                    if entry.startswith((".", "_")):
                        continue
                    if os.path.isdir(os.path.join(base, entry)) and "=" in entry:
                        nxt.append(os.path.join(rel, entry) if rel else entry)
            rels = nxt
        return rels

    def drop(self, name: str) -> None:
        """DROP TABLE: deregister and retire the data into _trash (recoverable
        until :meth:`vacuum` purges it — Delta-style DROP semantics)."""
        spec = self.tables.pop(name)
        if os.path.isdir(spec.path):
            trash = os.path.join(self._trash_dir(name), str(time.time_ns()))
            os.makedirs(os.path.dirname(trash), exist_ok=True)
            os.replace(spec.path, trash)

    def _trash_dir(self, name: str) -> str:
        return os.path.join(self.root, "_trash", name.replace(".", "/"))

    def overwrite(self, name: str, df: DataFrame) -> None:
        """Full-table replace (small dims / control tables only).

        The superseded table version is retired into ``_trash/<table>/<ts>``
        rather than deleted, mirroring Delta's keep-old-versions-until-VACUUM
        behavior; :meth:`vacuum` applies the retention policy.
        """
        spec = self.tables[name]
        tmp = spec.path + "__staging"
        writer = df.select(*[f.name for f in spec.schema.fields]).write.format(
            spec.fmt
        ).mode("overwrite")
        if spec.partition_by:
            writer = writer.partitionBy(*spec.partition_by)
        writer.save(tmp)
        if os.path.isdir(spec.path):
            trash = os.path.join(self._trash_dir(name), str(time.time_ns()))
            os.makedirs(os.path.dirname(trash), exist_ok=True)
            os.replace(spec.path, trash)
        os.makedirs(os.path.dirname(spec.path), exist_ok=True)
        os.replace(tmp, spec.path)

    def compact(
        self,
        name: str,
        target_files_per_partition: int = 1,
        cluster_by: tuple[str, ...] = (),
    ) -> None:
        """OPTIMIZE-style file compaction (reference docs/runbook.md:55-58):
        rewrite the table coalesced; with ``cluster_by``, additionally sort
        within write tasks on those columns — the local analog of
        ``OPTIMIZE ... ZORDER BY (cols)``. Clustered data gives parquet
        row-group min/max skipping on pushed filters over those columns
        (lexicographic sort, strongest for the leading column; true Z-order
        bit-interleaving matters only for multi-column box queries).

        Partition columns are prepended to the sort so the partitioned
        writer's required ordering is already satisfied and the cluster
        order survives the write unchanged.
        """
        spec = self.tables[name]
        df = self.table(name).coalesce(target_files_per_partition)
        if cluster_by:
            df = df.sortWithinPartitions(*spec.partition_by, *cluster_by)
        self.overwrite(name, df)

    def vacuum(self, name: str, retain_hours: float = 168.0) -> int:
        """VACUUM RETAIN <h> HOURS (reference docs/runbook.md:103-104):
        purge retired table versions older than the retention window.
        Returns the number of versions deleted."""
        trash = self._trash_dir(name)
        if not os.path.isdir(trash):
            return 0
        cutoff_ns = time.time_ns() - int(retain_hours * 3600 * 1e9)
        removed = 0
        for entry in sorted(os.listdir(trash)):
            full = os.path.join(trash, entry)
            try:
                version_ns = int(entry)
            except ValueError:
                continue
            if version_ns < cutoff_ns:
                shutil.rmtree(full)
                removed += 1
        return removed

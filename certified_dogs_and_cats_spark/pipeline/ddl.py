"""SQL DDL front door over the local :class:`~.catalog.Catalog`.

The reference manages its lakehouse through SQL DDL — schema creation
(`sql/breed_mapping.py:2-11`), table registration with partitioning,
collation, and location clauses (`notebooks/bronze.py:131-146`,
`notebooks/silver.py:141-161`, `sql/register_bronze.sql:1-4`), and
`CREATE OR REPLACE VIEW` for the health/gold layers
(`notebooks/bronze.py:151-158`). This module accepts that exact dialect
and executes it against the engine's catalog, closing the gap between the
Python `Catalog.register` API and a SQL-first user.

Supported statements (the reference's full DDL surface):

- ``USE CATALOG c`` / ``USE SCHEMA s``
- ``CREATE SCHEMA [IF NOT EXISTS] name [COMMENT '...']``
- ``CREATE TABLE [IF NOT EXISTS] name (col TYPE [NOT NULL], ...)
  [USING fmt] [PARTITIONED BY (...)] [DEFAULT COLLATION ...]
  [LOCATION '...']`` — LOCATION is advisory locally (tables live under
  the catalog root); DELTA maps to parquet in this build.
- ``CREATE [OR REPLACE] VIEW name AS <select>`` — the SELECT may
  reference fully-qualified table names; they are resolved against the
  catalog and the view is registered for ``spark.sql`` use.
- ``DROP TABLE|VIEW [IF EXISTS] name``
- ``SHOW SCHEMAS`` / ``SHOW TABLES`` / ``DESCRIBE [TABLE] name``

Statements are ``;``-separated; ``--`` comments are stripped. This is a
deliberate small-surface parser, not a SQL engine — anything SELECT-
shaped is delegated to Spark SQL untouched.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .catalog import Catalog

_TYPE_MAP = {
    "INT": T.IntegerType(),
    "INTEGER": T.IntegerType(),
    "BIGINT": T.LongType(),
    "SMALLINT": T.ShortType(),
    "STRING": T.StringType(),
    "BOOLEAN": T.BooleanType(),
    "TIMESTAMP": T.TimestampType(),
    "DATE": T.DateType(),
    "DOUBLE": T.DoubleType(),
    "FLOAT": T.FloatType(),
}


class DdlError(ValueError):
    pass


def _strip_comments(sql: str) -> str:
    return re.sub(r"--[^\n]*", "", sql)


def _view_alias(name: str) -> str:
    return name.replace(".", "_")


@dataclass
class DdlSession:
    """Holds namespace state (USE CATALOG/SCHEMA) across statements."""

    catalog: Catalog
    current_catalog: str = "pets"
    current_schema: str = "core"
    schemas: set[str] = field(default_factory=lambda: {"core"})
    views: dict[str, str] = field(default_factory=dict)

    # -- name resolution -----------------------------------------------------
    def resolve(self, name: str) -> str:
        """3-part pets.core.t -> 'core.t'; 1-part t -> '<current_schema>.t'."""
        parts = name.split(".")
        if len(parts) == 3:
            if parts[0] != self.current_catalog:
                raise DdlError(
                    f"unknown catalog {parts[0]!r} (this build manages "
                    f"{self.current_catalog!r})"
                )
            return ".".join(parts[1:])
        if len(parts) == 2:
            return name
        return f"{self.current_schema}.{name}"

    # -- statement execution -------------------------------------------------
    def execute(self, sql: str) -> list[DataFrame | None]:
        """Run a ;-separated DDL script; returns one result per statement
        (DataFrames for SHOW/DESCRIBE/VIEW-select, else None)."""
        out: list[DataFrame | None] = []
        for stmt in _strip_comments(sql).split(";"):
            stmt = stmt.strip()
            if stmt:
                out.append(self._execute_one(stmt))
        return out

    def _execute_one(self, stmt: str) -> DataFrame | None:
        s = re.sub(r"\s+", " ", stmt).strip()
        u = s.upper()
        if u.startswith("USE CATALOG "):
            self.current_catalog = s.split()[2]
            return None
        if u.startswith("USE SCHEMA ") or u.startswith("USE "):
            self.current_schema = s.split()[-1].split(".")[-1]
            return None
        if u.startswith("CREATE SCHEMA"):
            return self._create_schema(s)
        if u.startswith("CREATE TABLE"):
            return self._create_table(stmt)
        if re.match(r"CREATE (OR REPLACE )?VIEW", u):
            return self._create_view(stmt)
        if u.startswith("DROP TABLE") or u.startswith("DROP VIEW"):
            return self._drop(s)
        if u == "SHOW SCHEMAS":
            return self.catalog.spark.createDataFrame(
                [(x,) for x in sorted(self.schemas)], "schema_name string"
            )
        if u == "SHOW TABLES":
            rows = [
                (n.rsplit(".", 1)[0], n.rsplit(".", 1)[1], spec.fmt)
                for n, spec in sorted(self.catalog.tables.items())
            ]
            return self.catalog.spark.createDataFrame(
                rows or [], "schema_name string, table_name string, format string"
            )
        if u.startswith("SELECT ") or u.startswith("WITH "):
            return self.catalog.spark.sql(self._resolve_refs(stmt))
        if u.startswith("EXPLAIN "):
            plan = (
                self.catalog.spark.sql(self._resolve_refs(stmt[len("EXPLAIN "):]))
                ._jdf.queryExecution()
                .explainString(
                    self.catalog.spark._jvm.org.apache.spark.sql.execution
                    .ExplainMode.fromString("formatted")
                )
            )
            return self.catalog.spark.createDataFrame(
                [(line,) for line in plan.splitlines()], "plan string"
            )
        if u.startswith("DESCRIBE"):
            name = self.resolve(s.split()[-1])
            spec = self.catalog.tables.get(name)
            if spec is None:
                raise DdlError(f"table not found: {name}")
            rows = [
                (f.name, f.dataType.simpleString(), f.nullable,
                 f.name in spec.partition_by)
                for f in spec.schema.fields
            ]
            return self.catalog.spark.createDataFrame(
                rows,
                "col_name string, data_type string, nullable boolean, "
                "is_partition boolean",
            )
        raise DdlError(f"unsupported statement: {s[:80]}")

    def _create_schema(self, s: str) -> None:
        m = re.match(
            r"CREATE SCHEMA (IF NOT EXISTS )?(?P<name>[\w.]+)", s, re.I
        )
        if not m:
            raise DdlError(f"bad CREATE SCHEMA: {s}")
        name = m.group("name").split(".")[-1]
        if name in self.schemas and not m.group(1):
            raise DdlError(f"schema exists: {name}")
        self.schemas.add(name)
        return None

    def _create_table(self, stmt: str) -> None:
        s = re.sub(r"\s+", " ", stmt).strip()
        m = re.match(
            r"CREATE TABLE (IF NOT EXISTS )?(?P<name>[\w.]+) ?"
            r"\((?P<cols>[^)]*)\)"
            r"(?: USING (?P<fmt>\w+))?"
            r"(?: PARTITIONED BY \((?P<parts>[^)]*)\))?"
            r"(?: DEFAULT COLLATION \w+)?"
            r"(?: LOCATION '(?P<loc>[^']*)')?\s*$",
            s,
            re.I,
        )
        if not m:
            raise DdlError(f"bad CREATE TABLE: {s[:120]}")
        name = self.resolve(m.group("name"))
        if name in self.catalog.tables:
            if m.group(1):  # IF NOT EXISTS
                return None
            raise DdlError(f"table exists: {name}")
        fields = []
        for coldef in m.group("cols").split(","):
            toks = coldef.strip().split()
            if len(toks) < 2:
                raise DdlError(f"bad column def: {coldef!r}")
            cname, ctype = toks[0], toks[1].upper()
            if ctype not in _TYPE_MAP:
                raise DdlError(f"unsupported type {ctype!r} for {cname!r}")
            nullable = "NOT NULL" not in coldef.upper()
            fields.append(T.StructField(cname, _TYPE_MAP[ctype], nullable))
        parts = tuple(
            p.strip() for p in (m.group("parts") or "").split(",") if p.strip()
        )
        fmt = (m.group("fmt") or "parquet").lower()
        # DELTA maps onto the local parquet+manifest catalog (SURVEY §1.1).
        self.catalog.register(
            name,
            T.StructType(fields),
            partition_by=parts,
            fmt="parquet" if fmt == "delta" else fmt,
        )
        return None

    def _create_view(self, stmt: str) -> DataFrame:
        m = re.match(
            r"CREATE (OR REPLACE )?VIEW (?P<name>[\w.]+) AS (?P<body>.*)$",
            re.sub(r"\s+", " ", stmt).strip(),
            re.I | re.S,
        )
        if not m:
            raise DdlError(f"bad CREATE VIEW: {stmt[:120]}")
        name = self.resolve(m.group("name"))
        if name in self.views and not m.group(1):
            raise DdlError(f"view exists: {name}")
        body = self._resolve_refs(m.group("body"))
        df = self.catalog.spark.sql(body)
        df.createOrReplaceTempView(_view_alias(name))
        self.views[name] = body
        return df

    def _resolve_refs(self, body: str) -> str:
        """Resolve fully-qualified table/view references in a SELECT body
        against the catalog: expose each referenced table as a sanitized
        temp view and rewrite the reference."""
        for tbl in sorted(self.catalog.tables, key=len, reverse=True):
            for prefix in (f"{self.current_catalog}.{tbl}", tbl):
                if re.search(rf"(?<![\w.]){re.escape(prefix)}(?![\w.])", body):
                    alias = _view_alias(tbl)
                    self.catalog.table(tbl).createOrReplaceTempView(alias)
                    body = re.sub(
                        rf"(?<![\w.]){re.escape(prefix)}(?![\w.])", alias, body
                    )
        for view in sorted(self.views, key=len, reverse=True):
            for prefix in (f"{self.current_catalog}.{view}", view):
                body = re.sub(
                    rf"(?<![\w.]){re.escape(prefix)}(?![\w.])",
                    _view_alias(view),
                    body,
                )
        return body

    def _drop(self, s: str) -> None:
        m = re.match(
            r"DROP (?P<kind>TABLE|VIEW) (IF EXISTS )?(?P<name>[\w.]+)", s, re.I
        )
        if not m:
            raise DdlError(f"bad DROP: {s}")
        name = self.resolve(m.group("name"))
        if m.group("kind").upper() == "TABLE":
            if name not in self.catalog.tables:
                if m.group(2):
                    return None
                raise DdlError(f"table not found: {name}")
            self.catalog.drop(name)
        else:
            if name not in self.views:
                if m.group(2):
                    return None
                raise DdlError(f"view not found: {name}")
            del self.views[name]
            self.catalog.spark.catalog.dropTempView(_view_alias(name))
        return None

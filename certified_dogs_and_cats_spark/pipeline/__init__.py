"""Staged lakehouse ETL with the reference pipeline's semantics.

raw CSV drops -> Bronze (standardize + guard + idempotent append)
             -> Silver (re-standardize, dim join, window dedup, append)
             -> Gold   (analytics views)

Re-expressed Spark-first (SURVEY.md §3): explicit schemas, single-pass
aggregated guards (the reference re-scans per guard — we don't), anti-join
exactly-once appends, broadcast dim lookup, partitioned parquet tables via a
local catalog (stands in for Unity Catalog + Delta; swap the catalog's
format for Delta on a real deployment).
"""

from .catalog import Catalog, ChangeCursor, ConcurrentWriteConflict
from .ddl import DdlError, DdlSession
from .incremental import IncrementalAggregate, IncrementalExtrema
from .scd import Scd2Dimension
from .runner import PipelineRunner, SkipRun, build_daily_pipeline
from .schedule import CronSchedule, ScheduledJob

__all__ = [
    "Catalog",
    "ChangeCursor",
    "ConcurrentWriteConflict",
    "CronSchedule",
    "DdlError",
    "DdlSession",
    "IncrementalAggregate",
    "IncrementalExtrema",
    "Scd2Dimension",
    "PipelineRunner",
    "ScheduledJob",
    "SkipRun",
    "build_daily_pipeline",
]

"""Tracked persist/release for multi-branch query plans.

Several operators persist an intermediate frame that feeds two or more plan
branches (LSH bucket frames, KMeans-assigned corpora): the persist is what
keeps the scan + transform from running once per branch. But ``persist``
outlives the query — Spark only frees it on ``unpersist``/``clearCache`` —
and the operator cannot unpersist before returning a *lazy* result that
still references the cached frame.

The contract: operators route persists through :func:`tracked_persist`;
callers that run many queries in one session (benchmarks, services, the
correctness checker) call :func:`release_cached` after consuming each
result. One-shot scripts can ignore it — the cache dies with the session.
``spark.catalog.clearCache()`` is an equivalent, blunter alternative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for :func:`release_cached`."""
    df.persist()
    _TRACKED.append(df)
    return df


def release_cached() -> int:
    """Unpersist every tracked frame; returns how many were released."""
    n = len(_TRACKED)
    for df in _TRACKED:
        df.unpersist()
    _TRACKED.clear()
    return n

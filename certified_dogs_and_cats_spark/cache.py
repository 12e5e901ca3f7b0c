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

import atexit
import hashlib
import os
import shutil
import tempfile
import time
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for :func:`release_cached`."""
    df.persist()
    _TRACKED.append(df)
    return df


def release_cached() -> int:
    """Unpersist every tracked frame; returns how many were released.

    Defensive per frame: a caller that runs several sessions in one
    process (the report scripts) may stop a session while its tracked
    frames are still registered — unpersisting those raises from a dead
    BlockManagerMaster, and the storage is already gone with the
    context, so the failure carries no information. Never let one dead
    frame block releasing the live ones — but surface the FIRST failure
    on stderr (ADVICE r12: a live-context unpersist error would indicate
    a real bug and must not vanish silently)."""
    n = len(_TRACKED)
    first_err: Exception | None = None
    for df in _TRACKED:
        try:
            df.unpersist()
        except Exception as exc:  # noqa: BLE001 — usually a dead context
            if first_err is None:
                first_err = exc
    if first_err is not None:
        import sys

        print(
            f"release_cached: suppressed unpersist failure: {first_err!r}",
            file=sys.stderr,
        )
    _TRACKED.clear()
    return n


# ---------------------------------------------------------------------------
# Build-once memoization: expensive DETERMINISTIC artifacts (trained ANN
# indexes, connected-components labelings) that several queries consume.
#
# A warehouse builds an index / dedup labeling ONCE and pays per-query
# search cost thereafter; a per-query benchmark that re-trains the model
# every run mismeasures that. The memo materializes the first build to a
# process-scoped parquet directory and hands every later consumer a plain
# parquet read of the same bytes — valid across ``release_cached()`` /
# ``clearCache()`` (which drop executor-memory cache, not files) and even
# across SparkSession restarts within the process. Build wall-clock is
# recorded in :data:`BUILD_SECONDS` so benchmarks can report build and
# search costs separately instead of folding one into the other.
#
# Correctness contract: builders MUST be deterministic pure functions of
# the key (the repo's trainers sample by value-hash and sort collected
# rows, so they are) — the memo changes WHEN work happens, never results.
# ---------------------------------------------------------------------------

_MEMO_ROOT: list[str] = []
_MEMO: dict[str, tuple[dict[str, str], Any]] = {}

#: label -> seconds spent in the FIRST build of that artifact this process.
BUILD_SECONDS: dict[str, float] = {}


def _memo_root() -> str:
    if not _MEMO_ROOT:
        root = tempfile.mkdtemp(prefix="cdc_build_memo_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        _MEMO_ROOT.append(root)
    return _MEMO_ROOT[0]


def memoized_build(
    spark: SparkSession,
    key_parts: tuple,
    builder: Callable[[], tuple[dict[str, DataFrame], Any]],
    label: str,
) -> tuple[dict[str, DataFrame], Any]:
    """Build-once, read-many. ``builder() -> (frames, payload)`` where
    ``frames`` maps name -> DataFrame and ``payload`` is any picklable
    driver-side model state (e.g. PQ codebooks). The first call per
    ``key_parts`` materializes each frame to parquet and stores the
    payload; every call returns freshly-read frames bound to the CALLER's
    session plus the stored payload."""
    key = repr(key_parts)
    if key not in _MEMO:
        t0 = time.time()
        frames, payload = builder()
        base = os.path.join(
            _memo_root(), hashlib.md5(key.encode()).hexdigest()
        )
        paths = {}
        for name, df in frames.items():
            path = os.path.join(base, name)
            df.write.mode("overwrite").parquet(path)
            paths[name] = path
        BUILD_SECONDS[label] = round(
            BUILD_SECONDS.get(label, 0.0) + time.time() - t0, 3
        )
        _MEMO[key] = (paths, payload)
    paths, payload = _MEMO[key]
    return (
        {name: spark.read.parquet(path) for name, path in paths.items()},
        payload,
    )


def memoized_parquet(
    spark: SparkSession,
    key_parts: tuple,
    builder: Callable[[], DataFrame],
    label: str,
) -> DataFrame:
    """Single-frame convenience wrapper over :func:`memoized_build`."""
    frames, _ = memoized_build(
        spark, key_parts, lambda: ({"df": builder()}, None), label
    )
    return frames["df"]

"""Staged DAG runner: the engine's stand-in for the reference's Workflow.

Capability parity with ``Workflow/Daily_Licensed_Pets.yaml:8-59``:

- a named chain of stages with explicit ``depends_on`` edges
  (fetch -> bronze -> silver -> gold in the daily pipeline);
- per-stage retry budget with backoff (the reference gives Bronze 2x @ 30 min
  and Silver 2x @ 10 min);
- ONE shared run parameter (``ingestion_date``) resolved once at submit time
  and passed to every stage, exactly like the job-level ``parameters`` block
  (yaml:56-58);
- early-exit semantics: a stage may raise :class:`SkipRun` (the engine's
  ``dbutils.notebook.exit`` — reference notebooks/bronze.py:56,66,115) or
  return a :class:`StageResult` with a ``skipped_*`` status. Either way the
  stage counts as *successful* and downstream stages still run — skipping a
  date that is already loaded must not fail the job.

A stage failure (after retries) marks the stage ``failed`` and cascades
``upstream_failed`` to its dependents, like Databricks task states; unrelated
branches still run. The runner is driver-side-only orchestration — all data
movement stays inside the stage functions as Spark plans, so there is nothing
here that grows with data volume.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterable, Mapping
from dataclasses import dataclass, field
from datetime import date, datetime
from typing import Any

from .ingest import StageResult


class SkipRun(Exception):
    """Early, *successful* exit from a stage (dbutils.notebook.exit parity).

    ``raise SkipRun("skipped_no_files")`` ends the stage with that status;
    downstream stages still execute.
    """

    def __init__(self, status: str = "skipped", rows: int = 0) -> None:
        super().__init__(status)
        self.result = StageResult(status, rows=rows)


@dataclass
class Stage:
    """One task in the DAG.

    ``fn`` receives the shared run parameters as keyword arguments plus
    ``upstream`` — a dict of completed upstream StageResults — and returns a
    :class:`StageResult` (anything else is wrapped as status="done").
    """

    name: str
    fn: Callable[..., Any]
    depends_on: tuple[str, ...] = ()
    max_retries: int = 2
    retry_backoff_s: float = 0.0


@dataclass
class StageRun:
    """Outcome of one stage: terminal state + result + attempt count."""

    state: str  # succeeded | failed | upstream_failed
    result: StageResult | None = None
    attempts: int = 0
    error: BaseException | None = None


@dataclass
class PipelineRunner:
    stages: list[Stage] = field(default_factory=list)
    #: Called once per failed stage with (stage_name, StageRun) — the local
    #: analog of the reference Workflow's on_failure email notification
    #: (Daily_Licensed_Pets.yaml:55-58). Exceptions from the hook are
    #: swallowed: notification failure must not mask the stage failure.
    on_failure: Callable[[str, StageRun], None] | None = None

    def add(
        self,
        name: str,
        fn: Callable[..., Any],
        depends_on: Iterable[str] = (),
        max_retries: int = 2,
        retry_backoff_s: float = 0.0,
    ) -> "PipelineRunner":
        if any(s.name == name for s in self.stages):
            raise ValueError(f"duplicate stage name {name!r}")
        self.stages.append(
            Stage(name, fn, tuple(depends_on), max_retries, retry_backoff_s)
        )
        return self

    def _topo_order(self) -> list[Stage]:
        by_name = {s.name: s for s in self.stages}
        for s in self.stages:
            for d in s.depends_on:
                if d not in by_name:
                    raise ValueError(f"stage {s.name!r} depends on unknown {d!r}")
        done: list[Stage] = []
        seen: set[str] = set()
        visiting: set[str] = set()

        def visit(s: Stage) -> None:
            if s.name in seen:
                return
            if s.name in visiting:
                raise ValueError(f"dependency cycle through {s.name!r}")
            visiting.add(s.name)
            for d in s.depends_on:
                visit(by_name[d])
            visiting.discard(s.name)
            seen.add(s.name)
            done.append(s)

        for s in self.stages:
            visit(s)
        return done

    def run(self, **params: Any) -> dict[str, StageRun]:
        """Execute the DAG with the shared parameters; returns per-stage runs."""
        runs: dict[str, StageRun] = {}
        for stage in self._topo_order():
            bad = [d for d in stage.depends_on if runs[d].state != "succeeded"]
            if bad:
                runs[stage.name] = StageRun("upstream_failed")
                continue
            upstream = {
                d: runs[d].result for d in stage.depends_on if runs[d].result
            }
            run = self._run_stage(stage, params, upstream)
            runs[stage.name] = run
            if run.state == "failed" and self.on_failure is not None:
                try:
                    self.on_failure(stage.name, run)
                except Exception:  # noqa: BLE001, S110
                    pass
        return runs

    @staticmethod
    def _run_stage(
        stage: Stage, params: Mapping[str, Any], upstream: Mapping[str, StageResult]
    ) -> StageRun:
        attempts = 0
        last_err: BaseException | None = None
        while attempts <= stage.max_retries:
            attempts += 1
            try:
                out = stage.fn(upstream=upstream, **params)
            except SkipRun as skip:
                return StageRun("succeeded", skip.result, attempts)
            except Exception as err:  # noqa: BLE001 — retry budget applies
                last_err = err
                if attempts <= stage.max_retries and stage.retry_backoff_s:
                    time.sleep(stage.retry_backoff_s)
                continue
            if not isinstance(out, StageResult):
                out = StageResult("done", rows=0)
            return StageRun("succeeded", out, attempts)
        return StageRun("failed", None, attempts, last_err)


def build_daily_pipeline(
    catalog: Any,
    raw_root: str,
    fetch: Callable[..., Any] | None = None,
    clock: datetime | None = None,
) -> PipelineRunner:
    """The reference's 4-task daily chain, wired over this engine's stages.

    fetch -> bronze -> silver -> gold (Workflow/Daily_Licensed_Pets.yaml:13-53)
    with the shared ``ingestion_date`` parameter. ``fetch`` defaults to a
    no-op (the drop is assumed landed); pass a callable to pull data into
    ``raw_root/ingestion_date=D/``. ``clock`` pins timestamps for
    reproducible runs (tests / oracle comparison); None = wall clock.
    """
    from .analytics import gold_stage
    from .ingest import bronze_stage
    from .refine import silver_stage

    def _clock() -> datetime:
        # Naive-UTC now: utcnow() is deprecated, and an AWARE datetime
        # would be re-interpreted against the session timezone by
        # F.lit(...). The session pins spark.sql.session.timeZone=UTC,
        # so naive-UTC wall time is the one representation that stores
        # the same instant on every machine.
        from datetime import timezone

        return clock or datetime.now(timezone.utc).replace(tzinfo=None)

    def fetch_fn(upstream: Mapping[str, StageResult], ingestion_date: date) -> Any:
        if fetch is None:
            return StageResult("done")
        return fetch(raw_root=raw_root, ingestion_date=ingestion_date)

    def bronze_fn(upstream: Mapping[str, StageResult], ingestion_date: date) -> Any:
        return bronze_stage(catalog, raw_root, ingestion_date, _clock())

    def silver_fn(upstream: Mapping[str, StageResult], ingestion_date: date) -> Any:
        if upstream["bronze"].status in ("skipped_no_files",):
            raise SkipRun("skipped_no_files")
        return silver_stage(catalog, ingestion_date, _clock())

    def gold_fn(upstream: Mapping[str, StageResult], ingestion_date: date) -> Any:
        return gold_stage(catalog)

    runner = PipelineRunner()
    runner.add("fetch", fetch_fn)
    runner.add("bronze", bronze_fn, depends_on=["fetch"], max_retries=2)
    runner.add("silver", silver_fn, depends_on=["bronze"], max_retries=2)
    runner.add("gold", gold_fn, depends_on=["silver"], max_retries=2)
    return runner

"""DAG runner semantics (reference Workflow/Daily_Licensed_Pets.yaml:8-59):
dependency order, retries with budget, skip-as-success, failure cascade,
and the wired 4-stage daily pipeline end-to-end."""

from __future__ import annotations

import pytest

from certified_dogs_and_cats_spark.pipeline import (
    PipelineRunner,
    SkipRun,
    build_daily_pipeline,
)
from certified_dogs_and_cats_spark.pipeline.ingest import StageResult

from conftest import CLOCK1, CLOCK2, D1, D2, DROP1, DROP2, write_drop


def test_runner_runs_in_dependency_order():
    order = []

    def mk(name):
        def fn(upstream, **kw):
            order.append(name)
            return StageResult("done")

        return fn

    r = PipelineRunner()
    r.add("c", mk("c"), depends_on=["b"])
    r.add("a", mk("a"))
    r.add("b", mk("b"), depends_on=["a"])
    runs = r.run()
    assert order == ["a", "b", "c"]
    assert all(v.state == "succeeded" for v in runs.values())


def test_runner_retries_until_budget():
    calls = {"n": 0}

    def flaky(upstream, **kw):
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return StageResult("done")

    r = PipelineRunner().add("s", flaky, max_retries=2)
    runs = r.run()
    assert runs["s"].state == "succeeded"
    assert runs["s"].attempts == 3


def test_runner_fails_after_budget_and_cascades():
    def always_fails(upstream, **kw):
        raise RuntimeError("boom")

    def never_runs(upstream, **kw):  # pragma: no cover
        raise AssertionError("downstream of a failed stage must not run")

    def independent(upstream, **kw):
        return StageResult("done")

    r = PipelineRunner()
    r.add("bad", always_fails, max_retries=1)
    r.add("down", never_runs, depends_on=["bad"])
    r.add("other", independent)
    runs = r.run()
    assert runs["bad"].state == "failed"
    assert runs["bad"].attempts == 2  # 1 try + 1 retry
    assert isinstance(runs["bad"].error, RuntimeError)
    assert runs["down"].state == "upstream_failed"
    assert runs["other"].state == "succeeded"  # unrelated branch still runs


def test_runner_skip_is_success():
    def skipper(upstream, **kw):
        raise SkipRun("skipped_no_files")

    seen = {}

    def downstream(upstream, **kw):
        seen.update(upstream)
        return StageResult("done")

    r = PipelineRunner()
    r.add("skip", skipper)
    r.add("down", downstream, depends_on=["skip"])
    runs = r.run()
    assert runs["skip"].state == "succeeded"
    assert runs["skip"].result.status == "skipped_no_files"
    assert runs["down"].state == "succeeded"
    assert seen["skip"].status == "skipped_no_files"


def test_runner_rejects_cycles_and_unknown_deps():
    r = PipelineRunner()
    r.add("a", lambda upstream, **kw: None, depends_on=["b"])
    r.add("b", lambda upstream, **kw: None, depends_on=["a"])
    with pytest.raises(ValueError, match="cycle"):
        r.run()
    r2 = PipelineRunner().add(
        "a", lambda upstream, **kw: None, depends_on=["ghost"]
    )
    with pytest.raises(ValueError, match="unknown"):
        r2.run()


def test_daily_pipeline_end_to_end(catalog, raw_root):
    write_drop(raw_root, D1, DROP1)
    runner = build_daily_pipeline(catalog, raw_root, clock=CLOCK1)
    runs = runner.run(ingestion_date=D1)
    assert [runs[s].state for s in ("fetch", "bronze", "silver", "gold")] == [
        "succeeded"
    ] * 4
    assert runs["bronze"].result.rows == 6
    assert runs["silver"].result.rows == 6

    # Gold views are registered and queryable.
    totals = catalog.spark.sql(
        "SELECT * FROM pets_gold_v_totals_by_year_type "
        "ORDER BY Year, ANIMAL_TYPE"
    ).collect()
    got = {(r["Year"], r["ANIMAL_TYPE"]): r for r in totals}
    # DROP1: 2024 has 2 DOG + 1 CAT; 2025 has 2 DOG + 1 CAT.
    assert got[(2024, "DOG")]["cnt"] == 2
    assert got[(2024, "DOG")]["share_pct"] == 66.67
    assert got[(2024, "DOG")]["rnk"] == 1
    assert got[(2024, "CAT")]["cnt"] == 1
    assert got[(2025, "CAT")]["cnt"] == 1

    # Day 2 incremental run through the same DAG.
    write_drop(raw_root, D2, DROP2)
    runner2 = build_daily_pipeline(catalog, raw_root, clock=CLOCK2)
    runs2 = runner2.run(ingestion_date=D2)
    assert runs2["bronze"].result.rows == 2
    assert runs2["silver"].result.rows == 2
    health = catalog.spark.sql(
        "SELECT * FROM pets_gold_v_silver_health"
    ).collect()[0]
    assert health["row_cnt"] == 8
    assert health["distinct_ids"] == 8


def test_daily_pipeline_no_files_skips_cleanly(catalog, raw_root):
    runner = build_daily_pipeline(catalog, raw_root, clock=CLOCK1)
    runs = runner.run(ingestion_date=D1)
    assert runs["bronze"].result.status == "skipped_no_files"
    assert runs["silver"].result.status == "skipped_no_files"
    assert runs["gold"].state == "succeeded"


def test_on_failure_hook_fires_once_per_failed_stage():
    seen = []
    r = PipelineRunner(on_failure=lambda name, run: seen.append((name, run.state)))
    r.add("a", lambda upstream: 1, max_retries=0)
    r.add("b", lambda upstream: 1 / 0, max_retries=1)
    r.add("c", lambda upstream: 1, depends_on=("b",))
    runs = r.run()
    assert runs["b"].state == "failed" and runs["b"].attempts == 2
    assert runs["c"].state == "upstream_failed"
    assert seen == [("b", "failed")]  # not for upstream_failed cascades


def test_on_failure_hook_errors_do_not_mask_failure():
    def bad_hook(name, run):
        raise RuntimeError("notifier down")

    r = PipelineRunner(on_failure=bad_hook)
    r.add("a", lambda upstream: 1 / 0, max_retries=0)
    assert r.run()["a"].state == "failed"

"""Quartz-cron trigger semantics (pipeline/schedule.py) — the local analog
of the reference workflow's schedule block (Daily_Licensed_Pets.yaml:8-11:
quartz_cron_expression '41 0 10 * * ?', timezone_id, pause_status)."""

from __future__ import annotations

from datetime import datetime, timedelta
from zoneinfo import ZoneInfo

import pytest

from certified_dogs_and_cats_spark.pipeline.runner import PipelineRunner
from certified_dogs_and_cats_spark.pipeline.schedule import (
    CronSchedule,
    ScheduledJob,
)


def test_reference_daily_expression_fires_at_10_00_41():
    s = CronSchedule("41 0 10 * * ?")
    nxt = s.next_fire_time(datetime(2026, 8, 14, 9, 0, 0))
    assert nxt == datetime(2026, 8, 14, 10, 0, 41)
    # Strictly-after: polling AT the fire time rolls to tomorrow.
    assert s.next_fire_time(nxt) == datetime(2026, 8, 15, 10, 0, 41)


def test_timezone_applies_when_given():
    tz = ZoneInfo("America/New_York")
    s = CronSchedule("41 0 10 * * ?", tz=tz)
    nxt = s.next_fire_time(datetime(2026, 8, 14, 9, 0, 0))
    assert nxt.tzinfo is tz and nxt.hour == 10 and nxt.second == 41


def test_steps_ranges_lists_and_dow():
    # Every 15 minutes during business hours, weekdays only.
    s = CronSchedule("0 0/15 9-17 ? * MON-FRI")
    # 2026-08-14 is a Friday.
    nxt = s.next_fire_time(datetime(2026, 8, 14, 17, 45, 0))
    # Past the last Friday slot (17:45 matches 0/15! so next is 17:45? no:
    # strictly after 17:45:00 -> nothing later that hour except none;
    # Saturday/Sunday excluded -> Monday 09:00.
    assert nxt == datetime(2026, 8, 17, 9, 0, 0)
    lst = CronSchedule("0 5,35 12 ? * *")
    assert lst.next_fire_time(datetime(2026, 1, 1, 12, 6, 0)) == datetime(
        2026, 1, 1, 12, 35, 0
    )


def test_dom_dow_exclusivity_and_specials_rejected():
    with pytest.raises(ValueError, match="'\\?'"):
        CronSchedule("0 0 0 1 * MON")
    with pytest.raises(ValueError, match="unsupported Quartz special"):
        CronSchedule("0 0 0 L * ?")
    with pytest.raises(ValueError, match="6 or 7 fields"):
        CronSchedule("0 0 0")


def test_never_firing_calendar_raises():
    with pytest.raises(ValueError, match="never fires"):
        CronSchedule("0 0 0 30 2 ?").next_fire_time(datetime(2026, 1, 1))


def test_catchup_and_pause_and_triggered_run():
    runs = []
    runner = PipelineRunner()
    runner.add("only", lambda upstream, ingestion_date: runs.append(ingestion_date))
    job = ScheduledJob(runner, CronSchedule("41 0 10 * * ?"), name="daily")
    last = datetime(2026, 8, 11, 10, 0, 41)
    now = datetime(2026, 8, 14, 9, 0, 0)
    due = job.due_fire_times(last, now)
    # Missed ticks between the high-water mark and now: 12th and 13th.
    assert [d.date().day for d in due] == [12, 13]
    for t in due:
        out = job.run_for(t)
        assert out["only"].state == "succeeded"
    assert [d.day for d in runs] == [12, 13]
    paused = ScheduledJob(
        runner, CronSchedule("41 0 10 * * ?", paused=True), name="p"
    )
    assert paused.due_fire_times(last, now) == []


def test_year_field_and_wraparound_dow():
    s = CronSchedule("0 0 0 ? * FRI-MON 2027")
    nxt = s.next_fire_time(datetime(2026, 12, 31, 23, 59, 59))
    # 2027-01-01 is a Friday.
    assert nxt == datetime(2027, 1, 1, 0, 0, 0)
    sat = s.next_fire_time(nxt)
    assert sat == datetime(2027, 1, 2, 0, 0, 0)
    # Tuesday-Thursday excluded by the FRI-MON wrap.
    mon = s.next_fire_time(datetime(2027, 1, 3, 0, 0, 0))
    assert mon == datetime(2027, 1, 4, 0, 0, 0)
    after_mon = s.next_fire_time(mon)
    assert after_mon == datetime(2027, 1, 8, 0, 0, 0)

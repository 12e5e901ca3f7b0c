"""Quartz-cron trigger semantics for the DAG runner.

The reference workflow is driven by a Databricks job schedule
(``Workflow/Daily_Licensed_Pets.yaml:8-11``): a Quartz cron expression
(``41 0 10 * * ?``), a timezone id, and a pause status. This module gives
the engine's :class:`~.runner.PipelineRunner` the same trigger semantics
without any scheduler infrastructure: pure next-fire-time computation the
host (cron, Airflow, a while-loop) can poll.

Supported Quartz subset — the 6/7-field form ``sec min hour dom month dow
[year]`` with ``*``, ``?``, lists (``,``), ranges (``-``), steps (``/``)
and the month/day names (``JAN``, ``MON``...). The calendar specials
(``L W #``) are not supported and raise. Day-of-month/day-of-week follow
the Quartz rule: one of the two must be ``?``; if both are restricted the
expression is rejected (Quartz itself reject this too).

The next-fire search iterates DAYS (bounded: 4 years, then raises for
never-firing expressions like Feb 30) and picks times-of-day from the
precomputed sorted (hour, minute, second) sets, so it is O(days + hits),
never a per-second scan.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import date, datetime, time as dtime, timedelta
from typing import Iterator

_MONTHS = {
    "JAN": 1, "FEB": 2, "MAR": 3, "APR": 4, "MAY": 5, "JUN": 6,
    "JUL": 7, "AUG": 8, "SEP": 9, "OCT": 10, "NOV": 11, "DEC": 12,
}
# Quartz day-of-week: 1 = SUN ... 7 = SAT.
_DOWS = {
    "SUN": 1, "MON": 2, "TUE": 3, "WED": 4, "THU": 5, "FRI": 6, "SAT": 7,
}

_FIELD_RANGES = {
    "second": (0, 59),
    "minute": (0, 59),
    "hour": (0, 23),
    "dom": (1, 31),
    "month": (1, 12),
    "dow": (1, 7),
    "year": (1970, 2199),
}


def _parse_field(expr: str, name: str) -> frozenset[int] | None:
    """Value set for one cron field; None means unrestricted (* or ?)."""
    lo, hi = _FIELD_RANGES[name]
    names = _MONTHS if name == "month" else _DOWS if name == "dow" else {}

    def atom(tok: str) -> int:
        tok = tok.upper()
        if tok in names:
            return names[tok]
        v = int(tok)
        if not lo <= v <= hi:
            raise ValueError(f"{name} value {v} outside [{lo}, {hi}]")
        return v

    if expr in ("*", "?"):
        return None
    for bad in ("L", "W", "#"):
        if bad in expr.upper() and expr.upper() not in names:
            if not any(bad in k for k in names):
                raise ValueError(
                    f"unsupported Quartz special {bad!r} in {name} field"
                )
    out: set[int] = set()
    for part in expr.split(","):
        step = 1
        stepped = "/" in part
        if stepped:
            part, step_s = part.split("/", 1)
            step = int(step_s)
            if step < 1:
                raise ValueError(f"step must be >= 1 in {name} field")
        if part in ("*", ""):
            start, end = lo, hi
        elif "-" in part:
            a, b = part.split("-", 1)
            start, end = atom(a), atom(b)
            if end < start:  # wrap-around range (e.g. FRI-MON)
                out.update(range(start, hi + 1, step))
                out.update(range(lo, end + 1, step))
                continue
        else:
            start = atom(part)
            # Quartz: "n/step" runs n, n+step ... to the field max;
            # a bare "n" is the single value.
            end = hi if stepped else start
        out.update(range(start, end + 1, step))
    return frozenset(out)


@dataclass(frozen=True)
class CronSchedule:
    """Parsed Quartz cron + timezone + pause status (the three fields the
    reference yaml carries). ``tz`` is any tzinfo (zoneinfo id resolved by
    the caller) or None for naive local times."""

    expression: str
    tz: object | None = None
    paused: bool = False
    _fields: dict = field(default_factory=dict, repr=False, compare=False)

    def __post_init__(self) -> None:
        parts = self.expression.split()
        if len(parts) == 6:
            parts.append("*")
        if len(parts) != 7:
            raise ValueError(
                "Quartz cron needs 6 or 7 fields (sec min hour dom month"
                f" dow [year]): {self.expression!r}"
            )
        names = ("second", "minute", "hour", "dom", "month", "dow", "year")
        fs = {n: _parse_field(p, n) for n, p in zip(names, parts)}
        if fs["dom"] is not None and fs["dow"] is not None:
            raise ValueError(
                "Quartz requires '?' in day-of-month or day-of-week when"
                " the other is restricted"
            )
        object.__setattr__(self, "_fields", fs)

    # -- next-fire computation -------------------------------------------

    def _day_matches(self, d: date) -> bool:
        fs = self._fields
        if fs["month"] is not None and d.month not in fs["month"]:
            return False
        if fs["year"] is not None and d.year not in fs["year"]:
            return False
        if fs["dom"] is not None and d.day not in fs["dom"]:
            return False
        if fs["dow"] is not None:
            quartz_dow = (d.isoweekday() % 7) + 1  # Mon=1 ISO -> Quartz SUN=1
            if quartz_dow not in fs["dow"]:
                return False
        return True

    def _times_of_day(self) -> list[dtime]:
        fs = self._fields
        hours = sorted(fs["hour"] or range(24))
        minutes = sorted(fs["minute"] or range(60))
        seconds = sorted(fs["second"] or range(60))
        return [
            dtime(h, m, s) for h in hours for m in minutes for s in seconds
        ]

    def next_fire_time(self, after: datetime) -> datetime:
        """Earliest fire time STRICTLY after ``after`` (Quartz
        getFireTimeAfter). Raises if nothing fires within 4 years (a
        never-matching calendar like Feb 30)."""
        if self.tz is not None and after.tzinfo is None:
            after = after.replace(tzinfo=self.tz)  # type: ignore[arg-type]
        tod = self._times_of_day()
        d = after.date()
        for _ in range(1462):
            if self._day_matches(d):
                for t in tod:
                    cand = datetime.combine(d, t, tzinfo=after.tzinfo)
                    if cand > after:
                        return cand
            d = d + timedelta(days=1)
        raise ValueError(
            f"cron {self.expression!r} never fires within 4 years"
        )

    def fire_times(self, after: datetime, until: datetime) -> Iterator[datetime]:
        """All fire times in (after, until]."""
        t = after
        while True:
            t = self.next_fire_time(t)
            if t > (until if until.tzinfo or self.tz is None
                    else until.replace(tzinfo=self.tz)):  # type: ignore[arg-type]
                return
            yield t


@dataclass
class ScheduledJob:
    """A PipelineRunner bound to its trigger — the local analog of the
    reference's Databricks job resource (schedule + tasks + on_failure
    notification, ``Daily_Licensed_Pets.yaml``). The host polls
    :meth:`due_fire_times` with its last high-water mark and calls
    :meth:`run_for` per due tick; a paused schedule reports nothing due
    (pause_status: PAUSED semantics) but can still be run manually."""

    runner: object
    schedule: CronSchedule
    name: str = "job"

    def due_fire_times(self, last_run: datetime, now: datetime) -> list[datetime]:
        if self.schedule.paused:
            return []
        return list(self.schedule.fire_times(last_run, now))

    def run_for(self, fire_time: datetime, **params):
        """One triggered run; the fire time rides along as the logical
        ``ingestion_date`` default (daily-job semantics) unless the caller
        already provided one."""
        params.setdefault("ingestion_date", fire_time.date())
        return self.runner.run(**params)

"""Cron / interval scheduling arithmetic (A14).

The reference re-runs the import on a Quartz cron or a fixed interval
(JDBCImporter.java:214-240; README.md:261-266), with Quartz's 6/7-field
second-resolution cron syntax (CronExpression.java). In the Spark rebuild,
SCHEDULING IS EXTERNAL to the engine — Airflow / cron / a workflow manager
triggers `spark-submit` or the Trigger.AvailableNow stream
(streaming/incremental.py), which is the idiomatic cluster deployment. What
the engine still owes the importer loop is the schedule ARITHMETIC: given
an expression and a time, when does the next run fire? This module
reimplements that from the published cron semantics (NOT a port of
CronExpression.java — field-set expansion + day-walk search instead of
Quartz's per-field TreeSet state machine).

Supported syntax (the subset the reference's README documents:
"0 0-59 0-23 ? * *"-style expressions, README.md:689):

    sec min hour day-of-month month day-of-week [year]

    *        every value            5        literal
    1-5      range                  */15     step from field minimum
    1,4,7    list (mixable)         10-40/5  stepped range
    ?        no-specific-value (dom/dow only; same as *)
    JAN-DEC  month names            SUN-SAT  day names (Quartz: 1=SUN..7=SAT)

Quartz's L/W/# day modifiers are not supported (the reference README never
uses them); passing one raises ValueError.
"""

from __future__ import annotations

import datetime as dt

_MONTHS = {m: i + 1 for i, m in enumerate(
    ["JAN", "FEB", "MAR", "APR", "MAY", "JUN",
     "JUL", "AUG", "SEP", "OCT", "NOV", "DEC"])}
_DOWS = {d: i + 1 for i, d in enumerate(
    ["SUN", "MON", "TUE", "WED", "THU", "FRI", "SAT"])}  # Quartz: 1=SUN

_FIELDS = [
    ("sec", 0, 59, {}),
    ("min", 0, 59, {}),
    ("hour", 0, 23, {}),
    ("dom", 1, 31, {}),
    ("month", 1, 12, _MONTHS),
    ("dow", 1, 7, _DOWS),
    ("year", 1970, 2199, {}),
]


def _parse_field(spec: str, lo: int, hi: int, names: dict[str, int]) -> set[int]:
    out: set[int] = set()
    for part in spec.split(","):
        part = part.strip().upper()
        if (
            "#" in part
            or part in ("L", "LW")
            or (len(part) > 1 and part[-1] in "LW" and part[:-1].isdigit())
        ):
            raise ValueError(f"unsupported Quartz day modifier in {spec!r}")
        step, has_step = 1, False
        if "/" in part:
            part, step_s = part.split("/", 1)
            step, has_step = int(step_s), True
            if step <= 0:
                raise ValueError(f"bad step in {spec!r}")
        if part in ("*", "?", ""):
            start, end = lo, hi
        elif "-" in part:
            a, b = part.split("-", 1)
            start = names.get(a, int(a) if a.isdigit() else None)
            end = names.get(b, int(b) if b.isdigit() else None)
            if start is None or end is None:
                raise ValueError(f"bad range in {spec!r}")
        else:
            v = names.get(part, int(part) if part.isdigit() else None)
            if v is None:
                raise ValueError(f"bad value in {spec!r}")
            # Quartz "5/15": start at 5, step to the field max
            start, end = v, (hi if has_step else v)
        if not (lo <= start <= hi and lo <= end <= hi and start <= end):
            raise ValueError(f"field value out of range in {spec!r}")
        out.update(range(start, end + 1, step))
    return out


def parse_cron(expr: str) -> dict[str, set[int]]:
    """Parse a 6/7-field Quartz-style cron expression into allowed sets."""
    parts = expr.split()
    if len(parts) == 6:
        parts.append("*")
    if len(parts) != 7:
        raise ValueError(
            f"cron expression needs 6 or 7 fields (sec min hour dom month "
            f"dow [year]), got {len(parts)}: {expr!r}"
        )
    out = {}
    for (name, lo, hi, names), spec in zip(_FIELDS, parts):
        out[name] = _parse_field(spec, lo, hi, names)
    return out


def cron_next(expr: str, after: dt.datetime) -> dt.datetime | None:
    """First fire time strictly AFTER `after` (Quartz getTimeAfter
    semantics). Returns None when no time matches within the year range
    (e.g. a past literal year). Walks days (month/dom/dow match), then
    picks the smallest allowed (hour, min, sec) — at most ~4 years of day
    steps, each O(1)."""
    f = parse_cron(expr)
    secs = sorted(f["sec"])
    mins = sorted(f["min"])
    hours = sorted(f["hour"])
    t = after + dt.timedelta(seconds=1)
    t = t.replace(microsecond=0)
    day = t.date()
    horizon = day + dt.timedelta(days=366 * 5)
    first_day = True
    while day < horizon:
        if (
            day.year in f["year"]
            and day.month in f["month"]
            and day.day in f["dom"]
            # Quartz dow: 1=SUN..7=SAT; python isoweekday: 1=MON..7=SUN
            and (day.isoweekday() % 7) + 1 in f["dow"]
        ):
            floor = t.time() if first_day else dt.time(0, 0, 0)
            for h in hours:
                if h < floor.hour:
                    continue
                for m in mins:
                    if h == floor.hour and m < floor.minute:
                        continue
                    for s in secs:
                        if h == floor.hour and m == floor.minute and s < floor.second:
                            continue
                        return dt.datetime.combine(
                            day, dt.time(h, m, s), tzinfo=t.tzinfo
                        )
        day += dt.timedelta(days=1)
        first_day = False
    return None


def interval_next(last_start: dt.datetime, interval_s: float) -> dt.datetime:
    """Fixed-interval schedule (the reference's `interval` option): next
    run = last start + interval (Quartz simple trigger semantics)."""
    return last_start + dt.timedelta(seconds=interval_s)


def fire_times(expr: str, after: dt.datetime, n: int) -> list[dt.datetime]:
    """The next `n` fire times after `after` (testing/planning helper)."""
    out: list[dt.datetime] = []
    t = after
    for _ in range(n):
        nxt = cron_next(expr, t)
        if nxt is None:
            break
        out.append(nxt)
        t = nxt
    return out

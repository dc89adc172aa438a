"""Cron / interval scheduling arithmetic (A14).

The reference re-runs the import on a Quartz cron or a fixed interval
(JDBCImporter.java:214-240; README.md:261-266), with Quartz's 6/7-field
second-resolution cron syntax including the L/W/# day modifiers
(CronExpression.java). In the Spark rebuild, SCHEDULING IS EXTERNAL to the
engine — Airflow / cron / a workflow manager triggers `spark-submit` or the
Trigger.AvailableNow stream (streaming/incremental.py), which is the
idiomatic cluster deployment. What the engine still owes the importer loop
is the schedule ARITHMETIC: given an expression and a time, when does the
next run fire? This module reimplements that from the published cron
semantics (NOT a port of CronExpression.java — field-set expansion + a
day-walk search instead of Quartz's per-field TreeSet state machine).

Supported syntax (the full surface the reference's scheduler accepts):

    sec min hour day-of-month month day-of-week [year]

    *        every value            5        literal
    1-5      range                  */15     step from field minimum
    1,4,7    list (mixable)         10-40/5  stepped range
    ?        no-specific-value (dom/dow only; same as *)
    JAN-DEC  month names            SUN-SAT  day names (Quartz: 1=SUN..7=SAT)
    L        dom: last day of month; dow: Saturday (7)
    nL       dow: last <n>-day of the month (e.g. 5L = last Thursday)
    LW       dom: last weekday of the month
    nW       dom: nearest weekday to day n (never leaves the month)
    n#k      dow: the k-th <n>-day of the month (e.g. 6#3 = 3rd Friday)
"""

from __future__ import annotations

import calendar
import datetime as dt

_MONTHS = {m: i + 1 for i, m in enumerate(
    ["JAN", "FEB", "MAR", "APR", "MAY", "JUN",
     "JUL", "AUG", "SEP", "OCT", "NOV", "DEC"])}
_DOWS = {d: i + 1 for i, d in enumerate(
    ["SUN", "MON", "TUE", "WED", "THU", "FRI", "SAT"])}  # Quartz: 1=SUN


def _parse_plain(spec: str, lo: int, hi: int, names: dict[str, int]) -> set[int]:
    out: set[int] = set()
    for part in spec.split(","):
        part = part.strip().upper()
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


def parse_cron(expr: str) -> dict:
    """Parse a 6/7-field Quartz-style cron expression. Returns allowed
    sets for sec/min/hour/month/year plus dom/dow matcher specs (which may
    be L/W/# modifiers rather than plain sets)."""
    parts = expr.split()
    if len(parts) == 6:
        parts.append("*")
    if len(parts) != 7:
        raise ValueError(
            f"cron expression needs 6 or 7 fields (sec min hour dom month "
            f"dow [year]), got {len(parts)}: {expr!r}"
        )
    sec_s, min_s, hour_s, dom_s, month_s, dow_s, year_s = parts
    out = {
        "sec": _parse_plain(sec_s, 0, 59, {}),
        "min": _parse_plain(min_s, 0, 59, {}),
        "hour": _parse_plain(hour_s, 0, 23, {}),
        "month": _parse_plain(month_s, 1, 12, _MONTHS),
        "year": _parse_plain(year_s, 1970, 2199, {}),
    }
    # day-of-month modifiers (Quartz CronExpression L/W semantics)
    dom = dom_s.strip().upper()
    if dom == "L":
        out["dom"] = ("L",)
    elif dom == "LW":
        out["dom"] = ("LW",)
    elif dom.endswith("W") and dom[:-1].isdigit():
        n = int(dom[:-1])
        if not 1 <= n <= 31:
            raise ValueError(f"bad W day in {dom_s!r}")
        out["dom"] = ("W", n)
    elif "L" in dom or "W" in dom:
        raise ValueError(f"unsupported dom modifier combination {dom_s!r}")
    else:
        out["dom"] = ("SET", _parse_plain(dom, 1, 31, {}))
    # day-of-week modifiers
    dow = dow_s.strip().upper()
    if dow == "L":  # bare L in dow = Saturday (Quartz)
        out["dow"] = ("SET", {7})
    elif dow.endswith("L") and dow[:-1] and dow[:-1].replace("-", "").isalnum() and "L" not in dow[:-1]:
        n = _DOWS.get(dow[:-1], int(dow[:-1]) if dow[:-1].isdigit() else None)
        if n is None or not 1 <= n <= 7:
            raise ValueError(f"bad dow in {dow_s!r}")
        out["dow"] = ("LAST", n)
    elif "#" in dow:
        a, b = dow.split("#", 1)
        n = _DOWS.get(a, int(a) if a.isdigit() else None)
        if n is None or not b.isdigit() or not 1 <= int(b) <= 5 or not 1 <= n <= 7:
            raise ValueError(f"bad n#k dow in {dow_s!r}")
        out["dow"] = ("NTH", n, int(b))
    else:
        out["dow"] = ("SET", _parse_plain(dow, 1, 7, _DOWS))
    return out


def _nearest_weekday(year: int, month: int, n: int) -> int:
    """Quartz nW: the weekday nearest to day n, never leaving the month."""
    last = calendar.monthrange(year, month)[1]
    n = min(n, last)
    wd = dt.date(year, month, n).isoweekday()  # 1=MON..7=SUN
    if wd == 6:  # Saturday -> Friday, unless that leaves the month
        return n - 1 if n > 1 else n + 2
    if wd == 7:  # Sunday -> Monday, unless that leaves the month
        return n + 1 if n < last else n - 2
    return n


def _day_matches(day: dt.date, f: dict) -> bool:
    if day.year not in f["year"] or day.month not in f["month"]:
        return False
    last = calendar.monthrange(day.year, day.month)[1]
    dom = f["dom"]
    if dom[0] == "L":
        dom_ok = day.day == last
    elif dom[0] == "LW":
        lw = last
        while dt.date(day.year, day.month, lw).isoweekday() > 5:
            lw -= 1
        dom_ok = day.day == lw
    elif dom[0] == "W":
        dom_ok = day.day == _nearest_weekday(day.year, day.month, dom[1])
    else:
        dom_ok = day.day in dom[1]
    qd = (day.isoweekday() % 7) + 1  # Quartz 1=SUN..7=SAT
    dow = f["dow"]
    if dow[0] == "LAST":
        dow_ok = qd == dow[1] and day.day > last - 7
    elif dow[0] == "NTH":
        dow_ok = qd == dow[1] and (day.day - 1) // 7 + 1 == dow[2]
    else:
        dow_ok = qd in dow[1]
    return dom_ok and dow_ok


def cron_next(expr: str, after: dt.datetime) -> dt.datetime | None:
    """First fire time strictly AFTER `after` (Quartz getTimeAfter
    semantics). Returns None when no time matches within the year range
    (e.g. a past literal year). Walks days (month/dom/dow match, including
    L/W/# modifiers), then picks the smallest allowed (hour, min, sec) —
    walks to the end of the parsed year range (2199)."""
    f = parse_cron(expr)
    secs = sorted(f["sec"])
    mins = sorted(f["min"])
    hours = sorted(f["hour"])
    t = (after + dt.timedelta(seconds=1)).replace(microsecond=0)
    day = t.date()
    # walk to the end of the parsed year range: a 5-year horizon
    # returned None for valid far-out schedules (Feb 29 across the
    # non-leap 2100, literal years) — ~60k day steps worst case, cheap
    horizon = dt.date(2200, 1, 1)
    first_day = True
    while day < horizon:
        if _day_matches(day, f):
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

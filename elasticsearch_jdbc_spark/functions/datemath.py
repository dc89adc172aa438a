"""ES date math: the `now-1d/d` expression grammar used by range
queries, date_histogram bounds, and `<logs-{now/d}>` date-math index
names (the runtime companion to alias.resolve_index_name's Joda
date-pattern names — the reference builds date-pattern indexes for
exactly these time-sliced queries, README.md:1042-1251).

Grammar (org.elasticsearch.common.time.DateMathParser):
  expr      := anchor ops
  anchor    := 'now' | date '||'
  ops       := ( ('+'|'-') count unit | '/' unit )*
  unit      := y M w d h H m s        (M = month, m = minute)
Rounding '/u' truncates to the start of the unit; in a range's upper
bound (lte) ES rounds UP to the last instant of the unit — pass
round_up=True for that context. Month arithmetic clamps the
day-of-month (Jan 31 + 1M = Feb 28/29), the java.time rule.
"""

from __future__ import annotations

import calendar
import datetime as _dt
import re

_OP = re.compile(r"([+\-/])(\d*)([yMwdhHms])")
_ANCHOR_FMTS = (
    "%Y.%m.%d %H:%M:%S", "%Y-%m-%d %H:%M:%S",
    "%Y.%m.%dT%H:%M:%S", "%Y-%m-%dT%H:%M:%S",
    "%Y.%m.%d", "%Y-%m-%d",
)


def _add_months(d: _dt.datetime, n: int) -> _dt.datetime:
    m = d.month - 1 + n
    y = d.year + m // 12
    m = m % 12 + 1
    day = min(d.day, calendar.monthrange(y, m)[1])
    return d.replace(year=y, month=m, day=day)


def _round(d: _dt.datetime, unit: str, up: bool) -> _dt.datetime:
    if unit == "y":
        lo = d.replace(month=1, day=1, hour=0, minute=0, second=0, microsecond=0)
        hi = _add_months(lo, 12)
    elif unit == "M":
        lo = d.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
        hi = _add_months(lo, 1)
    elif unit == "w":
        lo = (d - _dt.timedelta(days=d.weekday())).replace(
            hour=0, minute=0, second=0, microsecond=0
        )
        hi = lo + _dt.timedelta(weeks=1)
    elif unit == "d":
        lo = d.replace(hour=0, minute=0, second=0, microsecond=0)
        hi = lo + _dt.timedelta(days=1)
    elif unit in ("h", "H"):
        lo = d.replace(minute=0, second=0, microsecond=0)
        hi = lo + _dt.timedelta(hours=1)
    elif unit == "m":
        lo = d.replace(second=0, microsecond=0)
        hi = lo + _dt.timedelta(minutes=1)
    else:  # s
        lo = d.replace(microsecond=0)
        hi = lo + _dt.timedelta(seconds=1)
    # ES round-up = the LAST millisecond of the unit
    return hi - _dt.timedelta(milliseconds=1) if up else lo


def parse_date_math(
    expr: str,
    now: _dt.datetime | None = None,
    round_up: bool = False,
) -> _dt.datetime:
    """Evaluate one ES date-math expression to a datetime. round_up
    applies to '/unit' rounding steps (the lte-bound context)."""
    expr = expr.strip()
    now = now or _dt.datetime.now()
    if expr.startswith("now"):
        cur, rest = now, expr[3:]
    else:
        if "||" not in expr:
            raise ValueError(
                f"date math {expr!r} needs 'now' or an anchor 'date||'"
            )
        anchor, rest = expr.split("||", 1)
        cur = None
        for fmt in _ANCHOR_FMTS:
            try:
                cur = _dt.datetime.strptime(anchor, fmt)
                break
            except ValueError:
                continue
        if cur is None:
            raise ValueError(f"unparseable date-math anchor {anchor!r}")
    pos = 0
    for m in _OP.finditer(rest):
        if m.start() != pos:
            raise ValueError(f"bad date-math op at {rest[pos:]!r} in {expr!r}")
        pos = m.end()
        op, count, unit = m.group(1), m.group(2), m.group(3)
        if op == "/":
            if count:
                raise ValueError(f"rounding takes no count in {expr!r}")
            cur = _round(cur, unit, round_up)
            continue
        n = int(count) if count else 1
        if op == "-":
            n = -n
        if unit == "y":
            cur = _add_months(cur, 12 * n)
        elif unit == "M":
            cur = _add_months(cur, n)
        else:
            delta = {
                "w": _dt.timedelta(weeks=1),
                "d": _dt.timedelta(days=1),
                "h": _dt.timedelta(hours=1),
                "H": _dt.timedelta(hours=1),
                "m": _dt.timedelta(minutes=1),
                "s": _dt.timedelta(seconds=1),
            }[unit]
            cur = cur + n * delta
    if pos != len(rest):
        raise ValueError(f"bad date-math op at {rest[pos:]!r} in {expr!r}")
    return cur


_NAME = re.compile(r"^<([^{]*)\{([^}]*?)(?:\{([^}]*)\})?\}([^>]*)>$")


def date_math_index_name(name: str, now: _dt.datetime | None = None) -> str:
    """Resolve an ES date-math index name: `<logs-{now/d}>` ->
    `logs-2026.08.18` (default format yyyy.MM.dd, like ES);
    `<logs-{now-1M/M{yyyy-MM}}>` applies the inline Joda format. Names
    without the <...> wrapper return unchanged (plain index names)."""
    m = _NAME.match(name)
    if not m:
        if name.startswith("<") or name.endswith(">"):
            raise ValueError(f"malformed date-math index name {name!r}")
        return name
    prefix, expr, fmt, suffix = m.groups()
    when = parse_date_math(expr, now=now)
    from ..index.alias import resolve_index_name

    return prefix + resolve_index_name(fmt or "yyyy.MM.dd", when) + suffix


def date_math_range_sql(
    col: str,
    gte: str | None = None,
    lte: str | None = None,
    gt: str | None = None,
    lt: str | None = None,
    now: _dt.datetime | None = None,
) -> str:
    """Compile an ES date range query with date-math bounds into a
    filter_sql fragment over a timestamp column — the ES bound-context
    rounding rule (common-options.html#date-math): gte and lt round
    DOWN to the unit's first instant; gt and lte round UP to its last
    instant, so gt EXCLUDES the whole rounded unit and lte INCLUDES
    it."""
    if gte is not None and gt is not None:
        raise ValueError("pass at most one of gte/gt")
    if lte is not None and lt is not None:
        raise ValueError("pass at most one of lte/lt")
    preds = []
    if gte is not None:
        preds.append(f"{col} >= timestamp'{parse_date_math(gte, now)}'")
    if gt is not None:
        preds.append(
            f"{col} > timestamp'{parse_date_math(gt, now, round_up=True)}'"
        )
    if lte is not None:
        preds.append(
            f"{col} <= timestamp'{parse_date_math(lte, now, round_up=True)}'"
        )
    if lt is not None:
        preds.append(f"{col} < timestamp'{parse_date_math(lt, now)}'")
    if not preds:
        raise ValueError("date range needs at least one bound")
    return " AND ".join(preds)

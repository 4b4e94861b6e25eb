"""Cypher temporal-value kernel: date / localtime / time / localdatetime
/ datetime / duration construction, truncation, arithmetic, accessors and
canonical rendering.

Reference: the reference engine delegates to java.time via its Cypher
function registry (query/opencypher/functions/temporal/*); here the same
observable semantics (openCypher TCK expressions/temporal) are computed in
a pure-Python kernel and injected as literal Columns at compile time —
temporal expressions in queries are (almost always) constant, so
evaluating them once on the driver keeps the executor path untouched.

Values render to the canonical Cypher strings ('2015-07-21',
'21:40:32.142+01:00', 'P14DT16H12M') which is also their wire/result
representation here.
"""

from __future__ import annotations

import datetime as _dt
import math
import re
from dataclasses import dataclass

# openCypher/Neo4j constants
AVG_DAYS_PER_MONTH = 365.2425 / 12  # 30.436875
NANOS = 1_000_000_000
DAY_NANOS = 86_400 * NANOS


class TemporalError(ValueError):
    pass


def _trunc_div(a: int, b: int) -> int:
    """Integer division truncating toward zero (java.time semantics).

    `int(a / b)` loses precision for |a| beyond 2^53 (large-year month
    counts like 23_999_999_987 — TCK Temporal10 [9]); this stays exact.
    """
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


# --- proleptic-Gregorian arithmetic for years outside datetime.date -------
# java.time supports years ±999_999_999 (TCK Temporal10 [9][10]); Python's
# datetime stops at 1..9999.  BigDate duck-types the slice of the date API
# this kernel uses (year/month/day, ordering, subtraction -> .days,
# isoformat) with exact integer math on the same proleptic calendar.

_DIM = (31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)


def _is_leap(y: int) -> bool:
    return y % 4 == 0 and (y % 100 != 0 or y % 400 == 0)


def _days_in_month(y: int, m: int) -> int:
    if m == 2 and _is_leap(y):
        return 29
    return _DIM[m - 1]


def _ymd_ordinal(y: int, m: int, d: int) -> int:
    yy = y - 1
    days = yy * 365 + yy // 4 - yy // 100 + yy // 400
    days += sum(_DIM[: m - 1]) + (1 if m > 2 and _is_leap(y) else 0)
    return days + d


@dataclass(frozen=True)
class _DayDelta:
    days: int


@dataclass(frozen=True)
class BigDate:
    year: int
    month: int
    day: int

    def toordinal(self) -> int:
        return _ymd_ordinal(self.year, self.month, self.day)

    def isoformat(self) -> str:
        y = self.year
        sign = "-" if y < 0 else ("+" if y > 9999 else "")
        return f"{sign}{abs(y):04d}-{self.month:02d}-{self.day:02d}"

    @staticmethod
    def _ord(other) -> int:
        return other.toordinal()

    def __sub__(self, other):
        return _DayDelta(self.toordinal() - self._ord(other))

    def __rsub__(self, other):
        return _DayDelta(self._ord(other) - self.toordinal())

    def __add__(self, delta):
        return _date_from_ordinal(self.toordinal() + delta.days)

    __radd__ = __add__

    def __lt__(self, other):
        return self.toordinal() < self._ord(other)

    def __le__(self, other):
        return self.toordinal() <= self._ord(other)

    def __gt__(self, other):
        return self.toordinal() > self._ord(other)

    def __ge__(self, other):
        return self.toordinal() >= self._ord(other)

    def __eq__(self, other):
        if isinstance(other, (BigDate, _dt.date)):
            return self.toordinal() == other.toordinal()
        return NotImplemented

    def __hash__(self):
        return hash(("BigDate", self.toordinal()))


def _date_from_ordinal(n: int):
    """Proleptic ordinal -> date (BigDate outside datetime's range)."""
    if 1 <= n <= 3652059:  # datetime.date.max.toordinal()
        return _dt.date.fromordinal(n)
    n0 = n - 1
    n400, n0 = divmod(n0, 146097)
    n100, n0 = divmod(n0, 36524)
    n4, n0 = divmod(n0, 1461)
    n1, n0 = divmod(n0, 365)
    year = n400 * 400 + n100 * 100 + n4 * 4 + n1 + 1
    if n1 == 4 or n100 == 4:
        return _make_date(year - 1, 12, 31)
    month = 1
    while n0 >= _days_in_month(year, month):
        n0 -= _days_in_month(year, month)
        month += 1
    return _make_date(year, month, n0 + 1)


def _make_date(y: int, m: int, d: int):
    """date when in datetime's range, BigDate otherwise (java ±1e9 years)."""
    if 1 <= y <= 9999:
        return _dt.date(y, m, d)
    if abs(y) > 999_999_999:
        raise TemporalError(f"year out of range: {y}")
    if not (1 <= m <= 12) or not (1 <= d <= _days_in_month(y, m)):
        raise TemporalError(f"invalid date: {y}-{m}-{d}")
    return BigDate(y, m, d)


def _frac_str(nanos: int) -> str:
    """Fractional-second suffix: trailing zeros trimmed, '' when zero."""
    if nanos == 0:
        return ""
    s = f"{nanos:09d}".rstrip("0")
    return "." + s


# ---------------------------------------------------------------------------
# Value types
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class CyDate:
    d: _dt.date

    def __str__(self) -> str:
        return self.d.isoformat()

    def component(self, name: str):
        d = self.d
        iso = d.isocalendar()
        return {
            "year": d.year, "month": d.month, "day": d.day,
            "weekyear": iso[0], "week": iso[1], "dayofweek": iso[2],
            "quarter": (d.month - 1) // 3 + 1,
            "dayofquarter": (d - _dt.date(d.year, ((d.month - 1) // 3) * 3 + 1, 1)).days + 1,
            "ordinalday": d.timetuple().tm_yday,
        }[name.lower()]


@dataclass(frozen=True)
class CyLocalTime:
    nanos: int  # nanos since midnight

    def hms(self):
        n = self.nanos
        return (n // 3_600_000_000_000, n // 60_000_000_000 % 60,
                n // NANOS % 60, n % NANOS)

    def __str__(self) -> str:
        h, m, s, f = self.hms()
        out = f"{h:02d}:{m:02d}"
        if s or f:
            out += f":{s:02d}" + _frac_str(f)
        return out

    def component(self, name: str):
        h, m, s, f = self.hms()
        return {
            "hour": h, "minute": m, "second": s,
            "millisecond": f // 1_000_000, "microsecond": f // 1_000,
            "nanosecond": f,
        }[name.lower()]


def _offset_str(sec: int) -> str:
    if sec == 0:
        return "Z"
    sign = "+" if sec >= 0 else "-"
    a = abs(sec)
    out = f"{sign}{a // 3600:02d}:{a % 3600 // 60:02d}"
    if a % 60:
        out += f":{a % 60:02d}"
    return out


@dataclass(frozen=True)
class CyTime:
    t: CyLocalTime
    offset: int  # seconds east of UTC

    def __str__(self) -> str:
        return str(self.t) + _offset_str(self.offset)

    def component(self, name: str):
        if name.lower() in ("offset", "timezone"):
            return _offset_str(self.offset)
        if name.lower() in ("offsetminutes",):
            return self.offset // 60
        if name.lower() in ("offsetseconds",):
            return self.offset
        return self.t.component(name)


@dataclass(frozen=True)
class CyLocalDateTime:
    d: _dt.date
    t: CyLocalTime

    def __str__(self) -> str:
        return f"{self.d.isoformat()}T{self.t}"

    def component(self, name: str):
        if name.lower() == "epochseconds":
            return self.epoch_seconds()
        if name.lower() == "epochmillis":
            return (self.epoch_seconds() * 1000
                    + self.t.nanos % NANOS // 1_000_000)
        try:
            return CyDate(self.d).component(name)
        except KeyError:
            return self.t.component(name)

    def epoch_seconds(self) -> int:
        days = (self.d - _dt.date(1970, 1, 1)).days
        return days * 86400 + self.t.nanos // NANOS


@dataclass(frozen=True)
class CyDateTime:
    d: _dt.date
    t: CyLocalTime
    offset: int  # seconds east of UTC
    zone: str | None = None  # IANA name when constructed with one

    def __str__(self) -> str:
        out = f"{self.d.isoformat()}T{self.t}{_offset_str(self.offset)}"
        if self.zone:
            out += f"[{self.zone}]"
        return out

    def component(self, name: str):
        n = name.lower()
        if n == "timezone":
            return self.zone or _offset_str(self.offset)
        if n in ("offset", "offsetminutes", "offsetseconds"):
            return CyTime(self.t, self.offset).component(name)
        if n in ("epochseconds", "epochmillis"):
            ldt = CyLocalDateTime(self.d, self.t)
            return ldt.component(name) - self.offset * (
                1000 if n == "epochmillis" else 1
            )
        return CyLocalDateTime(self.d, self.t).component(name)


@dataclass(frozen=True)
class CyDuration:
    months: int
    days: int
    nanos: int  # signed total nanos of the time part

    def __str__(self) -> str:
        if self.months == 0 and self.days == 0 and self.nanos == 0:
            return "PT0S"
        out = "P"
        years = _trunc_div(self.months, 12)
        months = self.months - years * 12
        if years:
            out += f"{years}Y"
        if months:
            out += f"{months}M"
        if self.days:
            out += f"{self.days}D"
        if self.nanos:
            out += "T"
            n = self.nanos
            sign = "-" if n < 0 else ""
            a = abs(n)
            h = a // 3_600_000_000_000
            m = a // 60_000_000_000 % 60
            s = a // NANOS % 60
            f = a % NANOS
            if h:
                out += f"{sign}{h}H"
            if m:
                out += f"{sign}{m}M"
            if s or f or (not h and not m):
                out += f"{sign}{s}{_frac_str(f)}S"
        return out

    def component(self, name: str):
        n = name.lower()
        total_sec = self.nanos // NANOS
        return {
            "years": _trunc_div(self.months, 12), "months": self.months,
            "monthsofyear": self.months - _trunc_div(self.months, 12) * 12,
            "quarters": _trunc_div(self.months, 3),
            "quartersofyear": _trunc_div(self.months, 3) - _trunc_div(self.months, 12) * 4,
            "monthsofquarter": self.months - _trunc_div(self.months, 3) * 3,
            "weeks": _trunc_div(self.days, 7),
            "days": self.days,
            "daysofweek": self.days - _trunc_div(self.days, 7) * 7,
            "hours": self.nanos // 3_600_000_000_000,
            "minutes": self.nanos // 60_000_000_000,
            "minutesofhour": (self.nanos // 60_000_000_000) % 60,
            "seconds": total_sec,
            "secondsofminute": total_sec % 60,
            "milliseconds": self.nanos // 1_000_000,
            "millisecondsofsecond": self.nanos % NANOS // 1_000_000,
            "microseconds": self.nanos // 1_000,
            "microsecondsofsecond": self.nanos % NANOS // 1_000,
            "nanoseconds": self.nanos,
            "nanosecondsofsecond": self.nanos % NANOS,
        }[n]


TEMPORAL_TYPES = (CyDate, CyLocalTime, CyTime, CyLocalDateTime, CyDateTime,
                  CyDuration)


# ---------------------------------------------------------------------------
# String parsing
# ---------------------------------------------------------------------------

_DATE_RES = [
    (re.compile(r"^([+-]\d{4,9}|\d{4})-(\d{2})-(\d{2})$"), "ymd"),
    (re.compile(r"^([+-]\d{4,9}|\d{4})(\d{2})(\d{2})$"), "ymd"),
    (re.compile(r"^([+-]\d{4,9}|\d{4})-(\d{2})$"), "ym"),
    (re.compile(r"^([+-]\d{4,9}|\d{4})(\d{2})$"), "ym_compact"),
    (re.compile(r"^([+-]\d{4,9}|\d{4})-W(\d{2})-(\d)$"), "ywd"),
    (re.compile(r"^([+-]\d{4,9}|\d{4})W(\d{2})(\d)$"), "ywd"),
    (re.compile(r"^([+-]\d{4,9}|\d{4})-W(\d{2})$"), "yw"),
    (re.compile(r"^([+-]\d{4,9}|\d{4})W(\d{2})$"), "yw"),
    (re.compile(r"^([+-]\d{4,9}|\d{4})-Q(\d)-(\d{2})$"), "yqd"),
    (re.compile(r"^([+-]\d{4,9}|\d{4})Q(\d)(\d{2})$"), "yqd"),
    (re.compile(r"^([+-]\d{4,9}|\d{4})-Q(\d)$"), "yq"),
    (re.compile(r"^([+-]\d{4,9}|\d{4})Q(\d)$"), "yq"),
    (re.compile(r"^([+-]\d{4,9}|\d{4})-(\d{3})$"), "yo"),
    (re.compile(r"^([+-]\d{4,9}|\d{4})(\d{3})$"), "yo"),
    (re.compile(r"^([+-]\d{4,9}|\d{4})$"), "y"),
]


def parse_date(s: str) -> CyDate:
    for rx, kind in _DATE_RES:
        m = rx.match(s)
        if not m:
            continue
        g = [int(x) for x in m.groups()]
        big = not (1 <= g[0] <= 9999)
        if big and kind not in ("ymd", "ym", "y"):
            # a big year only exists for the calendar forms; fall through
            # so e.g. '+2015067' can still match the ordinal pattern with
            # a 4-digit year instead of dying as ym_compact year 20150
            continue
        if kind == "ymd":
            return CyDate(_make_date(g[0], g[1], g[2]))
        if kind in ("ym", "ym_compact"):
            if kind == "ym_compact" and not (1 <= g[1] <= 12):
                continue  # 2015 07 vs ordinal ambiguity is resolved by regex order
            return CyDate(_make_date(g[0], g[1], 1))
        if kind == "ywd":
            return CyDate(_dt.date.fromisocalendar(g[0], g[1], g[2]))
        if kind == "yw":
            return CyDate(_dt.date.fromisocalendar(g[0], g[1], 1))
        if kind == "yqd":
            return CyDate(_quarter_date(g[0], g[1], g[2]))
        if kind == "yq":
            return CyDate(_quarter_date(g[0], g[1], 1))
        if kind == "yo":
            return CyDate(_dt.date(g[0], 1, 1) + _dt.timedelta(days=g[1] - 1))
        if kind == "y":
            return CyDate(_make_date(g[0], 1, 1))
    raise TemporalError(f"Cannot parse date: {s!r}")


def _quarter_date(year: int, q: int, day_of_q: int) -> _dt.date:
    start = _dt.date(year, (q - 1) * 3 + 1, 1)
    return start + _dt.timedelta(days=day_of_q - 1)


_TIME_RE = re.compile(
    r"^T?(\d{2})(?::?(\d{2}))?(?::?(\d{2}))?(?:[.,](\d{1,9}))?"
    r"(Z|[+-]\d{2}(?::?\d{2})?(?::?\d{2})?)?$"
)


def _parse_offset(s: str) -> int:
    if s in ("Z", "z"):
        return 0
    sign = 1 if s[0] == "+" else -1
    digits = s[1:].replace(":", "")
    h = int(digits[0:2])
    m = int(digits[2:4]) if len(digits) >= 4 else 0
    sec = int(digits[4:6]) if len(digits) >= 6 else 0
    return sign * (h * 3600 + m * 60 + sec)


def parse_time(s: str):
    """Returns CyLocalTime or CyTime (when an offset is present)."""
    m = _TIME_RE.match(s)
    if not m:
        raise TemporalError(f"Cannot parse time: {s!r}")
    h = int(m.group(1))
    mi = int(m.group(2) or 0)
    se = int(m.group(3) or 0)
    frac = m.group(4) or ""
    nanos = int(frac.ljust(9, "0")) if frac else 0
    t = CyLocalTime(((h * 60 + mi) * 60 + se) * NANOS + nanos)
    if m.group(5):
        return CyTime(t, _parse_offset(m.group(5)))
    return t


def parse_datetime(s: str):
    """Returns CyLocalDateTime or CyDateTime."""
    zone = None
    zm = re.search(r"\[([^\]]+)\]$", s)
    if zm:
        zone = zm.group(1)
        s = s[: zm.start()]
    if "T" not in s:
        d = parse_date(s)
        if zone:
            return _zoned(d.d, CyLocalTime(0), zone)
        return CyLocalDateTime(d.d, CyLocalTime(0))
    ds, ts = s.split("T", 1)
    d = parse_date(ds)
    t = parse_time(ts)
    if zone is not None:
        if isinstance(t, CyTime):
            # explicit offset + zone: keep both
            return CyDateTime(d.d, t.t, t.offset, zone)
        return _zoned(d.d, t, zone)
    if isinstance(t, CyTime):
        return CyDateTime(d.d, t.t, t.offset)
    return CyLocalDateTime(d.d, t)


_ZONE_CACHE: dict = {}


def _zoneinfo(zone: str):
    """Resolve an IANA zone, preferring the pip ``tzdata`` package.

    The reference's java.time uses the standard IANA build, where zones
    merged since tzdata 2022f (Europe/Stockholm -> Europe/Berlin, …) are
    links; many distro /usr/share/zoneinfo builds include backzone data
    with the pre-merge LMT offsets instead (TCK Temporal2 [6] expects the
    merged +00:53:28 for 1818 Stockholm, not backzone's +01:12:12).
    """
    from zoneinfo import ZoneInfo

    tz = _ZONE_CACHE.get(zone)
    if tz is not None:
        return tz
    try:
        import importlib.resources as _res

        head, _, name = zone.rpartition("/")
        pkg = "tzdata.zoneinfo" + ("." + head.replace("/", ".") if head else "")
        with _res.files(pkg).joinpath(name).open("rb") as f:
            tz = ZoneInfo.from_file(f, key=zone)
    except Exception:
        tz = ZoneInfo(zone)
    _ZONE_CACHE[zone] = tz
    return tz


def _zoned(d: _dt.date, t: CyLocalTime, zone: str) -> CyDateTime:
    if re.fullmatch(r"[+-]\d{2}:?\d{2}(:?\d{2})?|Z", zone):
        return CyDateTime(d, t, _parse_offset(zone))
    tz = _zoneinfo(zone)
    h, m, s, f = t.hms()
    naive = _dt.datetime(d.year, d.month, d.day, h, m, s, f // 1000)
    off = tz.utcoffset(naive)
    return CyDateTime(d, t, int(off.total_seconds()), zone)


_DUR_RE = re.compile(
    r"^([+-]?)P(?:([-+]?[0-9.]+)Y)?(?:([-+]?[0-9.]+)M)?(?:([-+]?[0-9.]+)W)?"
    r"(?:([-+]?[0-9.]+)D)?"
    r"(?:T(?:([-+]?[0-9.]+)H)?(?:([-+]?[0-9.]+)M)?(?:([-+]?[0-9.]+)S)?)?$"
)


def parse_duration(s: str) -> CyDuration:
    # date-format durations: P<date>T<time>
    m = re.match(r"^([+-]?)P(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})(?:[.,](\d{1,9}))?$", s)
    if m:
        sign = -1 if m.group(1) == "-" else 1
        frac = m.group(8) or ""
        nanos = int(frac.ljust(9, "0")) if frac else 0
        return CyDuration(
            sign * (int(m.group(2)) * 12 + int(m.group(3))),
            sign * int(m.group(4)),
            sign * ((int(m.group(5)) * 3600 + int(m.group(6)) * 60
                     + int(m.group(7))) * NANOS + nanos),
        )
    m = _DUR_RE.match(s)
    if not m or (m.group(0).endswith("P")):
        raise TemporalError(f"Cannot parse duration: {s!r}")
    sign = -1 if m.group(1) == "-" else 1
    vals = {}
    for key, g in zip(
        ("years", "months", "weeks", "days", "hours", "minutes", "seconds"),
        m.groups()[1:],
    ):
        if g is not None:
            vals[key] = float(g) if ("." in g) else int(g)
    if not vals:
        raise TemporalError(f"Cannot parse duration: {s!r}")
    dur = duration_from_map(vals)
    if sign < 0:
        return CyDuration(-dur.months, -dur.days, -dur.nanos)
    return dur


# ---------------------------------------------------------------------------
# Map construction
# ---------------------------------------------------------------------------


def duration_from_map(m: dict) -> CyDuration:
    months = 0.0
    days = 0.0
    nanos = 0.0
    months += m.get("years", 0) * 12
    months += m.get("quarters", 0) * 3
    months += m.get("months", 0)
    mi = math.floor(months) if months >= 0 else math.ceil(months)
    days += (months - mi) * AVG_DAYS_PER_MONTH
    days += m.get("weeks", 0) * 7
    days += m.get("days", 0)
    di = math.floor(days) if days >= 0 else math.ceil(days)
    nanos += (days - di) * DAY_NANOS
    nanos += m.get("hours", 0) * 3_600_000_000_000
    nanos += m.get("minutes", 0) * 60_000_000_000
    nanos += m.get("seconds", 0) * NANOS
    nanos += m.get("milliseconds", 0) * 1_000_000
    nanos += m.get("microseconds", 0) * 1_000
    nanos += m.get("nanoseconds", 0)
    return CyDuration(int(mi), int(di), int(round(nanos)))


def _base_date(m: dict) -> tuple[_dt.date | None, dict]:
    """Extract the referenced temporal's date components as defaults."""
    for key in ("date", "datetime", "localdatetime"):
        v = m.get(key)
        if v is None:
            continue
        if isinstance(v, CyDate):
            return v.d, {}
        if isinstance(v, (CyLocalDateTime, CyDateTime)):
            return v.d, {}
    return None, {}


def _base_time(m: dict):
    """(wall time, offset seconds, IANA zone name) of the time base."""
    for key in ("time", "datetime", "localdatetime"):
        v = m.get(key)
        if v is None:
            continue
        if isinstance(v, CyLocalTime):
            return v, None, None
        if isinstance(v, CyTime):
            return v.t, v.offset, None
        if isinstance(v, CyLocalDateTime):
            return v.t, None, None
        if isinstance(v, CyDateTime):
            return v.t, v.offset, v.zone
    return None, None, None


def date_from_map(m: dict) -> CyDate:
    m = {k.lower(): v for k, v in m.items()}
    base, _ = _base_date(m)
    if "week" in m or (base is not None and "dayofweek" in m):
        if base is not None:
            iso = base.isocalendar()
            wy, wk, dow = iso[0], iso[1], iso[2]
        else:
            wy = wk = dow = None
        wy = m.get("year", wy)
        wk = m.get("week", wk if wk is not None else 1)
        dow = m.get("dayofweek", dow if dow is not None else 1)
        if wy is None:
            raise TemporalError("week date needs a year")
        return CyDate(_dt.date.fromisocalendar(int(wy), int(wk), int(dow)))
    if "quarter" in m or (base is not None and "dayofquarter" in m):
        if base is not None:
            # selecting from a base keeps the same-group subordinate
            # components: {date: other, quarter: 3} keeps dayOfQuarter
            # (TCK Temporal3 [1])
            y = m.get("year", base.year)
            q = m.get("quarter", (base.month - 1) // 3 + 1)
            dq = m.get("dayofquarter",
                       CyDate(base).component("dayofquarter"))
        else:
            y = m["year"]
            q = m.get("quarter", 1)
            dq = m.get("dayofquarter", 1)
        return CyDate(_quarter_date(int(y), int(q), int(dq)))
    if "ordinalday" in m:
        y = m.get("year", base.year if base else None)
        if y is None:
            raise TemporalError("ordinal date needs a year")
        return CyDate(
            _dt.date(int(y), 1, 1) + _dt.timedelta(days=int(m["ordinalday"]) - 1)
        )
    if base is not None:
        # selecting from a base: every unspecified calendar component
        # keeps the base's value ({date: other, year: 28} → 0028-11-11)
        y = int(m.get("year", base.year))
        mo = int(m.get("month", base.month))
        dy = int(m.get("day", base.day))
        return CyDate(_dt.date(y, mo, dy))
    y = m.get("year")
    if y is None:
        raise TemporalError("date needs a year")
    return CyDate(_dt.date(int(y), int(m.get("month", 1)), int(m.get("day", 1))))


def time_from_map(m: dict):
    m = {k.lower(): v for k, v in m.items()}
    bt, boff, _bzone = _base_time(m)
    h = int(m.get("hour", bt.component("hour") if bt else 0))
    mi = int(m.get("minute", bt.component("minute") if bt else 0))
    se = int(m.get("second", bt.component("second") if bt else 0))
    ms = m.get("millisecond")
    us = m.get("microsecond")
    ns = m.get("nanosecond")
    if ms is None and us is None and ns is None and bt is not None:
        frac = bt.component("nanosecond")
    else:
        frac = int(ms or 0) * 1_000_000 + int(us or 0) * 1_000 + int(ns or 0)
    t = CyLocalTime(((h * 60 + mi) * 60 + se) * NANOS + frac)
    tz = m.get("timezone")
    if tz is not None:
        if re.fullmatch(r"[+-]\d{2}:?(\d{2})?(:?\d{2})?|Z|z", str(tz)):
            newoff = _parse_offset(str(tz))
        else:
            # named zone: offset at epoch date (no date context) — 1970
            newoff = _zoned(_dt.date(1970, 1, 1), t, str(tz)).offset
        if boff is not None:
            # overriding the timezone of an offset-carrying base keeps
            # the instant: the wall clock shifts (TCK Temporal3 [3])
            t = CyLocalTime((t.nanos + (newoff - boff) * NANOS) % DAY_NANOS)
        return CyTime(t, newoff)
    if boff is not None:
        return CyTime(t, boff)
    return t


def datetime_from_map(m: dict, local: bool):
    m = {k.lower(): v for k, v in m.items()}
    if "epochseconds" in m or "epochmillis" in m:
        if "epochseconds" in m:
            total_n = int(m["epochseconds"]) * NANOS
        else:
            total_n = int(m["epochmillis"]) * 1_000_000
        total_n += int(m.get("nanosecond", 0))
        days, rem = divmod(total_n, DAY_NANOS)
        d = _dt.date(1970, 1, 1) + _dt.timedelta(days=days)
        t = CyLocalTime(rem)
        if local:
            return CyLocalDateTime(d, t)
        return CyDateTime(d, t, 0)
    d = date_from_map(m) if any(
        k in m for k in ("year", "date", "datetime", "localdatetime", "week",
                         "quarter", "ordinalday")
    ) else CyDate(_dt.date(1970, 1, 1))
    tm = time_from_map(
        {k: v for k, v in m.items() if k not in ("date", "timezone")}
    )
    if isinstance(tm, CyTime):
        t, off = tm.t, tm.offset
    else:
        t, off = tm, None
    _bt, _boff, bzone = _base_time(m)
    if local:
        return CyLocalDateTime(d.d, t)
    if bzone is not None:
        # named-zone base: the offset is re-resolved at the COMPOSED wall
        # datetime (a date override may cross a DST boundary — Temporal3
        # [10] rows with day: 28 flipping +01:00 → +02:00)
        off = _zoned(d.d, t, bzone).offset
    tz = m.get("timezone")
    if tz is None:
        if off is None:
            return CyDateTime(d.d, t, 0)
        return CyDateTime(d.d, t, off, bzone)
    named = not re.fullmatch(r"[+-]\d{2}:?(\d{2})?(:?\d{2})?|Z|z", str(tz))
    if off is None:
        # wall time as written, in the target zone
        if named:
            return _zoned(d.d, t, str(tz))
        return CyDateTime(d.d, t, _parse_offset(str(tz)))
    # overriding the timezone of an offset-carrying base keeps the
    # instant: convert wall clock with date rollover (Temporal3 [9])
    utc_n = (
        (d.d - _dt.date(1970, 1, 1)).days * DAY_NANOS
        + t.nanos - off * NANOS
    )
    if named:
        z = _zoneinfo(str(tz))
        utc_dt = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc) + \
            _dt.timedelta(seconds=utc_n // NANOS)
        newoff = int(utc_dt.astimezone(z).utcoffset().total_seconds())
    else:
        newoff = _parse_offset(str(tz))
    loc_n = utc_n + newoff * NANOS
    days, rem = divmod(loc_n, DAY_NANOS)
    return CyDateTime(
        _dt.date(1970, 1, 1) + _dt.timedelta(days=days),
        CyLocalTime(rem), newoff,
        str(tz) if named else None,
    )


# ---------------------------------------------------------------------------
# Truncation
# ---------------------------------------------------------------------------

_TRUNC_ORDER = [
    "millennium", "century", "decade", "year", "weekyear", "quarter",
    "month", "week", "day", "hour", "minute", "second", "millisecond",
    "microsecond",
]


def truncate(unit: str, value, adjust: dict | None, target: str):
    unit = unit.lower()
    if unit not in _TRUNC_ORDER:
        raise TemporalError(f"Unknown truncation unit {unit!r}")
    d, t, off, zone = _explode(value)
    if unit == "millennium":
        d = _dt.date(d.year - d.year % 1000, 1, 1)
    elif unit == "century":
        d = _dt.date(d.year - d.year % 100, 1, 1)
    elif unit == "decade":
        d = _dt.date(d.year - d.year % 10, 1, 1)
    elif unit == "year":
        d = _dt.date(d.year, 1, 1)
    elif unit == "weekyear":
        d = _dt.date.fromisocalendar(d.isocalendar()[0], 1, 1)
    elif unit == "quarter":
        d = _dt.date(d.year, ((d.month - 1) // 3) * 3 + 1, 1)
    elif unit == "month":
        d = _dt.date(d.year, d.month, 1)
    elif unit == "week":
        iso = d.isocalendar()
        d = _dt.date.fromisocalendar(iso[0], iso[1], 1)
    if unit in ("millennium", "century", "decade", "year", "weekyear",
                "quarter", "month", "week", "day"):
        t = CyLocalTime(0)
    elif unit == "hour":
        t = CyLocalTime(t.nanos // 3_600_000_000_000 * 3_600_000_000_000)
    elif unit == "minute":
        t = CyLocalTime(t.nanos // 60_000_000_000 * 60_000_000_000)
    elif unit == "second":
        t = CyLocalTime(t.nanos // NANOS * NANOS)
    elif unit == "millisecond":
        t = CyLocalTime(t.nanos // 1_000_000 * 1_000_000)
    elif unit == "microsecond":
        t = CyLocalTime(t.nanos // 1_000 * 1_000)
    if adjust:
        adj = {k.lower(): v for k, v in adjust.items()}
        tz_over = adj.pop("timezone", None)
        # time components finer than the truncation unit are all zero, so
        # adding them equals setting them — and addition also preserves
        # coarser kept fractions (truncate('millisecond', …,
        # {nanosecond: 2}) keeps .645 and appends 2ns)
        _TIME_SCALE = {
            "hour": 3_600_000_000_000, "minute": 60_000_000_000,
            "second": NANOS, "millisecond": 1_000_000,
            "microsecond": 1_000, "nanosecond": 1,
        }
        time_adj = {k: v for k, v in adj.items() if k in _TIME_SCALE}
        date_adj = {k: v for k, v in adj.items() if k not in _TIME_SCALE}
        if date_adj:
            base_map: dict = {"year": d.year, "month": d.month, "day": d.day}
            if "week" in date_adj or "dayofweek" in date_adj:
                iso = d.isocalendar()
                base_map = {"year": iso[0], "week": iso[1],
                            "dayofweek": iso[2]}
            base_map.update(date_adj)
            d = date_from_map(
                {k: v for k, v in base_map.items()
                 if k in ("year", "month", "day", "week", "dayofweek",
                          "quarter", "dayofquarter", "ordinalday")}
            ).d
        if time_adj:
            extra = sum(int(v) * s for k, s in _TIME_SCALE.items()
                        for kk, v in time_adj.items() if kk == k)
            t = CyLocalTime(t.nanos + extra)
        if tz_over is not None:
            zone = None
            if re.fullmatch(r"[+-]\d{2}:?(\d{2})?(:?\d{2})?|Z|z", str(tz_over)):
                off = _parse_offset(str(tz_over))
            else:
                z = _zoned(d, t, str(tz_over))
                off, zone = z.offset, z.zone
    return _assemble(target, d, t, off, zone)


def _explode(v):
    if isinstance(v, CyDate):
        return v.d, CyLocalTime(0), None, None
    if isinstance(v, CyLocalTime):
        return _dt.date(1970, 1, 1), v, None, None
    if isinstance(v, CyTime):
        return _dt.date(1970, 1, 1), v.t, v.offset, None
    if isinstance(v, CyLocalDateTime):
        return v.d, v.t, None, None
    if isinstance(v, CyDateTime):
        return v.d, v.t, v.offset, v.zone
    raise TemporalError(f"Not a temporal value: {v!r}")


def _assemble(target: str, d, t, off, zone):
    if target == "date":
        return CyDate(d)
    if target == "localtime":
        return CyLocalTime(t.nanos)
    if target == "time":
        return CyTime(CyLocalTime(t.nanos), off or 0)
    if target == "localdatetime":
        return CyLocalDateTime(d, CyLocalTime(t.nanos))
    return CyDateTime(d, CyLocalTime(t.nanos), off or 0, zone)


# ---------------------------------------------------------------------------
# duration.between / arithmetic
# ---------------------------------------------------------------------------


def _to_ldt(v):
    d, t, off, _ = _explode(v)
    return d, t, (off or 0)


def _utc_nanos(v) -> int:
    d, t, off = _to_ldt(v)
    days = (d - _dt.date(1970, 1, 1)).days
    return days * DAY_NANOS + t.nanos - off * NANOS


def _comparable_nanos(a, b):
    """Instant nanos; offsets apply only when both sides carry one."""
    da, ta, offa = _to_ldt(a)
    db, tb, offb = _to_ldt(b)
    has_off = isinstance(a, (CyTime, CyDateTime)) or isinstance(
        b, (CyTime, CyDateTime)
    )
    na = (da - _dt.date(1970, 1, 1)).days * DAY_NANOS + ta.nanos
    nb = (db - _dt.date(1970, 1, 1)).days * DAY_NANOS + tb.nanos
    if has_off:
        na -= (offa or 0) * NANOS
        nb -= (offb or 0) * NANOS
    return na, nb


def duration_between(a, b, mode: str = "between") -> CyDuration:
    time_only = isinstance(a, (CyLocalTime, CyTime)) and isinstance(
        b, (CyLocalTime, CyTime)
    )
    # date-only values pair with times as midnight etc. via _explode
    da, ta, offa = _to_ldt(a)
    db, tb, offb = _to_ldt(b)
    # a time-only operand borrows the other side's date (openCypher
    # duration.between coercion, TCK Temporal10): date('1984-10-11') ↔
    # localtime('16:30') diff within that day, not against 1970-01-01
    a_has_date = isinstance(a, (CyDate, CyLocalDateTime, CyDateTime))
    b_has_date = isinstance(b, (CyDate, CyLocalDateTime, CyDateTime))
    if not a_has_date and b_has_date:
        da = db
    elif not b_has_date and a_has_date:
        db = da
    a_off = isinstance(a, (CyTime, CyDateTime))
    b_off = isinstance(b, (CyTime, CyDateTime))
    if a_off and b_off:
        tb = CyLocalTime(tb.nanos + (offa - offb) * NANOS)
    elif a_off != b_off:
        # one zoned side + one local side: when the zoned side carries an
        # IANA zone, the local side is interpreted in that zone (DST-aware
        # offset at its own wall time — TCK Temporal10 [8]); with a bare
        # numeric offset both are treated as wall times
        zone = (a.zone if a_off and isinstance(a, CyDateTime)
                else b.zone if b_off and isinstance(b, CyDateTime)
                else None)
        if zone:
            if a_off:
                off_local = _zoned(db, tb, zone).offset
                tb = CyLocalTime(tb.nanos + (offa - off_local) * NANOS)
            else:
                off_local = _zoned(da, ta, zone).offset
                ta = CyLocalTime(ta.nanos + (offb - off_local) * NANOS)
    if mode == "inseconds" or time_only:
        na = ta.nanos
        nb = tb.nanos
        total = (db - da).days * DAY_NANOS + nb - na
        if mode == "inmonths":
            return CyDuration(0, 0, 0)
        if mode == "indays":
            return CyDuration(0, total // DAY_NANOS, 0)
        return CyDuration(0, 0, total)
    # calendar decomposition: whole months, then days, then time
    months = (db.year - da.year) * 12 + (db.month - da.month)
    # tentative same-day-of-month anchor
    forward = (db, tb.nanos) >= (da, ta.nanos)
    anchor = _add_months(da, months)
    # the anchor comparison includes the time-of-day so a partial month
    # is not counted as whole (P-1Y-11M, not P-2Y — TCK Temporal10 [7])
    if forward and (anchor, ta.nanos) > (db, tb.nanos):
        months -= 1
        anchor = _add_months(da, months)
    elif not forward and (anchor, ta.nanos) < (db, tb.nanos):
        months += 1
        anchor = _add_months(da, months)
    days = (db - anchor).days
    nanos = tb.nanos - ta.nanos
    if forward and nanos < 0:
        days -= 1
        nanos += DAY_NANOS
    elif not forward and nanos > 0:
        days += 1
        nanos -= DAY_NANOS
    if forward and days < 0:
        months -= 1
        days = (db - _add_months(da, months)).days
        if nanos < 0:
            days -= 1
            nanos += DAY_NANOS
    if mode == "inmonths":
        return CyDuration(months, 0, 0)
    if mode == "indays":
        return CyDuration(0, days + months_days(da, months), 0)
    return CyDuration(months, days, nanos)


def months_days(start: _dt.date, months: int) -> int:
    return (_add_months(start, months) - start).days


def _add_months(d, months: int):
    y = d.year + (d.month - 1 + months) // 12
    m = (d.month - 1 + months) % 12 + 1
    day = min(d.day, _days_in_month(y, m))
    return _make_date(y, m, day)


def add_duration(v, dur: CyDuration):
    if isinstance(v, CyDuration):
        return CyDuration(v.months + dur.months, v.days + dur.days,
                          v.nanos + dur.nanos)
    d, t, off, zone = _explode(v)
    d = _add_months(d, dur.months) + _dt.timedelta(days=dur.days)
    if isinstance(v, CyDate):
        # date ± duration truncates the time part to WHOLE days, toward
        # zero (openCypher date arithmetic — TCK Temporal8 [1]):
        # PT16H contributes nothing, PT72H contributes 3 days
        return CyDate(d + _dt.timedelta(days=int(dur.nanos / DAY_NANOS)))
    total = t.nanos + dur.nanos
    extra_days, rem = divmod(total, DAY_NANOS)
    d = d + _dt.timedelta(days=extra_days)
    t = CyLocalTime(rem)
    if isinstance(v, CyLocalTime):
        return t
    if isinstance(v, CyTime):
        return CyTime(t, off or 0)
    if isinstance(v, CyLocalDateTime):
        return CyLocalDateTime(d, t)
    return CyDateTime(d, t, off or 0, zone)


def negate_duration(dur: CyDuration) -> CyDuration:
    return CyDuration(-dur.months, -dur.days, -dur.nanos)


def scale_duration(dur: CyDuration, k) -> CyDuration:
    return duration_from_map({
        "months": dur.months * k, "days": dur.days * k,
        "nanoseconds": dur.nanos * k,
    })


def parse_any(s: str):
    """Parse a canonical temporal string of unknown kind (stored property
    round-trip): duration, datetime, date, then time."""
    if s is None:
        return None
    s = str(s)
    if s[:1] in ("P", "+", "-") and "P" in s[:2]:
        return parse_duration(s)
    if "T" in s[1:] or "[" in s:
        try:
            return parse_datetime(s)
        except TemporalError:
            pass
    try:
        return parse_date(s)
    except TemporalError:
        pass
    try:
        return parse_time(s)
    except TemporalError:
        pass
    raise TemporalError(f"Cannot parse temporal value: {s!r}")


def component_of_string(s, name: str):
    """Runtime accessor kernel: component of a stored canonical temporal
    string (None-propagating; None for unparseable input)."""
    if s is None:
        return None
    try:
        v = parse_any(s)
    except TemporalError:
        return None
    try:
        return v.component(name)
    except KeyError:
        return None


def add_strings(a, b, sign: int = 1):
    """Runtime arithmetic kernel over canonical temporal strings:
    temporal ± duration, duration ± duration (None-propagating)."""
    if a is None or b is None:
        return None
    try:
        va = parse_any(a) if isinstance(a, str) else a
        vb = parse_any(b) if isinstance(b, str) else b
    except TemporalError:
        return None
    if isinstance(vb, CyDuration):
        if sign < 0:
            vb = CyDuration(-vb.months, -vb.days, -vb.nanos)
        return str(add_duration(va, vb))
    if isinstance(va, CyDuration) and sign > 0:
        return str(add_duration(vb, va))
    return None


def add_or_concat_strings(a, b, sign: int = 1):
    """'+'/'-' over two string columns: duration arithmetic when both
    parse as canonical durations, else string concatenation ('+' only)."""
    if a is None or b is None:
        return None
    try:
        da = parse_duration(str(a))
        db_ = parse_duration(str(b))
    except TemporalError:
        return str(a) + str(b) if sign > 0 else None
    if sign < 0:
        db_ = CyDuration(-db_.months, -db_.days, -db_.nanos)
    return str(CyDuration(da.months + db_.months, da.days + db_.days,
                          da.nanos + db_.nanos))


def scale_string(s, factor, divide: bool = False):
    """duration-string × / ÷ number: per-component scaling with the
    openCypher fractional carries (month→day via 30.436875, day→nanos)."""
    if s is None or factor is None:
        return None
    try:
        dur = parse_duration(str(s))
    except TemporalError:
        return None
    from fractions import Fraction

    f = Fraction(str(factor))
    if divide:
        if f == 0:
            return None
        f = 1 / f
    # exact rational carries (float rounding would drift by ±1 ns on
    # odd divisions — TCK Temporal8 [7])
    avg = Fraction(30436875, 1000000)  # 365.2425 / 12 days per month
    months = dur.months * f
    mi = int(months)
    days = dur.days * f + (months - mi) * avg
    di = int(days)
    nanos = dur.nanos * f + (days - di) * 86_400 * NANOS
    return str(CyDuration(mi, di, int(nanos)))


def sort_key_of_string(s):
    """Instant-ordered sort key for a stored canonical temporal string:
    UTC nanos for instants, nanos-since-midnight for times, average-length
    total seconds for durations.  None for null/unparseable input."""
    if s is None:
        return None
    try:
        v = parse_any(s)
    except TemporalError:
        return None
    if isinstance(v, CyDate):
        return (v.d - _dt.date(1970, 1, 1)).days * DAY_NANOS
    if isinstance(v, CyLocalTime):
        return v.nanos
    if isinstance(v, CyTime):
        return v.t.nanos - v.offset * NANOS
    if isinstance(v, CyLocalDateTime):
        return ((v.d - _dt.date(1970, 1, 1)).days * DAY_NANOS + v.t.nanos)
    if isinstance(v, CyDateTime):
        return ((v.d - _dt.date(1970, 1, 1)).days * DAY_NANOS + v.t.nanos
                - v.offset * NANOS)
    if isinstance(v, CyDuration):
        return int(v.months * AVG_DAYS_PER_MONTH * DAY_NANOS
                   + v.days * DAY_NANOS + v.nanos)
    return None

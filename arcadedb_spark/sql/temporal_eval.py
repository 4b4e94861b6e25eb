"""Static (compile-time) evaluator for Cypher temporal expressions.

Temporal expressions in queries are almost always constant (literal maps
/ strings / nested constructors), so the expression compiler evaluates
the whole temporal subtree once on the driver and injects the rendered
literal — executors never see temporal logic.  Non-constant temporal
expressions raise :class:`NotStatic` and fall back to the normal column
path (where they will usually fail loudly — a documented limit).
"""

from __future__ import annotations

from arcadedb_spark.sql import ast
from arcadedb_spark.sql import temporal as T

_TEMPORAL_FNS = {
    "cypher.date": "date",
    "cypher.localtime": "localtime",
    "cypher.time": "time",
    "cypher.localdatetime": "localdatetime",
    "cypher.datetime": "datetime",
    "cypher.duration": "duration",
}

_TEMPORAL_NS = ("date", "localtime", "time", "localdatetime", "datetime",
                "duration")


class NotStatic(Exception):
    """The subtree isn't a compile-time temporal constant."""


# Static WITH-binding environment: Cypher pipelines like
# ``WITH date(…) AS d RETURN datetime({date: d})`` stay compile-time
# constant when every referenced alias is itself static.  The pipeline
# translator pushes each stage's static aliases here (translation is
# single-threaded per query); Chain heads resolve against the top frame.
_ENV: list[dict] = []


def push_env(env: dict) -> None:
    _ENV.append(env)


def pop_env() -> None:
    _ENV.pop()


def current_env() -> dict:
    return _ENV[-1] if _ENV else {}


def static_value(e, params):
    """Evaluate an AST to a static value under the current env (for the
    pipeline translator to build the next stage's env).  Returns
    (True, value) or (False, None)."""
    try:
        return True, _static(e, params)
    except (NotStatic, T.TemporalError, Exception):
        return False, None


def mentions_temporal(e) -> bool:
    """Quick pre-check: does the AST mention a temporal constructor?"""
    if isinstance(e, ast.FuncCall):
        return e.name.lower() in _TEMPORAL_FNS or any(
            mentions_temporal(a) for a in e.args
        )
    if isinstance(e, ast.Method):
        if (
            isinstance(e.base, ast.Chain)
            and len(e.base.parts) == 1
            and e.base.parts[0].lower() in _TEMPORAL_NS
        ):
            return True
        return any(mentions_temporal(a) for a in e.args) or mentions_temporal(
            e.base
        )
    if isinstance(e, ast.Bin):
        return mentions_temporal(e.left) or mentions_temporal(e.right)
    if isinstance(e, ast.Unary):
        return mentions_temporal(e.operand)
    if isinstance(e, ast.Index):
        return mentions_temporal(e.base)
    if isinstance(e, ast.MapLit):
        return any(mentions_temporal(v) for _, v in e.entries)
    if isinstance(e, ast.ArrayLit):
        return any(mentions_temporal(v) for v in e.items)
    if isinstance(e, ast.Chain):
        env = current_env()
        return e.parts[0] in env and isinstance(
            env[e.parts[0]], T.TEMPORAL_TYPES
        )
    return False


_NOW: list = []  # statement-scoped clock: one instant per try_eval tree


def _construct(kind: str, args: list):
    if len(args) == 0:
        # argless constructor = statement clock; every argless temporal
        # in one expression shares the same instant, so e.g.
        # duration.inSeconds(localtime(), localtime()) is exactly PT0S
        import datetime as _dt

        if not _NOW:
            raise NotStatic("clock-based temporal (no eval context)")
        now = _NOW[-1]
        d, tm = now.date(), now.time()
        nanos = (
            (tm.hour * 60 + tm.minute) * 60 + tm.second
        ) * T.NANOS + tm.microsecond * 1000
        t = T.CyLocalTime(nanos)
        if kind == "date":
            return T.CyDate(d)
        if kind == "localtime":
            return t
        if kind == "time":
            return T.CyTime(t, 0)
        if kind == "localdatetime":
            return T.CyLocalDateTime(d, t)
        if kind == "datetime":
            return T.CyDateTime(d, t, 0)
        raise NotStatic("clock-based temporal (no args) is not static")
    a = args[0]
    if a is None:
        return None
    if isinstance(a, str):
        if kind == "date":
            return T.parse_date(a)
        if kind == "localtime":
            v = T.parse_time(a)
            return v.t if isinstance(v, T.CyTime) else v
        if kind == "time":
            v = T.parse_time(a)
            return v if isinstance(v, T.CyTime) else T.CyTime(v, 0)
        if kind == "localdatetime":
            v = T.parse_datetime(a)
            return (
                T.CyLocalDateTime(v.d, v.t)
                if isinstance(v, T.CyDateTime)
                else v
            )
        if kind == "datetime":
            v = T.parse_datetime(a)
            return (
                v if isinstance(v, T.CyDateTime)
                else T.CyDateTime(v.d, v.t, 0)
            )
        if kind == "duration":
            return T.parse_duration(a)
    if isinstance(a, dict):
        if kind == "date":
            return T.date_from_map(a)
        if kind == "localtime":
            v = T.time_from_map(a)
            return v.t if isinstance(v, T.CyTime) else v
        if kind == "time":
            v = T.time_from_map(a)
            return v if isinstance(v, T.CyTime) else T.CyTime(v, 0)
        if kind == "localdatetime":
            return T.datetime_from_map(a, local=True)
        if kind == "datetime":
            return T.datetime_from_map(a, local=False)
        if kind == "duration":
            return T.duration_from_map({k.lower(): v for k, v in a.items()})
    if isinstance(a, T.TEMPORAL_TYPES):
        # conversion between temporal kinds
        key = {
            "date": "date", "localtime": "time", "time": "time",
            "localdatetime": "localdatetime", "datetime": "datetime",
        }.get(kind)
        m = {key: a} if key else {}
        return _construct(kind, [m])
    raise T.TemporalError(f"Cannot construct {kind} from {a!r}")


def _static(e, params) -> object:
    """Evaluate an AST subtree to a Python/temporal value."""
    if isinstance(e, ast.Lit):
        return e.value
    if isinstance(e, ast.Chain):
        env = current_env()
        if e.parts[0] not in env:
            raise NotStatic(f"unbound alias {e.parts[0]}")
        v = env[e.parts[0]]
        for p in e.parts[1:]:
            if isinstance(v, T.TEMPORAL_TYPES):
                v = v.component(p)
            elif isinstance(v, dict):
                v = v.get(p)
            else:
                raise NotStatic("chain tail")
        return v
    if isinstance(e, ast.Param):
        if params and e.name in params:
            return params[e.name]
        raise NotStatic("unbound param")
    if isinstance(e, ast.MapLit):
        return {k: _static(v, params) for k, v in e.entries}
    if isinstance(e, ast.ArrayLit):
        return [_static(v, params) for v in e.items]
    if isinstance(e, ast.Unary):
        v = _static(e.operand, params)
        if e.op == "-":
            if isinstance(v, T.CyDuration):
                return T.negate_duration(v)
            return -v
        raise NotStatic(f"unary {e.op}")
    if isinstance(e, ast.FuncCall):
        low = e.name.lower()
        if low == "tostring":
            v = _static(e.args[0], params)
            if isinstance(v, T.TEMPORAL_TYPES):
                return str(v)
            if v is None:
                return None
            if isinstance(v, bool):
                return "true" if v else "false"
            return str(v)
        kind = _TEMPORAL_FNS.get(low)
        if kind is None:
            raise NotStatic(e.name)
        return _construct(kind, [_static(a, params) for a in e.args])
    if isinstance(e, ast.Method):
        if not (
            isinstance(e.base, ast.Chain) and len(e.base.parts) == 1
            and e.base.parts[0].lower() in _TEMPORAL_NS
        ):
            # component access rendered as method? not static
            raise NotStatic("method")
        ns = e.base.parts[0].lower()
        name = e.name.lower()
        args = [_static(a, params) for a in e.args]
        if name in ("transaction", "statement", "realtime"):
            # clock-source variants (date.transaction() etc.): a single
            # timezone arg, null-propagating; all three share the
            # statement clock here (single-statement execution model)
            if args and args[0] is None:
                return None
            if ns != "duration":
                return _construct(ns, [])
            raise NotStatic(name)
        if name == "truncate":
            unit = args[0]
            value = args[1]
            adjust = args[2] if len(args) > 2 else None
            return T.truncate(unit, value, adjust, ns)
        if ns == "duration" and name in ("between", "indays", "inmonths",
                                         "inseconds"):
            a, b = args[0], args[1]
            if a is None or b is None:
                return None
            mode = "between" if name == "between" else name
            return T.duration_between(a, b, mode)
        if ns == "datetime" and name == "fromepoch":
            sec = args[0]
            ns_ = args[1] if len(args) > 1 else 0
            total = int(sec) * T.NANOS + int(ns_)
            days, rem = divmod(total, T.DAY_NANOS)
            import datetime as _dt

            return T.CyDateTime(
                _dt.date(1970, 1, 1) + _dt.timedelta(days=days),
                T.CyLocalTime(rem), 0,
            )
        if ns == "datetime" and name == "fromepochmillis":
            total = int(args[0]) * 1_000_000
            days, rem = divmod(total, T.DAY_NANOS)
            import datetime as _dt

            return T.CyDateTime(
                _dt.date(1970, 1, 1) + _dt.timedelta(days=days),
                T.CyLocalTime(rem), 0,
            )
        if name in ("statement", "realtime", "transaction"):
            raise NotStatic("clock")
        if ns == "date" and name == "add":
            # date.add(epochMillis, delta, unit) — epoch arithmetic with
            # overflow checking (reference CypherFunctionSecurityTest:228)
            if len(args) < 2:
                raise T.TemporalError(
                    "date.add(value, delta[, unit]) takes 2-3 arguments"
                )
            if args[0] is None or args[1] is None:
                return None
            unit_ms = {
                "ms": 1, "s": 1000, "sec": 1000, "second": 1000,
                "m": 60_000, "min": 60_000, "minute": 60_000,
                "h": 3_600_000, "hour": 3_600_000,
                "d": 86_400_000, "day": 86_400_000,
            }.get(str(args[2]).lower() if len(args) > 2 else "ms")
            if unit_ms is None:
                raise T.TemporalError(
                    f"date.add: unknown unit {args[2]!r}"
                )
            out = int(args[0]) + int(args[1]) * unit_ms
            if not (-(2**63) <= out < 2**63):
                raise T.TemporalError("date.add overflows a 64-bit epoch")
            return out
        if ns == "date" and name == "fields":
            # date.fields(text, javaFormat, tz) — parsed calendar fields
            # as a map (apoc.date.fields analog the reference exposes)
            if not args or args[0] is None or (
                len(args) > 1 and args[1] is None
            ):
                return None
            import datetime as _dt
            from zoneinfo import ZoneInfo as _ZI

            fmt = str(args[1]) if len(args) > 1 else "yyyy-MM-dd"
            pyfmt = (
                fmt.replace("'T'", "T").replace("yyyy", "%Y")
                .replace("MM", "%m").replace("dd", "%d")
                .replace("HH", "%H").replace("mm", "%M")
                .replace("ss", "%S")
            )
            try:
                dtv = _dt.datetime.strptime(str(args[0]), pyfmt)
            except ValueError as ex:
                raise T.TemporalError(f"date.fields: {ex}") from None
            if len(args) > 2 and args[2] is not None:
                try:
                    _ZI(str(args[2]))
                except Exception:
                    raise T.TemporalError(
                        f"date.fields: unknown timezone {args[2]!r}"
                    ) from None
            return {
                "years": dtv.year, "months": dtv.month, "days": dtv.day,
                "hours": dtv.hour, "minutes": dtv.minute,
                "seconds": dtv.second, "weekdays": dtv.isoweekday(),
            }
        raise T.TemporalError(f"Unknown temporal function {ns}.{name}")
    if isinstance(e, ast.Index):
        base = _static(e.base, params)
        idx = _static(e.index, params)
        if isinstance(base, T.TEMPORAL_TYPES) and isinstance(idx, str):
            return base.component(idx)
        raise NotStatic("index")
    if isinstance(e, ast.Bin):
        l = _static(e.left, params)
        r = _static(e.right, params)
        if l is None or r is None:
            return None
        if e.op == "+":
            if isinstance(r, T.CyDuration) and isinstance(
                l, T.TEMPORAL_TYPES
            ):
                return T.add_duration(l, r)
            if isinstance(l, T.CyDuration) and isinstance(
                r, T.TEMPORAL_TYPES
            ) and not isinstance(r, T.CyDuration):
                return T.add_duration(r, l)
            if isinstance(l, (int, float)) and isinstance(r, (int, float)):
                return l + r
        if e.op == "-":
            if isinstance(r, T.CyDuration) and isinstance(
                l, T.TEMPORAL_TYPES
            ):
                if isinstance(l, T.CyDuration):
                    return T.CyDuration(
                        l.months - r.months, l.days - r.days,
                        l.nanos - r.nanos,
                    )
                return T.add_duration(l, T.negate_duration(r))
            if isinstance(l, (int, float)) and isinstance(r, (int, float)):
                return l - r
        if e.op in ("=", "==", "!=", "<>", "<", "<=", ">", ">=") and (
            isinstance(l, T.TEMPORAL_TYPES) or isinstance(r, T.TEMPORAL_TYPES)
        ):
            if type(l) is not type(r):
                # mixed temporal kinds: only (in)equality is defined
                if e.op in ("=", "=="):
                    return False
                if e.op in ("!=", "<>"):
                    return True
                raise T.TemporalError("Cannot order different temporal types")
            if isinstance(l, T.CyDuration):
                eq = (l.months, l.days, l.nanos) == (r.months, r.days, r.nanos)
                if e.op in ("=", "=="):
                    return eq
                if e.op in ("!=", "<>"):
                    return not eq
                raise T.TemporalError("Durations are not orderable")
            na, nb = T._comparable_nanos(l, r)
            return {
                "=": na == nb, "==": na == nb, "!=": na != nb,
                "<>": na != nb, "<": na < nb, "<=": na <= nb,
                ">": na > nb, ">=": na >= nb,
            }[e.op]
        if e.op == "*" and isinstance(l, T.CyDuration):
            return T.scale_duration(l, r)
        if e.op == "*" and isinstance(r, T.CyDuration):
            return T.scale_duration(r, l)
        if e.op == "/" and isinstance(l, T.CyDuration):
            return T.scale_duration(l, 1.0 / r)
        raise NotStatic(f"bin {e.op}")
    raise NotStatic(type(e).__name__)


def try_eval(e, params):
    """Returns (True, python-value-or-rendered-string) or (False, None).

    Temporal values render to canonical strings; components pass through
    as numbers/strings; raises TranslateError-compatible TemporalError
    for definitely-temporal-but-invalid input."""
    if not mentions_temporal(e):
        return False, None
    import datetime as _dt

    _NOW.append(_dt.datetime.now(_dt.timezone.utc))
    try:
        v = _static(e, params)
    except NotStatic:
        return False, None
    finally:
        _NOW.pop()
    if isinstance(v, T.TEMPORAL_TYPES):
        return True, str(v)
    if isinstance(v, list):
        return True, [
            str(x) if isinstance(x, T.TEMPORAL_TYPES) else x for x in v
        ]
    if isinstance(v, dict):
        return True, {
            k: (str(x) if isinstance(x, T.TEMPORAL_TYPES) else x)
            for k, x in v.items()
        }
    return True, v

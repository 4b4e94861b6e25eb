"""Pure-Python tests for the Cypher temporal kernel (no SparkSession).

Reference semantics: openCypher TCK expressions/temporal (the reference
runs the same corpus via java.time — engine/src/test/resources/opencypher/
tck/features/expressions/temporal/).
"""

from __future__ import annotations

import pytest

from arcadedb_spark.sql import temporal as T


def d(s):
    return T.parse_date(s)


def test_date_selection_keeps_same_group_subordinates():
    base = {"date": d("1984-11-11")}
    assert str(T.date_from_map({**base, "quarter": 3})) == "1984-08-11"
    assert str(T.date_from_map({**base, "week": 1})) == "1984-01-08"
    assert str(T.date_from_map({**base, "ordinalDay": 28})) == "1984-01-28"
    assert str(T.date_from_map({**base, "year": 28})) == "0028-11-11"
    assert str(T.date_from_map({**base, "day": 28})) == "1984-11-28"


def test_timezone_override_preserves_instant():
    t = T.parse_time("12:31:14.645876+01:00")
    out = T.time_from_map({"time": t, "timezone": "+05:00"})
    assert str(out) == "16:31:14.645876+05:00"
    # without a zoned base the wall time is taken as written
    out2 = T.time_from_map({"hour": 12, "timezone": "+05:00"})
    assert str(out2) == "12:00+05:00"


def test_datetime_zone_override_rolls_date():
    dt = T.parse_datetime("1984-10-11T12:31:42.645876+01:00")
    out = T.datetime_from_map(
        {"datetime": dt, "timezone": "Pacific/Honolulu"}, local=False
    )
    assert str(out) == "1984-10-11T01:31:42.645876-10:00[Pacific/Honolulu]"


def test_duration_between_borrows_date():
    a = d("1984-10-11")
    t = T.parse_time("16:30Z")
    assert str(T.duration_between(a, t)) == "PT16H30M"
    assert str(T.duration_between(t, a)) == "PT-16H-30M"


def test_duration_between_partial_month():
    a = d("2018-07-21")
    b = T.parse_datetime("2016-07-21T21:40:32.142+01:00")
    assert str(T.duration_between(a, b, "inmonths")) == "P-1Y-11M"


def test_date_plus_duration_truncates_to_whole_days():
    dur = T.parse_duration("P12Y5M14DT16H13M10S")
    assert str(T.add_duration(d("1984-10-11"), dur)) == "1997-03-25"
    neg = T.CyDuration(-dur.months, -dur.days, -dur.nanos)
    assert str(T.add_duration(d("1984-10-11"), neg)) == "1972-04-27"
    # whole days inside the time part still count (PT72H = 3 days)
    big = T.parse_duration("PT72H")
    assert str(T.add_duration(d("1984-10-11"), big)) == "1984-10-14"


def test_runtime_string_kernels():
    assert T.component_of_string("1984-10-11", "year") == 1984
    assert T.component_of_string("1984-10-11", "weekDay") is None  # alias handled upstream
    assert T.component_of_string("1984-10-11", "dayofweek") == 4
    assert T.component_of_string("12:31:14.645876123+01:00", "timezone") == "+01:00"
    assert T.component_of_string(None, "year") is None
    assert T.component_of_string("not a date", "year") is None

    assert T.add_strings("1984-10-11", "P1Y", 1) == "1985-10-11"
    assert T.add_strings("1984-10-11", "P1Y", -1) == "1983-10-11"
    assert T.add_strings("P1Y", "1984-10-11", 1) == "1985-10-11"
    assert T.add_strings(None, "P1Y", 1) is None

    assert T.add_or_concat_strings("P1Y", "P2M") == "P1Y2M"
    assert T.add_or_concat_strings("P1Y", "P2M", -1) == "P10M"
    assert T.add_or_concat_strings("foo", "bar") == "foobar"
    assert T.add_or_concat_strings("foo", "bar", -1) is None

    assert T.scale_string("P12Y5M14DT16H13M10.000000001S", 2) == \
        "P24Y10M28DT32H26M20.000000002S"
    assert T.scale_string("P12Y5M14DT16H13M10.000000001S", 2, True) == \
        "P6Y2M22DT13H21M8S"
    assert T.scale_string("garbage", 2) is None


def test_sort_keys_order_by_instant():
    ks = [T.sort_key_of_string(s) for s in (
        "12:35:15+05:00", "12:30:14.645876123+01:01",
        "12:31:14.645876123+01:00", "10:35-08:00",
    )]
    assert ks == sorted(ks)
    # far-future datetimes do not overflow (decimal key upstream)
    assert T.sort_key_of_string("9999-09-09T09:59:59.999999999+11:59") > 0


def test_statement_clock_shared():
    from arcadedb_spark.sql import temporal_eval as TE
    from arcadedb_spark.sql import ast

    e = ast.Method(
        ast.Chain(("duration",)), "inSeconds",
        (ast.FuncCall("cypher.localtime", ()),
         ast.FuncCall("cypher.localtime", ())),
    )
    ok, v = TE.try_eval(e, {})
    assert ok and v == "PT0S"


def test_big_year_dates_parse_and_render():
    # java.time supports years ±999_999_999 (TCK Temporal10 [9][10])
    lo = d("-999999999-01-01")
    hi = d("+999999999-12-31")
    assert str(lo) == "-999999999-01-01"
    assert str(hi) == "+999999999-12-31"
    # ordinal round-trip on the proleptic calendar
    assert T._date_from_ordinal(lo.d.toordinal()) == lo.d
    assert T._date_from_ordinal(hi.d.toordinal()) == hi.d
    # ordinary years still produce datetime.date (fast path)
    import datetime
    assert isinstance(d("2015-07-21").d, datetime.date)


def test_big_year_duration_between():
    a, b = d("-999999999-01-01"), d("+999999999-12-31")
    assert str(T.duration_between(a, b)) == "P1999999998Y11M30D"
    la = T.parse_datetime("-999999999-01-01")
    lb = T.parse_datetime("+999999999-12-31T23:59:59")
    assert (str(T.duration_between(la, lb, "inseconds"))
            == "PT17531639991215H59M59S")
    # reversed direction negates cleanly
    assert str(T.duration_between(b, a)) == "P-1999999998Y-11M-30D"


def test_merged_tzdb_zone_resolution():
    # tzdata >= 2022f merges Europe/Stockholm into Europe/Berlin; java.time
    # (the reference) resolves pre-1879 Stockholm to Berlin's LMT +00:53:28,
    # not backzone's +01:12:12 (TCK Temporal2 [6])
    out = T.parse_datetime("1818-07-21T21:40:32.142[Europe/Stockholm]")
    assert str(out) == "1818-07-21T21:40:32.142+00:53:28[Europe/Stockholm]"
    # modern dates are unaffected
    out2 = T.parse_datetime("2017-10-29T04:00[Europe/Stockholm]")
    assert str(out2) == "2017-10-29T04:00+01:00[Europe/Stockholm]"


def test_date_add_and_fields():
    # epoch helpers the reference exposes through the cypher registry
    # (CypherFunctionSecurityTest.java:228)
    from arcadedb_spark.sql import ast
    from arcadedb_spark.sql.temporal_eval import try_eval

    def ev(q_args, name):
        e = ast.Method(ast.Chain(("date",)), name, tuple(q_args))
        ok, v = try_eval(e, {})
        assert ok
        return v

    lit = lambda v: ast.Lit(v)  # noqa: E731
    assert ev([lit(1000), lit(500), lit("ms")], "add") == 1500
    assert ev([lit(0), lit(2), lit("h")], "add") == 7_200_000
    assert ev([lit(None), lit(100), lit("ms")], "add") is None
    f = ev([lit("2024-01-15"), lit("yyyy-MM-dd"), lit("UTC")], "fields")
    assert f["years"] == 2024 and f["months"] == 1 and f["days"] == 15
    with pytest.raises(T.TemporalError):
        ev([lit(2**63 - 1), lit(1), lit("ms")], "add")

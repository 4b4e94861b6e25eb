"""Line-protocol ingestion + PromQL evaluator tests
(engine/timeseries/LineProtocolParser.java, promql/*.java parity)."""

from __future__ import annotations

import pytest

from arcadedb_spark.sources.line_protocol import parse_line, parse_text
from arcadedb_spark.timeseries.promql import (
    PromQLParser, Selector, parse_duration, promql_instant, promql_range,
)


# -- line protocol: pure parser ---------------------------------------------


def test_line_protocol_basic():
    s = parse_line("cpu,host=h1,region=eu usage=0.5,cores=8i 1700000000000000000")
    assert s["measurement"] == "cpu"
    assert s["tags"] == {"host": "h1", "region": "eu"}
    assert s["fields_double"] == {"usage": 0.5}
    assert s["fields_long"] == {"cores": 8}
    assert s["ts_millis"] == 1_700_000_000_000  # ns → ms


def test_line_protocol_types_and_escapes():
    s = parse_line(r'disk,path=/var\ log used="almost\" full",ok=true 1700000000', "s")
    assert s["tags"] == {"path": "/var log"}
    assert s["fields_str"] == {"used": 'almost" full'}
    assert s["fields_bool"] == {"ok": True}
    assert s["ts_millis"] == 1_700_000_000_000  # s → ms


def test_line_protocol_malformed_skipped():
    text = "\n".join([
        "# comment",
        "",
        "nofields_at_all",
        "m f=notanumber",
        "good v=1 1000",
    ])
    out = parse_text(text, "ms")
    assert len(out) == 1 and out[0]["measurement"] == "good"
    assert out[0]["fields_double"] == {"v": 1.0} and out[0]["ts_millis"] == 1000


def test_line_protocol_distributed(spark, tmp_path):
    p = tmp_path / "metrics.lp"
    p.write_text(
        "\n".join(
            f"cpu,host=h{i % 2} usage={i / 10} {1700000000 + i}"
            for i in range(100)
        )
    )
    from arcadedb_spark.sources.line_protocol import read_line_protocol

    df = read_line_protocol(spark, str(p), precision="s")
    assert df.count() == 100
    hosts = {r["tags"]["host"] for r in df.select("tags").collect()}
    assert hosts == {"h0", "h1"}


# -- promql parser ----------------------------------------------------------


def test_promql_parse():
    assert parse_duration("1h30m") == 5_400_000
    e = PromQLParser('rate(http_requests{job="api",code=~"5.."}[5m])').parse()
    assert e.name == "rate"
    sel = e.args[0]
    assert isinstance(sel, Selector) and sel.range_ms == 300_000
    assert sel.matchers[1].op == "=~"
    agg = PromQLParser("sum by (host) (cpu_usage)").parse()
    assert agg.op == "sum" and agg.labels == ("host",)
    b = PromQLParser("a / b * 2").parse()
    assert b.op == "*"
    with pytest.raises(ValueError):
        PromQLParser("sum(").parse()


# -- promql evaluator -------------------------------------------------------


@pytest.fixture(scope="module")
def metrics(spark):
    # counter increasing 10/s on two hosts, gauge on one
    rows = []
    for i in range(0, 61):  # one sample per second for a minute
        ts = 1_700_000_000_000 + i * 1000
        rows.append(("requests", {"host": "a"}, ts, float(10 * i)))
        rows.append(("requests", {"host": "b"}, ts, float(20 * i)))
        rows.append(("temp", {"host": "a"}, ts, 50.0 + (i % 3)))
    return spark.createDataFrame(
        rows, "metric string, labels map<string,string>, ts_millis long, value double"
    ).cache()


T_END = 1_700_000_000_000 + 60_000


def test_instant_vector(metrics):
    out = promql_instant(metrics, 'requests{host="a"}', T_END).collect()
    assert len(out) == 1 and out[0]["value"] == 600.0
    both = promql_instant(metrics, "requests", T_END).collect()
    assert sorted(r["value"] for r in both) == [600.0, 1200.0]


def test_rate_counter(metrics):
    # perfectly dense counter: rate == slope, no extrapolation error
    out = promql_instant(metrics, 'rate(requests{host="a"}[30s])', T_END).collect()
    assert len(out) == 1
    assert out[0]["value"] == pytest.approx(10.0, rel=1e-3)
    inc = promql_instant(metrics, 'increase(requests{host="b"}[30s])', T_END).collect()
    assert inc[0]["value"] == pytest.approx(600.0, rel=1e-3)  # 20/s × 30s


def test_aggregation_and_binary(metrics):
    s = promql_instant(metrics, "sum(rate(requests[30s]))", T_END).collect()
    assert s[0]["value"] == pytest.approx(30.0, rel=1e-3)
    by = promql_instant(metrics, "sum by (host) (requests)", T_END).collect()
    assert {r["labels"]["host"]: r["value"] for r in by} == {"a": 600.0, "b": 1200.0}
    # vector/vector arithmetic joins on identical label sets
    ratio = promql_instant(
        metrics, 'requests / rate(requests[30s])', T_END
    ).collect()
    assert sorted(round(r["value"]) for r in ratio) == [60, 60]
    # comparison filters
    hot = promql_instant(metrics, "requests > 1000", T_END).collect()
    assert len(hot) == 1 and hot[0]["labels"]["host"] == "b"
    # scalar math
    tripled = promql_instant(metrics, 'requests{host="a"} * 3', T_END).collect()
    assert tripled[0]["value"] == 1800.0


def test_topk_and_setops(metrics):
    top = promql_instant(metrics, "topk(1, requests)", T_END).collect()
    assert len(top) == 1 and top[0]["labels"]["host"] == "b"
    # 'and' keeps series present on both sides: temp only exists for host a
    both = promql_instant(metrics, "requests and temp", T_END).collect()
    assert len(both) == 1 and both[0]["labels"]["host"] == "a"
    unless = promql_instant(metrics, "requests unless temp", T_END).collect()
    assert len(unless) == 1 and unless[0]["labels"]["host"] == "b"


def test_range_query(metrics):
    out = promql_range(
        metrics, 'avg_over_time(temp[30s])', T_END - 10_000, T_END, 5_000
    ).collect()
    assert len(out) == 3  # three eval points
    assert all(49.5 <= r["value"] <= 51.5 for r in out)


def test_db_promql_surface(db):
    from pyspark.sql import functions as F

    ev = db.table("events")
    db.register_metrics(
        "ev",
        ev.select(
            F.create_map(F.lit("event_type"), F.col("event_type")).alias("labels"),
            F.unix_millis("ts").alias("ts_millis"),
            F.col("value").cast("double").alias("value"),
        ),
    )
    out = db.promql("sum by (event_type) (avg_over_time(ev[24h]))").collect()
    assert len(out) >= 1
    assert all(r["labels"]["event_type"] for r in out)


def test_ts_correlate_percentile(db):
    r = db.query(
        "SELECT round(ts.correlate(value, value), 4) AS self_corr, "
        "ts.percentile(value, 0.5) AS p50 "
        "FROM events"
    ).collect()[0]
    assert r["self_corr"] == 1.0
    assert r["p50"] is not None


def test_bucketed_range_matches_slow_path(metrics):
    """Dense grid (step < range): the bucket-reuse fast path must produce
    byte-identical values to the per-point matrix-selector path for every
    range function, including counter extrapolation and left-edge samples
    landing exactly on window boundaries (samples here are second-aligned,
    so edges DO hit)."""
    from arcadedb_spark.timeseries.promql import PromQLEvaluator

    ev = PromQLEvaluator(metrics)
    start, end, step = T_END - 20_000, T_END, 5_000
    points = list(range(start, end + 1, step))
    for q in [
        "rate(requests[15s])",
        "increase(requests[15s])",
        "irate(requests[15s])",
        "sum_over_time(temp[15s])",
        "avg_over_time(temp[15s])",
        "min_over_time(temp[15s])",
        "max_over_time(temp[15s])",
        "count_over_time(temp[15s])",
        "last_over_time(temp[15s])",
    ]:
        fast = ev._run(q, points, step_ms=step, start_ms=start)
        slow = ev._run(q, points)  # no grid metadata → per-point path
        fr = {(r["ts_millis"], str(sorted(r["labels"].items()))): r["value"]
              for r in fast.collect()}
        sr = {(r["ts_millis"], str(sorted(r["labels"].items()))): r["value"]
              for r in slow.collect()}
        assert fr.keys() == sr.keys(), q
        for key in sr:
            assert fr[key] == pytest.approx(sr[key], rel=1e-12, abs=1e-12), (q, key)


def test_bucketed_path_plan_single_sample_scan(metrics):
    """The fast path's plan aggregates raw samples once (one groupBy over
    the metric scan) rather than once per eval point."""
    from arcadedb_spark.timeseries.promql import PromQLEvaluator

    ev = PromQLEvaluator(metrics)
    start, end, step = T_END - 20_000, T_END, 5_000
    points = list(range(start, end + 1, step))
    df = ev._run("avg_over_time(temp[15s])", points, step_ms=step, start_ms=start)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the naive path joins samples to the grid BEFORE any aggregation; the
    # bucketed path's first join input is already aggregated partials
    assert plan.count("BroadcastNestedLoopJoin") == 0

"""EXPLAIN / PROFILE statement tests (parser/ExplainStatement.java,
ProfileStatement.java, ExplainResultSet.java)."""

from __future__ import annotations

import pytest


def test_explain_select_no_execution(db, spark):
    # warm the table so parquet listing doesn't count as a job
    db.query("SELECT l_orderkey FROM lineitem LIMIT 1").collect()
    sc = spark.sparkContext
    sc.setJobGroup("explain-gate", "explain must not run the query")
    edf = db.query(
        "EXPLAIN SELECT l_orderkey FROM lineitem WHERE l_quantity > 45"
    )
    jobs = sc.statusTracker().getJobIdsForGroup("explain-gate")
    sc.setJobGroup("explain-gate-done", "")
    assert jobs == [], "EXPLAIN must not execute the explained query"
    rows = edf.collect()
    assert len(rows) == 1
    plan = rows[0]["plan"]
    assert "Physical Plan" in plan
    # the plan is the real Catalyst plan: filter pushed into the scan
    assert "PushedFilters" in plan and "l_quantity" in plan


def test_explain_match_and_case_insensitive(db):
    rows = db.query(
        "explain MATCH (c:Customer)-[:PLACED]->(o:`Order`) "
        "RETURN count(*) AS n",
        language="cypher",
    ).collect()
    assert len(rows) == 1 and "Physical Plan" in rows[0]["plan"]
    assert rows[0]["language"] == "cypher"


def test_profile_runs_and_reports(db):
    rows = db.query(
        "PROFILE SELECT count(*) AS n FROM customer"
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["rows"] == 1 and r["elapsed_ms"] > 0
    assert "Physical Plan" in r["plan"]


def test_explain_write_plans_without_executing(db):
    """EXPLAIN of a write parses/validates WITHOUT executing
    (ExplainStatement.java never mutates)."""
    before = db.query("SELECT count(*) AS n FROM customer").collect()[0]["n"]
    r = db.query("EXPLAIN INSERT INTO customer SET c_name = 'x'").collect()[0]
    assert "write statement" in r["plan"]
    after = db.query("SELECT count(*) AS n FROM customer").collect()[0]["n"]
    assert after == before
    with pytest.raises(ValueError):
        db.query("EXPLAIN")
    # identifiers starting with the keyword are untouched
    with pytest.raises(Exception):
        db.query("EXPLAINX SELECT 1")

"""TCK-style Cypher semantic tests (SURVEY §5: the reference ships the
openCypher TCK corpus — engine/src/test/resources/opencypher/tck; this
is the null/optional/aggregation-semantics subset that bites engines)."""

from __future__ import annotations

import pytest


def cy(db, text):
    return db.query(text, language="cypher")


@pytest.fixture(scope="module")
def tck(db):
    # isolated mini-graph: two linked people, one loner
    cy(db, "CREATE (a:TPerson {name: 'ann', age: 30})-[:KNOWS]->"
           "(b:TPerson {name: 'bob', age: 40})")
    cy(db, "CREATE (c:TPerson {name: 'cat'})")  # no age, no edges
    return db


def test_optional_match_yields_nulls(tck):
    rows = cy(tck,
        "MATCH (p:TPerson) OPTIONAL MATCH (p)-[:KNOWS]->(q:TPerson) "
        "RETURN p.name AS name, q.name AS friend ORDER BY name"
    ).collect()
    got = {(r["name"], r["friend"]) for r in rows}
    assert got == {("ann", "bob"), ("bob", None), ("cat", None)}


def test_missing_property_is_null_not_error(tck):
    rows = cy(tck,
        "MATCH (p:TPerson) RETURN p.name AS name, p.age AS age ORDER BY name"
    ).collect()
    ages = {r["name"]: r["age"] for r in rows}
    assert ages["cat"] is None and ages["ann"] == 30


def test_aggregates_ignore_nulls(tck):
    r = cy(tck,
        "MATCH (p:TPerson) RETURN count(p.age) AS n_age, count(*) AS n_all, "
        "avg(p.age) AS mean, collect(p.age) AS ages"
    ).collect()[0]
    # Cypher null rules: count(prop) and collect() skip nulls; count(*) doesn't
    assert r["n_age"] == 2 and r["n_all"] == 3
    assert r["mean"] == 35.0
    assert sorted(r["ages"]) == [30, 40]


def test_null_comparison_filters_out(tck):
    # WHERE on a null property is not-true → row dropped, no error
    rows = cy(tck,
        "MATCH (p:TPerson) WHERE p.age > 0 RETURN p.name AS name ORDER BY name"
    ).collect()
    assert [r["name"] for r in rows] == ["ann", "bob"]


def test_distinct_on_nodes(tck):
    # two outgoing KNOWS from the same match must not duplicate p
    rows = cy(tck,
        "MATCH (p:TPerson)-[:KNOWS]->(:TPerson) RETURN DISTINCT p.name AS n"
    ).collect()
    assert [r["n"] for r in rows] == ["ann"]


def test_where_on_optional_alias(tck):
    # WHERE inside OPTIONAL MATCH restricts the optional side only
    rows = cy(tck,
        "MATCH (p:TPerson) OPTIONAL MATCH (p)-[:KNOWS]->(q:TPerson {name: 'nobody'}) "
        "RETURN p.name AS name, q.name AS friend ORDER BY name"
    ).collect()
    assert all(r["friend"] is None for r in rows) and len(rows) == 3

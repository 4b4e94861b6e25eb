"""GraphQL skin tests (graphql/GraphQLBasicTest.java parity shapes)."""

from __future__ import annotations

import pytest

SCHEMA = """
type Query {
  customerByName(c_name: String): Customer
  customers(where: String): [Customer]
  topOrders(k: Int): [Order] @sql(statement: "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC LIMIT 5")
}

type Customer {
  c_custkey: Int
  c_name: String
  c_mktsegment: String
  orders: [Order] @relationship(type: "PLACED", direction: OUT)
}

type Order {
  o_orderkey: Int
  o_totalprice: Float
}
"""


@pytest.fixture(scope="module")
def gdb(db):
    db.graph()  # build the fixture graph before resolving relationships
    db.command(SCHEMA, language="graphql")
    return db


def test_graphql_lookup_with_selection(gdb):
    rows = gdb.query(
        '{ customerByName(c_name: "Customer#000000001") { c_name c_mktsegment } }',
        language="graphql",
    ).collect()
    assert len(rows) == 1
    assert set(rows[0].asDict()) == {"c_name", "c_mktsegment"}


def test_graphql_no_selection_returns_scalars(gdb):
    rows = gdb.query(
        '{ customerByName(c_name: "Customer#000000001") }', language="graphql"
    ).collect()
    # all scalar fields of Customer, relationship field excluded
    assert set(rows[0].asDict()) == {"c_custkey", "c_name", "c_mktsegment"}


def test_graphql_relationship_selection(gdb):
    rows = gdb.query(
        '{ customerByName(c_name: "Customer#000000001") '
        "{ c_name orders { o_orderkey o_totalprice } } }",
        language="graphql",
    ).collect()
    assert len(rows) == 1
    orders = rows[0]["orders"]
    assert orders and all(set(o.asDict()) == {"o_orderkey", "o_totalprice"} for o in orders)


def test_graphql_where_and_sql_directive(gdb):
    rows = gdb.query(
        '{ customers(where: "c_mktsegment = \'BUILDING\' AND c_custkey < 50") { c_custkey } }',
        language="graphql",
    ).collect()
    assert rows and all(r["c_custkey"] < 50 for r in rows)
    top = gdb.query("{ topOrders }", language="graphql").collect()
    assert len(top) == 5
    assert top[0]["o_totalprice"] >= top[-1]["o_totalprice"]


def test_graphql_wrong_arg_raises(gdb):
    with pytest.raises(ValueError):
        gdb.query(
            '{ customerByName(wrong: "x") }', language="graphql"
        )

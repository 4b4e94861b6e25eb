"""One-store unification: SQL and Cypher share the graph record store.

Reference: there is ONE record store behind every query language
(query/QueryEngineManager.java:60 dispatches languages over the same
database) — a write on either surface must be visible to the other, with
stable identity.  These tests pin the symmetric round trip the round-6
verdict flagged as asymmetric.
"""

from __future__ import annotations

import pytest


@pytest.fixture()
def scratch(spark):
    from arcadedb_spark.database import Database

    return Database(spark)


def _names(df, col="name"):
    return sorted(r[col] for r in df.collect())


def test_sql_insert_visible_to_cypher(scratch):
    scratch.command("CREATE VERTEX TYPE P1")
    scratch.command("INSERT INTO P1 (name) VALUES ('a'), ('b')")
    out = scratch.query(
        "MATCH (p:P1) RETURN p.name AS name", language="cypher"
    )
    assert _names(out) == ["a", "b"]


def test_cypher_create_visible_to_sql(scratch):
    scratch.query("CREATE (:P2 {name:'x'}), (:P2 {name:'y'})",
                  language="cypher").collect()
    out = scratch.query("SELECT name FROM P2")
    assert _names(out) == ["x", "y"]
    # the auto-registered type shows in the schema catalog as vertex kind
    kinds = {r["name"]: r["kind"]
             for r in scratch.query("SELECT name, kind FROM schema:types").collect()}
    assert kinds.get("P2") == "vertex"


def test_sql_update_visible_to_cypher(scratch):
    scratch.command("CREATE VERTEX TYPE P3")
    scratch.command("INSERT INTO P3 (name, age) VALUES ('a', 1), ('b', 2)")
    scratch.command("UPDATE P3 SET age = 10 WHERE name = 'a'")
    rows = {
        r["name"]: r["age"]
        for r in scratch.query(
            "MATCH (p:P3) RETURN p.name AS name, p.age AS age",
            language="cypher",
        ).collect()
    }
    assert rows == {"a": 10, "b": 2}


def test_cypher_set_visible_to_sql(scratch):
    scratch.command("CREATE VERTEX TYPE P4")
    scratch.command("INSERT INTO P4 (name, age) VALUES ('a', 1), ('b', 2)")
    scratch.query(
        "MATCH (p:P4) WHERE p.name = 'b' SET p.age = 20", language="cypher"
    ).collect()
    rows = {r["name"]: r["age"]
            for r in scratch.query("SELECT name, age FROM P4").collect()}
    assert rows == {"a": 1, "b": 20}


def test_sql_delete_visible_to_cypher(scratch):
    scratch.command("CREATE VERTEX TYPE P5")
    scratch.command("INSERT INTO P5 (name) VALUES ('a'), ('b'), ('c')")
    scratch.command("DELETE FROM P5 WHERE name = 'b'")
    out = scratch.query("MATCH (p:P5) RETURN p.name AS name",
                        language="cypher")
    assert _names(out) == ["a", "c"]


def test_cypher_delete_visible_to_sql(scratch):
    scratch.command("CREATE VERTEX TYPE P6")
    scratch.command("INSERT INTO P6 (name) VALUES ('a'), ('b')")
    scratch.query("MATCH (p:P6 {name:'a'}) DETACH DELETE p",
                  language="cypher").collect()
    assert _names(scratch.query("SELECT name FROM P6")) == ["b"]


def test_rid_identity_stable_across_surfaces(scratch):
    scratch.command("CREATE VERTEX TYPE P7")
    scratch.command("INSERT INTO P7 (name) VALUES ('a')")
    rid1 = scratch.query("SELECT @rid FROM P7").collect()[0][0]
    scratch.query("MATCH (p:P7) SET p.age = 5", language="cypher").collect()
    row = scratch.query("SELECT @rid, age FROM P7").collect()[0]
    assert row[0] == rid1 and row[1] == 5
    # rid addressing works on the write path too
    scratch.command(f"UPDATE P7 SET age = 6 WHERE @rid = '{rid1}'")
    assert scratch.query("SELECT age FROM P7").collect()[0][0] == 6


def test_insert_from_select_reaches_graph(scratch, spark):
    scratch.register_type(
        "src_docs",
        spark.createDataFrame([("a", 1), ("b", 2)], "name string, v int"),
    )
    scratch.command("CREATE VERTEX TYPE P8")
    scratch.command("INSERT INTO P8 FROM SELECT name, v FROM src_docs")
    out = scratch.query(
        "MATCH (p:P8) RETURN p.name AS name", language="cypher"
    )
    assert _names(out) == ["a", "b"]


def test_edge_type_one_store(scratch):
    scratch.command("CREATE VERTEX TYPE PV")
    scratch.command("CREATE EDGE TYPE Knows")
    scratch.query(
        "CREATE (:PV {name:'a'})-[:Knows {w: 1}]->(:PV {name:'b'})",
        language="cypher",
    ).collect()
    # Cypher-created edges visible to SQL SELECT on the edge type
    rows = scratch.query("SELECT w FROM Knows").collect()
    assert [r["w"] for r in rows] == [1]
    # SQL CREATE EDGE visible to Cypher
    scratch.command(
        "CREATE EDGE Knows FROM (SELECT FROM PV WHERE name = 'b') "
        "TO (SELECT FROM PV WHERE name = 'a') SET w = 2"
    )
    out = scratch.query(
        "MATCH (:PV)-[k:Knows]->(:PV) RETURN k.w AS w ORDER BY w",
        language="cypher",
    )
    assert [r["w"] for r in out.collect()] == [1, 2]
    # SQL UPDATE on the edge type visible to Cypher
    scratch.command("UPDATE Knows SET w = 9 WHERE w = 2")
    out = scratch.query(
        "MATCH ()-[k:Knows]->() RETURN k.w AS w ORDER BY w",
        language="cypher",
    )
    assert [r["w"] for r in out.collect()] == [1, 9]
    # SQL DELETE on the edge type visible to Cypher
    scratch.command("DELETE FROM Knows WHERE w = 9")
    out = scratch.query(
        "MATCH ()-[k:Knows]->() RETURN count(*) AS c", language="cypher"
    )
    assert out.collect()[0]["c"] == 1


def test_truncate_live_vertex_type(scratch):
    scratch.command("CREATE VERTEX TYPE P9")
    scratch.command("INSERT INTO P9 (name) VALUES ('a'), ('b')")
    scratch.command("TRUNCATE TYPE P9")
    assert scratch.query("SELECT name FROM P9").count() == 0
    assert scratch.query(
        "MATCH (p:P9) RETURN count(*) AS c", language="cypher"
    ).collect()[0]["c"] == 0


def test_drop_type_purges_graph_rows(scratch):
    scratch.command("CREATE VERTEX TYPE P10")
    scratch.command("INSERT INTO P10 (name) VALUES ('a')")
    scratch.command("DROP TYPE P10")
    out = scratch.query("MATCH (p:P10) RETURN count(*) AS c",
                        language="cypher")
    assert out.collect()[0]["c"] == 0


def test_insert_into_edge_type_rejected(scratch):
    scratch.command("CREATE EDGE TYPE E11")
    with pytest.raises(Exception, match="CREATE EDGE"):
        scratch.command("INSERT INTO E11 (w) VALUES (1)")

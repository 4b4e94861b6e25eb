"""path.* / meta.* / merge.* / db.index.vector.queryNodes procedures.

Reference: query/opencypher/procedures/{path,meta,merge}/*.java,
DbIndexVectorQueryNodes.java, CypherProcedureRegistry.java (apoc. prefix
aliases); usage shape from AlgoGhostEdgeTest.java:116 and
CypherCallVectorNeighborsTest.java.
"""

from __future__ import annotations

import pytest


@pytest.fixture()
def pdb(spark):
    """a -LINK-> b -LINK-> c ; a -OTHER-> d(:Z)"""
    from arcadedb_spark.database import Database

    db = Database(spark)
    db.query(
        "CREATE (:P {name:'a'})-[:LINK]->(:P {name:'b'})"
        "-[:LINK]->(:P {name:'c'})",
        language="cypher",
    ).collect()
    db.query(
        "MATCH (a:P {name:'a'}) CREATE (a)-[:OTHER]->(:Z {name:'d'})",
        language="cypher",
    ).collect()
    return db


def _run(db, q, **kw):
    return db.query(q, language="cypher", **kw).collect()


def test_path_expand(pdb):
    rows = _run(
        pdb,
        "MATCH (a:P {name:'a'}) CALL path.expand(a, 'LINK', null, 1, 10) "
        "YIELD path RETURN length(path) AS l ORDER BY l",
    )
    assert [r["l"] for r in rows] == [1, 2]


def test_path_expand_label_filter(pdb):
    rows = _run(
        pdb,
        "MATCH (a:P {name:'a'}) CALL path.expand(a, null, 'P', 1, 10) "
        "YIELD path RETURN count(*) AS c",
    )
    assert rows[0]["c"] == 2  # d(:Z) filtered out


def test_path_expand_min_depth(pdb):
    rows = _run(
        pdb,
        "MATCH (a:P {name:'a'}) CALL path.expand(a, 'LINK', null, 2, 10) "
        "YIELD path RETURN count(*) AS c",
    )
    assert rows[0]["c"] == 1


def test_path_expand_config(pdb):
    rows = _run(
        pdb,
        "MATCH (a:P {name:'a'}) CALL path.expandConfig(a, "
        "{relationshipFilter:'LINK', minLevel:1, maxLevel:1}) "
        "YIELD path RETURN length(path) AS l",
    )
    assert [r["l"] for r in rows] == [1]


def test_path_subgraph_nodes(pdb):
    rows = _run(
        pdb,
        "MATCH (a:P {name:'a'}) CALL path.subgraphNodes(a, {}) "
        "YIELD node RETURN node.name AS n ORDER BY n",
    )
    assert [r["n"] for r in rows] == ["a", "b", "c", "d"]


def test_path_subgraph_all(pdb):
    rows = _run(
        pdb,
        "MATCH (a:P {name:'a'}) CALL path.subgraphAll(a, "
        "{relationshipFilter:'LINK'}) YIELD nodes, relationships "
        "RETURN size(nodes) AS n, size(relationships) AS r",
    )
    assert (rows[0]["n"], rows[0]["r"]) == (3, 2)


def test_path_spanning_tree(pdb):
    rows = _run(
        pdb,
        "MATCH (a:P {name:'a'}) CALL path.spanningTree(a, {}) "
        "YIELD path RETURN count(*) AS c",
    )
    assert rows[0]["c"] == 4  # one path per reachable node incl. root


def test_apoc_prefix_alias(pdb):
    rows = _run(
        pdb,
        "MATCH (a:P {name:'a'}) CALL apoc.path.expand(a, 'LINK', null, 1, 1) "
        "YIELD path RETURN count(*) AS c",
    )
    assert rows[0]["c"] == 1


def test_meta_stats(pdb):
    rows = _run(
        pdb,
        "CALL meta.stats() YIELD value "
        "RETURN value.nodeCount AS n, value.relCount AS r, "
        "value.labelCount AS lc",
    )
    assert (rows[0]["n"], rows[0]["r"], rows[0]["lc"]) == (4, 3, 2)


def test_meta_node_type_properties(pdb):
    rows = _run(
        pdb,
        "CALL meta.nodeTypeProperties() YIELD nodeType, propertyName, "
        "propertyTypes RETURN nodeType, propertyName ORDER BY nodeType",
    )
    assert [(r["nodeType"], r["propertyName"]) for r in rows] == [
        ("P", "name"), ("Z", "name")
    ]


def test_meta_graph(pdb):
    rows = _run(
        pdb,
        "CALL meta.graph() YIELD nodes, relationships "
        "RETURN size(nodes) AS n, size(relationships) AS r",
    )
    assert (rows[0]["n"], rows[0]["r"]) == (2, 2)


def test_meta_schema(pdb):
    rows = _run(
        pdb,
        "CALL meta.schema() YIELD value RETURN value['P'].count AS pc, "
        "value['LINK'].type AS lt",
    )
    assert rows[0]["pc"] == 3
    assert rows[0]["lt"] == "relationship"


def test_merge_node_create_then_match(pdb):
    rows = _run(
        pdb,
        "CALL merge.node(['M'], {k: 1}, {made: true}, {}) "
        "YIELD node RETURN node.k AS k, node.made AS made",
    )
    assert (rows[0]["k"], rows[0]["made"]) == (1, True)
    rows = _run(
        pdb,
        "CALL merge.node(['M'], {k: 1}, {}, {seen: true}) "
        "YIELD node RETURN node.k AS k, node.seen AS seen",
    )
    assert (rows[0]["k"], rows[0]["seen"]) == (1, True)
    # still a single node
    rows = _run(pdb, "MATCH (m:M) RETURN count(*) AS c")
    assert rows[0]["c"] == 1


def test_merge_relationship_idempotent(pdb):
    q = (
        "MATCH (a:P {name:'a'}), (c:P {name:'c'}) "
        "CALL merge.relationship(a, 'MREL', {}, {w: %d}, c) "
        "YIELD rel RETURN rel.w AS w"
    )
    assert [r["w"] for r in _run(pdb, q % 5)] == [5]
    # second merge matches, does not re-create (w stays 5)
    assert [r["w"] for r in _run(pdb, q % 9)] == [5]


def test_query_nodes_vector(pdb, spark):
    emb = spark.createDataFrame(
        [("docA", [1.0, 0.0, 0.0]), ("docB", [0.9, 0.1, 0.0]),
         ("docE", [0.0, 0.0, 1.0])],
        "name string, embedding array<double>",
    )
    pdb.register_type("Doc", emb)
    rows = _run(
        pdb,
        "CALL db.index.vector.queryNodes('Doc[embedding]', $k, $vec) "
        "YIELD node, score RETURN node.name AS name, round(score, 3) AS s "
        "ORDER BY s DESC",
        k=2, vec=[0.0, 0.0, 1.0],
    )
    assert [r["name"] for r in rows] == ["docE", "docA"]
    assert rows[0]["s"] == 1.0


def test_path_expand_arg_errors(pdb):
    with pytest.raises(Exception, match="minDepth"):
        _run(
            pdb,
            "MATCH (a:P {name:'a'}) CALL path.expand(a, null, null, -1, 2) "
            "YIELD path RETURN path",
        )
    with pytest.raises(Exception, match="maxDepth"):
        _run(
            pdb,
            "MATCH (a:P {name:'a'}) CALL path.expand(a, null, null, 3, 2) "
            "YIELD path RETURN path",
        )


def test_merge_relationship_per_row_association(pdb):
    """A MATCH producing N endpoint pairs yields exactly N rows, each
    rel associated with ITS pair (MergeRelationship.java streams per
    input row) — regression for the crossJoin N*N bug."""
    rows = _run(
        pdb,
        "MATCH (a:P)-[:LINK]->(b:P) "
        "CALL merge.relationship(a, 'MR2', {}, {}, b) "
        "YIELD rel RETURN a.name AS s, b.name AS d ORDER BY s",
    )
    assert [(r["s"], r["d"]) for r in rows] == [("a", "b"), ("b", "c")]
    # merged edges parallel the LINK edges, one each
    cnt = _run(pdb, "MATCH (:P)-[r:MR2]->(:P) RETURN count(r) AS c")
    assert cnt[0]["c"] == 2

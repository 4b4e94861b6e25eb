"""openCypher front-end tests (subset, lowered to MATCH joins)."""

from __future__ import annotations


def cy(db, text):
    return db.query(text, language="cypher")


def test_basic_match_count(db):
    n = cy(db, "MATCH (c:Customer)-[:PLACED]->(o:`Order`) RETURN count(*) AS n").collect()[0]["n"]
    assert n == 1500


def test_implicit_grouping(db):
    rows = cy(
        db,
        "MATCH (c:Customer)-[:PLACED]->(o:`Order`) "
        "RETURN c.c_mktsegment AS seg, count(*) AS n ORDER BY seg",
    ).collect()
    assert len(rows) == 5 and sum(r["n"] for r in rows) == 1500


def test_inline_props(db):
    n = cy(
        db, "MATCH (c:Customer {c_mktsegment: 'BUILDING'}) RETURN count(*) AS n"
    ).collect()[0]["n"]
    base = db.table("customer").filter("c_mktsegment = 'BUILDING'").count()
    assert n == base


def test_optional_match(db):
    rows = cy(
        db,
        "MATCH (n:Nation) OPTIONAL MATCH (n)<-[:LOCATED_IN]-(s:Supplier) "
        "RETURN n.n_name AS nation, count(s.s_suppkey) AS ns ORDER BY nation",
    ).collect()
    assert len(rows) == 25 and any(r["ns"] == 0 for r in rows)


def test_string_predicates(db):
    rows = cy(
        db,
        "MATCH (c:Customer) WHERE c.c_name STARTS WITH 'Customer#00000001' "
        "AND c.c_name ENDS WITH '4' RETURN c.c_name AS name ORDER BY name",
    ).collect()
    assert [r["name"] for r in rows] == ["Customer#000000014"]


def test_regex_operator(db):
    rows = cy(
        db,
        "MATCH (c:Customer) WHERE c.c_name =~ '.*00000000[12]$' "
        "RETURN c.c_name AS name ORDER BY name",
    ).collect()
    assert [r["name"] for r in rows] == ["Customer#000000001", "Customer#000000002"]


def test_union_all(db):
    rows = cy(
        db,
        "MATCH (c:Customer) WHERE c.c_acctbal > 9500 RETURN c.c_custkey AS k "
        "UNION ALL "
        "MATCH (c:Customer) WHERE c.c_acctbal < -900 RETURN c.c_custkey AS k",
    ).collect()
    hi = db.table("customer").filter("c_acctbal > 9500").count()
    lo = db.table("customer").filter("c_acctbal < -900").count()
    assert len(rows) == hi + lo


def test_collect(db):
    rows = cy(
        db,
        "MATCH (c:Customer)-[:LOCATED_IN]->(nt:Nation) "
        "RETURN nt.n_name AS nation, collect(c.c_custkey) AS custs ORDER BY nation",
    ).collect()
    assert len(rows) == 25
    assert sum(len(r["custs"]) for r in rows) == 150


def test_variable_length_path(db):
    # openCypher trail semantics: one row per relationship-unique path,
    # so *1..2 counts 1-hop edges plus 2-hop edge pairs (INTERACTED edges
    # are distinct (src,dst) pairs, so no pair can reuse an edge here)
    from pyspark.sql import functions as F

    n = cy(
        db,
        "MATCH (a:Customer {c_custkey: 7})-[:INTERACTED*1..2]->(b:Customer) "
        "RETURN count(*) AS n",
    ).collect()[0]["n"]
    g = db.graph()
    e = g.edges("INTERACTED").select("src", "dst").distinct()
    base = db.schema.get("customer").bucket_id << 40
    r1 = e.filter(F.col("src") == base + 7).select("dst")
    r2 = (
        e.filter(F.col("src") == base + 7)
        .select(F.col("dst").alias("mid"))
        .join(e, F.col("mid") == e["src"])
        .select("dst")
    )
    assert n == r1.count() + r2.count()


def test_with_having_semantics(db):
    rows = cy(
        db,
        "MATCH (c:Customer)-[:PLACED]->(o:`Order`) "
        "WITH c, count(o.o_orderkey) AS n WHERE n > 12 "
        "RETURN c.c_name AS name, n ORDER BY n DESC, name",
    ).collect()
    assert rows and all(r["n"] > 12 for r in rows)
    # equivalent via plain aggregation + filter
    from pyspark.sql import functions as F

    expect = (
        db.table("orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 12)
        .count()
    )
    assert len(rows) == expect


def test_with_then_match(db):
    rows = cy(
        db,
        "MATCH (c:Customer)-[:PLACED]->(o:`Order`) WHERE o.o_totalprice > 400000 "
        "WITH c MATCH (c)-[:LOCATED_IN]->(nt:Nation) "
        "RETURN count(*) AS n",
    ).collect()
    from pyspark.sql import functions as F

    expect = (
        db.table("orders")
        .filter(F.col("o_totalprice") > 400000)
        .join(db.table("customer"), F.col("o_custkey") == F.col("c_custkey"))
        .count()  # every customer has exactly one nation
    )
    assert rows[0]["n"] == expect


def test_create_and_merge(db):
    cy(db, "CREATE (a:Proj {name: 'apollo'})-[:OWNED_BY]->(b:Team {name: 'core'})")
    rows = cy(db, "MATCH (p:Proj)-[:OWNED_BY]->(t:Team) RETURN p.name AS p, t.name AS t").collect()
    assert [(r["p"], r["t"]) for r in rows] == [("apollo", "core")]
    # MERGE: idempotent on existing, creates when absent (write queries
    # return an empty frame — Cypher semantics — so verify by re-query)
    assert cy(db, "MERGE (a:Proj {name: 'apollo'})").collect() == []
    assert cy(db, "MATCH (p:Proj) RETURN count(*) AS n").collect()[0]["n"] == 1
    assert cy(db, "MERGE (a:Proj {name: 'gemini'})").collect() == []
    names = sorted(r["n"] for r in cy(db, "MATCH (p:Proj) RETURN p.name AS n").collect())
    assert names == ["apollo", "gemini"]


def test_match_create_edges_per_row(db):
    cy(db, "MATCH (c:Customer) WHERE c.c_custkey < 3 "
           "CREATE (c)-[:TAGGED]->(x:Tag {kind: 'vip'})")
    n = cy(db, "MATCH (c:Customer)-[:TAGGED]->(t:Tag) RETURN count(*) AS n").collect()[0]["n"]
    assert n == 3  # one edge per matched customer (shared literal node)


def test_unwind_literal(db):
    rows = cy(db, "UNWIND [1, 2, 3] AS x RETURN x ORDER BY x").collect()
    assert [r["x"] for r in rows] == [1, 2, 3]


def test_collect_unwind_roundtrip(db):
    n = cy(
        db,
        "MATCH (n:Nation)<-[:LOCATED_IN]-(s:Supplier) "
        "WITH n, collect(s.s_suppkey) AS ks UNWIND ks AS k RETURN count(*) AS n",
    ).collect()[0]["n"]
    assert n == 10  # all supplier rows come back after collect→unwind


def test_set_and_detach_delete(db):
    cy(db, "CREATE (a:Widget {name: 'w1', price: 10.0}), (b:Widget {name: 'w2', price: 20.0})")
    cy(db, "MATCH (i:Widget) WHERE i.price > 15 SET i.price = i.price * 2").collect()
    prices = {r["n"]: r["p"] for r in cy(db, "MATCH (i:Widget) RETURN i.name AS n, i.price AS p").collect()}
    assert prices == {"w1": 10.0, "w2": 40.0}
    cy(db, "CREATE (x:Widget {name: 'junk', price: 1.0})-[:WREL]->(y:Widget {name: 'keep', price: 2.0})")
    cy(db, "MATCH (i:Widget) WHERE i.name = 'junk' DETACH DELETE i").collect()
    remaining = sorted(r["n"] for r in cy(db, "MATCH (i:Widget) RETURN i.name AS n").collect())
    assert remaining == ["keep", "w1", "w2"]
    # incident edge removed with the vertex
    assert cy(db, "MATCH (a:Widget)-[:WREL]->(b:Widget) RETURN count(*) AS n").collect()[0]["n"] == 0


def test_call_procedures(db):
    rows = cy(
        db,
        "CALL algo.degreeCentrality('PLACED') YIELD vid, degree "
        "RETURN count(*) AS n, max(degree) AS mx",
    ).collect()
    assert rows[0]["n"] == 1650  # both-direction: 150 customers + 1500 orders
    tri = cy(
        db, "CALL algo.triangleCount('INTERACTED') YIELD vid, triangles "
            "RETURN sum(triangles) AS t"
    ).collect()[0]["t"]
    assert tri == 3 * 455  # corner-credited count on the fixture graph
    pr = cy(
        db,
        "CALL algo.pageRank('INTERACTED', 5) YIELD vid, rank "
        "RETURN vid, rank ORDER BY rank DESC, vid LIMIT 3",
    ).collect()
    assert len(pr) == 3


def test_vector_sql_namespace(db):
    r = db.query(
        "SELECT round(vector.cosineSimilarity(embedding, embedding), 4) AS s, "
        "round(vector.l2Distance(embedding, embedding), 4) AS d "
        "FROM embeddings LIMIT 1"
    ).collect()[0]
    assert r["s"] == 1.0 and r["d"] == 0.0


def test_remove_property(db):
    cy(db, "CREATE (a:Gizmo {name: 'g1', color: 'red'})")
    cy(db, "MATCH (g:Gizmo) REMOVE g.color")
    r = cy(db, "MATCH (g:Gizmo) RETURN g.name AS n, g.color AS c").collect()[0]
    assert r["n"] == "g1" and r["c"] is None


def test_merge_on_create_on_match(db):
    # first MERGE creates → ON CREATE fires
    cy(db, "MERGE (a:Acct {name: 'alice'}) "
           "ON CREATE SET a.visits = 1 ON MATCH SET a.visits = a.visits + 1")
    r = cy(db, "MATCH (a:Acct) RETURN a.visits AS v").collect()[0]
    assert r["v"] == 1
    # second MERGE matches → ON MATCH fires
    cy(db, "MERGE (a:Acct {name: 'alice'}) "
           "ON CREATE SET a.visits = 1 ON MATCH SET a.visits = a.visits + 1")
    r = cy(db, "MATCH (a:Acct) RETURN a.visits AS v").collect()[0]
    assert r["v"] == 2


def test_create_edge_properties(db):
    cy(db, "CREATE (a:City {name: 'rome'})-[r:ROAD {km: 540, kind: 'hwy'}]->"
           "(b:City {name: 'milan'})")
    g = db.graph()
    e = g.edges("ROAD").collect()
    assert len(e) == 1 and e[0]["km"] == 540 and e[0]["kind"] == "hwy"


def test_merge_edge_idempotent(db):
    cy(db, "CREATE (a:Srv {name: 's1'}), (b:Srv {name: 's2'})")
    cy(db, "MERGE (a:Srv {name: 's1'})-[:LINKS]->(b:Srv {name: 's2'})").collect()
    assert db.graph().edges("LINKS").count() == 1  # nodes matched, one edge created
    cy(db, "MERGE (a:Srv {name: 's1'})-[:LINKS]->(b:Srv {name: 's2'})").collect()
    assert db.graph().edges("LINKS").count() == 1


def test_foreach_literal(db):
    cy(db, "FOREACH (x IN [1, 2, 3] | CREATE (n:Seq {pos: x}))")
    rows = cy(db, "MATCH (n:Seq) RETURN n.pos AS p ORDER BY p").collect()
    assert [r["p"] for r in rows] == [1, 2, 3]


def test_foreach_set_over_match(db):
    cy(db, "CREATE (a:Dial {name: 'd1', lvl: 0})")
    cy(db, "MATCH (d:Dial) FOREACH (x IN [1, 2] | SET d.lvl = d.lvl + x)")
    r = cy(db, "MATCH (d:Dial) RETURN d.lvl AS l").collect()[0]
    assert r["l"] == 3  # 0 + 1 + 2


def test_set_relationship_property(db):
    cy(db, "CREATE (a:Hub {name: 'h1'})-[r:WIRE {cap: 10}]->(b:Hub {name: 'h2'})")
    cy(db, "MATCH (a:Hub {name: 'h1'})-[r:WIRE]->(b:Hub) SET r.cap = r.cap * 5, r.checked = true").collect()
    e = db.graph().edges("WIRE").collect()
    assert len(e) == 1 and e[0]["cap"] == 50 and e[0]["checked"] is True
    # other edge types untouched
    assert "cap" not in [c for c in db.graph().edges("PLACED").columns if c == "cap"] or \
        db.graph().edges("PLACED").filter("cap is not null").count() == 0


def test_custom_procedure_registration(db):
    # ProcedureRegistry.java analog: user procedures join the CALL surface
    from pyspark.sql import functions as F
    from arcadedb_spark.graph.procedures import procedure

    @procedure("custom.degreeSquared")
    def _deg2(db_, args):
        g = db_.graph()
        e = g.edges(*[a for a in args if isinstance(a, str)])
        return (
            e.groupBy(F.col("src").alias("vid"))
            .agg((F.count("*") * F.count("*")).alias("d2"))
        )

    rows = cy(
        db,
        "CALL custom.degreeSquared('PLACED') YIELD vid, d2 "
        "RETURN max(d2) AS mx, count(*) AS n",
    ).collect()
    from pyspark.sql import functions as F2

    max_deg = (
        db.graph().edges("PLACED").groupBy("src").agg(F2.count("*").alias("d"))
        .agg(F2.max("d")).collect()[0][0]
    )
    assert rows[0]["n"] == 150 and rows[0]["mx"] == max_deg * max_deg


def test_node_functions(db):
    r = cy(db,
        "MATCH (c:Customer)-[:PLACED]->(o:`Order`) "
        "RETURN id(c) AS i, labels(c) AS l, labels(o) AS lo "
        "ORDER BY i LIMIT 1"
    ).collect()[0]
    assert isinstance(r["i"], int) and r["l"] == ["Customer"]
    assert r["lo"] == ["Order"]


# -- round-3 write-semantics fixes (ADVICE r2) ---------------------------


def test_merge_null_property_rejected(db):
    # MERGE on a literal null property is a SemanticError (TCK Merge1);
    # previously swallowed because TranslateError subclasses ValueError
    import pytest

    with pytest.raises(Exception, match="null property"):
        cy(db, "MERGE (n:NullProp {p: null})")
    # and the node must NOT have been created with the null dropped
    assert cy(db, "MATCH (n:NullProp) RETURN count(*) AS n").collect()[0]["n"] == 0


def test_typed_delete_spares_parallel_edge(db):
    # DELETE r through WITH must honor r's relationship type: a parallel
    # edge of another type between the same endpoints survives
    cy(db, "CREATE (a:DelT {name: 'a'})-[:KNOWS]->(b:DelT {name: 'b'})")
    cy(db, "MATCH (a:DelT {name: 'a'}), (b:DelT {name: 'b'}) CREATE (a)-[:LIKES]->(b)")
    cy(db, "MATCH (:DelT)-[r:KNOWS]->(:DelT) WITH r DELETE r")
    g = db.graph()
    pairs = g.vertices("delt").select("vid")
    remaining = [
        r["etype"]
        for r in g.edges()
        .join(pairs.withColumnRenamed("vid", "src"), "src", "left_semi")
        .collect()
    ]
    assert remaining == ["LIKES"]


def test_with_scope_allows_rebind_of_dropped_path_var(db):
    # a path variable dropped by WITH may be rebound later (WITH scoping)
    rows = cy(
        db,
        "MATCH p=(a:Customer) WITH count(*) AS c "
        "MATCH (p:Nation) RETURN c, count(p) AS np",
    ).collect()
    assert rows[0]["np"] == 25


def test_plain_delete_connected_node_errors(db):
    import pytest

    cy(db, "CREATE (a:ConnDel {name: 'a'})-[:TIES]->(b:ConnDel {name: 'b'})")
    with pytest.raises(Exception, match="DETACH"):
        cy(db, "MATCH (n:ConnDel {name: 'a'}) DELETE n")
    # node survives the failed delete
    assert cy(db, "MATCH (n:ConnDel) RETURN count(*) AS n").collect()[0]["n"] == 2
    # deleting the relationship in the same clause makes it legal
    cy(db, "MATCH (a:ConnDel {name: 'a'})-[r:TIES]->(b) DELETE a, r")
    assert cy(db, "MATCH (n:ConnDel) RETURN count(*) AS n").collect()[0]["n"] == 1
    # DETACH DELETE cascades
    cy(db, "CREATE (x:ConnDel {name: 'c'})-[:TIES]->(y:ConnDel {name: 'd'})")
    cy(db, "MATCH (n:ConnDel {name: 'c'}) DETACH DELETE n")
    names = sorted(
        r["nm"] for r in cy(db, "MATCH (n:ConnDel) RETURN n.name AS nm").collect()
    )
    assert names == ["b", "d"]


def test_delete_after_create_preserves_clause_order(db):
    # '... WITH n, m CREATE (m)-[:T]->(n) DELETE n' must run the CREATE
    # first, then the (frame-wise) DELETE — no dangling edge afterwards
    cy(db, "CREATE (n:OrdDel {name: 'n'}), (m:OrdDel {name: 'm'})")
    cy(
        db,
        "MATCH (n:OrdDel {name: 'n'}), (m:OrdDel {name: 'm'}) "
        "WITH n, m CREATE (m)-[:T2]->(n) DETACH DELETE n",
    )
    g = db.graph()
    assert cy(db, "MATCH (x:OrdDel) RETURN count(*) AS n").collect()[0]["n"] == 1
    # the edge was created before the delete, so n's detach-cleanup swept
    # it — a dangling edge to the deleted vertex would remain if the
    # delete had been hoisted before the create
    assert g.edges("T2").count() == 0


def _scratch(spark):
    from arcadedb_spark.database import Database

    return Database(spark)


def test_call_subquery_uncorrelated(spark):
    db = _scratch(spark)
    cy(db, "CREATE (:P {name: 'a'}), (:P {name: 'b'}), "
           "(:Q {name: 'a'}), (:Q {name: 'a'}), (:Q {name: 'b'})")
    rows = cy(
        db,
        "MATCH (p:P) CALL { MATCH (q:Q) RETURN count(q) AS nq } "
        "RETURN p.name AS n, nq ORDER BY n",
    ).collect()
    assert [(r["n"], r["nq"]) for r in rows] == [("a", 3), ("b", 3)]


def test_call_subquery_correlated_agg(spark):
    db = _scratch(spark)
    cy(db, "CREATE (:P {name: 'a'}), (:P {name: 'b'}), "
           "(:Q {name: 'a'}), (:Q {name: 'a'}), (:Q {name: 'b'})")
    rows = cy(
        db,
        "MATCH (p:P) CALL { WITH p MATCH (q:Q {name: p.name}) "
        "RETURN count(q) AS nq } RETURN p.name AS n, nq ORDER BY n",
    ).collect()
    assert [(r["n"], r["nq"]) for r in rows] == [("a", 2), ("b", 1)]


def test_call_subquery_correlated_rows_and_elimination(spark):
    db = _scratch(spark)
    cy(db, "CREATE (:P {name: 'a'}), (:P {name: 'zzz'}), "
           "(:Q {name: 'a'}), (:Q {name: 'a'})")
    rows = cy(
        db,
        "MATCH (p:P) CALL { WITH p MATCH (q:Q) WHERE q.name = p.name "
        "RETURN q.name AS qn } RETURN p.name AS n, qn",
    ).collect()
    # zero-row subquery bindings eliminate the outer row ('zzz' gone)
    assert sorted((r["n"], r["qn"]) for r in rows) == [("a", "a"), ("a", "a")]


def test_call_subquery_leading_and_union(spark):
    db = _scratch(spark)
    cy(db, "CREATE (:Q {name: 'a'}), (:Q {name: 'b'})")
    rows = cy(
        db,
        "CALL { MATCH (q:Q) RETURN q.name AS qn "
        "UNION MATCH (q:Q) RETURN q.name AS qn } RETURN qn ORDER BY qn",
    ).collect()
    assert [r["qn"] for r in rows] == ["a", "b"]


def test_call_subquery_unit_writes_and_unsupported_shapes(spark):
    import pytest

    from arcadedb_spark.sql.translator import TranslateError

    db = _scratch(spark)
    cy(db, "CREATE (:P {name: 'a'}), (:Q {name: 'a'})")
    # unit (write-only) subqueries inline as per-row writes (reference
    # CallStep.java:71 runs them once per input row)
    rows = cy(db, "MATCH (p:P) CALL { CREATE (:R) } RETURN p.name AS n"
              ).collect()
    assert [r["n"] for r in rows] == ["a"]
    assert cy(db, "MATCH (r:R) RETURN count(*) AS n").collect()[0]["n"] == 1
    # block-local bindings stay local
    with pytest.raises(TranslateError):
        cy(db, "MATCH (p:P) CALL { CREATE (z:R) } RETURN z").collect()
    # correlated SKIP/LIMIT still rejected (per-invocation semantics)
    with pytest.raises(TranslateError):
        cy(
            db,
            "MATCH (p:P) CALL { WITH p MATCH (q:Q) RETURN q LIMIT 1 } "
            "RETURN p",
        ).collect()


def test_match_create_with_match_continuation(spark):
    db = _scratch(spark)
    cy(db, "CREATE (:P {name: 'a'}), (:P {name: 'b'})")
    rows = cy(
        db,
        "MATCH (p:P) CREATE (q:Q2 {name: p.name}) "
        "WITH p MATCH (q2:Q2 {name: p.name}) "
        "RETURN p.name AS pn, q2.name AS qn",
    ).collect()
    assert sorted((r["pn"], r["qn"]) for r in rows) == [("a", "a"), ("b", "b")]


def test_merge_on_match_last_row_wins(spark):
    # reference MergeStep applies ON MATCH once per frame row — the last
    # row's value is the one that survives on the shared entity
    db = _scratch(spark)
    cy(db, "CREATE (:P {name: 'a', v: 1}), (:P {name: 'b', v: 2}), "
           "(:T {k: 1})")
    cy(db, "MATCH (p:P) MERGE (t:T {k: 1}) ON MATCH SET t.seen = p.v")
    assert cy(db, "MATCH (t:T) RETURN t.seen AS s").collect()[0]["s"] == 2
    # creation triggers on the FIRST row — ON CREATE sees row 0
    cy(db, "MATCH (p:P) MERGE (t2:T2 {k: 1}) ON CREATE SET t2.first = p.v")
    assert (
        cy(db, "MATCH (t2:T2) RETURN t2.first AS f").collect()[0]["f"] == 1
    )


def test_call_subquery_agg_zero_match_keeps_outer_row(spark):
    # pure-aggregate CALL subqueries yield one row per invocation even
    # over zero inner matches: count -> 0 (openCypher aggregate-over-
    # empty semantics; inner-join-back would drop the binding)
    db = _scratch(spark)
    cy(db, "CREATE (:P {name: 'a'}), (:P {name: 'zzz'}), (:Q {name: 'a'})")
    rows = cy(
        db,
        "MATCH (p:P) CALL { WITH p MATCH (q:Q {name: p.name}) "
        "RETURN count(q) AS nq, collect(q.name) AS names } "
        "RETURN p.name AS n, nq, names ORDER BY n",
    ).collect()
    assert [(r["n"], r["nq"], r["names"]) for r in rows] == [
        ("a", 1, ["a"]), ("zzz", 0, []),
    ]


def test_count_collect_subquery_expressions(db):
    """COUNT { } / COLLECT { } subquery expressions (Cypher25Parser.g4
    countExpression/collectExpression) — decorrelated to grouped markers
    joined on the shared aliases, never a per-row subplan."""
    rows = db.query(
        "MATCH (c:Customer) WHERE c.c_custkey <= 3 "
        "RETURN c.c_custkey AS k, "
        "COUNT { MATCH (c)-[:PLACED]->(o) } AS n ORDER BY k",
        language="cypher",
    ).collect()
    from pyspark.sql import functions as F

    expect = {
        r["o_custkey"]: r["count"]
        for r in db.table("orders").filter(F.col("o_custkey") <= 3)
        .groupBy("o_custkey").count().collect()
    }
    assert {r["k"]: r["n"] for r in rows} == expect
    # COUNT with RETURN DISTINCT counts distinct values, not rows
    np = db.query(
        "MATCH (c:Customer) WHERE c.c_custkey = 0 RETURN "
        "COUNT { MATCH (c)-[:PLACED]->(o) RETURN DISTINCT o.o_orderpriority } AS np",
        language="cypher",
    ).collect()[0]["np"]
    expect_np = (
        db.table("orders").filter(F.col("o_custkey") == 0)
        .select("o_orderpriority").distinct().count()
    )
    assert np == expect_np
    # COLLECT respects the block's ORDER BY (incl. DESC) and DISTINCT
    got = db.query(
        "MATCH (c:Customer) WHERE c.c_custkey = 1 RETURN "
        "COLLECT { MATCH (c)-[:PLACED]->(o) RETURN o.o_orderkey "
        "ORDER BY o.o_orderkey DESC } AS l",
        language="cypher",
    ).collect()[0]["l"]
    exp = [
        r[0] for r in db.table("orders").filter(F.col("o_custkey") == 1)
        .select("o_orderkey").orderBy(F.desc("o_orderkey")).collect()
    ]
    assert got == exp
    # zero matches: COUNT -> 0, COLLECT -> []
    z = db.query(
        "MATCH (s:Supplier) WHERE s.s_suppkey = 1 RETURN "
        "COUNT { (s)-[:PLACED]->() } AS n, "
        "COLLECT { MATCH (s)-[:PLACED]->(o) RETURN o.o_orderkey } AS l",
        language="cypher",
    ).collect()[0]
    assert z["n"] == 0 and z["l"] == []
    # bare patterns are still not values
    import pytest as _pt
    from arcadedb_spark.sql.translator import TranslateError

    with _pt.raises(TranslateError):
        db.query(
            "MATCH (c:Customer) RETURN (c)-[:PLACED]->()",
            language="cypher",
        )


def test_label_disjunction_and_type_predicates(db):
    """Cypher-25 label expressions (n:A|B) and IS :: type predicates
    (reference CypherLabelDisjunctionTest.java — issues #4211/#4105;
    CypherFollowUpsIssue5602Test.java:105)."""
    n = db.query(
        "MATCH (n:Customer|Supplier) RETURN count(*) AS n",
        language="cypher",
    ).collect()[0]["n"]
    expect = db.table("customer").count() + db.table("supplier").count()
    assert n == expect
    # predicate position
    m = db.query(
        "MATCH (n) WHERE n:Customer|Supplier RETURN count(*) AS n",
        language="cypher",
    ).collect()[0]["n"]
    assert m == expect
    # IS :: / IS NOT :: — null conforms to every value type
    r = db.query(
        "RETURN 1 IS :: INTEGER AS a, 'x' IS :: INTEGER AS b, "
        "1.5 IS :: FLOAT AS c, [1] IS :: LIST AS d, "
        "1 IS NOT :: STRING AS e, null IS :: INTEGER AS f",
        language="cypher",
    ).collect()[0]
    assert (r["a"], r["b"], r["c"], r["d"], r["e"], r["f"]) == (
        True, False, True, True, True, True,
    )
    # writes reject disjunctions
    import pytest as _pt
    from arcadedb_spark.sql.translator import TranslateError

    with _pt.raises(TranslateError):
        db.query("CREATE (n:A|B)", language="cypher")


def test_shortest_path_pattern_function(spark):
    """shortestPath()/allShortestPaths() pattern functions (reference
    CypherShortestPathEdgeFilterTest): minimal-hop walks per endpoint
    pair via a partitioned window — no global sort."""
    db = _scratch(spark)
    cy(db, "CREATE (a:N {name:'a'}), (b:N {name:'b'}), (c:N {name:'c'}), "
           "(d:N {name:'d'}), (e:N {name:'e'}), (f:N {name:'f'})")
    for s, t, w in [("a","b",1),("a","c",1),("b","d",1),("c","d",2),
                    ("a","e",1),("e","f",1),("f","d",1)]:
        cy(db, f"MATCH (x:N {{name:'{s}'}}), (y:N {{name:'{t}'}}) "
               f"CREATE (x)-[:L {{w:{w}}}]->(y)")
    one = cy(db, "MATCH p = shortestPath((a:N {name:'a'})-[:L*1..3]->"
                 "(d:N {name:'d'})) RETURN length(p) AS l").collect()
    assert [r["l"] for r in one] == [2]
    both = cy(db, "MATCH p = allShortestPaths((a:N {name:'a'})-[:L*1..3]->"
                  "(d:N {name:'d'})) RETURN length(p) AS l").collect()
    assert [r["l"] for r in both] == [2, 2]
    # inline edge filter restricts the walk during expansion
    filt = cy(db, "MATCH p = shortestPath((a:N {name:'a'})-[:L*1..3 {w:1}]"
                  "->(d:N {name:'d'})) RETURN length(p) AS l").collect()
    assert [r["l"] for r in filt] == [2]


def test_cypher25_function_tail(spark):
    """Reference function-surface tail (CypherMissingFunctionsTest.java):
    coll.*/vector.* namespaces, trim family, conversions, valueType."""
    db = _scratch(spark)
    r = cy(db, "RETURN coll.distinct([1,2,2,3]) AS a, "
               "coll.indexOf([10,20,30], 20) AS b, "
               "coll.insert([1,3,4], 1, 2) AS c, "
               "coll.remove([1,2,3,4,5], 1, 2) AS d, "
               "coll.sort([3,1,2]) AS e, coll.max(['b','a','c']) AS f"
           ).collect()[0]
    assert (r["a"], r["b"], r["c"], r["d"], r["e"], r["f"]) == (
        [1, 2, 3], 1, [1, 2, 3, 4], [1, 4, 5], [1, 2, 3], "c",
    )
    r = cy(db, "RETURN vector.norm(vector([3.0,4.0])) AS n, "
               "vector.dimension.count(vector([1.0,2.0])) AS d").collect()[0]
    assert (r["n"], r["d"]) == (5.0, 2)
    r = cy(db, "RETURN trim('  x ') AS a, btrim('--y--', '-') AS b, "
               "left('hello',2) AS c, right('hello',2) AS d, "
               "replace('aba','a','c') AS e, nullIf(1,1) AS f, "
               "isEmpty('') AS g, isEmpty([1]) AS h, "
               "valueType(1) AS i, toIntegerOrNull('x') AS j, "
               "toStringList([1,2]) AS k, normalize('café') AS l"
           ).collect()[0]
    assert (r["a"], r["b"], r["c"], r["d"], r["e"]) == (
        "x", "y", "he", "lo", "cbc",
    )
    assert r["f"] is None and r["g"] is True and r["h"] is False
    assert r["i"] == "INTEGER NOT NULL" and r["j"] is None
    assert r["k"] == ["1", "2"] and r["l"] == "café"


def test_inline_pattern_where_and_map_projection(spark):
    """Cypher-25 inline pattern predicates and map projections
    (reference CypherInlinePatternWhereTest, OpenCypherExpressionTest)."""
    db = _scratch(spark)
    cy(db, "CREATE (a:P {name:'Alice', age:30}), (b:P {name:'Bob', age:17}),"
           " (c:P {name:'Carol', age:25})")
    cy(db, "MATCH (a:P {name:'Alice'}), (b:P {name:'Bob'}) "
           "CREATE (a)-[:KNOWS {since:1995}]->(b)")
    cy(db, "MATCH (a:P {name:'Alice'}), (c:P {name:'Carol'}) "
           "CREATE (a)-[:KNOWS {since:2010}]->(c)")
    got = [r["name"] for r in cy(
        db, "MATCH (n:P WHERE n.age > 18) RETURN n.name AS name "
            "ORDER BY name").collect()]
    assert got == ["Alice", "Carol"]
    # inline rel predicate, correlated with an outer alias
    got = [r["name"] for r in cy(
        db, "MATCH (n:P {name:'Alice'})-[r:KNOWS WHERE r.since < "
            "n.age + 1970]->(m) RETURN m.name AS name").collect()]
    assert got == ["Bob"]
    # OPTIONAL keeps the row, null-padding the failed inline predicate
    row = cy(db, "MATCH (n:P {name:'Alice'}) OPTIONAL MATCH "
                 "(m:P WHERE m.age > 200) RETURN n.name AS name, "
                 "m AS other").collect()[0]
    assert row["name"] == "Alice" and row["other"] is None
    # map projections: props, computed entries, star, missing -> null
    p = cy(db, "MATCH (n:P {name:'Alice'}) RETURN "
               "n{.name, doubleAge: n.age * 2, .missing} AS m").collect()[0]["m"]
    assert p["name"] == "Alice" and p["doubleAge"] == 60
    assert p["missing"] is None
    star = cy(db, "MATCH (n:P {name:'Alice'}) RETURN n{.*} AS m"
              ).collect()[0]["m"].asDict()
    assert star == {"name": "Alice", "age": 30}
    # trim keyword form + IS TYPED spelling
    r = cy(db, "RETURN trim(LEADING 'x' FROM 'xxaxx') AS a, "
               "trim(BOTH 'x' FROM 'xxaxx') AS b, "
               "1 IS TYPED INTEGER AS c").collect()[0]
    assert (r["a"], r["b"], r["c"]) == ("axx", "a", True)


def test_cypher_point_and_distance(spark):
    """Cypher point({latitude,longitude}|{x,y[,srid]}) structs + 2-arg
    distance() (reference Issue4305Test,
    CypherFunctionArgumentValidationIssue5794/5910Test) — wrong
    arity/shape raises a typed error, never a Python crash."""
    db = _scratch(spark)
    p = cy(db, "RETURN point({latitude: 1, longitude: 2}) AS p"
           ).collect()[0]["p"]
    assert (p["x"], p["y"], p["srid"], p["crs"]) == (2.0, 1.0, 4326, "wgs-84")
    r = cy(db, "RETURN point({x: 1, y: 2}).x AS x, "
               "point({x: 1, y: 2, srid: 4326}).srid AS s, "
               "point({x: 1.0, y: null}) AS n").collect()[0]
    assert r["x"] == 1.0 and r["s"] == 4326 and r["n"] is None
    d = cy(db, "RETURN distance(point({latitude: 0, longitude: 0}), "
               "point({latitude: 0, longitude: 1})) AS m, "
               "distance(point({x: 0, y: 0}), point({x: 3, y: 4})) AS e"
           ).collect()[0]
    assert abs(d["m"] - 111194.93) < 1.0 and d["e"] == 5.0
    import pytest as _pt
    from arcadedb_spark.sql.translator import TranslateError

    for bad in [
        "RETURN point({foo: 1}) AS r",
        "RETURN distance(point({x:0,y:0})) AS r",
        "RETURN sqrt() AS r",
    ]:
        with _pt.raises(TranslateError):
            cy(db, bad)


def test_call_subquery_unit_write_per_row(spark):
    """Unit CALL blocks execute their writes once per outer row with
    imported variables in scope (reference CallStep.java:71)."""
    db = _scratch(spark)
    rows = cy(
        db,
        "UNWIND [1, 2] AS x CALL { WITH x CREATE (:CN {v: x}) } RETURN x",
    ).collect()
    assert [r["x"] for r in rows] == [1, 2]
    got = cy(db, "MATCH (c:CN) RETURN c.v AS v ORDER BY v").collect()
    assert [r["v"] for r in got] == [1, 2]
    # uncorrelated unit block still runs per input row
    cy(db, "UNWIND [1, 2, 3] AS x CALL { CREATE (:U) } RETURN x").collect()
    assert cy(db, "MATCH (u:U) RETURN count(*) AS n").collect()[0]["n"] == 3


def test_small_cypher25_syntax_tail(spark):
    """FINISH terminator, MATCH NODE mode prefix, chars-less trim FROM,
    doubled-backtick name escapes (reference Issue4141DeprecatedSyntax /
    CypherBacktickedVariableTest / CypherFunctionArityRegistryTest)."""
    db = _scratch(spark)
    assert cy(db, "CREATE (n:Person {name: 'Alice'}) FINISH").collect() == []
    got = cy(db, "MATCH NODE (p:Person) RETURN p.name AS n").collect()
    assert [r["n"] for r in got] == ["Alice"]
    r = cy(db, "RETURN trim(BOTH FROM '  hi  ') AS a, "
               "trim(TRAILING FROM 'x ') AS b").collect()[0]
    assert (r["a"], r["b"]) == ("hi", "x")
    n = cy(db, "MATCH (n:Person) WHERE n.`a``b` IS NULL "
               "RETURN count(*) AS c").collect()[0]["c"]
    assert n == 1


def test_review_fixes_unit_call_scope_and_misc(spark):
    """Regression net for the round-5 review findings: unit CALL keeps
    the full outer scope and property keys named like block aliases;
    cot(0) is Infinity; coll-named variables keep list methods;
    db.labels splits composite keys."""
    db = _scratch(spark)
    cy(db, "CREATE (:P {name:'a'}), (:Q {name:'z'})")
    r = cy(db, "MATCH (p:P), (q:Q) CALL { WITH p CREATE (:R {n: p.name}) }"
               " RETURN q.name AS n").collect()
    assert [x["n"] for x in r] == ["z"]
    assert cy(db, "MATCH (r:R) RETURN r.n AS n").collect()[0]["n"] == "a"
    cy(db, "MATCH (p:P) CALL { CREATE (x:T {x: 1}) } RETURN p.name AS m"
       ).collect()
    assert cy(db, "MATCH (t:T) RETURN t.x AS x").collect()[0]["x"] == 1
    import math
    c = cy(db, "RETURN cot(0) AS c").collect()[0]["c"]
    assert math.isinf(c)
    s = cy(db, "WITH [3,1,2] AS coll RETURN coll.sort() AS s"
           ).collect()[0]["s"]
    assert s == [1, 2, 3]
    cy(db, "CREATE (:A:B)")
    labels = {r[0] for r in cy(db, "CALL db.labels()").collect()}
    assert {"A", "B"} <= labels and "A:B" not in labels
    from arcadedb_spark.sql.temporal import parse_date
    assert str(parse_date("+2015067")) == "2015-03-08"
    assert cy(db, "MATCH (n:P) FINISH").collect() == []


def test_parameter_property_maps(spark):
    """(n:L $props) / -[r:T $props]-> parameter property maps
    (Cypher25Parser.g4 `properties : map | parameter`)."""
    db = _scratch(spark)
    cy2 = lambda q, **kw: db.query(q, language="cypher", **kw)  # noqa: E731
    cy2("CREATE (:P {name: 'x', v: 1}), (:P {name: 'y', v: 2})").collect()
    cy2("CREATE (n:Q $props)", props={"a": 1, "b": "two"}).collect()
    row = cy2("MATCH (q:Q) RETURN q.a AS a, q.b AS b").collect()[0]
    assert (row["a"], row["b"]) == (1, "two")
    got = cy2("MATCH (n:P $props) RETURN n.name AS m",
              props={"v": 1}).collect()
    assert [r["m"] for r in got] == ["x"]
    cy2("MATCH (a:P {name:'x'}), (b:P {name:'y'}) "
        "CREATE (a)-[:L {w: 5}]->(b)").collect()
    got = cy2("MATCH (a)-[r:L $rp]->(b) RETURN b.name AS m",
              rp={"w": 5}).collect()
    assert [r["m"] for r in got] == ["y"]
    import pytest as _pt
    from arcadedb_spark.sql.parser import ParseError

    with _pt.raises(ParseError):
        cy2("MATCH (n:P $nope) RETURN n")


def test_negative_list_index_and_vector_distance(spark):
    """Negative list indices count from the end with out-of-range null
    (reference Issue5476 $list[-1]); vector_distance metric forms."""
    db = _scratch(spark)
    r = cy(db, "RETURN [1,2,3][-1] AS a, [1,2,3][9] AS b, "
               "[1,2,3][-9] AS c").collect()[0]
    assert (r["a"], r["b"], r["c"]) == (3, None, None)
    r = db.query("RETURN $l[-1] AS x", language="cypher",
                 l=[5, 6, 7]).collect()[0]
    assert r["x"] == 7
    d = cy(db, "RETURN vector_distance(vector([0.0,0.0], 2, FLOAT32), "
               "vector([3.0,4.0], 2, FLOAT32), EUCLIDEAN) AS d"
           ).collect()[0]["d"]
    assert d == 5.0


def test_scoped_call_subquery_syntax(spark):
    """Cypher-25 CALL (a, b) { … } variable-scope clause — sugar for
    the importing-WITH subquery form (Cypher25Parser.g4 callClause)."""
    db = _scratch(spark)
    cy(db, "CREATE (:P {name:'a', v:1}), (:P {name:'b', v:2}), "
           "(:Q {name:'a'})")
    rows = cy(db, "MATCH (p:P) CALL (p) { MATCH (q:Q {name: p.name}) "
                  "RETURN count(q) AS nq } RETURN p.name AS n, nq "
                  "ORDER BY n").collect()
    assert [(r["n"], r["nq"]) for r in rows] == [("a", 1), ("b", 0)]
    # unit write form
    cy(db, "MATCH (p:P) CALL (p) { CREATE (:CN {v: p.v}) } "
           "RETURN p.name AS n").collect()
    got = cy(db, "MATCH (c:CN) RETURN c.v AS v ORDER BY v").collect()
    assert [r["v"] for r in got] == [1, 2]
    import pytest as _pt
    from arcadedb_spark.sql.parser import ParseError

    with _pt.raises(ParseError):
        cy(db, "MATCH (p:P) CALL (*) { RETURN 1 AS x } RETURN x")


def test_unit_call_rejects_cardinality_changing_blocks(spark):
    """A non-returning CALL { } block containing MATCH / UNWIND / an
    expression WITH must not be spliced inline — doing so would multiply
    outer cardinality by the block's internal row count and leak its
    read aliases (reference unit subqueries leave outer cardinality
    unchanged — CallStep.java:71).  Pure write blocks still splice."""
    import pytest as _pt

    from arcadedb_spark.sql.translator import TranslateError

    db = _scratch(spark)
    cy(db, "CREATE (:P {name:'a'}), (:P {name:'b'}), (:P {name:'c'})")
    # pure write block: cardinality preserved, one write per outer row
    r = cy(db, "MATCH (p:P) CALL { CREATE (:L1) } RETURN count(*) AS n"
           ).collect()
    assert r[0]["n"] == 3
    assert cy(db, "MATCH (l:L1) RETURN count(*) AS n").collect()[0]["n"] == 3
    # bare importing WITH still splices
    r = cy(db, "MATCH (p:P) CALL { WITH p CREATE (:L2 {w: p.name}) } "
               "RETURN count(*) AS n").collect()
    assert r[0]["n"] == 3
    got = cy(db, "MATCH (l:L2) RETURN l.w AS w ORDER BY w").collect()
    assert [x["w"] for x in got] == ["a", "b", "c"]
    # read clauses inside a unit block: typed rejection, never a splice
    for bad in [
        "MATCH (p:P) CALL { MATCH (m:P) CREATE (:L3) } RETURN count(*) AS n",
        "MATCH (p:P) CALL { UNWIND [1,2] AS x CREATE (:L3) } "
        "RETURN count(*) AS n",
        "MATCH (p:P) CALL { WITH p.name AS y CREATE (:L3) } "
        "RETURN count(*) AS n",
    ]:
        with _pt.raises(TranslateError):
            cy(db, bad).collect()
    assert cy(db, "MATCH (l:L3) RETURN count(*) AS n").collect()[0]["n"] == 0


def test_shortest_path_where_filters_before_minhop(spark):
    """WHERE conjuncts referencing the shortestPath path filter the
    candidate walks BEFORE minimal-hop selection: the result is the
    shortest path SATISFYING the predicate, not empty when the globally
    shortest one fails it (reference shortest-path edge-filter
    semantics, CypherShortestPathEdgeFilterTest)."""
    db = _scratch(spark)
    cy(db, "CREATE (a:N {name:'a'})-[:E {w:1}]->(b:N {name:'b'})"
           "-[:E {w:2}]->(c:N {name:'c'})-[:E {w:3}]->(d:N {name:'d'}), "
           "(a)-[:E {w:9}]->(d)")
    r = cy(db, "MATCH p = shortestPath((a:N {name:'a'})-[:E*..6]->"
               "(d:N {name:'d'})) "
               "WHERE all(r IN relationships(p) WHERE r.w < 5) "
               "RETURN length(p) AS l").collect()
    assert [x["l"] for x in r] == [3]
    # without the predicate the direct heavy edge wins
    r2 = cy(db, "MATCH p = shortestPath((a:N {name:'a'})-[:E*..6]->"
                "(d:N {name:'d'})) RETURN length(p) AS l").collect()
    assert [x["l"] for x in r2] == [1]
    # non-path conjuncts mix in (they apply around the deferral split)
    r3 = cy(db, "MATCH p = shortestPath((a:N)-[:E*..6]->(d:N)) "
                "WHERE a.name = 'a' AND d.name = 'd' AND "
                "all(r IN relationships(p) WHERE r.w < 5) "
                "RETURN length(p) AS l").collect()
    assert sorted(x["l"] for x in r3) == [3]


def test_allreduce_function(spark):
    """Cypher-25 allReduce (ast/AllReduceExpression.java:66): predicate
    checked after every accumulation step; empty/null lists are vacuous
    truth."""
    db = _scratch(spark)
    rows = cy(db, "RETURN "
                  "allReduce(acc = 0, x IN [1, 2, 3] | acc + x, acc < 10) "
                  "AS a, "
                  "allReduce(acc = 0, x IN [1, 2, 3] | acc + x, acc < 3) "
                  "AS b, "
                  "allReduce(acc = 0, x IN [] | acc + x, false) AS c, "
                  "allReduce(acc = 0, x IN null | acc + x, false) AS d"
              ).collect()[0]
    assert (rows["a"], rows["b"], rows["c"], rows["d"]) == (
        True, False, True, True,
    )


def test_varlength_inline_where(spark):
    """-[r:T* WHERE pred]-> filters EVERY traversed relationship
    (reference VariableLengthPathTraverser edge filters)."""
    db = _scratch(spark)
    cy(db, "CREATE (a:VA {v:1})-[:E {tag:'ok'}]->(b:VA {v:2})"
           "-[:E {tag:'nope'}]->(c:VA {v:3})")
    got = cy(db, "MATCH (a:VA {v:1})-[r:E*1..2 WHERE r.tag = 'ok']->(x:VA) "
                 "RETURN x.v AS v").collect()
    assert [r["v"] for r in got] == [2]
    assert cy(db, "MATCH (a:VA {v:1})-[r:E*1..1 WHERE false]->(x:VA) "
                  "RETURN count(*) AS c").collect()[0]["c"] == 0
    # single-hop inline WHERE unchanged
    got2 = cy(db, "MATCH (a:VA {v:1})-[r:E WHERE r.tag = 'ok']->(x:VA) "
                  "RETURN x.v AS v").collect()
    assert [r["v"] for r in got2] == [2]


def test_path_modes_trail_acyclic_walk(spark):
    """MATCH TRAIL/ACYCLIC/WALK path modes (reference ast/PathMode.java):
    TRAIL = edge-unique default, ACYCLIC adds vertex uniqueness, WALK
    lifts uniqueness and requires a bounded max hop."""
    import pytest as _pt

    from arcadedb_spark.sql.parser import ParseError

    db = _scratch(spark)
    cy(db, "CREATE (a:PM {name:'A'})-[:L]->(b:PM {name:'B'})"
           "-[:L]->(c:PM {name:'C'})-[:L]->(a), (a)-[:L]->(d:PM {name:'D'})")
    trail = cy(db, "MATCH TRAIL (a:PM {name:'A'})-[:L*1..4]->(b) "
                   "RETURN count(*) AS c").collect()[0]["c"]
    acyclic = {r["n"] for r in cy(
        db, "MATCH ACYCLIC (a:PM {name:'A'})-[:L*1..5]->(b) "
            "RETURN DISTINCT b.name AS n").collect()}
    walk = cy(db, "MATCH WALK (a:PM {name:'A'})-[:L*1..4]->(b) "
                  "RETURN count(*) AS c").collect()[0]["c"]
    assert "A" not in acyclic and {"B", "C", "D"} <= acyclic
    assert walk > trail  # edge reuse allowed
    with _pt.raises(ParseError):
        cy(db, "MATCH WALK (a:PM)-[:L*]->(b) RETURN b")


def test_dynamic_properties_and_fn_shortestpath(spark):
    """SET d[k] / REMOVE d[k] with constant keys; expression-position
    shortestPath() hoists to an optional shortest path (null when no
    path exists)."""
    import pytest as _pt

    from arcadedb_spark.sql.parser import ParseError

    db = _scratch(spark)
    cy(db, "CREATE (:DS {name:'dyn'})")
    r = cy(db, "MATCH (d:DS {name:'dyn'}) SET d['propA'] = 'hello' "
               "RETURN d.propA AS p").collect()
    assert [x["p"] for x in r] == ["hello"]
    cy(db, "MATCH (d:DS {name:'dyn'}) SET d['key_' + toString(1)] = 'w'")
    assert cy(db, "MATCH (d:DS) RETURN d.key_1 AS v"
              ).collect()[0]["v"] == "w"
    cy(db, "MATCH (d:DS) REMOVE d['propA']")
    assert cy(db, "MATCH (d:DS) RETURN d.propA AS p"
              ).collect()[0]["p"] is None
    with _pt.raises(ParseError):
        cy(db, "MATCH (d:DS) WITH d, 'k' AS k SET d[k] = 1")
    # function-form shortestPath
    cy(db, "CREATE (a:SPN {id:1})-[:LK {w:1}]->(b:SPN {id:2})"
           "-[:LK {w:1}]->(c:SPN {id:3}), (a)-[:LK {w:9}]->(c)")
    r2 = cy(db, "MATCH (a:SPN {id:1}), (c:SPN {id:3}) "
                "RETURN length(shortestPath((a)-[:LK*..4]->(c))) AS l"
            ).collect()
    assert [x["l"] for x in r2] == [1]
    r3 = cy(db, "MATCH (a:SPN {id:1}), (c:SPN {id:3}) RETURN "
                "length(shortestPath((a)-[r:LK*..4 WHERE r.w < 5]->(c))) "
                "AS l").collect()
    assert [x["l"] for x in r3] == [2]
    r4 = cy(db, "MATCH (c:SPN {id:3}), (a:SPN {id:1}) "
                "RETURN shortestPath((c)-[:LK*..4]->(a)) AS p").collect()
    assert r4[0]["p"] is None


def test_cypher_schema_ddl_surface(spark):
    """Neo4j-style CREATE CONSTRAINT/INDEX + SQL DDL delegation on the
    Cypher surface (CypherMultiLabelConstraintReloadTest,
    CypherQueryStatisticsTest)."""
    import pytest as _pt

    from arcadedb_spark.sql.parser import ParseError

    db = _scratch(spark)
    r = cy(db, "CREATE CONSTRAINT FOR (n:Foo) REQUIRE n.id IS UNIQUE"
           ).collect()[0]
    assert r["kind"] == "unique" and "Foo" in r["name"]
    cy(db, "CREATE CONSTRAINT IF NOT EXISTS FOR (p:Emp2) "
           "REQUIRE p.id IS UNIQUE")
    cy(db, "CREATE INDEX FOR (p:Product) ON (p.sku)")
    assert "Product[sku]" in db.schema.indexes
    cy(db, "CREATE RANGE INDEX r1 FOR (s:Snap) ON (s.id, s.event)")
    assert db.schema.indexes["r1"]["props"] == ("id", "event")
    # SQL DDL delegates through the cypher surface
    cy(db, "CREATE VERTEX TYPE Account IF NOT EXISTS")
    assert db.schema.exists("Account")
    cy(db, "CREATE EDGE TYPE KNOWS UNIDIRECTIONAL")
    cy(db, "CREATE PROPERTY Account.bank IF NOT EXISTS STRING")
    # legacy {param} syntax gets the targeted hint
    with _pt.raises(ParseError, match=r"\$name"):
        cy(db, "MATCH (p:Person) WHERE p.name = {name} RETURN p")


def test_collect_block_aggregates(spark):
    """COLLECT { … RETURN count(m)/sum(…) }: the block aggregates per
    shared key (or globally when uncorrelated) and the collected list is
    the one-element [aggregate] (reference Cypher-25 collect blocks)."""
    db = _scratch(spark)
    cy(db, "CREATE (:Big {v:1}), (:Big {v:2}), "
           "(:CP {name:'a'}), (:CP {name:'b'}), "
           "(:CQ {name:'a'}), (:CQ {name:'a'}), (:CQ {name:'b'})")
    r = cy(db, "RETURN COLLECT { MATCH (m:Big) RETURN count(m) } AS c"
           ).collect()
    assert r[0]["c"] == [2]
    r2 = cy(db, "MATCH (p:CP) RETURN p.name AS n, "
                "COLLECT { MATCH (q:CQ) WHERE q.name = p.name "
                "RETURN count(q) } AS c ORDER BY n").collect()
    assert [(x["n"], x["c"]) for x in r2] == [("a", [2]), ("b", [1])]
    r3 = cy(db, "RETURN COLLECT { MATCH (m:Big) RETURN sum(m.v) } AS c"
            ).collect()
    assert r3[0]["c"] == [3]


def test_cypher25_insert_synonym(spark):
    """Cypher-25 INSERT is a CREATE synonym in clause position
    (OpenCypherCypher25ClausesTest); inside COUNT/COLLECT blocks it is
    still an update clause (InvalidClauseComposition guard)."""
    import pytest as _pt

    from arcadedb_spark.sql.translator import TranslateError

    db = _scratch(spark)
    assert cy(db, "INSERT (n:IP {name: 'Bob'}) FINISH").collect() == []
    r = cy(db, "INSERT (n:IP {name: 'Alice', age: 30}) RETURN n").collect()
    assert len(r) == 1
    cy(db, "INSERT (a:IP {name: 'X'}), (b:IP {name: 'Y'})").collect()
    assert cy(db, "MATCH (p:IP) RETURN count(*) AS n"
              ).collect()[0]["n"] == 4
    with _pt.raises(TranslateError):
        cy(db, "RETURN COUNT { INSERT (m:T {name:'x'}) RETURN m } AS v"
           ).collect()
    # a property named insert is untouched ({insert: 1})
    cy(db, "CREATE (:IP2 {insert: 1})").collect()
    assert cy(db, "MATCH (n:IP2) RETURN n.insert AS i"
              ).collect()[0]["i"] == 1


def test_create_path_alias_anonymous_nodes(spark):
    """CREATE p = (:A)-[:R]->(:B) RETURN length(p): path variables over
    standalone writes bind even with anonymous nodes (vids consumed
    positionally from the creation bindings)."""
    db = _scratch(spark)
    r = cy(db, "CREATE p=(:CP1)-[:Rel]->(:CP2) RETURN length(p) AS l"
           ).collect()
    assert [x["l"] for x in r] == [1]
    r2 = cy(db, "CREATE q=(a:CP3 {n:'a'})-[:R]->(:CP4)-[:R]->"
                "(c:CP3 {n:'c'}) RETURN length(q) AS l").collect()
    assert [x["l"] for x in r2] == [2]


def test_frame_create_atomic_on_compile_failure(spark):
    """A failed CREATE statement must not persist vertices from its
    earlier patterns: all property columns compile before any frame is
    appended (regression — the vectorized path used to append pattern 1
    before pattern 2's compile error fell back to the strict loop)."""
    import pytest

    db = _scratch(spark)
    with pytest.raises(Exception):
        cy(db, "UNWIND [1, 2] AS v "
               "CREATE (:FA {x: v}), (:FB {y: nosuchfunc(v)})").collect()
    assert cy(db, "MATCH (n:FA) RETURN count(*) AS c").collect()[0]["c"] == 0


def test_frame_vid_partition_guard(spark):
    """frame_vid_col raises loudly when a minted frame exceeds 2048
    partitions instead of silently overflowing into the next vid block
    (model.py vid-block layout: 2^44 ids, partition index at bit 33)."""
    import pytest

    from pyspark.sql import functions as F

    from arcadedb_spark.database import Database

    g = Database(spark).graph()
    wide = spark.range(2100).repartition(2100)
    with pytest.raises(Exception, match="vid block overflow"):
        wide.select(
            g.frame_vid_col(g.mint_vid_block()).alias("vid")
        ).agg(F.max("vid")).collect()
    ok = spark.range(100).repartition(64)
    n = ok.select(
        g.frame_vid_col(g.mint_vid_block()).alias("vid")
    ).select(F.countDistinct("vid").alias("n")).collect()[0]["n"]
    assert n == 100


def test_frame_wise_set_and_delete_above_cap(spark):
    """Pure-SET and pure-DELETE write segments execute frame-wise (one
    equi-join rewrite), so stage-driven statements are NOT subject to the
    10k per-row driver-loop cap (reference CreateStep/SetStep stream
    frame-wise)."""
    db = _scratch(spark)
    cy(db, "UNWIND range(1, 20000) AS i CREATE (:FB {x: i})").collect()
    assert cy(db, "MATCH (n:FB) RETURN count(*) AS c").collect()[0]["c"] \
        == 20000
    cy(db, "MATCH (n:FB) WITH n SET n.y = n.x * 2").collect()
    got = cy(
        db, "MATCH (n:FB) WHERE n.y = 30000 RETURN n.x AS x"
    ).collect()
    assert [r["x"] for r in got] == [15000]
    cy(db, "MATCH (n:FB) WITH n DETACH DELETE n").collect()
    assert cy(db, "MATCH (n:FB) RETURN count(*) AS c").collect()[0]["c"] == 0

"""HAVING, named buckets, BACKUP DATABASE, CREATE PROPERTY … OF.

Reference: query/sql test corpus (GroupBy*Test HAVING usage,
bucket DDL/DML tests — CREATE BUCKET / CREATE TYPE … BUCKET /
INSERT INTO bucket: / TRUNCATE BUCKET / DROP BUCKET,
BackupDatabaseStatement, CreatePropertyStatement ofType).
"""

from __future__ import annotations

import pytest


@pytest.fixture()
def sdb(spark):
    from arcadedb_spark.database import Database

    return Database(spark)


def test_having_filters_groups(sdb):
    sdb.command("CREATE DOCUMENT TYPE Prod")
    sdb.command(
        "INSERT INTO Prod (category, price) VALUES "
        "('a', 50.0), ('a', 200.0), ('b', 10.0)"
    )
    rows = sdb.query(
        "SELECT category, AVG(price) as avg_price FROM Prod "
        "GROUP BY category HAVING AVG(price) > 100"
    ).collect()
    assert [(r["category"], r["avg_price"]) for r in rows] == [("a", 125.0)]


def test_having_references_alias(sdb):
    sdb.command("CREATE DOCUMENT TYPE Prod2")
    sdb.command(
        "INSERT INTO Prod2 (c, v) VALUES ('a', 1), ('a', 2), ('b', 9)"
    )
    rows = sdb.query(
        "SELECT c, count(*) AS n FROM Prod2 GROUP BY c HAVING n > 1"
    ).collect()
    assert [(r["c"], r["n"]) for r in rows] == [("a", 2)]


def test_named_buckets_roundtrip(sdb):
    sdb.command("CREATE BUCKET B_Europe IF NOT EXISTS")
    sdb.command("CREATE BUCKET B_Americas IF NOT EXISTS")
    sdb.command("CREATE DOCUMENT TYPE Cst BUCKET B_Europe,B_Americas")
    sdb.command(
        "INSERT INTO bucket:B_Europe CONTENT "
        "{ firstName: 'Enzo', region: 'Europe' }"
    )
    sdb.command(
        "INSERT INTO bucket:B_Americas CONTENT "
        "{ firstName: 'Jack', region: 'Americas' }"
    )
    # the type scan unions every associated bucket slice
    assert sorted(
        r["firstName"]
        for r in sdb.query("SELECT firstName FROM Cst").collect()
    ) == ["Enzo", "Jack"]
    # a bucket scan sees only its slice
    assert [
        r["firstName"]
        for r in sdb.query(
            "SELECT firstName FROM bucket:B_Europe"
        ).collect()
    ] == ["Enzo"]


def test_truncate_and_drop_bucket(sdb):
    sdb.command("CREATE BUCKET TB1")
    sdb.command("CREATE DOCUMENT TYPE TBT BUCKET TB1")
    sdb.command("INSERT INTO bucket:TB1 SET x = 1")
    sdb.command("TRUNCATE BUCKET TB1")
    assert sdb.query("SELECT x FROM TBT").count() == 0
    sdb.command("DROP BUCKET TB1")
    with pytest.raises(Exception):
        sdb.query("SELECT FROM bucket:TB1").collect()
    # type survives with no buckets
    assert sdb.query("SELECT FROM TBT").count() == 0


def test_bucket_insert_requires_owner(sdb):
    sdb.command("CREATE BUCKET Orphan1")
    with pytest.raises(Exception, match="not associated"):
        sdb.command("INSERT INTO bucket:Orphan1 SET x = 1")


def test_alter_type_bucket_attaches(sdb):
    sdb.command("CREATE DOCUMENT TYPE AT1")
    sdb.command("ALTER TYPE AT1 BUCKET +ABkt")
    sdb.command("INSERT INTO bucket:ABkt SET y = 7")
    assert [r["y"] for r in sdb.query("SELECT y FROM AT1").collect()] == [7]


def test_backup_database_statement(sdb, tmp_path):
    sdb.command("CREATE DOCUMENT TYPE BT1")
    sdb.command("INSERT INTO BT1 (a) VALUES (1), (2)")
    out = sdb.command(
        f"BACKUP DATABASE 'file://{tmp_path}/bk.zip'"
    ).collect()[0]
    assert out["operation"] == "backup database"
    assert out["rows"] == "2"
    import os

    assert os.path.exists(f"{tmp_path}/bk/backup_manifest.json")


def test_create_property_of_types(sdb):
    sdb.command("CREATE DOCUMENT TYPE OT1")
    sdb.command("CREATE PROPERTY OT1.owner IF NOT EXISTS LINK OF OT1")
    sdb.command("CREATE PROPERTY OT1.tags IF NOT EXISTS LIST OF STRING")
    declared = sdb.schema.get("OT1").properties["declared"]
    assert declared["owner"]["of"] == "OT1"
    assert declared["tags"]["type"] == "list"


def test_create_edge_type_lightweight(sdb):
    sdb.command("CREATE EDGE TYPE Lt LIGHTWEIGHT")
    assert sdb.schema.get("Lt").kind == "edge"


def test_insert_return_this_and_rid(sdb):
    sdb.command("CREATE DOCUMENT TYPE Rt1")
    rows = sdb.command(
        "INSERT INTO Rt1 SET title = 'T1', priority = 1 RETURN @this"
    ).collect()
    assert rows[0]["title"] == "T1" and rows[0]["@rid"].startswith("#")
    rows = sdb.command("INSERT INTO Rt1 SET title = 'T2' RETURN @rid").collect()
    assert rows[0]["@rid"].startswith("#")


def test_update_return_after_and_before(sdb):
    sdb.command("CREATE DOCUMENT TYPE Rt2")
    sdb.command("INSERT INTO Rt2 (name, val) VALUES ('a', 1), ('b', 2)")
    rows = sdb.command(
        "UPDATE Rt2 SET name = 'after' RETURN AFTER WHERE val = 1"
    ).collect()
    assert [(r["name"], r["val"]) for r in rows] == [("after", 1)]
    rows = sdb.command(
        "UPDATE Rt2 SET name = 'b2' RETURN BEFORE WHERE val = 2"
    ).collect()
    assert [(r["name"]) for r in rows] == ["b"]
    # AFTER keeps matching when SET rewrites the predicate column
    rows = sdb.command(
        "UPDATE Rt2 SET name = 'c' RETURN AFTER name WHERE name = 'b2'"
    ).collect()
    assert [r["name"] for r in rows] == ["c"]


def test_order_by_boolean_direction(sdb):
    sdb.command("CREATE DOCUMENT TYPE Ob1")
    sdb.command("INSERT INTO Ob1 (n) VALUES (2), (1), (3)")
    asc = sdb.query("SELECT n FROM Ob1 ORDER BY n true").collect()
    assert [r["n"] for r in asc] == [1, 2, 3]
    desc = sdb.query("SELECT n FROM Ob1 ORDER BY n false").collect()
    assert [r["n"] for r in desc] == [3, 2, 1]


def test_expand_literal_maps(sdb):
    rows = sdb.query(
        "SELECT expand([{'a':1,'b':2,'c':3}, {'a':4,'b':5,'c':6}]):{a,c}"
    ).collect()
    assert [(r["a"], r["c"]) for r in rows] == [(1, 3), (4, 6)]


def test_sql_graph_nav_functions(sdb):
    """out/in/both/outE/inE SQL navigation (function/sql/graph/
    SQLFunction{Out,In,Both,OutE,InE}.java): grouped equi-join markers,
    array-struct field extraction downstream."""
    sdb.command("CREATE VERTEX TYPE NV")
    sdb.command("CREATE EDGE TYPE NE")
    sdb.query(
        "CREATE (:NV {name:'a'})-[:NE {w:1}]->(:NV {name:'b'})"
        "-[:NE {w:2}]->(:NV {name:'c'})",
        language="cypher",
    ).collect()
    rows = sdb.query(
        "SELECT name, out('NE').name AS nbr FROM NV ORDER BY name"
    ).collect()
    assert [(r["name"], list(r["nbr"])) for r in rows] == [
        ("a", ["b"]), ("b", ["c"]), ("c", [])
    ]
    rows = sdb.query(
        "SELECT name, both().size() AS deg FROM NV ORDER BY name"
    ).collect()
    assert [r["deg"] for r in rows] == [1, 2, 1]
    rows = sdb.query(
        "SELECT name, outE('NE').w AS ws FROM NV ORDER BY name"
    ).collect()
    assert [list(r["ws"]) for r in rows] == [[1], [2], []]
    rows = sdb.query(
        "SELECT inE()[0].@rid AS r FROM NV WHERE name = 'b'"
    ).collect()
    assert rows[0]["r"].startswith("#")
    rows = sdb.query(
        "SELECT name FROM NV WHERE out('NE').size() > 0 ORDER BY name"
    ).collect()
    assert [r["name"] for r in rows] == ["a", "b"]


def test_sql_edge_endpoint_functions(sdb):
    """outV()/inV()/bothV() over an edge scan (SQLFunction{OutV,InV,
    BothV}.java)."""
    sdb.command("CREATE VERTEX TYPE PV")
    sdb.command("CREATE EDGE TYPE PE")
    sdb.query(
        "CREATE (:PV {name:'a'})-[:PE {w:1}]->(:PV {name:'b'})",
        language="cypher",
    ).collect()
    rows = sdb.query(
        "SELECT outV().name AS s, inV().name AS d FROM PE"
    ).collect()
    assert (rows[0]["s"], rows[0]["d"]) == ("a", "b")
    rows = sdb.query("SELECT bothV().name AS ns FROM PE").collect()
    assert list(rows[0]["ns"]) == ["a", "b"]


def test_delete_return_before(sdb):
    sdb.command("CREATE DOCUMENT TYPE Rt3")
    sdb.command("INSERT INTO Rt3 (name, v) VALUES ('a', 1), ('b', 2)")
    rows = sdb.command(
        "DELETE FROM Rt3 RETURN BEFORE WHERE v = 1"
    ).collect()
    assert [(r["name"], r["v"]) for r in rows] == [("a", 1)]
    assert [r["name"] for r in sdb.query("SELECT name FROM Rt3").collect()] \
        == ["b"]


def test_dml_return_on_live_vertex_type(sdb):
    """UPDATE/DELETE ... RETURN on graph-backed (live) vertex types:
    the matched rows are captured around the graph write instead of
    collapsing to a count frame (UpdateStatement.java returnBefore/
    After on any type kind)."""
    sdb.command("CREATE VERTEX TYPE LvR")
    sdb.command("INSERT INTO LvR (name, v) VALUES ('a', 1), ('b', 2)")
    rows = sdb.command(
        "UPDATE LvR SET name = 'a2' RETURN AFTER WHERE v = 1"
    ).collect()
    assert [(r["name"], r["v"]) for r in rows] == [("a2", 1)]
    assert rows[0]["@rid"].startswith("#")
    rows = sdb.command(
        "UPDATE LvR SET name = 'b2' RETURN BEFORE WHERE v = 2"
    ).collect()
    assert [r["name"] for r in rows] == ["b"]
    rows = sdb.command(
        "DELETE FROM LvR RETURN BEFORE WHERE v = 2"
    ).collect()
    assert [(r["name"], r["v"]) for r in rows] == [("b2", 2)]
    left = sdb.query("SELECT name FROM LvR").collect()
    assert [r["name"] for r in left] == ["a2"]


def test_dml_return_on_live_edge_type(sdb):
    sdb.command("CREATE VERTEX TYPE LvEv")
    sdb.command("CREATE EDGE TYPE LvEe")
    sdb.query(
        "CREATE (:LvEv {name:'x'})-[:LvEe {w: 1}]->(:LvEv {name:'y'})",
        language="cypher",
    ).collect()
    rows = sdb.command(
        "UPDATE LvEe SET w = 9 RETURN AFTER WHERE w = 1"
    ).collect()
    assert [r["w"] for r in rows] == [9]
    rows = sdb.command(
        "DELETE FROM LvEe RETURN BEFORE WHERE w = 9"
    ).collect()
    assert [r["w"] for r in rows] == [9]


def test_cypher_rid_function_and_targets(sdb):
    """cypherRID() — the inverse of Cypher id() — in projection AND as a
    SELECT/UPDATE/DELETE target (CypherRIDFunctionTest.java:69-180,
    issue #4282)."""
    import pytest

    sdb.command("CREATE VERTEX TYPE CrPerson")
    for n in ("Alice", "Bob", "Charlie"):
        sdb.command(f"INSERT INTO CrPerson SET name = '{n}'")
    cid = sdb.query(
        "MATCH (p:CrPerson {name:'Alice'}) RETURN id(p) AS ident",
        language="cypher",
    ).collect()[0]["ident"]
    rid = sdb.query(
        "SELECT @rid AS r FROM CrPerson WHERE name = 'Alice'"
    ).collect()[0]["r"]

    # projection form returns the native rid
    got = sdb.query(
        "SELECT cypherRID(:id) AS rid", id=cid
    ).collect()[0]["rid"]
    assert got == rid
    # SELECT FROM function target (named parameter + bare literal)
    assert sdb.query(
        "SELECT name FROM cypherRID(:id) LIMIT 1", id=cid
    ).collect()[0]["name"] == "Alice"
    assert sdb.query(
        f"SELECT name FROM cypherRID({cid}) LIMIT 1"
    ).collect()[0]["name"] == "Alice"
    # UPDATE by function target with RETURN AFTER @rid
    rows = sdb.command(
        "UPDATE cypherRID(:id) SET tag = 'updated' RETURN AFTER @rid",
        id=cid,
    ).collect()
    assert rows[0]["@rid"] == rid
    assert sdb.query(
        "SELECT tag FROM cypherRID(:id) LIMIT 1", id=cid
    ).collect()[0]["tag"] == "updated"
    # DELETE by function target
    bob_id = sdb.query(
        "MATCH (p:CrPerson {name:'Bob'}) RETURN id(p) AS i",
        language="cypher",
    ).collect()[0]["i"]
    n = sdb.command(f"DELETE FROM cypherRID({bob_id})").collect()[0]["count"]
    assert n == 1
    assert sdb.query(
        "SELECT FROM CrPerson WHERE name = 'Bob'"
    ).count() == 0
    # @rid.asCypherRID() round-trip
    ident = sdb.query(
        "SELECT @rid.asCypherRID() AS ident FROM CrPerson "
        "WHERE name = 'Alice'"
    ).collect()[0]["ident"]
    assert sdb.query(
        "SELECT name FROM cypherRID(:id) LIMIT 1", id=ident
    ).collect()[0]["name"] == "Alice"
    # negative id rejected
    with pytest.raises(Exception, match="negative"):
        sdb.query("SELECT cypherRID(-5) AS rid").collect()


def test_contains_condition_form(sdb):
    """coll CONTAINS (<condition>) evaluates the predicate per element,
    with @this bound to the element and bare fields resolving into map/
    struct elements (QueryTest.java:615-630)."""
    r = sdb.query(
        'SELECT (["a","b","c"] CONTAINS (@this ILIKE "C")) as coll'
    ).collect()[0]["coll"]
    assert r is True
    r = sdb.query(
        'SELECT ([{"x":"a"},{"x":"b"},{"x":"c"}] CONTAINS (x ILIKE "C")) '
        "as coll"
    ).collect()[0]["coll"]
    assert r is True
    r = sdb.query(
        'SELECT (["a","b"] CONTAINS (@this = "z")) as coll'
    ).collect()[0]["coll"]
    assert r is False


def test_containsany_scalar_rhs(sdb):
    """CONTAINSANY with a scalar RHS coerces it to a 1-element list;
    method-call LHS works (issue #3581, QueryTest.java:1355-1395)."""
    sdb.command("CREATE DOCUMENT TYPE doc3581")
    for t in ("te st", "te other", "no match here"):
        sdb.command(f"INSERT INTO doc3581 SET txt = '{t}'")
    rows = sdb.query(
        "SELECT txt FROM doc3581 WHERE txt.split(' ') CONTAINSANY 'te'"
    ).collect()
    assert sorted(r["txt"] for r in rows) == ["te other", "te st"]
    assert sdb.query(
        "SELECT txt FROM doc3581 WHERE txt.split(' ') CONTAINSANY 'zz'"
    ).count() == 0


def test_contains_missing_list_property(sdb):
    """CONTAINS over rows missing the list property entirely: no-match,
    not a NULL_TYPE analysis error (issue #1898, QueryTest.java:862)."""
    sdb.command("CREATE DOCUMENT TYPE NoListProp")
    sdb.command("INSERT INTO NoListProp SET id = 'only'")
    assert sdb.query(
        "SELECT id FROM NoListProp WHERE tags CONTAINS 'x'"
    ).count() == 0
    assert sdb.query(
        "SELECT id FROM NoListProp WHERE tags CONTAINSANY 'x'"
    ).count() == 0


def test_nav_edge_metadata_spellings(sdb):
    """inE()[0].@type / .@rid / .`@cat` on nav-function edge records
    (issue #3571, QueryTest.java:1185-1260)."""
    sdb.command("CREATE VERTEX TYPE V3571")
    sdb.command("CREATE EDGE TYPE E3571")
    sdb.command("INSERT INTO V3571 SET k = 1")
    sdb.command(
        "CREATE EDGE E3571 FROM (SELECT FROM V3571) TO (SELECT FROM V3571)"
    )
    assert sdb.query(
        "SELECT inE()[0].@type AS t FROM V3571"
    ).collect()[0]["t"] == "E3571"
    assert sdb.query(
        "SELECT inE()[0].`@rid` AS r FROM V3571"
    ).collect()[0]["r"].startswith("#")
    assert sdb.query(
        "SELECT inE()[0].`@cat` AS c FROM V3571"
    ).collect()[0]["c"] == "e"


def test_match_fused_colon_and_rid_filter(sdb):
    """SQL MATCH accepts fused `{type:X}` tokens (no space after ':')
    and the {rid: …} identity filter (MatchStatementExecutionTest)."""
    sdb.command("CREATE DOCUMENT TYPE MPerson")
    for n in ("n1", "n2"):
        sdb.command(f"INSERT INTO MPerson SET name = '{n}'")
    rows = sdb.query(
        "match {type:MPerson, as: person, where: (name = 'n1')} "
        "return person.name AS n"
    ).collect()
    assert [r["n"] for r in rows] == ["n1"]


def test_content_array_insert_update(sdb):
    """INSERT/UPDATE ... CONTENT [<obj>, ...] (UpdateContentArrayTest):
    insert = one record per element; update = positional full replace of
    the matched records."""
    sdb.command("CREATE DOCUMENT TYPE CaDoc")
    sdb.command(
        'INSERT INTO CaDoc CONTENT [{"id":1,"name":"a"},{"id":2,"name":"b"}]'
    )
    assert sdb.query("SELECT count(*) AS n FROM CaDoc").collect()[0]["n"] == 2
    rows = sdb.command(
        'UPDATE CaDoc CONTENT [{"id":2,"name":"b2","extra":"y"}] '
        "RETURN AFTER WHERE id = 2"
    ).collect()
    assert [(r["name"], r["extra"]) for r in rows] == [("b2", "y")]
    # untouched row keeps its values
    assert sdb.query(
        "SELECT name FROM CaDoc WHERE id = 1"
    ).collect()[0]["name"] == "a"


def test_param_rid_target_and_remove_item(sdb):
    """SELECT FROM :seeds (bound rid-collection target, issue #5505) and
    UPDATE ... REMOVE coll = value element removal."""
    sdb.command("CREATE DOCUMENT TYPE P5505")
    sdb.command("INSERT INTO P5505 (name) VALUES ('a'), ('b')")
    rids = [r["r"] for r in sdb.query("SELECT @rid AS r FROM P5505").collect()]
    got = sdb.query(
        "SELECT name FROM :seeds ORDER BY name", seeds=rids
    ).collect()
    assert [r["name"] for r in got] == ["a", "b"]
    sdb.command("UPDATE P5505 SET items = ['x', 'y'] WHERE name = 'a'")
    sdb.command("UPDATE P5505 REMOVE items = 'x' WHERE name = 'a'")
    assert list(sdb.query(
        "SELECT items FROM P5505 WHERE name = 'a'"
    ).collect()[0]["items"]) == ["y"]


def test_create_type_custom_metadata_and_drop_ddl(sdb):
    """CREATE TYPE ... CUSTOM k = v metadata; TRUNCATE modifiers;
    DROP PROPERTY / DROP INDEX (grammar-parity DDL)."""
    sdb.command("CREATE DOCUMENT TYPE CmDoc CUSTOM coolness = 10, k = 'v'")
    assert sdb.schema.get("CmDoc").properties["custom"] == {
        "coolness": 10, "k": "v"
    }
    sdb.command("INSERT INTO CmDoc SET x = 1")
    sdb.command("TRUNCATE TYPE CmDoc POLYMORPHIC UNSAFE")
    assert sdb.query("SELECT count(*) AS n FROM CmDoc").collect()[0]["n"] == 0
    sdb.command("CREATE PROPERTY CmDoc.name STRING")
    sdb.command("CREATE INDEX ON CmDoc (name) UNIQUE")
    sdb.command("DROP INDEX `CmDoc[name]`")
    sdb.command("DROP PROPERTY CmDoc.name")
    assert "name" not in sdb.schema.get("CmDoc").properties["declared"]


def test_expand_column_from_subquery(sdb):
    """SELECT expand(col) FROM (subquery) flattens a struct/array column
    back into records (ExpandStep.java over a projected field)."""
    sdb.command("CREATE VERTEX TYPE ExV")
    sdb.command("INSERT INTO ExV SET name = 'solo'")
    rows = sdb.query(
        "SELECT expand(u) FROM (MATCH {type:ExV, as: u} RETURN u)"
    ).collect()
    assert rows and rows[0]["name"] == "solo"


def test_match_arrow_syntax(sdb):
    """SQL MATCH arrow shorthand -E-> / <-E- / -E-
    (MatchStatementExecutionTest arrow forms)."""
    sdb.command("CREATE VERTEX TYPE MPav")
    sdb.command("CREATE EDGE TYPE MFriend")
    sdb.query(
        "CREATE (:MPav {name:'n1'})-[:MFriend]->(:MPav {name:'n2'})",
        language="cypher",
    ).collect()
    out = sdb.query(
        "MATCH {type:MPav, as: a, where: (name='n1')}-MFriend->{as: x} "
        "RETURN x.name AS name"
    ).collect()
    assert [r["name"] for r in out] == ["n2"]
    inn = sdb.query(
        "MATCH {type:MPav, as: a, where: (name='n2')}<-MFriend-{as: x} "
        "RETURN x.name AS name"
    ).collect()
    assert [r["name"] for r in inn] == ["n1"]
    both = sdb.query(
        "MATCH {type:MPav, as: a, where: (name='n1')}-MFriend-{as: x} "
        "RETURN x.name AS name"
    ).collect()
    assert [r["name"] for r in both] == ["n2"]


def test_order_by_param_direction_and_long_suffix(sdb):
    """ORDER BY col :dir (TestOrderParam) and Java long literals."""
    sdb.command("CREATE DOCUMENT TYPE Op8")
    sdb.command("INSERT INTO Op8 (num) VALUES (2), (1), (3)")
    assert [r["num"] for r in sdb.query(
        "SELECT num FROM Op8 ORDER BY num :dir", dir="DESC"
    ).collect()] == [3, 2, 1]
    assert [r["num"] for r in sdb.query(
        "SELECT num FROM Op8 ORDER BY num :dir", dir="ASC"
    ).collect()] == [1, 2, 3]
    assert sdb.query(
        "SELECT 1000 * 1000000000L as value"
    ).collect()[0]["value"] == 1_000_000_000_000


def test_nested_projection_expression_position(sdb):
    """SELECT list({'x':1}):{x} || [] — inline nested projection over a
    list value in expression position (ArrayConcatNestedProjectionTest)."""
    rows = sdb.query("SELECT list({'x':1}):{x} || [] AS r").collect()
    assert [dict(x.asDict()) for x in rows[0]["r"]] == [{"x": 1}]


def test_alter_database_and_delete_function(sdb):
    sdb.command("ALTER DATABASE `arcadedb.dateTimeFormat` 'yyyy-MM-dd'")
    assert sdb._db_settings["arcadedb.dateTimeFormat"] == "yyyy-MM-dd"
    sdb.command('DEFINE FUNCTION m8.double "x * 2" PARAMETERS [x]')
    sdb.command("DELETE FUNCTION m8.double")
    import pytest

    with pytest.raises(Exception, match="does not exist"):
        sdb.command("DELETE FUNCTION m8.double")


def test_nav_from_empty_vertex_type(sdb):
    """Navigation functions over a registered-but-empty vertex type
    return empty, not an error."""
    sdb.command("CREATE VERTEX TYPE EmptyAuthor")
    assert sdb.query(
        "SELECT out('Published') AS o FROM EmptyAuthor"
    ).count() == 0


def test_chained_nav_and_match_context_vars(sdb):
    """out('A').in('B') chains one equi-join per hop; MATCH RETURN
    $elements/$patterns context-variable results."""
    sdb.command("CREATE VERTEX TYPE CnAuthor")
    sdb.command("CREATE VERTEX TYPE CnNews")
    sdb.command("CREATE VERTEX TYPE CnReader")
    sdb.command("CREATE EDGE TYPE CnPub")
    sdb.command("CREATE EDGE TYPE CnRead")
    sdb.query(
        "CREATE (:CnAuthor {name:'au'})-[:CnPub]->(:CnNews {t:'n1'})",
        language="cypher",
    ).collect()
    sdb.query(
        "MATCH (n:CnNews) CREATE (:CnReader {name:'r1'})-[:CnRead]->(n)",
        language="cypher",
    ).collect()
    rows = sdb.query(
        'SELECT out("CnPub").in("CnRead").size() AS n FROM CnAuthor'
    ).collect()
    assert [r["n"] for r in rows] == [1]
    rows = sdb.query(
        'SELECT out("CnPub").in("CnRead") AS o FROM CnAuthor'
    ).collect()
    assert [x["name"] for x in rows[0]["o"]] == ["r1"]
    els = sdb.query(
        "MATCH {type: CnAuthor, as: a}-CnPub->{type: CnNews, as: b} "
        "RETURN $elements"
    ).collect()
    assert len(els) == 2
    pats = sdb.query(
        "MATCH {type: CnAuthor, as: a}-CnPub->{type: CnNews, as: b} "
        "RETURN $patterns"
    ).collect()
    assert len(pats) == 1 and pats[0]["a"]["name"] == "au"


def test_set_plusminus_and_exclusion_projection(sdb):
    sdb.command("CREATE DOCUMENT TYPE PmDoc")
    sdb.command(
        "INSERT INTO PmDoc SET name = 'd', items = ['a','b'], n = 5, "
        "secret = 'x'"
    )
    sdb.command("UPDATE PmDoc SET items += 'c', n += 2")
    sdb.command("UPDATE PmDoc SET items -= 'a', n -= 1")
    r = sdb.query("SELECT items, n FROM PmDoc").collect()[0]
    assert list(r["items"]) == ["b", "c"] and r["n"] == 6
    cols = sdb.query("SELECT *, !secret FROM PmDoc").columns
    assert "secret" not in cols and "items" in cols


def test_insert_null_and_subquery_source(sdb):
    sdb.command("CREATE DOCUMENT TYPE NvDoc")
    sdb.command("INSERT INTO NvDoc SET name = 'Doc1', description = null")
    assert sdb.query("SELECT name FROM NvDoc").collect()[0]["name"] == "Doc1"
    sdb.command("CREATE DOCUMENT TYPE NvDst")
    sdb.command("INSERT INTO NvDst (SELECT name FROM NvDoc)")
    assert sdb.query(
        "SELECT count(*) AS n FROM NvDst"
    ).collect()[0]["n"] == 1


def test_apply_defaults_and_content_replace(sdb):
    """UPDATE CONTENT replaces the record (MERGE merges); APPLY DEFAULTS
    resets null declared properties to their schema default
    (issue #1814, UpdateStatementExecutionTest.java:991-1060)."""
    sdb.command("CREATE DOCUMENT TYPE AdDoc")
    sdb.command(
        "CREATE PROPERTY AdDoc.prop STRING "
        "(mandatory true, notnull true, default 'Hi')"
    )
    sdb.command('INSERT INTO AdDoc CONTENT { "prop": "Ho", "other": "v" }')
    sdb.command(
        'UPDATE AdDoc CONTENT { "other": "new" } APPLY DEFAULTS '
        "WHERE prop = 'Ho'"
    )
    r = sdb.query("SELECT prop, other FROM AdDoc").collect()[0]
    assert (r["prop"], r["other"]) == ("Hi", "new")
    sdb.command("UPDATE AdDoc SET prop = null APPLY DEFAULTS")
    assert sdb.query(
        "SELECT prop FROM AdDoc"
    ).collect()[0]["prop"] == "Hi"


def test_truncate_record_and_expand_scalars(sdb):
    sdb.command("CREATE DOCUMENT TYPE TrDoc")
    sdb.command("INSERT INTO TrDoc (k) VALUES (1), (2)")
    rid = sdb.query("SELECT @rid AS r FROM TrDoc WHERE k = 1").collect()[0]["r"]
    sdb.command(f"TRUNCATE RECORD {rid}")
    assert [r["k"] for r in sdb.query("SELECT k FROM TrDoc").collect()] == [2]
    assert [r["value"] for r in sdb.query(
        "select expand([1,2,3,4])"
    ).collect()] == [1, 2, 3, 4]


def test_set_map_key_and_text_metrics(sdb):
    sdb.command("CREATE DOCUMENT TYPE MkDoc")
    sdb.command("INSERT INTO MkDoc SET name = 'd', props = {'k1': 'v1'}")
    sdb.command("UPDATE MkDoc SET props.k2 = 'v2' WHERE name = 'd'")
    props = sdb.query("SELECT props FROM MkDoc").collect()[0]["props"]
    assert props == {"k1": "v1", "k2": "v2"}
    r = sdb.query(
        "SELECT text.jaroWinklerDistance('John', 'Jon') AS jw, "
        "text.hammingDistance('karolin', 'kathrin') AS h, "
        "text.sorensenDiceSimilarity('night', 'nacht') AS d"
    ).collect()[0]
    assert abs(r["jw"] - 0.9333333) < 1e-5 and r["h"] == 3 and r["d"] == 0.25

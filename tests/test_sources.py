"""Custom source/sink format tests (GloVe / Word2Vec / N-Triples / JSONL)."""

from __future__ import annotations

import os

import pytest

TMP = "/root/repo/.tmp"


@pytest.fixture(scope="module", autouse=True)
def tmpdir():
    os.makedirs(TMP, exist_ok=True)
    yield TMP


def test_read_glove(spark):
    from arcadedb_spark.sources import read_glove

    path = f"{TMP}/glove.txt"
    with open(path, "w") as f:
        f.write("king 0.1 0.2 0.3\nqueen 0.4 0.5 0.6\n")
    df = read_glove(spark, path)
    rows = {r["token"]: r["vector"] for r in df.collect()}
    assert set(rows) == {"king", "queen"}
    assert [round(v, 1) for v in rows["king"]] == [0.1, 0.2, 0.3]


def test_read_word2vec_skips_header(spark):
    from arcadedb_spark.sources import read_word2vec

    path = f"{TMP}/w2v.txt"
    with open(path, "w") as f:
        f.write("2 3\nking 0.1 0.2 0.3\nqueen 0.4 0.5 0.6\n")
    df = read_word2vec(spark, path)
    assert df.count() == 2
    assert {r["token"] for r in df.collect()} == {"king", "queen"}


def test_read_ntriples(spark):
    from arcadedb_spark.sources import read_ntriples

    path = f"{TMP}/data.nt"
    with open(path, "w") as f:
        f.write(
            "# comment line\n"
            "<http://ex/a> <http://ex/knows> <http://ex/b> .\n"
            '<http://ex/a> <http://ex/name> "Alice" .\n'
            "malformed junk\n"
        )
    df = read_ntriples(spark, path)
    rows = sorted(
        (r["predicate"], r["object"], r["is_literal"]) for r in df.collect()
    )
    assert rows == [
        ("http://ex/knows", "http://ex/b", False),
        ("http://ex/name", "Alice", True),
    ]


def test_export_jsonl_roundtrip(spark, db):
    from arcadedb_spark.sources import export_jsonl

    path = f"{TMP}/nation_out"
    export_jsonl(db.table("nation").select("n_nationkey", "n_name"), path)
    back = spark.read.json(path)
    assert back.count() == 25


def test_neo4j_export_import(spark, tmp_path, db):
    import json as _json

    lines = [
        {"type": "node", "id": "0", "labels": ["User"],
         "properties": {"name": "Adam", "age": 42, "kids": ["Sam", "Anna"]}},
        {"type": "node", "id": "1", "labels": ["User"], "properties": {"name": "Jim"}},
        {"type": "node", "id": "2", "labels": ["City"], "properties": {"name": "Oslo"}},
        {"type": "relationship", "id": "0", "label": "N_KNOWS",
         "properties": {"since": 1993},
         "start": {"id": "0", "labels": ["User"]}, "end": {"id": "1", "labels": ["User"]}},
        {"type": "relationship", "id": "1", "label": "N_LIVES_IN", "properties": {},
         "start": {"id": "1", "labels": ["User"]}, "end": {"id": "2", "labels": ["City"]}},
    ]
    p = tmp_path / "neo4j.jsonl"
    p.write_text("\n".join(_json.dumps(x) for x in lines))

    from arcadedb_spark.sources.readers import import_neo4j_graph, read_neo4j_export

    nodes, rels = read_neo4j_export(spark, str(p))
    assert nodes.count() == 3 and rels.count() == 2
    r = rels.filter("label = 'N_KNOWS'").collect()[0]
    assert r["start_id"] == "0" and r["end_id"] == "1"

    counts = import_neo4j_graph(db, str(p))
    assert counts == {"User": 2, "City": 1, "N_KNOWS": 1, "N_LIVES_IN": 1}
    # imported graph is traversable through the normal surfaces
    n = db.query(
        "MATCH (u:User)-[:N_KNOWS]->(v:User) RETURN count(*) AS n", language="cypher"
    ).collect()[0]["n"]
    assert n == 1


def test_read_xml_nest_level(spark, tmp_path):
    p = tmp_path / "people.xml"
    p.write_text(
        '<root><person name="a" age="3"><city>NY</city></person>'
        '<person name="b" age="4"><city>LA</city></person>'
        '<pet kind="cat"/></root>'
    )
    from arcadedb_spark.sources.readers import read_xml

    rows = read_xml(spark, str(tmp_path)).collect()
    by_tag = {}
    for r in rows:
        by_tag.setdefault(r["tag"], []).append(r["_props"])
    assert sorted(by_tag) == ["person", "pet"]
    assert '"city": "NY"' in by_tag["person"][0] + by_tag["person"][1]
    # native Spark 4 XML reader covers the huge-single-file path
    native = (
        spark.read.format("xml").option("rowTag", "person").load(str(tmp_path))
    )
    assert native.count() == 2


def test_read_orientdb_export(spark, tmp_path):
    import gzip as _gzip
    import json as _json

    doc = {
        "info": {"exporter-version": 13},
        "clusters": [],
        "schema": {"classes": [{"name": "Person"}]},
        "records": [
            {"@type": "d", "@rid": "#9:0", "@class": "Person",
             "name": "a", "age": 3},
            {"@type": "d", "@rid": "#9:1", "@class": "Person", "name": "b"},
            {"@type": "d", "@rid": "#10:0", "@class": "City", "name": "Oslo"},
        ],
    }
    p = tmp_path / "export.json.gz"
    p.write_bytes(_gzip.compress(_json.dumps(doc).encode()))
    from arcadedb_spark.sources.readers import read_orientdb_export

    rows = read_orientdb_export(spark, str(p)).collect()
    assert len(rows) == 3
    by_rid = {r["rid"]: r for r in rows}
    assert by_rid["#9:0"]["class"] == "Person"
    assert '"age": 3' in by_rid["#9:0"]["_props"]
    assert by_rid["#10:0"]["class"] == "City"


def test_import_database_statement_roundtrip(spark):
    """IMPORT DATABASE file://…csv WITH (type=…) round-trips
    (parser/ImportDatabaseStatement.java; the integration importer's
    CSV format)."""
    import os
    import tempfile

    from arcadedb_spark.database import Database

    db = Database(spark)
    p = os.path.join(tempfile.gettempdir(), "imp_stmt_test.csv")
    with open(p, "w") as fh:
        fh.write("kind,qty\nx,1\nx,3\ny,5\n")
    r = db.command(f"IMPORT DATABASE file://{p} WITH typeName = stuff"
                   ).collect()[0]
    assert r["type"] == "stuff" and r["rows"] == "3"
    rows = db.query(
        "SELECT kind, sum(qty) AS s FROM stuff GROUP BY kind ORDER BY kind"
    ).collect()
    assert [(x["kind"], x["s"]) for x in rows] == [("x", 4), ("y", 5)]
    # quoted URL + parenthesized WITH form
    r2 = db.command(
        f"IMPORT DATABASE '{p}' WITH (typeName = q2, header = true)"
    ).collect()[0]
    assert r2["type"] == "q2"
    # jsonl round-trip through EXPORT
    out = tempfile.mkdtemp()
    r3 = db.command(f"EXPORT DATABASE file://{out}").collect()[0]
    assert int(r3["types"]) >= 2
    assert os.path.exists(os.path.join(out, "backup_manifest.json"))
    # error paths
    import pytest

    from arcadedb_spark.sql.translator import TranslateError

    with pytest.raises(TranslateError):
        db.command("IMPORT DATABASE file:///does/not/exist.csv")
    with pytest.raises(TranslateError):
        db.command("IMPORT DATABASE http://example.invalid/x.csv")


def test_check_database_statement(spark):
    """CHECK DATABASE counts rows per type and dangling edge endpoints
    (CheckDatabaseStatement.java integrity-check analog)."""
    import pytest

    from arcadedb_spark.database import Database
    from arcadedb_spark.sql.translator import TranslateError

    db = Database(spark)
    db.command("CREATE DOCUMENT TYPE D1")
    db.command("INSERT INTO D1 SET a = 1")
    db.command("INSERT INTO D1 SET a = 2")
    rows = {r["type"]: r for r in db.command("CHECK DATABASE").collect()}
    assert rows["D1"]["rows"] == 2
    assert rows["D1"]["dangling_edges"] is None
    only = db.command("CHECK DATABASE TYPE D1").collect()
    assert len(only) == 1 and only[0]["type"] == "D1"
    with pytest.raises(TranslateError):
        db.command("CHECK DATABASE FIX")

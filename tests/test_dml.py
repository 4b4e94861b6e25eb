"""DML / DDL command tests — run on a scratch Database (sf0.001 copy)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def scratch(spark):
    from arcadedb_spark.database import Database

    return Database.open(spark, "/root/testdata/sf0.001")


def test_create_insert_select_roundtrip(scratch):
    db = scratch
    db.command("CREATE DOCUMENT TYPE Person")
    db.command("INSERT INTO Person SET name = 'Ann', age = 34")
    db.command("INSERT INTO Person (name, age) VALUES ('Bob', 41), ('Cid', 28)")
    db.command("INSERT INTO Person CONTENT {name: 'Dee', age: 55}")
    rows = db.query("SELECT name, age FROM Person ORDER BY age").collect()
    assert [r["name"] for r in rows] == ["Cid", "Ann", "Bob", "Dee"]


def test_insert_from_select(scratch):
    db = scratch
    db.command("CREATE DOCUMENT TYPE RichCustomer")
    n = db.command(
        "INSERT INTO RichCustomer FROM (SELECT c_name, c_acctbal FROM customer WHERE c_acctbal > 9000)"
    ).collect()[0]["count"]
    assert n == db.table("customer").filter(F.col("c_acctbal") > 9000).count()
    assert db.query("SELECT count(*) AS n FROM RichCustomer").collect()[0]["n"] == n


def test_update_where(scratch):
    db = scratch
    db.command("CREATE DOCUMENT TYPE P2")
    db.command("INSERT INTO P2 (name, score) VALUES ('a', 1), ('b', 2)")
    n = db.command("UPDATE P2 SET score = 99 WHERE name = 'a'").collect()[0]["count"]
    assert n == 1
    rows = {r["name"]: r["score"] for r in db.query("SELECT name, score FROM P2").collect()}
    assert rows == {"a": 99, "b": 2}


def test_update_upsert_inserts_when_missing(scratch):
    db = scratch
    db.command("CREATE DOCUMENT TYPE P3")
    db.command("INSERT INTO P3 (name, v) VALUES ('x', 1)")
    db.command("UPDATE P3 SET name = 'y', v = 7 UPSERT WHERE name = 'y'")
    rows = {r["name"]: r["v"] for r in db.query("SELECT name, v FROM P3").collect()}
    assert rows == {"x": 1, "y": 7}
    # second time: match exists → update, not insert
    db.command("UPDATE P3 SET name = 'y', v = 8 UPSERT WHERE name = 'y'")
    assert db.query("SELECT count(*) AS n FROM P3").collect()[0]["n"] == 2


def test_delete(scratch):
    db = scratch
    db.command("CREATE DOCUMENT TYPE P4")
    db.command("INSERT INTO P4 (k) VALUES (1), (2), (3)")
    n = db.command("DELETE FROM P4 WHERE k >= 2").collect()[0]["count"]
    assert n == 2
    assert db.query("SELECT k FROM P4").collect()[0]["k"] == 1


def test_truncate_and_drop(scratch):
    db = scratch
    db.command("CREATE DOCUMENT TYPE P5")
    db.command("INSERT INTO P5 (k) VALUES (1)")
    db.command("TRUNCATE TYPE P5")
    assert db.query("SELECT count(*) AS n FROM P5").collect()[0]["n"] == 0
    db.command("DROP TYPE P5")
    assert not db.schema.exists("P5")
    db.command("DROP TYPE P5 IF EXISTS")  # idempotent


def test_create_property_and_index_noop(scratch):
    db = scratch
    db.command("CREATE DOCUMENT TYPE P6")
    db.command("CREATE PROPERTY P6.name STRING")
    assert db.schema.get("P6").properties["declared"]["name"]["type"] == "string"
    r = db.command("CREATE INDEX ON P6 (name) UNIQUE").collect()
    assert r[0]["count"] == 0  # no-op by design


def test_inheritance_polymorphic_scan(scratch):
    db = scratch
    db.command("CREATE DOCUMENT TYPE Animal")
    db.command("CREATE DOCUMENT TYPE Dog EXTENDS Animal")
    db.command("INSERT INTO Animal SET name = 'generic'")
    db.command("INSERT INTO Dog SET name = 'rex', breed = 'lab'")
    rows = db.query("SELECT name FROM Animal ORDER BY name").collect()
    assert [r["name"] for r in rows] == ["generic", "rex"]
    assert db.query("SELECT count(*) AS n FROM Dog").collect()[0]["n"] == 1


def test_materialized_view_lifecycle(scratch):
    db = scratch
    db.command(
        "CREATE MATERIALIZED VIEW seg_stats AS "
        "SELECT c_mktsegment, count(*) AS n FROM customer GROUP BY c_mktsegment"
    )
    rows = db.query("SELECT c_mktsegment, n FROM seg_stats ORDER BY c_mktsegment").collect()
    assert len(rows) == 5 and sum(r["n"] for r in rows) == 150
    # base-table change then refresh recomputes
    db.command("DELETE FROM customer WHERE c_mktsegment = 'BUILDING'")
    stale = db.query("SELECT count(*) AS n FROM seg_stats").collect()[0]["n"]
    assert stale == 5  # MANUAL refresh: still stale
    db.command("REFRESH MATERIALIZED VIEW seg_stats")
    fresh = db.query("SELECT c_mktsegment FROM seg_stats").collect()
    assert len(fresh) == 4
    db.command("DROP MATERIALIZED VIEW seg_stats")
    assert not db.schema.exists("seg_stats")


def test_continuous_aggregate_ddl(scratch):
    db = scratch
    db.command(
        "CREATE CONTINUOUS AGGREGATE ev_minute AS "
        "SELECT ts.timeBucket('1m', ts) AS bucket, event_type, count(*) AS n "
        "FROM events GROUP BY bucket, event_type"
    )
    n = db.query("SELECT count(*) AS n FROM ev_minute").collect()[0]["n"]
    assert n > 0


def test_property_constraints_and_defaults(scratch):
    import pytest as _pytest
    from arcadedb_spark.sql.translator import TranslateError

    db = scratch
    db.command("CREATE DOCUMENT TYPE Validated")
    db.command("CREATE PROPERTY Validated.name STRING (MANDATORY true, REGEXP '[a-z]+')")
    db.command("CREATE PROPERTY Validated.age INTEGER (MIN 0, MAX 150, DEFAULT 18)")
    db.command("INSERT INTO Validated SET name = 'ann'")
    row = db.query("SELECT name, age FROM Validated").collect()[0]
    assert row["age"] == 18  # default applied
    with _pytest.raises(TranslateError):
        db.command("INSERT INTO Validated SET age = 30")  # mandatory name
    with _pytest.raises(TranslateError):
        db.command("INSERT INTO Validated SET name = 'bob', age = 200")  # > max
    with _pytest.raises(TranslateError):
        db.command("INSERT INTO Validated SET name = 'BOB'")  # regexp


def test_define_function_sql_macro(scratch):
    db = scratch
    db.command(
        "DEFINE FUNCTION math.discounted \"price * (1 - disc)\" "
        "PARAMETERS [price, disc] LANGUAGE sql"
    )
    r = db.query(
        "SELECT round(math.discounted(l_extendedprice, l_discount), 4) AS net "
        "FROM lineitem LIMIT 1"
    ).collect()[0]
    base = db.table("lineitem").limit(1).collect()[0]
    assert abs(r["net"] - round(base["l_extendedprice"] * (1 - base["l_discount"]), 4)) < 1e-9


def test_register_python_function(scratch):
    db = scratch
    db.register_function("shout", lambda s: (s or "").upper() + "!", "string")
    r = db.query("SELECT shout(c_name) AS s FROM customer WHERE c_custkey = 1").collect()[0]
    assert r["s"].endswith("!") and r["s"].startswith("CUSTOMER#")


def test_timeseries_type_ddl(scratch):
    db = scratch
    db.command(
        "CREATE TIMESERIES TYPE SensorData "
        "TIMESTAMP ts PRECISION MILLISECOND "
        "TAGS (host STRING, region STRING) "
        "FIELDS (temperature DOUBLE, load LONG) "
        "SHARDS 4 RETENTION 30 DAYS"
    )
    cols = db.table("SensorData").columns
    assert cols[:1] == ["ts"] and "temperature" in cols and "host" in cols
    meta = db.schema.get("SensorData").properties["timeseries"]
    assert meta["retention_ms"] == 30 * 86_400_000 and meta["shards"] == 4
    # ingest through normal DML, query through ts functions
    db.command(
        "INSERT INTO SensorData SET ts = date('2024-01-01 10:00:00'), "
        "host = 'h1', region = 'eu', temperature = 21.5, load = 3"
    )
    assert db.query("SELECT count(*) AS n FROM SensorData").collect()[0]["n"] == 1
    # downsampling policy DDL
    db.command(
        "ALTER TIMESERIES TYPE SensorData ADD DOWNSAMPLING POLICY "
        "AFTER 7 DAYS GRANULARITY 1 HOURS AFTER 30 DAYS GRANULARITY 1 DAYS"
    )
    meta = db.schema.get("SensorData").properties["timeseries"]
    assert meta["downsampling"] == [
        (7 * 86_400_000, 3_600_000), (30 * 86_400_000, 86_400_000)
    ]
    db.command("ALTER TIMESERIES TYPE SensorData DROP DOWNSAMPLING POLICY")
    assert db.schema.get("SensorData").properties["timeseries"]["downsampling"] == []
    # IF NOT EXISTS is a no-op
    db.command("CREATE TIMESERIES TYPE SensorData IF NOT EXISTS")


def test_sql_insert_visible_to_cypher_match(spark):
    """Vertex-kind types share one logical store across surfaces: SQL
    INSERT rows are visible to Cypher MATCH (reference: a single record
    store under every query engine).  UPDATE/DELETE mirror divergence is
    a documented deviation (NOTES.md)."""
    from arcadedb_spark.database import Database

    db = Database(spark)
    db.command("CREATE VERTEX TYPE InteropV")
    db.command("INSERT INTO InteropV SET name = 'a', id = 1")
    db.command("INSERT INTO InteropV (name, id) VALUES ('b', 2), ('c', 3)")
    assert db.query("SELECT count(*) AS n FROM InteropV"
                    ).collect()[0]["n"] == 3
    got = db.query("MATCH (p:InteropV) RETURN p.name AS n ORDER BY n",
                   language="cypher").collect()
    assert [r["n"] for r in got] == ["a", "b", "c"]
    # Cypher writes address the mirrored vertices
    db.query("MATCH (p:InteropV {id: 2}) SET p.flag = true",
             language="cypher").collect()
    n = db.query("MATCH (p:InteropV) WHERE p.flag RETURN count(*) AS n",
                 language="cypher").collect()[0]["n"]
    assert n == 1


def test_create_edge_from_to_statement(spark):
    """CREATE EDGE <type> FROM (SELECT …) TO (SELECT …) [SET …]
    (parser/CreateEdgeStatement.java): endpoints resolve against the
    graph vertex frames (SQL-inserted vertices included via the mirror);
    one edge per endpoint-cartesian pair."""
    import pytest

    from arcadedb_spark.database import Database
    from arcadedb_spark.sql.translator import TranslateError

    db = Database(spark)
    db.command("CREATE VERTEX TYPE EPerson")
    db.command("CREATE VERTEX TYPE ECar")
    db.command("CREATE EDGE TYPE EDrives")
    db.command("INSERT INTO EPerson SET id = 1, name = 'Alice'")
    db.command("INSERT INTO EPerson SET id = 2, name = 'Bob'")
    db.command("INSERT INTO ECar SET id = 10, model = 'T'")
    r = db.command(
        "CREATE EDGE EDrives FROM (SELECT FROM EPerson WHERE id = 1) "
        "TO (SELECT FROM ECar WHERE id = 10) SET since = 2024"
    ).collect()
    assert r[0]["count"] == 1
    rows = db.query(
        "MATCH (p:EPerson)-[d:EDrives]->(c:ECar) "
        "RETURN p.name AS n, c.model AS m, d.since AS s",
        language="cypher",
    ).collect()
    assert [(x["n"], x["m"], x["s"]) for x in rows] == [("Alice", "T", 2024)]
    # cartesian: 2 persons × 1 car
    r2 = db.command(
        "CREATE EDGE EDrives FROM (SELECT FROM EPerson) "
        "TO (SELECT FROM ECar)"
    ).collect()
    assert r2[0]["count"] == 2
    with pytest.raises(Exception):
        db.command("CREATE EDGE EDrives FROM xyz TO (SELECT FROM ECar)")

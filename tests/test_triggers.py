"""Triggers: CREATE TRIGGER DDL, BEFORE-veto, AFTER side effects, and
the streaming foreachBatch live-trigger sink.

Reference: schema/trigger/TriggerExecutor.java, SQLTriggerExecutor.java,
parser/CreateTriggerStatement.java."""

from __future__ import annotations

import pytest

from arcadedb_spark.database import Database
from arcadedb_spark.triggers import TriggerAborted


@pytest.fixture()
def tdb(spark):
    db = Database(spark)
    db.command("CREATE DOCUMENT TYPE Audit")
    db.command("INSERT INTO Audit (event) VALUES ('seed')")
    db.command("CREATE DOCUMENT TYPE Person")
    db.command("INSERT INTO Person (name, age) VALUES ('ann', 30)")
    return db


def test_create_trigger_ddl_and_after_insert(tdb):
    tdb.command(
        "CREATE TRIGGER log_person AFTER CREATE ON TYPE Person "
        "EXECUTE SQL 'INSERT INTO Audit (event) VALUES (''created'')'"
    )
    tdb.command("INSERT INTO Person (name, age) VALUES ('bob', 40)")
    events = [r["event"] for r in tdb.query("SELECT event FROM Audit").collect()]
    assert events.count("created") == 1
    assert tdb.query("SELECT FROM Person").count() == 2


def test_before_trigger_python_veto(tdb):
    tdb.register_trigger(
        "no_minors", "BEFORE", "CREATE", "Person",
        lambda rec, old: rec.get("age", 0) >= 18,
    )
    with pytest.raises(TriggerAborted):
        tdb.command("INSERT INTO Person (name, age) VALUES ('kid', 7)")
    # veto → row not inserted
    assert tdb.query("SELECT FROM Person").count() == 1
    tdb.command("INSERT INTO Person (name, age) VALUES ('adult', 19)")
    assert tdb.query("SELECT FROM Person").count() == 2


def test_update_trigger_sees_old_and_new(tdb):
    seen = []
    tdb.register_trigger(
        "watch", "AFTER", "UPDATE", "Person",
        lambda rec, old: seen.append((old["age"], rec["age"])),
    )
    tdb.command("UPDATE Person SET age = 31 WHERE name = 'ann'")
    assert seen == [(30, 31)]


def test_delete_trigger_fires(tdb):
    seen = []
    tdb.register_trigger(
        "bye", "AFTER", "DELETE", "Person",
        lambda rec, old: seen.append(rec["name"]),
    )
    tdb.command("DELETE FROM Person WHERE name = 'ann'")
    assert seen == ["ann"]


def test_drop_trigger(tdb):
    tdb.command(
        "CREATE TRIGGER t1 AFTER CREATE ON TYPE Person "
        "EXECUTE SQL 'INSERT INTO Audit (event) VALUES (''x'')'"
    )
    tdb.command("DROP TRIGGER t1")
    tdb.command("INSERT INTO Person (name, age) VALUES ('c', 1)")
    events = [r["event"] for r in tdb.query("SELECT event FROM Audit").collect()]
    assert "x" not in events


def test_sql_trigger_reads_record_param(tdb):
    tdb.command(
        "CREATE TRIGGER echo AFTER CREATE ON TYPE Person "
        "EXECUTE SQL 'INSERT INTO AuditRec (rec) VALUES (:record)'"
    )
    tdb.command("INSERT INTO Person (name, age) VALUES ('zed', 9)")
    rows = [str(r["rec"]) for r in tdb.query("SELECT rec FROM AuditRec").collect()]
    assert len(rows) == 1 and "zed" in rows[0]


@pytest.mark.slow
def test_streaming_after_create_trigger(spark, tmp_path):
    from arcadedb_spark.triggers import stream_after_create

    db = Database(spark)
    db.command("CREATE DOCUMENT TYPE Events2")
    db.command("INSERT INTO Events2 (v) VALUES (0)")
    seen = []
    db.register_trigger(
        "live", "AFTER", "CREATE", "Events2",
        lambda rec, old: seen.append(rec["v"]),
    )
    src = str(tmp_path / "in")
    import os

    os.makedirs(src)
    stream = (
        spark.readStream.schema("v long").json(src)
    )
    q = stream_after_create(
        db, stream, "Events2",
        checkpoint=str(tmp_path / "ck"), trigger_interval="1 second",
    )
    with open(f"{src}/a.json", "w") as f:
        f.write('{"v": 41}\n{"v": 42}\n')
    import time

    deadline = time.time() + 30
    while time.time() < deadline and len(seen) < 2:
        time.sleep(0.5)
    q.stop()
    assert sorted(seen) == [41, 42]
    assert db.query("SELECT FROM Events2").count() == 3

"""Redis-style KV surface + backup/restore tests (redisw module,
integration exporter analogs)."""

from __future__ import annotations


def test_kv_commands(db):
    kv = db.kv("kv_t1")
    kv.set("user:1", "ann")
    kv.set("user:2", "bob")
    kv.set("cfg:mode", "fast")
    assert kv.get("user:1") == "ann"
    assert kv.get("missing") is None
    assert kv.exists("user:2") and not kv.exists("user:9")
    assert sorted(kv.keys("user:*")) == ["user:1", "user:2"]
    assert kv.mget(["user:1", "nope"]) == {"user:1": "ann", "nope": None}
    kv.set("user:1", "anna")  # SET overwrites
    assert kv.get("user:1") == "anna"
    assert kv.incr("hits") == 1 and kv.incr("hits", 5) == 6
    assert kv.delete("user:1", "ghost") == 1
    assert kv.get("user:1") is None
    assert kv.dbsize() == 3  # user:2, cfg:mode, hits
    kv.mset({"a": 1, "b": 2})
    assert kv.mget(["a", "b"]) == {"a": "1", "b": "2"}
    # KV state is queryable as a normal type too
    assert db.query("SELECT count(*) AS n FROM kv_t1").collect()[0]["n"] == 5


def test_backup_restore_roundtrip(spark, tmp_path):
    from arcadedb_spark import Database

    db = Database.open(spark, "/root/testdata/sf0.001")
    target = str(tmp_path / "bk")
    counts = db.backup(target)
    assert counts["region"] == 5 and counts["customer"] == 150
    restored = Database.open(spark, target)
    assert restored.table("region").count() == 5
    r = restored.query(
        "SELECT c_mktsegment, count(*) AS n FROM customer GROUP BY c_mktsegment"
    ).collect()
    assert sum(x["n"] for x in r) == 150

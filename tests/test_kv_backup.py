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


def test_kv_hash_commands(spark):
    """HSET/HGET/HMGET/HDEL/HEXISTS over a (key, field, value) frame
    (RedisNetworkExecutor.java hSet/hGet/hMGet/hDel/hExists)."""
    from arcadedb_spark.database import Database

    kv = Database(spark).kv("kv_hash_t")
    assert kv.hset("user:1", {"name": "ann", "age": "30"}) == 2
    # overwrite counts 0 new, add counts 1 new
    assert kv.hset("user:1", {"age": "31", "city": "oslo"}) == 1
    assert kv.hget("user:1", "age") == "31"
    assert kv.hget("user:1", "missing") is None
    assert kv.hget("nope", "name") is None
    assert kv.hmget("user:1", ["name", "city", "zz"]) == {
        "name": "ann", "city": "oslo", "zz": None,
    }
    assert kv.hgetall("user:1") == {"name": "ann", "age": "31",
                                    "city": "oslo"}
    assert kv.hexists("user:1", "name") is True
    assert kv.hexists("user:1", "zz") is False
    assert kv.hdel("user:1", "name", "zz") == 1
    assert kv.hdel("user:1", "zz") == 0
    assert kv.hgetall("user:1") == {"age": "31", "city": "oslo"}
    # hashes are per-key namespaces
    kv.hset("user:2", {"name": "bob"})
    assert kv.hget("user:2", "name") == "bob"
    assert kv.hget("user:1", "name") is None


def test_kv_string_tail(spark):
    """GETDEL, DECR/DECRBY, INCRBYFLOAT missing-key/non-number semantics
    (RedisNetworkExecutor.java:237-298, decrBy:351, getDel:385)."""
    import pytest

    from arcadedb_spark.database import Database

    kv = Database(spark).kv("kv_tail_t")
    kv.set("a", "5")
    assert kv.getdel("a") == "5"
    assert kv.get("a") is None
    assert kv.getdel("a") is None
    # DECR from missing key counts from 0
    assert kv.decr("c") == -1
    assert kv.decr("c", 4) == -5
    kv.set("s", "abc")
    with pytest.raises(ValueError):
        kv.decr("s")
    assert kv.incrbyfloat("f", 1.5) == 1.5
    assert kv.incrbyfloat("f", 2.25) == 3.75
    with pytest.raises(ValueError):
        kv.incrbyfloat("s", 1.0)

"""Redis-style key/value surface.

Parity: the redisw/ module exposes GET/SET/DEL/EXISTS/KEYS/MGET/INCR
over types keyed by a string key (wire protocol is out of scope — this
is the command surface over the same engine).

Semantics: values are strings (Redis strings); SET upserts; INCR treats
the value as an integer counter.  Point reads filter on the key column —
at 100 TB the backing table would be bucketed by key so the filter
prunes to one bucket; writes are whole-table rewrites with documented
non-transactional semantics (the same DML model as UPDATE/DELETE).
"""

from __future__ import annotations

from pyspark.sql import functions as F

_SCHEMA = "key string, value string"


class KeyValueStore:
    def __init__(self, db, type_name: str) -> None:
        self.db = db
        self.type_name = type_name
        if not db.schema.exists(type_name):
            db.schema.register(
                type_name, db.spark.createDataFrame([], _SCHEMA), key="key"
            )

    def _df(self):
        return self.db.schema.get(self.type_name).df()

    def _replace(self, df) -> None:
        tdef = self.db.schema.get(self.type_name)
        tdef._df = df.cache()
        self.db._plan_cache.clear()

    # -- commands -----------------------------------------------------------

    def set(self, key: str, value) -> None:
        """SET — upsert one key."""
        new = self.db.spark.createDataFrame([(key, str(value))], _SCHEMA)
        self._replace(
            self._df().filter(F.col("key") != key).unionByName(new)
        )

    def mset(self, mapping: dict) -> None:
        new = self.db.spark.createDataFrame(
            [(k, str(v)) for k, v in mapping.items()], _SCHEMA
        )
        self._replace(
            self._df().filter(~F.col("key").isin(list(mapping))).unionByName(new)
        )

    def get(self, key: str) -> str | None:
        rows = self._df().filter(F.col("key") == key).limit(1).collect()
        return rows[0]["value"] if rows else None

    def mget(self, keys: list[str]) -> dict:
        rows = self._df().filter(F.col("key").isin(keys)).collect()
        found = {r["key"]: r["value"] for r in rows}
        return {k: found.get(k) for k in keys}

    def exists(self, key: str) -> bool:
        return bool(self._df().filter(F.col("key") == key).limit(1).count())

    def delete(self, *keys: str) -> int:
        df = self._df()
        n = df.filter(F.col("key").isin(list(keys))).count()
        if n:
            self._replace(df.filter(~F.col("key").isin(list(keys))))
        return n

    def keys(self, pattern: str = "*") -> list[str]:
        """KEYS with Redis glob (* and ?)."""
        rx = "^" + pattern.replace("*", ".*").replace("?", ".") + "$"
        return [
            r["key"]
            for r in self._df().filter(F.col("key").rlike(rx)).select("key").collect()
        ]

    def incr(self, key: str, by: int = 1) -> int:
        cur = self.get(key)
        val = (int(cur) if cur is not None else 0) + by
        self.set(key, val)
        return val

    def dbsize(self) -> int:
        return self._df().count()

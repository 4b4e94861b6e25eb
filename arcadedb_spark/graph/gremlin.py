"""Gremlin-flavored fluent traversal API.

Reference: the gremlin/ module wraps TinkerPop 3.7 around the same engine
(gremlin/src/main/java/com/arcadedb/gremlin/query/GremlinQueryEngine.java:33).
A full TinkerPop runtime is out of scope; this is the traversal-builder
surface (`g.V().hasLabel(...).has(...).out(...).values(...)`) compiled to
the same DataFrame joins the MATCH translator uses — each step is lazy,
so Catalyst still plans the whole chain.

Example
-------
>>> g = db.g()
>>> g.V().hasLabel("Customer").has("c_mktsegment", "BUILDING") \
...   .out("PLACED").count()
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class GraphTraversal:
    def __init__(self, db, df: DataFrame, label: str | None) -> None:
        self.db = db
        self._df = df
        self._label = label  # current vertex label when known (full props)

    # -- filters -----------------------------------------------------------
    def hasLabel(self, label: str) -> "GraphTraversal":
        g = self.db.graph()
        if self._label is not None:
            if self._label.lower() == label.lower():
                return self
            return GraphTraversal(self.db, self._df.limit(0), self._label)
        verts = g.vertices(label)
        df = self._df.select("vid").join(verts, "vid", "inner")
        return GraphTraversal(self.db, df, label)

    has_label = hasLabel

    def has(self, prop: str, value: Any = None) -> "GraphTraversal":
        if value is None:
            return GraphTraversal(
                self.db, self._df.filter(F.col(prop).isNotNull()), self._label
            )
        return GraphTraversal(
            self.db, self._df.filter(F.col(prop) == F.lit(value)), self._label
        )

    def where(self, cond) -> "GraphTraversal":
        return GraphTraversal(self.db, self._df.filter(cond), self._label)

    # -- traversal ---------------------------------------------------------
    def _hop(self, direction: str, etypes: tuple[str, ...]) -> "GraphTraversal":
        g = self.db.graph()
        e = g.edges(*etypes) if etypes else g.edges()
        frames = []
        if direction in ("out", "both"):
            frames.append(
                e.select(F.col("src").alias("__f"), F.col("dst").alias("__t"))
            )
        if direction in ("in", "both"):
            frames.append(
                e.select(F.col("dst").alias("__f"), F.col("src").alias("__t"))
            )
        edge = frames[0]
        for fr in frames[1:]:
            edge = edge.unionByName(fr)
        hop = (
            self._df.select("vid")
            .join(edge, F.col("vid") == edge["__f"])
            .select(F.col("__t").alias("vid"))
        )
        # resolve target label for full-property access when unambiguous
        target_label = None
        if len(etypes) == 1 and etypes[0] in g.edge_meta:
            meta = g.edge_meta[etypes[0]]
            target_label = meta[1] if direction == "out" else (
                meta[0] if direction == "in" else None
            )
        if target_label is not None:
            df = hop.join(g.vertices(target_label), "vid", "inner")
        else:
            df = hop.join(g.all_vertices(), "vid", "inner")
        return GraphTraversal(self.db, df, target_label)

    def out(self, *etypes: str) -> "GraphTraversal":
        return self._hop("out", etypes)

    def in_(self, *etypes: str) -> "GraphTraversal":
        return self._hop("in", etypes)

    def both(self, *etypes: str) -> "GraphTraversal":
        return self._hop("both", etypes)

    # -- terminals ---------------------------------------------------------
    def values(self, *props: str) -> DataFrame:
        return self._df.select(*props)

    def count(self) -> int:
        return self._df.count()

    def limit(self, n: int) -> "GraphTraversal":
        return GraphTraversal(self.db, self._df.limit(n), self._label)

    def dedup(self) -> "GraphTraversal":
        return GraphTraversal(
            self.db, self._df.dropDuplicates(["vid"]), self._label
        )

    def order(self) -> "_Ordered":
        return _Ordered(self)

    def groupCount(self) -> "_GroupCount":
        return _GroupCount(self)

    group_count = groupCount

    def toDF(self) -> DataFrame:
        return self._df

    def toList(self) -> list:
        return self._df.collect()


class _Ordered:
    """``.order().by(prop[, 'desc'])`` modulator."""

    def __init__(self, t: GraphTraversal) -> None:
        self._t = t

    def by(self, prop: str, direction: str = "asc") -> GraphTraversal:
        col = F.desc(prop) if direction.lower() in ("desc", "decr") else F.asc(prop)
        return GraphTraversal(self._t.db, self._t._df.orderBy(col), self._t._label)


class _GroupCount:
    """``.groupCount().by(prop)`` — histogram DataFrame (key, count)."""

    def __init__(self, t: GraphTraversal) -> None:
        self._t = t

    def by(self, prop: str) -> DataFrame:
        return (
            self._t._df.groupBy(F.col(prop).alias("key"))
            .agg(F.count(F.lit(1)).alias("count"))
            .orderBy(F.desc("count"), F.asc("key"))
        )


class GraphTraversalSource:
    """``g`` — entry point (TinkerPop GraphTraversalSource analog)."""

    def __init__(self, db) -> None:
        self.db = db

    def V(self, label: str | None = None) -> GraphTraversal:
        g = self.db.graph()
        if label is not None:
            return GraphTraversal(self.db, g.vertices(label), label)
        return GraphTraversal(self.db, g.all_vertices(), None)

    def E(self, *etypes: str) -> DataFrame:
        return self.db.graph().edges(*etypes)


# ---------------------------------------------------------------------------
# Gremlin string front end (GremlinQueryEngine.java:33 — the reference
# accepts Gremlin text through the same query() dispatch; here a chain
# grammar over the fluent builder above, so the DataFrame program is
# identical to hand-written fluent calls)
# ---------------------------------------------------------------------------

import re as _re

_CALL_RE = _re.compile(r"\.?\s*([A-Za-z_][A-Za-z0-9_]*)\s*\(([^()]*)\)")


def _parse_args(raw: str) -> list:
    args: list = []
    for part in filter(None, (p.strip() for p in raw.split(","))):
        if (part.startswith("'") and part.endswith("'")) or (
            part.startswith('"') and part.endswith('"')
        ):
            args.append(part[1:-1])
        elif _re.fullmatch(r"-?\d+", part):
            args.append(int(part))
        elif _re.fullmatch(r"-?\d+\.\d+", part):
            args.append(float(part))
        elif part in ("true", "false"):
            args.append(part == "true")
        else:
            raise ValueError(f"Unsupported Gremlin argument: {part!r}")
    return args


def gremlin_query(db, text: str) -> DataFrame:
    """``g.V().hasLabel('X').has('p', v).out('E')…`` string → DataFrame.

    Terminal steps: values(...) → projection, count() → 1-row count,
    groupCount().by(p) → histogram; otherwise the vertex frame.
    """
    s = text.strip()
    if not s.startswith("g."):
        raise ValueError("Gremlin query must start with 'g.'")
    pos = 1  # skip 'g'
    calls: list[tuple[str, list]] = []
    rest = s[1:]
    for m in _CALL_RE.finditer(rest):
        if rest[pos:m.start()].strip(" ."):
            raise ValueError(f"Bad Gremlin syntax near: {rest[pos:m.start()]!r}")
        calls.append((m.group(1), _parse_args(m.group(2))))
        pos = m.end()
    if rest[pos:].strip(" ."):
        raise ValueError(f"Trailing Gremlin input: {rest[pos:]!r}")
    if not calls or calls[0][0] not in ("V", "E"):
        raise ValueError("Gremlin chain must start with g.V() or g.E()")

    src = GraphTraversalSource(db)
    head, head_args = calls[0]
    if head == "E":
        df = src.E(*head_args)
        if len(calls) > 1:
            raise ValueError("g.E() supports no further steps")
        return df
    cur: object = src.V(*head_args)
    for name, args in calls[1:]:
        if name == "in":
            name = "in_"
        if name == "count":
            return db.spark.createDataFrame([(cur.count(),)], "count long")
        if name == "values":
            return cur.values(*args)
        step = getattr(cur, name, None)
        if step is None:
            raise ValueError(f"Unsupported Gremlin step: {name}()")
        cur = step(*args)
    return cur.toDF() if isinstance(cur, GraphTraversal) else cur

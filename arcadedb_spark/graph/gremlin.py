"""Gremlin-flavored fluent traversal API.

Reference: the gremlin/ module wraps TinkerPop 3.7 around the same engine
(gremlin/src/main/java/com/arcadedb/gremlin/query/GremlinQueryEngine.java:33).
A full TinkerPop runtime is out of scope; this is the traversal-builder
surface compiled to the same DataFrame joins the MATCH translator uses —
each step is lazy, so Catalyst still plans the whole chain.

Step surface: V/E, hasLabel, has, where, out/in/both, repeat(...).times(n)
/ .until(...) / .emit(), path(), as_('a') + select('a','b'),
coalesce(sub1, sub2), union(sub1, sub2), valueMap(), order().by,
groupCount().by, dedup, limit, count, values.

Sub-traversals (repeat/coalesce/union bodies, until conditions) are
Python callables ``lambda t: t.out('E')`` in the fluent API and anonymous
chains (``repeat(out('E')).times(2)``) in the string front end — both
compile to the same DataFrame program.

Example
-------
>>> g = db.g()
>>> g.V().hasLabel("Customer").has("c_mktsegment", "BUILDING") \
...   .out("PLACED").count()
>>> g.V("Customer").repeat(lambda t: t.out("INTERACTED"), times=2).count()
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_REPEAT_CAP = 100


def _carry_cols(df: DataFrame) -> list[str]:
    """Traversal-internal state columns (path history, as-labels, markers)
    — NOT arbitrary __-prefixed data columns the vertex frames may carry."""
    return [
        c for c in df.columns
        if c == "__path" or c == "__coal" or c.startswith("__as_")
    ]


class GraphTraversal:
    def __init__(
        self,
        db,
        df: DataFrame,
        label: str | None,
        track_path: bool = False,
    ) -> None:
        self.db = db
        self._label = label  # current vertex label when known (full props)
        self._track_path = track_path
        if track_path and "__path" not in df.columns:
            df = df.withColumn("__path", F.array(F.col("vid")))
        self._df = df

    def _wrap(self, df: DataFrame, label=None) -> "GraphTraversal":
        return GraphTraversal(self.db, df, label, self._track_path)

    # -- filters -----------------------------------------------------------
    def hasLabel(self, label: str) -> "GraphTraversal":
        g = self.db.graph()
        if self._label is not None:
            if self._label.lower() == label.lower():
                return self
            return self._wrap(self._df.limit(0), self._label)
        verts = g.vertices(label)
        carry = _carry_cols(self._df)
        df = self._df.select("vid", *carry).join(
            verts.drop(*[c for c in carry if c in verts.columns]),
            "vid", "inner",
        )
        return self._wrap(df, label)

    has_label = hasLabel

    def has(self, prop: str, value: Any = None) -> "GraphTraversal":
        if value is None:
            return self._wrap(
                self._df.filter(F.col(prop).isNotNull()), self._label
            )
        return self._wrap(
            self._df.filter(F.col(prop) == F.lit(value)), self._label
        )

    def where(self, cond) -> "GraphTraversal":
        return self._wrap(self._df.filter(cond), self._label)

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
        carry = _carry_cols(self._df)
        hop = (
            self._df.select("vid", *carry)
            .join(edge, F.col("vid") == edge["__f"])
            .drop("vid", "__f")
            .withColumnRenamed("__t", "vid")
        )
        if self._track_path:
            hop = hop.withColumn(
                "__path", F.concat(F.col("__path"), F.array(F.col("vid")))
            )
        # resolve target label for full-property access when unambiguous
        target_label = None
        if len(etypes) == 1 and etypes[0] in g.edge_meta:
            meta = g.edge_meta[etypes[0]]
            target_label = meta[1] if direction == "out" else (
                meta[0] if direction == "in" else None
            )
        if target_label is not None:
            vt = g.vertices(target_label)
            df = hop.join(
                vt.drop(*[c for c in carry if c in vt.columns]),
                "vid", "inner",
            )
        else:
            av = g.all_vertices()
            df = hop.join(
                av.drop(*[c for c in carry if c in av.columns]),
                "vid", "inner",
            )
        return self._wrap(df, target_label)

    def out(self, *etypes: str) -> "GraphTraversal":
        return self._hop("out", etypes)

    def in_(self, *etypes: str) -> "GraphTraversal":
        return self._hop("in", etypes)

    def both(self, *etypes: str) -> "GraphTraversal":
        return self._hop("both", etypes)

    # -- branching / looping -------------------------------------------------
    def repeat(
        self,
        sub: Callable[["GraphTraversal"], "GraphTraversal"],
        times: int | None = None,
        until: Callable[["GraphTraversal"], "GraphTraversal"] | None = None,
        emit: bool = False,
    ) -> "GraphTraversal":
        """``repeat(sub).times(n)`` / ``.until(cond)`` / ``.emit()``.

        ``until`` is a filtering sub-traversal evaluated AFTER each
        iteration (TinkerPop post-loop until): traversers it keeps stop,
        the rest loop.  ``emit`` collects every intermediate frontier.
        Distributed form: each iteration is one join superstep; lineage
        is truncated every few supersteps like every other iterative
        operator in this repo."""
        out_frames: list[DataFrame] = []
        cur = self
        if emit:
            out_frames.append(cur._df)
        if times is not None:
            for i in range(times):
                cur = sub(cur)
                if emit and i < times - 1:
                    out_frames.append(cur._df)
            out_frames.append(cur._df)
        else:
            if until is None:
                raise ValueError("repeat() needs times= or until=")
            for i in range(_REPEAT_CAP):
                cur = sub(cur)
                stopped = until(cur)
                out_frames.append(stopped._df)
                continuing = cur._df.subtract(stopped._df)
                cur = cur._wrap(continuing, cur._label)
                if i % 4 == 3:
                    cur = cur._wrap(cur._df.truncate_plan(), cur._label)
                if cur._df.isEmpty():
                    break
                if emit:
                    out_frames.append(cur._df)
            else:
                raise ValueError(
                    f"repeat().until() exceeded {_REPEAT_CAP} iterations"
                )
        res = out_frames[0]
        for fr in out_frames[1:]:
            res = res.unionByName(fr, allowMissingColumns=True)
        return self._wrap(res, cur._label if not emit else None)

    def coalesce(self, *subs) -> "GraphTraversal":
        """First sub-traversal that yields results PER TRAVERSER
        (TinkerPop coalesce): keyed by the incoming element."""
        base = self._df
        remaining = base
        out = None
        for sub in subs:
            if remaining.isEmpty():
                break
            r = sub(self._wrap(remaining, self._label))._df
            out = r if out is None else out.unionByName(
                r, allowMissingColumns=True
            )
            # traversers whose sub yielded nothing fall through.  The sub
            # rewrites vid, so track source identity via __coal marker
            produced = sub(
                self._wrap(
                    remaining.withColumn("__coal", F.col("vid")),
                    self._label,
                )
            )._df.select(F.col("__coal").alias("vid")).distinct()
            remaining = remaining.join(produced, "vid", "left_anti")
        return self._wrap(
            out if out is not None else base.limit(0), None
        )

    def union(self, *subs) -> "GraphTraversal":
        out = None
        for sub in subs:
            r = sub(self)._df
            out = r if out is None else out.unionByName(
                r, allowMissingColumns=True
            )
        return self._wrap(out if out is not None else self._df.limit(0), None)

    # -- labels / path -------------------------------------------------------
    def as_(self, name: str) -> "GraphTraversal":
        return self._wrap(
            self._df.withColumn(f"__as_{name}", F.col("vid")), self._label
        )

    def select(self, *names: str) -> DataFrame:
        cols = []
        for n in names:
            c = f"__as_{n}"
            if c not in self._df.columns:
                raise ValueError(f"select('{n}'): no as('{n}') step upstream")
            cols.append(F.col(c).alias(n))
        return self._df.select(*cols)

    def path(self) -> DataFrame:
        """(path array<long>) — the visited-vid history per traverser.
        Requires the traversal source to track paths (``g.V(path=True)``
        or any string query containing ``path()``)."""
        if "__path" not in self._df.columns:
            raise ValueError(
                "path() needs path tracking — start with g.V(track_path=True)"
            )
        return self._df.select(F.col("__path").alias("path"))

    # -- terminals ---------------------------------------------------------
    def values(self, *props: str) -> DataFrame:
        return self._df.select(*props)

    def valueMap(self, *props: str) -> DataFrame:
        """(vid, value_map map<string,string>) — TinkerPop valueMap with
        values rendered to strings (one uniform map type; the reference
        returns heterogeneous maps, which Spark's map type cannot)."""
        cols = list(props) if props else [
            c for c in self._df.columns
            if not c.startswith(("__", "@")) and c != "vid"
        ]
        pairs = []
        for c in cols:
            pairs.append(F.lit(c))
            pairs.append(F.col(c).cast("string"))
        return self._df.select(
            "vid", F.create_map(*pairs).alias("value_map")
        )

    value_map = valueMap

    def count(self) -> int:
        return self._df.count()

    def limit(self, n: int) -> "GraphTraversal":
        return self._wrap(self._df.limit(n), self._label)

    def dedup(self) -> "GraphTraversal":
        return self._wrap(self._df.dropDuplicates(["vid"]), self._label)

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
        return self._t._wrap(self._t._df.orderBy(col), self._t._label)


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

    def V(
        self, label: str | None = None, track_path: bool = False
    ) -> GraphTraversal:
        g = self.db.graph()
        if label is not None:
            return GraphTraversal(
                self.db, g.vertices(label), label, track_path
            )
        return GraphTraversal(self.db, g.all_vertices(), None, track_path)

    def E(self, *etypes: str) -> DataFrame:
        return self.db.graph().edges(*etypes)


# ---------------------------------------------------------------------------
# Gremlin string front end (GremlinQueryEngine.java:33 — the reference
# accepts Gremlin text through the same query() dispatch; here a recursive
# chain grammar over the fluent builder above, so the DataFrame program is
# identical to hand-written fluent calls).  Nested anonymous traversals
# (repeat(out('E')), coalesce(out('A'), out('B')), until(has('p', v)))
# parse recursively.
# ---------------------------------------------------------------------------

import re as _re

_TOKEN_RE = _re.compile(
    r"\s*(?:(?P<name>__|[A-Za-z_][A-Za-z0-9_]*)"
    r"|(?P<str>'[^']*'|\"[^\"]*\")"
    r"|(?P<num>-?\d+\.\d+|-?\d+)"
    r"|(?P<punct>[().,]))"
)


def _tokenize(s: str) -> list[tuple[str, str]]:
    toks, pos = [], 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m:
            raise ValueError(f"Bad Gremlin syntax near: {s[pos:pos+20]!r}")
        if m.group("name") is not None:
            toks.append(("name", m.group("name")))
        elif m.group("str") is not None:
            toks.append(("lit", m.group("str")[1:-1]))
        elif m.group("num") is not None:
            n = m.group("num")
            toks.append(("lit", float(n) if "." in n else int(n)))
        else:
            toks.append(("punct", m.group("punct")))
        pos = m.end()
    return toks


class _ChainParser:
    def __init__(self, toks: list) -> None:
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else ("eof", "")

    def eat(self, kind, val=None):
        k, v = self.peek()
        if k != kind or (val is not None and v != val):
            raise ValueError(f"Expected {val or kind}, got {v!r}")
        self.i += 1
        return v

    def parse_chain(self) -> list[tuple[str, list]]:
        """name(args) ('.' name(args))* — args are literals or nested
        chains."""
        calls = []
        while True:
            k, v = self.peek()
            if k == "name" and v == "__":
                # anonymous-traversal prefix: __.out('E')
                self.eat("name", "__")
                self.eat("punct", ".")
                continue
            if k != "name":
                break
            name = self.eat("name")
            self.eat("punct", "(")
            args = []
            while self.peek() != ("punct", ")"):
                k2, v2 = self.peek()
                if k2 == "lit":
                    self.i += 1
                    args.append(("lit", v2))
                elif k2 == "name" and v2 in ("true", "false"):
                    self.i += 1
                    args.append(("lit", v2 == "true"))
                elif k2 == "name":
                    args.append(("chain", self.parse_chain()))
                else:
                    raise ValueError(f"Bad Gremlin argument near {v2!r}")
                if self.peek() == ("punct", ","):
                    self.i += 1
            self.eat("punct", ")")
            calls.append((name, args))
            if self.peek() == ("punct", "."):
                self.i += 1
                continue
            break
        return calls


def _sub_of(chain: list) -> Callable[[GraphTraversal], GraphTraversal]:
    """Compile an anonymous chain into a traversal→traversal function."""

    def _apply(t: GraphTraversal) -> GraphTraversal:
        return _run_calls(t, chain)

    return _apply


def _arg_values(args: list) -> list:
    out = []
    for kind, v in args:
        if kind != "lit":
            raise ValueError("literal argument expected")
        out.append(v)
    return out


def _run_calls(cur, calls: list):
    db = cur.db
    i = 0
    while i < len(calls):
        name, args = calls[i]
        nxt = calls[i + 1] if i + 1 < len(calls) else None
        if name == "in":
            name = "in_"
        if name == "as":
            name = "as_"
        if name == "count":
            return db.spark.createDataFrame([(cur.count(),)], "count long")
        if name == "values":
            return cur.values(*_arg_values(args))
        if name in ("valueMap", "value_map"):
            return cur.valueMap(*_arg_values(args))
        if name == "path":
            return cur.path()
        if name == "select":
            return cur.select(*_arg_values(args))
        if name == "repeat":
            if not args or args[0][0] != "chain":
                raise ValueError("repeat() needs a sub-traversal")
            sub = _sub_of(args[0][1])
            times = until = None
            emit = False
            # modulators follow: .times(n) / .until(...) / .emit()
            j = i + 1
            while j < len(calls) and calls[j][0] in ("times", "until", "emit"):
                mname, margs = calls[j]
                if mname == "times":
                    times = _arg_values(margs)[0]
                elif mname == "until":
                    if not margs or margs[0][0] != "chain":
                        raise ValueError("until() needs a sub-traversal")
                    until = _sub_of(margs[0][1])
                else:
                    emit = True
                j += 1
            cur = cur.repeat(sub, times=times, until=until, emit=emit)
            i = j
            continue
        if name in ("coalesce", "union"):
            subs = [
                _sub_of(a[1]) for a in args if a[0] == "chain"
            ]
            if len(subs) != len(args):
                raise ValueError(f"{name}() takes sub-traversals")
            cur = getattr(cur, name)(*subs)
            i += 1
            continue
        if name == "order":
            # order().by(prop[, dir])
            if nxt is None or nxt[0] != "by":
                raise ValueError("order() needs .by(prop)")
            cur = cur.order().by(*_arg_values(nxt[1]))
            i += 2
            continue
        if name in ("groupCount", "group_count"):
            if nxt is None or nxt[0] != "by":
                raise ValueError("groupCount() needs .by(prop)")
            return cur.groupCount().by(*_arg_values(nxt[1]))
        step = getattr(cur, name, None)
        if step is None:
            raise ValueError(f"Unsupported Gremlin step: {name}()")
        cur = step(*_arg_values(args))
        i += 1
    return cur


def gremlin_query(db, text: str) -> DataFrame:
    """``g.V().hasLabel('X').has('p', v).out('E')…`` string → DataFrame.

    Terminal steps: values(...) → projection, count() → 1-row count,
    groupCount().by(p) → histogram, path()/select(...)/valueMap() →
    their frames; otherwise the vertex frame.
    """
    s = text.strip()
    if not s.startswith("g."):
        raise ValueError("Gremlin query must start with 'g.'")
    toks = _tokenize(s[2:])
    parser = _ChainParser(toks)
    calls = parser.parse_chain()
    if parser.i != len(toks):
        raise ValueError(
            f"Trailing Gremlin input near token {parser.i}"
        )
    if not calls or calls[0][0] not in ("V", "E"):
        raise ValueError("Gremlin chain must start with g.V() or g.E()")

    src = GraphTraversalSource(db)
    head, head_args = calls[0]
    if head == "E":
        df = src.E(*_arg_values(head_args))
        if len(calls) > 1:
            raise ValueError("g.E() supports no further steps")
        return df
    needs_path = any(c[0] == "path" for c in calls) or any(
        c[0] in ("as", "as_", "select") for c in calls
    )
    cur: object = src.V(*_arg_values(head_args), track_path=needs_path)
    out = _run_calls(cur, calls[1:])
    return out.toDF() if isinstance(out, GraphTraversal) else out

"""Fluent select builder mirroring the reference native API.

Reference: query/select/Select.java — ``database.select().fromType("X")
.where().property(p).eq().value(v).orderBy(...).limit(n)`` compiles to a
SelectExecutor; here it is literally the DataFrame API with an
ArcadeDB-shaped surface, so the builder just accumulates Columns.

Example
-------
>>> db.select().from_type("customer").where(F.col("c_acctbal") > 100) \
...   .order_by("c_acctbal", ascending=False).limit(10).df()

The property/eq/value chain is also supported:

>>> db.select().from_type("customer").where_property("c_mktsegment").eq("BUILDING").df()
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class _PropCond:
    """One property().<op>().value() chain (query/select/SelectWhere*)."""

    def __init__(self, builder: "SelectBuilder", prop: str) -> None:
        self.builder = builder
        self.prop = prop
        self.op: str | None = None

    def _apply(self, op) -> "SelectBuilder":
        self.builder._conds.append(op(F.col(self.prop)))
        return self.builder

    def eq(self, v: Any) -> "SelectBuilder":
        return self._apply(lambda c: c == F.lit(v))

    def neq(self, v: Any) -> "SelectBuilder":
        return self._apply(lambda c: c != F.lit(v))

    def lt(self, v: Any) -> "SelectBuilder":
        return self._apply(lambda c: c < F.lit(v))

    def le(self, v: Any) -> "SelectBuilder":
        return self._apply(lambda c: c <= F.lit(v))

    def gt(self, v: Any) -> "SelectBuilder":
        return self._apply(lambda c: c > F.lit(v))

    def ge(self, v: Any) -> "SelectBuilder":
        return self._apply(lambda c: c >= F.lit(v))

    def like(self, pattern: str) -> "SelectBuilder":
        return self._apply(lambda c: c.like(pattern))

    def ilike(self, pattern: str) -> "SelectBuilder":
        return self._apply(lambda c: c.ilike(pattern))

    def is_null(self) -> "SelectBuilder":
        return self._apply(lambda c: c.isNull())

    def is_not_null(self) -> "SelectBuilder":
        return self._apply(lambda c: c.isNotNull())

    def in_(self, values: list) -> "SelectBuilder":
        return self._apply(lambda c: c.isin(values))

    def between(self, lo: Any, hi: Any) -> "SelectBuilder":
        return self._apply(lambda c: c.between(F.lit(lo), F.lit(hi)))


class SelectBuilder:
    def __init__(self, db, type_name: str | None = None) -> None:
        self.db = db
        self._type = type_name
        self._conds: list[Column] = []
        self._projections: list[Column | str] = []
        self._order: list[tuple[str, bool]] = []
        self._skip: int | None = None
        self._limit: int | None = None

    # -- targets ----------------------------------------------------------
    def from_type(self, name: str) -> "SelectBuilder":
        self._type = name
        return self

    fromType = from_type  # reference casing

    # -- predicates --------------------------------------------------------
    def where(self, cond: Column) -> "SelectBuilder":
        self._conds.append(cond)
        return self

    def where_property(self, prop: str) -> _PropCond:
        return _PropCond(self, prop)

    def property(self, prop: str) -> _PropCond:  # reference naming
        return _PropCond(self, prop)

    # -- shaping -----------------------------------------------------------
    def select(self, *cols: Column | str) -> "SelectBuilder":
        self._projections.extend(cols)
        return self

    def order_by(self, col: str, ascending: bool = True) -> "SelectBuilder":
        self._order.append((col, ascending))
        return self

    orderBy = order_by

    def skip(self, n: int) -> "SelectBuilder":
        self._skip = n
        return self

    def limit(self, n: int) -> "SelectBuilder":
        self._limit = n
        return self

    def parallel(self) -> "SelectBuilder":
        return self  # Spark is always parallel (SelectParallelIterator analog)

    # -- vector k-NN branch (Select.java:66-69 vectorProperty/vectorQuery/
    # vectorK/vectorApproximate) ------------------------------------------
    def vector_property(self, prop: str) -> "SelectBuilder":
        self._vector_prop = prop
        return self

    def vector_query(self, query: list[float]) -> "SelectBuilder":
        self._vector_query = list(query)
        return self

    def vector_k(self, k: int) -> "SelectBuilder":
        self._vector_k = int(k)
        return self

    def vector_approximate(self, approx: bool = True) -> "SelectBuilder":
        self._vector_approx = bool(approx)
        return self

    # -- execution ---------------------------------------------------------
    def df(self) -> DataFrame:
        if self._type is None:
            raise ValueError("No target type; call from_type()")
        df = self.db.schema.table(self._type)
        for c in self._conds:
            df = df.filter(c)
        if getattr(self, "_vector_prop", None) is not None:
            # kNN branch: score + top-k ordering replaces ORDER BY
            # (exact = crossJoin-free Column math + TakeOrderedAndProject;
            # approximate = LSH-bucketed candidate pruning)
            if getattr(self, "_vector_query", None) is None:
                raise ValueError("vector_property() needs vector_query()")
            k = getattr(self, "_vector_k", 10)
            q = F.array(*[F.lit(float(v)) for v in self._vector_query])
            # vector_approximate() is accepted for API parity
            # (Select.java:69 toggles the HNSW index); without a
            # prebuilt index the exact scan IS the plan — use
            # arcadedb_spark.vector.ivf for the indexed ANN path.
            from arcadedb_spark.vector.distance import cosine_similarity

            df = (
                df.withColumn(
                    "score", cosine_similarity(F.col(self._vector_prop), q)
                )
                .orderBy(F.desc("score"))
                .limit(k)
            )
        if self._projections:
            df = df.select(*self._projections)
        if self._order:
            df = df.orderBy(
                *[F.col(c).asc() if asc else F.col(c).desc() for c, asc in self._order]
            )
        if self._skip is not None:
            df = df.offset(self._skip)
        if self._limit is not None:
            df = df.limit(self._limit)
        return df

    def vertices(self) -> DataFrame:
        return self.df()

    def documents(self) -> DataFrame:
        return self.df()

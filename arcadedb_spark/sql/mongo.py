"""MongoDB query-language skin.

Parity: mongodbw/src/main/java/com/arcadedb/mongo/
MongoDBDatabaseWrapper.java:142 (query envelope ``{"collection": c,
"query": {...}, "numberToSkip": n, "numberToReturn": n}``) and
MongoDBToSqlTranslator.java:96-140 (operator set: $eq $ne $lt $lte $gt
$gte $in $nin $exists $size $or $and $not, implicit-equality fields,
$orderby).

Like every other language skin here, the output is a DataFrame program —
the filter document compiles to one Column predicate tree, so Catalyst
pushes it into the parquet scan exactly as a WHERE clause would.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_OPS = {"$eq", "$ne", "$lt", "$lte", "$gt", "$gte", "$in", "$nin",
        "$exists", "$size", "$not", "$regex"}


def _compile_operator(col: Column, op: str, value) -> Column:
    if op == "$eq":
        return col == F.lit(value)
    if op == "$ne":
        return col.isNull() | (col != F.lit(value))
    if op == "$lt":
        return col < F.lit(value)
    if op == "$lte":
        return col <= F.lit(value)
    if op == "$gt":
        return col > F.lit(value)
    if op == "$gte":
        return col >= F.lit(value)
    if op == "$in":
        return col.isin(list(value))
    if op == "$nin":
        return ~col.isin(list(value))
    if op == "$exists":
        return col.isNotNull() if value else col.isNull()
    if op == "$size":
        return F.size(col) == int(value)
    if op == "$regex":
        return col.rlike(str(value))
    if op == "$not":
        return ~_compile_field(col, value)
    raise ValueError(f"Unsupported Mongo operator: {op}")


def _compile_field(col: Column, spec) -> Column:
    """Field spec: literal (implicit $eq) or {$op: v, ...} conjunction."""
    if isinstance(spec, dict):
        if any(k.startswith("$") for k in spec):
            cond = None
            for op, v in spec.items():
                c = _compile_operator(col, op, v)
                cond = c if cond is None else cond & c
            return cond
    return col == F.lit(spec)


def compile_filter(doc: dict) -> Column:
    """Query document → one Column predicate
    (MongoDBToSqlTranslator.java:46-140)."""
    cond = None
    for key, spec in doc.items():
        if key == "$or":
            c = None
            for sub in spec:
                s = compile_filter(sub)
                c = s if c is None else c | s
        elif key == "$and":
            c = None
            for sub in spec:
                s = compile_filter(sub)
                c = s if c is None else c & s
        elif key == "$not":
            c = ~compile_filter(spec)
        elif key.startswith("$"):
            raise ValueError(f"Unsupported top-level operator: {key}")
        else:
            c = _compile_field(F.col(key), spec)
        cond = c if cond is None else cond & c
    return cond if cond is not None else F.lit(True)


def mongo_query(db, text: str) -> DataFrame:
    """Query envelope → DataFrame
    (MongoDBDatabaseWrapper.query :142-166)."""
    q = json.loads(text)
    if "collection" not in q:
        raise ValueError("Mongo query needs a 'collection' field")
    df = db.schema.table(q["collection"])
    body = q.get("query", {}) or {}
    orderby = body.pop("$orderby", None)
    if body:
        df = df.filter(compile_filter(body))
    projection = q.get("projection")
    if projection:
        keep = [k for k, v in projection.items() if v]
        if keep:
            df = df.select(*keep)
    if orderby:
        df = df.orderBy(
            *[
                F.col(k).asc() if int(v) >= 0 else F.col(k).desc()
                for k, v in orderby.items()
            ]
        )
    skip = int(q.get("numberToSkip", 0) or 0)
    limit = int(q.get("numberToReturn", 0) or 0)
    if skip:
        df = df.offset(skip)
    if limit:
        df = df.limit(limit)
    return df

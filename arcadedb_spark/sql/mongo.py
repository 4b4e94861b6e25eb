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
    if "aggregate" in q:
        return mongo_aggregate(db, q)
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


# ===========================================================================
# Aggregation pipeline (MongoDBDatabaseWrapper.aggregateCollection:245-266 —
# the reference delegates stage semantics to mongo-java-server's
# Aggregation; this is the same stage set compiled to DataFrame ops so
# Catalyst plans it like any SQL query: $match pushes into the scan,
# $group is one hash aggregation, $sort/$limit fuse to TakeOrdered.)
# ===========================================================================

_EXPR_OPS = {
    "$add", "$subtract", "$multiply", "$divide", "$mod", "$pow", "$abs",
    "$ceil", "$floor", "$round", "$sqrt", "$concat", "$toLower", "$toUpper",
    "$strLenCP", "$substrCP", "$trim", "$cond", "$ifNull", "$eq", "$ne",
    "$lt", "$lte", "$gt", "$gte", "$and", "$or", "$not", "$literal",
    "$toString", "$toInt", "$toLong", "$toDouble", "$size", "$year",
    "$month", "$dayOfMonth", "$hour", "$minute", "$second",
}


def compile_expr(spec) -> Column:
    """Aggregation expression → Column: ``"$field"`` references, literals,
    operator documents ({$add: [...]}, {$cond: ...})."""
    if isinstance(spec, str) and spec.startswith("$"):
        return F.col(spec[1:])
    if isinstance(spec, dict):
        if len(spec) != 1:
            raise ValueError(
                f"Aggregation expression must have exactly one operator: "
                f"{sorted(spec)}"
            )
        op, args = next(iter(spec.items()))
        if not op.startswith("$"):
            raise ValueError(f"Unknown aggregation expression field: {op}")
        if op == "$literal":
            return F.lit(args)
        if op == "$cond" and isinstance(args, dict):
            return F.when(
                compile_expr(args["if"]), compile_expr(args["then"])
            ).otherwise(compile_expr(args["else"]))
        if op == "$trim":
            return F.trim(compile_expr(
                args["input"] if isinstance(args, dict) else args
            ))
        a = [compile_expr(x) for x in args] if isinstance(args, list) \
            else [compile_expr(args)]
        if op == "$add":
            out = a[0]
            for c in a[1:]:
                out = out + c
            return out
        if op == "$subtract":
            return a[0] - a[1]
        if op == "$multiply":
            out = a[0]
            for c in a[1:]:
                out = out * c
            return out
        if op == "$divide":
            return a[0] / a[1]
        if op == "$mod":
            return a[0] % a[1]
        if op == "$pow":
            return F.pow(a[0], a[1])
        if op == "$abs":
            return F.abs(a[0])
        if op == "$ceil":
            return F.ceil(a[0])
        if op == "$floor":
            return F.floor(a[0])
        if op == "$round":
            return F.round(a[0], 0) if len(a) == 1 else F.round(
                a[0], int(args[1])
            )
        if op == "$sqrt":
            return F.sqrt(a[0])
        if op == "$concat":
            return F.concat(*a)
        if op == "$toLower":
            return F.lower(a[0])
        if op == "$toUpper":
            return F.upper(a[0])
        if op == "$strLenCP":
            return F.length(a[0])
        if op == "$substrCP":
            # Mongo is 0-based, substring() 1-based
            return F.substring(a[0], compile_expr(args[1]) + 1,
                               compile_expr(args[2]))
        if op == "$cond":
            return F.when(a[0], a[1]).otherwise(a[2])
        if op == "$ifNull":
            return F.coalesce(*a)
        if op == "$eq":
            return a[0].eqNullSafe(a[1])
        if op == "$ne":
            return ~a[0].eqNullSafe(a[1])
        if op == "$lt":
            return a[0] < a[1]
        if op == "$lte":
            return a[0] <= a[1]
        if op == "$gt":
            return a[0] > a[1]
        if op == "$gte":
            return a[0] >= a[1]
        if op == "$and":
            out = a[0]
            for c in a[1:]:
                out = out & c
            return out
        if op == "$or":
            out = a[0]
            for c in a[1:]:
                out = out | c
            return out
        if op == "$not":
            return ~a[0]
        if op == "$toString":
            return a[0].cast("string")
        if op == "$toInt":
            return a[0].cast("int")
        if op == "$toLong":
            return a[0].cast("long")
        if op == "$toDouble":
            return a[0].cast("double")
        if op == "$toDecimal":
            return a[0].cast("decimal(25,6)")
        if op == "$size":
            return F.size(a[0])
        if op == "$year":
            return F.year(a[0])
        if op == "$month":
            return F.month(a[0])
        if op == "$dayOfMonth":
            return F.dayofmonth(a[0])
        if op == "$hour":
            return F.hour(a[0])
        if op == "$minute":
            return F.minute(a[0])
        if op == "$second":
            return F.second(a[0])
        raise ValueError(f"Unsupported aggregation operator: {op}")
    return F.lit(spec)


def _group_acc(spec: dict) -> Column:
    """Accumulator document → aggregate Column ($group stage)."""
    if not (isinstance(spec, dict) and len(spec) == 1):
        raise ValueError(f"Accumulator must be a one-operator doc: {spec}")
    op, arg = next(iter(spec.items()))
    if op == "$sum":
        if isinstance(arg, (int, float)) and not isinstance(arg, bool):
            # {$sum: 1} = count; {$sum: k} = k * count
            return (F.count(F.lit(1)) * F.lit(arg)) if arg != 1 \
                else F.count(F.lit(1))
        return F.sum(compile_expr(arg))
    if op == "$avg":
        return F.avg(compile_expr(arg))
    if op == "$min":
        return F.min(compile_expr(arg))
    if op == "$max":
        return F.max(compile_expr(arg))
    if op == "$count":
        return F.count(F.lit(1))
    if op == "$first":
        return F.first(compile_expr(arg), ignorenulls=False)
    if op == "$last":
        return F.last(compile_expr(arg), ignorenulls=False)
    if op == "$push":
        return F.collect_list(compile_expr(arg))
    if op == "$addToSet":
        return F.array_distinct(F.collect_list(compile_expr(arg)))
    if op == "$stdDevPop":
        return F.stddev_pop(compile_expr(arg))
    if op == "$stdDevSamp":
        return F.stddev_samp(compile_expr(arg))
    raise ValueError(f"Unsupported $group accumulator: {op}")


def _stage_group(df: DataFrame, spec: dict) -> DataFrame:
    gid = spec.get("_id", "missing")
    keys: list[Column] = []
    if gid is None:
        pass  # single global group
    elif isinstance(gid, dict):
        keys = [compile_expr(v).alias(k) for k, v in gid.items()]
    else:
        keys = [compile_expr(gid).alias("_id")]
    aggs = [
        _group_acc(acc).alias(name)
        for name, acc in spec.items()
        if name != "_id"
    ]
    if not aggs:
        return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n")) \
                 .drop("__n") if keys else df.select(F.lit(None).alias("_id")).limit(1)
    if keys:
        out = df.groupBy(*keys).agg(*aggs)
        if isinstance(gid, dict):
            # compound _id: rewrap the key columns as an _id struct
            out = out.select(
                F.struct(*[F.col(k) for k in gid]).alias("_id"),
                *[a for a in out.columns if a not in gid],
            )
        return out
    out = df.agg(*aggs)
    return out.select(F.lit(None).alias("_id"), *out.columns)


def _stage_project(df: DataFrame, spec: dict) -> DataFrame:
    includes: list[Column] = []
    excludes: list[str] = []
    inclusive = None
    for k, v in spec.items():
        if v in (0, False):
            if k != "_id":
                inclusive = False if inclusive is None else inclusive
            excludes.append(k)
        elif v in (1, True):
            inclusive = True
            includes.append(F.col(k).alias(k))
        else:
            inclusive = True
            includes.append(compile_expr(v).alias(k))
    if inclusive is False or (inclusive is None and excludes):
        keep = [c for c in df.columns if c not in excludes]
        return df.select(*keep)
    return df.select(*includes)


def mongo_aggregate(db, doc: dict) -> DataFrame:
    """``{"aggregate": coll, "pipeline": [...]}`` →  DataFrame
    (MongoDBDatabaseWrapper.aggregateCollection:245-266).  Stages:
    $match $group $project $addFields/$set $unset $sort $skip $limit
    $unwind $count.  $changeStream is the streaming path and is not
    supported in batch."""
    df = db.schema.table(doc["aggregate"])
    for stage in doc.get("pipeline", []) or []:
        if not (isinstance(stage, dict) and len(stage) == 1):
            raise ValueError(f"Each pipeline stage is a one-key doc: {stage}")
        op, spec = next(iter(stage.items()))
        if op == "$match":
            df = df.filter(compile_filter(spec))
        elif op == "$group":
            df = _stage_group(df, spec)
        elif op == "$project":
            df = _stage_project(df, spec)
        elif op in ("$addFields", "$set"):
            for k, v in spec.items():
                df = df.withColumn(k, compile_expr(v))
        elif op == "$unset":
            df = df.drop(*(spec if isinstance(spec, list) else [spec]))
        elif op == "$sort":
            df = df.orderBy(*[
                F.col(k).asc() if int(v) >= 0 else F.col(k).desc()
                for k, v in spec.items()
            ])
        elif op == "$skip":
            df = df.offset(int(spec))
        elif op == "$limit":
            df = df.limit(int(spec))
        elif op == "$count":
            df = df.agg(F.count(F.lit(1)).alias(str(spec)))
        elif op == "$unwind":
            path = spec["path"] if isinstance(spec, dict) else spec
            fld = path[1:] if path.startswith("$") else path
            if isinstance(spec, dict) and spec.get(
                "preserveNullAndEmptyArrays"
            ):
                df = df.withColumn(fld, F.explode_outer(F.col(fld)))
            else:
                df = df.withColumn(fld, F.explode(F.col(fld)))
        elif op == "$lookup":
            # left outer equality join collecting matches into an array
            # field (classic $lookup form)
            other = db.schema.table(spec["from"])
            ff = spec["foreignField"]
            lf = spec["localField"]
            arr = F.collect_list(
                F.struct(*[F.col(c) for c in other.columns])
            ).alias("__lk_arr")
            grouped = other.groupBy(F.col(ff).alias("__lk_key")).agg(arr)
            df = (
                df.join(grouped, F.col(lf) == F.col("__lk_key"),
                        "left_outer")
                .withColumn(
                    spec["as"],
                    F.coalesce(
                        F.col("__lk_arr"),
                        F.expr("array()").cast(
                            grouped.schema["__lk_arr"].dataType
                        ),
                    ),
                )
                .drop("__lk_key", "__lk_arr")
            )
        elif op == "$sortByCount":
            df = (
                df.groupBy(compile_expr(spec).alias("_id"))
                .agg(F.count(F.lit(1)).alias("count"))
                .orderBy(F.col("count").desc(), F.col("_id"))
            )
        elif op == "$changeStream":
            raise ValueError(
                "$changeStream is a streaming cursor — use the Structured "
                "Streaming surface (arcadedb_spark.streaming) instead"
            )
        else:
            raise ValueError(f"Unsupported pipeline stage: {op}")
    return df

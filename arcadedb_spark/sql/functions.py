"""SQL function registry: ArcadeDB function name → pyspark Column builder.

Reference surface: 149 registrations in
engine/src/main/java/com/arcadedb/function/sql/DefaultSQLFunctionFactory.java
(+ function/sql/** implementations).  Design rule (SURVEY.md §M2): map to
JVM-side built-ins first — Python UDFs only where Spark has no equivalent,
so the hot path stays inside whole-stage codegen at 100 TB.

Aggregates are listed separately: the translator must know which calls
force a groupBy (the reference splits projections the same way in
query/sql/executor/SelectExecutionPlanner.java:921).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

# name (lowercase) → aggregate builder(args, distinct) -> Column
AGGREGATES: dict[str, Callable[..., Column]] = {}
# name (lowercase) → scalar builder(args) -> Column
SCALARS: dict[str, Callable[..., Column]] = {}


def agg(name: str):
    def deco(fn):
        AGGREGATES[name.lower()] = fn
        return fn

    return deco


def scalar(name: str, *aliases: str):
    def deco(fn):
        SCALARS[name.lower()] = fn
        for a in aliases:
            SCALARS[a.lower()] = fn
        return fn

    return deco


# Names that are BOTH aggregate (one collection argument, folded across
# the group) and scalar (two+ collection arguments, per row) in the
# reference dialect (SQLFunctionIntersect/Difference/UnionAll.java
# dispatch on argument count at execute time).
DUAL_MODE = {"intersect", "difference", "unionall", "symmetricdifference"}


def is_aggregate(name: str, nargs: "int | None" = None) -> bool:
    key = name.lower()
    if key in DUAL_MODE and nargs is not None and nargs >= 2:
        return False  # multi-argument form is the per-row scalar
    return key in AGGREGATES


# ---------------------------------------------------------------------------
# Aggregates (function/sql/math/SQLFunction{Count,Min,Max,Sum,Average,...}.java,
# function/sql/coll/SQLFunction{List,Set,Map,...}.java)
# ---------------------------------------------------------------------------


@agg("count")
def _count(args, distinct=False):
    if not args:  # count(*) parses to zero args or Star
        return F.count(F.lit(1))
    if distinct:
        return F.countDistinct(*args)
    return F.count(args[0])


@agg("min")
def _min(args, distinct=False):
    return F.least(*args) if len(args) > 1 else F.min(args[0])


@agg("max")
def _max(args, distinct=False):
    return F.greatest(*args) if len(args) > 1 else F.max(args[0])


@agg("sum")
def _sum(args, distinct=False):
    return F.sum_distinct(args[0]) if distinct else F.sum(args[0])


@agg("avg")
def _avg(args, distinct=False):
    return F.avg(args[0])


@agg("median")
def _median(args, distinct=False):
    return F.median(args[0])


@agg("percentile")
def _percentile(args, distinct=False):
    # percentile(field, q [, q2…]) — exact, matches SQLFunctionPercentile
    if len(args) == 2:
        return F.percentile(args[0], args[1])
    return F.percentile(args[0], F.array(*args[1:]))


@agg("mode")
def _mode(args, distinct=False):
    return F.mode(args[0])


@agg("stddev")
@agg("stdev")
@agg("stdev_samp")
@agg("stddev_samp")
def _stddev(args, distinct=False):
    return F.stddev_samp(args[0])


@agg("stddevpop")
@agg("stddevp")
@agg("stdevp")
@agg("stdev_pop")
@agg("stddev_pop")
def _stddevpop(args, distinct=False):
    return F.stddev_pop(args[0])


@agg("variance")
def _variance(args, distinct=False):
    return F.var_samp(args[0])


@agg("variancepop")
@agg("variancep")
def _variancepop(args, distinct=False):
    return F.var_pop(args[0])


@agg("first")
def _first(args, distinct=False):
    return F.first(args[0], ignorenulls=False)


@agg("last")
def _last(args, distinct=False):
    return F.last(args[0], ignorenulls=False)


@agg("list")
def _list(args, distinct=False):
    return F.collect_list(args[0])


@agg("collect")
def _collect(args, distinct=False):
    # Cypher collect() — null-ignoring, like Spark's collect_list/_set
    # (function/agg/CollectFunction.java, CollectDistinctFunction.java)
    return F.collect_set(args[0]) if distinct else F.collect_list(args[0])


@agg("set")
def _set(args, distinct=False):
    return F.collect_set(args[0])


@agg("unionall")
def _unionall(args, distinct=False):
    # unionall(collectionField) over a group = flatten of all collections
    return F.flatten(F.collect_list(args[0]))


@agg("bool_and")
def _bool_and(args, distinct=False):
    return F.bool_and(args[0])


@agg("bool_or")
def _bool_or(args, distinct=False):
    return F.bool_or(args[0])


@agg("approx_count_distinct")
def _approx_cd(args, distinct=False):
    return F.approx_count_distinct(args[0])


@agg("map")
def _map_agg(args, distinct=False):
    """map(k, v) aggregate — one map per group
    (function/sql/coll/SQLFunctionMap.java)."""
    return F.map_from_entries(
        F.collect_list(F.struct(args[0].alias("key"), args[1].alias("value")))
    )


@agg("intersect")
def _intersect_agg(args, distinct=False):
    """Set intersection of per-row collections across the group
    (SQLFunctionIntersect.java aggregate mode) — collect then fold with
    array_intersect, all JVM-side."""
    lists = F.collect_list(args[0])
    return F.aggregate(
        F.slice(lists, 2, F.greatest(F.size(lists) - 1, F.lit(0))),
        F.element_at(lists, 1),
        lambda acc, x: F.array_intersect(acc, x),
    )


@agg("difference")
def _difference_agg(args, distinct=False):
    """First collection minus every later one
    (SQLFunctionDifference.java aggregate mode)."""
    lists = F.collect_list(args[0])
    return F.aggregate(
        F.slice(lists, 2, F.greatest(F.size(lists) - 1, F.lit(0))),
        F.element_at(lists, 1),
        lambda acc, x: F.array_except(acc, x),
    )


@agg("product")
def _product_agg(args, distinct=False):
    """Π of values (function/agg/AggProduct.java) — fold over the
    collected values, exact for zeros/negatives unlike exp∘sum∘ln."""
    return F.aggregate(
        F.collect_list(args[0].cast("double")),
        F.lit(1.0),
        lambda acc, x: acc * x,
    )


@agg("nth")
def _nth_agg(args, distinct=False):
    """nth(value, n) in group iteration order
    (function/agg/AggNth.java; 0-based like the reference)."""
    from arcadedb_spark.sql.litreg import value_of

    n = int(value_of(args[1]) or 0)
    return F.element_at(F.collect_list(args[0]), n + 1)


def _check_percentile_arg(args):
    """[0, 1] range check: literal args raise at compile time, column
    args get a runtime guard (TCK Aggregation6)."""
    from arcadedb_spark.sql.litreg import value_of

    v = value_of(args[1]) if len(args) > 1 else None
    if v is not None:
        if not (0 <= float(v) <= 1):
            raise ValueError(
                f"percentile argument {v} out of [0, 1] (NumberOutOfRange)"
            )
        return args[1]
    raise ValueError(
        "percentile argument must be a numeric literal in [0, 1] "
        "(NumberOutOfRange)"
    )


@agg("percentilecont")
def _percentile_cont(args, distinct=False):
    """Cypher percentileCont — continuous (interpolated) percentile
    (function/agg/PercentileContFunction.java)."""
    pct = _check_percentile_arg(args)
    return F.percentile(args[0], pct)


@agg("percentiledisc")
def _percentile_disc(args, distinct=False):
    """Cypher percentileDisc — nearest-rank (discrete) percentile
    (function/agg/PercentileDiscFunction.java)."""
    pct = _check_percentile_arg(args)
    lists = F.array_sort(F.collect_list(args[0]))
    idx = F.ceil(pct * F.size(lists)).cast("int")
    return F.element_at(lists, F.greatest(idx, F.lit(1)))


@agg("statistics")
def _statistics_agg(args, distinct=False):
    """One-struct summary (function/agg/AggStatistics.java)."""
    c = args[0]
    return F.struct(
        F.count(c).alias("count"),
        F.min(c).alias("min"),
        F.max(c).alias("max"),
        F.avg(c).alias("mean"),
        F.sum(c).alias("sum"),
        F.stddev_samp(c).alias("stddev"),
    )


# ---------------------------------------------------------------------------
# Scalar: misc (function/sql/misc/*.java)
# ---------------------------------------------------------------------------


@scalar("arrayremoveitem")
def _array_remove_item(args):
    """UPDATE … REMOVE coll = value (UpdateRemoveItem.java): drop the
    matching element(s) from a collection property."""
    return F.array_remove(args[0], args[1])


@scalar("coalesce")
def _coalesce(args):
    return F.coalesce(*args)


@scalar("if")
def _if(args):
    out = F.when(args[0], args[1])
    return out.otherwise(args[2]) if len(args) > 2 else out


@scalar("ifnull")
def _ifnull(args):
    return F.coalesce(args[0], args[1])


@scalar("ifempty")
def _ifempty(args):
    return F.when(
        args[0].isNull() | (F.length(args[0].cast("string")) == 0), args[1]
    ).otherwise(args[0])


@scalar("uuid")
def _uuid(args):
    return F.expr("uuid()")


@scalar("md5")
def _md5(args):
    return F.md5(args[0].cast("binary"))


@scalar("sha1")
def _sha1(args):
    return F.sha1(args[0].cast("binary"))


@scalar("sha256")
def _sha256(args):
    return F.sha2(args[0].cast("binary"), 256)


@scalar("json_extract", "get_json_object")
def _json_extract(args):
    # json_extract(jsonString, '$.path') → string value
    # (query/sql/method/misc/SQLMethodToJSON + ConvertFromJsonMap analog —
    # schema-flexible dynamic properties arrive as JSON strings)
    return F.get_json_object(args[0], _lit_str(args[1]))


@scalar("encode")
def _encode(args):
    return F.base64(args[0].cast("binary"))


@scalar("decode")
def _decode(args):
    return F.unbase64(args[0])


# ---------------------------------------------------------------------------
# Scalar: math (function/sql/math/*.java, function/math/*.java)
# ---------------------------------------------------------------------------

for _name, _fn in {
    "abs": F.abs, "sqrt": F.sqrt, "exp": F.exp, "log": F.log10, "ln": F.log,
    "floor": F.floor, "ceil": F.ceil, "sign": F.signum, "sin": F.sin,
    "cos": F.cos, "tan": F.tan, "asin": F.asin, "acos": F.acos,
    "atan": F.atan, "sinh": F.sinh, "cosh": F.cosh, "tanh": F.tanh,
    "degrees": F.degrees, "radians": F.radians, "isnan": F.isnan,
}.items():
    SCALARS[_name] = (lambda f: lambda args: f(args[0]))(_fn)


@scalar("pow")
def _pow(args):
    return F.pow(args[0], args[1])


@scalar("atan2")
def _atan2(args):
    return F.atan2(args[0], args[1])


@scalar("round")
def _round(args):
    return F.round(args[0], 0 if len(args) < 2 else _as_py_int(args[1]))


def _as_py_int(col_or_lit):
    # round() scale must be a python int in pyspark; literals arrive as
    # Columns — recover the value via the litreg side channel.
    from arcadedb_spark.sql.litreg import value_of

    v = value_of(col_or_lit)
    if v is None:
        raise ValueError("argument must be a literal integer")
    return int(v)


@scalar("rand")
def _rand(args):
    return F.rand()


@scalar("pi")
def _pi(args):
    return F.lit(3.141592653589793)


@scalar("sigmoid")
def _sigmoid(args):
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-args[0]))


# ---------------------------------------------------------------------------
# Scalar: strings (function/sql/text/*.java, function/text/*.java)
# ---------------------------------------------------------------------------


@scalar("concat")
def _concat(args):
    return F.concat(*[a.cast("string") for a in args])


@scalar("format")
def _format(args):
    # format('%s - %d', a, b) — printf-style (SQLFunctionFormat)
    return F.format_string(_lit_str(args[0]), *args[1:])


def _lit_str(col) -> str:
    from arcadedb_spark.sql.litreg import value_of

    v = value_of(col)
    if v is None:
        raise ValueError("argument must be a literal string")
    return str(v)


@scalar("strcmpci")
def _strcmpci(args):
    return F.when(F.lower(args[0]) == F.lower(args[1]), 0).otherwise(
        F.when(F.lower(args[0]) < F.lower(args[1]), -1).otherwise(1)
    )


@scalar("levenshtein")
def _levenshtein(args):
    return F.levenshtein(args[0], args[1])


@scalar("levenshteinsimilarity")
def _levenshtein_similarity(args):
    # 1 − lev/max(len) (function/text/LevenshteinSimilarityFunction.java)
    a, b = args[0].cast("string"), args[1].cast("string")
    mx = F.greatest(F.length(a), F.length(b))
    return F.when(mx == 0, 1.0).otherwise(1.0 - F.levenshtein(a, b) / mx)


@scalar("hamming")
def _hamming(args):
    # differing positions + length difference (function/text/HammingFunction)
    a, b = args[0].cast("string"), args[1].cast("string")
    ca = F.split(a, "(?!^)")
    cb = F.split(b, "(?!^)")
    diff = F.size(
        F.filter(F.zip_with(ca, cb, lambda x, y: x.eqNullSafe(y)), lambda m: ~m)
    )
    return diff


def _words(col) -> Column:
    return F.filter(
        F.split(F.lower(col.cast("string")), r"[^\p{L}\p{N}]+"),
        lambda t: F.length(t) > 0,
    )


@scalar("camelcase")
def _camel_case(args):
    # helloWorld (function/text/CamelCaseFunction.java)
    w = _words(args[0])
    return F.concat(
        F.element_at(w, 1),
        F.array_join(
            F.transform(F.slice(w, 2, F.size(w)), lambda t: F.initcap(t)), ""
        ),
    )


@scalar("snakecase")
def _snake_case(args):
    return F.array_join(_words(args[0]), "_")


@scalar("slug")
def _slug(args):
    return F.array_join(_words(args[0]), "-")


@scalar("length")
def _length(args):
    return F.length(args[0])


@scalar("sorensendicesimilarity", "sorensendice")
def _sorensen_dice(args):
    """2·|bigrams∩| / (|A|+|B|) over lowercased bigram SETS
    (function/text/TextSorensenDiceSimilarity.java:69-81) — pure Column
    ops: Column.substr accepts Column offsets, so the bigram arrays stay
    inside whole-stage codegen."""
    a, b = args[0].cast("string"), args[1].cast("string")

    def bigrams(c):
        return F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length(c) - 1, F.lit(0))),
                lambda i: F.lower(c.substr(i, F.lit(2))),
            )
        )

    ba, bb = bigrams(a), bigrams(b)
    both_short = (F.length(a) < 2) | (F.length(b) < 2)
    return (
        F.when(a == b, F.lit(1.0))
        .when(both_short, F.lit(0.0))
        .otherwise(
            2.0 * F.size(F.array_intersect(ba, bb)) / (F.size(ba) + F.size(bb))
        )
    )


@scalar("jarowinklerdistance", "jarowinkler")
def _jaro_winkler(args):
    """Jaro-Winkler similarity 0-1, prefix weight 0.1, prefix cap 4
    (function/text/TextJaroWinklerDistance.java) — iterative matching
    window, so a pandas UDF."""
    from arcadedb_spark.text.similarity import jaro_winkler_udf

    return jaro_winkler_udf()(args[0].cast("string"), args[1].cast("string"))


# ---------------------------------------------------------------------------
# Scalar: date/time (function/sql/time/*.java, function/date/*.java)
# ---------------------------------------------------------------------------


@scalar("sysdate")
def _sysdate(args):
    return F.current_timestamp()


@scalar("date")
def _date(args):
    if not args:
        return F.current_date()
    if len(args) == 1:
        return F.to_timestamp(args[0])
    return F.to_timestamp(args[0], _lit_str(args[1]))


@scalar("date_format")
def _date_format(args):
    return F.date_format(args[0], _lit_str(args[1]))


@scalar("year")
def _year(args):
    return F.year(args[0])


@scalar("month")
def _month(args):
    return F.month(args[0])


@scalar("day")
def _day(args):
    return F.dayofmonth(args[0])


@scalar("hour")
def _hour(args):
    return F.hour(args[0])


@scalar("minute")
def _minute(args):
    return F.minute(args[0])


@scalar("second")
def _second(args):
    return F.second(args[0])


@scalar("date_trunc")
def _date_trunc(args):
    # date_trunc('month', ts)
    return F.date_trunc(_lit_str(args[0]), args[1])


# ---------------------------------------------------------------------------
# Scalar: collections (function/coll/*.java)
# ---------------------------------------------------------------------------


@scalar("flatten")
def _flatten(args):
    return F.flatten(args[0])


@scalar("sort")
def _sort(args):
    return F.sort_array(args[0])


@scalar("range")
def _range(args):
    from arcadedb_spark.sql.litreg import value_of

    start, end = args[0], args[1]
    if len(args) > 2:
        step = args[2]
        if value_of(step) == 0:
            from arcadedb_spark.sql.translator import TranslateError

            raise TranslateError(
                "range() step must not be zero (NumberOutOfRange)"
            )
    else:
        # Cypher default step is +1: range(0, -10) is EMPTY, not a
        # descending sequence (Spark's sequence auto-descends)
        step = F.lit(1)
    ok = ((step > 0) & (start <= end)) | ((step < 0) & (start >= end))
    return F.when(ok, F.sequence(start, end, step)).otherwise(
        F.array().cast("array<bigint>")
    )


@scalar("size")
def _size(args):
    return F.size(args[0])


@scalar("intersect")
def _intersect(args):
    out = args[0]
    for a in args[1:]:
        out = F.array_intersect(out, a)
    return out


@scalar("difference")
def _difference(args):
    # first collection minus every later one (SQLFunctionDifference.java)
    out = args[0]
    for a in args[1:]:
        out = F.array_except(out, a)
    return out


@scalar("unionall")
def _unionall_scalar(args):
    # multi-argument form: concatenation, duplicates kept
    # (SQLFunctionUnionAll.java scalar mode)
    return F.concat(*args)


@scalar("symmetricdifference")
def _symdiff(args):
    return F.array_union(
        F.array_except(args[0], args[1]), F.array_except(args[1], args[0])
    )


# ---------------------------------------------------------------------------
# Scalar: maps (function/map/*.java)
# ---------------------------------------------------------------------------


@scalar("keys")
def _keys(args):
    return F.map_keys(args[0])


@scalar("values")
def _values(args):
    return F.map_values(args[0])


# ---------------------------------------------------------------------------
# Namespaced: vector.* (function/sql/vector/*.java — distances, normalize)
# ---------------------------------------------------------------------------


def _vec_scalar(name: str, impl_name: str):
    def builder(args):
        from arcadedb_spark.vector import distance as vd

        impl = getattr(vd, impl_name)
        return impl(args[0].cast("array<double>"), args[1].cast("array<double>"))

    SCALARS[name] = builder


for _n, _i in {
    "vector.cosinesimilarity": "cosine_similarity",
    "vector.l2distance": "l2_distance",
    "vector.l1distance": "l1_distance",
    "vector.linfdistance": "linf_distance",
    "vector.dotproduct": "dot_product",
}.items():
    _vec_scalar(_n, _i)


@scalar("vector.normalize")
def _vector_normalize(args):
    from arcadedb_spark.vector.distance import normalize

    return normalize(args[0].cast("array<double>"))


def _vec_unary(name: str, module: str, impl_name: str, *extra):
    def builder(args, _m=module, _i=impl_name):
        import importlib

        impl = getattr(importlib.import_module(_m), _i)
        return impl(args[0], *[a for a in args[1:]], *extra)

    SCALARS[name] = builder


# elementwise arithmetic / norms / element stats / score transforms
# (function/sql/vector/SQLFunctionVector{Add,Subtract,Multiply,Scale,
# Clip,Sum,Avg,Min,Max,StdDev,Variance,Magnitude,L1Norm,LInfNorm,
# Dimension,HasNaN,HasInf,HasNull,IsNormalized,ToString,HybridScore,
# ScoreTransform,NormalizeScores}.java) — all pure Column math.


def _vec(c):
    return c.cast("array<double>")


def _vec_binop(name: str, op):
    def builder(args, _op=op):
        return F.zip_with(_vec(args[0]), _vec(args[1]), _op)

    SCALARS[name] = builder


_vec_binop("vector.add", lambda a, b: a + b)
_vec_binop("vector.subtract", lambda a, b: a - b)
_vec_binop("vector.multiply", lambda a, b: a * b)


@scalar("vector.scale")
def _vector_scale(args):
    s = args[1].cast("double")
    return F.transform(_vec(args[0]), lambda x: x * s)


@scalar("vector.clip")
def _vector_clip(args):
    lo, hi = args[1].cast("double"), args[2].cast("double")
    return F.transform(_vec(args[0]), lambda x: F.least(F.greatest(x, lo), hi))


@scalar("vector.sum")
def _vector_sum(args):
    return F.aggregate(_vec(args[0]), F.lit(0.0), lambda acc, x: acc + x)


@scalar("vector.avg")
def _vector_avg(args):
    v = _vec(args[0])
    return F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x) / F.size(v)


@scalar("vector.min")
def _vector_min(args):
    return F.array_min(_vec(args[0]))


@scalar("vector.max")
def _vector_max(args):
    return F.array_max(_vec(args[0]))


def _vec_var(v):
    n = F.size(v)
    s = F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x)
    s2 = F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    return s2 / n - (s / n) * (s / n)


@scalar("vector.variance")
def _vector_variance(args):
    return _vec_var(_vec(args[0]))


@scalar("vector.stddev")
def _vector_stddev(args):
    return F.sqrt(_vec_var(_vec(args[0])))


@scalar("vector.magnitude")
def _vector_magnitude(args):
    v = _vec(args[0])
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


@scalar("vector.l1norm")
def _vector_l1norm(args):
    return F.aggregate(_vec(args[0]), F.lit(0.0), lambda acc, x: acc + F.abs(x))


@scalar("vector.linfnorm")
def _vector_linfnorm(args):
    return F.array_max(F.transform(_vec(args[0]), F.abs))


@scalar("vector.dimension")
def _vector_dimension(args):
    return F.size(args[0])


@scalar("vector.hasnan")
def _vector_hasnan(args):
    return F.exists(_vec(args[0]), F.isnan)


@scalar("vector.hasinf")
def _vector_hasinf(args):
    return F.exists(
        _vec(args[0]), lambda x: (x == float("inf")) | (x == float("-inf"))
    )


@scalar("vector.hasnull")
def _vector_hasnull(args):
    return F.exists(args[0], lambda x: x.isNull())


@scalar("vector.isnormalized")
def _vector_isnormalized(args):
    from arcadedb_spark.sql.litreg import value_of

    tol = float(value_of(args[1]) or 1e-6) if len(args) > 1 else 1e-6
    v = _vec(args[0])
    mag = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.abs(mag - 1.0) <= F.lit(tol)


@scalar("vector.tostring")
def _vector_tostring(args):
    return F.concat(
        F.lit("["),
        F.array_join(F.transform(_vec(args[0]), lambda x: x.cast("string")), ", "),
        F.lit("]"),
    )


@scalar("vector.hybridscore")
def _vector_hybridscore(args):
    # alpha·vector_score + (1−alpha)·keyword_score
    vs, ks = args[0].cast("double"), args[1].cast("double")
    alpha = args[2].cast("double") if len(args) > 2 else F.lit(0.5)
    return alpha * vs + (F.lit(1.0) - alpha) * ks


@scalar("vector.scoretransform")
def _vector_scoretransform(args):
    from arcadedb_spark.sql.litreg import value_of

    s = args[0].cast("double")
    method = str(value_of(args[1]) or "LINEAR").upper()
    if method == "LINEAR":
        return s
    if method == "SIGMOID":
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-s))
    if method == "TANH":
        return F.tanh(s)
    if method in ("LOG", "LN"):
        return F.log(s + F.lit(1.0))
    if method == "EXP":
        return F.exp(s)
    raise ValueError(f"Unknown score transform '{method}'")


@scalar("vector.normalizescores")
def _vector_normalizescores(args):
    # min-max normalize a score array to [0, 1]
    v = _vec(args[0])
    lo, hi = F.array_min(v), F.array_max(v)
    rng = hi - lo
    return F.transform(
        v, lambda x: F.when(rng == 0, F.lit(1.0)).otherwise((x - lo) / rng)
    )


# quantization (SQLFunctionVectorQuantize{Int8,Binary} + dequantize)
for _n, _i in {
    "vector.quantizeint8": "quantize_int8",
    "vector.dequantizeint8": "dequantize_int8",
    "vector.quantizebinary": "quantize_binary",
    "vector.dequantizebinary": "dequantize_binary",
}.items():
    _vec_unary(_n, "arcadedb_spark.vector.quantize", _i)

# sparse vectors (SQLFunctionVectorSparse*, SparseVector.java)
for _n, _i in {
    "vector.densetosparse": "dense_to_sparse",
    "vector.sparsetodense": "sparse_to_dense",
    "vector.sparsedot": "sparse_dot",
    "vector.sparsecosine": "sparse_cosine",
    "vector.sparsemagnitude": "sparse_magnitude",
    "vector.sparsenormalize": "sparse_normalize",
    "vector.sparsity": "sparsity",
}.items():
    _vec_unary(_n, "arcadedb_spark.vector.sparse", _i)


# ---------------------------------------------------------------------------
# Geo (function/sql/geo/*.java — WKT-string geometry; point ops stay JVM
# Column math, polygon/line work goes through Arrow-batched pandas UDFs
# over arcadedb_spark.geo.core.  See geo/core.py for parity notes.
# ---------------------------------------------------------------------------

_EARTH_KM = 6371.0


@scalar("distance")
@scalar("geo.distance")
def _geo_distance(args):
    """geo.distance(p1_wkt, p2_wkt [, 'm'|'km'|'mi'|'nmi']) — haversine,
    meters default (SQLFunctionGeoDistance.java).  The legacy 4-argument
    numeric form distance(lat1, lon1, lat2, lon2 [, unit]) is kept."""
    from arcadedb_spark.geo import udfs as gu
    from arcadedb_spark.sql.litreg import value_of

    if len(args) >= 4:  # legacy numeric signature (km; 'mi' opt-in)
        lat1, lon1, lat2, lon2 = (a.cast("double") for a in args[:4])
        unit = 1.0
        if len(args) > 4 and str(value_of(args[4])).lower() == "mi":
            unit = 0.621371192
        rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
        dlat = F.radians(lat2 - lat1) / 2
        dlon = F.radians(lon2 - lon1) / 2
        a = (
            F.sin(dlat) * F.sin(dlat)
            + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) * F.sin(dlon)
        )
        return F.lit(2 * _EARTH_KM * unit) * F.asin(F.sqrt(a))
    unit_lit = value_of(args[2]) if len(args) > 2 else "m"
    if isinstance(unit_lit, str):
        # WKT points → pure Column math; non-point WKT would extract as
        # null coords, so this fast path is for the common point case
        return gu.haversine_distance(args[0], args[1], unit_lit)
    return gu.distance_any(args[0], args[1], args[2])


@scalar("geo.bboxcontains")
def _geo_bbox_contains(args):
    # geo.bboxContains(minLat, minLon, maxLat, maxLon, lat, lon)
    min_lat, min_lon, max_lat, max_lon, lat, lon = (a.cast("double") for a in args)
    return (
        (lat >= min_lat) & (lat <= max_lat) & (lon >= min_lon) & (lon <= max_lon)
    )


@scalar("point")
@scalar("geo.point")
def _geo_point(args):
    """'POINT (x y)' WKT (SQLFunctionGeoPoint.java; x = longitude)."""
    from arcadedb_spark.geo import udfs as gu

    return gu.point_wkt(args[0], args[1])


@scalar("rectangle")
@scalar("geo.rectangle")
def _geo_rectangle(args):
    from arcadedb_spark.geo import udfs as gu

    return gu.rectangle_wkt(*args[:4])


@scalar("linestring")
@scalar("geo.linestring")
def _geo_linestring(args):
    from arcadedb_spark.geo import udfs as gu

    return gu.linestring_wkt(*args)


@scalar("circle")
@scalar("geo.circle")
def _geo_circle(args):
    """circle(x, y, r) → buffered point polygon (SQLFunctionCircle.java:
    'deprecated: use geo.buffer(geo.point(x,y), radius)')."""
    from arcadedb_spark.geo import udfs as gu

    return gu.buffer(gu.point_wkt(args[0], args[1]), args[2])


@scalar("polygon")
@scalar("geo.polygon")
def _geo_polygon(args):
    """geo.polygon([[x1,y1],[x2,y2],…]) → closed POLYGON WKT
    (SQLFunctionGeoPolygon.java)."""
    pts = args[0].cast("array<array<double>>")
    first = F.element_at(pts, 1)
    # auto-close the ring when the input doesn't repeat the first point
    closed = F.when(
        F.element_at(pts, -1) == first, pts
    ).otherwise(F.concat(pts, F.array(first)))
    body = F.array_join(
        F.transform(
            closed,
            lambda p: F.concat_ws(" ",
                F.element_at(p, 1).cast("string"),
                F.element_at(p, 2).cast("string")),
        ),
        ", ",
    )
    return F.format_string("POLYGON ((%s))", body)


@scalar("geo.x")
def _geo_x(args):
    from arcadedb_spark.geo import udfs as gu

    return gu.point_x(args[0])


@scalar("geo.y")
def _geo_y(args):
    from arcadedb_spark.geo import udfs as gu

    return gu.point_y(args[0])


def _geo_pred(name: str, kernel: str):
    def builder(args, _k=kernel):
        from arcadedb_spark.geo import udfs as gu

        return gu.predicate(_k, args[0], args[1])

    SCALARS[name] = builder


for _n, _k in {
    "geo.contains": "contains",
    "geo.within": "within",
    "geo.intersects": "intersects",
    "geo.disjoint": "disjoint",
    "geo.equals": "equals",
    "geo.touches": "touches",
    "geo.crosses": "crosses",
    "geo.overlaps": "overlaps",
}.items():
    _geo_pred(_n, _k)


@scalar("geo.dwithin")
def _geo_dwithin(args):
    """geo.dWithin(g1, g2, distDegrees) — planar threshold in degrees
    (SQLFunctionGeoDWithin.java)."""
    from arcadedb_spark.geo import udfs as gu

    return gu.dwithin(args[0], args[1], args[2])


@scalar("geo.area")
def _geo_area(args):
    from arcadedb_spark.geo import udfs as gu

    return gu.area(args[0])


@scalar("geo.envelope")
def _geo_envelope(args):
    from arcadedb_spark.geo import udfs as gu

    return gu.envelope(args[0])


@scalar("geo.buffer")
def _geo_buffer(args):
    from arcadedb_spark.geo import udfs as gu

    return gu.buffer(args[0], args[1])


@scalar("geo.geomfromtext")
def _geo_geomfromtext(args):
    from arcadedb_spark.geo import udfs as gu

    return gu.geom_from_text(args[0])


@scalar("geo.astext")
def _geo_astext(args):
    from arcadedb_spark.geo import udfs as gu

    return gu.geom_from_text(args[0])  # normalize via parse→format


@scalar("geo.asgeojson")
def _geo_asgeojson(args):
    from arcadedb_spark.geo import udfs as gu

    return gu.as_geojson(args[0])


# ---------------------------------------------------------------------------
# Namespaced: ts.* time-series functions (function/sql/time/SQLFunction*.java)
#
# Scalar: ts.timeBucket('1h', ts)  (interval first — reference arg order,
# engine/src/test/java/.../timeseries/WindowFunctionTest.java usage).
# Windowed (lag/lead/delta/rate/movingAvg/rank/rowNumber): registered in
# TS_WINDOW — the translator supplies the partition keys (GROUP BY keys
# double as PARTITION BY for these, per the reference's GroupedDelta test).
# Aggregated (ts.first/ts.last): ordinary aggregates via min_by/max_by.
# ---------------------------------------------------------------------------

_DURATION_UNITS = {
    "ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000, "d": 86_400_000,
    "w": 604_800_000,
}


def parse_duration_ms(spec) -> int:
    """'1h' / '60s' / '5m' / 1500 (ms) → milliseconds."""
    from arcadedb_spark.sql.litreg import value_of

    v = value_of(spec)
    if v is None:
        v = spec
    if isinstance(v, (int, float)):
        return int(v)
    s = str(v).strip().lower()
    for unit in ("ms", "w", "d", "h", "m", "s"):
        if s.endswith(unit):
            return int(float(s[: -len(unit)])) * _DURATION_UNITS[unit]
    return int(s)


@scalar("ts.timebucket")
def _ts_timebucket(args):
    # ts.timeBucket(interval, ts) → bucket start timestamp
    # (function/sql/time/SQLFunctionTimeBucket.java:40)
    interval_ms = parse_duration_ms(args[0])
    epoch_ms = F.unix_millis(args[1])
    bucket = (epoch_ms / F.lit(interval_ms)).cast("long") * F.lit(interval_ms)
    return F.timestamp_millis(bucket)


# name → builder(args: list[Column], partition: list[Column]) -> Column
TS_WINDOW: dict[str, Callable[..., Column]] = {}


def ts_window(name: str):
    def deco(fn):
        TS_WINDOW[name.lower()] = fn
        return fn

    return deco


def _w(partition, order_col):
    from pyspark.sql import Window

    return Window.partitionBy(*partition).orderBy(order_col)


def _lit_int(col, default=None) -> int:
    from arcadedb_spark.sql.litreg import value_of

    v = value_of(col)
    if v is None:
        if default is not None:
            return default
        raise ValueError("expected a literal integer argument")
    return int(v)


@ts_window("ts.interpolate")
def _ts_interpolate(args, partition):
    """ts.interpolate(value, ts) — linear interpolation of null samples
    between their non-null neighbors (SQLFunctionInterpolate.java)."""
    from pyspark.sql import Window

    value, ts = args[0].cast("double"), args[1]
    w_prev = Window.partitionBy(*partition).orderBy(ts).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_next = Window.partitionBy(*partition).orderBy(ts).rowsBetween(
        0, Window.unboundedFollowing
    )
    pv = F.last(value, ignorenulls=True).over(w_prev)
    pt = F.last(F.when(value.isNotNull(), F.unix_millis(ts)), ignorenulls=True).over(w_prev)
    nv = F.first(value, ignorenulls=True).over(w_next)
    nt = F.first(F.when(value.isNotNull(), F.unix_millis(ts)), ignorenulls=True).over(w_next)
    cur = F.unix_millis(ts)
    interp = pv + (nv - pv) * (cur - pt) / (nt - pt)
    return F.when(value.isNotNull(), value).otherwise(
        F.when(pv.isNull(), nv).when(nv.isNull(), pv).when(nt == pt, pv).otherwise(interp)
    )


@ts_window("ts.lag")
def _ts_lag(args, partition):
    # ts.lag(value, offset, ts[, default]) — SQLFunctionLag.java:39
    from arcadedb_spark.sql.litreg import value_of

    value, offset, order = args[0], _lit_int(args[1]), args[2]
    default = value_of(args[3]) if len(args) > 3 else None
    return F.lag(value, offset, default).over(_w(partition, order))


@ts_window("ts.lead")
def _ts_lead(args, partition):
    from arcadedb_spark.sql.litreg import value_of

    value, offset, order = args[0], _lit_int(args[1]), args[2]
    default = value_of(args[3]) if len(args) > 3 else None
    return F.lead(value, offset, default).over(_w(partition, order))


@ts_window("ts.delta")
def _ts_delta(args, partition):
    # ts.delta(value, ts) — value − previous value
    value, order = args[0], args[1]
    return value - F.lag(value, 1).over(_w(partition, order))


@ts_window("ts.rate")
def _ts_rate(args, partition):
    # ts.rate(value, ts) — per-second rate vs previous sample
    value, order = args[0], args[1]
    w = _w(partition, order)
    dv = value - F.lag(value, 1).over(w)
    dt = (F.unix_millis(order) - F.unix_millis(F.lag(order, 1).over(w))) / 1000.0
    return F.when(dt > 0, dv / dt)


@ts_window("ts.movingavg")
def _ts_moving_avg(args, partition):
    # ts.movingAvg(value, n[, ts]) — trailing n-row mean
    value, n = args[0], _lit_int(args[1])
    order = args[2] if len(args) > 2 else F.col("ts")
    w = _w(partition, order).rowsBetween(-(n - 1), 0)
    return F.avg(value).over(w)


@ts_window("ts.rank")
def _ts_rank_fn(args, partition):
    # ts.rank(orderExpr) — rank with gaps (SQLFunctionRank.java:31-33)
    return F.rank().over(_w(partition, args[0]))


@ts_window("ts.rownumber")
def _ts_rownumber(args, partition):
    return F.row_number().over(_w(partition, args[0]))


@agg("ts.first")
def _ts_first(args, distinct=False):
    # ts.first(value, ts) — value at minimum timestamp
    return F.min_by(args[0], args[1])


@agg("ts.last")
def _ts_last(args, distinct=False):
    return F.max_by(args[0], args[1])


@agg("ts.correlate")
def _ts_correlate(args, distinct=False):
    """Pearson correlation of two series in the group
    (SQLFunctionCorrelate.java — ts.correlate(a, b))."""
    return F.corr(args[0].cast("double"), args[1].cast("double"))


@agg("ts.percentile")
def _ts_percentile(args, distinct=False):
    """Approximate percentile 0..1 (SQLFunctionTsPercentile.java)."""
    return F.percentile_approx(args[0], args[1])


# ---------------------------------------------------------------------------
# Misc tail: version / eval / duration (function/sql/misc/SQLFunctionVersion,
# SQLFunctionEval; function/temporal/DurationConstructorFunction.java)
# ---------------------------------------------------------------------------


@scalar("version")
def _version(args):
    from arcadedb_spark import __version__ as _v

    return F.lit(_v)


@scalar("eval")
def _eval_fn(args):
    """eval('<expr>') — parse + compile the expression string against the
    current row (SQLFunctionEval semantics; the string must be a
    literal)."""
    from arcadedb_spark.sql.litreg import value_of
    from arcadedb_spark.sql.parser import parse_expression
    from arcadedb_spark.sql.translator import Ctx, ExprCompiler

    text = value_of(args[0])
    if text is None:
        raise ValueError("eval() needs a literal expression string")
    return ExprCompiler(Ctx(db=None, params={})).compile(parse_expression(str(text)))


@scalar("duration")
def _duration(args):
    """duration(n, 'unit') → milliseconds (DurationConstructorFunction;
    Cypher durations become epoch-millis longs in this engine —
    documented mapping, SURVEY §1.2)."""
    from arcadedb_spark.sql.litreg import value_of

    unit = str(value_of(args[1]) or "ms").lower().rstrip("s")
    factor = {
        "milli": 1, "m": 60_000, "ms": 1, "millisecond": 1, "second": 1000,
        "sec": 1000, "s": 1000, "minute": 60_000, "min": 60_000,
        "hour": 3_600_000, "h": 3_600_000, "day": 86_400_000,
        "d": 86_400_000, "week": 604_800_000, "w": 604_800_000,
    }[unit]
    return (args[0].cast("double") * factor).cast("long")


@scalar("id")
def _cypher_id(args):
    """id(node) — the vertex id (function/node/NodeId.java; our vids are
    dense longs, SURVEY §1.1 RID mapping)."""
    return args[0].getField("vid")


@scalar("labels")
def _cypher_labels(args):
    """labels(node) — label array (function/node/NodeLabels.java);
    multi-label nodes store a colon-joined @type, split here; the
    internal "_" label backing unlabeled Cypher nodes reports as an
    empty array."""
    t = args[0].getField("@type")
    return F.when(
        t == "_", F.array().cast("array<string>")
    ).otherwise(F.split(t, ":"))


@scalar("startnode")
def _cypher_startnode(args):
    """startNode(edgeStruct) — the src vid (function/rel/*)."""
    return args[0].getField("src")


@scalar("endnode")
def _cypher_endnode(args):
    return args[0].getField("dst")


@scalar("type")
def _cypher_reltype(args):
    """type(rel) — relationship type name (function/rel/RelType.java)."""
    return args[0].getField("etype")


@scalar("elementid")
def _cypher_elementid(args):
    """elementId(node) — string form of the vid."""
    return args[0].getField("vid").cast("string")


@scalar("properties")
def _cypher_properties(args):
    """properties(entity) — the property struct minus internal fields
    (function/node/NodeProperties.java)."""
    out = args[0]
    for internal in ("vid", "@type", "etype", "src", "dst", "@eid"):
        out = out.dropFields(f"`{internal}`")
    return out


@scalar("tostring")
def _cypher_tostring(args):
    return args[0].cast("string")


@scalar("substring")
def _cypher_substring(args):
    """substring(s, start[, length]) — 0-indexed (openCypher; Spark's
    substring is 1-indexed)."""
    start = (args[1] + 1).cast("int")
    length = args[2].cast("int") if len(args) >= 3 else F.length(args[0])
    return args[0].substr(start, length)


@scalar("tolower")
def _cypher_tolower(args):
    return F.lower(args[0])


@scalar("toupper")
def _cypher_toupper(args):
    return F.upper(args[0])


@scalar("tointeger")
def _cypher_tointeger(args):
    # Cypher: numeric strings parse (then truncate), junk → null
    return args[0].cast("string").try_cast("double").cast("long")


@scalar("tofloat")
def _cypher_tofloat(args):
    return args[0].cast("string").try_cast("double")


@scalar("toboolean")
def _cypher_toboolean(args):
    s = F.lower(args[0].cast("string"))
    return (
        F.when(s == "true", F.lit(True))
        .when(s == "false", F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


@scalar("head")
def _cypher_head(args):
    return F.get(args[0], 0)  # null on empty (never an ANSI error)


@scalar("list.last")
def _cypher_last(args):
    """Cypher last(list) — list-element scalar (the bare name 'last' is
    the reference SQL aggregate; the Cypher parser rewrites to this)."""
    return F.get(args[0], F.size(args[0]) - 1)


@scalar("list.first")
def _cypher_first(args):
    return F.get(args[0], 0)


@scalar("tail")
def _cypher_tail(args):
    return F.slice(
        args[0], 2, F.greatest(F.size(args[0]) - 1, F.lit(0))
    )


@scalar("reverse")
def _cypher_reverse(args):
    return F.reverse(args[0])  # lists and strings


@scalar("split")
def _cypher_split(args):
    """openCypher split(string, delimiter) → list of strings; the
    delimiter is literal text, not a regex (SQLFunctionSplit semantics;
    TCK Merge5 [14])."""
    import re

    from arcadedb_spark.sql.litreg import value_of

    d = value_of(args[1])
    if d is not None:
        return F.split(args[0], re.escape(str(d)))
    return F.split(args[0], args[1])


@scalar("geo.geohash")
def _geo_geohash(args):
    """geo.geohash(lat, lon[, precision]) — base32 cell key
    (index/geospatial/LSMTreeGeoIndex.java geohash covering)."""
    from arcadedb_spark.geo.join import geohash_col
    from arcadedb_spark.sql.litreg import value_of

    precision = int(value_of(args[2]) or 9) if len(args) > 2 else 9
    return geohash_col(args[0], args[1], precision)


# ---------------------------------------------------------------------------
# Cypher-25 / reference function tail (CypherMissingFunctionsTest.java,
# CypherFollowUpsIssue5602Test.java, Issue5292TypeOnSpecialFloatTest.java):
# string trim family, unicode normalization, *OrNull/*List conversions,
# valueType/isEmpty, math tail.  Null-in -> null-out throughout (Cypher).
# ---------------------------------------------------------------------------


@scalar("lower")
def _lower_alias(args):
    return F.lower(args[0])


@scalar("upper")
def _upper_alias(args):
    return F.upper(args[0])


@scalar("trim")
def _trim(args):
    if len(args) > 1:  # trim(s, chars)
        return F.call_function("btrim", args[0], args[1])
    return F.trim(args[0])


@scalar("btrim")
def _btrim(args):
    if len(args) > 1:
        return F.call_function("btrim", args[0], args[1])
    return F.trim(args[0])


@scalar("ltrim")
def _ltrim(args):
    if len(args) > 1:
        # strip leading chars-set (Cypher-25 two-arg form)
        from arcadedb_spark.sql.litreg import value_of
        import re as _re

        from arcadedb_spark.sql.litreg import is_registered_null

        if is_registered_null(args[1]):
            return F.lit(None)  # null chars → null (Cypher propagation)
        chars = value_of(args[1])
        if chars is None:
            raise ValueError("ltrim(s, chars) needs a literal chars string")
        return F.regexp_replace(
            args[0].cast("string"), "^[" + _re.escape(str(chars)) + "]+", ""
        )
    return F.ltrim(args[0])


@scalar("rtrim")
def _rtrim(args):
    if len(args) > 1:
        from arcadedb_spark.sql.litreg import value_of
        import re as _re

        from arcadedb_spark.sql.litreg import is_registered_null

        if is_registered_null(args[1]):
            return F.lit(None)
        chars = value_of(args[1])
        if chars is None:
            raise ValueError("rtrim(s, chars) needs a literal chars string")
        return F.regexp_replace(
            args[0].cast("string"), "[" + _re.escape(str(chars)) + "]+$", ""
        )
    return F.rtrim(args[0])


@scalar("left")
def _left(args):
    # negative n is invalid in Cypher; Spark substring handles 0 fine
    return F.when(
        args[0].isNull() | args[1].isNull(), F.lit(None).cast("string")
    ).otherwise(F.substring(args[0], 1, args[1]))


@scalar("right")
def _right(args):
    n = args[1]
    ln = F.length(args[0])
    return F.when(
        args[0].isNull() | n.isNull(), F.lit(None).cast("string")
    ).otherwise(
        F.substring(args[0], F.greatest(ln - n + 1, F.lit(1)), F.least(n, ln))
    )


@scalar("replace")
def _replace(args):
    return F.replace(args[0], args[1], args[2])


@scalar("char_length", "character_length", "charlength")
def _char_length(args):
    return F.length(args[0])


@scalar("nullif")
def _nullif(args):
    return F.when(args[0].eqNullSafe(args[1]), F.lit(None)).otherwise(args[0])


@scalar("valuetype")
def _valuetype(args):
    """valueType(x) — GQL type name (Neo4j/reference spelling:
    Issue5292TypeOnSpecialFloatTest — NaN/Infinity are FLOAT)."""
    t = F.call_function("typeof", args[0])
    return (
        F.when(args[0].isNull(), F.lit("NULL"))
        .when(t.isin("tinyint", "smallint", "int", "bigint"),
              F.lit("INTEGER NOT NULL"))
        .when(t.isin("float", "double") | t.startswith("decimal"),
              F.lit("FLOAT NOT NULL"))
        .when(t == "string", F.lit("STRING NOT NULL"))
        .when(t == "boolean", F.lit("BOOLEAN NOT NULL"))
        .when(t.startswith("array"), F.lit("LIST NOT NULL"))
        .when(t.startswith("map") | t.startswith("struct"),
              F.lit("MAP NOT NULL"))
        .otherwise(F.upper(t))
    )


@scalar("timestamp")
def _timestamp(args):
    """timestamp() — epoch millis; reuses the statement-scoped clock
    when a temporal evaluation is active so datetime()/timestamp() agree
    within one statement."""
    if args:
        raise ValueError("timestamp() takes no arguments")
    import datetime as _dt

    from arcadedb_spark.sql.temporal_eval import _NOW

    now = _NOW[-1] if _NOW else _dt.datetime.now(_dt.timezone.utc)
    return F.lit(int(now.timestamp() * 1000))


def _boolean_or_null(c):
    """Neo4j toBooleanOrNull: 'true'/'false' strings, booleans, and
    integers (0 -> false, else true); everything else -> null."""
    t = F.call_function("typeof", c)
    s = F.lower(c.cast("string"))
    return (
        F.when(t == "boolean", c.cast("boolean"))
        .when(t.isin("tinyint", "smallint", "int", "bigint"),
              c.cast("long") != 0)
        .when(s == "true", F.lit(True))
        .when(s == "false", F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


@scalar("tobooleanornull")
def _to_boolean_or_null(args):
    return _boolean_or_null(args[0])


@scalar("tointegerornull")
def _to_integer_or_null(args):
    return args[0].try_cast("bigint")


@scalar("tofloatornull")
def _to_float_or_null(args):
    return args[0].try_cast("double")


@scalar("tostringornull")
def _to_string_or_null(args):
    t = F.call_function("typeof", args[0])
    return F.when(
        t.startswith("array") | t.startswith("map") | t.startswith("struct"),
        F.lit(None).cast("string"),
    ).otherwise(args[0].cast("string"))


@scalar("tostringlist")
def _to_string_list(args):
    return F.transform(_typed_list_arg(args[0]),
                       lambda x: x.cast("string"))


@scalar("tointegerlist")
def _to_integer_list(args):
    return F.transform(_typed_list_arg(args[0]),
                       lambda x: x.try_cast("bigint"))


@scalar("tofloatlist")
def _to_float_list(args):
    return F.transform(_typed_list_arg(args[0]),
                       lambda x: x.try_cast("double"))


@scalar("tobooleanlist")
def _to_boolean_list(args):
    return F.transform(_typed_list_arg(args[0]), _boolean_or_null)


def _typed_list_arg(arg):
    """to*List(null): a NULL-typed literal fails transform() analysis —
    pin it to array<string> (the value is null either way).  Registered
    literal None is the compile-time signal; frame columns are already
    array-typed."""
    from arcadedb_spark.sql.litreg import value_of

    if isinstance(arg, Column) and id(arg) in _litreg_ids() \
            and value_of(arg) is None:
        return F.lit(None).cast("array<string>")
    return arg


def _litreg_ids():
    from arcadedb_spark.sql import litreg

    return litreg._literals


@scalar("cot")
def _cot(args):
    # pow(0, -1) -> Infinity (IEEE), where a plain division would raise
    # DIVIDE_BY_ZERO under ANSI mode; Neo4j cot(0) is Infinity
    return F.cos(args[0]) * F.pow(F.sin(args[0]), F.lit(-1.0))


@scalar("coth")
def _coth(args):
    return F.cosh(args[0]) * F.pow(F.sinh(args[0]), F.lit(-1.0))


@scalar("haversin")
def _haversin(args):
    return (1.0 - F.cos(args[0])) / 2.0


@scalar("log10")
def _log10(args):
    return F.log10(args[0])


@scalar("e")
def _e_const(args):
    import math as _m

    return F.lit(_m.e)


def _nfc_kernel(form_default: str, check: bool):
    import pandas as pd  # noqa: F401

    from pyspark.sql.functions import pandas_udf

    if check:
        @pandas_udf("boolean")
        def _k(s, form):
            import unicodedata

            return pd.Series([
                None if v is None else unicodedata.is_normalized(
                    (f or form_default).upper(), v
                )
                for v, f in zip(s, form)
            ])
    else:
        @pandas_udf("string")
        def _k(s, form):
            import unicodedata

            return pd.Series([
                None if v is None else unicodedata.normalize(
                    (f or form_default).upper(), v
                )
                for v, f in zip(s, form)
            ])
    return _k


_NORMALIZE_UDF = None
_IS_NORMALIZED_UDF = None


@scalar("normalize")
def _normalize(args):
    """normalize(s[, form]) — unicode normalization, NFC default
    (Cypher-25; CypherMissingFunctionsTest.normalize)."""
    global _NORMALIZE_UDF
    if _NORMALIZE_UDF is None:
        _NORMALIZE_UDF = _nfc_kernel("NFC", check=False)
    form = args[1] if len(args) > 1 else F.lit("NFC")
    return _NORMALIZE_UDF(args[0], form)


@scalar("isnormalized")
def _is_normalized(args):
    global _IS_NORMALIZED_UDF
    if _IS_NORMALIZED_UDF is None:
        _IS_NORMALIZED_UDF = _nfc_kernel("NFC", check=True)
    form = args[1] if len(args) > 1 else F.lit("NFC")
    return _IS_NORMALIZED_UDF(args[0], form)


@scalar("exists")
def _exists_value(args):
    """exists(value) — true iff the value is not null (reference
    CypherExistsTest value form; pattern/property forms are handled
    upstream in the compiler)."""
    return args[0].isNotNull()


# --- coll.* namespace (reference coll/apoc.coll function family,
# CypherMissingFunctionsTest.java) -----------------------------------------


@scalar("coll.distinct", "apoc.coll.distinct")
def _coll_distinct(args):
    return F.array_distinct(args[0])


@scalar("coll.sort", "apoc.coll.sort")
def _coll_sort(args):
    return F.array_sort(args[0])


@scalar("coll.max", "apoc.coll.max")
def _coll_max(args):
    return F.array_max(args[0])


@scalar("coll.min", "apoc.coll.min")
def _coll_min(args):
    return F.array_min(args[0])


@scalar("coll.indexof", "apoc.coll.indexof")
def _coll_indexof(args):
    # 0-based first index, -1 when absent (array_position is 1-based
    # with 0-absent, so a constant shift covers both)
    return (F.array_position(args[0], args[1]) - 1).cast("long")


@scalar("coll.insert", "apoc.coll.insert")
def _coll_insert(args):
    lst, idx, val = args[0], args[1].cast("int"), args[2]
    return F.concat(
        F.slice(lst, F.lit(1), idx),
        F.array(val),
        F.slice(lst, idx + 1, F.greatest(F.size(lst) - idx, F.lit(0))),
    )


@scalar("coll.remove", "apoc.coll.remove")
def _coll_remove(args):
    lst, idx = args[0], args[1].cast("int")
    cnt = args[2].cast("int") if len(args) > 2 else F.lit(1)
    return F.concat(
        F.slice(lst, F.lit(1), idx),
        F.slice(
            lst, idx + cnt + 1,
            F.greatest(F.size(lst) - idx - cnt, F.lit(0)),
        ),
    )


@scalar("coll.flatten", "apoc.coll.flatten")
def _coll_flatten(args):
    """coll.flatten(list[, depth]) — one level by default; depth 0 is a
    no-op, null depth -> null.  Requires a uniformly-nested list
    (array<array<T>>) — Spark's type system has no partial flatten over
    mixed-depth variant elements."""
    from arcadedb_spark.sql.litreg import value_of

    if len(args) > 1:
        d = value_of(args[1])
        if d is None:
            # a null literal depth -> null result (reference semantics);
            # non-literal depths unsupported
            return F.lit(None)
        d = int(d)
        out = args[0]
        for _ in range(d):
            out = F.flatten(out)
        return out
    return F.flatten(args[0])


# --- vector.* namespace (reference vector value functions) ----------------


@scalar("vector")
def _vector_ctor(args):
    return F.transform(args[0], lambda x: x.cast("float"))


@scalar("vector.norm")
def _vector_norm(args):
    return F.sqrt(
        F.aggregate(
            args[0], F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


@scalar("vector.dimension.count")
def _vector_dim_count(args):
    return F.when(args[0].isNull(), F.lit(None).cast("int")).otherwise(
        F.size(args[0])
    )


@scalar("vector.distance")
def _vector_distance(args):
    """vector.distance(v1, v2) — euclidean (reference vector function
    family; vector.norm/dimension.count siblings above)."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                args[0], args[1],
                lambda a, b: (a.cast("double") - b.cast("double"))
                * (a.cast("double") - b.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


@scalar("vector.cosinesimilarity")
def _vector_cosine_sim(args):
    dot = F.aggregate(
        F.zip_with(args[0], args[1],
                   lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    n1 = F.sqrt(F.aggregate(
        args[0], F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double")))
    n2 = F.sqrt(F.aggregate(
        args[1], F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double")))
    return dot * F.pow(n1 * n2, F.lit(-1.0))


# ---------------------------------------------------------------------------
# Namespaced Cypher function tail (function/CypherFunctionRegistry.java:
# math.* text.* util.* — reference function/math, function/text,
# function/util families)
# ---------------------------------------------------------------------------


@scalar("math.sigmoid")
def _math_sigmoid(args):
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-args[0].cast("double")))


@scalar("math.sigmoidprime")
def _math_sigmoid_prime(args):
    # σ'(x) = σ(x)(1 − σ(x)) (function/math/MathSigmoidPrime.java)
    s = F.lit(1.0) / (F.lit(1.0) + F.exp(-args[0].cast("double")))
    return s * (F.lit(1.0) - s)


@scalar("math.double", "cypher.double")
def _math_double(args):
    return args[0].cast("double")


@scalar("charat", "text.charat")
def _charat(args):
    """charAt(s, i) — 0-based single character (function/text/
    TextCharAt.java); out-of-range → null."""
    s = args[0].cast("string")
    i = args[1].cast("int")
    c = F.substring(s, i + F.lit(1), F.lit(1))
    return F.when((i < 0) | (i >= F.length(s)), F.lit(None)).otherwise(c)


@scalar("ceiling")
def _ceiling(args):
    return F.ceil(args[0])


_LPAD_MAX = 10 * 1024 * 1024  # function/text/TextLpad.java MAX_STRING_LENGTH


def _pad(args, left: bool):
    s = args[0].cast("string")
    n = args[1].cast("int")
    p = F.coalesce(F.substring(args[2].cast("string"), 1, 1), F.lit(" "))
    bad = (
        F.when(n < 0, F.raise_error(F.concat(
            F.lit("Invalid length: "), n.cast("string"),
            F.lit(" (must be non-negative)"))))
        .when(n > F.lit(_LPAD_MAX), F.raise_error(F.concat(
            F.lit("Padding length exceeds maximum allowed "
                  f"({_LPAD_MAX}): "), n.cast("string"))))
    )
    # F.lpad needs a python-literal pad char; build from a column pad
    # char via repeat+concat instead
    fill = F.repeat(p, F.greatest(n - F.length(s), F.lit(0)))
    out = F.concat(fill, s) if left else F.concat(s, fill)
    return F.when(s.isNull(), F.lit(None)).otherwise(
        F.coalesce(bad.cast("string"),
                   F.when(F.length(s) >= n, s).otherwise(out))
    )


@scalar("lpad", "text.lpad")
def _lpad(args):
    """text.lpad(s, length, padChar) (function/text/TextLpad.java):
    negative or >10MiB lengths raise; null string → null."""
    return _pad(args, left=True)


@scalar("rpad", "text.rpad")
def _rpad(args):
    return _pad(args, left=False)


@scalar("regexreplace", "text.regexreplace")
def _regex_replace(args):
    """text.regexReplace(s, pattern, replacement)
    (function/text/TextRegexReplace.java); null input → null."""
    return F.regexp_replace(
        args[0].cast("string"), args[1].cast("string"),
        args[2].cast("string"),
    )


@scalar("text.levenshteindistance", "levenshteindistance")
def _levenshtein_distance_ns(args):
    return F.levenshtein(args[0].cast("string"), args[1].cast("string"))


@scalar("text.levenshteinsimilarity")
def _levenshtein_similarity_ns(args):
    a, b = args[0].cast("string"), args[1].cast("string")
    mx = F.greatest(F.length(a), F.length(b))
    return F.when(mx == 0, 1.0).otherwise(1.0 - F.levenshtein(a, b) / mx)


@scalar("util.compress")
def _util_compress(args):
    """util.compress(data[, algorithm]) → base64 deflate/gzip
    (function/util/UtilCompress.java).  Spark has no gzip-string
    expression; 'deflate' maps to compress()+base64 (zlib stream), the
    default 'gzip' is rejected with a pointer to deflate."""
    from arcadedb_spark.sql.litreg import value_of

    algo = "gzip"
    if len(args) > 1:
        v = value_of(args[1])
        if v is not None:
            algo = str(v).lower()
    if algo != "deflate":
        raise ValueError(
            "util.compress: only 'deflate' is supported here (zlib via "
            "Spark compress()); gzip framing has no JVM-side expression"
        )
    import pyspark.sql.functions as _F2

    if not hasattr(_F2, "compress"):
        raise ValueError(
            "util.compress requires a Spark build with the compress() "
            "expression"
        )
    return F.base64(_F2.compress(args[0].cast("binary")))


@scalar("char.length", "character.length", "char_length",
        "character_length")
def _char_length_ns(args):
    # GQL char_length spellings (function/text/CharLengthFunction.java)
    return F.length(args[0].cast("string"))


# --- vector.* Cypher function tail (CypherFunctionFactory.java:351-359) ----


@scalar("vector.create")
def _vector_create(args):
    """vector.create(list[, dims, type]) — float32 vector constructor
    (the Cypher vector() constructor's namespaced spelling)."""
    return F.transform(args[0], lambda x: x.cast("float"))


@scalar("vector.distance.euclidean")
def _vector_dist_euclid(args):
    return _vector_distance(args)


@scalar("vector.distance.manhattan")
def _vector_dist_manhattan(args):
    return F.aggregate(
        F.zip_with(args[0], args[1],
                   lambda a, b: F.abs(a.cast("double") - b.cast("double"))),
        F.lit(0.0), lambda acc, x: acc + x,
    )


@scalar("vector.distance.cosine")
def _vector_dist_cosine(args):
    return 1.0 - _vector_cosine_sim(args)





@scalar("util.sleep")
def _util_sleep(args):
    """util.sleep(ms) — driver-side sleep, capped at 60 s
    (function/util/UtilSleep.java:49); null/non-positive is a no-op,
    over-cap raises. Returns null. A deliberate driver-side effect —
    never ship a sleep into an executor task."""
    import time as _t

    from arcadedb_spark.sql.litreg import value_of

    ms = value_of(args[0])
    if ms is None:
        return F.lit(None)
    ms = int(ms)
    if ms > 60000:
        raise ValueError(
            f"Sleep duration exceeds maximum allowed (60000ms): {ms}ms"
        )
    if ms > 0:
        _t.sleep(ms / 1000.0)
    return F.lit(None)


# -- text.* string metrics (function/text/*.java) ----------------------------


@scalar("text.hammingdistance")
def _text_hamming(args):
    """text.hammingDistance(a, b): differing positions of equal-length
    strings (Column program — zip characters, sum mismatches)."""
    a = F.split(args[0].cast("string"), "")
    b = F.split(args[1].cast("string"), "")
    return F.when(
        F.length(args[0]) != F.length(args[1]), F.lit(None).cast("int")
    ).otherwise(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x != y).cast("int")),
            F.lit(0),
            lambda acc, x: acc + x,
        )
    )


def _bigrams(c):
    s = c.cast("string")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(s) - 1, F.lit(0))),
            lambda i: s.substr(i, F.lit(2)),
        )
    )


@scalar("text.sorensendicesimilarity", "text.sorensendicecoefficient")
def _text_dice(args):
    """text.sorensenDiceSimilarity(a, b): 2·|bigrams∩| / (|A|+|B|)."""
    d1, d2 = _bigrams(args[0]), _bigrams(args[1])
    denom = F.size(d1) + F.size(d2)
    return F.when(denom == 0, F.lit(1.0)).otherwise(
        2.0 * F.size(F.array_intersect(d1, d2)) / denom
    )


@scalar("text.jarowinklerdistance", "text.jarowinklersimilarity")
def _text_jaro_winkler(args):
    """text.jaroWinklerDistance(a, b) — Jaro-Winkler similarity in
    [0, 1] (arrow-batched pandas UDF; per-row python is fine for a
    scalar string metric outside the hot path)."""
    from pyspark.sql.functions import pandas_udf

    def jw(s1: str, s2: str) -> float:
        if s1 is None or s2 is None:
            return None
        if s1 == s2:
            return 1.0
        l1, l2 = len(s1), len(s2)
        if not l1 or not l2:
            return 0.0
        window = max(l1, l2) // 2 - 1
        m1 = [False] * l1
        m2 = [False] * l2
        matches = 0
        for i, ch in enumerate(s1):
            lo = max(0, i - window)
            hi = min(i + window + 1, l2)
            for j in range(lo, hi):
                if not m2[j] and s2[j] == ch:
                    m1[i] = m2[j] = True
                    matches += 1
                    break
        if not matches:
            return 0.0
        t = 0
        k = 0
        for i in range(l1):
            if m1[i]:
                while not m2[k]:
                    k += 1
                if s1[i] != s2[k]:
                    t += 1
                k += 1
        jaro = (
            matches / l1 + matches / l2 + (matches - t / 2) / matches
        ) / 3
        prefix = 0
        for a, b in zip(s1, s2):
            if a != b or prefix == 4:
                break
            prefix += 1
        return jaro + prefix * 0.1 * (1 - jaro)

    @pandas_udf("double")
    def _jw(a, b):
        import pandas as pd

        return pd.Series([jw(x, y) for x, y in zip(a, b)])

    return _jw(args[0].cast("string"), args[1].cast("string"))

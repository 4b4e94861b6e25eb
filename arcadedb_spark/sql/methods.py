"""Postfix method registry: ``field.method(args)`` → pyspark Column.

Reference surface: 64 method files under
engine/src/main/java/com/arcadedb/query/sql/method/** (string/, collection/,
conversion/, misc/).  All are mapped to JVM built-ins (no Python UDFs) so
method chains stay inside whole-stage codegen.

Semantics notes
---------------
- ``substring(b[, e])`` follows Java ``String.substring`` (0-based, end
  exclusive) per SQLMethodSubString — translated to 1-based ``substr``.
- ``indexOf`` is 0-based with -1 for absent (Java semantics) — Spark
  ``instr`` is 1-based with 0 absent, hence the ``- 1``.
- ``split(regex)`` uses regex like Java ``String.split`` — Spark ``split``
  is regex-based too, a direct match.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

METHODS: dict[str, Callable[..., Column]] = {}


def method(name: str, *aliases: str):
    def deco(fn):
        METHODS[name.lower()] = fn
        for a in aliases:
            METHODS[a.lower()] = fn
        return fn

    return deco


# -- string methods (query/sql/method/string/*.java) ------------------------


@method("toUpperCase")
def _upper(base, args):
    return F.upper(base)


@method("toLowerCase")
def _lower(base, args):
    return F.lower(base)


@method("trim")
def _trim(base, args):
    return F.trim(base)


@method("length")
def _length(base, args):
    return F.length(base)


@method("left")
def _left(base, args):
    return F.substring(base, 1, _int(args[0]))


@method("right")
def _right(base, args):
    n = _int(args[0])
    return F.substring(base, -n, n)


@method("substring")
def _substring(base, args):
    begin = args[0]
    if len(args) > 1:
        return base.substr(begin + 1, args[1] - begin)
    return base.substr(begin + 1, F.length(base))


@method("charAt")
def _char_at(base, args):
    return base.substr(args[0] + 1, F.lit(1))


@method("indexOf")
def _index_of(base, args):
    return F.instr(base, _str(args[0])) - 1


@method("append")
def _append(base, args):
    return F.concat(base.cast("string"), args[0].cast("string"))


@method("prefix")
def _prefix(base, args):
    return F.concat(args[0].cast("string"), base.cast("string"))


@method("capitalize")
def _capitalize(base, args):
    return F.concat(F.upper(F.substring(base, 1, 1)), F.substring(base, 2, 2147483647))


@method("replace")
def _replace(base, args):
    return F.replace(base, args[0], args[1])


@method("split")
def _split(base, args):
    return F.split(base, _str(args[0]))


@method("format")
def _format(base, args):
    # value.format('%05d') or date.format('yyyy-MM-dd')
    pat = _str(args[0])
    if "%" in pat:
        return F.format_string(pat, base)
    return F.date_format(base, pat)


@method("hash")
def _hash(base, args):
    alg = (_str(args[0]) if args else "md5").lower().replace("-", "")
    s = base.cast("string").cast("binary")
    if alg == "md5":
        return F.md5(s)
    if alg == "sha1":
        return F.sha1(s)
    if alg in ("sha256", "sha2"):
        return F.sha2(s, 256)
    raise ValueError(f"Unsupported hash algorithm {alg}")


@method("trimPrefix")
def _trim_prefix(base, args):
    p = args[0].cast("string")
    return F.when(
        base.startswith(p), base.substr(F.length(p) + 1, F.length(base))
    ).otherwise(base)


@method("trimSuffix")
def _trim_suffix(base, args):
    s = args[0].cast("string")
    return F.when(
        base.endswith(s), base.substr(F.lit(1), F.length(base) - F.length(s))
    ).otherwise(base)


# -- conversion methods (query/sql/method/conversion/*.java) ----------------

for _name, _type in {
    "asBoolean": "boolean", "asByte": "byte", "asShort": "short",
    "asInteger": "int", "asLong": "long", "asFloat": "float",
    "asDouble": "double", "asDecimal": "decimal(38,10)", "asString": "string",
}.items():
    METHODS[_name.lower()] = (lambda t: lambda base, args: base.cast(t))(_type)


@method("asDate")
def _as_date(base, args):
    if args:
        return F.to_date(base, _str(args[0]))
    return F.to_date(base)


@method("asDatetime", "asDateTime")
def _as_datetime(base, args):
    if args:
        return F.to_timestamp(base, _str(args[0]))
    return F.to_timestamp(base)


@method("asCypherRID")
def _as_cypher_rid(base, args):
    """@rid.asCypherRID() → the numeric Cypher id (IdFunction.java
    encodeRidAsLong inverse pair; our rids are '#bucket:vid', and the
    Cypher id IS the vid)."""
    return F.split(base.cast("string"), ":").getItem(1).cast("long")


@method("convert")
def _convert(base, args):
    return base.cast(_str(args[0]).lower())


@method("type")
def _type(base, args):
    return F.typeof(base)


# -- collection / map methods (query/sql/method/collection/*.java) ----------


@method("size")
def _size(base, args):
    return F.size(base)


@method("field")
def _field(base, args):
    return base.getField(_str(args[0]))


@method("keys")
def _keys(base, args):
    return F.map_keys(base)


@method("values")
def _values(base, args):
    return F.map_values(base)


@method("asList")
def _as_list(base, args):
    return base  # arrays map 1:1

@method("asSet")
def _as_set(base, args):
    return F.array_distinct(base)


@method("asMap")
def _as_map(base, args):
    return base


@method("remove")
def _remove(base, args):
    return F.array_remove(base, args[0])


@method("sort")
def _sort(base, args):
    return F.sort_array(base)


# -- misc (query/sql/method/misc/*.java) ------------------------------------


@method("asJSON", "toJSON")
def _to_json(base, args):
    return F.to_json(base)


@method("ifNull")
def _if_null(base, args):
    return F.coalesce(base, args[0])


@method("exclude")
def _exclude(base, args):
    names = [_str(a) for a in args]
    return base.dropFields(*names)


@method("include")
def _include(base, args):
    # struct projection — rebuild with only the named fields
    names = [_str(a) for a in args]
    return F.struct(*[base.getField(n).alias(n) for n in names])


# -- helpers ---------------------------------------------------------------


def _int(col_or_lit) -> int:
    from arcadedb_spark.sql.litreg import value_of

    v = value_of(col_or_lit)
    if v is None:
        raise ValueError("argument must be a literal integer")
    return int(v)


def _str(col_or_lit) -> str:
    from arcadedb_spark.sql.litreg import value_of

    v = value_of(col_or_lit)
    if v is None:
        raise ValueError("argument must be a literal string")
    return str(v)


# -- geo methods (query/sql/method/geo/*.java) -------------------------------


@method("isWithin")
def _is_within(base, args):
    """wkt.isWithin(other_wkt) — SQLMethodIsWithin.java."""
    from arcadedb_spark.geo import udfs as gu

    return gu.predicate("within", base, args[0])


@method("intersectsWith")
def _intersects_with(base, args):
    """wkt.intersectsWith(other_wkt) — SQLMethodIntersectsWith.java."""
    from arcadedb_spark.geo import udfs as gu

    return gu.predicate("intersects", base, args[0])


@method("normalize")
def _normalize(base, args):
    """str.normalize(['NFD'|'NFC'|…][, removeRegex]) — Unicode normalize
    then optional regex strip (SQLMethodNormalize.java; accent removal is
    .normalize('NFD', '\\p{M}'))."""
    from arcadedb_spark.text.similarity import normalize_udf

    form = _str(args[0]) if args else "NFD"
    remove = _str(args[1]) if len(args) > 1 else None
    return normalize_udf(form, remove)(base.cast("string"))


# -- remaining method tail (query/sql/method/**) -----------------------------


@method("ifEmpty")
def _if_empty(base, args):
    """value.ifEmpty(fallback) — fallback when null or empty string/list
    (SQLMethodIfEmpty.java)."""
    is_empty = base.isNull() | (base.cast("string") == "")
    return F.when(is_empty, args[0]).otherwise(base)


@method("join")
def _join_m(base, args):
    """list.join(sep) — SQLMethodJoin.java."""
    sep = _str(args[0]) if args else ","
    return F.array_join(base, sep)


@method("lastIndexOf")
def _last_index_of(base, args):
    """str.lastIndexOf(sub) — 0-based like the reference; −1 if absent."""
    s = base.cast("string")
    sub = args[0].cast("string")
    rev_pos = F.instr(F.reverse(s), F.reverse(sub))
    return F.when(rev_pos == 0, F.lit(-1)).otherwise(
        F.length(s) - rev_pos - F.length(sub) + 1
    )


@method("precision")
def _precision(base, args):
    """decimal/number.precision(n) — round to n decimal places
    (SQLMethodPrecision.java)."""
    return F.round(base.cast("double"), _int(args[0]))


@method("removeAll")
def _remove_all(base, args):
    """list.removeAll(value | [values]) — SQLMethodRemoveAll.java."""
    val = args[0]
    return F.filter(base, lambda x: ~x.eqNullSafe(val))


@method("asVector")
def _as_vector(base, args):
    """x.asVector() — cast to array<float> (the embedding type,
    SQLMethodAsVector.java / Type.ARRAY_OF_FLOATS)."""
    return base.cast("array<float>")


@method("asSparse")
def _as_sparse(base, args):
    """dense.asSparse() — SQLMethodAsSparse.java → sparse struct."""
    from arcadedb_spark.vector.sparse import dense_to_sparse

    return dense_to_sparse(base)


@method("asRID")
def _as_rid(base, args):
    """x.asRID() — normalize to the '#bucket:offset' string form.
    (asCypherRID is NOT an alias: it returns the numeric Cypher id —
    CypherRIDFunctionTest.java roundTripWithAsCypherRIDMethod.)"""
    return base.cast("string")


@method("javaType")
def _java_type(base, args):
    """x.javaType() — the reference reports the JVM class; here the
    Spark SQL type name (documented mapping)."""
    return F.typeof(base)


@method("asRecord")
def _as_record(base, args):
    """rid.asRecord() — in the reference this dereferences the RID; on
    DataFrames record identity is the row itself, so this is the
    identity passthrough (LINK navigation handles dereference)."""
    return base

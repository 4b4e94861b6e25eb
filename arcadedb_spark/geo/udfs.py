"""Spark bindings for the geo kernel.

Strategy (per SURVEY §2.9): keep point-only operations as JVM Column
expressions (WKT build via format_string, coordinate extraction via
regexp_extract, point-point haversine as Column math — all inside
whole-stage codegen); route real geometry work (polygon predicates,
area, buffer) through Arrow-batched pandas UDFs over
``arcadedb_spark.geo.core``.  The hot filter shape
``geo.dWithin(point, CONSTANT_polygon, d)`` therefore pays one Python
batch per Arrow block, not per row — and anything cheaper stays in
Tungsten entirely.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, DoubleType, StringType

from arcadedb_spark.geo import core

_COORD = r"-?\d+\.?\d*(?:[eE][+-]?\d+)?"


# -- JVM-side point fast paths ----------------------------------------------


def point_wkt(x: Column, y: Column) -> Column:
    """'POINT (x y)' — SQLFunctionGeoPoint.java builds the same string."""
    return F.format_string(
        "POINT (%s %s)",
        _trim_num(x.cast("double")), _trim_num(y.cast("double")),
    )


def _trim_num(c: Column) -> Column:
    # integral values print without the trailing .0 (GeoUtils.formatCoord)
    return F.when(
        c == F.floor(c), c.cast("decimal(20,0)").cast("string")
    ).otherwise(c.cast("string"))


def point_x(wkt: Column) -> Column:
    return F.regexp_extract(wkt, rf"POINT\s*\(\s*({_COORD})", 1).cast("double")


def point_y(wkt: Column) -> Column:
    return F.regexp_extract(
        wkt, rf"POINT\s*\(\s*{_COORD}\s+({_COORD})", 1
    ).cast("double")


def rectangle_wkt(x1: Column, y1: Column, x2: Column, y2: Column) -> Column:
    """Axis-aligned rectangle as a closed POLYGON
    (SQLFunctionRectangle.java)."""
    a, b, c, d = (v.cast("double") for v in (x1, y1, x2, y2))
    t = _trim_num
    return F.format_string(
        "POLYGON ((%s %s, %s %s, %s %s, %s %s, %s %s))",
        t(a), t(b), t(c), t(b), t(c), t(d), t(a), t(d), t(a), t(b),
    )


def linestring_wkt(*points: Column) -> Column:
    """geo.lineString(x1, y1, x2, y2, …) — SQLFunctionGeoLineString.java."""
    pairs = [
        F.format_string(
            "%s %s",
            _trim_num(points[i].cast("double")),
            _trim_num(points[i + 1].cast("double")),
        )
        for i in range(0, len(points), 2)
    ]
    return F.format_string(
        "LINESTRING (%s)", F.concat_ws(", ", *pairs)
    )


def haversine_distance(p1: Column, p2: Column, unit: str = "m") -> Column:
    """geo.distance over WKT points — pure Column math
    (SQLFunctionGeoDistance.java; non-points handled by the UDF
    fallback at the registry layer)."""
    factor = {
        "m": 1000.0, "km": 1.0, "mi": 0.621371192, "nmi": 0.539956803,
    }[unit.lower()]
    x1, y1, x2, y2 = point_x(p1), point_y(p1), point_x(p2), point_y(p2)
    dlat = F.radians(y2 - y1) / 2
    dlon = F.radians(x2 - x1) / 2
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(F.radians(y1)) * F.cos(F.radians(y2)) * F.sin(dlon) * F.sin(dlon)
    )
    return (
        F.lit(2 * 6371.0 * factor)
        * F.atan2(F.sqrt(a), F.sqrt(F.lit(1.0) - a))
    )


# -- pandas-UDF-backed geometry ops -----------------------------------------


def _parse(v):
    return core.parse_wkt(v) if v is not None else None


def _binary_pred(fn):
    import pandas as pd

    def batch(a, b):
        out = []
        cache: dict = {}
        for wa, wb in zip(a, b):
            if wa is None or wb is None:
                out.append(None)
                continue
            ga = cache.get(wa) or cache.setdefault(wa, _parse(wa))
            gb = cache.get(wb) or cache.setdefault(wb, _parse(wb))
            out.append(bool(fn(ga, gb)))
        return pd.Series(out, dtype="object")

    return F.pandas_udf(batch, BooleanType())


def _geom_to_geom(fn):
    import pandas as pd

    def batch(a, *rest):
        out = []
        for i, wa in enumerate(a):
            if wa is None:
                out.append(None)
                continue
            extra = [r.iloc[i] for r in rest]
            out.append(core.to_wkt(fn(_parse(wa), *extra)))
        return pd.Series(out)

    return F.pandas_udf(batch, StringType())


def _geom_to_double(fn):
    import pandas as pd

    def batch(a, *rest):
        out = []
        for i, wa in enumerate(a):
            if wa is None:
                out.append(None)
                continue
            extra = [r.iloc[i] for r in rest]
            out.append(float(fn(_parse(wa), *extra)))
        return pd.Series(out, dtype="float64")

    return F.pandas_udf(batch, DoubleType())


# Built lazily (pandas_udf creation needs an active session in some
# environments) and memoized.
_UDFS: dict = {}


def _udf(name: str):
    if name in _UDFS:
        return _UDFS[name]
    import pandas as pd

    if name == "dwithin":
        def batch(a, b, d):
            out = []
            for wa, wb, dist in zip(a, b, d):
                if wa is None or wb is None or dist is None:
                    out.append(None)
                else:
                    out.append(bool(core.dwithin(_parse(wa), _parse(wb), float(dist))))
            return pd.Series(out, dtype="object")

        u = F.pandas_udf(batch, BooleanType())
    elif name == "distance_any":
        # geo.distance fallback: bbox CENTER of non-point geometries
        # (SQLFunctionGeoDistance.extractPointCoords)
        def batch(a, b, unit):
            factors = {"m": 1000.0, "km": 1.0, "mi": 0.621371192,
                       "nmi": 0.539956803}
            out = []
            for wa, wb, un in zip(a, b, unit):
                if wa is None or wb is None:
                    out.append(None)
                    continue
                def center(w):
                    g = _parse(w)
                    if g[0] == "POINT":
                        return g[1][0]
                    env = core.envelope(g)[1][0]
                    return ((env[0][0] + env[2][0]) / 2, (env[0][1] + env[2][1]) / 2)
                meters = core.haversine_m(center(wa), center(wb))
                out.append(meters / 1000.0 * factors[(un or "m").lower()])
            return pd.Series(out, dtype="float64")

        u = F.pandas_udf(batch, DoubleType())
    elif name == "geomfromtext":
        def batch(a):
            return a.map(lambda w: None if w is None else core.to_wkt(core.parse_wkt(w)))

        u = F.pandas_udf(batch, StringType())
    elif name == "asgeojson":
        def batch(a):
            return a.map(lambda w: None if w is None else core.to_geojson(core.parse_wkt(w)))

        u = F.pandas_udf(batch, StringType())
    elif name == "area":
        u = _geom_to_double(lambda g: core.area(g))
    elif name == "envelope":
        u = _geom_to_geom(lambda g: core.envelope(g))
    elif name == "buffer":
        u = _geom_to_geom(lambda g, d: core.buffer(g, float(d)))
    else:
        u = _binary_pred(getattr(core, name))
    _UDFS[name] = u
    return u


def predicate(name: str, a: Column, b: Column) -> Column:
    """contains/within/intersects/disjoint/equals/touches/crosses/
    overlaps over WKT columns."""
    return _udf(name)(a, b)


def dwithin(a: Column, b: Column, d: Column) -> Column:
    return _udf("dwithin")(a, b, d.cast("double"))


def area(g: Column) -> Column:
    return _udf("area")(g)


def envelope(g: Column) -> Column:
    return _udf("envelope")(g)


def buffer(g: Column, d: Column) -> Column:
    return _udf("buffer")(g, d.cast("double"))


def geom_from_text(g: Column) -> Column:
    return _udf("geomfromtext")(g)


def as_geojson(g: Column) -> Column:
    return _udf("asgeojson")(g)


def distance_any(a: Column, b: Column, unit: Column) -> Column:
    return _udf("distance_any")(a, b, unit)

"""Pure-Python planar geometry kernel over WKT (no JTS/shapely in the
container).

Parity targets (reference is JTS/spatial4j-backed):
- function/sql/geo/GeoUtils.java — WKT is the interchange format; Cypher
  point() maps also accepted (handled at the UDF layer).
- function/sql/geo/SQLFunctionGeoArea.java — area in SQUARE DEGREES
  (planar, coordinate units).
- function/sql/geo/SQLFunctionGeoDWithin.java — threshold in DEGREES
  (planar; "1 degree ≈ 111.32 km" note in the reference docstring).
- function/sql/geo/SQLFunctionGeoDistance.java — the one HAVERSINE
  function: meters by default, EARTH_RADIUS_KM = 6371.0.

Documented approximations vs JTS (each noted on the function):
- ``buffer`` of a non-point geometry buffers its convex hull.
- ``touches``/``crosses``/``overlaps`` use vertex/edge tests, not full
  DE-9IM intersection matrices.

Everything here is scalar Python on parsed coordinate lists — the Spark
layer (``arcadedb_spark.geo.udfs``) wraps these in Arrow-batched pandas
UDFs so the per-row cost is amortized per batch, and keeps pure-point
fast paths (point construction, x/y extraction, point-point distance) as
JVM Column expressions that never enter Python.
"""

from __future__ import annotations

import json
import math
import re

Geom = tuple  # (kind, data); POINT/LINESTRING: list[(x, y)]; POLYGON: list[ring]

_NUM = r"-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?"
_PT_RE = re.compile(rf"\s*({_NUM})\s+({_NUM})\s*")


def _parse_ring(body: str) -> list[tuple[float, float]]:
    pts = []
    for part in body.split(","):
        m = _PT_RE.fullmatch(part)
        if not m:
            raise ValueError(f"Bad WKT coordinate: {part!r}")
        pts.append((float(m.group(1)), float(m.group(2))))
    return pts


def _split_groups(body: str) -> list[str]:
    """Split 'a, b), (c, d' style nested parentheses groups."""
    groups, depth, start = [], 0, 0
    for i, ch in enumerate(body):
        if ch == "(":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                groups.append(body[start:i])
    return groups


def parse_wkt(text: str) -> Geom | None:
    """WKT → (kind, coords).  POINT/LINESTRING → list of (x, y);
    POLYGON → list of rings (first exterior, rest holes);
    MULTIPOLYGON → list of polygons."""
    if text is None:
        return None
    s = text.strip()
    m = re.match(r"(?i)^\s*(POINT|LINESTRING|POLYGON|MULTIPOLYGON)\s*\((.*)\)\s*$", s, re.DOTALL)
    if not m:
        raise ValueError(f"Unsupported WKT: {text[:50]!r}")
    kind = m.group(1).upper()
    body = m.group(2)
    if kind == "POINT":
        return ("POINT", _parse_ring(body))
    if kind == "LINESTRING":
        return ("LINESTRING", _parse_ring(body))
    if kind == "POLYGON":
        # body is "(ring), (ring)…" — outermost parens were consumed by
        # the statement regex
        return ("POLYGON", [_parse_ring(g) for g in _split_groups(body)])
    return (
        "MULTIPOLYGON",
        [
            [_parse_ring(r) for r in _split_groups(g)]
            for g in _split_groups(body)
        ],
    )


def _fmt(v: float) -> str:
    # integral coords print without a trailing .0 (GeoUtils.formatCoord)
    return str(int(v)) if float(v).is_integer() else repr(float(v))


def _ring_wkt(ring) -> str:
    return "(" + ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in ring) + ")"


def to_wkt(g: Geom) -> str:
    kind, data = g
    if kind == "POINT":
        (x, y), = data
        return f"POINT ({_fmt(x)} {_fmt(y)})"
    if kind == "LINESTRING":
        return "LINESTRING " + _ring_wkt(data)
    if kind == "POLYGON":
        return "POLYGON (" + ", ".join(_ring_wkt(r) for r in data) + ")"
    return "MULTIPOLYGON (" + ", ".join(
        "(" + ", ".join(_ring_wkt(r) for r in poly) + ")" for poly in data
    ) + ")"


def to_geojson(g: Geom) -> str:
    kind, data = g
    if kind == "POINT":
        coords: object = list(data[0])
    elif kind == "LINESTRING":
        coords = [list(p) for p in data]
    elif kind == "POLYGON":
        coords = [[list(p) for p in r] for r in data]
    else:
        coords = [[[list(p) for p in r] for r in poly] for poly in data]
    name = {"POINT": "Point", "LINESTRING": "LineString", "POLYGON": "Polygon",
            "MULTIPOLYGON": "MultiPolygon"}[kind]
    return json.dumps({"type": name, "coordinates": coords})


# -- primitive tests --------------------------------------------------------


def _on_segment(p, a, b, eps=1e-12) -> bool:
    cross = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
    if abs(cross) > eps:
        return False
    return (
        min(a[0], b[0]) - eps <= p[0] <= max(a[0], b[0]) + eps
        and min(a[1], b[1]) - eps <= p[1] <= max(a[1], b[1]) + eps
    )


def point_in_ring(p, ring) -> bool:
    """Ray casting; boundary counts as inside."""
    x, y = p
    n = len(ring)
    inside = False
    for i in range(n - 1):
        a, b = ring[i], ring[i + 1]
        if _on_segment(p, a, b):
            return True
        if (a[1] > y) != (b[1] > y):
            xint = a[0] + (y - a[1]) * (b[0] - a[0]) / (b[1] - a[1])
            if x < xint:
                inside = not inside
    return inside


def point_in_polygon(p, rings) -> bool:
    if not rings or not point_in_ring(p, rings[0]):
        return False
    for hole in rings[1:]:
        # strictly inside a hole → outside (hole boundary still counts in)
        if point_in_ring(p, hole) and not _on_boundary(p, [hole]):
            return False
    return True


def _on_boundary(p, rings) -> bool:
    for ring in rings:
        for i in range(len(ring) - 1):
            if _on_segment(p, ring[i], ring[i + 1]):
                return True
    return False


def _orient(a, b, c) -> float:
    return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])


def segments_intersect(p1, p2, p3, p4) -> bool:
    d1, d2 = _orient(p3, p4, p1), _orient(p3, p4, p2)
    d3, d4 = _orient(p1, p2, p3), _orient(p1, p2, p4)
    if ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0)):
        return True
    return (
        _on_segment(p1, p3, p4) or _on_segment(p2, p3, p4)
        or _on_segment(p3, p1, p2) or _on_segment(p4, p1, p2)
    )


def segments_cross_properly(p1, p2, p3, p4) -> bool:
    d1, d2 = _orient(p3, p4, p1), _orient(p3, p4, p2)
    d3, d4 = _orient(p1, p2, p3), _orient(p1, p2, p4)
    return ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0))


def _segments(g: Geom):
    kind, data = g
    if kind == "LINESTRING":
        for i in range(len(data) - 1):
            yield data[i], data[i + 1]
    elif kind == "POLYGON":
        for ring in data:
            for i in range(len(ring) - 1):
                yield ring[i], ring[i + 1]
    elif kind == "MULTIPOLYGON":
        for poly in data:
            for ring in poly:
                for i in range(len(ring) - 1):
                    yield ring[i], ring[i + 1]


def _vertices(g: Geom):
    kind, data = g
    if kind in ("POINT", "LINESTRING"):
        yield from data
    elif kind == "POLYGON":
        for ring in data:
            yield from ring
    else:
        for poly in data:
            for ring in poly:
                yield from ring


def _polygons(g: Geom):
    if g[0] == "POLYGON":
        yield g[1]
    elif g[0] == "MULTIPOLYGON":
        yield from g[1]


# -- spatial predicates -----------------------------------------------------


def intersects(a: Geom, b: Geom) -> bool:
    """Any-point-in-common test (SQLFunctionGeoIntersects.java)."""
    if a[0] == "POINT":
        return _covers_point(b, a[1][0]) if b[0] != "POINT" else a[1][0] == b[1][0]
    if b[0] == "POINT":
        return _covers_point(a, b[1][0])
    # edge intersection
    for s1 in _segments(a):
        for s2 in _segments(b):
            if segments_intersect(*s1, *s2):
                return True
    # containment without edge contact
    return _any_vertex_in(a, b) or _any_vertex_in(b, a)


def _covers_point(g: Geom, p) -> bool:
    if g[0] == "LINESTRING":
        return _on_boundary(p, [g[1]])
    return any(point_in_polygon(p, rings) for rings in _polygons(g))


def _any_vertex_in(outer: Geom, inner: Geom) -> bool:
    if outer[0] not in ("POLYGON", "MULTIPOLYGON"):
        return False
    return any(_covers_point(outer, v) for v in _vertices(inner))


def contains(a: Geom, b: Geom) -> bool:
    """a covers b: every vertex of b inside a and no boundary crossing
    (vertex/edge approximation of JTS contains —
    SQLFunctionGeoContains.java)."""
    if a[0] == "POINT":
        return b[0] == "POINT" and a[1][0] == b[1][0]
    if a[0] == "LINESTRING":
        return all(_on_boundary(v, [a[1]]) for v in _vertices(b))
    if not all(_covers_point(a, v) for v in _vertices(b)):
        return False
    for s1 in _segments(b):
        for s2 in _segments(a):
            if segments_cross_properly(*s1, *s2):
                return False
    return True


def within(a: Geom, b: Geom) -> bool:
    return contains(b, a)


def disjoint(a: Geom, b: Geom) -> bool:
    return not intersects(a, b)


def equals(a: Geom, b: Geom, eps: float = 1e-9) -> bool:
    if a[0] != b[0]:
        return False
    va, vb = list(_vertices(a)), list(_vertices(b))
    if len(va) != len(vb):
        return False
    return all(
        abs(p[0] - q[0]) <= eps and abs(p[1] - q[1]) <= eps
        for p, q in zip(va, vb)
    )


def touches(a: Geom, b: Geom) -> bool:
    """Boundaries meet, interiors don't (approximation: intersects with
    no proper edge crossing and no strict-interior vertex)."""
    if not intersects(a, b):
        return False
    for s1 in _segments(a):
        for s2 in _segments(b):
            if segments_cross_properly(*s1, *s2):
                return False
    for outer, inner in ((a, b), (b, a)):
        if outer[0] in ("POLYGON", "MULTIPOLYGON"):
            for v in _vertices(inner):
                if _covers_point(outer, v) and not _on_boundary(
                    v, [r for rings in _polygons(outer) for r in rings]
                ):
                    return False
    return True


def crosses(a: Geom, b: Geom) -> bool:
    """Proper interior crossing (line/line or line/polygon-boundary)."""
    for s1 in _segments(a):
        for s2 in _segments(b):
            if segments_cross_properly(*s1, *s2):
                return True
    return False


def overlaps(a: Geom, b: Geom) -> bool:
    """Interiors intersect but neither contains the other."""
    return intersects(a, b) and not contains(a, b) and not contains(b, a)


# -- measures / constructions ----------------------------------------------


def _ring_area(ring) -> float:
    s = 0.0
    for i in range(len(ring) - 1):
        (x1, y1), (x2, y2) = ring[i], ring[i + 1]
        s += x1 * y2 - x2 * y1
    return abs(s) / 2.0


def area(g: Geom) -> float:
    """Square degrees, holes subtracted (SQLFunctionGeoArea.java —
    'area of a geometry in square degrees')."""
    total = 0.0
    for rings in _polygons(g):
        total += _ring_area(rings[0]) - sum(_ring_area(h) for h in rings[1:])
    return total


def envelope(g: Geom) -> Geom:
    xs = [v[0] for v in _vertices(g)]
    ys = [v[1] for v in _vertices(g)]
    x1, x2, y1, y2 = min(xs), max(xs), min(ys), max(ys)
    return ("POLYGON", [[(x1, y1), (x2, y1), (x2, y2), (x1, y2), (x1, y1)]])


def _pt_seg_dist(p, a, b) -> float:
    ax, ay = b[0] - a[0], b[1] - a[1]
    denom = ax * ax + ay * ay
    if denom == 0:
        return math.hypot(p[0] - a[0], p[1] - a[1])
    t = max(0.0, min(1.0, ((p[0] - a[0]) * ax + (p[1] - a[1]) * ay) / denom))
    cx, cy = a[0] + t * ax, a[1] + t * ay
    return math.hypot(p[0] - cx, p[1] - cy)


def planar_distance(a: Geom, b: Geom) -> float:
    """Min distance in coordinate units (degrees) — the geo.dWithin
    metric (SQLFunctionGeoDWithin.java)."""
    if intersects(a, b):
        return 0.0
    best = math.inf
    segs_a = list(_segments(a)) or [(v, v) for v in _vertices(a)]
    segs_b = list(_segments(b)) or [(v, v) for v in _vertices(b)]
    for s1 in segs_a:
        for s2 in segs_b:
            best = min(
                best,
                _pt_seg_dist(s1[0], *s2), _pt_seg_dist(s1[1], *s2),
                _pt_seg_dist(s2[0], *s1), _pt_seg_dist(s2[1], *s1),
            )
    return best


def dwithin(a: Geom, b: Geom, dist: float) -> bool:
    return planar_distance(a, b) <= dist


def _convex_hull(points) -> list:
    """Andrew's monotone chain; closed ring."""
    pts = sorted(set(points))
    if len(pts) <= 2:
        return list(pts) + [pts[0]]
    def half(seq):
        out = []
        for p in seq:
            while len(out) >= 2 and _orient(out[-2], out[-1], p) <= 0:
                out.pop()
            out.append(p)
        return out
    lower, upper = half(pts), half(reversed(pts))
    return lower[:-1] + upper[:-1] + [lower[0]]


def buffer(g: Geom, dist: float, segments: int = 32) -> Geom:
    """Buffered geometry (SQLFunctionGeoBuffer.java wraps JTS buffer).
    Exact for points (regular 32-gon circle); for other geometries this
    buffers the CONVEX HULL of the vertex circles — a documented
    over-approximation for concave shapes."""
    circle_pts = []
    for vx, vy in _vertices(g):
        for i in range(segments):
            ang = 2 * math.pi * i / segments
            circle_pts.append((vx + dist * math.cos(ang), vy + dist * math.sin(ang)))
    return ("POLYGON", [_convex_hull(circle_pts)])


def haversine_m(p1, p2) -> float:
    """Meters between two (x=lon, y=lat) points —
    SQLFunctionGeoDistance.java (EARTH_RADIUS_KM = 6371.0)."""
    lon1, lat1 = p1
    lon2, lat2 = p2
    dlat = math.radians(lat2 - lat1)
    dlon = math.radians(lon2 - lon1)
    a = (
        math.sin(dlat / 2) ** 2
        + math.cos(math.radians(lat1)) * math.cos(math.radians(lat2))
        * math.sin(dlon / 2) ** 2
    )
    return 2 * math.atan2(math.sqrt(a), math.sqrt(1 - a)) * 6371.0 * 1000.0

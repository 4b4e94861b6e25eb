"""Geo kernel + SQL surface tests (function/sql/geo/*.java parity)."""

from __future__ import annotations

import json
import math

import pytest

from arcadedb_spark.geo import core


# -- pure kernel (no Spark) --------------------------------------------------

SQUARE = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
HOLED = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"


def test_wkt_roundtrip():
    for w in [
        "POINT (2.5 3)",
        "LINESTRING (0 0, 1 1, 2 0)",
        SQUARE,
        HOLED,
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))",
    ]:
        assert core.to_wkt(core.parse_wkt(w)) == w
    with pytest.raises(ValueError):
        core.parse_wkt("TRIANGLE (0 0)")


def test_point_in_polygon_with_hole():
    g = core.parse_wkt(HOLED)
    assert core.point_in_polygon((2, 2), g[1])
    assert not core.point_in_polygon((5, 5), g[1])  # inside the hole
    assert core.point_in_polygon((4, 5), g[1])      # on hole boundary
    assert core.point_in_polygon((0, 5), g[1])      # on exterior boundary
    assert not core.point_in_polygon((11, 5), g[1])


def test_predicates():
    sq = core.parse_wkt(SQUARE)
    inner = core.parse_wkt("POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))")
    far = core.parse_wkt("POLYGON ((20 20, 30 20, 30 30, 20 30, 20 20))")
    half = core.parse_wkt("POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))")
    assert core.contains(sq, inner) and core.within(inner, sq)
    assert not core.contains(inner, sq)
    assert core.intersects(sq, half) and core.overlaps(sq, half)
    assert core.disjoint(sq, far) and not core.intersects(sq, far)
    assert core.equals(sq, core.parse_wkt(SQUARE))
    # touching squares share an edge but no interior
    touching = core.parse_wkt("POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))")
    assert core.touches(sq, touching)
    assert not core.touches(sq, half)
    # crossing linestrings
    l1 = core.parse_wkt("LINESTRING (0 0, 10 10)")
    l2 = core.parse_wkt("LINESTRING (0 10, 10 0)")
    assert core.crosses(l1, l2) and core.intersects(l1, l2)


def test_area_envelope_buffer():
    assert core.area(core.parse_wkt(SQUARE)) == 100.0
    assert core.area(core.parse_wkt(HOLED)) == 96.0  # 100 − 4 hole
    env = core.to_wkt(core.envelope(core.parse_wkt("LINESTRING (1 2, 5 8)")))
    assert env == "POLYGON ((1 2, 5 2, 5 8, 1 8, 1 2))"
    buf = core.buffer(core.parse_wkt("POINT (0 0)"), 2.0)
    assert abs(core.area(buf) - math.pi * 4) / (math.pi * 4) < 0.01  # 32-gon
    assert core.contains(buf, core.parse_wkt("POINT (1.9 0)"))


def test_distance_dwithin():
    p1, p2 = core.parse_wkt("POINT (0 0)"), core.parse_wkt("POINT (3 4)")
    assert core.planar_distance(p1, p2) == 5.0
    assert core.dwithin(p1, p2, 5.0) and not core.dwithin(p1, p2, 4.9)
    sq = core.parse_wkt(SQUARE)
    assert core.planar_distance(core.parse_wkt("POINT (13 10)"), sq) == 3.0
    # haversine: 1 degree of latitude ≈ 111.19 km
    m = core.haversine_m((0.0, 0.0), (0.0, 1.0))
    assert abs(m - 111_195) < 200


def test_geojson():
    gj = json.loads(core.to_geojson(core.parse_wkt(SQUARE)))
    assert gj["type"] == "Polygon" and gj["coordinates"][0][0] == [0.0, 0.0]


# -- SQL surface -------------------------------------------------------------


def test_geo_sql_constructors(db):
    r = db.query(
        "SELECT geo.point(12.5, 41.9) AS p, "
        "geo.rectangle(0, 0, 10, 10) AS rect, "
        "geo.lineString(0, 0, 5, 5) AS ls, "
        "geo.x(geo.point(12.5, 41.9)) AS x, geo.y(geo.point(12.5, 41.9)) AS y "
        "FROM region LIMIT 1"
    ).collect()[0]
    assert r["p"] == "POINT (12.5 41.9)"
    assert r["rect"] == "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
    assert r["ls"] == "LINESTRING (0 0, 5 5)"
    assert r["x"] == 12.5 and r["y"] == 41.9


def test_geo_sql_predicates(db):
    r = db.query(
        "SELECT geo.contains(geo.rectangle(0, 0, 10, 10), geo.point(5, 5)) AS c, "
        "geo.within(geo.point(5, 5), geo.rectangle(0, 0, 10, 10)) AS w, "
        "geo.intersects(geo.rectangle(0, 0, 10, 10), geo.rectangle(5, 5, 15, 15)) AS i, "
        "geo.disjoint(geo.point(50, 50), geo.rectangle(0, 0, 10, 10)) AS d, "
        "geo.dWithin(geo.point(0, 0), geo.point(3, 4), 5.0) AS dw, "
        "geo.area(geo.rectangle(0, 0, 10, 10)) AS a "
        "FROM region LIMIT 1"
    ).collect()[0]
    assert r["c"] and r["w"] and r["i"] and r["d"] and r["dw"]
    assert r["a"] == 100.0


def test_geo_sql_distance_and_methods(db):
    r = db.query(
        "SELECT round(geo.distance(geo.point(2.35, 48.85), "
        "geo.point(-0.12, 51.5), 'km'), 0) AS paris_london, "
        "geo.point(5, 5).isWithin(geo.rectangle(0, 0, 10, 10)) AS m_w, "
        "geo.rectangle(0, 0, 4, 4).intersectsWith(geo.rectangle(2, 2, 8, 8)) AS m_i, "
        "geo.asGeoJson(geo.point(1, 2)) AS gj "
        "FROM region LIMIT 1"
    ).collect()[0]
    assert 340 <= r["paris_london"] <= 345  # ~343 km
    assert r["m_w"] and r["m_i"]
    assert json.loads(r["gj"]) == {"type": "Point", "coordinates": [1.0, 2.0]}


def test_geo_sql_polygon_and_buffer(db):
    r = db.query(
        "SELECT geo.polygon([[0, 0], [4, 0], [4, 4], [0, 4]]) AS poly, "
        "round(geo.area(geo.buffer(geo.point(0, 0), 1.0)), 2) AS buf_area, "
        "geo.geomFromText('point( 3  4 )') AS norm "
        "FROM region LIMIT 1"
    ).collect()[0]
    assert r["poly"] == "POLYGON ((0.0 0.0, 4.0 0.0, 4.0 4.0, 0.0 4.0, 0.0 0.0))"
    assert abs(r["buf_area"] - 3.12) < 0.01  # inscribed 32-gon: 16·sin(π/16)
    assert r["norm"] == "POINT (3 4)"


def test_geohash_known_values():
    from arcadedb_spark.geo.join import geohash

    # canonical test vectors
    assert geohash(57.64911, 10.40744, 11) == "u4pruydqqvj"
    assert geohash(48.669, -4.329, 5) == "gbsuv"
    assert geohash(0.0, 0.0, 5) == "s0000"


def test_geohash_sql_and_prefix_locality(db):
    r = db.query(
        "SELECT geo.geohash(57.64911, 10.40744, 9) AS g1, "
        "geo.geohash(57.649, 10.407, 9) AS g2, "
        "geo.geohash(-33.86, 151.21, 9) AS far "
        "FROM region LIMIT 1"
    ).collect()[0]
    assert r["g1"].startswith("u4pruy") and r["g2"].startswith("u4pruy")
    assert not r["far"].startswith("u4")


def test_within_distance_join_exact(spark):
    from arcadedb_spark.geo.join import within_distance_join

    pts = spark.createDataFrame(
        [(1, 48.85, 2.35),   # Paris
         (2, 48.80, 2.13),   # Versailles (~17 km)
         (3, 51.50, -0.12),  # London (~343 km)
         (4, 48.86, 2.36)],  # Paris again (~1 km)
        "id long, lat double, lon double",
    )
    pairs = within_distance_join(pts, pts, radius_km=50.0)
    got = {
        (r["id"], r["r_id"]) for r in pairs.collect() if r["id"] < r["r_id"]
    }
    assert got == {(1, 2), (1, 4), (2, 4)}
    dist = {
        (r["id"], r["r_id"]): r["distance_km"]
        for r in pairs.collect() if r["id"] < r["r_id"]
    }
    assert 15 < dist[(1, 2)] < 20 and dist[(1, 4)] < 2

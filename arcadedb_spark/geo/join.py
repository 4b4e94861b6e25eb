"""Spatial joins at scale: grid-cell bucketing + geohash encoding.

Parity: index/geospatial/LSMTreeGeoIndex.java:56-57,225 — the reference
answers NEAR/WITHIN with a geohash prefix-tree cell covering, then
verifies exact geometry per candidate.  The DataFrame translation is the
same two-phase shape:

1. bucket both sides into integer grid cells sized to the search radius
   (cell ≥ radius ⇒ all matches lie in the 3×3 neighborhood), exploding
   the probe side to its 9 candidate cells;
2. equi-join on the cell id — Spark shuffles ONLY matching cells, never
   the cross product — and verify with exact haversine.

At 100 TB both sides partition by cell hash; skewed cells (cities)
split across partitions like any hot join key under AQE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_EARTH_KM = 6371.0
_KM_PER_DEG_LAT = 111.32


def _cell(lat: Column, lon: Column, cell_deg: float) -> Column:
    """Integer grid cell id packed into one long (row-major)."""
    la = F.floor((lat + 90.0) / cell_deg).cast("long")
    lo = F.floor((lon + 180.0) / cell_deg).cast("long")
    return la * F.lit(1_000_000) + lo


def haversine_km(lat1, lon1, lat2, lon2) -> Column:
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon) * F.sin(dlon)
    )
    return F.lit(2 * _EARTH_KM) * F.asin(F.sqrt(a))


def within_distance_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    lat_l: str = "lat",
    lon_l: str = "lon",
    lat_r: str = "lat",
    lon_r: str = "lon",
) -> DataFrame:
    """All (left, right) pairs within ``radius_km`` — the NEAR/WITHIN
    join.  Output: every left column, every right column (right's
    renamed with ``r_`` prefix on collision), plus ``distance_km``.

    Cell size is the radius in degrees at the equator — the worst case
    for longitude shrink is handled by using latitude degrees (which
    never shrink); every true match is inside the probe's 3×3 cells.
    """
    cell_deg = max(radius_km / _KM_PER_DEG_LAT, 1e-6)

    lcols = set(left.columns)
    renames = {c: f"r_{c}" for c in right.columns if c in lcols}
    r = right
    for old, new in renames.items():
        r = r.withColumnRenamed(old, new)
    rlat = renames.get(lat_r, lat_r)
    rlon = renames.get(lon_r, lon_r)

    # build side: one cell per row
    build = r.withColumn("__cell", _cell(F.col(rlat), F.col(rlon), cell_deg))
    # probe side: explode to the 3×3 neighborhood
    la = F.floor((F.col(lat_l) + 90.0) / cell_deg).cast("long")
    lo = F.floor((F.col(lon_l) + 180.0) / cell_deg).cast("long")
    neighbors = F.array(
        *[
            (la + di) * F.lit(1_000_000) + (lo + dj)
            for di in (-1, 0, 1)
            for dj in (-1, 0, 1)
        ]
    )
    probe = left.withColumn("__cell", F.explode(neighbors))
    joined = probe.join(build, "__cell").drop("__cell")
    return (
        joined.withColumn(
            "distance_km",
            haversine_km(F.col(lat_l), F.col(lon_l), F.col(rlat), F.col(rlon)),
        )
        .filter(F.col("distance_km") <= radius_km)
        .dropDuplicates(
            [c for c in left.columns] + [renames.get(c, c) for c in right.columns]
        )
    )


_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash(lat: float, lon: float, precision: int = 9) -> str:
    """Standard geohash base32 encoding (pure Python, used per Arrow
    batch by :func:`geohash_col`)."""
    lat_rng = [-90.0, 90.0]
    lon_rng = [-180.0, 180.0]
    bits = []
    even = True
    while len(bits) < precision * 5:
        if even:
            mid = (lon_rng[0] + lon_rng[1]) / 2
            if lon >= mid:
                bits.append(1)
                lon_rng[0] = mid
            else:
                bits.append(0)
                lon_rng[1] = mid
        else:
            mid = (lat_rng[0] + lat_rng[1]) / 2
            if lat >= mid:
                bits.append(1)
                lat_rng[0] = mid
            else:
                bits.append(0)
                lat_rng[1] = mid
        even = not even
    out = []
    for i in range(0, len(bits), 5):
        v = 0
        for b in bits[i : i + 5]:
            v = (v << 1) | b
        out.append(_BASE32[v])
    return "".join(out)


_GH_UDF: dict = {}


def geohash_col(lat: Column, lon: Column, precision: int = 9) -> Column:
    """geo.geohash(lat, lon[, precision]) — the reference's index cell
    key (LSMTreeGeoIndex geohash covering)."""
    if precision not in _GH_UDF:
        import pandas as pd
        from pyspark.sql.types import StringType

        def batch(la, lo):
            return pd.Series(
                [
                    None if a is None or o is None else geohash(float(a), float(o), precision)
                    for a, o in zip(la, lo)
                ]
            )

        _GH_UDF[precision] = F.pandas_udf(batch, StringType())
    return _GH_UDF[precision](lat.cast("double"), lon.cast("double"))

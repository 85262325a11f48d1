"""Geospatial scalar functions (SURVEY.md §2.8 geo, §2.9 tile math).

All tile/mercator math is pure arithmetic over Columns (the
reference's terrain-proxy/server.js:52-93 and
create_nationalmap_mbtiles.py:15-33 do the same math per request in
JS/Python) — so it runs inside codegen and is oracle-checkable in
ANSI SQL. Point-in-polygon (J5) is the ray-cast over a broadcast
polygon edge list, expressed with higher-order functions — no UDF.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def mercator_x(lon: Column | str) -> Column:
    """Web-Mercator forward X in [0,1) (ref terrain-proxy/server.js:52-54)."""
    lon = F.col(lon) if isinstance(lon, str) else lon
    return (lon + F.lit(180.0)) / F.lit(360.0)


def mercator_y(lat: Column | str) -> Column:
    """Web-Mercator forward Y in [0,1) (ref terrain-proxy/server.js:56-60)."""
    lat = F.col(lat) if isinstance(lat, str) else lat
    rad = F.radians(lat)
    return (F.lit(1.0) - F.log(F.tan(rad) + F.lit(1.0) / F.cos(rad)) / F.lit(math.pi)) / F.lit(2.0)


def slippy_tile(lon: Column | str, lat: Column | str, z: int) -> tuple[Column, Column]:
    """lat/lon → slippy tile (x, y) at zoom z
    (ref create_nationalmap_mbtiles.py:15-20)."""
    n = F.lit(float(2**z))
    x = F.floor(mercator_x(lon) * n).cast("bigint")
    y = F.floor(mercator_y(lat) * n).cast("bigint")
    return x, y


def tms_flip(y: Column | str, z: int) -> Column:
    """TMS y-flip (ref create_nationalmap_mbtiles.py:104): (2^z-1)-y."""
    y = F.col(y) if isinstance(y, str) else y
    return F.lit(2**z - 1) - y


def quadkey(x: Column, y: Column, z: int) -> Column:
    """Tile → quadkey string (interleaved bits), a locality-preserving
    partition key for tile tables at scale."""
    parts = []
    for i in range(z, 0, -1):
        digit = (F.shiftright(x.cast("bigint"), i - 1) % 2) + (F.shiftright(y.cast("bigint"), i - 1) % 2) * 2
        parts.append(digit.cast("string"))
    return F.concat(*parts) if parts else F.lit("")


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km — used for buffered locality match
    (ref generate-tlc-localities.js:29-35 uses degree euclidean; we
    expose both)."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = F.sin(dlat / 2) ** 2 + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) ** 2
    return F.lit(6371.0) * 2 * F.asin(F.sqrt(a))


def degree_distance(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Euclidean distance in degrees (ref generate-tlc-localities.js:29-35)."""
    return F.sqrt(F.pow(lat1 - lat2, 2) + F.pow(lon1 - lon2, 2))


def point_in_polygon(lon: Column, lat: Column, ring: Column) -> Column:
    """Ray-cast point-in-polygon (J5; ref power-outages/
    region-mapper.js:18-31), as a pure higher-order-function fold over
    the ring's edges — JVM-side, no UDF, so a broadcast polygon list
    can be tested against billions of points.

    ``ring`` is ``array<struct<x:double,y:double>>`` (closed or open).
    Classic even-odd rule: count edges whose (y-range straddles the
    point) and (x-intersection right of the point).
    """
    n = F.size(ring)
    idx = F.sequence(F.lit(0), n - F.lit(2))  # edge i: ring[i] → ring[i+1]

    def crosses(i: Column) -> Column:
        xi = F.element_at(ring, i + 1)["x"]
        yi = F.element_at(ring, i + 1)["y"]
        xj = F.element_at(ring, i + 2)["x"]
        yj = F.element_at(ring, i + 2)["y"]
        straddles = (yi > lat) != (yj > lat)
        x_int = (xj - xi) * (lat - yi) / (yj - yi) + xi
        return F.when(straddles & (lon < x_int), 1).otherwise(0)

    hits = F.aggregate(idx, F.lit(0), lambda acc, i: acc + crosses(i))
    return (hits % 2) == 1

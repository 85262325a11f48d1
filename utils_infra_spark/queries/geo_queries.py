"""Geospatial queries (SURVEY.md §2.8 geo / §7 Phase 7).

The star schema has no lat/lon, so coordinates are DERIVED
deterministically from keys (same arithmetic on both engines), then
the reference's tile/mercator math runs over them as pure Column
expressions — the same expressions a 100 TB tile pipeline would push
into its partition keys.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.geo import mercator_x, mercator_y, point_in_polygon, tms_flip
from ..sources import load_table
from . import register

Z = 6  # zoom level for the tile-cover queries


@register(
    "mercator_tile_cover",
    oracle=f"""
    WITH pts AS (
      SELECT l_orderkey, l_linenumber,
             (l_partkey % 360) - 180 + 0.5 AS lon,
             (l_suppkey % 140) - 70 + 0.5 AS lat
      FROM lineitem
    ),
    tiles AS (
      SELECT l_orderkey, l_linenumber,
             CAST(floor((lon + 180.0) / 360.0 * {2**Z}) AS BIGINT) AS tile_x,
             CAST(floor((1.0 - ln(tan(radians(lat)) + 1.0 / cos(radians(lat))) / pi()) / 2.0 * {2**Z}) AS BIGINT) AS tile_y
      FROM pts
    )
    SELECT tile_x, tile_y, CAST({2**Z - 1} - tile_y AS BIGINT) AS tms_y, COUNT(*) AS n
    FROM tiles GROUP BY tile_x, tile_y
    """,
    doc="Slippy-tile cover + TMS y-flip as pure arithmetic (ref create_nationalmap_mbtiles.py:15-20,104; terrain-proxy/server.js:52-60).",
)
def mercator_tile_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        "l_orderkey",
        "l_linenumber",
        ((F.col("l_partkey") % 360) - 180 + 0.5).alias("lon"),
        ((F.col("l_suppkey") % 140) - 70 + 0.5).alias("lat"),
    )
    n = float(2**Z)
    tiles = pts.select(
        F.floor(mercator_x("lon") * n).cast("bigint").alias("tile_x"),
        F.floor(mercator_y("lat") * n).cast("bigint").alias("tile_y"),
    )
    return tiles.groupBy("tile_x", "tile_y").agg(F.count(F.lit(1)).alias("n")).select(
        "tile_x", "tile_y", tms_flip("tile_y", Z).cast("bigint").alias("tms_y"), "n"
    )


@register(
    "point_in_polygon_regions",
    oracle="""
    WITH pts AS (
      SELECT c_custkey,
             (c_custkey % 60) - 30 + 0.25 AS lon,
             (c_custkey % 40) - 20 + 0.25 AS lat
      FROM customer
    )
    SELECT c_custkey, lon, lat,
           CASE
             WHEN lat > -15 AND lat < 15 AND lon > -15 AND lon < 15
                  AND NOT (lat > -5 AND lat < 5 AND lon > -5 AND lon < 5) THEN 'ring'
             WHEN lat > -5 AND lat < 5 AND lon > -5 AND lon < 5 THEN 'core'
             ELSE 'outside'
           END AS region
    FROM pts
    """,
    doc="J5 point-in-polygon via HOF ray-cast vs broadcast polygons; first-match-wins priority (ref power-outages/region-mapper.js:18-59). Oracle uses the equivalent box predicates for these rectilinear test polygons.",
)
def point_in_polygon_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    pts = cust.select(
        "c_custkey",
        ((F.col("c_custkey") % 60) - 30 + 0.25).alias("lon"),
        ((F.col("c_custkey") % 40) - 20 + 0.25).alias("lat"),
    )

    def ring_lit(coords: list[tuple[float, float]]):
        return F.array(*[F.struct(F.lit(x).alias("x"), F.lit(y).alias("y")) for x, y in coords])

    core = ring_lit([(-5, -5), (5, -5), (5, 5), (-5, 5), (-5, -5)])
    outer = ring_lit([(-15, -15), (15, -15), (15, 15), (-15, 15), (-15, -15)])
    in_core = point_in_polygon(F.col("lon"), F.col("lat"), core)
    in_outer = point_in_polygon(F.col("lon"), F.col("lat"), outer)
    # first-match-wins priority: ring (outer minus core) checked first,
    # like the reference's ordered feature scan
    region = (
        F.when(in_outer & ~in_core, F.lit("ring"))
        .when(in_core, F.lit("core"))
        .otherwise(F.lit("outside"))
    )
    return pts.select("c_custkey", "lon", "lat", region.alias("region"))


@register(
    "haversine_nearest",
    oracle="""
    WITH pts AS (
      SELECT s_suppkey,
             (s_suppkey * 7 % 360) - 180 + 0.5 AS lon,
             (s_suppkey * 11 % 140) - 70 + 0.5 AS lat
      FROM supplier
    )
    SELECT s_suppkey, lon, lat,
           ROUND(6371.0 * 2 * asin(sqrt(
             pow(sin(radians(lat - (-41.3)) / 2), 2) +
             cos(radians(-41.3)) * cos(radians(lat)) * pow(sin(radians(lon - 174.8) / 2), 2)
           )), 3) AS dist_wellington_km
    FROM pts
    """,
    doc="Haversine distance as Column arithmetic (geo §2.8; buffered-locality matching, ref generate-tlc-localities.js:29-35).",
)
def haversine_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier")
    pts = sup.select(
        "s_suppkey",
        ((F.col("s_suppkey") * 7 % 360) - 180 + 0.5).alias("lon"),
        ((F.col("s_suppkey") * 11 % 140) - 70 + 0.5).alias("lat"),
    )
    lat1, lon1 = F.lit(-41.3), F.lit(174.8)
    dlat = F.radians(F.col("lat") - lat1)
    dlon = F.radians(F.col("lon") - lon1)
    a = F.pow(F.sin(dlat / 2), 2) + F.cos(F.radians(lat1)) * F.cos(F.radians(F.col("lat"))) * F.pow(F.sin(dlon / 2), 2)
    dist = F.round(F.lit(6371.0) * 2 * F.asin(F.sqrt(a)), 3)
    return pts.select("s_suppkey", "lon", "lat", dist.alias("dist_wellington_km"))

"""Raster <-> vector bridge (north_rule: "raster<->vector").

Vector -> raster: bin points into z-level slippy tiles and aggregate
(the z12 summary layer of SURVEY §3.8 X8 is ``zoom=12``).

Raster -> vector: turn each occupied tile back into a vector feature —
the tile's geographic polygon bounds (west/south/east/north) plus the
aggregated stats.  Bounds come from the inverse web-mercator templates
in :mod:`..functions.sqlgen` so the DuckDB oracle replays them
bit-identically.

Plan shape: one groupBy over (x, y) — a single shuffle keyed by tile id,
~2^2z distinct keys at full coverage, heavily combiner-reduced map-side.
The bounds are per-GROUP column expressions computed after the
aggregate (constant work per occupied tile, no second shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import sqlgen


def tile_summary(
    points: DataFrame, lat: str = "lat", lon: str = "lon", zoom: int = 12
) -> DataFrame:
    """Points -> one row per occupied z-``zoom`` tile:
    (z, x, y, n_points, west, south, east, north).

    ``west/south/east/north`` are the tile's polygon bounds in degrees
    (rounded to 9 dp for cross-engine hash stability) — a tile-grid
    raster cell re-expressed as a vector bbox feature.
    """
    binned = points.select(
        F.expr(sqlgen.tile_x_sql(lon, zoom)).alias("x"),
        F.expr(sqlgen.tile_y_sql(lat, zoom)).alias("y"),
    )
    agg = binned.groupBy("x", "y").agg(F.count(F.lit(1)).alias("n_points"))
    return agg.select(
        F.lit(zoom).alias("z"),
        "x", "y", "n_points",
        F.expr(f"round({sqlgen.tile_lon_sql('x', zoom)}, 9)").alias("west"),
        F.expr(f"round({sqlgen.tile_lat_sql('y + 1', zoom)}, 9)").alias("south"),
        F.expr(f"round({sqlgen.tile_lon_sql('x + 1', zoom)}, 9)").alias("east"),
        F.expr(f"round({sqlgen.tile_lat_sql('y', zoom)}, 9)").alias("north"),
    )


def tile_pyramid(
    points: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
    zoom_max: int = 12,
    zoom_min: int = 8,
) -> DataFrame:
    """Multi-resolution tile rollup (H3/S2-style ``compact`` ancestry):
    one row per occupied tile at EVERY zoom in [zoom_min, zoom_max] —
    (z, x, y, n_points).

    Plan shape — the scan-sized shuffle happens ONCE: points are binned
    and aggregated at zoom_max (map-side combined groupBy, the only
    shuffle proportional to input size), then each base tile explodes
    into its (zoom_max - zoom_min + 1) ancestors (parent coords are
    floor-halved per level — exact, because slippy x/y are plain floors
    of a monotone map, so floor-halving commutes with re-binning) and a
    second TINY aggregation (~#occupied-tiles x levels rows) sums counts
    per (z, x, y).  At 100 TB the second shuffle is megabytes.
    """
    base = (
        points.select(
            F.expr(sqlgen.tile_x_sql(lon, zoom_max)).alias("x"),
            F.expr(sqlgen.tile_y_sql(lat, zoom_max)).alias("y"),
        )
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ancestors = F.array(*[
        F.struct(
            F.lit(z).alias("z"),
            F.expr(sqlgen.tile_parent_sql("x", zoom_max - z)).alias("px"),
            F.expr(sqlgen.tile_parent_sql("y", zoom_max - z)).alias("py"),
        )
        for z in range(zoom_min, zoom_max + 1)
    ])
    return (
        base.select(F.explode(ancestors).alias("a"), "n")
        .groupBy(
            F.col("a.z").alias("z"),
            F.col("a.px").alias("x"),
            F.col("a.py").alias("y"),
        )
        .agg(F.sum("n").alias("n_points"))
    )


def _ring_tile_bbox(ring, zoom: int) -> tuple[int, int, int, int]:
    """Tile-coordinate bbox covering the ring's geographic bbox."""
    import math as _m

    n = 1 << zoom
    lats = [p[0] for p in ring]
    lons = [p[1] for p in ring]

    def tx(lo: float) -> int:
        return min(max(int(_m.floor((lo + 180.0) / 360.0 * n)), 0), n - 1)

    def ty(la: float) -> int:
        a = _m.log(_m.tan(_m.radians(la)) + 1.0 / _m.cos(_m.radians(la)))
        return min(max(int(_m.floor((1.0 - a / _m.pi) / 2.0 * n)), 0), n - 1)

    # y grows southward: max lat -> min y
    return tx(min(lons)), tx(max(lons)), ty(max(lats)), ty(min(lats))


def polygon_tile_cover(spark, ring, zoom: int) -> DataFrame:
    """Vector -> raster: the set of z-``zoom`` tiles whose CENTER lies
    inside the polygon ring (center-containment cover — deterministic,
    the standard raster burn rule).  Returns (z, x, y).

    Plan shape: candidate tiles are enumerated from the ring's bbox with
    ONE ``spark.range`` (id -> (x, y) by div/mod — partitioned, no join,
    no driver materialization) and filtered by the portable ray-cast
    expression on the tile-center lat/lon.  The ring rides the plan as
    literals (a handful of vertices — the broadcast-small side).  At
    planetary zooms the range is trillions of ids but still a
    fixed-width distributed enumerate-filter: no shuffle at all.
    """
    x0, x1, y0, y1 = _ring_tile_bbox(ring, zoom)
    nx = x1 - x0 + 1
    ny = y1 - y0 + 1
    cand = spark.range(0, nx * ny).select(
        (F.lit(x0) + (F.col("id") % nx)).alias("x"),
        F.expr(f"{y0} + (id div {nx})").alias("y"),
    )
    latc = sqlgen.tile_lat_sql(f"y + {sqlgen.dlit(0.5)}", zoom)
    lonc = sqlgen.tile_lon_sql(f"x + {sqlgen.dlit(0.5)}", zoom)
    inside = sqlgen.point_in_poly_sql(latc, lonc, ring)
    return cand.where(F.expr(inside)).select(
        F.lit(zoom).alias("z"), "x", "y"
    )

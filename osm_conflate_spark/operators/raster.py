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

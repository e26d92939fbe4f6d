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
    """Tile-coordinate bbox covering the ring's geographic bbox.

    Precondition (validated by :func:`polygon_tile_cover`): the ring
    must not cross the antimeridian — a ring spanning lon +170..-170
    would bbox to nearly the whole longitude band — and |lat| must stay
    below the web-mercator limit ~85.05° (``tan`` diverges at the pole).
    """
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


def polygon_tile_cover(
    spark, ring, zoom: int, method: str = "auto"
) -> DataFrame:
    """Vector -> raster: the set of z-``zoom`` tiles whose CENTER lies
    inside the polygon ring (center-containment cover — deterministic,
    the standard raster burn rule).  Returns (z, x, y).

    Preconditions (shared with :func:`_ring_tile_bbox`): the ring must
    not cross the antimeridian and |lat| must stay below the web-
    mercator limit (~85.05°); both are validated and raise.

    ``method='flat'`` is the original enumerate-filter: one
    ``spark.range`` over the ring's bbox tile grid (id -> (x, y) by
    div/mod — no join, no shuffle), ray-cast filter on tile centers.
    O(bbox_tiles x ring_edges) compute — fine to ~z14, quadratically
    wasteful for a sparse polygon at planetary zooms.

    ``method='quadtree'`` (default) is the 100x-scale shape: a level-
    synchronous quadtree descent.  Seed tiles at a coarse zoom; per
    level, classify each quad against the ring — fully-inside (commit
    the whole subtree, no further evaluation), fully-outside (prune), or
    boundary (split into 4 children) — in an Arrow-batched numpy kernel
    (corner ray-casts + edge-bbox overlap; the classification is exact:
    if no edge's bbox touches the quad the boundary cannot cross it, so
    corner containment decides the whole quad).  Only boundary quads
    survive to the next level, so live rows per level are
    O(perimeter_tiles), total work O(perimeter x zoom x edges + |cover|)
    instead of O(bbox_area x edges): the area cost remains only in
    EXPANDING committed interior quads to leaf tiles, which is pure
    output enumeration (chunked ``explode(sequence)``, 6 levels per
    step, no per-tile ray-casts), and in the exact center-containment
    filter over BOUNDARY leaves only, which uses the same bit-exact SQL
    ray-cast as the flat path (and the DuckDB oracle).  All level plans
    are narrow (kernel + filter + explode) — still no shuffle anywhere.
    """
    lats = [p[0] for p in ring]
    lons = [p[1] for p in ring]
    if max(lons) - min(lons) > 180.0:
        raise ValueError(
            "ring spans >180° of longitude — antimeridian-crossing rings "
            "are not supported (split the ring at ±180 first)"
        )
    if max(abs(la) for la in lats) >= 85.05112878:
        raise ValueError("ring latitude beyond web-mercator limit ±85.05°")
    if method == "auto":
        # measured crossover (BENCH/BASELINE.md): flat's one compiled
        # expression streams ~0.7G edge-tests/s and beats the quadtree's
        # ~10 level jobs for simple rings at moderate zooms (64-vertex
        # z15: 5.7s vs 13s), but at coastline vertex counts the single
        # |ring|-term expression exceeds codegen limits and interprets
        # (512-vertex z15: 190s vs 106s), and at planetary zooms the
        # bbox enumeration itself is the bottleneck
        bx0, bx1, by0, by1 = _ring_tile_bbox(ring, zoom)
        bbox_tiles = (bx1 - bx0 + 1) * (by1 - by0 + 1)
        method = (
            "quadtree"
            if len(ring) >= 64 or bbox_tiles * len(ring) > 4e9
            else "flat"
        )
    if method == "flat":
        x0, x1, y0, y1 = _ring_tile_bbox(ring, zoom)
        nx = x1 - x0 + 1
        ny = y1 - y0 + 1
        # center lat/lon become COLUMNS before the ray-cast so the
        # |ring|-term crossing expression references two slim doubles
        # instead of inlining the mercator inverse per edge
        cand = spark.range(0, nx * ny).select(
            (F.lit(x0) + (F.col("id") % nx)).alias("x"),
            F.expr(f"{y0} + (id div {nx})").alias("y"),
        ).select(
            "x", "y",
            F.expr(
                sqlgen.tile_lat_sql(f"y + {sqlgen.dlit(0.5)}", zoom)
            ).alias("latc"),
            F.expr(
                sqlgen.tile_lon_sql(f"x + {sqlgen.dlit(0.5)}", zoom)
            ).alias("lonc"),
        )
        inside = sqlgen.point_in_poly_sql("latc", "lonc", ring)
        return cand.where(F.expr(inside)).select(
            F.lit(zoom).alias("z"), "x", "y"
        )
    if method != "quadtree":
        raise ValueError(f"unknown method {method!r}")

    z_seed = min(zoom, 6)
    x0, x1, y0, y1 = _ring_tile_bbox(ring, z_seed)
    nx, ny = x1 - x0 + 1, y1 - y0 + 1
    live = spark.range(0, nx * ny).select(
        (F.lit(x0) + (F.col("id") % nx)).alias("x"),
        F.expr(f"{y0} + (id div {nx})").alias("y"),
    )

    import numpy as _np
    import pandas as _pd

    from .region import point_in_poly_np

    ring_np = _np.asarray(ring, dtype=_np.float64)
    edge_boxes = []
    y1_, x1_ = ring[-1]
    for y2_, x2_ in ring:
        edge_boxes.append(
            (min(y1_, y2_), max(y1_, y2_), min(x1_, x2_), max(x1_, x2_))
        )
        y1_, x1_ = y2_, x2_

    def _classify_kernel(z: int):
        """Arrow-batched numpy quad classifier at zoom ``z``: per quad,
        (# corners inside ring, any edge bbox overlaps quad).  Numpy —
        NOT a generated SQL expression — because each level would need
        its own ~4 x |ring| nested ray-cast expression and janino
        compilation time (minutes across ~10 levels x 64-vertex rings)
        swamps the milliseconds of actual work on the O(perimeter)
        boundary set.  Fp-robustness: a corner test can only disagree
        with exact geometry when an edge passes near the quad, and any
        such quad has edge-bbox overlap -> classified boundary anyway,
        so commits/prunes stay exact; the final leaf filter below uses
        the bit-exact SQL ray-cast shared with the DuckDB oracle."""
        n = float(1 << z)

        def run(batches):
            for pdf in batches:
                x = pdf["x"].to_numpy(dtype=_np.float64)
                y = pdf["y"].to_numpy(dtype=_np.float64)
                west = x / n * 360.0 - 180.0
                east = (x + 1.0) / n * 360.0 - 180.0
                north = _np.degrees(
                    _np.arctan(_np.sinh(_np.pi * (1.0 - 2.0 * y / n)))
                )
                south = _np.degrees(
                    _np.arctan(_np.sinh(_np.pi * (1.0 - 2.0 * (y + 1.0) / n)))
                )
                n_in = _np.zeros(len(pdf), dtype=_np.int32)
                for la, lo in (
                    (north, west), (north, east), (south, west), (south, east)
                ):
                    n_in += point_in_poly_np(la, lo, ring_np)
                ov = _np.zeros(len(pdf), dtype=bool)
                for e_s, e_n, e_w, e_e in edge_boxes:
                    ov |= ~(
                        (e_e < west) | (e_w > east)
                        | (e_n < south) | (e_s > north)
                    )
                yield _pd.DataFrame(
                    {"x": pdf["x"], "y": pdf["y"], "n_in": n_in, "ov": ov}
                )

        return run

    committed = []  # interior quads as (zq, x, y) DataFrames
    for z in range(z_seed, zoom):
        # level-synchronous: materialize each level's classification
        # (O(perimeter) rows — quad counts, not tile counts) so plans
        # stay one level deep
        tagged = live.mapInPandas(
            _classify_kernel(z), "x long, y long, n_in int, ov boolean"
        ).localCheckpoint(eager=True)
        committed.append(
            tagged.where("n_in = 4 AND NOT ov")
            .select(F.lit(z).alias("zq"), "x", "y")
        )
        live = (
            tagged.where("ov OR (n_in > 0 AND n_in < 4)")
            .select(
                F.explode(F.array(F.lit(0), F.lit(1))).alias("dx"), "x", "y"
            )
            .select(
                F.explode(F.array(F.lit(0), F.lit(1))).alias("dy"),
                "dx", "x", "y",
            )
            .select(
                (F.col("x") * 2 + F.col("dx")).alias("x"),
                (F.col("y") * 2 + F.col("dy")).alias("y"),
            )
        )

    # boundary leaves at final zoom: the exact center-containment rule
    # (same column-ized shape as the flat path)
    out = live.select(
        "x", "y",
        F.expr(
            sqlgen.tile_lat_sql(f"y + {sqlgen.dlit(0.5)}", zoom)
        ).alias("latc"),
        F.expr(
            sqlgen.tile_lon_sql(f"x + {sqlgen.dlit(0.5)}", zoom)
        ).alias("lonc"),
    ).where(
        F.expr(sqlgen.point_in_poly_sql("latc", "lonc", ring))
    ).select("x", "y")

    # expand committed interior quads to leaf tiles, <=6 levels per step
    # so each sequence() stays <=64 wide
    for idx, part in enumerate(committed):
        zq = z_seed + idx
        rem = zoom - zq
        quads = part.drop("zq")
        while rem > 0:
            step = min(6, rem)
            side = 1 << step
            quads = (
                quads.select(
                    F.explode(
                        F.sequence(F.lit(0), F.lit(side - 1))
                    ).alias("dx"),
                    "x", "y",
                )
                .select(
                    F.explode(
                        F.sequence(F.lit(0), F.lit(side - 1))
                    ).alias("dy"),
                    "dx", "x", "y",
                )
                .select(
                    (F.col("x") * side + F.col("dx")).alias("x"),
                    (F.col("y") * side + F.col("dy")).alias("y"),
                )
            )
            rem -= step
        out = out.unionByName(quads)
    return out.select(F.lit(zoom).alias("z"), "x", "y")

"""Shared SQL expression templates.

The SAME template string is used to build the Spark column
(``F.expr(template)``) and the DuckDB oracle SQL.  Textual identity of
the arithmetic keeps the two engines' float64 results bit-aligned
(both follow IEEE-754 and ANSI semantics for ``floor/cos/ln/sqrt/pow``),
which is what the driver's value-hash comparison needs.

Only portable constructs are used: ``radians cos sqrt pow floor ln tan
abs least greatest cast %``.  ``floor`` returns BIGINT in Spark but
DOUBLE in DuckDB, so every floor is wrapped in ``CAST(... AS BIGINT)``.

Geometry reference: SURVEY.md §2.3 (distance X1), §8.3 (cell scheme S1),
§3.8 X8 (z12 tiles).  The reference implementation being mirrored is
``conflate/data.py :: distance`` (equirectangular, R=6378137).
"""

from __future__ import annotations

import math

EARTH_R = 6378137.0
M_PER_DEG = EARTH_R * math.pi / 180.0  # 111319.49079327358


def dlit(x: float) -> str:
    """DOUBLE literal portable across Spark SQL and DuckDB.

    Spark parses bare decimal-point literals (``1.5``) as DECIMAL, DuckDB
    as DOUBLE — E-notation (``1.5E0``) is DOUBLE in both.
    """
    s = repr(float(x))
    return s if ("e" in s or "E" in s) else s + "E0"


def distance_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """Equirectangular distance in meters — bit-compatible with the
    reference ``conflate/data.py :: distance`` (SURVEY §2.3)."""
    return (
        f"{dlit(EARTH_R)} * sqrt("
        f"pow(radians(({lon1}) - ({lon2})) * cos({dlit(0.5)} * radians(({lat1}) + ({lat2}))), 2)"
        f" + pow(radians(({lat1}) - ({lat2})), 2))"
    )


# Mean earth radius (IUGG R1) for great-circle math; the reference's
# equirectangular distance keeps the equatorial radius above — the two
# constants intentionally differ (SURVEY §2.3 note on small-distance
# error bounds).
EARTH_R_MEAN = 6371008.8


def haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """Great-circle distance in meters (haversine formula).

    Complements the reference's equirectangular ``distance_sql``: exact
    on the sphere at ANY separation (the equirectangular form degrades
    past ~1 deg and breaks across the antimeridian), so this is the
    right expression for extent diagnostics / long-range joins while
    X1 stays bit-compatible for the matcher.  ``least(1, .)`` guards
    the asin domain against rounding at antipodal points.  Portable
    same-text: radians/sin/cos/asin/sqrt/pow/least are IEEE-aligned in
    Spark and DuckDB.
    """
    half_dlat = f"{dlit(0.5)} * radians(({lat2}) - ({lat1}))"
    half_dlon = f"{dlit(0.5)} * radians(({lon2}) - ({lon1}))"
    a = (
        f"pow(sin({half_dlat}), 2)"
        f" + cos(radians({lat1})) * cos(radians({lat2})) * pow(sin({half_dlon}), 2)"
    )
    return f"{dlit(2.0)} * {dlit(EARTH_R_MEAN)} * asin(sqrt(least({dlit(1.0)}, {a})))"


def bearing_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """Initial great-circle bearing from point 1 to point 2, degrees
    clockwise from north in [0, 360).  ``% 360`` on DOUBLE is fmod in
    both engines; the ``+ 360`` shift maps atan2's [-180, 180] output
    into the non-negative range first so the mod is engine-agnostic."""
    dlon = f"radians(({lon2}) - ({lon1}))"
    y = f"sin({dlon}) * cos(radians({lat2}))"
    x = (
        f"cos(radians({lat1})) * sin(radians({lat2}))"
        f" - sin(radians({lat1})) * cos(radians({lat2})) * cos({dlon})"
    )
    return f"(degrees(atan2({y}, {x})) + {dlit(360.0)}) % {dlit(360.0)}"


# ---------------------------------------------------------------------------
# Cell grid (S1): equirectangular grid, band height = cell_m meters,
# per-band column count chosen so column width >= cell_m meters everywhere
# in the band.  cell id = band * 2^32 + col.  (SURVEY §8.3)
# ---------------------------------------------------------------------------

def band_height_deg(cell_m: float) -> float:
    return cell_m / M_PER_DEG


def n_bands(cell_m: float) -> int:
    return int(math.ceil(180.0 / band_height_deg(cell_m)))


def band_sql(lat: str, cell_m: float) -> str:
    h = band_height_deg(cell_m)
    nb = n_bands(cell_m)
    return (
        f"least(greatest(cast(floor((({lat}) + {dlit(90.0)}) / {dlit(h)}) as bigint), "
        f"cast(0 as bigint)), cast({nb - 1} as bigint))"
    )


def ncols_sql(band: str, cell_m: float) -> str:
    """Columns in a band: width >= cell_m meters at the band's
    pole-nearest edge (worst case), so k-ring-1 is neighbor-complete."""
    h = band_height_deg(cell_m)
    # pole-nearest edge latitude of the band, capped at 90
    edge = (
        f"least(greatest(abs({dlit(-90.0)} + ({band}) * {dlit(h)}), "
        f"abs({dlit(-90.0)} + (({band}) + 1) * {dlit(h)})), {dlit(90.0)})"
    )
    return (
        f"greatest(cast(floor({dlit(360.0)} * {dlit(M_PER_DEG)} * cos(radians({edge})) / {dlit(cell_m)}) "
        f"as bigint), cast(1 as bigint))"
    )


def col_sql(lon: str, ncols: str) -> str:
    return (
        f"least(greatest(cast(floor(((({lon}) + {dlit(180.0)}) / {dlit(360.0)}) * ({ncols})) as bigint), "
        f"cast(0 as bigint)), ({ncols}) - 1)"
    )


CELL_SHIFT = 4294967296  # 2^32


def cell_id_sql(band: str, col: str) -> str:
    return f"(({band}) * cast({CELL_SHIFT} as bigint) + ({col}))"


def cell_sql(lat: str, lon: str, cell_m: float) -> str:
    """Full (lat,lon) -> int64 cell id expression."""
    b = band_sql(lat, cell_m)
    nc = ncols_sql(b, cell_m)
    c = col_sql(lon, nc)
    return cell_id_sql(b, c)


# ---------------------------------------------------------------------------
# Portable string hash (cross-engine oracle support)
# ---------------------------------------------------------------------------

def hash60_sql(s: str, engine: str) -> str:
    """Portable non-negative 60-bit integer hash of a string expression:
    the first 15 hex chars of md5 as a BIGINT.  md5 hex is lowercase in
    both Spark and DuckDB, so the value is engine-identical — this is
    what lets xxhash64-style operators (minhash, simhash, fingerprint)
    be oracled end-to-end in DuckDB.  60 bits < 2^63 so ANSI-mode Spark
    never overflows.
    """
    if engine == "spark":
        return f"CAST(conv(substr(md5({s}), 1, 15), 16, 10) AS BIGINT)"
    if engine == "duck":
        return f"CAST(('0x' || substr(md5({s}), 1, 15)) AS BIGINT)"
    raise ValueError(engine)


# ---------------------------------------------------------------------------
# z-level slippy tiles (X8)
# ---------------------------------------------------------------------------

def tile_x_sql(lon: str, zoom: int) -> str:
    n = 1 << zoom
    return (
        f"least(greatest(cast(floor((({lon}) + {dlit(180.0)}) / {dlit(360.0)} * {dlit(n)}) as bigint), "
        f"cast(0 as bigint)), cast({n - 1} as bigint))"
    )


def tile_y_sql(lat: str, zoom: int) -> str:
    # asinh(tan(phi)) written as ln(tan(phi) + 1/cos(phi)) — DuckDB has no asinh.
    n = 1 << zoom
    asinh_tan = f"ln(tan(radians({lat})) + {dlit(1.0)} / cos(radians({lat})))"
    return (
        f"least(greatest(cast(floor(({dlit(1.0)} - {asinh_tan} / pi()) / {dlit(2.0)} * {dlit(n)}) as bigint), "
        f"cast(0 as bigint)), cast({n - 1} as bigint))"
    )


# ---------------------------------------------------------------------------
# Inverse slippy tiles (raster -> vector): tile (x, y, z) -> geographic
# bounds of the tile square.  West/east are linear in x; north/south
# invert the web-mercator y via lat = degrees(atan(sinh(pi*(1 - 2y/n))))
# with sinh spelled as (exp(t) - exp(-t))/2 — exp/atan/degrees/pi() are
# portable across Spark SQL and DuckDB (DuckDB 1.0 has no sinh/asinh).
# ---------------------------------------------------------------------------

def tile_lon_sql(x: str, zoom: int) -> str:
    """Longitude of the WEST edge of tile column ``x`` (pass ``x+1`` for
    the east edge)."""
    n = 1 << zoom
    return f"(({x}) * {dlit(360.0)} / {dlit(n)} - {dlit(180.0)})"


def tile_lat_sql(y: str, zoom: int) -> str:
    """Latitude of the NORTH edge of tile row ``y`` (pass ``y+1`` for the
    south edge)."""
    n = 1 << zoom
    t = f"(pi() * ({dlit(1.0)} - {dlit(2.0)} * ({y}) / {dlit(n)}))"
    sinh = f"((exp({t}) - exp(-{t})) / {dlit(2.0)})"
    return f"degrees(atan({sinh}))"


# ---------------------------------------------------------------------------
# Deterministic synthetic point derivation (used by __spark_entry__ queries
# so Spark and the DuckDB oracle compute identical point clouds from the
# shared TPC-H-ish tables — no external data).
# ---------------------------------------------------------------------------

def derived_lat_sql(key: str) -> str:
    """key (BIGINT) -> latitude in [-60, 60) via integer arithmetic."""
    return (
        f"((((({key}) * 7919 + 13) % 1200000) + 1200000) % 1200000) "
        f"/ {dlit(10000.0)} - {dlit(60.0)}"
    )


def derived_lon_sql(key: str) -> str:
    """key (BIGINT) -> longitude in [-180, 180)."""
    return (
        f"((((({key}) * 104729 + 7) % 3600000) + 3600000) % 3600000) "
        f"/ {dlit(10000.0)} - {dlit(180.0)}"
    )


# ---------------------------------------------------------------------------
# Point-in-polygon (F4 / north-rule spatial op): even-odd ray casting as
# a portable SQL boolean, operation-for-operation identical to the
# vectorized numpy twin ``operators.region.point_in_poly_np`` (same IEEE
# float64 expression order: ``(x2-x1)*(py-y1)/(y2-y1)+x1``), so the
# engine's Arrow-batched region assigner can be oracled bit-exactly in
# DuckDB.  Rings MUST have no horizontal edges (consecutive equal
# latitudes) — the generator asserts this so the division is always
# defined in both engines (no NULL-vs-inf divergence).
# ---------------------------------------------------------------------------

def point_in_poly_sql(lat: str, lon: str, ring) -> str:
    """(lat, lon) inside closed ring [(lat, lon), ...] — XOR fold of
    per-edge right-ray crossing tests (boolean ``<>`` is XOR in both
    Spark SQL and DuckDB; the fold is explicitly left-nested because the
    Postgres-family parser treats chained ``a <> b <> c`` as a syntax
    error — comparison ops are non-associative)."""
    terms = []
    y1, x1 = ring[-1]
    for y2, x2 in ring:
        if y1 == y2:  # ValueError, not assert: must hold under python -O
            raise ValueError(
                "horizontal edge: ray-cast division undefined (NULL-vs-inf "
                "semantics would diverge between Spark and DuckDB)"
            )
        crosses = f"(({dlit(y1)} > ({lat})) <> ({dlit(y2)} > ({lat})))"
        xint = (
            f"(({dlit(x2)} - {dlit(x1)}) * (({lat}) - {dlit(y1)})"
            f" / ({dlit(y2)} - {dlit(y1)}) + {dlit(x1)})"
        )
        terms.append(f"({crosses} AND (({lon}) < {xint}))")
        y1, x1 = y2, x2
    # balanced XOR tree, not a left-linear fold: XOR is associative so
    # the value is identical, but a coastline-sized ring (hundreds of
    # vertices) left-nested blows Spark's expression-depth limit
    # (SQLSTATE 54001) at depth |ring| while the balanced tree is depth
    # log2|ring|
    while len(terms) > 1:
        nxt = []
        for i in range(0, len(terms) - 1, 2):
            nxt.append(f"({terms[i]} <> {terms[i + 1]})")
        if len(terms) % 2:
            nxt.append(terms[-1])
        terms = nxt
    return terms[0]


def assign_region_sql(lat: str, lon: str, regions) -> str:
    """First-containing-polygon region code (list order is precedence),
    NULL if none — the SQL twin of ``region.assign_region_col``."""
    whens = "".join(
        f" WHEN {point_in_poly_sql(lat, lon, ring)} THEN '{code}'"
        for code, ring in regions
    )
    return f"(CASE{whens} ELSE NULL END)"


def tile_parent_sql(xy: str, levels_up: int) -> str:
    """Tile coordinate at ``levels_up`` coarser zooms: floor-halve per
    level.  Written as floor-of-double-division (not ``>>``) because
    Spark SQL has no infix shift and tile coords (< 2^26) are exact in
    float64 in both engines."""
    return f"CAST(floor(({xy}) / {dlit(float(1 << levels_up))}) AS BIGINT)"


def quantize_sql(coord: str, lo: float, hi: float, bits: int) -> str:
    """Clamped fixed-point quantization of a coordinate into
    [0, 2^bits): the cell index along one Z-order axis."""
    n = 1 << bits
    return (
        f"least({n - 1}, greatest(0, CAST(floor(({coord} - {dlit(lo)}) / "
        f"{dlit(hi - lo)} * {dlit(float(n))}) AS BIGINT)))"
    )


def zorder_interleave_sql(ix: str, iy: str, bits: int = 16) -> str:
    """Morton/Z-order key: bit-interleave two quantized axes (ix in
    even positions, iy in odd) — the locality-preserving sort key used
    to cluster spatial data on disk so that bounding-box scans touch
    few contiguous key ranges (the standard data-layout trick for
    100 TB spatial tables; Delta/Iceberg OPTIMIZE ZORDER does exactly
    this).  Infix ``>>``/``<<``/``&``/``|`` parse identically in
    Spark 4 and DuckDB, so one text serves both engines.  ``ix``/``iy``
    should be simple column refs (pre-computed via
    :func:`quantize_sql`) — the expression repeats them 2*bits times."""
    terms = []
    for i in range(bits):
        terms.append(f"(((({ix}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({iy}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


_GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_sql(lat: str, lon: str, precision: int = 7) -> str:
    """Geohash (Niemeyer base-32) of a lat/lon — ONE portable SQL text
    for Spark and DuckDB, so the driver row needs no engine dialects.

    A geohash is exactly a Morton code with the LONGITUDE bit first,
    grouped 5 bits per character: for ``precision`` chars there are
    ``5p`` bits — ceil(5p/2) longitude bits, floor(5p/2) latitude bits
    — so the two axes quantize via :func:`quantize_sql` (whose
    least/greatest clamp gives the standard edge behavior: lat=90 /
    lon=180 land in the last cell) and interleave with lon occupying
    the MOST significant bit.  In LSB terms: odd ``precision`` puts
    lon bits at even positions, even ``precision`` the reverse.  Total
    bits ≤ 60 for precision ≤ 12, so the key fits a BIGINT in ANSI
    mode.  Character k is then a substr into the base-32 alphabet —
    all of it whole-stage-codegen in Spark, vectorized in DuckDB.
    """
    total = 5 * precision
    lon_bits = (total + 1) // 2
    ilon = quantize_sql(lon, -180.0, 180.0, lon_bits)
    ilat = quantize_sql(lat, -90.0, 90.0, total // 2)
    z = geohash_bits_sql(ilon, ilat, precision)
    return geohash_chars_sql(z, precision)


def geohash_bits_sql(ilon: str, ilat: str, precision: int) -> str:
    """The 5·precision-bit geohash integer from pre-quantized axes
    (``ilon``/``ilat`` SHOULD be simple column refs computed once in a
    CTE via :func:`quantize_sql` — each is repeated per bit here)."""
    if not 1 <= precision <= 12:
        raise ValueError("precision must be in 1..12")
    total = 5 * precision
    terms = []
    for i in range((total + 1) // 2):
        pos = 2 * i if total % 2 else 2 * i + 1
        terms.append(f"(((({ilon}) >> {i}) & 1) << {pos})")
    for i in range(total // 2):
        pos = 2 * i + 1 if total % 2 else 2 * i
        terms.append(f"(((({ilat}) >> {i}) & 1) << {pos})")
    return "(" + " | ".join(terms) + ")"


def geohash_chars_sql(z: str, precision: int) -> str:
    """Base-32 rendering of a geohash bit key (``z`` should be a simple
    column ref — it is repeated per character)."""
    chars = [
        f"substr('{_GEOHASH32}', CAST(((({z}) >> {5 * (precision - 1 - k)})"
        f" & 31) + 1 AS INT), 1)"
        for k in range(precision)
    ]
    return "concat(" + ", ".join(chars) + ")"

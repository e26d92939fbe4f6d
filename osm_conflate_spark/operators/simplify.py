"""Polyline simplification: distributed Douglas-Peucker over way
geometries.

Tile/preview emission at low zooms (the X6/X8 output family) ships way
geometries; at planetary scale they are simplified per zoom before
rendering.  Douglas-Peucker is the standard algorithm and is
inherently recursive per line — but PERFECTLY parallel across lines,
which is the Spark shape: group vertices by way, run a numpy
stack-based kernel per group inside ``applyInPandas`` (Arrow batches,
no per-row Python).  At 100 TB the shuffle key is the way id, each
group is one way's vertex list (bounded by OSM's 2,000-node way cap),
and skew is structurally impossible.

Geometry: perpendicular distances are computed on an equirectangular
local projection (x = lon·cos(lat₀), y = lat, meters via the shared
M_PER_DEG) with lat₀ the line's mean latitude — consistent with the
engine's X1 distance (SURVEY §2.3), exact enough for simplification
tolerances (meters) at way extents (km).

Not SQL-expressible (data-dependent recursion), so this operator is
pytest-oracled against an independent recursive reference plus the
DP invariants (endpoints kept, output ⊆ input, deviation ≤ epsilon)
rather than carrying a DuckDB driver row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..functions.sqlgen import M_PER_DEG


def dp_mask_np(x: np.ndarray, y: np.ndarray, eps: float) -> np.ndarray:
    """Boolean keep-mask of Douglas-Peucker on planar coords — the
    iterative (explicit stack) formulation, O(n) memory, no Python
    recursion limit on degenerate inputs."""
    n = len(x)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[n - 1] = True
    if n <= 2:
        return keep
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        xi, yi, xj, yj = x[i], y[i], x[j], y[j]
        dx, dy = xj - xi, yj - yi
        seg = np.hypot(dx, dy)
        px, py = x[i + 1:j], y[i + 1:j]
        if seg == 0.0:
            # closed/degenerate span: distance to the (co-located) ends
            d = np.hypot(px - xi, py - yi)
        else:
            d = np.abs(dy * px - dx * py + xj * yi - yj * xi) / seg
        k = int(np.argmax(d))
        if d[k] > eps:
            m = i + 1 + k
            keep[m] = True
            stack.append((i, m))
            stack.append((m, j))
    return keep


def simplify_line_np(
    lat: np.ndarray, lon: np.ndarray, epsilon_m: float
) -> np.ndarray:
    """Keep-mask for one line given lat/lon degrees and a tolerance in
    meters (local equirectangular projection; see module docstring)."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    lat0 = float(lat.mean()) if len(lat) else 0.0
    x = lon * (M_PER_DEG * np.cos(np.radians(lat0)))
    y = lat * M_PER_DEG
    return dp_mask_np(x, y, float(epsilon_m))


def simplify_ways(
    ways: DataFrame,
    epsilon_m: float,
    id_col: str = "way_id",
    seq_col: str = "seq",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Simplify every way in a (way_id, seq, lat, lon) vertex table:
    returns the kept vertices with their original ``seq`` (so callers
    can re-join tags or rebuild geometry order).  One shuffle on the
    way id; the kernel is numpy over Arrow batches."""
    if epsilon_m < 0:
        raise ValueError("epsilon_m must be >= 0")
    types = {f.name: f.dataType.simpleString() for f in ways.schema.fields}
    schema = ", ".join(
        f"{c} {types[c]}" for c in (id_col, seq_col, lat_col, lon_col)
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(seq_col, kind="mergesort")
        mask = simplify_line_np(
            pdf[lat_col].to_numpy(), pdf[lon_col].to_numpy(), epsilon_m
        )
        return pdf.loc[mask, [id_col, seq_col, lat_col, lon_col]]

    return (
        ways.select(id_col, seq_col, lat_col, lon_col)
        .groupBy(id_col)
        .applyInPandas(fn, schema)
    )

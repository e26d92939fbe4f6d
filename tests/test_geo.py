"""Unit tests for distance X1, cell grid S1, k-ring, z12 tiles X8 —
numpy twins only (no Spark); SQL-twin parity is covered in
test_sql_parity.py."""

import math

import numpy as np
import pytest

from osm_conflate_spark.functions import geo, sqlgen
from osm_conflate_spark import reference_model as rm


def test_distance_formula_constants():
    # one degree of latitude at the equator
    d = rm.distance(0.0, 0.0, 1.0, 0.0)
    assert abs(d - math.radians(1.0) * 6378137.0) < 1e-9


def test_distance_np_equals_oracle_bitwise():
    rng = np.random.default_rng(1)
    lat1 = rng.uniform(-85, 85, 1000)
    lon1 = rng.uniform(-180, 180, 1000)
    lat2 = lat1 + rng.uniform(-0.01, 0.01, 1000)
    lon2 = lon1 + rng.uniform(-0.01, 0.01, 1000)
    dv = geo.distance_np(lat1, lon1, lat2, lon2)
    for i in range(1000):
        assert dv[i] == rm.distance(lat1[i], lon1[i], lat2[i], lon2[i])


def test_cell_ids_valid():
    rng = np.random.default_rng(2)
    lat = rng.uniform(-90, 90, 5000)
    lon = rng.uniform(-180, 180, 5000)
    cells = geo.cell_np(lat, lon, 200.0)
    bands = cells // sqlgen.CELL_SHIFT
    cols = cells % sqlgen.CELL_SHIFT
    assert (bands >= 0).all() and (bands < sqlgen.n_bands(200.0)).all()
    assert (cols >= 0).all()


@pytest.mark.parametrize("cell_m", [200.0, 500.0])
def test_kring_neighbor_complete(cell_m):
    """THE grid invariant: any two points within cell_m meters see each
    other through the k-ring (brute-force check, incl. poles/antimeridian)."""
    rng = np.random.default_rng(3)
    n = 400
    lat = np.concatenate(
        [
            rng.uniform(-89.9, 89.9, n),
            rng.uniform(84.9, 89.99, 50),          # near pole
            rng.uniform(-0.01, 0.01, 50),          # equator
        ]
    )
    lon = np.concatenate(
        [
            rng.uniform(-180, 180, n),
            rng.uniform(179.9, 180.0, 50),         # antimeridian
            rng.uniform(-180.0, -179.9, 50),
        ]
    )[: len(lat)]
    # partner points at distances up to cell_m
    d = rng.uniform(0, cell_m, len(lat))
    b = rng.uniform(0, 2 * math.pi, len(lat))
    from osm_conflate_spark.gen import offset_meters

    lat2, lon2 = offset_meters(lat, lon, d, b)
    lat2 = np.clip(lat2, -90, 90)
    lon2 = ((lon2 + 180) % 360) - 180
    ok = geo.distance_np(lat, lon, lat2, lon2) <= cell_m
    rings = geo.kring_np(lat, lon, cell_m)
    cells2 = geo.cell_np(lat2, lon2, cell_m)
    for i in range(len(lat)):
        if ok[i]:
            assert cells2[i] in rings[i], (
                f"point {i}: ({lat[i]},{lon[i]}) -> ({lat2[i]},{lon2[i]}) "
                f"dist missing from kring"
            )


def test_tiles_known_values():
    # FIXTURES case K: Moscow 55.7558N 37.6173E at z12
    x, y = geo.tile_np([55.7558], [37.6173], 12)
    # independent recomputation with the standard slippy formulas
    import math as m

    xt = int((37.6173 + 180.0) / 360.0 * 4096)
    lr = m.radians(55.7558)
    yt = int((1.0 - m.asinh(m.tan(lr)) / m.pi) / 2.0 * 4096)
    assert x[0] == xt and y[0] == yt
    # oracle twin agrees
    from osm_conflate_spark.config import ConflateConfig
    from osm_conflate_spark import reference_model

    res = reference_model.conflate(
        [reference_model.SourcePoint("a", 55.7558, 37.6173)], [], ConflateConfig()
    )
    assert res["tiles"] == [("a", 12, xt, yt)]


def test_tile_edge_clamping():
    x, y = geo.tile_np([85.06, -85.06, 0.0], [-180.0, 179.99999, 0.0], 12)
    assert 0 <= x.min() and x.max() <= 4095
    assert 0 <= y.min() and y.max() <= 4095

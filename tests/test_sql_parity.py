"""Twin-parity tests: the Spark Column expressions (sqlgen templates)
must agree exactly with the numpy twins used inside kernels/oracle —
distance, cell index, k-ring, tiles (SURVEY §8.5 determinism rules)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from osm_conflate_spark.functions import geo


def _random_points(n=2000, seed=4):
    rng = np.random.default_rng(seed)
    lat = rng.uniform(-89.9, 89.9, n)
    lon = rng.uniform(-180.0, 180.0, n)
    return lat, lon


def test_distance_column_vs_numpy(spark):
    lat, lon = _random_points()
    lat2 = lat + np.random.default_rng(5).uniform(-0.01, 0.01, len(lat))
    lon2 = lon + np.random.default_rng(6).uniform(-0.01, 0.01, len(lon))
    pdf = pd.DataFrame({"lat1": lat, "lon1": lon, "lat2": lat2, "lon2": lon2})
    df = spark.createDataFrame(pdf)
    got = np.array(
        [
            r[0]
            for r in df.select(
                geo.distance_col("lat1", "lon1", "lat2", "lon2")
            ).collect()
        ]
    )
    want = geo.distance_np(lat, lon, lat2, lon2)
    # JVM Math vs libm may differ by ~1 ulp through cos; the engine never
    # relies on JVM distance for semantics (kernel recomputes in numpy)
    assert np.max(np.abs(got - want) / np.maximum(want, 1e-9)) < 1e-12


def test_cell_column_vs_numpy(spark):
    lat, lon = _random_points()
    df = spark.createDataFrame(pd.DataFrame({"lat": lat, "lon": lon}))
    got = np.array(
        [r[0] for r in df.select(geo.cell_col("lat", "lon", 200.0)).collect()]
    )
    want = geo.cell_np(lat, lon, 200.0)
    assert (got == want).all()


def test_kring_column_vs_numpy(spark):
    lat, lon = _random_points(500, seed=7)
    df = spark.createDataFrame(pd.DataFrame({"lat": lat, "lon": lon}))
    got = [
        sorted(r[0]) for r in df.select(geo.kring_col("lat", "lon", 200.0)).collect()
    ]
    want = geo.kring_np(lat, lon, 200.0)
    for g, w in zip(got, want):
        assert g == sorted(w.tolist())


def test_tile_columns_vs_numpy(spark):
    lat, lon = _random_points(1000, seed=8)
    df = spark.createDataFrame(pd.DataFrame({"lat": lat, "lon": lon}))
    x, y = geo.tile_cols("lat", "lon", 12)
    got = df.select(x.alias("x"), y.alias("y")).collect()
    wx, wy = geo.tile_np(lat, lon, 12)
    assert [r["x"] for r in got] == wx.tolist()
    assert [r["y"] for r in got] == wy.tolist()

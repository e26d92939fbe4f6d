"""Spatial data layout: Z-order clustering for scan locality.

At 100 TB a spatial table's dominant cost is how many files a
bounding-box query touches.  Sorting by a Morton (Z-order) key —
bit-interleaved quantized lat/lon — places spatially-near rows in the
same or adjacent files, so partition pruning on the key range skips
most of the table (this is what Delta/Iceberg ``OPTIMIZE ZORDER BY``
does; here it is a first-class operator over plain columns).

:func:`with_zorder_key` is pure codegen (two quantizations + one
interleave expression, no UDF); :func:`cluster_by_zorder` adds the
physical layout: ``repartitionByRange`` on the key (sampled range
boundaries — balanced output files even under spatial skew, the same
reason range-cut beats hash for the match kernel's dense cells) +
in-partition sort, ready for a parquet write whose per-file min/max
key stats become the pruning index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import sqlgen

LAT_RANGE = (-90.0, 90.0)
LON_RANGE = (-180.0, 180.0)


def with_zorder_key(
    df: DataFrame, lat: str = "lat", lon: str = "lon", bits: int = 16
) -> DataFrame:
    """Add ``zkey``: the 2*bits-bit Morton key of (lat, lon).  The
    quantized axes are materialized as columns first so the interleave
    expression references cheap ints, not 2*bits repeats of the
    quantization arithmetic."""
    qx = sqlgen.quantize_sql(lon, LON_RANGE[0], LON_RANGE[1], bits)
    qy = sqlgen.quantize_sql(lat, LAT_RANGE[0], LAT_RANGE[1], bits)
    return df.withColumns(
        {"__zx": F.expr(qx), "__zy": F.expr(qy)}
    ).withColumn(
        "zkey", F.expr(sqlgen.zorder_interleave_sql("__zx", "__zy", bits))
    ).drop("__zx", "__zy")


def cluster_by_zorder(
    df: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
    bits: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Range-partition + sort by the Z-order key: the write-side
    layout operator.  Plan shape: one Exchange rangepartitioning(zkey)
    (sampled boundaries) + in-partition Sort — asserted in tests."""
    keyed = with_zorder_key(df, lat, lon, bits)
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return keyed.repartitionByRange(parts, "zkey").sortWithinPartitions("zkey")

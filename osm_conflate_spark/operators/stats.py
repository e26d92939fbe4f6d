"""Robust per-group statistics: winsorized moments.

The feature-normalization pre-pass of an events/telemetry pipeline:
clip each group's values at its own [p_lo, p_hi] percentiles
(winsorization) and report the clipped mean/std — outlier-robust
scaling parameters a downstream model actually wants, computed
without ever materializing a per-group sort on the worker.

100 TB shape: two passes over the source (percentile aggregation,
then moment aggregation over clipped values) with the tiny per-group
percentile table BROADCAST back between them — NOT one pass with a
percentile window, which would materialize every group in a single
window partition.  Spark's exact ``percentile`` aggregate is a
value->count ObjectHashAggregate with map-side partial combining and
interpolates identically to DuckDB's ``quantile_cont`` (verified
bit-level by the token_percentiles driver row); swap in
``approx_percentile`` when group value cardinality stops being
bounded.  The derived stats are rounded AFTER the final arithmetic —
rounding the raw power sums would be fold-order-sensitive at double
precision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def winsorized_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo_q: float = 0.01,
    hi_q: float = 0.99,
) -> DataFrame:
    """Per-group winsorized mean/std at the [lo_q, hi_q] percentile
    clip, plus the clip bounds and how many rows each side clipped.

    ``std`` is the population std of the CLIPPED values via the
    explicit moment formula ``sqrt(max(0, E[x^2] - E[x]^2))`` — the
    same expression the DuckDB oracle runs, so both engines share the
    one formula (their built-in stddev implementations use different
    merge orders).
    """
    if not (0.0 <= lo_q < hi_q <= 1.0):
        raise ValueError(f"need 0 <= lo_q < hi_q <= 1, got {lo_q}, {hi_q}")
    bounds = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, {lo_q!r})").alias("__lo"),
        F.expr(f"percentile({value_col}, {hi_q!r})").alias("__hi"),
    )
    clipped = df.join(F.broadcast(bounds), group_col).withColumn(
        "__v", F.least(F.greatest(F.col(value_col), F.col("__lo")), F.col("__hi"))
    )
    n = F.count(F.lit(1))
    ex = F.sum("__v") / n
    ex2 = F.sum(F.col("__v") * F.col("__v")) / n
    return (
        clipped.groupBy(group_col)
        .agg(
            n.cast("long").alias("n"),
            F.round(F.max("__lo"), 6).alias("lo"),
            F.round(F.max("__hi"), 6).alias("hi"),
            F.sum(
                (F.col(value_col) < F.col("__lo")).cast("long")
            ).alias("n_clip_lo"),
            F.sum(
                (F.col(value_col) > F.col("__hi")).cast("long")
            ).alias("n_clip_hi"),
            F.round(ex, 6).alias("mean_w"),
            F.round(F.sqrt(F.greatest(F.lit(0.0), ex2 - ex * ex)), 6).alias(
                "std_w"
            ),
        )
    )


def winsorized_stats_duck_sql(
    table: str,
    group_col: str,
    value_col: str,
    lo_q: float = 0.01,
    hi_q: float = 0.99,
) -> str:
    """DuckDB replay of :func:`winsorized_stats` — quantile_cont
    bounds, same clip, same explicit moment formula and rounding."""
    return f"""
WITH b AS (
    SELECT {group_col},
           quantile_cont({value_col}, {lo_q!r}) AS lo,
           quantile_cont({value_col}, {hi_q!r}) AS hi
    FROM {table} GROUP BY {group_col}
),
c AS (
    SELECT t.{group_col}, t.{value_col} AS v0, b.lo, b.hi,
           least(greatest(t.{value_col}, b.lo), b.hi) AS v
    FROM {table} t JOIN b USING ({group_col})
)
SELECT {group_col},
       CAST(count(*) AS BIGINT) AS n,
       round(max(lo), 6) AS lo,
       round(max(hi), 6) AS hi,
       CAST(sum(CASE WHEN v0 < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
       CAST(sum(CASE WHEN v0 > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi,
       round(sum(v) / count(*), 6) AS mean_w,
       round(sqrt(greatest(0.0, sum(v * v) / count(*)
                  - (sum(v) / count(*)) * (sum(v) / count(*)))), 6) AS std_w
FROM c GROUP BY {group_col}
"""

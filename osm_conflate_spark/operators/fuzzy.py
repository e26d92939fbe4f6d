"""Fuzzy (edit-distance) similarity join via deletion neighborhoods.

The FastSS construction (Bocek et al. 2007, "Fast Similarity Search
in Large Dictionaries"): two strings are within edit distance 1 iff
their deletion-1 neighborhoods (the string itself plus every
single-character deletion) intersect.  Generating the neighborhood
turns the quadratic fuzzy self-join into an EQUI-join on the variant
string — the shape every entity-resolution pass over names/refs wants
(here: the conflation engine's tag-value matching, e.g. two sources
spelling the same shop name one typo apart).

100 TB shape: the variant explode multiplies rows by ~len(s)+1 —
map-side, before the one shuffle (the variant equi-join); candidate
pairs are verified with the built-in ``levenshtein`` (codegen) and
deduplicated by key order, so false positives (two different-position
deletions colliding) never survive.  At corpus scale, hash the
variant (``xxhash64``) to shrink the join key, and block by a cheap
prefix/length key to bound variant-bucket skew; kept as raw strings
here so the DuckDB oracle can replay an INDEPENDENT algorithm (the
brute-force quadratic join) and agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_variants_sql(s: str) -> str:
    """Spark SQL expr: array of ``s`` plus every deletion-1 variant."""
    return (
        f"array_union(array({s}), "
        f"transform(sequence(1, length({s})), "
        f"i -> concat(substring({s}, 1, i - 1), "
        f"substring({s}, i + 1, length({s})))))"
    )


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """All pairs of rows whose ``name_col`` values are within edit
    distance ``max_dist`` (currently 1 — the deletion-1 neighborhood
    is complete exactly for distance <= 1).  Returns
    ``(a_key, b_key, dist)`` with ``a_key < b_key``.
    """
    if max_dist != 1:
        raise ValueError(
            "deletion-1 neighborhoods are complete only for max_dist=1"
        )
    v = df.select(
        F.col(id_col).alias("__k"),
        F.col(name_col).alias("__n"),
        F.explode(F.expr(deletion_variants_sql(name_col))).alias("__v"),
    )
    a = v.select(
        F.col("__k").alias("a_key"), F.col("__n").alias("__na"), "__v"
    )
    b = v.select(
        F.col("__k").alias("b_key"), F.col("__n").alias("__nb"), "__v"
    )
    return (
        a.join(b, "__v")
        .where(F.col("a_key") < F.col("b_key"))
        .select("a_key", "b_key", "__na", "__nb")
        .distinct()
        .withColumn(
            "dist", F.levenshtein(F.col("__na"), F.col("__nb")).cast("int")
        )
        .where(F.col("dist") <= max_dist)
        .select("a_key", "b_key", "dist")
    )


def fuzzy_pairs_duck_sql(
    table: str,
    id_col: str,
    name_col: str,
    max_dist: int = 1,
) -> str:
    """DuckDB oracle for :func:`fuzzy_pairs` — deliberately a
    DIFFERENT algorithm (brute-force quadratic join + levenshtein),
    so the neighborhood construction is checked against ground truth
    rather than replayed."""
    return f"""
SELECT a.{id_col} AS a_key, b.{id_col} AS b_key,
       CAST(levenshtein(a.{name_col}, b.{name_col}) AS INT) AS dist
FROM {table} a JOIN {table} b ON a.{id_col} < b.{id_col}
WHERE levenshtein(a.{name_col}, b.{name_col}) <= {max_dist}
"""

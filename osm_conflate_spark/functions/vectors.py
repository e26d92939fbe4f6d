"""Vector functions for embedding columns (array<float>).

All JVM-side: dot products via ``zip_with`` + ``aggregate`` (sequential
left fold, deterministic), SRP buckets via per-plane sign bits.  A
Pandas-UDF batch path is deliberately NOT the default — ``aggregate``
stays inside whole-stage codegen and avoids the Arrow hop for 64-dim
vectors; switch to a pandas_udf matmul only for dim >= ~1k.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_expr(a: str, b: str) -> Column:
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.col(a),
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_expr(a: str, b: str) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def srp_planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """Deterministic signed-random-projection hyperplanes."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def srp_bucket_col(vec: str, dim: int, n_planes: int, seed: int) -> Column:
    """Bucket id = n_planes sign bits of plane . vec, packed into a long.

    Plane coefficients are baked into the expression as literals — the
    dot products run JVM-side with no Python involvement.
    """
    planes = srp_planes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for j in range(n_planes):
        coeffs = F.array(*[F.lit(float(c)) for c in planes[j]])
        d = F.aggregate(
            F.zip_with(F.col(vec), coeffs, lambda x, c: x.cast("double") * c),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket.bitwiseOR(
            F.when(d > 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(F.lit(0).cast("long"))
        )
    return bucket

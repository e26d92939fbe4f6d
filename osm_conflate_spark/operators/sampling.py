"""Corpus-assembly operators: deterministic sampling and sequence
packing — the last mile of a training-data pipeline (after dedup and
quality filtering, pick a reproducible subset and pack it into
fixed-token-budget chunks).

* :func:`deterministic_sample` — top-n rows per group ordered by a
  portable 60-bit md5 hash of the key: a seedless, engine-independent,
  rerun-stable sample (same rows on every engine and every run — the
  property a data audit needs; ``rand()`` gives none of it).
* :func:`pack_sequences` — greedy-by-order packing: within each group,
  rows ordered by key accumulate into chunks of ~``budget`` tokens
  (chunk id = prefix-sum-before-row div budget).  This is the
  window-cumsum formulation every SQL engine can replay, and what a
  distributed pipeline actually ships: exact first-fit packing is
  inherently sequential, while prefix-sum packing is one window per
  group and deterministic.

Scale notes (100 TB):

* ``deterministic_sample`` is a single shuffle on the group key; the
  ``row_number() <= n`` filter is pushed into the shuffle as a
  map-side partial top-k by Spark's WindowGroupLimit rewrite (asserted
  in tests on the physical plan), so a skewed group never materializes
  more than n·parts rows before the final sort — the classic top-k
  shape, not a full per-group sort.
* ``pack_sequences`` is one window (shuffle + in-partition sort) per
  group.  Prefix sums don't have a group-limit shortcut — at corpus
  scale the group key should include a shard component (e.g.
  ``(lang, hash60(doc_id) % n_shards)``) so no single partition holds
  a whole language; chunk ids are then unique per (group, shard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.sqlgen import hash60_sql


def sample_key_sql(id_expr: str, engine: str) -> str:
    """Portable deterministic ordering key: 60-bit md5 of the id
    rendered as a string (``|| ''`` forces the cast identically in
    Spark and DuckDB)."""
    return hash60_sql(f"({id_expr} || '')", engine)


def deterministic_sample(
    df: DataFrame, group_col: str, id_col: str, n: int
) -> DataFrame:
    """Top-``n`` rows per ``group_col``, ordered by the portable hash
    of ``id_col`` (ties broken by the id itself — total order)."""
    w = Window.partitionBy(group_col).orderBy(
        F.expr(sample_key_sql(id_col, "spark")).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= n)
        .select(id_col, group_col, "rn")
    )


def pack_sequences(
    df: DataFrame,
    group_col: str,
    order_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Assign each row a ``chunk_id`` within its group: rows in
    ``order_col`` order accumulate until the running token total
    crosses ``budget``, then the next chunk starts.

    ``chunk_id = floor(prefix_sum_before_row / budget)`` — a row
    larger than ``budget`` starts in whatever chunk its prefix sum
    lands in (sharing it with any smaller rows that partially filled
    it), pushes the running total forward, and the chunk ids its bulk
    spans are simply skipped (documented overflow semantics; exact
    first-fit is sequential and not worth a distributed fixpoint).
    Division is by an integer constant in float64 — exact for any
    prefix sum below 2^53, so engine-identical.
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(tokens_col).over(w)
    return df.select(
        order_col,
        group_col,
        F.col(tokens_col).alias("n_tokens"),
        F.floor((cum - F.col(tokens_col)) / F.lit(budget)).alias("chunk_id"),
    )


def split_assign_sql(id_expr: str, fractions: dict[str, float],
                     engine: str) -> str:
    """Deterministic stratum-free train/val/test assignment: bucket the
    portable 60-bit hash of the id into cumulative-fraction ranges of
    [0, 2^60).  The split is seedless, rerun-stable, engine-identical
    (same property as :func:`deterministic_sample`), and — because the
    hash is of the ID, not the row — stable under re-partitioning,
    backfills, and incremental appends: a document keeps its split for
    the life of the corpus, which is what prevents silent train/test
    leakage when the corpus is rebuilt.  Fractions must sum to 1; the
    last split takes the remainder of the hash space so no row is ever
    unassigned.  Pure CASE expression: whole-stage codegen in Spark,
    no shuffle, no UDF."""
    if not fractions or abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError("fractions must sum to 1")
    if any(f < 0 for f in fractions.values()):
        raise ValueError("fractions must be non-negative")
    key = sample_key_sql(id_expr, engine)
    names = list(fractions)
    arms, cum = [], 0.0
    for name in names[:-1]:
        cum += fractions[name]
        arms.append(f"WHEN {key} < {int(cum * (1 << 60))} THEN '{name}'")
    return "CASE " + " ".join(arms) + f" ELSE '{names[-1]}' END"


def es_key_sql(id_expr: str, weight_expr: str, engine: str) -> str:
    """Portable Efraimidis–Spirakis sort key in log space:
    ``ln(u) / w`` with ``u = (hash60(id)+1) / (2^60+1)`` in (0, 1) —
    deterministic, seedless, engine-identical u.  Selecting the k
    LARGEST keys per group samples k rows without replacement with
    probability proportional to ``w`` (Efraimidis & Spirakis 2006,
    "Weighted random sampling with a reservoir" — the published
    one-pass algorithm; the hash replaces the RNG so reruns and
    engines agree).  The key is ROUNDED to 12 decimals so a last-ulp
    ``ln`` difference between the JVM and C libm can never flip the
    order at the k cut; ties break on the id downstream.
    """
    u_hash = hash60_sql(f"({id_expr} || '')", engine)
    u = f"(({u_hash} + 1.0E0) / 1152921504606846977.0E0)"
    return f"round(ln({u}) / ({weight_expr}), 12)"


def weighted_sample(
    df: DataFrame, group_col: str, id_col: str, weight_col: str, n: int
) -> DataFrame:
    """``n`` rows per group, sampled WITHOUT replacement with
    probability proportional to ``weight_col`` — the training-mix
    primitive ("oversample high-quality / long documents at fixed
    per-language quotas") — deterministic across engines and reruns.

    Same 100 TB shape as :func:`deterministic_sample`: one shuffle on
    the group key, and the ``row_number() <= n`` filter is rewritten
    by Spark into a map-side WindowGroupLimit partial top-k, so a
    skewed group never materializes more than n·parts rows.  Rows with
    non-positive weight are excluded (zero weight = zero selection
    probability; the log-space key is undefined there).
    """
    key = es_key_sql(id_col, weight_col, "spark")
    w = Window.partitionBy(group_col).orderBy(
        F.expr(key).desc(), F.col(id_col).asc()
    )
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("es_key", F.expr(key))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= n)
        .select(id_col, group_col, "rn", "es_key")
    )


def weighted_sample_duck_sql(
    table: str, group_col: str, id_col: str, weight_col: str, n: int
) -> str:
    """DuckDB replay of :func:`weighted_sample` — same hash-u, same
    rounded log-space key, same (key desc, id asc) order."""
    key = es_key_sql(id_col, weight_col, "duck")
    return f"""
WITH scored AS (
    SELECT {id_col}, {group_col}, {key} AS es_key
    FROM {table} WHERE {weight_col} > 0
),
rk AS (
    SELECT *, row_number() OVER (PARTITION BY {group_col}
                                 ORDER BY es_key DESC, {id_col} ASC) AS rn
    FROM scored
)
SELECT {id_col}, {group_col}, CAST(rn AS INT) AS rn, es_key
FROM rk WHERE rn <= {n}
"""

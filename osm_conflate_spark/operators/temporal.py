"""Temporal join operators Spark lacks as built-ins: as-of join and
banded interval (range) join.

These are the two canonical "custom operator" gaps in the DataFrame
API (SURVEY §2 names them alongside the spatial joins): an event
pipeline constantly needs "latest right row at or before each left
row" (as-of) and "all right rows inside a time window around each left
row" (interval), and naive Spark spellings of both are
non-starters at scale — an as-of via join-then-window materializes
every (left, earlier-right) pair before pruning, and a keyless range
predicate falls back to
``BroadcastNestedLoopJoin`` (O(n·m) comparisons, single-task
broadcast).

* :func:`asof_join` — the union-sort-carry formulation: tag both
  sides, union, one window per key ordered by (ts, side), and carry
  the latest right payload forward with ``last(struct, ignorenulls)``.
  Exactly ONE shuffle (the window partitioning) and zero joins; the
  right payload rides in a single struct so all its columns come from
  the same right row.  This is the sort-merge as-of every columnar
  engine implements natively (DuckDB's ``ASOF JOIN``, which the
  oracle uses — a genuinely independent algorithm, so agreement is
  strong evidence).
* :func:`interval_join` — banded range join: quantize time into bands
  of width >= the interval length, explode each left row to the <=2
  bands its window can touch, and equi-join on (keys…, band) before
  the exact predicate.  Turns the O(n·m) nested loop into a shuffle
  hash/merge join on the band key; tests assert the physical plan has
  no ``BroadcastNestedLoopJoin``/``CartesianProduct``.

Scale notes (100 TB):

* ``asof_join`` shuffles each row once on the key; per-key data is
  sorted in-partition (spill-safe external sort).  A pathologically
  hot key serializes in one task — the standard escape is coarse
  time-slicing with boundary carry-in (replicate each slice's last
  right row into the next slice), which preserves exactness; not
  needed at the fixture scales and documented rather than built.
* ``interval_join`` band width trades replication (<=2x on the left,
  1x on the right) against band collision width; with band ==
  interval length each left row lands in at most 2 bands.  Skewed
  bands (a viral time window) split fine under AQE skew-join because
  the join is a plain equi-join after the explode.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_SIDE = "__asof_side"
_TS = "__asof_ts"
_PAY = "__asof_payload"


def _us(ts_col: str) -> Column:
    """Epoch microseconds of a timestamp column.  The cast makes
    TIMESTAMP_NTZ inputs work (parquet default); the session runs in
    UTC (plans/pipeline.py) so NTZ wall time == epoch, matching
    DuckDB's naive ``epoch_us``."""
    return F.unix_micros(F.col(ts_col).cast("timestamp"))


def _floordiv(x: Column, n: int) -> Column:
    """Exact sign-correct floor division of a long Column by a literal.

    ``(x - pmod(x, n)) / n``: the numerator is an exact multiple of
    ``n`` (both <= 2^53 at microsecond epoch scale), so the
    correctly-rounded double division returns the exact integer
    quotient — no boundary misfloor, unlike ``floor(x / n)`` whose
    inexact quotient can land one ulp below an exact band edge."""
    return ((x - F.pmod(x, F.lit(n))) / F.lit(n)).cast("long")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tolerance_us: Optional[int] = None,
    tiebreak: Optional[str] = None,
) -> DataFrame:
    """For every ``left`` row, attach the columns of the ``right`` row
    with the greatest ``right_ts <= left_ts`` within the same ``on``
    key (inclusive as-of, matching DuckDB ``ASOF JOIN`` semantics);
    left rows with no prior right row keep nulls (left-outer).

    ``right_cols`` are the right-side columns to carry (returned
    suffixed ``_r`` on collision); ties at equal ``right_ts`` resolve
    to the greatest ``tiebreak`` column (default: first of
    ``right_cols``), making the result total-order deterministic.
    ``tolerance_us``: if set, matches older than this many
    microseconds are nulled out (as-of with a staleness bound).

    Plan shape: union -> single Exchange on ``on`` -> in-partition
    sort by (ts, side, tiebreak) -> running ``last(ignorenulls)`` of
    the packed right struct -> filter to left rows.  No join operator
    anywhere in the plan.
    """
    on = list(on)
    tiebreak = tiebreak or right_cols[0]
    # Pack the right payload into ONE struct so every carried column
    # comes from the same right row (per-column last() could mix rows
    # when a payload column is legitimately null).  The tiebreak field
    # leads so struct ordering breaks equal-ts ties deterministically.
    fields = [tiebreak] + [c for c in right_cols if c != tiebreak]
    r = right.select(
        *on,
        _us(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        F.struct(*[F.col(c) for c in fields]).alias(_PAY),
    )
    left_cols = [c for c in left.columns]
    l = left.select(
        *left_cols,
        _us(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(r.schema[_PAY].dataType).alias(_PAY),
    )
    # Align schemas: right rows carry nulls for the left payload.
    r_full = r.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            if c not in on
            else F.col(c)
            for c in left_cols
        ],
        _TS,
        _SIDE,
        _PAY,
    )
    unioned = l.unionByName(r_full)
    # At equal ts the right row must sort BEFORE the left row so the
    # inclusive (right_ts <= left_ts) match sees it; among equal-ts
    # right rows the struct sort puts the max tiebreak last == winner.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(_TS).asc(), F.col(_SIDE).asc(), F.col(_PAY).asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__match", F.last(_PAY, ignorenulls=True).over(w))
    out = carried.where(F.col(_SIDE) == 1)
    if tolerance_us is not None:
        # Staleness bound needs the matched right ts; carry it beside
        # the payload through a second last() over the SAME window —
        # same sort, fused into the same Window physical operator.
        carried = unioned.withColumn(
            "__match", F.last(_PAY, ignorenulls=True).over(w)
        ).withColumn(
            "__match_ts",
            F.last(F.when(F.col(_SIDE) == 0, F.col(_TS)), ignorenulls=True).over(w),
        )
        out = carried.where(F.col(_SIDE) == 1).withColumn(
            "__match",
            F.when(
                F.col(_TS) - F.col("__match_ts") <= F.lit(tolerance_us), F.col("__match")
            ),
        )
    proj = [F.col(c) for c in left_cols]
    taken = set(left_cols)
    for c in fields:
        name = c if c not in taken else f"{c}_r"
        proj.append(F.col(f"__match.{c}").alias(name))
    return out.select(*proj)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lo_us: int,
    hi_us: int,
    on: Sequence[str] = (),
    band_us: Optional[int] = None,
    how_filter: Optional[Column] = None,
) -> DataFrame:
    """All (left, right) pairs with ``right_ts - left_ts`` in the
    half-open-at-lo interval ``(lo_us, hi_us]`` microseconds (and
    equal ``on`` keys, if any — the keyless case is the one Spark
    cannot plan without a nested-loop join).

    Banding: each left row explodes to the bands
    ``floor((l+lo)/band) .. floor((l+hi)/band)`` — with the default
    ``band = hi - lo`` that is at most 2 bands — and joins right rows
    on ``(on…, band)`` where ``band = floor(r/band)``; the exact
    interval predicate then prunes band-collision false positives.
    Output: every left column, every right column (suffixed ``_r`` on
    collision), plus ``gap_us = right_ts - left_ts``.
    """
    if hi_us <= lo_us:
        raise ValueError(f"empty interval ({lo_us}, {hi_us}]")
    band = band_us or (hi_us - lo_us)
    on = list(on)
    l_us = _us(left_ts)
    r_us = _us(right_ts)
    l = left.withColumn(
        "__band",
        F.explode(
            F.sequence(
                _floordiv(l_us + F.lit(lo_us + 1), band),
                _floordiv(l_us + F.lit(hi_us), band),
            )
        ),
    ).withColumn("__l_us", l_us)
    taken = set(left.columns)
    r = right.select(
        *[
            F.col(c).alias(c if c not in taken or c in on else f"{c}_r")
            for c in right.columns
        ],
        _floordiv(r_us, band).alias("__band"),
        r_us.alias("__r_us"),
    )
    cond = [l["__band"] == r["__band"]] + [l[k] == r[k] for k in on]
    pairs = (
        l.join(r, cond, "inner")
        .drop(r["__band"])
        .drop(*[r[k] for k in on])
        .where(
            (F.col("__r_us") - F.col("__l_us") > F.lit(lo_us))
            & (F.col("__r_us") - F.col("__l_us") <= F.lit(hi_us))
        )
        .withColumn("gap_us", F.col("__r_us") - F.col("__l_us"))
    )
    if how_filter is not None:
        pairs = pairs.where(how_filter)
    return pairs.drop("__band", "__l_us", "__r_us")

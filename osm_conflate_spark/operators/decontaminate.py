"""Benchmark decontamination — per-document n-gram overlap against an
evaluation set.

Before training, a corpus is screened for documents that contain
verbatim k-word shingles of benchmark/eval data (the standard
"decontamination" pass described in public LLM training reports).
Spark-first shape:

* the BENCHMARK side (eval sets: thousands of documents, not 10^12)
  collapses to a distinct shingle-hash set — small enough to
  BROADCAST, so the corpus-side scan never shuffles for the probe;
* the CORPUS side explodes to per-document distinct shingle hashes
  (one scan, map-side-collapsed), broadcast-left-joins the benchmark
  set, and aggregates per document: total distinct shingles,
  contaminated count, contamination fraction.

Shingles are md5-hashed before leaving the map side, matching the
dedup family convention (``repetition.py``); the tokenization is the
shared single-space split, so the DuckDB oracle replays identically.

At 100 TB the plan is: one corpus scan -> explode -> per-doc distinct
(map-side combine on (doc_id, h)) -> broadcast hash join (no shuffle)
-> per-doc agg (reuses the (doc_id, h) clustering, AQE coalesces).
Skew-free by construction: the broadcast side is the only shared
state and every probe row is independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .repetition import shingles_sql


def _doc_shingles(docs: DataFrame, text_col: str, k: int) -> DataFrame:
    return (
        docs.select(
            "doc_id",
            F.explode(F.expr(shingles_sql(text_col, k))).alias("sh"),
        )
        .select("doc_id", F.md5(F.col("sh").cast("binary")).alias("h"))
        .distinct()
    )


def contamination_stats(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Per-document contamination vs ``benchmark`` (same schema).

    Returns ``doc_id, n_shingles, n_contaminated, contamination_frac``
    for every corpus document with >= 1 shingle.  A document whose
    ``contamination_frac`` exceeds a policy threshold is dropped or
    quarantined by the caller — the operator reports, policy decides.
    """
    bench = (
        benchmark.select(
            F.explode(F.expr(shingles_sql(text_col, k))).alias("sh")
        )
        .select(F.md5(F.col("sh").cast("binary")).alias("h"))
        .distinct()
        .withColumn("contaminated", F.lit(1))
    )
    per = _doc_shingles(docs, text_col, k)
    joined = per.join(F.broadcast(bench), "h", "left")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.coalesce(F.sum("contaminated"), F.lit(0))
            .cast("long")
            .alias("n_contaminated"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_contaminated",
            (F.col("n_contaminated") / F.col("n_shingles")).alias(
                "contamination_frac"
            ),
        )
    )

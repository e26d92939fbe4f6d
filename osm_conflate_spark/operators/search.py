"""Ranked full-text search: BM25 top-k over the document corpus.

The classic webtext retrieval operator (Robertson/Spärck-Jones BM25,
the Okapi formulation with the +1-smoothed idf used by Lucene):

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    s(d, q) = sum_t idf(t) * tf * (k1 + 1)
                       / (tf + k1 * (1 - b + b * dl / avgdl))

Spark plan (one corpus scan, everything map-side until two skinny
aggs):

1. tokenize once; ``dl = size(tokens)`` rides along;
2. ``filter(tokens, x -> array_contains(query, x))`` prunes each
   row's token array to query terms BEFORE the explode — the explode
   output is O(matching tokens), not O(all tokens), and rows with no
   hits vanish at the scan stage (JVM codegen, no UDF);
3. tf agg: groupBy (doc, dl, term) count — map-side combining;
4. df/idf: groupBy term over the tf table (<= |query| rows) and the
   2-scalar corpus stats (N, avgdl) — both end up BROADCAST to the
   scoring join, so the big side never reshuffles;
5. score agg: groupBy doc; top-k via orderBy+limit, which Spark plans
   as TakeOrderedAndProject (per-partition partial top-k, no global
   sort — asserted in tests).

Corpus stats note: N / avgdl must count ALL docs (not just docs with
query hits), so they come from a separate 1-row aggregate of the
tokenized scan; Catalyst reuses nothing across the two scans at this
size, and at 100 TB you'd checkpoint the tokenized projection or keep
(N, avgdl) as table-level metadata maintained at ingest — noted, not
built.  The DuckDB oracle replays the identical formula with list
ops; scores are rounded to 1e-6 and ordered by (rounded score, doc)
so the top-k cut is engine-deterministic.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents by BM25 score for ``query_terms`` (scored
    on lowercased whitespace tokens; ties broken by ascending id).
    Returns (id, score) with score rounded to 1e-6 — the rounding is
    part of the ordering so the cut is deterministic cross-engine."""
    terms = sorted(set(t.lower() for t in query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")
    qlit = "array(" + ", ".join(f"'{t}'" for t in terms) + ")"
    toks = docs.select(
        F.col(id_col).alias("__id"),
        F.expr(f"filter(split(lower({text_col}), ' '), x -> x != '')").alias("__w"),
    ).select(
        "__id",
        F.expr("size(__w)").alias("__dl"),
        F.expr(f"filter(__w, x -> array_contains({qlit}, x))").alias("__hits"),
    )
    stats = toks.agg(
        F.count(F.lit(1)).alias("__n"), F.avg("__dl").alias("__avgdl")
    )
    tf = (
        toks.where(F.expr("size(__hits) > 0"))
        .select("__id", "__dl", F.explode("__hits").alias("__term"))
        .groupBy("__id", "__dl", "__term")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    df_tbl = tf.groupBy("__term").agg(F.countDistinct("__id").alias("__df"))
    scored = (
        tf.join(F.broadcast(df_tbl), "__term")
        .join(F.broadcast(stats))
        .withColumn(
            "__s",
            F.log(1.0 + (F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5))
            * (F.col("__tf") * (k1 + 1.0))
            / (
                F.col("__tf")
                + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl"))
            ),
        )
        .groupBy("__id")
        .agg(F.round(F.sum("__s"), 6).alias("score"))
    )
    return (
        scored.orderBy(F.col("score").desc(), F.col("__id").asc())
        .limit(k)
        .select(F.col("__id").alias(id_col), "score")
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 5,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` terms per ``group_col`` by summed corpus tf-idf
    (sklearn's smoothed idf: ``ln((1+N)/(1+df)) + 1``) — the standard
    "what characterizes this slice of the corpus" report for a crawl.

    Plan (one corpus scan):

    1. tokenize + explode once, then groupBy (group, doc, term) count —
       map-side combining absorbs in-document repetition before the
       only wide shuffle;
    2. the per-doc table serves BOTH aggregates: df(term) is a plain
       count per term (rows are already distinct doc-term pairs — no
       countDistinct shuffle), tf(group, term) sums the counts;
    3. N is a 1-row aggregate of the raw table; it and df join back as
       broadcasts, so the scored table never reshuffles;
    4. per-group top-k via rank window → WindowGroupLimit pushes the
       cut map-side (same plan shape as sampling.lang_sample).

    At 100 TB the df table is |vocabulary| rows — fine to broadcast for
    word-level vocab (~10M terms x 16B), but for shingle/ngram vocab
    swap the broadcast hint for a shuffle join and add a min-df filter
    (df >= 2 drops the hapax half of a web vocabulary).  Ties are
    broken by ascending term so the cut is engine-deterministic.
    """
    per_doc = (
        docs.select(
            F.col(group_col).alias("__g"),
            F.col(id_col).alias("__id"),
            F.explode(
                F.expr(f"filter(split(lower({text_col}), ' '), x -> x != '')")
            ).alias("__term"),
        )
        .groupBy("__g", "__id", "__term")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    df_tbl = per_doc.groupBy("__term").agg(F.count(F.lit(1)).alias("__df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("__n"))
    scored = (
        per_doc.groupBy("__g", "__term")
        .agg(F.sum("__c").alias("__tf"))
        .join(F.broadcast(df_tbl), "__term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "__s",
            F.round(
                F.col("__tf")
                * (F.log((1.0 + F.col("__n")) / (1.0 + F.col("__df"))) + 1.0),
                6,
            ),
        )
    )
    from pyspark.sql.window import Window

    # rank on the ROUNDED score (as bm25_topk does) so a sub-1e-6 ulp
    # difference between engines can never flip a tie at the k cut
    w = Window.partitionBy("__g").orderBy(
        F.col("__s").desc(), F.col("__term").asc()
    )
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .select(
            F.col("__g").alias(group_col),
            F.col("__rk").alias("rk"),
            F.col("__term").alias("term"),
            F.col("__s").alias("tfidf"),
        )
    )


def tfidf_top_terms_duck_sql(
    k: int = 5,
    table: str = "documents",
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB replay of :func:`tfidf_top_terms` — same tokenization,
    same smoothed idf, same (score desc, term asc) tie-break."""
    return f"""
WITH per_doc AS (
    SELECT {group_col} AS g, {id_col} AS id, t.term AS term, count(*) AS c
    FROM {table},
         unnest(list_filter(string_split(lower({text_col}), ' '),
                            x -> x != '')) AS t(term)
    GROUP BY g, id, t.term
),
df AS (SELECT term, count(*) AS df FROM per_doc GROUP BY term),
n AS (SELECT count(*) AS n FROM {table}),
scored AS (
    SELECT per_doc.g, per_doc.term,
           round(sum(per_doc.c) * (ln((1 + n.n) / (1.0 + df.df)) + 1), 6) AS s
    FROM per_doc JOIN df USING (term) CROSS JOIN n
    GROUP BY per_doc.g, per_doc.term, df.df, n.n
),
rk AS (
    SELECT g, term, s,
           row_number() OVER (PARTITION BY g ORDER BY s DESC, term ASC) AS rk
    FROM scored
)
SELECT g AS {group_col}, rk, term, s AS tfidf
FROM rk WHERE rk <= {k}
"""


def bm25_topk_duck_sql(
    query_terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB replay of :func:`bm25_topk` — same tokenization, same
    formula, same rounded ordering."""
    terms = sorted(set(t.lower() for t in query_terms))
    qlit = "[" + ", ".join(f"'{t}'" for t in terms) + "]"
    return f"""
WITH toks AS (
    SELECT {id_col} AS id,
           list_filter(string_split(lower({text_col}), ' '), x -> x != '') AS w
    FROM {table}
),
stats AS (SELECT count(*) AS n, avg(len(w)) AS avgdl FROM toks),
tf AS (
    SELECT id, len(w) AS dl, t.term AS term, count(*) AS tf
    FROM toks, unnest(list_filter(w, x -> list_contains({qlit}, x))) AS t(term)
    GROUP BY id, len(w), t.term
),
df AS (SELECT term, count(DISTINCT id) AS df FROM tf GROUP BY term)
SELECT tf.id AS {id_col},
       round(sum(
           ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * ({k1} + 1))
           / (tf.tf + {k1} * (1 - {b} + {b} * tf.dl / stats.avgdl))
       ), 6) AS score
FROM tf JOIN df ON tf.term = df.term CROSS JOIN stats
GROUP BY tf.id
ORDER BY score DESC, tf.id ASC
LIMIT {k}
"""


def unigram_surprisal(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean token surprisal (nats/token) under a unigram
    LM estimated from the corpus itself — the SQL-expressible core of
    CCNet-style perplexity filtering (there KenLM 5-gram; here the
    unigram cross-entropy, which already separates boilerplate /
    common-token text (low) from rare-token text (high) and is exactly
    replayable by the DuckDB oracle).

    ``surprisal(d) = sum_t tf(d,t) * -ln(c(t)/T) / len(d)`` with
    ``c(t)`` corpus counts and ``T`` total tokens — by construction
    every token has c(t) >= 1 so the log never sees zero.

    Plan: same single-scan shape as :func:`tfidf_top_terms` — the
    (doc, term, tf) table is aggregated once and serves BOTH the vocab
    counts and the per-doc rollup; vocab and the 1-row total join back
    as broadcasts; the final per-doc aggregation is the only other
    shuffle.  At real corpus scale the vocab broadcast swaps for a
    shuffle join exactly as documented on tfidf_top_terms.
    """
    per_doc = (
        docs.select(
            F.col(id_col).alias("__id"),
            F.explode(
                F.expr(f"filter(split(lower({text_col}), ' '), x -> x != '')")
            ).alias("__term"),
        )
        .groupBy("__id", "__term")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    vocab = per_doc.groupBy("__term").agg(F.sum("__c").alias("__ct"))
    total = vocab.agg(F.sum("__ct").alias("__t"))
    return (
        per_doc.join(F.broadcast(vocab), "__term")
        .join(F.broadcast(total))
        .groupBy("__id")
        .agg(
            F.sum("__c").cast("long").alias("n_tokens"),
            F.round(
                F.sum(F.col("__c") * -F.log(F.col("__ct") / F.col("__t")))
                / F.sum("__c"),
                6,
            ).alias("surprisal"),
        )
        .select(F.col("__id").alias(id_col), "n_tokens", "surprisal")
    )


def unigram_surprisal_duck_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB replay of :func:`unigram_surprisal` — same tokenization,
    same nats, same rounding."""
    return f"""
WITH per_doc AS (
    SELECT {id_col} AS id, t.term AS term, count(*) AS c
    FROM {table},
         unnest(list_filter(string_split(lower({text_col}), ' '),
                            x -> x != '')) AS t(term)
    GROUP BY id, t.term
),
vocab AS (SELECT term, sum(c) AS ct FROM per_doc GROUP BY term),
tot AS (SELECT sum(ct) AS t FROM vocab)
SELECT per_doc.id AS {id_col},
       CAST(sum(per_doc.c) AS BIGINT) AS n_tokens,
       round(sum(per_doc.c * -ln(vocab.ct / tot.t)) / sum(per_doc.c), 6)
           AS surprisal
FROM per_doc JOIN vocab USING (term) CROSS JOIN tot
GROUP BY per_doc.id
"""


def pmi_collocations(
    docs: DataFrame,
    k: int = 25,
    min_count: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` adjacent-word collocations by pointwise mutual
    information — PMI(a,b) = ln( p(ab) / (p(a)·p(b)) ) with p from
    corpus counts (Church & Hanks 1990) — the classic "which word
    pairs stick together" corpus report; ``min_count`` drops the
    hapax bigrams whose PMI is pure noise.

    Tokenization matches the word_bigram_stats family (raw
    single-space split) so all bigram operators agree.  Plan: one
    bigram aggregation (map-side combining) + one unigram aggregation,
    unigram counts and the two 1-row totals broadcast back onto the
    min_count-filtered bigram table (at web scale that table is the
    vocabulary-squared tail — the min_count filter is what keeps it
    broadcast-joinable on the probe side; the unigram broadcast obeys
    the same vocab-size caveat as tfidf_top_terms).  The global top-k
    is an orderBy+limit → TakeOrderedAndProject (map-side partial
    top-k, never a single-partition sort); the PMI is ROUNDED before
    the cut and ties break on the bigram text, so the k boundary is
    engine-deterministic.
    """
    from .repetition import bigrams_sql

    bg = docs.select(
        F.explode(F.expr(bigrams_sql(text_col))).alias("bigram")
    )
    bg_counts = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("n"))
    t_bi = bg_counts.agg(F.sum("n").alias("__tb"))
    uni = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("__w"))
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__cu"))
    )
    t_uni = uni.agg(F.sum("__cu").alias("__tu"))
    ca = uni.select(F.col("__w").alias("__w1"), F.col("__cu").alias("__ca"))
    cb = uni.select(F.col("__w").alias("__w2"), F.col("__cu").alias("__cb"))
    scored = (
        bg_counts.where(F.col("n") >= min_count)
        .withColumn("__w1", F.split(F.col("bigram"), " ")[0])
        .withColumn("__w2", F.split(F.col("bigram"), " ")[1])
        .join(F.broadcast(ca), "__w1")
        .join(F.broadcast(cb), "__w2")
        .join(F.broadcast(t_bi))
        .join(F.broadcast(t_uni))
        .withColumn(
            "pmi",
            F.round(
                F.log(
                    (F.col("n") / F.col("__tb"))
                    / ((F.col("__ca") / F.col("__tu")) * (F.col("__cb") / F.col("__tu")))
                ),
                6,
            ),
        )
    )
    return (
        scored.orderBy(F.col("pmi").desc(), F.col("bigram").asc())
        .limit(k)
        .select("bigram", "n", "pmi")
    )


def pmi_collocations_duck_sql(
    k: int = 25,
    min_count: int = 5,
    table: str = "documents",
    text_col: str = "text",
) -> str:
    """DuckDB replay of :func:`pmi_collocations` — same raw-split
    bigrams (range/unnest construction, as the word_repetition
    oracle), same PMI, same (pmi desc, bigram asc) cut."""
    return f"""
WITH w AS (SELECT string_split({text_col}, ' ') AS ws FROM {table}),
i AS (SELECT ws, unnest(range(1, len(ws))) AS i FROM w),
b AS (SELECT ws[i] || ' ' || ws[i+1] AS bigram FROM i),
bc AS (SELECT bigram, count(*) AS n FROM b GROUP BY bigram),
tb AS (SELECT sum(n) AS tb FROM bc),
u AS (SELECT t.wrd AS wrd, count(*) AS cu
      FROM w, unnest(ws) AS t(wrd) GROUP BY t.wrd),
tu AS (SELECT sum(cu) AS tu FROM u),
scored AS (
    SELECT bc.bigram, bc.n,
           round(ln((bc.n / tb.tb) /
                    ((ua.cu / tu.tu) * (ub.cu / tu.tu))), 6) AS pmi
    FROM bc
    JOIN u ua ON ua.wrd = string_split(bc.bigram, ' ')[1]
    JOIN u ub ON ub.wrd = string_split(bc.bigram, ' ')[2]
    CROSS JOIN tb CROSS JOIN tu
    WHERE bc.n >= {min_count}
)
SELECT bigram, CAST(n AS BIGINT) AS n, pmi
FROM scored ORDER BY pmi DESC, bigram ASC LIMIT {k}
"""

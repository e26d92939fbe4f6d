"""Corpus repetition operators vs a pure-python oracle.

Planted structure: within-doc repeated bigrams, an exact cross-doc
duplicated 8-gram, short-doc edge cases (1 word -> no bigram row;
7 words -> no shingle row).
"""

from collections import Counter

import pytest

from osm_conflate_spark.operators.repetition import (
    dup_shingle_stats,
    word_bigram_stats,
)

DOCS = [
    # doc 0: "a b" x3 -> bigram "a b" count 3, "b a" count 2
    (0, "a b a b a b"),
    # doc 1: all-distinct words
    (1, "one two three four five six seven eight nine ten"),
    # doc 2: shares an exact 8-word run with doc 1 (cross-dup shingle)
    (2, "zero one two three four five six seven eight extra"),
    # doc 3: single word -> zero bigrams, zero shingles (no output row)
    (3, "lonely"),
    # doc 4: exactly 7 words -> bigrams yes, shingles no
    (4, "w1 w2 w3 w4 w5 w6 w7"),
    # doc 5: exact duplicate of doc 1 (every shingle cross-dup)
    (5, "one two three four five six seven eight nine ten"),
]


def _py_bigrams(text):
    ws = text.split(" ")
    return [f"{a} {b}" for a, b in zip(ws, ws[1:])]


def _py_shingles(text, k=8):
    ws = text.split(" ")
    return [" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_word_bigram_stats(spark, docs_df):
    got = {
        r["doc_id"]: r.asDict() for r in word_bigram_stats(docs_df).collect()
    }
    assert 3 not in got  # 1-word doc has no bigrams
    for doc_id, text in DOCS:
        bgs = _py_bigrams(text)
        if not bgs:
            continue
        c = Counter(bgs)
        row = got[doc_id]
        assert row["n_bigrams"] == len(bgs)
        assert row["top_bigram_n"] == max(c.values())
        dup = sum(v for v in c.values() if v > 1)
        assert row["dup_bigram_n"] == dup
        assert row["top_bigram_frac"] == max(c.values()) / len(bgs)
        assert row["dup_bigram_frac"] == dup / len(bgs)
    # planted: doc 0 has "a b" x3 + "b a" x2 -> all 5 bigrams duplicated
    assert got[0]["dup_bigram_frac"] == 1.0
    assert got[0]["top_bigram_n"] == 3
    # all-distinct doc: no repetition
    assert got[1]["dup_bigram_n"] == 0


def test_dup_shingle_stats(spark, docs_df):
    got = {
        r["doc_id"]: r.asDict()
        for r in dup_shingle_stats(docs_df, k=8).collect()
    }
    assert 3 not in got and 4 not in got  # <8-word docs have no shingles
    # python oracle: shingle -> set of docs containing it
    owner = {}
    for doc_id, text in DOCS:
        for sh in set(_py_shingles(text)):
            owner.setdefault(sh, set()).add(doc_id)
    for doc_id, text in DOCS:
        shs = _py_shingles(text)
        if not shs:
            continue
        row = got[doc_id]
        cross = sum(1 for sh in shs if len(owner[sh]) >= 2)
        assert row["n_shingles"] == len(shs)
        assert row["n_cross_dup"] == cross
        assert row["cross_dup_frac"] == cross / len(shs)
    # planted: docs 1 and 5 identical -> every shingle cross-duplicated
    assert got[1]["cross_dup_frac"] == 1.0
    assert got[5]["cross_dup_frac"] == 1.0
    # doc 2 shares "one..eight" run with docs 1/5: exactly 1 of its
    # 3 shingles is cross-duplicated
    assert got[2]["n_shingles"] == 3
    assert got[2]["n_cross_dup"] == 1


def test_null_and_empty_text_dropped_both_engines(spark):
    """NULL text (split -> NULL -> no rows) and empty text (one ''
    token -> zero bigrams/shingles) must vanish from the output in the
    Spark operator AND its DuckDB oracle — same doc set both sides."""
    import duckdb

    import __spark_entry__ as entrymod

    df = spark.createDataFrame(
        [(1, "a b c d e f g h i"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    assert [r["doc_id"] for r in word_bigram_stats(df).collect()] == [1]
    assert [r["doc_id"] for r in dup_shingle_stats(df).collect()] == [1]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        "(1, 'a b c d e f g h i'), (2, NULL), (3, '')) t(doc_id, text)"
    )
    oracles = entrymod.oracle_sql()
    for name in ("word_repetition", "dup_shingles"):
        assert [r[0] for r in con.sql(oracles[name]).fetchall()] == [1], name

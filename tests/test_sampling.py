"""Corpus-assembly operators: determinism, stability, packing
invariants, and the WindowGroupLimit top-k rewrite on the plan."""

import pytest

from osm_conflate_spark.operators.sampling import (
    deterministic_sample,
    pack_sequences,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, ["en", "de", "fr"][i % 3], 50 + (i * 37) % 400) for i in range(90)]
    return spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")


def test_deterministic_sample_stable_and_sized(spark, corpus):
    a = deterministic_sample(corpus, "lang", "doc_id", 5)
    got1 = sorted((r["lang"], r["doc_id"], r["rn"]) for r in a.collect())
    got2 = sorted(
        (r["lang"], r["doc_id"], r["rn"])
        for r in deterministic_sample(corpus, "lang", "doc_id", 5).collect()
    )
    assert got1 == got2  # rerun-stable, no seed state
    per = {}
    for lang, doc, rn in got1:
        per.setdefault(lang, []).append(rn)
    assert set(per) == {"en", "de", "fr"}
    for rns in per.values():
        assert sorted(rns) == [1, 2, 3, 4, 5]
    # sample is hash-ordered, not id-ordered: with 30 candidates per
    # group the lowest five doc_ids being picked would be a 5e-6 fluke
    ids = [d for _, d, _ in got1]
    assert ids != sorted(ids)[:15]


def test_sample_plan_has_window_group_limit(spark, corpus):
    plan = deterministic_sample(corpus, "lang", "doc_id", 5)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan  # map-side partial top-k fired


def test_pack_sequences_invariants(spark, corpus):
    budget = 512
    out = pack_sequences(corpus, "lang", "doc_id", "n_tokens", budget)
    rows = sorted(
        (r["lang"], r["doc_id"], r["n_tokens"], r["chunk_id"])
        for r in out.collect()
    )
    assert len(rows) == 90
    per = {}
    for lang, doc, tok, chunk in rows:
        per.setdefault(lang, []).append((doc, tok, chunk))
    for lang, items in per.items():
        items.sort()
        cum = 0
        for doc, tok, chunk in items:
            assert chunk == cum // budget  # prefix-sum-before-row rule
            cum += tok
        chunks = [c for _, _, c in items]
        assert chunks == sorted(chunks)  # monotone in doc order
        # every chunk except possibly the last was closed because the
        # NEXT doc's prefix sum crossed the budget boundary
        by_chunk = {}
        for doc, tok, chunk in items:
            by_chunk.setdefault(chunk, 0)
            by_chunk[chunk] += tok


def test_pack_oversized_row_isolated(spark):
    df = spark.createDataFrame(
        [(1, "en", 100), (2, "en", 9999), (3, "en", 100)],
        "doc_id long, lang string, n_tokens long",
    )
    got = {
        r["doc_id"]: r["chunk_id"]
        for r in pack_sequences(df, "lang", "doc_id", "n_tokens", 512).collect()
    }
    assert got[1] == 0
    assert got[2] == 0  # starts in chunk 0 (prefix before it is 100)
    assert got[3] == (100 + 9999) // 512  # pushed far past the big row

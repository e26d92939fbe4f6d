"""Round-5 widening, third batch:

* haversine great-circle distance + initial bearing
  (``functions/sqlgen.py``) against an independent numpy
  implementation, plus known geodesy vectors (equator arc, pole run,
  antimeridian crossing — exactly where the equirectangular X1
  formula degrades);
* per-group tf-idf top terms (``operators/search.py``) against a
  hand-computed fixture and the DuckDB twin, with the
  WindowGroupLimit plan assertion;
* way/polyline length (portable-SQL registry entry) against an
  independent numpy per-way fold, with the shared-partitioning
  single-Exchange plan assertion;
* segment_dedup (``operators/repetition.py``) — duplicated-span
  removal + reassembly — against a hand fixture covering cross-doc,
  in-doc, fully-duplicated and short-tail cases, the DuckDB twin,
  and the no-join/two-shuffle plan assertion.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_conflate_spark.functions.sqlgen import (
    EARTH_R_MEAN,
    bearing_sql,
    haversine_sql,
    tile_x_sql,
    tile_y_sql,
)
from osm_conflate_spark.operators.search import (
    tfidf_top_terms,
    tfidf_top_terms_duck_sql,
)


# ---------------------------------------------------------------------------
# haversine / bearing
# ---------------------------------------------------------------------------

def _haversine_np(lat1, lon1, lat2, lon2):
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dphi = np.radians(lat2 - lat1) * 0.5
    dlam = np.radians(lon2 - lon1) * 0.5
    a = np.sin(dphi) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dlam) ** 2
    return 2.0 * EARTH_R_MEAN * np.arcsin(np.sqrt(np.minimum(1.0, a)))


def _bearing_np(lat1, lon1, lat2, lon2):
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dlam = np.radians(lon2 - lon1)
    y = np.sin(dlam) * np.cos(p2)
    x = np.cos(p1) * np.sin(p2) - np.sin(p1) * np.cos(p2) * np.cos(dlam)
    return (np.degrees(np.arctan2(y, x)) + 360.0) % 360.0


def test_haversine_matches_numpy_random(spark):
    rng = np.random.default_rng(7)
    lat1 = rng.uniform(-85, 85, 200)
    lon1 = rng.uniform(-180, 180, 200)
    lat2 = rng.uniform(-85, 85, 200)
    lon2 = rng.uniform(-180, 180, 200)
    rows = [
        (float(a), float(b), float(c), float(d))
        for a, b, c, d in zip(lat1, lon1, lat2, lon2)
    ]
    df = spark.createDataFrame(
        rows, "lat1 double, lon1 double, lat2 double, lon2 double"
    )
    got = (
        df.select(
            F.expr(haversine_sql("lat1", "lon1", "lat2", "lon2")).alias("d"),
            F.expr(bearing_sql("lat1", "lon1", "lat2", "lon2")).alias("b"),
        )
        .toPandas()
    )
    want_d = _haversine_np(lat1, lon1, lat2, lon2)
    want_b = _bearing_np(lat1, lon1, lat2, lon2)
    np.testing.assert_allclose(got["d"].to_numpy(), want_d, rtol=1e-12)
    np.testing.assert_allclose(got["b"].to_numpy(), want_b, rtol=1e-9, atol=1e-9)


def test_haversine_known_vectors(spark):
    """Geodesy ground truths on the sphere: a degree of arc anywhere
    is R * pi/180 meters; bearing due east along the equator is 90;
    the antimeridian crossing is SHORT (the equirectangular X1 formula
    would report the ~358-degree long way around)."""
    cases = [
        # equator, 1 deg east: exact arc, bearing 90
        (0.0, 0.0, 0.0, 1.0, EARTH_R_MEAN * math.pi / 180.0, 90.0),
        # meridian, 1 deg north: same arc length, bearing 0
        (10.0, 20.0, 11.0, 20.0, EARTH_R_MEAN * math.pi / 180.0, 0.0),
        # antimeridian crossing: 2 deg of arc, not 358
        (0.0, 179.0, 0.0, -179.0, EARTH_R_MEAN * math.pi / 90.0, 90.0),
        # antipodal: half circumference (asin guard territory)
        (0.0, 0.0, 0.0, 180.0, EARTH_R_MEAN * math.pi, 90.0),
        # coincident points: zero distance
        (45.0, 45.0, 45.0, 45.0, 0.0, 0.0),
    ]
    df = spark.createDataFrame(
        [c[:4] for c in cases],
        "lat1 double, lon1 double, lat2 double, lon2 double",
    )
    got = df.select(
        F.expr(haversine_sql("lat1", "lon1", "lat2", "lon2")).alias("d"),
        F.expr(bearing_sql("lat1", "lon1", "lat2", "lon2")).alias("b"),
    ).collect()
    for (r, (_, _, _, _, want_d, want_b)) in zip(got, cases):
        assert r["d"] == pytest.approx(want_d, rel=1e-9, abs=1e-6)
        assert r["b"] == pytest.approx(want_b, abs=1e-9)


def test_haversine_duckdb_same_text(spark):
    """The SAME template string runs in DuckDB and agrees to the last
    printed digit — the portability contract the driver's value-hash
    relies on."""
    import duckdb

    expr_d = haversine_sql("37.5E0", "-122.3E0", "48.8E0", "2.3E0")
    expr_b = bearing_sql("37.5E0", "-122.3E0", "48.8E0", "2.3E0")
    s = spark.sql(f"SELECT {expr_d} AS d, {expr_b} AS b").collect()[0]
    k = duckdb.sql(f"SELECT {expr_d} AS d, {expr_b} AS b").fetchone()
    assert f"{s['d']:.9g}" == f"{k[0]:.9g}"
    assert f"{s['b']:.9g}" == f"{k[1]:.9g}"


# ---------------------------------------------------------------------------
# tf-idf top terms
# ---------------------------------------------------------------------------

_TFIDF_DOCS = [
    # en: "spark" in every en doc (low idf), "catalyst" in one (high)
    (0, "spark spark catalyst", "en"),
    (1, "spark shuffle", "en"),
    (2, "spark broadcast broadcast", "en"),
    # fr: one doc, every term unique to it
    (3, "moteur moteur requete", "fr"),
]


def _tfidf_np():
    """Independent dense computation of the fixture's expected table."""
    n = len(_TFIDF_DOCS)
    df_counts: dict[str, int] = {}
    tf: dict[tuple[str, str], int] = {}
    for _, text, lang in _TFIDF_DOCS:
        toks = [t for t in text.lower().split(" ") if t]
        for t in set(toks):
            df_counts[t] = df_counts.get(t, 0) + 1
        for t in toks:
            tf[(lang, t)] = tf.get((lang, t), 0) + 1
    out = {}
    for (lang, t), c in tf.items():
        out[(lang, t)] = round(
            c * (math.log((1 + n) / (1.0 + df_counts[t])) + 1), 6
        )
    return out


def test_tfidf_matches_hand_fixture(spark):
    docs = spark.createDataFrame(
        _TFIDF_DOCS, "doc_id long, text string, lang string"
    )
    got = {
        (r["lang"], r["term"]): r["tfidf"]
        for r in tfidf_top_terms(docs, k=10).collect()
    }
    assert got == _tfidf_np()
    ranked = {
        (r["lang"], r["rk"]): r["term"]
        for r in tfidf_top_terms(docs, k=10).collect()
    }
    # corpus-wide tf dominates here: "spark" (tf=4, idf ln(5/4)+1 ->
    # 4.89) outranks the rarer "broadcast" (tf=2, idf ln(5/2)+1 -> 3.83)
    assert ranked[("en", 1)] == "spark"
    assert ranked[("en", 2)] == "broadcast"
    # exact-score tie ("catalyst"/"shuffle": tf=1, df=1) breaks by
    # ascending term — the engine-deterministic cut contract
    assert ranked[("en", 3)] == "catalyst"
    assert ranked[("en", 4)] == "shuffle"


def test_tfidf_duck_twin_identical(spark):
    import duckdb

    import pandas as pd

    pdf = pd.DataFrame(_TFIDF_DOCS, columns=["doc_id", "text", "lang"])
    con = duckdb.connect()
    con.register("documents", pdf)
    duck = {
        (r[0], r[1], r[2]): r[3]
        for r in con.execute(tfidf_top_terms_duck_sql(k=10)).fetchall()
    }
    docs = spark.createDataFrame(_TFIDF_DOCS, "doc_id long, text string, lang string")
    got = {
        (r["lang"], r["rk"], r["term"]): r["tfidf"]
        for r in tfidf_top_terms(docs, k=10).collect()
    }
    assert got == duck


def test_tfidf_topk_cut_and_plan(spark):
    docs = spark.createDataFrame(
        _TFIDF_DOCS, "doc_id long, text string, lang string"
    )
    out = tfidf_top_terms(docs, k=1)
    rows = out.collect()
    assert sorted(r["lang"] for r in rows) == ["en", "fr"]
    assert all(r["rk"] == 1 for r in rows)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the per-group cut must push map-side, same contract as lang_sample
    assert "WindowGroupLimit" in plan


# ---------------------------------------------------------------------------
# way_length (portable SQL registry entry)
# ---------------------------------------------------------------------------

def test_way_length_numpy_oracle(spark):
    """The registry's way_length SQL vs an independent numpy fold over
    the same derived points: per-way leg sum (legs rounded to 6 then
    summed, like the SQL) and first->last chord."""
    import __spark_entry__ as em

    sf = "/root/testdata/sf0.001"
    em._register(spark, sf)
    pts = spark.sql(em._DS_PTS).toPandas().sort_values("k")
    got = {
        r["way_id"]: (r["n_points"], r["length_m"], r["chord_m"])
        for r in spark.sql(em._portable("way_length")).collect()
    }
    k = pts["k"].to_numpy()
    lat = pts["lat"].to_numpy()
    lon = pts["lon"].to_numpy()
    way = np.floor(k / 20.0).astype(np.int64)
    want = {}
    for wid in np.unique(way):
        m = way == wid
        la, lo = lat[m], lon[m]
        legs = np.round(_haversine_np(la[:-1], lo[:-1], la[1:], lo[1:]), 6)
        chord = _haversine_np(la[0], lo[0], la[-1], lo[-1])
        want[int(wid)] = (
            int(m.sum()),
            round(float(legs.sum()), 3),
            round(float(chord), 3),
        )
    assert set(got) == set(want)
    for wid, (n, ln, ch) in want.items():
        gn, gl, gc = got[wid]
        assert gn == n
        assert gl == pytest.approx(ln, abs=2e-3)
        assert gc == pytest.approx(ch, abs=2e-3)


def test_way_length_single_exchange(spark):
    """lag() window and the groupBy both key on way_id — Catalyst must
    reuse the window's hash partitioning for the aggregate (ONE
    Exchange in the plan, not two)."""
    import __spark_entry__ as em

    em._register(spark, "/root/testdata/sf0.001")
    plan = (
        spark.sql(em._portable("way_length"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


# ---------------------------------------------------------------------------
# segment_dedup
# ---------------------------------------------------------------------------

_SEG_DOCS = [
    # doc 0 defines two segments (seg_len=3 in tests): "a b c", "d e f"
    (0, "a b c d e f"),
    # doc 1 repeats doc 0's first segment then adds its own
    (1, "a b c x y z"),
    # doc 2 is entirely doc 0 -> fully removed (zero kept -> dropped)
    (2, "a b c d e f"),
    # doc 3: tail segment is short ("q r") and unique; middle repeats
    (3, "x y z p p q r"),
    # doc 4: empty after tokenization -> dropped
    (4, "   "),
    # doc 5: within-doc repeat — second "m n o" tile is a duplicate
    # of the FIRST tile of the same doc and must also be removed
    (5, "m n o m n o w"),
]


def test_segment_dedup_semantics(spark):
    from osm_conflate_spark.operators.repetition import segment_dedup

    docs = spark.createDataFrame(_SEG_DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_segs"], r["n_kept"], r["dedup_text"])
        for r in segment_dedup(docs, seg_len=3).collect()
    }
    assert got == {
        0: (2, 2, "a b c d e f"),
        1: (2, 1, "x y z"),
        3: (3, 2, "p p q r"),  # "x y z" removed (doc 1 owns it), tail kept
        5: (3, 2, "m n o w"),  # in-doc duplicate tile removed
    }
    # docs 2 (fully duplicated) and 4 (no tokens) are absent
    assert 2 not in got and 4 not in got


def test_segment_dedup_duck_twin(spark):
    import duckdb
    import pandas as pd

    from osm_conflate_spark.operators.repetition import (
        segment_dedup,
        segment_dedup_duck_sql,
    )

    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(_SEG_DOCS, columns=["doc_id", "text"])
    )
    duck = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(segment_dedup_duck_sql(seg_len=3)).fetchall()
    }
    docs = spark.createDataFrame(_SEG_DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_segs"], r["n_kept"], r["dedup_text"])
        for r in segment_dedup(docs, seg_len=3).collect()
    }
    assert got == duck


def test_segment_dedup_no_join_plan(spark):
    from osm_conflate_spark.operators.repetition import segment_dedup

    docs = spark.createDataFrame(_SEG_DOCS, "doc_id long, text string")
    plan = (
        segment_dedup(docs, seg_len=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # two shuffles (seg_text window, doc_id reassembly), zero joins,
    # and no Generate over raw tokens — segments are built in codegen
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 2


def test_segment_dedup_validates_seg_len(spark):
    from osm_conflate_spark.operators.repetition import segment_dedup

    docs = spark.createDataFrame(_SEG_DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        segment_dedup(docs, seg_len=0)


# ---------------------------------------------------------------------------
# hopping window rollup + rolling per-key stats (portable registry SQL)
# ---------------------------------------------------------------------------

def test_hopping_counts_semantics_and_duck(spark):
    """Hopping 1h/15min rollup vs (a) a pandas brute force enumerating
    every window each event belongs to, (b) the DuckDB oracle text."""
    import duckdb

    import __spark_entry__ as em

    sf = "/root/testdata/sf0.001"
    em._register(spark, sf)
    got = {
        (r["win_start_us"], r["event_type"]): (r["n"], r["total"])
        for r in spark.sql(
            em._portable("hopping_counts").replace(
                "ts_epoch_expr", "unix_micros(CAST(ts AS TIMESTAMP))"
            )
        ).collect()
    }
    ev = duckdb.sql(
        f"SELECT epoch_us(ts) AS us, event_type, value "
        f"FROM '{sf}/events.parquet'"
    ).df()
    hop, span = 900_000_000, 3_600_000_000
    want: dict = {}
    for us, et, v in ev.itertuples(index=False):
        base = int(us) - int(us) % hop
        for i in range(4):
            ws = base - i * hop
            # brute-force membership: event in [ws, ws + span)
            assert ws <= us < ws + span
            n, t = want.get((ws, et), (0, 0.0))
            want[(ws, et)] = (n + 1, t + v)
    assert set(got) == set(want)
    for key, (n, t) in want.items():
        gn, gt = got[key]
        assert gn == n
        assert gt == pytest.approx(round(t, 6), abs=1e-5)
    # DuckDB runs the oracle text over the same parquet
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'"
    )
    duck = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.execute(em.oracle_sql()["hopping_counts"]).fetchall()
    }
    assert set(duck) == set(got)
    for key in got:
        assert got[key][0] == duck[key][0]
        assert got[key][1] == pytest.approx(duck[key][1], abs=2e-6)


def test_rolling_stats_semantics_and_plan(spark):
    """Trailing-10-row per-user frame vs a pandas groupby.rolling
    replay; the plan must shuffle ONCE (user_id) — the ROWS frame is a
    sliding buffer, not a second Exchange."""
    import duckdb

    import __spark_entry__ as em

    sf = "/root/testdata/sf0.001"
    em._register(spark, sf)
    out = spark.sql(em._portable("rolling_stats"))
    got = {
        (r["user_id"], r["event_id"]): (r["n_win"], r["avg10"], r["max10"])
        for r in out.collect()
    }
    ev = (
        duckdb.sql(
            f"SELECT user_id, event_id, ts, value FROM '{sf}/events.parquet'"
        )
        .df()
        .sort_values(["user_id", "ts", "event_id"])
    )
    for uid, g in ev.groupby("user_id"):
        vals = g["value"].to_numpy()
        ids = g["event_id"].to_numpy()
        for j in range(len(vals)):
            lo = max(0, j - 9)
            win = vals[lo : j + 1]
            n, a, m = got[(uid, ids[j])]
            assert n == len(win)
            assert a == pytest.approx(round(float(win.mean()), 6), abs=2e-6)
            assert m == pytest.approx(round(float(win.max()), 6), abs=2e-6)
    # AQE's toString appends the pre-adaptive "Initial Plan" — count
    # Exchanges only in the final executed section
    plan = (
        out._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert plan.count("Exchange hashpartitioning") == 1


# ---------------------------------------------------------------------------
# weighted sampling without replacement (Efraimidis–Spirakis, hash-u)
# ---------------------------------------------------------------------------

def test_weighted_sample_duck_twin(spark):
    """Spark and DuckDB produce the IDENTICAL sample (ids, ranks,
    rounded keys) on the sf0.001 documents table."""
    import duckdb

    from osm_conflate_spark.operators.sampling import (
        weighted_sample,
        weighted_sample_duck_sql,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    got = {
        (r["lang"], r["rn"]): (r["doc_id"], r["es_key"])
        for r in weighted_sample(docs, "lang", "doc_id", "n_chars", 20).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    duck = {
        (r[1], r[2]): (r[0], r[3])
        for r in con.execute(
            weighted_sample_duck_sql("documents", "lang", "doc_id", "n_chars", 20)
        ).fetchall()
    }
    assert got == duck


def test_weighted_sample_weight_dominance(spark):
    """Probability ∝ weight: five docs carrying ~10^9× the weight of
    the other 95 must all be selected at n=5 (their log-space keys are
    ≥ -2.1e-8 while a light doc needs u > 1 - 2e-8 to compete — and
    the hash-u outcome is deterministic, so this is a fixed fact of
    the fixture, not a flaky probabilistic assertion)."""
    from osm_conflate_spark.operators.sampling import weighted_sample

    rows = [(i, "g", 1_000_000_000 if i < 5 else 1) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, w long")
    picked = {
        r["doc_id"]
        for r in weighted_sample(df, "lang", "doc_id", "w", 5).collect()
    }
    assert picked == {0, 1, 2, 3, 4}


def test_weighted_sample_drops_nonpositive_and_plan(spark):
    from osm_conflate_spark.operators.sampling import weighted_sample

    rows = [(1, "g", 0), (2, "g", -3), (3, "g", 10), (4, "g", 10)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, w long")
    out = weighted_sample(df, "lang", "doc_id", "w", 10)
    assert {r["doc_id"] for r in out.collect()} == {3, 4}
    plan = out._jdf.queryExecution().executedPlan().toString()
    # same map-side top-k contract as deterministic_sample
    assert "WindowGroupLimit" in plan


# ---------------------------------------------------------------------------
# unigram surprisal (corpus-LM quality score)
# ---------------------------------------------------------------------------

def test_unigram_surprisal_hand_fixture(spark):
    """Independent dense computation: corpus = 3 docs; common tokens
    must score LOW, rare tokens HIGH, and the numbers must equal the
    closed-form mean of -ln(c/T)."""
    from osm_conflate_spark.operators.search import unigram_surprisal

    rows = [(0, "the the the"), (1, "the cat"), (2, "zyzzyva")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["surprisal"])
        for r in unigram_surprisal(docs).collect()
    }
    T = 6
    c = {"the": 4, "cat": 1, "zyzzyva": 1}
    s = lambda t: -math.log(c[t] / T)
    want = {
        0: (3, round(s("the"), 6)),
        1: (2, round((s("the") + s("cat")) / 2, 6)),
        2: (1, round(s("zyzzyva"), 6)),
    }
    assert got == want
    # ordering sanity: all-common doc < mixed < all-rare
    assert got[0][1] < got[1][1] < got[2][1]


def test_unigram_surprisal_duck_twin(spark):
    import duckdb
    import pandas as pd

    from osm_conflate_spark.operators.search import (
        unigram_surprisal,
        unigram_surprisal_duck_sql,
    )

    rows = [(0, "the the the"), (1, "the cat"), (2, "zyzzyva"), (3, "")]
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    duck = {
        r[0]: (r[1], r[2])
        for r in con.execute(unigram_surprisal_duck_sql()).fetchall()
    }
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["surprisal"])
        for r in unigram_surprisal(docs).collect()
    }
    assert got == duck
    assert 3 not in got  # empty doc has no tokens in either engine


def test_unigram_surprisal_broadcast_plan(spark):
    from osm_conflate_spark.operators.search import unigram_surprisal

    rows = [(0, "a b"), (1, "b c")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = unigram_surprisal(docs)
    out.collect()
    plan = (
        out._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    # vocab and total come back as broadcasts, never a shuffled join
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


# ---------------------------------------------------------------------------
# PMI collocations
# ---------------------------------------------------------------------------

_PMI_DOCS = [
    # "new york" always adjacent (high PMI); "the" everywhere (low)
    (0, "the new york trip was the best trip"),
    (1, "new york in the rain"),
    (2, "the new york marathon"),
    (3, "the best rain gear in new york"),
]


def _pmi_np(min_count):
    uni: dict[str, int] = {}
    big: dict[str, int] = {}
    for _, text in _PMI_DOCS:
        ws = text.split(" ")
        for t in ws:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(ws, ws[1:]):
            big[f"{a} {b}"] = big.get(f"{a} {b}", 0) + 1
    tu = sum(uni.values())
    tb = sum(big.values())
    out = {}
    for bg, n in big.items():
        if n < min_count:
            continue
        a, b = bg.split(" ")
        out[bg] = (
            n,
            round(math.log((n / tb) / ((uni[a] / tu) * (uni[b] / tu))), 6),
        )
    return out


def test_pmi_hand_fixture_and_ordering(spark):
    from osm_conflate_spark.operators.search import pmi_collocations

    docs = spark.createDataFrame(_PMI_DOCS, "doc_id long, text string")
    got = {
        r["bigram"]: (r["n"], r["pmi"])
        for r in pmi_collocations(docs, k=50, min_count=2).collect()
    }
    assert got == _pmi_np(min_count=2)
    # the always-adjacent pair must beat any pair involving "the"
    ordered = [
        r["bigram"]
        for r in pmi_collocations(docs, k=50, min_count=2).collect()
    ]
    assert ordered.index("new york") < ordered.index("the new")


def test_pmi_duck_twin_and_plan(spark):
    import duckdb
    import pandas as pd

    from osm_conflate_spark.operators.search import (
        pmi_collocations,
        pmi_collocations_duck_sql,
    )

    con = duckdb.connect()
    con.register("documents", pd.DataFrame(_PMI_DOCS, columns=["doc_id", "text"]))
    duck = [
        (r[0], r[1], r[2])
        for r in con.execute(
            pmi_collocations_duck_sql(k=3, min_count=2)
        ).fetchall()
    ]
    docs = spark.createDataFrame(_PMI_DOCS, "doc_id long, text string")
    out = pmi_collocations(docs, k=3, min_count=2)
    got = [(r["bigram"], r["n"], r["pmi"]) for r in out.collect()]
    assert got == duck
    plan = out._jdf.queryExecution().executedPlan().toString()
    # global top-k must be a map-side partial top-k, not a full sort
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------------------
# winsorized robust stats
# ---------------------------------------------------------------------------

def test_winsorized_stats_numpy_oracle(spark):
    from osm_conflate_spark.operators.stats import winsorized_stats

    rng = np.random.default_rng(11)
    vals = np.concatenate(
        [rng.normal(100, 10, 400), [10_000.0, -10_000.0, 9_000.0]]
    )
    rows = [(("a" if i % 2 else "b"), float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, value double")
    got = {
        r["g"]: (
            r["n"], r["lo"], r["hi"], r["n_clip_lo"], r["n_clip_hi"],
            r["mean_w"], r["std_w"],
        )
        for r in winsorized_stats(df, "g", "value", 0.05, 0.95).collect()
    }
    for g in ("a", "b"):
        v = np.array([x for gg, x in rows if gg == g])
        lo = np.percentile(v, 5, method="linear")
        hi = np.percentile(v, 95, method="linear")
        w = np.clip(v, lo, hi)
        n, glo, ghi, ncl, nch, mw, sw = got[g]
        assert n == len(v)
        assert glo == pytest.approx(round(lo, 6), abs=2e-6)
        assert ghi == pytest.approx(round(hi, 6), abs=2e-6)
        assert ncl == int((v < lo).sum())
        assert nch == int((v > hi).sum())
        assert mw == pytest.approx(round(float(w.mean()), 6), abs=2e-6)
        assert sw == pytest.approx(round(float(w.std()), 6), abs=2e-6)
        # the outliers must have been tamed: winsorized std is in the
        # same decade as the inlier distribution, not the 10^4 spikes
        assert sw < 100


def test_winsorized_stats_duck_twin_and_validation(spark):
    import duckdb
    import pandas as pd

    from osm_conflate_spark.operators.stats import (
        winsorized_stats,
        winsorized_stats_duck_sql,
    )

    rows = [("a", float(v)) for v in range(100)] + [("a", 1e6)]
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["g", "value"]))
    duck = con.execute(winsorized_stats_duck_sql("t", "g", "value")).fetchall()
    df = spark.createDataFrame(rows, "g string, value double")
    out = winsorized_stats(df, "g", "value")
    r = out.collect()[0]
    assert [tuple(r)] == [tuple(x) for x in duck]
    with pytest.raises(ValueError):
        winsorized_stats(df, "g", "value", 0.9, 0.1)


# ---------------------------------------------------------------------------
# tile focal hotspots + funnel (portable registry SQL)
# ---------------------------------------------------------------------------

def test_tile_hotspots_pandas_replay(spark):
    """3x3 focal sum over z12 tile counts vs a dict brute force on the
    same derived points."""
    import duckdb

    import __spark_entry__ as em

    sf = "/root/testdata/sf0.001"
    em._register(spark, sf)
    got = [
        (r["x"], r["y"], r["n"], r["focal_n"])
        for r in spark.sql(em._portable("tile_hotspots")).collect()
    ]
    con = duckdb.connect()
    for t in em.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
        )
    tiles = con.execute(
        f"WITH pts AS ({em._DS_PTS}) SELECT "
        f"{tile_x_sql('lon', 12)} AS x, {tile_y_sql('lat', 12)} AS y, "
        f"count(*) AS n FROM pts GROUP BY 1, 2"
    ).fetchall()
    counts = {(x, y): n for x, y, n in tiles}
    focal = {}
    for (x, y), n in counts.items():
        s = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                s += counts.get(((x + dx + 4096) % 4096, y + dy), 0)
        focal[(x, y)] = s
    want = sorted(
        ((x, y, n, focal[(x, y)]) for (x, y), n in counts.items()),
        key=lambda r: (-r[3], r[0], r[1]),
    )[:25]
    assert got == want
    # focal sum always includes the center itself
    assert all(f >= n for _, _, n, f in got)


def test_tile_hotspots_topk_plan(spark):
    import __spark_entry__ as em

    em._register(spark, "/root/testdata/sf0.001")
    out = spark.sql(em._portable("tile_hotspots"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_funnel_steps_hand_fixture(spark):
    """Stage gating: each step must come at-or-after the previous
    step's FIRST occurrence and within 1h of it."""
    import datetime as dt

    base = dt.datetime(2026, 1, 1, 12, 0, 0)

    def ts(mins):
        return base + dt.timedelta(minutes=mins)

    rows = [
        # user 1: clean view(0) -> click(10) -> purchase(30)
        (1, ts(0), "view"), (1, ts(10), "click"), (1, ts(30), "purchase"),
        # user 2: click BEFORE the first view doesn't count; the later
        # click at +70 is outside view+1h -> funnel stops at t_view
        (2, ts(5), "click"), (2, ts(20), "view"), (2, ts(90), "click"),
        # user 3: no view at all -> absent from output
        (3, ts(0), "click"), (3, ts(1), "purchase"),
        # user 4: purchase within 1h of the FIRST click, not a later one
        (4, ts(0), "view"), (4, ts(30), "click"), (4, ts(50), "click"),
        (4, ts(85), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    df.createOrReplaceTempView("events")
    import __spark_entry__ as em

    sql = em._portable("funnel_steps").replace(
        "ts_epoch_expr", "unix_micros(CAST(ts AS TIMESTAMP))"
    )
    got = {
        r["user_id"]: (r["t_view"], r["t_click"], r["t_purchase"])
        for r in spark.sql(sql).collect()
    }
    us = lambda m: int(ts(m).replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    assert set(got) == {1, 2, 4}
    assert got[1] == (us(0), us(10), us(30))
    assert got[2] == (us(20), None, None)
    # user 4: purchase at +85 is within 1h of first click (+30)
    assert got[4] == (us(0), us(30), us(85))


def test_funnel_steps_single_exchange(spark):
    """Three stacked whole-partition windows + the per-user rollup all
    key on user_id — the executed plan must contain exactly ONE
    Exchange."""
    import __spark_entry__ as em

    em._register(spark, "/root/testdata/sf0.001")
    sql = em._portable("funnel_steps").replace(
        "ts_epoch_expr", "unix_micros(CAST(ts AS TIMESTAMP))"
    )
    out = spark.sql(sql)
    out.collect()
    plan = (
        out._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert plan.count("Exchange hashpartitioning") == 1


# ---------------------------------------------------------------------------
# pivot matrix, embedding centroids, HLL sketch
# ---------------------------------------------------------------------------

def test_lang_source_matrix_row_sums(spark):
    """The pivot's fixed lang columns must partition n_docs exactly."""
    import __spark_entry__ as em

    em._register(spark, "/root/testdata/sf0.001")
    rows = spark.sql(em._portable("lang_source_matrix")).collect()
    assert rows
    for r in rows:
        assert (
            r["n_de"] + r["n_en"] + r["n_es"] + r["n_fr"] + r["n_zh"]
            == r["n_docs"]
        )


def test_label_centroids_numpy_replay(spark):
    from osm_conflate_spark.operators.similarity import label_centroids

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    got = {
        (r["label"], r["dim"]): r["v"]
        for r in label_centroids(emb).collect()
    }
    pdf = emb.toPandas()
    for label, g in pdf.groupby("label"):
        m = np.mean(np.stack(g["embedding"].to_numpy()).astype(np.float64), axis=0)
        for d in range(len(m)):
            assert got[(label, d)] == pytest.approx(round(float(m[d]), 6), abs=2e-6)


def test_centroid_similarity_numpy_replay_and_plan(spark):
    from osm_conflate_spark.operators.similarity import centroid_similarity

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    out = centroid_similarity(emb)
    got = {
        (r["label_a"], r["label_b"]): r["cosine"] for r in out.collect()
    }
    pdf = emb.toPandas()
    cents = {
        label: np.mean(
            np.stack(g["embedding"].to_numpy()).astype(np.float64), axis=0
        )
        for label, g in pdf.groupby("label")
    }
    labels = sorted(cents)
    assert len(got) == len(labels) * (len(labels) - 1) // 2
    for i, a in enumerate(labels):
        for b in labels[i + 1:]:
            want = float(
                cents[a] @ cents[b]
                / (np.linalg.norm(cents[a]) * np.linalg.norm(cents[b]))
            )
            assert got[(a, b)] == pytest.approx(round(want, 6), abs=2e-6)
            assert -1.0 <= got[(a, b)] <= 1.0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_approx_users_error_bound(spark):
    """HLL++ at rsd=0.02 must land within 3 standard errors of the
    exact distinct count on every group (deterministic: the sketch is
    seed-free for a fixed input/partitioning)."""
    import __spark_entry__ as em

    got = em.queries()["approx_users"](spark, "/root/testdata/sf0.01").collect()
    assert got
    for r in got:
        rel = abs(r["approx_users"] - r["exact_users"]) / r["exact_users"]
        assert rel <= 0.06, (r["event_type"], rel)


# ---------------------------------------------------------------------------
# FastSS fuzzy join + JSON props extraction
# ---------------------------------------------------------------------------

def test_fuzzy_pairs_hand_fixture(spark):
    """Edit-distance taxonomy: substitution, deletion, insertion all
    dist 1 (kept); transposition and double-substitution are dist 2
    (dropped); exact duplicates are dist 0 (kept)."""
    from osm_conflate_spark.operators.fuzzy import fuzzy_pairs

    rows = [
        (1, "market"),
        (2, "marked"),   # substitution of 1 -> dist 1
        (3, "marke"),    # deletion from 1 -> dist 1
        (4, "markets"),  # insertion into 1 -> dist 1
        (5, "makret"),   # transposition -> dist 2 from 1: excluded
        (6, "market"),   # duplicate of 1 -> dist 0
        (7, "bazaar"),   # unrelated
    ]
    df = spark.createDataFrame(rows, "k long, name string")
    got = {
        (r["a_key"], r["b_key"]): r["dist"]
        for r in fuzzy_pairs(df, "k", "name").collect()
    }
    # exact expectations, computed with an independent DP levenshtein
    import itertools

    def lev(a, b):
        d = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[0], i
            for j, cb in enumerate(b, 1):
                prev, d[j] = d[j], min(
                    d[j] + 1, d[j - 1] + 1, prev + (ca != cb)
                )
        return d[len(b)]

    want = {
        (a, b): lev(na, nb)
        for (a, na), (b, nb) in itertools.combinations(rows, 2)
        if lev(na, nb) <= 1
    }
    assert got == want
    assert (1, 5) not in got and (5, 6) not in got  # transposition is 2


def test_fuzzy_pairs_equijoin_plan(spark):
    """The whole point of FastSS: the fuzzy join must plan as an
    EQUI-join on the variant, never a cartesian/nested-loop product."""
    from osm_conflate_spark.operators.fuzzy import fuzzy_pairs

    sup = spark.read.parquet("/root/testdata/sf0.001/supplier.parquet")
    out = fuzzy_pairs(sup, "s_suppkey", "s_name")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    with pytest.raises(ValueError):
        fuzzy_pairs(sup, "s_suppkey", "s_name", max_dist=2)


def test_json_props_null_and_missing_keys(spark):
    """Missing key / malformed JSON extract to NULL and fall out of
    sum/avg identically in both engines."""
    import duckdb
    import pandas as pd

    rows = [
        ("a", '{"k": 10}'),
        ("a", '{"other": 1}'),   # missing key -> NULL
        ("a", "not json"),       # malformed -> NULL
        ("b", '{"k": 7}'),
    ]
    df = spark.createDataFrame(rows, "event_type string, props string")
    df.createOrReplaceTempView("events")
    got = {
        r["event_type"]: (r["n"], r["sum_k"], r["avg_k"])
        for r in spark.sql(
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(CAST(get_json_object(props, '$.k') AS INT)) AS BIGINT) AS sum_k, "
            "round(avg(CAST(get_json_object(props, '$.k') AS INT)), 6) AS avg_k "
            "FROM events GROUP BY event_type"
        ).collect()
    }
    con = duckdb.connect()
    con.register("events", pd.DataFrame(rows, columns=["event_type", "props"]))
    duck = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(CAST(try_cast(props AS JSON)->>'k' AS INT)) AS BIGINT) AS sum_k, "
            "round(avg(CAST(try_cast(props AS JSON)->>'k' AS INT)), 6) AS avg_k "
            "FROM events GROUP BY event_type"
        ).fetchall()
    }
    assert got == duck
    assert got["a"] == (3, 10, 10.0)

"""Case J — extractor byte-identity: pages -> text must byte-equal the
frozen goldens per url; the Spark mapInPandas path must agree with the
pandas reference path; the POI payload round-trips."""

import os

import pandas as pd
from pyspark.sql import functions as F

from osm_conflate_spark.gen import gen_dataset, gen_pages, parse_tags_raw
from osm_conflate_spark.sources.extract import (
    EXTRACT_SCHEMA,
    extract_pages_iter,
    extract_text,
    poi_tags_map_sql,
)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "text")


def _golden_pages():
    ds = gen_dataset(100, seed=42, dup_id_frac=0.0, spatial_dup_frac=0.0)
    return ds, gen_pages(ds, seed=42)


def test_extract_byte_identity_goldens():
    """Golden bytes are committed; regenerating must be byte-identical."""
    _, pages = _golden_pages()
    assert os.path.isdir(GOLDEN_DIR), "golden fixtures missing — run tests/freeze_goldens.py"
    for i in range(len(pages)):
        url = pages["url"].iloc[i]
        fname = url.replace("https://", "").replace("/", "_") + ".txt"
        with open(os.path.join(GOLDEN_DIR, fname), "rb") as f:
            golden = f.read()
        assert pages["text"].iloc[i].encode("utf-8") == golden, url


def test_extractor_semantics():
    html = pd.Series(
        [
            b"<html><script>bad()</script><p>Hello &amp; <b>world</b></p></html>",
            b"<style>x{}</style>A  B\n\nC<!-- gone -->D",
        ]
    )
    out = extract_text(html)
    assert out[0] == "Hello & world"
    assert out[1] == "A B CD" or out[1] == "A B C D"


def test_spark_extract_path_matches_pandas(spark):
    ds, pages = _golden_pages()
    sdf = spark.createDataFrame(
        pages[["url", "warc_ts", "html", "lang"]],
        schema="url string, warc_ts timestamp, html binary, lang string",
    )
    extracted = sdf.mapInPandas(extract_pages_iter, EXTRACT_SCHEMA)
    rows = {r["url"]: r for r in extracted.collect()}
    for i in range(len(pages)):
        url = pages["url"].iloc[i]
        r = rows[url]
        assert r["text"] == pages["text"].iloc[i]          # byte identity
        assert r["poi_id"] == ds["id"].iloc[i]             # payload round-trip
        assert abs(r["poi_lat"] - ds["lat"].iloc[i]) < 1e-12
        assert abs(r["poi_lon"] - ds["lon"].iloc[i]) < 1e-12
    # JVM-side tags_raw -> map decode equals the python parser
    tags = (
        extracted.select("url", F.expr(poi_tags_map_sql("poi_tags_raw")).alias("tags"))
        .collect()
    )
    tmap = {r["url"]: dict(r["tags"]) for r in tags}
    for i in range(len(pages)):
        assert tmap[pages["url"].iloc[i]] == parse_tags_raw(ds["tags_raw"].iloc[i])

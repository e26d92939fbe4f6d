"""Shared helpers: pandas generator frames <-> Spark DFs <-> oracle lists."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from osm_conflate_spark import reference_model as rm
from osm_conflate_spark.gen import parse_tags_raw
from osm_conflate_spark.sources.extract import poi_tags_map_sql

DS_COLS = "id string, lat double, lon double, tags_raw string, category string, remarks string, url string"
OSM_COLS = "osm_type string, osm_id long, version int, lat double, lon double, tags_raw string"


def ds_to_spark(spark, pdf: pd.DataFrame):
    cols = ["id", "lat", "lon", "tags_raw", "category", "remarks", "url"]
    df = spark.createDataFrame(pdf[cols], schema=DS_COLS)
    return df.withColumn("tags", F.expr(poi_tags_map_sql("tags_raw"))).drop("tags_raw")


def osm_to_spark(spark, pdf: pd.DataFrame):
    cols = ["osm_type", "osm_id", "version", "lat", "lon", "tags_raw"]
    df = spark.createDataFrame(pdf[cols], schema=OSM_COLS)
    return df.withColumn("tags", F.expr(poi_tags_map_sql("tags_raw"))).drop("tags_raw")


def ds_to_oracle(pdf: pd.DataFrame):
    return [
        rm.SourcePoint(
            r.id, float(r.lat), float(r.lon), parse_tags_raw(r.tags_raw),
            getattr(r, "category", None), getattr(r, "remarks", None),
        )
        for r in pdf.itertuples()
    ]


def osm_to_oracle(pdf: pd.DataFrame):
    return [
        rm.OSMPoint(
            r.osm_type, int(r.osm_id), int(r.version),
            float(r.lat), float(r.lon), parse_tags_raw(r.tags_raw),
        )
        for r in pdf.itertuples()
    ]


def matched_set_spark(matched_df):
    return {
        (r["dataset_id"], r["osm_pk"], round(r["dist"], 9))
        for r in matched_df.collect()
    }


def matched_set_oracle(res):
    return {
        (m["dataset_id"], m["osm_key"], round(m["dist"], 9))
        for m in res["matched_pairs"]
    }


def changes_set_spark(changes_df):
    out = set()
    for r in changes_df.collect():
        tags = tuple(sorted(r["tags"].items()))
        out.add(
            (
                r["action"], r["osm_type"], r["osm_id"], r["version"],
                round(r["lat"], 9), round(r["lon"], 9), tags,
                r["dataset_id"],
                None if r["match_dist"] is None else round(r["match_dist"], 9),
            )
        )
    return out


def changes_set_oracle(res):
    out = set()
    for c in res["changes"]:
        tags = tuple(sorted(c["tags"].items()))
        out.add(
            (
                c["action"], c["osm_type"], c["osm_id"], c["version"],
                round(c["lat"], 9), round(c["lon"], 9), tags,
                c["dataset_id"],
                None if c["match_dist"] is None else round(c["match_dist"], 9),
            )
        )
    return out

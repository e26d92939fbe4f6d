"""SRC2 — dataset readers: CSV / JSON / pages-table front ends producing
the canonical ``dataset_points`` DataFrame
(id, lat, lon, tags map, category, remarks, url).

Reference: ``conflate/dataset.py :: read_dataset`` — the reference
delegates to per-profile parser hooks; here each supported shape is a
reader function, and the pages table (the web-scale graft input) goes
through the frozen Arrow extractor (sources.extract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extract import EXTRACT_SCHEMA, extract_pages_iter, poi_tags_map_sql

DS_COLUMNS = ["id", "lat", "lon", "tags", "category", "remarks", "url"]


def _finish(df: DataFrame) -> DataFrame:
    for c in ("category", "remarks", "url"):
        if c not in df.columns:
            df = df.withColumn(c, F.lit(None).cast("string"))
    return df.select(*DS_COLUMNS).where(
        F.col("id").isNotNull() & F.col("lat").isNotNull() & F.col("lon").isNotNull()
    )


def from_csv(
    spark: SparkSession, path: str,
    id_col: str = "id", lat_col: str = "lat", lon_col: str = "lon",
    tag_cols: tuple = (),
) -> DataFrame:
    """CSV with one column per tag (the common profile shape)."""
    raw = spark.read.option("header", "true").csv(path)
    tag_map = (
        F.map_from_arrays(
            F.array(*[F.lit(c) for c in tag_cols]),
            F.array(*[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in tag_cols]),
        )
        if tag_cols
        else F.expr("map()")
    )
    return _finish(
        raw.select(
            F.col(id_col).cast("string").alias("id"),
            F.col(lat_col).cast("double").alias("lat"),
            F.col(lon_col).cast("double").alias("lon"),
            tag_map.alias("tags"),
        )
    )


def from_json(spark: SparkSession, path: str) -> DataFrame:
    """JSON lines with {id, lat, lon, tags{...}} objects.

    Reads with an EXPLICIT schema (tags as map<string,string>) — schema
    inference would type ``tags`` as a struct of observed keys, which is
    both wrong semantically and a scan-the-data-twice cost at scale.
    """
    raw = spark.read.schema(
        "id string, lat double, lon double, tags map<string,string>, "
        "category string, remarks string, url string"
    ).json(path)
    return _finish(raw.withColumn("tags", F.coalesce("tags", F.expr("map()"))))


def from_pages(pages: DataFrame) -> DataFrame:
    """Common-Crawl-style pages table -> dataset points via the frozen
    extractor (U1); the html binary never survives past the extraction
    batch (column pruned inside mapInPandas)."""
    extracted = pages.select("url", "warc_ts", "html", "lang").mapInPandas(
        extract_pages_iter, EXTRACT_SCHEMA
    )
    return _finish(
        extracted.select(
            F.col("poi_id").alias("id"),
            F.col("poi_lat").alias("lat"),
            F.col("poi_lon").alias("lon"),
            F.expr(poi_tags_map_sql("poi_tags_raw")).alias("tags"),
            "url",
        )
    )

"""J3 match-predicate hook, J7 moveability, streaming pages ingest."""

from pyspark.sql import functions as F

from osm_conflate_spark.config import ConflateConfig
from osm_conflate_spark import reference_model as rm
from osm_conflate_spark.gen import gen_dataset, gen_osm, gen_pages
from osm_conflate_spark.operators.changes import moveability
from osm_conflate_spark.plans.pipeline import ConflatePipeline
from osm_conflate_spark.sources.dataset import from_pages
from osm_conflate_spark.streaming import events as stv

from helpers import (
    ds_to_oracle, ds_to_spark, matched_set_oracle, matched_set_spark,
    osm_to_oracle, osm_to_spark,
)


def test_j3_match_predicate_engine_equals_oracle(spark):
    # defined as a closure so cloudpickle ships it by VALUE — a module-level
    # function in tests/ isn't importable on executor python workers
    def _amenity_must_match(osm_tags, ds_tags):
        # equal amenities required, and fuel stations never auto-match
        return (
            osm_tags.get("amenity") == ds_tags.get("amenity")
            and ds_tags.get("amenity") != "fuel"
        )

    ds_pdf = gen_dataset(120, seed=51, dup_id_frac=0, spatial_dup_frac=0)
    osm_pdf = gen_osm(ds_pdf, seed=52)
    cfg = ConflateConfig(matches=_amenity_must_match)
    res_o = rm.conflate(ds_to_oracle(ds_pdf), osm_to_oracle(osm_pdf), cfg)
    pipe = ConflatePipeline(spark, cfg)
    res_s = pipe.run(ds_to_spark(spark, ds_pdf), osm_to_spark(spark, osm_pdf))
    assert matched_set_spark(res_s["matched"]) == matched_set_oracle(res_o)
    # the predicate must actually bite: fewer matches than without it
    res_o_free = rm.conflate(
        ds_to_oracle(ds_pdf), osm_to_oracle(osm_pdf), ConflateConfig()
    )
    assert len(res_o["matched_pairs"]) < len(res_o_free["matched_pairs"])


def test_j7_moveability(spark):
    changes = spark.createDataFrame(
        [
            ("modify", "node", 1), ("modify", "node", 2),
            ("modify", "way", 3), ("create", "node", None),
        ],
        "action string, osm_type string, osm_id long",
    )
    membership = spark.createDataFrame([(1, 100)], "node_id long, way_id long")
    rows = {r["osm_id"]: r["can_move"] for r in moveability(changes, membership).collect()}
    assert rows[1] is False      # node in a way -> cannot move
    assert rows[2] is True       # free node -> movable
    assert rows[3] is None       # way -> not applicable
    assert rows[None] is None    # create -> not applicable
    # without a membership table: NULL (documented gap)
    rows2 = {r["osm_id"]: r["can_move"] for r in moveability(changes, None).collect()}
    assert all(v is None for v in rows2.values())


def test_streaming_pages_extract(spark, tmp_path):
    ds = gen_dataset(40, seed=61, dup_id_frac=0, spatial_dup_frac=0)
    pages = gen_pages(ds, seed=61)
    p = str(tmp_path / "pages")
    spark.createDataFrame(
        pages[["url", "warc_ts", "html", "lang"]],
        schema=stv.PAGES_SCHEMA,
    ).repartition(4).write.parquet(p)
    stream = stv.read_pages_stream(spark, p, max_files_per_trigger=2)
    extracted = from_pages(stream)
    assert extracted.isStreaming
    stv.run_to_memory_sink(extracted, "pg")
    got = {r["id"] for r in spark.sql("SELECT id FROM pg").collect()}
    assert got == set(ds["id"])

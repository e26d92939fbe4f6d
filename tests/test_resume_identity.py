"""FIXTURES case L (resume determinism): a checkpoint-resumed run must
reproduce the identical change set as the fresh run."""

from osm_conflate_spark.config import ConflateConfig
from osm_conflate_spark.gen import gen_dataset, gen_osm
from osm_conflate_spark.plans.pipeline import ConflatePipeline

from helpers import changes_set_spark, ds_to_spark, osm_to_spark


def test_resume_reproduces_identical_changes(spark, tmp_path):
    ds_pdf = gen_dataset(120, seed=91)
    osm_pdf = gen_osm(ds_pdf, seed=92)
    cfg = ConflateConfig()
    out = str(tmp_path / "ckpt")

    fresh = ConflatePipeline(spark, cfg, out_dir=out, resume=False).run(
        ds_to_spark(spark, ds_pdf), osm_to_spark(spark, osm_pdf)
    )
    fresh_set = changes_set_spark(fresh["changes"])

    resumed = ConflatePipeline(spark, cfg, out_dir=out, resume=True).run(
        ds_to_spark(spark, ds_pdf), osm_to_spark(spark, osm_pdf)
    )
    resumed_set = changes_set_spark(resumed["changes"])
    assert resumed_set == fresh_set
    # the resumed run actually reused checkpoints (lineage says so)
    lineage = resumed["lineage"]().collect()
    resumed_stages = {r["stage"] for r in lineage if r["wall_ms"] == 0.0}
    assert "match" in resumed_stages and "dataset_prep" in resumed_stages

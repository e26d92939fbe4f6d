"""Round-6 optimization tests: build_changes shared-subframe restructure.

The modify/create branches now split off ONE shared left join of the
projected dataset frame against matched (was: independent inner join +
left_anti), and delete/retag share one unmatched-OSM frame.  These
tests pin the split's edge cases at the operator level; full change-set
semantics (incl. audit fix/keep/move) stay covered by
test_reference_model / test_hooks.
"""

import pytest
from pyspark.sql import functions as F

from osm_conflate_spark.config import ConflateConfig
from osm_conflate_spark.operators.changes import build_changes

CFG = ConflateConfig()


def _frames(spark, matched_rows):
    ds = spark.createDataFrame(
        [
            ("d1", 10.0, 20.0, {"name": "a", "amenity": "cafe"}),
            ("d2", 10.001, 20.0, {"name": "b"}),
        ],
        "id string, lat double, lon double, tags map<string,string>",
    )
    osm = spark.createDataFrame(
        [
            ("node", 1, 3, 10.0, 20.0, {"name": "old", "amenity": "cafe"}),
            ("node", 2, 1, 10.002, 20.0,
             {"amenity": "bar", CFG.ref_key: "dGONE"}),
        ],
        "osm_type string, osm_id long, version int, lat double, lon double,"
        " tags map<string,string>",
    ).withColumn(
        "osm_pk",
        F.concat(F.substring("osm_type", 1, 1), F.col("osm_id").cast("string")),
    )
    matched = spark.createDataFrame(
        matched_rows, "dataset_id string, osm_pk string, dist double"
    )
    vicinity = osm.select("osm_pk")
    return ds, osm, matched, vicinity


def _actions(df):
    return {r["action"]: r["count"] for r in df.groupBy("action").count().collect()}


def test_build_changes_empty_matched_all_create(spark):
    """Left-join split must behave like the old anti join when nothing
    matched: every dataset point is a create, no modify rows."""
    ds, osm, matched, vicinity = _frames(spark, [])
    out = build_changes(matched, ds, osm, vicinity, CFG)
    acts = _actions(out)
    assert acts.get("create") == 2
    assert "modify" not in acts
    # unmatched previously-conflated OSM point ('ref:test' present) deletes
    assert acts.get("delete") == 1
    creates = {r["dataset_id"] for r in out.where("action = 'create'").collect()}
    assert creates == {"d1", "d2"}


def test_build_changes_fully_matched_no_create(spark):
    """All dataset points matched: no create rows, and each matched pair
    yields at most one modify row (the shared left join must not
    duplicate rows)."""
    ds, osm, matched, vicinity = _frames(
        spark, [("d1", "n1", 5.0), ("d2", "n2", 7.0)]
    )
    out = build_changes(matched, ds, osm, vicinity, CFG).cache()
    try:
        acts = _actions(out)
        assert "create" not in acts
        assert acts.get("modify") == 2
        assert "delete" not in acts  # both OSM points consumed by matches
        rows = out.where("action = 'modify'").collect()
        assert {r["dataset_id"] for r in rows} == {"d1", "d2"}
        # merged tags carry the ref stamp, master 'name' wins over OSM
        by_id = {r["dataset_id"]: r for r in rows}
        assert by_id["d1"]["tags"][CFG.ref_key] == "d1"
        assert by_id["d1"]["tags"]["name"] == "a"
    finally:
        out.unpersist()


def test_build_changes_counts_match_inner_anti_reference(spark):
    """Differential: the left-join split equals a straightforward
    inner+anti reference decomposition on a mixed fixture."""
    ds, osm, matched, vicinity = _frames(spark, [("d1", "n1", 5.0)])
    out = build_changes(matched, ds, osm, vicinity, CFG)
    acts = _actions(out)
    # reference: creates = ds ids minus matched ids (anti join semantics)
    ref_create = {"d1", "d2"} - {"d1"}
    creates = {r["dataset_id"] for r in out.where("action = 'create'").collect()}
    assert creates == ref_create
    # modifies = matched inner ds inner osm
    assert acts.get("modify") == 1
    # n2 is unmatched and carries the ref key -> delete path
    assert acts.get("delete") == 1

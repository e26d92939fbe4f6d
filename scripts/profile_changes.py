"""Isolate the changes-DAG tail of the e2e pipeline (guide §1.4).

The e2e bench executes build_changes lazily inside metrics.collect();
stage walls only record DAG construction.  This script runs the
pipeline up to `matched`/`vicinity` ONCE (their localCheckpoints keep
inputs warm), then times metrics.collect() + tiles.count() alone for N
passes, and optionally writes the metrics plan to plans/r06/.

Usage:
  SPARK_GRAFT_BENCH_N=600000 python scripts/profile_changes.py --passes 3 --tag before
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _median(xs):
    s = sorted(xs)
    m = len(s) // 2
    return s[m] if len(s) % 2 else 0.5 * (s[m - 1] + s[m])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--tag", default="")
    ap.add_argument("--n-pages", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_BENCH_N", "600000")))
    args = ap.parse_args()

    import bench
    from pyspark.sql import functions as F

    from osm_conflate_spark.config import ConflateConfig
    from osm_conflate_spark.operators import changes as chg
    from osm_conflate_spark.plans.pipeline import ConflatePipeline, build_session
    from osm_conflate_spark.sources.extract import (
        EXTRACT_SCHEMA,
        extract_pages_iter,
        poi_tags_map_sql,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(
        app="profile-changes",
        master=f"local[{cpus}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", max(32, cpus))),
    )
    spark.sparkContext.setLogLevel("ERROR")

    pages_path, osm_path = bench.ensure_bench_tables(spark, args.n_pages)

    pages = spark.read.parquet(pages_path).select("url", "warc_ts", "html", "lang")
    extracted = pages.mapInPandas(extract_pages_iter, EXTRACT_SCHEMA)
    ds_raw = extracted.select(
        F.col("poi_id").alias("id"),
        F.col("poi_lat").alias("lat"),
        F.col("poi_lon").alias("lon"),
        F.expr(poi_tags_map_sql("poi_tags_raw")).alias("tags"),
        F.lit(None).cast("string").alias("category"),
        F.lit(None).cast("string").alias("remarks"),
        "url",
    ).where(F.col("id").isNotNull())
    osm_raw = spark.read.parquet(osm_path).withColumn(
        "tags", F.expr(poi_tags_map_sql("tags_raw"))
    ).drop("tags_raw")

    cfg = ConflateConfig()
    pipe = ConflatePipeline(spark, cfg)
    r = pipe.runner
    from osm_conflate_spark.plans.lineage import input_fingerprint

    r.input_sig = input_fingerprint(ds_raw, osm_raw)
    t0 = time.monotonic()
    ds = r.run("dataset_prep", lambda: pipe.prepare_dataset(ds_raw))
    osm = r.run("osm_prep", lambda: pipe.prepare_osm(osm_raw)).localCheckpoint(eager=True)
    matched_box: dict = {}

    def _match():
        m, v = pipe.match(ds, osm, None, False)
        matched_box["vicinity"] = v.localCheckpoint(eager=True)
        return m

    matched = r.run("match", _match)
    print(f"setup (prep+match): {time.monotonic() - t0:.1f}s", flush=True)

    def build():
        changes = chg.build_changes(matched, ds, osm, matched_box["vicinity"], cfg, None)
        return changes.groupBy("action").count()

    metrics = build()
    if args.tag:
        os.makedirs(os.path.join(REPO, "plans", "r06"), exist_ok=True)
        metrics.collect()  # materialize so AQE finalizes stage reuse
        plan = metrics._sc._jvm.PythonSQLUtils.explainString(
            metrics._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(REPO, "plans", "r06", f"changes_metrics_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(
            f"wrote {path}: {plan.count('Exchange')} Exchange refs, "
            f"{plan.count('ReusedExchange')} ReusedExchange, "
            f"{plan.count('ShuffleQueryStage')} ShuffleQueryStage, "
            f"final={'isFinalPlan=true' in plan}",
            flush=True,
        )

    tiles = chg.tiles(ds, cfg)
    # the setup checkpoints (ds/osm/pairs/vicinity/matched) must stay
    # pinned across passes; per-pass build_changes checkpoints must not
    # (bench.py sweeps ALL persistent RDDs after each run — here we
    # record the setup set and sweep only the per-pass additions)
    keep_ids = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    walls_m, walls_t = [], []
    for i in range(args.passes):
        spark.sparkContext.setJobDescription(f"profile_changes:metrics:{i}")
        t0 = time.monotonic()
        counts = {row["action"]: row["count"] for row in build().collect()}
        walls_m.append(round(time.monotonic() - t0, 2))
        prdds = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in list(prdds.keySet().toArray()):
            if rid not in keep_ids:
                prdds.get(rid).unpersist()
        spark.sparkContext.setJobDescription(f"profile_changes:tiles:{i}")
        t0 = time.monotonic()
        nt = tiles.count()
        walls_t.append(round(time.monotonic() - t0, 2))
        print(f"pass {i}: metrics {walls_m[-1]}s {counts}  tiles {walls_t[-1]}s ({nt})",
              flush=True)
    print(f"RESULT metrics median {_median(walls_m)}s runs {walls_m}  "
          f"tiles median {_median(walls_t)}s runs {walls_t}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

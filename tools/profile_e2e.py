"""Phase-split timing of the bench e2e pipeline (r13 diagnosis).

Replays bench.e2e_pipeline_sec step by step with a timer + Spark job
counter around each phase, twice (cold then warm), so the 15 s wall
can be attributed: ingest (check_new_scns), catalog write/read, scene
tasks, summary/report actions.

    python tools/profile_e2e.py [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from bench import free_pinned
    from eodatadown_spark import pipeline, reports, queries as Q
    from eodatadown_spark.catalog import ParquetCatalog
    from eodatadown_spark.sensor import get_sensor_obj
    from eodatadown_spark.session import get_spark
    from eodatadown_spark.sources.index_adapters import landsat_index_scenes

    spark = get_spark("profile_e2e")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def jobs() -> int:
        ids = tracker.getJobIdsForGroup(None) or []
        return len(ids)

    orders = spark.read.parquet(f"{args.sf_dir}/orders.parquet")
    d = F.date_format("o_orderdate", "yyyy-MM-dd")
    dc = F.date_format("o_orderdate", "yyyyMMdd")
    raw = orders.select(
        F.concat(F.lit("SC_"), F.col("o_orderkey")).alias("scene_id"),
        F.concat(
            F.lit("LC08_L1TP_001001_"), dc, F.lit("_"), dc, F.lit("_01_T1_"),
            F.col("o_orderkey"),
        ).alias("product_id"),
        F.lit("LANDSAT_8").alias("spacecraft_id"),
        F.lit("OLI_TIRS").alias("sensor_id"),
        d.alias("date_acquired"),
        F.concat(d, F.lit("T10:00:00.000000Z")).alias("sensing_time"),
        F.lit("01").alias("collection_number"),
        F.lit("T1").alias("collection_category"),
        F.lit("L1TP").alias("data_type"),
        (F.col("o_orderkey") % 233).cast("string").alias("wrs_path"),
        (F.col("o_orderkey") % 248).cast("string").alias("wrs_row"),
        (F.col("o_custkey") % 100).cast("string").alias("cloud_cover"),
        ((F.col("o_custkey") % 80) - 30).cast("string").alias("north_lat"),
        ((F.col("o_custkey") % 80) - 32).cast("string").alias("south_lat"),
        ((F.col("o_orderkey") % 360) - 178).cast("string").alias("east_lon"),
        ((F.col("o_orderkey") % 360) - 180).cast("string").alias("west_lon"),
        F.col("o_totalprice").cast("long").cast("string").alias("total_size"),
        F.concat(F.lit("gs://bench/"), F.col("o_orderkey")).alias("base_url"),
    )

    for run in ("cold", "warm"):
        work = tempfile.mkdtemp(prefix="eodd_profile_e2e_")
        phases: list[tuple[str, float, int]] = []
        t_all = time.time()
        try:
            def mark(name: str, t0: float, j0: int) -> None:
                phases.append((name, time.time() - t0, jobs() - j0))

            t0, j0 = time.time(), jobs()
            cat = ParquetCatalog(spark, work)
            sensor = get_sensor_obj("LandsatGOOG", cat)
            sensor.init_sensor_db()
            mark("init_sensor_db", t0, j0)

            t0, j0 = time.time(), jobs()
            sensor.check_new_scns(landsat_index_scenes(raw))
            mark("check_new_scns", t0, j0)

            t0, j0 = time.time(), jobs()
            catalog = cat.read_clean("landsat_scenes")
            pipeline.scenes_need_processing(catalog).count()
            mark("need_processing.count", t0, j0)

            t0, j0 = time.time(), jobs()
            updates = pipeline.run_scene_tasks(
                catalog.join(
                    Q.get_scnlist_download(catalog), "pid", "left_semi"
                ).select("pid"),
                lambda s: {"pid": s["pid"], "downloaded": True,
                           "download_path": f"{work}/dl/{s['pid']}"},
                "pid long, downloaded boolean, download_path string",
            )
            cat.write(pipeline.apply_updates(catalog, updates),
                      "landsat_scenes")
            mark("scene_tasks+write", t0, j0)

            t0, j0 = time.time(), jobs()
            catalog = cat.read_clean("landsat_scenes")
            reports.sensor_summary_counts(catalog).first()
            mark("summary_counts", t0, j0)

            t0, j0 = time.time(), jobs()
            reports.column_stats(catalog, "total_size", approx=True).first()
            mark("column_stats", t0, j0)

            t0, j0 = time.time(), jobs()
            obs, _bridge = reports.build_obs_date_records(
                catalog, "LandsatGOOG")
            reports.get_obs_scns(obs).count()
            mark("obs_date_records", t0, j0)

            total = time.time() - t_all
            print(f"== {run}: total {total:.3f}s ==")
            for name, sec, nj in phases:
                print(f"  {name:24s} {sec:7.3f}s  jobs={nj}")
        finally:
            shutil.rmtree(work, ignore_errors=True)
            free_pinned(spark)


if __name__ == "__main__":
    main()

"""Ingest semantics: watermark, serial PIDs, J5 idempotent upsert, J4
keep-latest dedup, J3 ROI filtering."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from eodatadown_spark import ingest


def test_watermark_and_next_pid(landsat_scenes):
    assert ingest.watermark(landsat_scenes, "date_acquired") == dt.date(2019, 6, 30)
    assert ingest.next_pid(landsat_scenes) == 7


def test_next_pid_empty(spark, landsat_scenes):
    empty = landsat_scenes.where(F.lit(False))
    assert ingest.next_pid(empty) == 0
    assert ingest.watermark(empty, "date_acquired") is None


def test_filter_above_watermark(spark):
    src = spark.createDataFrame(
        [("a", dt.date(2019, 6, 30)), ("b", dt.date(2019, 7, 1))],
        "scene_id string, date_acquired date",
    )
    out = ingest.filter_above_watermark(src, "date_acquired", dt.date(2019, 6, 30))
    assert [r["scene_id"] for r in out.collect()] == ["b"]


def test_upsert_anti_join_and_serial_pids(spark, landsat_scenes):
    incoming = landsat_scenes.where(F.col("pid").isin(0, 3)).withColumn(
        "pid", F.lit(None).cast("long")
    )
    fresh_new = landsat_scenes.where(F.col("pid") == 6).withColumn(
        "scene_id", F.lit("S_NEW")
    ).withColumn("pid", F.lit(None).cast("long"))
    out = ingest.upsert_new_scenes(
        landsat_scenes, incoming.union(fresh_new), keys=["scene_id"]
    )
    assert out.count() == 8  # only S_NEW inserted (S1/S4 keys already present)
    new_row = out.where(F.col("scene_id") == "S_NEW").first()
    assert new_row["pid"] == 7  # max(pid)+1 serial assignment


def test_upsert_idempotent(landsat_scenes):
    again = ingest.upsert_new_scenes(
        landsat_scenes, landsat_scenes, keys=["scene_id"]
    )
    assert again.count() == landsat_scenes.count()


def test_assign_pids_matches_global_sort_without_single_partition(spark):
    # 10k rows, deliberately unsorted input: the two-phase assignment must
    # reproduce the exact global-sort ranks while never moving the batch to
    # one task (the r1 A1 scale-killer)
    from eodatadown_spark.plans import audit

    df = spark.range(10_000).select(
        (F.xxhash64(F.col("id")) % 1_000_000).alias("key"), F.col("id").alias("payload")
    )
    out = ingest.assign_pids(df, base_pid=5, order_cols=["key", "payload"], num_partitions=8)
    plan = audit.physical_plan(out, "simple")
    assert "SinglePartition" not in plan
    rows = out.orderBy("key", "payload").collect()
    assert [r["pid"] for r in rows] == list(range(5, 5 + 10_000))


def test_assign_pids_empty_batch(spark, landsat_scenes):
    empty = landsat_scenes.drop("pid").where(F.lit(False))
    out = ingest.assign_pids(empty, base_pid=0, order_cols=["scene_id"])
    assert out.count() == 0 and dict(out.dtypes)["pid"] == "bigint"


def test_keep_latest_dedup(landsat_scenes):
    assert [r["scene_id"] for r in ingest.find_duplicate_scenes(landsat_scenes).collect()] == ["S1"]
    out = ingest.resolve_duplicate_scenes(landsat_scenes)
    assert out.count() == 6
    kept = out.where(F.col("scene_id") == "S1").collect()
    assert len(kept) == 1 and kept[0]["pid"] == 0  # newer product (20200110) wins


def test_keep_latest_tie_breaks_first_seen(spark, landsat_scenes):
    # equal process dates → lowest pid (first-seen) wins, per ref :500-510
    dup = landsat_scenes.where(F.col("pid") == 0).withColumn("pid", F.lit(99).cast("long"))
    out = ingest.resolve_duplicate_scenes(landsat_scenes.union(dup))
    kept = out.where(F.col("scene_id") == "S1").collect()
    assert len(kept) == 1 and kept[0]["pid"] == 0


def test_roi_semi_and_anti(landsat_scenes, roi_df):
    # ROI west box (-5..0.5, 45..50.5) strictly overlaps pid0 (0..2,50..52)
    # and pid2 (-3..-1,46..48)
    keep = ingest.filter_scenes_roi(landsat_scenes, roi_df, keep_intersecting=True)
    assert sorted(r["pid"] for r in keep.collect()) == [0, 2, 5]
    drop = ingest.filter_scenes_roi(landsat_scenes, roi_df, keep_intersecting=False)
    assert sorted(r["pid"] for r in drop.collect()) == [1, 3, 4, 6]

"""Scale-path evidence: partition pruning on the year-partitioned catalog,
shuffle-free joins on bucketed tables."""

from __future__ import annotations

from pyspark.sql import functions as F

from eodatadown_spark.plans import audit


def test_partition_pruning_on_year(spark, landsat_scenes, tmp_path):
    """A date filter on the partitioned catalog must prune p_year partitions
    (the engine analog of the reference's date-keyed access)."""
    from eodatadown_spark.catalog import ParquetCatalog

    extra = landsat_scenes.withColumn(
        "date_acquired", F.add_months(F.col("date_acquired"), 12)
    ).withColumn("pid", F.col("pid") + 100)
    cat = ParquetCatalog(spark, str(tmp_path))
    cat.write(landsat_scenes.unionByName(extra), "landsat_scenes")

    df = cat.read("landsat_scenes").where(F.col("p_year") == 2019)
    plan = audit.physical_plan(df)
    assert "PartitionFilters: [isnotnull(p_year" in plan
    assert df.count() == 7  # only the 2019 half scanned


def test_bucketed_join_no_shuffle(spark, landsat_scenes, plugin_results_df, tmp_path):
    """scene ⋈ plugin_results on the bucket key runs with zero exchanges."""
    from eodatadown_spark.catalog import ParquetCatalog

    cat = ParquetCatalog(spark, str(tmp_path))
    cat.write_bucketed(landsat_scenes, "scenes_b", "pid", n_buckets=4)
    cat.write_bucketed(
        plugin_results_df.withColumnRenamed("scene_pid", "pid"), "plugins_b", "pid", 4
    )
    # force the non-broadcast path: at real scale neither side broadcasts —
    # bucketing is what removes the shuffle there
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = cat.read_bucketed("scenes_b").join(
            cat.read_bucketed("plugins_b").withColumnRenamed("extended_info", "plg_info"),
            "pid",
        )
        plan = audit.physical_plan(joined, "simple")
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in audit.physical_plan(joined)
        assert audit.exchange_count(joined) == 0
        assert joined.count() == 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

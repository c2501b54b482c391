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


def _mk_index(spark, rows):
    import datetime as dt

    return spark.createDataFrame(
        [
            {
                "scene_id": sid,
                "product_id": f"LC08_L1TP_001001_{acq.replace('-', '')}_20190601_01_T1",
                "spacecraft_id": "LANDSAT_8", "sensor_id": "OLI_TIRS",
                "date_acquired": dt.date.fromisoformat(acq),
                "sensing_time": dt.datetime.fromisoformat(acq + "T10:00:00"),
                "collection_number": "01", "collection_category": "T1",
                "data_type": "L1TP", "wrs_path": 1, "wrs_row": 1,
                "cloud_cover": 10.0, "north_lat": 52.0, "south_lat": 50.0,
                "east_lon": 2.0, "west_lon": 0.0, "total_size": 1000,
                "remote_url": f"gs://b/{sid}",
            }
            for sid, acq in rows
        ]
    )


def test_monthly_bucketed_state_machine_cycle(spark, tmp_path):
    """VERDICT r2 item 5: a monthly-partitioned, bucketed catalog drives the
    full state-machine cycle — ingest → month-layout on disk → stage merge
    rewriting ONLY the touched month (untouched month hard-linked, same
    inode) → bucketed J2 scheduling join with zero non-sort exchanges."""
    import os

    from eodatadown_spark import schemas
    from eodatadown_spark.catalog import ParquetCatalog
    from eodatadown_spark.sensor import LandsatGoogSensor

    cat = ParquetCatalog(spark, str(tmp_path), partition_monthly=True)
    sensor = LandsatGoogSensor(cat)
    sensor.init_sensor_db()
    assert sensor.check_new_scns(
        _mk_index(spark, [("A", "2019-01-05"), ("B", "2019-01-20"),
                          ("C", "2019-02-10"), ("D", "2019-02-25")])
    ) == 4

    # month-level physical layout
    root = cat.data_path("landsat_scenes")
    leaves = {
        os.path.relpath(d, root).replace(os.sep, "/")
        for d, _sub, files in os.walk(root)
        if any(f.endswith(".parquet") for f in files)
    }
    assert leaves == {"p_year=2019/p_month=1", "p_year=2019/p_month=2"}

    def month_inodes(month):
        mdir = os.path.join(cat.data_path("landsat_scenes"), "p_year=2019", f"p_month={month}")
        return {f: os.stat(os.path.join(mdir, f)).st_ino
                for f in os.listdir(mdir) if f.endswith(".parquet")}

    feb_before = month_inodes(2)
    # download stage for January only (pids 0,1) → selective monthly merge
    jan_todo = sensor.get_scnlist_download().where(F.col("pid") < 2)
    assert sensor.run_stage(
        jan_todo,
        lambda s: {"pid": s["pid"], "downloaded": True, "ardproduct": True},
        "pid long, downloaded boolean, ardproduct boolean",
    ) == 2
    # February leaves are hard links into the new version: same inodes
    assert month_inodes(2) == feb_before
    assert sensor.get_scnlist_download().count() == 2  # C, D still pending

    # plugin_results: PlgA completed for pid 0 only
    plg = spark.createDataFrame(
        [{"scene_pid": 0, "plugin_name": "PlgA", "completed": True,
          "success": True, "outputs": False, "start_time": None,
          "end_time": None, "extended_info": None}],
        schema=schemas.PLUGIN_RESULTS,
    )
    cat.write(plg, "plugin_results", partition=False)

    # bucketed publication → J2 scheduling join, shuffle-free
    sensor.publish_bucketed(n_buckets=4)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        todo = sensor.get_scnlist_usr_analysis_bucketed(["PlgA"])
        plan = audit.physical_plan(todo)
        assert "SortMergeJoin" in audit.physical_plan(todo, "simple")
        assert plan.count("Bucketed: true") == 2  # both scans served bucketed
        # the ONLY exchange is the final presentation sort
        assert audit.exchange_count(todo) == 1
        # parity with the anti-join form (only ard+valid scene 1 lacks PlgA;
        # 0 has it completed; 2,3 not ARD yet)
        assert [r["pid"] for r in todo.collect()] == [1]
        from eodatadown_spark import queries as Q

        base = Q.get_scnlist_usr_analysis(
            sensor.scenes(), cat.read_clean("plugin_results"), ["PlgA"]
        )
        assert [r["pid"] for r in base.collect()] == [1]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_usr_analysis_agg_form_matches_anti_join(spark, landsat_scenes, plugin_results_df):
    """The pid-keyed aggregation form of J2 is row-identical to the
    composite-key anti-join form on multi-plugin configurations."""
    from eodatadown_spark import queries as Q

    for plugins in (["PlgA"], ["PlgA", "PlgB"], ["PlgA", "PlgB", "PlgC"]):
        a = [r["pid"] for r in
             Q.get_scnlist_usr_analysis(landsat_scenes, plugin_results_df, plugins).collect()]
        b = [r["pid"] for r in
             Q.get_scnlist_usr_analysis_agg(landsat_scenes, plugin_results_df, plugins).collect()]
        assert a == b, plugins

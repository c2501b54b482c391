"""Reports: single-pass counts, exact quantile stats, obs-date rollup, O3
exclusive bounds."""

from __future__ import annotations

import datetime as dt
import statistics

from eodatadown_spark import reports as R


def test_summary_counts_single_pass(landsat_scenes):
    r = R.sensor_summary_counts(landsat_scenes).first()
    assert r["n_scenes"] == 7 and r["n_valid"] == 6 and r["n_invalid"] == 1
    assert r["n_downloaded"] == 4 and r["n_ard"] == 3 and r["n_dcloaded"] == 1


def test_column_stats_match_python_statistics(landsat_scenes):
    sizes = [1000 + p for p in range(7)]
    r = R.column_stats(landsat_scenes, "total_size").first()
    assert r["n"] == 7
    assert r["total"] == sum(sizes)
    assert abs(r["mean"] - statistics.mean(sizes)) < 1e-6
    assert abs(r["stdev"] - statistics.stdev(sizes)) < 1e-4
    assert r["median"] == statistics.median(sizes)


def test_column_stats_approx_close_to_exact(spark):
    # the 100×-scale reporting path: sketch quartiles within tolerance of the
    # exact sort-based ones (identical here — accuracy 10k on 10k rows)
    from pyspark.sql import functions as F

    df = spark.range(10_000).select((F.col("id") % 997).cast("double").alias("v"))
    exact = R.column_stats(df, "v").first()
    approx = R.column_stats(df, "v", approx=True).first()
    for q in ("q1", "median", "q3"):
        assert abs(exact[q] - approx[q]) <= 1.0
    assert exact["total"] == approx["total"] and exact["n"] == approx["n"]


def test_download_duration_stats(landsat_scenes):
    r = R.download_duration_stats(landsat_scenes).first()
    assert r["n"] == 4 and r["mean"] == 3600.0  # all fixture downloads take 1h


def test_plugin_tallies(plugin_results_df):
    rows = {r["plugin_name"]: r for r in R.plugin_status_tallies(plugin_results_df).collect()}
    assert rows["PlgA"]["n_runs"] == 2
    assert rows["PlgA"]["n_completed"] == 1
    assert rows["PlgA"]["n_success"] == 1


def test_obs_date_rollup_and_bridge(landsat_scenes):
    obs, bridge = R.build_obs_date_records(landsat_scenes, "LandsatGOOG")
    # valid scenes dates: 01-05(x2 same date), 02-10, 03-15, 04-20, 06-30 → 5 dates
    assert obs.count() == 5
    assert bridge.count() == 6  # 6 valid scenes
    jan5 = bridge.where(bridge.obs_date == dt.date(2019, 1, 5))
    assert sorted(r["scene_pid"] for r in jan5.collect()) == [0, 5]


def test_get_obs_scns_exclusive_bounds(landsat_scenes):
    obs, _ = R.build_obs_date_records(landsat_scenes, "LandsatGOOG")
    out = R.get_obs_scns(obs, start_date="2019-03-15", end_date="2019-01-05")
    # EXCLUSIVE: drops both boundary dates (ref eodatadownsensor.py:720-721)
    assert [str(r["obs_date"]) for r in out.collect()] == ["2019-02-10"]


def test_scene_command_lines(landsat_scenes):
    out = R.scene_command_lines(landsat_scenes, "eoddrun.py --sensor LS --pid {pid}")
    cmds = {r["cmd"] for r in out.collect()}
    assert "eoddrun.py --sensor LS --pid 3" in cmds and len(cmds) == 7


def test_obs_date_command_lines(spark, landsat_scenes):
    obs, _ = R.build_obs_date_records(landsat_scenes, "LandsatGOOG")
    out = [r["cmd"] for r in R.obs_date_command_lines(
        obs, "eoddrun --sensor {sensor} --platform {platform} --date {date}"
    ).collect()]
    assert len(out) == 5  # all fresh rollup rows need update
    assert out[0] == "eoddrun --sensor LandsatGOOG --platform LANDSAT_8 --date 2019-01-05"


def test_distinct_sketch_rollup_and_merge(spark):
    """Batch-wise sketches merged by key estimate the same distinct count
    as one whole-data sketch, and land within the HLL error bound of the
    exact count — the incremental-reporting contract."""
    from pyspark.sql import functions as F

    from eodatadown_spark.reports import distinct_sketch_rollup, merge_distinct_sketches

    df = spark.range(20_000).select(
        (F.col("id") % 3).alias("k"), (F.col("id") % 4211).alias("v")
    )
    whole = {r["k"]: r["estimate"]
             for r in distinct_sketch_rollup(df, "k", "v").collect()}
    # two "daily batches" sketched independently, then merged
    b1 = distinct_sketch_rollup(df.where(F.col("id") < 9_000), "k", "v")
    b2 = distinct_sketch_rollup(df.where(F.col("id") >= 9_000), "k", "v")
    merged = {r["k"]: r["estimate"]
              for r in merge_distinct_sketches(b1.unionByName(b2), "k").collect()}
    assert merged == whole  # sketch union == sketch of the union
    exact = {r["k"]: r["n"]
             for r in df.groupBy("k").agg(F.count_distinct("v").alias("n")).collect()}
    for k, est in merged.items():
        assert abs(est - exact[k]) / exact[k] < 0.05


def test_profile_columns_one_pass(spark):
    from pyspark.sql import Row
    from eodatadown_spark.reports import profile_columns

    df = spark.createDataFrame(
        [Row(a=1, b="x"), Row(a=2, b=None), Row(a=2, b="y")],
        "a bigint, b string",
    )
    got = {r["column"]: r for r in profile_columns(df, ["a", "b"]).collect()}
    assert got["a"]["n_rows"] == 3 and got["a"]["n_nulls"] == 0
    assert got["a"]["n_distinct"] == 2
    assert got["a"]["min_num"] == 1.0 and got["a"]["max_num"] == 2.0
    assert got["a"]["min_str"] is None
    assert got["b"]["n_nulls"] == 1 and got["b"]["n_distinct"] == 2
    assert got["b"]["min_str"] == "x" and got["b"]["max_str"] == "y"
    assert got["b"]["min_num"] is None

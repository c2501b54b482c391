"""State machine: U1 union, batched M2/M3 updates, task fan-out P2."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from eodatadown_spark import pipeline as P


def test_scenes_need_processing_union(landsat_scenes, plugin_results_df):
    out = P.scenes_need_processing(
        landsat_scenes, plugin_results_df, plugins=["PlgA", "PlgB"]
    )
    # plugins: {0,1,6}; quicklook: {1}; tilecache: {1,6}; con2ard: {2};
    # download: {3,5}  → union
    assert sorted(r["pid"] for r in out.collect()) == [0, 1, 2, 3, 5, 6]


def test_scenes_need_processing_guards(landsat_scenes, plugin_results_df):
    out = P.scenes_need_processing(
        landsat_scenes, None, plugins=(), calc_quicklook=False, calc_tilecache=False
    )
    assert sorted(r["pid"] for r in out.collect()) == [2, 3, 5]


def test_apply_updates_batched(spark, landsat_scenes):
    updates = spark.createDataFrame(
        [(3, True, "/data/dl/3")], "pid long, downloaded boolean, download_path string"
    )
    out = P.apply_updates(landsat_scenes, updates)
    row = out.where(F.col("pid") == 3).first()
    assert row["downloaded"] is True and row["download_path"] == "/data/dl/3"
    # untouched rows unchanged
    assert out.where(F.col("pid") == 5).first()["downloaded"] is False
    assert out.count() == landsat_scenes.count()


def test_merge_extended_info(spark, landsat_scenes):
    patch = spark.createDataFrame(
        [(6, json.dumps({"tilecache": "/tc/6"}))],
        "pid long, extended_info_patch string",
    )
    out = P.merge_extended_info(landsat_scenes, patch)
    info = json.loads(out.where(F.col("pid") == 6).first()["extended_info"])
    assert info == {"quicklook": "ok", "tilecache": "/tc/6"}  # merge, not replace
    # null-extended_info row with no patch stays null
    assert out.where(F.col("pid") == 2).first()["extended_info"] is None


def test_delete_and_path_rewrite(landsat_scenes):
    out = P.delete_where(landsat_scenes, F.col("invalid") == True)  # noqa: E712
    assert out.count() == 6
    moved = P.rewrite_path_prefix(landsat_scenes, "download_path", "/data/dl", "/mnt/dl")
    assert moved.where(F.col("pid") == 0).first()["download_path"] == "/mnt/dl/0"


def test_reset_download_state(landsat_scenes):
    out = P.reset_download_state(landsat_scenes, pids=[0])
    r = out.where(F.col("pid") == 0).first()
    assert r["downloaded"] is False and r["ardproduct"] is False
    assert r["download_start_date"] is None
    # other rows untouched
    assert out.where(F.col("pid") == 1).first()["downloaded"] is True


def test_run_scene_tasks_fanout(landsat_scenes):
    from eodatadown_spark import queries as Q

    todo = landsat_scenes.join(
        Q.get_scnlist_download(landsat_scenes), "pid", "left_semi"
    ).select("pid", "remote_url")

    def fake_download(scene: dict) -> dict:
        return {"pid": scene["pid"], "downloaded": True,
                "download_path": f"/data/dl/{scene['pid']}"}

    updates = P.run_scene_tasks(
        todo, fake_download, "pid long, downloaded boolean, download_path string"
    )
    rows = {r["pid"]: r for r in updates.collect()}
    assert set(rows) == {3, 5} and all(r["downloaded"] for r in rows.values())
    merged = P.apply_updates(landsat_scenes, updates)
    assert merged.where(F.col("downloaded") == True).count() == 6  # noqa: E712


def test_merge_date_ordered_last_wins(spark):
    import datetime as dt

    a = spark.createDataFrame(
        [(1, dt.datetime(2020, 1, 1)), (2, dt.datetime(2020, 1, 2))],
        "pid long, obs_ts timestamp",
    )
    b = spark.createDataFrame(
        [(10, dt.datetime(2020, 1, 1))], "pid long, obs_ts timestamp"
    )
    out = P.merge_date_ordered({"landsat": a, "sentinel2": b}).collect()
    # identical timestamp 2020-01-01 collides: later sensor (sentinel2) wins
    assert [(r["pid"], r["sensor"]) for r in out] == [(10, "sentinel2"), (2, "landsat")]

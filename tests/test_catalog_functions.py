"""Catalog round-trip/versioning, geo + timeparse scalar functions,
streaming-shaped operators, plugins, multimodal plumbing."""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F


def test_catalog_write_read_version_flip(spark, landsat_scenes, tmp_path):
    from eodatadown_spark.catalog import ParquetCatalog

    cat = ParquetCatalog(spark, str(tmp_path))
    cat.write(landsat_scenes, "landsat_scenes")
    assert cat.read_clean("landsat_scenes").count() == 7
    held = cat.read_clean("landsat_scenes")  # lazy reader across one write
    # overwrite with a filtered version → pointer flips; previous version is
    # RETAINED (retain_versions=2) so the held reader stays valid
    cat.write(landsat_scenes.where(F.col("invalid") == False), "landsat_scenes")  # noqa: E712
    assert cat.read_clean("landsat_scenes").count() == 6
    assert held.count() == 7  # still points at the retained v_0
    versions = sorted(d for d in os.listdir(tmp_path / "landsat_scenes") if d.startswith("v_"))
    assert versions == ["v_0", "v_1"]
    # a third write GCs v_0 (beyond the retention window)
    cat.write(landsat_scenes.where(F.col("pid") < 3), "landsat_scenes")
    versions = sorted(d for d in os.listdir(tmp_path / "landsat_scenes") if d.startswith("v_"))
    assert versions == ["v_1", "v_2"]


def test_catalog_partitioned_by_year(spark, landsat_scenes, tmp_path):
    from eodatadown_spark.catalog import ParquetCatalog

    cat = ParquetCatalog(spark, str(tmp_path))
    cat.write(landsat_scenes, "landsat_scenes")
    data_dir = cat.data_path("landsat_scenes")
    assert any(d.startswith("p_year=") for d in os.listdir(data_dir))


def test_catalog_json_export_import_roundtrip(spark, landsat_scenes, tmp_path):
    from eodatadown_spark.catalog import ParquetCatalog

    cat = ParquetCatalog(spark, str(tmp_path))
    cat.write(landsat_scenes, "landsat_scenes")
    out = str(tmp_path / "export.json")
    cat.export_json("landsat_scenes", out)
    cat.import_json("landsat_scenes", out, replace_path_dict={"/data/dl": "/new/dl"})
    df = cat.read_clean("landsat_scenes")
    assert df.count() == 7
    assert df.where(F.col("pid") == 0).first()["download_path"] == "/new/dl/0"
    # types survive the round trip
    assert dict(df.dtypes)["date_acquired"] == "date"
    assert dict(df.dtypes)["sensing_time"] == "timestamp"


def test_merge_updates_rewrites_only_changed_partitions(spark, landsat_scenes, tmp_path):
    """M2 partition-selective merge: updating 2019 pids must leave the 2020
    partition's parquet files untouched (same inodes — hard-linked, not
    rewritten) while the 2019 partition is rewritten with merged values."""
    import datetime as dt

    from eodatadown_spark.catalog import ParquetCatalog

    two_year = landsat_scenes.withColumn(
        "date_acquired",
        F.when(F.col("pid") >= 4, F.lit(dt.date(2020, 3, 1))).otherwise(
            F.col("date_acquired")
        ),
    )
    cat = ParquetCatalog(spark, str(tmp_path))
    cat.write(two_year, "landsat_scenes")
    v0_2020 = os.path.join(cat.data_path("landsat_scenes"), "p_year=2020")
    inodes_before = {f: os.stat(os.path.join(v0_2020, f)).st_ino for f in os.listdir(v0_2020)}

    updates = spark.createDataFrame(
        [(0, True, "/dl/0"), (2, True, "/dl/2")],
        "pid long, downloaded boolean, download_path string",
    )
    cat.merge_updates("landsat_scenes", updates)

    v1 = cat.data_path("landsat_scenes")
    assert v1.endswith("v_1")
    v1_2020 = os.path.join(v1, "p_year=2020")
    inodes_after = {f: os.stat(os.path.join(v1_2020, f)).st_ino for f in os.listdir(v1_2020)}
    assert inodes_after == inodes_before  # untouched partition: same inodes

    df = cat.read_clean("landsat_scenes")
    assert df.count() == 7  # no rows gained/lost
    got = {r["pid"]: r for r in df.where(F.col("pid").isin(0, 1, 2)).collect()}
    assert got[0]["downloaded"] and got[0]["download_path"] == "/dl/0"
    assert got[2]["downloaded"] and got[2]["download_path"] == "/dl/2"
    assert got[1]["download_path"] != "/dl/0"  # untouched row unchanged

    # partition-source updates must be rejected (they'd move rows across dirs)
    import pytest

    with pytest.raises(ValueError, match="partition source"):
        cat.merge_updates(
            "landsat_scenes",
            spark.createDataFrame([(0, dt.date(2021, 1, 1))], "pid long, date_acquired date"),
        )


def test_monthly_partitioning_and_month_selective_merge(spark, landsat_scenes, tmp_path):
    """partition_monthly: p_year/p_month layout, month-granular pruning and
    month-granular selective merges (untouched month dirs keep their inodes)."""
    from eodatadown_spark.catalog import ParquetCatalog

    cat = ParquetCatalog(spark, str(tmp_path), partition_monthly=True)
    cat.write(landsat_scenes, "landsat_scenes")
    root = cat.data_path("landsat_scenes")
    # fixture dates are all 2019 across months 1,2,3,4,6
    months = sorted(os.listdir(os.path.join(root, "p_year=2019")))
    assert len(months) >= 3 and all(m.startswith("p_month=") for m in months)

    # pid 0 is 2019-01; update it and prove an untouched month keeps inodes
    other_month = os.path.join(root, "p_year=2019", "p_month=6")
    inodes_before = {f: os.stat(os.path.join(other_month, f)).st_ino
                     for f in os.listdir(other_month)}
    cat.merge_updates(
        "landsat_scenes",
        spark.createDataFrame([(0, True)], "pid long, downloaded boolean"),
    )
    v1 = cat.data_path("landsat_scenes")
    after_month = os.path.join(v1, "p_year=2019", "p_month=6")
    inodes_after = {f: os.stat(os.path.join(after_month, f)).st_ino
                    for f in os.listdir(after_month)}
    assert inodes_after == inodes_before
    df = cat.read_clean("landsat_scenes")
    assert df.count() == 7
    assert df.where(F.col("pid") == 0).first()["downloaded"] is True
    assert "p_month" not in df.columns  # read_clean strips both levels


def test_catalog_compact_reduces_files(spark, landsat_scenes, tmp_path):
    from eodatadown_spark.catalog import ParquetCatalog

    cat = ParquetCatalog(spark, str(tmp_path))
    # 8 shuffle partitions → up to 8 small part files inside the year dir
    # (cluster_partitions=False reproduces the pre-r13 fragmented layout a
    # catalog accumulates from selective merge appends — a normal write()
    # now REBALANCEs on the partition dirs and wouldn't fragment)
    cat.write(
        landsat_scenes.repartition(8), "landsat_scenes",
        cluster_partitions=False,
    )

    def parquet_files(path):
        return [
            os.path.join(dp, f)
            for dp, _, fs in os.walk(path)
            for f in fs
            if f.endswith(".parquet")
        ]

    before = len(parquet_files(cat.data_path("landsat_scenes")))
    assert before > 1
    cat.compact("landsat_scenes")
    after = len(parquet_files(cat.data_path("landsat_scenes")))
    assert after < before
    df = cat.read_clean("landsat_scenes")
    assert df.count() == 7  # contents survive the rewrite


def test_catalog_write_clusters_partition_dirs(spark, landsat_scenes, tmp_path):
    """A plain write() clusters rows by the partition dirs (REBALANCE):
    a many-task input frame must NOT fan out into files ~= tasks x years
    (r13, guide §6 small-files)."""
    from eodatadown_spark.catalog import ParquetCatalog

    cat = ParquetCatalog(spark, str(tmp_path))
    cat.write(landsat_scenes.repartition(8), "landsat_scenes")
    files = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(cat.data_path("landsat_scenes"))
        for f in fs
        if f.endswith(".parquet")
    ]
    years = {p.split("p_year=")[1].split("/")[0] for p in files if "p_year=" in p}
    # one advisory-sized file per year dir at this tiny volume
    assert len(files) == len(years)
    assert cat.read_clean("landsat_scenes").count() == 7


def test_merge_follows_on_disk_partition_depth(spark, landsat_scenes, tmp_path):
    """Regression: a monthly-partitioned catalog opened by a process with the
    default (yearly) flag must still merge at month depth — a flag-based
    depth hard-links changed-year months as 'untouched' and appends a
    conflicting yearly layout, leaving the table unreadable."""
    from eodatadown_spark.catalog import ParquetCatalog

    ParquetCatalog(spark, str(tmp_path), partition_monthly=True).write(
        landsat_scenes, "landsat_scenes"
    )
    cat = ParquetCatalog(spark, str(tmp_path))  # default yearly flag
    cat.merge_updates(
        "landsat_scenes",
        spark.createDataFrame([(0, True)], "pid long, downloaded boolean"),
    )
    df = cat.read_clean("landsat_scenes")  # must stay readable
    assert df.count() == 7
    assert df.where(F.col("pid") == 0).first()["downloaded"] is True
    # layout still two-level in the new version
    v1 = cat.data_path("landsat_scenes")
    assert any(
        d.startswith("p_month=")
        for d in os.listdir(os.path.join(v1, "p_year=2019"))
    )


def test_catalog_json_export_large_table_distributed(spark, landsat_scenes, tmp_path, monkeypatch):
    """Above max_driver_rows the export must stream via df.write.json (gzip
    JSONL parts), never a driver collect — and import must round-trip it."""
    from pyspark.sql import DataFrame

    from eodatadown_spark.catalog import ParquetCatalog

    cat = ParquetCatalog(spark, str(tmp_path))
    cat.write(landsat_scenes, "landsat_scenes")
    out = str(tmp_path / "export_big")
    monkeypatch.setattr(
        DataFrame, "collect", lambda self: (_ for _ in ()).throw(
            AssertionError("driver collect on large-table export path")
        )
    )
    cat.export_json("landsat_scenes", out, max_driver_rows=3)  # 7 rows > 3
    monkeypatch.undo()
    assert os.path.isdir(out)
    assert any(f.endswith(".json.gz") for f in os.listdir(out))
    cat.import_json("landsat_scenes", out)
    df = cat.read_clean("landsat_scenes")
    assert df.count() == 7
    assert dict(df.dtypes)["date_acquired"] == "date"


def test_wkt_bbox_parse(spark):
    from eodatadown_spark.functions.geo import wkt_polygon_bbox

    df = spark.createDataFrame(
        [("POLYGON((-5.5 45, 0.5 45, 0.5 50.5, -5.5 50.5, -5.5 45))",)], "wkt string"
    ).select(wkt_polygon_bbox("wkt").alias("b"))
    r = df.first()["b"]
    assert (r["west_lon"], r["east_lon"], r["south_lat"], r["north_lat"]) == (
        -5.5, 0.5, 45.0, 50.5,
    )


def test_geojson_bbox_parse(spark):
    from eodatadown_spark.functions.geo import geojson_polygon_bbox

    gj = json.dumps(
        {"type": "Polygon",
         "coordinates": [[[-1.0, 50.0], [2.0, 50.0], [2.0, 52.5], [-1.0, 52.5], [-1.0, 50.0]]]}
    )
    r = spark.createDataFrame([(gj,)], "g string").select(
        geojson_polygon_bbox("g").alias("b")
    ).first()["b"]
    assert (r["west_lon"], r["east_lon"], r["south_lat"], r["north_lat"]) == (
        -1.0, 2.0, 50.0, 52.5,
    )


def test_antimeridian_split(spark):
    from eodatadown_spark.functions.geo import split_antimeridian_bboxes

    df = spark.createDataFrame(
        [(170.0, -170.0, -10.0, 10.0), (0.0, 10.0, 0.0, 10.0)],
        "w double, e double, s double, n double",
    ).select(
        split_antimeridian_bboxes(F.col("w"), F.col("e"), F.col("s"), F.col("n")).alias("boxes")
    )
    rows = df.collect()
    # wrap case (e < w → span>90 after normalization fails... here e-w = -340 <90
    # so the wide test uses w=170,e=-170: e-w<0; NOT split per reference logic
    assert len(rows[1]["boxes"]) == 1


def test_is_utm_epsg(spark):
    from eodatadown_spark.functions.geo import is_utm_epsg

    df = spark.createDataFrame([(32630,), (32760,), (4326,), (32600,)], "epsg int")
    got = [r[0] for r in df.select(is_utm_epsg("epsg")).collect()]
    assert got == [True, True, False, False]


def test_multi_format_timestamp_parse(spark):
    from eodatadown_spark.functions.timeparse import parse_timestamp_multi

    df = spark.createDataFrame(
        [("2020-01-02T03:04:05.123456Z",), ("2020-01-02T03:04:05",),
         ("2020-01-02 03:04:05",), ("2020-01-02",), ("garbage",)],
        "s string",
    ).select(parse_timestamp_multi("s").alias("ts"))
    got = [r["ts"] for r in df.collect()]
    assert got[0] == dt.datetime(2020, 1, 2, 3, 4, 5, 123456)
    assert got[1] == got[2] == dt.datetime(2020, 1, 2, 3, 4, 5)
    assert got[3] == dt.datetime(2020, 1, 2)
    assert got[4] is None


def test_parse_yyyyddd(spark):
    from eodatadown_spark.functions.timeparse import parse_yyyyddd

    df = spark.createDataFrame([("2019032120000",)], "s string").select(
        parse_yyyyddd("s").alias("d")
    )
    assert df.first()["d"] == dt.date(2019, 2, 1)  # day 032 of 2019


def test_session_blocks(spark):
    from eodatadown_spark import schemas
    from eodatadown_spark.streaming.incremental import session_blocks

    rows = []
    t0 = dt.datetime(2020, 1, 1)
    for i, (start, end) in enumerate([(True, False), (False, False), (False, True),
                                      (True, False), (False, True)]):
        rows.append({"id": i, "sensor": "LS", "update": t0 + dt.timedelta(minutes=i),
                     "description": "x", "updated_lcl_db": False, "found_new_scns": False,
                     "new_scns_avail": False, "downloaded_new_scns": False,
                     "convert_new_scns_ard": False, "ingest_new_scns_to_dc": False,
                     "start_block": start, "end_block": end})
    df = spark.createDataFrame(rows, schema=schemas.USAGE_LOG)
    out = session_blocks(df).orderBy("id").collect()
    assert [r["session_id"] for r in out] == [1, 1, 1, 2, 2]


def test_windowed_event_counts_batch(spark):
    from eodatadown_spark.streaming.incremental import windowed_event_counts

    rows = [
        (dt.datetime(2024, 1, 1, 0, 10), "click", 1.0),
        (dt.datetime(2024, 1, 1, 0, 50), "click", 2.0),
        (dt.datetime(2024, 1, 1, 1, 10), "view", 3.0),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    out = {(r["win"]["start"].hour, r["event_type"]): r["n"]
           for r in windowed_event_counts(df).collect()}
    assert out == {(0, "click"): 2, (1, "view"): 1}


def test_stream_ingest_dedup(spark, tmp_path):
    """Structured Streaming path: file source → watermark → keyed dedup →
    memory sink, driven synchronously."""
    from eodatadown_spark.streaming.incremental import stream_ingest

    src = str(tmp_path / "stream_src")
    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0), "a"),
        (1, dt.datetime(2024, 1, 1, 0, 0), "a-dup"),
        (2, dt.datetime(2024, 1, 1, 0, 5), "b"),
    ]
    spark.createDataFrame(rows, "key long, ts timestamp, payload string").write.parquet(src)
    stream = stream_ingest(
        spark, src, "key long, ts timestamp, payload string", "ts", ["key"]
    )
    q = (stream.writeStream.format("memory").queryName("ingested")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT key FROM ingested ORDER BY key").collect()
        assert [r["key"] for r in got] == [1, 2]
    finally:
        q.stop()


def test_stream_dedup_fingerprint(spark, tmp_path):
    """Streaming content-dedup: same text re-arriving (even with a different
    doc_id) is dropped; distinct content passes."""
    from eodatadown_spark.streaming.incremental import stream_dedup_fingerprint

    src = str(tmp_path / "doc_stream")
    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0), "Hello, World!"),
        (2, dt.datetime(2024, 1, 1, 0, 1), "hello world"),   # same fp as 1 (normalized)
        (3, dt.datetime(2024, 1, 1, 0, 2), "something else"),
    ]
    spark.createDataFrame(rows, "doc_id long, ts timestamp, text string").write.parquet(src)
    stream = stream_dedup_fingerprint(
        spark, src, "doc_id long, ts timestamp, text string", "ts"
    )
    q = (stream.writeStream.format("memory").queryName("docs_deduped")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        got = sorted(r["doc_id"] for r in spark.sql("SELECT doc_id FROM docs_deduped").collect())
        assert len(got) == 2 and 3 in got and (1 in got or 2 in got)
    finally:
        q.stop()


def test_run_plugins_success_and_error(spark, landsat_scenes, plugin_results_df):
    from eodatadown_spark.plugins import run_plugins

    def ok_plugin(scene):
        return True, {"n": scene["pid"]}, False

    def boom_plugin(scene):
        raise ValueError("boom")

    out = run_plugins(
        landsat_scenes, plugin_results_df, {"PlgA": ok_plugin, "PlgBoom": boom_plugin}
    ).collect()
    by_key = {(r["scene_pid"], r["plugin_name"]): r for r in out}
    # pid0 PlgA already completed → only PlgBoom runs for pid0
    assert (0, "PlgA") not in by_key and (0, "PlgBoom") in by_key
    err = by_key[(0, "PlgBoom")]
    assert err["completed"] and err["error"] and not err["success"]
    assert "boom" in json.loads(err["extended_info"])["error"]
    okr = by_key[(1, "PlgA")]
    assert okr["success"] and json.loads(okr["extended_info"]) == {"n": 1}


def test_multimodal_resize_and_audio_windows(spark):
    from eodatadown_spark.operators.multimodal import MEDIA_SCHEMA, audio_windows, resize_media

    rows = [
        {"media_id": 1, "kind": "image", "payload": b"\x01\x02\x03",
         "meta": {"width": 3, "height": 1, "sample_rate": None, "n_frames": None, "format": "fake"}},
        {"media_id": 2, "kind": "audio", "payload": b"\x00" * 64000,
         "meta": {"width": None, "height": None, "sample_rate": 16000, "n_frames": None, "format": "pcm16"}},
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)

    resized = {r["media_id"]: r for r in resize_media(media, 4, 2).collect()}
    img = resized[1]
    assert len(img["payload"]) == 8  # width*height bytes
    assert img["meta"]["width"] == 4 and img["meta"]["height"] == 2
    assert bytes(img["payload"])[:3] == b"\x01\x02\x03"  # stub cycles source bytes
    aud = resized[2]
    assert len(aud["payload"]) == 64000  # non-image rows pass through

    # 64000 bytes @ 2 B/sample = 32000 samples; 1 s windows @16 kHz → 2 windows
    wins = audio_windows(media, window_ms=1000).collect()
    assert [r["win_idx"] for r in sorted(wins, key=lambda r: r["win_idx"])] == [0, 1]
    assert all(r["win_samples"] == 16000 and r["media_id"] == 2 for r in wins)


def test_multimodal_feature_extraction(spark):
    from eodatadown_spark.operators.multimodal import MEDIA_SCHEMA, extract_features, sample_frames

    rows = [
        {"media_id": 1, "kind": "image", "payload": b"\x10\x20\x30",
         "meta": {"width": 2, "height": 2, "sample_rate": None, "n_frames": None, "format": "fake"}},
        {"media_id": 2, "kind": "video", "payload": b"\xff" * 10,
         "meta": {"width": 4, "height": 4, "sample_rate": None, "n_frames": 25, "format": "fake"}},
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in extract_features(media).collect()}
    assert feats[1]["payload_bytes"] == 3 and len(feats[1]["feature"]) == 8
    assert abs(feats[1]["feature"][0] - 0x10 / 255.0) < 1e-6
    frames = [r["frame_idx"] for r in sample_frames(media, every_n=10).collect()]
    assert frames == [0, 10, 20]


def test_audio_windows_skip_empty_and_null(spark):
    from eodatadown_spark.operators.multimodal import MEDIA_SCHEMA, audio_windows

    rows = [
        {"media_id": 1, "kind": "audio", "payload": b"",
         "meta": {"width": None, "height": None, "sample_rate": 16000, "n_frames": None, "format": "pcm16"}},
        {"media_id": 2, "kind": "audio", "payload": None,
         "meta": {"width": None, "height": None, "sample_rate": 16000, "n_frames": None, "format": "pcm16"}},
        {"media_id": 3, "kind": "audio", "payload": b"\x00" * 32000,
         "meta": {"width": None, "height": None, "sample_rate": None, "n_frames": None, "format": "pcm16"}},
        {"media_id": 4, "kind": "audio", "payload": b"\x00" * 32000,
         "meta": {"width": None, "height": None, "sample_rate": 16000, "n_frames": None, "format": "pcm16"}},
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    got = audio_windows(media, window_ms=1000).collect()
    # only media 4 has decodable windows; empty/NULL payload and NULL
    # sample_rate yield zero rows, never a phantom window
    assert {r["media_id"] for r in got} == {4}
    assert [r["win_idx"] for r in got] == [0]


def test_merge_updates_crash_retry_and_p_year_guard(spark, landsat_scenes, tmp_path):
    import pytest

    from eodatadown_spark.catalog import ParquetCatalog

    cat = ParquetCatalog(spark, str(tmp_path))
    cat.write(landsat_scenes, "landsat_scenes")
    # simulate an interrupted merge: half-built next version dir with a
    # hard link already present
    v0 = cat.data_path("landsat_scenes")
    part = next(d for d in os.listdir(v0) if d.startswith("p_year="))
    stale = os.path.join(str(tmp_path), "landsat_scenes", "v_1", part)
    os.makedirs(stale)
    src_file = next(f for f in os.listdir(os.path.join(v0, part)))
    os.link(os.path.join(v0, part, src_file), os.path.join(stale, src_file))

    updates = spark.createDataFrame([(0, True)], "pid long, downloaded boolean")
    cat.merge_updates("landsat_scenes", updates)  # must not FileExistsError
    df = cat.read_clean("landsat_scenes")
    assert df.count() == 7  # no duplicated rows from the stale partial dir
    assert df.where(F.col("pid") == 0).first()["downloaded"] is True

    with pytest.raises(ValueError, match="partition columns"):
        cat.merge_updates(
            "landsat_scenes",
            spark.createDataFrame([(0, 2030)], "pid long, p_year int"),
        )


def test_time_travel_versions(spark, landsat_scenes, tmp_path):
    """read_version reads retained history (VERSION AS OF analog); GC'd
    versions raise with the retained list; selective-merge history shares
    inodes with the current version."""
    from eodatadown_spark.catalog import ParquetCatalog

    cat = ParquetCatalog(spark, str(tmp_path), retain_versions=2)
    cat.write(landsat_scenes, "landsat_scenes")                    # v0
    updates = spark.createDataFrame([(0, 77.5)], "pid long, cloud_cover double")
    cat.merge_updates("landsat_scenes", updates)                   # v1
    assert cat.list_versions("landsat_scenes") == [0, 1]

    old = cat.read_version("landsat_scenes", 0)
    assert old.where((F.col("pid") == 0) & (F.col("cloud_cover") == 77.5)).count() == 0
    cur = cat.read_clean("landsat_scenes")
    assert cur.where((F.col("pid") == 0) & (F.col("cloud_cover") == 77.5)).count() == 1

    cat.write(cur, "landsat_scenes")                               # v2 -> v0 GC'd
    assert cat.list_versions("landsat_scenes") == [1, 2]
    import pytest

    with pytest.raises(FileNotFoundError, match=r"retained: \[1, 2\]"):
        cat.read_version("landsat_scenes", 0)


def test_time_travel_excludes_partial_version(spark, landsat_scenes, tmp_path):
    """A v_N dir above the current pointer (crashed write) is invisible to
    time travel — never a partial snapshot."""
    import pytest

    from eodatadown_spark.catalog import ParquetCatalog

    cat = ParquetCatalog(spark, str(tmp_path))
    cat.write(landsat_scenes, "landsat_scenes")  # v0 + pointer
    partial = os.path.join(str(tmp_path), "landsat_scenes", "v_1")
    os.makedirs(partial)  # simulated crash: dir exists, pointer not flipped
    assert cat.list_versions("landsat_scenes") == [0]
    with pytest.raises(FileNotFoundError, match="not readable"):
        cat.read_version("landsat_scenes", 1)


def test_catalog_fsck(spark, landsat_scenes, tmp_path):
    """fsck reports pointer validity, orphan dirs from crashed writes, and
    hard-link sharing between retained versions."""
    from eodatadown_spark.catalog import ParquetCatalog

    cat = ParquetCatalog(spark, str(tmp_path))
    # two p_year partitions so the selective merge has an untouched leaf
    extra = landsat_scenes.withColumn(
        "date_acquired", F.add_months(F.col("date_acquired"), 12)
    ).withColumn("pid", F.col("pid") + 100)
    cat.write(landsat_scenes.unionByName(extra), "landsat_scenes")
    cat.merge_updates(
        "landsat_scenes",
        spark.createDataFrame([(0, 55.5)], "pid long, cloud_cover double"),
    )
    os.makedirs(os.path.join(str(tmp_path), "landsat_scenes", "v_9"))  # crash debris
    rep = cat.fsck("landsat_scenes")
    assert rep["pointer"] == "v_1" and rep["pointer_valid"]
    assert rep["versions_on_disk"] == [0, 1, 9]
    assert rep["readable_versions"] == [0, 1]
    assert rep["orphan_versions"] == [9]
    # selective merge hard-linked the untouched year partition
    assert rep["shared_inodes_newest_prev"] >= 1


def test_embed_documents_plumbing(spark):
    """Arrow-batched embedding plumbing: output matches the python kernel
    exactly, schema is the embeddings-table contract, empty/None text safe,
    and partitioning is preserved (no exchange introduced)."""
    from eodatadown_spark.operators.multimodal import _fake_embed, embed_documents
    from eodatadown_spark.plans import audit

    df = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, None)], "doc_id long, text string"
    ).repartition(3)
    out = embed_documents(df, dim=8)
    assert dict(out.dtypes) == {"doc_id": "bigint", "embedding": "array<float>"}
    assert audit.exchange_count(out.where(F.col("doc_id") >= 0)) <= 1  # only the repartition above
    rows = {r["doc_id"]: list(r["embedding"]) for r in out.collect()}
    for did, text in ((1, "hello world"), (2, ""), (3, "")):
        want = _fake_embed(text, 8)
        assert [round(v, 4) for v in rows[did]] == [round(v, 4) for v in want]


def test_gc_ignores_orphan_versions(spark, landsat_scenes, tmp_path):
    """Crash-debris dirs above the pointer must not consume retention slots
    (an orphan v_9 would otherwise push the readable previous version out);
    the next write clears the debris instead."""
    from eodatadown_spark.catalog import ParquetCatalog

    cat = ParquetCatalog(spark, str(tmp_path), retain_versions=2)
    cat.write(landsat_scenes, "landsat_scenes")            # v0
    os.makedirs(os.path.join(str(tmp_path), "landsat_scenes", "v_9"))
    cat.write(landsat_scenes, "landsat_scenes")            # v1
    # v0 retained (previous readable), orphan v9 deleted
    assert cat.list_versions("landsat_scenes") == [0, 1]
    assert not os.path.isdir(os.path.join(str(tmp_path), "landsat_scenes", "v_9"))
    assert cat.read_version("landsat_scenes", 0).count() == 7


class TestDeltaAdapter:
    """DeltaCatalog maps the catalog surface onto Delta Lake.  The clause
    translation (the piece that could silently diverge from
    operators.merge.merge_into semantics) needs no Delta install and is
    tested everywhere; the live half needs delta-spark and auto-skips without it."""

    def test_merge_clause_translation(self, spark):
        from eodatadown_spark.catalog_delta import delta_merge_clauses

        cond, calls = delta_merge_clauses(
            ["k", "src"],
            when_matched_update={"qty": F.col("s.qty")},
            update_condition=F.col("s.qty") > 0,
            when_matched_delete=F.col("s.op") == "d",
            when_not_matched_insert={"qty": F.col("s.qty") * 2},
        )
        assert cond == "t.k = s.k AND t.src = s.src"
        methods = [m for m, _, _ in calls]
        # delete routes before update — first matching whenMatched clause
        # wins in Delta, same as the operator's CASE order
        assert methods == [
            "whenMatchedDelete", "whenMatchedUpdate", "whenNotMatchedInsert",
        ]
        ins = calls[2][2]
        # key columns defaulted from the source in mapping-insert mode
        assert set(ins) == {"qty", "k", "src"}

    def test_merge_clause_translation_insert_all_and_errors(self, spark):
        import pytest as _pytest

        from eodatadown_spark.catalog_delta import delta_merge_clauses

        _, calls = delta_merge_clauses(["k"], when_matched_update={"v": F.lit(1)})
        assert [m for m, _, _ in calls] == [
            "whenMatchedUpdate", "whenNotMatchedInsertAll",
        ]
        # insert-all WITH target columns expands to a target-schema-governed
        # mapping (extra source columns ignored, absent ones NULL), exactly
        # operators.merge.merge_into's insert-all routing
        _, calls = delta_merge_clauses(
            ["k"],
            source_columns=["k", "v", "extra_audit"],
            target_columns=["k", "v", "w"],
        )
        method, _, ins = calls[0]
        assert method == "whenNotMatchedInsert"
        assert set(ins) == {"k", "v", "w"}   # extra_audit dropped, w NULLed
        with _pytest.raises(ValueError, match="WHEN clause"):
            delta_merge_clauses(["k"], when_not_matched_insert=False)
        with _pytest.raises(TypeError, match="mapping"):
            delta_merge_clauses(["k"], when_matched_update=F.lit(1))

    def test_replace_derived_retry_logic(self, spark):
        """The delta replace_derived retry discriminator (translation test,
        no Delta install needed): Concurrent*/ProtocolChanged exceptions
        re-read + re-derive; anything else surfaces."""
        import pytest as _pytest

        from eodatadown_spark.catalog_delta import DeltaCatalog

        cat = object.__new__(DeltaCatalog)  # bypass _require_delta
        seen = {"reads": 0, "writes": []}

        class ConcurrentAppendException(Exception):
            pass

        cat.read = lambda table: f"v{seen['reads']}"
        def write(df, table, partition=True):
            seen["reads"] += 1
            seen["writes"].append(df)
            if len(seen["writes"]) == 1:
                raise ConcurrentAppendException("winner committed first")
        cat.write = write
        cat.replace_derived("t", lambda cur: cur + "+fold")
        # loser re-read the winner's state and re-derived
        assert seen["writes"] == ["v0+fold", "v1+fold"]

        cat.write = lambda df, table, partition=True: (_ for _ in ()).throw(
            OSError("disk full")
        )
        with _pytest.raises(OSError, match="disk full"):
            cat.replace_derived("t", lambda cur: cur)

    def test_import_error_without_delta(self, spark, tmp_path):
        import pytest as _pytest

        try:
            import delta  # noqa: F401

            _pytest.skip("delta-spark installed; live tests cover this")
        except ImportError:
            pass
        from eodatadown_spark.catalog_delta import DeltaCatalog

        with _pytest.raises(ImportError, match="ParquetCatalog"):
            DeltaCatalog(spark, str(tmp_path))

    def test_live_delta_roundtrip(self, spark, tmp_path):
        """write → append → merge_into → time travel → changes_since on a
        real Delta table; runs only where delta-spark + a Delta-enabled
        session exist (auto-skips in the sandbox)."""
        import pytest as _pytest

        _pytest.importorskip("delta")
        from eodatadown_spark.catalog_delta import DeltaCatalog

        cat = DeltaCatalog(spark, str(tmp_path))
        df = spark.createDataFrame([(1, "a"), (2, "b")], "pid long, v string")
        cat.write(df, "tbl", partition=False)
        cat.append("tbl", spark.createDataFrame([(3, "c")], "pid long, v string"))
        cat.merge_into(
            "tbl",
            spark.createDataFrame([(2, "B"), (4, "d")], "pid long, v string"),
            on=["pid"],
            when_matched_update={"v": F.col("s.v")},
        )
        got = {r["pid"]: r["v"] for r in cat.read("tbl").collect()}
        assert got == {1: "a", 2: "B", 3: "c", 4: "d"}
        assert cat.read_version("tbl", 0).count() == 2
        kinds = {r["pid"]: r["change_type"]
                 for r in cat.changes_since("tbl", 0).collect()}
        assert kinds == {2: "update", 3: "insert", 4: "insert"}


class TestMergeUpdatesOCC:
    """Concurrent-commit contract (round-5 VERDICT item 6): two concurrent
    merge_updates on one table must serialize with NEITHER update lost —
    the pointer flip is optimistic (base-version check under the commit
    lock) with rebuild-on-conflict, never last-writer-wins."""

    def test_deterministic_conflict_rebuilds_and_keeps_both(
        self, spark, landsat_scenes, tmp_path, monkeypatch
    ):
        """Deterministic interleaving: a competing merge commits in the
        window between this writer's base-version read and its build.  The
        loser must detect the moved pointer at flip time, throw away its
        built version dir, and rebuild on top of the winner's commit."""
        from eodatadown_spark.catalog import ParquetCatalog

        cat = ParquetCatalog(spark, str(tmp_path), retain_versions=3)
        cat.write(landsat_scenes, "landsat_scenes")  # v_0
        competing = spark.createDataFrame(
            [(1, 77.0)], "pid long, cloud_cover double"
        )
        mine = spark.createDataFrame(
            [(2, 88.0)], "pid long, cloud_cover double"
        )
        orig = ParquetCatalog._begin_selective_version
        fired = {"done": False}

        def hooked(self, table, old_path, changed, part_cols):
            if not fired["done"]:
                fired["done"] = True
                ParquetCatalog(
                    spark, str(tmp_path), retain_versions=3
                ).merge_updates("landsat_scenes", competing)
            return orig(self, table, old_path, changed, part_cols)

        monkeypatch.setattr(
            ParquetCatalog, "_begin_selective_version", hooked
        )
        cat.merge_updates("landsat_scenes", mine)
        got = {
            r["pid"]: r["cloud_cover"]
            for r in cat.read("landsat_scenes")
            .where(F.col("pid").isin(1, 2)).collect()
        }
        assert got == {1: 77.0, 2: 88.0}          # neither commit lost
        # winner took v_1; the loser's first build was discarded and its
        # retry committed v_2 on top of the winner
        assert cat._current_version("landsat_scenes") == "v_2"

    def test_conflict_exhaustion_raises(
        self, spark, landsat_scenes, tmp_path, monkeypatch
    ):
        """With zero retries, a detected conflict must surface as an error,
        not silently drop either commit."""
        from eodatadown_spark.catalog import ParquetCatalog

        cat = ParquetCatalog(spark, str(tmp_path), retain_versions=3)
        cat.write(landsat_scenes, "landsat_scenes")
        competing = spark.createDataFrame(
            [(1, 77.0)], "pid long, cloud_cover double"
        )
        orig = ParquetCatalog._begin_selective_version

        def hooked(self, table, old_path, changed, part_cols):
            ParquetCatalog(
                spark, str(tmp_path), retain_versions=3
            ).merge_updates("landsat_scenes", competing)
            return orig(self, table, old_path, changed, part_cols)

        hooked_once = {"n": 0}

        def hooked_outer(self, table, old_path, changed, part_cols):
            if hooked_once["n"] == 0:
                hooked_once["n"] += 1
                return hooked(self, table, old_path, changed, part_cols)
            return orig(self, table, old_path, changed, part_cols)

        monkeypatch.setattr(
            ParquetCatalog, "_begin_selective_version", hooked_outer
        )
        mine = spark.createDataFrame(
            [(2, 88.0)], "pid long, cloud_cover double"
        )
        with pytest.raises(RuntimeError, match="optimistic-commit"):
            cat.merge_updates("landsat_scenes", mine, occ_retries=0)
        # the competing commit survives untouched
        got = {
            r["pid"]: r["cloud_cover"]
            for r in cat.read("landsat_scenes")
            .where(F.col("pid") == 1).collect()
        }
        assert got == {1: 77.0}

    def test_threaded_commits_all_land(self, spark, landsat_scenes, tmp_path):
        """Four genuinely concurrent merge_updates (threads, shared root):
        all four point updates must be present afterwards."""
        import threading

        from eodatadown_spark.catalog import ParquetCatalog

        cat = ParquetCatalog(spark, str(tmp_path), retain_versions=6)
        cat.write(landsat_scenes, "landsat_scenes")
        errs = []

        def work(pid):
            try:
                ParquetCatalog(
                    spark, str(tmp_path), retain_versions=6
                ).merge_updates(
                    "landsat_scenes",
                    spark.createDataFrame(
                        [(pid, 10.0 + pid)], "pid long, cloud_cover double"
                    ),
                    occ_retries=10,
                )
            except Exception as exc:  # surfaced after join
                errs.append(exc)

        threads = [
            threading.Thread(target=work, args=(p,)) for p in (0, 1, 2, 3)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs
        got = {
            r["pid"]: r["cloud_cover"]
            for r in cat.read("landsat_scenes")
            .where(F.col("pid").isin(0, 1, 2, 3)).collect()
        }
        assert got == {0: 10.0, 1: 11.0, 2: 12.0, 3: 13.0}


def test_gc_ignores_unclaimed_debris_below_new_version(spark, landsat_scenes, tmp_path):
    """A crashed writer's CLAIMED-but-never-committed version dir (below
    the next commit's number, above the previous pointer) must not
    consume a retention slot: with the round-7 exclusive claim, the next
    commit skips past such debris, and ranking it would push the
    genuinely readable previous version out of the window."""
    from eodatadown_spark.catalog import ParquetCatalog

    cat = ParquetCatalog(spark, str(tmp_path), retain_versions=2)
    cat.write(landsat_scenes, "landsat_scenes")              # v_0 committed
    # simulate a writer that claimed v_1 and died mid-build
    os.makedirs(os.path.join(str(tmp_path), "landsat_scenes", "v_1"))
    cat.merge_updates(
        "landsat_scenes",
        spark.createDataFrame([(0, 41.0)], "pid long, cloud_cover double"),
    )
    # the merge claimed v_2 (bumping past the debris); after its commit
    # the debris is gone, v_0 stays readable, pointer is v_2
    assert cat.list_versions("landsat_scenes") == [0, 2]
    assert cat._current_version("landsat_scenes") == "v_2"
    assert cat.read_version("landsat_scenes", 0).count() == 7


class TestRound8ConcurrencyHardening:
    """Round-8 ADVICE closures: OCC on the unpartitioned merge fallback,
    write()/append()/merge_into() claim+lock discipline, rename-based lock
    steal, and orphan-free conflict retries."""

    def test_unpartitioned_merge_updates_concurrent_keeps_both(
        self, spark, tmp_path, monkeypatch
    ):
        """Two merge_updates on an UNPARTITIONED table (the dedupindex-table
        shape) with a deterministic conflict in the window: the fallback
        path must run the full OCC protocol — the loser rebuilds from the
        winner's commit, neither update lost."""
        from eodatadown_spark.catalog import ParquetCatalog

        cat = ParquetCatalog(spark, str(tmp_path), retain_versions=4)
        cat.write(
            spark.createDataFrame(
                [(1, "a"), (2, "b")], "pid long, v string"
            ),
            "flat", partition=False,
        )
        competing = spark.createDataFrame([(1, "A")], "pid long, v string")
        mine = spark.createDataFrame([(2, "B")], "pid long, v string")
        orig = ParquetCatalog._write_version
        fired = {"done": False}

        def hooked(self, df, table, partition=True):
            if not fired["done"]:
                fired["done"] = True
                ParquetCatalog(
                    spark, str(tmp_path), retain_versions=4
                ).merge_updates("flat", competing, key="pid")
            return orig(self, df, table, partition)

        monkeypatch.setattr(ParquetCatalog, "_write_version", hooked)
        cat.merge_updates("flat", mine, key="pid")
        got = {r["pid"]: r["v"] for r in cat.read("flat").collect()}
        assert got == {1: "A", 2: "B"}  # neither commit lost
        # winner v_1; loser discarded its build and retried onto v_2+
        assert cat._current_version("flat") != "v_1"

    def test_threaded_unpartitioned_merges_all_land(self, spark, tmp_path):
        import threading

        from eodatadown_spark.catalog import ParquetCatalog

        cat = ParquetCatalog(spark, str(tmp_path), retain_versions=8)
        cat.write(
            spark.createDataFrame(
                [(p, "x") for p in range(4)], "pid long, v string"
            ),
            "flat", partition=False,
        )
        errs = []

        def work(pid):
            try:
                ParquetCatalog(
                    spark, str(tmp_path), retain_versions=8
                ).merge_updates(
                    "flat",
                    spark.createDataFrame(
                        [(pid, f"u{pid}")], "pid long, v string"
                    ),
                    key="pid", occ_retries=10,
                )
            except Exception as exc:
                errs.append(exc)

        threads = [
            __import__("threading").Thread(target=work, args=(p,))
            for p in range(4)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs
        got = {r["pid"]: r["v"] for r in cat.read("flat").collect()}
        assert got == {0: "u0", 1: "u1", 2: "u2", 3: "u3"}

    def test_append_conflict_rebuilds_not_lost(
        self, spark, landsat_scenes, tmp_path, monkeypatch
    ):
        """append() hard-links the BASE version, so flipping over a pointer
        moved by a concurrent merge would drop that merge — the loser must
        re-link from the winner's commit instead."""
        from eodatadown_spark.catalog import ParquetCatalog

        cat = ParquetCatalog(spark, str(tmp_path), retain_versions=4)
        cat.write(landsat_scenes, "landsat_scenes")
        competing = spark.createDataFrame(
            [(1, 55.0)], "pid long, cloud_cover double"
        )
        orig = ParquetCatalog._begin_selective_version
        fired = {"done": False}

        def hooked(self, table, old_path, changed, part_cols):
            if not fired["done"]:
                fired["done"] = True
                ParquetCatalog(
                    spark, str(tmp_path), retain_versions=4
                ).merge_updates("landsat_scenes", competing)
            return orig(self, table, old_path, changed, part_cols)

        monkeypatch.setattr(
            ParquetCatalog, "_begin_selective_version", hooked
        )
        new_row = landsat_scenes.where(F.col("pid") == 1).withColumn(
            "pid", F.lit(99).cast("long")
        )
        cat.append("landsat_scenes", new_row)
        tbl = cat.read("landsat_scenes")
        assert tbl.where(F.col("pid") == 99).count() == 1  # append landed
        got = tbl.where(F.col("pid") == 1).select("cloud_cover").collect()
        assert got[0][0] == 55.0  # concurrent merge NOT lost

    def test_merge_into_conflict_rebuilds_not_lost(
        self, spark, landsat_scenes, tmp_path, monkeypatch
    ):
        from eodatadown_spark.catalog import ParquetCatalog

        cat = ParquetCatalog(spark, str(tmp_path), retain_versions=4)
        cat.write(landsat_scenes, "landsat_scenes")
        competing = spark.createDataFrame(
            [(1, 66.0)], "pid long, cloud_cover double"
        )
        orig = ParquetCatalog._begin_selective_version
        fired = {"done": False}

        def hooked(self, table, old_path, changed, part_cols):
            if not fired["done"]:
                fired["done"] = True
                ParquetCatalog(
                    spark, str(tmp_path), retain_versions=4
                ).merge_updates("landsat_scenes", competing)
            return orig(self, table, old_path, changed, part_cols)

        monkeypatch.setattr(
            ParquetCatalog, "_begin_selective_version", hooked
        )
        cat.merge_into(
            "landsat_scenes",
            spark.createDataFrame([(2, 77.0)], "pid long, cloud_cover double"),
            on=["pid"],
            when_matched_update={"cloud_cover": F.col("s.cloud_cover")},
            when_not_matched_insert=False,
        )
        tbl = cat.read("landsat_scenes")
        vals = {
            r["pid"]: r["cloud_cover"]
            for r in tbl.where(F.col("pid").isin(1, 2)).collect()
        }
        assert vals == {1: 66.0, 2: 77.0}  # both commits present

    def test_write_claims_exclusively_never_clobbers_live_build(
        self, spark, landsat_scenes, tmp_path, monkeypatch
    ):
        """A full write() racing a merge's claimed build must take a HIGHER
        version number (atomic-mkdir claim), never reuse/overwrite the
        claimed dir; the losing merge retries cleanly."""
        from eodatadown_spark.catalog import ParquetCatalog

        cat = ParquetCatalog(spark, str(tmp_path), retain_versions=4)
        cat.write(landsat_scenes, "landsat_scenes")  # v_0
        orig = ParquetCatalog._begin_selective_version
        seen = {}
        fired = {"done": False}

        def hooked(self, table, old_path, changed, part_cols):
            version, out = orig(self, table, old_path, changed, part_cols)
            if not fired["done"]:
                fired["done"] = True
                seen["merge_claimed"] = version
                # a concurrent FULL REPLACE lands while the merge builds
                writer = ParquetCatalog(
                    spark, str(tmp_path), retain_versions=4
                )
                writer.write(landsat_scenes.where(F.col("pid") < 100),
                             "landsat_scenes")
                seen["write_committed"] = writer._current_version(
                    "landsat_scenes"
                )
            return version, out

        monkeypatch.setattr(
            ParquetCatalog, "_begin_selective_version", hooked
        )
        cat.merge_updates(
            "landsat_scenes",
            spark.createDataFrame([(1, 88.0)], "pid long, cloud_cover double"),
        )
        # the write() claimed a DISTINCT higher version, never reusing the
        # merge's claimed v_1 (the pre-round-8 write() reused the same v_N,
        # overwriting the live build and risking the loser's cleanup
        # deleting the committed dir); its commit GC'd the in-flight loser
        # build — which the merge survives by OCC retry
        assert seen["merge_claimed"] == "v_1"
        assert seen["write_committed"] == "v_2"
        got = cat.read("landsat_scenes").where(F.col("pid") == 1).collect()
        assert got[0]["cloud_cover"] == 88.0  # merge retried and landed
        assert cat._current_version("landsat_scenes") == "v_3"

    def test_build_error_leaves_no_orphan_version_dir(
        self, spark, landsat_scenes, tmp_path, monkeypatch
    ):
        """A real build failure (pointer unmoved) must remove its claimed
        version dir before re-raising — no orphan v_N debris inflating
        later claim numbering."""
        from eodatadown_spark.catalog import ParquetCatalog

        import eodatadown_spark.catalog as catmod

        cat = ParquetCatalog(spark, str(tmp_path), retain_versions=4)
        cat.write(landsat_scenes, "landsat_scenes")  # v_0
        # fail the changed-partition rewrite — runs AFTER the version dir
        # is claimed, BEFORE the flip (the orphan-prone window)
        def boom(changed, part_cols):
            raise OSError("disk full")

        monkeypatch.setattr(catmod, "_partition_match_cond", boom)
        with pytest.raises(OSError, match="disk full"):
            cat.merge_updates(
                "landsat_scenes",
                spark.createDataFrame(
                    [(1, 70.0)], "pid long, cloud_cover double"
                ),
            )
        dirs = sorted(
            d for d in os.listdir(tmp_path / "landsat_scenes")
            if d.startswith("v_")
        )
        assert dirs == ["v_0"]  # claimed v_1 cleaned up

    def test_stale_lock_steal_via_rename(self, spark, tmp_path, monkeypatch):
        """A crash-orphaned lock dir is stolen by ATOMIC RENAME; a loser
        whose rename fails (another stealer won) retries instead of
        deleting a fresh lock.  The crashed holder's lock is NON-EMPTY
        (owner token inside — every lock is born that way since round 9),
        so the acquire rename can't simply replace it and the steal path
        must engage."""
        from eodatadown_spark.catalog import ParquetCatalog

        cat = ParquetCatalog(spark, str(tmp_path))
        tdir = os.path.join(str(tmp_path), "tbl")
        os.makedirs(tdir, exist_ok=True)
        lock = os.path.join(tdir, "_COMMIT_LOCK")
        os.mkdir(lock)
        with open(os.path.join(lock, "owner"), "w", encoding="utf-8") as fh:
            fh.write("crashed-holder")
        old = __import__("time").time() - 1_000
        os.utime(lock, (old, old))  # stale enough to steal
        with cat._commit_lock("tbl", timeout=5.0, steal_after=120.0):
            assert os.path.isdir(lock)  # we re-created and hold it
        assert not os.path.exists(lock)
        # no stale-rename debris left behind
        assert not [d for d in os.listdir(tdir) if d.startswith("_COMMIT_LOCK.")]

        # loser path: rename raises (someone else stole first) → retry loop
        os.mkdir(lock)
        with open(os.path.join(lock, "owner"), "w", encoding="utf-8") as fh:
            fh.write("crashed-holder-2")
        os.utime(lock, (old, old))
        real_rename = os.rename
        calls = {"n": 0}

        def flaky_rename(src, dst, **kw):
            if src == lock and calls["n"] == 0:
                calls["n"] += 1
                real_rename(src, dst, **kw)  # simulate the OTHER stealer
                raise FileNotFoundError(src)  # then our own rename loses
            return real_rename(src, dst, **kw)

        monkeypatch.setattr(os, "rename", flaky_rename)
        with cat._commit_lock("tbl", timeout=5.0, steal_after=120.0):
            pass  # must still acquire after losing the steal race
        assert calls["n"] == 1


class TestSchemaEvolution:
    """Round-8: append(schema_evolution=...) — strict rejection of unknown
    columns (silent dropping is data loss) and additive widening with a
    per-version _SCHEMA.json sidecar, no data rewrite."""

    def test_strict_rejects_unknown_columns(self, spark, landsat_scenes, tmp_path):
        from eodatadown_spark.catalog import ParquetCatalog

        cat = ParquetCatalog(spark, str(tmp_path))
        cat.write(landsat_scenes, "landsat_scenes")
        new_row = landsat_scenes.limit(1).withColumn(
            "pid", F.lit(900).cast("long")
        ).withColumn("quality_score", F.lit(0.9))
        with pytest.raises(ValueError, match="quality_score"):
            cat.append("landsat_scenes", new_row)

    def test_add_widens_without_rewriting_files(
        self, spark, landsat_scenes, tmp_path
    ):
        from eodatadown_spark.catalog import ParquetCatalog

        cat = ParquetCatalog(spark, str(tmp_path), retain_versions=4)
        cat.write(landsat_scenes, "landsat_scenes")
        v0 = cat.data_path("landsat_scenes")
        inodes_before = {
            os.stat(os.path.join(dp, f)).st_ino
            for dp, _d, fs in os.walk(v0) for f in fs if f.endswith(".parquet")
        }
        new_row = landsat_scenes.limit(1).withColumn(
            "pid", F.lit(900).cast("long")
        ).withColumn("quality_score", F.lit(0.9))
        cat.append("landsat_scenes", new_row, schema_evolution="add")
        tbl = cat.read_clean("landsat_scenes")
        assert "quality_score" in tbl.columns
        got = {r["pid"]: r["quality_score"] for r in tbl.collect()}
        assert got[900] == 0.9
        assert all(v is None for p, v in got.items() if p != 900)  # NULL-fill
        # existing files hard-linked, not rewritten
        v1 = cat.data_path("landsat_scenes")
        inodes_after = {
            os.stat(os.path.join(dp, f)).st_ino
            for dp, _d, fs in os.walk(v1) for f in fs if f.endswith(".parquet")
        }
        assert inodes_before <= inodes_after
        assert os.path.exists(os.path.join(v1, "_SCHEMA.json"))

    def test_sidecar_carries_through_later_commits(
        self, spark, landsat_scenes, tmp_path
    ):
        """A plain append and a merge_updates AFTER evolution hard-link the
        mixed-schema files into new versions — the sidecar must follow so
        reads keep NULL-filling pre-evolution files."""
        from eodatadown_spark.catalog import ParquetCatalog

        cat = ParquetCatalog(spark, str(tmp_path), retain_versions=4)
        cat.write(landsat_scenes, "landsat_scenes")
        new_row = landsat_scenes.limit(1).withColumn(
            "pid", F.lit(900).cast("long")
        ).withColumn("quality_score", F.lit(0.9))
        cat.append("landsat_scenes", new_row, schema_evolution="add")
        # plain append of a widened-schema row (extras now IN the schema)
        row2 = landsat_scenes.limit(1).withColumn(
            "pid", F.lit(901).cast("long")
        ).withColumn("quality_score", F.lit(0.5))
        cat.append("landsat_scenes", row2)
        # partition-selective merge on the evolved table
        cat.merge_updates(
            "landsat_scenes",
            spark.createDataFrame([(900, 0.95)], "pid long, quality_score double"),
        )
        tbl = cat.read_clean("landsat_scenes")
        got = {r["pid"]: r["quality_score"] for r in tbl.collect()}
        assert got[900] == 0.95 and got[901] == 0.5
        assert sum(1 for v in got.values() if v is None) == len(got) - 2
        assert os.path.exists(
            os.path.join(cat.data_path("landsat_scenes"), "_SCHEMA.json")
        )

    def test_flat_table_evolution_full_rewrite(self, spark, tmp_path):
        from eodatadown_spark.catalog import ParquetCatalog

        cat = ParquetCatalog(spark, str(tmp_path))
        cat.write(
            spark.createDataFrame([(1, "a")], "pid long, v string"),
            "flat", partition=False,
        )
        cat.append(
            "flat",
            spark.createDataFrame([(2, "b", 7.0)], "pid long, v string, w double"),
            schema_evolution="add",
        )
        got = {r["pid"]: (r["v"], r["w"]) for r in cat.read("flat").collect()}
        assert got == {1: ("a", None), 2: ("b", 7.0)}
        # full rewrite materializes NULLs — no sidecar needed on flat tables
        assert not os.path.exists(
            os.path.join(cat.data_path("flat"), "_SCHEMA.json")
        )

    def test_time_travel_across_evolution(self, spark, landsat_scenes, tmp_path):
        """read_version: the pre-evolution version keeps its narrow schema;
        the post-evolution version NULL-fills hard-linked old files via its
        own sidecar."""
        from eodatadown_spark.catalog import ParquetCatalog

        cat = ParquetCatalog(spark, str(tmp_path), retain_versions=4)
        cat.write(landsat_scenes, "landsat_scenes")            # v_0
        new_row = landsat_scenes.limit(1).withColumn(
            "pid", F.lit(900).cast("long")
        ).withColumn("quality_score", F.lit(0.9))
        cat.append("landsat_scenes", new_row, schema_evolution="add")  # v_1
        v0 = cat.read_version("landsat_scenes", 0)
        assert "quality_score" not in v0.columns
        assert v0.count() == 7
        v1 = cat.read_version("landsat_scenes", 1)
        assert "quality_score" in v1.columns
        assert v1.where(F.col("quality_score").isNull()).count() == 7


    def test_merge_into_insert_all_evolution(self, spark, tmp_path):
        """merge_into insert-all: unknown source columns are rejected in
        strict mode and widen the table with 'add' — inserted rows carry
        the new column, pre-existing and updated rows read NULL."""
        from eodatadown_spark.catalog import ParquetCatalog

        cat = ParquetCatalog(spark, str(tmp_path))
        cat.write(
            spark.createDataFrame([(1, "a"), (2, "b")], "pid long, v string"),
            "flat", partition=False,
        )
        src = spark.createDataFrame(
            [(2, "B", 0.5), (3, "c", 0.9)], "pid long, v string, score double"
        )
        with pytest.raises(ValueError, match="score"):
            cat.merge_into(
                "flat", src, on=["pid"],
                when_matched_update={"v": F.col("s.v")},
            )
        cat.merge_into(
            "flat", src, on=["pid"],
            when_matched_update={"v": F.col("s.v")},
            schema_evolution="add",
        )
        got = {r["pid"]: (r["v"], r["score"]) for r in cat.read("flat").collect()}
        assert got == {1: ("a", None), 2: ("B", None), 3: ("c", 0.9)}
        # explicit mappings never trip the guard: extras are expression inputs
        cat.merge_into(
            "flat",
            spark.createDataFrame(
                [(4, "d", "ignored")], "pid long, v string, note string"
            ),
            on=["pid"],
            when_not_matched_insert={"v": F.col("s.v")},
        )
        assert cat.read("flat").where(F.col("pid") == 4).count() == 1


def test_catalog_compact_zorder_clusters_files(spark, landsat_scenes, tmp_path):
    """compact(zorder_by=...): the rewrite range-partitions on the Morton
    key of the named columns and sorts within files, so per-file Z-key
    intervals are DISJOINT (touching at boundaries at most) — the layout
    property parquet min/max pruning needs.  Contents must survive
    unchanged; the key is layout-only, never stored."""
    from eodatadown_spark.catalog import ParquetCatalog
    from eodatadown_spark.spatial import zorder_key_n

    cat = ParquetCatalog(spark, str(tmp_path))
    cat.write(landsat_scenes.repartition(8), "landsat_scenes")
    cat.compact(
        "landsat_scenes", target_rows_per_file=3,
        zorder_by=["west_lon", "south_lat"],
        zorder_ranges=[(-180.0, 180.0), (-90.0, 90.0)],
    )
    df = cat.read_clean("landsat_scenes")
    assert df.count() == 7
    assert "__z" not in df.columns and "__zorder" not in df.columns
    files = [
        os.path.join(dp, f)
        for dp, _d, fs in os.walk(cat.data_path("landsat_scenes"))
        for f in fs if f.endswith(".parquet")
    ]
    assert len(files) >= 2
    z = zorder_key_n(
        [F.col("west_lon").cast("double"), F.col("south_lat").cast("double")],
        [(-180.0, 180.0), (-90.0, 90.0)], 12,
    )
    spans = []
    for path in files:
        row = spark.read.parquet(path).agg(
            F.min(z).alias("lo"), F.max(z).alias("hi")).first()
        if row["lo"] is not None:
            spans.append((row["lo"], row["hi"]))
    spans.sort()
    for (lo_a, hi_a), (lo_b, _hi_b) in zip(spans, spans[1:]):
        assert hi_a <= lo_b  # intervals never interleave


class TestFileStatsPruning:
    """Round-8: footer-derived file-stats manifest + manifest-pruned reads —
    the scan-level data-skipping half that partition pruning can't express
    for non-partition columns, compounding with compact(zorder_by=...)."""

    def test_file_stats_min_max(self, spark, landsat_scenes, tmp_path):
        from eodatadown_spark.catalog import ParquetCatalog

        cat = ParquetCatalog(spark, str(tmp_path))
        cat.write(landsat_scenes, "landsat_scenes")
        stats = cat.file_stats("landsat_scenes", ["cloud_cover", "pid"])
        assert stats and all(e["rows"] > 0 for e in stats)
        lo = min(e["cloud_cover_min"] for e in stats)
        hi = max(e["cloud_cover_max"] for e in stats)
        real = landsat_scenes.agg(
            F.min("cloud_cover"), F.max("cloud_cover")).first()
        assert (lo, hi) == (real[0], real[1])

    def test_read_pruned_skips_files_and_matches_full_scan(
        self, spark, landsat_scenes, tmp_path
    ):
        from eodatadown_spark.catalog import ParquetCatalog

        cat = ParquetCatalog(spark, str(tmp_path))
        cat.write(landsat_scenes.repartition(8), "landsat_scenes")
        # cluster on cloud_cover so file intervals become disjoint
        cat.compact(
            "landsat_scenes", target_rows_per_file=2,
            zorder_by=["cloud_cover"], zorder_ranges=[(0.0, 100.0)],
        )
        n_files = len(cat.file_stats("landsat_scenes"))
        assert n_files >= 3
        pruned = cat.read_pruned("landsat_scenes", {"cloud_cover": (0.0, 10.0)})
        # correctness: pruned read == full-scan filter, column-for-column
        full = cat.read("landsat_scenes").where(
            (F.col("cloud_cover") >= 0.0) & (F.col("cloud_cover") <= 10.0)
        )
        assert sorted(pruned.columns) == sorted(full.columns)
        got = {r["pid"] for r in pruned.collect()}
        want = {r["pid"] for r in full.collect()}
        assert got == want and got  # non-empty and identical
        # performance fact: the manifest excluded at least one file
        stats = cat.file_stats("landsat_scenes", ["cloud_cover"])
        kept = [
            e for e in stats
            if e["cloud_cover_min"] is None or e["cloud_cover_min"] <= 10.0
        ]
        assert len(kept) < n_files

    def test_read_pruned_partition_column_bound(
        self, spark, landsat_scenes, tmp_path
    ):
        """Bounds on the derived partition column must survive the
        explicit-file-path read (basePath) and apply exactly."""
        import datetime as dt

        from eodatadown_spark.catalog import ParquetCatalog

        two_year = landsat_scenes.withColumn(
            "date_acquired",
            F.when(F.col("pid") >= 4, F.lit(dt.date(2020, 3, 1))).otherwise(
                F.col("date_acquired")
            ),
        )
        cat = ParquetCatalog(spark, str(tmp_path))
        cat.write(two_year, "landsat_scenes")
        pruned = cat.read_pruned("landsat_scenes", {"p_year": (2020, 2020)})
        assert {r["pid"] for r in pruned.collect()} == {4, 5, 6}
        with pytest.raises(ValueError, match="unknown column"):
            cat.read_pruned("landsat_scenes", {"nope": (0, 1)})


def test_merge_into_insert_all_dunder_columns_exempt(spark, landsat_scenes, tmp_path):
    """__-prefixed source columns (the ephemeral-bookkeeping convention,
    e.g. a CDC __op marker) never trip the insert-all evolution guard and
    never insert."""
    from eodatadown_spark.catalog import ParquetCatalog

    cat = ParquetCatalog(spark, str(tmp_path))
    cat.write(landsat_scenes, "landsat_scenes")
    src = (
        landsat_scenes.where(F.col("pid") == 1)
        .withColumn("pid", F.lit(777).cast("long"))
        .withColumn("__op", F.lit("i"))
    )
    cat.merge_into("landsat_scenes", src, on=["pid"])  # strict, no raise
    tbl = cat.read_clean("landsat_scenes")
    assert tbl.where(F.col("pid") == 777).count() == 1
    assert "__op" not in tbl.columns


def test_bucketed_snapshot_spec_is_authoritative(spark, tmp_path):
    """The snapshot's _bucket_spec.json overrides caller args: declaring a
    wrong CLUSTERED BY over existing bucket files would mis-assign rows
    to buckets and a bucketed join would silently LOSE matches — the
    reader must rebuild from the sidecar instead."""
    from pyspark.sql import functions as F

    from eodatadown_spark.catalog import ParquetCatalog

    cat = ParquetCatalog(spark, str(tmp_path / "specauth"))
    idx = spark.range(0, 2000).select(
        F.col("id").alias("wh"), (F.col("id") * 3).alias("cnt")
    )
    cat.publish_bucketed_snapshot(idx, "span_index", "wh", 4)
    # register under the WRONG spec first (stale session state), then a
    # republish with a different bucket count lands underneath
    stored = cat.read_bucketed_snapshot("span_index", "wh", 4)
    assert stored.count() == 2000
    cat.publish_bucketed_snapshot(idx, "span_index", "wh", 8)
    # caller still passes the OLD spec — sidecar must win
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        stored2 = cat.read_bucketed_snapshot("span_index", "wh", 4)
        batch = spark.range(0, 500).select((F.col("id") * 7).alias("wh"))
        joined = batch.join(stored2, "wh")
        # every batch wh < 2000 with wh%... -> exact expected match count
        expected = sum(1 for i in range(500) if i * 7 < 2000)
        assert joined.count() == expected  # no silently-lost matches
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
    # and the registered definition matches the files (8 buckets)
    _, tbl = cat._bucketed_ident("span_index")
    detail = spark.sql(f"DESCRIBE TABLE EXTENDED {tbl}").toPandas()
    nb = detail[detail.col_name == "Num Buckets"].data_type.iloc[0]
    assert str(nb).strip() == "8"


def test_bucketed_snapshot_rereads_after_matching_republish(spark, tmp_path):
    """ADVICE r12: a republish with a CHANGED spec followed by a read with
    the NEW (matching) args must not reuse the old-spec registration from
    earlier in the session — the sidecar-vs-caller comparison alone could
    not catch this (caller args match the sidecar), so the registration
    is unconditionally recreated per read."""
    from pyspark.sql import functions as F

    from eodatadown_spark.catalog import ParquetCatalog

    cat = ParquetCatalog(spark, str(tmp_path / "respec"))
    idx = spark.range(0, 1000).select(
        F.col("id").alias("wh"), (F.col("id") * 3).alias("cnt")
    )
    cat.publish_bucketed_snapshot(idx, "span_index", "wh", 4)
    assert cat.read_bucketed_snapshot("span_index", "wh", 4).count() == 1000
    # republish under a different layout AND schema (extra column)
    cat.publish_bucketed_snapshot(
        idx.withColumn("extra", F.lit(1)), "span_index", "wh", 8
    )
    # caller passes the NEW spec — before the fix the stale 4-bucket
    # old-schema registration was reused because sidecar == caller args
    stored = cat.read_bucketed_snapshot("span_index", "wh", 8)
    assert "extra" in stored.columns
    _, tbl = cat._bucketed_ident("span_index")
    detail = spark.sql(f"DESCRIBE TABLE EXTENDED {tbl}").toPandas()
    nb = detail[detail.col_name == "Num Buckets"].data_type.iloc[0]
    assert str(nb).strip() == "8"

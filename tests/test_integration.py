"""Pipeline-parity test (SURVEY §5.3): full lifecycle against a Parquet
catalog — ingest → dedup → ROI filter → stage lists → task fan-out → state
advance → quicklook JSON merge → summary — asserting the reference's
row-level semantics end to end."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from eodatadown_spark import ingest, pipeline, reports, queries as Q
from eodatadown_spark.catalog import ParquetCatalog
from eodatadown_spark.datereports import quicklook_stage, render_date_report_html
from eodatadown_spark.sources.index_adapters import landsat_index_scenes


def _index_rows():
    """Remote-index fixture: 5 scenes incl. one duplicate scene_id with a
    newer processing date."""
    def r(sid, pid_, acq, proc, cloud, w, e, s, n):
        return (sid, f"LC08_L1TP_001001_{acq.replace('-','')}_{proc}_01_T1",
                "LANDSAT_8", "OLI_TIRS", acq, acq + "T10:00:00.000000Z", "01", "T1",
                "L1TP", "1", "1", str(cloud), str(n), str(s), str(e), str(w),
                "1000", f"gs://b/{pid_}")

    return [
        r("SC_A", 1, "2019-01-05", "20190110", 10.0, 0.0, 2.0, 50.0, 52.0),
        r("SC_B", 2, "2019-02-10", "20190215", 20.0, -1.0, 3.0, 50.0, 52.0),
        r("SC_C", 3, "2019-03-15", "20190320", 30.0, 20.0, 22.0, 10.0, 12.0),  # outside ROI
        r("SC_A", 4, "2019-01-05", "20190601", 10.0, 0.0, 2.0, 50.0, 52.0),   # reprocessed dup
        r("SC_D", 5, "2019-04-20", "20190425", 90.0, -2.0, 0.5, 48.0, 50.5),
    ]


_INDEX_SCHEMA = (
    "scene_id string, product_id string, spacecraft_id string, sensor_id string,"
    "date_acquired string, sensing_time string, collection_number string,"
    "collection_category string, data_type string, wrs_path string, wrs_row string,"
    "cloud_cover string, north_lat string, south_lat string, east_lon string,"
    "west_lon string, total_size string, base_url string"
)


def _empty_catalog(spark):
    from eodatadown_spark import schemas

    return spark.createDataFrame([], schema=schemas.LANDSAT_SCENES)


def _with_state_defaults(df, spark):
    """Fill the state block for freshly ingested rows (M1 defaults)."""
    from eodatadown_spark import schemas

    defaults = {
        "query_date": F.current_timestamp(),
        "download_start_date": F.lit(None).cast("timestamp"),
        "download_end_date": F.lit(None).cast("timestamp"),
        "downloaded": F.lit(False),
        "download_path": F.lit(""),
        "archived": F.lit(False),
        "ardproduct_start_date": F.lit(None).cast("timestamp"),
        "ardproduct_end_date": F.lit(None).cast("timestamp"),
        "ardproduct": F.lit(False),
        "ardproduct_path": F.lit(""),
        "dcloaded_start_date": F.lit(None).cast("timestamp"),
        "dcloaded_end_date": F.lit(None).cast("timestamp"),
        "dcloaded": F.lit(False),
        "invalid": F.lit(False),
        "extended_info": F.lit(None).cast("string"),
        "reg_check": F.lit(False),
    }
    for name, expr in defaults.items():
        df = df.withColumn(name, expr)
    return df.select(*[f.name for f in schemas.LANDSAT_SCENES.fields])


def test_full_lifecycle(spark, roi_df, tmp_path):
    cat = ParquetCatalog(spark, str(tmp_path))

    # -- ingest: index scan (S1) → normalize → upsert with serial PIDs (J5)
    raw = spark.createDataFrame(_index_rows(), _INDEX_SCHEMA)
    incoming = _with_state_defaults(
        landsat_index_scenes(raw).withColumn("pid", F.lit(None).cast("long")), spark
    )
    catalog = ingest.upsert_new_scenes(
        _empty_catalog(spark), incoming, keys=["scene_id", "product_id"],
        order_cols=["scene_id", "product_id"],
    )
    assert catalog.count() == 5
    pid_map = {r["scene_id"] + "/" + r["product_id"].split("_")[4]: r["pid"]
               for r in catalog.collect()}
    assert pid_map["SC_A/20190110"] == 0  # deterministic serial order

    # -- dedup (J4): reprocessed SC_A keeps the newer product
    catalog = ingest.resolve_duplicate_scenes(catalog)
    assert catalog.count() == 4
    kept_a = catalog.where(F.col("scene_id") == "SC_A").first()
    assert "20190601" in kept_a["product_id"]

    # -- ROI anti-join (J3): SC_C is outside → deleted
    catalog = ingest.filter_scenes_roi(catalog, roi_df, keep_intersecting=True)
    assert sorted(r["scene_id"] for r in catalog.collect()) == ["SC_A", "SC_B", "SC_D"]
    cat.write(catalog, "landsat_scenes")

    # -- watermark for the next incremental pass (T1)
    wm = ingest.watermark(cat.read_clean("landsat_scenes"), "date_acquired")
    assert str(wm) == "2019-04-20"

    # -- stage 1: download fan-out (P2) + ONE batched state merge (M2)
    catalog = cat.read_clean("landsat_scenes")
    todo = catalog.join(Q.get_scnlist_download(catalog), "pid", "left_semi").select(
        "pid", "remote_url"
    )
    updates = pipeline.run_scene_tasks(
        todo,
        lambda s: {"pid": s["pid"], "downloaded": True,
                   "download_path": f"/dl/{s['pid']}"},
        "pid long, downloaded boolean, download_path string",
    )
    catalog = pipeline.apply_updates(catalog, updates)
    cat.write(catalog, "landsat_scenes")
    assert Q.get_scnlist_download(cat.read_clean("landsat_scenes")).count() == 0

    # -- stage 2: con2ard
    catalog = cat.read_clean("landsat_scenes")
    updates = pipeline.run_scene_tasks(
        catalog.join(Q.get_scnlist_con2ard(catalog), "pid", "left_semi").select("pid"),
        lambda s: {"pid": s["pid"], "ardproduct": True,
                   "ardproduct_path": f"/ard/{s['pid']}"},
        "pid long, ardproduct boolean, ardproduct_path string",
    )
    catalog = pipeline.apply_updates(catalog, updates)

    # -- stage 3: quicklook (K6) → JSON merge (M3) → F9 list drains
    patches = quicklook_stage(catalog)
    catalog = pipeline.merge_extended_info(catalog, patches)
    assert Q.get_scnlist_quicklook(catalog).count() == 0
    info = json.loads(
        catalog.where(F.col("scene_id") == "SC_A").first()["extended_info"]
    )
    assert "quicklookpath" in info["quicklook"]
    # tilecache still pending for everyone (F9 key independence)
    assert Q.get_scnlist_tilecache(catalog).count() == 3

    # -- summary (A3 single pass)
    s = reports.sensor_summary_counts(catalog).first()
    assert (s["n_scenes"], s["n_downloaded"], s["n_ard"]) == (3, 3, 3)

    # -- obs-date rollup (A9) + date report (K4)
    obs, bridge = reports.build_obs_date_records(catalog, "LandsatGOOG")
    assert obs.count() == 3 and bridge.count() == 3
    html = render_date_report_html(
        reports.get_obs_scns(obs.join(bridge, ["sensor_id", "platform_id", "obs_date"])),
        "Date report", "LandsatGOOG",
    )
    assert "LANDSAT_8" in html and html.count("<tr>") == 4  # header + 3 rows


def test_incremental_second_pass(spark, roi_df):
    """Second check_new_scns run: watermark excludes old rows; upsert only
    appends the genuinely new scene; PIDs continue from max."""
    raw = spark.createDataFrame(_index_rows(), _INDEX_SCHEMA)
    incoming = _with_state_defaults(
        landsat_index_scenes(raw).withColumn("pid", F.lit(None).cast("long")), spark
    )
    catalog = ingest.resolve_duplicate_scenes(
        ingest.upsert_new_scenes(
            _empty_catalog(spark), incoming, keys=["scene_id", "product_id"]
        )
    )
    wm = ingest.watermark(catalog, "date_acquired")

    new_raw = spark.createDataFrame(
        _index_rows()
        + [("SC_E", "LC08_L1TP_001001_20190510_20190515_01_T1", "LANDSAT_8",
            "OLI_TIRS", "2019-05-10", "2019-05-10T10:00:00.000000Z", "01", "T1",
            "L1TP", "1", "1", "5.0", "52.0", "50.0", "2.0", "0.0", "1000", "gs://b/6")],
        _INDEX_SCHEMA,
    )
    fresh = ingest.filter_above_watermark(
        _with_state_defaults(
            landsat_index_scenes(new_raw).withColumn("pid", F.lit(None).cast("long")),
            spark,
        ),
        "date_acquired",
        wm,
    )
    merged = ingest.upsert_new_scenes(catalog, fresh, keys=["scene_id", "product_id"])
    assert merged.count() == catalog.count() + 1
    new_row = merged.where(F.col("scene_id") == "SC_E").first()
    assert new_row["pid"] == ingest.next_pid(catalog)  # serial: old max + 1


def test_embed_to_ann_pipeline(spark):
    """Operator composition end-to-end: documents → mapInPandas embedding
    stage → IVF index → ANN query. A planted re-crawl (same text, new id)
    embeds identically, so its original is its top neighbor at cos_sim 1;
    self-matches are excluded by the operator contract."""
    from pyspark.sql import functions as F

    from eodatadown_spark.operators.multimodal import embed_documents
    from eodatadown_spark.operators.similarity import ivf_topk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
    recrawl = docs.where(F.col("doc_id") < 3).withColumn(
        "doc_id", F.col("doc_id") + 1000
    )
    emb = embed_documents(docs.unionByName(recrawl), dim=16).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    qs = emb.where(F.col("vec_id") >= 1000).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_topk(emb, qs, k=2, n_centroids=4, n_probe=4)
    top1 = {r["query_id"]: r["neighbor_id"]
            for r in out.where(F.col("rank") == 1).collect()}
    # identical text -> identical stub embedding -> original is top neighbor
    assert top1 == {1000: 0, 1001: 1, 1002: 2}

"""Every sensor table (§1.4 schemas) round-trips through init → ingest →
watermark → summary with its own keys/watermark column."""

from __future__ import annotations

import datetime as dt

import pytest

from eodatadown_spark.catalog import ParquetCatalog
from eodatadown_spark.sensor import SENSORS, get_sensor_obj

_TS = dt.datetime(2019, 6, 1, 10, 0, 0)

# minimal per-sensor index feeds (identity columns + watermark col)
FEEDS: dict[str, list[dict]] = {
    "LandsatGOOG": [
        {"scene_id": "L1", "product_id": "LC08_L1TP_001001_20190601_20190610_01_T1",
         "date_acquired": _TS.date(), "spacecraft_id": "LANDSAT_8", "total_size": 10},
        {"scene_id": "L2", "product_id": "LC08_L1TP_001001_20190602_20190611_01_T1",
         "date_acquired": _TS.date() + dt.timedelta(days=1),
         "spacecraft_id": "LANDSAT_8", "total_size": 20},
    ],
    "Sentinel2GOOG": [
        {"granule_id": "G1", "generation_time": _TS, "sensing_time": _TS,
         "platform_id": "Sentinel2A", "total_size": 10},
    ],
    "Sentinel1ASF": [
        {"scene_id": "S1", "product_file_id": "PF1", "begin_position": _TS,
         "acquisition_date": _TS, "platform": "SA", "total_size": 10},
    ],
    "GEDI": [
        {"file_name": "GEDI01_B_2019152185228_O01971.h5", "date_acquired": _TS.date(),
         "product": "GEDI01_B", "total_size": 10},
    ],
    "ICESAT2": [
        {"granule_id": "IG1", "producer_id": "P1", "start_time": _TS,
         "product": "ATL03", "total_size": 10.0},
    ],
    "JAXASARTiles": [
        {"server_file_path": "/data/jaxa/2017/N10E010/N10E010_17_MOS.tar.gz",
         "tile_name": "N10E010", "year": 2017, "start_date": _TS,
         "instrument_name": "PALSAR", "total_size": 10},
    ],
}


@pytest.mark.parametrize("name", sorted(SENSORS))
def test_sensor_roundtrip(spark, tmp_path, name):
    sensor = get_sensor_obj(name, ParquetCatalog(spark, str(tmp_path)))
    sensor.init_sensor_db()
    feed = spark.createDataFrame(FEEDS[name])
    assert sensor.check_new_scns(feed) == len(FEEDS[name])
    # idempotent re-ingest from start: no new rows
    assert sensor.check_new_scns(feed, check_from_start=True) == 0
    info = sensor.get_sensor_summary_info()
    assert info["n_scenes"] == len(FEEDS[name])
    # watermark present and typed per sensor
    from eodatadown_spark import ingest

    wm = ingest.watermark(sensor.scenes(), sensor.watermark_col)
    assert wm is not None


def test_icesat2_per_product_watermark(spark, tmp_path):
    """F2 per-product variant: a new ATL08 granule older than ATL03's
    watermark still ingests (the reference tracks watermarks per product)."""
    sensor = get_sensor_obj("ICESAT2", ParquetCatalog(spark, str(tmp_path)))
    sensor.init_sensor_db()
    sensor.check_new_scns(spark.createDataFrame([
        {"granule_id": "A1", "producer_id": "P", "product": "ATL03",
         "start_time": dt.datetime(2019, 6, 10), "total_size": 1.0},
    ]))
    n = sensor.check_new_scns(spark.createDataFrame([
        # below ATL03's watermark but ATL08 has no history → ingested
        {"granule_id": "B1", "producer_id": "P", "product": "ATL08",
         "start_time": dt.datetime(2019, 6, 1), "total_size": 1.0},
        # stale for ATL03 → skipped
        {"granule_id": "A0", "producer_id": "P", "product": "ATL03",
         "start_time": dt.datetime(2019, 6, 5), "total_size": 1.0},
        # fresh for ATL03 → ingested
        {"granule_id": "A2", "producer_id": "P", "product": "ATL03",
         "start_time": dt.datetime(2019, 6, 15), "total_size": 1.0},
    ]))
    assert n == 2
    got = sorted(r["granule_id"] for r in sensor.scenes().collect())
    assert got == ["A1", "A2", "B1"]

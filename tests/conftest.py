from __future__ import annotations

import datetime as dt
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from eodatadown_spark.session import get_spark

    spark = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield spark
    spark.stop()


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _d(s: str) -> dt.date:
    return dt.date.fromisoformat(s)


@pytest.fixture(scope="session")
def landsat_scenes(spark):
    """Small hand-built Landsat catalog per FIXTURES.md: includes duplicate
    scene_ids, invalid rows, staged state flags, JSON extended_info."""
    from eodatadown_spark import schemas

    def row(pid, scene_id, product_date, date_acq, cloud, bbox, downloaded,
            ard, dc, invalid, einfo, spacecraft="LANDSAT_8"):
        w, e, s, n = bbox
        acq_compact = date_acq.replace("-", "")
        return {
            "pid": pid,
            "scene_id": scene_id,
            # field 3 = acquisition date, field 4 = PROCESS date — the field
            # parse_product_process_date reads for J4 keep-latest
            "product_id": f"LC08_L1TP_001001_{acq_compact}_{product_date}_01_T1",
            "spacecraft_id": spacecraft,
            "sensor_id": "OLI_TIRS",
            "date_acquired": _d(date_acq),
            "collection_number": "01",
            "collection_category": "T1",
            "sensing_time": _ts(date_acq + "T10:00:00"),
            "data_type": "L1TP",
            "wrs_path": 1,
            "wrs_row": 1,
            "cloud_cover": cloud,
            "north_lat": n,
            "south_lat": s,
            "east_lon": e,
            "west_lon": w,
            "total_size": 1000 + pid,
            "remote_url": f"gs://bucket/scene{pid}",
            "query_date": _ts("2020-01-01T00:00:00"),
            "download_start_date": _ts("2020-01-02T00:00:00") if downloaded else None,
            "download_end_date": _ts("2020-01-02T01:00:00") if downloaded else None,
            "downloaded": downloaded,
            "download_path": f"/data/dl/{pid}" if downloaded else "",
            "archived": False,
            "ardproduct_start_date": _ts("2020-01-03T00:00:00") if ard else None,
            "ardproduct_end_date": _ts("2020-01-03T02:00:00") if ard else None,
            "ardproduct": ard,
            "ardproduct_path": f"/data/ard/{pid}" if ard else "",
            "dcloaded_start_date": None,
            "dcloaded_end_date": None,
            "dcloaded": dc,
            "invalid": invalid,
            "extended_info": einfo,
            "reg_check": False,
        }

    rows = [
        # pid, scene, prod-date, acq-date, cloud, (w,e,s,n), dl, ard, dc, invalid, einfo
        row(0, "S1", "20200110", "2019-01-05", 10.0, (0.0, 2.0, 50.0, 52.0), True, True, True, False,
            json.dumps({"quicklook": "ok", "tilecache": "ok"})),
        row(1, "S2", "20200110", "2019-02-10", 80.0, (5.0, 7.0, 50.0, 52.0), True, True, False, False, None),
        row(2, "S3", "20200110", "2019-03-15", 5.0, (-3.0, -1.0, 46.0, 48.0), True, False, False, False, None),
        row(3, "S4", "20200110", "2019-04-20", 50.0, (8.0, 9.5, 55.0, 58.0), False, False, False, False, None),
        row(4, "S5", "20200110", "2019-05-25", 20.0, (1.0, 3.0, 47.0, 49.0), False, False, False, True, None),
        # duplicate scene_id S1 with OLDER product date (loses J4 keep-latest)
        row(5, "S1", "20191201", "2019-01-05", 10.0, (0.0, 2.0, 50.0, 52.0), False, False, False, False, None),
        # quicklook present, tilecache missing
        row(6, "S6", "20200110", "2019-06-30", 30.0, (2.0, 4.0, 51.0, 53.0), True, True, False, False,
            json.dumps({"quicklook": "ok"})),
    ]
    return spark.createDataFrame(rows, schema=schemas.LANDSAT_SCENES)


@pytest.fixture(scope="session")
def plugin_results_df(spark):
    from eodatadown_spark import schemas

    rows = [
        {"scene_pid": 0, "plugin_name": "PlgA", "start_date": _ts("2020-02-01T00:00:00"),
         "end_date": _ts("2020-02-01T00:10:00"), "completed": True, "success": True,
         "outputs": False, "error": False, "extended_info": None},
        {"scene_pid": 1, "plugin_name": "PlgA", "start_date": _ts("2020-02-01T00:00:00"),
         "end_date": _ts("2020-02-01T00:20:00"), "completed": False, "success": False,
         "outputs": False, "error": False, "extended_info": None},
    ]
    return spark.createDataFrame(rows, schema=schemas.PLUGIN_RESULTS)


@pytest.fixture(scope="session")
def roi_df(spark):
    from eodatadown_spark import schemas

    rows = [
        {"roi_id": 1, "name": "west", "west_lon": -5.0, "east_lon": 0.5,
         "south_lat": 45.0, "north_lat": 50.5,
         "wkt": "POLYGON((-5 45, 0.5 45, 0.5 50.5, -5 50.5, -5 45))"},
    ]
    return spark.createDataFrame(rows, schema=schemas.ROI_POLYGONS)

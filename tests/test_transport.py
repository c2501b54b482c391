"""Transport shim (S3/S4/S5): fixture-driven request cycles through the
full check_new_scns path — paging, per-ROI dedup, per-product windows."""

from __future__ import annotations

import datetime as dt

import pytest

from eodatadown_spark.catalog import ParquetCatalog
from eodatadown_spark.sensor import get_sensor_obj
from eodatadown_spark.sources.transport import (
    ASF_BASE_URL,
    CMR_GRANULE_URL,
    GEDI_FINDER_URL,
    FixtureTransport,
    asf_fetch_scenes,
    canonical_request,
    cmr_fetch_granules,
)


def _cmr_entry(gid: str, producer: str, start: str, size: float = 10.0):
    return {
        "id": gid,
        "producer_granule_id": producer,
        "title": f"title-{gid}",
        "time_start": start,
        "time_end": start,
        "updated": start,
        "original_format": "HDF5",
        "online_access_flag": True,
        "granule_size": size,
        "boxes": ["-10.0 100.0 -5.0 105.0"],
        "links": [
            {"type": "text/html", "href": "https://x/browse"},
            {"type": "application/x-hdfeos", "href": f"https://data/{gid}.h5"},
        ],
    }


def _cmr_params(page_num: int, temporal: str, product="ATL03", version="003"):
    return {
        "short_name": product,
        "version": version,
        "temporal": temporal,
        "page_size": 2,
        "page_num": page_num,
        "bounding_box": "100.0,-10.0,105.0,-5.0",
    }


def test_cmr_paging_loop(tmp_path):
    """3 fixture pages (2+1 entries, then empty) — the loop must fetch all
    three requests and stop on the empty page."""
    t = FixtureTransport(tmp_path / "fx")
    temporal = "2019-01-01T00:00:00Z,2019-12-31T23:59:59Z"
    t.store(CMR_GRANULE_URL, _cmr_params(1, temporal),
            {"feed": {"entry": [_cmr_entry("G1", "P1", "2019-06-01T00:00:00.000"),
                                _cmr_entry("G2", "P2", "2019-06-02T00:00:00.000")]}})
    t.store(CMR_GRANULE_URL, _cmr_params(2, temporal),
            {"feed": {"entry": [_cmr_entry("G3", "P3", "2019-06-03T00:00:00.000")]}})
    t.store(CMR_GRANULE_URL, _cmr_params(3, temporal), {"feed": {"entry": []}})
    entries = cmr_fetch_granules(
        t, short_name="ATL03", version="003", temporal=temporal,
        bounding_box="100.0,-10.0,105.0,-5.0", page_size=2,
    )
    assert [e["id"] for e in entries] == ["G1", "G2", "G3"]
    assert len(t.log) == 3  # three pages actually requested


def test_cmr_missing_page_raises(tmp_path):
    t = FixtureTransport(tmp_path / "fx")
    with pytest.raises(LookupError, match="no fixture"):
        cmr_fetch_granules(
            t, short_name="ATL03", version="003", temporal="a,b",
            bounding_box="0,0,1,1", page_size=2,
        )


def test_icesat2_check_new_scns_remote_paged(spark, tmp_path):
    """End-to-end: ICESAT2 check_new_scns through the CMR page loop, then an
    incremental run whose temporal window derives from the stored watermark."""
    sensor = get_sensor_obj("ICESAT2", ParquetCatalog(spark, str(tmp_path / "cat")))
    sensor.init_sensor_db()
    t = FixtureTransport(tmp_path / "fx")
    temporal1 = "2019-01-01T00:00:00Z,2019-12-31T23:59:59Z"
    t.store(CMR_GRANULE_URL, _cmr_params(1, temporal1),
            {"feed": {"entry": [_cmr_entry("G1", "P1", "2019-06-01T00:00:00.000"),
                                _cmr_entry("G2", "P2", "2019-06-02T00:00:00.000")]}})
    t.store(CMR_GRANULE_URL, _cmr_params(2, temporal1),
            {"feed": {"entry": [_cmr_entry("G3", "P3", "2019-06-03T00:00:00.000")]}})
    t.store(CMR_GRANULE_URL, _cmr_params(3, temporal1), {"feed": {"entry": []}})

    n = sensor.check_new_scns_remote(
        t,
        products=[{"product": "ATL03", "version": "003"}],
        geo_bounds=["100.0,-10.0,105.0,-5.0"],
        start_date=dt.datetime(2019, 1, 1),
        end=dt.datetime(2019, 12, 31),
        page_size=2,
    )
    assert n == 3
    rows = {r["granule_id"]: r for r in sensor.scenes().collect()}
    assert rows["G1"]["remote_url"] == "https://data/G1.h5"
    assert rows["G2"]["north_lat"] == -5.0 and rows["G2"]["west_lon"] == 100.0
    assert rows["G3"]["product"] == "ATL03"

    # incremental: the second run's temporal window must start at the stored
    # ATL03 watermark (2019-06-03), not the config start date
    temporal2 = "2019-06-03T00:00:00Z,2019-12-31T23:59:59Z"
    t.store(CMR_GRANULE_URL, _cmr_params(1, temporal2),
            {"feed": {"entry": [_cmr_entry("G3", "P3", "2019-06-03T00:00:00.000"),
                                _cmr_entry("G4", "P4", "2019-06-09T00:00:00.000")]}})
    t.store(CMR_GRANULE_URL, _cmr_params(2, temporal2), {"feed": {"entry": []}})
    n2 = sensor.check_new_scns_remote(
        t,
        products=[{"product": "ATL03", "version": "003"}],
        geo_bounds=["100.0,-10.0,105.0,-5.0"],
        start_date=dt.datetime(2019, 1, 1),
        end=dt.datetime(2019, 12, 31),
        page_size=2,
    )
    assert n2 == 1  # G3 re-offered but already ingested; G4 is new
    assert sorted(r["granule_id"] for r in sensor.scenes().collect()) == [
        "G1", "G2", "G3", "G4",
    ]
    # the watermark-derived request (not the config-start one) was issued
    import urllib.parse

    assert any(urllib.parse.quote(temporal2, safe="") in req for req in t.log)


def _asf_scene(pfid: str, scene: str, start: str):
    return {
        "product_file_id": pfid,
        "sceneId": scene,
        "productName": f"{scene}-GRD_HD",
        "absoluteOrbit": "17001",
        "relativeOrbit": "104",
        "doppler": "0",
        "flightDirection": "ASCENDING",
        "granuleName": scene,
        "granuleType": "SENTINEL_1A_FRAME",
        "incidenceAngle": "NA",
        "lookDirection": "R",
        "platform": "Sentinel-1A",
        "polarization": "VV+VH",
        "processingDate": f"{start}.000000",
        "processingDescription": "d",
        "processingLevel": "GRD_HD",
        "processingType": "GRD_HD",
        "processingTypeDisplay": "x",
        "sceneDate": f"{start}.000000",
        "sensor": "C-SAR",
        "startTime": f"{start}.000000",
        "stopTime": f"{start}.000000",
        "stringFootprint": "POLYGON((100.0 -10.0,105.0 -10.0,105.0 -5.0,100.0 -5.0,100.0 -10.0))",
        "downloadUrl": f"https://asf/{scene}.zip",
        "fileName": f"{scene}.zip",
        "md5sum": "ab" * 16,
        "sizeMB": "1024.5",
    }


def _asf_params(poly: str, start: str, end: str):
    return {
        "polygon": poly,
        "platform": "SA,SB",
        "processingLevel": "GRD_HD",
        "start": start,
        "end": end,
        "output": "json",
    }


def test_asf_per_roi_cycle_dedups_across_rois(tmp_path):
    t = FixtureTransport(tmp_path / "fx")
    start, end = "2019-01-01T00:00:00UTC", "2019-12-31T00:00:00UTC"
    s_shared = _asf_scene("PF1", "S1A_A", "2019-06-01T00:00:00")
    t.store(ASF_BASE_URL, _asf_params("p1", start, end),
            [[s_shared, _asf_scene("PF2", "S1A_B", "2019-06-02T00:00:00")]])
    t.store(ASF_BASE_URL, _asf_params("p2", start, end),
            [[s_shared, _asf_scene("PF3", "S1A_C", "2019-06-03T00:00:00")]])
    scns = asf_fetch_scenes(t, polygons=["p1", "p2"], start=start, end=end)
    # PF1 returned for both ROIs → once; both ROIs were requested
    assert [s["product_file_id"] for s in scns] == ["PF1", "PF2", "PF3"]
    assert len(t.log) == 2


def test_sentinel1_check_new_scns_remote(spark, tmp_path):
    sensor = get_sensor_obj("Sentinel1ASF", ParquetCatalog(spark, str(tmp_path / "cat")))
    sensor.init_sensor_db()
    t = FixtureTransport(tmp_path / "fx")
    start = dt.datetime(2019, 1, 1)
    end = dt.datetime(2019, 12, 31)
    start_s, end_s = start.isoformat() + "UTC", end.isoformat() + "UTC"
    t.store(ASF_BASE_URL, _asf_params("p1", start_s, end_s),
            [[_asf_scene("PF1", "S1A_A", "2019-06-01T00:00:00"),
              _asf_scene("PF2", "S1A_B", "2019-06-02T00:00:00")]])
    n = sensor.check_new_scns_remote(t, polygons=["p1"], start_date=start, end=end)
    assert n == 2
    row = sensor.scenes().where("product_file_id = 'PF1'").first()
    assert row["incidence_angle"] is None  # 'NA' safe-casts to NULL
    assert row["north_lat"] == -5.0 and row["total_size"] == int(1024.5 * 1024 * 1024)

    # incremental run: request window starts at the begin_position watermark
    wm_s = dt.datetime(2019, 6, 2).isoformat() + "UTC"
    t.store(ASF_BASE_URL, _asf_params("p1", wm_s, end_s),
            [[_asf_scene("PF3", "S1A_C", "2019-06-03T00:00:00")]])
    n2 = sensor.check_new_scns_remote(t, polygons=["p1"], start_date=start, end=end)
    assert n2 == 1
    import urllib.parse

    wm_enc = urllib.parse.quote(dt.datetime(2019, 6, 2).isoformat() + "UTC", safe="")
    assert any("start=" + wm_enc in req for req in t.log)


def _gedi_params(product: str, version: str, bbox: str):
    return {"output": "json", "product": product, "version": version, "bbox": bbox}


def test_gedi_check_new_scns_remote(spark, tmp_path):
    sensor = get_sensor_obj("GEDI", ParquetCatalog(spark, str(tmp_path / "cat")))
    sensor.init_sensor_db()
    t = FixtureTransport(tmp_path / "fx")
    bbox = "-10.0,100.0,-5.0,105.0"
    t.store(GEDI_FINDER_URL, _gedi_params("GEDI01_B", "001", bbox), {
        "data": [
            "https://e4ftl01.cr.usgs.gov/GEDI/GEDI01_B.001/2019.06.19/GEDI01_B_2019170155833_O02932_T02267_02_003_01.h5",
            "https://e4ftl01.cr.usgs.gov/GEDI/GEDI01_B.001/2019.06.20/GEDI01_B_2019171042447_O02941_T04188_02_003_01.h5",
        ]
    })
    t.store(GEDI_FINDER_URL, _gedi_params("GEDI02_A", "001", bbox), {
        "data": [
            "https://e4ftl01.cr.usgs.gov/GEDI/GEDI02_A.001/2019.06.19/GEDI02_A_2019170155833_O02932_T02267_02_003_01.h5",
        ]
    })
    n = sensor.check_new_scns_remote(
        t,
        products=[{"product": "GEDI01_B", "version": "001"},
                  {"product": "GEDI02_A", "version": "001"}],
        bboxes=[bbox],
    )
    assert n == 3
    rows = {r["file_name"]: r for r in sensor.scenes().collect()}
    b1 = "GEDI01_B_2019170155833_O02932_T02267_02_003_01.h5"
    assert rows[b1]["date_acquired"] == dt.date(2019, 6, 19)  # %Y%j 2019170
    assert rows[b1]["product"] == "GEDI01_B"
    assert len(t.log) == 2  # one request per (product, bbox)


def test_remote_check_empty_config_is_noop(spark, tmp_path):
    """Empty product/ROI configuration = 0 new scenes, not a crash."""
    t = FixtureTransport(tmp_path / "fx")
    gedi = get_sensor_obj("GEDI", ParquetCatalog(spark, str(tmp_path / "c1")))
    gedi.init_sensor_db()
    assert gedi.check_new_scns_remote(t, products=[], bboxes=["0,0,1,1"]) == 0
    ice = get_sensor_obj("ICESAT2", ParquetCatalog(spark, str(tmp_path / "c2")))
    ice.init_sensor_db()
    assert ice.check_new_scns_remote(
        t, products=[], geo_bounds=["0,0,1,1"], start_date=dt.datetime(2019, 1, 1)
    ) == 0
    assert ice.check_new_scns_remote(
        t, products=[{"product": "ATL03", "version": "003"}], geo_bounds=[],
        start_date=dt.datetime(2019, 1, 1),
    ) == 0


def test_http_transport_against_local_server():
    """HttpTransport drives a real (localhost) HTTP server: JSON parsing,
    query-param encoding, basic-auth header, retry-after-failure, and the
    give-up path."""
    import base64
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from eodatadown_spark.sources.transport import HttpTransport

    state = {"fails_left": 1, "requests": []}

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            state["requests"].append(
                (self.path, self.headers.get("Authorization"),
                 self.headers.get("User-Agent"))
            )
            if self.path.startswith("/flaky") and state["fails_left"] > 0:
                state["fails_left"] -= 1
                self.send_response(500)
                self.end_headers()
                return
            if self.path.startswith("/never"):
                self.send_response(503)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(_json.dumps({"ok": True, "path": self.path}).encode())

        def log_message(self, *a):  # quiet
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        tr = HttpTransport(auth=("user", "pw"), retries=2, backoff=0.05)
        out = tr.get(f"http://127.0.0.1:{port}/flaky", {"a": "x y", "b": 1})
        assert out["ok"] is True
        # param encoding + sorted order reached the server
        assert out["path"] == "/flaky?a=x+y&b=1"
        # first attempt failed (500), second succeeded
        assert len([r for r in state["requests"] if r[0].startswith("/flaky")]) == 2
        # basic auth + UA on every request
        tok = base64.b64encode(b"user:pw").decode()
        assert all(r[1] == f"Basic {tok}" for r in state["requests"])
        assert all("eodatadown-spark" in r[2] for r in state["requests"])
        # permanent failure exhausts retries and raises
        with pytest.raises(ConnectionError, match="after 3 attempts"):
            tr.get(f"http://127.0.0.1:{port}/never")
        assert len([r for r in state["requests"] if r[0].startswith("/never")]) == 3
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_transport_drives_cmr_paging_loop():
    """The full CMR page loop over live HTTP (localhost): pages served by
    page_num, loop stops on the empty page."""
    import json as _json
    import threading
    import urllib.parse
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from eodatadown_spark.sources.transport import HttpTransport, cmr_fetch_granules

    pages = {
        1: [{"id": "G1"}, {"id": "G2"}],
        2: [{"id": "G3"}],
        3: [],
    }

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            q = urllib.parse.parse_qs(urllib.parse.urlparse(self.path).query)
            pn = int(q["page_num"][0])
            self.send_response(200)
            self.end_headers()
            self.wfile.write(_json.dumps({"feed": {"entry": pages[pn]}}).encode())

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        entries = cmr_fetch_granules(
            HttpTransport(), short_name="ATL03", version="003",
            temporal="a,b", bounding_box="0,0,1,1", page_size=2,
            base_url=f"http://127.0.0.1:{port}/search/granules",
        )
        assert [e["id"] for e in entries] == ["G1", "G2", "G3"]
    finally:
        srv.shutdown()
        srv.server_close()


def test_canonical_request_is_order_insensitive():
    a = canonical_request("http://x", {"b": 2, "a": 1})
    b = canonical_request("http://x", {"a": 1, "b": 2})
    assert a == b

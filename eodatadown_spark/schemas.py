"""Explicit StructType schemas for every catalog table.

Mirrors the reference's SQLAlchemy declarative models (snake_cased):

- landsat_scenes      ← EDDLandsatGoogle   (eodatadownlandsatgoogsensor.py:69-107)
- sentinel2_scenes    ← EDDSentinel2Google (eodatadownsentinel2googsensor.py:64-101)
- sentinel1_scenes    ← EDDSentinel1ASF    (eodatadownsentinel1asf.py:67-116)
- gedi_granules       ← EDDGEDI            (eodatadownGEDIsensor.py:61-96)
- icesat2_granules    ← EDDICESAT2         (eodatadownICESAT2sensor.py:61-105)
- plugin_results      ← EDD*PlugIns        (eodatadownlandsatgoogsensor.py:109-119)
- obs_dates           ← EDDObsDates        (eodatadownsensor.py:53-61)
- obs_date_scns       ← EDDObsDatesScns    (eodatadownsensor.py:63-68)
- usage_log           ← EDDUsageLog        (eodatadownusagedb.py:46-60)
- jaxa_sar_tiles      ← EDDJAXASARTiles    (sep_utils/CreateLclJAXAFileLst.py:9-38)

JSONB columns (`extended_info`, `overviews`) are carried as JSON strings and
queried with ``get_json_object`` — the reference's only dynamic-schema escape
hatch (SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import types as T


def _f(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


# State-machine block shared by all five sensor tables
# (Downloaded → ARDProduct → DCLoaded, Invalid, ExtendedInfo; see SURVEY §1.1).
_STATE_BLOCK = [
    _f("query_date", T.TimestampType()),
    _f("download_start_date", T.TimestampType()),
    _f("download_end_date", T.TimestampType()),
    _f("downloaded", T.BooleanType()),
    _f("download_path", T.StringType()),
    _f("archived", T.BooleanType()),
    _f("ardproduct_start_date", T.TimestampType()),
    _f("ardproduct_end_date", T.TimestampType()),
    _f("ardproduct", T.BooleanType()),
    _f("ardproduct_path", T.StringType()),
    _f("dcloaded_start_date", T.TimestampType()),
    _f("dcloaded_end_date", T.TimestampType()),
    _f("dcloaded", T.BooleanType()),
    _f("invalid", T.BooleanType()),
    _f("extended_info", T.StringType()),  # JSON
    _f("reg_check", T.BooleanType()),
]

_BBOX = [
    _f("north_lat", T.DoubleType()),
    _f("south_lat", T.DoubleType()),
    _f("east_lon", T.DoubleType()),
    _f("west_lon", T.DoubleType()),
]

LANDSAT_SCENES = T.StructType(
    [
        _f("pid", T.LongType(), nullable=False),
        _f("scene_id", T.StringType()),
        _f("product_id", T.StringType()),
        _f("spacecraft_id", T.StringType()),
        _f("sensor_id", T.StringType()),
        _f("date_acquired", T.DateType()),
        _f("collection_number", T.StringType()),
        _f("collection_category", T.StringType()),
        _f("sensing_time", T.TimestampType()),
        _f("data_type", T.StringType()),
        _f("wrs_path", T.IntegerType()),
        _f("wrs_row", T.IntegerType()),
        _f("cloud_cover", T.DoubleType()),
        *_BBOX,
        _f("total_size", T.LongType()),
        _f("remote_url", T.StringType()),
        *_STATE_BLOCK,
    ]
)

SENTINEL2_SCENES = T.StructType(
    [
        _f("pid", T.LongType(), nullable=False),
        _f("granule_id", T.StringType()),
        _f("product_id", T.StringType()),
        _f("platform_id", T.StringType()),
        _f("datatake_identifier", T.StringType()),
        _f("mgrs_tile", T.StringType()),
        _f("sensing_time", T.TimestampType()),
        _f("geometric_quality_flag", T.StringType()),
        _f("generation_time", T.TimestampType()),
        _f("cloud_cover", T.DoubleType()),
        *_BBOX,
        _f("total_size", T.LongType()),
        _f("remote_url", T.StringType()),
        *_STATE_BLOCK,
    ]
)

SENTINEL1_SCENES = T.StructType(
    [
        _f("pid", T.LongType(), nullable=False),
        _f("scene_id", T.StringType()),
        _f("product_name", T.StringType()),
        _f("product_file_id", T.StringType()),  # unique ingest key (J5)
        _f("abs_orbit", T.IntegerType()),
        _f("rel_orbit", T.IntegerType()),
        _f("doppler", T.IntegerType()),
        _f("flight_direction", T.StringType()),
        _f("granule_name", T.StringType()),
        _f("granule_type", T.StringType()),
        _f("incidence_angle", T.DoubleType()),
        _f("look_direction", T.StringType()),
        _f("platform", T.StringType()),
        _f("polarization", T.StringType()),
        _f("process_date", T.TimestampType()),
        _f("process_description", T.StringType()),
        _f("process_level", T.StringType()),
        _f("process_type", T.StringType()),
        _f("process_type_disp", T.StringType()),
        _f("acquisition_date", T.TimestampType()),
        _f("sensor", T.StringType()),
        _f("begin_position", T.TimestampType()),  # watermark column
        _f("end_position", T.TimestampType()),
        *_BBOX,
        _f("remote_url", T.StringType()),
        _f("remote_filename", T.StringType()),
        _f("remote_url_md5", T.StringType()),
        _f("total_size", T.LongType()),
        *_STATE_BLOCK,
    ]
)

GEDI_GRANULES = T.StructType(
    [
        _f("pid", T.LongType(), nullable=False),
        _f("product_id", T.StringType()),
        _f("file_name", T.StringType()),
        _f("date_acquired", T.DateType()),
        _f("time_acquired", T.TimestampType()),
        _f("product", T.StringType()),
        _f("version", T.StringType()),
        *_BBOX,  # nullable: unknown until download
        _f("total_size", T.LongType()),
        _f("file_md5", T.StringType()),
        _f("remote_url", T.StringType()),
        *_STATE_BLOCK,
    ]
)

ICESAT2_GRANULES = T.StructType(
    [
        _f("pid", T.LongType(), nullable=False),
        _f("producer_id", T.StringType()),
        _f("granule_id", T.StringType()),
        _f("title", T.StringType()),
        _f("start_time", T.TimestampType()),  # per-product watermark
        _f("end_time", T.TimestampType()),
        _f("updated_time", T.TimestampType()),
        _f("product", T.StringType()),
        _f("version", T.StringType()),
        _f("online", T.BooleanType()),
        _f("original_format", T.StringType()),
        _f("orb_ascending_crossing", T.DoubleType()),
        _f("orb_start_direct", T.StringType()),
        _f("orb_start_lat", T.DoubleType()),
        _f("orb_end_direct", T.StringType()),
        _f("orb_end_lat", T.DoubleType()),
        _f("eq_cross_time", T.TimestampType()),
        _f("eq_cross_lon", T.DoubleType()),
        _f("orbit_number", T.IntegerType()),
        *_BBOX,
        _f("total_size", T.DoubleType()),
        _f("file_md5", T.StringType()),
        _f("remote_url", T.StringType()),
        *_STATE_BLOCK,
    ]
)

JAXA_SAR_TILES = T.StructType(
    [
        _f("pid", T.LongType(), nullable=False),
        _f("tile_name", T.StringType()),
        _f("parent_tile", T.StringType()),
        _f("year", T.IntegerType()),
        _f("file_name", T.StringType()),
        _f("server_file_path", T.StringType()),
        _f("instrument_name", T.StringType()),
        _f("start_date", T.TimestampType()),  # watermark / partition source
        _f("end_date", T.TimestampType()),
        _f("incident_angle_low", T.DoubleType()),
        _f("incident_angle_high", T.DoubleType()),
        *_BBOX,
        _f("remote_url", T.StringType()),
        _f("remote_url_md5", T.StringType()),
        _f("total_size", T.LongType()),
        # partial state block — the JAXA tile tracker's lifecycle stops at
        # ARD (ref sep_utils/CreateLclJAXAFileLst.py:30-38: no archived /
        # dcloaded / invalid / extended_info columns in its declarative_base)
        _f("query_date", T.TimestampType()),
        _f("download_start_date", T.TimestampType()),
        _f("download_end_date", T.TimestampType()),
        _f("downloaded", T.BooleanType()),
        _f("download_path", T.StringType()),
        _f("ardproduct_start_date", T.TimestampType()),
        _f("ardproduct_end_date", T.TimestampType()),
        _f("ardproduct", T.BooleanType()),
        _f("ardproduct_path", T.StringType()),
    ]
)

PLUGIN_RESULTS = T.StructType(
    [
        _f("scene_pid", T.LongType(), nullable=False),
        _f("plugin_name", T.StringType(), nullable=False),
        _f("start_date", T.TimestampType()),
        _f("end_date", T.TimestampType()),
        _f("completed", T.BooleanType()),
        _f("success", T.BooleanType()),
        _f("outputs", T.BooleanType()),
        _f("error", T.BooleanType()),
        _f("extended_info", T.StringType()),  # JSON
    ]
)

OBS_DATES = T.StructType(
    [
        _f("sensor_id", T.StringType(), nullable=False),
        _f("platform_id", T.StringType(), nullable=False),
        _f("obs_date", T.DateType(), nullable=False),
        _f("overview_created", T.BooleanType()),
        _f("need_update", T.BooleanType()),
        _f("invalid", T.BooleanType()),
        _f("overviews", T.StringType()),  # JSON {"250": path, ...}
    ]
)

OBS_DATE_SCNS = T.StructType(
    [
        _f("sensor_id", T.StringType(), nullable=False),
        _f("platform_id", T.StringType(), nullable=False),
        _f("obs_date", T.DateType(), nullable=False),
        _f("scene_pid", T.LongType(), nullable=False),
    ]
)

USAGE_LOG = T.StructType(
    [
        _f("id", T.LongType()),
        _f("sensor", T.StringType()),
        _f("update", T.TimestampType()),
        _f("description", T.StringType()),
        _f("updated_lcl_db", T.BooleanType()),
        _f("found_new_scns", T.BooleanType()),
        _f("new_scns_avail", T.BooleanType()),
        _f("downloaded_new_scns", T.BooleanType()),
        _f("convert_new_scns_ard", T.BooleanType()),
        _f("ingest_new_scns_to_dc", T.BooleanType()),
        _f("start_block", T.BooleanType()),
        _f("end_block", T.BooleanType()),
    ]
)

ROI_POLYGONS = T.StructType(
    [
        _f("roi_id", T.LongType(), nullable=False),
        _f("name", T.StringType()),
        _f("west_lon", T.DoubleType()),
        _f("east_lon", T.DoubleType()),
        _f("south_lat", T.DoubleType()),
        _f("north_lat", T.DoubleType()),
        _f("wkt", T.StringType()),
    ]
)

SENSOR_SCHEMAS: dict[str, T.StructType] = {
    "landsat_scenes": LANDSAT_SCENES,
    "sentinel2_scenes": SENTINEL2_SCENES,
    "sentinel1_scenes": SENTINEL1_SCENES,
    "gedi_granules": GEDI_GRANULES,
    "icesat2_granules": ICESAT2_GRANULES,
    "jaxa_sar_tiles": JAXA_SAR_TILES,
}

ALL_SCHEMAS: dict[str, T.StructType] = {
    **SENSOR_SCHEMAS,
    "plugin_results": PLUGIN_RESULTS,
    "obs_dates": OBS_DATES,
    "obs_date_scns": OBS_DATE_SCNS,
    "usage_log": USAGE_LOG,
    "roi_polygons": ROI_POLYGONS,
}

# Ingest identity key per sensor table (J5 anti-join key; SURVEY §2.3 J5).
# Landsat deviates from the reference's scene_id-only existence check
# (eodatadownlandsatgoogsensor.py:638-639) by including product_id so that
# reprocessed products ingest and the J4 keep-latest dedup picks the winner
# across batches, not only within one batch.  sensor.py consumes this dict.
INGEST_KEYS: dict[str, list[str]] = {
    "landsat_scenes": ["scene_id", "product_id"],
    "sentinel2_scenes": ["granule_id", "generation_time"],
    "sentinel1_scenes": ["product_file_id"],
    "gedi_granules": ["file_name"],
    "icesat2_granules": ["granule_id"],
    "jaxa_sar_tiles": ["server_file_path"],
}

# High-watermark column per sensor table (T1; SURVEY §2.9).
WATERMARK_COLS: dict[str, str] = {
    "landsat_scenes": "date_acquired",
    "sentinel2_scenes": "sensing_time",
    "sentinel1_scenes": "begin_position",
    "gedi_granules": "date_acquired",
    "icesat2_granules": "start_time",
    "jaxa_sar_tiles": "start_date",
}

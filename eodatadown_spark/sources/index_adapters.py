"""Source adapters for the reference's remote indexes (S1-S5).

The reference queries live services (BigQuery public datasets, ASF REST,
LPDAAC gedifinder, NASA CMR).  The engine separates *transport* (driver-side
HTTP fetch / local fixture file — injectable) from *normalization* (the
Spark plans in this module).  Each adapter takes a raw DataFrame shaped like
the remote payload and produces rows matching the catalog schema, with all
the reference's parsing semantics (C1-C3, C9, C14) as column expressions.

Ingest-filter pushdown: the reference compiles its predicates into BigQuery
SQL (eodatadownlandsatgoogsensor.py:552-628).  Here the same predicates are
plain `.where` clauses on the source DataFrame — Catalyst pushes them into
the parquet/JSON scan, which is the moral equivalent.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from eodatadown_spark.functions.geo import wkt_polygon_bbox
from eodatadown_spark.functions.timeparse import parse_timestamp_multi


def landsat_index_scenes(
    raw: DataFrame,
    wrs_tiles: Sequence[tuple[int, int]] = (),
    cloud_thres: float | None = None,
    spacecraft: Sequence[str] = (),
    collection_cats: Sequence[str] = (),
    months: Sequence[int] = (),
) -> DataFrame:
    """S1: normalize the BigQuery `landsat_index` shape + apply the ingest
    predicate stack (F1-F6), mirroring the SQL the reference builds at
    eodatadownlandsatgoogsensor.py:552-628."""
    df = raw.select(
        F.col("scene_id"),
        F.col("product_id"),
        F.col("spacecraft_id"),
        F.col("sensor_id"),
        F.to_date("date_acquired").alias("date_acquired"),  # C1 string date
        parse_timestamp_multi("sensing_time").alias("sensing_time"),
        F.col("collection_number"),
        F.col("collection_category"),
        F.col("data_type"),
        F.col("wrs_path").try_cast("int").alias("wrs_path"),
        F.col("wrs_row").try_cast("int").alias("wrs_row"),
        F.col("cloud_cover").try_cast("double").alias("cloud_cover"),
        F.col("north_lat").try_cast("double").alias("north_lat"),
        F.col("south_lat").try_cast("double").alias("south_lat"),
        F.col("east_lon").try_cast("double").alias("east_lon"),
        F.col("west_lon").try_cast("double").alias("west_lon"),
        F.col("total_size").try_cast("long").alias("total_size"),
        F.col("base_url").alias("remote_url"),
    )
    if cloud_thres is not None:
        df = df.where(F.col("cloud_cover") < F.lit(cloud_thres))  # BigQuery-side '<'
    if spacecraft:
        df = df.where(F.col("spacecraft_id").isin(list(spacecraft)))
    if collection_cats:
        df = df.where(F.col("collection_category").isin(list(collection_cats)))
    if months:
        df = df.where(F.month("date_acquired").isin(list(months)))
    if wrs_tiles:
        # F5: OR-of-conjuncts tile filter as a broadcast join against the
        # (small) tile list — scales better than a giant OR chain
        tiles = df.sparkSession.createDataFrame(
            list(wrs_tiles), "wrs_path int, wrs_row int"
        )
        df = df.join(F.broadcast(tiles), ["wrs_path", "wrs_row"], "left_semi")
    return df


def sentinel2_index_scenes(
    raw: DataFrame,
    mgrs_tiles: Sequence[str] = (),
    cloud_thres: float | None = None,
) -> DataFrame:
    """S2: `sentinel_2_index` shape — CAST(cloud_cover AS NUMERIC) (string in
    source), PARSE_DATETIME watermarks, platform derived from the datatake
    identifier ('GS2A' substring → Sentinel2A; F14,
    eodatadownsentinel2googsensor.py:540-545)."""
    df = raw.select(
        F.col("granule_id"),
        F.col("product_id"),
        F.when(F.col("datatake_identifier").contains("GS2A"), "Sentinel2A")
        .when(F.col("datatake_identifier").contains("GS2B"), "Sentinel2B")
        .otherwise("Sentinel2")
        .alias("platform_id"),
        F.col("datatake_identifier"),
        F.col("mgrs_tile"),
        parse_timestamp_multi("sensing_time").alias("sensing_time"),
        F.col("geometric_quality_flag"),
        parse_timestamp_multi("generation_time").alias("generation_time"),
        F.col("cloud_cover").try_cast("double").alias("cloud_cover"),  # C9 safe-cast
        F.col("north_lat").try_cast("double").alias("north_lat"),
        F.col("south_lat").try_cast("double").alias("south_lat"),
        F.col("east_lon").try_cast("double").alias("east_lon"),
        F.col("west_lon").try_cast("double").alias("west_lon"),
        F.col("total_size").try_cast("long").alias("total_size"),
        F.col("base_url").alias("remote_url"),
    )
    if cloud_thres is not None:
        df = df.where(F.col("cloud_cover") <= F.lit(cloud_thres))
    if mgrs_tiles:
        df = df.where(F.col("mgrs_tile").isin(list(mgrs_tiles)))
    return df


def asf_search_scenes(raw: DataFrame) -> DataFrame:
    """S3: ASF REST JSON array → sentinel1 catalog rows.

    Parsing parity (eodatadownsentinel1asf.py:446-489): bbox derived from
    the WKT `stringFootprint` (C14); `incidenceAngle` arrives as a string
    sometimes 'NA' → safe-cast null (C9); timestamps via the multi-format
    ladder (C3); sizeMB string → bytes.
    """
    bbox = wkt_polygon_bbox("stringFootprint")
    return raw.select(
        F.col("sceneId").alias("scene_id"),
        F.col("productName").alias("product_name"),
        F.col("product_file_id"),
        F.col("absoluteOrbit").try_cast("int").alias("abs_orbit"),
        F.col("relativeOrbit").try_cast("int").alias("rel_orbit"),
        F.col("doppler").try_cast("int").alias("doppler"),
        F.col("flightDirection").alias("flight_direction"),
        F.col("granuleName").alias("granule_name"),
        F.col("granuleType").alias("granule_type"),
        F.col("incidenceAngle").try_cast("double").alias("incidence_angle"),
        F.col("lookDirection").alias("look_direction"),
        F.col("platform"),
        F.col("polarization"),
        parse_timestamp_multi("processingDate").alias("process_date"),
        F.col("processingDescription").alias("process_description"),
        F.col("processingLevel").alias("process_level"),
        F.col("processingType").alias("process_type"),
        F.col("processingTypeDisplay").alias("process_type_disp"),
        parse_timestamp_multi("sceneDate").alias("acquisition_date"),
        F.col("sensor"),
        parse_timestamp_multi("startTime").alias("begin_position"),
        parse_timestamp_multi("stopTime").alias("end_position"),
        bbox.getField("north_lat").alias("north_lat"),
        bbox.getField("south_lat").alias("south_lat"),
        bbox.getField("east_lon").alias("east_lon"),
        bbox.getField("west_lon").alias("west_lon"),
        F.col("downloadUrl").alias("remote_url"),
        F.col("fileName").alias("remote_filename"),
        F.col("md5sum").alias("remote_url_md5"),
        (F.col("sizeMB").try_cast("double") * 1024 * 1024).cast("long").alias("total_size"),
    )


def gedi_finder_granules(raw: DataFrame, product: str, version: str) -> DataFrame:
    """S4: LPDAAC gedifinder URL list → granule rows; acquisition date parsed
    from the filename's `%Y%j` field (C2, eodatadownGEDIsensor.py:403-417)."""
    file_name = F.element_at(F.split(F.col("url"), "/"), -1)
    date_field = F.split(file_name, "_").getItem(2)
    return raw.select(
        file_name.alias("file_name"),
        F.to_date(F.substring(date_field, 1, 7), "yyyyDDD").alias("date_acquired"),
        F.to_timestamp(F.substring(date_field, 1, 13), "yyyyDDDHHmmss").alias("time_acquired"),
        F.lit(product).alias("product"),
        F.lit(version).alias("version"),
        F.col("url").alias("remote_url"),
    ).withColumn("product_id", F.regexp_replace("file_name", "\\.h5$", ""))


def cmr_granules(raw: DataFrame) -> DataFrame:
    """S5: NASA CMR `feed.entry[]` → icesat2 granule rows.

    Geometry parity (eodatadownICESAT2sensor.py:600-651): bbox from `boxes`
    ("S W N E" strings) when present, else min/max over `polygons`
    ("lat lon lat lon ..." strings); entries with neither and size ≤ 4.0 MB
    are invalid and dropped.  Pagination is a transport concern: the fetcher
    unions pages before calling this.
    """
    box = F.split(F.element_at(F.col("boxes"), 1), "\\s+")
    poly_nums = F.split(F.trim(F.element_at(F.col("polygons"), 1)), "\\s+")
    idx = F.sequence(F.lit(1), F.size(poly_nums))
    poly_lats = F.filter(
        F.zip_with(poly_nums, idx, lambda v, i: F.when(i % 2 == 1, v.cast("double"))),
        lambda v: v.isNotNull(),
    )
    poly_lons = F.filter(
        F.zip_with(poly_nums, idx, lambda v, i: F.when(i % 2 == 0, v.cast("double"))),
        lambda v: v.isNotNull(),
    )
    has_boxes = F.col("boxes").isNotNull() & (F.size("boxes") > 0)
    has_polys = F.col("polygons").isNotNull() & (F.size("polygons") > 0)
    extra = []
    if "links" in raw.columns:
        # remote_url: the x-hdfeos dataset link (ref :663-672)
        hdfeos = F.filter(
            F.col("links"), lambda lk: lk.getField("type") == "application/x-hdfeos"
        )
        extra.append(
            F.when(F.size(hdfeos) > 0, F.element_at(hdfeos, 1).getField("href"))
            .alias("remote_url")
        )
    df = raw.select(
        *extra,
        F.col("producer_granule_id").alias("producer_id"),
        F.col("id").alias("granule_id"),
        F.col("title"),
        parse_timestamp_multi("time_start").alias("start_time"),
        parse_timestamp_multi("time_end").alias("end_time"),
        parse_timestamp_multi("updated").alias("updated_time"),
        F.col("original_format"),
        F.col("online_access_flag").try_cast("boolean").alias("online"),
        F.col("granule_size").try_cast("double").alias("total_size"),
        F.when(has_boxes, F.element_at(box, 3).cast("double"))
        .when(has_polys, F.array_max(poly_lats))
        .alias("north_lat"),
        F.when(has_boxes, F.element_at(box, 1).cast("double"))
        .when(has_polys, F.array_min(poly_lats))
        .alias("south_lat"),
        F.when(has_boxes, F.element_at(box, 4).cast("double"))
        .when(has_polys, F.array_max(poly_lons))
        .alias("east_lon"),
        F.when(has_boxes, F.element_at(box, 2).cast("double"))
        .when(has_polys, F.array_min(poly_lons))
        .alias("west_lon"),
        has_boxes.alias("__has_boxes"),
        has_polys.alias("__has_polys"),
    )
    # invalid-granule path: no geometry and tiny size → drop (ref :651-660)
    df = df.where(
        F.col("__has_boxes")
        | F.col("__has_polys")
        | (F.coalesce(F.col("total_size"), F.lit(0.0)) > 4.0)
    )
    return df.drop("__has_boxes", "__has_polys")

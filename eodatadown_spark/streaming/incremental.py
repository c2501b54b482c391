"""Incremental / streaming ingest semantics (T1-T5).

The reference runs batch-on-cron with stored high-watermarks; the same
semantics are offered two ways:

- batch: :func:`eodatadown_spark.ingest.watermark` +
  :func:`filter_above_watermark` (T1), dropDuplicates-on-key (T2),
  keep-latest window (T3);
- streaming: a Structured Streaming pipeline over a file source with
  event-time watermarking and keyed dedup, for when the catalog feed is a
  real stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_ingest(
    spark: SparkSession,
    path: str,
    schema,
    ts_col: str,
    key_cols: list[str],
    lateness: str = "1 day",
) -> DataFrame:
    """readStream → watermark → keyed dedup: T1+T2 as a live stream.

    `dropDuplicates` under a watermark keeps state bounded — late duplicates
    beyond `lateness` age out of the state store (the streaming analog of the
    reference's idempotent keyed insert J5).
    """
    return (
        spark.readStream.schema(schema)
        .parquet(path)
        .withWatermark(ts_col, lateness)
        .dropDuplicates([*key_cols, ts_col])
    )


def stream_dedup_fingerprint(
    spark: SparkSession,
    path: str,
    schema,
    ts_col: str,
    text_col: str = "text",
    lateness: str = "1 day",
) -> DataFrame:
    """Streaming exact-dedup for a document feed: md5 content fingerprint →
    ``dropDuplicatesWithinWatermark`` on the fingerprint.

    The training-data dedup pass as a live stream: the first arrival of each
    content fingerprint survives; re-arrivals within the watermark horizon
    are dropped, and fingerprint state ages out past `lateness` — bounded
    state at any corpus rate, unlike a plain dropDuplicates whose key state
    grows forever.
    """
    from eodatadown_spark.operators.text import fingerprint

    return (
        spark.readStream.schema(schema)
        .parquet(path)
        .withColumn("__fp", fingerprint(F.col(text_col)))
        .withWatermark(ts_col, lateness)
        .dropDuplicatesWithinWatermark(["__fp"])
        .drop("__fp")
    )


def windowed_event_counts(
    events: DataFrame, ts_col: str = "ts", window: str = "1 hour", lateness: str = "1 day"
) -> DataFrame:
    """Tumbling-window per-type counts with late-data handling — the
    monitoring-cadence rollup (T5) as a streaming agg; also valid on a batch
    DataFrame (window() works in both modes)."""
    return (
        events.withWatermark(ts_col, lateness)
        if events.isStreaming
        else events
    ).groupBy(
        F.window(F.col(ts_col), window).alias("win"), F.col("event_type")
    ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))


def session_blocks(usage_log: DataFrame) -> DataFrame:
    """T4: reconstruct start/end blocks from the append-only usage log —
    running count of start_block markers forms the session id (window
    cumulative sum), mirroring the reference's StartBlock/EndBlock bracket
    convention (eodatadownusagedb.py:86-114)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("sensor")
        .orderBy("update", "id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return usage_log.withColumn(
        "session_id",
        F.sum(F.when(F.col("start_block") == True, 1).otherwise(0)).over(w),  # noqa: E712
    )

"""Custom stateful streaming operators (T1/T5 as real streams).

`running_watermark_stream` keeps the per-sensor high-watermark as managed
state in a Structured Streaming query (`applyInPandasWithState`): each
micro-batch emits only rows strictly above the stored watermark, then
advances it — the reference's `check_new_scns` incremental contract
(eodatadownlandsatgoogsensor.py:536-543) running continuously instead of on
cron.

`stream_asof_enrich` is the stateful-stream as-of: per-key state holds the
latest-known right row and every left event is emitted enriched with it —
semantics Spark's built-in stream-stream joins cannot express (they buffer
bounded time windows; as-of needs "latest value ever", O(#keys) state).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "sensor string, key string, ts timestamp"
STATE_SCHEMA = "wm timestamp"


def _advance_watermark(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
):
    wm = state.get[0] if state.exists else None
    out = []
    for pdf in batches:
        pdf = pdf.sort_values("ts")
        fresh = pdf if wm is None else pdf[pdf["ts"] > wm]
        if len(fresh):
            out.append(fresh[["sensor", "key", "ts"]])
            new_wm = fresh["ts"].max()
            wm = new_wm if wm is None or new_wm > wm else wm
    if wm is not None:
        state.update((wm,))
    yield pd.concat(out) if out else pd.DataFrame(
        {"sensor": pd.Series(dtype="object"),
         "key": pd.Series(dtype="object"),
         "ts": pd.Series(dtype="datetime64[ns]")}
    )


def running_watermark_stream(events: DataFrame) -> DataFrame:
    """events(sensor, key, ts) stream → rows above each sensor's running
    high-watermark, with the watermark held in keyed state."""
    return events.groupBy("sensor").applyInPandasWithState(
        _advance_watermark,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ASOF_OUTPUT_SCHEMA = (
    "user_id long, event_id long, ts timestamp, right_ts timestamp, right_value double"
)
ASOF_STATE_SCHEMA = "rts timestamp, rval double"


def _enrich_with_latest(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
):
    """Per-key state = the latest-known right row (ts, value); left rows are
    emitted enriched with it.  Within a micro-batch rows are processed in
    timestamp order, so a right update enriches only the left rows at or
    after it, exactly like the batch as-of."""
    rts, rval = (state.get if state.exists else (None, None))
    out = []
    for pdf in batches:
        pdf = pdf.sort_values(["ts", "side"])  # right (0) before left at ties
        rows = []
        for row in pdf.itertuples(index=False):
            if row.side == 0:
                if rts is None or row.ts >= rts:
                    rts, rval = row.ts, row.right_value
            else:
                rows.append(
                    (key[0], row.event_id, row.ts, rts, rval)
                )
        if rows:
            out.append(pd.DataFrame(
                rows, columns=["user_id", "event_id", "ts", "right_ts", "right_value"]
            ))
    if rts is not None:
        state.update((rts, rval))
    yield pd.concat(out) if out else pd.DataFrame(
        {"user_id": pd.Series(dtype="int64"),
         "event_id": pd.Series(dtype="int64"),
         "ts": pd.Series(dtype="datetime64[ns]"),
         "right_ts": pd.Series(dtype="datetime64[ns]"),
         "right_value": pd.Series(dtype="float64")}
    )


def stream_asof_enrich(left: DataFrame, right: DataFrame) -> DataFrame:
    """Streaming as-of enrichment: each left event picks up the
    latest-known right row for its key (most recent profile/quote/config),
    held in ``applyInPandasWithState`` keyed state — the stateful-stream
    counterpart of :func:`eodatadown_spark.operators.temporal.asof_join`,
    which Spark's built-in stream-stream joins cannot express (they buffer
    bounded windows; as-of needs "latest value ever").

    Contract: left(user_id, event_id, ts), right(user_id, ts, value) →
    (user_id, event_id, ts, right_ts, right_value).  Semantics are
    enrich-at-arrival: within a micro-batch rows apply in timestamp order
    (ties: right first — the batch operator's inclusive mode), across
    batches a left row sees the state as of its batch, and a stale right
    arrival (older than the stored one) never regresses the state.  State
    is one row per key, O(#keys) total — no watermark needed to bound it.
    """
    import pyspark.sql.functions as F

    l_tag = left.select(
        "user_id", "event_id", "ts",
        F.lit(None).cast("double").alias("right_value"),
        F.lit(1).alias("side"),
    )
    r_tag = right.select(
        "user_id",
        F.lit(None).cast("long").alias("event_id"),
        "ts",
        F.col("value").alias("right_value"),
        F.lit(0).alias("side"),
    )
    return l_tag.unionByName(r_tag).groupBy("user_id").applyInPandasWithState(
        _enrich_with_latest,
        outputStructType=ASOF_OUTPUT_SCHEMA,
        stateStructType=ASOF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

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

Chunking note: `applyInPandasWithState` delivers one key's micro-batch data
as SEVERAL Arrow chunks (maxRecordsPerBatch) with no cross-chunk ordering
guarantee, so both kernels concatenate the chunks and sort ONCE before
applying state — per-chunk processing would make output depend on arbitrary
chunk split points.  Memory is bounded by one key's share of one
micro-batch (tune trigger size for pathological hot keys).
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
    chunks = [pdf for pdf in batches if len(pdf)]
    if not chunks:
        yield pd.DataFrame(
            {"sensor": pd.Series(dtype="object"),
             "key": pd.Series(dtype="object"),
             "ts": pd.Series(dtype="datetime64[ns]")}
        )
        return
    pdf = pd.concat(chunks).sort_values("ts")
    fresh = pdf if wm is None else pdf[pdf["ts"] > wm]
    if len(fresh):
        new_wm = fresh["ts"].max()
        wm = new_wm if wm is None or new_wm > wm else wm
    if wm is not None:
        state.update((wm,))
    yield fresh[["sensor", "key", "ts"]] if len(fresh) else pd.DataFrame(
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


def stream_asof_enrich(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    left_id_col: str = "event_id",
    ts_col: str = "ts",
    value_col: str = "value",
    value_type: str = "double",
) -> DataFrame:
    """Streaming as-of enrichment: each left event picks up the
    latest-known right row for its key (most recent profile/quote/config),
    held in ``applyInPandasWithState`` keyed state — the stateful-stream
    counterpart of :func:`eodatadown_spark.operators.temporal.asof_join`,
    which Spark's built-in stream-stream joins cannot express (they buffer
    bounded windows; as-of needs "latest value ever").

    Contract: left(key, id, ts), right(key, ts, value) →
    (key, id, ts, right_ts, right_value); all column names and the value
    type are parameters (the batch operator's flexibility).  Semantics are
    enrich-at-arrival: within a micro-batch rows apply in timestamp order
    (ties: right first — the batch operator's inclusive mode), across
    batches a left row sees the state as of its batch, and a stale right
    arrival (older than the stored one) never regresses the state.  State
    is one row per key, O(#keys) total — no watermark needed to bound it.
    """
    import pyspark.sql.functions as F

    left_id_type = dict(left.dtypes)[left_id_col]
    # backtick-quote caller-supplied names: the DDL parser rejects bare
    # names containing spaces/hyphens etc.
    out_schema = (
        f"`{key_col}` {dict(left.dtypes)[key_col]}, "
        f"`{left_id_col}` {left_id_type}, `{ts_col}` timestamp, "
        f"right_ts timestamp, right_value {value_type}"
    )
    state_schema = f"rts timestamp, rval {value_type}"
    out_cols = [key_col, left_id_col, ts_col, "right_ts", "right_value"]

    def _enrich(key: tuple, batches: Iterable[pd.DataFrame], state: GroupState):
        rts, rval = (state.get if state.exists else (None, None))
        chunks = [pdf for pdf in batches if len(pdf)]
        rows = []
        if chunks:
            # one concat + sort across ALL chunks: per-chunk processing
            # would depend on arbitrary Arrow chunk boundaries
            pdf = pd.concat(chunks).sort_values([ts_col, "side"])
            # positional access (name=None): named itertuples mangles column
            # names that aren't valid Python identifiers (e.g. "event-id"),
            # which would break the parameterized column-name contract
            i_ts = pdf.columns.get_loc(ts_col)
            i_side = pdf.columns.get_loc("side")
            i_id = pdf.columns.get_loc(left_id_col)
            i_rv = pdf.columns.get_loc("right_value")
            for row in pdf.itertuples(index=False, name=None):
                ts = row[i_ts]
                if row[i_side] == 0:
                    if rts is None or ts >= rts:
                        rts, rval = ts, row[i_rv]
                else:
                    rows.append((key[0], row[i_id], ts, rts, rval))
        if rts is not None:
            state.update((rts, rval))
        yield (
            pd.DataFrame(rows, columns=out_cols)
            if rows
            else pd.DataFrame({c: pd.Series(dtype="object") for c in out_cols})
        )

    l_tag = left.select(
        F.col(key_col),
        F.col(left_id_col),
        F.col(ts_col),
        F.lit(None).cast(value_type).alias("right_value"),
        F.lit(1).alias("side"),
    )
    r_tag = right.select(
        F.col(key_col),
        F.lit(None).cast(left_id_type).alias(left_id_col),
        F.col(ts_col),
        F.col(value_col).alias("right_value"),
        F.lit(0).alias("side"),
    )
    return l_tag.unionByName(r_tag).groupBy(key_col).applyInPandasWithState(
        _enrich,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

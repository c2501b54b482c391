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


def stream_sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Stateful streaming sessionization emitting CLOSED sessions →
    (user, session_start, session_end, n_events).  The session-lifecycle
    semantics Spark's built-in ``session_window`` aggregate cannot give in
    append mode without also aggregating: here each emitted row is a
    finalized session, closed either by a later in-stream event beyond
    the gap or by the event-time watermark passing ``last_event + gap``
    (``GroupStateTimeout.EventTimeTimeout``), so downstream sinks receive
    exactly-once session records as they complete.

    Gap semantics match :func:`..incremental.sessionize` (a gap strictly
    greater than ``gap`` splits; equality stays in-session), so a
    batch-vs-stream parity check is a per-(user, session_id) rollup of
    the batch operator.  State is one open session per user — O(#users),
    bounded; late events inside the watermark merge into the open
    session when they land within ``gap`` of it, and close as their OWN
    session(s) when they fall more than ``gap`` before the open start
    (batch parity — the batch operator would split there); events past
    the watermark are dropped before the kernel.
    """
    gap_secs = pd.Timedelta(gap).total_seconds()
    gap_ms = int(gap_secs * 1000)
    user_type = dict(events.dtypes)[user_col]
    out_schema = (
        f"`{user_col}` {user_type}, session_start timestamp, "
        f"session_end timestamp, n_events bigint"
    )
    out_cols = [user_col, "session_start", "session_end", "n_events"]

    def _empty() -> pd.DataFrame:
        return pd.DataFrame(
            {
                user_col: pd.Series(dtype="object"),
                "session_start": pd.Series(dtype="datetime64[ns]"),
                "session_end": pd.Series(dtype="datetime64[ns]"),
                "n_events": pd.Series(dtype="int64"),
            }
        )

    def _kernel(key: tuple, batches: Iterable[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame([(key[0], start, last, n)], columns=out_cols)
            return
        start = last = None
        n = 0
        if state.exists:
            start, last, n = state.get
            # state round-trips as python datetime; batch rows are pandas
            # Timestamps — normalize so min/max/epoch math is one type
            start, last = pd.Timestamp(start), pd.Timestamp(last)
        closed = []
        # accumulator for late events MORE than gap before the open
        # session's start (admissible when watermark_delay > gap): batch
        # parity demands they form their OWN session(s), never a backward
        # extension of the open one — (lstart, llast, ln)
        late = None
        chunks = [pdf for pdf in batches if len(pdf)]
        if chunks:
            # one concat + sort across all Arrow chunks (see module note)
            pdf = pd.concat(chunks).sort_values(ts_col)
            for ts in pdf[ts_col]:
                if start is None:
                    start, last, n = ts, ts, 1
                elif ts < start:
                    # late arrival before the open session's start
                    if (start - ts).total_seconds() <= gap_secs:
                        # within gap of the open start: genuine backward
                        # extension (the batch operator, seeing the true
                        # global order, would merge it too)
                        start = ts
                        n += 1
                    elif late is None:
                        late = (ts, ts, 1)
                    elif (ts - late[1]).total_seconds() <= gap_secs:
                        late = (late[0], ts, late[2] + 1)
                    else:
                        closed.append((key[0], *late))
                        late = (ts, ts, 1)
                elif (ts - last).total_seconds() > gap_secs:
                    closed.append((key[0], start, last, n))
                    start, last, n = ts, ts, 1
                else:
                    # in-gap forward step or event inside [start, last]
                    last = max(last, ts)
                    n += 1
        if late is not None:
            # sorted iteration means backward extensions may have pulled
            # the open start down to within gap of the late block's tail —
            # then the whole block chains into the open session; otherwise
            # it closes as its own session, exactly as the batch operator
            # splits the globally-sorted stream
            if start is not None and (start - late[1]).total_seconds() <= gap_secs:
                start = late[0]
                n += late[2]
            else:
                closed.append((key[0], *late))
        if start is not None:
            state.update((start, last, n))
            # epoch via an explicit UTC localization: the engine runs UTC
            # session time so stream timestamps are UTC-naive, but a bare
            # .timestamp() on a python datetime read back from state would
            # use the OS timezone — normalize through pandas first
            last_utc = pd.Timestamp(last).tz_localize("UTC")
            state.setTimeoutTimestamp(
                int(last_utc.timestamp() * 1000) + gap_ms
            )
        yield (
            pd.DataFrame(closed, columns=out_cols) if closed else _empty()
        )

    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(user_col)
        .applyInPandasWithState(
            _kernel,
            outputStructType=out_schema,
            stateStructType="start timestamp, last timestamp, n bigint",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )

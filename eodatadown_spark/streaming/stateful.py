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
    the batch operator.

    State is the per-user list of ALIVE sessions — every session whose
    ``end + gap`` the event-time watermark has not yet passed, which is
    the exact set a still-admissible late event could merge into or
    bridge.  Each batch folds its events into that list by interval
    merging (sort by start; chain while the gap between neighbours is
    ≤ ``gap``), which reproduces batch sessionization over the union of
    all admissible events regardless of arrival order or batch
    boundaries: late blocks more than ``gap`` before the open session
    stay alive as their own sessions until the watermark seals them, so
    a later micro-batch can still extend or bridge them (the round-6
    ADVICE scenario).  A session is emitted exactly once, when the
    watermark passes ``end + gap`` — no admissible event can reach it
    after that (admissible ts ≥ watermark > end + gap), so emitted
    records are final.  State size is O(#users × sessions-inside-one-
    watermark-delay), bounded by the watermark delay.  The only
    remaining batch-parity gap is inherent to streaming: events older
    than the watermark are dropped before the kernel.
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

    def _epoch_ms(ts) -> int:
        # epoch via an explicit UTC localization: the engine runs UTC
        # session time so stream timestamps are UTC-naive, but a bare
        # .timestamp() on a python datetime read back from state would
        # use the OS timezone — normalize through pandas first
        return int(pd.Timestamp(ts).tz_localize("UTC").timestamp() * 1000)

    def _kernel(key: tuple, batches: Iterable[pd.DataFrame], state: GroupState):
        # alive sessions as [start, last, n], sorted by start, pairwise
        # separated by more than gap (invariant of the merge below)
        sessions: list[list] = []
        if state.exists:
            starts, lasts, ns = state.get
            # state round-trips as python datetime; batch rows are pandas
            # Timestamps — normalize so min/max/epoch math is one type
            sessions = [
                [pd.Timestamp(s), pd.Timestamp(l), int(c)]
                for s, l, c in zip(starts, lasts, ns)
            ]
        if state.hasTimedOut:
            # timeout fires when the watermark passes max(last)+gap with
            # no new data for the key — every alive session is sealed
            state.remove()
            yield pd.DataFrame(
                [(key[0], s, l, c) for s, l, c in sessions], columns=out_cols
            )
            return
        chunks = [pdf for pdf in batches if len(pdf)]
        if chunks:
            # one concat + sort across all Arrow chunks (see module note);
            # fold each event into the alive-session list by interval
            # merge — sessions arrive sorted and events are iterated in
            # ascending order, so a single forward scan with bisect-free
            # appends reproduces batch sessionization exactly
            pdf = pd.concat(chunks).sort_values(ts_col)
            items = [[s, l, c] for s, l, c in sessions]
            items += [[ts, ts, 1] for ts in pdf[ts_col]]
            items.sort(key=lambda it: (it[0], it[1]))
            merged: list[list] = []
            for it in items:
                if merged and (it[0] - merged[-1][1]).total_seconds() <= gap_secs:
                    # within gap of the previous block: chain (an event
                    # INSIDE a session interval also lands here, since
                    # its start precedes the session's last)
                    merged[-1][1] = max(merged[-1][1], it[1])
                    merged[-1][2] += it[2]
                else:
                    merged.append(it)
            sessions = merged
        # seal every session the watermark has passed: no admissible
        # event (ts ≥ watermark) can be within gap of its end anymore
        wm_ms = state.getCurrentWatermarkMs()
        closed = [
            (key[0], s, l, c)
            for s, l, c in sessions
            if _epoch_ms(l) + gap_ms < wm_ms
        ]
        alive = [it for it in sessions if _epoch_ms(it[1]) + gap_ms >= wm_ms]
        if alive:
            state.update((
                [it[0] for it in alive],
                [it[1] for it in alive],
                [it[2] for it in alive],
            ))
            state.setTimeoutTimestamp(_epoch_ms(alive[-1][1]) + gap_ms)
        elif state.exists:
            state.remove()
        yield (
            pd.DataFrame(closed, columns=out_cols) if closed else _empty()
        )

    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(user_col)
        .applyInPandasWithState(
            _kernel,
            outputStructType=out_schema,
            stateStructType=(
                "starts array<timestamp>, lasts array<timestamp>, "
                "ns array<bigint>"
            ),
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )

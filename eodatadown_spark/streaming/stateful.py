"""Custom stateful streaming operators (T1/T5 as real streams).

`running_watermark_stream` keeps the per-sensor high-watermark as managed
state in a Structured Streaming query (`applyInPandasWithState`): each
micro-batch emits only rows strictly above the stored watermark, then
advances it — the reference's `check_new_scns` incremental contract
(eodatadownlandsatgoogsensor.py:536-543) running continuously instead of on
cron.
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

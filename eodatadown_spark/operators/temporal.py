"""Temporal join operators: as-of join, bounded range join, native session
windows.

Spark has no first-class as-of join (pandas ``merge_asof`` exists only via
``applyInPandas``, which serializes every row through Python).  The engine
implements the scalable formulations instead:

- :func:`asof_join` — union + keyed window ``last(ignorenulls)``: one shuffle
  on the key, whole-stage codegen, no Python.  The standard big-data as-of
  shape (events → most recent quote/config/signup at or before each event).
- :func:`range_join` — bounded interval self/two-table join via time
  bucketing: candidates meet on (key, bucket) equi-keys instead of a
  nested-loop theta join, with the exact predicate applied after.  Candidate
  volume scales with events-per-bucket, not n².
- :func:`session_window_rollup` — Spark's native ``session_window`` gap
  windows (batch + streaming capable), the built-in counterpart of
  :func:`eodatadown_spark.streaming.incremental.sessionize`.  Boundary
  semantics verified empirically to MATCH sessionize: a gap exactly equal
  to the duration stays in-session; only a strictly greater gap starts a
  new one (tests/test_operators.py pins both at ±1 µs).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_value_cols: Sequence[str] = (),
    allow_exact_matches: bool = True,
    suffix: str = "_right",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: each left row gains the right row's timestamp
    (``<right_ts><suffix>``) and ``right_value_cols`` from the matched
    right row with the same keys; NULLs when none exists (left-join
    semantics).  ``direction`` picks the match (pandas ``merge_asof``
    contract):

    - ``"backward"`` (default) — most recent right row with
      ``right.ts <= left.ts`` (``<`` when ``allow_exact_matches=False``);
    - ``"forward"`` — earliest right row with ``right.ts >= left.ts``
      (``>`` when strict);
    - ``"nearest"`` — whichever of the two is closer in time (ties and
      equal distance resolve backward, matching pandas).

    Shape: tag both inputs, union, one window per key ordered by
    (ts, side-marker) taking ``last(ignorenulls)`` of ONE struct packing the
    right row's timestamp + values, keep left rows.  The struct is what
    makes per-column semantics correct: it is non-null exactly on right rows
    (never on the left-side filler), so every filled column comes from the
    SAME matched right row, and a legitimately-NULL value column propagates
    as NULL instead of leaking an older row's value (pandas
    ``merge_asof``-compatible).  Exactly one shuffle (the window
    partitioning); both inputs stream through whole-stage codegen — no
    pandas, no per-key loops, no broadcast requirement on either side.  At
    equal timestamps the marker orders right rows before left rows
    (inclusive) or after (strict).

    Ties between right rows at identical (key, ts) resolve to the one last
    in the union sort (backward) / first (forward) — pass pre-deduplicated
    right input when value columns must be deterministic under such ties.

    All three directions keep the single-shuffle union+window shape.
    ``nearest`` evaluates both frames over the same key partitioning —
    one exchange, but the two frames order by OPPOSITE tie markers, so
    the plan sorts the unioned input twice (inherent to inclusive
    semantics on both sides; strictness of a frame endpoint is decided by
    sort position, and one sort order cannot put right rows both before
    and after their equal-ts left rows).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof direction {direction!r}")
    key_cols = list(key_cols)
    lcols = left.columns
    ldt = dict(left.dtypes)
    rv_out = [(right_ts, right_ts + suffix)] + [
        (c, c + suffix) for c in right_value_cols
    ]
    clashes = sorted({dst for _, dst in rv_out} & set(lcols))
    if clashes:
        raise ValueError(
            f"asof_join output column(s) {clashes} already exist on the left "
            f"side — pass a different suffix (current: {suffix!r}) to avoid "
            "silent duplicate column names"
        )
    rstruct_t = ", ".join(
        f"`{dst}`: {dict(right.dtypes)[src]}" for src, dst in rv_out
    )
    left_proj = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast(f"struct<{rstruct_t}>").alias("__rv"),
        F.lit(1).alias("__is_left"),
    )
    right_proj = right.select(
        *[
            (F.col(c) if c in key_cols else F.lit(None).cast(ldt[c])).alias(c)
            for c in lcols
        ],
        F.col(right_ts).alias("__ts"),
        F.struct(*[F.col(src).alias(dst) for src, dst in rv_out]).alias("__rv"),
        F.lit(0).alias("__is_left"),
    )
    # tie markers: the frame endpoints are row-based, so whether an
    # equal-timestamp right row is visible from a left row is decided by
    # the sort position of right (0) vs left (1) rows — backward-inclusive
    # wants right first; forward-inclusive wants right after the left row
    marker_bw = F.col("__is_left").asc() if allow_exact_matches else F.col("__is_left").desc()
    marker_fw = F.col("__is_left").desc() if allow_exact_matches else F.col("__is_left").asc()
    w_bw = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("__ts").asc(), marker_bw)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fw = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("__ts").asc(), marker_fw)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    bw = F.last("__rv", ignorenulls=True).over(w_bw)
    fw = F.first("__rv", ignorenulls=True).over(w_fw)
    if direction == "backward":
        matched = bw
    elif direction == "forward":
        matched = fw
    else:
        ts_us = F.unix_micros(F.col("__ts").cast("timestamp"))
        rts = rv_out[0][1]
        d_bw = ts_us - F.unix_micros(bw.getField(rts).cast("timestamp"))
        d_fw = F.unix_micros(fw.getField(rts).cast("timestamp")) - ts_us
        matched = (
            F.when(bw.isNull(), fw)
            .when(fw.isNull(), bw)
            .when(d_fw < d_bw, fw)
            .otherwise(bw)  # equal distance resolves backward (pandas)
        )
    filled = left_proj.unionByName(right_proj).select(
        *lcols,
        "__is_left",
        *[matched.getField(dst).alias(dst) for _, dst in rv_out],
    )
    return filled.where(F.col("__is_left") == 1).drop("__is_left")


def range_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    min_gap: float = 0.0,
    max_gap: float = 600.0,
    left_cols: Sequence[str] = (),
    right_cols: Sequence[str] = (),
) -> DataFrame:
    """Bounded-interval join: pairs with equal keys and
    ``min_gap < right.ts - left.ts <= max_gap`` (seconds) → left key/value
    columns + right value columns + ``gap_s``.

    Scale shape: the right side is bucketed by
    ``floor(epoch / (max_gap - min_gap))``; each left row explodes to the
    (at most two) buckets its window overlaps, candidates meet on
    (key, bucket) as a plain equi-join, and the exact interval predicate
    filters after.  A theta-join (broadcast nested loop at best) becomes a
    shuffle equi-join whose candidate count scales with rows-per-bucket —
    the standard interval-join decomposition (what dedicated stream engines
    do internally for interval joins).

    Epoch arithmetic goes NTZ→LTZ→double (µs-exact; see sessionize).
    """
    key_cols = list(key_cols)
    width = float(max_gap - min_gap)
    if width <= 0:
        raise ValueError(f"max_gap ({max_gap}) must exceed min_gap ({min_gap})")

    def epoch(col: str) -> Column:
        return F.col(col).cast("timestamp").cast("double")

    l_ep = epoch(left_ts)
    r_ep = epoch(right_ts)
    lhs = left.select(
        *key_cols,
        l_ep.alias("__l_ep"),
        *[F.col(c) for c in left_cols],
        F.explode(
            F.sequence(
                F.floor((l_ep + F.lit(float(min_gap))) / F.lit(width)).cast("long"),
                F.floor((l_ep + F.lit(float(max_gap))) / F.lit(width)).cast("long"),
            )
        ).alias("__bucket"),
    )
    rhs = right.select(
        *key_cols,
        r_ep.alias("__r_ep"),
        *[F.col(c) for c in right_cols],
        F.floor(r_ep / F.lit(width)).cast("long").alias("__bucket"),
    )
    gap = F.col("__r_ep") - F.col("__l_ep")
    return (
        lhs.join(rhs, [*key_cols, "__bucket"])
        .where((gap > F.lit(float(min_gap))) & (gap <= F.lit(float(max_gap))))
        .select(
            *key_cols,
            *left_cols,
            *right_cols,
            F.round(gap, 6).alias("gap_s"),
        )
    )


def session_window_rollup(
    events: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """Per-key gap sessions via Spark's NATIVE ``session_window`` →
    (keys, session_start, session_end, n_events).

    The built-in stateful session operator: in batch mode it is one groupBy
    (sessions merge inside the aggregation, no window-function sort pass);
    on a stream the same expression runs incrementally with watermark-backed
    state eviction — the scale path for live sessionization, which the
    lag+cumsum formulation cannot do.

    Boundary semantics match ``streaming.incremental.sessionize``: a gap
    exactly equal to ``gap`` merges; only a strictly greater gap splits
    (verified at ±1 µs in tests).
    """
    sw = F.session_window(F.col(ts_col), gap)
    return (
        events.groupBy(*key_cols, sw.alias("session"))
        .agg(F.count("*").alias("n_events"))
        .select(
            *key_cols,
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_events",
        )
    )


def detect_gaps(
    events: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    min_gap_seconds: float = 3600.0,
) -> DataFrame:
    """Per-key timeline gaps: consecutive-event intervals strictly longer
    than ``min_gap_seconds`` → (keys, gap_start, gap_end, gap_seconds).

    The monitoring dual of sessionization: where ``session_window_rollup``
    reports activity blocks, this reports the silences between them — the
    shape used for ingest-outage detection over a scene catalog's
    acquisition timeline (the reference eyeballs this via its date reports;
    here it is a first-class query).

    One shuffle on the keys (lag window); no global sort.  ``gap_seconds``
    is a double (microsecond-precision timestamp difference).
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    gap = F.col(ts_col).cast("double") - prev.cast("double")
    return (
        events.select(*key_cols, F.col(ts_col))
        .withColumn("gap_start", prev)
        .withColumn("gap_seconds", gap)
        .where(F.col("gap_seconds") > min_gap_seconds)
        .select(
            *key_cols,
            "gap_start",
            F.col(ts_col).alias("gap_end"),
            F.round("gap_seconds", 6).alias("gap_seconds"),
        )
    )


def funnel_stages(
    events: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel analysis: how many users completed stage k strictly
    AFTER their first completion of stage k-1 → (stage, stage_name,
    n_users), monotonically non-increasing down the funnel.

    The classic product-analytics query (view → click → purchase) done the
    distributed way: one conditional min-ts aggregate per stage, each
    joined against the previous stage's per-user reach time.  The reach
    table is user-dimension-sized (≪ events), so every join broadcasts and
    the event log itself is scanned once per stage with the stage filter
    pushed down — no sessionization state, no per-user event sorting.

    "Strictly after" uses the event timestamp only; same-timestamp events
    do not chain (the cross-engine-stable contract — no ordering exists
    within one timestamp).
    """
    if not stages:
        raise ValueError("funnel_stages needs at least one stage")
    ts = F.col(ts_col).cast("timestamp")
    reach = (
        events.where(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts).alias("t0"))
    )
    for i, st in enumerate(stages[1:], 1):
        nxt = (
            events.where(F.col(type_col) == st)
            .join(reach.select(user_col, f"t{i - 1}"), user_col)
            .where(ts > F.col(f"t{i - 1}"))
            .groupBy(user_col)
            .agg(F.min(ts).alias(f"t{i}"))
        )
        reach = reach.join(nxt, user_col, "left")
    counts = reach.agg(
        *[F.count(f"t{i}").alias(f"__s{i}") for i in range(len(stages))]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("stage"),
                F.lit(st).alias("stage_name"),
                F.col(f"__s{i}").alias("n_users"),
            )
            for i, st in enumerate(stages)
        ]
    )
    return counts.select(F.explode(rows).alias("r")).select(
        "r.stage", "r.stage_name", "r.n_users"
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: users grouped by the week of their FIRST
    event, counted distinct in each subsequent activity week →
    (cohort_week, week_offset, n_users).

    Two aggregates and one broadcastable join: per-user first-event week
    (user-dimension-sized), distinct (user, activity-week) pairs, then the
    offset bucketing — the event log never self-joins and never sorts.
    Weeks are Monday-truncated (`date_trunc('week')`, identical convention
    in Spark and ANSI SQL engines).
    """
    wk = F.date_trunc("week", F.col(ts_col).cast("timestamp"))
    first = events.groupBy(user_col).agg(
        F.to_date(F.min(wk)).alias("cohort_week")
    )
    active = events.select(
        F.col(user_col), F.to_date(wk).alias("__week")
    ).distinct()
    return (
        active.join(first, user_col)
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("__week"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count_distinct(F.col(user_col)).alias("n_users"))
    )


def _daily_counts(
    events: DataFrame, ts_col: str, type_col: str
) -> DataFrame:
    """Canonical per-(type, day) count table → (event_type, day, n): the
    shared first stage of the volume-monitoring family (anomaly, robust
    anomaly, EWMA, trend, gap fill) — ONE place owns the day derivation
    (NTZ-safe cast → to_date, see session.py's timestamp note)."""
    return events.groupBy(
        F.col(type_col).alias("event_type"),
        F.to_date(F.col(ts_col).cast("timestamp")).alias("day"),
    ).agg(F.count(F.lit(1)).alias("n"))


def daily_anomaly_scores(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    round_to: int = 3,
) -> DataFrame:
    """Daily-volume anomaly scoring: per event type, each day's event count
    z-scored against that type's own daily distribution → (event_type,
    day, n, z).  The monitoring primitive behind "error volume spiked
    today" alerts; filter ``abs(z) >= k`` downstream for the alert itself.

    One aggregate (events → per-type-day counts, map-side combined) and
    one keyed window over the tiny per-day table; the raw event log is
    scanned once.  z uses the sample stddev; a type with a single day (or
    zero variance) yields NULL z rather than an error.
    """
    daily = _daily_counts(events, ts_col, type_col)
    w = Window.partitionBy("event_type")
    z = F.try_divide(
        F.col("n") - F.avg("n").over(w), F.stddev_samp("n").over(w)
    )
    return daily.select(
        "event_type", "day", "n", F.round(z, round_to).alias("z")
    )


def transition_counts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tie_col: str | None = None,
) -> DataFrame:
    """First-order Markov transition profile of the event stream →
    (from_type, to_type, n_trans, n_from, p).  Each user's events are
    ordered by (ts, tie_col) and every consecutive pair counts one
    transition; ``p`` is the row-conditional probability n_trans/n_from —
    emitted as the raw IEEE quotient (identical bits on any engine),
    deliberately unrounded: a half-decimal ratio rounds differently under
    decimal-string vs binary rounding, the raw double never diverges.
    The behavioral-model primitive behind next-action prediction features
    and bot-detection (improbable-transition) screens.

    One keyed window (`lead` over user, the same single shuffle a
    sessionize takes) then one small aggregate on (from, to) — the event
    log is scanned once and never self-joins.  Last-event rows (no
    successor) drop out, matching the textbook bigram count.
    """
    order = [F.col(ts_col).asc()] + (
        [F.col(tie_col).asc()] if tie_col else []
    )
    w = Window.partitionBy(user_col).orderBy(*order)
    pairs = (
        events.withColumn("__next", F.lead(type_col).over(w))
        .where(F.col("__next").isNotNull())
        .select(F.col(type_col).alias("from_type"), F.col("__next").alias("to_type"))
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_trans")
    )
    wf = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n_trans",
        F.sum("n_trans").over(wf).alias("n_from"),
        (F.col("n_trans") / F.sum("n_trans").over(wf)).alias("p"),
    )


def time_to_conversion(
    events: DataFrame,
    start_type: str,
    end_type: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user conversion latency → (user_id, start_ts, convert_ts,
    seconds): the user's FIRST ``start_type`` event and their first
    ``end_type`` event STRICTLY after it.  Users who never start, or start
    but never convert, are absent — feed the output through an anti-join
    for drop-off analysis.

    One conditional aggregate over the (type-filtered) event stream per
    user: min(start ts) and min(end ts > start ts) cannot be computed in
    one grouped pass (the second depends on the first), so the shape is
    per-user min(start) — a user-dimension-sized frame — broadcast-joined
    back onto the end-type events for the conditional second min.  Two
    scans of the type-pruned log, no windows, no ordering.
    """
    ts = F.col(ts_col).cast("timestamp")
    starts = (
        events.where(F.col(type_col) == start_type)
        .groupBy(user_col)
        .agg(F.min(ts).alias("start_ts"))
    )
    ends = events.where(F.col(type_col) == end_type).select(
        F.col(user_col), ts.alias("__end_ts")
    )
    return (
        ends.join(starts, user_col)
        .where(F.col("__end_ts") > F.col("start_ts"))
        .groupBy(user_col, "start_ts")
        .agg(F.min("__end_ts").alias("convert_ts"))
        .select(
            user_col,
            "start_ts",
            "convert_ts",
            (
                F.unix_micros(F.col("convert_ts").cast("timestamp_ltz"))
                - F.unix_micros(F.col("start_ts").cast("timestamp_ltz"))
            ).cast("double").alias("micros"),
        )
        .withColumn("seconds", (F.col("micros") / F.lit(1e6)))
        .drop("micros")
    )


def ewma_daily(
    events: DataFrame,
    alpha: float = 0.25,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Exponentially-weighted moving average of daily event volume per
    type → (event_type, day, n, ewma).  e_1 = n_1; e_t = α·n_t +
    (1−α)·e_{t−1} over that type's OBSERVED days in date order — the
    smoothed-baseline series behind alerting dashboards (compare ``n``
    against ``ewma`` for spike detection, cf. :func:`daily_anomaly_scores`
    for the z-score variant).

    An EWMA is inherently a sequential scan — no closed-form window
    rewrite is numerically safe (the (1−α)^{-k} prefix-sum trick
    overflows past a few hundred steps).  So: one aggregate collapses the
    raw log to per-(type, day) counts — the tiny frame — and ONE
    ``applyInPandas`` per type runs the recurrence vectorized in numpy.
    Python touches days×types rows, never the event log; with α exactly
    representable (default 0.25) the recurrence is pure IEEE ·/+ in fixed
    order, bit-reproducible across engines.
    """
    import numpy as np
    import pandas as pd

    daily = _daily_counts(events, ts_col, type_col)

    def _scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day", ignore_index=True)
        x = pdf["n"].to_numpy(dtype=np.float64)
        e = np.empty_like(x)
        if len(x):
            e[0] = x[0]
            for i in range(1, len(x)):
                e[i] = alpha * x[i] + (1.0 - alpha) * e[i - 1]
        pdf["ewma"] = e
        return pdf

    schema = "event_type string, day date, n bigint, ewma double"
    return daily.groupBy("event_type").applyInPandas(_scan, schema=schema)


def daily_trend(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-type linear trend of daily volume → (event_type, n_days, slope):
    the OLS slope of count-vs-day-index (closed-form Σ sums, no ML lib) —
    "is error volume drifting up" in one aggregate.  ``slope`` is
    events/day; NULL for single-day types (zero variance).

    One count aggregate, one keyed window for the per-type day origin, one
    closed-form aggregate.  All sums are exact integers, so the final
    division is the only float op — bit-identical on any engine,
    deliberately unrounded.
    """
    daily = _daily_counts(events, ts_col, type_col)
    w = Window.partitionBy("event_type")
    xy = daily.select(
        "event_type",
        F.datediff(F.col("day"), F.min("day").over(w)).cast("long").alias("x"),
        F.col("n").alias("y"),
    )
    agg = xy.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = F.try_divide(
        (F.col("n_days") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double"),
        (F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"),
    )
    return agg.select("event_type", "n_days", slope.alias("slope"))


def robust_anomaly_scores(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    round_to: int = 3,
) -> DataFrame:
    """Median/MAD daily-volume anomaly scoring → (event_type, day, n,
    robust_z): ``(n − median) / (1.4826·MAD)`` per type, the
    outlier-resistant companion of :func:`daily_anomaly_scores` — one
    spike day inflates a mean/stddev z enough to hide itself; the median
    and MAD don't move.

    Two exact-percentile aggregates over the per-(type, day) count table
    (daily median, then median absolute deviation) joined back — all on
    the tiny daily frame, the raw log is scanned once.  Zero MAD (≥half
    the days share the median) yields NULL rather than an error.
    """
    daily = _daily_counts(events, ts_col, type_col)
    med = daily.groupBy("event_type").agg(
        F.expr("percentile(n, 0.5)").alias("__med")
    )
    dev = daily.join(F.broadcast(med), "event_type")
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(abs(n - __med), 0.5)").alias("__mad")
    )
    z = F.try_divide(
        F.col("n") - F.col("__med"), F.lit(1.4826) * F.col("__mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .select(
            "event_type", "day", "n", F.round(z, round_to).alias("robust_z")
        )
    )


def fill_daily_gaps(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Dense per-type daily series → (event_type, day, n) with EVERY
    calendar day between a type's first and last observation present,
    zero-filled.  The date-spine step the trend/EWMA/anomaly family needs
    when "no events" is itself the signal (observed-days-only series
    silently skip outage days).

    One count aggregate, a per-type (min, max) rollup, ONE
    ``sequence()``+``explode`` over the tiny per-type range table (the
    spine never touches the event log), and a left join of spine←counts.
    Spine size = Σ type date-spans — independent of event volume.
    """
    daily = _daily_counts(events, ts_col, type_col).withColumnRenamed("n", "__n")
    spine = (
        daily.groupBy("event_type")
        .agg(F.min("day").alias("__lo"), F.max("day").alias("__hi"))
        .select(
            "event_type",
            F.explode(
                F.sequence("__lo", "__hi", F.expr("INTERVAL 1 DAY"))
            ).alias("day"),
        )
    )
    return spine.join(daily, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce(F.col("__n"), F.lit(0)).alias("n")
    )


__all__ = [
    "asof_join",
    "range_join",
    "session_window_rollup",
    "detect_gaps",
    "funnel_stages",
    "cohort_retention",
    "daily_anomaly_scores",
    "transition_counts",
    "time_to_conversion",
    "ewma_daily",
    "daily_trend",
    "robust_anomaly_scores",
    "fill_daily_gaps",
]

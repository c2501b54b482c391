"""Reporting queries: summary statistics, obs-date rollup, date reports.

The reference computes sensor summaries with one SQL count per predicate and
Python `statistics` over pulled columns (eodatadownlandsatgoogsensor.py:
2932-3105).  Here each report is ONE aggregation pass; quantiles are EXACT
(`percentile`) to match `statistics.median/quantiles`, stdev is sample
stdev (`stddev_samp` ≡ statistics.stdev) — SURVEY §7.4.5.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sensor_summary_counts(scenes: DataFrame) -> DataFrame:
    """A3 as a single pass: the six summary counts
    (ref :2949-2954 issues six separate queries).

    Column-aware: a sensor with a PARTIAL state block (the JAXA tile
    tracker stops at ARD — no invalid/dcloaded/archived) gets counts only
    for the lifecycle columns it actually declares."""
    b = lambda c: F.sum(F.when(F.col(c) == True, 1).otherwise(0))  # noqa: E712,E731
    cols = set(scenes.columns)
    aggs = [F.count("*").alias("n_scenes")]
    if "invalid" in cols:
        aggs.append(
            F.sum(F.when(F.col("invalid") == False, 1).otherwise(0)).alias("n_valid")  # noqa: E712
        )
        aggs.append(b("invalid").alias("n_invalid"))
    for col, name in (
        ("downloaded", "n_downloaded"),
        ("ardproduct", "n_ard"),
        ("dcloaded", "n_dcloaded"),
        ("archived", "n_archived"),
    ):
        if col in cols:
            aggs.append(b(col).alias(name))
    return scenes.agg(*aggs)


def column_stats(
    df: DataFrame, col: str, round_to: int = 4, approx: bool = False
) -> DataFrame:
    """A7: sum/mean/min/max/sample-stdev/median/quartiles over a numeric
    column, nulls skipped (ref :2964-3016 pulls the column into Python).

    Exact percentiles by default to match `statistics.quantiles` (the oracle
    gate needs bit-stable quartiles).  ``approx=True`` is the 100×-scale
    reporting path: ``percentile_approx`` replaces the sort-based exact
    aggregate with a mergeable t-digest-style sketch — partial aggregation
    map-side, no full sort of the column at 100 TB."""
    c = F.col(col)
    # ONE percentile aggregate with an array of percentages, not three
    # scalar calls: each scalar `percentile` carries its own full value
    # buffer through the exchange and sorts it independently — the array
    # form shares one buffer and one sort for all three quartiles
    if approx:
        quartiles = F.percentile_approx(c, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)), 10_000)
    else:
        quartiles = F.expr(f"percentile({col}, array(0.25D, 0.5D, 0.75D))")
    agg = df.where(c.isNotNull()).agg(
        F.count(c).alias("n"),
        F.round(F.sum(c), round_to).alias("total"),
        F.round(F.avg(c), round_to).alias("mean"),
        F.round(F.min(c), round_to).alias("min"),
        F.round(F.max(c), round_to).alias("max"),
        F.round(F.stddev_samp(c), round_to).alias("stdev"),
        quartiles.alias("__q"),
    )
    return agg.select(
        "n", "total", "mean", "min", "max", "stdev",
        F.round(F.element_at("__q", 1), round_to).alias("q1"),
        F.round(F.element_at("__q", 2), round_to).alias("median"),
        F.round(F.element_at("__q", 3), round_to).alias("q3"),
    )


def duration_seconds(start_col: str, end_col: str):
    """A8/C20: timestamp difference in seconds."""
    return F.unix_timestamp(F.col(end_col)) - F.unix_timestamp(F.col(start_col))


def download_duration_stats(scenes: DataFrame) -> DataFrame:
    """A7+A8: stats over download wall-times (ref :2987-3016)."""
    durations = scenes.where(
        F.col("download_start_date").isNotNull()
        & F.col("download_end_date").isNotNull()
    ).select(duration_seconds("download_start_date", "download_end_date").alias("secs"))
    return column_stats(durations, "secs")


def plugin_status_tallies(plugin_results: DataFrame) -> DataFrame:
    """A10: per-plugin success/completed/error counts + timing stats
    (ref :3019-3049)."""
    secs = duration_seconds("start_date", "end_date")
    return (
        plugin_results.groupBy("plugin_name")
        .agg(
            F.count("*").alias("n_runs"),
            F.sum(F.when(F.col("completed") == True, 1).otherwise(0)).alias("n_completed"),  # noqa: E712
            F.sum(F.when(F.col("success") == True, 1).otherwise(0)).alias("n_success"),  # noqa: E712
            F.sum(F.when(F.col("error") == True, 1).otherwise(0)).alias("n_error"),  # noqa: E712
            F.round(F.avg(secs), 4).alias("mean_secs"),
            F.round(F.min(secs), 4).alias("min_secs"),
            F.round(F.max(secs), 4).alias("max_secs"),
        )
        .orderBy("plugin_name")
    )


# ---------------------------------------------------------------------------
# observation-date rollup (A9/J1; ref eodatadownsensor.py:560-692)
# ---------------------------------------------------------------------------

def build_obs_date_records(
    scenes: DataFrame,
    sensor_id: str,
    platform_col: str = "spacecraft_id",
    date_col: str = "date_acquired",
) -> tuple[DataFrame, DataFrame]:
    """A9: distinct (platform, date) rollup + bridge rows
    (ref eodatadownsensor.py:560-603).

    Returns (obs_dates, obs_date_scns) DataFrames matching schemas.OBS_DATES /
    OBS_DATE_SCNS."""
    base = scenes.where(F.col("invalid") == False).select(  # noqa: E712
        F.lit(sensor_id).alias("sensor_id"),
        F.col(platform_col).alias("platform_id"),
        F.to_date(F.col(date_col)).alias("obs_date"),
        F.col("pid").alias("scene_pid"),
    )
    bridge = base.distinct()
    obs_dates = bridge.select("sensor_id", "platform_id", "obs_date").distinct().select(
        "*",
        F.lit(False).alias("overview_created"),
        F.lit(True).alias("need_update"),
        F.lit(False).alias("invalid"),
        F.lit(None).cast("string").alias("overviews"),
    )
    return obs_dates, bridge.select("sensor_id", "platform_id", "obs_date", "scene_pid")


def get_obs_scns(
    obs_dates: DataFrame,
    start_date: dt.date | str | None = None,
    end_date: dt.date | str | None = None,
    sensor: str | None = None,
    platform: str | None = None,
    valid: bool = True,
    order_desc: bool = False,
) -> DataFrame:
    """O3: the 8-branch filtered/ordered obs-date query
    (ref eodatadownsensor.py:699-792) as one parameterized plan.

    NOTE: date bounds here are EXCLUSIVE (`<` / `>`) — the reference differs
    from the scene queries' inclusive bounds (SURVEY §7.4.4)."""
    df = obs_dates
    if valid:
        df = df.where(F.col("invalid") == False)  # noqa: E712
    if sensor is not None:
        df = df.where(F.col("sensor_id") == sensor)
    if platform is not None:
        df = df.where(F.col("platform_id") == platform)
    if start_date is not None:
        df = df.where(F.col("obs_date") < F.lit(start_date))
    if end_date is not None:
        df = df.where(F.col("obs_date") > F.lit(end_date))
    return df.orderBy(
        F.col("obs_date").desc() if order_desc else F.col("obs_date").asc()
    )


def get_lst_obsdates_need_processing(
    obs_dates: DataFrame, sensor: str | None = None
) -> DataFrame:
    """Obs-dates still awaiting overview generation — (sensor_id,
    platform_id, obs_date) rows with overview_created == False, optionally
    one sensor's (ref eodatadownsensor.py:620-639; the reference returns
    [SensorID, PlatformID, ObsDate] triples)."""
    df = obs_dates.where(F.col("overview_created") == False)  # noqa: E712
    if sensor is not None:
        df = df.where(F.col("sensor_id") == sensor)
    return df.select("sensor_id", "platform_id", "obs_date").orderBy(
        "sensor_id", "platform_id", "obs_date"
    )


def update_obs_date_overviews(obs_dates: DataFrame, updates: DataFrame) -> DataFrame:
    """M3 on the obs-date table: set `overviews` JSON ({size_px: img_path},
    ref eodatadownsensor.py:679-692) and clear `need_update` for the updated
    (sensor, platform, date) keys — one batched merge."""
    keys = ["sensor_id", "platform_id", "obs_date"]
    patch = updates.select(*keys, F.col("overviews").alias("__new_ov"))
    out = obs_dates.join(patch, keys, "left")
    return (
        out.withColumn(
            "overview_created",
            F.when(F.col("__new_ov").isNotNull(), F.lit(True)).otherwise(
                F.col("overview_created")
            ),
        )
        .withColumn(
            "need_update",
            F.when(F.col("__new_ov").isNotNull(), F.lit(False)).otherwise(
                F.col("need_update")
            ),
        )
        .withColumn("overviews", F.coalesce(F.col("__new_ov"), F.col("overviews")))
        .drop("__new_ov")
    )


def scene_command_lines(scenes: DataFrame, cmd_template: str) -> DataFrame:
    """K7: HPC command-list generation — one shell line per scene pid
    (ref bin/eoddgenscncmds.py:46-136). `{pid}` in the template is replaced."""
    pre, _, post = cmd_template.partition("{pid}")
    return scenes.select(
        F.concat(F.lit(pre), F.col("pid").cast("string"), F.lit(post)).alias("cmd")
    )


def obs_date_command_lines(
    obs_dates: DataFrame, cmd_template: str, sensor: str | None = None
) -> DataFrame:
    """K7 obs-date variant (ref bin/eoddgenobsdatecmds.py:48-85 /
    eoddgenmonscncmds.py:45-85): one line per (sensor, platform, obs_date)
    needing an update; `{sensor} {platform} {date}` placeholders."""
    df = obs_dates.where(F.col("need_update") == True)  # noqa: E712
    if sensor is not None:
        df = df.where(F.col("sensor_id") == sensor)
    cmd = F.lit(cmd_template)
    for placeholder, col in (
        ("{sensor}", F.col("sensor_id")),
        ("{platform}", F.col("platform_id")),
        ("{date}", F.date_format("obs_date", "yyyy-MM-dd")),
    ):
        cmd = F.replace(cmd, F.lit(placeholder), col)
    return df.orderBy("sensor_id", "platform_id", "obs_date").select(cmd.alias("cmd"))


# ---------------------------------------------------------------------------
# Mergeable distinct-count sketches (100 TB incremental reporting)
# ---------------------------------------------------------------------------

def distinct_sketch_rollup(
    df: DataFrame, keys, value_col: str, lg_k: int = 12
) -> DataFrame:
    """Per-key HyperLogLog sketches → (keys..., sketch binary, estimate).

    The incremental-distinct-count path at 100 TB: each batch/partition
    aggregates to a tiny mergeable sketch once, and every later rollup
    (another day's data, a coarser grouping, a global total) is a
    sketch-union — no re-scan of raw data, no exact-distinct shuffle of
    high-cardinality values.  Persist the sketch column next to the rollup;
    combine batches with :func:`merge_distinct_sketches`.  Estimate error
    ~1.04/sqrt(2^lg_k) (≈1.6% at the default), bounded by the q75 gate
    convention.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch")
    ).withColumn("estimate", F.hll_sketch_estimate("sketch"))


def merge_distinct_sketches(sketches: DataFrame, keys) -> DataFrame:
    """Union previously-built sketches by key → (keys..., sketch, estimate).

    Input rows carry a ``sketch`` binary column (from
    :func:`distinct_sketch_rollup`, possibly across many batches/dates);
    the union is exact over sketches — the estimate of the union equals
    the sketch of the union of the raw data.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    return sketches.groupBy(*keys).agg(
        F.hll_union_agg("sketch").alias("sketch")
    ).withColumn("estimate", F.hll_sketch_estimate("sketch"))


def profile_columns(df: DataFrame, cols) -> DataFrame:
    """Per-column data-quality profile in ONE scan: (column, n_rows,
    n_nulls, n_distinct, min_num, max_num, min_str, max_str).

    Numeric columns report min/max as doubles (string slots NULL), others
    as raw strings (numeric slots NULL) — min/max never cross-cast, so the
    output is engine-portable (double→string formatting differs between
    engines; this schema avoids it).

    The whole profile is a single aggregate over one pass of the table —
    multiple exact count-distincts plan through Spark's Expand (one
    shuffle), which is the right trade for a profiling pass; at 100 TB
    switch counts to approx_count_distinct or the HLL sketch rollup above
    for a near-free estimate.
    """
    from pyspark.sql import types as T

    cols = list(cols)
    numeric = {
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.NumericType,))
    }
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nn_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"__nd_{c}"))
        if c in numeric:
            aggs.append(F.min(F.col(c)).cast("double").alias(f"__mn_{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"__mx_{c}"))
        else:
            aggs.append(F.min(F.col(c).cast("string")).alias(f"__mn_{c}"))
            aggs.append(F.max(F.col(c).cast("string")).alias(f"__mx_{c}"))
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__rows").alias("n_rows"),
                F.col(f"__nn_{c}").alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                (F.col(f"__mn_{c}") if c in numeric else F.lit(None).cast("double")).alias("min_num"),
                (F.col(f"__mx_{c}") if c in numeric else F.lit(None).cast("double")).alias("max_num"),
                (F.lit(None).cast("string") if c in numeric else F.col(f"__mn_{c}")).alias("min_str"),
                (F.lit(None).cast("string") if c in numeric else F.col(f"__mx_{c}")).alias("max_str"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("p")).select("p.*")

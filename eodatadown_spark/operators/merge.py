"""MERGE / snapshot-diff operators: declarative upsert-delete semantics and
change-data-capture between table versions.

The reference mutates its catalog through per-row ORM cycles — query, mutate
attributes, `ses.commit()`, or `ses.delete()` (e.g. the import/update loop in
``eodatadownsentinel2googsensor.py`` and the per-scene state commits in
``eodatadownrun.py:699-845``).  Spark-first, those cycles are ONE declarative
``MERGE``: a single keyed full-outer join that classifies every row as
update / delete / insert / carry-over and emits the next table version in one
pass.  ``merge_into`` is the general form (ANSI ``MERGE INTO`` semantics, the
operation Delta/Iceberg expose natively); ``diff_snapshots`` is its inverse —
given two versions of a table (e.g. from ``ParquetCatalog.read_version``) it
emits the CDC row set that transforms one into the other.

Scale shape: both operators are one shuffle on the merge keys.  The source
side's uniqueness window partitions on the same keys the join uses, so the
exchange is shared (no second shuffle of the source); a small source can be
``F.broadcast(...)``-ed by the caller, which removes the target-side shuffle
entirely.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def merge_into(
    target: DataFrame,
    source: DataFrame,
    on: Sequence[str],
    when_matched_update: Mapping[str, Column] | None = None,
    update_condition: Column | None = None,
    when_matched_delete: Column | None = None,
    when_not_matched_insert: Mapping[str, Column] | bool = True,
    insert_condition: Column | None = None,
    validate_unique_source: bool = True,
) -> DataFrame:
    """ANSI ``MERGE INTO`` over DataFrames: returns the post-merge target.

    Clauses (evaluated per target row in this order, first match wins —
    the Delta Lake clause-ordering convention):

    1. matched AND ``when_matched_delete`` → row is deleted;
    2. matched AND ``update_condition`` (default: always) → row is updated
       with ``when_matched_update`` (columns not named keep their target
       value);
    3. matched otherwise → row carries over unchanged;
    4. source-only AND ``insert_condition`` (default: always) →
       ``when_not_matched_insert`` row is inserted.  ``True`` inserts the
       source's same-named columns (missing target columns become NULL);
       a mapping gives explicit per-column values; ``False`` disables
       inserts.  Source-only rows failing the condition are dropped.
    5. target-only rows always carry over.

    Condition / value Columns reference the two sides through the ``t`` and
    ``s`` aliases, e.g. ``F.col("s.qty") > F.col("t.qty")``.

    ``validate_unique_source=True`` enforces the ANSI rule that a target row
    may match at most ONE source row: violations raise at execution time
    (via ``raise_error`` inside the plan — distributed, no driver-side
    pre-count job).  The check costs a window count over the source keyed on
    the merge keys; the join needs that same hash partitioning, so the
    exchange is reused rather than doubled.

    Output schema == target schema (same names, positions).
    """
    on = list(on)
    if not on:
        raise ValueError("merge_into requires at least one key column")
    missing_t = [k for k in on if k not in target.columns]
    missing_s = [k for k in on if k not in source.columns]
    if missing_t or missing_s:
        raise ValueError(
            f"merge keys missing from target {missing_t} / source {missing_s}"
        )
    if when_matched_update:
        bad = [c for c in when_matched_update if c not in target.columns]
        if bad:
            raise ValueError(f"when_matched_update names non-target columns {bad}")
    if isinstance(when_not_matched_insert, Mapping):
        bad = [c for c in when_not_matched_insert if c not in target.columns]
        if bad:
            raise ValueError(f"when_not_matched_insert names non-target columns {bad}")

    t = target.withColumn("__t_present", F.lit(True)).alias("t")
    s = source
    if validate_unique_source:
        s = s.withColumn(
            "__src_n", F.count(F.lit(1)).over(Window.partitionBy(*on))
        )
    s = s.withColumn("__s_present", F.lit(True)).alias("s")

    # plain equality, not eqNullSafe: ANSI MERGE never matches NULL keys —
    # a NULL-keyed source row is not-matched (inserts under clause 4), a
    # NULL-keyed target row carries over untouched
    cond = None
    for k in on:
        eq = F.col(f"t.{k}") == F.col(f"s.{k}")
        cond = eq if cond is None else cond & eq
    joined = t.join(s, cond, "full_outer")

    matched = F.col("t.__t_present").isNotNull() & F.col("s.__s_present").isNotNull()
    src_only = F.col("t.__t_present").isNull() & F.col("s.__s_present").isNotNull()

    # a clause condition evaluating NULL means "not satisfied" (ANSI MERGE),
    # so user conditions are coalesced to false before entering any ~ / &
    # composition where NULL would otherwise propagate and misroute the row
    def _sat(c: Column | None) -> Column:
        return F.lit(True) if c is None else F.coalesce(c, F.lit(False))

    del_cond = (
        matched & _sat(when_matched_delete)
        if when_matched_delete is not None
        else F.lit(False)
    )
    upd_cond = (
        (matched & ~del_cond & _sat(update_condition))
        if when_matched_update
        else F.lit(False)
    )
    ins_enabled = bool(when_not_matched_insert)
    ins_cond = (
        (src_only & _sat(insert_condition)) if ins_enabled else F.lit(False)
    )

    # ANSI uniqueness guard lives inside the keep-predicate so it is never
    # pruned away; CaseWhen branches evaluate lazily in codegen, so the
    # raise fires only on an actual violation row
    keep = F.when(~del_cond & (matched | F.col("s.__s_present").isNull() | ins_cond), F.lit(True)).otherwise(F.lit(False))
    if validate_unique_source:
        keep = F.when(
            matched & (F.col("s.__src_n") > 1),
            F.raise_error(
                F.concat(
                    F.lit("merge_into: multiple source rows matched target key ("),
                    F.concat_ws(
                        ", ", *[F.col(f"s.{k}").cast("string") for k in on]
                    ),
                    F.lit(")"),
                )
            ).cast("boolean"),
        ).otherwise(keep)

    out_cols = []
    for c in target.columns:
        if c in on:
            base = F.coalesce(F.col(f"t.{c}"), F.col(f"s.{c}"))
        else:
            base = F.col(f"t.{c}")
        expr = base
        if ins_enabled:
            if isinstance(when_not_matched_insert, Mapping):
                ins_val = when_not_matched_insert.get(c)
            else:
                ins_val = F.col(f"s.{c}") if c in source.columns else None
            if ins_val is not None and c not in on:
                expr = F.when(src_only, ins_val).otherwise(expr)
        if when_matched_update and c in when_matched_update:
            expr = F.when(upd_cond, when_matched_update[c]).otherwise(expr)
        tf = target.schema[c]
        out_cols.append(expr.cast(tf.dataType).alias(c))

    return joined.where(keep).select(*out_cols)


def diff_snapshots(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """CDC between two table versions: one row per changed key with
    ``change_type`` ∈ {'insert', 'delete', 'update'}.

    'insert' = key only in ``new``; 'delete' = key only in ``old``;
    'update' = key in both with any compared column differing (null-safe).
    Unchanged keys emit nothing.  ``compare_cols`` defaults to every shared
    non-key column.  Output: key columns + ``change_type``.

    Pairs with ``ParquetCatalog.read_version`` for version-to-version audit
    (the reference has no equivalent — its ORM overwrites in place; this is
    the operation that makes the versioned catalog auditable).  One shuffle
    on the keys; null-safe struct equality keeps the comparison a single
    codegen expression regardless of column count.
    """
    keys = list(keys)
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c in new.columns and c not in keys
        ]
    o = old.withColumn("__o", F.lit(True)).alias("o")
    n = new.withColumn("__n", F.lit(True)).alias("n")
    cond = None
    for k in keys:
        # plain equality: a NULL-keyed old row reads as 'delete' and a
        # NULL-keyed new row as 'insert' (same key semantics as merge_into
        # and the SQL oracle; value comparison below stays null-safe)
        eq = F.col(f"o.{k}") == F.col(f"n.{k}")
        cond = eq if cond is None else cond & eq
    joined = o.join(n, cond, "full_outer")
    in_old = F.col("o.__o").isNotNull()
    in_new = F.col("n.__n").isNotNull()
    same = F.struct(*[F.col(f"o.{c}") for c in compare_cols]).eqNullSafe(
        F.struct(*[F.col(f"n.{c}") for c in compare_cols])
    ) if compare_cols else F.lit(True)
    change = (
        F.when(~in_old, F.lit("insert"))
        .when(~in_new, F.lit("delete"))
        .when(~same, F.lit("update"))
    )
    return (
        joined.withColumn("change_type", change)
        .where(F.col("change_type").isNotNull())
        .select(
            *[F.coalesce(F.col(f"o.{k}"), F.col(f"n.{k}")).alias(k) for k in keys],
            "change_type",
        )
    )


_ROLLUP_COMBINE = {
    "sum": lambda t, s: F.coalesce(t + s, t, s),
    "min": lambda t, s: F.least(t, s),   # least/greatest skip NULLs in Spark
    "max": lambda t, s: F.greatest(t, s),
}


def maintain_rollup(
    rollup: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    agg_spec: Mapping[str, tuple[Column | str, str]],
    count_col: str | None = "n",
) -> DataFrame:
    """Incremental materialized-aggregate maintenance: fold a batch of new
    base rows into an existing rollup WITHOUT rescanning the base table.

    ``agg_spec`` maps each rollup column to ``(base expression, kind)`` with
    kind ∈ {'sum', 'min', 'max'} — the self-mergeable aggregates (avg is
    sum/count downstream; distinct needs the HLL sketch rollup in
    ``reports``).  ``count_col`` (default ``"n"``) maintains the group row
    count.  Returns the next rollup: existing groups combine, new groups
    insert.

    This is the 100 TB pattern for standing reports: the nightly delta
    aggregates once (one shuffle over the DELTA only) and merges into the
    rollup on its keys — versus re-aggregating the full history every run.
    Deltas are append-only; retracting rows needs a re-aggregation of the
    affected partitions (sum/count could subtract, min/max cannot).

    Proven equal to full re-aggregation by differential test and by q97's
    whole-table oracle.

    Exactness note: a 'sum' rollup folds as (t + s) — for floating-point
    columns that is a DIFFERENT association than a full re-aggregation, so
    the two can differ in the last ulp (enough to flip a round(., 2) at a
    half-cent boundary).  For money/exactness-sensitive sums, pass the base
    expression cast to DECIMAL: decimal addition is exact and associative,
    making incremental == full recompute bit-for-bit (q97 does this).
    """
    kinds = {k for _, k in agg_spec.values()}
    unknown = kinds - set(_ROLLUP_COMBINE)
    if unknown:
        raise ValueError(f"unknown aggregate kinds {sorted(unknown)}; "
                         "supported: sum, min, max")
    aggs = []
    for name, (expr, kind) in agg_spec.items():
        e = F.col(expr) if isinstance(expr, str) else expr
        fn = {"sum": F.sum, "min": F.min, "max": F.max}[kind]
        aggs.append(fn(e).alias(name))
    if count_col is not None:
        aggs.append(F.count(F.lit(1)).alias(count_col))
    delta_agg = delta.groupBy(*[F.col(k) for k in keys]).agg(*aggs)

    upd: dict[str, Column] = {}
    for name, (_expr, kind) in agg_spec.items():
        upd[name] = _ROLLUP_COMBINE[kind](F.col(f"t.{name}"), F.col(f"s.{name}"))
    if count_col is not None:
        upd[count_col] = F.coalesce(
            F.col(f"t.{count_col}") + F.col(f"s.{count_col}"),
            F.col(f"t.{count_col}"),
            F.col(f"s.{count_col}"),
        )
    return merge_into(
        rollup,
        delta_agg,
        on=list(keys),
        when_matched_update=upd,
        when_not_matched_insert=True,
        # delta_agg is grouped on the merge keys — uniqueness holds by
        # construction, skip the guard's window
        validate_unique_source=False,
    )


def build_distinct_sketches(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Per-group mergeable distinct-count sketches → (group_cols...,
    sketch, approx_distinct): Apache DataSketches HLL state as a binary
    column plus its estimate.

    The point of STORING the sketch (vs approx_count_distinct's scalar) is
    incrementality: HLL union is associative and commutative, so a catalog
    can keep one sketch per partition/day and answer "distinct users over
    any date range" by merging stored sketches — no rescan of history —
    and ingest updates only the touched partitions' sketches.  The
    100 TB distinct-count pattern (exact distinct shuffles every value;
    per-partition sketches merge in bytes).
    """
    return (
        df.groupBy(*group_cols)
        .agg(F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch"))
        .withColumn("approx_distinct", F.hll_sketch_estimate("sketch"))
    )


def merge_distinct_sketches(
    stored: DataFrame,
    delta: DataFrame,
    group_cols: Sequence[str],
) -> DataFrame:
    """Merge two per-group sketch tables (stored state + a new batch's
    sketches) → the same (group_cols..., sketch, approx_distinct) shape.
    HLL union is associative+commutative, so incremental maintenance
    carries the SAME accuracy contract as a full recompute.  In coupon
    (exact) mode the merged sketch is bit-identical to a one-pass build —
    merge(build(A), build(B)) == build(A ∪ B), unit-tested; once sketches
    go dense, DataSketches' union re-estimates through its internal HLL_8
    gadget and the two estimates agree only within sketch error (~1% at
    lgK=12, observed at sf0.1; q145 gates a 4% bound plus 10% vs exact)."""
    cols = [*group_cols, "sketch"]
    both = stored.select(*cols).unionByName(delta.select(*cols))
    return (
        both.groupBy(*group_cols)
        .agg(F.hll_union_agg("sketch").alias("sketch"))
        .withColumn("approx_distinct", F.hll_sketch_estimate("sketch"))
    )


def build_quantile_sketches(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 200,
) -> DataFrame:
    """Per-group mergeable QUANTILE sketches → (group_cols..., qsketch):
    Apache DataSketches KLL state as a binary column.

    The quantile sibling of :func:`build_distinct_sketches`: exact
    percentiles need a full sort (or all values on one reducer) every
    time; stored KLL sketches make percentile rollups INCREMENTAL (merge
    the new batch's sketches into stored state) and COMPOSABLE (any
    date-range p50/p99 = merge of per-day sketches).  KLL guarantees
    RANK error (~1.65% two-sided at k=200, 99% confidence), not value
    error — gates should test the rank of an estimated quantile against
    exact data, as q147 does.
    """
    return df.groupBy(*group_cols).agg(
        F.kll_sketch_agg_double(
            F.col(value_col).cast("double"), F.lit(k)
        ).alias("qsketch")
    )


def merge_quantile_sketches(
    stored: DataFrame,
    delta: DataFrame,
    group_cols: Sequence[str],
    k: int = 200,
) -> DataFrame:
    """Merge two per-group KLL tables (stored state + a new batch) → the
    same (group_cols..., qsketch) shape.  Merging preserves the KLL rank
    guarantee, so incremental maintenance carries the same accuracy
    contract as a one-pass build (compaction is randomized, so merged and
    full sketches need not be bit-identical — both stay rank-bounded)."""
    cols = [*group_cols, "qsketch"]
    both = stored.select(*cols).unionByName(delta.select(*cols))
    return both.groupBy(*group_cols).agg(
        F.kll_merge_agg_double("qsketch", F.lit(k)).alias("qsketch")
    )


def sketch_quantile(sketch: Column | str, q: float) -> Column:
    """Estimated value at rank ``q`` from a stored KLL sketch column."""
    return F.kll_sketch_get_quantile_double(sketch, F.lit(float(q)))


def sketch_rank(sketch: Column | str, value: Column) -> Column:
    """Estimated rank of ``value`` from a stored KLL sketch column."""
    return F.kll_sketch_get_rank_double(sketch, value)


def build_theta_sketches(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Per-group mergeable Theta sketches → (group_cols..., tsketch,
    approx_distinct).

    Theta is the SET-ALGEBRA distinct sketch: unlike HLL it supports
    INTERSECTION and DIFFERENCE, so stored per-period sketches answer
    "distinct users active in January AND February" or "in January but
    NOT February" in bytes — questions that otherwise force a re-scan
    and a distinct-heavy join of both periods' raw data.  Union keeps
    the ~1/sqrt(2^lg_k) relative error; intersection error grows as the
    overlap shrinks (small intersections of large sets are the hard
    case — gate with tolerance, as q148 does).
    """
    return (
        df.groupBy(*group_cols)
        .agg(F.theta_sketch_agg(value_col, F.lit(lg_k)).alias("tsketch"))
        .withColumn("approx_distinct", F.theta_sketch_estimate("tsketch"))
    )


def merge_theta_sketches(
    stored: DataFrame,
    delta: DataFrame,
    group_cols: Sequence[str],
    lg_k: int = 12,
) -> DataFrame:
    """Merge two per-group Theta tables → same shape; union is
    associative+commutative so incremental == recompute in accuracy."""
    cols = [*group_cols, "tsketch"]
    both = stored.select(*cols).unionByName(delta.select(*cols))
    return (
        both.groupBy(*group_cols)
        .agg(F.theta_union_agg("tsketch", F.lit(lg_k)).alias("tsketch"))
        .withColumn("approx_distinct", F.theta_sketch_estimate("tsketch"))
    )


_CMS_SALT = 1000003  # odd, coprime to the rolling prime


def _cms_bucket(h: Column, row: int, width: int) -> Column:
    """Row-``row`` bucket from a PRECOMPUTED portable fingerprint ``h``:
    an AFFINE family — ``((2·row+1)·h + row·salt) mod p mod width`` — the
    standard CMS construction (row hashes derived from one base hash).
    One char-fold per value total, instead of ``depth`` re-hashes of a
    salted string: at corpus scale the fold IS the sketch build cost, so
    this is a ``depth``× hashing saving.  Callers materialize ``h`` at
    its own projection boundary (the higher-order re-eval trap) via
    :func:`_cms_hashed`.  Exactly reproducible in the SQL oracles (one
    list_reduce + integer arithmetic)."""
    from eodatadown_spark.operators.text import ROLLING_PRIME

    return F.pmod(
        F.pmod(
            h * F.lit(2 * row + 1) + F.lit(row * _CMS_SALT),
            F.lit(ROLLING_PRIME),
        ),
        F.lit(width),
    )


def _cms_hashed(df: DataFrame, value_col: str, keep: Sequence[str]) -> DataFrame:
    from eodatadown_spark.operators.text import rolling_fingerprint

    return df.select(
        *keep, rolling_fingerprint(F.col(value_col).cast("string")).alias("__h")
    )


def build_count_min(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 512,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Count-Min sketch as a RELATIONAL state table → (group_cols...,
    cms_row, cms_bucket, cnt): per occurrence, ``depth`` salted-hash
    buckets increment; a point estimate is the MIN over rows of the
    probed buckets — always an overestimate, error ≤ 2N/width with
    probability 1−(1/2)^depth (Cormode & Muthukrishnan 2005).

    Completes the mergeable-sketch family (HLL distinct / KLL quantile /
    Theta set-algebra) with FREQUENCY: the state is depth×width counters
    per group no matter how many distinct values stream through, merge is
    counter addition (associative+commutative — see
    :func:`merge_count_min`), so a catalog keeps one sketch per
    partition/day and answers "how often did token X appear over any
    range" by summing stored counters, never rescanning history.

    Hash domain note: the portable fingerprint normalizes to lowercased
    [a-z0-9 ] — values differing only outside that alphabet share buckets
    (counted together).  The intended payload is tokens/ids, where the
    normalization is identity.
    """
    hashed = _cms_hashed(df, value_col, list(group_cols))
    rows = hashed.select(
        *group_cols,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("cms_row"),
                    _cms_bucket(F.col("__h"), i, width).alias("cms_bucket"),
                )
                for i in range(depth)
            ])
        ).alias("__rb"),
    )
    return (
        rows.select(*group_cols, "__rb.cms_row", "__rb.cms_bucket")
        .groupBy(*group_cols, "cms_row", "cms_bucket")
        .agg(F.count("*").alias("cnt"))
    )


def merge_count_min(
    stored: DataFrame,
    delta: DataFrame,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Merge two CMS state tables by counter addition — build(A) ⊎
    build(B) is EXACTLY build(A ∪ B) (counters are plain sums, no
    approximation in the merge itself)."""
    cols = [*group_cols, "cms_row", "cms_bucket", "cnt"]
    both = stored.select(*cols).unionByName(delta.select(*cols))
    return (
        both.groupBy(*group_cols, "cms_row", "cms_bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def count_min_estimate(
    cms: DataFrame,
    probes: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Point-frequency estimates for ``probes[value_col]`` against a CMS
    state table (no group columns): min over the ``depth`` probed
    counters, absent buckets counting 0 — so never-seen values estimate
    correctly as ≥ 0 overestimates of their true 0.

    The probe side is ``|probes| × depth`` rows joining a
    depth×width-bounded state table — both tiny; AQE broadcasts the
    sketch, the corpus is never touched.

    The sketch must be UNGROUPED: a ``build_count_min(..., group_cols)``
    state table carries one depth×width grid per group, and probing it on
    ``(cms_row, cms_bucket)`` alone would take the min across groups —
    below any single group's true count, silently breaking the CMS
    overestimate invariant.  Filter to one group (or ``merge_count_min``
    the groups you mean to pool) before probing; extra columns are
    rejected here rather than mis-estimated.
    """
    extra = set(cms.columns) - {"cms_row", "cms_bucket", "cnt"}
    if extra:
        raise ValueError(
            "count_min_estimate requires an ungrouped sketch "
            "(cms_row, cms_bucket, cnt); found extra columns "
            f"{sorted(extra)} — filter to a single group or merge groups "
            "with merge_count_min before probing"
        )
    pb = _cms_hashed(probes, value_col, [value_col]).select(
        F.col(value_col),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("cms_row"),
                    _cms_bucket(F.col("__h"), i, width).alias("cms_bucket"),
                )
                for i in range(depth)
            ])
        ).alias("__rb"),
    ).select(value_col, "__rb.cms_row", "__rb.cms_bucket")
    return (
        pb.join(cms, ["cms_row", "cms_bucket"], "left")
        .groupBy(value_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_cnt"))
    )


def build_bloom(
    df: DataFrame,
    value_col: str,
    n_hashes: int = 4,
    n_bits: int = 4096,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Bloom filter as a RELATIONAL state table → (group_cols...,
    bloom_bit): the DISTINCT set bit positions (Bloom 1970).  Each value
    sets ``n_hashes`` positions from the same affine hash family the CMS
    rows use (:func:`_cms_bucket` — one portable char-fold per value, k
    derived positions); a membership probe is "all k probed positions
    present" — NO false negatives ever, false positives at the classic
    ``(1 - e^{-kn/m})^k`` rate.

    Completes the mergeable-sketch family (HLL distinct / KLL quantile /
    Theta set-algebra / CMS frequency) with MEMBERSHIP: state is ≤
    ``n_bits`` single-int rows no matter how many values stream through
    (broadcastable by construction), and merge is set union —
    ``build(A) ∪ build(B) == build(A ∪ B)`` EXACTLY (bitwise OR, no
    approximation in the merge) — so a catalog keeps one filter per
    partition/day and answers "could token X have appeared in range R"
    by unioning stored filters, never rescanning history.  The
    at-scale use is the cheap pre-join gate: broadcast the filter and
    drop probe rows whose k bits aren't all set BEFORE an expensive
    join/shuffle (the classic semi-join reduction).

    Hash-domain note matches CMS: values normalize to lowercased
    [a-z0-9 ] before hashing — intended payload is tokens/ids.
    """
    hashed = _cms_hashed(df, value_col, list(group_cols))
    rows = hashed.select(
        *group_cols,
        F.explode(
            F.array(*[
                _cms_bucket(F.col("__h"), i, n_bits) for i in range(n_hashes)
            ])
        ).alias("bloom_bit"),
    )
    return rows.select(*group_cols, "bloom_bit").distinct()


def merge_bloom(
    stored: DataFrame, delta: DataFrame, group_cols: Sequence[str] = ()
) -> DataFrame:
    """Merge two Bloom state tables by position union — exactly the
    bitwise OR of the bit arrays, and exactly ``build`` of the union
    stream (same ``n_hashes``/``n_bits`` required: the parameters are
    part of the filter's identity, the CMS convention)."""
    cols = [*group_cols, "bloom_bit"]
    return (
        stored.select(*cols).unionByName(delta.select(*cols)).distinct()
    )


def bloom_might_contain(
    bloom: DataFrame,
    probes: DataFrame,
    value_col: str,
    n_hashes: int = 4,
    n_bits: int = 4096,
) -> DataFrame:
    """Membership probes against an UNGROUPED Bloom state table →
    (value_col, bloom_hit): true iff ALL ``n_hashes`` probed positions
    are set.  Inserted values ALWAYS probe true (no false negatives);
    absent values probe true only on full k-fold collision.

    Probe side is ``|probes| × n_hashes`` rows joining a ≤ n_bits-row
    state — AQE broadcasts the filter; the source relation the filter
    summarizes is never touched.  Grouped state is rejected for the same
    reason as :func:`count_min_estimate`: probing across groups would
    OR the groups' bits together and report memberships no single group
    holds."""
    extra = set(bloom.columns) - {"bloom_bit"}
    if extra:
        raise ValueError(
            "bloom_might_contain requires an ungrouped filter (bloom_bit); "
            f"found extra columns {sorted(extra)} — filter to a single "
            "group or merge groups with merge_bloom before probing"
        )
    pb = _cms_hashed(probes, value_col, [value_col]).select(
        F.col(value_col),
        F.explode(
            F.array(*[
                _cms_bucket(F.col("__h"), i, n_bits) for i in range(n_hashes)
            ])
        ).alias("bloom_bit"),
    )
    marked = bloom.select("bloom_bit", F.lit(True).alias("__set"))
    return (
        pb.join(marked, "bloom_bit", "left")
        .groupBy(value_col)
        .agg(
            (
                F.count(F.lit(1))
                == F.coalesce(F.sum(F.col("__set").cast("int")), F.lit(0))
            ).alias("bloom_hit")
        )
    )


__all__ = [
    "build_count_min",
    "merge_count_min",
    "count_min_estimate",
    "build_bloom",
    "merge_bloom",
    "bloom_might_contain",
    "merge_into",
    "diff_snapshots",
    "maintain_rollup",
    "build_distinct_sketches",
    "merge_distinct_sketches",
    "build_quantile_sketches",
    "merge_quantile_sketches",
    "sketch_quantile",
    "sketch_rank",
    "build_theta_sketches",
    "merge_theta_sketches",
]

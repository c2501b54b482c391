"""Skew mitigation: salted aggregation and salted joins.

AQE's skew-join splitting handles sort-merge join skew at runtime; these
helpers cover the cases AQE doesn't: skewed groupBy keys (one giant group
serializing a reducer) and broadcast-infeasible skewed joins.  Both are the
standard two-phase salt pattern, kept fully declarative.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count(df: DataFrame, keys: Sequence[str], n_salts: int = 16) -> DataFrame:
    """groupBy(keys).count() resistant to hot keys: pre-aggregate on
    (keys, salt), then combine — the hot key spreads over n_salts reducers
    in phase 1 and phase 2 only merges n_salts partials."""
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    phase1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(F.count("*").alias("__partial"))
    )
    return phase1.groupBy(*keys).agg(F.sum("__partial").alias("n"))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation for decomposable aggregates.

    `aggs` maps output name → phase-1 aggregate expression; phase 2 re-sums
    (valid for sum/count-shaped aggregates; min/max also work since
    max-of-max = max)."""
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    phase1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*[expr.alias(name) for name, expr in aggs.items()])
    )
    # phase-2 recombination: sum for sums/counts, min/max preserved by name hint
    def recombine(name: str) -> Column:
        if name.startswith("min"):
            return F.min(name).alias(name)
        if name.startswith("max"):
            return F.max(name).alias(name)
        return F.sum(name).alias(name)

    return phase1.groupBy(*keys).agg(*[recombine(n) for n in aggs])


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join without broadcast: salt the (large, skewed) left
    side; replicate the right side across all salts via an explode — each
    hot-key partition shrinks by n_salts.

    Only left-preserving joins are valid: right/full outer would emit each
    unmatched right row once per salt replica."""
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(f"salted_join does not support how={how!r} (right rows are replicated)")
    salted_left = left.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    replicated_right = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(n_salts)]))
    )
    return salted_left.join(replicated_right, [key, "__salt"], how).drop("__salt")

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


#: phase-2 recombiners for decomposable aggregates: combine(partials) must
#: equal the aggregate over the union of the salted groups.
_RECOMBINE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation for decomposable aggregates.

    ``aggs`` maps output name → ``(phase1_expr, combiner)`` where combiner is
    one of ``"sum" | "count" | "min" | "max"`` (or a callable
    ``colname -> Column``).  The combiner is EXPLICIT — an earlier version
    inferred it from the output-name prefix, which silently re-summed a min
    for aliases like ``smallest_x`` (wrong answer).  A bare Column raises so
    no caller can fall into that trap.

    Note count combines with SUM (total count = sum of per-salt counts), and
    avg is not decomposable by itself — pass separate sum + count outputs
    and divide afterwards.
    """
    for name, spec in aggs.items():
        if not (isinstance(spec, tuple) and len(spec) == 2):
            raise ValueError(
                f"salted_agg output {name!r}: pass (phase1_expr, combiner), "
                "e.g. (F.min('v'), 'min') — implicit combiner inference was "
                "removed because it mis-combined on alias names"
            )
        expr, comb = spec
        if not callable(comb) and comb not in _RECOMBINE:
            raise ValueError(
                f"salted_agg output {name!r}: unknown combiner {comb!r} "
                f"(expected one of {sorted(_RECOMBINE)} or a callable)"
            )
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    phase1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*[expr.alias(name) for name, (expr, _) in aggs.items()])
    )

    def recombine(name: str, comb) -> Column:
        fn = comb if callable(comb) else _RECOMBINE[comb]
        return fn(name).alias(name)

    return phase1.groupBy(*keys).agg(
        *[recombine(n, comb) for n, (_, comb) in aggs.items()]
    )


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

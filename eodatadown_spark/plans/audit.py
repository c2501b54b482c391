"""Physical-plan audit: verify that plans have the shape we want at scale.

Every operator's contract isn't just its rows — it's the plan: filters
pushed to the parquet scan, projections pruned into ReadSchema, small dims
broadcast, expressions inside WholeStageCodegen.  These helpers extract
those facts from the executed-plan string so tests and the plan-audit CLI
can assert them.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    plan = buf.getvalue()
    # executed AQE plans append the pre-adaptive "Initial Plan" — drop it so
    # operator counts reflect what actually ran
    return plan.split("== Initial Plan ==")[0]


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries across every parquet scan in the plan."""
    plan = physical_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of each scan — column-pruning evidence."""
    plan = physical_plan(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: (\S+)", plan)]


def scan_column_counts(df: DataFrame) -> list[int]:
    return [s.count(":") for s in read_schemas(df)]


def join_strategies(df: DataFrame) -> dict[str, int]:
    plan = physical_plan(df, "simple")
    return {
        kind: len(re.findall(kind, plan))
        for kind in (
            "BroadcastHashJoin",
            "SortMergeJoin",
            "ShuffledHashJoin",
            "BroadcastNestedLoopJoin",
        )
        if re.search(kind, plan)
    }


def codegen_stage_count(df: DataFrame, execute: bool = True) -> int:
    """Distinct WholeStageCodegen spans (simple mode marks them `*(n)`).

    Under AQE the codegen annotation only exists on the FINAL plan, so by
    default the plan is executed first (collect) — call on small inputs.
    """
    if execute:
        df.collect()
    plan = physical_plan(df, "simple")
    ids = set(re.findall(r"\*\((\d+)\)", plan))
    return len(ids)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges — the scale-limiting operator count."""
    plan = physical_plan(df, "simple")
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", plan))

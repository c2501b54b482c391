"""Plan audit CLI: dump pushdown / join-strategy / codegen / shuffle facts
for every entry query, so plan regressions are visible.

    python tools/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import __spark_entry__ as E
    from eodatadown_spark.plans import audit
    from eodatadown_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
    only = set(a for a in sys.argv[1:] if not os.path.isdir(a))

    spark = get_spark("explain_audit", shuffle_partitions=8)
    unknown = only - set(E.queries())
    if unknown:
        print(f"unknown queries: {sorted(unknown)}", file=sys.stderr)
        raise SystemExit(2)
    # Audit pure-plan variants where they exist (mirrors bench.py): queries
    # whose executable form checkpoints would otherwise report truncated
    # lineage (scans=[], exchanges=0) instead of the real shuffle structure.
    fns = dict(E.queries())
    fns.update(getattr(E, "plan_only", dict)())
    for name, fn in fns.items():
        if only and name not in only:
            continue
        df = fn(spark, sf_dir)
        pf = audit.pushed_filters(df)
        cols = audit.scan_column_counts(df)
        joins = audit.join_strategies(df)
        print(
            f"{name:28s} scans={cols} pushed={len(pf)} "
            f"joins={joins or '-'} codegen={audit.codegen_stage_count(df)} "
            f"exchanges={audit.exchange_count(df)}"
        )
        if only:
            print(audit.physical_plan(df))
    spark.stop()


if __name__ == "__main__":
    main()

"""Structural plan audit across bench entries (r14).

For each named query (default: the bench's EXTENDED list): execute once
via the noop sink, pull the FINAL adaptive plan from the SQL status
store, and report load-invariant health markers:

- n_exchange / n_reused   shuffle exchanges in the final plan vs reused
- n_scans / n_rdd         parquet scans vs pinned (ExistingRDD) leaves
- smj / bhj / shj         join strategy mix
- py                      BatchEvalPython/ArrowEvalPython nodes (§4)
- window                  window operators
- jobs / sql              Spark jobs and SQL executions per invocation

Wall time is printed but NOT the point — on a throttled host the plan
shape is the only trustworthy signal (guide §1.2/§7.2).

    python tools/plan_sweep.py [--sf-dir DIR] [query ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def final_plan(store) -> str:
    execs = store.executionsList()
    last = execs.apply(execs.size() - 1)
    desc = last.physicalPlanDescription()
    return desc.split("== Initial Plan ==")[0]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    import __spark_entry__ as entry
    from bench import EXTENDED, free_pinned, run_once
    from eodatadown_spark.session import get_spark

    names = args.queries or list(EXTENDED)
    spark = get_spark("plan_sweep")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    store = spark._jsparkSession.sharedState().statusStore()
    qmap = entry.queries()

    def last_job_id() -> int:
        ids = tracker.getJobIdsForGroup(None) or []
        return max(ids) if ids else -1

    header = (
        f"{'query':38s} {'wall':>6s} {'jobs':>4s} {'sql':>3s} "
        f"{'exch':>4s} {'reuse':>5s} {'scan':>4s} {'rdd':>3s} "
        f"{'smj':>3s} {'bhj':>3s} {'shj':>3s} {'py':>2s} {'win':>3s}"
    )
    print(header, flush=True)
    for name in names:
        fn = qmap[name]
        free_pinned(spark)
        j0 = last_job_id()
        s0 = store.executionsList().size()
        sc.setJobDescription(f"sweep:{name}")
        t0 = time.time()
        run_once(fn(spark, args.sf_dir))
        wall = time.time() - t0
        sc.setJobDescription(None)
        njobs = len([j for j in (tracker.getJobIdsForGroup(None) or []) if j > j0])
        nsql = store.executionsList().size() - s0
        plan = final_plan(store)
        print(
            f"{name:38s} {wall:6.2f} {njobs:4d} {nsql:3d} "
            f"{plan.count('Exchange') - plan.count('ReusedExchange') - plan.count('BroadcastExchange'):4d} "
            f"{plan.count('ReusedExchange'):5d} "
            f"{plan.count('Scan parquet'):4d} {plan.count('Scan ExistingRDD'):3d} "
            f"{plan.count('SortMergeJoin'):3d} {plan.count('BroadcastHashJoin'):3d} "
            f"{plan.count('ShuffledHashJoin'):3d} "
            f"{plan.count('BatchEvalPython') + plan.count('ArrowEvalPython'):2d} "
            f"{plan.count('Window'):3d}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()

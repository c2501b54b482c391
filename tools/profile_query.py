"""Per-query profiling: wall time, Spark job count, SQL-execution count.

Usage::

    python tools/profile_query.py [--sf-dir DIR] [--warm N] q150_incremental_clusters ...

For each named ``__spark_entry__.queries()`` entry: one cold run (noop sink)
then ``--warm`` warm runs, reporting per-run wall seconds plus the number of
Spark JOBS and SQL executions the run triggered.  A query whose wall time is
large while its per-job work is tiny is overhead-bound (too many sequential
actions: pins, counts, collects) — the r13 optimization tell.  Pins are
freed between queries (bench.free_pinned) so measurements don't inherit
block-manager pressure.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--warm", type=int, default=2)
    args = ap.parse_args()

    import __spark_entry__ as entry
    from bench import free_pinned, run_once
    from eodatadown_spark.session import get_spark

    spark = get_spark("profile_query")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    store = spark._jsparkSession.sharedState().statusStore()
    qmap = entry.queries()

    def job_count_since(jid0: int) -> int:
        ids = tracker.getJobIdsForGroup(None) or []
        return len([j for j in ids if j > jid0])

    def last_job_id() -> int:
        ids = tracker.getJobIdsForGroup(None) or []
        return max(ids) if ids else -1

    for name in args.queries:
        fn = qmap[name]
        for phase in ["cold"] + [f"warm{i}" for i in range(args.warm)]:
            free_pinned(spark)
            j0 = last_job_id()
            s0 = store.executionsList().size()
            sc.setJobDescription(f"profile:{name}:{phase}")
            t0 = time.time()
            df = fn(spark, args.sf_dir)
            t_build = time.time() - t0
            run_once(df)
            wall = time.time() - t0
            sc.setJobDescription(None)
            njobs = job_count_since(j0)
            nsql = store.executionsList().size() - s0
            print(
                f"{name:42s} {phase:6s} wall={wall:7.3f}s "
                f"build={t_build:6.3f}s jobs={njobs:3d} sql={nsql:3d}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()

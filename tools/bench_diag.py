"""Warm-sample variance diagnostic for the shuffle-heavy headline queries.

VERDICT r12 item 1: q24_minhash_neardup read 1.47 / 3.21 / 5.95 s warm
across three same-code runs within hours (q23/q26/q29 moved with it) while
the light queries agreed within 10%.  Candidate causes to rule in/out:

  (a) a per-session AQE decision flipping a borderline broadcast,
  (b) JVM GC / memory state after the pins-freed methodology change,
  (c) driver-host background load that the q10 anchor is too cheap to feel.

This tool runs N warm samples of each suspect query and records, per
sample: wall seconds, the EXECUTED (post-AQE) physical-plan signature of
every SQL execution the sample triggered, the JVM GC time/count delta, heap
occupancy, and host load (`os.getloadavg()` + /proc/stat busy-fraction
delta).  If the plan signature is identical across samples while wall time
moves 2x, cause (a) is ruled out and the telemetry says whether (b) or (c)
carries the variance.

Usage: python tools/bench_diag.py [n_samples] [sf_dir]
Emits one pretty JSON report to stdout (not a driver artifact).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUSPECTS = [
    "q10_revenue_by_nation",  # light anchor, for contrast
    "q23_cosine_topk",
    "q24_minhash_neardup",
    "q26_window_rollup",
    "q29_sessionize",
]

# telemetry primitives are shared with the bench itself (bench.py defines
# them so the per-round artifact carries the same signals this tool reads)
from bench import (  # noqa: E402
    ExecutionPlanTap,
    JvmTelemetry,
    free_pinned,
    proc_stat_totals,
    run_once,
)


def main() -> None:
    n_samples = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )

    import __spark_entry__ as E
    from eodatadown_spark.session import get_spark

    spark = get_spark("bench_diag")
    queries = E.queries()
    tele = JvmTelemetry(spark)
    tap = ExecutionPlanTap(spark)

    report: dict[str, dict] = {}
    for name in SUSPECTS:
        # warm-up (cold pass pays codegen; we diagnose the WARM samples)
        run_once(queries[name](spark, sf_dir))
        free_pinned(spark)
        tap.new_signatures()  # drain warm-up executions
        samples = []
        for _ in range(n_samples):
            gc_ms0, gc_n0 = tele.gc_totals()
            busy0, tot0 = proc_stat_totals()
            t0 = time.time()
            run_once(queries[name](spark, sf_dir))
            wall = round(time.time() - t0, 3)
            gc_ms1, gc_n1 = tele.gc_totals()
            busy1, tot1 = proc_stat_totals()
            sigs = tap.new_signatures()
            freed = free_pinned(spark)
            tap.new_signatures()  # drain unpersist-side executions, if any
            samples.append(
                {
                    "wall_sec": wall,
                    "gc_delta_ms": gc_ms1 - gc_ms0,
                    "gc_delta_n": gc_n1 - gc_n0,
                    "heap_used_mb": tele.heap_used_mb(),
                    "loadavg1": round(os.getloadavg()[0], 2),
                    # fraction of ALL host cpu time that was busy during
                    # the sample — background load shows up here
                    "host_busy_frac": round(
                        (busy1 - busy0) / max(1, tot1 - tot0), 3
                    ),
                    "plan_sigs": sigs,
                    "pins_freed": freed,
                }
            )
        walls = sorted(s["wall_sec"] for s in samples)
        uniq_sigs = {tuple(s["plan_sigs"]) for s in samples}
        report[name] = {
            "samples": samples,
            "wall_min": walls[0],
            "wall_median": walls[len(walls) // 2],
            "wall_max": walls[-1],
            "wall_spread_ratio": round(walls[-1] / max(walls[0], 1e-9), 2),
            "plan_flipped": len(uniq_sigs) > 1,
            "n_distinct_plan_sigs": len(uniq_sigs),
        }
        print(
            f"# {name}: median {report[name]['wall_median']}s "
            f"spread {report[name]['wall_spread_ratio']}x "
            f"plan_flipped={report[name]['plan_flipped']}",
            file=sys.stderr,
        )

    print(json.dumps(report, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()

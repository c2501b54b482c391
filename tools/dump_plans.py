"""Dump ``.explain("formatted")`` for named declared queries to files.

Used for the judge-facing plan artifacts (plans/rNN/<query>_{before,after}.txt):

    python tools/dump_plans.py --out plans/r13 --suffix after q50_neardup_clusters ...

Like tools/explain_audit.py (and bench.py's plan audit), queries with a
pure-plan variant in ``__spark_entry__.plan_only()`` are dumped through
that variant so the file shows the real shuffle structure instead of
lineage-truncated ExistingRDD leaves; queries without one are dumped in
executable form, where pinned subtrees appear as ExistingRDD exactly as
in the before files.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--out", default="plans/r13")
    ap.add_argument("--suffix", default="after")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    import __spark_entry__ as entry
    from bench import free_pinned
    from eodatadown_spark.session import get_spark

    spark = get_spark("dump_plans")
    qmap = dict(entry.queries())
    qmap.update(entry.plan_only())
    os.makedirs(args.out, exist_ok=True)
    for name in args.queries:
        df = qmap[name](spark, args.sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")
        free_pinned(spark)


if __name__ == "__main__":
    main()

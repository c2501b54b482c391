"""Shuffle / parquet codec A/B at a given SF dir (VERDICT r13 item 6).

    python tools/codec_ab.py lz4  [sf_dir]
    python tools/codec_ab.py zstd [sf_dir]

``spark.io.compression.codec`` is a static conf, so each codec runs in
its own process; run both and compare the two JSON lines.  Per
shuffle-heavy query the script reports the warm wall (median of 3 after
a warmup) and the shuffle bytes ON DISK right after the timed run (sum
of the session's blockmgr ``shuffle_*.data`` files — the physical bytes
the codec actually produced; the query's RDD references are still held
when we scan, so the cleaner has not removed them).  The parquet half
writes the largest input with each parquet codec (a per-write option,
not static) and reports file bytes + a re-scan aggregate wall.

Methodology note: this is an OFFLINE experiment tool — it never touches
bench.py's timed sections or the session defaults; the decision it
feeds lives in SCALING.md.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CODEC = sys.argv[1] if len(sys.argv) > 1 else "lz4"
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache", "sf1"
)

QUERIES = ["q24_minhash_neardup", "q29_sessionize", "q10_revenue_by_nation"]


def shuffle_bytes_on_disk() -> int:
    total = 0
    for pat in ("/tmp/blockmgr-*/*/shuffle_*.data",
                "/tmp/spark-*/blockmgr-*/*/shuffle_*.data"):
        for p in glob.glob(pat):
            try:
                total += os.path.getsize(p)
            except OSError:
                pass
    return total


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    from eodatadown_spark.session import RUNTIME_CONFS

    cpus = os.environ["SPARK_GRAFT_CPUS"]
    builder = (
        SparkSession.builder.appName(f"codec_ab_{CODEC}")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.io.compression.codec", CODEC)
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import __spark_entry__ as E
    from bench import free_pinned, run_once

    queries = E.queries()
    out: dict = {"codec": CODEC, "sf_dir": SF_DIR, "queries": {}}
    for name in QUERIES:
        run_once(queries[name](spark, SF_DIR))  # warmup
        free_pinned(spark)
        samples, sh_bytes = [], 0
        for _ in range(3):
            before = shuffle_bytes_on_disk()
            # construction INSIDE the timed region, exactly like bench.py
            # (pinned queries execute at construction)
            t0 = time.time()
            run_once(queries[name](spark, SF_DIR))
            samples.append(round(time.time() - t0, 3))
            # per-run delta of shuffle bytes on disk (the codec's output)
            sh_bytes = max(sh_bytes, shuffle_bytes_on_disk() - before)
            free_pinned(spark)
        samples.sort()
        out["queries"][name] = {
            "warm_sec": samples[1],
            "spread": [samples[0], samples[-1]],
            "shuffle_bytes_on_disk": sh_bytes,
        }

    # parquet codec half: write the biggest input both ways, re-scan
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    parquet = {}
    for pq_codec in ("snappy", "zstd"):
        work = tempfile.mkdtemp(prefix=f"codec_ab_pq_{pq_codec}_")
        try:
            t0 = time.time()
            (li.write.mode("overwrite").option("compression", pq_codec)
               .parquet(work))
            write_sec = round(time.time() - t0, 3)
            nbytes = sum(
                os.path.getsize(os.path.join(work, f))
                for f in os.listdir(work) if f.endswith(".parquet")
            )
            back = spark.read.parquet(work)
            run_once(back)  # warmup scan
            t0 = time.time()
            back.selectExpr(
                "sum(l_extendedprice)", "count(distinct l_orderkey)"
            ).write.format("noop").mode("overwrite").save()
            scan_sec = round(time.time() - t0, 3)
            parquet[pq_codec] = {
                "bytes": nbytes, "write_sec": write_sec, "scan_sec": scan_sec,
            }
        finally:
            shutil.rmtree(work, ignore_errors=True)
    out["parquet"] = parquet
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

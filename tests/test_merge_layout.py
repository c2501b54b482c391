"""merge_into / diff_snapshots / weighted_sample / zorder / detect_gaps."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import Row, functions as F

from eodatadown_spark.operators.merge import diff_snapshots, merge_into
from eodatadown_spark.operators.corpus import weighted_sample
from eodatadown_spark.operators.temporal import detect_gaps
from eodatadown_spark.spatial import cluster_by_zorder, zorder_key


@pytest.fixture()
def target(spark):
    return spark.createDataFrame(
        [
            Row(k=1, status="open", qty=10.0),
            Row(k=2, status="open", qty=20.0),
            Row(k=3, status="closed", qty=30.0),
            Row(k=4, status="open", qty=40.0),
        ]
    )


@pytest.fixture()
def source(spark):
    return spark.createDataFrame(
        [
            Row(k=2, status="shipped", qty=25.0),   # matched -> update
            Row(k=3, status="cancel", qty=0.0),     # matched -> delete branch
            Row(k=5, status="new", qty=50.0),       # not matched -> insert
        ]
    )


class TestMergeInto:
    def test_update_insert_delete(self, target, source):
        out = merge_into(
            target,
            source,
            on=["k"],
            when_matched_update={
                "status": F.col("s.status"),
                "qty": F.col("s.qty"),
            },
            when_matched_delete=F.col("s.status") == "cancel",
        )
        rows = {r["k"]: r for r in out.collect()}
        assert set(rows) == {1, 2, 4, 5}          # 3 deleted, 5 inserted
        assert rows[1]["status"] == "open" and rows[1]["qty"] == 10.0
        assert rows[2]["status"] == "shipped" and rows[2]["qty"] == 25.0
        assert rows[5]["status"] == "new" and rows[5]["qty"] == 50.0
        assert out.columns == target.columns

    def test_update_condition_and_no_insert(self, target, source):
        out = merge_into(
            target,
            source,
            on=["k"],
            when_matched_update={"qty": F.col("s.qty")},
            update_condition=F.col("s.qty") > F.col("t.qty"),
            when_not_matched_insert=False,
        )
        rows = {r["k"]: r for r in out.collect()}
        assert set(rows) == {1, 2, 3, 4}
        assert rows[2]["qty"] == 25.0             # 25 > 20 -> updated
        assert rows[3]["qty"] == 30.0             # 0 > 30 false -> kept

    def test_null_condition_is_not_satisfied(self, spark, target):
        src = spark.createDataFrame(
            [Row(k=2, status=None, qty=None)], "k bigint, status string, qty double"
        )
        out = merge_into(
            target,
            src,
            on=["k"],
            when_matched_update={"qty": F.lit(-1.0)},
            # NULL-valued condition: ANSI says "not satisfied", row carries
            update_condition=F.col("s.qty") > 0,
            when_matched_delete=F.col("s.status") == "cancel",  # NULL here too
        )
        rows = {r["k"]: r for r in out.collect()}
        assert rows[2]["qty"] == 20.0

    def test_insert_mapping_and_condition(self, target, source):
        out = merge_into(
            target,
            source,
            on=["k"],
            when_not_matched_insert={
                "status": F.lit("imported"),
                "qty": F.col("s.qty") * 2,
            },
            insert_condition=F.col("s.qty") > 0,
        )
        rows = {r["k"]: r for r in out.collect()}
        assert rows[5]["status"] == "imported" and rows[5]["qty"] == 100.0

    def test_duplicate_source_key_raises(self, spark, target):
        src = spark.createDataFrame(
            [Row(k=2, status="a", qty=1.0), Row(k=2, status="b", qty=2.0)]
        )
        merged = merge_into(
            target, src, on=["k"], when_matched_update={"qty": F.col("s.qty")}
        )
        with pytest.raises(Exception, match="multiple source rows"):
            merged.collect()
        # duplicate UNMATCHED source keys are legal: each inserts (ANSI)
        src2 = spark.createDataFrame(
            [Row(k=9, status="a", qty=1.0), Row(k=9, status="b", qty=2.0)]
        )
        out = merge_into(target, src2, on=["k"])
        assert out.where("k = 9").count() == 2

    def test_bad_args_raise(self, target, source):
        with pytest.raises(ValueError, match="at least one key"):
            merge_into(target, source, on=[])
        with pytest.raises(ValueError, match="missing from target"):
            merge_into(target, source, on=["nope"])
        with pytest.raises(ValueError, match="non-target columns"):
            merge_into(target, source, on=["k"], when_matched_update={"zz": F.lit(1)})


class TestDiffSnapshots:
    def test_cdc_classes(self, spark):
        old = spark.createDataFrame(
            [Row(k=1, v="a", w=1), Row(k=2, v="b", w=2), Row(k=3, v="c", w=3),
             Row(k=4, v=None, w=4)]
        )
        new = spark.createDataFrame(
            [Row(k=2, v="b", w=2),          # unchanged -> no row
             Row(k=3, v="c2", w=3),         # update
             Row(k=4, v="d", w=4),          # null -> value = update (null-safe)
             Row(k=5, v="e", w=5)]          # insert
        )
        got = {r["k"]: r["change_type"] for r in diff_snapshots(old, new, ["k"]).collect()}
        assert got == {1: "delete", 3: "update", 4: "update", 5: "insert"}

    def test_compare_cols_subset(self, spark):
        old = spark.createDataFrame([Row(k=1, v="a", w=1)])
        new = spark.createDataFrame([Row(k=1, v="a", w=99)])
        assert diff_snapshots(old, new, ["k"], compare_cols=["v"]).count() == 0
        assert (
            diff_snapshots(old, new, ["k"]).collect()[0]["change_type"] == "update"
        )


ROLLING_BASE, ROLLING_PRIME = 31, 2038074743


def _py_rolling(s: str) -> int:
    h = 0
    for ch in s.lower():
        if ch.isascii() and (ch.isalnum() or ch == " "):
            h = (h * ROLLING_BASE + ord(ch)) % ROLLING_PRIME
    return h


class TestWeightedSample:
    def test_matches_python_reference(self, spark):
        data = [Row(doc_id=i, w=float((i % 7) + 1)) for i in range(200)]
        df = spark.createDataFrame(data)
        got = [r["doc_id"] for r in weighted_sample(df, "w", 20, seed=7).collect()]

        def key(i, w):
            u = (_py_rolling(f"{i} 7") % (1 << 20) + 0.5) / (1 << 20)
            return math.log(u) / w

        want = sorted(data, key=lambda r: (-key(r.doc_id, r.w), r.doc_id))[:20]
        assert sorted(got) == sorted(r.doc_id for r in want)

    def test_deterministic_and_weight_sensitive(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=0, w=1e6)] + [Row(doc_id=i, w=1e-6) for i in range(1, 100)]
        )
        a = {r["doc_id"] for r in weighted_sample(df, "w", 5).collect()}
        b = {r["doc_id"] for r in weighted_sample(df, "w", 5).collect()}
        assert a == b
        assert 0 in a                      # ~1e12x weight: must be sampled
        zero_w = spark.createDataFrame([Row(doc_id=1, w=0.0), Row(doc_id=2, w=2.0)])
        assert [r["doc_id"] for r in weighted_sample(zero_w, "w", 5).collect()] == [2]


def _py_zorder(x, y, bits, xr, yr):
    n = 1 << bits
    qx = min(max(int(math.floor((x - xr[0]) / (xr[1] - xr[0]) * n)), 0), n - 1)
    qy = min(max(int(math.floor((y - yr[0]) / (yr[1] - yr[0]) * n)), 0), n - 1)
    z = 0
    for i in range(bits):
        z += ((qx >> i) & 1) << (2 * i)
        z += ((qy >> i) & 1) << (2 * i + 1)
    return z


class TestZOrder:
    def test_matches_python_interleave(self, spark):
        pts = [
            Row(x=-180.0, y=-90.0), Row(x=179.999, y=89.999), Row(x=0.0, y=0.0),
            Row(x=-77.1, y=38.9), Row(x=151.2, y=-33.9), Row(x=200.0, y=100.0),
            Row(x=13.4, y=52.5),
        ]
        df = spark.createDataFrame(pts)
        got = df.select("x", "y", zorder_key("x", "y", 16).alias("z")).collect()
        for r in got:
            assert r["z"] == _py_zorder(r["x"], r["y"], 16, (-180, 180), (-90, 90))

    def test_cluster_preserves_rows_and_sorts(self, spark):
        df = spark.createDataFrame(
            [Row(i=i, x=float((i * 37) % 360 - 180), y=float((i * 53) % 180 - 90))
             for i in range(500)]
        )
        out = cluster_by_zorder(df, "x", "y", n_partitions=4, bits=8)
        assert sorted(r["i"] for r in out.collect()) == list(range(500))

        def check(it):
            zs = [row["__zorder"] for row in it]
            assert zs == sorted(zs)
            return iter([len(zs)])

        sizes = out.rdd.mapPartitions(check).collect()
        assert sum(sizes) == 500

    def test_bits_bounds(self):
        with pytest.raises(ValueError):
            zorder_key(F.lit(0.0), F.lit(0.0), bits=0)


class TestDetectGaps:
    def test_gaps_strictly_greater(self, spark):
        t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
        rows = [
            Row(k="a", ts=t0),
            Row(k="a", ts=t0 + dt.timedelta(seconds=3600)),   # == gap: excluded
            Row(k="a", ts=t0 + dt.timedelta(seconds=3600 + 3601)),  # 3601s gap
            Row(k="b", ts=t0),
            Row(k="b", ts=t0 + dt.timedelta(seconds=10)),
        ]
        out = detect_gaps(
            spark.createDataFrame(rows), ["k"], "ts", min_gap_seconds=3600
        ).collect()
        assert len(out) == 1
        g = out[0]
        assert g["k"] == "a" and g["gap_seconds"] == 3601.0
        assert g["gap_start"] == t0 + dt.timedelta(seconds=3600)
        assert g["gap_end"] == t0 + dt.timedelta(seconds=7201)


class TestCatalogMergeInto:
    def test_partition_selective_merge(self, spark, landsat_scenes, tmp_path):
        import os
        from eodatadown_spark.catalog import ParquetCatalog

        cat = ParquetCatalog(spark, str(tmp_path))
        # two partitions: the 2019 fixture rows + one row moved to 2020
        extra = (
            landsat_scenes.where(F.col("pid") == 1)
            .withColumn("pid", F.lit(50).cast("long"))
            .withColumn("scene_id", F.lit("S50"))
            .withColumn("date_acquired", F.lit(dt.date(2020, 7, 1)))
        )
        cat.write(landsat_scenes.union(extra), "landsat_scenes")

        def inodes(year):
            d = os.path.join(cat.data_path("landsat_scenes"), f"p_year={year}")
            return {
                os.stat(os.path.join(d, f)).st_ino
                for f in os.listdir(d) if f.endswith(".parquet")
            }

        ino_2020_before = inodes(2020)

        upd = landsat_scenes.where(F.col("pid") == 0).withColumn(
            "cloud_cover", F.lit(99.0)
        ).withColumn("__op", F.lit("u"))
        dele = landsat_scenes.where(F.col("pid") == 2).withColumn("__op", F.lit("d"))
        ins = (
            landsat_scenes.where(F.col("pid") == 1)
            .withColumn("pid", F.lit(100).cast("long"))
            .withColumn("scene_id", F.lit("S100"))
            .withColumn("date_acquired", F.lit(dt.date(2021, 6, 1)))
            .withColumn("__op", F.lit("i"))
        )
        cat.merge_into(
            "landsat_scenes",
            upd.union(dele).union(ins),
            on=["pid"],
            when_matched_update={"cloud_cover": F.col("s.cloud_cover")},
            update_condition=F.col("s.__op") == "u",
            when_matched_delete=F.col("s.__op") == "d",
        )

        got = cat.read_clean("landsat_scenes")
        by_pid = {r["pid"]: r for r in got.collect()}
        assert 2 not in by_pid                             # deleted
        assert by_pid[0]["cloud_cover"] == 99.0            # updated
        assert by_pid[100]["date_acquired"] == dt.date(2021, 6, 1)  # inserted
        assert by_pid[50]["scene_id"] == "S50"             # untouched carries
        assert len(by_pid) == 8  # 7 fixture + 1 extra - 1 deleted + 1 inserted

        # untouched 2020 partition hard-linked: same inodes, zero data moved
        assert inodes(2020) == ino_2020_before
        # the insert created a brand-new partition dir
        assert os.path.isdir(
            os.path.join(cat.data_path("landsat_scenes"), "p_year=2021")
        )

    def test_insert_condition_may_reference_t_alias(
        self, spark, landsat_scenes, tmp_path
    ):
        # ADVICE r4: on the partitioned layout the insert clause used to be
        # evaluated against a source-only frame, so a condition referencing
        # 't.' (valid and NULL-evaluating in operators.merge.merge_into)
        # raised AnalysisException only here.  Now both paths agree:
        # t.<col> is NULL for not-matched rows.
        from eodatadown_spark.catalog import ParquetCatalog

        def ins_src(pid):
            return (
                landsat_scenes.where(F.col("pid") == 1)
                .withColumn("pid", F.lit(pid).cast("long"))
                .withColumn("scene_id", F.lit(f"S{pid}"))
            )

        cat = ParquetCatalog(spark, str(tmp_path))
        cat.write(landsat_scenes, "landsat_scenes")
        # t.pid IS NULL for a not-matched row -> condition true -> inserted
        cat.merge_into(
            "landsat_scenes", ins_src(400), on=["pid"],
            when_not_matched_insert=True,
            insert_condition=F.col("t.pid").isNull(),
        )
        assert cat.read_clean("landsat_scenes").where("pid = 400").count() == 1
        # t.pid IS NOT NULL null-evaluates false -> not inserted (same as
        # the operators.merge full-outer frame)
        cat.merge_into(
            "landsat_scenes", ins_src(401), on=["pid"],
            when_not_matched_insert=True,
            insert_condition=F.col("t.pid").isNotNull(),
        )
        assert cat.read_clean("landsat_scenes").where("pid = 401").count() == 0

    def test_update_partition_source_rejected(self, spark, landsat_scenes, tmp_path):
        from eodatadown_spark.catalog import ParquetCatalog

        cat = ParquetCatalog(spark, str(tmp_path))
        cat.write(landsat_scenes, "landsat_scenes")
        with pytest.raises(ValueError, match="partition-source"):
            cat.merge_into(
                "landsat_scenes",
                landsat_scenes.limit(1),
                on=["pid"],
                when_matched_update={"date_acquired": F.col("s.date_acquired")},
            )


class TestStreamMergeInto:
    def test_stream_merges_batches_into_catalog(self, spark, tmp_path):
        from eodatadown_spark.catalog import ParquetCatalog
        from eodatadown_spark.streaming.incremental import stream_merge_into

        cat = ParquetCatalog(spark, str(tmp_path / "cat"))
        schema = "k bigint, status string, qty double, seq bigint"
        cat.write(
            spark.createDataFrame(
                [(1, "open", 10.0, 0), (2, "open", 20.0, 0), (3, "open", 30.0, 0)],
                schema,
            ),
            "orders_live",
            partition=False,
        )
        src = str(tmp_path / "feed")
        # one file per batch; disjoint keys per file so any batch order
        # converges to the same final state
        spark.createDataFrame(
            # key 1 updated twice IN the same batch: dedup_order_col keeps seq 2
            [(1, "shipped", 11.0, 1), (1, "delivered", 12.0, 2)], schema
        ).coalesce(1).write.parquet(src)
        spark.createDataFrame(
            [(4, "new", 40.0, 1)], schema
        ).coalesce(1).write.mode("append").parquet(src)

        q = stream_merge_into(
            cat,
            "orders_live",
            spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src),
            on=["k"],
            checkpoint_dir=str(tmp_path / "ckpt"),
            dedup_order_col="seq",
            when_matched_update={
                "status": F.col("s.status"),
                "qty": F.col("s.qty"),
                "seq": F.col("s.seq"),
            },
        )
        try:
            q.awaitTermination(120)
        finally:
            q.stop()
        rows = {r["k"]: r for r in cat.read_clean("orders_live").collect()}
        assert set(rows) == {1, 2, 3, 4}
        assert rows[1]["status"] == "delivered" and rows[1]["qty"] == 12.0
        assert rows[2]["qty"] == 20.0
        assert rows[4]["status"] == "new"

    def test_events_file_stream_multibatch_parity(self, spark, tmp_path):
        """End-to-end: the rate-limited events_file_stream source drains a
        file-drop directory in maxFilesPerTrigger-bounded micro-batches
        through stream_merge_into, and the final catalog state equals a
        batch keep-latest ingest of the same files — streaming == batch on
        the driver's real events table, including cross-file key overlaps
        (later files update earlier rows)."""
        import os
        import time as _time

        from eodatadown_spark.catalog import ParquetCatalog
        from eodatadown_spark.streaming.incremental import (
            events_file_stream,
            stream_merge_into,
        )

        e = (
            spark.read.parquet("/root/testdata/sf0.001/events.parquet")
            .select("event_id", "user_id", "event_type", "value")
        )
        # three overlapping slices: overlaps become MERGE updates
        batches = [
            (e.where("event_id < 400"), 0),
            (e.where("event_id >= 300 AND event_id < 700")
              .withColumn("value", F.col("value") + 100), 1),
            (e.where("event_id >= 600")
              .withColumn("value", F.col("value") + 200), 2),
        ]
        feed = str(tmp_path / "feed")
        os.makedirs(feed)
        for df, i in batches:
            part = str(tmp_path / f"b{i}")
            df.coalesce(1).write.parquet(part)
            f = [p for p in os.listdir(part) if p.endswith(".parquet")][0]
            dst = os.path.join(feed, f"f{i}.parquet")
            os.rename(os.path.join(part, f), dst)
            # distinct mtimes: the file source processes oldest-first
            os.utime(dst, (1_000_000 + i * 60, 1_000_000 + i * 60))

        cat = ParquetCatalog(spark, str(tmp_path / "cat"))
        cat.write(e.limit(0), "events_live", partition=False)
        stream = events_file_stream(spark, feed, schema=e.schema)
        q = stream_merge_into(
            cat,
            "events_live",
            stream,
            on=["event_id"],
            checkpoint_dir=str(tmp_path / "ckpt"),
            when_matched_update={
                c: F.col(f"s.{c}") for c in e.columns if c != "event_id"
            },
        )
        try:
            q.awaitTermination(180)
        finally:
            q.stop()
        # rate limiting produced one micro-batch per file
        data_batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
        assert len(data_batches) == 3

        # batch-ingest oracle: union all files with their batch index,
        # keep-latest per key (J4 window) — the same final state
        from pyspark.sql import Window

        u = None
        for df, i in batches:
            tagged = df.withColumn("__b", F.lit(i))
            u = tagged if u is None else u.unionByName(tagged)
        w = Window.partitionBy("event_id").orderBy(F.col("__b").desc())
        expected = (
            u.withColumn("__rn", F.row_number().over(w))
            .where("__rn = 1")
            .drop("__b", "__rn")
        )
        got = cat.read_clean("events_live")
        assert got.count() == 1000
        assert (
            got.exceptAll(expected).count() == 0
            and expected.exceptAll(got).count() == 0
        )


class TestMaintainRollup:
    def test_incremental_equals_full_recompute(self, spark):
        from eodatadown_spark.operators.merge import maintain_rollup

        rows = [
            Row(g=i % 5, v=float(i * 7 % 23) if i % 11 else None)
            for i in range(300)
        ]
        base = spark.createDataFrame(rows[:200])
        delta = spark.createDataFrame(rows[200:])
        spec = {
            "total": (F.col("v"), "sum"),
            "lo": ("v", "min"),
            "hi": ("v", "max"),
        }

        def full(df):
            return df.groupBy("g").agg(
                F.sum("v").alias("total"), F.min("v").alias("lo"),
                F.max("v").alias("hi"), F.count(F.lit(1)).alias("n"),
            )

        r0 = full(base)
        got = {r["g"]: r for r in maintain_rollup(r0, delta, ["g"], spec).collect()}
        want = {r["g"]: r for r in full(base.union(delta)).collect()}
        assert set(got) == set(want)
        for g in want:
            for c in ("total", "lo", "hi", "n"):
                gv, wv = got[g][c], want[g][c]
                if isinstance(wv, float):
                    assert gv == pytest.approx(wv, abs=1e-9)
                else:
                    assert gv == wv

    def test_new_groups_insert_and_all_null_groups(self, spark):
        from eodatadown_spark.operators.merge import maintain_rollup

        base = spark.createDataFrame([Row(g=1, v=2.0)])
        delta = spark.createDataFrame(
            [Row(g=2, v=5.0), Row(g=3, v=None)], "g bigint, v double"
        )
        r0 = base.groupBy("g").agg(
            F.sum("v").alias("total"), F.count(F.lit(1)).alias("n")
        )
        got = {
            r["g"]: r
            for r in maintain_rollup(
                r0, delta, ["g"], {"total": ("v", "sum")}
            ).collect()
        }
        assert got[1]["total"] == 2.0 and got[1]["n"] == 1
        assert got[2]["total"] == 5.0 and got[2]["n"] == 1
        assert got[3]["total"] is None and got[3]["n"] == 1  # all-NULL sum stays NULL

    def test_unknown_kind_raises(self, spark):
        from eodatadown_spark.operators.merge import maintain_rollup

        df = spark.createDataFrame([Row(g=1, v=1.0)])
        with pytest.raises(ValueError, match="unknown aggregate kinds"):
            maintain_rollup(df, df, ["g"], {"x": ("v", "avg")})


class TestMergeNullKeys:
    def test_null_keys_never_match(self, spark):
        # ANSI MERGE: NULL = NULL is not a match — the NULL-keyed target row
        # carries over and the NULL-keyed source row inserts a second row
        target = spark.createDataFrame(
            [Row(k=None, v="t"), Row(k=1, v="a")], "k bigint, v string"
        )
        src = spark.createDataFrame(
            [Row(k=None, v="s"), Row(k=1, v="b")], "k bigint, v string"
        )
        out = merge_into(
            target, src, on=["k"], when_matched_update={"v": F.col("s.v")}
        ).collect()
        assert (1, "b") in [(r["k"], r["v"]) for r in out]
        null_vs = sorted(r["v"] for r in out if r["k"] is None)
        assert null_vs == ["s", "t"]  # carry-over + insert, no update

    def test_diff_null_keys_delete_insert(self, spark):
        old = spark.createDataFrame([Row(k=None, v="x")], "k bigint, v string")
        new = spark.createDataFrame([Row(k=None, v="x")], "k bigint, v string")
        got = sorted(r["change_type"] for r in diff_snapshots(old, new, ["k"]).collect())
        assert got == ["delete", "insert"]


class TestCatalogMergeSemanticsParity:
    def test_mapping_insert_absent_cols_null_on_partitioned(
        self, spark, landsat_scenes, tmp_path
    ):
        # partitioned path must follow operators.merge mapping semantics:
        # columns absent from the mapping insert as NULL, not source values
        from eodatadown_spark.catalog import ParquetCatalog

        cat = ParquetCatalog(spark, str(tmp_path))
        cat.write(landsat_scenes, "landsat_scenes")
        src = (
            landsat_scenes.where(F.col("pid") == 1)
            .withColumn("pid", F.lit(200).cast("long"))
            .withColumn("date_acquired", F.lit(dt.date(2022, 1, 1)))
        )
        cat.merge_into(
            "landsat_scenes",
            src,
            on=["pid"],
            when_not_matched_insert={
                "scene_id": F.lit("MAPPED"),
                "date_acquired": F.col("s.date_acquired"),
            },
        )
        row = cat.read_clean("landsat_scenes").where("pid = 200").collect()[0]
        assert row["scene_id"] == "MAPPED"
        assert row["date_acquired"] == dt.date(2022, 1, 1)
        assert row["remote_url"] is None  # absent from mapping -> NULL

    def test_insert_only_duplicate_matched_source_raises(
        self, spark, landsat_scenes, tmp_path
    ):
        # no matched clause -> the partition rewrite is skipped, but the
        # ANSI duplicate-source guard must still fire for matched keys
        from eodatadown_spark.catalog import ParquetCatalog

        cat = ParquetCatalog(spark, str(tmp_path))
        cat.write(landsat_scenes, "landsat_scenes")
        dup = landsat_scenes.where(F.col("pid") == 1).union(
            landsat_scenes.where(F.col("pid") == 1)
        )
        with pytest.raises(ValueError, match="multiple source rows"):
            cat.merge_into("landsat_scenes", dup, on=["pid"])


def _py_cdc_chunks(text, window=8, divisor=64):
    import re
    norm = re.sub(r"[^a-z0-9 ]", "", text.lower())
    if not norm:
        return []
    n = len(norm)
    if n < window:
        return [norm]
    P, B = 2038074743, 1_000_003
    cuts = [0]
    for i in range(0, n - window + 1):
        h = 0
        for ch in norm[i:i + window]:
            h = (h * B + ord(ch)) % P
        if h % divisor == 0:
            if i + window != cuts[-1]:
                cuts.append(i + window)
    if cuts[-1] != n:
        cuts.append(n)
    return [norm[a:b] for a, b in zip(cuts, cuts[1:])]


class TestCDCChunks:
    def test_matches_python_reference(self, spark):
        from eodatadown_spark.operators.dedup import cdc_chunks

        texts = [
            "The quick brown fox jumps over the lazy dog again and again. " * 4,
            "Lorem ipsum dolor sit amet, consectetur adipiscing elit sed do " * 3,
            "short",
            "punct!!!???",
            "",
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
        )
        got = {}
        for r in cdc_chunks(df, window=8, divisor=16).collect():
            got.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["chunk"]))
        for i, t in enumerate(texts):
            want = _py_cdc_chunks(t, 8, 16)
            have = [c for _, c in sorted(got.get(i, []))]
            assert have == want, f"doc {i}"

    def test_shift_robustness(self, spark):
        # inserting a leading paragraph shifts every offset; chunk
        # fingerprints after the insertion point survive — the property
        # fixed-window shingling at the char level cannot give
        from eodatadown_spark.operators.dedup import cdc_chunks

        body = "the common body of text that should dedup across docs " * 10
        df = spark.createDataFrame(
            [(1, body), (2, "an entirely new intro paragraph here. " + body)],
            "doc_id bigint, text string",
        )
        rows = cdc_chunks(df, window=8, divisor=16).collect()
        fps = {1: set(), 2: set()}
        for r in rows:
            fps[r["doc_id"]].add(r["chunk_fp"])
        shared = fps[1] & fps[2]
        assert len(shared) >= len(fps[1]) * 0.5  # most of doc 1 re-found

    def test_dup_stats(self, spark):
        from eodatadown_spark.operators.dedup import cdc_dup_stats

        body = "repeated passage that appears in two documents verbatim " * 8
        df = spark.createDataFrame(
            [(1, body), (2, "prefix. " + body), (3, "completely different unrelated text with no overlap at all " * 8)],
            "doc_id bigint, text string",
        )
        stats = {r["doc_id"]: r for r in cdc_dup_stats(df, window=8, divisor=16).collect()}
        assert stats[1]["n_shared"] > 0
        assert stats[2]["n_shared"] > 0
        assert stats[3]["n_shared"] == 0
        assert stats[3]["n_chunks"] > 0


class TestCatalogAppend:
    def test_append_hard_links_everything(self, spark, landsat_scenes, tmp_path):
        import os
        from eodatadown_spark.catalog import ParquetCatalog

        cat = ParquetCatalog(spark, str(tmp_path))
        cat.write(landsat_scenes, "landsat_scenes")

        def inodes():
            d = os.path.join(cat.data_path("landsat_scenes"), "p_year=2019")
            return {
                os.stat(os.path.join(d, f)).st_ino
                for f in os.listdir(d) if f.endswith(".parquet")
            }

        before = inodes()
        new_rows = (
            landsat_scenes.where(F.col("pid") == 0)
            .withColumn("pid", F.lit(300).cast("long"))
            .withColumn("scene_id", F.lit("S300"))
            .withColumn("date_acquired", F.lit(dt.date(2023, 3, 1)))
        )
        cat.append("landsat_scenes", new_rows)
        got = cat.read_clean("landsat_scenes")
        assert got.count() == 8
        assert got.where("pid = 300").count() == 1
        # every pre-existing file hard-linked (superset: append may add
        # files to an existing partition, never rewrites one)
        assert before <= inodes()
        assert os.path.isdir(
            os.path.join(cat.data_path("landsat_scenes"), "p_year=2023")
        )

    def test_append_casts_to_table_schema(self, spark, landsat_scenes, tmp_path):
        # ADVICE r4: appending rows with narrower incoming dtypes (int32
        # pid vs the table's int64) used to write mixed-schema parquet
        # files inside one partition; append now casts to the table schema
        # up front, like the merge_into insert path.
        from pyspark.sql.types import IntegerType, LongType
        from eodatadown_spark.catalog import ParquetCatalog

        cat = ParquetCatalog(spark, str(tmp_path))
        cat.write(landsat_scenes, "landsat_scenes")
        new_rows = (
            landsat_scenes.where(F.col("pid") == 0)
            .withColumn("pid", F.lit(301).cast(IntegerType()))
            .withColumn("scene_id", F.lit("S301"))
            .withColumn("date_acquired", F.lit(dt.date(2019, 8, 1)))
        )
        cat.append("landsat_scenes", new_rows)
        got = cat.read_clean("landsat_scenes")
        assert isinstance(got.schema["pid"].dataType, LongType)
        # the mixed-file partition must scan cleanly end-to-end
        assert got.where("pid = 301").count() == 1
        assert got.count() == 8


def test_cli_cdcdiff_catalog_versions(spark, tmp_path, capsys):
    import json

    import eodd_cli
    from eodatadown_spark.catalog import ParquetCatalog

    cat_dir = str(tmp_path / "cat")
    cat = ParquetCatalog(spark, cat_dir, retain_versions=3)
    cat.write(
        spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, v string"),
        "tbl",
        partition=False,
    )
    cat.write(
        spark.createDataFrame([(2, "B"), (3, "c")], "k bigint, v string"),
        "tbl",
        partition=False,
    )
    out = str(tmp_path / "diff")
    eodd_cli.main(["cdcdiff", "--catalog", cat_dir, "--table", "tbl",
                   "--from-version", "0", "--keys", "k", "--out", out])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats == {"out": out, "delete": 1, "update": 1, "insert": 1}


class TestKnnLabelVote:
    def test_majority_and_tiebreak(self, spark):
        from eodatadown_spark.operators.similarity import knn_label_vote

        # labeled points on two axes: label 1 along x, label 2 along y
        labeled = spark.createDataFrame(
            [
                (1, [1.0, 0.0], "x"), (2, [0.9, 0.1], "x"), (3, [0.8, 0.2], "x"),
                (4, [0.0, 1.0], "y"), (5, [0.1, 0.9], "y"),
            ],
            "vec_id bigint, embedding array<double>, label string",
        )
        queries = spark.createDataFrame(
            [(100, [1.0, 0.05]), (200, [0.05, 1.0])],
            "query_id bigint, embedding array<double>",
        )
        got = {
            r["query_id"]: r
            for r in knn_label_vote(labeled, queries, k=3).collect()
        }
        assert got[100]["label"] == "x" and got[100]["votes"] == 3
        assert got[200]["label"] == "y" and got[200]["votes"] == 2


def test_append_preserves_flat_layout(spark, tmp_path):
    import os
    from pyspark.sql import Row
    from eodatadown_spark.catalog import ParquetCatalog

    cat = ParquetCatalog(spark, str(tmp_path))
    # landsat_scenes IS in PARTITION_SOURCE but written deliberately flat
    df = spark.createDataFrame(
        [Row(pid=1, date_acquired=dt.date(2019, 1, 1), scene_id="A")]
    )
    cat.write(df, "landsat_scenes", partition=False)
    cat.append(
        "landsat_scenes",
        spark.createDataFrame(
            [Row(pid=2, date_acquired=dt.date(2020, 1, 1), scene_id="B")]
        ),
    )
    assert cat.read_clean("landsat_scenes").count() == 2
    assert not any(
        d.startswith("p_year=") for d in os.listdir(cat.data_path("landsat_scenes"))
    )


def test_zorder_write_produces_disjoint_file_ranges(spark, tmp_path):
    """The scale claim behind cluster_by_zorder: after the clustered write,
    each parquet file covers a disjoint __zorder interval (range partition +
    in-partition sort), so bbox scans can skip whole files on footer
    min/max stats."""
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import Row

    from eodatadown_spark.spatial import cluster_by_zorder

    df = spark.createDataFrame(
        [Row(i=i, x=float((i * 131) % 360 - 180), y=float((i * 211) % 180 - 90))
         for i in range(2000)]
    )
    out = str(tmp_path / "clustered")
    cluster_by_zorder(df, "x", "y", n_partitions=4, bits=12).write.parquet(out)

    ranges = []
    for f in os.listdir(out):
        if not f.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(out, f))
        lo = min(
            md.row_group(i).column(3).statistics.min for i in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(i).column(3).statistics.max for i in range(md.num_row_groups)
        )
        # column 3 must actually be __zorder for the stats to mean anything
        assert md.schema.column(3).name == "__zorder"
        ranges.append((lo, hi))
    ranges.sort()
    assert len(ranges) >= 2  # range partitioning actually split
    for (a_lo, a_hi), (b_lo, b_hi) in zip(ranges, ranges[1:]):
        assert a_hi <= b_lo  # files cover disjoint z intervals


def test_weighted_sample_by_group(spark):
    from eodatadown_spark.operators.corpus import (
        weighted_sample, weighted_sample_by_group,
    )

    df = spark.createDataFrame(
        [Row(doc_id=i, g=("a" if i % 2 == 0 else "b"), w=float((i % 5) + 1))
         for i in range(100)]
    )
    out = weighted_sample_by_group(df, "w", 7, "g").collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["g"], []).append(r["doc_id"])
    assert len(by_g["a"]) == 7 and len(by_g["b"]) == 7
    # within one group, the selection equals the global sampler run on that
    # group alone (same key, same ordering)
    only_a = df.where("g = 'a'")
    global_a = {r["doc_id"] for r in weighted_sample(only_a, "w", 7).collect()}
    assert set(by_g["a"]) == global_a


class TestMixSources:
    def test_budget_respected_and_deterministic(self, spark):
        from eodatadown_spark.operators.corpus import mix_sources

        df = spark.createDataFrame(
            [Row(doc_id=i, source=("a" if i < 50 else "b"), n_chars=100)
             for i in range(100)]
        )
        out = mix_sources(df, {"a": 550, "b": 200})
        by_src = {}
        for r in out.collect():
            by_src.setdefault(r["source"], []).append(r["doc_id"])
        assert len(by_src["a"]) == 5   # 550 // 100
        assert len(by_src["b"]) == 2
        again = mix_sources(df, {"a": 550, "b": 200}).collect()
        assert sorted(r["doc_id"] for r in again) == sorted(
            x for v in by_src.values() for x in v
        )

    def test_default_budget_excludes_and_python_reference(self, spark):
        from eodatadown_spark.operators.corpus import mix_sources

        df = spark.createDataFrame(
            [Row(doc_id=i, source="a", n_chars=10) for i in range(20)]
        )
        assert mix_sources(df, {}, default_budget=0).count() == 0

        def py_mix(ids, budget, per=10):
            order = sorted(ids, key=lambda i: (_py_rolling(f"{i} 42") % (1 << 20), i))
            out, running = set(), 0
            for i in order:
                running += per
                if running > budget:
                    break
                out.add(i)
            return out

        chosen = {r["doc_id"] for r in mix_sources(df, {"a": 50}).collect()}
        assert chosen == py_mix(range(20), 50)
        # appends re-derive from the full set: python reference agrees on
        # the enlarged frame too (membership MAY shift at the margin — the
        # selection is a pure function of the whole input, not incremental)
        bigger = df.union(
            spark.createDataFrame([Row(doc_id=i, source="a", n_chars=10)
                                   for i in range(1000, 1005)])
        )
        chosen2 = {r["doc_id"] for r in mix_sources(bigger, {"a": 50}).collect()}
        assert chosen2 == py_mix(list(range(20)) + list(range(1000, 1005)), 50)


class TestClusteredSplit:
    def test_neardups_share_split_and_no_leakage(self, spark):
        from eodatadown_spark.operators.corpus import assign_split_clustered
        from eodatadown_spark.operators.dedup import neardup_clusters

        base = "the quick brown fox jumps over the lazy dog again and again"
        rows = [Row(doc_id=i, text=f"unique document number {i} " * 5)
                for i in range(40)]
        # a 3-member near-dup chain with ids that would hash to different
        # buckets individually
        rows += [
            Row(doc_id=100, text=base),
            Row(doc_id=201, text=base + " extra"),
            Row(doc_id=302, text=base + " extra words"),
        ]
        docs = spark.createDataFrame(rows)
        clusters = neardup_clusters(docs, threshold=0.5)
        split = assign_split_clustered(docs, clusters)
        got = {r["doc_id"]: r["split"] for r in split.collect()}
        assert got[100] == got[201] == got[302]
        assert len(got) == 43
        # leakage gate: no near-dup pair straddles two splits
        from eodatadown_spark.operators.dedup import ngram_jaccard_pairs

        pairs = ngram_jaccard_pairs(docs, threshold=0.5)
        s = split.select("doc_id", "split")
        crossed = (
            pairs.join(s.withColumnRenamed("doc_id", "id_a")
                        .withColumnRenamed("split", "sa"), "id_a")
            .join(s.withColumnRenamed("doc_id", "id_b")
                   .withColumnRenamed("split", "sb"), "id_b")
            .where("sa <> sb")
        )
        assert crossed.count() == 0

    def test_leakage_gate_bounded_catches_planted_dup(self, spark):
        """The shared split_leakage_gate operator: a near-dup pair assigned
        to different splits trips BOTH modes (bounded mode samples docs by
        the portable uniform, and with sample_docs >= corpus the sample is
        total — the per-batch machinery, exercised end-to-end); a sound
        clustered split passes both; unknown mode raises."""
        from eodatadown_spark.operators.corpus import (
            assign_split_clustered,
            split_leakage_gate,
        )
        from eodatadown_spark.operators.dedup import neardup_clusters

        base = "the quick brown fox jumps over the lazy dog again and again"
        rows = [Row(doc_id=i, text=f"unique document number {i} " * 5)
                for i in range(30)]
        rows += [Row(doc_id=100, text=base), Row(doc_id=201, text=base + " extra")]
        docs = spark.createDataFrame(rows)

        # leaky split: planted near-dups forced into different splits
        leaky = docs.select(
            "doc_id",
            F.when(F.col("doc_id") == 100, "train")
            .when(F.col("doc_id") == 201, "test")
            .otherwise("train")
            .alias("split"),
        )
        for mode in ("exhaustive", "bounded"):
            bad = split_leakage_gate(
                docs, leaky, threshold=0.5, mode=mode, sample_docs=1000
            ).collect()
            assert {(r["id_a"], r["id_b"]) for r in bad} == {(100, 201)}, mode

        # sound split: cluster-keyed assignment passes both modes
        clusters = neardup_clusters(docs, threshold=0.5)
        sound = assign_split_clustered(docs, clusters).select("doc_id", "split")
        for mode in ("exhaustive", "bounded"):
            assert split_leakage_gate(
                docs, sound, threshold=0.5, mode=mode, sample_docs=1000
            ).count() == 0, mode

        with pytest.raises(ValueError, match="mode"):
            split_leakage_gate(docs, sound, mode="bogus")

    def test_leakage_gate_bounded_is_deterministic_subset(self, spark):
        """Bounded-mode sampling: same corpus + seed → same verdict rows;
        the sampled gate's violations are a subset of the exhaustive ones."""
        from eodatadown_spark.operators.corpus import split_leakage_gate

        base = "shared boilerplate text repeated across many documents here"
        rows = [Row(doc_id=i, text=f"{base} variant {i % 7}") for i in range(60)]
        docs = spark.createDataFrame(rows)
        # split everything by parity — guaranteed-leaky on purpose
        split = docs.select(
            "doc_id",
            F.when(F.col("doc_id") % 2 == 0, "train").otherwise("test").alias("split"),
        )
        full = {(r["id_a"], r["id_b"])
                for r in split_leakage_gate(docs, split, threshold=0.3).collect()}
        b1 = {(r["id_a"], r["id_b"])
              for r in split_leakage_gate(docs, split, threshold=0.3,
                                          mode="bounded", sample_docs=20).collect()}
        b2 = {(r["id_a"], r["id_b"])
              for r in split_leakage_gate(docs, split, threshold=0.3,
                                          mode="bounded", sample_docs=20).collect()}
        assert b1 == b2                     # deterministic
        assert b1 <= full                   # sampled subset of exhaustive
        assert b1                           # systematic leak trips the sample


def test_catalog_changes_since(spark, tmp_path):
    from eodatadown_spark.catalog import ParquetCatalog

    cat = ParquetCatalog(spark, str(tmp_path), retain_versions=3)
    cat.write(
        spark.createDataFrame([(1, "a"), (2, "b")], "pid bigint, v string"),
        "tbl", partition=False,
    )
    cat.write(
        spark.createDataFrame([(2, "B"), (3, "c")], "pid bigint, v string"),
        "tbl", partition=False,
    )
    got = {r["pid"]: r["change_type"]
           for r in cat.changes_since("tbl", 0, keys=("pid",)).collect()}
    assert got == {1: "delete", 2: "update", 3: "insert"}


def _py_zorder_n(vals, bits, ranges):
    n = 1 << bits
    k = len(vals)
    qs = []
    for v, (lo, hi) in zip(vals, ranges):
        qs.append(min(max(int(math.floor((v - lo) / (hi - lo) * n)), 0), n - 1))
    z = 0
    for i in range(bits):
        for j, q in enumerate(qs):
            z += ((q >> i) & 1) << (i * k + j)
    return z


class TestZOrderN:
    def test_matches_python_3d(self, spark):
        from eodatadown_spark.spatial import zorder_key_n

        ranges = [(-180.0, 180.0), (-90.0, 90.0), (0.0, 365.0)]
        rows = [Row(x=-180.0, y=-90.0, t=0.0), Row(x=179.9, y=89.9, t=364.9),
                Row(x=13.4, y=52.5, t=180.5), Row(x=500.0, y=-500.0, t=12.0)]
        df = spark.createDataFrame(rows)
        got = df.select(
            "x", "y", "t",
            zorder_key_n(["x", "y", "t"], ranges, bits=10).alias("z"),
        ).collect()
        for r in got:
            assert r["z"] == _py_zorder_n((r["x"], r["y"], r["t"]), 10, ranges)

    def test_2d_round_robin_matches_zorder_key(self, spark):
        # with k=2, round-robin interleave == the 2-D key's even/odd layout
        from eodatadown_spark.spatial import zorder_key, zorder_key_n

        df = spark.createDataFrame([Row(x=-77.1, y=38.9), Row(x=151.2, y=-33.9)])
        out = df.select(
            (zorder_key("x", "y", 16)
             == zorder_key_n(["x", "y"], [(-180.0, 180.0), (-90.0, 90.0)], 16)
             ).alias("eq")
        ).collect()
        assert all(r["eq"] for r in out)

    def test_bounds(self):
        from eodatadown_spark.spatial import zorder_key_n

        with pytest.raises(ValueError):
            zorder_key_n(["a"] * 8, [(0.0, 1.0)] * 8, bits=8)  # 64 > 62
        with pytest.raises(ValueError):
            zorder_key_n([], [], bits=8)


class TestEventAnalytics:
    def test_funnel_stage_chaining(self, spark):
        """Funnel: stage events count only strictly AFTER the user's first
        previous-stage event; same-timestamp events don't chain; stage
        counts are monotone non-increasing."""
        from eodatadown_spark.operators.temporal import funnel_stages

        rows = [
            # u1 completes the whole funnel in order
            (1, "2024-01-01 10:00:00", "view"),
            (1, "2024-01-01 10:05:00", "click"),
            (1, "2024-01-01 10:10:00", "purchase"),
            # u2 clicks BEFORE viewing -> click doesn't count
            (2, "2024-01-01 09:00:00", "click"),
            (2, "2024-01-01 09:30:00", "view"),
            # u3 clicks at the SAME instant as the view -> no chain
            (3, "2024-01-01 08:00:00", "view"),
            (3, "2024-01-01 08:00:00", "click"),
            # u4 never views
            (4, "2024-01-01 07:00:00", "purchase"),
        ]
        ev = spark.createDataFrame(
            [(u, ts, t) for u, ts, t in rows],
            "user_id long, ts string, event_type string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        got = {r["stage_name"]: r["n_users"]
               for r in funnel_stages(ev, ["view", "click", "purchase"]).collect()}
        assert got == {"view": 3, "click": 1, "purchase": 1}

        import pytest as _pytest
        with _pytest.raises(ValueError, match="at least one stage"):
            funnel_stages(ev, [])

    def test_cohort_retention_offsets(self, spark):
        """Cohorts keyed by Monday-truncated first-event week; offsets in
        whole weeks; distinct users per cell."""
        from eodatadown_spark.operators.temporal import cohort_retention

        rows = [
            # u1: first event Tue Jan 2 2024 (week of Mon Jan 1), active
            # again 2 weeks later (twice in that week -> counted once)
            (1, "2024-01-02 10:00:00"),
            (1, "2024-01-15 10:00:00"),
            (1, "2024-01-16 11:00:00"),
            # u2: same cohort week, only week 0
            (2, "2024-01-05 10:00:00"),
            # u3: cohort a week later
            (3, "2024-01-10 10:00:00"),
        ]
        ev = spark.createDataFrame(
            rows, "user_id long, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        got = {(str(r["cohort_week"]), r["week_offset"]): r["n_users"]
               for r in cohort_retention(ev).collect()}
        assert got == {
            ("2024-01-01", 0): 2,
            ("2024-01-01", 2): 1,
            ("2024-01-08", 0): 1,
        }


class TestCorpusDiagnostics:
    def test_vocab_overlap_exact_jaccard(self, spark):
        from eodatadown_spark.operators.corpus import vocab_overlap

        docs = spark.createDataFrame(
            [
                (1, "alpha beta gamma", "s1"),
                (2, "beta gamma delta", "s2"),
                (3, "ALPHA  beta", "s1"),     # case/whitespace-normalized
                (4, "zeta", "s3"),
            ],
            "doc_id long, text string, source string",
        )
        got = {(r["source_a"], r["source_b"]): r
               for r in vocab_overlap(docs).collect()}
        # s1 vocab {alpha,beta,gamma}, s2 {beta,gamma,delta}: share 2 of 4
        r = got[("s1", "s2")]
        assert (r["n_shared"], r["n_a"], r["n_b"], r["jaccard"]) == (2, 3, 3, 0.5)
        # disjoint sources never emit a row (inner join on token)
        assert ("s1", "s3") not in got and ("s2", "s3") not in got

    def test_zipf_slope_reference_fit(self, spark):
        """Slope equals the plain-Python OLS on the same rank/freq table;
        a single-type source yields NULL (zero x-variance)."""
        from eodatadown_spark.operators.corpus import zipf_slope

        text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
        docs = spark.createDataFrame(
            [(1, text, "s1"), (2, "solo solo", "s2")],
            "doc_id long, text string, source string",
        )
        got = {r["source"]: r for r in zipf_slope(docs).collect()}
        freqs = [8, 4, 2, 1]  # ranks 1..4
        xs = [math.log(i + 1) for i in range(4)]
        ys = [math.log(f) for f in freqs]
        n = 4
        want = (n * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)) / (
            n * sum(x * x for x in xs) - sum(xs) ** 2
        )
        assert got["s1"]["slope"] == round(want, 3)
        assert got["s1"]["n_types"] == 4 and got["s1"]["n_tokens"] == 15
        assert got["s2"]["slope"] is None          # one type -> undefined


class TestTransitionCounts:
    def test_bigram_counts_and_probs(self, spark):
        from eodatadown_spark.operators.temporal import transition_counts

        rows = [
            (1, "2024-01-01 10:00:00", "a", 1),
            (1, "2024-01-01 10:01:00", "b", 2),
            (1, "2024-01-01 10:02:00", "a", 3),
            (2, "2024-01-01 09:00:00", "a", 4),
            (2, "2024-01-01 09:01:00", "a", 5),
            (3, "2024-01-01 08:00:00", "b", 6),   # single event: no transition
        ]
        ev = spark.createDataFrame(
            rows, "user_id long, ts string, event_type string, event_id long"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        got = {(r["from_type"], r["to_type"]): r
               for r in transition_counts(ev, tie_col="event_id").collect()}
        assert {(k, v["n_trans"]) for k, v in got.items()} == {
            (("a", "b"), 1), (("b", "a"), 1), (("a", "a"), 1)
        }
        assert got[("a", "b")]["n_from"] == 2
        assert got[("a", "b")]["p"] == 0.5
        assert got[("b", "a")]["p"] == 1.0

    def test_tie_break_orders_same_timestamp(self, spark):
        from eodatadown_spark.operators.temporal import transition_counts

        ev = spark.createDataFrame(
            [(1, "2024-01-01 10:00:00", "x", 2), (1, "2024-01-01 10:00:00", "y", 1)],
            "user_id long, ts string, event_type string, event_id long",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        got = transition_counts(ev, tie_col="event_id").collect()
        assert [(r["from_type"], r["to_type"]) for r in got] == [("y", "x")]


class TestTimeToConversion:
    def test_first_start_first_later_end(self, spark):
        from eodatadown_spark.operators.temporal import time_to_conversion

        rows = [
            # u1: converts 90s after first signup; later purchase ignored
            (1, "2024-01-01 10:00:00", "signup"),
            (1, "2024-01-01 10:01:30", "purchase"),
            (1, "2024-01-01 11:00:00", "purchase"),
            # u2: purchase BEFORE signup only -> no conversion
            (2, "2024-01-01 09:00:00", "purchase"),
            (2, "2024-01-01 10:00:00", "signup"),
            # u3: signup only
            (3, "2024-01-01 08:00:00", "signup"),
            # u4: purchase at the same instant -> strictly-after excludes it
            (4, "2024-01-01 07:00:00", "signup"),
            (4, "2024-01-01 07:00:00", "purchase"),
        ]
        ev = spark.createDataFrame(
            rows, "user_id long, ts string, event_type string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        got = {r["user_id"]: r
               for r in time_to_conversion(ev, "signup", "purchase").collect()}
        assert set(got) == {1}
        assert got[1]["seconds"] == 90.0


class TestEwmaDaily:
    def test_recurrence_matches_python(self, spark):
        from eodatadown_spark.operators.temporal import ewma_daily

        rows = []
        counts = [4, 1, 7, 2]
        for day, n in enumerate(counts, start=1):
            for i in range(n):
                rows.append(("click", f"2024-02-0{day} 10:{i:02d}:00"))
        rows.append(("error", "2024-02-01 09:00:00"))  # single-day type
        ev = spark.createDataFrame(
            rows, "event_type string, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        got = {(r["event_type"], str(r["day"])): r
               for r in ewma_daily(ev, alpha=0.25).collect()}
        e = None
        for day, n in enumerate(counts, start=1):
            e = float(n) if e is None else 0.25 * n + 0.75 * e
            row = got[("click", f"2024-02-0{day}")]
            assert row["n"] == n and row["ewma"] == e  # bit-exact recurrence
        assert got[("error", "2024-02-01")]["ewma"] == 1.0


class TestAsofDirections:
    def test_matches_pandas_merge_asof(self, spark):
        """Randomized differential vs pandas merge_asof across all three
        directions × inclusive/strict — the reference implementation of
        the as-of contract."""
        import random

        import pandas as pd

        rng = random.Random(11)
        base = dt.datetime(2024, 1, 1)
        keys = ["a", "b", "c"]
        lrows, rrows = [], []
        for k in keys:
            # unique per-key right timestamps (tie-break among identical
            # right rows is unspecified on both sides)
            r_ts = rng.sample(range(0, 4000, 2), 25)
            for t in r_ts:
                rrows.append((k, base + dt.timedelta(seconds=t), float(t)))
            for t in rng.choices(range(0, 4000), k=40):
                lrows.append((k, base + dt.timedelta(seconds=t), len(lrows)))
        ldf = spark.createDataFrame(lrows, "k string, ts timestamp, lid long")
        rdf = spark.createDataFrame(rrows, "k string, ts timestamp, val double")
        lpd = pd.DataFrame(lrows, columns=["k", "ts", "lid"]).sort_values("ts")
        rpd = pd.DataFrame(rrows, columns=["k", "ts", "val"]).sort_values("ts")

        from eodatadown_spark.operators.temporal import asof_join

        for direction in ("backward", "forward", "nearest"):
            for inclusive in (True, False):
                got = {
                    r["lid"]: (r["ts_right"], r["val_right"])
                    for r in asof_join(
                        ldf, rdf, ["k"], right_value_cols=["val"],
                        allow_exact_matches=inclusive, direction=direction,
                    ).collect()
                }
                want_df = pd.merge_asof(
                    lpd, rpd, on="ts", by="k", direction=direction,
                    allow_exact_matches=inclusive, suffixes=("", "_right"),
                )
                for row in want_df.itertuples():
                    wts = None if pd.isna(row.val) else row.ts
                    g_ts, g_val = got[row.lid]
                    assert (g_ts is None) == (wts is None), (direction, inclusive, row.lid)
                    if g_ts is not None:
                        # matched right row's value identifies the row (val == seconds)
                        assert g_val == row.val, (direction, inclusive, row.lid)

    def test_unknown_direction_rejected(self, spark):
        from eodatadown_spark.operators.temporal import asof_join

        df = spark.createDataFrame([(1, dt.datetime(2024, 1, 1))], "k long, ts timestamp")
        with pytest.raises(ValueError, match="direction"):
            asof_join(df, df, ["k"], direction="sideways")


class TestDailyTrend:
    def test_exact_slope_and_null_variance(self, spark):
        from eodatadown_spark.operators.temporal import daily_trend

        rows = []
        # 'up': counts 1,3,5,7 over four days -> slope exactly 2.0
        for day, n in enumerate([1, 3, 5, 7], start=1):
            rows += [("up", f"2024-03-0{day} 12:00:00")] * n
        # 'flat single day' -> NULL slope
        rows.append(("one", "2024-03-01 09:00:00"))
        ev = spark.createDataFrame(
            rows, "event_type string, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        got = {r["event_type"]: r for r in daily_trend(ev).collect()}
        assert got["up"]["slope"] == 2.0 and got["up"]["n_days"] == 4
        assert got["one"]["slope"] is None


class TestDistinctSketchRollup:
    def test_incremental_merge_equals_full_and_bounds(self, spark):
        from eodatadown_spark.operators.merge import (
            build_distinct_sketches,
            merge_distinct_sketches,
        )

        rows = [(f"g{i % 3}", i % 40) for i in range(500)]
        df = spark.createDataFrame(rows, "g string, v long")
        a = df.where("v % 2 = 0")
        b = df.where("v % 2 = 1")
        merged = {
            r["g"]: r["approx_distinct"]
            for r in merge_distinct_sketches(
                build_distinct_sketches(a, ["g"], "v"),
                build_distinct_sketches(b, ["g"], "v"),
                ["g"],
            ).collect()
        }
        full = {
            r["g"]: r["approx_distinct"]
            for r in build_distinct_sketches(df, ["g"], "v").collect()
        }
        assert merged == full  # HLL union associativity: inc == recompute
        exact = {r["g"]: r["n"] for r in df.groupBy("g").agg(
            F.count_distinct("v").alias("n")).collect()}
        for g, est in merged.items():
            assert abs(est - exact[g]) / exact[g] <= 0.05


class TestQuantileSketchRollup:
    def test_merged_sketch_keeps_rank_guarantee(self, spark):
        from eodatadown_spark.operators.merge import (
            build_quantile_sketches,
            merge_quantile_sketches,
            sketch_quantile,
            sketch_rank,
        )

        rows = [(f"g{i % 2}", float(i)) for i in range(2000)]
        df = spark.createDataFrame(rows, "g string, v double")
        merged = merge_quantile_sketches(
            build_quantile_sketches(df.where("v % 2 = 0"), ["g"], "v"),
            build_quantile_sketches(df.where("v % 2 = 1"), ["g"], "v"),
            ["g"],
        )
        est = {
            r["g"]: (r["p50"], r["p99"], r["r500"])
            for r in merged.select(
                "g",
                sketch_quantile("qsketch", 0.5).alias("p50"),
                sketch_quantile("qsketch", 0.99).alias("p99"),
                sketch_rank("qsketch", F.lit(500.0)).alias("r500"),
            ).collect()
        }
        # per-group values are 0..1998 (even ids g0) / 1..1999 (g1): the
        # KLL rank guarantee at k=200 is ~1.65%; assert 4% end to end
        for g, (p50, p99, r500) in est.items():
            assert abs(p50 - 1000.0) <= 0.04 * 2000
            assert abs(p99 - 1980.0) <= 0.04 * 2000
            assert abs(r500 - 0.25) <= 0.04

    def test_quantile_estimates_within_rank_bound_vs_exact(self, spark):
        from eodatadown_spark.operators.merge import (
            build_quantile_sketches,
            sketch_quantile,
        )

        import random

        rng = random.Random(7)
        vals = [rng.lognormvariate(0, 1) for _ in range(3000)]
        df = spark.createDataFrame([("a", v) for v in vals], "g string, v double")
        sk = build_quantile_sketches(df, ["g"], "v")
        for q in (0.1, 0.5, 0.9):
            est = sk.select(sketch_quantile("qsketch", q)).first()[0]
            rank = sum(v <= est for v in vals) / len(vals)
            assert abs(rank - q) <= 0.04


class TestThetaSketchSetOps:
    def test_exact_mode_set_ops_are_exact_and_merge_matches(self, spark):
        from eodatadown_spark.operators.merge import (
            build_theta_sketches,
            merge_theta_sketches,
        )

        rows = [("a", i) for i in range(300)] + [("b", i) for i in range(150, 450)]
        df = spark.createDataFrame(rows, "g string, v long")
        sk = build_theta_sketches(df, ["g"], "v")
        a = sk.where("g = 'a'").select(F.col("tsketch").alias("sa"))
        b = sk.where("g = 'b'").select(F.col("tsketch").alias("sb"))
        got = a.crossJoin(b).select(
            F.theta_sketch_estimate(F.theta_intersection("sa", "sb")).alias("i"),
            F.theta_sketch_estimate(F.theta_difference("sa", "sb")).alias("d"),
            F.theta_sketch_estimate(F.theta_union("sa", "sb")).alias("u"),
        ).first()
        # 300-element sets sit in theta's exact (sub-sampling-free) mode
        assert (got["i"], got["d"], got["u"]) == (150, 150, 450)

        merged = {
            r["g"]: r["approx_distinct"]
            for r in merge_theta_sketches(
                build_theta_sketches(df.where("v % 2 = 0"), ["g"], "v"),
                build_theta_sketches(df.where("v % 2 = 1"), ["g"], "v"),
                ["g"],
            ).collect()
        }
        assert merged == {"a": 300, "b": 300}


class TestStreamNeardupApply:
    def test_streamed_batches_equal_from_scratch_rebuild(self, spark, tmp_path):
        """Round-8 capstone: the continuous-dedup lifecycle as a Structured
        Streaming pipeline.  Two document batches drain through
        stream_neardup_apply (maxFilesPerTrigger=1 → two serial
        micro-batches, batch 2's probe must see batch 1's index rows);
        the final stored assignments must equal a from-scratch
        neardup_clusters rebuild over the whole corpus."""
        from eodatadown_spark.catalog import ParquetCatalog
        from eodatadown_spark.operators import dedup as D
        from eodatadown_spark.streaming.incremental import stream_neardup_apply

        base = "the quick brown fox jumps over the lazy dog " * 5
        corpus_rows = [
            (1, base),
            (2, base + "edited"),                 # near-dup of 1
            (3, "a perfectly unique document about the weather today and "
                "tomorrow with plenty of words"),
        ]
        batch1_rows = [(100, base)]               # dups into {1,2}
        batch2_rows = [
            (200, base + "edited"),               # chains via 2 AND 100
            (201, "an entirely novel payload document with its own words "
                  "unlike anything stored before now"),
        ]
        schema = "doc_id long, text string"
        corpus = spark.createDataFrame(corpus_rows, schema)
        cat = ParquetCatalog(spark, str(tmp_path / "idx"))
        params = dict(k=3, num_perm=32, bands=8, jaccard_threshold=0.5)
        cat.write(D.minhash_band_index(
            corpus, k=3, num_perm=32, bands=8), "band_index", partition=False)
        cat.write(D.shingle_hash_table(corpus, k=3), "fingerprints",
                  partition=False)
        cat.write(
            D.neardup_clusters(corpus, threshold=0.5), "clusters",
            partition=False,
        )

        feed = str(tmp_path / "feed")
        spark.createDataFrame(batch1_rows, schema).coalesce(1).write.parquet(feed)
        spark.createDataFrame(batch2_rows, schema).coalesce(1).write.mode(
            "append").parquet(feed)
        q = stream_neardup_apply(
            cat,
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(feed),
            checkpoint_dir=str(tmp_path / "ckpt"),
            **params,
        )
        try:
            q.awaitTermination(180)
        finally:
            q.stop()

        got = {
            r["doc_id"]: (r["cluster_id"], r["is_canonical"])
            for r in cat.read("clusters").collect()
        }
        all_docs = spark.createDataFrame(
            corpus_rows + batch1_rows + batch2_rows, schema
        )
        want = {
            r["doc_id"]: (r["cluster_id"], r["is_canonical"])
            for r in D.neardup_clusters(all_docs, threshold=0.5).collect()
        }
        assert got == want          # streamed incremental == full rebuild
        assert got[200][0] == 1     # batch-2 doc chained into cluster {1,2,100}
        assert got[201] == (201, True)  # novel doc → singleton
        # index/fingerprints carry every doc exactly once
        assert cat.read("fingerprints").select("id").distinct().count() == 6
        dup = (
            cat.read("band_index").groupBy("id", "band_idx").count()
            .where(F.col("count") > 1).count()
        )
        assert dup == 0

    def test_streamed_prefix_family_equals_from_scratch_rebuild(
        self, spark, tmp_path
    ):
        """Round-10: the same two-serial-micro-batch drain through the
        EXACT-Jaccard prefix index (family="prefix") — final stored
        assignments equal a from-scratch rebuild, and the frozen freq
        table is untouched by the stream."""
        from eodatadown_spark.catalog import ParquetCatalog
        from eodatadown_spark.operators import dedup as D
        from eodatadown_spark.streaming.incremental import stream_neardup_apply

        base = "the quick brown fox jumps over the lazy dog " * 5
        corpus_rows = [
            (1, base),
            (2, base + "edited"),
            (3, "a perfectly unique document about the weather today and "
                "tomorrow with plenty of words"),
        ]
        batch1_rows = [(100, base)]
        batch2_rows = [
            (200, base + "edited"),
            (201, "an entirely novel payload document with its own words "
                  "unlike anything stored before now"),
        ]
        schema = "doc_id long, text string"
        corpus = spark.createDataFrame(corpus_rows, schema)
        cat = ParquetCatalog(spark, str(tmp_path / "idx"))
        prefix, freq, fps = D.jaccard_prefix_index(corpus, threshold=0.5)
        cat.write(prefix, "prefix_index", partition=False)
        cat.write(freq, "prefix_freq", partition=False)
        cat.write(fps, "fingerprints_exact", partition=False)
        cat.write(
            D.neardup_clusters(corpus, threshold=0.5), "clusters",
            partition=False,
        )
        freq_before = sorted(
            (r["sh"], r["__df"]) for r in cat.read("prefix_freq").collect()
        )

        feed = str(tmp_path / "feed")
        spark.createDataFrame(batch1_rows, schema).coalesce(1).write.parquet(feed)
        spark.createDataFrame(batch2_rows, schema).coalesce(1).write.mode(
            "append").parquet(feed)
        q = stream_neardup_apply(
            cat,
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(feed),
            checkpoint_dir=str(tmp_path / "ckpt"),
            family="prefix",
            k=3, threshold=0.5,
        )
        try:
            q.awaitTermination(180)
        finally:
            q.stop()

        got = {
            r["doc_id"]: (r["cluster_id"], r["is_canonical"])
            for r in cat.read("clusters").collect()
        }
        all_docs = spark.createDataFrame(
            corpus_rows + batch1_rows + batch2_rows, schema
        )
        want = {
            r["doc_id"]: (r["cluster_id"], r["is_canonical"])
            for r in D.neardup_clusters(all_docs, threshold=0.5).collect()
        }
        assert got == want
        assert got[200][0] == 1
        assert got[201] == (201, True)
        # frozen order: the stream never rewrites the frequency table
        freq_after = sorted(
            (r["sh"], r["__df"]) for r in cat.read("prefix_freq").collect()
        )
        assert freq_after == freq_before
        assert cat.read("fingerprints_exact").select("id").distinct().count() == 6


class TestStreamClassifyScore:
    def test_streamed_scores_equal_batch_and_replay_is_idempotent(
        self, spark, tmp_path
    ):
        """Streaming face of the learned quality gate: two micro-batches
        scored with a STORED weights artifact must equal batch scoring of
        the union; re-running a drained stream with a fresh checkpoint
        (the worst-case full replay) rewrites the same batch partitions
        instead of duplicating rows."""
        import json

        from eodatadown_spark.operators import classify as C
        from eodatadown_spark.streaming.incremental import stream_classify_score

        schema = "doc_id long, text string"
        train_rows = [
            (i, "the quick brown fox jumps over a lazy dog", True)
            for i in range(6)
        ] + [
            (i, "lorem ipsum dolor sit amet consectetur", False)
            for i in range(6, 12)
        ]
        train = spark.createDataFrame(train_rows, schema + ", good boolean")
        w = C.train_quality_classifier(
            train, label=F.col("good"), n_features=16, iters=12, lr=8.0,
            binary=True,
        )
        wpath = str(tmp_path / "w.json")
        with open(wpath, "w") as fh:
            json.dump({"weights": w, "binary": True, "id_col": "doc_id",
                       "text_col": "text"}, fh)

        b1 = [(100, "the quick brown fox arrives")]
        b2 = [(200, "lorem ipsum dolor text"), (201, "a lazy dog sleeps")]
        feed = str(tmp_path / "feed")
        spark.createDataFrame(b1, schema).coalesce(1).write.parquet(feed)
        spark.createDataFrame(b2, schema).coalesce(1).write.mode(
            "append").parquet(feed)
        out = str(tmp_path / "scored")

        def drain(ckpt):
            q = stream_classify_score(
                wpath,
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1").parquet(feed),
                out_dir=out,
                checkpoint_dir=str(tmp_path / ckpt),
            )
            try:
                q.awaitTermination(180)
            finally:
                q.stop()

        drain("ckpt1")
        got = {
            r["doc_id"]: r["prob"] for r in spark.read.parquet(out).collect()
        }
        want = {
            r["doc_id"]: r["prob"]
            for r in C.score_documents(
                spark.createDataFrame(b1 + b2, schema), w, binary=True
            ).collect()
        }
        assert got == want

        # full replay (fresh checkpoint): same partitions overwritten,
        # zero duplicate rows
        drain("ckpt2")
        again = spark.read.parquet(out).collect()
        assert len(again) == 3
        assert {r["doc_id"]: r["prob"] for r in again} == want


class TestStreamCountMinApply:
    def test_streamed_sketch_equals_one_pass_build(self, spark, tmp_path):
        """Two micro-batches counter-added into the stored CMS must equal
        a one-pass build over the union, counter for counter (CMS merge is
        exact addition — no tolerance)."""
        from eodatadown_spark.catalog import ParquetCatalog
        from eodatadown_spark.operators.merge import build_count_min
        from eodatadown_spark.streaming.incremental import stream_count_min_apply

        schema = "token string"
        b1 = [("alpha",)] * 4 + [("beta",)] * 2
        b2 = [("alpha",)] * 3 + [("gamma",)] * 5
        feed = str(tmp_path / "cms_feed")
        spark.createDataFrame(b1, schema).coalesce(1).write.parquet(feed)
        spark.createDataFrame(b2, schema).coalesce(1).write.mode(
            "append").parquet(feed)
        cat = ParquetCatalog(spark, str(tmp_path / "cms_cat"))

        q = stream_count_min_apply(
            cat,
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(feed),
            checkpoint_dir=str(tmp_path / "cms_ckpt"),
            depth=3,
            width=32,
        )
        try:
            q.awaitTermination(180)
        finally:
            q.stop()

        def counters():
            return {
                (r["cms_row"], r["cms_bucket"]): r["cnt"]
                for r in cat.read("cms_counters")
                .where("cms_row >= 0")
                .collect()
            }

        full = {
            (r["cms_row"], r["cms_bucket"]): r["cnt"]
            for r in build_count_min(
                spark.createDataFrame(b1 + b2, schema), "token", 3, 32
            ).collect()
        }
        assert counters() == full

        # worst-case FULL replay (fresh checkpoint): the per-batch
        # sentinels make every re-delivered batch a no-op — counters
        # unchanged, no double-add
        q2 = stream_count_min_apply(
            cat,
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(feed),
            checkpoint_dir=str(tmp_path / "cms_ckpt2"),
            depth=3,
            width=32,
        )
        try:
            q2.awaitTermination(180)
        finally:
            q2.stop()
        assert counters() == full


class TestStreamBloomApply:
    def test_streamed_filter_equals_one_pass_build(self, spark, tmp_path):
        """Two micro-batches union-folded into the stored Bloom must equal
        a one-pass build over the union, bit for bit; a worst-case full
        replay is a no-op by idempotence of set union (no sentinel)."""
        from eodatadown_spark.catalog import ParquetCatalog
        from eodatadown_spark.operators.merge import build_bloom
        from eodatadown_spark.streaming.incremental import stream_bloom_apply

        schema = "token string"
        b1 = [("alpha",), ("beta",)]
        b2 = [("alpha",), ("gamma",), ("delta",)]
        feed = str(tmp_path / "bloom_feed")
        spark.createDataFrame(b1, schema).coalesce(1).write.parquet(feed)
        spark.createDataFrame(b2, schema).coalesce(1).write.mode(
            "append").parquet(feed)
        cat = ParquetCatalog(spark, str(tmp_path / "bloom_cat"))

        def drain(ckpt):
            q = stream_bloom_apply(
                cat,
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1").parquet(feed),
                checkpoint_dir=str(tmp_path / ckpt),
                n_hashes=3,
                n_bits=64,
            )
            try:
                q.awaitTermination(180)
            finally:
                q.stop()

        drain("bloom_ckpt")
        full = {
            r["bloom_bit"]
            for r in build_bloom(
                spark.createDataFrame(b1 + b2, schema), "token", 3, 64
            ).collect()
        }
        bits = {r["bloom_bit"] for r in cat.read("bloom_bits").collect()}
        assert bits == full

        drain("bloom_ckpt2")  # full replay: union idempotence, unchanged
        assert {r["bloom_bit"] for r in cat.read("bloom_bits").collect()} == full


class TestStreamSpanIndexApply:
    def test_streamed_index_equals_one_pass_build(self, spark, tmp_path):
        """Micro-batches counter-added into the stored span index must
        equal a one-pass span_hash_index over the union (exact addition
        under disjoint doc ids); full replay is a sentinel no-op; the
        maintained table probes identically to a fresh build."""
        from eodatadown_spark.catalog import ParquetCatalog
        from eodatadown_spark.operators.dedup import (
            duplicated_spans_against_index,
            span_hash_index,
        )
        from eodatadown_spark.streaming.incremental import (
            stream_span_index_apply,
        )

        schema = "doc_id long, text string"
        shared = "s0 s1 s2 s3 s4 s5"
        b1 = [(1, shared + " a1 a2")]
        b2 = [(2, "b0 " + shared), (3, "unrelated words entirely here")]
        feed = str(tmp_path / "span_feed")
        spark.createDataFrame(b1, schema).coalesce(1).write.parquet(feed)
        spark.createDataFrame(b2, schema).coalesce(1).write.mode(
            "append").parquet(feed)
        cat = ParquetCatalog(spark, str(tmp_path / "span_cat"))

        def drain(ckpt):
            q = stream_span_index_apply(
                cat,
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1").parquet(feed),
                checkpoint_dir=str(tmp_path / ckpt),
                window=4,
            )
            try:
                q.awaitTermination(180)
            finally:
                q.stop()

        drain("span_ckpt")

        def counters():
            return {
                r["wh"]: (r["cnt"], r["n_docs"])
                for r in cat.read("span_index").where("wh >= 0").collect()
            }

        full = {
            r["wh"]: (r["cnt"], r["n_docs"])
            for r in span_hash_index(
                spark.createDataFrame(b1 + b2, schema), window=4
            ).collect()
        }
        assert counters() == full

        # full replay: sentinels make every re-delivered batch a no-op
        drain("span_ckpt2")
        assert counters() == full

        # the maintained table IS a valid probe target: a new batch
        # duplicating the shared run marks one maximal span
        probe = spark.createDataFrame(
            [(100, "z0 " + shared + " z1")], schema
        )
        got = duplicated_spans_against_index(
            probe, cat.read("span_index").where("wh >= 0"), window=4
        ).collect()[0]
        assert (got["n_dup_spans"], got["dup_tokens"]) == (1, 6)


def test_apply_batch_folds_free_their_pins(spark, tmp_path):
    """Continuous-operation memory contract: every apply_*_batch fold
    unpersists the blocks it pinned once its catalog commits land — a
    stream calling these per micro-batch for days must not ratchet
    block-manager memory up by one batch's pins per batch.  (Found via
    the round-12 bench: un-freed pins inflated late sections 3×.)"""
    from eodatadown_spark.catalog import ParquetCatalog
    from eodatadown_spark.streaming.incremental import (
        apply_bloom_batch,
        apply_count_min_batch,
        apply_span_index_batch,
    )

    cat = ParquetCatalog(spark, str(tmp_path / "pinfree"), retain_versions=3)
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    before = set(jmap.keys())
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta alpha beta gamma delta")],
        "doc_id long, text string",
    )
    toks = spark.createDataFrame([("alpha",), ("beta",)], "token string")
    r = apply_span_index_batch(cat, docs, window=4, batch_id=1)
    assert r["table_rows"] >= 1
    apply_bloom_batch(cat, toks, "token", n_hashes=3, n_bits=64)
    apply_count_min_batch(cat, toks, "token", depth=2, width=32, batch_id=1)
    after = set(spark.sparkContext._jsc.getPersistentRDDs().keys())
    leaked = after - before
    assert not leaked, f"fold leaked pinned RDDs: {leaked}"
    # and the committed state is still readable (pins freed AFTER commit)
    assert cat.read("span_index").where("wh >= 0").count() >= 1
    assert cat.read("bloom_bits").count() >= 1

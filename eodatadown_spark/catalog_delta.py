"""Delta Lake adapter for the catalog interface.

The engine's native store is :class:`eodatadown_spark.catalog.ParquetCatalog`
(versioned parquet: atomic pointer flip, hard-linked untouched partitions,
time travel, CDC, fsck) — self-contained, zero extra dependencies, and the
right call in a hermetic sandbox.  On a real cluster the same mutation
semantics are what a transactional table format provides natively, so this
module maps EVERY catalog operation onto its Delta Lake equivalent behind
the SAME method surface: a pipeline written against ``ParquetCatalog`` runs
against ``DeltaCatalog`` unchanged.

Operation mapping (the design note, executable):

=================  ====================================================
ParquetCatalog     Delta Lake equivalent (this adapter)
=================  ====================================================
write()            ``df.write.format("delta").mode("overwrite")``
                   (+ ``overwriteSchema``), partitioned by the derived
                   p_year/p_month columns — Delta's transaction log
                   replaces the version-directory pointer flip.
append()           ``mode("append")`` — Delta commits the new files
                   atomically; the hard-link trick is unnecessary
                   because unchanged files are never touched at all.
merge_updates()    ``DeltaTable.merge(...).whenMatchedUpdate(set=...)``
                   — Delta rewrites only files containing matched keys
                   (its file-level pruning is the finer-grained analog
                   of our partition-selective rewrite).
merge_into()       full MERGE clause routing via
                   :func:`delta_merge_clauses` →
                   ``whenMatchedUpdate / whenMatchedDelete /
                   whenNotMatchedInsert`` with conditions; Delta raises
                   on duplicate matched source keys (our
                   ``validate_unique_source`` guard) natively.
read_version()     time travel: ``option("versionAsOf", v)``.
list_versions()    ``DESCRIBE HISTORY`` version column.
changes_since()    time travel + snapshot diff — exactly
                   ParquetCatalog's implementation and net-change-per-
                   key contract (deliberately NOT the per-commit Change
                   Data Feed; see the method docstring).
compact()          ``OPTIMIZE`` (bin-packing); a zorder_by arg maps to
                   ``OPTIMIZE ... ZORDER BY`` — the transactional form
                   of spatial.cluster_by_zorder.
fsck()             consistency report: log-referenced files missing on
                   disk (via inputFiles — FSCK REPAIR TABLE is
                   Databricks-only) + VACUUM DRY RUN's unreferenced
                   list, the retain_versions-GC analog.
=================  ====================================================

The adapter needs the ``delta-spark`` package and a session configured with
Delta's SQL extension + catalog, neither shippable in this sandbox — every
entry point degrades to a loud ImportError, and the test suite auto-skips
the live half while the clause-translation layer (pure Python, no Delta
import) is tested everywhere.

Reference parity: the in-place scene mutations this models are
eodatadownlandsatgoogsensor.py:198-204,1401-1408,2493-2526 (SQLAlchemy
UPDATE/DELETE batches against PostgreSQL).
"""

from __future__ import annotations

import os
from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eodatadown_spark.catalog import PARTITION_SOURCE


def _require_delta():
    try:
        from delta.tables import DeltaTable  # noqa: F401

        return DeltaTable
    except ImportError as exc:  # pragma: no cover - exercised via tests' skip
        raise ImportError(
            "DeltaCatalog needs the delta-spark package and a Delta-enabled "
            "SparkSession (spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension, "
            "spark.sql.catalog.spark_catalog=org.apache.spark.sql.delta.catalog.DeltaCatalog); "
            "use ParquetCatalog for the dependency-free versioned-parquet store"
        ) from exc


def delta_merge_clauses(
    on: list[str],
    when_matched_update=None,
    update_condition=None,
    when_matched_delete=None,
    when_not_matched_insert=True,
    insert_condition=None,
    source_columns: list[str] | None = None,
    target_columns: list[str] | None = None,
) -> tuple[str, list[tuple[str, object, object]]]:
    """Translate the catalog MERGE clause kwargs into Delta's merge-builder
    call sequence: (join condition SQL, [(builder_method, condition, set)]).

    Pure function — no Delta import — so the translation (the part that can
    silently diverge from ``operators.merge.merge_into`` semantics) is unit
    tested in every environment; the live :meth:`DeltaCatalog.merge_into`
    just replays the returned sequence onto a ``DeltaTable.merge`` builder.

    Clause order matters and mirrors the operator: delete is evaluated
    before update when both are present (Delta applies whenMatched clauses
    in order, first condition wins — same as our CASE routing).

    Insert-all (``when_not_matched_insert=True``) is TARGET-schema-governed
    like ``operators.merge.merge_into``: given ``target_columns`` (and
    ``source_columns``) it expands to an explicit values mapping — key
    columns from the source, same-named source columns, NULL otherwise —
    so a source carrying extra columns inserts identically against both
    catalogs instead of tripping Delta's ``whenNotMatchedInsertAll`` on
    the unknown column (or silently schema-evolving the table).  Without
    ``target_columns`` the translation falls back to InsertAll with
    source-schema semantics — pass the table's columns to get parity.
    """
    cond = " AND ".join(f"t.{k} = s.{k}" for k in on)
    calls: list[tuple[str, object, object]] = []
    if when_matched_delete is not None:
        calls.append(("whenMatchedDelete", when_matched_delete, None))
    if when_matched_update is not None and not isinstance(when_matched_update, Mapping):
        raise TypeError("when_matched_update must be a column mapping")
    if when_matched_update:
        calls.append(("whenMatchedUpdate", update_condition, dict(when_matched_update)))
    if when_not_matched_insert is True and target_columns is not None:
        src_cols = set(source_columns or [])
        ins_all = {
            c: (
                F.col(f"s.{c}")
                if c in on or c in src_cols
                else F.lit(None)
            )
            for c in target_columns
        }
        calls.append(("whenNotMatchedInsert", insert_condition, ins_all))
    elif when_not_matched_insert is True:
        calls.append(("whenNotMatchedInsertAll", insert_condition, None))
    elif isinstance(when_not_matched_insert, Mapping):
        ins = dict(when_not_matched_insert)
        for k in on:  # key columns always come from the source
            ins.setdefault(k, F.col(f"s.{k}"))
        calls.append(("whenNotMatchedInsert", insert_condition, ins))
    elif when_not_matched_insert:  # truthy non-mapping, non-True
        raise TypeError("when_not_matched_insert must be True, False or a mapping")
    if not calls:
        raise ValueError("merge_into needs at least one WHEN clause")
    return cond, calls


class DeltaCatalog:
    """The catalog interface on Delta Lake tables under ``root``/<table>.

    Construction only checks that delta-spark is importable; every method
    is the documented Delta equivalent of the same-named ParquetCatalog
    operation (see module docstring for the full mapping table).
    """

    def __init__(self, spark: SparkSession, root: str):
        self._DeltaTable = _require_delta()
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- paths / existence ------------------------------------------------
    def data_path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        return self._DeltaTable.isDeltaTable(self.spark, self.data_path(table))

    def _dt(self, table: str):
        return self._DeltaTable.forPath(self.spark, self.data_path(table))

    # -- read / write -----------------------------------------------------
    def read(self, table: str) -> DataFrame:
        return self.spark.read.format("delta").load(self.data_path(table))

    def read_clean(self, table: str) -> DataFrame:
        return self.read(table).drop("p_year", "p_month")

    def write(self, df: DataFrame, table: str, partition: bool = True) -> None:
        part_src = PARTITION_SOURCE.get(table)
        w = df
        part_cols: list[str] = []
        if partition and part_src and part_src in df.columns:
            w = df.withColumn("p_year", F.year(F.col(part_src))).withColumn(
                "p_month", F.month(F.col(part_src))
            )
            part_cols = ["p_year", "p_month"]
        writer = (
            w.write.format("delta")
            .mode("overwrite")
            .option("overwriteSchema", "true")
        )
        if part_cols:
            writer = writer.partitionBy(*part_cols)
        writer.save(self.data_path(table))

    def replace_derived(
        self, table: str, build_fn, partition: bool = True,
        occ_retries: int = 5,
    ) -> None:
        """Delta twin of :meth:`ParquetCatalog.replace_derived`: a
        read→derive→overwrite whose conflicts surface through Delta's own
        optimistic transaction protocol (Concurrent*/MetadataChanged/ProtocolChanged family) and
        re-derive from the winner's commit.  NOTE: Delta's default
        WriteSerializable isolation lets a blind concurrent APPEND commit
        without conflicting with this overwrite; set the table to
        Serializable (``delta.isolationLevel``) when appenders race
        derived replaces — with the streaming dedup lifecycle's serial
        micro-batches this doesn't arise."""
        for _attempt in range(1 + occ_retries):
            try:
                self.write(build_fn(self.read(table)), table, partition=partition)
                return
            except Exception as exc:
                # Delta surfaces conflicts as mapped Python exception
                # classes when delta-spark's exception mapping is active,
                # else as Py4JJavaError wrapping the Java class — match the
                # class name AND the wrapped Java class name (str(exc)
                # leads with it), so the retry contract holds either way
                markers = ("Concurrent", "ProtocolChanged", "MetadataChanged")
                java_cls = ""
                je = getattr(exc, "java_exception", None)
                if je is not None:
                    try:
                        java_cls = je.getClass().getName()
                    except Exception:
                        java_cls = str(exc)[:500]
                name = type(exc).__name__ + " " + java_cls
                if any(m in name for m in markers):
                    continue  # delta OCC conflict — re-read and re-derive
                raise
        raise RuntimeError(
            f"replace_derived lost the delta optimistic-commit race "
            f"{1 + occ_retries} times on table {table!r}"
        )

    def append(self, table: str, rows: DataFrame) -> None:
        cur = self.read(table)
        part_cols = [c for c in ("p_year", "p_month") if c in cur.columns]
        part_src = PARTITION_SOURCE.get(table)
        out = rows.select(
            *[
                F.col(c).cast(cur.schema[c].dataType).alias(c)
                for c in cur.columns
                if c not in part_cols
            ]
        )
        if part_cols and part_src:
            out = out.withColumn("p_year", F.year(F.col(part_src)))
            if "p_month" in part_cols:
                out = out.withColumn("p_month", F.month(F.col(part_src)))
        out.write.format("delta").mode("append").save(self.data_path(table))

    # -- mutations --------------------------------------------------------
    def merge_updates(self, table: str, updates: DataFrame, key: str = "pid") -> None:
        part_src = PARTITION_SOURCE.get(table)
        if part_src is not None and part_src in updates.columns:
            raise ValueError(
                f"merge_updates cannot change partition source {part_src!r}; "
                "use write() for partition-moving rewrites"
            )
        (
            self._dt(table)
            .alias("t")
            .merge(updates.alias("s"), f"t.{key} = s.{key}")
            .whenMatchedUpdate(
                set={c: F.col(f"s.{c}") for c in updates.columns if c != key}
            )
            .execute()
        )

    def merge_into(
        self,
        table: str,
        source: DataFrame,
        on: list[str],
        when_matched_update=None,
        update_condition=None,
        when_matched_delete=None,
        when_not_matched_insert=True,
        insert_condition=None,
        validate_unique_source: bool = True,  # Delta enforces this natively
    ) -> None:
        part_src = PARTITION_SOURCE.get(table)
        if when_matched_update:
            forbidden = {part_src, "p_year", "p_month"} & set(when_matched_update)
            if forbidden:
                raise ValueError(
                    f"merge_into cannot update partition-source columns "
                    f"{sorted(forbidden)}; use write() for partition-moving rewrites"
                )
        all_cols = self.read(table).columns
        part_cols = [c for c in ("p_year", "p_month") if c in all_cols]
        cur_cols = [c for c in all_cols if c not in part_cols]
        cond, calls = delta_merge_clauses(
            on,
            when_matched_update,
            update_condition,
            when_matched_delete,
            when_not_matched_insert,
            insert_condition,
            source_columns=source.columns,
            target_columns=cur_cols,
        )
        if part_cols and part_src:
            # not-matched rows must land in their DERIVED partitions (the
            # ParquetCatalog parity contract) — Delta fills unmapped insert
            # columns with NULL, which would file the row under the HIVE
            # default partition and break pruning.  Derive from whatever
            # value the insert clause assigns to the partition-source
            # column (mapping value, else the source column).
            for i, (method, condition, values) in enumerate(calls):
                if method != "whenNotMatchedInsert" or values is None:
                    continue
                src_date = values.get(part_src, F.col(f"s.{part_src}"))
                values = dict(values)
                values["p_year"] = F.year(src_date)
                if "p_month" in part_cols:
                    values["p_month"] = F.month(src_date)
                calls[i] = (method, condition, values)
        builder = self._dt(table).alias("t").merge(source.alias("s"), cond)
        for method, condition, values in calls:
            fn = getattr(builder, method)
            kwargs = {}
            if condition is not None:
                kwargs["condition"] = condition
            if values is not None:
                kwargs["set" if "Update" in method else "values"] = values
            builder = fn(**kwargs)
        builder.execute()

    # -- history / time travel / CDC --------------------------------------
    def list_versions(self, table: str) -> list[int]:
        return sorted(
            r["version"] for r in self._dt(table).history().select("version").collect()
        )

    def read_version(self, table: str, version: int) -> DataFrame:
        return (
            self.spark.read.format("delta")
            .option("versionAsOf", version)
            .load(self.data_path(table))
        )

    def changes_since(self, table: str, version: int, keys=("pid",)) -> DataFrame:
        """CDC rows (keys + change_type) between `version` and now, via
        time travel + snapshot diff — EXACTLY ParquetCatalog's
        implementation and output contract (net change per key, not
        per-commit history).

        Deliberately not Delta's Change Data Feed: CDF emits per-commit
        update_pre/postimage rows, and collapsing a multi-commit history
        to the net per-key change is precisely the diff this method
        already computes — reading two snapshots is the simpler, contract-
        identical plan (and needs no table property on every write).
        """
        from eodatadown_spark.operators.merge import diff_snapshots

        old = self.read_version(table, version)
        new = self.read(table)
        return diff_snapshots(
            old.drop("p_year", "p_month"), new.drop("p_year", "p_month"), list(keys)
        )

    # -- maintenance ------------------------------------------------------
    def compact(self, table: str, zorder_by: list[str] | None = None) -> None:
        dt = self._dt(table)
        if zorder_by:
            dt.optimize().executeZOrderBy(*zorder_by)
        else:
            dt.optimize().executeCompaction()

    def fsck(self, table: str) -> dict:
        """Consistency REPORT (matching ParquetCatalog.fsck's posture —
        report, don't mutate), using only OSS-delta-supported surfaces:

        - ``missing_files``: current-snapshot data files the transaction
          log references but the filesystem lacks (ParquetCatalog's
          dangling-pointer check).  ``FSCK REPAIR TABLE`` — the statement
          that would drop such entries — is Databricks-runtime-only and
          does not parse on open-source delta-spark, so detection is done
          directly against ``inputFiles()`` (bounded by current-version
          file count, a driver-side listing either way).
        - ``unreferenced_files``: VACUUM DRY RUN's candidate list (the
          retain_versions-GC analog); an actual ``VACUUM`` is the user's
          retention decision, not a health check's.
        """
        from urllib.parse import unquote, urlparse

        path = self.data_path(table)
        # inputFiles() returns percent-encoded file: URIs — decode before
        # the existence check or paths with spaces read as missing
        missing = [
            f for f in self.read(table).inputFiles()
            if f.startswith("file:")
            and not os.path.exists(unquote(urlparse(f).path))
        ]
        unreferenced = self.spark.sql(f"VACUUM delta.`{path}` RETAIN 168 HOURS DRY RUN").count()
        return {
            "table": table,
            "missing_files": missing,
            "unreferenced_files": unreferenced,
        }


__all__ = ["DeltaCatalog", "delta_merge_clauses"]

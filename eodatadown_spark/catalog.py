"""Parquet-backed catalog storage with atomic read-modify-write.

The reference mutates catalog rows in place through an RDBMS session
(SURVEY.md §2.11).  On immutable Parquet the equivalent is batched
read-modify-overwrite: compute the new table as a DataFrame, write it to a
versioned directory, then flip a pointer — never a partial in-place rewrite,
so a crashed job can't tear the catalog.

Layout per table::

    <root>/<table>/_CURRENT          # text file: name of live version dir
    <root>/<table>/v_<n>/...parquet  # data versions (date-partitioned)

At 100 TB scale the same pattern holds (the pointer flip is what table
formats like Delta/Iceberg formalize; those jars aren't in this image, so the
catalog implements the minimal version-pointer variant itself).  Sensor
tables are partitioned by ``year(date-col)`` so the reference's date-keyed
access patterns (F1/F2/F12) get partition pruning.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eodatadown_spark import schemas

_CURRENT = "_CURRENT"


def _has_parquet_files(path: str) -> bool:
    for _root, _dirs, files in os.walk(path):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def _as_string_schema(schema):
    """Same field names, all StringType — staging schema for JSON import."""
    from pyspark.sql import types as T

    return T.StructType([T.StructField(f.name, T.StringType(), True) for f in schema.fields])

# partition column derived from each table's natural date column
PARTITION_SOURCE: dict[str, str] = {
    name: col for name, col in schemas.WATERMARK_COLS.items()
}


class ParquetCatalog:
    """Versioned Parquet tables under a root directory."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- paths ------------------------------------------------------------
    def _table_dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _current_version(self, table: str) -> str | None:
        pointer = os.path.join(self._table_dir(table), _CURRENT)
        if not os.path.exists(pointer):
            return None
        with open(pointer, encoding="utf-8") as fh:
            return fh.read().strip()

    def data_path(self, table: str) -> str:
        version = self._current_version(table)
        if version is None:
            raise FileNotFoundError(f"catalog table not initialised: {table}")
        return os.path.join(self._table_dir(table), version)

    def exists(self, table: str) -> bool:
        return self._current_version(table) is not None

    # -- read/write -------------------------------------------------------
    def read(self, table: str) -> DataFrame:
        path = self.data_path(table)
        # an empty partitioned write emits no part files → schema inference
        # fails; ONLY that case falls back to the declared schema (a blanket
        # except would turn transient read errors into silent catalog wipes)
        if not _has_parquet_files(path):
            declared = schemas.ALL_SCHEMAS.get(table)
            if declared is not None:
                return self.spark.createDataFrame([], schema=declared)
        return self.spark.read.parquet(path)

    def write(self, df: DataFrame, table: str, partition: bool = True) -> None:
        """Atomically replace `table` with `df` (new version dir + pointer flip)."""
        table_dir = self._table_dir(table)
        os.makedirs(table_dir, exist_ok=True)
        old = self._current_version(table)
        nxt = 0 if old is None else int(old.split("_")[1]) + 1
        version = f"v_{nxt}"
        out = os.path.join(table_dir, version)

        writer = df.write.mode("overwrite")
        part_src = PARTITION_SOURCE.get(table)
        if partition and part_src is not None and part_src in df.columns:
            df = df.withColumn("p_year", F.year(F.col(part_src)))
            writer = df.write.mode("overwrite").partitionBy("p_year")
        writer.parquet(out)

        tmp_pointer = os.path.join(table_dir, _CURRENT + ".tmp")
        with open(tmp_pointer, "w", encoding="utf-8") as fh:
            fh.write(version)
        os.replace(tmp_pointer, os.path.join(table_dir, _CURRENT))  # atomic flip
        if old is not None:
            shutil.rmtree(os.path.join(table_dir, old), ignore_errors=True)

    def read_clean(self, table: str) -> DataFrame:
        """Read without the physical partition column."""
        df = self.read(table)
        return df.drop("p_year") if "p_year" in df.columns else df

    # -- bucketed tables (scale path: shuffle-free co-located joins) -------
    def write_bucketed(
        self,
        df: DataFrame,
        table: str,
        bucket_col: str = "pid",
        n_buckets: int = 16,
    ) -> None:
        """Persist as a bucketed managed table so repeated joins/aggs on
        `bucket_col` (scene⋈plugin_results, obs-date bridges) need no
        exchange.  Bucketing requires the table catalog (saveAsTable); the
        data lands under spark.sql.warehouse.dir.
        """
        self.spark.sql(f"DROP TABLE IF EXISTS eodd_{table}")
        # a stale location without a metastore entry (fresh session, old
        # warehouse dir) blocks saveAsTable — clear it
        warehouse = self.spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        stale = os.path.join(warehouse.removeprefix("file:"), f"eodd_{table}")
        shutil.rmtree(stale, ignore_errors=True)
        (
            df.write.mode("overwrite")
            .bucketBy(n_buckets, bucket_col)
            .sortBy(bucket_col)
            .format("parquet")
            .saveAsTable(f"eodd_{table}")
        )

    def read_bucketed(self, table: str) -> DataFrame:
        return self.spark.table(f"eodd_{table}")

    # -- JSON import/export (S6 / K1; ref eodatadownlandsatgoogsensor.py:2527-2687)
    def export_json(self, table: str, out_file: str) -> None:
        """Serialize a table to a single JSON file (dict keyed by first column),
        matching the reference's `export_db_to_json` shape."""
        df = self.read_clean(table)
        rows = [row.asDict(recursive=True) for row in df.collect()]
        # key by the unique pid as the reference does; composite-key tables
        # (plugin_results, obs_dates...) fall back to a running index so no
        # row is silently overwritten
        if "pid" in df.columns:
            payload = {str(row["pid"]): row for row in rows}
        else:
            payload = {str(i): row for i, row in enumerate(rows)}
        with open(out_file, "w", encoding="utf-8") as fh:
            json.dump(payload, fh, default=str)

    def import_json(
        self,
        table: str,
        in_file: str,
        replace_path_dict: dict[str, str] | None = None,
        path_cols: tuple[str, ...] = ("download_path", "ardproduct_path"),
    ) -> None:
        """Load an exported JSON dict-of-rows back into `table`, optionally
        rewriting path prefixes (ref `import_sensor_db`,
        eodatadownlandsatgoogsensor.py:2605-2687)."""
        schema = schemas.ALL_SCHEMAS.get(table)
        with open(in_file, encoding="utf-8") as fh:
            payload = json.load(fh)
        rows = list(payload.values())
        # export serialized dates/timestamps with default=str → parse back per
        # the declared schema (C1 multi-format semantics live in the cast).
        df = self.spark.createDataFrame(
            [json.dumps(r) for r in rows], "string"
        ).select(F.from_json("value", _as_string_schema(schema)).alias("r")).select("r.*")
        for field in schema.fields:
            df = df.withColumn(field.name, F.col(field.name).cast(field.dataType))
        if replace_path_dict:
            from eodatadown_spark.functions.paths import rewrite_path_prefixes

            for col in path_cols:
                if col in df.columns:
                    df = df.withColumn(col, rewrite_path_prefixes(col, replace_path_dict))
        self.write(df, table)

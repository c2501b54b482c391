"""Loaders for the driver-generated test tables (/root/testdata/sf*).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet each (TESTDATA.md).

The only normalization applied is on ``events.ts``: the file stores
TIMESTAMP(NANOS) which Spark's parquet reader rejects; with
``spark.sql.legacy.parquet.nanosAsLong=true`` it arrives as ns-since-epoch
LongType and is converted here to a microsecond TimestampType (floor
division — matches DuckDB's ns→µs cast truncation).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eodatadown_spark.session import apply_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def sf_dir_from_env() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    apply_runtime_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so queries can be written in SQL."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)

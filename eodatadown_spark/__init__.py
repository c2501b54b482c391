"""eodatadown_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of remotesensinginfo/eodatadown.

The reference system (see /root/reference, SURVEY.md) is an Earth-Observation
scene-catalog + processing-state-machine built on SQLAlchemy/PostgreSQL with
Python-loop execution.  This package re-expresses the same semantics
Spark-first:

- catalogs are partitioned Parquet tables with explicit StructType schemas
  (:mod:`eodatadown_spark.schemas`, :mod:`eodatadown_spark.catalog`);
- every query is a declarative DataFrame/SQL plan so Catalyst performs the
  predicate pushdown / column pruning the reference hand-rolled into BigQuery
  SQL strings (SURVEY.md §4);
- application-level loops (per-row existence checks, N+1 plugin probes,
  per-count queries) become set-based joins and single-pass aggregations;
- per-scene heavy processing is a partitioned task fan-out
  (:mod:`eodatadown_spark.pipeline`), not a multiprocessing pool.

Beyond reference parity, :mod:`eodatadown_spark.operators` adds the
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) that a 100 TB corpus build needs.
"""

__version__ = "0.1.0"

from eodatadown_spark.session import get_spark  # noqa: F401

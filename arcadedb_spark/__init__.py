"""arcadedb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ArcadeData/arcadedb.

This is NOT a port of the reference engine.  The reference
(`/root/reference`, ArcadeDB, Apache-2.0) is a single-node multi-model DBMS
with its own row-store, LSM indexes and pull-based executor; this package
re-expresses its *query semantics* (SQL dialect, graph MATCH/TRAVERSE,
time-series functions, full-text/vector search) as idiomatic Spark
DataFrame programs so that Catalyst/Tungsten/AQE pick the physical plan.

Entry points
------------
- :class:`arcadedb_spark.database.Database` — catalog of typed tables
  (documents / vertices / edges), mirrors ``com.arcadedb.database.Database``.
- ``db.query(sql)`` — ArcadeDB SQL dialect (SELECT / MATCH / TRAVERSE)
  translated to DataFrame ops (reference pipeline:
  engine/src/main/java/com/arcadedb/query/sql/SQLQueryEngine.java:85).
- ``db.select()`` — fluent builder mirroring the reference native API
  (engine/src/main/java/com/arcadedb/query/select/Select.java:78).
- :mod:`arcadedb_spark.graph` — graph model + algorithms (PageRank, WCC,
  shortest paths, …) as DataFrame-iterative programs.
- :mod:`arcadedb_spark.timeseries` — ts.* windowed analytics.
- :mod:`arcadedb_spark.text`, :mod:`arcadedb_spark.vector`,
  :mod:`arcadedb_spark.dedup` — full-text BM25, kNN, dedup operators for
  large-scale training-data pipelines.
"""

import arcadedb_spark.lineage  # noqa: F401  (installs DataFrame.truncate_plan)
from arcadedb_spark.database import Database
from arcadedb_spark.session import get_spark

__all__ = ["Database", "get_spark"]

__version__ = "0.1.0"

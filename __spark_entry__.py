"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one operator family from SURVEY.md §2
through the arcadedb_spark engine (SQL dialect, MATCH/TRAVERSE, graph
algorithms, ts windows, text/vector/dedup operators); ``oracle_sql()``
holds the equivalent ANSI SQL for the DuckDB side-by-side check.

Numeric parity rules (so value hashes match):
- SUM over doubles goes through DECIMAL(25,6) in BOTH engines (exact
  accumulation, then exact cast to double) — double summation order
  differs between engines otherwise.
- AVG/stddev stay double but are rounded (error ≪ rounding grid).
- Timestamps are returned as epoch millis (BIGINT) to dodge tz/precision
  stringification differences.
- Every computed column is aliased identically in both dialects.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DBS: dict[tuple[int, str], object] = {}


def _db(spark: SparkSession, sf_dir: str):
    from arcadedb_spark.database import Database

    key = (id(spark), sf_dir)
    if key not in _DBS:
        _DBS[key] = Database.open(spark, sf_dir)
    return _DBS[key]


# ---------------------------------------------------------------------------
# entry — flagship smoke query (driver runs at sf0.001)
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """TPC-H Q1 shape through the full parse→translate→Catalyst pipeline."""
    db = _db(spark, "/root/testdata/sf0.001")
    return db.query(
        """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity.asDecimal()) AS sum_qty,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= date('1998-09-02')
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    )


# ---------------------------------------------------------------------------
# registry — the suite lives in arcadedb_spark.driver_queries
# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from arcadedb_spark.driver_queries import QUERIES

    return QUERIES


def oracle_sql() -> dict[str, str]:
    from arcadedb_spark.driver_queries import ORACLES

    return ORACLES

"""Physical-plan assertions: the plans we want at 100 TB, guarded at sf0.001.

A correct-but-unscalable plan is a bug: these tests pin predicate
pushdown, column pruning and broadcast-join selection so a translator
change can't silently regress them.
"""

from __future__ import annotations


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(db):
    df = db.query(
        "SELECT l_orderkey FROM lineitem WHERE l_quantity > 45 AND l_discount < 0.05"
    )
    plan = _plan(df)
    assert "l_quantity" in plan.split("DataFilters")[1].split("]")[0]


def test_column_pruning(db):
    df = db.query("SELECT l_orderkey, l_quantity FROM lineitem")
    plan = _plan(df)
    scan = [line for line in plan.splitlines() if "FileScan" in line][0]
    # only the two projected columns are read
    assert "l_extendedprice" not in scan and "l_returnflag" not in scan


def test_link_join_broadcasts_dims(db):
    df = db.query(
        "SELECT c_nationkey.n_regionkey.r_name AS region, count(*) AS n "
        "FROM customer GROUP BY region"
    )
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 2  # nation and region broadcast


def test_match_join_on_long_keys(db):
    df = db.query(
        "MATCH {type: Customer, as: c}.out('PLACED'){as: o} RETURN count(*) AS n"
    )
    plan = _plan(df)
    # no cartesian product in a connected pattern
    assert "CartesianProduct" not in plan


def test_count_star_prunes_all_columns(db):
    df = db.query("SELECT count(*) AS n FROM lineitem")
    plan = _plan(df)
    scan = [line for line in plan.splitlines() if "FileScan" in line][0]
    assert "ReadSchema: struct<>" in scan  # metadata-only count


def test_point_geo_ops_stay_jvm_side(db):
    # point construction/extraction/haversine must not enter Python:
    # no ArrowEvalPython/BatchEvalPython node in the plan
    df = db.query(
        "SELECT geo.x(geo.point(c_custkey, 1)) AS x, "
        "geo.distance(geo.point(0, 0), geo.point(1, 1), 'km') AS d, "
        "sorensenDiceSimilarity(c_name, c_mktsegment) AS sd "
        "FROM customer"
    )
    plan = _plan(df)
    assert "EvalPython" not in plan
    # higher-order exprs (transform lambdas) sit outside codegen but stay
    # JVM-side; the scan itself must still be inside a codegen stage
    assert "*(" in plan


def test_polygon_geo_ops_are_arrow_batched(db):
    # polygon predicates go through pandas UDFs — Arrow-batched, never
    # row-at-a-time pickled Python
    df = db.query(
        "SELECT geo.within(geo.point(c_custkey, 1), geo.rectangle(0, 0, 50, 50)) AS w "
        "FROM customer"
    )
    plan = _plan(df)
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan


def test_promql_grid_broadcasts(db, spark):
    from pyspark.sql import functions as F
    from arcadedb_spark.timeseries.promql import promql_instant

    ev = db.table("events")
    m = ev.select(
        F.lit("ev").alias("metric"),
        F.create_map(F.lit("event_type"), F.col("event_type")).alias("labels"),
        F.unix_millis("ts").alias("ts_millis"),
        F.col("value").cast("double").alias("value"),
    )
    df = promql_instant(m, "ev", 1_700_000_000_000)
    plan = _plan(df)
    # the eval grid joins broadcast — samples never shuffle for the join
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_no_unbounded_global_windows_in_algorithms():
    """Every unpartitioned Window anywhere in the package must be
    explicitly marked as bounded (one row per partition/layer/k, or a
    limit()-capped input) — an unmarked Window.orderBy funnels all rows
    through a single task at scale."""
    import glob
    import os

    root = os.path.join(os.path.dirname(__file__), "..", "arcadedb_spark")
    offenders = []
    for path in glob.glob(os.path.join(root, "**", "*.py"), recursive=True):
        lines = open(path).read().splitlines()
        for i, line in enumerate(lines):
            if "Window.orderBy(" not in line or line.lstrip().startswith("#"):
                continue
            context = "\n".join(lines[max(0, i - 3):i])
            if "bounded-window ok" not in context:
                offenders.append(f"{os.path.basename(path)}:{i + 1}")
    assert not offenders, (
        "unpartitioned Window without a bounded-window marker: "
        f"{offenders}"
    )


def test_runtime_temporal_kernels_are_arrow_batched(spark):
    """Per-row temporal math over stored strings must run as Arrow-batched
    pandas UDFs (ArrowEvalPython), never row-pickled BatchEvalPython."""
    from pyspark.sql import functions as F

    from arcadedb_spark.sql.translator import (
        _temporal_component_col,
        _temporal_sort_key_col,
    )

    df = spark.createDataFrame(
        [("2024-03-05T10:30:00Z",), ("1999-12-31T23:59:59Z",)], "t string"
    ).select(
        _temporal_component_col(F.col("t"), "year").alias("y"),
        _temporal_sort_key_col(F.col("t")).alias("k"),
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan, plan
    assert "BatchEvalPython" not in plan, plan
    rows = {r.y for r in df.collect()}
    assert rows == {2024, 1999}

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

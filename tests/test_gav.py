"""Graph Analytical View lifecycle (graph/olap/GraphAnalyticalView.java,
CSRBuilder.java, DeltaOverlay.java): CREATE builds the sorted
materialized edge frame, SYNCHRONOUS mode overlays post-build writes,
REBUILD compacts them in, DROP unregisters."""

from __future__ import annotations

import pytest

from arcadedb_spark.database import Database


@pytest.fixture()
def gdb(spark):
    db = Database(spark)
    db.query(
        "CREATE (a:City {name:'A'})-[:ROAD {km: 10}]->(b:City {name:'B'}), "
        "(b)-[:ROAD {km: 5}]->(c:City {name:'C'}), "
        "(a)-[:RAIL]->(c)",
        language="cypher",
    )
    return db


def test_gav_create_build_and_read(gdb):
    n = gdb.command(
        "CREATE GRAPH ANALYTICAL VIEW cityRoads "
        "VERTEX TYPES (City) EDGE TYPES (ROAD)"
    ).collect()[0][0]
    assert n == 2  # two ROAD edges materialized, RAIL excluded
    gav = gdb._gavs["cityRoads"]
    edges = gav.edges(gdb.graph())
    assert edges.count() == 2
    assert {r["etype"] for r in edges.collect()} == {"ROAD"}
    # idempotent with IF NOT EXISTS; error without
    assert gdb.command(
        "CREATE GRAPH ANALYTICAL VIEW IF NOT EXISTS cityRoads"
    ).collect()[0][0] == 0
    with pytest.raises(Exception):
        gdb.command("CREATE GRAPH ANALYTICAL VIEW cityRoads")


def test_gav_delta_overlay_and_rebuild(gdb):
    gdb.command(
        "CREATE GRAPH ANALYTICAL VIEW liveRoads EDGE TYPES (ROAD) "
        "UPDATE MODE SYNCHRONOUS"
    )
    gav = gdb._gavs["liveRoads"]
    g = gdb.graph()
    assert gav.edges(g).count() == 2
    # post-build write lands in the delta overlay, visible SYNCHRONOUSly
    gdb.query(
        "MATCH (a:City {name:'A'}), (c:City {name:'C'}) "
        "CREATE (a)-[:ROAD {km: 99}]->(c)",
        language="cypher",
    )
    assert gav.edges(g).count() == 3
    assert gav.stats(g)["delta_frames"] >= 1
    # REBUILD folds the delta into a fresh sorted base (compaction)
    n = gdb.command("REBUILD GRAPH ANALYTICAL VIEW liveRoads").collect()[0][0]
    assert n == 3
    assert gav.stats(g)["delta_frames"] == 0
    assert gav.edges(g).count() == 3


def test_gav_snapshot_mode_and_drop(gdb):
    gdb.command("CREATE GRAPH ANALYTICAL VIEW snap EDGE TYPES (ROAD)")
    gav = gdb._gavs["snap"]
    g = gdb.graph()
    gdb.query(
        "MATCH (a:City {name:'A'}), (c:City {name:'C'}) "
        "CREATE (a)-[:ROAD {km: 1}]->(c)",
        language="cypher",
    )
    # OFF mode serves the build-time snapshot until REBUILD
    assert gav.edges(g).count() == 2
    gdb.command("REBUILD GRAPH ANALYTICAL VIEW snap")
    assert gav.edges(g).count() == 3
    listing = {
        r["name"]: r["mode"]
        for r in gdb.query("SELECT FROM schema:graphAnalyticalViews").collect()
    }
    assert listing.get("snap") == "OFF"
    assert gdb.command("DROP GRAPH ANALYTICAL VIEW snap").collect()[0][0] == 1
    assert gdb.command(
        "DROP GRAPH ANALYTICAL VIEW snap IF EXISTS"
    ).collect()[0][0] == 0
    with pytest.raises(Exception):
        gdb.command("DROP GRAPH ANALYTICAL VIEW snap")


def test_gav_unknown_edge_type_rejected(gdb):
    with pytest.raises(Exception):
        gdb.command("CREATE GRAPH ANALYTICAL VIEW bad EDGE TYPES (NOSUCH)")

"""Tests for the final algo.* batch (Dijkstra/Bellman-Ford paths,
bridges, articulation points, biconnected components, DFS order,
neighborhood kNN, bipartite matching) on hand-checkable graphs."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow

from arcadedb_spark.graph.algorithms_extra3 import (
    articulation_points,
    bellman_ford_path,
    biconnected_components,
    bipartite_matching,
    bridges,
    dfs_order,
    dijkstra_path,
    knn_similarity,
)


@pytest.fixture(scope="module")
def barbell(spark):
    # two triangles {0,1,2} and {3,4,5} joined by bridge 2-3
    return spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)],
        "src long, dst long",
    )


def test_dijkstra_path(spark):
    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 5.0)],
        "src long, dst long, weight double",
    )
    r = dijkstra_path(e, 0, 2).collect()
    assert len(r) == 1
    assert list(r[0]["path"]) == [0, 1, 2] and r[0]["weight"] == 2.0


def test_bellman_ford_negative_edge(spark):
    # negative edge but no negative cycle: 0→1 (4), 1→2 (-2), 0→2 (3)
    e = spark.createDataFrame(
        [(0, 1, 4.0), (1, 2, -2.0), (0, 2, 3.0)],
        "src long, dst long, weight double",
    )
    r = bellman_ford_path(e, 0, 2).collect()[0]
    assert list(r["path"]) == [0, 1, 2]
    assert r["weight"] == 2.0 and r["negativeCycle"] is False


def test_bellman_ford_negative_cycle(spark):
    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, -3.0), (2, 1, 1.0), (2, 3, 1.0)],
        "src long, dst long, weight double",
    )
    r = bellman_ford_path(e, 0, 3).collect()[0]
    assert r["negativeCycle"] is True


def test_bridges_barbell(barbell):
    got = {(r["source"], r["target"]) for r in bridges(barbell).collect()}
    assert got == {(2, 3)}


def test_bridges_parallel_edge_not_bridge(spark):
    # 0-1 twice (parallel), 1-2 once: only 1-2 is a bridge
    e = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2)], "src long, dst long"
    )
    got = {(r["source"], r["target"]) for r in bridges(e).collect()}
    assert got == {(1, 2)}


def test_bridges_tree_all_edges(spark):
    # in a tree every edge is a bridge
    e = spark.createDataFrame(
        [(0, 1), (0, 2), (2, 3)], "src long, dst long"
    )
    assert bridges(e).count() == 3


def test_articulation_points_barbell(barbell):
    got = {r["node"] for r in articulation_points(barbell).collect()}
    assert got == {2, 3}


def test_articulation_cycle_has_none(spark):
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "src long, dst long"
    )
    assert articulation_points(e).count() == 0


def test_biconnected_components_barbell(barbell):
    rows = biconnected_components(barbell).collect()
    comps = {}
    for r in rows:
        comps.setdefault(r["componentId"], set()).add(r["node"])
    blocks = sorted(frozenset(c) for c in comps.values())
    assert sorted(map(set, blocks), key=sorted) == sorted(
        [{0, 1, 2}, {2, 3}, {3, 4, 5}], key=sorted
    )


def test_dfs_order(spark):
    # 0→{1,4}, 1→{2}, 2→{3}: DFS visits smallest neighbor first
    e = spark.createDataFrame(
        [(0, 1), (0, 4), (1, 2), (2, 3)], "src long, dst long"
    )
    rows = dfs_order(e, 0, direction="out").collect()
    assert [(r["node"], r["depth"]) for r in rows] == [
        (0, 0), (1, 1), (2, 2), (3, 3), (4, 1)
    ]


def test_dfs_max_depth(spark):
    e = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    rows = dfs_order(e, 0, direction="out", max_depth=1).collect()
    assert {r["node"] for r in rows} == {0, 1}


def test_knn_similarity(spark):
    # 0 and 1 share neighbors {2,3}; 4 attaches only to 2
    e = spark.createDataFrame(
        [(0, 2), (0, 3), (1, 2), (1, 3), (4, 2)], "src long, dst long"
    )
    rows = knn_similarity(e, k=1, direction="out").collect()
    best = {r["node1"]: (r["node2"], r["similarity"]) for r in rows}
    assert best[0] == (1, 1.0) and best[1] == (0, 1.0)
    assert best[4][1] == pytest.approx(0.5)  # {2} vs {2,3}


def test_bipartite_matching_perfect(spark):
    # K2,2 minus one edge: perfect matching of size 2 exists
    e = spark.createDataFrame(
        [(0, 10), (0, 11), (1, 10)], "src long, dst long"
    )
    rows = bipartite_matching(e).collect()
    assert rows and rows[0]["matchingSize"] == 2
    matched = {(r["node1"], r["node2"]) for r in rows}
    assert matched == {(0, 11), (1, 10)}


def test_bipartite_matching_odd_cycle_empty(spark):
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "src long, dst long"
    )
    assert bipartite_matching(e).count() == 0


def test_call_procedures_registered(db):
    from arcadedb_spark.graph.procedures import PROCEDURES

    for name in [
        "algo.dijkstra", "algo.dijkstrasinglesource", "algo.bellmanford",
        "algo.bridges", "algo.articulationpoints",
        "algo.biconnectedcomponents", "algo.dfs", "algo.knn",
        "algo.bipartitematching", "algo.node2vec",
    ]:
        assert name in PROCEDURES

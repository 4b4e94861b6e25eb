"""Leiden / A* / k-shortest-paths / max-flow / maximal-cliques tests
(AlgoLeiden, AlgoAStar, AlgoKShortestPaths, AlgoMaxFlow, AlgoClique
parity on hand-checkable graphs)."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow

from arcadedb_spark.graph.algorithms_extra import (
    astar,
    k_shortest_paths,
    leiden,
    max_flow,
    maximal_cliques,
)


@pytest.fixture(scope="module")
def two_cliques(spark):
    # two 4-cliques joined by a single bridge edge 3-4
    edges = []
    for base in (0, 4):
        ids = list(range(base, base + 4))
        edges += [(a, b) for a in ids for b in ids if a < b]
    edges.append((3, 4))
    return spark.createDataFrame(edges, "src long, dst long")


def test_leiden_two_communities(two_cliques):
    rows = leiden(two_cliques, max_iterations=8).collect()
    comm = {r["vid"]: r["community"] for r in rows}
    assert len(comm) == 8
    left = {comm[v] for v in (0, 1, 2, 3)}
    right = {comm[v] for v in (4, 5, 6, 7)}
    assert len(left) == 1 and len(right) == 1 and left != right


def test_leiden_refinement_splits_disconnected_community(spark):
    # two disjoint triangles: local moving may label them anything, but
    # refinement must never report a disconnected community
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12)],
        "src long, dst long",
    )
    comm = {r["vid"]: r["community"] for r in leiden(e).collect()}
    assert {comm[0], comm[1], comm[2]} != {comm[10], comm[11], comm[12]}
    assert comm[0] == comm[1] == comm[2]
    assert comm[10] == comm[11] == comm[12]


@pytest.fixture(scope="module")
def weighted_diamond(spark):
    # 0→1→3 (cost 1+1=2), 0→2→3 (cost 5+1=6), 0→3 direct (cost 10)
    return spark.createDataFrame(
        [
            (0, 1, 1.0),
            (1, 3, 1.0),
            (0, 2, 5.0),
            (2, 3, 1.0),
            (0, 3, 10.0),
        ],
        "src long, dst long, weight double",
    )


def test_astar_dijkstra_default(weighted_diamond):
    row = astar(weighted_diamond, 0, 3).collect()
    assert len(row) == 1
    assert row[0]["path"] == [0, 1, 3]
    assert row[0]["weight"] == pytest.approx(2.0)


def test_astar_unreachable(spark):
    e = spark.createDataFrame([(0, 1, 1.0)], "src long, dst long, weight double")
    assert astar(e, 1, 0).collect() == []


def test_astar_with_heuristic_prunes_same_answer(weighted_diamond, spark):
    h = spark.createDataFrame(
        [(0, 2.0), (1, 1.0), (2, 1.0), (3, 0.0)], "vid long, h double"
    )
    row = astar(weighted_diamond, 0, 3, heuristic=h).collect()[0]
    assert row["path"] == [0, 1, 3] and row["weight"] == pytest.approx(2.0)


def test_k_shortest_paths_order_and_looplessness(weighted_diamond):
    rows = k_shortest_paths(weighted_diamond, 0, 3, k=3).collect()
    assert [r["rank"] for r in rows] == [1, 2, 3]
    assert [r["path"] for r in rows] == [[0, 1, 3], [0, 2, 3], [0, 3]]
    assert [r["weight"] for r in rows] == pytest.approx([2.0, 6.0, 10.0])


def test_max_flow_classic(spark):
    # 0→1 cap 10, 0→2 cap 10, 1→3 cap 4, 1→2 cap 2, 2→4 cap 9,
    # 3→5 cap 10, 4→3 cap 6, 4→5 cap 10 → min cut {0,1,2}|{3,4,5}
    # crosses 1→3 (4) and 2→4 (9): max flow = 13
    e = spark.createDataFrame(
        [
            (0, 1, 10.0),
            (0, 2, 10.0),
            (1, 3, 4.0),
            (1, 2, 2.0),
            (2, 4, 9.0),
            (3, 5, 10.0),
            (4, 3, 6.0),
            (4, 5, 10.0),
        ],
        "src long, dst long, weight double",
    )
    row = max_flow(e, 0, 5).collect()[0]
    assert row["max_flow"] == pytest.approx(13.0)
    assert row["source_id"] == 0 and row["sink_id"] == 5


def test_max_flow_disconnected(spark):
    e = spark.createDataFrame([(0, 1, 3.0)], "src long, dst long, weight double")
    assert max_flow(e, 0, 9).collect()[0]["max_flow"] == pytest.approx(0.0)


def test_maximal_cliques(two_cliques):
    rows = maximal_cliques(two_cliques, min_size=3).collect()
    got = {tuple(r["clique"]) for r in rows}
    # the two 4-cliques are maximal; their triangles are not
    assert (0, 1, 2, 3) in got and (4, 5, 6, 7) in got
    assert (0, 1, 2) not in got
    assert all(r["size"] == 4 for r in rows)


def test_maximal_cliques_triangle_plus_tail(spark):
    # triangle 0-1-2 with a pendant 2-3: triangle is maximal
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (2, 3)], "src long, dst long"
    )
    rows = maximal_cliques(e, min_size=3).collect()
    assert {tuple(r["clique"]) for r in rows} == {(0, 1, 2)}

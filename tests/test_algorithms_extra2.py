"""Tests for the second algo.* batch (AlgoAllSimplePaths, GraphColoring,
DensestSubgraph, VoteRank, InfluenceMaximization, ModularityScore,
MaxKCut, SameCommunity parity on hand-checkable graphs)."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow

from pyspark.sql import functions as F

from arcadedb_spark.graph.algorithms_extra2 import (
    all_simple_paths,
    densest_subgraph,
    graph_coloring,
    influence_maximization,
    max_k_cut,
    modularity_score,
    same_community,
    vote_rank,
)


@pytest.fixture(scope="module")
def diamond(spark):
    # 0→1→3, 0→2→3, plus direct 0→3
    return spark.createDataFrame(
        [(0, 1), (1, 3), (0, 2), (2, 3), (0, 3)], "src long, dst long"
    )


def test_all_simple_paths(diamond):
    paths = {tuple(r["path"]) for r in all_simple_paths(diamond, 0, 3).collect()}
    assert paths == {(0, 1, 3), (0, 2, 3), (0, 3)}


def test_graph_coloring_proper(spark):
    # odd cycle C5 needs 3 colors; coloring must be proper
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0)], "src long, dst long"
    )
    colors = {r["vid"]: r["color"] for r in graph_coloring(e).collect()}
    assert len(colors) == 5
    for a, b in [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0)]:
        assert colors[a] != colors[b]
    assert len(set(colors.values())) >= 3


def test_densest_subgraph(spark):
    # K4 (density 1.5) plus a pendant path: K4 is the densest part
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    e = spark.createDataFrame(k4 + [(3, 10), (10, 11)], "src long, dst long")
    rows = densest_subgraph(e).collect()
    dense = {r["vid"] for r in rows if r["in_dense"]}
    assert {0, 1, 2, 3} <= dense
    assert 11 not in dense
    assert rows[0]["density"] >= 1.4


def test_vote_rank_star(spark):
    # star center is the most influential
    e = spark.createDataFrame([(0, i) for i in range(1, 7)], "src long, dst long")
    rows = vote_rank(e, k=2).collect()
    assert rows[0]["vid"] == 0 and rows[0]["rank"] == 1


def test_influence_maximization_degree_discount(spark):
    e = spark.createDataFrame(
        [(0, i) for i in range(1, 7)] + [(10, 11)], "src long, dst long"
    )
    rows = influence_maximization(e, k=2).collect()
    assert rows[0]["vid"] == 0
    assert len(rows) == 2


def test_modularity_score_two_cliques(spark):
    edges = []
    for base in (0, 4):
        ids = list(range(base, base + 4))
        edges += [(a, b) for a in ids for b in ids if a < b]
    edges.append((3, 4))
    e = spark.createDataFrame(edges, "src long, dst long")
    comm = e.sparkSession.createDataFrame(
        [(v, 0 if v < 4 else 1) for v in range(8)], "vid long, community int"
    )
    row = modularity_score(e, comm).collect()[0]
    # two clean cliques with one bridge: strongly positive modularity
    assert row["modularity"] > 0.3
    assert row["communities"] == 2 and row["edge_count"] == 13
    # degenerate single community → Q == 0
    one = e.sparkSession.createDataFrame(
        [(v, 0) for v in range(8)], "vid long, community int"
    )
    assert modularity_score(e, one).collect()[0]["modularity"] == pytest.approx(0.0)


def test_max_k_cut_bipartite(spark):
    # complete bipartite K3,3 has a perfect 2-cut (all 9 edges cross)
    e = spark.createDataFrame(
        [(a, b) for a in range(3) for b in range(3, 6)], "src long, dst long"
    )
    rows = max_k_cut(e, k=2, max_iterations=12).collect()
    cut = rows[0]["cut_weight"]
    assert cut >= 7.0  # local search reaches (near-)perfect cut


def test_same_community(spark):
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "src long, dst long"
    )
    rows = same_community(e).collect()
    coef = {(r["node1"], r["node2"]): r["coefficient"] for r in rows}
    assert coef[(0, 1)] == 1.0 and coef[(10, 11)] == 1.0
    assert all(v == 1.0 for v in coef.values())  # WCC: neighbors share components

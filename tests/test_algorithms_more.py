"""Long-tail algo.* procedures (graph/algorithms_more.py) on graphs with
hand-computable answers."""

import pytest

pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from arcadedb_spark.graph.algorithms_more import (
    apsp,
    article_rank,
    assortativity,
    bipartite_check,
    conductance,
    cycle_detection,
    eccentricity,
    graph_summary,
    harmonic_centrality,
    hits,
    k_truss,
    local_clustering_coefficient,
    longest_path_dag,
    mst,
    personalized_pagerank,
    preferential_attachment,
    resource_allocation,
    simrank,
    slpa,
    topological_sort,
    total_neighbors,
)


def _edges(spark, pairs, weights=None):
    if weights:
        rows = [(a, b, w) for (a, b), w in zip(pairs, weights)]
        return spark.createDataFrame(rows, "src long, dst long, weight double")
    return spark.createDataFrame(pairs, "src long, dst long")


@pytest.fixture(scope="module")
def path4(spark):
    # 1 → 2 → 3 → 4
    return _edges(spark, [(1, 2), (2, 3), (3, 4)])


@pytest.fixture(scope="module")
def diamond_dag(spark):
    # 1 → {2,3} → 4, plus 4 → 5
    return _edges(spark, [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)])


@pytest.fixture(scope="module")
def triangle_plus(spark):
    # triangle 1-2-3 plus pendant 3-4
    return _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])


def test_harmonic_and_eccentricity(path4):
    h = {r["vid"]: r["harmonic"] for r in harmonic_centrality(path4).collect()}
    # vertex 2 on an undirected view? shortest_paths is directed:
    # reachable TO landmarks — vertex 1 reaches 2,3,4 at d=1,2,3
    assert h[1] == pytest.approx((1 + 1 / 2 + 1 / 3) / 3)
    ecc = {r["vid"]: r["eccentricity"] for r in eccentricity(path4).collect()}
    assert ecc[1] == 3 and ecc[4] == 0


def test_apsp_rowcount(path4):
    rows = apsp(path4).collect()
    # reachable (v, landmark) pairs incl. self: 4 + 3 + 2 + 1
    assert len(rows) == 10


def test_topological_sort_and_cycles(spark, diamond_dag):
    pos = {r["vid"]: r["position"] for r in topological_sort(diamond_dag).collect()}
    assert pos[1] < pos[2] < pos[4] < pos[5]
    assert pos[1] < pos[3] < pos[4]
    assert cycle_detection(diamond_dag).count() == 0
    cyc = _edges(spark, [(1, 2), (2, 3), (3, 1), (3, 4)])
    on_cycle = {r["vid"] for r in cycle_detection(cyc).collect()}
    assert on_cycle == {1, 2, 3}


def test_longest_path_dag(diamond_dag):
    d = {r["vid"]: r["length"] for r in longest_path_dag(diamond_dag).collect()}
    assert d == {1: 0, 2: 1, 3: 1, 4: 2, 5: 3}


def test_local_clustering_coefficient(triangle_plus):
    lcc = {r["vid"]: r["lcc"] for r in local_clustering_coefficient(triangle_plus).collect()}
    assert lcc[1] == pytest.approx(1.0)  # deg 2, 1 triangle
    assert lcc[3] == pytest.approx(2 * 1 / (3 * 2))  # deg 3, 1 triangle
    assert lcc[4] == 0.0


def test_graph_summary_and_assortativity(triangle_plus):
    s = graph_summary(triangle_plus).collect()[0]
    assert s["n_vertices"] == 4 and s["n_edges"] == 4
    assert s["max_degree"] == 3 and s["min_degree"] == 1
    r = assortativity(triangle_plus)
    assert -1.0 <= r <= 1.0


def test_link_prediction_tail(triangle_plus):
    pa = {(r["a"], r["b"]): r["score"] for r in preferential_attachment(triangle_plus).collect()}
    # pair (1,2): common neighbor 3; deg(1)=2, deg(2)=2 → 4
    assert pa[(1, 2)] == 4
    tn = {(r["a"], r["b"]): r["total"] for r in total_neighbors(triangle_plus).collect()}
    # N(1)={2,3}, N(2)={1,3} → union {1,2,3} = 3
    assert tn[(1, 2)] == 3
    ra = {(r["a"], r["b"]): r["score"] for r in resource_allocation(triangle_plus).collect()}
    # shared neighbor of (1,2) is 3 with deg 3 → 1/3
    assert ra[(1, 2)] == pytest.approx(1 / 3)


def test_personalized_pagerank_localizes(spark):
    # two disjoint triangles; teleport to {1} keeps all mass in 1's
    e = _edges(
        spark,
        [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 10)],
    )
    pr = {r["vid"]: r["rank"] for r in personalized_pagerank(e, [1]).collect()}
    assert pr[1] + pr[2] + pr[3] == pytest.approx(1.0, abs=1e-6)
    assert pr[10] == pytest.approx(0.0, abs=1e-9)


def test_article_rank_orders_like_pagerank(path4):
    ar = {r["vid"]: r["rank"] for r in article_rank(path4, iterations=10).collect()}
    # downstream vertices accumulate more rank on a path
    assert ar[4] > ar[1]
    # damping by (outdeg + avg outdeg) makes the walk sub-stochastic:
    # total mass is strictly below 1, unlike plain PageRank
    assert 0.0 < sum(ar.values()) < 1.0


def test_hits_hub_authority(spark):
    # star: 1 points to 2,3,4 — 1 is the hub, others are authorities
    e = _edges(spark, [(1, 2), (1, 3), (1, 4)])
    r = {x["vid"]: x for x in hits(e, iterations=5).collect()}
    assert r[1]["hub"] == pytest.approx(1.0)
    assert r[2]["authority"] == pytest.approx(1.0)
    assert r[1]["authority"] == 0.0 and r[2]["hub"] == 0.0


def test_k_truss(spark):
    # K4 on {1..4} plus pendant edge (4,5): 4-truss keeps K4 only
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    e = _edges(spark, k4 + [(4, 5)])
    kept = {(r["a"], r["b"]) for r in k_truss(e, 4).collect()}
    assert kept == set(k4)
    assert k_truss(e, 5).count() == 0


def test_mst_total_weight(spark):
    # square 1-2-3-4 with one heavy diagonal; MST weight = 1+1+2
    e = _edges(
        spark,
        [(1, 2), (2, 3), (3, 4), (1, 4), (1, 3)],
        weights=[1.0, 1.0, 2.0, 5.0, 9.0],
    )
    chosen = mst(e).collect()
    assert len(chosen) == 3
    assert sum(r["weight"] for r in chosen) == pytest.approx(4.0)


def test_bipartite_check(spark):
    even = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])  # C4
    odd = _edges(spark, [(1, 2), (2, 3), (3, 1)])  # C3
    assert bipartite_check(even) is True
    assert bipartite_check(odd) is False


def test_conductance(spark):
    # two triangles joined by one bridge edge
    e = _edges(spark, [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4), (3, 4)])
    comm = e.sparkSession.createDataFrame(
        [(v, 0) for v in (1, 2, 3)] + [(v, 1) for v in (4, 5, 6)],
        "vid long, community long",
    )
    c = {r["community"]: r["conductance"] for r in conductance(e, comm).collect()}
    # each community: cut 1, volume 7 → 1/7
    assert c[0] == pytest.approx(1 / 7)
    assert c[1] == pytest.approx(1 / 7)


def test_slpa_two_cliques(spark):
    cl1 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    cl2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    e = _edges(spark, cl1 + cl2 + [(4, 10)])
    out = slpa(e, iterations=8, threshold=0.3)
    labels = {r["vid"]: set() for r in out.collect()}
    for r in out.collect():
        labels[r["vid"]].add(r["label"])
    # vertices within one clique end up sharing a dominant label
    assert labels[1] & labels[2] & labels[3]
    assert labels[11] & labels[12] & labels[13]


def test_simrank_symmetric_siblings(spark):
    # 1 → 3, 2 → 3; s(1,2) should be positive (shared in-neighbor
    # structure), and s with an unrelated vertex stays 0
    e = _edges(spark, [(3, 1), (3, 2), (4, 5)])
    s = {(r["a"], r["b"]): r["similarity"] for r in simrank(e, iterations=3).collect()}
    assert s.get((1, 2), 0) > 0
    assert (1, 5) not in s


def test_procedures_registered(db):
    from arcadedb_spark.graph.procedures import PROCEDURES

    for name in [
        "algo.harmonic", "algo.topologicalsort", "algo.cycledetection",
        "algo.ktruss", "algo.mst", "algo.slpa", "algo.simrank",
        "algo.personalizedpagerank", "algo.hits", "algo.articlerank",
        "algo.graphsummary", "algo.apsp", "algo.closeness", "algo.katz",
        "algo.node2vec", "algo.sssp", "algo.shortestpath",
    ]:
        assert name in PROCEDURES

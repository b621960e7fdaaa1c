"""Louvain community detection goldens.

Beyond-reference operator (reference community surface is LP /
SemiClustering); goldens are graphs whose modularity optimum is
unambiguous, plus invariants (valid partition, Q at least the singleton
partition's) on a random graph.
"""

import itertools

import pytest
from pyspark.sql import functions as F

from kafka_graphs_spark import Graph
from kafka_graphs_spark.library import louvain, modularity


def make_graph(spark, edges):
    e = spark.createDataFrame(edges, "src long, dst long, value double")
    return Graph.from_edges(e, F.lit(0.0))


def communities(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["community"], set()).add(r["id"])
    return set(frozenset(v) for v in out.values())


def clique_ring(n_cliques, k):
    edges = []
    for c in range(n_cliques):
        base = c * k
        for i, j in itertools.combinations(range(k), 2):
            edges.append((base + i, base + j, 1.0))
        edges.append((base, ((c + 1) % n_cliques) * k, 1.0))
    return edges


def test_clique_ring_recovery(spark):
    # 10 single-linked K6 cliques: the modularity optimum is one
    # community per clique (resolution limit far away at this size)
    g = make_graph(spark, clique_ring(10, 6))
    res = louvain(g)
    assert communities(res) == {
        frozenset(range(c * 6, c * 6 + 6)) for c in range(10)
    }
    q = modularity(g, res, label_col="community").collect()[0]
    assert q["modularity"] == pytest.approx(0.8375, abs=1e-6)


def test_two_cliques_one_bridge(spark):
    edges = [
        (i, j, 1.0) for i, j in itertools.combinations(range(5), 2)
    ] + [
        (i, j, 1.0) for i, j in itertools.combinations(range(5, 10), 2)
    ] + [(0, 5, 1.0)]
    g = make_graph(spark, edges)
    res = louvain(g)
    assert communities(res) == {frozenset(range(5)), frozenset(range(5, 10))}


def test_canonical_labels_are_min_member_ids(spark):
    g = make_graph(spark, clique_ring(4, 5))
    rows = louvain(g).collect()
    comm = {}
    for r in rows:
        comm.setdefault(r["community"], []).append(r["id"])
    for label, members in comm.items():
        assert label == min(members)


def test_weighted_edges_dominate_topology(spark):
    # triangle 0-1-2 with heavy edges + vertex 3 tied to 0 by a weak
    # edge and to 4/5 by heavy edges: weight must pull 3 to {3,4,5}
    edges = [
        (0, 1, 10.0), (1, 2, 10.0), (0, 2, 10.0),
        (0, 3, 0.1),
        (3, 4, 10.0), (4, 5, 10.0), (3, 5, 10.0),
    ]
    g = make_graph(spark, edges)
    res = louvain(g)
    assert communities(res) == {frozenset({0, 1, 2}), frozenset({3, 4, 5})}


def test_single_edge_and_isolated_vertex(spark):
    e = spark.createDataFrame([(0, 1, 1.0)], "src long, dst long, value double")
    v = spark.createDataFrame([(0, 0.0), (1, 0.0), (7, 0.0)], "id long, value double")
    g = Graph(v, e)
    res = louvain(g)
    got = {r["id"]: r["community"] for r in res.collect()}
    assert got[0] == got[1]  # endpoints merge (only positive-gain move)
    assert got[7] == 7       # isolated vertex keeps its own community
    assert len(got) == 3


def test_empty_graph(spark):
    e = spark.createDataFrame([], "src long, dst long, value double")
    v = spark.createDataFrame([(1, 0.0), (2, 0.0)], "id long, value double")
    res = louvain(Graph(v, e))
    got = {r["id"]: r["community"] for r in res.collect()}
    assert got == {1: 1, 2: 2}


def test_random_graph_invariants(spark):
    # deterministic pseudo-random sparse graph: valid partition and Q
    # no worse than the all-singleton partition (which is negative)
    n, d = 200, 4
    edges = [
        (i, (i * 7919 + j * 104729) % n, 1.0)
        for i in range(n)
        for j in range(1, d + 1)
        if i != (i * 7919 + j * 104729) % n
    ]
    g = make_graph(spark, edges)
    res = louvain(g)
    ids = [r["id"] for r in res.select("id").collect()]
    assert sorted(ids) == sorted(
        r["id"] for r in g.vertices.select("id").collect()
    )
    q = modularity(g, res, label_col="community").collect()[0]["modularity"]
    # singleton partition Q = -sum((k_i/2m)^2) < 0; Louvain must beat it
    assert q > 0.0


def test_louvain_distributed_matches_sequential_on_cliques(spark):
    """local_threshold=0 forces the fully-distributed path; both tiers must
    recover the same unambiguous clique partition (the hybrid handoff must
    not change results where the optimum is clear)."""
    import itertools

    from pyspark.sql import functions as F

    from kafka_graphs_spark import Graph
    from kafka_graphs_spark.library.louvain import louvain

    edges = []
    for c in range(4):
        ids = [c * 10 + i for i in range(6)]
        edges += [(a, b, 1.0) for a, b in itertools.combinations(ids, 2)]
    e = spark.createDataFrame(edges, "src long, dst long, value double")
    g = Graph.from_edges(e, F.lit(0.0))
    dist = {r["id"]: r["community"] for r in louvain(g, local_threshold=0).collect()}
    seq = {r["id"]: r["community"] for r in louvain(g).collect()}
    assert dist == seq
    assert sorted(set(seq.values())) == [0, 10, 20, 30]

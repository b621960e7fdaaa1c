"""Algorithm-library goldens, ported from the reference integration tests.

Reference: kafka-graphs-core/src/test/java/io/kgraph/library/*Test.java —
hard-coded expected vectors (our cross-engine oracle, SURVEY.md §5).
"""

import math

import pytest
from pyspark.sql import functions as F

from kafka_graphs_spark import Graph
from kafka_graphs_spark.library import (
    bfs,
    connected_components,
    edge_count,
    label_propagation,
    local_clustering_coefficient,
    mssp,
    pagerank,
    reverse_edges,
    sssp,
    vertex_count,
)
from kafka_graphs_spark.library._loop import MAX_LONG

INF = float("inf")


def vmap(df):
    return {r["id"]: r["value"] for r in df.collect()}


def make_graph(spark, edges, vertex_value=None, edge_type="double"):
    e = spark.createDataFrame(edges, f"src long, dst long, value {edge_type}")
    return Graph.from_edges(e, vertex_value if vertex_value is not None else F.col("id"))


@pytest.fixture
def chain(spark):
    # F2: TestGraphUtils.getChain — 0..9, i→i+1, value 1.0
    return make_graph(spark, [(i, i + 1, 1.0) for i in range(9)])


@pytest.fixture
def two_chains(spark):
    # F3: TestGraphUtils.getTwoChains — chain 0..9 + chain 10..20
    edges = [(i, i + 1, 1.0) for i in range(9)] + [(i, i + 1, 1.0) for i in range(10, 20)]
    return make_graph(spark, edges)


@pytest.fixture
def long_double(spark):
    # F1 value-double variant: TestGraphUtils.getLongDoubleEdges
    edges = [(1, 2, 12.0), (1, 3, 13.0), (2, 3, 23.0), (3, 4, 34.0), (3, 5, 35.0),
             (4, 5, 45.0), (5, 1, 51.0)]
    return make_graph(spark, edges)


class TestBFS:
    def test_two_chains_from_0(self, two_chains):
        # BreadthFirstSearchTest golden: hops on chain 1, UNVISITED on chain 2
        got = vmap(bfs(two_chains, src_vertex_id=0))
        expected = {i: i for i in range(10)}
        expected.update({i: MAX_LONG for i in range(10, 21)})
        assert got == expected


class TestSSSP:
    def test_long_double_from_1(self, long_double):
        # SingleSourceShortestPathsTest golden
        got = vmap(sssp(long_double, src_vertex_id=1))
        assert got == {1: 0.0, 2: 12.0, 3: 13.0, 4: 47.0, 5: 48.0}

    def test_unreachable_is_inf(self, two_chains):
        got = vmap(sssp(two_chains, src_vertex_id=0))
        assert got[9] == 9.0
        assert got[10] == INF


class TestMSSP:
    def test_reference_graph(self, spark):
        # MultipleSourceShortestPathsTest fixture: symmetric 6-vertex graph,
        # landmarks {1, 4}
        fwd = [(1, 2), (1, 5), (2, 3), (2, 5), (3, 4), (4, 5), (4, 6)]
        edges = [(a, b, 1.0) for a, b in fwd] + [(b, a, 1.0) for a, b in fwd]
        g = make_graph(spark, edges)
        got = vmap(mssp(g, landmark_vertex_ids=[1, 4]))
        expected = {
            1: {1: 0.0, 4: 2.0},
            2: {1: 1.0, 4: 2.0},
            3: {1: 2.0, 4: 1.0},
            4: {1: 2.0, 4: 0.0},
            5: {1: 1.0, 4: 1.0},
            6: {1: 3.0, 4: 1.0},
        }
        assert got == expected


class TestConnectedComponents:
    def test_two_chains(self, two_chains):
        # ConnectedComponentsTest golden: 0..9 → 0, 10..20 → 10
        got = vmap(connected_components(two_chains))
        expected = {i: 0 for i in range(10)}
        expected.update({i: 10 for i in range(10, 21)})
        assert got == expected

    def test_two_cliques_with_bridge(self, spark):
        # TestGraphUtils.getTwoCliques(5): bridge 0→5 merges both cliques
        n = 5
        edges = [(i, j, 1) for i in range(n) for j in range(n)]
        edges += [(i + n, j + n, 1) for i in range(n) for j in range(n)]
        edges += [(0, 5, 1)]
        g = make_graph(spark, edges, edge_type="long")
        got = vmap(connected_components(g))
        assert got == {i: 0 for i in range(2 * n)}


class TestLabelPropagation:
    def test_two_cliques(self, spark):
        # LabelPropagationTest golden: clique {0-4} → 4, clique {5-9} → 9
        n = 5
        edges = [(i, j, 1) for i in range(n) for j in range(n)]
        edges += [(i + n, j + n, 1) for i in range(n) for j in range(n)]
        edges += [(0, 5, 1)]
        g = make_graph(spark, edges, edge_type="long")
        got = vmap(label_propagation(g, max_iterations=10))
        assert got == {0: 4, 1: 4, 2: 4, 3: 4, 4: 4, 5: 9, 6: 9, 7: 9, 8: 9, 9: 9}


class TestPageRank:
    def test_chain_two_iterations(self, chain):
        # PageRankTest.testChainPageRank golden (maxIterations=2):
        # sorted ranks = [0.15, 0.2775 × 9]
        got = sorted(r["value"] for r in pagerank(chain, max_iterations=2).collect())
        expected = [0.15] + [0.27749999999999997] * 9
        assert got == pytest.approx(expected, abs=1e-12)

    def test_chain_converged(self, chain):
        # PageRankTest.testChainLongerPageRank golden (maxIterations=51)
        got = vmap(pagerank(chain, max_iterations=51).select("id", F.col("value")))
        # delta iteration converges: rank(0)=0.15, rank(i)=0.15+0.85*rank(i-1)
        expected = {}
        r = 0.0
        for i in range(10):
            r = 0.15 + 0.85 * r if i > 0 else 0.15
            expected[i] = r
        for i in range(10):
            assert got[i] == pytest.approx(expected[i], abs=1e-4)

    def test_chain_personalized(self, chain):
        # PageRankTest.testChainPersonalPageRank golden (maxIterations=4, src=4):
        # sorted = [0×6, 0.614125, 0.7225, 0.85, 1.0]
        got = sorted(
            r["value"]
            for r in pagerank(chain, src_vertex_id=4, max_iterations=4).collect()
        )
        expected = [0.0] * 6 + [0.6141249999999999, 0.7224999999999999, 0.85, 1.0]
        assert got == pytest.approx(expected, abs=1e-12)

    def test_star(self, spark):
        # PageRankTest.testStarPageRank shape: hub collects from all leaves
        from kafka_graphs_spark.sources import star_graph

        g = star_graph(spark, 10)
        g = Graph(g.vertices, g.edges.withColumn("value", F.col("value").cast("double")))
        got = vmap(pagerank(g, max_iterations=2).select("id", "value"))
        # leaves: 0.15; hub: 0.15 + 0.85 * 9 * (0.15/0.85 * 0.85) = 0.15 + 9*0.1275
        assert got[1] == pytest.approx(0.15)
        assert got[0] == pytest.approx(0.15 + 9 * 0.85 * 0.15, abs=1e-10)


class TestLCC:
    def test_reference_graph(self, spark):
        # LocalClusteringCoefficientTest golden on F5 edges
        edges = [(0, 1, 1.0), (0, 2, 1.0), (2, 1, 1.0), (2, 3, 1.0), (3, 1, 1.0),
                 (3, 4, 1.0), (5, 3, 1.0)]
        g = make_graph(spark, edges, vertex_value=F.lit(1.0))
        got = vmap(local_clustering_coefficient(g))
        expected = {
            0: 0.5,
            1: 1.0 / 3.0,
            2: 1.0 / 3.0,
            3: 1.0 / 12.0,
            4: 0.0,
            5: 0.0,
        }
        for k, v in expected.items():
            assert got[k] == pytest.approx(v, abs=1e-12), f"vertex {k}"


class TestBasic:
    def test_counts(self, long_double):
        assert edge_count(long_double) == 7
        assert vertex_count(long_double) == 5

    def test_reverse_edges(self, spark):
        g = make_graph(spark, [(1, 2, 1.0), (2, 1, 5.0), (2, 3, 2.0)])
        got = {(r["src"], r["dst"]): r["value"] for r in reverse_edges(g).edges.collect()}
        # existing reverse (2,1)=5.0 kept; missing (3,2) added with value 2.0
        assert got == {(1, 2): 1.0, (2, 1): 5.0, (2, 3): 2.0, (3, 2): 2.0}


class TestSimilarity:
    """Jaccard + Adamic-Adar goldens (hand-computed on a triangle + pendant).

    Reference semantics: io/kgraph/library/similarity/{Jaccard,AdamicAdar}.java.
    Undirected square of edges: 1-2, 1-3, 2-3, 3-4 (both directions).
    N(1)={2,3} N(2)={1,3} N(3)={1,2,4} N(4)={3}.
    """

    def _und(self, spark):
        base = [(1, 2), (1, 3), (2, 3), (3, 4)]
        edges = [(a, b, 0.0) for a, b in base] + [(b, a, 0.0) for a, b in base]
        return make_graph(spark, edges)

    def test_jaccard(self, spark):
        from kafka_graphs_spark.library import jaccard

        out = jaccard(self._und(spark))
        got = {(r["src"], r["dst"]): r["value"] for r in out.collect()}
        exp = {
            (1, 2): 1 / 3, (2, 1): 1 / 3,        # common {3}, union {1,2,3}
            (1, 3): 1 / 4, (3, 1): 1 / 4,        # common {2}, union {1,2,3,4}
            (2, 3): 1 / 4, (3, 2): 1 / 4,
            (3, 4): 0.0, (4, 3): 0.0,            # no common neighbor
        }
        assert got == pytest.approx(exp)

    def test_jaccard_distance(self, spark):
        from kafka_graphs_spark.library import jaccard

        out = jaccard(self._und(spark), distance_conversion=True)
        got = {(r["src"], r["dst"]): r["value"] for r in out.collect()}
        assert got[(1, 2)] == pytest.approx(2.0)       # 1/(1/3) - 1
        assert got[(1, 3)] == pytest.approx(3.0)
        assert got[(3, 4)] > 1e300                     # Double.MAX_VALUE for sim 0

    def test_jaccard_no_reciprocal_keeps_value(self, spark):
        from kafka_graphs_spark.library import jaccard

        # directed-only edge keeps its original value (Jaccard.java:159-161)
        g = make_graph(spark, [(1, 2, 7.0), (2, 3, 8.0), (3, 1, 9.0)])
        got = {(r["src"], r["dst"]): r["value"] for r in jaccard(g).collect()}
        assert got == {(1, 2): 7.0, (2, 3): 8.0, (3, 1): 9.0}

    def test_adamic_adar(self, spark):
        from kafka_graphs_spark.library import adamic_adar

        out = adamic_adar(self._und(spark))
        got = {(r["src"], r["dst"]): r["value"] for r in out.collect()}
        exp = {
            (1, 2): math.log(1 / 3), (2, 1): math.log(1 / 3),  # common nbr 3, deg 3
            (1, 3): math.log(1 / 2), (3, 1): math.log(1 / 2),  # common nbr 2, deg 2
            (2, 3): math.log(1 / 2), (3, 2): math.log(1 / 2),
            (3, 4): 0.0, (4, 3): 0.0,
        }
        assert got == pytest.approx(exp)

    def test_adamic_adar_distance_and_offset(self, spark):
        from kafka_graphs_spark.library import adamic_adar

        # AA ADDS onto the existing edge value (AdamicAdar.java:166-173);
        # distance conversion multiplies by -1.
        base = [(1, 2), (1, 3), (2, 3), (3, 4)]
        edges = [(a, b, 1.0) for a, b in base] + [(b, a, 1.0) for a, b in base]
        out = adamic_adar(make_graph(spark, edges), distance_conversion=True)
        got = {(r["src"], r["dst"]): r["value"] for r in out.collect()}
        assert got[(1, 2)] == pytest.approx(-(1.0 + math.log(1 / 3)))
        assert got[(3, 4)] == pytest.approx(-1.0)


class TestSybilRank:
    """Hand-computed golden on an undirected unit-weight triangle.

    N=3 ⇒ P=⌈log10(3)⌉=1 power iteration; trusted={1}, totalTrust=N=3:
    init u=(3,0,0), deg=2 everywhere; u¹(2)=u¹(3)=3/2; rank=u¹/deg.
    """

    def _triangle(self, spark):
        base = [(1, 2), (2, 3), (1, 3)]
        edges = [(a, b, 1.0) for a, b in base] + [(b, a, 1.0) for a, b in base]
        return make_graph(spark, edges)

    def test_triangle_one_trusted(self, spark):
        from kafka_graphs_spark.library import sybil_rank

        out = sybil_rank(self._triangle(spark), trusted=F.col("id") == 1)
        assert vmap(out) == pytest.approx({1: 0.0, 2: 0.75, 3: 0.75})

    def test_triangle_two_power_iterations(self, spark):
        from kafka_graphs_spark.library import sybil_rank

        # multiplier 3 ⇒ P=⌈3·log10(3)⌉=2: u²(1)=1.5, u²(2)=u²(3)=0.75
        out = sybil_rank(
            self._triangle(spark), trusted=F.col("id") == 1, iteration_multiplier=3
        )
        assert vmap(out) == pytest.approx({1: 0.75, 2: 0.375, 3: 0.375})

    def test_trusted_dataframe_and_total_trust(self, spark):
        from kafka_graphs_spark.library import sybil_rank

        g = self._triangle(spark)
        t = spark.createDataFrame([(1,), (2,)], "id long")
        out = sybil_rank(g, trusted=t, total_trust=6.0)
        # init u=(3,3,0); u¹(1)=1.5, u¹(2)=1.5, u¹(3)=3; rank=u¹/2
        assert vmap(out) == pytest.approx({1: 0.75, 2: 0.75, 3: 1.5})


class TestMaxBMatching:
    """Protocol traces hand-simulated against MaxBMatching.java semantics."""

    INCLUDED = 3

    def _graph(self, spark, caps, und_edges):
        v = spark.createDataFrame(caps, "id long, value int")
        e = spark.createDataFrame(
            [(a, b, w) for a, b, w in und_edges] + [(b, a, w) for a, b, w in und_edges],
            "src long, dst long, value double",
        )
        return Graph(v, e)

    def test_path_capacity_one(self, spark):
        from kafka_graphs_spark.library import max_b_matching

        # 1-2 (w10) beats 2-3 (w5); vertex 2 includes only the heavier edge,
        # then removes 2-3 at capacity 0
        g = self._graph(spark, [(1, 1), (2, 1), (3, 1)], [(1, 2, 10.0), (2, 3, 5.0)])
        out = {(r["src"], r["dst"]): r["state"] for r in max_b_matching(g).collect()}
        assert out == {(1, 2): self.INCLUDED, (2, 1): self.INCLUDED}

    def test_path_capacity_two(self, spark):
        from kafka_graphs_spark.library import max_b_matching

        g = self._graph(spark, [(1, 1), (2, 2), (3, 1)], [(1, 2, 10.0), (2, 3, 5.0)])
        out = {(r["src"], r["dst"]): r["state"] for r in max_b_matching(g).collect()}
        assert out == {
            (1, 2): self.INCLUDED, (2, 1): self.INCLUDED,
            (2, 3): self.INCLUDED, (3, 2): self.INCLUDED,
        }

    def test_zero_capacity_center_removes_all(self, spark):
        from kafka_graphs_spark.library import max_b_matching

        g = self._graph(spark, [(1, 0), (2, 1), (3, 1)], [(1, 2, 4.0), (1, 3, 6.0)])
        assert max_b_matching(g).count() == 0


class TestCollaborativeFiltering:
    """ALS/SGD on a rank-1 ratings matrix: r(u,i) = a_u · b_i is exactly
    representable, so the factorization must drive RMSE near zero.
    Reference fixtures: test/library/cf/{AlsTest,SgdTest}.java (small
    explicit ratings, seeded randomness — we pin our own seeds)."""

    RATINGS = [(1, 10, 4.0), (1, 11, 2.0), (2, 10, 2.0), (2, 11, 1.0)]

    def _graph(self, spark):
        e = spark.createDataFrame(self.RATINGS, "src long, dst long, value double")
        return Graph.from_edges(e, F.lit(0.0))

    def _rmse(self, preds):
        want = {(u, i): r for u, i, r in self.RATINGS}
        errs = [(p["prediction"] - want[(p["src"], p["dst"])]) ** 2 for p in preds]
        return math.sqrt(sum(errs) / len(errs))

    def test_als_converges(self, spark):
        from kafka_graphs_spark.library import als, predict

        g = self._graph(spark)
        f = als(g, dim=2, lambda_=0.001, iterations=6, seed=7)
        preds = predict(f, g.edges).collect()
        assert len(preds) == 4
        assert self._rmse(preds) < 0.05

    def test_als_rmse_early_stop(self, spark):
        from kafka_graphs_spark.library import als

        f = als(self._graph(spark), dim=2, lambda_=0.001, iterations=50,
                rmse_target=0.01, seed=7)
        assert f.count() == 4  # 2 users + 2 items

    def test_als_deterministic(self, spark):
        from kafka_graphs_spark.library import als

        g = self._graph(spark)
        a = {r["id"]: r["vec"] for r in als(g, dim=2, iterations=3, seed=9).collect()}
        b = {r["id"]: r["vec"] for r in als(g, dim=2, iterations=3, seed=9).collect()}
        assert a == b

    def test_als_float32_matches_float64(self, spark):
        # r11: dtype='float32' carries factors as array<float> (half the
        # per-half-step Arrow/shuffle bytes; the reference's jblas
        # FloatMatrix is float32 anyway). The solve stays float64, so
        # after a few iterations factors agree to float32 precision and
        # the fit converges identically.
        from kafka_graphs_spark.library import als, predict

        g = self._graph(spark)
        f64 = {r["id"]: r["vec"]
               for r in als(g, dim=2, lambda_=0.001, iterations=6, seed=7).collect()}
        fdf = als(g, dim=2, lambda_=0.001, iterations=6, seed=7, dtype="float32")
        assert fdf.schema["vec"].dataType.simpleString() == "array<float>"
        f32 = {r["id"]: r["vec"] for r in fdf.collect()}
        assert set(f64) == set(f32)
        for k in f64:
            for a, b in zip(f64[k], f32[k]):
                assert abs(a - b) <= 1e-4 * max(1.0, abs(a))
        preds = predict(fdf, g.edges).collect()
        assert self._rmse(preds) < 0.05

    def test_sgd_float32_matches_float64(self, spark):
        # r11: same flat-fvecs gather as ALS, same opt-in width; update
        # arithmetic stays float64, factors round once per superstep
        from kafka_graphs_spark.library import predict, sgd

        g = self._graph(spark)
        f64 = {r["id"]: r["vec"]
               for r in sgd(g, dim=2, gamma=0.05, lambda_=0.001,
                            iterations=20, seed=7).collect()}
        fdf = sgd(g, dim=2, gamma=0.05, lambda_=0.001,
                  iterations=20, seed=7, dtype="float32")
        assert fdf.schema["vec"].dataType.simpleString() == "array<float>"
        f32 = {r["id"]: r["vec"] for r in fdf.collect()}
        assert set(f64) == set(f32)
        for k in f64:
            for a, b in zip(f64[k], f32[k]):
                assert abs(a - b) <= 1e-3 * max(1.0, abs(a))
        # the float32 fit converges the same way the float64 one does
        r32 = self._rmse(predict(fdf, g.edges).collect())
        r64 = self._rmse(
            predict(
                sgd(g, dim=2, gamma=0.05, lambda_=0.001, iterations=20, seed=7),
                g.edges,
            ).collect()
        )
        assert abs(r32 - r64) < 1e-3

    def test_als_dtype_validated(self, spark):
        from kafka_graphs_spark.library import als

        with pytest.raises(ValueError):
            als(self._graph(spark), dim=2, iterations=1, dtype="float16")

    def test_sgd_improves(self, spark):
        from kafka_graphs_spark.library import predict, sgd

        g = self._graph(spark)
        f1 = sgd(g, dim=2, gamma=0.05, lambda_=0.001, iterations=1, seed=7)
        f40 = sgd(g, dim=2, gamma=0.05, lambda_=0.001, iterations=40, seed=7)
        r1 = self._rmse(predict(f1, g.edges).collect())
        r40 = self._rmse(predict(f40, g.edges).collect())
        assert r40 < r1 and r40 < 0.5

    def test_als_ml_fast_path(self, spark):
        from kafka_graphs_spark.library import als_ml

        model = als_ml(self._graph(spark), dim=2, iterations=5, seed=1)
        assert model.rank == 2


class TestClustering:
    def _points(self, spark):
        # two tight blobs around (0,0) and (10,10)
        pts = [(i, [0.0 + i * 0.1, 0.0]) for i in range(5)] + [
            (10 + i, [10.0 + i * 0.1, 10.0]) for i in range(5)
        ]
        v = spark.createDataFrame(pts, "id long, value array<double>")
        e = spark.createDataFrame([(0, 10, 1.0)], "src long, dst long, value double")
        return Graph(v, e)

    def test_kmeans_two_blobs(self, spark):
        from kafka_graphs_spark.library import kmeans

        out = kmeans(self._points(spark), k=2, seed=3)
        got = {r["id"]: r["cluster"] for r in out.collect()}
        low = {got[i] for i in range(5)}
        high = {got[10 + i] for i in range(5)}
        assert len(low) == 1 and len(high) == 1 and low != high

    def test_kmeans_explicit_centers(self, spark):
        from kafka_graphs_spark.library import kmeans

        out = kmeans(
            self._points(spark), k=2, initial_centers=[[0.0, 0.0], [10.0, 10.0]]
        )
        got = {r["id"]: r["cluster"] for r in out.collect()}
        assert all(got[i] == 0 for i in range(5))
        assert all(got[10 + i] == 1 for i in range(5))

    def test_kmeans_ml_fast_path(self, spark):
        from kafka_graphs_spark.library import kmeans_ml

        out = kmeans_ml(self._points(spark), k=2, seed=3)
        got = {r["id"]: r["cluster"] for r in out.collect()}
        assert len({got[i] for i in range(5)}) == 1

    def test_semi_clustering(self, spark):
        from kafka_graphs_spark.library import semi_clustering

        # two triangles joined by one weak edge → clusters align to triangles
        tri1 = [(1, 2, 5.0), (2, 3, 5.0), (1, 3, 5.0)]
        tri2 = [(4, 5, 5.0), (5, 6, 5.0), (4, 6, 5.0)]
        bridge = [(3, 4, 0.1)]
        g = make_graph(spark, tri1 + tri2 + bridge)
        out = semi_clustering(g, iterations=4, max_clusters=3, cluster_capacity=4)
        rows = {r["id"]: [tuple(c) for c in r["clusters"]] for r in out.collect()}
        assert set(rows) == {1, 2, 3, 4, 5, 6}
        # best cluster containing vertex 1 should be the full triangle
        assert any(set(c) == {1, 2, 3} for c in rows[1])


class TestSvdpp:
    RATINGS = [(1, 10, 4.0), (1, 11, 2.0), (2, 10, 2.0), (2, 11, 1.0), (3, 10, 5.0)]

    def _graph(self, spark):
        e = spark.createDataFrame(self.RATINGS, "src long, dst long, value double")
        return Graph.from_edges(e, F.lit(0.0))

    def test_svdpp_improves_rmse(self, spark):
        from kafka_graphs_spark.library import svdpp, svdpp_predict

        g = self._graph(spark)
        want = {(u, i): r for u, i, r in self.RATINGS}

        def rmse(users, items, mean):
            preds = svdpp_predict(users, items, g.edges, g.edges, mean).collect()
            errs = [(p["prediction"] - want[(p["src"], p["dst"])]) ** 2 for p in preds]
            assert len(errs) == len(self.RATINGS)
            return math.sqrt(sum(errs) / len(errs))

        u1, i1, m1 = svdpp(g, dim=4, iterations=1, bias_gamma=0.1, factor_gamma=0.1, seed=3)
        u2, i2, m2 = svdpp(g, dim=4, iterations=30, bias_gamma=0.1, factor_gamma=0.1, seed=3)
        assert rmse(u2, i2, m2) < rmse(u1, i1, m1)
        assert rmse(u2, i2, m2) < 1.0

    def test_svdpp_deterministic(self, spark):
        from kafka_graphs_spark.library import svdpp

        g = self._graph(spark)
        ua, _, _ = svdpp(g, dim=3, iterations=3, seed=5)
        ub, _, _ = svdpp(g, dim=3, iterations=3, seed=5)
        assert {r["id"]: r["p"] for r in ua.collect()} == {r["id"]: r["p"] for r in ub.collect()}

    def test_svdpp_rmse_target(self, spark):
        from kafka_graphs_spark.library import svdpp

        users, items, _ = svdpp(
            self._graph(spark), dim=4, iterations=100, rmse_target=0.5,
            bias_gamma=0.1, factor_gamma=0.1, seed=3,
        )
        assert users.count() == 3 and items.count() == 2

    def test_svdpp_float32_matches_float64(self, spark):
        # r12: dtype='float32' carries the nested (q, w) gather structs,
        # the (fstep, wstep) message structs, AND the factor frames as
        # array<float> — four dim-vectors per rating per round through
        # Arrow. Arithmetic stays float64; factors round once per
        # superstep, so after a few rounds the two fits agree to
        # float32 precision and converge identically.
        import math as _math

        from kafka_graphs_spark.library import svdpp, svdpp_predict

        g = self._graph(spark)
        want = {(u, i): r for u, i, r in self.RATINGS}

        def rmse(users, items, mean):
            preds = svdpp_predict(users, items, g.edges, g.edges, mean).collect()
            errs = [(p["prediction"] - want[(p["src"], p["dst"])]) ** 2 for p in preds]
            return _math.sqrt(sum(errs) / len(errs))

        u64, i64, m64 = svdpp(
            g, dim=3, iterations=8, bias_gamma=0.1, factor_gamma=0.1, seed=3
        )
        u32, i32, m32 = svdpp(
            g, dim=3, iterations=8, bias_gamma=0.1, factor_gamma=0.1, seed=3,
            dtype="float32",
        )
        assert u32.schema["p"].dataType.simpleString() == "array<float>"
        assert i32.schema["q"].dataType.simpleString() == "array<float>"
        assert i32.schema["y"].dataType.simpleString() == "array<float>"
        p64 = {r["id"]: r["p"] for r in u64.collect()}
        p32 = {r["id"]: r["p"] for r in u32.collect()}
        assert set(p64) == set(p32)
        for k in p64:
            for a, b in zip(p64[k], p32[k]):
                assert abs(a - b) <= 1e-3 * max(1.0, abs(a))
        assert abs(rmse(u32, i32, m32) - rmse(u64, i64, m64)) < 1e-3

    def test_svdpp_dtype_validated(self, spark):
        import pytest as _pytest

        from kafka_graphs_spark.library import svdpp

        with _pytest.raises(ValueError, match="dtype"):
            svdpp(self._graph(spark), dim=2, iterations=1, dtype="float16")


class TestPageRankGeneratorParity:
    """Cross-check the DataFrame delta-PageRank against an independent
    per-vertex Python simulation of the reference recurrence
    (PageRank.java:32-112) on the reference's own test graph shapes
    (PageRankTest.java: complete, grid, star via GraphGenerators.java)."""

    @staticmethod
    def simulate(edges, n_iter, reset=0.15, tol=0.0001):
        from collections import defaultdict

        out = defaultdict(list)
        for s, d in edges:
            out[s].append(d)
        verts = {v for e in edges for v in e}
        rank = {v: 0.0 for v in verts}
        init = reset / (1 - reset)
        msgs = {v: [init] for v in verts}  # superstep-0 self-send
        for _ in range(n_iter):
            nxt = defaultdict(list)
            for v in verts:
                if not msgs.get(v):
                    continue
                new_rank = rank[v] + (1 - reset) * sum(msgs[v])
                delta = new_rank - rank[v]
                rank[v] = new_rank
                if delta > tol and out[v]:
                    w = 1.0 / len(out[v])
                    for d in out[v]:
                        nxt[d].append(delta * w)
            msgs = nxt
        return rank

    def _check(self, spark, edge_list, iters):
        from kafka_graphs_spark.library import pagerank

        g = make_graph(spark, [(s, d, 1.0) for s, d in edge_list])
        got = {
            r["id"]: r["value"]
            for r in pagerank(g, max_iterations=iters).collect()
        }
        want = self.simulate(edge_list, iters)
        assert got == pytest.approx(want, rel=1e-12)

    def test_complete_k5(self, spark):
        edges = [(i, j) for i in range(5) for j in range(5) if i != j]
        self._check(spark, edges, 8)

    def test_grid_3x3(self, spark):
        edges = []
        for r in range(3):
            for c in range(3):
                v = r * 3 + c
                if c < 2:
                    edges.append((v, v + 1))
                if r < 2:
                    edges.append((v, v + 3))
        self._check(spark, edges, 10)

    def test_star_10(self, spark):
        edges = [(i, 0) for i in range(1, 10)]
        self._check(spark, edges, 5)


class TestLabelPropagationParity:
    """Cross-check DataFrame LP against an independent simulation of
    LabelPropagation.java:29-59 (argmax by (count, label), adopt only if
    larger than own label, messages along out-edges)."""

    @staticmethod
    def simulate(edges, n_iter):
        from collections import defaultdict

        out = defaultdict(list)
        for s, d in edges:
            out[s].append(d)
        verts = {v for e in edges for v in e}
        value = {v: v for v in verts}
        for _ in range(n_iter):
            counts = {v: defaultdict(int) for v in verts}
            for s, d in edges:
                counts[d][value[s]] += 1
            new_value = dict(value)
            for v in verts:
                if counts[v]:
                    max_key = max(counts[v], key=lambda k: (counts[v][k], k))
                    if value[v] < max_key:
                        new_value[v] = max_key
            value = new_value
        return value

    @pytest.mark.parametrize("seed", [1, 2, 3])
    def test_random_graphs(self, spark, seed):
        import random

        from kafka_graphs_spark.library import label_propagation

        rng = random.Random(seed)
        n = 12
        edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(30)})
        edges = [(s, d) for s, d in edges if s != d]
        g = make_graph(spark, [(s, d, 1.0) for s, d in edges])
        got = vmap(label_propagation(g, max_iterations=5))
        want = self.simulate(edges, 5)
        assert got == want


class TestPathsParityRandom:
    """SSSP/BFS/WCC on random graphs vs independent reference simulations —
    catches fan-in relaxation and convergence issues the chain-shaped
    DuckDB oracles cannot express."""

    def _random_edges(self, seed, n=14, m=35):
        import random

        rng = random.Random(seed)
        edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(m)})
        return [(s, d, float(1 + (s * 7 + d * 3) % 9)) for s, d in edges if s != d]

    @pytest.mark.parametrize("seed", [4, 5])
    def test_sssp_bellman_ford(self, spark, seed):
        from kafka_graphs_spark.library import sssp

        edges = self._random_edges(seed)
        g = make_graph(spark, edges)
        got = vmap(sssp(g, src_vertex_id=0, max_iterations=100))
        # reference Bellman-Ford fixpoint
        verts = {v for s, d, _ in edges for v in (s, d)}
        dist = {v: (0.0 if v == 0 else INF) for v in verts}
        for _ in range(len(verts)):
            for s, d, w in edges:
                if dist[s] + w < dist[d]:
                    dist[d] = dist[s] + w
        assert got == pytest.approx(dist)

    @pytest.mark.parametrize("seed", [6, 7])
    def test_bfs_hops(self, spark, seed):
        from collections import deque

        from kafka_graphs_spark.library import bfs
        from kafka_graphs_spark.library._loop import MAX_LONG

        edges = self._random_edges(seed)
        g = make_graph(spark, edges)
        got = vmap(bfs(g, src_vertex_id=0, max_iterations=100))
        out = {}
        for s, d, _ in edges:
            out.setdefault(s, []).append(d)
        verts = {v for s, d, _ in edges for v in (s, d)}
        hop = {v: MAX_LONG for v in verts}
        hop[0] = 0
        q = deque([0])
        while q:
            v = q.popleft()
            for d in out.get(v, []):
                if hop[d] == MAX_LONG:
                    hop[d] = hop[v] + 1
                    q.append(d)
        assert got == hop

    @pytest.mark.parametrize("seed", [8, 9])
    def test_wcc_min_label(self, spark, seed):
        from kafka_graphs_spark.library import connected_components

        edges = self._random_edges(seed)
        g = make_graph(spark, edges)
        got = vmap(connected_components(g, max_iterations=100))
        # union-find ground truth over the undirected view
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for s, d, _ in edges:
            rs, rd = find(s), find(d)
            if rs != rd:
                parent[rs] = rd
        comp = {}
        for v in {v for s, d, _ in edges for v in (s, d)}:
            comp.setdefault(find(v), []).append(v)
        want = {}
        for members in comp.values():
            label = min(members)
            for v in members:
                want[v] = label
        assert got == want


class TestKCore:
    """k-core / coreness vs an independent Python peeling model."""

    @staticmethod
    def _model_coreness(pairs):
        from collections import defaultdict

        adj = defaultdict(set)
        for a, b in pairs:
            if a != b:
                adj[a].add(b)
                adj[b].add(a)
        deg = {v: len(ns) for v, ns in adj.items()}
        coreness = {}
        remaining = dict(deg)
        live = dict(adj)
        k = 0
        while remaining:
            k = max(k, min(remaining.values()))
            peel = [v for v, d in remaining.items() if d <= k]
            while peel:
                v = peel.pop()
                if v not in remaining:
                    continue
                coreness[v] = k
                del remaining[v]
                for n in live[v]:
                    if n in remaining:
                        remaining[n] -= 1
                        if remaining[n] <= k:
                            peel.append(n)
                    live[n].discard(v)
                live[v] = set()
        return coreness

    @pytest.fixture(scope="class")
    def rand_graph(self, spark):
        import random

        rng = random.Random(77)
        pairs = sorted({
            tuple(sorted((rng.randint(0, 49), rng.randint(0, 49))))
            for _ in range(220)
        })
        pairs = [p for p in pairs if p[0] != p[1]]
        edges = spark.createDataFrame(
            [(a, b, 1.0) for a, b in pairs], "src long, dst long, value double"
        )
        return pairs, Graph.from_edges(edges, F.lit(0))

    def test_triangle_with_tail(self, spark):
        from kafka_graphs_spark.library import k_core

        edges = spark.createDataFrame(
            [(1, 2, 1.0), (2, 3, 1.0), (1, 3, 1.0), (3, 4, 1.0)],
            "src long, dst long, value double",
        )
        g = Graph.from_edges(edges, F.lit(0))
        core2 = {r.id: r.degree for r in k_core(g, 2).collect()}
        assert core2 == {1: 2, 2: 2, 3: 2}  # tail vertex 4 peeled
        assert k_core(g, 3).count() == 0

    def test_k_core_matches_model(self, rand_graph):
        from kafka_graphs_spark.library import k_core

        pairs, g = rand_graph
        model = self._model_coreness(pairs)
        for k in (2, 3, 4):
            expect = {v for v, c in model.items() if c >= k}
            got = {r.id for r in k_core(g, k).collect()}
            assert got == expect, f"k={k}"

    def test_core_decomposition_matches_model(self, rand_graph):
        from kafka_graphs_spark.library import core_decomposition

        pairs, g = rand_graph
        model = self._model_coreness(pairs)
        got = {r.id: r.coreness for r in core_decomposition(g).collect()}
        # model assigns coreness to every non-isolated vertex
        assert got == {v: c for v, c in model.items() if c >= 1}

    def test_registry_entries(self, spark):
        from kafka_graphs_spark.library import get_algorithm

        edges = spark.createDataFrame(
            [(1, 2, 1.0), (2, 3, 1.0), (1, 3, 1.0), (3, 4, 1.0)],
            "src long, dst long, value double",
        )
        g = Graph.from_edges(edges, F.lit(0))
        core = get_algorithm("kcore").run(g, k=2)
        assert {r.id for r in core.collect()} == {1, 2, 3}
        cn = {r.id: r.coreness for r in get_algorithm("coreness").run(g).collect()}
        assert cn == {1: 2, 2: 2, 3: 2, 4: 1}


class TestLCCPregelParity:
    """The Pregel inquiry/reply twin must equal the relational LCC
    (reference protocol: LocalClusteringCoefficient.java:34-135)."""

    def test_reference_graph_parity(self, spark):
        from kafka_graphs_spark.library import local_clustering_coefficient_pregel

        edges = [(0, 1, 1.0), (0, 2, 1.0), (2, 1, 1.0), (2, 3, 1.0), (3, 1, 1.0),
                 (3, 4, 1.0), (5, 3, 1.0)]
        g = make_graph(spark, edges, vertex_value=F.lit(1.0))
        rel = vmap(local_clustering_coefficient(g))
        prg = vmap(local_clustering_coefficient_pregel(g))
        assert set(prg) == set(rel)
        for k in rel:
            assert prg[k] == pytest.approx(rel[k], abs=1e-12), f"vertex {k}"

    def test_dangling_edge_target_excluded(self, spark):
        # an edge to id 99 absent from the vertex set must NOT produce a
        # phantom result row (the relational form inner-joins on
        # graph.vertices), but 99's out-edges still count in replies
        from kafka_graphs_spark.library import local_clustering_coefficient_pregel

        e = spark.createDataFrame(
            [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0), (0, 99, 1.0)],
            "src long, dst long, value double",
        )
        v = spark.createDataFrame([(i, 1.0) for i in range(3)], "id long, value double")
        g = Graph(v, e)
        rel = vmap(local_clustering_coefficient(g))
        prg = vmap(local_clustering_coefficient_pregel(g))
        assert set(prg) == set(rel) == {0, 1, 2}
        for k in rel:
            assert prg[k] == pytest.approx(rel[k], abs=1e-12), f"vertex {k}"


class TestKCoreBoundedRuns:
    def test_empty_core_on_last_allowed_round(self, spark):
        # a triangle has no 3-core: the single allowed peel round empties
        # the edge set — that IS convergence, not exhaustion (ADVICE r03)
        from kafka_graphs_spark.library import k_core

        g = make_graph(spark, [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0)])
        assert k_core(g, 3, max_iterations=1).count() == 0

    def test_exhaustion_still_raises(self, spark):
        # 6-path needs 3 peel rounds for k=2; 1 round must raise
        from kafka_graphs_spark.library import k_core

        g = make_graph(spark, [(i, i + 1, 1.0) for i in range(6)])
        with pytest.raises(RuntimeError, match="did not converge"):
            k_core(g, 2, max_iterations=1)


class TestCFNeighborCap:
    def test_gathered_caps_hub_rows(self, spark):
        from kafka_graphs_spark.library.cf import _gathered, _init_factors

        edges = spark.createDataFrame(
            [(u, 1000, float(u % 5)) for u in range(50)],
            "src long, dst long, value double",
        )
        users = edges.select(F.col("src").alias("id")).distinct()
        f = _init_factors(users, 2, seed=1)
        row = _gathered(edges, f, max_neighbors=10).collect()[0]
        # fvecs is flattened (k neighbors x dim=2)
        assert len(row["fvecs"]) == 10 * 2 and len(row["ratings"]) == 10
        # under the cap nothing is dropped and sender-sort order holds
        full = _gathered(edges, f, max_neighbors=100).collect()[0]
        assert len(full["fvecs"]) == 50 * 2

    def test_als_hub_completes_with_default_cap(self, spark):
        from kafka_graphs_spark.library import als

        g = make_graph(spark, [(u, 1000, float(1 + u % 3)) for u in range(30)])
        out = als(g, dim=2, iterations=2, seed=3)
        assert out.count() == 31  # 30 users + 1 hub item


class TestHits:
    """hits() — beyond-reference hubs/authorities with exact integer scores."""

    @pytest.fixture(scope="class")
    def tri_graph(self, spark):
        from kafka_graphs_spark import Graph

        edges = spark.createDataFrame(
            [(1, 2), (1, 3), (2, 3), (3, 1)], "src long, dst long"
        ).withColumn("value", F.lit(1))
        return Graph.from_edges(edges, F.lit(0))

    def test_one_iteration_hand_computed(self, tri_graph):
        from kafka_graphs_spark.library import hits

        got = {r.id: (r.hub, r.authority) for r in hits(tri_graph, iterations=1).collect()}
        # h0 = 1 everywhere; a1 = in-sums (1:1, 2:1, 3:2); h1 = out-sums of a1
        assert got == {1: (3, 1), 2: (2, 1), 3: (1, 2)}

    def test_two_iterations_exact_path_counts(self, tri_graph):
        from kafka_graphs_spark.library import hits

        got = {r.id: (r.hub, r.authority) for r in hits(tri_graph, iterations=2).collect()}
        # a2 = in-sums of h1: a2(1)=h1(3)=1, a2(2)=h1(1)=3, a2(3)=h1(1)+h1(2)=5
        # h2 = out-sums of a2: h2(1)=a2(2)+a2(3)=8, h2(2)=a2(3)=5, h2(3)=a2(1)=1
        assert got == {1: (8, 1), 2: (5, 3), 3: (1, 5)}

    def test_normalized(self, tri_graph):
        from kafka_graphs_spark.library import hits

        got = {r.id: (r.hub, r.authority) for r in hits(tri_graph, 1, normalize=True).collect()}
        assert got[1] == (1.0, 0.5)
        assert got[2] == (round(2 / 3, 9), 0.5)
        assert got[3] == (round(1 / 3, 9), 1.0)

    def test_sink_and_source_get_zero(self, spark):
        from kafka_graphs_spark import Graph
        from kafka_graphs_spark.library import hits

        # 1 -> 2: vertex 1 is never an authority, vertex 2 never a hub
        edges = spark.createDataFrame([(1, 2)], "src long, dst long").withColumn(
            "value", F.lit(1)
        )
        g = Graph.from_edges(edges, F.lit(0))
        got = {r.id: (r.hub, r.authority) for r in hits(g, iterations=3).collect()}
        assert got[1][1] == 0 and got[2][0] == 0

    def test_registered(self):
        from kafka_graphs_spark.library import get_algorithm

        assert get_algorithm("hits").run.__name__ == "hits"


class TestKTruss:
    """k_truss — triangle-support peeling (beyond-reference, like k_core)."""

    def _graph(self, spark, pairs):
        from kafka_graphs_spark import Graph

        edges = spark.createDataFrame(pairs, "src long, dst long").withColumn(
            "value", F.lit(1)
        )
        return Graph.from_edges(edges, F.lit(0))

    def test_k4_with_glued_triangle(self, spark):
        from kafka_graphs_spark.library import k_truss

        # K4 on 1-4, plus triangle (1,2,9): edges (1,9),(2,9) have support 1
        k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
        g = self._graph(spark, k4 + [(1, 9), (2, 9)])
        out = {(r.src, r.dst): r.support for r in k_truss(g, k=4).collect()}
        # 4-truss = exactly K4; (1,2) loses the support-3 it had via vertex 9
        assert set(out) == set(k4)
        assert all(s == 2 for s in out.values())

    def test_triangle_strip_cascades_to_empty(self, spark):
        from kafka_graphs_spark.library import k_truss

        # strip v1..v6: triangles (i, i+1, i+2) — boundary edges have
        # support 1, so k=4 peels them, which strips the next layer, etc.
        strip = [(i, i + 1) for i in range(1, 6)] + [(i, i + 2) for i in range(1, 5)]
        g = self._graph(spark, strip)
        assert k_truss(g, k=4).count() == 0
        # ...but the whole strip is a valid 3-truss (every edge in a triangle)
        assert k_truss(g, k=3).count() == len(strip)

    def test_k3_keeps_only_triangle_edges(self, spark):
        from kafka_graphs_spark.library import k_truss

        g = self._graph(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])  # pendant (3,4)
        out = {(r.src, r.dst): r.support for r in k_truss(g, k=3).collect()}
        assert out == {(1, 2): 1, (2, 3): 1, (1, 3): 1}

    def test_k2_keeps_everything_with_support(self, spark):
        from kafka_graphs_spark.library import k_truss

        g = self._graph(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
        out = {(r.src, r.dst): r.support for r in k_truss(g, k=2).collect()}
        assert out[(3, 4)] == 0 and len(out) == 4

    def test_max_iterations_raises_on_exhaustion(self, spark):
        from kafka_graphs_spark.library import k_truss

        strip = [(i, i + 1) for i in range(1, 8)] + [(i, i + 2) for i in range(1, 7)]
        g = self._graph(spark, strip)
        with pytest.raises(RuntimeError, match="did not converge"):
            k_truss(g, k=4, max_iterations=1)


class TestCentrality:
    """closeness/betweenness — closed-form goldens on path, star, cycle."""

    def _graph(self, spark, pairs):
        edges = spark.createDataFrame(pairs, "src long, dst long").withColumn(
            "value", F.lit(1.0)
        )
        return Graph.from_edges(edges, F.lit(0))

    def test_path_betweenness(self, spark):
        from kafka_graphs_spark.library import betweenness_centrality

        g = self._graph(spark, [(i, i + 1) for i in range(5)])  # P6
        got = {r.id: r.betweenness for r in betweenness_centrality(g).collect()}
        assert got == {i: float(i * (5 - i)) for i in range(6)}

    def test_star_betweenness_and_closeness(self, spark):
        from kafka_graphs_spark.library import (
            betweenness_centrality,
            closeness_centrality,
        )

        g = self._graph(spark, [(i, 0) for i in range(1, 6)])  # hub 0, 5 leaves
        bc = {r.id: r.betweenness for r in betweenness_centrality(g).collect()}
        assert bc[0] == 10.0  # C(5,2)
        assert all(bc[i] == 0.0 for i in range(1, 6))
        cc = {r.id: r.closeness for r in closeness_centrality(g).collect()}
        assert cc[0] == 1.0
        assert cc[1] == pytest.approx(5 / 9)  # 5 others, dists 1+2*4

    def test_cycle_symmetry(self, spark):
        from kafka_graphs_spark.library import betweenness_centrality

        # C6: every vertex equivalent; bc = (pairs at distance >=2 passing
        # through v): known value (n-2)*... just assert all equal + positive
        g = self._graph(spark, [(i, (i + 1) % 6) for i in range(6)])
        got = [r.betweenness for r in betweenness_centrality(g).collect()]
        assert len(set(got)) == 1 and got[0] > 0

    def test_even_split_counts_fractionally(self, spark):
        from kafka_graphs_spark.library import betweenness_centrality

        # diamond 0-1-3, 0-2-3: pair (0,3) splits across 1 and 2, pair
        # (1,2) splits across 0 and 3 — every vertex carries exactly 0.5
        g = self._graph(spark, [(0, 1), (0, 2), (1, 3), (2, 3)])
        got = {r.id: r.betweenness for r in betweenness_centrality(g).collect()}
        assert got == {0: 0.5, 1: 0.5, 2: 0.5, 3: 0.5}

    def test_sampled_sources_scale(self, spark):
        from kafka_graphs_spark.library import betweenness_centrality

        # P5 sampled from both endpoints: dependency of 0 and 4 on middle
        # vertices times scale 5/2
        g = self._graph(spark, [(i, i + 1) for i in range(4)])
        got = {r.id: r.betweenness for r in betweenness_centrality(g, sources=[0, 4]).collect()}
        # from 0: deltas (1,2,3)=(3,2,1); from 4: (1,2,3)=(1,2,3); /2, *5/2
        assert got[2] == pytest.approx((2 + 2) / 2 * 2.5)
        assert got[1] == pytest.approx((3 + 1) / 2 * 2.5)

    def test_directed_closeness(self, spark):
        from kafka_graphs_spark.library import closeness_centrality

        g = self._graph(spark, [(0, 1), (1, 2)])
        cc = {r.id: r.closeness for r in closeness_centrality(g, directed=True).collect()}
        assert cc[0] == 0.0  # nothing reaches 0
        assert cc[2] == pytest.approx(2 / 3)  # d(0,2)=2, d(1,2)=1

    def test_registered(self):
        from kafka_graphs_spark.library import get_algorithm

        assert get_algorithm("closeness").run.__name__ == "closeness_centrality"
        assert get_algorithm("betweenness").run.__name__ == "betweenness_centrality"


class TestGraphStatistics:
    def test_known_card(self, spark):
        from kafka_graphs_spark.library import graph_statistics

        # triangle 1-2-3 plus pendant 3-4 and a self-loop at 1
        edges = spark.createDataFrame(
            [(1, 2, 1.0), (2, 3, 1.0), (1, 3, 1.0), (3, 4, 1.0), (1, 1, 1.0)],
            "src long, dst long, value double",
        )
        g = Graph.from_edges(edges, F.lit(0))
        r = graph_statistics(g).collect()[0]
        assert r.n_vertices == 4 and r.n_edges == 5 and r.n_self_loops == 1
        assert r.n_undirected_edges == 4 and r.n_triangles == 1
        assert r.max_degree == 3 and r.avg_degree == 2.0
        assert r.density == round(4 / 6, 9)
        # star-like pendant pulls assortativity negative
        assert r.assortativity < 0


class TestRandomWalks:
    def test_forced_laps_on_cycle(self, spark):
        from kafka_graphs_spark.library import random_walks

        g = make_graph(spark, [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0)])
        rows = sorted((r.walk_id, r.step, r.vertex) for r in random_walks(g, 4).collect())
        assert len(rows) == 15  # 3 walks × 5 positions
        for wid, step, v in rows:
            assert v == (int(wid.split("#")[0]) + step) % 3

    def test_sink_stops_early(self, spark):
        from kafka_graphs_spark.library import random_walks

        g = make_graph(spark, [(0, 1, 1.0)])
        per = {r[0]: r[1] for r in random_walks(g, 3).groupBy("walk_id").count().collect()}
        assert per == {"0#0": 2, "1#0": 1}

    def test_deterministic_across_partitionings(self, spark):
        from kafka_graphs_spark.library import random_walks

        g = make_graph(spark, [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0), (0, 2, 1.0)])
        a = sorted(map(tuple, random_walks(g, 3).collect()))
        b = sorted(map(tuple, random_walks(
            Graph(g.vertices.repartition(5), g.edges.repartition(7)), 3
        ).collect()))
        assert a == b

    def test_multiple_walks_per_vertex_diverge(self, spark):
        from kafka_graphs_spark.library import random_walks

        # complete graph: draws differ per walk id, so two walks from the
        # same start should not all follow identical trajectories
        n = 6
        g = make_graph(
            spark, [(i, j, 1.0) for i in range(n) for j in range(n) if i != j]
        )
        w = random_walks(g, walk_length=4, walks_per_vertex=3)
        assert w.count() == n * 3 * 5
        paths = (
            w.groupBy("walk_id", "start")
            .agg(F.sort_array(F.collect_list(F.struct("step", "vertex"))).alias("p"))
            .groupBy("start")
            .agg(F.count_distinct("p").alias("k"))
        )
        assert paths.agg(F.max("k")).first()[0] > 1


class TestModularity:
    def test_two_cliques_known_value(self, spark):
        from kafka_graphs_spark.library import modularity

        # two disjoint triangles, communities = the triangles:
        # m=6, per community L=3, d=6 -> Q = 2*(3/6 - (6/12)^2) = 0.5
        edges = [(1, 2, 1.0), (2, 3, 1.0), (1, 3, 1.0),
                 (4, 5, 1.0), (5, 6, 1.0), (4, 6, 1.0)]
        g = make_graph(spark, edges)
        lab = spark.createDataFrame(
            [(i, 1 if i <= 3 else 2) for i in range(1, 7)], "id long, value long"
        )
        r = modularity(g, lab).collect()[0]
        assert (r.m, r.n_communities, r.modularity) == (6, 2, 0.5)

    def test_single_community_is_zero(self, spark):
        from kafka_graphs_spark.library import modularity

        g = make_graph(spark, [(1, 2, 1.0), (2, 3, 1.0), (1, 3, 1.0)])
        lab = spark.createDataFrame([(i, 0) for i in (1, 2, 3)], "id long, value long")
        r = modularity(g, lab).collect()[0]
        # all mass in one community: L/m = 1, (d/2m)^2 = 1 -> Q = 0
        assert r.modularity == 0.0

    def test_bad_split_goes_negative(self, spark):
        from kafka_graphs_spark.library import modularity

        # bipartite-ish split that cuts every edge
        g = make_graph(spark, [(1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0)])
        lab = spark.createDataFrame(
            [(1, 0), (3, 0), (2, 1), (4, 1)], "id long, value long"
        )
        r = modularity(g, lab).collect()[0]
        assert r.modularity < 0

    def test_empty_graph(self, spark):
        from kafka_graphs_spark.library import modularity

        g = make_graph(spark, [(1, 1, 1.0)])  # only a self-loop -> no und edges
        lab = spark.createDataFrame([(1, 0)], "id long, value long")
        r = modularity(g, lab).collect()[0]
        assert (r.m, r.modularity) == (0, 0.0)


class TestReviewRegressions:
    """Fixes from the round-4 code review, pinned."""

    def test_hits_normalize_empty_graph(self, spark):
        from kafka_graphs_spark.library import hits

        e = spark.createDataFrame([], "src long, dst long, value long")
        g = Graph.from_edges(e, F.lit(0))
        assert hits(g, iterations=1, normalize=True).count() == 0

    def test_closeness_symmetrization_uses_min_weight(self, spark):
        from kafka_graphs_spark.library import closeness_centrality

        # asymmetric weights: undirected distance must use min(1, 5)
        # deterministically, regardless of partitioning
        e = spark.createDataFrame(
            [(1, 2, 5.0), (2, 1, 1.0)], "src long, dst long, value double"
        )
        g = Graph.from_edges(e, F.lit(0))
        for gg in (g, Graph(g.vertices.repartition(3), g.edges.repartition(4))):
            cc = {r.id: r.closeness for r in closeness_centrality(gg).collect()}
            assert cc == {1: 1.0, 2: 1.0}  # 1 landmark at distance 1 each

    def test_closeness_duplicate_landmarks(self, spark):
        from kafka_graphs_spark.library import closeness_centrality

        e = spark.createDataFrame([(1, 2, 1.0)], "src long, dst long, value double")
        g = Graph.from_edges(e, F.lit(0))
        cc = {r.id: r.closeness for r in closeness_centrality(g, landmarks=[1, 1, 2]).collect()}
        assert cc == {1: 1.0, 2: 1.0}


class TestNode2VecWalks:
    def _g(self, spark, pairs):
        e = spark.createDataFrame(pairs, "src long, dst long").withColumn(
            "value", F.lit(1.0)
        )
        return Graph.from_edges(e, F.lit(0))

    def test_huge_p_never_returns(self, spark):
        from kafka_graphs_spark.library import node2vec_walks

        g = self._g(spark, [(0, 1), (1, 0), (1, 2), (2, 1)])
        steps = {(r.walk_id, r.step): r.vertex
                 for r in node2vec_walks(g, 2, p=1e9, q=1.0).collect()}
        assert [steps[("0#0", s)] for s in range(3)] == [0, 1, 2]

    def test_huge_q_returns_home(self, spark):
        from kafka_graphs_spark.library import node2vec_walks

        g = self._g(spark, [(0, 1), (1, 0), (1, 2), (2, 1)])
        steps = {(r.walk_id, r.step): r.vertex
                 for r in node2vec_walks(g, 2, p=1.0, q=1e9).collect()}
        assert [steps[("0#0", s)] for s in range(3)] == [0, 1, 0]

    def test_common_neighbor_class_dominates(self, spark):
        from kafka_graphs_spark.library import node2vec_walks

        # triangle 0-1-2 + pendant 9 on 1: from 1 with prev 0 and huge
        # p and q, the common neighbor 2 (weight 1) beats return (1/p)
        # and exploration to 9 (1/q)
        tri = [(0, 1), (0, 2), (1, 2), (1, 9)]
        und = tri + [(b, a) for a, b in tri]
        g = self._g(spark, und)
        steps = {(r.walk_id, r.step): r.vertex
                 for r in node2vec_walks(g, 2, p=1e9, q=1e9).collect()}
        if steps[("0#0", 1)] == 1:
            assert steps[("0#0", 2)] == 2
        if steps[("2#0", 1)] == 1:
            assert steps[("2#0", 2)] == 0

    def test_deterministic_and_sink_stop(self, spark):
        from kafka_graphs_spark.library import node2vec_walks

        g = self._g(spark, [(0, 1), (1, 2)])  # directed; 2 is a sink
        a = sorted(map(tuple, node2vec_walks(g, 4, p=2.0, q=0.5).collect()))
        b = sorted(map(tuple, node2vec_walks(
            Graph(g.vertices.repartition(3), g.edges.repartition(5)), 4, p=2.0, q=0.5
        ).collect()))
        assert a == b
        per = {r[0]: r[1] for r in node2vec_walks(g, 4).groupBy("walk_id").count().collect()}
        assert per == {"0#0": 3, "1#0": 2, "2#0": 1}

    def test_bad_params(self, spark):
        from kafka_graphs_spark.library import node2vec_walks

        g = self._g(spark, [(0, 1)])
        with pytest.raises(ValueError):
            node2vec_walks(g, 2, p=0.0)
        with pytest.raises(ValueError):
            node2vec_walks(g, -1)


class TestKatz:
    def test_path_closed_form(self, spark):
        from kafka_graphs_spark.library import katz_centrality

        g = make_graph(spark, [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0)])
        got = {r.id: r.katz for r in katz_centrality(g, alpha=0.125, iterations=3).collect()}
        assert got == {
            0: 0.0,
            1: 1 / 8,
            2: 1 / 8 + 1 / 64,
            3: 1 / 8 + 1 / 64 + 1 / 512,
        }

    def test_star_hub_collects(self, spark):
        from kafka_graphs_spark.library import katz_centrality

        g = make_graph(spark, [(i, 0, 1.0) for i in range(1, 6)])
        got = {r.id: r.katz for r in katz_centrality(g, alpha=0.125, iterations=3).collect()}
        assert got[0] == 5 / 8 and all(got[i] == 0.0 for i in range(1, 6))

    def test_cycle_walk_counts_compound(self, spark):
        from kafka_graphs_spark.library import katz_centrality

        # directed triangle: every vertex has exactly one length-k walk
        # ending at it for every k
        g = make_graph(spark, [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0)])
        got = {r.id: r.katz for r in katz_centrality(g, alpha=0.125, iterations=3).collect()}
        expect = 1 / 8 + 1 / 64 + 1 / 512
        assert all(v == expect for v in got.values())

    def test_param_guards(self, spark):
        from kafka_graphs_spark.library import katz_centrality

        g = make_graph(spark, [(0, 1, 1.0)])
        with pytest.raises(ValueError):
            katz_centrality(g, alpha=1.5)
        with pytest.raises(ValueError):
            katz_centrality(g, iterations=0)


class TestWeightedPageRank:
    def test_weights_shift_mass(self, spark):
        from kafka_graphs_spark.library import pagerank

        # 0 splits 1:3 between 1 and 2 (weighted) vs 1:1 (unweighted)
        g = make_graph(spark, [(0, 1, 1.0), (0, 2, 3.0)])
        w = vmap(pagerank(g, max_iterations=3, weighted=True).select("id", F.col("value")))
        u = vmap(pagerank(g, max_iterations=3, weighted=False).select("id", F.col("value")))
        assert u[1] == u[2]
        assert w[2] > w[1]
        # the weighted split is exactly 1/4 vs 3/4 of the propagated mass
        assert w[2] - w[0] == pytest.approx(3 * (w[1] - w[0]))

    def test_uniform_weights_match_unweighted(self, spark):
        from kafka_graphs_spark.library import pagerank

        edges = [(0, 1, 7.0), (0, 2, 7.0), (1, 2, 7.0), (2, 0, 7.0)]
        g = make_graph(spark, edges)
        w = vmap(pagerank(g, max_iterations=5, weighted=True).select("id", "value"))
        u = vmap(pagerank(g, max_iterations=5, weighted=False).select("id", "value"))
        for k in u:
            assert w[k] == pytest.approx(u[k], abs=1e-12)


class TestWeightedLabelPropagation:
    def test_weights_flip_adoption(self, spark):
        from kafka_graphs_spark.library import label_propagation

        # vertex 0 hears labels 1 (weight 4) and 3 (weight 1):
        # unweighted tie -> larger label 3; weighted -> 1
        edges = [(1, 0, 4.0), (3, 0, 1.0)]
        g = make_graph(spark, edges)
        u = vmap(label_propagation(g, max_iterations=1))
        w = vmap(label_propagation(g, max_iterations=1, weighted=True))
        assert u[0] == 3
        assert w[0] == 1
        # monotone upward move preserved: 1 and 3 receive nothing, keep own
        assert u[1] == 1 and u[3] == 3 and w[1] == 1 and w[3] == 3

    def test_unit_weights_match_unweighted(self, spark):
        from kafka_graphs_spark.library import label_propagation

        edges = [(i, (i * 3) % 10, 1.0) for i in range(10)] + [
            (i, (i + 1) % 10, 1.0) for i in range(10)
        ]
        g = make_graph(spark, edges)
        u = vmap(label_propagation(g, max_iterations=5))
        w = vmap(label_propagation(g, max_iterations=5, weighted=True))
        assert u == w

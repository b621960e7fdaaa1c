"""Operator algebra goldens, ported from the reference integration tests.

Reference: kafka-graphs-core/src/test/java/io/kgraph/GraphOperationsITCase.java,
JoinWithVerticesITCase.java, ReduceOnEdgesMethodsITCase.java,
ReduceOnNeighborMethodsITCase.java — hard-coded expected tuples.
"""

import pytest
from pyspark.sql import functions as F

from kafka_graphs_spark import EdgeDirection, Graph


def rows(df):
    return {tuple(r) for r in df.collect()}


class TestDegrees:
    def test_out_degrees(self, long_long_graph):
        # GraphOperationsITCase.testOutDegrees golden (":62-66")
        assert rows(long_long_graph.out_degrees()) == {(1, 2), (2, 1), (3, 2), (4, 1), (5, 1)}

    def test_in_degrees(self, long_long_graph):
        # GraphOperationsITCase.testInDegrees golden (":103-108")
        assert rows(long_long_graph.in_degrees()) == {(1, 1), (2, 1), (3, 2), (4, 1), (5, 2)}

    def test_degrees_isolated_vertex(self, spark):
        g = Graph.from_collection(spark, [(1, 1), (2, 2), (3, 3)], [(1, 2, 0)])
        assert rows(g.out_degrees()) == {(1, 1), (2, 0), (3, 0)}
        assert rows(g.degrees()) == {(1, 1), (2, 1), (3, 0)}


class TestTransforms:
    def test_undirected(self, long_long_graph):
        # GraphOperationsITCase.testUndirected golden (":136-143")
        expected = {
            (1, 2, 12), (2, 1, 12),
            (1, 3, 13), (3, 1, 13),
            (2, 3, 23), (3, 2, 23),
            (3, 4, 34), (4, 3, 34),
            (3, 5, 35), (5, 3, 35),
            (4, 5, 45), (5, 4, 45),
            (5, 1, 51), (1, 5, 51),
        }
        assert rows(long_long_graph.undirected().edges) == expected

    def test_undirected_existing_reverse_keeps_original(self, spark):
        g = Graph.from_collection(spark, [(1, 1), (2, 2)], [(1, 2, 12), (2, 1, 21)])
        assert rows(g.undirected().edges) == {(1, 2, 12), (2, 1, 21)}

    def test_subgraph(self, long_long_graph):
        # GraphOperationsITCase.testSubGraph golden: v > 2, e > 34 (":175-176")
        sub = long_long_graph.subgraph(F.col("value") > 2, F.col("value") > 34)
        assert rows(sub.edges) == {(3, 5, 35), (4, 5, 45)}

    def test_filter_on_vertices(self, long_long_graph):
        # GraphOperationsITCase.testFilterVertices golden (":207-210")
        g = long_long_graph.filter_on_vertices(F.col("value") > 2)
        assert rows(g.edges) == {(3, 4, 34), (3, 5, 35), (4, 5, 45)}
        assert rows(g.vertices) == {(3, 3), (4, 4), (5, 5)}

    def test_filter_on_edges(self, long_long_graph):
        # GraphOperationsITCase.testFilterEdges golden (":239-242")
        g = long_long_graph.filter_on_edges(F.col("value") > 34)
        assert rows(g.edges) == {(3, 5, 35), (4, 5, 45), (5, 1, 51)}
        assert g.vertices.count() == 5  # vertices untouched

    def test_map_vertices(self, long_long_graph):
        g = long_long_graph.map_vertices(F.col("value") + 1)
        assert rows(g.vertices) == {(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)}

    def test_map_edges(self, long_long_graph):
        g = long_long_graph.map_edges(F.col("value") * 2)
        assert rows(g.edges.select("src", "dst", "value")) == {
            (1, 2, 24), (1, 3, 26), (2, 3, 46), (3, 4, 68), (3, 5, 70), (4, 5, 90), (5, 1, 102)
        }

    def test_reverse(self, long_long_graph):
        assert rows(long_long_graph.reverse().edges) == {
            (2, 1, 12), (3, 1, 13), (3, 2, 23), (4, 3, 34), (5, 3, 35), (5, 4, 45), (1, 5, 51)
        }

    def test_from_edges_derives_vertices(self, spark):
        e = spark.createDataFrame([(1, 2, 0), (2, 3, 0)], "src long, dst long, value long")
        g = Graph.from_edges(e, F.lit(7).cast("long"))
        assert rows(g.vertices) == {(1, 7), (2, 7), (3, 7)}


class TestJoins:
    def test_join_with_vertices(self, spark, long_long_graph):
        # JoinWithVerticesITCase.testJoinWithVertexSet: join with (id, id*2), sum
        t = long_long_graph.vertices.select("id", (F.col("id") * 2).alias("value"))
        g = long_long_graph.join_with_vertices(t, lambda old, new: old + new)
        assert rows(g.vertices) == {(1, 3), (2, 6), (3, 9), (4, 12), (5, 15)}

    def test_join_with_vertices_partial_input_keeps_old(self, spark, long_long_graph):
        t = spark.createDataFrame([(1, 100)], "id long, value long")
        g = long_long_graph.join_with_vertices(t, lambda old, new: old + new)
        assert rows(g.vertices) == {(1, 101), (2, 2), (3, 3), (4, 4), (5, 5)}

    def test_join_with_edges(self, spark, long_long_graph):
        t = spark.createDataFrame([(1, 2, 1000), (5, 1, 1000)], "src long, dst long, value long")
        g = long_long_graph.join_with_edges(t, lambda old, new: old + new)
        assert rows(g.edges) == {
            (1, 2, 1012), (1, 3, 13), (2, 3, 23), (3, 4, 34), (3, 5, 35), (4, 5, 45), (5, 1, 1051)
        }

    def test_join_with_edges_on_source(self, spark, long_long_graph):
        t = spark.createDataFrame([(1, 100), (3, 300)], "id long, value long")
        g = long_long_graph.join_with_edges_on_source(t, lambda old, new: old + new)
        assert rows(g.edges) == {
            (1, 2, 112), (1, 3, 113), (2, 3, 23), (3, 4, 334), (3, 5, 335), (4, 5, 45), (5, 1, 51)
        }

    def test_join_with_edges_on_target(self, spark, long_long_graph):
        t = spark.createDataFrame([(3, 300)], "id long, value long")
        g = long_long_graph.join_with_edges_on_target(t, lambda old, new: old + new)
        assert rows(g.edges) == {
            (1, 2, 12), (1, 3, 313), (2, 3, 323), (3, 4, 34), (3, 5, 35), (4, 5, 45), (5, 1, 51)
        }


class TestNeighborhoodAggregations:
    def test_reduce_on_edges_out_min(self, long_long_graph):
        # ReduceOnEdgesMethodsITCase.testLowestWeightOutNeighbor analogue:
        # per-vertex min outgoing edge value
        assert rows(long_long_graph.reduce_on_edges("min", EdgeDirection.OUT)) == {
            (1, 12), (2, 23), (3, 34), (4, 45), (5, 51)
        }

    def test_reduce_on_edges_in_min(self, long_long_graph):
        assert rows(long_long_graph.reduce_on_edges("min", EdgeDirection.IN)) == {
            (2, 12), (3, 13), (4, 34), (5, 35), (1, 51)
        }

    def test_reduce_on_edges_both_raises(self, long_long_graph):
        with pytest.raises(NotImplementedError):
            long_long_graph.reduce_on_edges("min", EdgeDirection.BOTH)

    def test_reduce_on_neighbors_out_sum(self, long_long_graph):
        # ReduceOnNeighborMethodsITCase.testSumOfOutNeighbors golden:
        # 1→(2+3)=5, 2→3, 3→(4+5)=9, 4→5, 5→1
        assert rows(long_long_graph.reduce_on_neighbors("sum", EdgeDirection.OUT)) == {
            (1, 5), (2, 3), (3, 9), (4, 5), (5, 1)
        }

    def test_reduce_on_neighbors_in_sum(self, long_long_graph):
        # sum of in-neighbors: 2→1, 3→(1+2)=3, 4→3, 5→(3+4)=7, 1→5
        assert rows(long_long_graph.reduce_on_neighbors("sum", EdgeDirection.IN)) == {
            (2, 1), (3, 3), (4, 3), (5, 7), (1, 5)
        }

    def test_group_reduce_on_edges(self, long_long_graph):
        # arbitrary fn over (value, edges array): count edges with value > 20
        out = long_long_graph.group_reduce_on_edges(
            lambda v, edges: F.size(F.filter(F.coalesce(edges, F.array()), lambda e: e.value > 20)),
            EdgeDirection.OUT,
        )
        assert rows(out) == {(1, 0), (2, 1), (3, 2), (4, 1), (5, 1)}

    def test_group_reduce_on_neighbors(self, long_long_graph):
        # sum of (neighbor value + edge value) over out-neighbors, 0 when none
        out = long_long_graph.group_reduce_on_neighbors(
            lambda v, ns: F.coalesce(
                F.aggregate(ns, F.lit(0).cast("long"), lambda acc, n: acc + n.nvalue + n.value),
                F.lit(0).cast("long"),
            ),
            EdgeDirection.OUT,
        )
        assert rows(out) == {(1, 30), (2, 26), (3, 78), (4, 50), (5, 52)}

    def test_grouped_adjacency(self, long_long_graph):
        adj = long_long_graph.edges_grouped_by_source()
        got = {r["id"]: sorted((e["dst"], e["value"]) for e in r["edges"]) for r in adj.collect()}
        assert got == {
            1: [(2, 12), (3, 13)],
            2: [(3, 23)],
            3: [(4, 34), (5, 35)],
            4: [(5, 45)],
            5: [(1, 51)],
        }


class TestGenerators:
    def test_complete(self, spark):
        from kafka_graphs_spark.sources import complete_graph

        g = complete_graph(spark, 4)
        assert g.num_edges() == 12
        assert g.num_vertices() == 4

    def test_grid(self, spark):
        from kafka_graphs_spark.sources import grid_graph

        g = grid_graph(spark, 3, 3)
        assert g.num_vertices() == 9
        assert g.num_edges() == 12  # 2*3*2 right + down
        assert rows(g.edges.select("src", "dst")).issuperset({(0, 1), (0, 3), (4, 5), (4, 7)})

    def test_star(self, spark):
        from kafka_graphs_spark.sources import star_graph

        g = star_graph(spark, 5)
        assert rows(g.edges.select("src", "dst")) == {(1, 0), (2, 0), (3, 0), (4, 0)}


class TestImporterCli:
    def test_import_vertices_and_edges(self, spark, tmp_path):
        from kafka_graphs_spark.importer import run

        vf = tmp_path / "v.txt"
        ef = tmp_path / "e.txt"
        vf.write_text("1 10\n2 20\n3 30\n")
        ef.write_text("1 2 12\n2 3 23\n3 1 31\n")
        out = tmp_path / "store"
        rc = run(
            [str(out), "-vf", str(vf), "-ef", str(ef), "-np", "4",
             "--edge-value-type", "double"],
            spark=spark,
        )
        assert rc == 0
        v = spark.read.parquet(str(out / "vertices"))
        e = spark.read.parquet(str(out / "edges"))
        assert {tuple(r) for r in v.collect()} == {(1, 10), (2, 20), (3, 30)}
        assert {tuple(r) for r in e.collect()} == {(1, 2, 12.0), (2, 3, 23.0), (3, 1, 31.0)}
        assert dict(e.dtypes)["value"] == "double"

    def test_import_requires_input(self, spark, tmp_path):
        import pytest as _pytest

        from kafka_graphs_spark.importer import run

        with _pytest.raises(SystemExit):
            run([str(tmp_path / "store")], spark=spark)


class TestEdgesByKey:
    def test_edges_by_source(self, long_long_graph):
        # KGraph.java:91-97 — one record per edge keyed by source id
        got = rows(long_long_graph.edges_by_source())
        assert got == {(s, s, d, v) for s, d, v in
                       [(1, 2, 12), (1, 3, 13), (2, 3, 23), (3, 4, 34),
                        (3, 5, 35), (4, 5, 45), (5, 1, 51)]}

    def test_edges_by_target(self, long_long_graph):
        # KGraph.java:99-103
        got = rows(long_long_graph.edges_by_target())
        assert got == {(d, s, d, v) for s, d, v in
                       [(1, 2, 12), (1, 3, 13), (2, 3, 23), (3, 4, 34),
                        (3, 5, 35), (4, 5, 45), (5, 1, 51)]}

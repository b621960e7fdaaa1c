"""Round-5 operator goldens: transitivity and friends."""

import itertools

import pytest
from pyspark.sql import functions as F

from kafka_graphs_spark import Graph
from kafka_graphs_spark.library import transitivity


def make_graph(spark, edges):
    e = spark.createDataFrame(edges, "src long, dst long, value double")
    return Graph.from_edges(e, F.lit(0.0))


def one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_transitivity_triangle(spark):
    r = one(transitivity(make_graph(spark, [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0)])))
    assert (r["n_triangles"], r["n_wedges"], r["transitivity"]) == (1, 3, 1.0)


def test_transitivity_k4(spark):
    edges = [(i, j, 1.0) for i, j in itertools.combinations(range(4), 2)]
    r = one(transitivity(make_graph(spark, edges)))
    assert (r["n_triangles"], r["n_wedges"], r["transitivity"]) == (4, 12, 1.0)


def test_transitivity_path_and_star(spark):
    r = one(transitivity(make_graph(spark, [(0, 1, 1.0), (1, 2, 1.0)])))
    assert (r["n_triangles"], r["n_wedges"], r["transitivity"]) == (0, 1, 0.0)
    star = [(0, i, 1.0) for i in range(1, 6)]
    r = one(transitivity(make_graph(spark, star)))
    assert r["n_triangles"] == 0 and r["n_wedges"] == 10 and r["transitivity"] == 0.0


def test_transitivity_ignores_direction_loops_and_multiplicity(spark):
    # duplicate edges, reverse edges and self-loops collapse to the
    # simple undirected triangle
    edges = [
        (0, 1, 1.0), (1, 0, 1.0), (0, 1, 2.0),
        (1, 2, 1.0), (2, 0, 1.0), (2, 2, 9.0),
    ]
    r = one(transitivity(make_graph(spark, edges)))
    assert (r["n_triangles"], r["n_wedges"], r["transitivity"]) == (1, 3, 1.0)


def test_transitivity_empty(spark):
    e = spark.createDataFrame([], "src long, dst long, value double")
    v = spark.createDataFrame([(1, 0.0)], "id long, value double")
    r = one(transitivity(Graph(v, e)))
    assert (r["n_triangles"], r["n_wedges"], r["transitivity"]) == (0, 0, 0.0)

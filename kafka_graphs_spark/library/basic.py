"""Basic algorithms: EdgeCount, VertexCount, ReverseEdges.

Reference: io/kgraph/library/basic/{EdgeCount,VertexCount,ReverseEdges}.java.
The first two are aggregator-only Pregel programs in the reference (one
superstep summing degrees / counting vertices) — on Spark they are single
partial-aggregated counts. ReverseEdges (superstep 0 send own edges to
targets, superstep 1 addEdge missing reverses) is a union + dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_graphs_spark.graph import Graph


def edge_count(graph: Graph) -> int:
    """Reference: EdgeCount.java:28-52 (sum of out-degrees at superstep 0)."""
    return graph.edges.count()


def vertex_count(graph: Graph) -> int:
    """Reference: VertexCount.java:28-49 (+1 per vertex at superstep 0)."""
    return graph.vertices.count()


def reverse_edges(graph: Graph) -> Graph:
    """Ensure every edge has its reverse; existing edges keep their value.

    Reference: ReverseEdges.java:28-59 — superstep 0 sends each vertex's
    out-edges to their targets; superstep 1 adds the missing reverse edges.
    Spark: original edges ∪ (reversed anti-join original keys).
    """
    e = graph.edges
    cols = e.columns
    reversed_e = e.select(
        F.col("dst").alias("src"),
        F.col("src").alias("dst"),
        *[F.col(c) for c in cols if c not in ("src", "dst")],
    )
    missing = reversed_e.join(e.select("src", "dst"), on=["src", "dst"], how="left_anti")
    return Graph(graph.vertices, e.unionByName(missing))

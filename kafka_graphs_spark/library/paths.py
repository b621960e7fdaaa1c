"""Shortest-path family: BFS, SSSP, MSSP.

Reference compute functions:
- io/kgraph/library/BreadthFirstSearch.java:33-73
- io/kgraph/library/SingleSourceShortestPaths.java:30-68
- io/kgraph/library/MultipleSourceShortestPaths.java:32-75

Spark re-expression: frontier-based relaxation loops. The per-superstep
message exchange becomes ``frontier ⋈ edges → groupBy(dst).min`` — the min
combiner is a partial aggregation, so hub vertices (skew) are combined
map-side before the shuffle. MSSP runs ALL landmarks in one loop by
normalizing the reference's ``Map<landmark,double>`` vertex value into
(id, landmark, dist) rows — one Spark job relaxes every landmark at once
instead of a map-typed column, and the map is reassembled at the end.
"""

from __future__ import annotations

from typing import Iterable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_graphs_spark.graph import Graph
from kafka_graphs_spark.library._loop import INF, MAX_LONG, LoopState


def bfs(graph: Graph, src_vertex_id, max_iterations: int = 50) -> DataFrame:
    """Hop count from ``src_vertex_id``; unvisited = Long.MAX_VALUE.

    Reference: BreadthFirstSearch.java:33-73 — superstep n labels the
    frontier with n; messages only carry activation. Returns (id, value).
    """
    edges = graph.edges.select("src", "dst")
    state = graph.vertices.select(
        "id",
        F.when(F.col("id") == src_vertex_id, F.lit(0).cast("long"))
        .otherwise(F.lit(MAX_LONG))
        .alias("value"),
    )
    loop = LoopState()
    state = loop.checkpoint(state)
    frontier = state.filter(F.col("value") == 0).select("id")
    hop = 0
    while hop < max_iterations:
        hop += 1
        # messages: activation of unvisited out-neighbors of the frontier
        reached = (
            frontier.join(edges, frontier["id"] == edges["src"])
            .select(F.col("dst").alias("id"))
            .distinct()
        )
        newly = reached.join(
            state.filter(F.col("value") == MAX_LONG).select("id"), on="id", how="left_semi"
        )
        n = newly.count()
        if n == 0:
            break
        state = loop.checkpoint(
            state.join(newly.withColumn("_new", F.lit(True)), on="id", how="left").select(
                "id",
                F.when(F.col("_new"), F.lit(hop).cast("long")).otherwise(F.col("value")).alias("value"),
            )
        )
        frontier = state.filter(F.col("value") == hop).select("id")
    result = state.localCheckpoint(eager=True)
    loop.release()
    return result


def sssp(graph: Graph, src_vertex_id, max_iterations: int = 50) -> DataFrame:
    """Bellman-Ford relaxation from one source; unreached = +inf.

    Reference: SingleSourceShortestPaths.java:30-68 — relax if the combined
    min message < value, then send ``min + edge.value`` along out-edges.
    Returns (id, value double).
    """
    edges = graph.edges.select("src", "dst", F.col("value").cast("double").alias("w"))
    state = graph.vertices.select(
        "id",
        F.when(F.col("id") == src_vertex_id, F.lit(0.0)).otherwise(F.lit(INF)).alias("value"),
    )
    loop = LoopState()
    state = loop.checkpoint(state)
    # initial frontier = the source (everything else holds +inf)
    frontier = state.filter(F.col("value") < INF).select("id", "value")
    it = 0
    while it < max_iterations:
        it += 1
        msgs = (
            frontier.join(edges, frontier["id"] == edges["src"])
            .select(F.col("dst").alias("id"), (F.col("value") + F.col("w")).alias("d"))
            .groupBy("id")
            .agg(F.min("d").alias("d"))  # min combiner — map-side partial agg
        )
        updated = (
            state.join(msgs, on="id", how="left")
            .select(
                "id",
                F.when(F.col("d") < F.col("value"), F.col("d")).otherwise(F.col("value")).alias("value"),
                (F.col("d") < F.col("value")).alias("_changed"),
            )
        )
        state = loop.checkpoint(updated.select("id", "value", "_changed"))
        frontier = state.filter(F.col("_changed")).select("id", "value")
        if frontier.count() == 0:
            break
    result = state.select("id", "value").localCheckpoint(eager=True)
    loop.release()
    return result


def mssp(
    graph: Graph, landmark_vertex_ids: Iterable, max_iterations: int = 50
) -> DataFrame:
    """Per-landmark min-distance map: (id, value map<landmark,double>).

    Reference: MultipleSourceShortestPaths.java:32-75 — vertex value is a
    Map<landmark,double>, merged with ``min`` per landmark. Here the map is
    normalized to (id, landmark, dist) rows so one relaxation loop advances
    every landmark simultaneously; unreached landmarks surface as +inf in
    the final map, matching the reference's map initialization.
    """
    landmarks = list(landmark_vertex_ids)
    spark = graph.vertices.sparkSession
    edges = graph.edges.select("src", "dst", F.col("value").cast("double").alias("w"))

    lm_df = spark.createDataFrame([(l,) for l in landmarks], "landmark long")
    state = (
        graph.vertices.select("id")
        .filter(F.col("id").isin(landmarks))
        .select("id", F.col("id").alias("landmark"), F.lit(0.0).alias("dist"))
    )
    loop = LoopState()
    state = loop.checkpoint(state)
    frontier = state
    it = 0
    while it < max_iterations:
        it += 1
        msgs = (
            frontier.join(edges, frontier["id"] == edges["src"])
            .select(F.col("dst").alias("id"), "landmark", (F.col("dist") + F.col("w")).alias("d"))
            .groupBy("id", "landmark")
            .agg(F.min("d").alias("d"))
        )
        joined = msgs.join(state, on=["id", "landmark"], how="left")
        improved = joined.filter(F.col("dist").isNull() | (F.col("d") < F.col("dist"))).select(
            "id", "landmark", F.col("d").alias("dist")
        )
        new_state, frontier = loop.checkpoint(
            state.join(improved.select("id", "landmark"), on=["id", "landmark"], how="left_anti")
            .unionByName(improved),
            improved,
        )
        if frontier.count() == 0:
            break
        state = new_state
    # reassemble the reference's map value, +inf for unreached landmarks
    full = (
        graph.vertices.select("id")
        .crossJoin(F.broadcast(lm_df))
        .join(state, on=["id", "landmark"], how="left")
        .select("id", "landmark", F.coalesce(F.col("dist"), F.lit(INF)).alias("dist"))
    )
    result = full.groupBy("id").agg(
        F.map_from_entries(F.sort_array(F.collect_list(F.struct("landmark", "dist")))).alias("value")
    )
    out = result.localCheckpoint(eager=True)
    loop.release()
    return out

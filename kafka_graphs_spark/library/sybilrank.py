"""SybilRank — trust propagation via degree-normalized power iteration.

Reference: io/kgraph/library/SybilRank.java:35-277 —
  superstep 0: count trusted vertices (+ VertexCount aggregator);
  superstep 1: rank = totalTrust/numTrusted for trusted else 0; send
    rank·w(e)/deg(v) along each out-edge, deg(v) = Σ out-edge weights;
  supersteps 2..2+P−1 (P = ⌈multiplier·log10(N)⌉, masterCompute halt):
    newRank = Σ incoming; re-distribute newRank·w/deg; stored rank =
    newRank/deg (degree-normalized, SybilRank.java:165-167).

Spark re-expression: the UNNORMALIZED rank u is the loop state —
u⁽ᵏ⁾ = Aᵀ D⁻¹ u⁽ᵏ⁻¹⁾, one join + partial-aggregated sum per iteration
(hub fan-in combines map-side); the degree normalization applies once at
the end. The two counting supersteps are two COUNT aggregates, and the
master's log10(N) iteration budget is a driver-side computation — the
reference's ZooKeeper aggregator machinery is unnecessary on Spark.
"""

from __future__ import annotations

import math
from typing import Optional, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_graphs_spark.graph import Graph
from kafka_graphs_spark.library._loop import ChainLoop, message_loop, sized_cache

_NAN = float("nan")
_INF = float("inf")


def sybil_rank(
    graph: Graph,
    trusted: Union[DataFrame, Column],
    total_trust: Optional[float] = None,
    iteration_multiplier: int = 1,
) -> DataFrame:
    """Returns (id, value double) — degree-normalized trust rank.

    ``trusted``: DataFrame of trusted ids (column ``id``) or a Column
    predicate over the vertex table. ``total_trust`` defaults to N
    (SybilRank.java:117-119 getTotalNumVertices).
    """
    edges, release_edges = sized_cache(
        graph.edges.select("src", "dst", F.col("value").cast("double").alias("w"))
    )
    deg, release_deg = sized_cache(
        edges.groupBy(F.col("src").alias("id")).agg(F.sum("w").alias("deg"))
    )

    if isinstance(trusted, DataFrame):
        tflag = graph.vertices.select("id").join(
            trusted.select("id"), on="id", how="left_semi"
        )
    else:
        tflag = graph.vertices.filter(trusted).select("id")

    n_vertices = graph.vertices.count()
    n_trusted = tflag.count()
    if n_trusted == 0:
        raise ValueError("SybilRank needs at least one trusted vertex")
    tt = float(total_trust) if total_trust is not None else float(n_vertices)
    power_iterations = math.ceil(iteration_multiplier * math.log10(float(n_vertices)))

    init_rank = tt / n_trusted
    u = (
        graph.vertices.select("id")
        .join(tflag.withColumn("_t", F.lit(True)), on="id", how="left")
        .select("id", F.when(F.col("_t"), F.lit(init_rank)).otherwise(F.lit(0.0)).alias("u"))
    )
    loop = message_loop(edges)
    try:
        u, _ = loop.advance(u)

        for _ in range(power_iterations):
            msgs = (
                u.join(edges, u["id"] == edges["src"])
                .join(deg, edges["src"] == deg["id"])
                .select(
                    F.col("dst").alias("id"),
                    (F.col("u") * F.col("w") / F.col("deg")).alias("m"),
                )
                .groupBy("id")
                .agg(F.sum("m").alias("m"))  # fan-in combines map-side
            )
            u, _ = loop.advance(
                graph.vertices.select("id")
                .join(msgs, on="id", how="left")
                .select("id", F.coalesce(F.col("m"), F.lit(0.0)).alias("u"))
            )

        if power_iterations == 0:
            # no power superstep ever runs (masterCompute halts at 2+0) — the
            # rank stays at the superstep-1 init value, unnormalized
            out = u.select("id", F.col("u").alias("value")).localCheckpoint(eager=True)
        else:
            # final rank = u/deg; Java double semantics for deg==0
            # (0/0→NaN, x/0→Inf)
            result = (
                u.join(deg.withColumnRenamed("id", "_did"), u["id"] == F.col("_did"), "left")
                .select(
                    "id",
                    F.when(
                        F.coalesce(F.col("deg"), F.lit(0.0)) != 0.0,
                        F.col("u") / F.col("deg"),
                    )
                    .otherwise(
                        F.when(F.col("u") == 0.0, F.lit(_NAN)).otherwise(F.lit(_INF))
                    )
                    .alias("value"),
                )
            )
            out = result.localCheckpoint(eager=True)
    finally:
        loop.release()
        release_edges()
        release_deg()
    return out
